"""Variational refinement: improves flow and respects the energy model."""

import numpy as np
import jax.numpy as jnp
import pytest

from dis_tpu.config import DISConfig
from dis_tpu.models.dis import dis_flow_padded
from dis_tpu.utils.metrics import epe

from conftest import synthetic_pair


def test_refinement_improves_subpixel_epe():
    i1, i2 = synthetic_pair(48, 64, shift=(1.5, 0.5), seed=21)
    gt = np.zeros((48, 64, 2), np.float32)
    gt[..., 0] = 1.5
    gt[..., 1] = 0.5
    base_cfg = DISConfig(iterations=20, coarsest_scale=2, patch_overlap=0.5,
                         mode="fixed", refinement_iters=0)
    ref_cfg = DISConfig(iterations=20, coarsest_scale=2, patch_overlap=0.5,
                        mode="fixed", refinement_iters=5)
    f0 = np.asarray(dis_flow_padded(jnp.asarray(i1), jnp.asarray(i2), base_cfg))
    f1 = np.asarray(dis_flow_padded(jnp.asarray(i1), jnp.asarray(i2), ref_cfg))
    # compare away from borders
    e0 = epe(f0[8:-8, 8:-8], gt[8:-8, 8:-8])
    e1 = epe(f1[8:-8, 8:-8], gt[8:-8, 8:-8])
    assert np.isfinite(e1)
    assert e1 <= e0 + 0.02, (e0, e1)


def test_refinement_preserves_constant_flow():
    # On a perfectly matched constant-shift pair, refinement should not
    # push an already-correct flow far from the truth.
    i1, i2 = synthetic_pair(40, 48, shift=(2.0, 1.0), seed=5)
    cfg = DISConfig(iterations=20, coarsest_scale=2, patch_overlap=0.5,
                    mode="fixed", refinement_iters=8)
    f = np.asarray(dis_flow_padded(jnp.asarray(i1), jnp.asarray(i2), cfg))
    med = np.median(f[10:-10, 10:-10].reshape(-1, 2), axis=0)
    assert abs(med[0] - 2.0) < 0.5 and abs(med[1] - 1.0) < 0.5, med


def test_refinement_no_nans_on_flat_image():
    flat1 = np.full((32, 32), 128.0, np.float32)
    flat2 = np.full((32, 32), 128.0, np.float32)
    cfg = DISConfig(iterations=4, coarsest_scale=2, refinement_iters=4,
                    mode="fixed")
    f = np.asarray(dis_flow_padded(jnp.asarray(flat1), jnp.asarray(flat2), cfg))
    assert np.isfinite(f).all()


def test_warp_formulations_bit_identical():
    """take4 / take2 / slice1 warp gathers fetch the same four corner
    taps (replicate padding reproduces the edge clamp), so outputs must
    be bit-identical — they exist purely as gather-row-count A/B
    candidates (TPU gather cost scales with rows, not bytes)."""
    import dis_tpu.ops.variational as vmod

    rng = np.random.default_rng(11)
    planes = jnp.asarray(rng.random((37, 53, 6)).astype(np.float32))
    flow = jnp.asarray((rng.random((37, 53, 2)).astype(np.float32) - 0.5) * 9)
    old = vmod._WARP
    try:
        outs = {}
        for mode in ("take4", "take2", "slice1"):
            vmod._WARP = mode
            out, inb = vmod._warp_bilinear(planes, flow)
            outs[mode] = np.asarray(out)
        np.testing.assert_array_equal(outs["take4"], outs["take2"])
        np.testing.assert_array_equal(outs["take4"], outs["slice1"])
    finally:
        vmod._WARP = old


def test_warp1_scheme_runs_and_improves_subpixel_epe():
    """The one-plane gradient-averaging linearization (OpenCV
    VariationalRefinement structure, refinement_scheme='warp1') is a
    valid refinement: improves sub-pixel EPE over no refinement.
    (Measured SLOWER than planes6 on TPU — gather cost is per row, not
    per byte — so it is an option, not the default; PERF_NOTES.md.)"""
    i1, i2 = synthetic_pair(48, 64, shift=(1.5, 0.5), seed=23)
    gt = np.zeros((48, 64, 2), np.float32)
    gt[..., 0] = 1.5
    gt[..., 1] = 0.5
    base_cfg = DISConfig(iterations=20, coarsest_scale=2, patch_overlap=0.5,
                         mode="fixed", refinement_iters=0)
    ref_cfg = DISConfig(iterations=20, coarsest_scale=2, patch_overlap=0.5,
                        mode="fixed", refinement_iters=1,
                        refine_per_level=True, refinement_inner_sweeps=5,
                        refinement_sor_sweeps=5, refinement_omega=1.6,
                        refinement_scheme="warp1")
    f0 = np.asarray(dis_flow_padded(jnp.asarray(i1), jnp.asarray(i2), base_cfg))
    f1 = np.asarray(dis_flow_padded(jnp.asarray(i1), jnp.asarray(i2), ref_cfg))
    e0 = epe(f0[8:-8, 8:-8], gt[8:-8, 8:-8])
    e1 = epe(f1[8:-8, 8:-8], gt[8:-8, 8:-8])
    assert np.isfinite(e1)
    assert e1 <= e0 + 0.02, (e0, e1)
