"""Fused Pallas IC-LK kernel vs XLA region path (interpret mode on CPU).

The strict near-bitwise comparisons pin the ``onehot`` sampler, whose
arithmetic structure mirrors the XLA one-hot einsum exactly.  The
``align`` sampler (blend-then-conditional-roll, the fast path) emits a
different instruction mix, so it is ulp-equivalent rather than
bit-identical; its test gates the equivalence class instead (final
``u`` to 1e-3, freeze-timing flips bounded) — the same fp-chaos
phenomenon PARITY.md documents for CPU-vs-TPU policing decisions.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dis_tpu.config import DISConfig
from dis_tpu.models.dis import dis_flow_padded
from dis_tpu.ops import iclk
import dis_tpu.ops.pallas.iclk_kernel as kmod
from dis_tpu.ops.grid import make_grid
from dis_tpu.ops.pyramid import construct_pyramid

from conftest import synthetic_pair


@pytest.fixture
def onehot_sampler():
    old = kmod._SAMPLER
    kmod._SAMPLER = "onehot"
    yield
    kmod._SAMPLER = old


def _single_scale_problem(mode, seed=9):
    i1, i2 = synthetic_pair(40, 48, shift=(2.0, 1.0), seed=seed)
    cfg = DISConfig(iterations=6, coarsest_scale=0, patch_overlap=0.5,
                    early_exit=False, mode=mode)
    pyr1 = construct_pyramid(jnp.asarray(i1), 0, cfg.img_padding)
    pyr2 = construct_pyramid(jnp.asarray(i2), 0, cfg.img_padding)
    l1, l2 = pyr1[0], pyr2[0]
    geom = make_grid(l1.width, l1.height, cfg.steps)
    centers = jnp.asarray(geom.centers)
    tpl = iclk.extract_templates(l1.img, l1.dx, l1.dy, centers,
                                 cfg.patch_size, cfg.img_padding)
    return cfg, l1, l2, tpl, centers


def test_align_sampler_equivalence_class():
    """align vs onehot: same flow to 1e-3, freeze flips <2% of patches."""
    for mode in ("compat", "fixed"):
        cfg, l1, l2, tpl, centers = _single_scale_problem(mode)
        init_u = jnp.zeros_like(centers)
        cfg_p = DISConfig(**{**cfg.__dict__, "kernel": "pallas"})
        out = {}
        for s in ("onehot", "align"):
            kmod._SAMPLER = s
            out[s] = iclk.inverse_search(l2.img, tpl, centers, init_u,
                                         cfg_p, l1.width, l1.height)
        kmod._SAMPLER = "align"
        du = np.abs(np.asarray(out["align"].u) - np.asarray(out["onehot"].u))
        assert du.max() < 1e-3, (mode, du.max())
        flips = (np.asarray(out["align"].converged)
                 != np.asarray(out["onehot"].converged)).mean()
        assert flips < 0.02, (mode, flips)


def test_align2_bitwise_equals_align():
    """align2 (narrowing schedule) only reorders data movement; the
    written arithmetic (blends, dots) is identical to align, but the
    narrowed operand widths change the compiler's fma/fusion choices, so
    the gate is ulp-class (1e-5, ~30x tighter than the align-vs-onehot
    gate) with zero freeze flips allowed at this size."""
    for mode in ("compat", "fixed"):
        cfg, l1, l2, tpl, centers = _single_scale_problem(mode, seed=11)
        init_u = jnp.asarray(
            np.random.default_rng(5).uniform(
                -2, 2, centers.shape).astype(np.float32))
        cfg_p = DISConfig(**{**cfg.__dict__, "kernel": "pallas"})
        out = {}
        old = kmod._SAMPLER
        try:
            for s in ("align", "align2"):
                kmod._SAMPLER = s
                out[s] = iclk.inverse_search(l2.img, tpl, centers, init_u,
                                             cfg_p, l1.width, l1.height)
        finally:
            kmod._SAMPLER = old
        np.testing.assert_allclose(np.asarray(out["align2"].u),
                                   np.asarray(out["align"].u), atol=1e-5)
        np.testing.assert_allclose(np.asarray(out["align2"].Q),
                                   np.asarray(out["align"].Q), atol=1e-5)
        np.testing.assert_array_equal(np.asarray(out["align2"].converged),
                                      np.asarray(out["align"].converged))


@pytest.mark.parametrize("mode", ["compat", "fixed"])
def test_pallas_matches_xla_single_scale(mode, onehot_sampler):
    i1, i2 = synthetic_pair(40, 48, shift=(2.0, 1.0), seed=9)
    cfg = DISConfig(iterations=6, coarsest_scale=0, patch_overlap=0.5,
                    early_exit=False, mode=mode)
    pyr1 = construct_pyramid(jnp.asarray(i1), 0, cfg.img_padding)
    pyr2 = construct_pyramid(jnp.asarray(i2), 0, cfg.img_padding)
    l1, l2 = pyr1[0], pyr2[0]
    geom = make_grid(l1.width, l1.height, cfg.steps)
    centers = jnp.asarray(geom.centers)
    tpl = iclk.extract_templates(l1.img, l1.dx, l1.dy, centers,
                                 cfg.patch_size, cfg.img_padding)
    init_u = jnp.zeros_like(centers)

    cfg_x = DISConfig(**{**cfg.__dict__, "kernel": "xla"})
    res_x = iclk.inverse_search(l2.img, tpl, centers, init_u, cfg_x,
                                l1.width, l1.height)
    cfg_p = DISConfig(**{**cfg.__dict__, "kernel": "pallas"})
    res_p = iclk.inverse_search(l2.img, tpl, centers, init_u, cfg_p,
                                l1.width, l1.height)
    np.testing.assert_allclose(np.asarray(res_p.u), np.asarray(res_x.u),
                               atol=1e-4)
    # Q is the final resample at u.  Q10 addresses taps from
    # ceil(pos + 1e-5): a patch whose final position sits within ~1e-5
    # of an integer legitimately samples ADJACENT texels across the two
    # paths when their u differ by sub-1e-6 — exclude those knife-edge
    # patches from the Q comparison (u/converged still pinned above).
    pos = np.asarray(centers) + np.asarray(res_x.u)
    edge = (np.abs(pos - np.round(pos)) < 2e-5).any(axis=1)
    np.testing.assert_allclose(np.asarray(res_p.Q)[~edge],
                               np.asarray(res_x.Q)[~edge], atol=1e-2)
    np.testing.assert_array_equal(np.asarray(res_p.converged),
                                  np.asarray(res_x.converged))


def test_pallas_e2e_matches_xla(onehot_sampler):
    i1, i2 = synthetic_pair(32, 40, shift=(1.0, 1.0), seed=4)
    kw = dict(iterations=5, coarsest_scale=2, patch_overlap=0.5,
              early_exit=False)
    fx = np.asarray(dis_flow_padded(jnp.asarray(i1), jnp.asarray(i2),
                                    DISConfig(kernel="xla", **kw)))
    fp = np.asarray(dis_flow_padded(jnp.asarray(i1), jnp.asarray(i2),
                                    DISConfig(kernel="pallas", **kw)))
    np.testing.assert_allclose(fp, fx, atol=1e-3)


def test_pallas_e2e_align_sampler():
    """The shipped fast sampler end-to-end: flow equals the XLA path up
    to isolated policing flips (EPE-class gate)."""
    i1, i2 = synthetic_pair(32, 40, shift=(1.0, 1.0), seed=4)
    kw = dict(iterations=5, coarsest_scale=2, patch_overlap=0.5,
              early_exit=False)
    fx = np.asarray(dis_flow_padded(jnp.asarray(i1), jnp.asarray(i2),
                                    DISConfig(kernel="xla", **kw)))
    old = kmod._SAMPLER
    kmod._SAMPLER = "align"
    try:
        fp = np.asarray(dis_flow_padded(jnp.asarray(i1), jnp.asarray(i2),
                                        DISConfig(kernel="pallas", **kw)))
    finally:
        kmod._SAMPLER = old
    d = np.abs(fp - fx)
    assert d.mean() < 1e-3, d.mean()
    assert (d > 1e-2).mean() < 0.02, (d > 1e-2).mean()


def test_mxu_region_layout_bitwise_equals_4d():
    """The MXU identity-contraction relayout (DIS_TPU_REG_LAYOUT=mxu)
    must be bit-identical to the 4-D transpose route: every kernel
    input is the same array, so every output must match exactly."""
    for mode in ("compat", "fixed"):
        cfg, l1, l2, tpl, centers = _single_scale_problem(mode, seed=13)
        init_u = jnp.asarray(
            np.random.default_rng(7).uniform(
                -2, 2, centers.shape).astype(np.float32))
        cfg_p = DISConfig(**{**cfg.__dict__, "kernel": "pallas"})
        out = {}
        old = kmod._REG_LAYOUT
        try:
            for lay in ("4d", "mxu"):
                kmod._REG_LAYOUT = lay
                out[lay] = iclk.inverse_search(l2.img, tpl, centers, init_u,
                                               cfg_p, l1.width, l1.height)
        finally:
            kmod._REG_LAYOUT = old
        np.testing.assert_array_equal(np.asarray(out["mxu"].u),
                                      np.asarray(out["4d"].u))
        np.testing.assert_array_equal(np.asarray(out["mxu"].Q),
                                      np.asarray(out["4d"].Q))
        np.testing.assert_array_equal(np.asarray(out["mxu"].converged),
                                      np.asarray(out["4d"].converged))
