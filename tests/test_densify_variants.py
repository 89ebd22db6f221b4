"""The three densification algorithms are numerically interchangeable.

``DIS_TPU_DENSIFY`` selects dilated-conv / batched-conv / phase-sum;
all must agree with the shipped dilated formulation (which is itself
oracle-validated in test_edge_cases.py) to fp tolerance on every
geometry: strides 2/4/5, row-ranged stripe grids, weighted and uniform.
"""

import importlib

import numpy as np
import pytest
import jax.numpy as jnp

import dis_tpu.ops.densify as densify_mod
from dis_tpu.ops.grid import make_grid


def _run(algo, u, geom, w, h, ps, wts, out_row0=0):
    old = densify_mod._ALGO
    densify_mod._ALGO = algo
    try:
        return np.asarray(densify_mod.densify(u, geom, w, h, ps, wts,
                                              out_row0=out_row0))
    finally:
        densify_mod._ALGO = old


@pytest.mark.parametrize("steps", [2, 4, 5])
@pytest.mark.parametrize("weighted", [False, True])
def test_variants_agree(steps, weighted):
    w, h, ps = 52, 40, 8
    geom = make_grid(w, h, steps)
    n = geom.num_w * geom.num_h
    r = np.random.default_rng(steps * 10 + weighted)
    u = jnp.asarray(r.standard_normal((n, 2)).astype(np.float32) * 3)
    wts = jnp.asarray(r.random(n).astype(np.float32) + 0.1) if weighted else None

    ref = _run("dilated", u, geom, w, h, ps, wts)
    for algo in ("batch", "phases"):
        got = _run(algo, u, geom, w, h, ps, wts)
        np.testing.assert_allclose(got, ref, atol=1e-5,
                                   err_msg=f"{algo} steps={steps}")


def test_variants_agree_striped():
    """Row-ranged grid with an output window (exact-tiling path)."""
    w, h, ps, steps = 48, 96, 8, 2
    geom = make_grid(w, h, steps, iy_range=(10, 30))
    n = geom.num_w * geom.num_h
    r = np.random.default_rng(7)
    u = jnp.asarray(r.standard_normal((n, 2)).astype(np.float32))
    out_row0, out_h = 24, 32
    ref = _run("dilated", u, geom, w, out_h, ps, None, out_row0)
    for algo in ("batch", "phases"):
        got = _run(algo, u, geom, w, out_h, ps, None, out_row0)
        np.testing.assert_allclose(got, ref, atol=1e-5, err_msg=algo)


@pytest.mark.parametrize("assemble", ["conv", "rowconv", "twostep"])
@pytest.mark.parametrize("steps", [2, 4, 5])
def test_phase_assembly_variants_agree(assemble, steps):
    """DIS_TPU_ASSEMBLE interleave routes (one-hot transposed conv /
    per-phase 1-D lane-dilated row conv / sublane-transpose twostep)
    match the stack+reshape assembly.  conv is exactly equal (pure
    one-hot copies at HIGHEST precision); twostep is exactly equal
    INCLUDING -0.0 bit patterns (pure data movement, checked on the
    raw bits); rowconv may reassociate the ps-tap column sums."""
    w, h, ps = 52, 40, 8
    geom = make_grid(w, h, steps)
    n = geom.num_w * geom.num_h
    r = np.random.default_rng(steps)
    u = jnp.asarray(r.standard_normal((n, 2)).astype(np.float32) * 3)
    wts = jnp.asarray(r.random(n).astype(np.float32) + 0.1)

    old = densify_mod._ASSEMBLE
    try:
        densify_mod._ASSEMBLE = "stack"
        ref = _run("phases", u, geom, w, h, ps, wts)
        densify_mod._ASSEMBLE = assemble
        got = _run("phases", u, geom, w, h, ps, wts)
    finally:
        densify_mod._ASSEMBLE = old
    if assemble == "conv":
        np.testing.assert_array_equal(got, ref)
    elif assemble == "twostep":
        np.testing.assert_array_equal(got.view(np.int32), ref.view(np.int32))
    else:
        np.testing.assert_allclose(got, ref, atol=1e-5)


def test_assembly_variants_striped():
    w, h, ps, steps = 48, 96, 8, 2
    geom = make_grid(w, h, steps, iy_range=(10, 30))
    n = geom.num_w * geom.num_h
    r = np.random.default_rng(9)
    u = jnp.asarray(r.standard_normal((n, 2)).astype(np.float32))
    out_row0, out_h = 24, 32
    old = densify_mod._ASSEMBLE
    try:
        densify_mod._ASSEMBLE = "stack"
        ref = _run("phases", u, geom, w, out_h, ps, None, out_row0)
        for assemble in ("conv", "rowconv", "twostep"):
            densify_mod._ASSEMBLE = assemble
            got = _run("phases", u, geom, w, out_h, ps, None, out_row0)
            if assemble == "twostep":
                np.testing.assert_array_equal(got.view(np.int32),
                                              ref.view(np.int32))
            else:
                np.testing.assert_allclose(got, ref, atol=1e-5,
                                           err_msg=assemble)
    finally:
        densify_mod._ASSEMBLE = old


@pytest.mark.parametrize("steps", [2, 5])
def test_uniform_wsum_constant_matches_device(steps):
    """The compile-time uniform weight plane (round-3 perf win) is
    bitwise what the device stencil computes — coverage counts are
    exact integers in f32 — including row-ranged stripe geometries
    with out-of-window patch rows."""
    w, h, ps = 52, 48, 8
    r = np.random.default_rng(steps)
    for iy_range, out_row0, win_h in [
        (None, 0, h),
        ((2, 9), 16, 24),       # interior window
        ((0, 6), 0, 16),        # frame-top window
    ]:
        geom = make_grid(w, h, steps, iy_range=iy_range)
        n = geom.num_w * geom.num_h
        u = jnp.asarray(r.standard_normal((n, 2)).astype(np.float32) * 3)
        # constant-plane path (weights=None)
        got = np.asarray(densify_mod.densify(u, geom, w, win_h, ps,
                                             out_row0=out_row0))
        # device path: explicit all-ones weights
        ones = jnp.ones(n, jnp.float32)
        want = np.asarray(densify_mod.densify(u, geom, w, win_h, ps, ones,
                                              out_row0=out_row0))
        np.testing.assert_array_equal(got, want)
