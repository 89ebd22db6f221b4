"""Pallas region-extraction kernel vs XLA extraction (interpret mode).

The production pipeline only enables the kernel on real TPUs; this test
pins its bit-equivalence to the XLA path on CPU via interpret mode.
"""

import numpy as np
import jax.numpy as jnp

from dis_tpu.ops import iclk
from dis_tpu.ops.pallas.extract_kernel import extract_regions_pallas, vmem_ok


import pytest


@pytest.mark.parametrize("ps", [8, 12])
def test_extraction_kernel_matches_xla(rng, ps):
    """NOTE: interpret mode checks the kernel's INDEX math only — the
    round-3 ps=12 bug (dynamic sublane roll over a non-power-of-two
    slab height silently corrupting the rotation) was invisible here
    because interpret mode executes rolls with reference semantics; the
    Mosaic-compiled path is verified bitwise on chip for ps in
    {8, 10, 12, 16} (round-3 fix of _slab_rows, PERF_NOTES)."""
    pad = ps
    img = jnp.asarray((rng.random((72, 200)) * 255).astype(np.float32))
    n = 300
    pos0 = jnp.asarray(np.stack([
        rng.random(n) * 190 - 4,     # x in [-4, 186): includes edges
        rng.random(n) * 62 - 4,
    ], -1).astype(np.float32))
    want, by_w, bx_w = iclk.extract_regions(img, pos0, ps, pad)
    got, by, bx = extract_regions_pallas(img, pos0, ps, pad, block=128,
                                         interpret=True)
    np.testing.assert_array_equal(np.asarray(by), np.asarray(by_w))
    np.testing.assert_array_equal(np.asarray(bx), np.asarray(bx_w))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_vmem_guard():
    assert vmem_ok(1096, 1936, 8)          # 1080p fits
    assert not vmem_ok(2176, 3856, 8)      # 4K does not


def test_banded_extraction_matches_xla(rng):
    """Column-banded DMA kernel (the 4K path) == XLA extraction, with a
    grid-column-structured patch layout and bounded init flow."""
    from dis_tpu.ops.pallas.extract_kernel import (band_width_ok,
                                                   extract_regions_banded)

    ps, pad = 8, 8
    th, tw = 88, 280
    img = jnp.asarray((rng.random((th, tw)) * 255).astype(np.float32))
    # x-outer grid of centers with bounded per-patch init flow
    num_w, num_h, steps = 12, 16, 4
    xs = (np.arange(num_w) * steps + 3).astype(np.float32)
    ys = (np.arange(num_h) * steps + 2).astype(np.float32)
    cx, cy = np.meshgrid(xs, ys, indexing="ij")
    centers = np.stack([cx.ravel(), cy.ravel()], -1)
    bound = 12.0
    init = (rng.random(centers.shape) * 2 - 1) * bound
    pos0 = jnp.asarray((centers + init).astype(np.float32))
    assert band_width_ok(ps, bound)

    want, by_w, bx_w = iclk.extract_regions(img, pos0, ps, pad)
    got, by, bx = extract_regions_banded(img, pos0, ps, pad, num_w, num_h,
                                         interpret=True)
    np.testing.assert_array_equal(np.asarray(by), np.asarray(by_w))
    np.testing.assert_array_equal(np.asarray(bx), np.asarray(bx_w))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_band_width_guard():
    from dis_tpu.ops.pallas.extract_kernel import band_width_ok

    assert band_width_ok(8, 60.0)        # default DIS chain bound
    assert not band_width_ok(8, 130.0)   # too wide for the 384 band


def test_extraction_kernel_batched_vmap(rng):
    """jax.vmap over the extraction kernel must equal per-element runs
    bitwise.  Locks in the custom_vmap rule: the batch folds into the
    kernel grid (pair-major, image DMA'd to VMEM scratch per pair)
    instead of a lax.map that re-copies the regions buffer."""
    import jax

    ps, pad = 8, 8
    imgs = jnp.asarray((rng.random((2, 72, 200)) * 255).astype(np.float32))
    n = 300
    pos0 = jnp.asarray(np.stack([
        rng.random((2, n)) * 190 - 4,
        rng.random((2, n)) * 62 - 4,
    ], -1).astype(np.float32))

    def f(img, p):
        return extract_regions_pallas(img, p, ps, pad, block=128,
                                      interpret=True)

    got, by, bx = jax.vmap(f)(imgs, pos0)
    for i in range(2):
        want, by_w, bx_w = f(imgs[i], pos0[i])
        np.testing.assert_array_equal(np.asarray(got[i]), np.asarray(want))
        np.testing.assert_array_equal(np.asarray(by[i]), np.asarray(by_w))
        np.testing.assert_array_equal(np.asarray(bx[i]), np.asarray(bx_w))
