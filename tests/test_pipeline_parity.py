"""JAX pipeline vs NumPy oracle: stage-by-stage and end-to-end parity.

The oracle (``dis_tpu.oracle.reference_semantics``) is the executable
spec of the reference's semantics; every JAX stage must match it within
float32 tolerance on small inputs.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dis_tpu.config import DISConfig
from dis_tpu.oracle import reference_semantics as spec
from dis_tpu.ops import image as im
from dis_tpu.ops import iclk
from dis_tpu.ops.densify import densify
from dis_tpu.ops.grid import make_grid
from dis_tpu.ops.pyramid import construct_pyramid
from dis_tpu.models.dis import dis_flow_padded, dis_flow

CFG = DISConfig(iterations=12, coarsest_scale=2, patch_overlap=0.5,
                early_exit=False)


def test_sobel_matches_oracle(rng):
    img = (rng.random((32, 48)) * 255).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(im.sobel3(jnp.asarray(img), "x")), spec.sobel3(img, "x"),
        atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(im.sobel3(jnp.asarray(img), "y")), spec.sobel3(img, "y"),
        atol=1e-4)


def test_pyramid_matches_oracle(rng):
    img = (rng.random((32, 48)) * 255).astype(np.float32)
    want_img, want_dx, want_dy = spec.construct_pyramid(img, 2, 8)
    got = construct_pyramid(jnp.asarray(img), 2, 8)
    for s in range(3):
        np.testing.assert_allclose(np.asarray(got[s].img), want_img[s], atol=2e-3)
        np.testing.assert_allclose(np.asarray(got[s].dx), want_dx[s], atol=2e-3)
        np.testing.assert_allclose(np.asarray(got[s].dy), want_dy[s], atol=2e-3)


def test_grid_matches_oracle():
    for (w, h, steps) in [(48, 32, 2), (37, 23, 4), (64, 64, 5), (8, 8, 8)]:
        want = spec.grid_centers(w, h, steps)
        got = make_grid(w, h, steps)
        np.testing.assert_array_equal(got.centers, want)
        assert got.num_w * got.num_h == want.shape[0]


def test_templates_and_hessian_match(rng):
    img = (rng.random((40, 40)) * 255).astype(np.float32)
    ps, pad = 8, 8
    pyr_i, pyr_dx, pyr_dy = spec.construct_pyramid(img, 0, pad)
    centers = spec.grid_centers(40, 40, 4)
    tmp_w = 40 + 2 * pad
    T, Tdx, Tdy = spec.extract_templates(
        pyr_i[0], pyr_dx[0], pyr_dy[0], centers, ps, pad, tmp_w)
    H = spec.hessians(Tdx, Tdy)

    tpl = iclk.extract_templates(
        jnp.asarray(pyr_i[0]), jnp.asarray(pyr_dx[0]), jnp.asarray(pyr_dy[0]),
        jnp.asarray(centers), ps, pad)
    np.testing.assert_allclose(np.asarray(tpl.T), T, atol=1e-4)
    np.testing.assert_allclose(np.asarray(tpl.Tdx), Tdx, atol=1e-4)
    np.testing.assert_allclose(np.asarray(tpl.Tdy), Tdy, atol=1e-4)
    # Hinv vs H: check H @ Hinv == I
    got_inv = np.asarray(tpl.Hinv)
    prod = np.einsum("nij,njk->nik", H, got_inv)
    eye = np.broadcast_to(np.eye(2, dtype=np.float32), prod.shape)
    np.testing.assert_allclose(prod, eye, atol=1e-3)


def test_templates_grid_matches_gather(rng):
    img = jnp.asarray((rng.random((64, 80)) * 255).astype(np.float32))
    dx = jnp.asarray((rng.random((64, 80)) * 2 - 1).astype(np.float32))
    dy = jnp.asarray((rng.random((64, 80)) * 2 - 1).astype(np.float32))
    for (w, h, s) in [(48, 32, 5), (47, 31, 2), (40, 32, 8)]:
        geom = make_grid(w, h, s)
        im, dxx, dyy = img[:h + 16, :w + 16], dx[:h + 16, :w + 16], dy[:h + 16, :w + 16]
        want = iclk.extract_templates(im, dxx, dyy, jnp.asarray(geom.centers), 8, 8)
        got = iclk.extract_templates_grid(im, dxx, dyy, geom, 8, 8)
        for name in ("T", "Tdx", "Tdy", "Hinv"):
            np.testing.assert_allclose(
                np.asarray(getattr(got, name)), np.asarray(getattr(want, name)),
                atol=1e-5, err_msg=f"{name} @ {w}x{h}/{s}")


def test_sample_patches_match(rng):
    img = (rng.random((56, 56)) * 255).astype(np.float32)
    ps, pad = 8, 8
    tmp_w = 56
    # positions include integers, fractions, negatives near bounds
    pos = np.array([[5.0, 5.0], [10.25, 7.75], [-3.5, -2.0], [30.001, 19.999],
                    [0.0, 0.0], [12.0, 33.0]], np.float32)
    want = spec.sample_patches(img, pos, ps, pad, tmp_w, True)
    got = iclk.sample_patches(jnp.asarray(img), jnp.asarray(pos), ps, pad, True)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-3)
    want = spec.sample_patches(img, pos, ps, pad, tmp_w, False)
    got = iclk.sample_patches(jnp.asarray(img), jnp.asarray(pos), ps, pad, False)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-3)


def test_densify_matches_oracle(rng):
    w, h, ps, steps = 48, 32, 8, 2
    geom = make_grid(w, h, steps)
    n = geom.centers.shape[0]
    u = (rng.random((n, 2)) * 4 - 2).astype(np.float32)
    want = spec.densify(u, geom.centers, w, h, ps)
    got = np.asarray(densify(jnp.asarray(u), geom, w, h, ps))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_densify_weighted_matches_oracle(rng):
    w, h, ps, steps = 40, 24, 8, 4
    geom = make_grid(w, h, steps)
    n = geom.centers.shape[0]
    u = (rng.random((n, 2)) * 4 - 2).astype(np.float32)
    wt = (rng.random(n) * 0.9 + 0.1).astype(np.float32)
    want = spec.densify(u, geom.centers, w, h, ps, wt)
    got = np.asarray(densify(jnp.asarray(u), geom, w, h, ps, jnp.asarray(wt)))
    np.testing.assert_allclose(got, want, atol=1e-4)


@pytest.mark.parametrize("mode", ["compat", "fixed"])
def test_end_to_end_matches_oracle(small_pair, mode):
    i1, i2 = small_pair
    cfg = DISConfig(iterations=12, coarsest_scale=2, patch_overlap=0.5,
                    early_exit=False, mode=mode)
    want = spec.dis_flow_oracle(i1, i2, cfg)
    got = np.asarray(dis_flow_padded(jnp.asarray(i1), jnp.asarray(i2), cfg))
    assert got.shape == want.shape
    err = np.abs(got - want)
    # float32 accumulation-order differences only
    assert np.nanmax(err) < 1e-2, f"max abs diff {np.nanmax(err)}"


def test_end_to_end_recovers_translation(small_pair):
    i1, i2 = small_pair
    cfg = DISConfig(iterations=30, coarsest_scale=2, patch_overlap=0.5,
                    mode="fixed")
    flow = np.asarray(dis_flow(jnp.asarray(i1), jnp.asarray(i2), cfg))
    # interior region: flow should approximate the (2, 1) shift
    inner = flow[12:-12, 12:-12]
    med = np.median(inner.reshape(-1, 2), axis=0)
    assert abs(med[0] - 2.0) < 0.5, med
    assert abs(med[1] - 1.0) < 0.5, med


def test_jit_and_early_exit_equivalence(small_pair):
    i1, i2 = small_pair
    c1 = DISConfig(iterations=12, coarsest_scale=2, patch_overlap=0.5,
                   early_exit=False)
    c2 = DISConfig(iterations=12, coarsest_scale=2, patch_overlap=0.5,
                   early_exit=True)
    f1 = np.asarray(dis_flow_padded(jnp.asarray(i1), jnp.asarray(i2), c1))
    f2 = np.asarray(dis_flow_padded(jnp.asarray(i1), jnp.asarray(i2), c2))
    np.testing.assert_allclose(f1, f2, atol=1e-5)


@pytest.mark.slow
def test_unpadded_input_shapes():
    r = np.random.default_rng(7)
    i1 = (r.random((30, 41)) * 255).astype(np.float32)
    i2 = (r.random((30, 41)) * 255).astype(np.float32)
    cfg = DISConfig(iterations=4, coarsest_scale=3)
    flow = np.asarray(dis_flow(jnp.asarray(i1), jnp.asarray(i2), cfg))
    assert flow.shape == (30, 41, 2)


def test_finest_scale_upsample_path():
    r = np.random.default_rng(8)
    i1 = (r.random((32, 48)) * 255).astype(np.float32)
    i2 = (r.random((32, 48)) * 255).astype(np.float32)
    cfg = DISConfig(iterations=4, coarsest_scale=3, finest_scale=1)
    flow = np.asarray(dis_flow(jnp.asarray(i1), jnp.asarray(i2), cfg))
    assert flow.shape == (32, 48, 2)


def test_templates_conv_matches_slices():
    """The MXU patches-conv template route (one one-hot identity conv at
    HIGHEST precision) must reproduce the strided-slice taps bit-for-bit
    (it exists to replace ~4.6 ms/frame of slice ops, not to change
    values)."""
    import dis_tpu.ops.iclk as iclk_mod
    from conftest import synthetic_pair

    i1, _ = synthetic_pair(72, 104, shift=(2.0, 1.0), seed=41)
    lv = construct_pyramid(jnp.asarray(i1), 0, 8)[0]
    geom = make_grid(lv.width, lv.height, 5)
    old = iclk_mod._TEMPLATES
    try:
        iclk_mod._TEMPLATES = "slices"
        want = iclk_mod.extract_templates_grid(lv.img, lv.dx, lv.dy, geom, 8, 8)
        gots = {}
        for mode in ("conv", "stacked3", "rw", "twostage", "twostage_rw",
                     "twostage_rw_t"):
            iclk_mod._TEMPLATES = mode
            gots[mode] = iclk_mod.extract_templates_grid(
                lv.img, lv.dx, lv.dy, geom, 8, 8)
    finally:
        iclk_mod._TEMPLATES = old
    for mode, got in gots.items():
        for name in ("T", "Tdx", "Tdy", "Hinv"):
            np.testing.assert_array_equal(np.asarray(getattr(got, name)),
                                          np.asarray(getattr(want, name)),
                                          err_msg=f"{mode}:{name}")
