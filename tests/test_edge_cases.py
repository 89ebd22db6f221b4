"""Edge cases: tiny images, extreme configs, degenerate content."""

import numpy as np
import pytest
import jax.numpy as jnp

from dis_tpu.config import DISConfig
from dis_tpu.models.dis import dis_flow, dis_flow_padded
from dis_tpu.oracle import reference_semantics as spec
from dis_tpu.ops.densify import densify
from dis_tpu.ops.grid import make_grid


def test_tiny_image():
    r = np.random.default_rng(0)
    i1 = (r.random((16, 16)) * 255).astype(np.float32)
    i2 = (r.random((16, 16)) * 255).astype(np.float32)
    cfg = DISConfig(iterations=4, coarsest_scale=1, patch_overlap=0.5)
    f = np.asarray(dis_flow(jnp.asarray(i1), jnp.asarray(i2), cfg))
    assert f.shape == (16, 16, 2) and np.isfinite(f).all()


def test_zero_iterations():
    # iterations=0 still runs one loop body (counter semantics of
    # patch.cpp:165-201: the check is counter > iterations AFTER work).
    r = np.random.default_rng(1)
    i1 = (r.random((24, 32)) * 255).astype(np.float32)
    i2 = i1.copy()
    cfg = DISConfig(iterations=0, coarsest_scale=1, early_exit=False)
    want = spec.dis_flow_oracle(i1, i2, cfg)
    got = np.asarray(dis_flow_padded(jnp.asarray(i1), jnp.asarray(i2), cfg))
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_flat_image_no_nan():
    flat = np.full((32, 32), 100.0, np.float32)
    cfg = DISConfig(iterations=8, coarsest_scale=2)
    f = np.asarray(dis_flow(jnp.asarray(flat), jnp.asarray(flat), cfg))
    # det==0 guard (patch.cpp:86-90) must keep everything finite
    assert np.isfinite(f).all()


def test_identical_frames_zero_flow():
    r = np.random.default_rng(2)
    from scipy.signal import convolve2d
    img = convolve2d((r.random((40, 48)) * 255).astype(np.float32),
                     np.ones((5, 5), np.float32) / 25, "same", "symm")
    cfg = DISConfig(iterations=16, coarsest_scale=2, mode="fixed")
    f = np.asarray(dis_flow(jnp.asarray(img.astype(np.float32)),
                            jnp.asarray(img.astype(np.float32)), cfg))
    assert np.abs(f).max() < 0.1, np.abs(f).max()


def test_large_overlap_stride_one():
    # patch_overlap ~1.0 -> steps = 1 (max density, optical_flow.cpp:38)
    cfg = DISConfig(iterations=2, coarsest_scale=1, patch_overlap=0.95)
    assert cfg.steps == 1
    r = np.random.default_rng(3)
    i1 = (r.random((16, 24)) * 255).astype(np.float32)
    i2 = (r.random((16, 24)) * 255).astype(np.float32)
    f = np.asarray(dis_flow_padded(jnp.asarray(i1), jnp.asarray(i2), cfg))
    assert f.shape == (16, 24, 2)


def test_densify_random_geometries(rng):
    for trial in range(6):
        w = int(rng.integers(9, 60))
        h = int(rng.integers(9, 40))
        steps = int(rng.integers(1, 9))
        ps = 8
        geom = make_grid(w, h, steps)
        u = (rng.random((geom.centers.shape[0], 2)) * 6 - 3).astype(np.float32)
        want = spec.densify(u, geom.centers, w, h, ps)
        got = np.asarray(densify(jnp.asarray(u), geom, w, h, ps))
        np.testing.assert_allclose(got, want, atol=1e-4,
                                   err_msg=f"{w}x{h} steps={steps}")


def test_config_validation():
    with pytest.raises(ValueError):
        DISConfig(mode="bogus")
    with pytest.raises(ValueError):
        DISConfig(patch_size=7)
    with pytest.raises(ValueError):
        DISConfig(finest_scale=4, coarsest_scale=3)
    with pytest.raises(ValueError):
        DISConfig(sampler="nope")
    with pytest.raises(ValueError):
        DISConfig(kernel="gpu")


def test_non_divisible_input_padding_roundtrip():
    r = np.random.default_rng(4)
    for (h, w) in [(17, 23), (31, 65), (100, 99)]:
        i1 = (r.random((h, w)) * 255).astype(np.float32)
        i2 = (r.random((h, w)) * 255).astype(np.float32)
        cfg = DISConfig(iterations=2, coarsest_scale=3)
        f = np.asarray(dis_flow(jnp.asarray(i1), jnp.asarray(i2), cfg))
        assert f.shape == (h, w, 2)
