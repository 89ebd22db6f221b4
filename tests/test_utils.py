"""Tests for .flo I/O, colorization, metrics, image I/O."""

import os

import numpy as np
import pytest

from dis_tpu.utils import color, flo, metrics
from dis_tpu.utils import io as uio


def test_flo_roundtrip(tmp_path, rng):
    flow = (rng.random((13, 17, 2)) * 20 - 10).astype(np.float32)
    p = str(tmp_path / "a.flo")
    flo.save_flo(p, flow)
    back = flo.load_flo(p)
    np.testing.assert_array_equal(back, flow)
    # header layout: PIEH + w + h little-endian
    raw = open(p, "rb").read()
    assert raw[:4] == b"PIEH"
    import struct
    w, h = struct.unpack("<ii", raw[4:12])
    assert (w, h) == (17, 13)


def test_flo_single_and_quad_channel(tmp_path, rng):
    for c in (1, 4):
        data = rng.random((5, 7, c)).astype(np.float32)
        p = str(tmp_path / f"c{c}.flo")
        flo.save_flo(p, data)
        np.testing.assert_array_equal(flo.load_flo(p, channels=c), data)


def test_flo_rejects_bad_magic(tmp_path):
    p = str(tmp_path / "bad.flo")
    with open(p, "wb") as f:
        f.write(b"XXXX" + b"\0" * 16)
    with pytest.raises(ValueError):
        flo.load_flo(p)


def test_color_wheel_matches_reference_construction():
    wheel = color.make_color_wheel()
    assert wheel.shape == (55, 3)
    # First segment: red->yellow (RY=15), exact integer ramp 255*i//15
    np.testing.assert_array_equal(wheel[0], [255, 0, 0])
    np.testing.assert_array_equal(wheel[14], [255, 255 * 14 // 15, 0])
    # Wheel values all within [0, 255]
    assert wheel.min() >= 0 and wheel.max() <= 255


def test_colorize_against_opencv_semantics(rng):
    # Validate the full colorization against a direct per-pixel port of
    # color_coding.cpp evaluated in pure Python.
    flow = (rng.random((6, 8, 2)) * 4 - 2).astype(np.float32)
    img = color.draw_optical_flow(flow)
    assert img.shape == (6, 8, 3) and img.dtype == np.uint8

    # scalar re-implementation
    fx, fy = flow[..., 0], flow[..., 1]
    maxrad = max(1.0, float(np.sqrt(fx ** 2 + fy ** 2).max()))
    wheel = color.make_color_wheel()
    for y in range(6):
        for x in range(8):
            u, v = flow[y, x] / maxrad
            rad = np.sqrt(u * u + v * v)
            a = np.arctan2(-v, -u) / np.pi
            fk = (a + 1.0) / 2.0 * (55 - 1)
            k0 = int(fk)
            k1 = (k0 + 1) % 55
            f = fk - k0
            for b in range(3):
                col0 = wheel[k0][b] / 255.0
                col1 = wheel[k1][b] / 255.0
                col = (1 - f) * col0 + f * col1
                if rad <= 1:
                    col = 1 - rad * (1 - col)
                else:
                    col *= 0.75
                assert abs(int(img[y, x, 2 - b]) - int(255.0 * col)) <= 1


def test_colorize_invalid_flow_is_black():
    flow = np.full((3, 3, 2), np.nan, np.float32)
    flow[1, 1] = (1e10, 0)
    flow[0, 0] = (1.0, 0.0)
    img = color.draw_optical_flow(flow)
    assert (img[2, 2] == 0).all() and (img[1, 1] == 0).all()
    assert img[0, 0].any()


def test_epe():
    gt = np.zeros((4, 4, 2), np.float32)
    fl = np.zeros((4, 4, 2), np.float32)
    fl[..., 0] = 3.0
    fl[..., 1] = 4.0
    assert metrics.epe(fl, gt) == pytest.approx(5.0)
    # invalid GT excluded
    gt2 = gt.copy()
    gt2[0, 0] = (1e10, 0)
    assert metrics.epe(fl, gt2) == pytest.approx(5.0)


def test_bad_pixel_ratio():
    gt = np.zeros((2, 2, 2), np.float32)
    fl = np.zeros((2, 2, 2), np.float32)
    fl[0, 0] = (10, 0)
    assert metrics.bad_pixel_ratio(fl, gt) == pytest.approx(0.25)


def test_epe_jax_matches_numpy(rng):
    import jax.numpy as jnp
    fl = (rng.random((8, 9, 2)) * 10 - 5).astype(np.float32)
    gt = (rng.random((8, 9, 2)) * 10 - 5).astype(np.float32)
    np.testing.assert_allclose(
        float(metrics.epe_jax(jnp.asarray(fl), jnp.asarray(gt))),
        metrics.epe(fl, gt), rtol=1e-5)


def test_imread_gray_matches_opencv(tmp_path, rng):
    cv2 = pytest.importorskip("cv2")
    rgb = (rng.random((11, 13, 3)) * 255).astype(np.uint8)
    p = str(tmp_path / "img.png")
    from PIL import Image
    Image.fromarray(rgb).save(p)
    want = cv2.imread(p, cv2.IMREAD_GRAYSCALE)
    got = uio.imread_gray(p)
    assert np.max(np.abs(got.astype(int) - want.astype(int))) <= 1
