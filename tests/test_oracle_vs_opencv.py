"""Validate the NumPy oracle's OpenCV-exact primitives against cv2.

These pin the external-library semantics the reference depends on
(SURVEY.md §2 "External-library semantics"): Sobel 3x3 scale-1/8 with
reflect-101 border, INTER_LINEAR x0.5 decimation and general resize,
copyMakeBorder modes, and BGR->gray conversion.
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from dis_tpu.oracle import reference_semantics as spec


@pytest.fixture
def img(rng):
    return (rng.random((37, 53)) * 255).astype(np.float32)


def test_sobel_dx(img):
    want = cv2.Sobel(img, cv2.CV_32F, 1, 0, ksize=3, scale=1 / 8.0,
                     delta=0, borderType=cv2.BORDER_DEFAULT)
    got = spec.sobel3(img, "x")
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-4)


def test_sobel_dy(img):
    want = cv2.Sobel(img, cv2.CV_32F, 0, 1, ksize=3, scale=1 / 8.0,
                     delta=0, borderType=cv2.BORDER_DEFAULT)
    got = spec.sobel3(img, "y")
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-4)


def test_resize_half(rng):
    img = (rng.random((44, 60)) * 255).astype(np.float32)
    want = cv2.resize(img, None, fx=0.5, fy=0.5, interpolation=cv2.INTER_LINEAR)
    got = spec.resize_half(img)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-3)


def test_resize_bilinear_up2(rng):
    img = (rng.random((20, 30)) * 255).astype(np.float32)
    want = cv2.resize(img, None, fx=2.0, fy=2.0, interpolation=cv2.INTER_LINEAR)
    got = spec.resize_bilinear(img, 60, 40)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-3)


def test_resize_bilinear_up2_2ch(rng):
    img = (rng.random((16, 22, 2)) * 10 - 5).astype(np.float32)
    want = cv2.resize(img, None, fx=2.0, fy=2.0, interpolation=cv2.INTER_LINEAR)
    got = spec.resize_bilinear(img, 44, 32)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-4)


def test_replicate_pad(img):
    want = cv2.copyMakeBorder(img, 3, 4, 5, 6, cv2.BORDER_REPLICATE)
    got = spec.replicate_pad(img, 3, 4, 5, 6)
    np.testing.assert_array_equal(got, want)


def test_constant_pad(img):
    want = cv2.copyMakeBorder(img, 2, 2, 2, 2, cv2.BORDER_CONSTANT, value=0)
    got = spec.constant_pad(img, 2, 2, 2, 2)
    np.testing.assert_array_equal(got, want)


def test_reflect101_pad(img):
    want = cv2.copyMakeBorder(img, 1, 1, 1, 1, cv2.BORDER_DEFAULT)
    got = spec.reflect101_pad(img, 1)
    np.testing.assert_array_equal(got, want)


def test_bgr_to_gray(rng):
    bgr = (rng.random((13, 17, 3)) * 255).astype(np.uint8)
    want = cv2.cvtColor(bgr, cv2.COLOR_BGR2GRAY)
    got = spec.bgr_to_gray(bgr)
    # cv2 may differ by 1 LSB on some platforms due to SIMD rounding.
    assert np.max(np.abs(got.astype(int) - want.astype(int))) <= 1


def test_pad_divisible_matches_reference_split(rng):
    # main.cpp:140-155 splits padding floor/2 top-left, ceil/2 bottom-right.
    img = (rng.random((55, 101)) * 255).astype(np.float32)
    padded, (padw, padh) = spec.pad_divisible(img, 3)
    assert padded.shape[0] % 8 == 0 and padded.shape[1] % 8 == 0
    assert padw == (8 - 101 % 8) % 8 and padh == (8 - 55 % 8) % 8
    want = cv2.copyMakeBorder(
        img, padh // 2, padh - padh // 2, padw // 2, padw - padw // 2,
        cv2.BORDER_REPLICATE)
    np.testing.assert_array_equal(padded, want)
    # crop inverts the pad
    crop = spec.crop_padding(
        np.stack([padded, padded], -1), padw, padh, 101, 55)
    np.testing.assert_array_equal(crop[..., 0], img)


def test_full_pyramid_chain_vs_opencv(rng):
    """The complete pyramid recipe (main.cpp:12-50) replayed with cv2."""
    img = (rng.random((56, 72)) * 255).astype(np.float32)
    coarsest, pad = 3, 8
    got_img, got_dx, got_dy = spec.construct_pyramid(img, coarsest, pad)

    lvl = None
    for i in range(coarsest + 1):
        if i == 0:
            dx = cv2.Sobel(img, cv2.CV_32F, 1, 0, ksize=3, scale=1 / 8.0)
            dy = cv2.Sobel(img, cv2.CV_32F, 0, 1, ksize=3, scale=1 / 8.0)
            lvl = cv2.sqrt(dx * dx + dy * dy)
        else:
            lvl = cv2.resize(lvl, None, fx=0.5, fy=0.5,
                             interpolation=cv2.INTER_LINEAR)
        ldx = cv2.Sobel(lvl, cv2.CV_32F, 1, 0, ksize=3, scale=1 / 8.0)
        ldy = cv2.Sobel(lvl, cv2.CV_32F, 0, 1, ksize=3, scale=1 / 8.0)
        want_img = cv2.copyMakeBorder(lvl, pad, pad, pad, pad,
                                      cv2.BORDER_REPLICATE)
        want_dx = cv2.copyMakeBorder(ldx, pad, pad, pad, pad,
                                     cv2.BORDER_CONSTANT, value=0)
        want_dy = cv2.copyMakeBorder(ldy, pad, pad, pad, pad,
                                     cv2.BORDER_CONSTANT, value=0)
        np.testing.assert_allclose(got_img[i], want_img, atol=5e-3,
                                   err_msg=f"img level {i}")
        np.testing.assert_allclose(got_dx[i], want_dx, atol=5e-3,
                                   err_msg=f"dx level {i}")
        np.testing.assert_allclose(got_dy[i], want_dy, atol=5e-3,
                                   err_msg=f"dy level {i}")
