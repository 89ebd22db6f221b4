"""KITTI 16-bit PNG flow-GT codec tests (round-2 VERDICT item #3).

Cross-validated three ways: the pure-Python codec round-trips, matches
a cv2 oracle in BOTH directions (our writer read by cv2; a cv2-written
file — whose adaptive scanline filters exercise the full unfilter path
— read by us), and matches the native C++ reader bitwise.
"""

import os

import numpy as np
import pytest

from dis_tpu.utils import kitti
from dis_tpu.utils.flo import save_flo


def _rand_flow(h, w, seed=0, scale=30.0):
    r = np.random.default_rng(seed)
    flow = ((r.random((h, w, 2)) - 0.5) * 2 * scale).astype(np.float32)
    valid = r.random((h, w)) > 0.15
    return flow, valid


def _quantize(flow):
    """The format stores flow at 1/64 px steps: writer convention is
    round-half-up on the biased value (devkit uint16 cast)."""
    q = np.floor(np.clip(flow * 64.0 + 32768.0, 0.0, 65535.0) + 0.5)
    return (q - 32768.0) / 64.0


def test_roundtrip_quantized(tmp_path):
    flow, valid = _rand_flow(37, 53, seed=1)
    p = str(tmp_path / "gt.png")
    kitti.save_kitti_flow(p, flow, valid)
    got, got_valid = kitti.load_kitti_flow(p)
    np.testing.assert_array_equal(got_valid, valid)
    want = _quantize(flow)
    want[~valid] = 0.0
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_matches_cv2_oracle_write(tmp_path):
    cv2 = pytest.importorskip("cv2")
    flow, valid = _rand_flow(23, 31, seed=2)
    p = str(tmp_path / "gt.png")
    kitti.save_kitti_flow(p, flow, valid)
    img = cv2.imread(p, cv2.IMREAD_UNCHANGED)
    assert img is not None and img.dtype == np.uint16
    rgb = img[..., ::-1]  # cv2 loads BGR
    ours = kitti.read_png16_rgb(p)
    np.testing.assert_array_equal(rgb, ours)
    # devkit decode from the cv2-read image
    u = (rgb[..., 0].astype(np.float32) - 2.0 ** 15) / 64.0
    got, got_valid = kitti.load_kitti_flow(p)
    np.testing.assert_allclose(got[got_valid, 0], u[got_valid], atol=1e-6)


def test_reads_cv2_written_file(tmp_path):
    """cv2.imwrite uses adaptive per-row filters (sub/up/avg/paeth) —
    exercises the full unfilter path of the pure reader."""
    cv2 = pytest.importorskip("cv2")
    flow, valid = _rand_flow(41, 61, seed=3)
    # smooth flow so the adaptive filter picks varied types
    flow = np.cumsum(flow, axis=0) / 10.0
    img = np.zeros((41, 61, 3), np.uint16)
    img[..., 0] = np.floor(np.clip(flow[..., 0] * 64 + 2 ** 15, 0, 65535) + 0.5)
    img[..., 1] = np.floor(np.clip(flow[..., 1] * 64 + 2 ** 15, 0, 65535) + 0.5)
    img[..., 2] = valid
    p = str(tmp_path / "cv2gt.png")
    assert cv2.imwrite(p, img[..., ::-1])  # cv2 expects BGR
    ours = kitti.read_png16_rgb(p)
    np.testing.assert_array_equal(ours, img)
    got, got_valid = kitti.load_kitti_flow(p)
    np.testing.assert_array_equal(got_valid, valid)
    q = _quantize(flow)
    q[~valid] = 0.0
    np.testing.assert_allclose(got, q, atol=1e-6)


def test_native_reader_matches_python(tmp_path):
    from dis_tpu.utils import native

    if not native.available():
        pytest.skip("native_io not built")
    flow, valid = _rand_flow(29, 43, seed=4)
    p = str(tmp_path / "gt.png")
    kitti.save_kitti_flow(p, flow, valid)
    out = native.kitti_flow_read(p)
    assert out is not None
    nf, nv = out
    pf, pv = kitti.load_kitti_flow(p)
    np.testing.assert_array_equal(nf, pf)
    np.testing.assert_array_equal(nv, pv)


def test_native_writer_matches_python(tmp_path):
    from dis_tpu.utils import native

    if not native.available():
        pytest.skip("native_io not built")
    flow, valid = _rand_flow(19, 27, seed=5)
    p1 = str(tmp_path / "py.png")
    p2 = str(tmp_path / "native.png")
    kitti.save_kitti_flow(p1, flow, valid)
    assert native.kitti_flow_write(p2, flow, valid.astype(np.uint8))
    a, av = kitti.load_kitti_flow(p1)
    b, bv = kitti.load_kitti_flow(p2)
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(av, bv)


def test_load_gt_any_dispatch(tmp_path):
    flow, valid = _rand_flow(16, 24, seed=6)
    # KITTI png
    kitti.save_kitti_flow(str(tmp_path / "k.png"), flow, valid)
    f1, v1 = kitti.load_gt_any(str(tmp_path / "k"))
    assert f1 is not None and v1.dtype == bool
    # Sintel .flo with sentinel invalids
    sflow = flow.copy()
    sflow[0, 0] = 1e10
    save_flo(str(tmp_path / "s.flo"), sflow)
    f2, v2 = kitti.load_gt_any(str(tmp_path / "s"))
    assert f2 is not None
    assert not v2[0, 0] and v2[1:].all()
    # missing
    f3, v3 = kitti.load_gt_any(str(tmp_path / "missing"))
    assert f3 is None and v3 is None


def test_epe_scoring_with_kitti_gt(tmp_path):
    """End-to-end: EPE against KITTI-format GT through the metrics API
    masks invalid pixels."""
    from dis_tpu.utils import metrics

    flow, valid = _rand_flow(16, 24, seed=7, scale=4.0)
    p = str(tmp_path / "gt.png")
    kitti.save_kitti_flow(p, flow, valid)
    gt, gvalid = kitti.load_kitti_flow(p)
    est = gt + 0.5  # constant 0.5px error in u and v
    e = metrics.epe(est, gt, valid=gvalid)
    assert e == pytest.approx(np.sqrt(0.5), rel=1e-5)
