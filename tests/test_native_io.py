"""Native I/O library vs the pure-Python implementations."""

import numpy as np
import pytest

from dis_tpu.utils import color, flo, native
from dis_tpu.utils import io as uio


@pytest.fixture(scope="module", autouse=True)
def require_native():
    if not native.available():
        pytest.skip("native_io library unavailable (no compiler?)")


def test_png_decode_matches_pil(tmp_path, rng):
    from PIL import Image
    for mode, shape in [("L", (21, 33)), ("RGB", (17, 25, 3)),
                        ("RGBA", (9, 13, 4))]:
        arr = (rng.random(shape) * 255).astype(np.uint8)
        p = str(tmp_path / f"{mode}.png")
        Image.fromarray(arr, mode=mode).save(p)
        got = native.png_decode_gray(open(p, "rb").read())
        assert got is not None, mode
        want = uio.imread_gray(p)
        assert np.max(np.abs(got.astype(int) - want.astype(int))) <= 1, mode


def test_flo_roundtrip_native(tmp_path, rng):
    flow = (rng.random((11, 7, 2)) * 8 - 4).astype(np.float32)
    p = str(tmp_path / "n.flo")
    assert native.flo_write(p, flow)
    # cross-read with the Python codec and vice versa
    np.testing.assert_array_equal(flo.load_flo(p), flow)
    back = native.flo_read(p)
    np.testing.assert_array_equal(back, flow)
    p2 = str(tmp_path / "p.flo")
    flo.save_flo(p2, flow)
    np.testing.assert_array_equal(native.flo_read(p2), flow)


def test_flow_to_bgr_matches_python(rng):
    flow = (rng.random((14, 9, 2)) * 6 - 3).astype(np.float32)
    flow[0, 0] = (np.nan, 1.0)
    want = color.draw_optical_flow(flow)
    got = native.flow_to_bgr(flow)
    assert got is not None
    assert np.max(np.abs(got.astype(int) - want.astype(int))) <= 1
