"""ctypes bindings for the native host-side I/O runtime.

``tools/native_io`` provides PNG-gray decode, the .flo codec, and
color-wheel rasterization in C++ (the reference's host runtime is
native too — OpenCV + its own .flo code).  All call sites degrade to
the pure-Python implementations when the library isn't built, so the
package works everywhere; the native path removes Python/PIL overhead
from the per-frame loop.

Build: ``make -C tools/native_io`` (done automatically on first use if
a compiler is available).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_DIR = os.path.join(_ROOT, "tools", "native_io")
_SO = os.path.join(_DIR, "libnative_io.so")

_lib = None
_lock = threading.Lock()
_tried = False
_has_kitti = False

# Upper bound on pixel count accepted from an untrusted PNG IHDR before
# allocating; rejects corrupt/hostile headers that would trigger multi-GB
# np.empty calls (the native codec re-validates after decode).
_MAX_PIXELS = 100_000_000


def _dims_ok(w: int, h: int) -> bool:
    return 0 < w and 0 < h and w * h <= _MAX_PIXELS


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        # Let `make` decide staleness from file mtimes (sources vs .so)
        # BEFORE the first dlopen: ctypes cannot reliably unload an
        # already-mapped library, so rebuilding after a CDLL of a stale
        # .so would keep serving the old image.  make is a no-op when
        # the .so is current.
        if os.path.exists(os.path.join(_DIR, "Makefile")):
            try:
                subprocess.run(["make", "-C", _DIR], check=True,
                               capture_output=True, timeout=120)
            except Exception:
                pass  # a prebuilt .so may still be usable below
        if not os.path.exists(_SO):
            return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.png_decode_gray.restype = ctypes.c_int
        lib.png_decode_gray.argtypes = [
            ctypes.c_char_p, ctypes.c_long, ctypes.c_char_p, ctypes.c_long,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.flo_write.restype = ctypes.c_int
        lib.flo_write.argtypes = [ctypes.c_char_p, ctypes.c_void_p,
                                  ctypes.c_int, ctypes.c_int, ctypes.c_int]
        lib.flo_peek.restype = ctypes.c_int
        lib.flo_peek.argtypes = [ctypes.c_char_p,
                                 ctypes.POINTER(ctypes.c_int),
                                 ctypes.POINTER(ctypes.c_int)]
        lib.flo_read.restype = ctypes.c_int
        lib.flo_read.argtypes = [ctypes.c_char_p, ctypes.c_void_p,
                                 ctypes.c_long, ctypes.c_int]
        lib.flow_to_bgr.restype = None
        lib.flow_to_bgr.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                    ctypes.c_int, ctypes.c_float,
                                    ctypes.c_void_p]
        # KITTI flow-GT codec arrived in a later build.  If a stale .so
        # survived the make attempt above (e.g. no compiler available),
        # keep serving the symbols it DOES have and only mark the KITTI
        # entry points unavailable instead of disabling all native I/O.
        global _has_kitti
        _has_kitti = all(hasattr(lib, s) for s in
                         ("kitti_flow_read", "kitti_flow_write", "png_peek"))
        if not _has_kitti:
            _lib = lib
            return _lib
        lib.kitti_flow_read.restype = ctypes.c_int
        lib.kitti_flow_read.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p, ctypes.c_long,
            ctypes.c_void_p, ctypes.c_long,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.kitti_flow_write.restype = ctypes.c_int
        lib.kitti_flow_write.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int, ctypes.c_int]
        lib.png_peek.restype = ctypes.c_int
        lib.png_peek.argtypes = [ctypes.c_char_p,
                                 ctypes.POINTER(ctypes.c_int),
                                 ctypes.POINTER(ctypes.c_int)]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def png_decode_gray(data: bytes) -> Optional[np.ndarray]:
    """Decode PNG bytes to uint8 gray; None if unsupported/unavailable."""
    lib = _load()
    if lib is None:
        return None
    cap = len(data) * 64 + (1 << 20)  # generous: decompressed gray bound
    out = np.empty(cap, np.uint8)
    w = ctypes.c_int()
    h = ctypes.c_int()
    rc = lib.png_decode_gray(
        data, len(data), out.ctypes.data_as(ctypes.c_char_p), cap,
        ctypes.byref(w), ctypes.byref(h))
    if rc != 0:
        return None
    return out[: w.value * h.value].reshape(h.value, w.value).copy()


def flo_write(path: str, data: np.ndarray) -> bool:
    lib = _load()
    if lib is None:
        return False
    arr = np.ascontiguousarray(data, dtype="<f4")
    if arr.ndim == 2:
        arr = arr[..., None]
    h, w, c = arr.shape
    return lib.flo_write(path.encode(), arr.ctypes.data, w, h, c) == 0


def flo_read(path: str, channels: int = 2) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    if lib.flo_peek(path.encode(), ctypes.byref(w), ctypes.byref(h)) != 0:
        return None
    out = np.empty((h.value, w.value, channels), "<f4")
    rc = lib.flo_read(path.encode(), out.ctypes.data, out.size, channels)
    return out if rc == 0 else None


def kitti_flow_read(path: str):
    """Native KITTI GT decode -> (flow [H,W,2] f32, valid [H,W] bool),
    or None when the library is unavailable or the file unsupported."""
    lib = _load()
    if lib is None or not _has_kitti:
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    if lib.png_peek(path.encode(), ctypes.byref(w), ctypes.byref(h)) != 0:
        return None
    if not _dims_ok(w.value, h.value):  # untrusted IHDR: bound before alloc
        return None
    flow = np.empty((h.value, w.value, 2), np.float32)
    valid = np.empty((h.value, w.value), np.uint8)
    rc = lib.kitti_flow_read(path.encode(), flow.ctypes.data, flow.size,
                             valid.ctypes.data, valid.size,
                             ctypes.byref(w), ctypes.byref(h))
    if rc != 0:
        return None
    return flow, valid.astype(bool)


def kitti_flow_write(path: str, flow: np.ndarray,
                     valid: Optional[np.ndarray] = None) -> bool:
    lib = _load()
    if lib is None or not _has_kitti:
        return False
    arr = np.ascontiguousarray(flow, np.float32)
    h, w = arr.shape[:2]
    vptr = None
    if valid is not None:
        varr = np.ascontiguousarray(valid, np.uint8)
        vptr = varr.ctypes.data
    return lib.kitti_flow_write(path.encode(), arr.ctypes.data,
                                vptr, w, h) == 0


def flow_to_bgr(flow: np.ndarray, maxmotion: float = -1.0) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    arr = np.ascontiguousarray(flow, dtype=np.float32)
    h, w = arr.shape[:2]
    out = np.empty((h, w, 3), np.uint8)
    lib.flow_to_bgr(arr.ctypes.data, w, h, ctypes.c_float(maxmotion),
                    out.ctypes.data)
    return out
