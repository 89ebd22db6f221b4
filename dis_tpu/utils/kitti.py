"""KITTI optical-flow ground-truth codec (16-bit RGB PNG).

KITTI 2012/2015 store flow GT as 3-channel uint16 PNGs (devkit
``flow_read.m`` / ``flow_write.m``):

    u = (ch0 - 2**15) / 64.0
    v = (ch1 - 2**15) / 64.0
    valid = ch2 > 0         (invalid pixels are written as all-zero)

The reference repo was validated on Sintel (``.flo`` GT — the
author's commented check at ``/root/reference/src/main.cpp:123-132``);
this module adds the other major benchmark's GT format so
``--gt-dir`` / ``benchmarks/accuracy.py`` can score EPE on both the
moment real data is mounted (round-2 VERDICT item #3).

The PNG layer is self-contained (zlib + paletteless truecolor only):
no OpenCV/PIL dependency in the package.  The reader handles every
scanline filter type (real KITTI files are OpenCV-written with
adaptive filters); the writer emits filter-0 rows.  The native reader
(tools/native_io) implements the same decode in C++; both are gated
against each other and against a cv2 oracle in tests/test_kitti.py.
"""

from __future__ import annotations

import struct
import zlib
from typing import Optional, Tuple

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa = abs(p - a)
    pb = abs(p - b)
    pc = abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Undo PNG scanline filtering.  ``raw`` is the decompressed stream
    ([h * (1 + stride)] bytes); returns [h, stride] uint8."""
    out = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    pos = 0
    for y in range(h):
        ftype = raw[pos]
        row = raw[pos + 1:pos + 1 + stride].copy()
        pos += 1 + stride
        if ftype == 0:
            rec = row
        elif ftype == 1:   # Sub: recon[i] = row[i] + recon[i - bpp]
            rec = row
            # prefix dependency along each byte lane modulo bpp:
            # cumulative sum with uint8 wraparound == mod-256 arithmetic
            for lane in range(bpp):
                rec[lane::bpp] = np.cumsum(rec[lane::bpp],
                                           dtype=np.uint32).astype(np.uint8)
        elif ftype == 2:   # Up
            rec = (row.astype(np.uint16) + prev).astype(np.uint8)
        elif ftype == 3:   # Average
            rec = row
            left = np.zeros(bpp, np.uint16)
            for i in range(0, stride, bpp):
                seg = ((rec[i:i + bpp].astype(np.uint16)
                        + ((left + prev[i:i + bpp]) >> 1)) & 0xFF)
                rec[i:i + bpp] = seg.astype(np.uint8)
                left = seg
        elif ftype == 4:   # Paeth (sequential left dependency)
            rec = row.astype(np.int32)
            pr = prev.astype(np.int32)
            for i in range(stride):
                a = rec[i - bpp] if i >= bpp else 0
                b = pr[i]
                c = pr[i - bpp] if i >= bpp else 0
                rec[i] = (rec[i] + _paeth(a, b, c)) & 0xFF
            rec = rec.astype(np.uint8)
        else:
            raise ValueError(f"unsupported PNG filter type {ftype}")
        out[y] = rec
        prev = rec
    return out


def read_png16_rgb(path: str) -> np.ndarray:
    """Decode a 16-bit truecolor (or 16-bit gray) non-interlaced PNG to
    uint16 [H, W, C]."""
    with open(path, "rb") as f:
        buf = f.read()
    if buf[:8] != _PNG_SIG:
        raise ValueError(f"{path}: not a PNG file")
    pos = 8
    width = height = depth = ctype = None
    idat = []
    while pos + 8 <= len(buf):
        length, tag = struct.unpack(">I4s", buf[pos:pos + 8])
        data = buf[pos + 8:pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            width, height, depth, ctype, comp, filt, ilace = struct.unpack(
                ">IIBBBBB", data)
            if ilace:
                raise ValueError(f"{path}: interlaced PNG unsupported")
            if comp or filt:
                raise ValueError(f"{path}: nonstandard compression/filter")
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError(f"{path}: missing IHDR")
    if not (0 < width and 0 < height and width * height <= 100_000_000):
        # untrusted header: bound dims before any dim-sized allocation
        raise ValueError(f"{path}: implausible PNG dims {width}x{height}")
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(ctype)
    if channels is None:
        raise ValueError(f"{path}: unsupported PNG color type {ctype}")
    if depth != 16:
        raise ValueError(f"{path}: expected 16-bit PNG, got {depth}-bit")
    bpp = channels * 2
    stride = width * bpp
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), np.uint8)
    if raw.size != height * (1 + stride):
        raise ValueError(f"{path}: PNG payload size mismatch")
    rows = _unfilter(raw, height, stride, bpp)
    # 16-bit PNG samples are big-endian
    return rows.reshape(height, width, channels, 2).astype(np.uint16)[
        ..., 0] * 256 + rows.reshape(height, width, channels, 2)[..., 1]


def write_png16_rgb(path: str, img: np.ndarray) -> None:
    """Write uint16 [H, W, 3] as a 16-bit truecolor PNG (filter 0)."""
    img = np.ascontiguousarray(img, np.uint16)
    h, w, c = img.shape
    if c != 3:
        raise ValueError("write_png16_rgb expects [H, W, 3]")
    be = img.astype(">u2").tobytes()
    stride = w * 6
    rows = b"".join(
        b"\x00" + be[y * stride:(y + 1) * stride] for y in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 16, 2, 0, 0, 0)
    with open(path, "wb") as f:
        f.write(_PNG_SIG)
        f.write(chunk(b"IHDR", ihdr))
        f.write(chunk(b"IDAT", zlib.compress(rows, 6)))
        f.write(chunk(b"IEND", b""))


def load_kitti_flow(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Read KITTI flow GT: returns (flow [H, W, 2] float32,
    valid [H, W] bool)."""
    img = read_png16_rgb(path)
    if img.shape[-1] != 3:
        raise ValueError(f"{path}: KITTI flow GT must have 3 channels")
    u = (img[..., 0].astype(np.float32) - 32768.0) / 64.0
    v = (img[..., 1].astype(np.float32) - 32768.0) / 64.0
    valid = img[..., 2] > 0
    flow = np.stack([u, v], axis=-1)
    flow[~valid] = 0.0
    return flow, valid


def save_kitti_flow(path: str, flow: np.ndarray,
                    valid: Optional[np.ndarray] = None) -> None:
    """Write flow [H, W, 2] (+ optional validity mask) in KITTI GT
    format.  Values are clamped to the format's representable range
    [-512, 511.984] px at 1/64 px quantization.

    Quantization rounds half UP (floor(q + 0.5)), following the Matlab
    devkit's flow_write rounding and our native writer.  The C++ devkit
    (io_flow.h FlowImage::write) instead TRUNCATES on its uint16 cast,
    so files it writes can differ by 1/64 px on exact-half values —
    harmless for reading GT, but note the convention if byte-comparing
    against C++-devkit-written files."""
    flow = np.asarray(flow, np.float32)
    h, w = flow.shape[:2]
    if valid is None:
        valid = np.ones((h, w), bool)
    q = np.clip(flow * 64.0 + 32768.0, 0.0, 65535.0)
    img = np.zeros((h, w, 3), np.uint16)
    # round half UP (devkit's uint16 cast convention; matches the
    # native writer's +0.5 truncation — q is non-negative here)
    img[..., 0] = np.floor(q[..., 0] + 0.5).astype(np.uint16)
    img[..., 1] = np.floor(q[..., 1] + 0.5).astype(np.uint16)
    img[..., 2] = valid.astype(np.uint16)
    img[~valid] = 0
    write_png16_rgb(path, img)


def load_gt_any(path_base: str) -> Tuple[Optional[np.ndarray],
                                         Optional[np.ndarray]]:
    """Load ground-truth flow for a frame from whichever dataset format
    exists: ``<base>.flo`` (Middlebury/Sintel) or ``<base>.png`` (KITTI
    16-bit).  Returns (flow, valid) or (None, None) when neither file
    is present.  ``.flo`` GT has no validity channel; Sintel-style
    sentinel values (|flow| > 1e9 / NaN) are masked invalid, matching
    the reference's is_flow_correct (color_coding.cpp:8-11)."""
    import os

    flo_path = path_base + ".flo"
    png_path = path_base + ".png"
    if os.path.exists(flo_path):
        from .flo import load_flo

        flow = load_flo(flo_path)
        valid = np.isfinite(flow).all(axis=-1) & (
            np.abs(flow) < 1e9).all(axis=-1)
        return flow, valid
    if os.path.exists(png_path):
        return load_kitti_flow(png_path)
    return None, None
