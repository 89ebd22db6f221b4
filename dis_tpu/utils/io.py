"""Image loading with the reference's grayscale semantics.

``cv::imread(..., CV_LOAD_IMAGE_GRAYSCALE)`` (main.cpp:115-116) decodes
to BGR then converts with OpenCV's fixed-point BT.601 weights.  We
decode with PIL/imageio (no OpenCV dependency at runtime) and apply the
same fixed-point conversion so pixel values match the reference bit for
bit on 8-bit inputs.
"""

from __future__ import annotations

import numpy as np


def rgb_to_gray_u8(rgb: np.ndarray) -> np.ndarray:
    """OpenCV-exact BT.601 fixed-point gray: ``(R*4899 + G*9617 +
    B*1868 + 2^13) >> 14`` (cv::cvtColor semantics used by grayscale
    imread)."""
    r = rgb[..., 0].astype(np.int64)
    g = rgb[..., 1].astype(np.int64)
    b = rgb[..., 2].astype(np.int64)
    return ((r * 4899 + g * 9617 + b * 1868 + (1 << 13)) >> 14).astype(np.uint8)


def imread_gray(path: str) -> np.ndarray:
    """Load an image as uint8 grayscale with OpenCV-matching conversion.

    Uses the native C++ decoder (tools/native_io) when available; falls
    back to PIL/imageio + the same fixed-point conversion.
    """
    if path.lower().endswith(".png"):
        from . import native

        if native.available():
            with open(path, "rb") as f:
                out = native.png_decode_gray(f.read())
            if out is not None:
                return out
    try:
        from PIL import Image

        with Image.open(path) as img:
            if img.mode in ("L", "I;16"):
                arr = np.asarray(img.convert("L"))
                return arr.astype(np.uint8)
            arr = np.asarray(img.convert("RGB"))
            return rgb_to_gray_u8(arr)
    except ImportError:
        pass
    import imageio.v3 as iio

    arr = iio.imread(path)
    if arr.ndim == 2:
        return arr.astype(np.uint8)
    return rgb_to_gray_u8(arr[..., :3])


def imwrite(path: str, img: np.ndarray) -> None:
    """Write a uint8 image (BGR [H,W,3] like the colorizer output, or
    grayscale)."""
    out = img
    if img.ndim == 3 and img.shape[-1] == 3:
        out = img[..., ::-1]  # BGR -> RGB for PIL
    try:
        from PIL import Image

        Image.fromarray(out).save(path)
        return
    except ImportError:
        pass
    import imageio.v3 as iio

    iio.imwrite(path, out)
