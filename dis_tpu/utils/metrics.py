"""Flow accuracy metrics.

The reference never scores itself (SURVEY.md §5: no EPE code anywhere);
these are new.  EPE/AE definitions follow the Middlebury/Sintel
convention.  JAX versions are provided for on-device reduction (psum
friendly under shard_map).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp


def epe(flow: np.ndarray, gt: np.ndarray, valid: Optional[np.ndarray] = None) -> float:
    """Average endpoint error. ``valid`` is an optional [H, W] mask
    (KITTI-style sparse GT; Sintel GT marks invalid with |.| > 1e9)."""
    d = flow[..., :2] - gt[..., :2]
    e = np.sqrt((d * d).sum(-1))
    if valid is None:
        valid = (np.abs(gt[..., 0]) < 1e9) & (np.abs(gt[..., 1]) < 1e9)
    valid = valid & np.isfinite(e)
    return float(e[valid].mean()) if valid.any() else float("nan")


def angular_error(flow: np.ndarray, gt: np.ndarray) -> float:
    """Mean angular error (degrees) in the (u, v, 1) homogeneous sense."""
    num = (flow[..., 0] * gt[..., 0] + flow[..., 1] * gt[..., 1] + 1.0)
    den = np.sqrt((flow[..., 0] ** 2 + flow[..., 1] ** 2 + 1.0)
                  * (gt[..., 0] ** 2 + gt[..., 1] ** 2 + 1.0))
    cos = np.clip(num / den, -1.0, 1.0)
    valid = (np.abs(gt[..., 0]) < 1e9) & (np.abs(gt[..., 1]) < 1e9) & np.isfinite(cos)
    return float(np.degrees(np.arccos(cos[valid])).mean()) if valid.any() else float("nan")


def bad_pixel_ratio(flow: np.ndarray, gt: np.ndarray, thresh: float = 3.0,
                    rel: float = 0.05,
                    valid: Optional[np.ndarray] = None) -> float:
    """KITTI Fl-style outlier ratio: EPE > thresh AND EPE > rel*|gt|.

    ``valid`` is the GT validity mask ([H, W] bool).  It is REQUIRED for
    sparse KITTI GT: loaders zero invalid pixels, so without the mask
    ~50% of pixels would be scored against gt=(0, 0) and both the
    denominator and the outlier count would be wrong.  When omitted,
    Sintel-style sentinels (|gt| > 1e9 / NaN) are masked as in epe()."""
    d = flow[..., :2] - gt[..., :2]
    e = np.sqrt((d * d).sum(-1))
    mag = np.sqrt((gt[..., :2] ** 2).sum(-1))
    if valid is None:
        valid = (np.abs(gt[..., 0]) < 1e9) & (np.abs(gt[..., 1]) < 1e9)
    valid = valid & np.isfinite(e)
    bad = (e > thresh) & (e > rel * mag) & valid
    return float(bad.sum() / valid.sum()) if valid.any() else float("nan")


def epe_jax(flow: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Device-side average EPE (scalar); NaN-safe via masking."""
    d = flow[..., :2] - gt[..., :2]
    e = jnp.sqrt((d * d).sum(-1))
    valid = (jnp.abs(gt[..., 0]) < 1e9) & (jnp.abs(gt[..., 1]) < 1e9) & jnp.isfinite(e)
    e = jnp.where(valid, e, 0.0)
    return e.sum() / jnp.maximum(valid.sum(), 1)
