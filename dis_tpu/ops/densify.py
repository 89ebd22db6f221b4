"""Densification: patch displacements -> dense flow field.

The reference scatter-adds each patch's ``u`` (weight 0.5) over its
ps x ps footprint, then normalizes by the accumulated weight
(patch_grid.cpp:121-182; quirks Q2-intent/Q6/Q7).  Scatter is hostile
to TPUs, so this is reformulated as a *transposed convolution*: the
per-patch values live on the regular patch grid, and a
``conv_general_dilated`` with lhs_dilation == patch stride and a
ps x ps all-ones kernel places every patch's contribution over its
footprint in one fused XLA op.  Footprint clipping at image borders
falls out of the convolution padding; the weight plane is the same conv
applied to the per-patch weights.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from jax import lax

from .grid import GridGeometry


def densify(u: jnp.ndarray, geom: GridGeometry, width: int, height: int,
            ps: int, weights: Optional[jnp.ndarray] = None,
            out_row0: int = 0) -> jnp.ndarray:
    """Dense flow [height, width, 2] from per-patch ``u`` [N, 2].

    ``weights`` is an optional per-patch densification weight [N]
    (fixed mode: ``1/max(1, ||r||^2)``); None means the reference's
    uniform weight (Q6), for which the result reduces to the mean of
    overlapping patch flows.

    For row-ranged grids (exact tiling) the output window starts at
    global row ``out_row0`` and spans ``height`` rows; the caller must
    include every patch row whose footprint intersects the window.
    """
    half = ps // 2
    s = geom.steps
    # Patch values on the [num_h, num_w] grid. u is x-outer/y-inner
    # (index = ix * num_h + iy), so reshape to [num_w, num_h] then swap.
    ug = u.reshape(geom.num_w, geom.num_h, 2).transpose(1, 0, 2)
    if weights is None:
        wg = jnp.ones((geom.num_h, geom.num_w, 1), jnp.float32)
        vg = ug
    else:
        wg = weights.reshape(geom.num_w, geom.num_h).T[..., None]
        vg = ug * wg

    # A patch at grid index i covers pixels x with
    #   x - (i*s + off) in [-ps/2, ps/2 - 1].
    # The correlation with lhs_dilation=s computes
    #   y[x] = sum_i v[i] * 1[x - i*s in [pad_lo - ps + 1, pad_lo]]
    # so pad_lo = off + ps/2 - 1 aligns the footprint, and pad_hi is
    # chosen to make the output exactly [height, width].  For a
    # row-ranged grid the effective y offset folds in the grid's first
    # patch row and the output window start.
    eff_off_h = geom.iy0 * s + geom.offset_h - out_row0
    pad_lo_x = geom.offset_w + half - 1
    pad_lo_y = eff_off_h + half - 1
    dil_w = (geom.num_w - 1) * s + 1
    dil_h = (geom.num_h - 1) * s + 1
    pad_hi_x = width - 1 + (ps - 1) - pad_lo_x - (dil_w - 1)
    pad_hi_y = height - 1 + (ps - 1) - pad_lo_y - (dil_h - 1)

    def tconv(x, c):
        # One fused 2-D dilated conv. (A separable two-pass variant was
        # benchmarked end-to-end at 8.49 vs 9.40 fps — the single fused
        # conv wins on TPU despite the extra arithmetic.)
        lhs = x.transpose(2, 0, 1)[None]   # [1, c, num_h, num_w]
        ker = jnp.ones((c, 1, ps, ps), jnp.float32)  # depthwise ones
        out = lax.conv_general_dilated(
            lhs, ker,
            window_strides=(1, 1),
            padding=((pad_lo_y, pad_hi_y), (pad_lo_x, pad_hi_x)),
            lhs_dilation=(s, s),
            rhs_dilation=(1, 1),
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            feature_group_count=c,
        )
        return out[0].transpose(1, 2, 0)  # [height, width, c]

    fsum = tconv(vg, 2)
    wsum = tconv(wg, 1)
    return jnp.where(wsum > 0, fsum / jnp.where(wsum > 0, wsum, 1.0), 0.0)
