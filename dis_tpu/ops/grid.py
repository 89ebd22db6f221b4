"""Patch-grid geometry (patch_grid.cpp:17-51).

Patch centers at ``i * steps + offset`` with centered offsets; grid size
``ceil(dim / steps)`` per axis.  Geometry is static per (shape, config),
computed in Python and baked into the jitted program.

For exact spatial tiling, a grid can be restricted to a contiguous
range of GLOBAL patch rows (``iy_range``): centers stay in global
coordinates and densification geometry carries a row offset, so a
stripe computes exactly the patches the untiled run would.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax.numpy as jnp


class GridGeometry(NamedTuple):
    num_w: int          # patches along x
    num_h: int          # patches along y (local count when row-ranged)
    offset_w: int       # global x offset of patch centers
    offset_h: int       # global y offset of patch centers
    steps: int
    centers: np.ndarray  # [N, 2] float32 (x, y) GLOBAL coords, x-outer order
    iy0: int = 0        # first global patch-row index in this grid
    global_num_h: int = -1  # full grid rows (== num_h when untiled)


def make_grid(width: int, height: int, steps: int,
              iy_range: Optional[Tuple[int, int]] = None) -> GridGeometry:
    """Grid over a [height, width] image; optionally only global patch
    rows [iy0, iy1)."""
    num_w = int(math.ceil(width / steps))
    gnum_h = int(math.ceil(height / steps))
    off_w = int(math.floor((width - (num_w - 1) * steps) / 2))
    off_h = int(math.floor((height - (gnum_h - 1) * steps) / 2))
    iy0, iy1 = (0, gnum_h) if iy_range is None else iy_range
    iy0 = max(0, iy0)
    iy1 = min(gnum_h, iy1)
    xs = np.arange(num_w) * steps + off_w
    ys = np.arange(iy0, iy1) * steps + off_h
    cx, cy = np.meshgrid(xs, ys, indexing="ij")
    centers = np.stack([cx.ravel(), cy.ravel()], -1).astype(np.float32)
    return GridGeometry(num_w, iy1 - iy0, off_w, off_h, steps, centers,
                        iy0=iy0, global_num_h=gnum_h)


def init_from_coarser_flow(geom: GridGeometry, flow_coarse: jnp.ndarray,
                           coarse_row_offset: int = 0) -> jnp.ndarray:
    """Nearest-neighbor init from the coarser scale's dense flow, x2
    (patch_grid.cpp:108-119, quirk Q8). ``flow_coarse`` is [hc, wc, 2];
    when it is a stripe, ``coarse_row_offset`` is its first global row.

    Formulated as two separable 1-D takes (rows, then columns) instead
    of one [N]-point 2-D gather: the indices are a static outer product
    of ``num_h`` row picks and ``num_w`` column picks (the centers form
    a regular lattice), and the 2-D gather bills 0.64 ms at the 1080p
    finest scale in the round-2 device trace (~num_h + num_w gathered
    rows vs N).  Pure copies, so bit-identical either way."""
    cxs = (np.arange(geom.num_w) * geom.steps + geom.offset_w) // 2
    cys = ((np.arange(geom.iy0, geom.iy0 + geom.num_h) * geom.steps
            + geom.offset_h) // 2 - coarse_row_offset)
    rows = jnp.take(flow_coarse, jnp.asarray(cys), axis=0)     # [nh, wc, 2]
    sub = jnp.take(rows, jnp.asarray(cxs), axis=1)             # [nh, nw, 2]
    n = geom.num_w * geom.num_h
    return sub.transpose(1, 0, 2).reshape(n, 2) * jnp.float32(2.0)
