"""Patch-grid geometry (patch_grid.cpp:17-51).

Patch centers at ``i * steps + offset`` with centered offsets; grid size
``ceil(dim / steps)`` per axis.  Geometry is static per (shape, config),
computed in Python and baked into the jitted program.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import numpy as np
import jax.numpy as jnp


class GridGeometry(NamedTuple):
    num_w: int          # patches along x
    num_h: int          # patches along y
    offset_w: int
    offset_h: int
    steps: int
    centers: np.ndarray  # [N, 2] float32 (x, y), x-outer/y-inner order


def make_grid(width: int, height: int, steps: int) -> GridGeometry:
    num_w = int(math.ceil(width / steps))
    num_h = int(math.ceil(height / steps))
    off_w = int(math.floor((width - (num_w - 1) * steps) / 2))
    off_h = int(math.floor((height - (num_h - 1) * steps) / 2))
    xs = np.arange(num_w) * steps + off_w
    ys = np.arange(num_h) * steps + off_h
    cx, cy = np.meshgrid(xs, ys, indexing="ij")
    centers = np.stack([cx.ravel(), cy.ravel()], -1).astype(np.float32)
    return GridGeometry(num_w, num_h, off_w, off_h, steps, centers)


def init_from_coarser_flow(geom: GridGeometry, flow_coarse: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor init from the coarser scale's dense flow, x2
    (patch_grid.cpp:108-119, quirk Q8). ``flow_coarse`` is [h/2, w/2, 2]."""
    cx = (geom.centers[:, 0] // 2).astype(np.int32)
    cy = (geom.centers[:, 1] // 2).astype(np.int32)
    return flow_coarse[cy, cx] * jnp.float32(2.0)
