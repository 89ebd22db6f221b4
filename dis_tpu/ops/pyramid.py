"""Gradient-magnitude pyramid construction (main.cpp:12-50).

Level 0 is the Sobel gradient magnitude of the input (quirk Q1); each
coarser level is a 0.5x INTER_LINEAR decimation of the previous level.
Every level carries its own Sobel dx/dy of the magnitude image and is
padded by ``img_padding``: replicate for the image, zeros for the
gradients (main.cpp:41-49).
"""

from __future__ import annotations

from typing import List, NamedTuple

import jax.numpy as jnp

from . import image as im


class PyramidLevel(NamedTuple):
    img: jnp.ndarray   # [h + 2p, w + 2p] replicate-padded magnitude image
    dx: jnp.ndarray    # [h + 2p, w + 2p] zero-padded Sobel d/dx
    dy: jnp.ndarray    # [h + 2p, w + 2p] zero-padded Sobel d/dy
    width: int         # unpadded w at this level
    height: int        # unpadded h at this level


def construct_pyramid(img: jnp.ndarray, coarsest_scale: int,
                      img_padding: int) -> List[PyramidLevel]:
    """Returns levels[0..coarsest], finest first (level index == scale)."""
    levels: List[PyramidLevel] = []
    cur = im.gradient_magnitude(img)
    p = img_padding
    for s in range(coarsest_scale + 1):
        if s > 0:
            cur = im.resize_half(cur)
        dx = im.sobel3(cur, "x")
        dy = im.sobel3(cur, "y")
        h, w = cur.shape
        levels.append(
            PyramidLevel(
                img=im.replicate_pad(cur, p, p, p, p),
                dx=im.constant_pad(dx, p, p, p, p),
                dy=im.constant_pad(dy, p, p, p, p),
                width=w,
                height=h,
            )
        )
    return levels
