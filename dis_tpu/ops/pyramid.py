"""Gradient-magnitude pyramid construction (main.cpp:12-50).

Level 0 is the Sobel gradient magnitude of the input (quirk Q1); each
coarser level is a 0.5x INTER_LINEAR decimation of the previous level.
Every level carries its own Sobel dx/dy of the magnitude image and is
padded by ``img_padding``: replicate for the image, zeros for the
gradients (main.cpp:41-49).
"""

from __future__ import annotations

import os
from typing import List, NamedTuple

import jax.numpy as jnp

from . import image as im


# Largest input (pixels / width) routed to the Pallas level kernel in
# "auto" mode: ~1080p and below.  The 4K-size kernel crashes the TPU
# compiler (bisected; see construct_pyramid_auto docstring) and its
# 1080p win is only ~0.2 ms, so larger frames take the bit-identical
# XLA recipe.  The width gate covers 4K-wide STRIPES (row-tiled 4K
# frames whose pixel count slips under the pixel gate): inside a while
# body XLA may place the kernel's output tuple in scoped VMEM, and at
# width 3840 two such outputs alone exceed the 16 MB scoped limit
# (observed on chip: "Ran out of memory in memory space vmem ...
# f32[512,3856] x3 custom-call" for a 472-row stripe that compiles
# fine standalone).
_PALLAS_PYRAMID_MAX_PIXELS = 1088 * 1920
_PALLAS_PYRAMID_MAX_WIDTH = 1920


class PyramidLevel(NamedTuple):
    img: jnp.ndarray   # [h + 2p, w + 2p] replicate-padded magnitude image
    dx: jnp.ndarray    # [h + 2p, w + 2p] zero-padded Sobel d/dx
    dy: jnp.ndarray    # [h + 2p, w + 2p] zero-padded Sobel d/dy
    width: int         # unpadded w at this level
    height: int        # unpadded h at this level


def construct_pyramid_auto(img: jnp.ndarray, coarsest_scale: int,
                           img_padding: int, kernel: str) -> "List[PyramidLevel]":
    """Backend-dispatched pyramid: the fused Pallas level kernel on
    accelerators (``kernel`` in auto/pallas, mirroring
    ops/iclk.py::inverse_search), the XLA recipe on CPU.  Both paths are
    bit-identical (tests/test_pallas_pyramid.py), so every pipeline
    (untiled, stripe, tiled) can share this dispatch without breaking
    exact-tiling guarantees.

    ``DIS_TPU_PYRAMID`` (auto|pallas|xla) overrides the choice for A/B
    measurement; chip numbers are within run-to-run noise of each other
    (ROOFLINE.md), so ``auto`` follows the measured winner per size.

    Frames beyond ~1080p fall back to the XLA recipe in ``auto`` mode:
    the 4K-size level kernel crashes the TPU compiler (the remote
    compile helper exits 1 — reproduced and bisected to this kernel;
    previously misattributed to infra in PERF_NOTES), and the kernel's
    whole win at 1080p is ~0.2 ms, so there is nothing to chase above
    the gate.  With the XLA pyramid the 4K frame runs at 12.1 fps
    (82.9 ms, banded extraction path).
    """
    import os

    import jax

    mode = os.environ.get("DIS_TPU_PYRAMID", "auto")
    pallas_ok = (img.shape[0] * img.shape[1] <= _PALLAS_PYRAMID_MAX_PIXELS
                 and img.shape[1] <= _PALLAS_PYRAMID_MAX_WIDTH)
    if mode == "xla":
        use_pallas = False
    elif mode == "pallas":
        use_pallas = True
    else:
        use_pallas = pallas_ok and (
            kernel == "pallas" or (
                kernel == "auto" and jax.default_backend() != "cpu"))
    return construct_pyramid(img, coarsest_scale, img_padding,
                             use_pallas=use_pallas,
                             interpret=jax.default_backend() == "cpu")


def construct_pyramid(img: jnp.ndarray, coarsest_scale: int,
                      img_padding: int, use_pallas: bool = False,
                      interpret: bool = False) -> List[PyramidLevel]:
    """Returns levels[0..coarsest], finest first (level index == scale).

    With ``use_pallas`` each level's (replicate-padded image,
    zero-padded Sobel dx/dy) triple is produced by the fused stencil
    kernel (``ops/pallas/pyramid_kernel.py``, bit-identical); the 0.5x
    decimations chain through XLA (one fused read each).
    """
    levels: List[PyramidLevel] = []
    p = img_padding
    if use_pallas:
        from .pallas.pyramid_kernel import pyramid_level_pallas

        cur = None  # level image; derived from kernel output for s=0
        for s in range(coarsest_scale + 1):
            if s == 0:
                ip, dx, dy = pyramid_level_pallas(img, p, base=True,
                                                  interpret=interpret)
                h, w = img.shape
                cur = ip[p:p + h, p:p + w]  # the magnitude image
            else:
                cur = im.resize_half(cur)
                ip, dx, dy = pyramid_level_pallas(cur, p, base=False,
                                                  interpret=interpret)
                h, w = cur.shape
            levels.append(PyramidLevel(img=ip, dx=dx, dy=dy,
                                       width=w, height=h))
        return _barrier_levels(levels)
    cur = im.gradient_magnitude(img)
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
    return _barrier_levels(levels)


# Fence the pyramid from consumer-driven fusion (default on).  XLA's
# fusion is CONSUMER-shaped: the same Sobel/magnitude/decimate subgraph
# compiles with different fma/vectorization choices depending on what
# reads it, so an untiled program and a shard_map-tiled program consuming
# the identical pyramid math produce ulp-different level planes, which
# the patch search then amplifies through discrete policing decisions
# (round-2 "~1e-5 reassociation noise", root-caused in round 3).  An
# optimization_barrier on each level's planes makes the pyramid its own
# fusion island — identical in every program context — which makes
# grid-tiled SPMD execution BITWISE equal to the untiled pipeline
# (tests/test_parallel.py).  The cost is only lost producer fusion into
# the first consumer slice of each plane; the planes were materialized
# buffers anyway (chip A/B within bench noise, PERF_NOTES.md round 3).
_BARRIER = os.environ.get("DIS_TPU_PYRAMID_BARRIER", "1") == "1"


def _barrier_levels(levels: "List[PyramidLevel]") -> "List[PyramidLevel]":
    if not _BARRIER:
        return levels
    from jax import lax

    out = []
    for l in levels:
        i_, dx_, dy_ = lax.optimization_barrier((l.img, l.dx, l.dy))
        out.append(PyramidLevel(img=i_, dx=dx_, dy=dy_,
                                width=l.width, height=l.height))
    return out


def intensity_pyramid(img: jnp.ndarray, coarsest_scale: int) -> list:
    """Raw-intensity OpenCV-resize chain ``[img, img/2, ...]`` (unpadded
    planes, one per scale) for ``refinement_planes="intensity"``
    (config.py): the DIS paper's variational refinement reads the
    intensity image, whereas the reference's pyramid levels are
    gradient-magnitude planes (quirk Q1, main.cpp:18-29).  Uses the same
    INTER_LINEAR x0.5 decimation as the Q1 levels, so tiled and untiled
    pipelines derive bit-identical planes.  The planes carry the same
    fusion fence as the Q1 levels (_BARRIER note above): they feed the
    refinement whose output seeds the next scale's search, so context-
    dependent fusion would break bitwise tiled == untiled."""
    from jax import lax

    out = [img]
    for _ in range(coarsest_scale):
        out.append(im.resize_half(out[-1]))
    if _BARRIER:
        out = list(lax.optimization_barrier(tuple(out)))
    return out
