"""Fused Pallas pyramid-level kernel.

One kernel pass per pyramid level fuses everything XLA materializes as
separate arrays (reference recipe: ``/root/reference/src/main.cpp:12-50``):
for the base level, Sobel-magnitude of the raw image (quirk Q1) chained
into the level Sobel dx/dy; for coarser levels, the level Sobel pair —
plus the replicate-padded image and zero-padded gradient outputs written
directly in their padded geometry.  The XLA pipeline performs ~15
pad/slice-bounded materializations per image (~160 MB of HBM traffic at
1080p, 1.93 ms measured for two images); this kernel reads each level
once and writes each output once.

Bit-exactness: every stencil uses the same per-element operation order
as ``ops/image.py`` (``d = p[c+1] - p[c-1]; d[r-1] + 2 d[r] + d[r+1];
* 1/8``).  The chained base-level stencil needs the magnitude's own
reflect-101 border; row/col reflection of the magnitude is re-applied
in-kernel (selects) rather than recomputed from reflected raw pixels,
which would associate one addition differently (1-ulp).  Outputs match
the XLA path bitwise (``tests/test_pallas_pyramid.py``).

Design notes (Mosaic):
- The input is reflect-101 pre-padded by 2 in XLA (one cheap pad) so
  every in-kernel stencil read is interior — no boundary selects in the
  stencils themselves.
- Each grid step DMAs one [sh, wp] row band of the padded input into
  VMEM scratch (same pattern as ``extract_kernel.extract_regions_banded``)
  — the full frame never needs to be VMEM-resident, so 4K+ works.
- Neighbor access is ``pltpu.roll`` by static shifts; the band carries
  enough halo that wrapped rows are never selected.
- The replicate/zero borders of the padded outputs are assembled with
  iota selects and broadcasts of the edge row/column.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _r8(a: int) -> int:
    return _cdiv(a, 8) * 8


# Output row-band height per grid step (multiple of 8).
_OBH = int(os.environ.get("DIS_TPU_PYR_OBH", "128"))


def _level_kernel(img_ref, out_img, out_dx, out_dy, band, sem, *,
                  base: bool, h: int, w: int, p: int,
                  obh: int, sh: int, wp: int, wout: int):
    """One output row band of (img_pad, dx_pad, dy_pad).

    ``img_ref``: [hp2, wp] reflect-101(2)-padded level input in HBM.
    Out refs are [obh, wout] bands of the padded outputs.  ``band`` is
    VMEM scratch [sh, wp].

    Index conventions: out row o = ob0 + i, source row r = o - p,
    padded-input row q = r + 2; after alignment ``al[i]`` holds padded
    row q(i), i.e. source row r = ob0 - p + i.  Lanes: source col c at
    padded lane c + 2.
    """
    b = pl.program_id(0)
    f32 = jnp.float32
    hp2 = img_ref.shape[0]

    ob0 = b * obh
    want0 = ob0 - p - 2                     # topmost padded row needed
    ya = jnp.clip(want0 - want0 % 8, 0, hp2 - sh)
    ya = pl.multiple_of(ya, 8)
    dma = pltpu.make_async_copy(img_ref.at[pl.ds(ya, sh)], band, sem)
    dma.start()
    dma.wait()

    shift = ((ob0 - p + 2) - ya) % sh
    al = pltpu.roll(band[...], (-shift) % sh, 0)  # al[i] <-> padded row q(i)

    def rollr(x, dr):                        # x[i] -> x[i + dr] (mod rows)
        return pltpu.roll(x, (-dr) % x.shape[0], 0)

    def rollc(x, dc):                        # x[l] -> x[l + dc] (mod lanes)
        return pltpu.roll(x, (-dc) % x.shape[1], 1)

    def sobel_pair(src):
        """dx, dy where src row i holds source row r(i); same
        per-element order as ops/image.py::sobel3."""
        d = rollc(src, 1) - rollc(src, -1)
        dx = (rollr(d, -1) + 2.0 * d + rollr(d, 1)) * f32(0.125)
        e = rollr(src, 1) - rollr(src, -1)
        dy = (rollc(e, -1) + 2.0 * e + rollc(e, 1)) * f32(0.125)
        return dx, dy

    if base:
        # Magnitude of the raw image at every slab row.
        mx, my = sobel_pair(al)
        m = jnp.sqrt(mx * mx + my * my)
        # Re-apply reflect-101 of the MAGNITUDE at the image borders so
        # the chained Sobel sees exactly what the XLA path's
        # reflect101_pad(mag, 1) sees (computing border magnitudes from
        # reflected raw pixels is 1-ulp off in sobel_x's association).
        rows_m = (jax.lax.broadcasted_iota(jnp.int32, (sh, wp), 0)
                  + (ob0 - p))              # source row r at slab row i
        cols_m = jax.lax.broadcasted_iota(jnp.int32, (sh, wp), 1) - 2
        m = jnp.where(rows_m == -1, rollr(m, 2), m)
        m = jnp.where(rows_m == h, rollr(m, -2), m)
        m = jnp.where(cols_m == -1, rollc(m, 2), m)
        m = jnp.where(cols_m == w, rollc(m, -2), m)
    else:
        m = al
    dx, dy = sobel_pair(m)

    # Lane shift so lane l holds source col c = l - p (was at lane c+2).
    mI = rollc(m, 2 - p)
    dxI = rollc(dx, 2 - p)
    dyI = rollc(dy, 2 - p)

    rows = jax.lax.broadcasted_iota(jnp.int32, (obh, wp), 0) + ob0
    cols = jax.lax.broadcasted_iota(jnp.int32, (obh, wp), 1)
    r_in = (rows >= p) & (rows < h + p)
    c_in = (cols >= p) & (cols < w + p)

    # Gradient outputs: zero border.
    zero = jnp.zeros((), jnp.float32)
    out_dx[...] = jnp.where(r_in & c_in, dxI[:obh], zero)[:, :wout]
    out_dy[...] = jnp.where(r_in & c_in, dyI[:obh], zero)[:, :wout]

    # Image output: replicate border.  The broadcast source rows are
    # only *selected* in the first/last bands, where they are real slab
    # data; elsewhere the wrapped values are discarded by the masks.
    top_row = pltpu.roll(mI, (ob0 - p) % sh, 0)[0:1]          # r = 0
    bot_row = pltpu.roll(mI, (ob0 - (h + p - 1)) % sh, 0)[0:1]  # r = h-1
    img = jnp.where(rows < p, jnp.broadcast_to(top_row, (obh, wp)),
                    jnp.where(rows >= h + p,
                              jnp.broadcast_to(bot_row, (obh, wp)),
                              mI[:obh]))
    left_col = rollc(img, p)[:, 0:1]                          # c = 0
    right_col = rollc(img, w + p - 1)[:, 0:1]                 # c = w-1
    img = jnp.where(cols < p, jnp.broadcast_to(left_col, (obh, wp)),
                    jnp.where(cols >= w + p,
                              jnp.broadcast_to(right_col, (obh, wp)),
                              img))
    out_img[...] = img[:, :wout]


def pyramid_level_pallas(cur: jnp.ndarray, p: int, base: bool,
                         interpret: bool = False
                         ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(img_pad, dx_pad, dy_pad) for one pyramid level.

    ``cur``: [h, w] raw image (base level; outputs describe its Sobel
    magnitude, quirk Q1) or the level image itself (coarser levels).
    Bit-identical to the ops/image.py XLA recipe.
    """
    h, w = cur.shape
    wout = w + 2 * p
    hout = h + 2 * p
    wp = _cdiv(max(w + 4, wout), 128) * 128
    hp2 = _r8(max(h + 4, hout) + 8)
    # Reflect-101 pre-pad by 2; the tile-round-up zero padding on the
    # far edges is never selected into an output.
    padded = jnp.pad(cur, 2, mode="reflect")
    padded = jnp.pad(padded, ((0, hp2 - (h + 4)), (0, wp - (w + 4))))

    obh = min(_OBH, _r8(hout))
    nb = _cdiv(hout, obh)
    # Band must cover obh output rows + stencil halo (4 each side) +
    # align-down slack (8).
    sh = min(_r8(obh + 24), hp2)

    kern = functools.partial(
        _level_kernel, base=base, h=h, w=w, p=p,
        obh=obh, sh=sh, wp=wp, wout=wout)

    # custom_vmap: under jax.vmap (batched pairs, suite config 3b /
    # parallel.batch) the ANY-space whole-image BlockSpec cannot be
    # batched by Mosaic, and the sequential_vmap lax.map this used to
    # lower to re-copies three [B, hout, wout] outputs through a
    # dynamic-update-slice per pair per level (pure glue waste; round-4
    # batch trace).  The batched rule below routes through the XLA
    # level recipe instead — natively batched convs, and BITWISE equal
    # to this kernel per tests/test_pallas_pyramid.py, so batched ==
    # serial stays exact.
    @jax.custom_batching.custom_vmap
    def run(padded_in):
        return pl.pallas_call(
            kern,
            grid=(nb,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=(
                pl.BlockSpec((obh, wout), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((obh, wout), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((obh, wout), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((nb * obh, wout), jnp.float32),
                jax.ShapeDtypeStruct((nb * obh, wout), jnp.float32),
                jax.ShapeDtypeStruct((nb * obh, wout), jnp.float32),
            ),
            scratch_shapes=[
                pltpu.VMEM((sh, wp), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ],
            interpret=interpret,
        )(padded_in)

    @run.def_vmap
    def _run_vmap(axis_size, in_batched, padded_b):
        from .. import image as im_

        if not in_batched[0]:
            padded_b = jnp.broadcast_to(padded_b[None],
                                        (axis_size,) + padded_b.shape)
        # The prolog's reflect/zero pads are pure copies, so the level
        # input is recovered exactly; the XLA recipe then reproduces the
        # kernel's outputs bitwise (same per-element operation order).
        cur_b = padded_b[:, 2:2 + h, 2:2 + w]

        def one(cur_):
            m = im_.gradient_magnitude(cur_) if base else cur_
            ip = im_.replicate_pad(m, p, p, p, p)
            dx = im_.constant_pad(im_.sobel3(m, "x"), p, p, p, p)
            dy = im_.constant_pad(im_.sobel3(m, "y"), p, p, p, p)
            # Match the kernel's band-rounded output rows; the caller
            # slices [:hout], so the zero rows are never observed.
            padr = ((0, nb * obh - hout), (0, 0))
            return (jnp.pad(ip, padr), jnp.pad(dx, padr),
                    jnp.pad(dy, padr))

        return jax.vmap(one)(cur_b), (True, True, True)

    out_img, out_dx, out_dy = run(padded)
    return out_img[:hout], out_dx[:hout], out_dy[:hout]


def construct_pyramid_pallas(img: jnp.ndarray, coarsest_scale: int,
                             img_padding: int, interpret: bool = False):
    """Full pyramid through the fused level kernel (finest first);
    convenience alias for ``ops.pyramid.construct_pyramid(...,
    use_pallas=True)``."""
    from ..pyramid import construct_pyramid

    return construct_pyramid(img, coarsest_scale, img_padding,
                             use_pallas=True, interpret=interpret)
