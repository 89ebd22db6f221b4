"""Pallas region-extraction kernel.

Extracts each patch's (2ps+3)^2 sampling region directly from the level
image resident in VMEM — replacing the XLA sliding-window + row-gather
(~40 ms at 1080p) with per-patch aligned slab reads + dynamic 2-D
rotates (~17 ms measured, bit-identical output).

Mosaic constraints that shape the design (each was hit and measured):
- dynamic slice starts must be provably aligned: sublane dim multiples
  of 8, lane dim multiples of 128 -> read an aligned [RA, 256] slab
  per patch (``pl.multiple_of`` hints);
- ``lax.dynamic_slice`` on values is not lowered -> use
  ``pltpu.roll`` with a dynamic shift on both axes, then a static
  corner slice.

The image is zero-padded so every aligned slab read is in bounds; the
padding is never selected by valid sampling positions (policing keeps
windows inside the original padded image).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def vmem_ok(th: int, tw: int, ps: int, block: int = 256,
            budget_bytes: int = 12 * 1024 * 1024) -> bool:
    """Whether the padded image + block buffers fit the VMEM budget."""
    rc = 2 * ps + 3
    ra = _cdiv(7 + rc, 8) * 8
    th_pad = _cdiv(th, 8) * 8 + ra
    tw_pad = _cdiv(tw, 128) * 128 + 256
    img_bytes = th_pad * tw_pad * 4
    blk_bytes = block * ra * rc * 4 * 2  # double-buffered out
    return img_bytes + blk_bytes < budget_bytes


def extract_regions_pallas(img2: jnp.ndarray, pos0: jnp.ndarray, ps: int,
                           pad: int, block: int = 256, row0: int = 0,
                           interpret: bool = False
                           ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """[N, Rc, Rc] regions + (base_y, base_x); drop-in for the XLA
    ``ops.iclk.extract_regions`` at row-pack 1."""
    th, tw = img2.shape
    rc = 2 * ps + 3
    ra = _cdiv(7 + rc, 8) * 8       # aligned slab rows (y0%8 + rc <= ra)
    n = pos0.shape[0]

    nudge = jnp.float32(1e-5)
    cpx0 = jnp.clip(jnp.ceil(pos0[:, 0] + nudge), -1e6, 1e6).astype(jnp.int32) + pad
    cpy0 = (jnp.clip(jnp.ceil(pos0[:, 1] + nudge), -1e6, 1e6).astype(jnp.int32)
            + pad - row0)
    base_y = jnp.clip(cpy0 - ps - 2, 0, th - rc)
    base_x = jnp.clip(cpx0 - ps - 2, 0, tw - rc)

    # Zero-pad so aligned slab reads are always in bounds; padded values
    # are never selected by legal sampling windows.
    th_pad = _cdiv(th, 8) * 8 + ra
    tw_pad = _cdiv(tw, 128) * 128 + 256
    imgp = jnp.pad(img2, ((0, th_pad - th), (0, tw_pad - tw)))

    nb = _cdiv(n, block)
    npad = nb * block
    y0 = jnp.pad(base_y, (0, npad - n))
    x0 = jnp.pad(base_x, (0, npad - n))

    def kern(y_ref, x_ref, img_ref, out_ref):
        blk = pl.program_id(0)

        def body(b, _):
            yy = y_ref[blk * block + b]
            xx = x_ref[blk * block + b]
            ya = pl.multiple_of((yy // 8) * 8, 8)
            xa = pl.multiple_of((xx // 128) * 128, 128)
            slab = img_ref[pl.ds(ya, ra), pl.ds(xa, 256)]
            rolled = pltpu.roll(slab, -(xx - xa), 1)
            rolled = pltpu.roll(rolled, -(yy - ya), 0)
            out_ref[b, :, :] = rolled[:rc, :rc]
            return 0

        lax.fori_loop(0, block, body, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((block, rc, rc), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    regions = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((npad, rc, rc), jnp.float32),
        interpret=interpret,
    )(y0, x0, imgp)
    return regions[:n], base_y, base_x
