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

import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Patches extracted per loop iteration: the loop is issue-latency-bound
# (~127 ns/patch of sequenced roll+store ops), so unrolling exposes
# independent chains to the scheduler.  Round-2 measurements (unroll
# 1/2/4/8/16 = 10.7/8.7/5.4/3.7/4.1 ms at 1080p finest) picked 8, but
# the round-3 power-of-two slab fix changed the instruction mix:
# round-5 device-trace re-sweep (finest-scale kernel op, 1080p) —
# unroll 8/16/32/64/128 = 2.55/2.23/2.09/2.01/1.98 ms, monotone.  64
# ships (128 is within noise and doubles live slab temporaries; VMEM
# headroom matters for the banded 4K kernel and ps 12-16 slabs).
_UNROLL = int(os.environ.get("DIS_TPU_EXTRACT_UNROLL", "64"))


def _unrolled_loop(count: int, one) -> None:
    """Run ``one(i)`` for i in [0, count) as a fori_loop unrolled by
    ``_UNROLL`` plus a statically-unrolled tail.

    The old divisor-only unroll selection silently collapsed for
    counts with small factors — the banded 4K kernel's num_h=436 got
    unroll 4 and ran 1.7x more ns/patch than the whole-image kernel
    (round-5 trace: 41.7 vs 24).  A remainder tail keeps full unroll
    for any count.
    """
    u = min(_UNROLL, count)
    main = count // u

    def body(g, _):
        for k in range(u):
            one(g * u + k)
        return 0

    lax.fori_loop(0, main, body, 0)
    for k in range(count - main * u):
        one(main * u + k)


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _slab_rows(rc: int) -> int:
    """Aligned slab height for the per-patch y-roll: the smallest POWER
    OF TWO >= 7 + rc (y0 % 8 + rc rows must fit).  A dynamic sublane
    ``pltpu.roll`` over a non-power-of-two length silently corrupts the
    rotation (round-3 ps=12 bug: ra=40 rolled rows to wrong positions
    while ra=32 at ps=8 was correct); power-of-two lengths are the
    verified-safe case (ps=8/ra=32 bitwise across rounds, ps=12/ra=64
    verified on chip in tests run round 3).
    """
    need = 7 + rc
    ra = 32
    while ra < need:
        ra *= 2
    return ra


def vmem_ok(th: int, tw: int, ps: int, block: int = 256,
            budget_bytes: int = 12 * 1024 * 1024) -> bool:
    """Whether the padded image + block buffers fit the VMEM budget."""
    rc = 2 * ps + 3
    ra = _slab_rows(rc)
    th_pad = _cdiv(th, 8) * 8 + ra
    tw_pad = _cdiv(tw, 128) * 128 + 256
    img_bytes = th_pad * tw_pad * 4
    blk_bytes = block * ra * rc * 4 * 2  # double-buffered out
    return img_bytes + blk_bytes < budget_bytes


def band_width_ok(ps: int, init_bound: float, band_w: int = 384) -> bool:
    """Whether a column band of ``band_w`` lanes covers every region of
    a grid column whose coarse-init flow is bounded by ``init_bound``.

    Constraint chain: in-band offsets reach up to 127 (lane-tile
    alignment of the band origin) + 2*init_bound (x-spread of region
    bases within one grid column: centers share x, bases differ only by
    the init flow) + rounding slack; the aligned 256-lane slab read
    then needs its own origin to satisfy xa + 256 <= band_w, i.e. the
    offset must stay below band_w - 128.
    """
    return 127 + 2 * init_bound + 8 <= band_w - 128


def extract_regions_banded(img2: jnp.ndarray, pos0: jnp.ndarray, ps: int,
                           pad: int, num_w: int, num_h: int,
                           row0: int = 0, band_w: int = 384,
                           interpret: bool = False
                           ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Column-banded region extraction: any resolution, small VMEM.

    The patch array is x-outer (patch_grid.cpp:39-49), so a grid COLUMN
    (fixed center x, all y) is contiguous; its region bases share a
    narrow x-range (centers identical, bases differ only by the bounded
    coarse-init flow).  One grid program per column DMAs the full-height
    [th, band_w] column band from the HBM-resident image into VMEM
    scratch, then extracts each patch's region with the aligned-slab +
    2-D-roll scheme of :func:`extract_regions_pallas`.  VMEM usage is
    the band (~th * band_w * 4 B) instead of the whole frame, so 4K+
    frames stay on the Pallas path (round-1 ``vmem_ok`` fallback).

    Caller must have verified :func:`band_width_ok` for the scale's
    init-flow bound.  Output identical to the XLA ``extract_regions``.
    """
    th, tw = img2.shape
    rc = 2 * ps + 3
    ra = _slab_rows(rc)
    n = pos0.shape[0]
    assert n == num_w * num_h, (n, num_w, num_h)

    nudge = jnp.float32(1e-5)
    cpx0 = jnp.clip(jnp.ceil(pos0[:, 0] + nudge), -1e6, 1e6).astype(jnp.int32) + pad
    cpy0 = (jnp.clip(jnp.ceil(pos0[:, 1] + nudge), -1e6, 1e6).astype(jnp.int32)
            + pad - row0)
    base_y = jnp.clip(cpy0 - ps - 2, 0, th - rc)
    base_x = jnp.clip(cpx0 - ps - 2, 0, tw - rc)

    # Zero-pad rows so aligned slab reads stay in bounds; pad columns so
    # every band DMA is in bounds.
    th_pad = _cdiv(th, 8) * 8 + ra
    tw_pad = _cdiv(tw, 128) * 128 + band_w
    imgp = jnp.pad(img2, ((0, th_pad - th), (0, tw_pad - tw)))

    # Per-column band origin: lane-tile-aligned min base_x, clamped so
    # the band fits the padded image.
    bx0 = base_x.reshape(num_w, num_h).min(axis=1)
    bx0 = jnp.clip((bx0 // 128) * 128, 0, tw_pad - band_w)

    # Per-patch bases ride per-column SMEM BLOCKS, not scalar prefetch:
    # the prefetch budget is ~1 MB total (measured: 100k patches compile,
    # 200k do not), far below a 4K frame's 334k patches.
    byx = jnp.stack([base_y.reshape(num_w, num_h),
                     base_x.reshape(num_w, num_h)], axis=1)  # [num_w,2,num_h]

    def kern(bx0_ref, byx_ref, img_ref, out_ref, band, sem):
        col = pl.program_id(0)
        x0 = pl.multiple_of(bx0_ref[col], 128)
        dma = pltpu.make_async_copy(
            img_ref.at[:, pl.ds(x0, band_w)], band, sem)
        dma.start()
        dma.wait()

        def one(i):
            yy = byx_ref[0, 0, i]
            xx = byx_ref[0, 1, i] - x0
            ya = pl.multiple_of((yy // 8) * 8, 8)
            xa = pl.multiple_of((xx // 128) * 128, 128)
            slab = band[pl.ds(ya, ra), pl.ds(xa, 256)]
            # x-roll on the full slab, then shrink to one lane tile so
            # the y-roll moves 8x less data.
            rolled = pltpu.roll(slab, -(xx - xa), 1)[:, :rc]
            rolled = pltpu.roll(rolled, -(yy - ya), 0)
            out_ref[i, :, :] = rolled[:rc, :]

        _unrolled_loop(num_h, one)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_w,),
        in_specs=[
            pl.BlockSpec((1, 2, num_h), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((num_h, rc, rc), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((th_pad, band_w), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    @jax.custom_batching.sequential_vmap
    def run(bx0_, byx_, imgp_):
        # Under jax.vmap (batched pairs) lower to a lax.map: the
        # ANY-space image BlockSpec cannot be batched by Mosaic.
        return pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n, rc, rc), jnp.float32),
            interpret=interpret,
        )(bx0_, byx_, imgp_)

    regions = run(bx0, byx, imgp)
    return regions, base_y, base_x


def extract_regions_pallas(img2: jnp.ndarray, pos0: jnp.ndarray, ps: int,
                           pad: int, block: int = 256, row0: int = 0,
                           interpret: bool = False, pad_to: int = None
                           ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """[N, Rc, Rc] regions + (base_y, base_x); drop-in for the XLA
    ``ops.iclk.extract_regions`` at row-pack 1.

    With ``pad_to`` (a multiple of 128, >= N) the output keeps its
    padded leading dim ``pad_to`` instead of being sliced back to N —
    the search kernel consumes the padded array directly, skipping a
    slice + re-pad round trip over the [N, R, R] HBM array (3.1 ms at
    1080p per the round-2 device trace).  Dummy rows read in-bounds
    (clipped base 0) garbage that the search kernel never uses (padded
    lanes are marked converged)."""
    th, tw = img2.shape
    rc = 2 * ps + 3
    ra = _slab_rows(rc)             # aligned slab rows (y0%8 + rc <= ra)
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

    if pad_to is not None:
        assert pad_to >= n and pad_to % 128 == 0, (pad_to, n)
        while pad_to % block:
            block //= 2
        npad = pad_to
        nb = npad // block
    else:
        nb = _cdiv(n, block)
        npad = nb * block
    y0 = jnp.pad(base_y, (0, npad - n))
    x0 = jnp.pad(base_x, (0, npad - n))

    def kern(y_ref, x_ref, img_ref, out_ref):
        blk = pl.program_id(0)

        def one(b):
            yy = y_ref[blk * block + b]
            xx = x_ref[blk * block + b]
            ya = pl.multiple_of((yy // 8) * 8, 8)
            xa = pl.multiple_of((xx // 128) * 128, 128)
            slab = img_ref[pl.ds(ya, ra), pl.ds(xa, 256)]
            # x-roll on the full slab, then shrink to one lane tile so
            # the y-roll moves 8x less data.
            rolled = pltpu.roll(slab, -(xx - xa), 1)[:, :rc]
            rolled = pltpu.roll(rolled, -(yy - ya), 0)
            out_ref[b, :, :] = rolled[:rc, :]

        _unrolled_loop(block, one)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((block, rc, rc), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )

    def kern_batched(yx_ref, img_ref, out_ref, img_vmem, sem):
        # Batched form: grid (pair, block).  The pair's image is DMA'd
        # from HBM into VMEM scratch once (at its first block — the
        # last grid dim iterates innermost), and per-patch bases ride
        # per-block SMEM tiles instead of scalar prefetch (the prefetch
        # budget is ~1 MB total, which B full base arrays would blow).
        pair = pl.program_id(0)
        blk = pl.program_id(1)

        @pl.when(blk == 0)
        def _():
            dma = pltpu.make_async_copy(img_ref.at[pair], img_vmem, sem)
            dma.start()
            dma.wait()

        def one(b):
            yy = yx_ref[0, 0, 0, b]
            xx = yx_ref[0, 0, 1, b]
            ya = pl.multiple_of((yy // 8) * 8, 8)
            xa = pl.multiple_of((xx // 128) * 128, 128)
            slab = img_vmem[pl.ds(ya, ra), pl.ds(xa, 256)]
            rolled = pltpu.roll(slab, -(xx - xa), 1)[:, :rc]
            rolled = pltpu.roll(rolled, -(yy - ya), 0)
            out_ref[0, b, :, :] = rolled[:rc, :]

        _unrolled_loop(block, one)

    @jax.custom_batching.custom_vmap
    def run(y0_, x0_, imgp_):
        return pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((npad, rc, rc), jnp.float32),
            interpret=interpret,
        )(y0_, x0_, imgp_)

    @run.def_vmap
    def _run_vmap(axis_size, in_batched, yb, xb, ib):
        # One kernel for the whole pair batch: a sequential_vmap lax.map
        # re-copies the [B, npad, rc, rc] regions buffer through a
        # dynamic-update-slice every iteration (measured 6.3 ms/pair of
        # pure waste at 1080p in the batch-2 device trace).
        def bcast(v, b):
            return v if b else jnp.broadcast_to(
                v[None], (axis_size,) + v.shape)

        yb, xb, ib = (bcast(v, b) for v, b in
                      zip((yb, xb, ib), in_batched))
        yx = jnp.stack([yb, xb], axis=2).astype(jnp.int32)   # [B, npad, 2]
        yx = yx.reshape(axis_size, nb, block, 2).transpose(0, 1, 3, 2)
        out = pl.pallas_call(
            kern_batched,
            grid=(axis_size, nb),
            in_specs=[
                pl.BlockSpec((1, 1, 2, block), lambda p, i: (p, i, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, block, rc, rc),
                                   lambda p, i: (p, i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((axis_size, npad, rc, rc),
                                           jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((th_pad, tw_pad), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ],
            interpret=interpret,
        )(yx, ib)
        return out, True

    regions = run(y0, x0, imgp)
    if pad_to is None:
        regions = regions[:n]
    return regions, base_y, base_x
