"""Spatial frame tiling with halo exchange (latency-oriented).

BASELINE.json config #4: one large frame split row-wise across chips.
Each device owns a horizontal stripe plus a replicated halo band wide
enough to cover every non-local read of the pipeline:

- pyramid stencils: Sobel radius 1 per level, 2x decimation;
- patch search: template footprint ps, plus per-scale motion bounded by
  policing (ps/2 per scale, quirk Q9) on top of the coarse init;
- densification: patch footprint ps around boundary patches.

The halo is exchanged ONCE at the finest level with
``lax.ppermute`` over the ``space`` axis (two shifts: up and down) and
all further computation is device-local — the classic halo pattern on
ICI.  The per-level halo need halves with each pyramid level, so a
finest-level halo of ``halo0 = 2**coarsest * halo_coarse`` covers every
level.

Exactness: interior rows match the untiled pipeline; a seam band of a
few pixels can differ because (a) the local patch grid is laid out per
stripe and (b) stripe-edge padding replaces true image content beyond
the halo.  Flows larger than the halo band saturate against the local
bounds — the standard locality tradeoff for tiled flow.  Tests assert
interior equality (``tests/test_parallel.py``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..config import DISConfig
from ..models.dis import dis_flow_padded


def halo_rows(cfg: DISConfig, max_motion_px: int = 32) -> int:
    """Finest-level halo rows needed for seam-free interior results.

    ``max_motion_px`` bounds the vertical motion magnitude supported at
    the finest scale (coarse-init motion beyond that saturates at tile
    edges).  Rounded up to a multiple of ``2**coarsest_scale`` so every
    pyramid level tiles evenly.
    """
    f = 2 ** cfg.coarsest_scale
    need = cfg.patch_size * 2 + max_motion_px + f
    return ((need + f - 1) // f) * f


def exchange_halo(x: jnp.ndarray, halo: int, axis_name: str) -> jnp.ndarray:
    """Extend a local row-stripe [Hl, W] with neighbors' edge bands.

    Boundary devices replicate their own edge (matching the replicate
    border the untiled pipeline applies at frame edges).
    Two ``ppermute`` shifts over the mesh axis — pure ICI traffic.
    """
    n = lax.axis_size(axis_name)
    i = lax.axis_index(axis_name)
    top_band = x[:halo]        # my top rows -> neighbor below
    bot_band = x[-halo:]       # my bottom rows -> neighbor above
    # receive from above: their bottom band
    from_above = lax.ppermute(bot_band, axis_name,
                              [(j, j + 1) for j in range(n - 1)])
    # receive from below: their top band
    from_below = lax.ppermute(top_band, axis_name,
                              [(j + 1, j) for j in range(n - 1)])
    # boundary devices: replicate own edge rows
    top_fill = jnp.broadcast_to(x[:1], (halo,) + x.shape[1:])
    bot_fill = jnp.broadcast_to(x[-1:], (halo,) + x.shape[1:])
    top = jnp.where(i == 0, top_fill, from_above)
    bot = jnp.where(i == n - 1, bot_fill, from_below)
    return jnp.concatenate([top, x, bot], axis=0)


def stripe_bounds(cfg: DISConfig, height: int, n: int, idx: int,
                  halo: int):
    """(row0, ext_h, own_r0, own_h) for stripe ``idx`` of ``n`` with the
    given halo, clamped at frame edges; all multiples of 2**coarsest."""
    f = 2 ** cfg.coarsest_scale
    own_h = height // n
    own_r0 = idx * own_h
    row0 = max(0, own_r0 - halo)
    ext_hi = min(height, own_r0 + own_h + halo)
    return row0, ext_hi - row0, own_r0, own_h


def min_stripe_halo(cfg: DISConfig, width: int, height: int, n: int) -> int:
    """Smallest halo (multiple of 2**coarsest) for which every stripe of
    an n-way split passes the exact-tiling static validation.

    Dominated by the coarsest scale: a ``ps``-pixel patch there spans
    ``ps * 2**coarsest`` finest-level rows, so exact tiling duplicates a
    substantial band (the cost of the reference's coarse-to-fine
    locality).
    """
    from ..models.dis import validate_stripe_geometry

    f = 2 ** cfg.coarsest_scale
    for halo in range(f, height + f, f):
        try:
            for i in range(n):
                row0, ext_h, own_r0, own_h = stripe_bounds(
                    cfg, height, n, i, halo)
                validate_stripe_geometry(cfg, width, height, row0, ext_h,
                                         own_r0, own_h)
            return halo
        except ValueError:
            continue
    raise ValueError(f"no viable halo for {n} stripes of height {height}")


def tiled_flow_exact(img1: jnp.ndarray, img2: jnp.ndarray, cfg: DISConfig,
                     n_stripes: int, halo: int):
    """EXACT tiled execution: compute the frame as ``n_stripes`` stripes
    via :func:`dis_flow_stripe` and concatenate — every row matches the
    untiled pipeline (tests/test_stripe_exact.py).

    This is the host-level pattern for multi-host deployments (each host
    traces its own stripe program, so static per-stripe geometry is
    fine).  Within a single controller it runs the stripes sequentially;
    the ``shard_map`` path below remains the single-trace, seam-banded
    latency mode.
    """
    from ..models.dis import dis_flow_stripe

    h, w = img1.shape
    outs = []
    for i in range(n_stripes):
        row0, ext_h, own_r0, own_h = stripe_bounds(cfg, h, n_stripes, i, halo)
        outs.append(dis_flow_stripe(
            img1[row0:row0 + ext_h], img2[row0:row0 + ext_h], cfg,
            row0=row0, own_r0=own_r0, own_h=own_h, global_h=h))
    return jnp.concatenate(outs, axis=0)


def tiled_flow_fn(cfg: DISConfig, mesh: Mesh, height: int, width: int,
                  axis: str = "space", max_motion_px: int = 32):
    """Returns a jitted fn ([H, W], [H, W]) -> [H, W, 2] with the frame
    row-sharded over ``axis``.

    ``height`` must be divisible by ``axis_size * 2**coarsest_scale``.
    """
    n = mesh.shape[axis]
    f = 2 ** cfg.coarsest_scale
    if height % (n * f):
        raise ValueError(
            f"height {height} must be divisible by n_space*{f} = {n * f}")
    halo = halo_rows(cfg, max_motion_px)
    if halo > height // n:
        raise ValueError(
            f"per-device stripe ({height // n} rows) smaller than the "
            f"required halo ({halo}); use fewer devices or larger frames")

    def local(i1, i2):
        e1 = exchange_halo(i1, halo, axis)
        e2 = exchange_halo(i2, halo, axis)
        flow = dis_flow_padded(e1, e2, cfg)
        return flow[halo:-halo]

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None)),
        out_specs=P(axis, None, None),
    )
    return jax.jit(fn)
