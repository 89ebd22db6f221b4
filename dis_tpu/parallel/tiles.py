"""Exact spatial frame tiling with halo exchange (latency-oriented).

BASELINE.json config #4: one large frame split row-wise across chips.
Each device owns a horizontal stripe; the surrounding halo band is
fetched from neighbors over ICI and the stripe is computed with the
GLOBAL-geometry engine (:func:`dis_tpu.models.dis.dis_flow_stripe`), so
the stitched result equals the untiled pipeline **everywhere** — no
seam band, no local-grid approximation (tests/test_parallel.py asserts
full equality at atol 1e-5).

Design: per-stripe geometry (patch-row ranges, densification windows,
policing bounds) is static but differs per device, so the single-trace
SPMD program is a ``lax.switch`` over ``axis_index`` with one
statically-specialized branch per stripe — each branch is exactly the
program :func:`tiled_flow_exact` would run for that stripe.  All
branches return the same ``[own_h >> finest, W >> finest, 2]`` window.
Halo movement is two ``ppermute`` shifts when the required halo fits in
one neighbor stripe, or a tiled ``all_gather`` otherwise (tiny frames /
many devices); both are pure ICI traffic.

Variational refinement is a global stencil: when enabled, stripes are
computed without it, the flow is ``all_gather``-ed, refined on the full
frame exactly as the untiled pipeline does, and each device keeps its
own rows.  (Reference analogue of the data being tiled: the whole-frame
arrays ``/root/reference/src/main.cpp:162-174``.)
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..config import DISConfig
from ..models.dis import dis_flow_stripe, validate_stripe_geometry


def exchange_halo(x: jnp.ndarray, halo: int, axis_name: str) -> jnp.ndarray:
    """Extend a local row-stripe [Hl, W] with neighbors' edge bands.

    Boundary devices replicate their own edge rows; the replicated fill
    is statically sliced off by the stripe branches (frame-edge stripes
    use the true frame boundary), so fill values are never read.
    Two ``ppermute`` shifts over the mesh axis — pure ICI traffic.
    Requires ``halo <= Hl`` (one-neighbor reach).
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
    # boundary devices: fill (sliced off statically by the edge branches)
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


def _refine_full(img1: jnp.ndarray, img2: jnp.ndarray, flow: jnp.ndarray,
                 cfg: DISConfig) -> jnp.ndarray:
    """Full-frame variational refinement exactly as ``dis_flow_padded``
    runs it: on the finest-scale pyramid images (quirk-Q1 planes)."""
    from ..ops.pyramid import construct_pyramid_auto
    from ..ops.variational import variational_refinement

    s = cfg.finest_scale
    pyr1 = construct_pyramid_auto(img1, cfg.coarsest_scale,
                                  cfg.img_padding, cfg.kernel)
    pyr2 = construct_pyramid_auto(img2, cfg.coarsest_scale,
                                  cfg.img_padding, cfg.kernel)
    return variational_refinement(pyr1[s].img, pyr2[s].img, flow, cfg)


def tiled_flow_exact(img1: jnp.ndarray, img2: jnp.ndarray, cfg: DISConfig,
                     n_stripes: int, halo: int, refine: bool = None):
    """EXACT tiled execution on one controller: compute the frame as
    ``n_stripes`` stripes via :func:`dis_flow_stripe` and concatenate —
    every row matches the untiled pipeline (tests/test_stripe_exact.py).

    ``refine`` (default: ``cfg.refinement_iters > 0``) runs variational
    refinement on the gathered flow, matching ``dis_flow_padded``.
    This is the host-level pattern for multi-host deployments (each host
    traces its own stripe program); :func:`tiled_flow_fn` is the
    single-trace multi-device version of the same math.
    """
    if refine is None:
        refine = cfg.refinement_iters > 0
    if refine and cfg.refinement_iters > 0 and cfg.refine_per_level:
        raise ValueError(
            "per-level refinement feeds refined flow into coarser->finer "
            "inits, which cannot be tiled exactly; use refine_per_level="
            "False (final-scale refinement on the gathered flow) or the "
            "untiled pipeline")
    base_cfg = dataclasses.replace(cfg, refinement_iters=0)
    h, w = img1.shape
    outs = []
    for i in range(n_stripes):
        row0, ext_h, own_r0, own_h = stripe_bounds(cfg, h, n_stripes, i, halo)
        outs.append(dis_flow_stripe(
            img1[row0:row0 + ext_h], img2[row0:row0 + ext_h], base_cfg,
            row0=row0, own_r0=own_r0, own_h=own_h, global_h=h))
    flow = jnp.concatenate(outs, axis=0)
    if refine and cfg.refinement_iters > 0:
        flow = _refine_full(img1, img2, flow, cfg)
    return flow


def tiled_flow_fn(cfg: DISConfig, mesh: Mesh, height: int, width: int,
                  axis: str = "space", halo: int = None):
    """Returns a jitted fn ([H, W], [H, W]) -> [H/2**finest, W/2**finest, 2]
    with the frame row-sharded over ``axis`` — output EQUAL to
    ``dis_flow_padded`` everywhere (exact tiling, no seam band).

    ``height`` must be divisible by ``axis_size * 2**coarsest_scale``.
    ``halo`` defaults to :func:`min_stripe_halo` (validated otherwise).
    """
    n = mesh.shape[axis]
    f = 2 ** cfg.coarsest_scale
    if height % (n * f):
        raise ValueError(
            f"height {height} must be divisible by n_space*{f} = {n * f}")
    if cfg.refinement_iters > 0 and cfg.refine_per_level:
        raise ValueError(
            "per-level refinement cannot be tiled exactly (refined flow "
            "seeds coarser->finer inits); use refine_per_level=False")
    own_h = height // n
    if halo is None:
        halo = min_stripe_halo(cfg, width, height, n)
    else:
        for i in range(n):
            row0, ext_h, own_r0, oh = stripe_bounds(cfg, height, n, i, halo)
            validate_stripe_geometry(cfg, width, height, row0, ext_h,
                                     own_r0, oh)
    # One ppermute hop reaches one neighbor stripe; larger halos (tiny
    # frames / many devices) fall back to a tiled all_gather.
    use_gather = halo > own_h
    base_cfg = dataclasses.replace(cfg, refinement_iters=0)

    def make_branch(i):
        row0, ext_h, own_r0, _ = stripe_bounds(cfg, height, n, i, halo)
        # Row of the extended block holding global row row0.
        b0 = row0 if use_gather else row0 - (own_r0 - halo)

        def branch(ops):
            e1, e2 = ops
            s1 = lax.slice_in_dim(e1, b0, b0 + ext_h, axis=0)
            s2 = lax.slice_in_dim(e2, b0, b0 + ext_h, axis=0)
            return dis_flow_stripe(s1, s2, base_cfg, row0=row0,
                                   own_r0=own_r0, own_h=own_h,
                                   global_h=height)
        return branch

    branches = [make_branch(i) for i in range(n)]

    def local(i1, i2):
        if use_gather:
            e1 = lax.all_gather(i1, axis, axis=0, tiled=True)
            e2 = lax.all_gather(i2, axis, axis=0, tiled=True)
        else:
            e1 = exchange_halo(i1, halo, axis)
            e2 = exchange_halo(i2, halo, axis)
        idx = lax.axis_index(axis)
        flow = lax.switch(idx, branches, (e1, e2))
        if cfg.refinement_iters > 0:
            # Global stencil: gather, refine the full frame exactly as
            # the untiled pipeline, keep own rows.
            fs = cfg.finest_scale
            flow_full = lax.all_gather(flow, axis, axis=0, tiled=True)
            if use_gather:
                f1, f2 = e1, e2
            else:
                f1 = lax.all_gather(i1, axis, axis=0, tiled=True)
                f2 = lax.all_gather(i2, axis, axis=0, tiled=True)
            flow_full = _refine_full(f1, f2, flow_full, cfg)
            flow = lax.dynamic_slice_in_dim(
                flow_full, idx * (own_h >> fs), own_h >> fs, axis=0)
        return flow

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None)),
        out_specs=P(axis, None, None),
    )
    return jax.jit(fn)
