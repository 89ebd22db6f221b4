"""Coarse-to-fine DIS orchestrator (optical_flow.cpp:19-132), jit-able.

The reference runs the whole algorithm inside a class constructor over
mutable per-scale state; here it is a pure function
``flow = dis_flow(img1, img2, cfg)``.  Scale shapes are static, so the
scale loop is a Python loop unrolled at trace time — each scale is a
distinct static-shape stage, which is exactly what XLA wants.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import DISConfig
from ..ops import image as im
from ..ops import iclk
from ..ops.densify import densify
from ..ops.grid import make_grid, init_from_coarser_flow
from ..ops.pyramid import construct_pyramid_auto
from ..ops.variational import variational_refinement


def _fixed_weights(res, tpl, cfg: DISConfig) -> jnp.ndarray:
    """Residual-adaptive densification weights (DIS paper eq. 4):
    ``1 / max(1, ||Q - T||^2)`` with the mean-normalized template.

    Patches frozen at start (OOB init, quirk path patch.cpp:132-136)
    never resampled: their ``Q`` is the raw template, so the residual
    would be the template's mean energy, not an intensity error.  Those
    patches get a defined constant weight of 1.0 instead (mirrored in
    oracle/reference_semantics.py so pipeline == oracle).
    """
    ps2 = cfg.num_points_patch
    Tn = tpl.T
    if cfg.patch_normalization:
        Tn = Tn - Tn.sum(1, keepdims=True) / ps2
    r2 = ((res.Q - Tn) ** 2).sum(axis=1)
    return jnp.where(res.start_oob, jnp.float32(1.0),
                     1.0 / jnp.maximum(1.0, r2))


def dis_flow_padded(img1: jnp.ndarray, img2: jnp.ndarray,
                    cfg: DISConfig, return_debug: bool = False):
    """DIS flow on an already divisibility-padded grayscale float pair.

    Returns flow at scale ``finest_scale``:
    [H / 2**finest, W / 2**finest, 2] — the C13 upscale/crop is in
    :func:`dis_flow`.  With ``return_debug``, also returns a per-scale
    list of (scale, centers, u, level_image) for the C12 grid overlay
    (optical_flow.cpp:92-123).
    """
    h, w = img1.shape
    f = 2 ** cfg.coarsest_scale
    if w % f or h % f:
        raise ValueError(f"padded input dims must be divisible by {f}")

    with jax.named_scope("pyramid"):
        # Fused Pallas stencil per level on accelerators; the XLA recipe
        # on CPU (and under kernel="xla").  Bit-identical paths
        # (tests/test_pallas_pyramid.py).
        pyr1 = construct_pyramid_auto(img1, cfg.coarsest_scale,
                                      cfg.img_padding, cfg.kernel)
        pyr2 = construct_pyramid_auto(img2, cfg.coarsest_scale,
                                      cfg.img_padding, cfg.kernel)

    flow = None
    debug = []
    for scale in range(cfg.coarsest_scale, cfg.finest_scale - 1, -1):
        with jax.named_scope(f"scale_{scale}"):
            l1 = pyr1[scale]
            l2 = pyr2[scale]
            sw, sh = l1.width, l1.height
            geom = make_grid(sw, sh, cfg.steps)
            centers = jnp.asarray(geom.centers)

            tpl = iclk.extract_templates_grid(
                l1.img, l1.dx, l1.dy, geom, cfg.patch_size, cfg.img_padding)

            if flow is None:
                init_u = jnp.zeros_like(centers)
                init_bound = 0.0
            else:
                init_u = init_from_coarser_flow(geom, flow)
                # NN init is 2x the coarser flow, which policing bounds
                # (Q9) — unless per-level refinement rewrote it.
                init_bound = (None if (cfg.refinement_iters > 0
                                       and cfg.refine_per_level)
                              else 2.0 * motion_bound(cfg, scale + 1))

            res = iclk.inverse_search(
                l2.img, tpl, centers, init_u, cfg, sw, sh,
                geom=geom, init_bound=init_bound)

            wts = _fixed_weights(res, tpl, cfg) if cfg.mode == "fixed" else None
            flow = densify(res.u, geom, sw, sh, cfg.patch_size, wts)
            if cfg.refinement_iters > 0 and cfg.refine_per_level:
                # DIS paper sec. 3.3: refine the densified flow at every
                # scale; the refined field seeds the next-finer init.
                with jax.named_scope(f"refine_s{scale}"):
                    flow = variational_refinement(l1.img, l2.img, flow, cfg)
            if return_debug:
                p = cfg.img_padding
                debug.append((scale, geom.centers, res.u,
                              l1.img[p:p + sh, p:p + sw]))

    if cfg.refinement_iters > 0 and not cfg.refine_per_level:
        with jax.named_scope("variational_refinement"):
            s = cfg.finest_scale
            lvl1, lvl2 = pyr1[s], pyr2[s]
            flow = variational_refinement(
                lvl1.img, lvl2.img, flow, cfg)
    from ..utils import checks
    if checks.enabled():
        checks.check(jnp.isfinite(flow).all(),
                     "pipeline produced non-finite flow")
    if return_debug:
        return flow, debug
    return flow


def motion_bound(cfg: DISConfig, scale: int) -> float:
    """Upper bound on |u| at ``scale`` from the policing chain: the
    coarsest init is zero and every scale adds at most ``ps/2`` on top
    of twice the coarser flow (patch.cpp:185-194 + patch_grid.cpp:116)."""
    b = cfg.outlier_thresh
    for _ in range(cfg.coarsest_scale - scale):
        b = 2.0 * b + cfg.outlier_thresh
    return b


def _stripe_plan(cfg: DISConfig, global_w: int, global_h: int,
                 own_r0: int, own_h: int):
    """Per-scale (patch-row range, flow-output window) for a stripe that
    must emit global rows [own_r0, own_r0 + own_h) at the finest scale.

    Windows propagate coarser via the nearest-neighbor init lookup
    (floor(cy/2), quirk Q8); patch ranges cover every footprint that
    touches the scale's output window.
    """
    import math as _m

    half = cfg.patch_size // 2
    steps = cfg.steps
    win = {cfg.finest_scale: (own_r0 >> cfg.finest_scale,
                              (own_r0 + own_h) >> cfg.finest_scale)}
    iy = {}
    for s in range(cfg.finest_scale, cfg.coarsest_scale + 1):
        gh_s = global_h >> s
        num_h = _m.ceil(gh_s / steps)
        offh = _m.floor((gh_s - (num_h - 1) * steps) / 2)
        lo, hi = win[s]
        cy_lo = lo - half + 1
        cy_hi = hi - 1 + half
        iy0 = max(0, _m.ceil((cy_lo - offh) / steps))
        iy1 = min(num_h, _m.floor((cy_hi - offh) / steps) + 1)
        iy[s] = (iy0, iy1)
        if s < cfg.coarsest_scale:
            cmin = iy0 * steps + offh
            cmax = (iy1 - 1) * steps + offh
            win[s + 1] = (cmin // 2, cmax // 2 + 1)
    return iy, win


def validate_stripe_geometry(cfg: DISConfig, width: int, global_h: int,
                             row0: int, ext_h: int, own_r0: int,
                             own_h: int) -> None:
    """Static check that a stripe's halo covers every included patch's
    sampling reach and stencil margins; raises ValueError otherwise."""
    import math as _m

    iy_plan, _ = _stripe_plan(cfg, width, global_h, own_r0, own_h)
    ps = cfg.patch_size
    stencil_margin = 4  # pyramid edge contamination per level (bounded)
    for s in range(cfg.finest_scale, cfg.coarsest_scale + 1):
        r0_s = row0 >> s
        eh_s = ext_h >> s
        gh_s = global_h >> s
        iy0, iy1 = iy_plan[s]
        if iy0 >= iy1:
            continue
        num_h = _m.ceil(gh_s / cfg.steps)
        offh = _m.floor((gh_s - (num_h - 1) * cfg.steps) / 2)
        cmin = iy0 * cfg.steps + offh
        cmax = (iy1 - 1) * cfg.steps + offh
        reach = motion_bound(cfg, s) + ps + 3
        lo_ok = (r0_s == 0) or (cmin - reach >= r0_s + stencil_margin)
        hi_ok = (r0_s + eh_s == gh_s) or (
            cmax + reach < r0_s + eh_s - stencil_margin)
        if not (lo_ok and hi_ok):
            raise ValueError(
                f"stripe halo too small at scale {s}: patches "
                f"[{cmin},{cmax}] need +/-{reach:.0f} rows inside "
                f"[{r0_s},{r0_s + eh_s}) of {gh_s}")


def dis_flow_stripe(img1_ext: jnp.ndarray, img2_ext: jnp.ndarray,
                    cfg: DISConfig, row0: int, own_r0: int, own_h: int,
                    global_h: int) -> jnp.ndarray:
    """Exact tiled execution: flow for global rows
    [own_r0, own_r0 + own_h) from an extended stripe covering global
    rows [row0, row0 + ext_h).

    All geometry (patch grid, policing bounds, densification windows)
    is GLOBAL — the stripe only localizes the image planes — so interior
    results match the untiled pipeline exactly.  ``row0``, ``ext_h``,
    ``own_r0`` and ``own_h`` must be multiples of ``2**coarsest_scale``;
    the halo must cover the per-scale motion bound plus stencil margins
    (validated statically, raises ValueError otherwise).
    """
    ext_h, w = img1_ext.shape
    f = 2 ** cfg.coarsest_scale
    for name, v in [("row0", row0), ("ext_h", ext_h), ("own_r0", own_r0),
                    ("own_h", own_h), ("global_h", global_h)]:
        if v % f:
            raise ValueError(f"{name}={v} must be divisible by {f}")
    if cfg.refinement_iters > 0:
        raise ValueError(
            "variational refinement is a global stencil; run it on the "
            "gathered flow, not per stripe")

    iy_plan, win_plan = _stripe_plan(cfg, w, global_h, own_r0, own_h)
    validate_stripe_geometry(cfg, w, global_h, row0, ext_h, own_r0, own_h)

    with jax.named_scope("pyramid"):
        pyr1 = construct_pyramid_auto(img1_ext, cfg.coarsest_scale,
                                      cfg.img_padding, cfg.kernel)
        pyr2 = construct_pyramid_auto(img2_ext, cfg.coarsest_scale,
                                      cfg.img_padding, cfg.kernel)

    flow = None
    for scale in range(cfg.coarsest_scale, cfg.finest_scale - 1, -1):
        with jax.named_scope(f"stripe_scale_{scale}"):
            l1 = pyr1[scale]
            l2 = pyr2[scale]
            sw = l1.width
            gh_s = global_h >> scale
            r0_s = row0 >> scale
            geom = make_grid(sw, gh_s, cfg.steps, iy_range=iy_plan[scale])
            centers = jnp.asarray(geom.centers)

            tpl = iclk.extract_templates_grid(
                l1.img, l1.dx, l1.dy, geom, cfg.patch_size, cfg.img_padding,
                row0=r0_s)

            if flow is None:
                init_u = jnp.zeros_like(centers)
                init_bound = 0.0
            else:
                init_u = init_from_coarser_flow(
                    geom, flow, coarse_row_offset=win_plan[scale + 1][0])
                init_bound = 2.0 * motion_bound(cfg, scale + 1)

            res = iclk.inverse_search(
                l2.img, tpl, centers, init_u, cfg, sw, gh_s, row0=r0_s,
                geom=geom, init_bound=init_bound)

            wts = _fixed_weights(res, tpl, cfg) if cfg.mode == "fixed" else None
            wlo, whi = win_plan[scale]
            flow = densify(res.u, geom, sw, whi - wlo, cfg.patch_size, wts,
                           out_row0=wlo)

    return flow


def dis_flow(img1: jnp.ndarray, img2: jnp.ndarray,
             cfg: DISConfig = DISConfig()) -> jnp.ndarray:
    """End-to-end flow for an arbitrary-size grayscale pair.

    Applies divisibility padding (main.cpp:140-155), the pipeline, the
    finest-scale upsample (main.cpp:191-196) and the padding crop
    (main.cpp:198).  Returns [H, W, 2] at input resolution.
    """
    h, w = img1.shape
    p1, (padw, padh) = im.pad_divisible(img1.astype(jnp.float32), cfg.coarsest_scale)
    p2, _ = im.pad_divisible(img2.astype(jnp.float32), cfg.coarsest_scale)
    flow = dis_flow_padded(p1, p2, cfg)
    if cfg.finest_scale != 0:
        sc = 2 ** cfg.finest_scale
        flow = flow * jnp.float32(sc)
        flow = im.resize_bilinear(flow, p1.shape[1], p1.shape[0])
    return im.crop_padding(flow, padw, padh, w, h)


@partial(jax.jit, static_argnames=("cfg",))
def dis_flow_jit(img1: jnp.ndarray, img2: jnp.ndarray,
                 cfg: DISConfig) -> jnp.ndarray:
    return dis_flow(img1, img2, cfg)
