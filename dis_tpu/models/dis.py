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
from ..ops.pyramid import construct_pyramid
from ..ops.variational import variational_refinement


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
        pyr1 = construct_pyramid(img1, cfg.coarsest_scale, cfg.img_padding)
        pyr2 = construct_pyramid(img2, cfg.coarsest_scale, cfg.img_padding)

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
            else:
                init_u = init_from_coarser_flow(geom, flow)

            res = iclk.inverse_search(
                l2.img, tpl, centers, init_u, cfg, sw, sh)

            if cfg.mode == "fixed":
                # Residual-adaptive densification weights (DIS paper);
                # res.Q is the final warped query patch.
                ps2 = cfg.num_points_patch
                Tn = tpl.T
                if cfg.patch_normalization:
                    Tn = Tn - Tn.sum(1, keepdims=True) / ps2
                r2 = ((res.Q - Tn) ** 2).sum(axis=1)
                wts = 1.0 / jnp.maximum(1.0, r2)
            else:
                wts = None
            flow = densify(res.u, geom, sw, sh, cfg.patch_size, wts)
            if return_debug:
                p = cfg.img_padding
                debug.append((scale, geom.centers, res.u,
                              l1.img[p:p + sh, p:p + sw]))

    if cfg.refinement_iters > 0:
        with jax.named_scope("variational_refinement"):
            s = cfg.finest_scale
            lvl1, lvl2 = pyr1[s], pyr2[s]
            flow = variational_refinement(
                lvl1.img, lvl2.img, flow, cfg)
    if return_debug:
        return flow, debug
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
