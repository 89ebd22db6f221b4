#!/usr/bin/env python
"""Batched A/B experiments for the TPU chip (round-2 perf work).

Remote compiles over the tunnel cost 2-10 min each, so every candidate
is compiled and measured in ONE session.  Prints one JSON line per
experiment.  Timing uses the device-side scalar-fetch pattern from
bench.py (block_until_ready is a no-op on the tunneled platform).

Usage:
    python benchmarks/tpu_experiments.py [--only stage1,stage2,...]
Stages: densify, pyramid, extract, search, frame
"""

import argparse
import importlib
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "benchmarks"))

# Shared chained device-side timing (benchmarks/timing.py) — the one
# methodology every artifact uses (round-2 VERDICT item #6).
from timing import chained_seconds as timed  # noqa: E402

W, H = 1920, 1080
PADH = 1088  # divisible by 8


def emit(**kw):
    print(json.dumps(kw), flush=True)


def synth(h, w, seed=0):
    from scipy.signal import convolve2d

    r = np.random.default_rng(seed)
    k = np.ones((7, 7), np.float32) / 49.0
    return convolve2d((r.random((h, w)) * 255).astype(np.float32), k,
                      "same", "symm").astype(np.float32)


def bench_densify():
    import jax
    import jax.numpy as jnp

    import dis_tpu.ops.densify as dmod
    from dis_tpu.ops.grid import make_grid

    for steps in (5, 2):
        geom = make_grid(W, PADH, steps)
        n = geom.num_w * geom.num_h
        r = np.random.default_rng(0)
        u = jnp.asarray(r.standard_normal((n, 2)).astype(np.float32))
        wts = jnp.asarray(r.random(n).astype(np.float32) + 0.1)
        for algo in ("dilated", "batch", "phases"):
            dmod._ALGO = algo
            for wv, name in ((None, "uniform"), (wts, "weighted")):
                fn = jax.jit(lambda uu, ww=wv: dmod.densify(
                    uu, geom, W, PADH, 8, ww).sum())
                dt = timed(fn, u)
                emit(stage="densify", algo=algo, steps=steps, weights=name,
                     ms=round(dt * 1e3, 3))


def bench_pyramid():
    import jax
    import jax.numpy as jnp

    from dis_tpu.ops.pyramid import construct_pyramid

    img = jnp.asarray(synth(PADH, W))

    def full(x):
        lv = construct_pyramid(x, 3, 8)
        return sum(l.img.sum() + l.dx.sum() + l.dy.sum() for l in lv)

    dt = timed(jax.jit(full), img)
    emit(stage="pyramid", algo="xla_current", ms=round(dt * 1e3, 3))

    # Pallas fused level kernel, if present
    try:
        from dis_tpu.ops.pallas.pyramid_kernel import construct_pyramid_pallas

        def fullp(x):
            lv = construct_pyramid_pallas(x, 3, 8)
            return sum(l.img.sum() + l.dx.sum() + l.dy.sum() for l in lv)

        dt = timed(jax.jit(fullp), img)
        emit(stage="pyramid", algo="pallas_fused", ms=round(dt * 1e3, 3))
    except ImportError:
        emit(stage="pyramid", algo="pallas_fused", skipped="not implemented")


def bench_pyramid_micro():
    """Per-primitive timings to locate the pyramid hotspot (the whole
    chain measures 12.7 ms at 1080p vs ~0.2 ms of HBM traffic)."""
    import jax
    import jax.numpy as jnp

    from dis_tpu.ops import image as im

    img = jnp.asarray(synth(PADH, W))
    prims = {
        "sobel_x": lambda x: im.sobel3(x, "x").sum(),
        "sobel_y": lambda x: im.sobel3(x, "y").sum(),
        "magnitude": lambda x: im.gradient_magnitude(x).sum(),
        "replicate_pad8": lambda x: im.replicate_pad(x, 8, 8, 8, 8).sum(),
        "constant_pad8": lambda x: im.constant_pad(x, 8, 8, 8, 8).sum(),
        "resize_half": lambda x: im.resize_half(x).sum(),
        "sobel_both_fused": lambda x: (im.sobel3(x, "x")
                                       + im.sobel3(x, "y")).sum(),
        "copy": lambda x: (x * 2.0).sum(),
    }
    for name, f in prims.items():
        dt = timed(jax.jit(f), img)
        emit(stage="pyramid_micro", op=name, ms=round(dt * 1e3, 3))


def _scale0_problem():
    """Finest-scale extraction+search inputs at 1080p DIS-fast compat."""
    import jax.numpy as jnp

    from dis_tpu.config import DISConfig
    from dis_tpu.ops import iclk
    from dis_tpu.ops.grid import make_grid
    from dis_tpu.ops.pyramid import construct_pyramid

    cfg = DISConfig(iterations=16, patch_size=8, coarsest_scale=3,
                    finest_scale=0, patch_overlap=0.3, mode="compat",
                    early_exit=False)
    i1 = jnp.asarray(synth(PADH, W, 1))
    i2 = jnp.asarray(synth(PADH, W, 2))
    pyr1 = construct_pyramid(i1, 3, cfg.img_padding)
    pyr2 = construct_pyramid(i2, 3, cfg.img_padding)
    l1, l2 = pyr1[0], pyr2[0]
    geom = make_grid(l1.width, l1.height, cfg.steps)
    centers = jnp.asarray(geom.centers)
    tpl = iclk.extract_templates_grid(l1.img, l1.dx, l1.dy, geom,
                                      cfg.patch_size, cfg.img_padding)
    r = np.random.default_rng(3)
    init_u = jnp.asarray(
        r.uniform(-2, 2, centers.shape).astype(np.float32))
    return cfg, l2, tpl, centers, init_u, geom


def bench_extract():
    import jax
    import jax.numpy as jnp

    from dis_tpu.ops import iclk
    from dis_tpu.ops.pallas.extract_kernel import extract_regions_pallas

    cfg, l2, tpl, centers, init_u, geom = _scale0_problem()
    pos0 = centers + init_u
    ps, pad = cfg.patch_size, cfg.img_padding

    fn_x = jax.jit(lambda p: iclk.extract_regions(l2.img, p, ps, pad)[0].sum())
    emit(stage="extract", algo="xla_regions",
         ms=round(timed(fn_x, pos0) * 1e3, 3))
    fn_p = jax.jit(lambda p: extract_regions_pallas(
        l2.img, p, ps, pad)[0].sum())
    emit(stage="extract", algo="pallas_kernel",
         ms=round(timed(fn_p, pos0) * 1e3, 3))

    # transpose variants on realistic region data
    n = centers.shape[0]
    rr, rc = iclk.region_shape(ps)
    block = 512
    nb = -(-n // block)
    npad = nb * block
    regs = jnp.asarray(np.random.default_rng(4).random(
        (npad, rr, rc)).astype(np.float32))
    t4 = jax.jit(lambda x: x.reshape(nb, block, rr, rc)
                 .transpose(0, 2, 3, 1).sum())
    t2 = jax.jit(lambda x: x.reshape(npad, rr * rc).T
                 .reshape(rr, rc, nb, block).sum())
    emit(stage="extract", algo="transpose_4d",
         ms=round(timed(t4, regs) * 1e3, 3))
    emit(stage="extract", algo="transpose_2d",
         ms=round(timed(t2, regs) * 1e3, 3))


def bench_relayout():
    """Region relayout candidates (ROOFLINE 'next lever' #4).

    The [npad, 19, 19] -> [nb, 19, 19, block] lane relayout between the
    extraction and search kernels costs ~3 ms at 1080p as a 4-D XLA
    transpose.  Candidates: contract the patch dim against a block-size
    fp32 identity on the MXU (bit-exact: every output element is one
    nonzero product plus zeros), from (a) the current tile-padded
    [npad, 19, 19] extraction layout and (b) a dense [npad, 361] layout
    (what the extraction kernel would write if we flatten the region
    into lanes — also shrinks the HBM write ~8x)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from dis_tpu.ops import iclk

    cfg, l2, tpl, centers, init_u, geom = _scale0_problem()
    n = centers.shape[0]
    rr, rc = iclk.region_shape(cfg.patch_size)
    block = 512
    nb = -(-n // block)
    npad = nb * block
    rng = np.random.default_rng(5)
    regs3 = jnp.asarray(rng.random((npad, rr, rc)).astype(np.float32))
    regs2 = jnp.asarray(rng.random((npad, rr * rc)).astype(np.float32))
    eye = jnp.eye(block, dtype=jnp.float32)

    def done(out):
        # Force the relayout result to be materialized: a bare .sum()
        # lets XLA elide the transpose (reduce-of-transpose simplifies
        # away), which made the first round of these numbers bogus.
        return lax.optimization_barrier(out).sum()

    def mxu_from3(x):
        lhs = x.reshape(nb, block, rr * rc)
        out = lax.dot_general(lhs, eye, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
        # [nb, rr*rc, block] -> [nb, rr, rc, block]
        return done(out.reshape(nb, rr, rc, block))

    t4 = jax.jit(lambda x: done(x.reshape(nb, block, rr, rc)
                                .transpose(0, 2, 3, 1)))
    emit(stage="relayout", algo="transpose_4d",
         ms=round(timed(t4, regs3) * 1e3, 3))
    emit(stage="relayout", algo="mxu_eye_from_3d",
         ms=round(timed(jax.jit(mxu_from3), regs3) * 1e3, 3))
    # dense-2d XLA transpose for comparison (what a flat extraction
    # write would give the old route)
    td = jax.jit(lambda x: done(x.reshape(nb, block, rr * rc)
                                .transpose(0, 2, 1)
                                .reshape(nb, rr, rc, block)))
    emit(stage="relayout", algo="transpose_from_dense2d",
         ms=round(timed(td, regs2) * 1e3, 3))


def bench_search():
    import jax

    import dis_tpu.ops.pallas.iclk_kernel as kmod
    from dis_tpu.ops import iclk

    cfg, l2, tpl, centers, init_u, geom = _scale0_problem()
    sw, sh = geom.num_w * 0 + l2.width, l2.height

    for sampler in ("align", "align2"):
        kmod._SAMPLER = sampler
        kmod._REG_LAYOUT = "4d"
        fn = jax.jit(lambda iu: iclk.inverse_search(
            l2.img, tpl, centers, iu, cfg, sw, sh).u.sum())
        dt = timed(fn, init_u)
        emit(stage="search", sampler=sampler, layout="4d",
             ms=round(dt * 1e3, 3))


def bench_block():
    """Kernel block-size sweep (round-1: 1024 blew the 16 MB scoped VMEM
    with the onehot sampler; align2's narrowing shrinks live intermediates,
    so retry)."""
    import os

    import jax

    import dis_tpu.ops.pallas.iclk_kernel as kmod
    from dis_tpu.ops import iclk

    cfg, l2, tpl, centers, init_u, geom = _scale0_problem()
    sw, sh = l2.width, l2.height

    kmod._SAMPLER = "align2"
    kmod._REG_LAYOUT = "4d"
    for block in (512, 1024):
        os.environ["DIS_TPU_BLOCK"] = str(block)
        try:
            fn = jax.jit(lambda iu: iclk.inverse_search(
                l2.img, tpl, centers, iu, cfg, sw, sh).u.sum())
            dt = timed(fn, init_u)
            emit(stage="block", block=block, ms=round(dt * 1e3, 3))
        except Exception as e:  # compile/VMEM failures are data too
            emit(stage="block", block=block, error=str(e)[:200])
    os.environ["DIS_TPU_BLOCK"] = "512"


def bench_frame_pyr():
    """Controlled pyramid-path A/B: same frame jit with only the
    pyramid implementation toggled, measured ALTERNATING in one session
    (run-to-run variance over the tunnel is ~1 ms, larger than the
    expected delta)."""
    import os

    import jax
    import jax.numpy as jnp

    from dis_tpu.config import DISConfig
    from dis_tpu.models.dis import dis_flow_padded

    cfg = DISConfig(iterations=16, patch_size=8, coarsest_scale=3,
                    finest_scale=0, patch_overlap=0.3, mode="compat",
                    early_exit=False)
    i1 = jnp.asarray(synth(PADH, W, 1))
    i2 = jnp.asarray(synth(PADH, W, 2))
    fns = {}
    for mode in ("xla", "pallas"):
        os.environ["DIS_TPU_PYRAMID"] = mode
        fns[mode] = jax.jit(lambda a, b: dis_flow_padded(a, b, cfg).sum())
        # compile now, while the env var is set
        dt = timed(fns[mode], i1, i2, chain=2, reps=1)
    best = {m: float("inf") for m in fns}
    for _ in range(4):
        for m, fn in fns.items():
            # timed() re-traces its chain wrapper (inlining the jit), so
            # the env var must be set for every measurement, not just
            # the first compile.
            os.environ["DIS_TPU_PYRAMID"] = m
            best[m] = min(best[m], timed(fn, i1, i2, chain=4, reps=1))
    os.environ["DIS_TPU_PYRAMID"] = "auto"
    for m, dt in best.items():
        emit(stage="frame_pyr", pyramid=m, fps=round(1.0 / dt, 3),
             ms=round(dt * 1e3, 2))


def bench_batch():
    """Single-chip batched throughput: vmap over frame pairs.

    Coarse scales run at ~2.6x worse per-patch efficiency than the
    finest (per-scale fixed costs; see ROOFLINE.md) — batching widens
    the small grids, so pairs/sec should beat 1/latency.  Uses
    parallel.batch.batched_flow_fn, the same vmapped pipeline that
    config #3 shards across devices."""
    import jax
    import jax.numpy as jnp

    from dis_tpu.config import DISConfig
    from dis_tpu.parallel.batch import batched_flow_fn

    cfg = DISConfig(iterations=16, patch_size=8, coarsest_scale=3,
                    finest_scale=0, patch_overlap=0.3, mode="compat",
                    early_exit=False)
    for (h, w) in ((PADH, W), (440, 1024)):   # 1080p, Sintel-size
        for bsz in (1, 2, 4):
            i1 = jnp.stack([jnp.asarray(synth(h, w, 2 * i + 1))
                            for i in range(bsz)])
            i2 = jnp.stack([jnp.asarray(synth(h, w, 2 * i + 2))
                            for i in range(bsz)])
            vf = batched_flow_fn(cfg)
            fn = jax.jit(lambda a, b: vf(a, b).sum())
            try:
                dt = timed(fn, i1, i2, chain=4)
                emit(stage="batch", size=f"{w}x{h}", batch=bsz,
                     pairs_per_sec=round(bsz / dt, 3),
                     ms_per_pair=round(dt / bsz * 1e3, 2))
            except Exception as e:
                emit(stage="batch", size=f"{w}x{h}", batch=bsz,
                     error=str(e)[:200])


def bench_refine():
    """Variational refinement structure A/B (suite config-2 shape).

    'cur'   = round-2 default: 5 IRLS outers (5 full warps) at the
              finest scale only, 5 weight updates x 1 sweep each.
    'paper' = OpenCV VariationalRefinement structure (the DIS authors'
              own refinement): ONE warp per pyramid level, 5 lagged
              weight updates x 5 SOR sweeps, omega=1.6.
    'paper_finest' = same single-warp structure, finest level only.
    Quality for the same candidates is measured on CPU
    (/tmp/refine_ab.py; recorded in PERF_NOTES.md)."""
    import jax
    import jax.numpy as jnp

    from dis_tpu.config import DISConfig
    from dis_tpu.models.dis import dis_flow_padded

    base = dict(iterations=16, coarsest_scale=3, patch_overlap=0.3,
                mode="fixed", early_exit=False)
    cands = {
        "cur_5warp_finest": DISConfig(**base, refinement_iters=5,
                                      refinement_inner_sweeps=5,
                                      refinement_sor_sweeps=1),
        "paper_perlevel": DISConfig(**base, refinement_iters=1,
                                    refine_per_level=True,
                                    refinement_inner_sweeps=5,
                                    refinement_sor_sweeps=5,
                                    refinement_omega=1.6),
        "paper_finest": DISConfig(**base, refinement_iters=1,
                                  refinement_inner_sweeps=5,
                                  refinement_sor_sweeps=5,
                                  refinement_omega=1.6),
        # One-plane warp + Sobel-of-warped gradient averaging (the
        # OpenCV VariationalRefinement linearization): 1/6th the gather.
        "paper_warp1": DISConfig(**base, refinement_iters=1,
                                 refine_per_level=True,
                                 refinement_inner_sweeps=5,
                                 refinement_sor_sweeps=5,
                                 refinement_omega=1.6,
                                 refinement_scheme="warp1"),
        "none": DISConfig(**base, refinement_iters=0),
    }
    h, w = 440, 1024
    i1 = jnp.asarray(synth(h, w, 1))
    i2 = jnp.asarray(synth(h, w, 2))
    for name, cfg in cands.items():
        fn = jax.jit(lambda a, b, cfg=cfg: dis_flow_padded(a, b, cfg).sum())
        dt = timed(fn, i1, i2, chain=4)
        emit(stage="refine", algo=name, fps=round(1.0 / dt, 3),
             ms=round(dt * 1e3, 2))


def bench_glue():
    """Round-2 device-trace glue fixes: resize_half formulation,
    conv-vs-slices templates (with on-chip bit-equality), and the
    whole 1080p frame with the regions pad round-trip removed."""
    import jax
    import jax.numpy as jnp

    import dis_tpu.ops.image as imod
    import dis_tpu.ops.iclk as imod2
    from dis_tpu.config import DISConfig
    from dis_tpu.models.dis import dis_flow_padded

    img = jnp.asarray(synth(PADH, W))
    ref = None
    saved_resize = os.environ.get("DIS_TPU_RESIZE")
    for mode in ("reshape", "slices", "window"):
        os.environ["DIS_TPU_RESIZE"] = mode   # read per call by resize_half
        fn = jax.jit(lambda x: imod.resize_half(x).sum())
        out = np.asarray(jax.jit(imod.resize_half)(img))
        if ref is None:
            ref = out
        emit(stage="resize", mode=mode, ms=round(timed(fn, img) * 1e3, 3),
             max_delta=float(np.abs(out - ref).max()))
    if saved_resize is None:
        os.environ.pop("DIS_TPU_RESIZE", None)
    else:
        os.environ["DIS_TPU_RESIZE"] = saved_resize

    from dis_tpu.ops.grid import make_grid
    from dis_tpu.ops.pyramid import construct_pyramid
    for h, w in ((PADH, W), (544, 960), (272, 480), (136, 240)):
        timg = jnp.asarray(synth(h, w, 1))
        l1 = construct_pyramid(timg, 0, 8)[0]
        geom = make_grid(l1.width, l1.height, 5)
        outs = {}
        for mode in ("slices", "conv", "stacked3", "rw"):
            imod2._TEMPLATES = mode
            fn = jax.jit(lambda im_, g=geom, l=l1: sum(
                t.sum() for t in imod2.extract_templates_grid(
                    im_, l.dx, l.dy, g, 8, 8)))
            g2 = jax.jit(lambda im_, g=geom, l=l1: imod2.extract_templates_grid(
                im_, l.dx, l.dy, g, 8, 8).T)(l1.img)
            outs[mode] = np.asarray(g2)
            emit(stage="templates", size=f"{w}x{h}", mode=mode,
                 ms=round(timed(fn, l1.img) * 1e3, 3))
        emit(stage="templates", size=f"{w}x{h}", bit_exact_all=bool(
            all(np.array_equal(outs["slices"], o) for o in outs.values())))
    imod2._TEMPLATES = os.environ.get("DIS_TPU_TEMPLATES", "auto")

    cfg = DISConfig(iterations=16, patch_size=8, coarsest_scale=3,
                    finest_scale=0, patch_overlap=0.3, mode="compat",
                    early_exit=False)
    f1 = jnp.asarray(synth(PADH, W, 1))
    f2 = jnp.asarray(synth(PADH, W, 2))
    fn = jax.jit(lambda a, b: dis_flow_padded(a, b, cfg).sum())
    dt = timed(fn, f1, f2, chain=8)
    emit(stage="frame_glue", fps=round(1.0 / dt, 3), ms=round(dt * 1e3, 2))


def bench_assemble():
    """Densify phase-interleave assembly + coarse-init formulations
    (device-trace follow-ups: assembly ~2.4 ms, init gather 0.64 ms)."""
    import jax
    import jax.numpy as jnp

    import dis_tpu.ops.densify as dmod
    from dis_tpu.ops.grid import make_grid, init_from_coarser_flow

    geom = make_grid(W, PADH, 5)
    n = geom.num_w * geom.num_h
    r = np.random.default_rng(0)
    u = jnp.asarray(r.standard_normal((n, 2)).astype(np.float32))
    for mode in ("stack", "conv", "rowconv"):
        dmod._ASSEMBLE = mode
        fn = jax.jit(lambda uu: dmod.densify(uu, geom, W, PADH, 8, None).sum())
        emit(stage="assemble", mode=mode, ms=round(timed(fn, u) * 1e3, 3))
    dmod._ASSEMBLE = os.environ.get("DIS_TPU_ASSEMBLE", "stack")

    fc = jnp.asarray(r.random((PADH // 2, W // 2, 2)).astype(np.float32))
    fn = jax.jit(lambda f: init_from_coarser_flow(geom, f).sum())
    emit(stage="init2takes", ms=round(timed(fn, fc) * 1e3, 3))


def bench_framex():
    """Just the current-defaults 1080p DIS-fast compat frame."""
    import jax
    import jax.numpy as jnp

    from dis_tpu.config import DISConfig
    from dis_tpu.models.dis import dis_flow_padded

    cfg = DISConfig(iterations=16, patch_size=8, coarsest_scale=3,
                    finest_scale=0, patch_overlap=0.3, mode="compat",
                    early_exit=False)
    f1 = jnp.asarray(synth(PADH, W, 1))
    f2 = jnp.asarray(synth(PADH, W, 2))
    fn = jax.jit(lambda a, b: dis_flow_padded(a, b, cfg).sum())
    dt = timed(fn, f1, f2, chain=8)
    emit(stage="framex", fps=round(1.0 / dt, 3), ms=round(dt * 1e3, 2))


def bench_warp():
    """Warp gather formulations (refinement's dominant cost): TPU gather
    cost scales with gathered ROWS, not bytes — take2/slice1 fetch the
    same tap values with 2x/4x fewer gather rows via replicate-padded
    corner slices.  Also re-times the full config-2-shaped frame with
    the winner."""
    import jax
    import jax.numpy as jnp

    import dis_tpu.ops.variational as vmod
    from dis_tpu.config import DISConfig
    from dis_tpu.models.dis import dis_flow_padded

    h, w = 440, 1024
    rng = np.random.default_rng(7)
    planes = jnp.asarray(rng.random((h, w, 6)).astype(np.float32))
    flow = jnp.asarray(
        (rng.random((h, w, 2)).astype(np.float32) - 0.5) * 8.0)

    ref = None
    for mode in ("take4", "take2", "slice1"):
        vmod._WARP = mode
        fn = jax.jit(lambda f: vmod._warp_bilinear(planes, f)[0].sum())
        try:
            dt = timed(fn, flow, chain=8)
            out = np.asarray(jax.jit(
                lambda f: vmod._warp_bilinear(planes, f)[0])(flow))
            if ref is None:
                ref = out
            emit(stage="warp", mode=mode, ms=round(dt * 1e3, 3),
                 bit_exact=bool(np.array_equal(out, ref)))
        except Exception as e:
            emit(stage="warp", mode=mode, error=str(e)[:200])

    cfg = DISConfig(iterations=16, coarsest_scale=3, patch_overlap=0.3,
                    mode="fixed", early_exit=False, refinement_iters=1,
                    refine_per_level=True, refinement_inner_sweeps=5,
                    refinement_sor_sweeps=5, refinement_omega=1.6)
    i1 = jnp.asarray(synth(h, w, 1))
    i2 = jnp.asarray(synth(h, w, 2))
    for mode in ("take4", "take2"):
        vmod._WARP = mode
        fn = jax.jit(lambda a, b: dis_flow_padded(a, b, cfg).sum())
        dt = timed(fn, i1, i2, chain=4)
        emit(stage="warp_frame", mode=mode, fps=round(1.0 / dt, 3),
             ms=round(dt * 1e3, 2))
    vmod._WARP = os.environ.get("DIS_TPU_WARP", "take4")


def bench_refdef():
    """Reference's own defaults (1000 iterations, stride 2, Sintel size,
    compat semantics) on the in-kernel while_loop early-exit path.
    Long Mosaic compile (~10 min); run in its own batch."""
    import jax
    import jax.numpy as jnp

    from dis_tpu.config import DISConfig
    from dis_tpu.models.dis import dis_flow_padded

    cfg = DISConfig(iterations=1000, patch_size=8, coarsest_scale=3,
                    finest_scale=0, patch_overlap=0.7, mode="compat",
                    early_exit=True)
    h, w = 440, 1024  # Sintel 1024x436 padded to /8
    i1 = jnp.asarray(synth(h, w, 1))
    i2 = jnp.asarray(synth(h, w, 2))
    fn = jax.jit(lambda a, b: dis_flow_padded(a, b, cfg).sum())
    dt = timed(fn, i1, i2, chain=2)
    emit(stage="refdef", s_per_frame=round(dt, 3),
         fps=round(1.0 / dt, 3))


def bench_scales():
    """Where do the non-finest scales cost go?  Frame time with the
    pyramid truncated: full (3..0), finest-only (0..0), and stopped at
    scale 1 (3..1).  Work per scale is a fixed trip count, so the
    differences isolate per-scale cost including launch overheads."""
    import jax
    import jax.numpy as jnp

    from dis_tpu.config import DISConfig
    from dis_tpu.models.dis import dis_flow_padded

    i1 = jnp.asarray(synth(PADH, W, 1))
    i2 = jnp.asarray(synth(PADH, W, 2))
    for coarsest, finest in ((3, 0), (0, 0), (3, 1),
                             (1, 1), (2, 2), (3, 3)):
        cfg = DISConfig(iterations=16, patch_size=8, coarsest_scale=coarsest,
                        finest_scale=finest, patch_overlap=0.3, mode="compat",
                        early_exit=False)
        fn = jax.jit(lambda a, b: dis_flow_padded(a, b, cfg).sum())
        dt = timed(fn, i1, i2)
        emit(stage="scales", coarsest=coarsest, finest=finest,
             ms=round(dt * 1e3, 2))


def bench_frame():
    import jax
    import jax.numpy as jnp

    import dis_tpu.ops.densify as dmod
    import dis_tpu.ops.pallas.iclk_kernel as kmod
    from dis_tpu.config import DISConfig
    from dis_tpu.models.dis import dis_flow_padded

    cfg = DISConfig(iterations=16, patch_size=8, coarsest_scale=3,
                    finest_scale=0, patch_overlap=0.3, mode="compat",
                    early_exit=False)
    i1 = jnp.asarray(synth(PADH, W, 1))
    i2 = jnp.asarray(synth(PADH, W, 2))

    combos = [
        ("phases", "align2", "4d"),    # round-2 shipped default
        ("phases", "align2", "mxu"),   # MXU identity-contraction relayout
    ]
    for dalgo, sampler, layout in combos:
        dmod._ALGO = dalgo
        kmod._SAMPLER = sampler
        kmod._REG_LAYOUT = layout
        fn = jax.jit(lambda a, b: dis_flow_padded(a, b, cfg).sum())
        dt = timed(fn, i1, i2)
        emit(stage="frame", densify=dalgo, sampler=sampler, layout=layout,
             fps=round(1.0 / dt, 3), ms=round(dt * 1e3, 2))


def bench_banded():
    """Column-banded extraction at 1080p (vs whole-image kernel) and the
    4K frame that only the banded path can keep on Pallas."""
    import jax
    import jax.numpy as jnp

    from dis_tpu.ops import iclk
    from dis_tpu.ops.pallas.extract_kernel import (extract_regions_banded,
                                                   extract_regions_pallas)

    cfg, l2, tpl, centers, init_u, geom = _scale0_problem()
    pos0 = centers + init_u
    ps, pad = cfg.patch_size, cfg.img_padding
    fn_b = jax.jit(lambda p: extract_regions_banded(
        l2.img, p, ps, pad, geom.num_w, geom.num_h)[0].sum())
    emit(stage="banded", algo="banded_1080p",
         ms=round(timed(fn_b, pos0, chain=4) * 1e3, 3))
    fn_i = jax.jit(lambda p: extract_regions_pallas(
        l2.img, p, ps, pad)[0].sum())
    emit(stage="banded", algo="image_1080p",
         ms=round(timed(fn_i, pos0, chain=4) * 1e3, 3))


def bench_frame4k():
    import jax
    import jax.numpy as jnp

    from dis_tpu.config import DISConfig
    from dis_tpu.models.dis import dis_flow_padded

    cfg = DISConfig(iterations=16, patch_size=8, coarsest_scale=3,
                    finest_scale=0, patch_overlap=0.3, mode="compat",
                    early_exit=False)
    h4, w4 = 2176, 3840  # 4K padded to /8
    i1 = jnp.asarray(synth(h4, w4, 11))
    i2 = jnp.asarray(synth(h4, w4, 12))
    fn = jax.jit(lambda a, b: dis_flow_padded(a, b, cfg).sum())
    dt = timed(fn, i1, i2, chain=4)
    emit(stage="frame4k", extract=os.environ.get("DIS_TPU_EXTRACT", "auto"),
         fps=round(1.0 / dt, 3), ms=round(dt * 1e3, 2))


STAGES = {"densify": bench_densify, "pyramid": bench_pyramid,
          "block": bench_block, "scales": bench_scales,
          "batch": bench_batch, "refdef": bench_refdef, "frame_pyr": bench_frame_pyr,
          "relayout": bench_relayout, "refine": bench_refine,
          "warp": bench_warp, "glue": bench_glue, "framex": bench_framex, "assemble": bench_assemble,
          "pyramid_micro": bench_pyramid_micro,
          "extract": bench_extract, "search": bench_search,
          "frame": bench_frame, "banded": bench_banded,
          "frame4k": bench_frame4k}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None)
    args = ap.parse_args()
    names = args.only.split(",") if args.only else list(STAGES)
    for name in names:
        try:
            STAGES[name]()
        except Exception as e:  # noqa: BLE001
            emit(stage=name, error=f"{type(e).__name__}: {e}"[:400])


if __name__ == "__main__":
    main()
