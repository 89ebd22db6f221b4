#!/usr/bin/env python
"""Benchmark suite covering the five BASELINE.json configurations.

Each config prints one JSON line.  On a single-chip machine the
multi-device configs run over a virtual CPU mesh to validate structure
(their numbers are not TPU numbers and are labeled accordingly);
on a pod slice they run over the real mesh.

  #1 single pair, 3-level pyramid, 8x8 patches, no refinement
  #2 full DIS preset with variational refinement, single chip
  #3 KITTI-size batched multi-pair across devices
  #4 1080p frame-tiled with halo exchange (latency)
  #5 sequence sharded along time + scaling efficiency
"""

import argparse
import json
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "benchmarks"))

# One timing methodology for all artifacts (benchmarks/timing.py):
# chained device-side repetitions, the same harness bench.py and
# tpu_experiments.py use — round-2 VERDICT item #6 (this file used to
# time with host perf_counter, giving the same workload a different
# number than bench.py).
from timing import chained_seconds as timed  # noqa: E402


def synth(h, w, seed=0):
    r = np.random.default_rng(seed)
    from scipy.signal import convolve2d
    k = np.ones((5, 5), np.float32) / 25
    img = convolve2d((r.random((h, w)) * 255).astype(np.float32), k,
                     "same", "symm").astype(np.float32)
    return img


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None,
                    help="also write the JSON records to this file "
                         "(overwrites)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dis_tpu.config import DISConfig
    from dis_tpu.models.dis import dis_flow_padded
    from dis_tpu.parallel import (make_mesh, batched_flow_fn, tiled_flow_fn,
                                  sequence_flow_fn)

    platform = jax.default_backend()
    ndev = jax.device_count()
    records = []

    def emit(**kw):
        rec = {"platform": platform, "timing": "chained-device", **kw}
        records.append(rec)
        print(json.dumps(rec), flush=True)

    # 1: single Middlebury/Sintel-like pair, DIS-fast, no refinement
    cfg1 = DISConfig(iterations=16, coarsest_scale=3, patch_overlap=0.3,
                     early_exit=False)
    h, w = 440, 1024  # padded Sintel dims
    a, b = jnp.asarray(synth(h, w, 1)), jnp.asarray(synth(h, w, 2))
    f1 = jax.jit(lambda a, b: dis_flow_padded(a, b, cfg1).sum())
    dt = timed(f1, a, b)
    emit(config=1, desc="single Sintel pair DIS-fast", fps=round(1 / dt, 3))

    # 2: full preset with variational refinement (paper-form: one
    # warp/linearization per level, lagged fixed-point + SOR, as in the
    # DIS authors' OpenCV VariationalRefinement; quality A/B in
    # PERF_NOTES.md shows this beats re-warping outers)
    cfg2 = DISConfig(iterations=16, coarsest_scale=3, patch_overlap=0.3,
                     mode="fixed", refinement_iters=1,
                     refine_per_level=True, refinement_inner_sweeps=5,
                     refinement_sor_sweeps=5, refinement_omega=1.6,
                     early_exit=False)
    f2 = jax.jit(lambda a, b: dis_flow_padded(a, b, cfg2).sum())
    dt = timed(f2, a, b)
    emit(config=2, desc="full DIS + variational refinement", fps=round(1 / dt, 3))

    # 3: KITTI-size batched multi-pair
    nb = min(ndev, 8)
    mesh = make_mesh((nb, 1))
    cfg3 = DISConfig(iterations=16, coarsest_scale=3, patch_overlap=0.3,
                     early_exit=False)
    kh, kw = 376, 1248  # KITTI padded to /8
    bf = batched_flow_fn(cfg3, mesh)
    aa = jnp.asarray(np.stack([synth(kh, kw, i) for i in range(nb)]))
    bb = jnp.asarray(np.stack([synth(kh, kw, i + 50) for i in range(nb)]))
    g = jax.jit(lambda x, y: bf(x, y).sum())
    dt = timed(g, aa, bb)
    emit(config=3, desc=f"KITTI batch x{nb} pairs", pairs_per_sec=round(nb / dt, 3),
         devices=nb)

    # 3b: single-chip vmap batching (the coarse scales run small grids
    # at ~2.6x worse per-patch efficiency — batching pairs widens them,
    # so per-chip throughput exceeds 1/latency; ROOFLINE.md per-scale
    # split).  Reported at the best batch size.
    if ndev == 1:
        best_bsz, best_pps = 1, nb / dt
        for bsz in (2, 4):
            a2 = jnp.asarray(np.stack([synth(kh, kw, 100 + i)
                                       for i in range(bsz)]))
            b2 = jnp.asarray(np.stack([synth(kh, kw, 150 + i)
                                       for i in range(bsz)]))
            gb = jax.jit(lambda x, y: bf(x, y).sum())
            dtb = timed(gb, a2, b2)
            if bsz / dtb > best_pps:
                best_bsz, best_pps = bsz, bsz / dtb
        emit(config="3b", desc=f"KITTI single-chip vmap batch x{best_bsz}",
             pairs_per_sec=round(best_pps, 3), devices=1)

    # 4: 1080p frame-tiled across devices (latency)
    ns = 2 if ndev >= 2 else 1
    if ns > 1:
        smesh = make_mesh((1, ns), axis_names=("batch", "space"))
        cfg4 = DISConfig(iterations=16, coarsest_scale=3, patch_overlap=0.3,
                         early_exit=False)
        th, tw = 1088, 1920  # 1080p padded to /(2^coarsest * n_space)
        tf = tiled_flow_fn(cfg4, smesh, th, tw)
        t1 = jnp.asarray(synth(th, tw, 3))
        t2 = jnp.asarray(synth(th, tw, 4))
        g4 = jax.jit(lambda x, y: tf(x, y).sum())
        dt = timed(g4, t1, t2)
        emit(config=4, desc=f"1080p tiled x{ns} (latency)",
             ms_per_frame=round(dt * 1000, 2), devices=ns)
    else:
        emit(config=4, desc="1080p tiled", skipped="needs >=2 devices")

    # 5: sequence sharding + scaling efficiency
    if ndev >= 2:
        from dis_tpu.parallel.distributed import scaling_report
        rep = scaling_report(h=192, w=256,
                             device_counts=[c for c in (1, 2, 4, 8) if c <= ndev])
        emit(config=5, desc="sequence/batch scaling", **rep)
    else:
        emit(config=5, desc="scaling", skipped="needs >=2 devices")

    if args.out:
        with open(args.out, "w") as f:
            json.dump(records, f, indent=1)


if __name__ == "__main__":
    main()
