#!/usr/bin/env python
"""Honest multi-chip scaling projection from single-chip measurements
(round-3 VERDICT weak item #1 / round-4 item #2).

Multi-chip hardware is not available in this environment, so scaling
efficiency cannot be *measured* end-to-end.  What CAN be measured
honestly on the one real chip is the per-device COMPUTE of every
distinct device program of both exact tiling engines
(parallel/tiles.py):

  * stripe mode (``tiled_flow_fn``): each device runs
    ``dis_flow_stripe`` on its halo-extended stripe.  With the switch
    dedupe there are at most three distinct programs (top / interior /
    bottom); each is jitted and timed here with the repo's single
    chained-repetition methodology (benchmarks/timing.py).  The max
    over stripes is the critical-path compute per frame.
  * grid-tiled mode (``grid_tiled_flow_fn``): each device replicates
    the pyramid and computes a 1/n window of every scale's patches +
    densified rows (``dis_scale_window``), with per-scale flow
    all_gathers between scales.  The per-device program (pyramid + its
    windows, fed the true coarser flows) is timed the same way.

On top of the measured compute, the collectives are MODELED: byte
counts are exact (derived from the engines' actual ppermute /
all_gather calls), the ICI bandwidth is an assumption documented in
the artifact (default 4.5e10 B/s one-way per link, a published TPU
v5e figure; 1-D ring over one mesh axis, all_gather time =
(n-1)/n * bytes / BW).  Host-side dispatch and cross-host DCN are NOT
modeled — the projection is the device-side ceiling, labeled as such.

Projected efficiency at n devices = T1 / (n * (max_dev_compute + ici)).

Also emits the exact-tiling duplication table (ext_h per stripe from
``min_stripe_halo``) that round 3 flagged as unquantified.

Writes SCALING_r05.json (resumable: re-running skips measured cells).
Reference analogue of the data being tiled: the whole-frame arrays
/root/reference/src/main.cpp:162-174.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benchmarks"))

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "SCALING_r05.json")

SIZES = [("1080p", 1088, 1920), ("4K", 2176, 3840)]
NS = (2, 4, 8)


def synth_pair(h, w, seed=42):
    from scipy.signal import convolve2d

    r = np.random.default_rng(seed)
    big = (r.random((h + 16, w + 16)) * 255).astype(np.float32)
    k = np.ones((7, 7), np.float32) / 49.0
    big = convolve2d(big, k, mode="same", boundary="symm").astype(np.float32)
    i1 = big[8:8 + h, 8:8 + w]
    i2 = big[6:6 + h, 5:5 + w]
    return np.ascontiguousarray(i1), np.ascontiguousarray(i2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ici-gbps", type=float, default=45.0,
                    help="assumed one-way ICI bandwidth per link, GB/s "
                         "(TPU v5e published figure ~45)")
    ap.add_argument("--chain", type=int, default=8)
    ap.add_argument("--sizes", default="1080p,4K")
    ap.add_argument("--ns", default="2,4,8",
                    help="comma-separated device counts to project")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny size + CPU-friendly validation run; writes "
                         "to a throwaway file")
    ap.add_argument("--remeasure", action="store_true",
                    help="re-time every existing cell and keep the MIN of "
                         "old and new readings: the tunneled chip's "
                         "throughput drifts on minute scales (observed "
                         "30%% spreads between IDENTICAL-shape stripe "
                         "programs measured minutes apart), and a "
                         "program's true cost is its floor across "
                         "sessions.  Derived efficiencies are recomputed.")
    args = ap.parse_args()

    global SIZES, OUT, NS
    NS = tuple(int(x) for x in args.ns.split(","))
    if args.smoke:
        SIZES = [("smoke", 256, 320)]
        args.sizes = "smoke"
        OUT = "/tmp/scaling_smoke.json"

    import jax
    import jax.numpy as jnp

    from dis_tpu.config import DISConfig
    from dis_tpu.models.dis import (dis_flow_padded, dis_flow_stripe,
                                    dis_scale_window, stripe_local_signature)
    from dis_tpu.ops.pyramid import construct_pyramid_auto
    from dis_tpu.parallel.tiles import (min_stripe_halo, stripe_bounds,
                                        window_partition)
    from timing import chained_seconds

    cfg = DISConfig(iterations=16, patch_size=8, coarsest_scale=3,
                    finest_scale=0, patch_overlap=0.3,
                    patch_normalization=True, mode="compat",
                    early_exit=False)
    ici_bw = args.ici_gbps * 1e9

    rec = {"device": str(jax.devices()[0]),
           "config": "DIS-fast compat (iters=16, ps=8, scales 3..0)",
           "ici_bw_assumed_bytes_per_s": ici_bw,
           "methodology": "chained device timing (benchmarks/timing.py); "
                          "compute measured per distinct device program on "
                          "one chip, collectives modeled from exact byte "
                          "counts at the assumed ICI bandwidth; host "
                          "dispatch / DCN excluded",
           "sizes": {}}
    if os.path.exists(OUT):
        with open(OUT) as f:
            rec = json.load(f)
        rec["ici_bw_assumed_bytes_per_s"] = ici_bw

    want = set(args.sizes.split(","))
    for name, H, W in SIZES:
        if name not in want:
            continue
        sz = rec["sizes"].setdefault(name, {"H": H, "W": W})
        i1, i2 = synth_pair(H, W)
        a, b = jnp.asarray(i1), jnp.asarray(i2)

        if "t1_s" not in sz or args.remeasure:
            t1 = chained_seconds(
                lambda x, y: dis_flow_padded(x, y, cfg).sum(), a, b,
                chain=args.chain)
            sz["t1_s"] = min(t1, sz.get("t1_s", float("inf")))
            print(f"[{name}] untiled T1 = {sz['t1_s']*1e3:.2f} ms", flush=True)
            _save(rec)
        t1 = sz["t1_s"]

        # ---- stripe mode ------------------------------------------------
        stripes = sz.setdefault("stripe", {})
        for n in NS:
            key = str(n)
            if key in stripes and "t_max_s" in stripes[key] \
                    and not args.remeasure:
                continue
            halo = min_stripe_halo(cfg, W, H, n)
            own_h = H // n
            use_gather = halo > own_h
            bounds = [stripe_bounds(cfg, H, n, i, halo) for i in range(n)]
            # group identical-signature stripes exactly as tiled_flow_fn
            groups = {}
            for i in range(n):
                row0, ext_h, own_r0, _ = bounds[i]
                b0 = row0 if use_gather else row0 - (own_r0 - halo)
                sig = (b0,) + stripe_local_signature(
                    cfg, W, H, row0, ext_h, own_r0, own_h)
                groups.setdefault(sig, []).append(i)
            per_group = []
            old_groups = {tuple(g["members"]): g["t_s"]
                          for g in stripes.get(key, {}).get("groups", [])}
            for sig, members in groups.items():
                ri = members[0]
                row0, ext_h, own_r0, _ = bounds[ri]
                s1 = jnp.asarray(i1[row0:row0 + ext_h])
                s2 = jnp.asarray(i2[row0:row0 + ext_h])

                def f(x, y, row0=row0, own_r0=own_r0):
                    return dis_flow_stripe(
                        x, y, cfg, row0=row0, own_r0=own_r0,
                        own_h=own_h, global_h=H).sum()

                t = chained_seconds(f, s1, s2, chain=args.chain)
                t = min(t, old_groups.get(tuple(members), float("inf")))
                per_group.append({"members": members, "ext_h": ext_h,
                                  "t_s": t})
                print(f"[{name}] stripe n={n} group {members} "
                      f"ext_h={ext_h}: {t*1e3:.2f} ms", flush=True)
            t_max = max(g["t_s"] for g in per_group)
            # ICI bytes per device (f32):
            if use_gather:
                ici_bytes = 2 * (n - 1) / n * H * W * 4          # both imgs
            else:
                ici_bytes = 2 * 2 * halo * W * 4                  # 2 dirs x 2 imgs
            t_ici = ici_bytes / ici_bw
            t_n = t_max + t_ici
            stripes[key] = {
                "halo": halo, "own_h": own_h, "use_gather": use_gather,
                "ext_h": [bd[1] for bd in bounds],
                "dup_factor": sum(bd[1] for bd in bounds) / H,
                "groups": per_group, "t_max_s": t_max,
                "ici_bytes_per_dev": ici_bytes, "t_ici_s": t_ici,
                "t_frame_proj_s": t_n,
                "efficiency_proj": t1 / (n * t_n),
                "speedup_proj": t1 / t_n,
            }
            print(f"[{name}] stripe n={n}: max {t_max*1e3:.2f} ms + "
                  f"ici {t_ici*1e3:.3f} ms -> eff "
                  f"{stripes[key]['efficiency_proj']:.3f}", flush=True)
            _save(rec)

        # ---- grid-tiled mode --------------------------------------------
        grid = sz.setdefault("grid", {})
        todo = [n for n in NS
                if str(n) not in grid or args.remeasure]
        if todo:
            # true per-scale coarser-flow inputs, computed once
            @jax.jit
            def scale_inputs(x, y):
                p1 = construct_pyramid_auto(x, cfg.coarsest_scale,
                                            cfg.img_padding, cfg.kernel)
                p2 = construct_pyramid_auto(y, cfg.coarsest_scale,
                                            cfg.img_padding, cfg.kernel)
                flows = {}
                flow = None
                for s in range(cfg.coarsest_scale, cfg.finest_scale - 1, -1):
                    if s < cfg.coarsest_scale:
                        flows[s] = flow
                    flow, _, _ = dis_scale_window(
                        p1[s], p2[s], flow, cfg, s, 0, H >> s)
                return flows

            flow_in = {k: jax.device_put(v)
                       for k, v in scale_inputs(a, b).items()}

        for n in todo:
            wins = {s: window_partition(H >> s, n)
                    for s in range(cfg.finest_scale, cfg.coarsest_scale + 1)}
            per_dev = []
            # distinct window programs: edge (0) and interior (n//2)
            for di in sorted({0, n // 2, n - 1}):
                flows = [flow_in[s] for s in
                         range(cfg.coarsest_scale - 1,
                               cfg.finest_scale - 1, -1)]

                def f(x, y, *fl, di=di):
                    p1 = construct_pyramid_auto(x, cfg.coarsest_scale,
                                                cfg.img_padding, cfg.kernel)
                    p2 = construct_pyramid_auto(y, cfg.coarsest_scale,
                                                cfg.img_padding, cfg.kernel)
                    tot = jnp.float32(0.0)
                    fi = 0
                    for s in range(cfg.coarsest_scale,
                                   cfg.finest_scale - 1, -1):
                        fc = None if s == cfg.coarsest_scale else fl[fi - 1]
                        fi += 1
                        lo, hi = wins[s][di]
                        part, _, _ = dis_scale_window(
                            p1[s], p2[s], fc, cfg, s, lo, hi)
                        tot = tot + part.sum()
                    return tot

                t = chained_seconds(f, a, b, *flows, chain=args.chain)
                old = {d["device"]: d["t_s"]
                       for d in grid.get(str(n), {}).get("devices_timed", [])}
                t = min(t, old.get(di, float("inf")))
                per_dev.append({"device": di, "t_s": t})
                print(f"[{name}] grid n={n} dev {di}: {t*1e3:.2f} ms",
                      flush=True)
            t_max = max(d["t_s"] for d in per_dev)
            # ICI per device: entry all_gather of both images + per-scale
            # tiled all_gather of the flow (grid_tiled_flow_fn).
            gb = 2 * (n - 1) / n * H * W * 4
            for s in range(cfg.coarsest_scale, cfg.finest_scale - 1, -1):
                gb += (n - 1) / n * (H >> s) * (W >> s) * 2 * 4
            t_ici = gb / ici_bw
            t_n = t_max + t_ici
            grid[str(n)] = {
                "devices_timed": per_dev, "t_max_s": t_max,
                "ici_bytes_per_dev": gb, "t_ici_s": t_ici,
                "t_frame_proj_s": t_n,
                "efficiency_proj": t1 / (n * t_n),
                "speedup_proj": t1 / t_n,
            }
            print(f"[{name}] grid n={n}: max {t_max*1e3:.2f} ms + "
                  f"ici {t_ici*1e3:.3f} ms -> eff "
                  f"{grid[str(n)]['efficiency_proj']:.3f}", flush=True)
            _save(rec)

    _save(rec)
    print(json.dumps(
        {name: {
            "t1_ms": round(sz["t1_s"] * 1e3, 2),
            "stripe_eff": {k: round(v["efficiency_proj"], 3)
                           for k, v in sz.get("stripe", {}).items()},
            "grid_eff": {k: round(v["efficiency_proj"], 3)
                         for k, v in sz.get("grid", {}).items()},
        } for name, sz in rec["sizes"].items()}, indent=1))


def _save(rec):
    tmp = OUT + ".tmp"
    with open(tmp, "w") as f:
        json.dump(rec, f, indent=1)
    os.replace(tmp, OUT)


if __name__ == "__main__":
    main()
