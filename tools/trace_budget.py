#!/usr/bin/env python
"""Capture + summarize a device-op time budget for a dis_tpu frame.

``jax.profiler.trace`` works over the tunneled axon platform and is the
only reliable per-op ground truth (stage micro-benchmarks repeatedly
mis-attributed costs this round: closure-captured operands constant-
fold, and isolated wins that unfuse the XLA graph are end-to-end
losses — see PERF_NOTES.md "Negative results").

Usage:
    python tools/trace_budget.py                # capture 1080p DIS-fast, then summarize
    python tools/trace_budget.py --trace DIR    # summarize an existing trace dir
    python tools/trace_budget.py --top 30
Prints per-op ms/frame (descending) and an aggregate by op type.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def capture(trace_dir: str, frames: int = 3, batch: int = 1,
            size: str = "1088x1920") -> None:
    import jax
    import jax.numpy as jnp

    from benchmarks.tpu_experiments import synth
    from dis_tpu.config import DISConfig
    from dis_tpu.models.dis import dis_flow_padded

    h, w = (int(v) for v in size.split("x"))
    cfg = DISConfig(iterations=16, patch_size=8, coarsest_scale=3,
                    finest_scale=0, patch_overlap=0.3, mode="compat",
                    early_exit=False)
    if batch > 1:
        # vmapped pipeline (the --batch CLI / suite config-3b shape);
        # per-op times in the summary are per DISPATCH (batch pairs).
        i1 = jnp.stack([jnp.asarray(synth(h, w, 2 * i + 1))
                        for i in range(batch)])
        i2 = jnp.stack([jnp.asarray(synth(h, w, 2 * i + 2))
                        for i in range(batch)])
        fn = jax.jit(lambda a, b: jax.vmap(
            lambda x, y: dis_flow_padded(x, y, cfg))(a, b).sum())
    else:
        i1 = jnp.asarray(synth(h, w, 1))
        i2 = jnp.asarray(synth(h, w, 2))
        fn = jax.jit(lambda a, b: dis_flow_padded(a, b, cfg).sum())
    float(fn(i1, i2))  # compile + warm outside the trace
    import jax.profiler

    with jax.profiler.trace(trace_dir):
        for _ in range(frames):
            float(fn(i1, i2))


def summarize(trace_dir: str, frames: int, top: int) -> None:
    paths = glob.glob(os.path.join(trace_dir,
                                   "plugins/profile/*/*.trace.json.gz"))
    if not paths:
        raise SystemExit(f"no trace under {trace_dir}")
    with gzip.open(sorted(paths)[-1]) as fh:
        tr = json.load(fh)
    names = {e["pid"]: e["args"].get("name", "")
             for e in tr["traceEvents"]
             if e.get("ph") == "M" and e.get("name") == "process_name"}
    tpu_pids = {p for p, n in names.items() if "TPU" in n}
    ev = [e for e in tr["traceEvents"]
          if e.get("ph") == "X" and e.get("pid") in tpu_pids
          and not e["name"].startswith("jit_")]
    per = collections.Counter()
    arg = {}
    for e in ev:
        per[e["name"]] += e.get("dur", 0) / 1e3
        if e["name"] not in arg:
            a = e.get("args", {})
            arg[e["name"]] = (a.get("long_name") or a.get("shape") or "")[:90]
    total = sum(per.values()) / frames
    print(f"device op total: {total:.2f} ms/frame "
          f"({len(per)} distinct ops, {frames} frames)")
    for k, v in per.most_common(top):
        print(f"{v / frames:8.3f} ms  {k[:48]:48s} {arg[k]}")
    agg = collections.Counter()
    for e in ev:
        agg[re.sub(r"[.\d]+$", "", e["name"])] += e.get("dur", 0) / 1e3
    print("--- aggregate by op type")
    for k, v in agg.most_common(12):
        print(f"{v / frames:8.3f} ms  {k[:60]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", default=None,
                    help="existing trace dir (skip capture)")
    ap.add_argument("--frames", type=int, default=3)
    ap.add_argument("--top", type=int, default=20)
    ap.add_argument("--batch", type=int, default=1,
                    help="trace the vmapped batched pipeline instead")
    ap.add_argument("--size", default="1088x1920", metavar="HxW",
                    help="padded frame size, e.g. 2176x3840 for 4K")
    args = ap.parse_args()
    d = args.trace or "/tmp/dis_tpu_trace"
    if args.trace is None:
        capture(d, args.frames, args.batch, args.size)
    summarize(d, args.frames, args.top)


if __name__ == "__main__":
    main()
