#!/usr/bin/env python
"""Per-family EPE sweep of a preset, with optional refinement overrides.

Round-4 VERDICT item #7: natural_warp (0.098 px) dominates the medium
preset's 0.0293 mean family EPE; sweep gradient-adaptive smoothness /
finer refinement schedules and record the per-family effect.

Usage:
  python tools/quality_sweep.py --preset medium
  python tools/quality_sweep.py --preset medium --set refinement_alpha=6
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="medium")
    ap.add_argument("--size", default="384x512")
    ap.add_argument("--families", default=None)
    ap.add_argument("--set", action="append", default=[],
                    help="cfg override field=value (repeatable)")
    args = ap.parse_args()

    import jax.numpy as jnp

    from dis_tpu.config import PRESETS
    from dis_tpu.models.dis import dis_flow
    from dis_tpu.utils import synth

    h, w = (int(v) for v in args.size.split("x"))
    cfg = PRESETS[args.preset]
    for ov in args.set:
        k, v = ov.split("=", 1)
        cur = getattr(cfg, k)
        typ = type(cur)
        val = (v == "True" or v == "1") if typ is bool else typ(v)
        cfg = dataclasses.replace(cfg, **{k: val})

    fams = (args.families.split(",") if args.families
            else sorted(synth.FAMILIES))
    out = {}
    for fam in fams:
        i1, i2, gt, valid = synth.make_pair(fam, h, w)
        flow = np.asarray(dis_flow(jnp.asarray(i1), jnp.asarray(i2), cfg))
        out[fam] = round(synth.masked_epe(flow, gt, valid), 4)
        print(f"{fam:16s} {out[fam]:.4f}", flush=True)
    out["mean"] = round(float(np.mean([v for k, v in out.items()
                                       if k != "mean"])), 4)
    print(json.dumps({"preset": args.preset, "size": args.size,
                      "overrides": args.set, "epe": out}))


if __name__ == "__main__":
    main()
