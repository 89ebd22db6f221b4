"""Command-line driver mirroring the reference CLI (main.cpp:60-209).

The reference accepts 0, 3 or 10 positional args:

    dis-tpu [folder start end [max_iter patch_size coarsest finest
             overlap norm draw]]

and loops over consecutive pairs ``<folder>/frame_%04d.png``, writing
colorized flow to ``OF_<folder>/``.  This driver reproduces that
surface (minus the Win32 imshow windows) and adds named flags for the
TPU-build knobs (mode, refinement, .flo output, EPE scoring against
ground truth, device batching).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from typing import List, Optional

import numpy as np


# (name, type, reference default) of the ten positional parameters, in
# the reference's order (main.cpp:63-72).
_POSITIONALS = (
    ("folder", str, "alley_1"),
    ("start_num_img", int, 1),
    ("end_num_img", int, 50),
    ("max_iter", int, 1000),
    ("patch_size", int, 8),
    ("coarsest_scale", int, 3),
    ("finest_scale", int, 0),
    ("patch_overlap", float, 0.7),
    ("patch_norm", int, 1),
    ("draw_grid", int, 0),
)

USAGE = (
    "usage: dis-tpu [folder start_num_img end_num_img [max_iter "
    "patch_size coarsest_scale finest_scale patch_overlap patch_norm "
    "draw_grid]]\n"
    "positional parameters must be given as exactly 0, 3 or 10 values "
    "(reference arity rule, main.cpp:73-101)"
)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="dis-tpu",
        description="TPU-native DIS optical flow (reference-compatible CLI)",
    )
    # The reference's ten positional parameters, collected as one list so
    # the 0/3/10 arity rule (main.cpp:73-101) can be enforced: any other
    # count is rejected with a usage message, like the reference.
    p.add_argument("params", nargs="*", metavar="PARAM",
                   help="0, 3 or 10 positional parameters: folder "
                        "start end [max_iter patch_size coarsest finest "
                        "overlap norm draw]")
    # TPU-build flags
    p.add_argument("--preset", choices=["ultrafast", "fast", "medium",
                                        "full", "compat"], default=None,
                   help="paper-style preset; overrides the positional params")
    p.add_argument("--mode", choices=["compat", "fixed"], default="compat")
    p.add_argument("--refine", type=int, default=0, metavar="ITERS",
                   help="variational refinement iterations (paper step)")
    p.add_argument("--refine-planes", choices=["q1", "intensity"],
                   default=None,
                   help="refinement data term: the pipeline's Q1 "
                        "gradient-magnitude levels, or the raw-intensity "
                        "resize chain the DIS paper reads (better EPE on "
                        "nonrigid motion; config.py::refinement_planes). "
                        "Intensity planes carry ~4x the dynamic range, so "
                        "with the default smoothness alpha the field "
                        "under-smooths: unless --refine-alpha is given, "
                        "'intensity' auto-rebalances alpha to 40.0 (the "
                        "chip-swept optimum the quality presets use). "
                        "No-op without --refine (a warning is printed).")
    p.add_argument("--refine-alpha", type=float, default=None,
                   metavar="ALPHA",
                   help="smoothness weight for the refinement data term "
                        "(config.py::refinement_alpha; default 10.0 for "
                        "q1 planes, 40.0 for intensity planes)")
    p.add_argument("--save-flo", action="store_true",
                   help="also write Middlebury .flo files")
    p.add_argument("--gt-dir", default=None,
                   help="directory of ground-truth frame_%%04d.flo for EPE")
    p.add_argument("--out-dir", default=None,
                   help="output dir (default OF_<folder>, like the reference)")
    p.add_argument("--no-early-exit", action="store_true")
    p.add_argument("--batch", type=int, default=1, metavar="N",
                   help="process N consecutive frame pairs per device "
                        "dispatch (vmapped pipeline).  Amortizes HOST "
                        "dispatch overhead (valuable on high-RTT "
                        "attachments); device-side the batched glue "
                        "costs ~1.8x per pair at Sintel size "
                        "(PERF_NOTES round 3), so prefer serial "
                        "dispatch when the host link is fast.  "
                        "parallel.batch is the multi-chip version of "
                        "the same axis.")
    p.add_argument("--profile-dir", default=None,
                   help="write a jax.profiler trace to this directory")
    p.add_argument("--json-log", default=None,
                   help="append JSON-lines run records to this file")
    return p


def main(argv: Optional[List[str]] = None) -> int:
    args = build_parser().parse_args(argv)

    # Reference arity rule: exactly 0, 3 or 10 positionals; anything
    # else prints usage and fails (main.cpp:73-101).
    if len(args.params) not in (0, 3, 10):
        print(USAGE, file=sys.stderr)
        return 2
    for (name, typ, default), val in zip(
            _POSITIONALS, args.params + [None] * (10 - len(args.params))):
        try:
            setattr(args, name, typ(val) if val is not None else default)
        except ValueError:
            print(f"invalid value for {name}: {val!r}\n{USAGE}",
                  file=sys.stderr)
            return 2

    import jax
    import jax.numpy as jnp

    from .config import DISConfig
    from .models.dis import dis_flow
    from .utils import color, flo, io as uio, metrics

    if args.preset:
        from .config import PRESETS

        cfg = PRESETS[args.preset]
        if args.refine:
            import dataclasses

            cfg = dataclasses.replace(cfg, refinement_iters=args.refine)
    else:
        cfg = DISConfig(
            iterations=args.max_iter,
            patch_size=args.patch_size,
            coarsest_scale=args.coarsest_scale,
            finest_scale=args.finest_scale,
            patch_overlap=args.patch_overlap,
            patch_normalization=bool(args.patch_norm),
            mode=args.mode,
            refinement_iters=args.refine,
            early_exit=not args.no_early_exit,
        )
    if args.refine_planes:
        import dataclasses

        cfg = dataclasses.replace(cfg, refinement_planes=args.refine_planes)
        if cfg.refinement_iters == 0:
            print("warning: --refine-planes has no effect without "
                  "--refine (refinement is disabled)", file=sys.stderr)
        elif (args.refine_planes == "intensity"
              and args.refine_alpha is None
              and cfg.refinement_alpha == 10.0):
            # Intensity planes carry ~4x the Q1 dynamic range; the
            # round-4 chip sweep (tools/quality_sweep.py) found
            # alpha=40 optimal — the presets pair them the same way.
            cfg = dataclasses.replace(cfg, refinement_alpha=40.0)
            print("note: --refine-planes intensity rebalances "
                  "refinement alpha 10 -> 40 (pass --refine-alpha to "
                  "override)", file=sys.stderr)
    if args.refine_alpha is not None:
        import dataclasses

        cfg = dataclasses.replace(cfg, refinement_alpha=args.refine_alpha)

    out_dir = args.out_dir or f"OF_{args.folder}"
    os.makedirs(out_dir, exist_ok=True)

    flow_fn = jax.jit(lambda a, b: dis_flow(a, b, cfg))
    from .utils import checks
    if checks.enabled():
        # DIS_TPU_CHECK=1: run under checkify NaN/OOB/invariant guards.
        flow_fn = checks.checked(flow_fn)

    draw_grid = bool(args.draw_grid)
    if draw_grid:
        from .ops.image import pad_divisible, resize_bilinear, crop_padding
        from .models.dis import dis_flow_padded
        from .utils.overlay import draw_grid_overlay

        def flow_debug_fn(a, b):
            # One pipeline run yields BOTH the flow and the per-scale
            # overlay data, like the reference draws the overlay from
            # the same run (optical_flow.cpp:92-123) — round-2 VERDICT
            # weak item #8 (the overlay used to re-run the pipeline).
            h, w = a.shape
            p1, (padw, padh) = pad_divisible(a, cfg.coarsest_scale)
            p2, _ = pad_divisible(b, cfg.coarsest_scale)
            fl, dbg = dis_flow_padded(p1, p2, cfg, return_debug=True)
            if cfg.finest_scale != 0:
                fl = fl * jnp.float32(2 ** cfg.finest_scale)
                fl = resize_bilinear(fl, p1.shape[1], p1.shape[0])
            return crop_padding(fl, padw, padh, w, h), dbg

        flow_debug_fn = jax.jit(flow_debug_fn)

        def debug_fn(a, b):
            p1, _ = pad_divisible(a, cfg.coarsest_scale)
            p2, _ = pad_divisible(b, cfg.coarsest_scale)
            return dis_flow_padded(p1, p2, cfg, return_debug=True)

    if args.profile_dir:
        jax.profiler.start_trace(args.profile_dir)

    epes = []
    times = []
    rc = 0

    def emit_pair(img_i, first, i1, i2, flow, dt, dbg=None):
        """Per-pair output: colorized PNG, optional overlays/.flo/EPE,
        the reference's finish line.  Shared by the serial and batched
        loops so --batch changes only the dispatch, not the outputs.
        ``dbg`` carries the overlay data from the same pipeline run
        (serial path); the batched path recomputes it per pair (debug
        feature, not worth a second compiled batch shape)."""
        times.append(dt)
        dst = color.draw_optical_flow(flow)
        base = f"frame_{img_i:04d}"
        uio.imwrite(os.path.join(out_dir, base + ".png"), dst)
        if draw_grid:
            if dbg is None:
                _, dbg = debug_fn(jnp.asarray(i1), jnp.asarray(i2))
            for scale, centers, u_s, lvl in dbg:
                ov = draw_grid_overlay(np.asarray(lvl), np.asarray(centers),
                                       np.asarray(u_s), scale, cfg.patch_size)
                uio.imwrite(os.path.join(
                    out_dir, f"{base}_grid_s{scale}.png"), ov)
        if args.save_flo:
            flo.save_flo(os.path.join(out_dir, base + ".flo"), flow)
        rec = {"frame": img_i, "seconds": dt}
        if args.gt_dir:
            # GT in either benchmark format: Middlebury/Sintel .flo or
            # KITTI 16-bit PNG ((u,v)*64 + 2^15 with a validity channel).
            from .utils.kitti import load_gt_any

            gt, valid = load_gt_any(os.path.join(args.gt_dir, base))
            if gt is not None:
                rec["epe"] = metrics.epe(flow, gt, valid=valid)
                epes.append(rec["epe"])
        if args.json_log:
            with open(args.json_log, "a") as f:
                f.write(json.dumps(rec) + "\n")
        print(f"finish {first} ({dt:.3f}s"
              + (f", EPE {rec['epe']:.3f}" if "epe" in rec else "") + ")")

    def read_frame(img_i):
        return uio.imread_gray(
            os.path.join(args.folder, f"frame_{img_i:04d}.png")
        ).astype(np.float32)

    if args.batch > 1:
        # Batched dispatch: N consecutive pairs per device program
        # (pairs (i, i+1) .. (i+N-1, i+N) share frames, so one frame
        # read feeds two pairs).  Short tail chunks repeat the last
        # pair up to N to keep a single compiled shape; the duplicate
        # outputs are discarded.
        bsz = args.batch
        if checks.enabled():
            # vmap OUTSIDE checkify: functionalizing through a
            # vmap-of-while is unsupported (see checks.checked_vmap).
            # Also force the fixed-trip-count solver: vmap over a
            # checkified while_loop with a batched predicate hits a JAX
            # 0.9 batching bug ("foreach() argument 2 is longer...");
            # early_exit is a perf-only shortcut with identical output
            # (config.py docstring), so checked runs just skip it.
            import dataclasses
            cfg_ck = dataclasses.replace(cfg, early_exit=False)
            vflow_fn = checks.checked_vmap(
                lambda a, b: dis_flow(a, b, cfg_ck))
        else:
            vflow_fn = jax.jit(jax.vmap(lambda a, b: dis_flow(a, b, cfg)))
        pair_ids = list(range(args.start_num_img, args.end_num_img))
        pos = 0
        while pos < len(pair_ids):
            chunk = pair_ids[pos:pos + bsz]
            pos += bsz
            frames = {}
            kept = []
            for img_i in chunk:
                print(f"start {args.folder}/frame_{img_i:04d}.png")
                try:
                    for j in (img_i, img_i + 1):
                        if j not in frames:
                            frames[j] = read_frame(j)
                    kept.append(img_i)
                except FileNotFoundError:
                    print("No image data")
                    rc = 1
                    break
            if not kept:
                break
            a = np.stack([frames[i] for i in kept]
                         + [frames[kept[-1]]] * (bsz - len(kept)))
            b = np.stack([frames[i + 1] for i in kept]
                         + [frames[kept[-1] + 1]] * (bsz - len(kept)))
            t0 = time.perf_counter()
            flows = np.asarray(jax.block_until_ready(
                vflow_fn(jnp.asarray(a), jnp.asarray(b))))
            # Per-pair cost of the dispatch: divide by the batch size
            # actually computed, not len(kept) — a padded tail chunk
            # still does bsz pairs of work, and billing the duplicates
            # to the real pairs would inflate their reported seconds
            # ~bsz/kept x vs the serial run.
            dt = (time.perf_counter() - t0) / bsz
            for k, img_i in enumerate(kept):
                emit_pair(img_i, f"{args.folder}/frame_{img_i:04d}.png",
                          frames[img_i], frames[img_i + 1], flows[k], dt)
            if rc:
                break
    else:
        for img_i in range(args.start_num_img, args.end_num_img):
            first = os.path.join(args.folder, f"frame_{img_i:04d}.png")
            print(f"start {first}")
            try:
                i1 = read_frame(img_i)
                i2 = read_frame(img_i + 1)
            except FileNotFoundError:
                print("No image data")
                rc = 1
                break
            t0 = time.perf_counter()
            dbg = None
            if draw_grid:
                flow, dbg = flow_debug_fn(jnp.asarray(i1), jnp.asarray(i2))
                flow = np.asarray(jax.block_until_ready(flow))
            else:
                flow = np.asarray(jax.block_until_ready(
                    flow_fn(jnp.asarray(i1), jnp.asarray(i2))))
            dt = time.perf_counter() - t0
            emit_pair(img_i, first, i1, i2, flow, dt, dbg=dbg)

    if args.profile_dir:
        jax.profiler.stop_trace()

    if times:
        steady = times[1:] or times
        print(f"frames: {len(times)}  mean {np.mean(steady):.3f}s "
              f"({1.0 / np.mean(steady):.2f} fps steady-state)")
    if epes:
        print(f"avg EPE: {np.mean(epes):.4f}")
    return rc


if __name__ == "__main__":
    sys.exit(main())
