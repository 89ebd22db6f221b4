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
    gate is frac(|diff| > 0.01 px) < 0.5% AND mean |diff| < 1e-3 px.

Each leg runs as one subprocess (per-leg env: backend, extraction
route), all configs per leg share the process so compile costs are paid
once per cell, not per comparison.  Writes CHIPMATRIX_r04.json.  Run
when the single-tenant chip is free; budget ~10 min.

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
    # config that shipped broken through round 3)
    "preset_medium":       dict(preset="medium"),
    "preset_full":         dict(preset="full"),
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
    if preset is not None:
        cfg = dataclasses.replace(PRESETS[preset], iterations=16)
    else:
        cfg = DISConfig(iterations=16, patch_overlap=0.3, **spec)
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


def compare(chip: np.ndarray, cpu: np.ndarray, bitwise_gate: bool) -> dict:
    diff = np.abs(chip - cpu)
    frac = float((diff > 0.01).mean())
    rec = {
        "bitwise": bool((chip == cpu).all()),
        "max_abs_diff_px": float(diff.max()),
        "mean_abs_diff_px": float(diff.mean()),
        "frac_gt_0.01px": frac,
    }
    if bitwise_gate:
        rec["ok"] = rec["bitwise"]
    else:
        rec["ok"] = frac < 0.005 and rec["mean_abs_diff_px"] < 1e-3
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
    os.unlink(img_path)

    out = {"shape": [H, W], "iterations": 16, "cells": {}}
    for name in CELLS:
        bitwise_gate = CELLS[name].get("kernel") == "xla"
        rec = compare(tpu[name], cpu[name], bitwise_gate)
        rec["spec"] = CELLS[name]
        rec["route"] = ("xla" if bitwise_gate else "pallas_image")
        out["cells"][name] = rec
    for name in BANDED_CELLS:
        rec = compare(tpu_banded[name], cpu[name], False)
        rec["spec"] = CELLS[name]
        rec["route"] = "pallas_banded"
        out["cells"][name + "__banded"] = rec
    for name, mism in batch_mism.items():
        out["cells"][name + "__batch2"] = {
            "spec": CELLS[name], "route": "vmap_batch2",
            "mismatches_vs_serial": mism, "bitwise": mism == 0,
            "ok": mism == 0,
        }

    out["ok"] = all(c["ok"] for c in out["cells"].values())
    out["wall_s"] = round(time.time() - t0, 1)
    path = "/root/repo/CHIPMATRIX_r04.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: {kk: vv for kk, vv in v.items() if kk != "spec"}
                      for k, v in out["cells"].items()}, indent=1))
    print("OK" if out["ok"] else "FAILED", f"({out['wall_s']}s) ->", path)
    return 0 if out["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
