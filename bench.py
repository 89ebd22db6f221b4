#!/usr/bin/env python
"""Benchmark: frames/sec/chip at the 1080p DIS-fast preset.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/sec/chip", "vs_baseline": N}

- "value": steady-state single-chip throughput of the JAX/TPU pipeline
  on a 1920x1080 pair with the DIS-fast parameter set (iterations=16,
  patch 8, stride 5, scales 3..0), compat semantics.
- "vs_baseline": ratio vs the single-threaded C++ baseline
  (tools/cpp_baseline — our own implementation of the same compat
  semantics, equivalent work per frame; the reference repo publishes no
  numbers and is Windows-only, see BASELINE.md).

Both sides run identical parameters and identical inputs.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.abspath(__file__))
TOOL_DIR = os.path.join(ROOT, "tools", "cpp_baseline")
BIN = os.path.join(TOOL_DIR, "dis_baseline")

W, H = 1920, 1080
ITERS, PS, COARSEST, FINEST, OVERLAP, NORM = 16, 8, 3, 0, 0.3, 1
BASELINE_CACHE = os.path.join(ROOT, ".bench_baseline.json")


def synth_pair():
    from scipy.signal import convolve2d

    r = np.random.default_rng(42)
    big = (r.random((H + 16, W + 16)) * 255).astype(np.float32)
    k = np.ones((7, 7), np.float32) / 49.0
    big = convolve2d(big, k, mode="same", boundary="symm").astype(np.float32)
    i1 = big[8:8 + H, 8:8 + W]
    i2 = big[6:6 + H, 5:5 + W]  # ~(3, 2) px shift
    return np.ascontiguousarray(i1), np.ascontiguousarray(i2)


def baseline_fps(i1, i2):
    """Single-thread C++ fps; cached across runs (it is slow but stable)."""
    if os.path.exists(BASELINE_CACHE):
        try:
            with open(BASELINE_CACHE) as f:
                d = json.load(f)
            if d.get("config") == [W, H, ITERS, PS, COARSEST, FINEST, OVERLAP]:
                return d["fps"]
        except Exception:
            pass
    if not os.path.exists(BIN):
        subprocess.run(["make", "-C", TOOL_DIR], check=True,
                       capture_output=True)
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        p1 = os.path.join(td, "a.f32")
        p2 = os.path.join(td, "b.f32")
        i1.astype("<f4").tofile(p1)
        i2.astype("<f4").tofile(p2)
        out = subprocess.run(
            [BIN, str(W), str(H), str(ITERS), str(PS), str(COARSEST),
             str(FINEST), str(OVERLAP), str(NORM), "1", p1, p2],
            capture_output=True, text=True, check=True, timeout=3600)
    fps = json.loads(out.stdout.strip().splitlines()[-1])["fps"]
    with open(BASELINE_CACHE, "w") as f:
        json.dump({"config": [W, H, ITERS, PS, COARSEST, FINEST, OVERLAP],
                   "fps": fps}, f)
    return fps


def tpu_fps(i1, i2):
    import jax
    import jax.numpy as jnp

    from dis_tpu.config import DISConfig
    from dis_tpu.models.dis import dis_flow_padded

    cfg = DISConfig(iterations=ITERS, patch_size=PS, coarsest_scale=COARSEST,
                    finest_scale=FINEST, patch_overlap=OVERLAP,
                    patch_normalization=bool(NORM), mode="compat",
                    early_exit=False)
    # Time with CHAINED repetitions inside one jit, fetched as one
    # scalar: on the tunneled axon platform ``block_until_ready``
    # returns immediately, host fetches time the tunnel, and the
    # ~30 ms/dispatch RTT swamps per-dispatch correction (round-1's
    # subtraction method under-reported by ~25%).  The carry perturbs
    # the input by ~1e-30 per step so XLA cannot CSE the iterations;
    # every output pixel stays on the timed path via the sum.
    from jax import lax

    CHAIN = 8

    def chained(a, b):
        def body(i, c):
            return c + dis_flow_padded(
                a + c * jnp.float32(1e-30), b, cfg).sum() * jnp.float32(1e-30)
        return lax.fori_loop(0, CHAIN, body, jnp.float32(0.0))

    fn = jax.jit(chained)
    rtt_fn = jax.jit(lambda a: a[0, 0] * 0 + 1)
    a = jnp.asarray(i1)
    b = jnp.asarray(i2)
    float(fn(a, b))  # compile + warmup
    float(rtt_fn(a))
    rtt = min(_timeit(lambda: float(rtt_fn(a))) for _ in range(5))
    dt = min(_timeit(lambda: float(fn(a, b))) for _ in range(3))
    return CHAIN / max(dt - rtt, 1e-9)


def _timeit(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


def main():
    i1, i2 = synth_pair()
    # The tunneled TPU occasionally drops a remote-compile connection;
    # retry so a transient failure doesn't lose the benchmark record.
    ours = None
    err = None
    for attempt in range(3):
        try:
            ours = tpu_fps(i1, i2)
            break
        except Exception as e:  # noqa: BLE001
            err = e
            time.sleep(10)
    if ours is None:
        raise err
    base_local = baseline_fps(i1, i2)
    # Denominator convention (benchmarks/timing.py::CPP_LEDGER_FPS):
    # vs_baseline is pinned to the LEDGER's 1.45 fps — the highest C++
    # reading ever recorded for tools/cpp_baseline on this workload,
    # i.e. the most conservative speedup claim.  The machine-local
    # cached measurement (load-sensitive) is reported alongside.
    sys.path.insert(0, os.path.join(ROOT, "benchmarks"))
    from timing import CPP_LEDGER_FPS

    print(json.dumps({
        "metric": "frames/sec/chip @1080p DIS-fast (compat semantics)",
        "value": round(ours, 4),
        "unit": "frames/sec/chip",
        "vs_baseline": round(ours / CPP_LEDGER_FPS, 4),
        "baseline_fps_pinned_ledger": CPP_LEDGER_FPS,
        "baseline_fps_local_cache": round(base_local, 4),
        "vs_local_cache": round(ours / base_local, 4),
    }))


if __name__ == "__main__":
    main()
