"""ONE timing methodology for every benchmark artifact (round-2 VERDICT
item #6: suite.py timed with host perf_counter while bench.py /
tpu_experiments.py used chained device-side repetitions, so the same
workload carried two different numbers).

``chained_seconds`` is the honest harness for the tunneled axon
platform: ``block_until_ready`` returns immediately there and a host
fetch pays ~30 ms of RTT + scheduling noise per dispatch, far above
per-op runtimes.  So the measured fn runs ``chain`` data-dependent
repetitions INSIDE one jitted program (a ~1e-30 scalar carry perturbs
the first operand to defeat CSE without changing results), the single
scalar fetch times the whole chain, and one separately-measured RTT is
subtracted.

C++ baseline denominator convention (round-2 ADVICE medium finding —
three different denominators were in circulation): the PINNED
denominator for every ``vs_baseline`` field is the ledger's 1.45 fps —
the HIGHEST C++ reading ever recorded for tools/cpp_baseline on this
workload, i.e. the most conservative speedup claim.  Artifacts also
report the machine-local cached measurement (load-sensitive; historic
readings 0.90-1.45 fps) for transparency, labeled as such.
"""

from __future__ import annotations

import time

# Pinned vs_baseline denominator: see module docstring.
CPP_LEDGER_FPS = 1.45

_RTT = None


def measure_rtt(example_arg) -> float:
    """Min round-trip of a trivial scalar fetch (measured once/process)."""
    global _RTT
    if _RTT is not None:
        return _RTT
    import jax

    r = jax.jit(lambda x: (x.ravel()[0] * 0 + 1))
    float(r(example_arg))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(r(example_arg))
        ts.append(time.perf_counter() - t0)
    _RTT = min(ts)
    return _RTT


def chained_seconds(fn, *args, chain: int = 8, reps: int = 3) -> float:
    """Seconds per call of ``fn(*args) -> scalar`` via chained in-program
    repetitions (see module docstring).  ``fn`` must reduce to a scalar
    (e.g. ``lambda a, b: pipeline(a, b).sum()``)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    def chained(*a):
        def body(i, c):
            first = a[0] + c * jnp.float32(1e-30)
            return c + fn(first, *a[1:]).astype(jnp.float32) * jnp.float32(1e-30)
        return lax.fori_loop(0, chain, body, jnp.float32(0.0))

    g = jax.jit(chained)
    float(g(*args))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(g(*args))
        best = min(best, time.perf_counter() - t0)
    return max(0.0, best - measure_rtt(args[0])) / chain
