"""Optional NaN / out-of-bounds guard layer (SURVEY §5 "sanitizers").

The C++ side runs under ASan/UBSan (``tools/cpp_baseline/Makefile``
``asan-check``); this is the device-side analogue for the XLA/Pallas
paths, built on ``jax.experimental.checkify``:

- ``checked(fn)`` wraps a jittable function with float checks (NaN/Inf
  generation), index checks (gather/scatter OOB) and user checks, and
  throws ``JaxRuntimeError`` on the first violation;
- ``check(pred, msg)`` adds a semantic invariant at a call site; it is
  a no-op unless ``DIS_TPU_CHECK=1`` (the check machinery costs real
  ops, and `checkify.check` outside a checkified trace is an error).

Usage::

    DIS_TPU_CHECK=1 python -m pytest tests/test_checks.py
    # or in code:
    flow_fn = checks.checked(lambda a, b: dis_flow(a, b, cfg))

The CLI wires this automatically when ``DIS_TPU_CHECK=1`` is set.
"""

from __future__ import annotations

import os

# Incremented while a checked() wrapper is tracing/running.  check()
# emits checkify.check ONLY inside such a region: checkify.check in a
# plain (non-functionalized) jit trace is a trace-time ValueError, so
# guard sites in the pipeline must stay silent when the surrounding
# entry point (bench.py, batched_flow_fn, a user's own jit) was not
# wrapped — DIS_TPU_CHECK=1 must never crash an unwrapped path.
_ACTIVE = 0


def enabled() -> bool:
    return os.environ.get("DIS_TPU_CHECK", "0") not in ("", "0")


def check(pred, msg: str, **fmt) -> None:
    """Semantic invariant; active only under :func:`checked` wrapping
    (guard sites call this unconditionally; it no-ops when disabled or
    when the enclosing trace was not functionalized)."""
    if enabled() and _ACTIVE:
        from jax.experimental import checkify

        checkify.check(pred, msg, **fmt)


def checked(fn):
    """Wrap a jittable ``fn`` with checkify instrumentation.

    Returns a callable that runs the functionalized program and throws
    ``jax.experimental.checkify.JaxRuntimeError`` if any float, index
    or user check fired; the wrapped fn may be jitted by the caller.
    Guard sites (:func:`check`) are live only under this wrapper —
    checkify retraces with its own cache key, so the same jitted
    pipeline can run both plain and checked in one process.
    """
    from jax.experimental import checkify

    errs = (checkify.float_checks | checkify.index_checks
            | checkify.user_checks)
    cf = checkify.checkify(fn, errors=errs)

    def run(*args, **kwargs):
        global _ACTIVE
        _ACTIVE += 1
        try:
            err, out = cf(*args, **kwargs)
        finally:
            _ACTIVE -= 1
        err.throw()
        return out

    return run


def checked_vmap(fn):
    """Batched variant of :func:`checked`: functionalize ``fn`` FIRST,
    then ``vmap`` — checkify cannot functionalize through a
    vmap-of-while (JAX errors with "move the vmap to the outer level
    to get vmap-of-checkify-of-while").  Throws if ANY batch element
    tripped a check."""
    import jax
    from jax.experimental import checkify

    errs = (checkify.float_checks | checkify.index_checks
            | checkify.user_checks)
    vf = jax.jit(jax.vmap(checkify.checkify(fn, errors=errs)))

    def run(*args, **kwargs):
        global _ACTIVE
        _ACTIVE += 1
        try:
            err, out = vf(*args, **kwargs)
        finally:
            _ACTIVE -= 1
        err.throw()
        return out

    return run
