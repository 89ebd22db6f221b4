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


def enabled() -> bool:
    return os.environ.get("DIS_TPU_CHECK", "0") not in ("", "0")


def check(pred, msg: str, **fmt) -> None:
    """Semantic invariant; active only under :func:`checked` wrapping
    (guard sites call this unconditionally, it no-ops when disabled)."""
    if enabled():
        from jax.experimental import checkify

        checkify.check(pred, msg, **fmt)


def checked(fn):
    """Wrap a jittable ``fn`` with checkify instrumentation.

    Returns a callable that runs the functionalized program and throws
    ``jax.experimental.checkify.JaxRuntimeError`` if any float, index
    or user check fired; the wrapped fn may be jitted by the caller.
    """
    from jax.experimental import checkify

    errs = (checkify.float_checks | checkify.index_checks
            | checkify.user_checks)
    cf = checkify.checkify(fn, errors=errs)

    def run(*args, **kwargs):
        err, out = cf(*args, **kwargs)
        err.throw()
        return out

    return run
