"""DIS_TPU_CHECK guard layer: clean runs pass, corrupted inputs throw,
the policing invariant is exercised (SURVEY §5 sanitizers item)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dis_tpu.config import DISConfig
from dis_tpu.utils import checks

from conftest import synthetic_pair

CFG = DISConfig(iterations=6, coarsest_scale=2, patch_overlap=0.5,
                early_exit=False)


def _flow_fn():
    from dis_tpu.models.dis import dis_flow_padded

    return lambda a, b: dis_flow_padded(a, b, CFG)


def test_disabled_by_default(monkeypatch):
    monkeypatch.delenv("DIS_TPU_CHECK", raising=False)
    assert not checks.enabled()
    checks.check(False, "never raised when disabled")  # no-op


def test_clean_run_passes_under_checks(monkeypatch):
    monkeypatch.setenv("DIS_TPU_CHECK", "1")
    i1, i2 = synthetic_pair(32, 40, shift=(1.0, 0.5), seed=51)
    fn = checks.checked(jax.jit(_flow_fn()))
    flow = np.asarray(fn(jnp.asarray(i1), jnp.asarray(i2)))
    assert np.isfinite(flow).all()


def test_nan_input_throws(monkeypatch):
    from jax.experimental import checkify

    monkeypatch.setenv("DIS_TPU_CHECK", "1")
    i1, i2 = synthetic_pair(32, 40, shift=(1.0, 0.5), seed=52)
    i1 = i1.copy()
    i1[10, 10] = np.nan
    fn = checks.checked(jax.jit(_flow_fn()))
    with pytest.raises(checkify.JaxRuntimeError):
        fn(jnp.asarray(i1), jnp.asarray(i2))


def test_user_invariant_fires(monkeypatch):
    """A deliberately broken invariant surfaces through the wrapper."""
    from jax.experimental import checkify

    monkeypatch.setenv("DIS_TPU_CHECK", "1")

    def bad(x):
        checks.check((x > 0).all(), "expected all-positive, got min {m}",
                     m=x.min())
        return x * 2

    fn = checks.checked(jax.jit(bad))
    np.testing.assert_array_equal(
        np.asarray(fn(jnp.asarray([1.0, 2.0]))), [2.0, 4.0])
    with pytest.raises(checkify.JaxRuntimeError, match="all-positive"):
        fn(jnp.asarray([1.0, -2.0]))
