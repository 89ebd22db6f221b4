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


def test_unwrapped_jit_does_not_crash(monkeypatch):
    """DIS_TPU_CHECK=1 must not break entry points that jit the
    pipeline WITHOUT checks.checked() (bench.py, batched_flow_fn, a
    user's own jit): guard sites stay silent outside a functionalized
    trace instead of raising checkify's trace-time ValueError."""
    monkeypatch.setenv("DIS_TPU_CHECK", "1")
    i1, i2 = synthetic_pair(32, 40, shift=(1.0, 0.5), seed=53)
    flow = np.asarray(jax.jit(_flow_fn())(jnp.asarray(i1), jnp.asarray(i2)))
    assert np.isfinite(flow).all()


def test_runner_wires_checks(monkeypatch, tmp_path):
    """run_sequence runs the checkified program under DIS_TPU_CHECK=1:
    a NaN frame in the sequence throws instead of silently flowing."""
    from PIL import Image
    from jax.experimental import checkify
    from dis_tpu.runner import run_sequence

    monkeypatch.setenv("DIS_TPU_CHECK", "1")
    seq = tmp_path / "seq"
    seq.mkdir()
    i1, i2 = synthetic_pair(32, 40, shift=(1.0, 0.5), seed=54)
    for t, fr in enumerate([i1, i2]):
        Image.fromarray(np.clip(fr, 0, 255).astype(np.uint8)).save(
            seq / f"frame_{t + 1:04d}.png")
    out = run_sequence(str(seq), 1, 2, CFG, out_dir=str(tmp_path / "o"))
    assert out["pairs_done"] == 1

    # PNG frames cannot hold NaN, so corrupt via the loader instead.
    from dis_tpu.utils import io as uio
    orig = uio.imread_gray

    def bad_read(path):
        img = orig(path).astype(np.float32)
        img[3, 3] = np.nan
        return img

    monkeypatch.setattr(uio, "imread_gray", bad_read)
    with pytest.raises(checkify.JaxRuntimeError):
        run_sequence(str(seq), 1, 2, CFG, out_dir=str(tmp_path / "o2"))


def test_checked_vmap(monkeypatch):
    """Batched check mode: vmap must go OUTSIDE checkify (inside is a
    checkify error; and a batched while predicate under
    vmap-of-checkify hits a JAX 0.9 batching bug — the CLI forces
    early_exit=False on this path)."""
    from jax.experimental import checkify
    from dis_tpu.models.dis import dis_flow_padded

    monkeypatch.setenv("DIS_TPU_CHECK", "1")
    cfg = DISConfig(iterations=6, coarsest_scale=2, patch_overlap=0.5,
                    early_exit=False)
    i1, i2 = synthetic_pair(32, 40, shift=(1.0, 0.5), seed=55)
    a = jnp.stack([jnp.asarray(i1)] * 2)
    b = jnp.stack([jnp.asarray(i2)] * 2)
    fn = checks.checked_vmap(lambda x, y: dis_flow_padded(x, y, cfg))
    flows = np.asarray(fn(a, b))
    assert flows.shape[0] == 2 and np.isfinite(flows).all()
    with pytest.raises(checkify.JaxRuntimeError):
        fn(a.at[0, 3, 3].set(jnp.nan), b)
