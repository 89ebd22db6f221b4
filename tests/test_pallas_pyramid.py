"""Fused Pallas pyramid kernel vs the XLA recipe (interpret mode).

The kernel claims bit-identity with ops/image.py's pad/Sobel/magnitude
chain (main.cpp:12-50 semantics); these tests pin it on CPU, including
the chained base-level stencil's reflect-101 border association and
non-tile-aligned widths.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dis_tpu.ops import image as im
from dis_tpu.ops.pallas.pyramid_kernel import pyramid_level_pallas
from dis_tpu.ops.pyramid import construct_pyramid


def _rng(seed=0):
    return np.random.default_rng(seed)


@pytest.mark.parametrize("shape", [(64, 96), (72, 500), (56, 128)])
@pytest.mark.parametrize("p", [8, 12])
def test_level_kernel_nonbase_bitwise(shape, p):
    """Coarser-level mode: replicate-padded image + zero-padded Sobel
    pair match the XLA ops exactly."""
    cur = jnp.asarray(_rng(1).random(shape).astype(np.float32) * 255)
    ip, dx, dy = pyramid_level_pallas(cur, p, base=False, interpret=True)
    np.testing.assert_array_equal(np.asarray(ip),
                                  np.asarray(im.replicate_pad(cur, p, p, p, p)))
    np.testing.assert_array_equal(
        np.asarray(dx),
        np.asarray(im.constant_pad(im.sobel3(cur, "x"), p, p, p, p)))
    np.testing.assert_array_equal(
        np.asarray(dy),
        np.asarray(im.constant_pad(im.sobel3(cur, "y"), p, p, p, p)))


@pytest.mark.parametrize("shape", [(64, 96), (72, 500)])
def test_level_kernel_base_bitwise(shape):
    """Base mode: the chained magnitude -> Sobel stencil (quirk Q1)
    matches the XLA recipe bitwise, including the magnitude's
    reflect-101 border.

    The reference is the JITTED chain (as the pipeline runs it): under
    jit XLA fuses the magnitude's mul/add into FMAs, which is 1 ulp off
    the eager op-by-op evaluation; the kernel matches the fused form.
    """
    p = 8
    raw = jnp.asarray(_rng(2).random(shape).astype(np.float32) * 255)

    @jax.jit
    def ref(x):
        mag = im.gradient_magnitude(x)
        return (im.replicate_pad(mag, p, p, p, p),
                im.constant_pad(im.sobel3(mag, "x"), p, p, p, p),
                im.constant_pad(im.sobel3(mag, "y"), p, p, p, p))

    rip, rdx, rdy = ref(raw)
    ip, dx, dy = pyramid_level_pallas(raw, p, base=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(ip), np.asarray(rip))
    np.testing.assert_array_equal(np.asarray(dx), np.asarray(rdx))
    np.testing.assert_array_equal(np.asarray(dy), np.asarray(rdy))


def test_construct_pyramid_pallas_chain():
    """Full 4-level pyramid through the Pallas path == XLA path."""
    raw = jnp.asarray(_rng(3).random((128, 192)).astype(np.float32) * 255)
    ref = jax.jit(lambda x: construct_pyramid(x, 3, 8))(raw)
    got = jax.jit(lambda x: construct_pyramid(
        x, 3, 8, use_pallas=True, interpret=True))(raw)
    assert len(ref) == len(got)
    for s, (r, g) in enumerate(zip(ref, got)):
        assert r.width == g.width and r.height == g.height
        np.testing.assert_array_equal(np.asarray(g.img), np.asarray(r.img),
                                      err_msg=f"img scale {s}")
        np.testing.assert_array_equal(np.asarray(g.dx), np.asarray(r.dx),
                                      err_msg=f"dx scale {s}")
        np.testing.assert_array_equal(np.asarray(g.dy), np.asarray(r.dy),
                                      err_msg=f"dy scale {s}")


def test_auto_mode_size_gate(monkeypatch):
    """``auto`` routes frames above ~1080p to the XLA recipe: the
    4K-size Pallas level kernel crashes the TPU compiler (bisected;
    see construct_pyramid_auto docstring), so the gate is a
    correctness requirement, not a tuning choice."""
    from dis_tpu.ops import pyramid as pyr

    monkeypatch.delenv("DIS_TPU_PYRAMID", raising=False)
    calls = {}
    orig = pyr.construct_pyramid

    def spy(img, coarsest, pad, use_pallas=False, interpret=False):
        calls["use_pallas"] = use_pallas
        return orig(img, coarsest, pad, use_pallas=False,
                    interpret=interpret)

    monkeypatch.setattr(pyr, "construct_pyramid", spy)

    small = jnp.zeros((1080, 1920), jnp.float32)
    big = jnp.zeros((2176, 3840), jnp.float32)
    # On the CPU test backend auto never picks Pallas; force the
    # decision logic by asking for kernel="pallas" (auto honors the
    # size gate even then).
    pyr.construct_pyramid_auto(small, 3, 8, kernel="pallas")
    assert calls["use_pallas"] is True
    pyr.construct_pyramid_auto(big, 3, 8, kernel="pallas")
    assert calls["use_pallas"] is False


@pytest.mark.parametrize("base", [True, False])
def test_level_kernel_vmap_rule_bitwise(base):
    """The custom_vmap batching rule (XLA level recipe, used for batched
    pairs) is bitwise equal to per-example kernel calls — so batched
    pipelines stay exact vs serial (round-4 batch glue)."""
    rngs = [_rng(s) for s in (3, 4, 5)]
    curs = jnp.stack([jnp.asarray(r.random((56, 72)).astype(np.float32) * 255)
                      for r in rngs])
    fn = lambda c: pyramid_level_pallas(c, 8, base=base, interpret=True)
    # Compare the JITTED forms, as the pipeline runs them: the base
    # level's magnitude chain is only bit-stable in its jit-fused form
    # (see test_level_kernel_base_bitwise).
    batched = jax.jit(jax.vmap(fn))(curs)
    serial_fn = jax.jit(fn)
    for b in range(3):
        serial = serial_fn(curs[b])
        for got, want in zip(batched, serial):
            np.testing.assert_array_equal(np.asarray(got[b]),
                                          np.asarray(want))
