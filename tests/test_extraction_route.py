"""Pin which extraction path each configuration takes (round-2 VERDICT
weak item #5: 4K + per-level refinement silently fell off the banded
fast path).  The route decision is a pure function of static inputs
(ops/iclk.py::extraction_route); TPU routing is tested on CPU by
monkeypatching the backend query.
"""

import dataclasses

import jax
import pytest

from dis_tpu.config import DISConfig, DIS_MEDIUM
from dis_tpu.models.dis import scale_extraction_route


FAST = DISConfig(iterations=16, patch_overlap=0.3)


def _tpu(monkeypatch):
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")


def test_cpu_always_xla():
    assert scale_extraction_route(FAST, 1920, 1088, 0) == "xla_regions"
    g = dataclasses.replace(FAST, sampler="global", kernel="xla")
    assert scale_extraction_route(g, 1920, 1088, 0) == "global_gather"


def test_1080p_takes_whole_image_kernel(monkeypatch):
    _tpu(monkeypatch)
    for s in range(FAST.coarsest_scale + 1):
        assert scale_extraction_route(FAST, 1920, 1088, s) == "pallas_image"


def test_4k_takes_banded_kernel(monkeypatch):
    _tpu(monkeypatch)
    # 4K exceeds the whole-image VMEM budget at the finest scale; the
    # policing-chain bound keeps the banded path available.
    assert scale_extraction_route(FAST, 3840, 2176, 0) == "pallas_banded"
    # coarser scales fit the whole-image kernel again
    assert scale_extraction_route(FAST, 3840, 2176, 2) == "pallas_image"


def test_4k_per_level_refinement_cliff_and_clamp(monkeypatch):
    _tpu(monkeypatch)
    medium_4k = dataclasses.replace(
        DIS_MEDIUM, coarsest_scale=3)  # per-level refinement on
    # without the clamp: no static init bound -> XLA fallback (the
    # round-2 silent cliff, now warned about in inverse_search)
    assert scale_extraction_route(medium_4k, 3840, 2176, 0) == "xla_regions"
    # with the clamp: the Q9 bound is restored -> banded fast path
    clamped = dataclasses.replace(medium_4k, refined_init_clamp=True)
    assert scale_extraction_route(clamped, 3840, 2176, 0) == "pallas_banded"


def test_refined_clamp_noop_when_inactive():
    """refined_init_clamp must not change results when refinement never
    exceeds the policing bound (the expected case)."""
    import numpy as np
    import jax.numpy as jnp
    from dis_tpu.models.dis import dis_flow_padded
    from conftest import synthetic_pair

    i1, i2 = synthetic_pair(64, 48, shift=(1.0, 0.5), seed=3)
    cfg = DISConfig(iterations=6, coarsest_scale=2, patch_overlap=0.5,
                    early_exit=False, mode="fixed", refinement_iters=1,
                    refine_per_level=True, refinement_inner_sweeps=2,
                    refinement_sor_sweeps=2, refinement_omega=1.6)
    a = np.asarray(dis_flow_padded(jnp.asarray(i1), jnp.asarray(i2), cfg))
    b = np.asarray(dis_flow_padded(
        jnp.asarray(i1), jnp.asarray(i2),
        dataclasses.replace(cfg, refined_init_clamp=True)))
    np.testing.assert_array_equal(a, b)


def test_smem_budget_gate(monkeypatch):
    """The whole-image kernel's scalar prefetch must fit SMEM: two
    s32[npad] base arrays + 32 KB slack against 1 MB (round 5: the old
    loose "n <= 131072" gate admitted 130,560 patches — the medium
    preset at 1080p with coarsest_scale=4 — which failed Mosaic
    compilation 1.1 KB over budget)."""
    _tpu(monkeypatch)
    med4 = dataclasses.replace(DIS_MEDIUM, coarsest_scale=4,
                               refined_init_clamp=True)
    # finest scale at padded 1088x1920, steps=4 -> 130,560 patches:
    # over the SMEM model, must NOT take the whole-image kernel.
    assert scale_extraction_route(med4, 1920, 1088, 0) != "pallas_image"
    # the DIS-fast geometry (83,712 patches) stays on it.
    assert scale_extraction_route(FAST, 1920, 1088, 0) == "pallas_image"
