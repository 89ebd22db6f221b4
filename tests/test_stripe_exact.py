"""Exact tiled execution: stripe output == untiled output, bitwise-ish.

``dis_flow_stripe`` keeps all geometry global and only localizes the
image planes, so for a sufficient halo its rows must equal the untiled
pipeline's within float32 fusion noise (and usually exactly).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from dis_tpu.config import DISConfig
from dis_tpu.models.dis import dis_flow_padded, dis_flow_stripe

from conftest import synthetic_pair

# These are bitwise engine-vs-untiled gates calibrated against the
# per-stage (eager) composition of the reference pipeline; conftest's
# session-wide top-level auto-jit would compare the engines against a
# differently-fused whole-program compilation instead (~1e-5 fusion
# fuzz on CPU), so pin the eager original here.
dis_flow_padded = getattr(dis_flow_padded, "__wrapped__", dis_flow_padded)

CFG = DISConfig(iterations=8, coarsest_scale=2, patch_overlap=0.5,
                early_exit=False)


@pytest.mark.slow
def test_stripe_full_extent_matches_untiled():
    # Stripe == whole image: pure window/rebase plumbing check.
    h, w = 160, 64
    i1, i2 = synthetic_pair(h, w, shift=(1.0, 1.0), seed=13)
    want = np.asarray(dis_flow_padded(jnp.asarray(i1), jnp.asarray(i2), CFG))
    got = np.asarray(dis_flow_stripe(
        jnp.asarray(i1), jnp.asarray(i2), CFG,
        row0=0, own_r0=48, own_h=64, global_h=h))
    np.testing.assert_allclose(got, want[48:112], atol=1e-6)


@pytest.mark.slow
def test_stripe_with_halo_matches_untiled():
    # A genuine sub-stripe with a truncated top halo.
    h, w = 384, 48
    i1, i2 = synthetic_pair(h, w, shift=(1.0, 2.0), seed=14)
    want = np.asarray(dis_flow_padded(jnp.asarray(i1), jnp.asarray(i2), CFG))
    row0 = 64
    got = np.asarray(dis_flow_stripe(
        jnp.asarray(i1[row0:], ), jnp.asarray(i2[row0:]), CFG,
        row0=row0, own_r0=192, own_h=64, global_h=h))
    np.testing.assert_allclose(got, want[192:256], atol=1e-5)


@pytest.mark.slow
def test_stripe_bottom_edge():
    h, w = 384, 48
    i1, i2 = synthetic_pair(h, w, shift=(1.0, -1.0), seed=15)
    want = np.asarray(dis_flow_padded(jnp.asarray(i1), jnp.asarray(i2), CFG))
    row0 = 128
    got = np.asarray(dis_flow_stripe(
        jnp.asarray(i1[row0:]), jnp.asarray(i2[row0:]), CFG,
        row0=row0, own_r0=320, own_h=64, global_h=h))
    np.testing.assert_allclose(got, want[320:384], atol=1e-5)


def test_stripe_halo_validation():
    h, w = 128, 48
    i1, i2 = synthetic_pair(h, w, seed=16)
    with pytest.raises(ValueError, match="halo too small"):
        dis_flow_stripe(
            jnp.asarray(i1[96:]), jnp.asarray(i2[96:]), CFG,
            row0=96, own_r0=96, own_h=32, global_h=h)


@pytest.mark.slow
def test_stripe_ignores_refinement_fields():
    """Refinement is a global stencil owned by the tiling layer;
    dis_flow_stripe neutralizes the config's refinement fields instead
    of raising (round-3 contract) — its output equals the refinement-
    free stripe bitwise."""
    import dataclasses

    h, w = 160, 48
    i1, i2 = synthetic_pair(h, w, seed=17)
    cfg = DISConfig(iterations=4, coarsest_scale=2, refinement_iters=2,
                    mode="fixed")
    base = dataclasses.replace(cfg, refinement_iters=0)
    got = np.asarray(dis_flow_stripe(jnp.asarray(i1), jnp.asarray(i2), cfg,
                                     row0=0, own_r0=0, own_h=64, global_h=h))
    want = np.asarray(dis_flow_stripe(jnp.asarray(i1), jnp.asarray(i2), base,
                                      row0=0, own_r0=0, own_h=64, global_h=h))
    np.testing.assert_array_equal(got, want)


@pytest.mark.slow
def test_tiled_flow_exact_full_frame():
    from dis_tpu.parallel import tiled_flow_exact, min_stripe_halo

    h, w = 512, 48
    i1, i2 = synthetic_pair(h, w, shift=(1.0, 1.0), seed=18)
    halo = min_stripe_halo(CFG, w, h, 2)
    want = np.asarray(dis_flow_padded(jnp.asarray(i1), jnp.asarray(i2), CFG))
    got = np.asarray(tiled_flow_exact(jnp.asarray(i1), jnp.asarray(i2), CFG,
                                      n_stripes=2, halo=halo))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_stripe_finest_scale_1():
    cfg = DISConfig(iterations=6, coarsest_scale=2, finest_scale=1,
                    patch_overlap=0.5, early_exit=False)
    h, w = 384, 48
    i1, i2 = synthetic_pair(h, w, shift=(2.0, 0.0), seed=19)
    want = np.asarray(dis_flow_padded(jnp.asarray(i1), jnp.asarray(i2), cfg))
    row0 = 64
    got = np.asarray(dis_flow_stripe(
        jnp.asarray(i1[row0:]), jnp.asarray(i2[row0:]), cfg,
        row0=row0, own_r0=192, own_h=64, global_h=h))
    # output at scale 1: rows [96, 128) of the half-res field
    np.testing.assert_allclose(got, want[96:128], atol=1e-5)
