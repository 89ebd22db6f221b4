"""Fused Pallas IC-LK kernel vs XLA region path (interpret mode on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dis_tpu.config import DISConfig
from dis_tpu.models.dis import dis_flow_padded
from dis_tpu.ops import iclk
from dis_tpu.ops.grid import make_grid
from dis_tpu.ops.pyramid import construct_pyramid

from conftest import synthetic_pair


@pytest.mark.parametrize("mode", ["compat", "fixed"])
def test_pallas_matches_xla_single_scale(mode):
    i1, i2 = synthetic_pair(40, 48, shift=(2.0, 1.0), seed=9)
    cfg = DISConfig(iterations=6, coarsest_scale=0, patch_overlap=0.5,
                    early_exit=False, mode=mode)
    pyr1 = construct_pyramid(jnp.asarray(i1), 0, cfg.img_padding)
    pyr2 = construct_pyramid(jnp.asarray(i2), 0, cfg.img_padding)
    l1, l2 = pyr1[0], pyr2[0]
    geom = make_grid(l1.width, l1.height, cfg.steps)
    centers = jnp.asarray(geom.centers)
    tpl = iclk.extract_templates(l1.img, l1.dx, l1.dy, centers,
                                 cfg.patch_size, cfg.img_padding)
    init_u = jnp.zeros_like(centers)

    cfg_x = DISConfig(**{**cfg.__dict__, "kernel": "xla"})
    res_x = iclk.inverse_search(l2.img, tpl, centers, init_u, cfg_x,
                                l1.width, l1.height)
    cfg_p = DISConfig(**{**cfg.__dict__, "kernel": "pallas"})
    res_p = iclk.inverse_search(l2.img, tpl, centers, init_u, cfg_p,
                                l1.width, l1.height)
    np.testing.assert_allclose(np.asarray(res_p.u), np.asarray(res_x.u),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(res_p.Q), np.asarray(res_x.Q),
                               atol=1e-2)
    np.testing.assert_array_equal(np.asarray(res_p.converged),
                                  np.asarray(res_x.converged))


def test_pallas_e2e_matches_xla():
    i1, i2 = synthetic_pair(32, 40, shift=(1.0, 1.0), seed=4)
    kw = dict(iterations=5, coarsest_scale=2, patch_overlap=0.5,
              early_exit=False)
    fx = np.asarray(dis_flow_padded(jnp.asarray(i1), jnp.asarray(i2),
                                    DISConfig(kernel="xla", **kw)))
    fp = np.asarray(dis_flow_padded(jnp.asarray(i1), jnp.asarray(i2),
                                    DISConfig(kernel="pallas", **kw)))
    np.testing.assert_allclose(fp, fx, atol=1e-3)
