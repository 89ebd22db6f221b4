"""Pallas region-extraction kernel vs XLA extraction (interpret mode).

The production pipeline only enables the kernel on real TPUs; this test
pins its bit-equivalence to the XLA path on CPU via interpret mode.
"""

import numpy as np
import jax.numpy as jnp

from dis_tpu.ops import iclk
from dis_tpu.ops.pallas.extract_kernel import extract_regions_pallas, vmem_ok


def test_extraction_kernel_matches_xla(rng):
    ps, pad = 8, 8
    img = jnp.asarray((rng.random((72, 200)) * 255).astype(np.float32))
    n = 300
    pos0 = jnp.asarray(np.stack([
        rng.random(n) * 190 - 4,     # x in [-4, 186): includes edges
        rng.random(n) * 62 - 4,
    ], -1).astype(np.float32))
    want, by_w, bx_w = iclk.extract_regions(img, pos0, ps, pad)
    got, by, bx = extract_regions_pallas(img, pos0, ps, pad, block=128,
                                         interpret=True)
    np.testing.assert_array_equal(np.asarray(by), np.asarray(by_w))
    np.testing.assert_array_equal(np.asarray(bx), np.asarray(bx_w))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_vmem_guard():
    assert vmem_ok(1096, 1936, 8)          # 1080p fits
    assert not vmem_ok(2176, 3856, 8)      # 4K does not
