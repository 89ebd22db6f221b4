"""Batched multi-pair flow: data parallelism over frame pairs.

The reference processes frame pairs strictly serially (main.cpp:102).
Here a stack of pairs [B, H, W] is vmapped through the single-pair
pipeline and sharded over the mesh ``batch`` axis; XLA partitions the
whole computation with no cross-pair communication (metrics reduce via
``psum`` when requested).  This is BASELINE.json config #3 (KITTI
multi-pair throughput across one host's chips).
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import DISConfig
from ..models.dis import dis_flow_padded


def batched_flow_fn(cfg: DISConfig, mesh: Optional[Mesh] = None,
                    axis: str = "batch"):
    """Returns a jitted fn: ([B,H,W], [B,H,W]) -> [B,h,w,2].

    With a mesh, inputs/outputs are annotated to shard over ``axis``;
    B must be divisible by the axis size.
    """
    vf = jax.vmap(lambda a, b: dis_flow_padded(a, b, cfg))
    if mesh is None:
        return jax.jit(vf)
    in_s = NamedSharding(mesh, P(axis, None, None))
    out_s = NamedSharding(mesh, P(axis, None, None, None))
    return jax.jit(vf, in_shardings=(in_s, in_s), out_shardings=out_s)


def batched_flow_epe_fn(cfg: DISConfig, mesh: Optional[Mesh] = None,
                        axis: str = "batch"):
    """Returns a jitted fn: (pairs1, pairs2, gt) -> (flows, mean_epe).

    The scalar mean EPE is an all-reduce across the batch axis — under
    the mesh this lowers to a single ``psum``-style collective over ICI.
    """
    from ..utils.metrics import epe_jax

    def one(a, b, gt):
        f = dis_flow_padded(a, b, cfg)
        return f, epe_jax(f, gt)

    def run(aa, bb, gg):
        flows, epes = jax.vmap(one)(aa, bb, gg)
        return flows, epes.mean()

    if mesh is None:
        return jax.jit(run)
    in3 = NamedSharding(mesh, P(axis, None, None))
    in4 = NamedSharding(mesh, P(axis, None, None, None))
    out4 = NamedSharding(mesh, P(axis, None, None, None))
    rep = NamedSharding(mesh, P())
    return jax.jit(run, in_shardings=(in3, in3, in4),
                   out_shardings=(out4, rep))
