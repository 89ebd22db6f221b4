"""Sequence sharding: frames of a long video across devices/hosts.

The reference walks a video strictly serially (main.cpp:102-206).  Here
a [T, H, W] clip is sharded along time; pair (t, t+1) straddles shard
boundaries, so each device fetches its right neighbor's FIRST frame via
one ``ppermute`` — a one-frame halo over the ``seq`` axis (DCN when the
axis spans hosts).  Every device then flows its local pairs
independently: exact parity with the serial loop, T-1 flows total.

This is BASELINE.json config #5 (multi-host throughput + scaling
efficiency); on a single host it also serves as within-host sequence
parallelism.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..config import DISConfig
from ..models.dis import dis_flow_padded


def sequence_flow_fn(cfg: DISConfig, mesh: Mesh, axis: str = "seq"):
    """Returns a jitted fn [T, H, W] -> [T, h, w, 2].

    ``T`` must be divisible by the axis size.  Output slot t holds the
    flow for pair (t, t+1); the final slot (no successor frame) is
    zeros, so callers use ``flows[:-1]``.
    """
    n = mesh.shape[axis]

    def local(frames):  # [Tl, H, W]
        tl = frames.shape[0]
        # one-frame halo: receive the right neighbor's first frame
        first = frames[0]
        nxt = lax.ppermute(first, axis, [(j + 1, j) for j in range(n - 1)])
        i = lax.axis_index(axis)
        is_last = i == n - 1
        ext = jnp.concatenate([frames, nxt[None]], axis=0)  # [Tl+1, H, W]

        flows = jax.vmap(lambda a, b: dis_flow_padded(a, b, cfg))(
            ext[:-1], ext[1:])
        # last device's final pair is invalid (no successor): zero it
        mask = jnp.where(
            is_last,
            jnp.arange(tl) < tl - 1,
            jnp.ones(tl, dtype=bool),
        )
        return flows * mask[:, None, None, None]

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(axis, None, None),),
        out_specs=P(axis, None, None, None),
    )
    return jax.jit(fn)
