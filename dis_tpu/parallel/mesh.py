"""Device-mesh helpers.

The reference is single-process/single-threaded (SURVEY.md §2 checklist:
no DP/TP/PP/SP anywhere); all parallelism here is new, built on
``jax.sharding.Mesh`` + ``shard_map`` with XLA collectives over ICI/DCN.

Axis conventions used throughout:
- ``batch``: independent frame pairs (data parallelism).
- ``space``: row-wise frame tiling with halo exchange (the SP/CP
  analogue for a non-attention workload).
- ``seq``:  frames of one long video sharded across hosts (one-frame
  neighbor halo over DCN).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Optional[Tuple[int, ...]] = None,
              axis_names: Sequence[str] = ("batch", "space"),
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a named mesh over the available devices.

    Default: all devices on the ``batch`` axis, ``space`` size 1.
    """
    devs = np.array(devices if devices is not None else jax.devices())
    n = devs.size
    if shape is None:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    need = int(np.prod(shape))
    if need > n:
        raise ValueError(f"mesh shape {shape} needs {need} devices, have {n}")
    return Mesh(devs[:need].reshape(shape), axis_names=tuple(axis_names))


def batch_sharding(mesh: Mesh, axis: str = "batch") -> NamedSharding:
    """Sharding for a [B, ...] stack of frame pairs."""
    return NamedSharding(mesh, P(axis))


def row_sharding(mesh: Mesh, axis: str = "space") -> NamedSharding:
    """Sharding for a [H, W] frame split along rows."""
    return NamedSharding(mesh, P(axis, None))
