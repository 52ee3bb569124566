"""Device mesh construction.

The reference's cluster topology (ZooKeeper membership + per-node TCP,
src/utils/zk_manager.py) collapses on TPU to a static `jax.sharding.Mesh`:
each device owns a contiguous row range of the stacked shard space, and all
cross-"node" communication is XLA collectives over ICI/DCN inside one
program. Multi-host bootstrap goes through `jax.distributed.initialize`
(tpuvdb.cluster handles the membership semantics above it).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np


def device_count() -> int:
    return len(jax.devices())


def create_mesh(
    n_devices: Optional[int] = None,
    axis: str = "shards",
    devices: Optional[Sequence] = None,
) -> jax.sharding.Mesh:
    """1-D mesh over the first n_devices local devices (default: all)."""
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is not None:
        if n_devices > len(devs):
            raise ValueError(f"asked for {n_devices} devices, have {len(devs)}")
        devs = devs[:n_devices]
    return jax.sharding.Mesh(np.array(devs), (axis,))
