"""Multi-host bootstrap.

The reference bootstraps its cluster with a ZooKeeper ensemble plus shell
scripts starting each process by hand (Scripts/start_*.sh, SURVEY.md §3.3).
On TPU pods the equivalent is `jax.distributed.initialize`: every host
joins the same JAX runtime, sees the global device set, and the shard mesh
spans all hosts — shard-to-shard traffic rides ICI/DCN inside XLA programs,
so there is no per-query host-to-host RPC at all.

The HTTP serving frontends (one per host, tpuvdb.api.server) register with
the NodeRegistry exactly like the reference's datanodes register with the
coordinator, giving operators the same register/list/health surface.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> dict:
    """Join (or no-op on single host) the multi-host JAX runtime.

    On TPU pods the arguments come from the environment automatically; on
    CPU/GPU clusters pass them explicitly or via TPUVDB_COORDINATOR /
    TPUVDB_NUM_PROCESSES / TPUVDB_PROCESS_ID. Returns topology info.
    """
    coordinator_address = coordinator_address or os.environ.get("TPUVDB_COORDINATOR")
    if num_processes is None and os.environ.get("TPUVDB_NUM_PROCESSES"):
        num_processes = int(os.environ["TPUVDB_NUM_PROCESSES"])
    if process_id is None and os.environ.get("TPUVDB_PROCESS_ID"):
        process_id = int(os.environ["TPUVDB_PROCESS_ID"])

    if coordinator_address or num_processes:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def shutdown_multihost():
    try:
        jax.distributed.shutdown()
    except Exception:
        pass
