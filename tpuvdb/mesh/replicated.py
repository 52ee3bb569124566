"""Replicated + sharded search: the 2-D mesh program.

The reference DECLARES replication (REPLICA_COUNT=2, slave failover in
ZooKeeper) but never implements it — the datanode has no `replicate`
handler and slaves hold no data, so failover serves empty shards
(SURVEY.md §2.3). Here replication is real and TPU-native:

    mesh = (repl, shards)
    corpus rows:   sharded over `shards`, REPLICATED over `repl`
    query batch:   split over `repl` (each replica group serves its slice)
    per group:     local scan + all_gather over `shards` (ICI) top-k merge
    output:        all_gather over `repl` reassembles the full batch

So R replicas multiply query throughput by R at Rx memory — the serving
use of replicas — while each replica group holds a complete copy of every
shard, which is exactly the failure-domain property the reference's
master/slave shard map promises: lose a host and a full copy of the data
remains on the other replica group (the host-level failover handled by
tpuvdb.cluster).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from tpuvdb.kernels.distance import l2sq_topk

shard_map = jax.shard_map


def create_mesh_2d(
    repl: int, shards: int,
    repl_axis: str = "repl", shard_axis: str = "shards",
    devices=None,
) -> jax.sharding.Mesh:
    devs = list(devices) if devices is not None else jax.devices()
    if repl * shards > len(devs):
        raise ValueError(f"need {repl * shards} devices, have {len(devs)}")
    arr = np.array(devs[: repl * shards]).reshape(repl, shards)
    return jax.sharding.Mesh(arr, (repl_axis, shard_axis))


def shard_corpus_replicated(
    mesh: jax.sharding.Mesh,
    vectors, sqnorms, valid,
    shard_axis: str = "shards",
):
    """Place corpus: rows split over `shards`, copied across `repl`."""
    vecs = jax.device_put(vectors, NamedSharding(mesh, P(shard_axis, None)))
    sq = jax.device_put(sqnorms, NamedSharding(mesh, P(shard_axis)))
    vd = jax.device_put(valid, NamedSharding(mesh, P(shard_axis)))
    return vecs, sq, vd


@functools.lru_cache(maxsize=16)
def _build_replicated_search(mesh, repl_axis: str, shard_axis: str, k: int,
                             block_size: int, rows_per_shard: int,
                             mode: str, recall_target: float,
                             quantized: bool = False, rescore_fetch: int = 0):
    nshards = mesh.shape[shard_axis]
    nrepl = mesh.shape[repl_axis]

    def local_topk(q_slice, vecs, sq, valid, scales=None):
        if quantized and rescore_fetch > 0:
            # per-shard fused dequant re-rank before the collective merge
            # (see mesh/sharded.py — same trade: no extra ICI traffic)
            from tpuvdb.kernels.quant import l2sq_topk_int8_rescored

            return l2sq_topk_int8_rescored(q_slice, vecs, scales, sq, valid,
                                           k=k, fetch=max(rescore_fetch, k),
                                           recall_target=recall_target)
        if quantized:
            from tpuvdb.kernels.quant import l2sq_topk_int8_xla

            return l2sq_topk_int8_xla(q_slice, vecs, scales, sq, valid, k=k,
                                      recall_target=recall_target)
        return l2sq_topk(q_slice, vecs, sq, valid, k=k,
                         block_size=block_size, mode=mode,
                         recall_target=recall_target)

    def local(q_slice, vecs, sq, valid, *rest):
        # q_slice: this replica group's slice of the batch (Q/nrepl, d)
        my_shard = jax.lax.axis_index(shard_axis)
        dist, idx = local_topk(q_slice, vecs, sq, valid, *rest)
        rows = jnp.where(idx >= 0, idx + my_shard * rows_per_shard, -1)
        neg = jnp.where(idx >= 0, -dist, -jnp.inf)
        # merge across shards within the replica group (ICI)
        neg_all = jax.lax.all_gather(neg, shard_axis)
        rows_all = jax.lax.all_gather(rows, shard_axis)
        qn = q_slice.shape[0]
        neg_all = jnp.moveaxis(neg_all, 0, 1).reshape(qn, nshards * k)
        rows_all = jnp.moveaxis(rows_all, 0, 1).reshape(qn, nshards * k)
        top_neg, pos = jax.lax.top_k(neg_all, k)
        top_rows = jnp.take_along_axis(rows_all, pos, axis=-1)
        out_dist = jnp.where(top_rows >= 0, -top_neg, jnp.inf)
        # reassemble the full batch across replica groups
        out_dist = jax.lax.all_gather(out_dist, repl_axis, axis=0, tiled=True)
        out_rows = jax.lax.all_gather(top_rows, repl_axis, axis=0, tiled=True)
        return out_dist, out_rows

    in_specs = (P(repl_axis, None), P(shard_axis, None), P(shard_axis),
                P(shard_axis))
    if quantized:
        in_specs = in_specs + (P(shard_axis),)
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)


def replicated_search(
    queries: jax.Array,
    vectors: jax.Array,
    sqnorms: jax.Array,
    valid: jax.Array,
    k: int,
    block_size: int,
    mesh: jax.sharding.Mesh,
    repl_axis: str = "repl",
    shard_axis: str = "shards",
    mode: str = "approx",
    recall_target: float = 0.95,
    row_scales=None,
    rescore_fetch: int = 0,
) -> Tuple[jax.Array, jax.Array]:
    """Full-batch search over the (repl, shards) mesh. The query batch must
    divide by the repl axis size. Pass row_scales for int8 corpora;
    rescore_fetch > 0 adds a per-shard fused exact re-rank (int8 only).
    Returns (dists, rows) for every query."""
    nrepl = mesh.shape[repl_axis]
    nshards = mesh.shape[shard_axis]
    if queries.shape[0] % nrepl != 0:
        raise ValueError(
            f"batch {queries.shape[0]} not divisible by repl axis {nrepl}"
        )
    total_rows = vectors.shape[0]
    if total_rows % nshards != 0:
        raise ValueError(f"rows {total_rows} % shards {nshards} != 0")
    quantized = row_scales is not None
    fn = _build_replicated_search(
        mesh, repl_axis, shard_axis, k, block_size,
        total_rows // nshards, mode, recall_target, quantized,
        rescore_fetch if quantized else 0,
    )
    if quantized:
        return fn(queries, vectors, sqnorms, valid, row_scales)
    return fn(queries, vectors, sqnorms, valid)
