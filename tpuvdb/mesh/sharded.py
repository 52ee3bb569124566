"""Collective scatter-gather search as one XLA program.

The reference coordinator loops over data nodes SEQUENTIALLY, issuing one
Thrift RPC per node and merging results in Python
(src/coordinator/handler.py:191-216) — query latency is the sum of per-node
round trips. Here the same scatter-gather is a shard_map program: the query
batch is replicated to every device, each device runs the streaming exact
scan over its local row range, and the per-device (Q, k) candidates are
merged with an `all_gather` over ICI followed by a final top-k — one
compiled program, no host in the loop.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from tpuvdb.kernels.distance import l2sq_topk

shard_map = jax.shard_map


@functools.lru_cache(maxsize=32)
def _build_sharded_search(mesh, axis: str, k: int, block_size: int,
                          rows_per_dev: int, mode: str, recall_target: float,
                          quantized: bool = False, rescore_fetch: int = 0):
    ndev = mesh.shape[axis]

    def local_topk(q, vecs, sq, valid, scales=None):
        if quantized and rescore_fetch > 0:
            # fused dequant re-rank BEFORE the collective merge: each shard
            # rescores its own overfetched candidates locally (no extra
            # ICI traffic — the merge still moves only (Q, k) per shard),
            # and the merged distances are exact over stored rows
            from tpuvdb.kernels.quant import l2sq_topk_int8_rescored

            return l2sq_topk_int8_rescored(q, vecs, scales, sq, valid, k=k,
                                           fetch=max(rescore_fetch, k),
                                           recall_target=recall_target)
        if quantized:
            from tpuvdb.kernels.quant import l2sq_topk_int8_xla

            return l2sq_topk_int8_xla(q, vecs, scales, sq, valid, k=k,
                                      recall_target=recall_target)
        return l2sq_topk(q, vecs, sq, valid, k=k, block_size=block_size,
                         mode=mode, recall_target=recall_target)

    def local(q, vecs, sq, valid, *rest):
        my = jax.lax.axis_index(axis)
        dist, idx = local_topk(q, vecs, sq, valid, *rest)
        rows = jnp.where(idx >= 0, idx + my * rows_per_dev, -1)
        neg = jnp.where(idx >= 0, -dist, -jnp.inf)
        # (ndev, Q, k) candidate sets on every device, then a final top-k.
        neg_all = jax.lax.all_gather(neg, axis)
        rows_all = jax.lax.all_gather(rows, axis)
        qn = q.shape[0]
        neg_all = jnp.moveaxis(neg_all, 0, 1).reshape(qn, ndev * k)
        rows_all = jnp.moveaxis(rows_all, 0, 1).reshape(qn, ndev * k)
        top_neg, pos = jax.lax.top_k(neg_all, k)
        top_rows = jnp.take_along_axis(rows_all, pos, axis=-1)
        out_dist = jnp.where(top_rows >= 0, -top_neg, jnp.inf)
        return out_dist, top_rows

    in_specs = (P(), P(axis, None), P(axis), P(axis))
    if quantized:
        in_specs = in_specs + (P(axis),)
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)


def sharded_search(
    queries: jax.Array,
    vectors: jax.Array,
    sqnorms: jax.Array,
    valid: jax.Array,
    k: int,
    block_size: int,
    mesh: jax.sharding.Mesh,
    axis: str = "shards",
    mode: str = "approx",
    recall_target: float = 0.95,
    row_scales=None,
    rescore_fetch: int = 0,
) -> Tuple[jax.Array, jax.Array]:
    """Global top-k over the row-sharded corpus. Returns (dists, rows).
    Pass row_scales for int8-quantized corpora; rescore_fetch > 0 adds a
    per-shard fused exact re-rank of that many candidates (int8 only)."""
    ndev = mesh.shape[axis]
    total_rows = vectors.shape[0]
    if total_rows % ndev != 0:
        raise ValueError(f"rows {total_rows} not divisible by mesh size {ndev}")
    rows_per_dev = total_rows // ndev
    if mode == "exact" and rows_per_dev % block_size != 0 and rows_per_dev > block_size:
        raise ValueError(
            f"rows/device {rows_per_dev} not a multiple of block {block_size}"
        )
    quantized = row_scales is not None
    fn = _build_sharded_search(mesh, axis, k, block_size, rows_per_dev,
                               mode, recall_target, quantized,
                               rescore_fetch if quantized else 0)
    if quantized:
        return fn(queries, vectors, sqnorms, valid, row_scales)
    return fn(queries, vectors, sqnorms, valid)
