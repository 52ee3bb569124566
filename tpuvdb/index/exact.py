"""Device-resident exact index.

Holds the stacked shard row space on device (HBM): vectors, squared norms,
and the validity mask; applies incremental slot updates with donated-buffer
scatters (no host round-trip of the corpus), and serves batched exact top-k
via the streaming scan kernel. With a mesh, the row axis is sharded across
devices and search runs as a shard_map program with a collective top-k merge
(tpuvdb.mesh.sharded) — the single-program replacement for the reference
coordinator's sequential per-node RPC fan-out
(src/coordinator/handler.py:191-206).
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpuvdb.index.layout import ShardMirror, StackedLayout
from tpuvdb.kernels.distance import l2sq_topk


@functools.partial(jax.jit, donate_argnums=(0, 1, 2))
def _scatter_update(vectors, sqnorms, valid, rows, vecs, valid_vals):
    """Scatter rows into the corpus buffers. Out-of-range rows are dropped,
    which lets callers pad update batches to fixed sizes (no recompiles)."""
    vecs_f32 = vecs.astype(jnp.float32)
    vectors = vectors.at[rows].set(vecs.astype(vectors.dtype), mode="drop")
    sqnorms = sqnorms.at[rows].set(
        jnp.sum(vecs_f32 * vecs_f32, axis=-1), mode="drop"
    )
    valid = valid.at[rows].set(valid_vals, mode="drop")
    return vectors, sqnorms, valid


@functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3))
def _scatter_update_int8(vectors, scales, sqnorms, valid, rows, vecs, valid_vals):
    """Int8 storage variant: per-row quantize incoming vectors on device."""
    vecs_f32 = vecs.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(vecs_f32), axis=-1)
    s = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    qv = jnp.clip(jnp.round(vecs_f32 / s[:, None]), -127, 127).astype(jnp.int8)
    vectors = vectors.at[rows].set(qv, mode="drop")
    scales = scales.at[rows].set(s, mode="drop")
    sqnorms = sqnorms.at[rows].set(
        jnp.sum(vecs_f32 * vecs_f32, axis=-1), mode="drop"
    )
    valid = valid.at[rows].set(valid_vals, mode="drop")
    return vectors, scales, sqnorms, valid


@functools.partial(jax.jit, donate_argnums=(0,))
def _scatter_valid(valid, rows, valid_vals):
    return valid.at[rows].set(valid_vals, mode="drop")


@functools.partial(jax.jit, donate_argnums=(0, 1, 2))
def _stream_block(vectors, sqnorms, valid, vblk, qblk, mblk, start):
    """One streaming-build step: contiguous block write at a traced start
    row — ONE compile serves every block of the build (f32/bf16 storage,
    or int8 storage fed by already-quantized int8 mirror blocks)."""
    vectors = jax.lax.dynamic_update_slice(
        vectors, vblk.astype(vectors.dtype), (start, 0))
    sqnorms = jax.lax.dynamic_update_slice(sqnorms, qblk, (start,))
    valid = jax.lax.dynamic_update_slice(valid, mblk, (start,))
    return vectors, sqnorms, valid


@functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3))
def _stream_block_scaled(vectors, scales, sqnorms, valid,
                         vblk, sblk, qblk, mblk, start):
    """Streaming step for int8 storage with per-row scales supplied by the
    block (int8 mirrors carry their own scales/sqnorms)."""
    vectors = jax.lax.dynamic_update_slice(
        vectors, vblk.astype(vectors.dtype), (start, 0))
    scales = jax.lax.dynamic_update_slice(scales, sblk, (start,))
    sqnorms = jax.lax.dynamic_update_slice(sqnorms, qblk, (start,))
    valid = jax.lax.dynamic_update_slice(valid, mblk, (start,))
    return vectors, scales, sqnorms, valid


@functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3))
def _stream_block_quantize(vectors, scales, sqnorms, valid,
                           vblk, mblk, start):
    """Streaming step for int8 storage fed by f32 mirror blocks: per-row
    quantization happens ON DEVICE (same math as _scatter_update_int8)."""
    vecs_f32 = vblk.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(vecs_f32), axis=-1)
    s = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    qv = jnp.clip(jnp.round(vecs_f32 / s[:, None]), -127, 127).astype(jnp.int8)
    sq = jnp.sum(vecs_f32 * vecs_f32, axis=-1)
    vectors = jax.lax.dynamic_update_slice(vectors, qv, (start, 0))
    scales = jax.lax.dynamic_update_slice(scales, s, (start,))
    sqnorms = jax.lax.dynamic_update_slice(sqnorms, sq, (start,))
    valid = jax.lax.dynamic_update_slice(valid, mblk, (start,))
    return vectors, scales, sqnorms, valid


# fixed scatter bucket: every update batch is chunked+padded to exactly this
# many rows so the scatter program compiles ONCE per layout (variable batch
# sizes would each trigger a fresh XLA compile — seconds per shape)
_SCATTER_BUCKET = 4096


class DeviceExactIndex:
    def __init__(
        self,
        layout: StackedLayout,
        dtype=jnp.float32,
        block_size: int = 8192,
        mesh: Optional[jax.sharding.Mesh] = None,
        mesh_axis: str = "shards",
        search_mode: str = "approx",
        recall_target: float = 0.95,
        rescore_fetch: int = 0,
    ):
        self.layout = layout
        self.dtype = dtype
        self.block_size = block_size
        self.mesh = mesh
        self.mesh_axis = mesh_axis
        self.search_mode = search_mode
        self.recall_target = recall_target
        # int8 only: >0 fuses an on-device exact re-rank of this many
        # dequantized candidates into the scan (kernels.quant); removes
        # query-quantization + approx-selection error with no host work
        self.rescore_fetch = rescore_fetch
        self._sharding = None
        self._sharding1d = None
        if mesh is not None:
            # rows shard over `mesh_axis`; any OTHER mesh axis (e.g. a 2-D
            # (repl, shards) mesh) is left unmentioned, so XLA REPLICATES
            # the corpus across it — that is exactly the replica layout
            P = jax.sharding.PartitionSpec
            self._sharding = jax.sharding.NamedSharding(mesh, P(mesh_axis, None))
            self._sharding1d = jax.sharding.NamedSharding(mesh, P(mesh_axis))
        self.quantized = dtype == jnp.int8
        self.vectors = self._device_put(
            np.zeros((layout.total_rows, layout.dim), dtype=np.float32), self._sharding
        )
        # per-row dequant scales (int8 storage only; see kernels.quant)
        self.row_scales = (
            self._device_put(np.ones(layout.total_rows, np.float32), self._sharding1d)
            if self.quantized else None
        )
        self.sqnorms = self._device_put(
            np.zeros(layout.total_rows, dtype=np.float32), self._sharding1d
        )
        self.valid = self._device_put(
            np.zeros(layout.total_rows, dtype=bool), self._sharding1d
        )

    def _device_put(self, arr, sharding):
        arr = jnp.asarray(arr, dtype=self.dtype if arr.ndim == 2 else arr.dtype)
        if sharding is not None:
            return jax.device_put(arr, sharding)
        return jax.device_put(arr)

    # ------------------------------------------------------------------ build

    # streaming build kicks in above this many stacked rows (single device
    # only): blocks of the row space upload via one compiled
    # dynamic_update_slice program instead of materializing the full host
    # corpus copy — at 8M x 768 the stack() transient alone is 24.5 GB f32
    _STREAM_MIN_ROWS = 2_000_000
    _STREAM_BLOCK_ROWS = 1 << 18

    @classmethod
    def build(
        cls,
        mirrors: List[ShardMirror],
        dtype=jnp.float32,
        block_size: int = 8192,
        mesh: Optional[jax.sharding.Mesh] = None,
        mesh_axis: str = "shards",
        search_mode: str = "approx",
        recall_target: float = 0.95,
        rescore_fetch: int = 0,
        stream: Optional[bool] = None,
    ) -> "DeviceExactIndex":
        # rows must divide across the SHARD axis (a 2-D mesh's other axis
        # replicates and doesn't constrain the row count)
        ndev = mesh.shape[mesh_axis] if mesh is not None else 1
        layout = StackedLayout.for_mirrors(mirrors, block=block_size, min_rows_multiple=ndev)
        idx = cls(layout, dtype=dtype, block_size=block_size, mesh=mesh,
                  mesh_axis=mesh_axis, search_mode=search_mode,
                  recall_target=recall_target, rescore_fetch=rescore_fetch)
        if stream is None:
            stream = (layout.total_rows >= cls._STREAM_MIN_ROWS
                      and (mesh is None or mesh.size == 1))
        if stream and (mesh is None or mesh.size == 1):
            idx._build_streaming(mirrors)
            return idx
        mirrors_q = all(m.quantized for m in mirrors)
        if idx.quantized and mirrors_q:
            # int8 mirrors already hold quantized rows + scales + norms:
            # upload them directly (1 byte/dim host transient, not 4)
            qv, scales, sq, valid = layout.stack_raw_int8(mirrors)
            idx.vectors = idx._device_put(qv, idx._sharding)
            idx.row_scales = idx._device_put(scales, idx._sharding1d)
        elif idx.quantized:
            from tpuvdb.kernels.quant import quantize_rows_np

            vecs, sq, valid = layout.stack(mirrors)
            qv, scales = quantize_rows_np(vecs)
            idx.vectors = idx._device_put(qv, idx._sharding)
            idx.row_scales = idx._device_put(scales, idx._sharding1d)
        else:
            vecs, sq, valid = layout.stack(mirrors)
            idx.vectors = idx._device_put(vecs, idx._sharding)
        idx.sqnorms = idx._device_put(sq, idx._sharding1d)
        idx.valid = idx._device_put(valid, idx._sharding1d)
        return idx

    def _build_streaming(self, mirrors: List[ShardMirror]):
        """Upload the stacked row space block-by-block into the (donated)
        zero buffers from __init__: host peak extra memory = ONE block, and
        the jitted block writer compiles once per layout. Single-device
        only (a traced-offset update on a sharded axis would shuffle
        through collectives)."""
        blk = min(self._STREAM_BLOCK_ROWS, self.layout.total_rows)
        mirrors_q = all(m.quantized for m in mirrors)
        for start, vblk, sblk, qblk, mblk in self.layout.iter_blocks(
                mirrors, blk):
            start = jnp.int32(start)
            if self.quantized and mirrors_q:
                (self.vectors, self.row_scales, self.sqnorms,
                 self.valid) = _stream_block_scaled(
                    self.vectors, self.row_scales, self.sqnorms, self.valid,
                    jnp.asarray(vblk), jnp.asarray(sblk),
                    jnp.asarray(qblk), jnp.asarray(mblk), start)
            elif self.quantized:
                (self.vectors, self.row_scales, self.sqnorms,
                 self.valid) = _stream_block_quantize(
                    self.vectors, self.row_scales, self.sqnorms, self.valid,
                    jnp.asarray(vblk), jnp.asarray(mblk), start)
            else:
                if sblk is not None:  # int8 mirrors -> f32/bf16 storage
                    vblk = vblk.astype(np.float32) * sblk[:, None]
                self.vectors, self.sqnorms, self.valid = _stream_block(
                    self.vectors, self.sqnorms, self.valid,
                    jnp.asarray(vblk), jnp.asarray(qblk),
                    jnp.asarray(mblk), start)

    def needs_rebuild(self, mirrors: List[ShardMirror]) -> bool:
        """True when a mirror outgrew the common physical capacity."""
        return any(m.phys_cap > self.layout.phys_cap for m in mirrors) or (
            len(mirrors) != self.layout.num_shards
        )

    # ---------------------------------------------------------------- updates

    def apply_updates(
        self,
        rows: np.ndarray,          # (n,) int32 physical rows
        vecs: np.ndarray,          # (n, dim) float32
        valid_vals: np.ndarray,    # (n,) bool
    ):
        """Scatter a batch of slot writes, chunked to the fixed bucket size;
        out-of-range pad rows are dropped by XLA (mode="drop")."""
        n = rows.shape[0]
        if n == 0:
            return
        for start in range(0, n, _SCATTER_BUCKET):
            self._apply_bucket(
                rows[start : start + _SCATTER_BUCKET],
                vecs[start : start + _SCATTER_BUCKET],
                valid_vals[start : start + _SCATTER_BUCKET],
            )

    def _apply_bucket(self, rows, vecs, valid_vals):
        pad = _SCATTER_BUCKET - rows.shape[0]
        if pad:
            rows = np.concatenate([rows, np.full(pad, self.layout.total_rows, np.int32)])
            vecs = np.concatenate([vecs, np.zeros((pad, vecs.shape[1]), vecs.dtype)])
            valid_vals = np.concatenate([valid_vals, np.zeros(pad, bool)])
        if self.quantized:
            self.vectors, self.row_scales, self.sqnorms, self.valid = (
                _scatter_update_int8(
                    self.vectors, self.row_scales, self.sqnorms, self.valid,
                    jnp.asarray(rows, dtype=jnp.int32),
                    jnp.asarray(vecs),
                    jnp.asarray(valid_vals),
                )
            )
        else:
            self.vectors, self.sqnorms, self.valid = _scatter_update(
                self.vectors,
                self.sqnorms,
                self.valid,
                jnp.asarray(rows, dtype=jnp.int32),
                jnp.asarray(vecs),
                jnp.asarray(valid_vals),
            )

    def apply_deletes(self, rows: np.ndarray):
        n = rows.shape[0]
        if n == 0:
            return
        for start in range(0, n, _SCATTER_BUCKET):
            chunk = rows[start : start + _SCATTER_BUCKET]
            pad = _SCATTER_BUCKET - chunk.shape[0]
            if pad:
                chunk = np.concatenate(
                    [chunk, np.full(pad, self.layout.total_rows, np.int32)]
                )
            self.valid = _scatter_valid(
                self.valid, jnp.asarray(chunk, dtype=jnp.int32),
                jnp.zeros(_SCATTER_BUCKET, dtype=bool),
            )

    # ----------------------------------------------------------------- search

    def search(self, queries: np.ndarray, k: int) -> Tuple[np.ndarray, np.ndarray]:
        """Exact top-k over all live rows. Returns (dists, rows) as numpy,
        dists ascending squared-L2; empty slots are +inf / -1."""
        q = jnp.asarray(queries, dtype=jnp.float32)
        if self.mesh is not None and len(self.mesh.axis_names) == 2:
            # 2-D (repl, shards) mesh: replicas split the query batch
            from tpuvdb.mesh.replicated import replicated_search

            repl_axis = next(a for a in self.mesh.axis_names
                             if a != self.mesh_axis)
            nrepl = self.mesh.shape[repl_axis]
            qn = q.shape[0]
            pad = (-qn) % nrepl
            if pad:
                q = jnp.concatenate([q, jnp.zeros((pad, q.shape[1]), q.dtype)])
            dist, rows = replicated_search(
                q, self.vectors, self.sqnorms, self.valid,
                k=k, block_size=self.block_size, mesh=self.mesh,
                repl_axis=repl_axis, shard_axis=self.mesh_axis,
                mode=self.search_mode, recall_target=self.recall_target,
                row_scales=self.row_scales, rescore_fetch=self.rescore_fetch,
            )
            dist, rows = dist[:qn], rows[:qn]
        elif self.mesh is not None and self.mesh.size > 1:
            from tpuvdb.mesh.sharded import sharded_search

            dist, rows = sharded_search(
                q, self.vectors, self.sqnorms, self.valid,
                k=k, block_size=self.block_size,
                mesh=self.mesh, axis=self.mesh_axis,
                mode=self.search_mode, recall_target=self.recall_target,
                row_scales=self.row_scales, rescore_fetch=self.rescore_fetch,
            )
        elif self.quantized and self.rescore_fetch > 0:
            # XLA approx_max_k sweep + exact re-rank. A Pallas fused
            # int8 sweep variant was measured slower at EVERY shape
            # tried (329k vs 503k QPS at 1M x 128; 18.5k vs 26.3k at
            # 8M x 768 — BENCH_NOTES) and was retired in round 4.
            from tpuvdb.kernels.quant import l2sq_topk_int8_rescored

            dist, rows = l2sq_topk_int8_rescored(
                q, self.vectors, self.row_scales, self.sqnorms,
                self.valid, k=k, fetch=max(self.rescore_fetch, k),
                recall_target=self.recall_target,
            )
        elif self.quantized:
            from tpuvdb.kernels.quant import l2sq_topk_int8_xla

            dist, rows = l2sq_topk_int8_xla(
                q, self.vectors, self.row_scales, self.sqnorms, self.valid,
                k=k, recall_target=self.recall_target,
            )
        else:
            dist, rows = l2sq_topk(
                q, self.vectors, self.sqnorms, self.valid,
                k=k, block_size=self.block_size,
                mode=self.search_mode, recall_target=self.recall_target,
            )
        # ONE transfer for both results: through the execution relay each
        # fresh-result materialization pays a sync tick (~15 ms measured),
        # so fetching (dist, rows) together saves a tick per search; on
        # directly-attached hardware it is never worse
        dist, rows = jax.device_get((dist, rows))
        return np.asarray(dist), np.asarray(rows)

    def nbytes(self) -> int:
        return (
            self.vectors.size * self.vectors.dtype.itemsize
            + self.sqnorms.size * 4
            + self.valid.size
        )
