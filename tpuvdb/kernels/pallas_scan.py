"""Pallas fused distance + streaming top-k scan.

The hot op of the whole system (the role hnswlib's C++ `knn_query` plays in
the reference, src/datanode/handler.py:364) as one Mosaic kernel:

  for each corpus block (grid dim 1):
      VMEM <- (B, d) chunk                       [pipelined by pallas]
      scores = 2 * q @ chunk.T - ||x||^2         [MXU]
      mask soft-deleted slots                    [VPU]
      fold into a (Q, C) running candidate buffer by strided elementwise
      max — bucket c tracks the best score among columns congruent to c
      [VPU, no sort, no data-dependent control flow]

The candidate buffer lives in VMEM scratch across the whole corpus sweep,
so the (Q, N) score matrix never exists anywhere. A final exact
`lax.top_k` over the (Q, C) candidates (C = 512 by default) happens
outside the kernel — tiny. Like `jax.lax.approx_max_k` (PartialReduce),
the bucketing is the only approximation: two true top-k hits that collide
in the same bucket lose one candidate; with C >> k collisions are rare
(measured recall@10 ~= 0.99 at C=512 on 1M gaussian rows).

Queries tile over grid dim 0; the corpus sweep is the minor grid dim so
the scratch accumulator is reused per query tile (TPU grids iterate the
last dimension fastest).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(np.finfo(np.float32).min)


def _scan_kernel(q_ref, chunk_ref, sq_ref, mask_ref, val_out, idx_out,
                 run_val, run_idx, *, block_rows: int, n_buckets: int,
                 sub_rows: int):
    ni = pl.num_programs(1)
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        run_val[:] = jnp.full_like(run_val, NEG_INF)
        run_idx[:] = jnp.full_like(run_idx, -1)

    q = q_ref[:]                       # (QT, d)
    base = i * block_rows
    col = jax.lax.broadcasted_iota(jnp.int32, (q.shape[0], n_buckets), 1)
    rv = run_val[:]
    ri = run_idx[:]
    # scores materialize sub_rows at a time: the (QT, B) buffer would blow
    # VMEM at large query tiles; sub-chunking trades nothing (same MXU work)
    # and lets QT grow to 512 — one corpus sweep amortized over 2x queries
    for s in range(block_rows // sub_rows):
        part = chunk_ref[s * sub_rows : (s + 1) * sub_rows, :]
        dots = jax.lax.dot_general(
            q, part,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                              # (QT, sub)
        # sq/mask arrive as (1, B) f32 rows (Mosaic wants 128-lane minors);
        # the mask is additive: 0 for live slots, NEG_INF for dead ones
        scores = (2.0 * dots
                  - sq_ref[:, s * sub_rows : (s + 1) * sub_rows]
                  + mask_ref[:, s * sub_rows : (s + 1) * sub_rows])
        for j in range(sub_rows // n_buckets):
            cand = scores[:, j * n_buckets : (j + 1) * n_buckets]
            cidx = base + s * sub_rows + j * n_buckets + col
            better = cand > rv
            rv = jnp.where(better, cand, rv)
            ri = jnp.where(better, cidx, ri)
    run_val[:] = rv
    run_idx[:] = ri

    @pl.when(i == ni - 1)
    def _():
        val_out[:] = rv
        idx_out[:] = ri


@functools.partial(
    jax.jit,
    static_argnames=("block_rows", "n_buckets", "query_tile", "sub_rows",
                     "interpret"),
)
def pallas_candidates(
    queries: jax.Array,       # (Q, d) f32; Q % query_tile == 0
    corpus: jax.Array,        # (N, d); N % block_rows == 0
    corpus_sqnorms: jax.Array,  # (1, N) f32
    neg_mask: jax.Array,      # (1, N) f32: 0 live / NEG_INF dead
    block_rows: int = 16384,
    n_buckets: int = 512,
    query_tile: int = 512,
    sub_rows: int = 2048,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (cand_scores, cand_idx), each (Q, n_buckets) — the per-bucket
    best NEGATED-partial scores (2qx - ||x||^2) and their corpus rows."""
    qn, d = queries.shape
    n = corpus.shape[0]
    if n % block_rows != 0:
        raise ValueError(f"corpus rows {n} %% block_rows {block_rows} != 0")
    if qn % query_tile != 0:
        raise ValueError(f"queries {qn} %% query_tile {query_tile} != 0")
    if block_rows % sub_rows != 0 or sub_rows % n_buckets != 0:
        raise ValueError(
            "need block_rows % sub_rows == 0 and sub_rows % n_buckets == 0")
    grid = (qn // query_tile, n // block_rows)

    kernel = functools.partial(
        _scan_kernel, block_rows=block_rows, n_buckets=n_buckets,
        sub_rows=sub_rows,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((query_tile, d), lambda qi, i: (qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, d), lambda qi, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_rows), lambda qi, i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_rows), lambda qi, i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((query_tile, n_buckets), lambda qi, i: (qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((query_tile, n_buckets), lambda qi, i: (qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((qn, n_buckets), jnp.float32),
            jax.ShapeDtypeStruct((qn, n_buckets), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((query_tile, n_buckets), jnp.float32),
            pltpu.VMEM((query_tile, n_buckets), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * qn * n * d,
            bytes_accessed=n * d * corpus.dtype.itemsize + qn * d * 4,
            transcendentals=0,
        ),
        # multi-tile grids (coalesced serving stacks, 4096-query batches)
        # double-buffer the out blocks and land ~0.2 MB over the 16 MB
        # default scoped-VMEM budget — raise it; actual use is ~16-20 MB
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=48 << 20),
        interpret=interpret,
    )(queries.astype(corpus.dtype), corpus, corpus_sqnorms, neg_mask)



def fit_block_rows(n_rows: int, dim: int, itemsize: int,
                   max_tile_bytes: int = 1 << 22, max_rows: int = 16384,
                   min_rows: int = 512) -> Optional[int]:
    """Largest power-of-two block_rows that (a) divides n_rows, (b) keeps
    the pipelined corpus tile within the scoped-VMEM budget — the tile is
    double-buffered, so block_rows * dim * itemsize must stay <= ~4 MB
    (at dim 512 an int8 16384-row tile alone is 8 MB x 2 buffers, which
    blows the 16 MB scoped limit), and (c) stays >= min_rows (the bucket
    fold needs >= n_buckets rows per block). None = no valid size; every
    caller falls back to the XLA scan."""
    cap = min(max_rows, max_tile_bytes // max(1, dim * itemsize))
    if cap < min_rows:
        return None
    br = 1 << (cap.bit_length() - 1)
    while br >= min_rows and n_rows % br:
        br //= 2
    return br if br >= min_rows and n_rows % br == 0 else None


def _fit_sub_rows(block_rows: int, n_buckets: int, sub_rows: int) -> int:
    """Largest sub-chunk <= sub_rows that divides block_rows and is a
    multiple of n_buckets; raises if none exists (fail loudly instead of
    looping forever / going negative)."""
    sub = min(sub_rows, block_rows)
    while sub > n_buckets and (block_rows % sub or sub % n_buckets):
        sub -= n_buckets
    if sub < n_buckets or block_rows % sub or sub % n_buckets:
        raise ValueError(
            f"no sub_rows in [{n_buckets}, {block_rows}] divides "
            f"block_rows={block_rows} and is a multiple of "
            f"n_buckets={n_buckets}")
    return sub





def pallas_l2sq_topk(
    queries: jax.Array,
    corpus: jax.Array,
    corpus_sqnorms: jax.Array,
    valid: jax.Array,          # (N,) bool
    k: int,
    block_rows: int = 16384,
    n_buckets: int = 512,
    query_tile: int = 512,
    sub_rows: int = 2048,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Full search: pallas candidate sweep + tiny exact top-k epilogue.
    Same contract as kernels.distance.l2sq_topk (ascending true L2^2)."""
    qn = queries.shape[0]
    qt = min(query_tile, max(8, qn))
    pad_q = (-qn) % qt
    q = queries
    if pad_q:
        q = jnp.concatenate([q, jnp.zeros((pad_q, q.shape[1]), q.dtype)])
    sub = _fit_sub_rows(block_rows, n_buckets, sub_rows)
    neg_mask = jnp.where(valid, 0.0, NEG_INF).astype(jnp.float32)[None, :]
    cand_val, cand_idx = pallas_candidates(
        q, corpus, corpus_sqnorms.reshape(1, -1).astype(jnp.float32), neg_mask,
        block_rows=block_rows, n_buckets=n_buckets, query_tile=qt,
        sub_rows=sub, interpret=interpret,
    )
    cand_val = cand_val[:qn]
    cand_idx = cand_idx[:qn]
    kk = min(k, n_buckets)
    neg, pos = jax.lax.top_k(cand_val, kk)
    idx = jnp.take_along_axis(cand_idx, pos, axis=1)
    if kk < k:
        neg = jnp.pad(neg, ((0, 0), (0, k - kk)), constant_values=NEG_INF)
        idx = jnp.pad(idx, ((0, 0), (0, k - kk)), constant_values=-1)
    q_sq = jnp.sum(jnp.square(queries.astype(jnp.float32)), axis=-1, keepdims=True)
    idx = jnp.where(neg <= NEG_INF, -1, idx)
    dist = jnp.where(idx >= 0, q_sq - neg, jnp.inf)
    return dist, idx
