"""Pallas IVF probe kernel: scalar-prefetched cell DMA + fused scoring.

The XLA IVF path gathers candidate ROWS (`jnp.take` over nprobe*cell_pad
random rows per query) — random-access gathers run at a small fraction of
HBM bandwidth on TPU, which is why the naive IVF scan measured ~50x slower
than the flat sequential scan. This kernel exploits the IVF layout instead:
cells are CONTIGUOUS in the grouped array, so probing cell c is one
sequential (cell_pad, d) block read.

`pltpu.PrefetchScalarGridSpec` makes the per-(query-tile, probe) cell id
available BEFORE the kernel body runs: the block index_map reads
`cells_ref[qt, p]` and pallas pipelines the HBM->VMEM DMA of exactly that
cell's block, double-buffered across grid steps. Per grid step:

    scores = 2 * q_tile @ cell.T - ||x||^2 + mask      [MXU + VPU]
    fold into a (QT, n_buckets) running candidate max  [VPU]

Queries tile over grid dim 0 (each query tile probes the UNION of its
queries' cells — for latency serving the tile is small, typically 8).
A tiny exact top-k epilogue finishes outside, as in pallas_scan.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(np.finfo(np.float32).min)


def _fold_chunk(scores, cell_id, seg, run_val, run_idx,
                cell_pad: int, n_buckets: int):
    """Fold one chunk's (QT, cell_pad) scores into the running candidate
    buffer at the chunk's segment offset."""
    base = cell_id * cell_pad
    off = seg * n_buckets
    col = jax.lax.broadcasted_iota(jnp.int32, (scores.shape[0], n_buckets), 1)
    rv = run_val[:, pl.ds(off, n_buckets)]
    ri = run_idx[:, pl.ds(off, n_buckets)]
    for j in range(cell_pad // n_buckets):
        cand = scores[:, j * n_buckets : (j + 1) * n_buckets]
        cidx = base + j * n_buckets + col
        better = cand > rv
        rv = jnp.where(better, cand, rv)
        ri = jnp.where(better, cidx, ri)
    run_val[:, pl.ds(off, n_buckets)] = rv
    run_idx[:, pl.ds(off, n_buckets)] = ri


# largest host-expanded chunk-id prefetch (tiles * qt*nprobe * w128 i32
# entries) the TPU lowering accepts: measured OK through ~1M, fails at
# 1.44M (nprobe 128, nlist 5709, 8 tiles at the Deep10M shape). Above
# this the compact packed kernels take over.
_EXPANDED_PREFETCH_MAX = 1 << 20


def _seg_hash(chunk, n_segments: int):
    """Per-CHUNK segment id for the compact packed path. Chunks are
    derived inside the kernel (no expanded host-side chunk list exists to
    rank), so the segment must be a pure function of the chunk VALUE —
    two probes that over-scan into the same physical chunk (packed cells
    shorter than the scan window overlap their windows) must land in the
    same (segment, column) slots for the running max to self-dedupe."""
    # plain modulo: consecutive chunks (one cell's scan window) land in
    # DISTINCT segments by construction — a multiplicative hash of the
    # chunk id can alias a cell's w128 chunks into one segment, halving
    # that cell's candidate slots (measured: wide-fetch k=200 recall
    # 0.906 hash vs 0.95+ modulo/rank; full-scale 10M x 96 recall sweep
    # re-validated for the modulo form, see BENCH_NOTES round 4)
    return chunk % n_segments


def _probe_kernel_packed(cells_ref, off_ref, q_ref, *rest,
                         n_buckets: int, n_segments: int, cps: int,
                         w128: int, n_chunks: int):
    """Compact packed-layout probe: the prefetched scalars are the
    per-tile PROBED CELL IDS (qt*nprobe entries) plus the per-cell
    128-row start table — not the expanded per-chunk list. Grid step p,
    lane j covers global chunk index g = p*cps + j, which is chunk
    w = g %% w128 of probed cell u = g // w128; the owning block is
    off128[cells[qt, u]] + w (clamped to the array), derived identically
    in the BlockSpec index_map (DMA) and here (fold base). SMEM cost per
    tile drops from qt*nprobe*w128 ints (the expanded list, which stopped
    nprobe >= 128 compiling at Deep10M shapes) to qt*nprobe + nlist."""
    cell_refs = rest[:cps]
    sq_refs = rest[cps:2 * cps]
    mask_refs = rest[2 * cps:3 * cps]
    val_out, idx_out, run_val, run_idx = rest[3 * cps:]
    np_probe = pl.num_programs(1)
    p = pl.program_id(1)

    @pl.when(p == 0)
    def _():
        run_val[:] = jnp.full_like(run_val, NEG_INF)
        run_idx[:] = jnp.full_like(run_idx, -1)

    qt = pl.program_id(0)
    prec = (jax.lax.Precision.HIGHEST
            if cell_refs[0].dtype == jnp.float32 else None)
    blocks = (cell_refs[0][:] if cps == 1
              else jnp.concatenate([r[:] for r in cell_refs], axis=0))
    dots = jax.lax.dot_general(
        q_ref[:], blocks,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec,
    )                                   # (QT, cps * 128)
    for c in range(cps):
        g = p * cps + c
        cell = cells_ref[qt, g // w128]
        chunk = jnp.minimum(off_ref[cell] + g % w128, n_chunks - 1)
        scores = (2.0 * dots[:, c * 128:(c + 1) * 128]
                  - sq_refs[c][:] + mask_refs[c][:])
        _fold_chunk(scores, chunk, _seg_hash(chunk, n_segments),
                    run_val, run_idx, 128, n_buckets)

    @pl.when(p == np_probe - 1)
    def _():
        val_out[:] = run_val[:]
        idx_out[:] = run_idx[:]


def _probe_kernel_packed_int8(cells_ref, off_ref, qscale_ref, q_ref, *rest,
                              n_buckets: int, n_segments: int, cps: int,
                              w128: int, n_chunks: int):
    """Int8 variant of _probe_kernel_packed (see _probe_kernel_int8 for
    the dequant structure)."""
    cell_refs = rest[:cps]
    rowscale_refs = rest[cps:2 * cps]
    sq_refs = rest[2 * cps:3 * cps]
    mask_refs = rest[3 * cps:4 * cps]
    val_out, idx_out, run_val, run_idx = rest[4 * cps:]
    np_probe = pl.num_programs(1)
    p = pl.program_id(1)

    @pl.when(p == 0)
    def _():
        run_val[:] = jnp.full_like(run_val, NEG_INF)
        run_idx[:] = jnp.full_like(run_idx, -1)

    qt = pl.program_id(0)
    blocks = (cell_refs[0][:] if cps == 1
              else jnp.concatenate([r[:] for r in cell_refs], axis=0))
    dots = jax.lax.dot_general(
        q_ref[:], blocks,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    qs = qscale_ref[0, 0]
    for c in range(cps):
        g = p * cps + c
        cell = cells_ref[qt, g // w128]
        chunk = jnp.minimum(off_ref[cell] + g % w128, n_chunks - 1)
        scores = (2.0 * qs * rowscale_refs[c][:]
                  * dots[:, c * 128:(c + 1) * 128]
                  - sq_refs[c][:] + mask_refs[c][:])
        _fold_chunk(scores, chunk, _seg_hash(chunk, n_segments),
                    run_val, run_idx, 128, n_buckets)

    @pl.when(p == np_probe - 1)
    def _():
        val_out[:] = run_val[:]
        idx_out[:] = run_idx[:]


def _probe_kernel(cells_ref, segs_ref, q_ref, *rest,
                  cell_pad: int, n_buckets: int, n_segments: int,
                  cps: int = 1):
    """n_segments > 1 rotates chunks across SEGMENTS of the candidate
    buffer, multiplying per-query candidate capacity to
    n_buckets*n_segments without changing the DMA. The segment id comes
    precomputed in segs_ref: the chunk's RANK among the tile's DISTINCT
    sorted chunks, mod n_segments — duplicates of a chunk share a rank
    (so the running max still self-dedupes) while ADJACENT distinct
    chunks land in different segments (a plain cell_id %% n_segments let
    the two hottest neighboring cells collide in one segment and lose
    half their rows).

    cps > 1 processes several chunks per GRID STEP (the packed layout's
    128-row chunks made each step ~3.7 us of fixed overhead for 12 KB of
    DMA — ~3000 steps per tile at Deep10M shapes): the cps blocks arrive
    as separate pipelined operands, concatenate in VMEM, and feed ONE
    wider MXU dot; the bucket folds stay per-chunk, so ids/segments are
    exactly the cps=1 result."""
    cell_refs = rest[:cps]
    sq_refs = rest[cps:2 * cps]
    mask_refs = rest[2 * cps:3 * cps]
    val_out, idx_out, run_val, run_idx = rest[3 * cps:]
    np_probe = pl.num_programs(1)
    p = pl.program_id(1)

    @pl.when(p == 0)
    def _():
        run_val[:] = jnp.full_like(run_val, NEG_INF)
        run_idx[:] = jnp.full_like(run_idx, -1)

    qt = pl.program_id(0)

    # HIGHEST matters for f32 cells: default MXU bf16 passes add ~0.4%
    # score noise, enough to shuffle tightly-packed neighbor shells
    prec = (jax.lax.Precision.HIGHEST
            if cell_refs[0].dtype == jnp.float32 else None)
    blocks = (cell_refs[0][:] if cps == 1
              else jnp.concatenate([r[:] for r in cell_refs], axis=0))
    dots = jax.lax.dot_general(
        q_ref[:], blocks,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec,
    )                                   # (QT, cps * cell_pad)
    for c in range(cps):
        scores = (2.0 * dots[:, c * cell_pad:(c + 1) * cell_pad]
                  - sq_refs[c][:] + mask_refs[c][:])
        _fold_chunk(scores, cells_ref[qt, cps * p + c],
                    segs_ref[qt, cps * p + c], run_val, run_idx,
                    cell_pad, n_buckets)

    @pl.when(p == np_probe - 1)
    def _():
        val_out[:] = run_val[:]
        idx_out[:] = run_idx[:]


def _probe_kernel_int8(cells_ref, segs_ref, qscale_ref, q_ref, *rest,
                       cell_pad: int, n_buckets: int, n_segments: int,
                       cps: int = 1):
    """Int8-cell probe: int8 x int8 MXU dots, per-row dequant scales from
    VMEM, batch-global query scale from SMEM (see kernels.quant).
    Segment rotation and cps chunks-per-step as in _probe_kernel."""
    cell_refs = rest[:cps]
    rowscale_refs = rest[cps:2 * cps]
    sq_refs = rest[2 * cps:3 * cps]
    mask_refs = rest[3 * cps:4 * cps]
    val_out, idx_out, run_val, run_idx = rest[4 * cps:]
    np_probe = pl.num_programs(1)
    p = pl.program_id(1)

    @pl.when(p == 0)
    def _():
        run_val[:] = jnp.full_like(run_val, NEG_INF)
        run_idx[:] = jnp.full_like(run_idx, -1)

    qt = pl.program_id(0)
    blocks = (cell_refs[0][:] if cps == 1
              else jnp.concatenate([r[:] for r in cell_refs], axis=0))
    dots = jax.lax.dot_general(
        q_ref[:], blocks,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    qs = qscale_ref[0, 0]
    for c in range(cps):
        scores = (2.0 * qs * rowscale_refs[c][:]
                  * dots[:, c * cell_pad:(c + 1) * cell_pad]
                  - sq_refs[c][:] + mask_refs[c][:])
        _fold_chunk(scores, cells_ref[qt, cps * p + c],
                    segs_ref[qt, cps * p + c], run_val, run_idx,
                    cell_pad, n_buckets)

    @pl.when(p == np_probe - 1)
    def _():
        val_out[:] = run_val[:]
        idx_out[:] = run_idx[:]


@functools.partial(
    jax.jit,
    static_argnames=("cell_pad", "n_buckets", "query_tile", "n_segments",
                     "cps", "interpret"),
)
def pallas_ivf_candidates_int8(
    queries: jax.Array,       # (Q, d) f32
    cells: jax.Array,         # (Q // query_tile, W) int32; W % cps == 0
    segs: jax.Array,          # (Q // query_tile, W) int32 segment ids
    grouped_i8: jax.Array,    # (nlist * cell_pad, d) int8
    cell_scales: jax.Array,   # (1, nlist * cell_pad) f32
    grouped_sq: jax.Array,    # (1, nlist * cell_pad) f32
    neg_mask: jax.Array,      # (1, nlist * cell_pad) f32
    cell_pad: int,
    n_buckets: int = 128,
    query_tile: int = 8,
    n_segments: int = 1,
    cps: int = 1,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    from tpuvdb.kernels.quant import quantize_batch

    qn, d = queries.shape
    nprobe = cells.shape[1]
    if nprobe % cps:
        raise ValueError(f"cells width {nprobe} %% cps {cps} != 0")
    cand_w = n_buckets * n_segments
    qi, qscale = quantize_batch(queries)
    grid = (qn // query_tile, nprobe // cps)
    kernel = functools.partial(_probe_kernel_int8, cell_pad=cell_pad,
                               n_buckets=n_buckets, n_segments=n_segments,
                               cps=cps)
    in_specs = [
        pl.BlockSpec((1, 1), lambda qt, p, c, s: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((query_tile, d), lambda qt, p, c, s: (qt, 0)),
    ]
    for j in range(cps):
        in_specs.append(pl.BlockSpec(
            (cell_pad, d), lambda qt, p, c, s, j=j: (c[qt, cps * p + j], 0)))
    for _ in range(3):  # rowscale, sq, mask — one (1, cell_pad) slab each
        for j in range(cps):
            in_specs.append(pl.BlockSpec(
                (1, cell_pad),
                lambda qt, p, c, s, j=j: (0, c[qt, cps * p + j])))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((query_tile, cand_w), lambda qt, p, c, s: (qt, 0)),
            pl.BlockSpec((query_tile, cand_w), lambda qt, p, c, s: (qt, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((query_tile, cand_w), jnp.float32),
            pltpu.VMEM((query_tile, cand_w), jnp.int32),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((qn, cand_w), jnp.float32),
            jax.ShapeDtypeStruct((qn, cand_w), jnp.int32),
        ],
        interpret=interpret,
    )(cells, segs, qscale, qi, *([grouped_i8] * cps),
      *([cell_scales] * cps), *([grouped_sq] * cps), *([neg_mask] * cps))


@functools.partial(
    jax.jit,
    static_argnames=("cell_pad", "n_buckets", "query_tile", "n_segments",
                     "cps", "interpret"),
)
def pallas_ivf_candidates(
    queries: jax.Array,     # (Q, d); Q % query_tile == 0
    cells: jax.Array,       # (Q // query_tile, W) int32; W % cps == 0
    segs: jax.Array,        # (Q // query_tile, W) int32 segment ids
    grouped: jax.Array,     # (nlist * cell_pad, d)
    grouped_sq: jax.Array,  # (1, nlist * cell_pad) f32
    neg_mask: jax.Array,    # (1, nlist * cell_pad) f32 additive mask
    cell_pad: int,
    n_buckets: int = 128,
    query_tile: int = 8,
    n_segments: int = 1,
    cps: int = 1,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    qn, d = queries.shape
    nprobe = cells.shape[1]
    if qn % query_tile != 0:
        raise ValueError(f"queries {qn} %% query_tile {query_tile} != 0")
    if cell_pad % n_buckets != 0:
        raise ValueError("cell_pad must be a multiple of n_buckets")
    if nprobe % cps:
        raise ValueError(f"cells width {nprobe} %% cps {cps} != 0")
    cand_w = n_buckets * n_segments
    grid = (qn // query_tile, nprobe // cps)

    kernel = functools.partial(_probe_kernel, cell_pad=cell_pad,
                               n_buckets=n_buckets, n_segments=n_segments,
                               cps=cps)
    in_specs = [
        pl.BlockSpec((query_tile, d), lambda qt, p, c, s: (qt, 0)),
    ]
    # the probed cells' contiguous blocks, chosen by the prefetched ids —
    # cps blocks per grid step, each its own pipelined operand
    for j in range(cps):
        in_specs.append(pl.BlockSpec(
            (cell_pad, d), lambda qt, p, c, s, j=j: (c[qt, cps * p + j], 0)))
    for _ in range(2):  # sq, mask
        for j in range(cps):
            in_specs.append(pl.BlockSpec(
                (1, cell_pad),
                lambda qt, p, c, s, j=j: (0, c[qt, cps * p + j])))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((query_tile, cand_w), lambda qt, p, c, s: (qt, 0)),
            pl.BlockSpec((query_tile, cand_w), lambda qt, p, c, s: (qt, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((query_tile, cand_w), jnp.float32),
            pltpu.VMEM((query_tile, cand_w), jnp.int32),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((qn, cand_w), jnp.float32),
            jax.ShapeDtypeStruct((qn, cand_w), jnp.int32),
        ],
        interpret=interpret,
    )(cells, segs, queries.astype(grouped.dtype), *([grouped] * cps),
      *([grouped_sq] * cps), *([neg_mask] * cps))


@functools.partial(
    jax.jit,
    static_argnames=("w128", "n_buckets", "query_tile", "n_segments",
                     "cps", "interpret"),
)
def pallas_ivf_candidates_packed(
    queries: jax.Array,     # (Q, d); Q % query_tile == 0
    cells: jax.Array,       # (Q // query_tile, U) int32 SORTED probed cells
    off128: jax.Array,      # (nlist,) int32 per-cell start / 128
    grouped: jax.Array,     # (n_chunks * 128, d)
    grouped_sq: jax.Array,  # (1, n_chunks * 128) f32
    neg_mask: jax.Array,    # (1, n_chunks * 128) f32 additive mask
    w128: int,              # scan window in 128-row chunks
    n_buckets: int = 128,
    query_tile: int = 8,
    n_segments: int = 1,
    cps: int = 1,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Compact-prefetch packed probe (see _probe_kernel_packed). U must be
    a multiple of cps so every grid step's cps chunks exist."""
    qn, d = queries.shape
    u_n = cells.shape[1]
    if (u_n * w128) % cps:
        raise ValueError(f"U*w128 {u_n * w128} %% cps {cps} != 0")
    n_chunks = grouped.shape[0] // 128
    cand_w = n_buckets * n_segments
    grid = (qn // query_tile, u_n * w128 // cps)
    kernel = functools.partial(
        _probe_kernel_packed, n_buckets=n_buckets, n_segments=n_segments,
        cps=cps, w128=w128, n_chunks=n_chunks)
    in_specs = [
        pl.BlockSpec((query_tile, d), lambda qt, p, c, o: (qt, 0)),
    ]
    for j in range(cps):
        in_specs.append(pl.BlockSpec(
            (128, d),
            lambda qt, p, c, o, j=j: (jnp.minimum(
                o[c[qt, (p * cps + j) // w128]] + (p * cps + j) % w128,
                n_chunks - 1), 0)))
    for _ in range(2):  # sq, mask
        for j in range(cps):
            in_specs.append(pl.BlockSpec(
                (1, 128),
                lambda qt, p, c, o, j=j: (0, jnp.minimum(
                    o[c[qt, (p * cps + j) // w128]] + (p * cps + j) % w128,
                    n_chunks - 1))))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((query_tile, cand_w), lambda qt, p, c, o: (qt, 0)),
            pl.BlockSpec((query_tile, cand_w), lambda qt, p, c, o: (qt, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((query_tile, cand_w), jnp.float32),
            pltpu.VMEM((query_tile, cand_w), jnp.int32),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((qn, cand_w), jnp.float32),
            jax.ShapeDtypeStruct((qn, cand_w), jnp.int32),
        ],
        interpret=interpret,
    )(cells, off128, queries.astype(grouped.dtype), *([grouped] * cps),
      *([grouped_sq] * cps), *([neg_mask] * cps))


@functools.partial(
    jax.jit,
    static_argnames=("w128", "n_buckets", "query_tile", "n_segments",
                     "cps", "interpret"),
)
def pallas_ivf_candidates_packed_int8(
    queries: jax.Array,       # (Q, d) f32
    cells: jax.Array,         # (Q // query_tile, U) int32 sorted cells
    off128: jax.Array,        # (nlist,) int32
    grouped_i8: jax.Array,    # (n_chunks * 128, d) int8
    cell_scales: jax.Array,   # (1, n_chunks * 128) f32
    grouped_sq: jax.Array,    # (1, n_chunks * 128) f32
    neg_mask: jax.Array,      # (1, n_chunks * 128) f32
    w128: int,
    n_buckets: int = 128,
    query_tile: int = 8,
    n_segments: int = 1,
    cps: int = 1,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    from tpuvdb.kernels.quant import quantize_batch

    qn, d = queries.shape
    u_n = cells.shape[1]
    if (u_n * w128) % cps:
        raise ValueError(f"U*w128 {u_n * w128} %% cps {cps} != 0")
    n_chunks = grouped_i8.shape[0] // 128
    cand_w = n_buckets * n_segments
    qi, qscale = quantize_batch(queries)
    grid = (qn // query_tile, u_n * w128 // cps)
    kernel = functools.partial(
        _probe_kernel_packed_int8, n_buckets=n_buckets,
        n_segments=n_segments, cps=cps, w128=w128, n_chunks=n_chunks)
    in_specs = [
        pl.BlockSpec((1, 1), lambda qt, p, c, o: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((query_tile, d), lambda qt, p, c, o: (qt, 0)),
    ]
    for j in range(cps):
        in_specs.append(pl.BlockSpec(
            (128, d),
            lambda qt, p, c, o, j=j: (jnp.minimum(
                o[c[qt, (p * cps + j) // w128]] + (p * cps + j) % w128,
                n_chunks - 1), 0)))
    for _ in range(3):  # rowscale, sq, mask
        for j in range(cps):
            in_specs.append(pl.BlockSpec(
                (1, 128),
                lambda qt, p, c, o, j=j: (0, jnp.minimum(
                    o[c[qt, (p * cps + j) // w128]] + (p * cps + j) % w128,
                    n_chunks - 1))))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((query_tile, cand_w), lambda qt, p, c, o: (qt, 0)),
            pl.BlockSpec((query_tile, cand_w), lambda qt, p, c, o: (qt, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((query_tile, cand_w), jnp.float32),
            pltpu.VMEM((query_tile, cand_w), jnp.int32),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((qn, cand_w), jnp.float32),
            jax.ShapeDtypeStruct((qn, cand_w), jnp.int32),
        ],
        interpret=interpret,
    )(cells, off128, qscale, qi, *([grouped_i8] * cps),
      *([cell_scales] * cps), *([grouped_sq] * cps), *([neg_mask] * cps))


@functools.partial(
    jax.jit,
    static_argnames=("cell_pad", "k", "nprobe", "query_tile", "n_buckets",
                     "interpret", "force_compact", "cps_override",
                     "coarse_approx"),
)
def pallas_ivf_search(
    queries: jax.Array,       # (Q, d) f32
    centroids: jax.Array,     # (nlist, d) f32
    grouped: jax.Array,       # (nlist * cell_pad, d)
    grouped_sq: jax.Array,    # (N_g,) f32
    grouped_valid: jax.Array, # (N_g,) bool
    cell_pad: int,
    k: int,
    nprobe: int,
    query_tile: int = 8,
    n_buckets: int = None,  # None -> min(cell_pad, 512); small buckets
                            # collide adjacent same-cell NNs (recall loss)
    interpret: bool = False,
    spill: jax.Array = None,        # (S, d) overflow rows, always scanned
    spill_sq: jax.Array = None,     # (S,)
    spill_valid: jax.Array = None,  # (S,) bool
    cell_scales: jax.Array = None,  # (N_g,) f32 — REQUIRED for int8 cells
    spill_scales: jax.Array = None, # (S,) f32 — int8 spill dequant
    cell_offsets: jax.Array = None, # (nlist,) i32 PACKED start row per cell
    force_compact: bool = False,    # tests: take the compact-prefetch
                                    # branch below its size threshold
    cps_override: int = None,       # chunks per grid step (None -> auto);
                                    # small batches amortize per-step cost
                                    # over more parallel chunk DMAs
    coarse_approx: bool = False,    # approx_max_k for coarse cell pick:
                                    # TPU-native partial reduction instead
                                    # of a full-sort top_k over nlist
) -> Tuple[jax.Array, jax.Array]:
    """Full IVF probe: coarse centroid top-nprobe (per QUERY TILE: the tile
    probes the union of its queries' nearest cells), then the DMA kernel,
    then an exact scan of the (small) spill region. Returns
    (dist, grouped_row) — spill rows get ids >= nlist*cell_pad — with exact
    ascending squared-L2."""
    qn, d = queries.shape
    if qn == 0:
        # fail with a clear message: downstream reshapes turn an empty
        # query batch into a cryptic ZeroDivisionError during tracing
        raise ValueError("pallas_ivf_search: empty query batch")
    if n_buckets is None:
        # largest 128-multiple divisor of cell_pad up to 512 (cell_pad is
        # always a multiple of 128, so 128 always qualifies)
        n_buckets = min(cell_pad, 512)
        while cell_pad % n_buckets:
            n_buckets -= 128
    qt = min(query_tile, max(1, qn))
    pad_q = (-qn) % qt
    q = queries
    if pad_q:
        q = jnp.concatenate([q, jnp.zeros((pad_q, d), q.dtype)])

    qf = q.astype(jnp.float32)
    c_sq = jnp.sum(centroids * centroids, axis=-1)
    c_scores = 2.0 * jnp.dot(qf, centroids.T,
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGH) - c_sq[None, :]
    # per-tile union of every query's OWN top-nprobe cells. (The old
    # tile-max heuristic took only nprobe cells for the whole tile, which
    # under many small cells left most queries' best cells unprobed —
    # recall cratered to ~0.6.) The union is qt*nprobe entries with
    # duplicates; SORTING makes duplicates adjacent, and pallas skips the
    # HBM->VMEM DMA when consecutive grid steps map to the same block, so
    # shared cells cost one fetch. The bucket fold dedupes their scores.
    if coarse_approx:
        # TPU-native partial-reduction top-k (no full sort over nlist).
        # Coarse cell choice is already a heuristic — a >=0.97-recall
        # approximate pick perturbs WHICH cells are probed, not the
        # exactness of the scan; measured end recall is the arbiter.
        _, cells_pq = jax.lax.approx_max_k(
            c_scores, nprobe, recall_target=0.97)
    else:
        _, cells_pq = jax.lax.top_k(c_scores, nprobe)  # (Q, nprobe)
    cells = cells_pq.reshape(-1, qt * nprobe).astype(jnp.int32)
    cells = jnp.sort(cells, axis=1)                  # (tiles, qt*nprobe)

    neg_mask = jnp.where(grouped_valid, 0.0, NEG_INF).astype(jnp.float32)
    if cell_offsets is not None:
        # PACKED layout: cells start at 128-aligned offsets instead of a
        # fixed stride; a probed cell covers window/128 chunks of 128
        # rows. Over-scan into a neighboring cell reads valid rows scored
        # exactly, and a row seen via two probes lands in the same
        # (segment, column) slot, so the running max self-dedupes.
        # HYBRID prefetch dispatch:
        #  - EXPANDED (small probe sets): host-expand every probed cell
        #    into its chunk ids, sort, rank-derived segments — the kernel
        #    reads chunk ids straight from SMEM. Measured fastest (b1
        #    1.22 ms / b128 76 us/q at 10M x 96), but the prefetch array
        #    is tiles*qt*nprobe*w128 ints and compilation fails past ~1M
        #    entries (nprobe >= 128 at Deep10M shapes).
        #  - COMPACT (anything larger): prefetch only the per-tile cell
        #    ids + the per-cell start table and derive chunk ids inside
        #    the kernel/index_map (_probe_kernel_packed) — SMEM drops to
        #    qt*nprobe + nlist, lifting the nprobe cap entirely, at ~10%
        #    throughput cost (in-kernel chunk derivation per grid step).
        w128 = cell_pad // 128
        off128 = (cell_offsets // 128).astype(jnp.int32)
        n_buckets = 128
        n_segments = max(4, -(-2 * k // n_buckets))
        n_expanded = cells.shape[0] * cells.shape[1] * w128
        if n_expanded <= _EXPANDED_PREFETCH_MAX and not force_compact:
            chunk0 = jnp.take(off128, cells, axis=0)      # (tiles, U)
            cells = (chunk0[:, :, None]
                     + jnp.arange(w128, dtype=jnp.int32)[None, None, :]
                     ).reshape(cells.shape[0], -1)        # (tiles, U*w128)
            cells = jnp.sort(cells, axis=1)
            # segment id = rank among the tile's DISTINCT sorted chunks:
            # duplicates share a rank (self-dedup) and every segment gets
            # exactly 1/n of the distinct chunks. (`chunk % n_segments`
            # overloads segments under 128-aligned stride patterns:
            # wide-fetch recall drops 0.95 -> 0.72.)
            first = jnp.ones((cells.shape[0], 1), bool)
            distinct = jnp.concatenate(
                [first, cells[:, 1:] != cells[:, :-1]], axis=1)
            ranks = jnp.cumsum(distinct.astype(jnp.int32), axis=1) - 1
            segs = (ranks % n_segments).astype(jnp.int32)
            # 8 chunks per grid step: one wider MXU dot per step, 8x
            # fewer grid steps. Width pads with duplicates of the LAST
            # (chunk, seg) pair — dups fold into the same slots.
            cps = cps_override or (8 if cells.shape[1] >= 8 else 1)
            cps = min(cps, cells.shape[1])
            pad_w = (-cells.shape[1]) % cps
            if pad_w:
                cells = jnp.concatenate(
                    [cells, jnp.repeat(cells[:, -1:], pad_w, axis=1)],
                    axis=1)
                segs = jnp.concatenate(
                    [segs, jnp.repeat(segs[:, -1:], pad_w, axis=1)],
                    axis=1)
            if grouped.dtype == jnp.int8:
                if cell_scales is None:
                    raise ValueError("int8 cells require cell_scales")
                cand_val, cand_idx = pallas_ivf_candidates_int8(
                    q, cells, segs, grouped,
                    cell_scales.reshape(1, -1).astype(jnp.float32),
                    grouped_sq.reshape(1, -1).astype(jnp.float32),
                    neg_mask.reshape(1, -1),
                    cell_pad=128, n_buckets=n_buckets, query_tile=qt,
                    n_segments=n_segments, cps=cps, interpret=interpret,
                )
            else:
                cand_val, cand_idx = pallas_ivf_candidates(
                    q, cells, segs, grouped,
                    grouped_sq.reshape(1, -1).astype(jnp.float32),
                    neg_mask.reshape(1, -1),
                    cell_pad=128, n_buckets=n_buckets, query_tile=qt,
                    n_segments=n_segments, cps=cps, interpret=interpret,
                )
        else:
            # hash-derived segments (no expanded sort to rank against)
            # load-balance only statistically — overprovision 2x so a
            # crowded segment still holds the candidates rank-balanced
            # segments would (wide-fetch k=200 recall drops below the
            # oracle-test bound without it; measured at parity with it)
            n_segments *= 2
            cps = cps_override or (8 if cells.shape[1] * w128 >= 8 else 1)
            cps = min(cps, cells.shape[1] * w128)
            pad_u = (-cells.shape[1]) % cps
            if pad_u:
                cells = jnp.concatenate(
                    [cells, jnp.repeat(cells[:, -1:], pad_u, axis=1)],
                    axis=1)
            if grouped.dtype == jnp.int8:
                if cell_scales is None:
                    raise ValueError("int8 cells require cell_scales")
                cand_val, cand_idx = pallas_ivf_candidates_packed_int8(
                    q, cells, off128, grouped,
                    cell_scales.reshape(1, -1).astype(jnp.float32),
                    grouped_sq.reshape(1, -1).astype(jnp.float32),
                    neg_mask.reshape(1, -1),
                    w128=w128, n_buckets=n_buckets, query_tile=qt,
                    n_segments=n_segments, cps=cps, interpret=interpret,
                )
            else:
                cand_val, cand_idx = pallas_ivf_candidates_packed(
                    q, cells, off128, grouped,
                    grouped_sq.reshape(1, -1).astype(jnp.float32),
                    neg_mask.reshape(1, -1),
                    w128=w128, n_buckets=n_buckets, query_tile=qt,
                    n_segments=n_segments, cps=cps, interpret=interpret,
                )
    else:
        segs = jnp.zeros(cells.shape, jnp.int32)
        if grouped.dtype == jnp.int8:
            if cell_scales is None:
                raise ValueError("int8 cells require cell_scales")
            cand_val, cand_idx = pallas_ivf_candidates_int8(
                q, cells, segs, grouped,
                cell_scales.reshape(1, -1).astype(jnp.float32),
                grouped_sq.reshape(1, -1).astype(jnp.float32),
                neg_mask.reshape(1, -1),
                cell_pad=cell_pad, n_buckets=n_buckets, query_tile=qt,
                n_segments=1, cps=1, interpret=interpret,
            )
        else:
            cand_val, cand_idx = pallas_ivf_candidates(
                q, cells, segs, grouped,
                grouped_sq.reshape(1, -1).astype(jnp.float32),
                neg_mask.reshape(1, -1),
                cell_pad=cell_pad, n_buckets=n_buckets, query_tile=qt,
                n_segments=1, cps=1, interpret=interpret,
            )
    cand_val = cand_val[:qn]
    cand_idx = cand_idx[:qn]
    if spill is not None and spill.shape[0] > 0:
        if spill.dtype == jnp.int8:
            spill_f = spill.astype(jnp.float32) * spill_scales[:, None]
            sdots = jnp.dot(queries.astype(jnp.float32), spill_f.T,
                            preferred_element_type=jnp.float32)
        else:
            qc = queries.astype(spill.dtype)
            sprec = (jax.lax.Precision.HIGHEST
                     if spill.dtype == jnp.float32 else None)
            sdots = jnp.dot(qc, spill.T, preferred_element_type=jnp.float32,
                            precision=sprec)
        sneg = 2.0 * sdots - spill_sq[None, :]
        sneg = jnp.where(spill_valid[None, :], sneg, NEG_INF)
        sids = grouped.shape[0] + jax.lax.broadcasted_iota(
            jnp.int32, (1, spill.shape[0]), 1)
        cand_val = jnp.concatenate([cand_val, sneg], axis=1)
        cand_idx = jnp.concatenate(
            [cand_idx, jnp.broadcast_to(sids, (qn, spill.shape[0]))], axis=1)
    kk = min(k, cand_val.shape[1])
    neg, pos = jax.lax.top_k(cand_val, kk)
    idx = jnp.take_along_axis(cand_idx, pos, axis=1)
    if kk < k:
        neg = jnp.pad(neg, ((0, 0), (0, k - kk)), constant_values=NEG_INF)
        idx = jnp.pad(idx, ((0, 0), (0, k - kk)), constant_values=-1)
    q_sq = jnp.sum(jnp.square(queries.astype(jnp.float32)), axis=-1,
                   keepdims=True)
    idx = jnp.where(neg <= NEG_INF, -1, idx)
    dist = jnp.where(idx >= 0, q_sq - neg, jnp.inf)
    return dist, idx
