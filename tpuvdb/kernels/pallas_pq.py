"""Pallas IVF-PQ probe: contiguous code-chunk DMA + in-VMEM one-hot ADC.

Why the XLA ADC path is slow at capacity (measured: 45 QPS at 8M x 768,
BENCH_NOTES "IVF-PQ full-stack run"): `adc_scores_grouped` is a real MXU
GEMM, but its one-hot operand is materialized in HBM — Q*R*M*J bf16 ≈
103 GB of write+read traffic per batch-32 at nprobe 16 / cell_pad 2048 /
M=96 — plus a (Q, R, M) random-row gather for the candidate codes. The
arithmetic was never the problem; the traffic is.

This kernel keeps the one-hot in VMEM, where it costs nothing to spill:

  * candidate codes arrive by CONTIGUOUS chunk DMA (the IVF layout packs
    each cell's codes contiguously; a 128-row chunk of M=96 codes is a
    12 KB sequential read — there is no gather anywhere),
  * each chunk one-hot-expands in VMEM (128 x M*J bf16, ~6 MB at M=96,
    800 KB at the 4-bit tier) and contracts against the query tile's
    flattened LUT in one MXU dot — the one-hot never touches HBM,
  * the residual decomposition's centroid term (2 q.c) reads from a
    per-tile (query_tile, nlist) VMEM block, column-selected by a
    scalar-prefetched chunk -> owning-cell map (chunks are 128-aligned
    and cells start 128-aligned, so every chunk has exactly one owner —
    over-scanned chunks score exactly against THEIR cell, mirroring
    pallas_ivf's packed-layout semantics),
  * scores fold into the bucketed running-max candidate buffer shared
    with the int8/bf16 probe (`pallas_ivf._fold_chunk`), so segment
    rotation, dedup-by-slot, and the wide-fetch behavior are identical.

HBM traffic per batch-32 at the 8M x 768 / M=96 shape: ~12 MB of code
DMA vs ~103 GB for the XLA formulation — the 2 q.r term goes from
HBM-bound to VPU/MXU-bound (the J x one-hot flop overcount is inherent
to gather-free ADC on TPU and is ~0.3 ms of MXU time here).

Reference parity: this accelerates the same IVF-PQ serving path the
reference serves through hnswlib+LevelDB (handler.py search); the ADC +
exact-re-rank split matches FAISS IVFPQ's ADC + refine stage in role.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpuvdb.kernels.pallas_ivf import NEG_INF, _fold_chunk
from tpuvdb.kernels.pq import _maybe_unpack, _pq_lut


def _pq_probe_kernel(cells_ref, segs_ref, cellof_ref, lut_ref, qc_ref,
                     *rest, n_buckets: int, cps: int, n_codes: int,
                     m_block: int):
    """Per grid step: cps 128-row code chunks -> in-VMEM one-hot ->
    (QT, 128) ADC dots + centroid column - stored norms -> bucket fold.

    The one-hot expands in SUBSPACE BLOCKS of m_block (K-split of the ADC
    contraction, accumulated in f32): the transient per block is
    128 x m_block*J bf16 instead of 128 x M2*J — 2 MB at m_block=32/J=256
    vs 6.3 MB for the full M=96 row — which is what lets cps stay at 8
    (per-step DMA/fixed overhead amortization) at the capacity shape
    where the full-width one-hot clamped cps to 3."""
    code_refs = rest[:cps]
    bias_refs = rest[cps:2 * cps]
    val_out, idx_out, run_val, run_idx = rest[2 * cps:]
    np_probe = pl.num_programs(1)
    p = pl.program_id(1)

    @pl.when(p == 0)
    def _():
        run_val[:] = jnp.full_like(run_val, NEG_INF)
        run_idx[:] = jnp.full_like(run_idx, -1)

    qt = pl.program_id(0)
    jota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, n_codes), 2)
    dn = (((1,), (1,)), ((), ()))
    for c in range(cps):
        bytes_blk = code_refs[c][:].astype(jnp.int32)     # (128, Mb) i32
        mb = bytes_blk.shape[1]
        dots = None
        if n_codes == 16:
            # 4-bit fast-scan: neither the interleaved nibble unpack
            # ((128, Mb, 2) -> (128, 2Mb)) nor the one-hot collapse
            # ((128, Mb, 16) -> (128, 16Mb)) is a shape cast Mosaic can
            # lower — a 16-lane granule can't legally fold into the
            # 128-lane dim. Score one CODE VALUE at a time instead:
            # slab_j = (code == j) over all byte columns is a clean 2D
            # (128, Mb) compare, its LUT counterpart a static Mb-wide
            # column slab (wrapper orders the LUT [half][code][byte]),
            # and the ADC sum accumulates across 2x16 K=Mb dots. At
            # M=96: 32 MXU passes/chunk vs the 8-bit one-hot's 192.
            lo = bytes_blk & 15
            hi = bytes_blk >> 4
            for j in range(n_codes):
                part = jax.lax.dot_general(
                    lut_ref[:, j * mb:(j + 1) * mb],
                    (lo == j).astype(jnp.bfloat16), dn,
                    preferred_element_type=jnp.float32)   # (QT, 128)
                part = part + jax.lax.dot_general(
                    lut_ref[:, (n_codes + j) * mb:(n_codes + j + 1) * mb],
                    (hi == j).astype(jnp.bfloat16), dn,
                    preferred_element_type=jnp.float32)
                dots = part if dots is None else dots + part
        else:
            for m0 in range(0, mb, m_block):
                m1 = min(m0 + m_block, mb)
                # lax.slice_in_dim + expand_dims, NOT codes[:, m0:m1, None]:
                # this jax build routes a sub-range slice combined with a
                # newaxis through rewriting_take's gather fallback, and
                # Mosaic's _gather_lowering_rule rejects it ("Shape mismatch
                # in input, indices and output") — which killed the first
                # 16M x 768 full-stack run at served-search time
                blk = jax.lax.slice_in_dim(bytes_blk, m0, m1, axis=1)
                onehot = (jnp.expand_dims(blk, 2) == jota
                          ).astype(jnp.bfloat16)
                part = jax.lax.dot_general(
                    lut_ref[:, m0 * n_codes : m1 * n_codes],
                    onehot.reshape(bytes_blk.shape[0], -1), dn,
                    preferred_element_type=jnp.float32)   # (QT, 128)
                dots = part if dots is None else dots + part  # = 2 q.r
        cell = cellof_ref[qt, cps * p + c]
        # single-column read via lane mask: Mosaic can't prove a dynamic
        # lane index is 128-aligned, so dynamic-slice on dim 1 won't
        # compile — a full-block select+reduce is a ~64K-op VPU blip next
        # to the 25M-MAC ADC dot below
        lanes = jax.lax.broadcasted_iota(jnp.int32, qc_ref.shape, 1)
        qc_col = jnp.sum(jnp.where(lanes == cell, qc_ref[:], 0.0),
                         axis=1, keepdims=True)           # (QT, 1) = 2 q.c
        # bias = -||c+r_hat||^2 with NEG_INF on invalid slots (one DMA,
        # precomputed host-side: sq and the validity mask always appeared
        # as `- sq + mask`)
        scores = dots + qc_col + bias_refs[c][:]
        _fold_chunk(scores, cells_ref[qt, cps * p + c],
                    segs_ref[qt, cps * p + c], run_val, run_idx,
                    bytes_blk.shape[0], n_buckets)

    @pl.when(p == np_probe - 1)
    def _():
        val_out[:] = run_val[:]
        idx_out[:] = run_idx[:]


@functools.partial(
    jax.jit,
    static_argnames=("k", "nprobe", "cell_pad", "query_tile", "cps",
                     "coarse_approx", "interpret"),
)
def pallas_pq_search(
    queries: jax.Array,        # (Q, d) f32
    centroids: jax.Array,      # (nlist, d) f32
    grouped_codes: jax.Array,  # (N_g, Mb) uint8 packed PQ codes
    codebooks: jax.Array,      # (M2, J, dsub) f32
    grouped_sq: jax.Array,     # (N_g,) f32 = ||c + r_hat||^2
    grouped_valid: jax.Array,  # (N_g,) bool
    spill_codes: jax.Array,    # (S, Mb) uint8
    spill_cells: jax.Array,    # (S,) i32 owning cell per spill row
    spill_sq: jax.Array,       # (S,) f32
    spill_valid: jax.Array,    # (S,) bool
    cell_offsets: jax.Array,   # (nlist,) i32 packed 128-aligned starts
    cell_pad: int,             # scan WINDOW (rows), multiple of 128
    k: int,
    nprobe: int,
    rotation: Optional[jax.Array] = None,
    query_tile: int = 8,
    cps: int = 8,
    coarse_approx: bool = True,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Full IVF-PQ probe. Returns (dist, grouped_row) with spill rows at
    ids >= N_g, exact ascending RECONSTRUCTED squared-L2 (the engine's
    exact re-rank from the mirrors restores true-distance order)."""
    qn, d = queries.shape
    if qn == 0:
        raise ValueError("pallas_pq_search: empty query batch")
    n_g = grouped_codes.shape[0]
    nlist = centroids.shape[0]
    m2, n_codes = codebooks.shape[0], codebooks.shape[1]
    mb = grouped_codes.shape[1]              # stored BYTES per row
    spb = 2 if n_codes == 16 else 1          # subspaces per byte
    # VMEM budget: the K-split one-hot transient is 128 x m_block*J bf16
    # per in-flight block (x2 nibble halves at the 4-bit tier); clamp
    # the BYTE block so cps (per-step overhead amortization) never has
    # to shrink — the pre-split kernel clamped cps to 3 at M=96/J=256,
    # tripling per-chunk fixed cost at exactly the capacity shape the
    # kernel exists for. m_block is in BYTE columns of the code array.
    m_block = max(1, min(mb, (2 << 20) // (128 * n_codes * 2 * spb)))
    onehot_bytes = 128 * m_block * n_codes * 2 * spb
    cps = max(1, min(cps, (24 << 20) // onehot_bytes))
    qt_n = min(query_tile, max(1, qn))
    pad_q = (-qn) % qt_n
    qf = queries.astype(jnp.float32)
    if pad_q:
        qf = jnp.concatenate([qf, jnp.zeros((pad_q, d), jnp.float32)])
    qp = qf.shape[0]

    # coarse quantizer + the centroid term the kernel reads per chunk.
    # Precision HIGH (bf16x3, ~f32-accurate at 3 MXU passes), not
    # HIGHEST (6 passes): measured 4.3 ms of a ~10 ms probe at the
    # 8M x 768 / nlist 5682 shape was this one GEMM, and the qc2 term
    # both picks cells AND feeds the ADC distance, so plain bf16
    # (DEFAULT) would cost real distance precision where HIGH does not.
    c_sq = jnp.sum(centroids * centroids, axis=-1)
    qc2 = 2.0 * jnp.dot(qf, centroids.T,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGH)  # (Qp, nlist)
    if coarse_approx and jax.default_backend() == "tpu":
        # TPU PartialReduce instead of a full sort over nlist: measured
        # 4.0 ms of a ~10 ms b32 probe at nlist 5682 was the coarse
        # top_k (the GEMM itself is ~0.4 ms at HIGH). Cell choice is a
        # heuristic; a recall_target=0.97 approximate pick perturbs
        # WHICH cells are probed — end recall is certified by the
        # capacity run's sweep (same contract as pallas_ivf's lever).
        _, cells_pq = jax.lax.approx_max_k(
            qc2 - c_sq[None, :], min(nprobe, nlist), recall_target=0.97)
    else:
        _, cells_pq = jax.lax.top_k(qc2 - c_sq[None, :], min(nprobe, nlist))

    # packed-layout chunk expansion + rank segments (pallas_ivf semantics:
    # sorted duplicates share a DMA and a fold slot; over-scan is exact)
    w128 = cell_pad // 128
    off128 = (cell_offsets // 128).astype(jnp.int32)
    cells = cells_pq.reshape(-1, qt_n * cells_pq.shape[1]).astype(jnp.int32)
    chunk0 = jnp.take(off128, cells, axis=0)
    cells = (chunk0[:, :, None]
             + jnp.arange(w128, dtype=jnp.int32)[None, None, :]
             ).reshape(cells.shape[0], -1)                # (tiles, U*w128)
    n_chunks_total = n_g // 128
    cells = jnp.minimum(cells, n_chunks_total - 1)
    cells = jnp.sort(cells, axis=1)
    n_buckets = 128
    n_segments = max(4, -(-2 * k // n_buckets))
    first = jnp.ones((cells.shape[0], 1), bool)
    distinct = jnp.concatenate([first, cells[:, 1:] != cells[:, :-1]], 1)
    ranks = jnp.cumsum(distinct.astype(jnp.int32), axis=1) - 1
    segs = (ranks % n_segments).astype(jnp.int32)
    pad_w = (-cells.shape[1]) % cps
    if pad_w:  # dup of the last (chunk, seg): folds into the same slots
        cells = jnp.concatenate([cells, jnp.tile(cells[:, -1:], (1, pad_w))],
                                axis=1)
        segs = jnp.concatenate([segs, jnp.tile(segs[:, -1:], (1, pad_w))],
                               axis=1)
    # chunk -> owning cell (starts ascending + 128-aligned => unique owner)
    cellof = (jnp.searchsorted(off128, cells, side="right") - 1
              ).astype(jnp.int32)

    lut = _pq_lut(qf, codebooks, rotation)                # (Qp, M2, J)
    lut_flat = lut.reshape(qp, m2 * n_codes).astype(jnp.bfloat16)
    if n_codes == 16:
        # kernel LUT layout for the 4-bit tier: [lo half | hi half],
        # each half ordered [code value j][byte column b] — the slab the
        # kernel's per-code-value dot reads, so packed bytes score with
        # 2x16 clean 2D compares and no Mosaic-hostile reshape anywhere
        # (subspace 2b is byte b's LOW nibble — pack_nibbles_np layout)
        lut_kernel = jnp.concatenate(
            [jnp.swapaxes(lut[:, 0::2, :], 1, 2).reshape(qp, -1),
             jnp.swapaxes(lut[:, 1::2, :], 1, 2).reshape(qp, -1)],
            axis=1).astype(jnp.bfloat16)
    else:
        lut_kernel = lut_flat
    nlistp = -(-nlist // 128) * 128
    qc2p = (qc2 if nlistp == nlist else
            jnp.pad(qc2, ((0, 0), (0, nlistp - nlist))))
    # -||c+r_hat||^2 with NEG_INF on invalid slots: sq and mask only ever
    # appeared as `- sq + mask`, so one fused bias row halves the tiny
    # per-chunk (1, 128) DMAs
    bias = jnp.where(grouped_valid, -grouped_sq.astype(jnp.float32),
                     NEG_INF).reshape(1, n_g)

    cand_w = n_buckets * n_segments
    grid = (qp // qt_n, cells.shape[1] // cps)
    kernel = functools.partial(_pq_probe_kernel, n_buckets=n_buckets,
                               cps=cps, n_codes=n_codes, m_block=m_block)
    byte_w = grouped_codes.shape[1]
    in_specs = [
        pl.BlockSpec((qt_n, m2 * n_codes), lambda qt, p, c, s, o: (qt, 0)),
        pl.BlockSpec((qt_n, nlistp), lambda qt, p, c, s, o: (qt, 0)),
    ]
    for j in range(cps):
        in_specs.append(pl.BlockSpec(
            (128, byte_w), lambda qt, p, c, s, o, j=j: (c[qt, cps * p + j], 0)))
    for j in range(cps):  # fused bias — (1, 128) slab per chunk
        in_specs.append(pl.BlockSpec(
            (1, 128), lambda qt, p, c, s, o, j=j: (0, c[qt, cps * p + j])))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((qt_n, cand_w), lambda qt, p, c, s, o: (qt, 0)),
            pl.BlockSpec((qt_n, cand_w), lambda qt, p, c, s, o: (qt, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((qt_n, cand_w), jnp.float32),
            pltpu.VMEM((qt_n, cand_w), jnp.int32),
        ],
    )
    vals, gids = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((qp, cand_w), jnp.float32),
            jax.ShapeDtypeStruct((qp, cand_w), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 << 20),
        interpret=interpret,
    )(cells, segs, cellof, lut_kernel, qc2p,
      *([grouped_codes] * cps), *([bias] * cps))

    # spill region: small, dense, gather-free one-hot GEMM in plain XLA
    # (identical formulation to index.ivf._ivf_search_pq's spill block)
    s_n = spill_codes.shape[0]
    sc = _maybe_unpack(spill_codes, n_codes)              # (S, M2)
    sj = jnp.arange(n_codes, dtype=jnp.int32)
    s_onehot = (sc[:, :, None] == sj).astype(jnp.bfloat16)
    sdots = jax.lax.dot_general(
        lut_flat, s_onehot.reshape(s_n, m2 * n_codes),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    qc_spill = jnp.take(qc2, jnp.clip(spill_cells, 0, nlist - 1), axis=1)
    sneg = jnp.where(spill_valid[None, :],
                     qc_spill + sdots - spill_sq[None, :], NEG_INF)
    spill_ids = n_g + jax.lax.broadcasted_iota(jnp.int32, (1, s_n), 1)

    all_neg = jnp.concatenate(
        [vals, jnp.broadcast_to(sneg, (qp, s_n))], axis=1)
    all_ids = jnp.concatenate(
        [gids, jnp.broadcast_to(spill_ids, (qp, s_n))], axis=1)
    kk = min(k, all_neg.shape[1])
    top_neg, pos = jax.lax.top_k(all_neg, kk)
    top_ids = jnp.take_along_axis(all_ids, pos.astype(jnp.int32), axis=1)
    if kk < k:
        top_neg = jnp.pad(top_neg, ((0, 0), (0, k - kk)),
                          constant_values=NEG_INF)
        top_ids = jnp.pad(top_ids, ((0, 0), (0, k - kk)),
                          constant_values=-1)
    q_sq = jnp.sum(qf * qf, axis=-1, keepdims=True)
    top_ids = jnp.where(top_neg <= NEG_INF / 2, -1, top_ids)
    dist = jnp.where(top_ids >= 0, q_sq - top_neg, jnp.inf)
    return dist[:qn], top_ids[:qn]
