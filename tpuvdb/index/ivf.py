"""IVF-Flat index: k-means coarse quantizer + cluster-pruned scan.

Role parity: the reference's per-node hnswlib HNSW graph
(src/datanode/handler.py:75-89) provides sublinear ANN. Graph traversal is
TPU-hostile (pointer chasing, data-dependent branching), so the TPU-native
sublinear structure is IVF: vectors grouped into nlist centroid cells laid
out CONTIGUOUSLY in HBM, queries scored against centroids first (one small
GEMM), then scanned only against the nprobe nearest cells.

Layout: cell i owns rows [i*P, (i+1)*P) of the grouped arrays, where P is
the padded cell capacity (a lane-aligned multiple of 128). Each grouped row
remembers its original physical row id, so results map straight back to the
engine's (shard, slot) space. Rows that overflow a cell land in a spill
region that is always scanned (exact, small).

When to use which (measured on v5e):
  * throughput serving (large query batches): the flat approx_max_k scan is
    already HBM-bound and hits ~680k QPS/chip on 1M x 128 — IVF can't beat
    the memory floor when the batch's probed cells cover the corpus.
  * latency serving (batch <= ~16): IVF reads nprobe*P rows instead of N —
    a (nlist/nprobe)x reduction in HBM traffic per query.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpuvdb.kernels.kmeans import kmeans


@functools.partial(jax.jit, static_argnames=("w",))
def _shrink_results(dist, gid, w: int):
    """Fetch-shrink epilogue: slice the pow2-padded top-k to the width the
    caller will consume and downcast dists to bf16 for the wire (the host
    exact re-rank restores precision). One tiny program per (shape, w)
    pair — w is 128-rounded by callers so staged-delete churn doesn't
    recompile it."""
    return gid[:, :w].astype(jnp.int32), dist[:, :w].astype(jnp.bfloat16)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@jax.jit
def _dequant_dev(codes_i8: jax.Array, scales: jax.Array) -> jax.Array:
    """Device-side int8 row dequantization (see iter_blocks_dev)."""
    return codes_i8.astype(jnp.float32) * scales[:, None]


# --- device-resident PQ code table -------------------------------------
# The assign+encode pass produces PQ codes ON DEVICE; they used to come
# back to host for cell packing and get re-uploaded. Through the axon
# relay that fetch runs at ~1 MB/s against a 78 MB/s upload — at 8M x 768
# / M=96 the 768 MB code fetch alone was ~770 s of the measured 778 s
# restart (BENCH_NOTES "IVF-PQ full-stack run"). These helpers keep the
# codes device-resident end to end: blocks write into a donated code
# table, the bisection re-encode scatters into it, and packing becomes a
# device gather driven by a host-computed permutation (the only arrays
# that ever cross device->host are the per-block int16 assignments and
# the handful of spill rows).

@functools.partial(jax.jit, donate_argnums=(0, 1))
def _codes_update_dev(codes_all, rsq_all, part_codes, part_rsq, g0):
    """Donated block write of freshly encoded codes into the table."""
    return (jax.lax.dynamic_update_slice(codes_all, part_codes, (g0, 0)),
            jax.lax.dynamic_update_slice(rsq_all, part_rsq, (g0,)))


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _codes_scatter_dev(codes_all, rsq_all, idx, part_codes, part_rsq):
    """Donated row scatter (bisection re-encode); idx=-1 pads drop."""
    return (codes_all.at[idx].set(part_codes, mode="drop"),
            rsq_all.at[idx].set(part_rsq, mode="drop"))


@jax.jit
def _pack_gather_dev(codes_all, rsq_all, perm, gval):
    """Device-side cell packing: grouped[i] = codes[perm[i]], with the
    reconstruction norms zeroed on pad slots (their validity mask already
    excludes them from scoring)."""
    g = jnp.take(codes_all, perm, axis=0)
    sq = jnp.where(gval, jnp.take(rsq_all, perm, axis=0), 0.0)
    return g, sq


_DELETE_BUCKET = 1024


@functools.partial(jax.jit, static_argnames=("value",))
def _scatter_flag(valid, idx, value: bool):
    """Set idx slots to value; out-of-range pad indices drop. Fixed bucket
    size -> one compile per array shape (exact.py:199-213 pattern).

    NOT donated: the validity mask is ~1 byte/row (in-place saves nothing)
    and the delete path runs under the engine lock while off-lock searches
    may still hold the old snapshot — donating here invalidated their
    buffers and burned search retries under sustained delete churn."""
    return valid.at[idx].set(value, mode="drop")


_APPEND_BUCKET = 4096
# fixed row-block for the append-path assignment GEMM: append_rows chunks
# its batch to this shape so warm_append's single precompile covers every
# serving batch size
_ASSIGN_CHUNK = 16384


@jax.jit
def _and_masks(valid, mask):
    """Validity AND filter, on device: the filtered-search pushdown folds
    a candidate mask (1 byte/row upload, same as the flat path's
    _filtered_search_device) into the scan's validity operand — the
    search programs are shape-cached, so no recompile per filter."""
    return valid & mask


@functools.partial(jax.jit, donate_argnums=(0,))
def _scatter_rows(arr, idx, vals):
    """Write vals (rows or scalars) at idx (out-of-range pad indices
    drop). Donated so the multi-GB grouped buffer is updated in place,
    not copied; jit specializes per shape/dtype, so one definition
    serves every payload."""
    return arr.at[idx].set(vals, mode="drop")


def commit_append_region(vec_arr, sq_arr, val_arr, scale_arr,
                         row_ids_flat: np.ndarray, pos: np.ndarray,
                         phys: np.ndarray, vecs: np.ndarray, sq: np.ndarray,
                         qvecs, qscales):
    """Shared append commit for one region (grouped or spill), on FLAT
    device views: record phys ids in row_ids_flat (mutated in place) and
    scatter payload rows + exact norms + validity (+ dequant scales when
    quantized) at pos. Used by both IVFIndex and the mesh-sharded index
    so fixes to the commit semantics cannot drift apart."""
    row_ids_flat[pos] = phys
    quantized = qvecs is not None
    payload = qvecs if quantized else vecs
    vec_arr = IVFIndex._scatter_payload(vec_arr, pos, payload, vec_arr.dtype)
    sq_arr = IVFIndex._scatter_payload(sq_arr, pos, sq, jnp.float32)
    val_arr = IVFIndex._scatter_flags(val_arr, pos)
    if quantized:
        scale_arr = IVFIndex._scatter_payload(scale_arr, pos, qscales,
                                              jnp.float32)
    return vec_arr, sq_arr, val_arr, scale_arr


class ArrayRowSource:
    """Row access over a materialized (n, d) f32 array — the classic
    IVFIndex.build input, adapted to the streaming build contract."""

    def __init__(self, vectors: np.ndarray):
        self.v = np.asarray(vectors)
        self.n, self.dim = self.v.shape
        self.all_int8 = False

    def gather_f32(self, phys_rows: np.ndarray) -> np.ndarray:
        return np.asarray(self.v[phys_rows], np.float32)

    def gather_raw(self, phys_rows):
        raise RuntimeError("ArrayRowSource has no raw int8 rows")

    def iter_blocks_f32(self, block_rows: int):
        for lo in range(0, self.n, block_rows):
            blk = np.asarray(self.v[lo : lo + block_rows], np.float32)
            yield lo, blk

    def iter_blocks_dev(self, block_rows: int, pad_to: int):
        for lo, blk in self.iter_blocks_f32(block_rows):
            m = blk.shape[0]
            rows = _round_up(max(m, 1), pad_to)
            fp = np.zeros((rows, self.dim), np.float32)
            fp[:m] = blk
            yield lo, m, jnp.asarray(fp)


class MirrorRowSource:
    """Row access over stacked shard mirrors WITHOUT materializing the
    corpus (VERDICT r2 missing #1, IVF half): `layout.stack()` builds a
    full f32 copy — 24.5 GB host AND 24.5 GB device for the assignment
    pass at 8M x 768, both over budget. This streams assignment blocks
    and gathers k-means samples / cell members / packed rows on demand;
    int8 mirrors hand their codes over bit-exact (gather_raw), so the
    packed cells carry the mirrors' original quantization."""

    def __init__(self, mirrors, layout):
        self.mirrors = mirrors
        self.layout = layout
        self.n = layout.total_rows
        self.dim = layout.dim
        self.all_int8 = all(m.quantized for m in mirrors)

    def valid_array(self) -> np.ndarray:
        v = np.zeros(self.n, bool)
        for s, m in enumerate(self.mirrors):
            r0 = s * self.layout.phys_cap
            n = m.next_slot
            if n:
                v[r0 : r0 + n] = m.valid[:n]
        return v

    def _split(self, phys_rows: np.ndarray):
        phys = np.asarray(phys_rows, np.int64)
        return phys // self.layout.phys_cap, phys % self.layout.phys_cap

    def gather_f32(self, phys_rows: np.ndarray) -> np.ndarray:
        shards, slots = self._split(phys_rows)
        out = np.empty((len(shards), self.dim), np.float32)
        for sh in np.unique(shards):
            sel = shards == sh
            out[sel] = self.mirrors[sh].rows_f32(slots[sel])
        return out

    def gather_raw(self, phys_rows: np.ndarray):
        """(codes int8, scales, sq) — only valid when all_int8."""
        shards, slots = self._split(phys_rows)
        codes = np.empty((len(shards), self.dim), np.int8)
        scales = np.empty(len(shards), np.float32)
        sq = np.empty(len(shards), np.float32)
        for sh in np.unique(shards):
            sel = shards == sh
            c, sc, q = self.mirrors[sh].rows_raw(slots[sel])
            codes[sel] = c
            scales[sel] = sc
            sq[sel] = q
        return codes, scales, sq

    def iter_blocks_f32(self, block_rows: int):
        for g0, raw, scales, sq, valid in self.layout.iter_blocks(
                self.mirrors, block_rows):
            if raw.dtype == np.int8:
                blk = raw.astype(np.float32) * scales[:, None]
            else:
                blk = np.asarray(raw, np.float32)
            yield g0, blk

    def iter_blocks_dev(self, block_rows: int, pad_to: int):
        """(g0, m, device f32 block) — int8 mirrors upload their raw codes
        + scales (1 byte/dim) and dequantize ON DEVICE: the assignment/
        encode pass over an 8M x 768 corpus moves 6 GB through the relay
        instead of 24.6 GB of host-dequantized f32 (uploads dominate the
        build wall-clock through the relay)."""
        for g0, raw, scales, sq, valid in self.layout.iter_blocks(
                self.mirrors, block_rows):
            m = raw.shape[0]
            rows = _round_up(max(m, 1), pad_to)
            if raw.dtype == np.int8:
                rp = np.zeros((rows, raw.shape[1]), np.int8)
                rp[:m] = raw
                sp = np.zeros(rows, np.float32)
                sp[:m] = scales
                yield g0, m, _dequant_dev(jnp.asarray(rp), jnp.asarray(sp))
            else:
                fp = np.zeros((rows, raw.shape[1]), np.float32)
                fp[:m] = raw
                yield g0, m, jnp.asarray(fp)


def _as_gather(vectors):
    """Accept either a materialized (n, d) array or a gather callable
    (rows -> f32 rows) — shared by the split/bisect helpers so both the
    classic and the streaming build paths reuse them."""
    if callable(vectors):
        return vectors
    return lambda rows: np.asarray(vectors[rows], np.float32)


def split_oversized_cells(
    vectors,                  # (N, d) array OR gather callable rows -> f32
    assign: np.ndarray,       # (N,) cell id, -1 = dead
    centroids: np.ndarray,    # (nlist, d)
    max_cell: int,
    seed: int = 0,
    max_rounds: int = 12,
) -> Tuple[np.ndarray, np.ndarray]:
    """Recursively 2-means-bisect every cell with more members than
    max_cell (children are REAL centroids, so coarse probing finds them
    naturally). Bounds the packed scan window: after this, (almost) no
    cell exceeds max_cell rows; rare residuals spill. Returns
    (centroids, assign) with nlist grown.

    The bisection runs in HOST numpy deliberately: each oversized cell
    has a distinct member count, so a device k-means here would trigger
    one fresh XLA compile per cell (minutes to hours at 1M-row scale
    with zipf skew, measured through the remote-compile relay). The
    2-means problems are tiny (m x d x 4 iters); numpy does each in
    milliseconds with zero compiles."""
    rng = np.random.default_rng(seed)
    gather = _as_gather(vectors)
    cents = list(np.asarray(centroids, np.float32))
    assign = np.asarray(assign).copy()
    for _ in range(max_rounds):
        sizes = np.bincount(assign[assign >= 0], minlength=len(cents))
        oversized = np.flatnonzero(sizes > max_cell)
        if len(oversized) == 0:
            break
        for c in oversized:
            members = np.flatnonzero(assign == c)
            x = gather(members)  # one gather per cell; sliced below
            sub_a = _bisect_2means(x, rng)
            if (sub_a == 0).all() or (sub_a == 1).all():
                # degenerate (duplicate points): force an even split
                sub_a = (np.arange(len(members)) % 2).astype(sub_a.dtype)
            half0 = x[sub_a == 0]
            half1 = x[sub_a == 1]
            cents[c] = half0.mean(axis=0).astype(np.float32)
            base = len(cents)
            cents.append(half1.mean(axis=0).astype(np.float32))
            assign[members[sub_a == 1]] = base
    return np.asarray(cents, np.float32), assign


def _bisect_2means(x: np.ndarray, rng: np.random.Generator,
                   iters: int = 4, sample: int = 16384) -> np.ndarray:
    """2-means labels for one cell, pure numpy. Trains on a subsample for
    very large cells, then assigns everyone — same structure as the main
    trainer (train on sample, assign all)."""
    m = len(x)
    xs = x[rng.choice(m, size=sample, replace=False)] if m > sample else x
    # k-means++ style init: a random point + the farthest point from it
    c0 = xs[rng.integers(len(xs))]
    d0 = np.einsum("nd,nd->n", xs - c0, xs - c0)
    c1 = xs[int(np.argmax(d0))]
    cents = np.stack([c0, c1])
    for _ in range(iters):
        d = (np.einsum("nd,nd->n", xs, xs)[:, None]
             - 2.0 * (xs @ cents.T)
             + np.einsum("kd,kd->k", cents, cents)[None, :])
        lab = np.argmin(d, axis=1)
        for j in (0, 1):
            sel = xs[lab == j]
            if len(sel):
                cents[j] = sel.mean(axis=0)
    d = (np.einsum("nd,nd->n", x, x)[:, None]
         - 2.0 * (x @ cents.T)
         + np.einsum("kd,kd->k", cents, cents)[None, :])
    return np.argmin(d, axis=1)


def pack_cells(
    vectors: np.ndarray,
    rows: np.ndarray,        # physical row id per live vector position
    assign_live: np.ndarray, # cell id per live vector position
    nlist: int,
    window: int,             # scan window (rows), multiple of 128
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray, list]:
    """Lay cells out CONTIGUOUSLY at 128-row alignment (no per-cell padding
    to a common stride — that is what cratered fill to ~0.4 under skew).
    Probes scan [offset[c], offset[c]+window); over-scan into following
    cells yields valid rows scored exactly, so correctness is unaffected.
    Rows beyond window in a cell (post-split residuals) spill.
    Returns (gvec, gval, grow, offsets, sizes, spill_rows)."""
    d = vectors.shape[1]
    order = np.argsort(assign_live, kind="stable")
    rows_sorted = rows[order]
    cells_sorted = assign_live[order]
    starts = np.searchsorted(cells_sorted, np.arange(nlist))
    counts = np.bincount(cells_sorted, minlength=nlist)
    kept = np.minimum(counts, window)
    offsets = np.zeros(nlist, np.int64)
    np.cumsum(_round_up_arr(kept, 128)[:-1], out=offsets[1:])
    total = int(offsets[-1] + _round_up(int(kept[-1]), 128)) if nlist else 0
    # + one full window of invalid tail rows so the last cells' scan
    # windows (and index clipping) never alias a real row
    grouped_rows = _round_up(total + window, 128)
    gvec = np.zeros((grouped_rows, d), np.float32)
    gval = np.zeros(grouped_rows, bool)
    grow = np.full(grouped_rows, -1, np.int64)
    pos_in_cell = np.arange(len(rows_sorted)) - starts[cells_sorted]
    main = pos_in_cell < window
    gpos = offsets[cells_sorted[main]] + pos_in_cell[main]
    gvec[gpos] = vectors[rows_sorted[main]]
    gval[gpos] = True
    grow[gpos] = rows_sorted[main]
    spill_rows = list(rows_sorted[~main])
    return gvec, gval, grow, offsets.astype(np.int32), kept, spill_rows


def _encode_rows_dev(source, rows, assign_rows, cents_j, cb_j, rot_j,
                     chunk: int = 262_144):
    """Residual-encode specific physical rows; returns DEVICE
    (codes (m, Mb) u8, recon_sq (m,) f32) — nothing fetched to host.
    int8 sources upload raw codes + scales (1 byte/dim) and dequantize on
    device, mirroring iter_blocks_dev's transfer discipline."""
    from tpuvdb.kernels.pq import _encode_residual_scan

    parts_c, parts_r = [], []
    d = source.dim
    raw_ok = getattr(source, "all_int8", False)
    for lo in range(0, len(rows), chunk):
        r = rows[lo : lo + chunk]
        m = len(r)
        rows_pad = _round_up(max(m, 1), 65536)
        if raw_ok:
            raw, scales, _ = source.gather_raw(r)
            rp = np.zeros((rows_pad, d), np.int8)
            rp[:m] = raw
            sp = np.zeros(rows_pad, np.float32)
            sp[:m] = scales
            dev = _dequant_dev(jnp.asarray(rp), jnp.asarray(sp))
        else:
            fp = np.zeros((rows_pad, d), np.float32)
            fp[:m] = source.gather_f32(r)
            dev = jnp.asarray(fp)
        ap = np.zeros(rows_pad, np.int32)
        ap[:m] = assign_rows[lo : lo + chunk]
        c, q = _encode_residual_scan(dev, jnp.asarray(ap), cents_j, cb_j,
                                     block=16384, rotation=rot_j)
        parts_c.append(c[:m])
        parts_r.append(q[:m])
    return jnp.concatenate(parts_c), jnp.concatenate(parts_r)


def _fill_rows_from_source(source, phys_rows, vec_out, scale_out, sq_out,
                           positions, int8_out: bool, chunk: int = 1_000_000,
                           pq_codebooks=None, pq_precomputed=None):
    """Copy `phys_rows` from the source into vec/scale/sq at `positions`,
    chunked so the f32 transient stays bounded. int8 output takes the
    bit-exact raw path when the source stores int8; otherwise it gathers
    f32 and quantizes per chunk. sq is always the norm the scanner's
    correction term expects: the f32 row's, or — for PQ cells — the
    RECONSTRUCTION's (ADC ranks against x_hat)."""
    from tpuvdb.kernels.quant import quantize_rows_np

    if pq_precomputed is not None:  # codes from the fused assign+encode pass
        codes_all, rsq_all = pq_precomputed
        if isinstance(codes_all, jax.Array):
            # device-resident code table (spill fill): gather the few
            # spill rows on device, fetch only that sliver (~KBs)
            sel = jnp.asarray(np.asarray(phys_rows, np.int64).clip(min=0)
                              .astype(np.int32))
            vec_out[positions] = np.asarray(jnp.take(codes_all, sel, axis=0))
            sq_out[positions] = np.asarray(jnp.take(rsq_all, sel, axis=0))
        else:
            vec_out[positions] = codes_all[phys_rows]
            sq_out[positions] = rsq_all[phys_rows]
        return
    if pq_codebooks is not None:
        # PQ cells are RESIDUAL-coded (tied to each row's cell centroid):
        # filling them requires the precomputed (codes, recon_sq) from the
        # assign+encode pass — a cell-blind re-encode here would silently
        # corrupt distances
        raise ValueError("PQ fill requires pq_precomputed codes")

    raw_ok = int8_out and getattr(source, "all_int8", False)
    for lo in range(0, len(phys_rows), chunk):
        r = phys_rows[lo : lo + chunk]
        p = positions[lo : lo + chunk]
        if raw_ok:
            codes, scales, sq = source.gather_raw(r)
            vec_out[p] = codes
            scale_out[p] = scales
            sq_out[p] = sq
        else:
            f = source.gather_f32(r)
            sq_out[p] = np.einsum("nd,nd->n", f, f)
            if int8_out:
                q, s = quantize_rows_np(f)
                vec_out[p] = q
                scale_out[p] = s
            else:
                vec_out[p] = f


def _pack_cells_from_source(source, rows, assign_live, nlist, window,
                            int8_out: bool, pq_codebooks=None,
                            pq_precomputed=None):
    """pack_cells over a row source: same contiguous 128-aligned layout,
    but rows copy straight into the TARGET dtype (int8 cells pack in
    ~1 byte/dim host memory instead of materializing the f32 corpus;
    PQ cells in M bytes/row). Returns (gvec, gscales|None, gsq, gval,
    grow, offsets, sizes, spill_rows)."""
    d = source.dim
    if pq_codebooks is not None:
        from tpuvdb.kernels.pq import pq_code_bytes

        width, cell_dtype = pq_code_bytes(pq_codebooks), np.uint8
    else:
        width, cell_dtype = d, (np.int8 if int8_out else np.float32)
    order = np.argsort(assign_live, kind="stable")
    rows_sorted = rows[order]
    cells_sorted = assign_live[order]
    starts = np.searchsorted(cells_sorted, np.arange(nlist))
    counts = np.bincount(cells_sorted, minlength=nlist)
    kept = np.minimum(counts, window)
    offsets = np.zeros(nlist, np.int64)
    np.cumsum(_round_up_arr(kept, 128)[:-1], out=offsets[1:])
    total = int(offsets[-1] + _round_up(int(kept[-1]), 128)) if nlist else 0
    # + one full window of invalid tail rows so the last cells' scan
    # windows (and index clipping) never alias a real row
    grouped_rows = _round_up(total + window, 128)
    gscales = np.ones(grouped_rows, np.float32) if int8_out else None
    gval = np.zeros(grouped_rows, bool)
    grow = np.full(grouped_rows, -1, np.int64)
    pos_in_cell = np.arange(len(rows_sorted)) - starts[cells_sorted]
    main = pos_in_cell < window
    gpos = offsets[cells_sorted[main]] + pos_in_cell[main]
    gval[gpos] = True
    grow[gpos] = rows_sorted[main]
    if (pq_precomputed is not None
            and isinstance(pq_precomputed[0], jax.Array)):
        # device-resident codes: packing = one device gather driven by a
        # host permutation (44 MB up at 8M rows vs a 768 MB fetch down —
        # see the device-code-table comment at the top of this module)
        perm = np.zeros(grouped_rows, np.int32)
        perm[gpos] = rows_sorted[main].astype(np.int32)
        gvec, gsq = _pack_gather_dev(
            pq_precomputed[0], pq_precomputed[1],
            jnp.asarray(perm), jnp.asarray(gval))
    else:
        gvec = np.zeros((grouped_rows, width), cell_dtype)
        gsq = np.zeros(grouped_rows, np.float32)
        _fill_rows_from_source(source, rows_sorted[main], gvec, gscales,
                               gsq, gpos, int8_out,
                               pq_codebooks=pq_codebooks,
                               pq_precomputed=pq_precomputed)
    spill_rows = np.asarray(rows_sorted[~main], dtype=np.int64)
    return (gvec, gscales, gsq, gval, grow, offsets.astype(np.int32), kept,
            spill_rows)


def build_inverse_maps(row_ids: np.ndarray, spill_row_ids: np.ndarray):
    """phys row -> FLAT grouped/spill position (-1 = absent). Shared by the
    single-device and sharded IVF delete paths so the lookup semantics
    (and fixes to them) cannot drift apart."""
    flat_g = np.asarray(row_ids).reshape(-1)
    flat_s = np.asarray(spill_row_ids).reshape(-1)
    hi = 0
    for ids in (flat_g, flat_s):
        if ids.size:
            hi = max(hi, int(ids.max()) + 1)
    inv_g = np.full(hi, -1, np.int64)
    m = flat_g >= 0
    inv_g[flat_g[m]] = np.flatnonzero(m)
    inv_s = np.full(hi, -1, np.int64)
    m = flat_s >= 0
    inv_s[flat_s[m]] = np.flatnonzero(m)
    return inv_g, inv_s


def lookup_inverse(inv_g: np.ndarray, inv_s: np.ndarray,
                   phys: np.ndarray):
    """Map physical rows to (grouped_hits, spill_hits). NEGATIVE rows are
    excluded explicitly: a -1 (failed upstream lookup) would wrap to
    inv[-1] under numpy indexing and soft-delete an unrelated live slot."""
    in_range = (phys >= 0) & (phys < len(inv_g))
    sel = phys[in_range]
    g_hits = inv_g[sel]
    s_hits = inv_s[sel]
    return g_hits[g_hits >= 0], s_hits[s_hits >= 0]


def _round_up_arr(x: np.ndarray, m: int) -> np.ndarray:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("nprobe", "k", "cell_pad", "recall_target"))
def _ivf_search(
    queries: jax.Array,        # (Q, d) f32
    centroids: jax.Array,      # (nlist, d) f32
    cell_offsets: jax.Array,   # (nlist,) i32 packed start row per cell
    cell_lens: jax.Array,      # (nlist,) i32 live rows per cell (<= window)
    grouped: jax.Array,        # (N_g, d) storage dtype, cells packed
    grouped_sq: jax.Array,     # (nlist*P,) f32
    grouped_valid: jax.Array,  # (nlist*P,) bool
    spill: jax.Array,          # (S, d)
    spill_sq: jax.Array,       # (S,)
    spill_valid: jax.Array,    # (S,) bool
    nprobe: int,
    k: int,
    cell_pad: int,
    recall_target: float = 0.95,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (dist, grouped_row) where grouped_row indexes grouped rows,
    or nlist*P + j for spill row j; -1 for empty."""
    qf = queries.astype(jnp.float32)
    q_sq = jnp.sum(qf * qf, axis=-1, keepdims=True)

    # 1. coarse: nearest nprobe cells per query
    c_sq = jnp.sum(centroids * centroids, axis=-1)
    c_scores = 2.0 * jnp.dot(qf, centroids.T,
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGH) - c_sq[None, :]
    _, cells = jax.lax.top_k(c_scores, nprobe)  # (Q, nprobe)

    # 2. candidate rows: each probed cell is a PACKED run starting at
    # cell_offsets[cell] with cell_lens[cell] live rows; the fixed window
    # (cell_pad rows) may over-scan into the next cell, so positions past
    # the cell's own length are masked (else a row probed via two cells
    # could fill two top-k slots).
    offs = jax.lax.broadcasted_iota(jnp.int32, (1, 1, cell_pad), 2)
    starts = jnp.take(cell_offsets, cells, axis=0)
    cand = (starts[:, :, None] + offs).reshape(queries.shape[0], -1)
    in_cell = (offs < jnp.take(cell_lens, cells, axis=0)[:, :, None]
               ).reshape(queries.shape[0], -1)

    # 3. gather + score (R = nprobe*P candidates per query)
    cvecs = jnp.take(grouped, cand, axis=0)          # (Q, R, d)
    csq = jnp.take(grouped_sq, cand, axis=0)         # (Q, R)
    cval = jnp.take(grouped_valid, cand, axis=0)     # (Q, R)
    qc = queries.astype(grouped.dtype)
    prec = jax.lax.Precision.HIGHEST if grouped.dtype == jnp.float32 else None
    dots = jnp.einsum("qd,qrd->qr", qc, cvecs,
                      preferred_element_type=jnp.float32, precision=prec)
    neg = 2.0 * dots - csq
    neg = jnp.where(cval & in_cell, neg, -jnp.inf)

    # 4. spill region: exact scan, always
    sdots = jnp.dot(qc, spill.T.astype(grouped.dtype),
                    preferred_element_type=jnp.float32, precision=prec)
    sneg = 2.0 * sdots - spill_sq[None, :]
    sneg = jnp.where(spill_valid[None, :], sneg, -jnp.inf)
    spill_ids = grouped.shape[0] + jax.lax.broadcasted_iota(
        jnp.int32, (1, spill.shape[0]), 1
    )
    all_neg = jnp.concatenate([neg, jnp.broadcast_to(
        sneg, (queries.shape[0], sneg.shape[1]))], axis=1)
    all_ids = jnp.concatenate(
        [cand, jnp.broadcast_to(spill_ids, (queries.shape[0], spill_ids.shape[1]))],
        axis=1,
    )

    kk = min(k, all_neg.shape[1])
    top_neg, pos = jax.lax.approx_max_k(all_neg, kk, recall_target=recall_target)
    top_ids = jnp.take_along_axis(all_ids, pos.astype(jnp.int32), axis=1)
    if kk < k:
        top_neg = jnp.pad(top_neg, ((0, 0), (0, k - kk)), constant_values=-jnp.inf)
        top_ids = jnp.pad(top_ids, ((0, 0), (0, k - kk)), constant_values=-1)
    top_ids = jnp.where(top_neg == -jnp.inf, -1, top_ids)
    dist = jnp.where(top_ids >= 0, q_sq - top_neg, jnp.inf)
    return dist, top_ids


@functools.partial(jax.jit, static_argnames=("nprobe", "k", "cell_pad", "recall_target"))
def _ivf_search_int8(
    queries, centroids, cell_offsets, cell_lens, grouped_i8, cell_scales,
    grouped_sq, grouped_valid, spill_i8, spill_scales, spill_sq, spill_valid,
    nprobe: int, k: int, cell_pad: int, recall_target: float = 0.95,
):
    """Int8-cell variant: candidates dequantize at the gather (the gathered
    set is nprobe*cell_pad rows — small), norms stay exact f32."""
    qf = queries.astype(jnp.float32)
    q_sq = jnp.sum(qf * qf, axis=-1, keepdims=True)
    c_sq = jnp.sum(centroids * centroids, axis=-1)
    c_scores = 2.0 * jnp.dot(qf, centroids.T,
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGH) - c_sq[None, :]
    _, cells = jax.lax.top_k(c_scores, nprobe)
    offs = jax.lax.broadcasted_iota(jnp.int32, (1, 1, cell_pad), 2)
    starts = jnp.take(cell_offsets, cells, axis=0)
    cand = (starts[:, :, None] + offs).reshape(queries.shape[0], -1)
    in_cell = (offs < jnp.take(cell_lens, cells, axis=0)[:, :, None]
               ).reshape(queries.shape[0], -1)
    cvecs = jnp.take(grouped_i8, cand, axis=0).astype(jnp.float32)
    cvecs = cvecs * jnp.take(cell_scales, cand, axis=0)[:, :, None]
    csq = jnp.take(grouped_sq, cand, axis=0)
    cval = jnp.take(grouped_valid, cand, axis=0)
    dots = jnp.einsum("qd,qrd->qr", qf, cvecs,
                      preferred_element_type=jnp.float32)
    neg = jnp.where(cval & in_cell, 2.0 * dots - csq, -jnp.inf)

    spill_f = spill_i8.astype(jnp.float32) * spill_scales[:, None]
    sdots = jnp.dot(qf, spill_f.T, preferred_element_type=jnp.float32)
    sneg = jnp.where(spill_valid[None, :], 2.0 * sdots - spill_sq[None, :],
                     -jnp.inf)
    spill_ids = grouped_i8.shape[0] + jax.lax.broadcasted_iota(
        jnp.int32, (1, spill_i8.shape[0]), 1)
    all_neg = jnp.concatenate(
        [neg, jnp.broadcast_to(sneg, (queries.shape[0], sneg.shape[1]))], axis=1)
    all_ids = jnp.concatenate(
        [cand, jnp.broadcast_to(spill_ids,
                                (queries.shape[0], spill_ids.shape[1]))], axis=1)
    kk = min(k, all_neg.shape[1])
    top_neg, pos = jax.lax.approx_max_k(all_neg, kk, recall_target=recall_target)
    top_ids = jnp.take_along_axis(all_ids, pos.astype(jnp.int32), axis=1)
    if kk < k:
        top_neg = jnp.pad(top_neg, ((0, 0), (0, k - kk)), constant_values=-jnp.inf)
        top_ids = jnp.pad(top_ids, ((0, 0), (0, k - kk)), constant_values=-1)
    top_ids = jnp.where(top_neg == -jnp.inf, -1, top_ids)
    dist = jnp.where(top_ids >= 0, q_sq - top_neg, jnp.inf)
    return dist, top_ids


@functools.partial(jax.jit, static_argnames=("nprobe", "k", "cell_pad",
                                              "recall_target"))
def _ivf_search_pq(
    queries, centroids, cell_offsets, cell_lens, grouped_codes, codebooks,
    grouped_sq, grouped_valid, spill_codes, spill_cells, spill_sq,
    spill_valid, nprobe: int, k: int, cell_pad: int,
    recall_target: float = 0.95, rotation=None,
):
    """PQ-cell variant (IVF-PQ): cells hold M-byte RESIDUAL codes.

    Codes quantize (x - c_cell); the distance decomposes as
        d^2 = ||q||^2 - 2 q.c - 2 q.r_hat + ||c + r_hat||^2
    where 2 q.c is already on hand from the coarse GEMM, 2 q.r_hat is
    the ADC sum against a QUERY-ONLY LUT (the term separation is what
    makes residual IVF-PQ TPU-friendly — no per-cell LUTs), and the
    stored norm covers the rest. Residual coding is what gives
    within-cell discrimination: global codebooks spend their entries
    reproducing WHICH cluster a row is in — information the coarse
    quantizer already has — and recall collapsed to 0.19 at 16M x 768
    on clustered data without it.

    Probing gathers candidate CODE rows (M bytes each — d/M x less DMA
    than the int8 variant); the always-scanned spill region takes the
    gather-free one-hot MXU path with per-row cell ids (spill_cells)
    supplying its centroid term. The engine's exact re-rank from the
    host mirror restores true-distance ordering over the candidates."""
    from tpuvdb.kernels import pq as pqk

    qf = queries.astype(jnp.float32)
    q_sq = jnp.sum(qf * qf, axis=-1, keepdims=True)
    c_sq = jnp.sum(centroids * centroids, axis=-1)
    qc2 = 2.0 * jnp.dot(qf, centroids.T,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGH)  # (Q, nlist)
    c_scores = qc2 - c_sq[None, :]
    _, cells = jax.lax.top_k(c_scores, nprobe)
    offs = jax.lax.broadcasted_iota(jnp.int32, (1, 1, cell_pad), 2)
    starts = jnp.take(cell_offsets, cells, axis=0)
    cand = (starts[:, :, None] + offs).reshape(queries.shape[0], -1)
    in_cell = (offs < jnp.take(cell_lens, cells, axis=0)[:, :, None]
               ).reshape(queries.shape[0], -1)

    # OPQ: the rotation folds entirely into the LUT build (q @ R); the
    # coarse GEMM, stored norms, and code stream are rotation-agnostic
    lut = pqk._pq_lut(qf, codebooks, rotation)            # (Q, M, 256)
    codes_g = jnp.take(grouped_codes, cand, axis=0)       # (Q, R, M) u8
    csq = jnp.take(grouped_sq, cand, axis=0)
    cval = jnp.take(grouped_valid, cand, axis=0)
    dots = pqk.adc_scores_grouped(lut, codes_g)          # (Q, R) = 2 q.r
    # per-candidate centroid term: the probed cell's 2 q.c broadcast over
    # its window (over-scan rows are masked by in_cell, so every scored
    # row's cell IS the probed cell it was encoded against)
    qc_cand = jnp.repeat(jnp.take_along_axis(qc2, cells, axis=1),
                         cell_pad, axis=1)                # (Q, R)
    neg = jnp.where(cval & in_cell, qc_cand + dots - csq, -jnp.inf)

    # spill: dense one-hot GEMM over the whole (small) region; centroid
    # term gathered per spill row via its stored cell id. J comes from
    # the codebooks (16 for the packed 4-bit tier, 256 for 8-bit).
    s_n = spill_codes.shape[0]
    m_subq, n_codes = codebooks.shape[0], codebooks.shape[1]
    sc = pqk._maybe_unpack(spill_codes, n_codes)          # (S, M2)
    jota = jnp.arange(n_codes, dtype=jnp.int32)
    onehot = (sc[:, :, None] == jota).astype(jnp.bfloat16)
    sdots = jax.lax.dot_general(
        lut.reshape(lut.shape[0], -1).astype(jnp.bfloat16),
        onehot.reshape(s_n, m_subq * n_codes),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    qc_spill = jnp.take(qc2, jnp.clip(spill_cells, 0, qc2.shape[1] - 1),
                        axis=1)                            # (Q, S)
    sneg = jnp.where(spill_valid[None, :],
                     qc_spill + sdots - spill_sq[None, :], -jnp.inf)
    spill_ids = grouped_codes.shape[0] + jax.lax.broadcasted_iota(
        jnp.int32, (1, s_n), 1)
    all_neg = jnp.concatenate(
        [neg, jnp.broadcast_to(sneg, (queries.shape[0], s_n))], axis=1)
    all_ids = jnp.concatenate(
        [cand, jnp.broadcast_to(spill_ids, (queries.shape[0], s_n))], axis=1)
    kk = min(k, all_neg.shape[1])
    top_neg, pos = jax.lax.approx_max_k(all_neg, kk,
                                        recall_target=recall_target)
    top_ids = jnp.take_along_axis(all_ids, pos.astype(jnp.int32), axis=1)
    if kk < k:
        top_neg = jnp.pad(top_neg, ((0, 0), (0, k - kk)),
                          constant_values=-jnp.inf)
        top_ids = jnp.pad(top_ids, ((0, 0), (0, k - kk)), constant_values=-1)
    top_ids = jnp.where(top_neg == -jnp.inf, -1, top_ids)
    dist = jnp.where(top_ids >= 0, q_sq - top_neg, jnp.inf)
    return dist, top_ids


@dataclasses.dataclass
class IVFStats:
    nlist: int
    cell_pad: int
    spill_rows: int
    grouped_rows: int
    fill: float  # live rows / padded capacity


class IVFIndex:
    def __init__(
        self,
        centroids: np.ndarray,
        grouped: jax.Array,
        grouped_sq: jax.Array,
        grouped_valid: jax.Array,
        row_ids: np.ndarray,      # grouped row -> original physical row (-1 pad)
        spill: jax.Array,
        spill_sq: jax.Array,
        spill_valid: jax.Array,
        spill_row_ids: np.ndarray,
        cell_pad: int,            # scan WINDOW (rows), multiple of 128
        cell_offsets: np.ndarray, # (nlist,) i32 packed start row per cell
        cell_lens: Optional[np.ndarray] = None,  # (nlist,) live rows/cell
        nprobe: int = 32,
        recall_target: float = 0.95,
        cell_scales: Optional[jax.Array] = None,   # (N_g,) int8 dequant
        spill_scales: Optional[jax.Array] = None,  # (S,)
        pq_codebooks: Optional[jax.Array] = None,  # (M, 256, d/M) f32
        spill_cells: Optional[np.ndarray] = None,  # (S,) i32 residual cells
        pq_rotation: Optional[jax.Array] = None,   # (d, d) OPQ rotation
        pq_err: float = 0.0,  # calibrated ||x - x_hat|| quantile (adaptive
                              # rescore bound; 0 = uncalibrated -> full window)
    ):
        self.centroids = jnp.asarray(centroids, jnp.float32)
        # host copies cached when the ctor got numpy inputs (build always
        # does): engine checkpoints read these for the warm state instead
        # of fetching ~16 MB back through the ~1 MB/s relay per rebuild
        self._centroids_np = (np.asarray(centroids, np.float32)
                              if isinstance(centroids, np.ndarray) else None)
        self._pq_codebooks_np = (
            np.asarray(pq_codebooks, np.float32)
            if isinstance(pq_codebooks, np.ndarray) else None)
        self._pq_rotation_np = (
            np.asarray(pq_rotation, np.float32)
            if isinstance(pq_rotation, np.ndarray) else None)
        self.cell_offsets = jnp.asarray(cell_offsets, jnp.int32)
        if cell_lens is None:  # legacy ctor: assume full windows
            cell_lens = np.full(np.asarray(cell_offsets).shape[0], cell_pad,
                                np.int32)
        self.cell_lens = jnp.asarray(cell_lens, jnp.int32)
        self.grouped = grouped
        self.grouped_sq = grouped_sq
        self.grouped_valid = grouped_valid
        self.row_ids = row_ids
        self.spill = spill
        self.spill_sq = spill_sq
        self.spill_valid = spill_valid
        self.spill_row_ids = spill_row_ids
        self.cell_pad = cell_pad
        self.nprobe = nprobe
        self.recall_target = recall_target
        self.nlist = int(centroids.shape[0])
        self.cell_scales = cell_scales
        self.spill_scales = spill_scales
        self.quantized = cell_scales is not None
        self.pq_codebooks = (jnp.asarray(pq_codebooks, jnp.float32)
                             if pq_codebooks is not None else None)
        self.pq = pq_codebooks is not None
        self.pq_rotation = (jnp.asarray(pq_rotation, jnp.float32)
                            if pq_rotation is not None else None)
        self.pq_err = float(pq_err)
        if self.pq:
            if spill_cells is None:
                spill_cells = np.zeros(int(spill.shape[0]), np.int32)
            self.spill_cells = jnp.asarray(spill_cells, jnp.int32)
        else:
            self.spill_cells = None

    # host-cached views for checkpointing (fetch once, lazily, if the
    # ctor ever received device arrays)
    def centroids_np(self) -> np.ndarray:
        if self._centroids_np is None:
            self._centroids_np = np.asarray(self.centroids)
        return self._centroids_np

    def pq_codebooks_np(self) -> Optional[np.ndarray]:
        if self._pq_codebooks_np is None and self.pq:
            self._pq_codebooks_np = np.asarray(self.pq_codebooks)
        return self._pq_codebooks_np

    def pq_rotation_np(self) -> Optional[np.ndarray]:
        if self._pq_rotation_np is None and self.pq_rotation is not None:
            self._pq_rotation_np = np.asarray(self.pq_rotation)
        return self._pq_rotation_np

    # ----------------------------------------------------------- packed state
    # Restart used to re-run assign+encode over EVERY mirror row because
    # the checkpoint carried only centroids+codebooks (778 s at 8M x 768,
    # BENCH_NOTES "Restart re-encodes the world"). These three methods are
    # the fix: capture references under the engine lock, fetch the device
    # arrays to host off-lock, checkpoint them like a shard npz — restart
    # becomes ONE HBM upload plus an append of only the replayed WAL tail.

    def packed_capture(self) -> dict:
        """Reference-snapshot of the full packed state (call under the
        owning engine's lock). numpy slot maps are COPIED (append_rows
        mutates its own copies in place, but cheap insurance beats a torn
        map); device arrays are captured by reference — appends rebind
        attributes functionally, so the capture stays internally
        consistent, and an append that DONATED a captured buffer makes
        packed_fetch raise, which the caller treats as "skip packed this
        checkpoint" (the warm centroid state still saves)."""
        dev = {
            "grouped": self.grouped,
            "grouped_sq": self.grouped_sq,
            "grouped_valid": self.grouped_valid,
            "spill": self.spill,
            "spill_sq": self.spill_sq,
            "spill_valid": self.spill_valid,
        }
        if self.quantized:
            dev["cell_scales"] = self.cell_scales
            dev["spill_scales"] = self.spill_scales
        if self.pq:
            dev["spill_cells"] = self.spill_cells
        cap = {
            "centroids": self.centroids_np().copy(),
            "cell_offsets": np.asarray(self.cell_offsets).copy(),
            "cell_lens": np.asarray(self.cell_lens).copy(),
            "cell_pad": np.int64(self.cell_pad),
            "nprobe": np.int64(self.nprobe),
            "recall_target": np.float64(self.recall_target),
            "row_ids": np.asarray(self.row_ids).copy(),
            "spill_row_ids": np.asarray(self.spill_row_ids).copy(),
            "_dev": dev,
        }
        if self.pq:
            cap["pq_codebooks"] = self.pq_codebooks_np().copy()
            cap["pq_err"] = np.float64(self.pq_err)
        if self.pq_rotation is not None:
            cap["pq_rotation"] = self.pq_rotation_np().copy()
        return cap

    @staticmethod
    def packed_fetch(cap: dict) -> dict:
        """Fetch the captured device arrays to host, OFF the engine lock
        (the grouped table is the corpus's codes — 768 MB at 8M x 768
        PQ). Raises if a concurrent append donated a captured buffer."""
        out = {k: v for k, v in cap.items() if k != "_dev"}
        for k, v in cap["_dev"].items():
            out[k] = np.asarray(v)
        return out

    @classmethod
    def from_packed(cls, st) -> "IVFIndex":
        """Reconstruct from a packed-state mapping (np.load of the
        checkpoint's ivf_packed.npz): one HBM upload, zero assign/encode
        compute."""
        def opt(key):
            return st[key] if key in st else None

        cs, ss = opt("cell_scales"), opt("spill_scales")
        cb, rot, sc = opt("pq_codebooks"), opt("pq_rotation"), opt(
            "spill_cells")
        return cls(
            centroids=np.asarray(st["centroids"], np.float32),
            grouped=jnp.asarray(st["grouped"]),
            grouped_sq=jnp.asarray(st["grouped_sq"]),
            grouped_valid=jnp.asarray(st["grouped_valid"]),
            row_ids=np.asarray(st["row_ids"]),
            spill=jnp.asarray(st["spill"]),
            spill_sq=jnp.asarray(st["spill_sq"]),
            spill_valid=jnp.asarray(st["spill_valid"]),
            spill_row_ids=np.asarray(st["spill_row_ids"]),
            cell_pad=int(st["cell_pad"]),
            cell_offsets=np.asarray(st["cell_offsets"]),
            cell_lens=np.asarray(st["cell_lens"]),
            nprobe=int(st["nprobe"]),
            recall_target=float(st["recall_target"]),
            cell_scales=jnp.asarray(cs) if cs is not None else None,
            spill_scales=jnp.asarray(ss) if ss is not None else None,
            pq_codebooks=(np.asarray(cb, np.float32)
                          if cb is not None else None),
            spill_cells=np.asarray(sc) if sc is not None else None,
            pq_rotation=(np.asarray(rot, np.float32)
                         if rot is not None else None),
            pq_err=float(st["pq_err"]) if "pq_err" in st else 0.0,
        )

    def live_phys_rows(self) -> np.ndarray:
        """Physical rows currently present AND valid in this index
        (grouped + spill). The packed-restore path diffs this against the
        mirrors' live set to reconcile the WAL tail replayed after the
        checkpoint (appends the new rows, invalidates the deleted)."""
        g = np.asarray(self.row_ids)
        gv = np.asarray(self.grouped_valid)[: len(g)]
        s = np.asarray(self.spill_row_ids)
        sv = np.asarray(self.spill_valid)[: len(s)]
        return np.concatenate([g[(g >= 0) & gv], s[(s >= 0) & sv]])

    # ------------------------------------------------------------------ build

    @classmethod
    def build(
        cls,
        vectors: np.ndarray,      # (N, d) f32 — physical row space
        valid: np.ndarray,        # (N,) bool
        nlist: int = 1024,
        nprobe: int = 32,
        kmeans_iters: int = 12,
        train_sample: int = 262_144,
        cell_cap_quantile: float = 0.98,
        dtype=jnp.float32,
        seed: int = 0,
        recall_target: float = 0.95,
        split_oversized: bool = True,
        centroids: Optional[np.ndarray] = None,  # skip k-means training
        pq_subq: int = 0,
        pq_codebooks: Optional[np.ndarray] = None,
        opq: bool = False,
        pq_rotation: Optional[np.ndarray] = None,
        pq_bits: int = 8,
    ) -> "IVFIndex":
        """With split_oversized (default), cell_pad tracks the MEDIAN cell
        and hot cells are subdivided into real child centroids, so fill
        stays high under skew; cell_cap_quantile then only applies to the
        legacy no-split path (and tests of the spill mechanism).

        Delegates to build_streaming over an ArrayRowSource — identical
        structure, one shared implementation."""
        return cls.build_streaming(
            ArrayRowSource(vectors), valid, nlist=nlist, nprobe=nprobe,
            kmeans_iters=kmeans_iters, train_sample=train_sample,
            cell_cap_quantile=cell_cap_quantile, dtype=dtype, seed=seed,
            recall_target=recall_target, split_oversized=split_oversized,
            centroids=centroids, pq_subq=pq_subq, pq_codebooks=pq_codebooks,
            opq=opq, pq_rotation=pq_rotation, pq_bits=pq_bits)

    @classmethod
    def build_streaming(
        cls,
        source,                   # ArrayRowSource | MirrorRowSource
        valid: np.ndarray,        # (N,) bool over physical rows
        nlist: int = 1024,
        nprobe: int = 32,
        kmeans_iters: int = 12,
        train_sample: int = 262_144,
        cell_cap_quantile: float = 0.98,
        dtype=jnp.float32,
        seed: int = 0,
        recall_target: float = 0.95,
        split_oversized: bool = True,
        centroids: Optional[np.ndarray] = None,
        pq_subq: int = 0,                          # 0 = off; else IVF-PQ
        pq_codebooks: Optional[np.ndarray] = None,  # warm-start codebooks
        pq_max_cell: int = 2048,                   # PQ scan-window clamp
        opq: bool = False,                         # learned OPQ rotation
        pq_rotation: Optional[np.ndarray] = None,  # warm-start rotation
        pq_bits: int = 8,                          # 8 | 4 (fast-scan)
        pq_err: float = 0.0,                       # warm-start calibration
    ) -> "IVFIndex":
        """Memory-bounded build: the corpus is read through `source` —
        k-means sample and cell members by gather, the assignment pass in
        fixed-shape f32 blocks (one XLA compile, ~800 MB device transient
        instead of the whole corpus in HBM), and int8 mirrors pack their
        codes bit-exact without a 25 GB f32 detour. This is what lets the
        ENGINE run IVF at the 8M x 768 capacity scale the kernels prove
        (a full f32 stack is 24.5 GB host + would not fit 16 GB HBM)."""
        from tpuvdb.utils.hostmem import memlog

        n, d = source.n, source.dim
        live_idx = np.flatnonzero(valid)
        if len(live_idx) == 0:
            raise ValueError("cannot build IVF over empty corpus")
        memlog("build: start")
        if pq_codebooks is not None and not pq_subq:
            from tpuvdb.kernels.pq import pq_code_bytes

            pq_subq = pq_code_bytes(pq_codebooks)
        if pq_subq:
            if pq_bits not in (8, 4):
                raise ValueError(f"pq_bits={pq_bits} must be 8 or 4")
            # pq_subq stays BYTES/row in both tiers; 4-bit runs 2*subq
            # half-width subspaces of 16 codes packed two per byte
            pq_m = pq_subq if pq_bits == 8 else 2 * pq_subq
            pq_j = 256 if pq_bits == 8 else 16
            if d % pq_m != 0:
                raise ValueError(
                    f"pq_subq={pq_subq} at pq_bits={pq_bits} needs "
                    f"{pq_m} subspaces to divide dim={d}")
            if dtype == jnp.int8:
                raise ValueError("pq_subq and int8 cells are exclusive — "
                                 "PQ already compresses below int8")
            if (pq_codebooks is not None
                    and pq_codebooks.shape != (pq_m, pq_j, d // pq_m)):
                pq_codebooks = None  # stale warm shape/tier: retrain
            if pq_rotation is not None and pq_rotation.shape != (d, d):
                pq_rotation = None
                pq_codebooks = None  # codebooks are tied to their rotation
            if opq and pq_codebooks is not None and pq_rotation is None:
                # warm codebooks trained WITHOUT a rotation can't pair
                # with OPQ coding: retrain the pair together
                pq_codebooks = None
            if not opq:
                pq_rotation = None  # rotation only meaningful under OPQ
        else:
            pq_rotation = None
        rng = np.random.default_rng(seed)

        # 1. train the coarse quantizer on a sample (TPU k-means) — or
        # reuse caller-provided centroids (checkpoint warm-start: a
        # restarted engine pays one assignment pass, not a training run).
        # PQ codebooks train on the SAME sample (one gather serves both).
        warm_cents = centroids is not None and centroids.shape[1] == d
        need_cb = pq_subq and pq_codebooks is None
        sample = None
        if not warm_cents or need_cb:
            if len(live_idx) > train_sample:
                tr = np.sort(rng.choice(live_idx, size=train_sample,
                                        replace=False))
            else:
                tr = live_idx
            sample = source.gather_f32(tr)
        if warm_cents:
            centroids = np.asarray(centroids, np.float32)
            nlist = len(centroids)
        else:
            centroids, _ = kmeans(sample, np.ones(sample.shape[0], bool),
                                  nlist=nlist, iters=kmeans_iters, seed=seed)
        if need_cb:
            from tpuvdb.kernels.pq import train_opq, train_pq

            # RESIDUAL codebooks: train on (x - c_assign) so the 256
            # entries per subspace model LOCAL structure — the coarse
            # quantizer already owns the global structure, and global
            # codebooks gave ~zero within-cell discrimination (recall
            # 0.19 at 16M x 768 on clustered data)
            spad = np.zeros((_round_up(len(sample), 4096), d), np.float32)
            spad[: len(sample)] = sample
            from tpuvdb.kernels.kmeans import assign_blockwise as _ab

            sa = np.asarray(_ab(jnp.asarray(spad), jnp.asarray(centroids),
                                block_size=4096))[: len(sample)]
            if opq:
                # OPQ: learn a rotation of the RESIDUAL space alongside
                # the codebooks (coarse quantizer stays in original
                # space — only the residual coding rotates)
                pq_codebooks, pq_rotation = train_opq(
                    sample - centroids[sa], m_subq=pq_m, seed=seed,
                    n_codes=pq_j)
            else:
                pq_codebooks = train_pq(sample - centroids[sa],
                                        m_subq=pq_m, seed=seed,
                                        n_codes=pq_j)
            # calibrate the adaptive-rescore error bound on the same
            # residual sample the codebooks trained on (numpy subsample,
            # no device program) — checkpointed alongside the codebooks
            from tpuvdb.kernels.pq import calibrate_pq_err

            pq_err = calibrate_pq_err(sample - centroids[sa],
                                      pq_codebooks, rotation=pq_rotation,
                                      seed=seed)
        del sample
        memlog("build: trained (cents+codebooks)")

        # 2. assign every row, streamed in ONE fixed block shape (pad the
        # ragged tail); invalid rows masked to -1 afterwards
        from tpuvdb.kernels.kmeans import assign_blockwise

        cents_j = jnp.asarray(centroids)
        blk = 262_144
        assign = np.full(n, -1, np.int32)
        # PQ: encode in the SAME pass over the SAME device-resident block
        # (one host->device upload serves both programs; at 32M x 768 the
        # uploads dominate the build, so a separate encode pass would
        # double the build's transfer volume) — packing then copies the
        # precomputed codes host-side instead of gathering f32 rows again
        pq_codes = pq_rsq = None  # DEVICE code table — never fetched
        rot_j = (jnp.asarray(pq_rotation, jnp.float32)
                 if pq_rotation is not None else None)
        if pq_codebooks is not None:
            from tpuvdb.kernels.pq import _encode_residual_scan

            cb_j = jnp.asarray(pq_codebooks, jnp.float32)
            # headroom covers the last block's 65536-pad overhang so the
            # donated dynamic_update_slice never clamps (a clamped start
            # would silently shift the write over earlier rows)
            n_tab = _round_up(n + 65536, 65536)
            pq_codes = jnp.zeros((n_tab, pq_subq), jnp.uint8)
            pq_rsq = jnp.zeros(n_tab, jnp.float32)
        # int16 assignment fetch halves the only remaining device->host
        # transfer of the pass (the relay fetches at ~1 MB/s)
        small_ids = nlist <= 32_000
        for g0, m, dev in source.iter_blocks_dev(blk, pad_to=65536):
            a_dev = assign_blockwise(dev, cents_j)
            a = np.asarray(a_dev.astype(jnp.int16) if small_ids
                           else a_dev)[:m]
            assign[g0 : g0 + m] = a
            if pq_codes is not None:
                codes, rsq = _encode_residual_scan(
                    dev, a_dev, cents_j, cb_j, block=16384, rotation=rot_j)
                pq_codes, pq_rsq = _codes_update_dev(
                    pq_codes, pq_rsq, codes, rsq, np.int32(g0))
        assign = np.where(valid, assign, -1)
        memlog("build: assigned+encoded")

        # 3. skew control: bound the max cell, then PACK
        sizes = np.bincount(assign[assign >= 0], minlength=nlist)
        live_sizes = sizes[sizes > 0]
        if split_oversized and nlist > 1 and len(live_sizes):
            # window ~ 1.25x the median cell; bisect anything bigger so the
            # packed layout stays tight AND the scan window stays small
            cap = int(np.quantile(live_sizes, 0.5) * 1.25)
            if pq_codebooks is not None:
                # ADC cost is per CANDIDATE (nprobe * window), not per
                # byte: clamp the window so huge corpora at modest nlist
                # bisect into more cells instead of inflating every
                # query's candidate set (16M rows / nlist 4096 would
                # otherwise probe 78k rows/query)
                cap = min(cap, pq_max_cell)
            cell_pad = max(_round_up(max(cap, 1), 128), 128)
            old_cents = centroids
            centroids, assign = split_oversized_cells(
                source.gather_f32, assign, centroids, cell_pad, seed=seed)
            nlist = len(centroids)
            if pq_codes is not None and nlist > len(old_cents):
                # residual codes are tied to their cell's centroid: rows
                # whose cell was bisected (parent replaced + children
                # appended) re-encode against the FINAL centroids —
                # on device, scattered into the code table (no fetch)
                changed = np.ones(nlist, bool)
                changed[: len(old_cents)] = np.any(
                    old_cents != centroids[: len(old_cents)], axis=1)
                rows_re = np.flatnonzero(
                    (assign >= 0) & changed[np.maximum(assign, 0)])
                cents_j2 = jnp.asarray(centroids, jnp.float32)
                for lo in range(0, len(rows_re), 1_000_000):
                    rr = rows_re[lo : lo + 1_000_000]
                    c_dev, q_dev = _encode_rows_dev(
                        source, rr, assign[rr], cents_j2, cb_j, rot_j)
                    mpad = _round_up(max(len(rr), 1), 65536)
                    pad = mpad - len(rr)
                    if pad:  # fixed shape steps bound the compile count
                        c_dev = jnp.pad(c_dev, ((0, pad), (0, 0)))
                        q_dev = jnp.pad(q_dev, ((0, pad),))
                    idx = np.full(mpad, -1, np.int32)  # -1 pads drop
                    idx[: len(rr)] = rr.astype(np.int32)
                    pq_codes, pq_rsq = _codes_scatter_dev(
                        pq_codes, pq_rsq, jnp.asarray(idx), c_dev, q_dev)
        else:
            cap = (int(np.quantile(sizes, cell_cap_quantile))
                   if nlist > 1 else int(sizes.max()))
            cell_pad = max(_round_up(max(cap, 1), 128), 128)

        memlog("build: split done")
        live2 = np.flatnonzero(valid & (assign >= 0))
        int8_out = dtype == jnp.int8
        (gvec, gscales, gsq, gval, grow, cell_offsets, cell_lens,
         spill_rows) = _pack_cells_from_source(
            source, live2, assign[live2], nlist, cell_pad, int8_out,
            pq_codebooks=pq_codebooks,
            pq_precomputed=((pq_codes, pq_rsq) if pq_codes is not None
                            else None))

        memlog("build: packed")
        # spill reserve: free tail capacity so append_rows can overflow
        # full cells here instead of forcing a rebuild (scaled down for
        # small corpora — spill is scanned densely by every query)
        reserve = min(8192, max(128, n // 8))
        s = max(len(spill_rows), 1)
        s_pad = _round_up(s + reserve, 128)
        s_width, s_dtype = ((pq_subq, np.uint8) if pq_codebooks is not None
                            else (d, np.int8 if int8_out else np.float32))
        svec = np.zeros((s_pad, s_width), s_dtype)
        sscales = np.ones(s_pad, np.float32) if int8_out else None
        ssq = np.zeros(s_pad, np.float32)
        sval = np.zeros(s_pad, bool)
        srow = np.full(s_pad, -1, np.int64)
        scell = np.zeros(s_pad, np.int32)  # residual-PQ: cell per spill row
        ns = len(spill_rows)
        if ns:
            _fill_rows_from_source(source, spill_rows, svec, sscales, ssq,
                                   np.arange(ns), int8_out,
                                   pq_codebooks=pq_codebooks,
                                   pq_precomputed=((pq_codes, pq_rsq)
                                                   if pq_codes is not None
                                                   else None))
            sval[:ns] = True
            srow[:ns] = spill_rows
            scell[:ns] = assign[spill_rows]

        cell_scales = spill_scales = None
        if int8_out:
            cell_scales = jnp.asarray(gscales)
            spill_scales = jnp.asarray(sscales)
            grouped_dev = jnp.asarray(gvec)
            spill_dev = jnp.asarray(svec)
        elif pq_codebooks is not None:  # PQ code cells: keep uint8
            grouped_dev = jnp.asarray(gvec)
            spill_dev = jnp.asarray(svec)
        else:
            grouped_dev = jnp.asarray(gvec, dtype)
            spill_dev = jnp.asarray(svec, dtype)
        return cls(
            centroids=centroids,
            grouped=grouped_dev,
            grouped_sq=jnp.asarray(gsq),
            grouped_valid=jnp.asarray(gval),
            row_ids=grow,
            spill=spill_dev,
            spill_sq=jnp.asarray(ssq),
            spill_valid=jnp.asarray(sval),
            spill_row_ids=srow,
            cell_pad=cell_pad,
            cell_offsets=cell_offsets,
            cell_lens=cell_lens,
            nprobe=nprobe,
            recall_target=recall_target,
            cell_scales=cell_scales,
            spill_scales=spill_scales,
            pq_codebooks=pq_codebooks,
            spill_cells=scell if pq_codebooks is not None else None,
            pq_rotation=pq_rotation,
            pq_err=pq_err if pq_codebooks is not None else 0.0,
        )

    # ----------------------------------------------------------------- search

    def masked_valid(self, cand_phys: np.ndarray):
        """Device validity masks restricted to `cand_phys` physical rows —
        the IVF filter pushdown (VERDICT r2 weak #5): O(candidates) host
        work via the inverse maps, one 1-byte/row upload, one jitted AND.
        Pass the result as search(valid_override=...)."""
        g_hits, s_hits = lookup_inverse(
            *self._inverse_maps(), np.asarray(cand_phys, np.int64))
        gmask = np.zeros(int(self.grouped_valid.shape[0]), bool)
        gmask[g_hits] = True
        smask = np.zeros(int(self.spill_valid.shape[0]), bool)
        smask[s_hits] = True
        return (_and_masks(self.grouped_valid, jnp.asarray(gmask)),
                _and_masks(self.spill_valid, jnp.asarray(smask)))

    def search(
        self, queries: np.ndarray, k: int, nprobe: Optional[int] = None,
        max_batch: int = 32, valid_override=None,
        out_w: Optional[int] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (dists, physical_rows); -1 rows for empty slots.
        Queries are chunked to bound the (Q, nprobe*P, d) gather.
        valid_override: (grouped_valid, spill_valid) device arrays from
        masked_valid() — filtered searches scan with the same compiled
        programs, just a different validity operand.
        out_w: fetch only the first out_w result columns, with dists in
        bf16 — k is pow2-quantized for compile stability, but the relay
        link moves ~24 MB/s serialized with a ~30 ms sync tick, so the
        device->host result transfer is a first-order serving cost (a
        b256 x 1024-wide f32+i32 fetch is 2 MB ~ 80 ms). The exact host
        re-rank restores full score precision afterwards."""
        nprobe = min(nprobe or self.nprobe, self.nlist)
        q = np.asarray(queries, np.float32)
        gval, sval = (valid_override if valid_override is not None
                      else (self.grouped_valid, self.spill_valid))
        # on TPU the scalar-prefetch pallas probe (contiguous cell DMA) is
        # ~50x faster than the row-gather XLA path; CPU keeps the XLA path.
        # PQ cells get the same treatment: pallas_pq_search keeps the
        # one-hot ADC operand in VMEM (the XLA formulation writes ~100 GB
        # of HBM one-hots per batch-32 at the 8M x 768 / M=96 shape).
        use_pallas = jax.default_backend() == "tpu"
        # the 32-query chunk bounds the XLA paths' (Q, nprobe*P, d)
        # gather; the pallas probes never materialize it — their per-step
        # VMEM is tile-sized regardless of Q — so they take the whole
        # batch in ONE device program (a b256 search through a chunked
        # path pays 8 dispatch round-trips where one suffices)
        if use_pallas:
            max_batch = max(max_batch, 1024)
        if self.pq and use_pallas:
            # the PQ probe prefetches its host-EXPANDED per-tile chunk
            # list (cells/segs/cellof: tiles x qt*nprobe*w128 i32 EACH)
            # into SMEM; past ~2 MB total Mosaic refuses the scoped
            # allocation (measured: b256 at nprobe 64 / cell_pad 2048 =
            # 3 x 1 MB -> compile HTTP 500). Chunk the query batch so the
            # three arrays stay inside a fixed entry budget — same
            # per-call programs, one extra dispatch per extra chunk.
            qt_ = 8
            per_tile = qt_ * nprobe * (self.cell_pad // 128)
            # SMEM is 1 MB TOTAL on v5e, all three prefetched arrays
            # live there together, and the allocator rounds each array
            # UP to a power of two: a 288 KB request (9 x 8192 x 4 B at
            # nprobe 64) measured as "Used 1.50M of 1.00M smem" — 3 x
            # 512 KB — while r4's exactly-256 KB arrays fit at 768 KB
            # total. Cap at 32k entries/array (128 KB, <= 256 KB after
            # rounding, 768 KB total worst case) and floor the tile
            # count to a power of two so pow2 per_tile shapes stay
            # exactly pow2-sized.
            budget_entries = 32_768
            max_tiles = max(1, budget_entries // max(per_tile, 1))
            max_tiles = 1 << (max_tiles.bit_length() - 1)
            max_batch = min(max_batch, max_tiles * qt_)
        out_d, out_r = [], []
        # when the batch splits, pad every chunk (incl. the tail) to ONE
        # fixed shape so a b256 search at a deep nprobe compiles a single
        # program instead of one per remainder (a fresh XLA compile
        # through the remote relay is minutes)
        pad_chunks = q.shape[0] > max_batch
        for start in range(0, q.shape[0], max_batch):
            qc = q[start : start + max_batch]
            n_real = qc.shape[0]
            if pad_chunks and n_real < max_batch:
                qc = np.concatenate(
                    [qc, np.zeros((max_batch - n_real, qc.shape[1]),
                                  np.float32)])
            if self.pq and use_pallas and self.grouped.shape[0] >= 128:
                from tpuvdb.kernels.pallas_pq import pallas_pq_search

                dist, gid = pallas_pq_search(
                    jnp.asarray(qc), self.centroids, self.grouped,
                    self.pq_codebooks, self.grouped_sq, gval,
                    self.spill, self.spill_cells, self.spill_sq, sval,
                    self.cell_offsets, cell_pad=self.cell_pad, k=k,
                    nprobe=nprobe, rotation=self.pq_rotation,
                )
            elif self.pq:
                dist, gid = _ivf_search_pq(
                    jnp.asarray(qc), self.centroids, self.cell_offsets,
                    self.cell_lens, self.grouped, self.pq_codebooks,
                    self.grouped_sq, gval, self.spill, self.spill_cells,
                    self.spill_sq, sval, nprobe=nprobe, k=k,
                    cell_pad=self.cell_pad,
                    recall_target=self.recall_target,
                    rotation=self.pq_rotation,
                )
            elif use_pallas:
                from tpuvdb.kernels.pallas_ivf import pallas_ivf_search

                dist, gid = pallas_ivf_search(
                    jnp.asarray(qc), self.centroids, self.grouped,
                    self.grouped_sq, gval,
                    cell_pad=self.cell_pad, k=k, nprobe=nprobe,
                    query_tile=8,
                    spill=self.spill, spill_sq=self.spill_sq,
                    spill_valid=sval,
                    cell_scales=self.cell_scales,
                    spill_scales=self.spill_scales,
                    cell_offsets=self.cell_offsets,
                )
            elif self.quantized:
                dist, gid = _ivf_search_int8(
                    jnp.asarray(qc), self.centroids, self.cell_offsets,
                    self.cell_lens,
                    self.grouped, self.cell_scales, self.grouped_sq,
                    gval, self.spill, self.spill_scales,
                    self.spill_sq, sval,
                    nprobe=nprobe, k=k, cell_pad=self.cell_pad,
                    recall_target=self.recall_target,
                )
            else:
                dist, gid = _ivf_search(
                    jnp.asarray(qc), self.centroids, self.cell_offsets,
                    self.cell_lens,
                    self.grouped, self.grouped_sq, gval,
                    self.spill, self.spill_sq, sval,
                    nprobe=nprobe, k=k, cell_pad=self.cell_pad,
                    recall_target=self.recall_target,
                )
            # one transfer for both results (each fresh-result fetch pays a
            # relay sync tick; see index/exact.py search)
            if out_w is not None and 0 < out_w < k:
                gid, dist = _shrink_results(dist, gid, out_w)
            gid, dist = jax.device_get((gid, dist))
            gid = np.asarray(gid)
            dist = np.asarray(dist, dtype=np.float32)
            # map grouped/spill ids back to physical rows
            rows = np.full_like(gid, -1, dtype=np.int64)
            g = gid >= 0
            in_spill = gid >= self.grouped.shape[0]
            rows[g & ~in_spill] = self.row_ids[gid[g & ~in_spill]]
            sp = g & in_spill
            rows[sp] = self.spill_row_ids[gid[sp] - self.grouped.shape[0]]
            out_d.append(dist[:n_real])
            out_r.append(rows[:n_real])
        return np.concatenate(out_d), np.concatenate(out_r)

    # ------------------------------------------------------------- mutations

    def _inverse_maps(self):
        """phys_row -> grouped/spill position, built once (O(N)), making
        every later delete O(batch) instead of np.isin over the corpus +
        a full-array device re-upload (VERDICT r1 weak #4)."""
        if getattr(self, "_inv_g", None) is None:
            self._inv_g, self._inv_s = build_inverse_maps(
                self.row_ids, self.spill_row_ids)
        return self._inv_g, self._inv_s

    def invalidate_rows(self, physical_rows: np.ndarray):
        """Soft-delete: mark grouped/spill slots of these physical rows
        invalid. O(batch) host lookup + fixed-bucket device scatters of
        just the touched indices (no full-array re-upload); full rebuild
        happens at compaction."""
        phys = np.asarray(physical_rows, np.int64)
        if phys.size == 0:
            return
        g_hits, s_hits = lookup_inverse(*self._inverse_maps(), phys)
        self.grouped_valid = self._scatter_bucketed(
            self.grouped_valid, g_hits)
        self.spill_valid = self._scatter_bucketed(self.spill_valid, s_hits)

    def append_rows(self, physical_rows: np.ndarray,
                    vectors: np.ndarray) -> bool:
        """Incrementally add rows WITHOUT re-clustering (the engine's
        sustained-ingest path: a full k-means rebuild at 1M rows costs
        minutes; this costs one assignment GEMM + bucketed scatters).

        Each row is assigned to its nearest EXISTING centroid and written
        into that cell's free alignment slots (inside the scan window, so
        probes see it immediately); full cells overflow into the reserved
        spill region (always scanned). Returns False — with NO state
        mutated — when capacity is exhausted; the caller then does a full
        rebuild. Centroids drift from optimal as cells absorb appends;
        compaction's rebuild restores clustering quality.
        """
        from tpuvdb.kernels.kmeans import assign_blockwise

        phys = np.asarray(physical_rows, np.int64)
        vecs = np.asarray(vectors, np.float32)
        m = len(phys)
        if m == 0:
            return True
        # shape-stable CHUNKED assignment: fixed 16384-row blocks so ONE
        # compiled shape serves every batch size. (A round-up-to-16384 pad
        # compiled per pad step — and the serving append typically carries
        # delta_max + flush_batch rows, i.e. a 32768 pad never precompiled
        # by warm_append, stalling puts/searches on a fresh XLA compile
        # under the engine lock.)
        assign = np.empty(m, np.int32)
        for lo in range(0, m, _ASSIGN_CHUNK):
            chunk = vecs[lo : lo + _ASSIGN_CHUNK]
            vp = np.zeros((_ASSIGN_CHUNK, vecs.shape[1]), np.float32)
            vp[: len(chunk)] = chunk
            assign[lo : lo + _ASSIGN_CHUNK] = np.asarray(
                assign_blockwise(jnp.asarray(vp), self.centroids,
                                 block_size=2048))[: len(chunk)]

        # ---- plan ALL slot allocations first; bail before any mutation
        offs = np.asarray(self.cell_offsets).astype(np.int64)
        lens = np.asarray(self.cell_lens).astype(np.int64)
        glen = self.grouped.shape[0]
        nexts = np.empty_like(offs)
        if len(offs) > 1:
            nexts[:-1] = offs[1:]
        nexts[-1] = min(glen, int(offs[-1]) + self.cell_pad)
        # usable capacity: allocated span, clipped to the scan window
        # (rows past offset+cell_pad would never be probed)
        caps = np.minimum(nexts - offs, self.cell_pad)
        spill_len = int((np.asarray(self.spill_row_ids) >= 0).sum())
        s_cap = self.spill.shape[0]
        g_pos: list = []
        g_take: list = []
        s_take: list = []
        for i in range(m):
            c = int(assign[i])
            if lens[c] < caps[c]:
                g_pos.append(int(offs[c] + lens[c]))
                lens[c] += 1
                g_take.append(i)
            elif spill_len + len(s_take) < s_cap:
                s_take.append(i)
            else:
                return False  # out of room everywhere: rebuild

        # ---- commit: host maps first, then bucketed device scatters
        if self.pq:
            # residual encode against each row's ASSIGNED cell, in the
            # same fixed chunk shape as the assignment GEMM (one compiled
            # encode serves every serving batch size); sq is the full
            # reconstruction norm ||c + r_hat||^2
            from tpuvdb.kernels.pq import encode_pq_residual_chunked

            # pass DEVICE arrays straight through: np.asarray(centroids)
            # here fetched ~16 MB via the ~1 MB/s relay on EVERY append —
            # a 16 s stall under the engine lock
            payload, sq = encode_pq_residual_chunked(
                vecs, assign, self.centroids,
                self.pq_codebooks, chunk=_ASSIGN_CHUNK,
                rotation=self.pq_rotation)
        else:
            payload = vecs
            sq = np.einsum("nd,nd->n", vecs, vecs).astype(np.float32)
        if self.quantized:
            from tpuvdb.kernels.quant import quantize_rows_np

            qvecs, qscales = quantize_rows_np(vecs)
        self.cell_lens = jnp.asarray(lens, jnp.int32)
        self._inv_g = self._inv_s = None  # inverse maps grew: rebuild lazily
        if g_take:
            gp = np.asarray(g_pos, np.int64)
            gt = np.asarray(g_take, np.int64)
            self.row_ids = np.asarray(self.row_ids).copy()
            (self.grouped, self.grouped_sq, self.grouped_valid,
             self.cell_scales) = commit_append_region(
                self.grouped, self.grouped_sq, self.grouped_valid,
                self.cell_scales, self.row_ids, gp, phys[gt], payload[gt],
                sq[gt], qvecs[gt] if self.quantized else None,
                qscales[gt] if self.quantized else None)
        if s_take:
            st = np.asarray(s_take, np.int64)
            sp = spill_len + np.arange(len(st), dtype=np.int64)
            self.spill_row_ids = np.asarray(self.spill_row_ids).copy()
            (self.spill, self.spill_sq, self.spill_valid,
             self.spill_scales) = commit_append_region(
                self.spill, self.spill_sq, self.spill_valid,
                self.spill_scales, self.spill_row_ids, sp, phys[st],
                payload[st], sq[st], qvecs[st] if self.quantized else None,
                qscales[st] if self.quantized else None)
            if self.pq:  # residual cell ids for the new spill rows
                self.spill_cells = self._scatter_payload(
                    self.spill_cells, sp, assign[st].astype(np.int32),
                    jnp.int32)
        return True

    def warm_append(self):
        """Compile the append-path programs (assignment GEMM + one bucket
        of each scatter, with all-pad dropped indices) at (re)build time.
        The first serving-path append otherwise pays every compile while
        holding the engine lock — measured ~27 s through the remote-
        compile relay — stalling puts and searches mid-serving. Rebuilds
        already run on the slow path, so the cost lands where stalls are
        expected, and the compile cache makes later appends ~0.2 s."""
        from tpuvdb.kernels.kmeans import assign_blockwise

        d = int(self.centroids.shape[1])  # grouped width != d for PQ cells
        assign_blockwise(jnp.zeros((_ASSIGN_CHUNK, d), jnp.float32),
                         self.centroids, block_size=2048)
        if self.pq:
            from tpuvdb.kernels.pq import encode_pq_residual_chunked

            encode_pq_residual_chunked(
                np.zeros((1, d), np.float32), np.zeros(1, np.int64),
                self.centroids, self.pq_codebooks,
                chunk=_ASSIGN_CHUNK,
                rotation=self.pq_rotation)
            pad_pos = np.full(1, self.spill_cells.shape[0], np.int64)
            self.spill_cells = self._scatter_payload(
                self.spill_cells, pad_pos, np.zeros(1, np.int32), jnp.int32)
        z = np.zeros((1, int(self.grouped.shape[1])), np.float32)
        s1 = np.zeros(1, np.float32)
        for arr_name, payload in (("grouped", z), ("grouped_sq", s1),
                                  ("spill", z), ("spill_sq", s1)):
            arr = getattr(self, arr_name)
            pad_pos = np.full(1, arr.shape[0], np.int64)  # dropped
            setattr(self, arr_name, self._scatter_payload(
                arr, pad_pos, payload, arr.dtype))
        for arr_name in ("grouped_valid", "spill_valid"):
            arr = getattr(self, arr_name)
            pad_pos = np.full(1, arr.shape[0], np.int64)
            setattr(self, arr_name, self._scatter_flags(arr, pad_pos))
        if self.quantized:
            for arr_name in ("cell_scales", "spill_scales"):
                arr = getattr(self, arr_name)
                pad_pos = np.full(1, arr.shape[0], np.int64)
                setattr(self, arr_name, self._scatter_payload(
                    arr, pad_pos, s1, jnp.float32))

    @staticmethod
    def _scatter_payload(arr, pos: np.ndarray, vals: np.ndarray, dtype):
        """Fixed-bucket scatter of value rows/scalars at pos (one compile
        per (arr shape, bucket); pad indices out of range -> dropped)."""
        n_slots = arr.shape[0]
        tail = (vals.shape[1:]) if vals.ndim > 1 else ()
        for lo in range(0, len(pos), _APPEND_BUCKET):
            idx = pos[lo : lo + _APPEND_BUCKET].astype(np.int32)
            chunk = vals[lo : lo + _APPEND_BUCKET]
            pad = _APPEND_BUCKET - len(idx)
            if pad:
                idx = np.concatenate([idx, np.full(pad, n_slots, np.int32)])
                chunk = np.concatenate(
                    [chunk, np.zeros((pad,) + tail, chunk.dtype)])
            arr = _scatter_rows(arr, jnp.asarray(idx),
                                jnp.asarray(chunk).astype(dtype))
        return arr

    @staticmethod
    def _scatter_flags(valid, pos: np.ndarray):
        n_slots = valid.shape[0]
        for lo in range(0, len(pos), _APPEND_BUCKET):
            idx = pos[lo : lo + _APPEND_BUCKET].astype(np.int32)
            pad = _APPEND_BUCKET - len(idx)
            if pad:
                idx = np.concatenate([idx, np.full(pad, n_slots, np.int32)])
            valid = _scatter_flag(valid, jnp.asarray(idx), True)
        return valid

    @staticmethod
    def _scatter_bucketed(valid, hits: np.ndarray):
        n_slots = valid.shape[0]
        for lo in range(0, len(hits), _DELETE_BUCKET):
            chunk = hits[lo : lo + _DELETE_BUCKET].astype(np.int32)
            pad = _DELETE_BUCKET - len(chunk)
            if pad:  # pad with out-of-range (dropped by mode="drop")
                chunk = np.concatenate(
                    [chunk, np.full(pad, n_slots, np.int32)])
            valid = _scatter_flag(valid, jnp.asarray(chunk), False)
        return valid

    def stats(self) -> IVFStats:
        gval = np.asarray(self.grouped_valid)
        return IVFStats(
            nlist=self.nlist,
            cell_pad=self.cell_pad,
            spill_rows=int(np.asarray(self.spill_valid).sum()),
            grouped_rows=int(self.grouped.shape[0]),
            fill=float(gval.mean()),
        )
