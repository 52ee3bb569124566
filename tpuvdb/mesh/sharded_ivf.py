"""Distributed IVF: per-device coarse quantizers + collective top-k merge.

BASELINE config 3 (Deep10M-class IVF on an 8-shard mesh): each device owns
a row range of the corpus and builds its OWN k-means cell structure over
it — no global quantizer to synchronize, and cell quality tracks the local
data distribution. A query broadcasts to all devices inside one shard_map
program; each device scores its local centroids, scans its nprobe nearest
cells (plus its spill region), and the per-device top-k candidates merge
with an `all_gather` over ICI — the same collective pattern as the flat
sharded search (tpuvdb.mesh.sharded), with IVF's (nlist/nprobe)x HBM
traffic reduction per device.

Device arrays carry a leading device axis sharded over the mesh:
    centroids     (ndev, nlist, d)
    grouped       (ndev, nlist * cell_pad, d)   cell c = rows [c*P, (c+1)*P)
    grouped_sq/valid, spill*, analogous
Grouped ids encode (device, local position); the host-side row_ids tables
map them back to global physical rows.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from tpuvdb.kernels.kmeans import kmeans, assign_blockwise

shard_map = jax.shard_map


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _round_up_arr_np(x: np.ndarray, m: int) -> np.ndarray:
    return ((x + m - 1) // m) * m


@functools.lru_cache(maxsize=16)
def _build_program(mesh, axis: str, k: int, nprobe: int, cell_pad: int,
                   recall_target: float, local_rows: int, spill_rows: int,
                   use_pallas: bool = False, quantized: bool = False,
                   repl_axis: Optional[str] = None, pq: bool = False,
                   opq: bool = False):
    """One shard_map program per (mesh, shape) signature. With `repl_axis`
    (a 2-D (repl, shards) mesh) the query batch SPLITS over the replica
    axis — each replica group serves its slice against its full copy of
    the sharded cell structures (data specs mention only `axis`, so XLA
    replicates them across `repl_axis`) — and the out_specs concatenate
    the slices back. Mirrors mesh/replicated.py for the flat index."""
    ndev = mesh.shape[axis]

    def local_gather(q, cents, offsets, lens, grouped, gscale, gsq, gval,
                     spill, sscale, ssq, sval, cbs, scells, rot):
        """XLA row-gather probe (CPU path / fallback). Cells are PACKED at
        offsets with lens live rows; window over-scan is masked so a row
        probed via two cells cannot occupy two top-k slots."""
        qf = q.astype(jnp.float32)
        q_sq = jnp.sum(qf * qf, axis=-1, keepdims=True)
        c_sq = jnp.sum(cents * cents, axis=-1)
        qc2 = 2.0 * jnp.dot(qf, cents.T,
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
        c_scores = qc2 - c_sq[None, :]
        _, cells = jax.lax.top_k(c_scores, nprobe)

        offs = jax.lax.broadcasted_iota(jnp.int32, (1, 1, cell_pad), 2)
        starts = jnp.take(offsets, cells, axis=0)
        cand = (starts[:, :, None] + offs).reshape(q.shape[0], -1)
        in_cell = (offs < jnp.take(lens, cells, axis=0)[:, :, None]
                   ).reshape(q.shape[0], -1)
        csq = jnp.take(gsq, cand, axis=0)
        cval = jnp.take(gval, cand, axis=0)
        if pq:
            # RESIDUAL PQ code cells: d^2 = ||q||^2 - 2q.c - 2q.r_hat
            # + ||c + r_hat||^2 — centroid term from the coarse GEMM,
            # ADC against the query-only LUT, stored reconstruction
            # norms in csq (see index/ivf.py _ivf_search_pq)
            from tpuvdb.kernels import pq as pqk

            # OPQ (static flag): the rotation folds into the LUT build
            lut = pqk._pq_lut(qf, cbs, rot if opq else None)
            codes_g = jnp.take(grouped, cand, axis=0)       # (Q, R, M)
            dots_half = pqk.adc_scores_grouped(lut, codes_g)  # = 2 q.r
            qc_cand = jnp.repeat(jnp.take_along_axis(qc2, cells, axis=1),
                                 cell_pad, axis=1)
            neg = jnp.where(cval & in_cell,
                            qc_cand + dots_half - csq, -jnp.inf)
            s_n = spill.shape[0]
            m_subq, n_codes = cbs.shape[0], cbs.shape[1]
            sc = pqk._maybe_unpack(spill, n_codes)
            jota = jnp.arange(n_codes, dtype=jnp.int32)
            onehot = (sc[:, :, None] == jota).astype(jnp.bfloat16)
            sdots = jax.lax.dot_general(
                lut.reshape(lut.shape[0], -1).astype(jnp.bfloat16),
                onehot.reshape(s_n, m_subq * n_codes),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            qc_spill = jnp.take(qc2, jnp.clip(scells, 0, qc2.shape[1] - 1),
                                axis=1)
            sneg = jnp.where(sval[None, :],
                             qc_spill + sdots - ssq[None, :], -jnp.inf)
            spill_ids = local_rows + jax.lax.broadcasted_iota(
                jnp.int32, (1, s_n), 1)
            all_neg = jnp.concatenate(
                [neg, jnp.broadcast_to(sneg, (q.shape[0], s_n))], axis=1)
            all_ids = jnp.concatenate(
                [cand, jnp.broadcast_to(spill_ids, (q.shape[0], s_n))],
                axis=1)
            kk = min(k, all_neg.shape[1])
            lneg, pos = jax.lax.approx_max_k(all_neg, kk,
                                             recall_target=recall_target)
            lids = jnp.take_along_axis(all_ids, pos.astype(jnp.int32),
                                       axis=1)
            lids = jnp.where(lneg == -jnp.inf, -1, lids)
            ldist = jnp.where(lids >= 0, q_sq - lneg, jnp.inf)
            return ldist, lids, kk
        if quantized:
            # scaled int8 cells: dequantize at the gather (small candidate
            # set), norms stay exact f32 (index/ivf.py int8 scheme)
            cvecs = jnp.take(grouped, cand, axis=0).astype(jnp.float32)
            cvecs = cvecs * jnp.take(gscale, cand, axis=0)[:, :, None]
            dots = jnp.einsum("qd,qrd->qr", qf, cvecs,
                              preferred_element_type=jnp.float32)
        else:
            cvecs = jnp.take(grouped, cand, axis=0)
            dots = jnp.einsum("qd,qrd->qr", q.astype(grouped.dtype), cvecs,
                              preferred_element_type=jnp.float32)
        neg = jnp.where(cval & in_cell, 2.0 * dots - csq, -jnp.inf)

        if quantized:
            spill_f = spill.astype(jnp.float32) * sscale[:, None]
            sdots = jnp.dot(qf, spill_f.T, preferred_element_type=jnp.float32)
        else:
            sdots = jnp.dot(q.astype(grouped.dtype), spill.T,
                            preferred_element_type=jnp.float32)
        sneg = jnp.where(sval[None, :], 2.0 * sdots - ssq[None, :], -jnp.inf)
        spill_ids = local_rows + jax.lax.broadcasted_iota(
            jnp.int32, (1, spill.shape[0]), 1)
        all_neg = jnp.concatenate(
            [neg, jnp.broadcast_to(sneg, (q.shape[0], sneg.shape[1]))], axis=1)
        all_ids = jnp.concatenate(
            [cand, jnp.broadcast_to(spill_ids, (q.shape[0], spill_ids.shape[1]))],
            axis=1)

        kk = min(k, all_neg.shape[1])
        lneg, pos = jax.lax.approx_max_k(all_neg, kk,
                                         recall_target=recall_target)
        lids = jnp.take_along_axis(all_ids, pos.astype(jnp.int32), axis=1)
        lids = jnp.where(lneg == -jnp.inf, -1, lids)
        ldist = jnp.where(lids >= 0, q_sq - lneg, jnp.inf)
        return ldist, lids, kk

    def local(q, cents, offsets, lens, grouped, gscale, gsq, gval,
              spill, sscale, ssq, sval, cbs, scells, rot):
        # leading device axis arrives as size-1 blocks
        cents, grouped = cents[0], grouped[0]
        offsets, lens = offsets[0], lens[0]
        gscale, sscale = gscale[0], sscale[0]
        gsq, gval = gsq[0], gval[0]
        spill, ssq, sval = spill[0], ssq[0], sval[0]
        scells = scells[0]

        if use_pallas:
            # scalar-prefetch cell-DMA probe (tpuvdb.kernels.pallas_ivf):
            # ~50x faster than row gathers on TPU
            from tpuvdb.kernels.pallas_ivf import pallas_ivf_search

            ldist, lids = pallas_ivf_search(
                q, cents, grouped, gsq, gval,
                cell_pad=cell_pad, k=k, nprobe=nprobe,
                query_tile=min(8, q.shape[0]),
                spill=spill, spill_sq=ssq, spill_valid=sval,
                cell_offsets=offsets,
                cell_scales=gscale if quantized else None,
                spill_scales=sscale if quantized else None,
            )
            kk = lids.shape[1]
        else:
            ldist, lids, kk = local_gather(q, cents, offsets, lens, grouped,
                                           gscale, gsq, gval, spill,
                                           sscale, ssq, sval, cbs, scells,
                                           rot)

        # encode device ownership, merge across the mesh on TRUE distances
        # (the per-query ||q||^2 shift is constant, so ordering is global)
        me = jax.lax.axis_index(axis)
        stride = local_rows + spill_rows
        gids = jnp.where(lids >= 0, lids + me * stride, -1)
        lneg = jnp.where(lids >= 0, -ldist, -jnp.inf)
        neg_all = jax.lax.all_gather(lneg, axis)
        ids_all = jax.lax.all_gather(gids, axis)
        qn = q.shape[0]
        neg_all = jnp.moveaxis(neg_all, 0, 1).reshape(qn, ndev * kk)
        ids_all = jnp.moveaxis(ids_all, 0, 1).reshape(qn, ndev * kk)
        top_neg, tpos = jax.lax.top_k(neg_all, k)
        top_ids = jnp.take_along_axis(ids_all, tpos, axis=-1)
        dist = jnp.where(top_ids >= 0, -top_neg, jnp.inf)
        return dist, top_ids

    q_spec = P(repl_axis) if repl_axis is not None else P()
    fn = shard_map(
        local,
        mesh=mesh,
        # codebooks + OPQ rotation replicate to every device (P()); spill
        # cell ids ride the device axis like the other spill arrays
        in_specs=(q_spec, P(axis), P(axis), P(axis), P(axis), P(axis),
                  P(axis), P(axis), P(axis), P(axis), P(axis), P(axis),
                  P(), P(axis), P()),
        out_specs=(q_spec, q_spec),
        check_vma=False,
    )
    return jax.jit(fn)


class ShardedIVFIndex:
    def __init__(self, mesh, axis, centroids, cell_offsets, cell_lens,
                 grouped, gsq, gval, spill, ssq, sval, row_ids, spill_row_ids,
                 cell_pad, nprobe, recall_target,
                 cell_scales=None, spill_scales=None, rows_per_dev=0,
                 cell_caps=None, repl_axis=None, pq_codebooks=None,
                 spill_cells=None, pq_rotation=None):
        self.mesh = mesh
        self.axis = axis
        # 2-D (repl, shards) mesh: cell structures replicate across this
        # axis (P(axis) specs leave it unmentioned) and search splits the
        # query batch over it — same layout as index/exact.py:321-339
        self.repl_axis = repl_axis
        self.rows_per_dev = rows_per_dev  # global-row ownership stride
        # (ndev, nlist) host i64: each cell's ALLOCATED span (clipped to
        # the scan window) fixed at build time — the offset-difference
        # the single-device planner uses is wrong here because pad
        # centroids' offsets point at the tail and can PRECEDE live
        # offsets, clipping the last live cell's capacity to 0
        self.cell_caps = cell_caps
        self.centroids = centroids
        self.cell_offsets = cell_offsets  # (ndev, nlist) i32, P(axis)
        self.cell_lens = cell_lens        # (ndev, nlist) i32, P(axis)
        self.grouped = grouped
        self.gsq = gsq
        self.gval = gval
        self.spill = spill
        self.ssq = ssq
        self.sval = sval
        self.row_ids = row_ids            # (ndev, local_rows) -> global row
        self.spill_row_ids = spill_row_ids  # (ndev, spill_rows)
        self.cell_pad = cell_pad
        self.nprobe = nprobe
        self.recall_target = recall_target
        self.cell_scales = cell_scales    # (ndev, local_rows) f32 | None
        self.spill_scales = spill_scales  # (ndev, spill_rows) f32 | None
        self.quantized = cell_scales is not None
        # PQ code cells: GLOBAL codebooks (replicated to every device);
        # the coarse structure stays per-device
        self.pq_codebooks = (jnp.asarray(pq_codebooks, jnp.float32)
                             if pq_codebooks is not None else None)
        self.pq = pq_codebooks is not None
        # OPQ rotation of the residual space (replicated, like codebooks)
        self.pq_rotation = (jnp.asarray(pq_rotation, jnp.float32)
                            if pq_rotation is not None else None)
        if self.pq and spill_cells is None:
            spill_cells = jax.device_put(
                jnp.zeros(self.sval.shape, jnp.int32),
                NamedSharding(mesh, P(axis)))
        self.spill_cells = spill_cells  # (ndev, S) i32 | None
        # host copies for checkpointing (same contract as
        # IVFIndex.centroids_np: fetch once, not per checkpoint)
        self._centroids_np = (np.asarray(centroids, np.float32)
                              if isinstance(centroids, np.ndarray) else None)
        self._pq_codebooks_np = (
            np.asarray(pq_codebooks, np.float32)
            if isinstance(pq_codebooks, np.ndarray) else None)
        self._pq_rotation_np = (
            np.asarray(pq_rotation, np.float32)
            if isinstance(pq_rotation, np.ndarray) else None)

    def centroids_np(self) -> np.ndarray:
        if self._centroids_np is None:
            self._centroids_np = np.asarray(self.centroids)
        return self._centroids_np

    def pq_codebooks_np(self):
        if self._pq_codebooks_np is None and self.pq:
            self._pq_codebooks_np = np.asarray(self.pq_codebooks)
        return self._pq_codebooks_np

    def pq_rotation_np(self):
        if self._pq_rotation_np is None and self.pq_rotation is not None:
            self._pq_rotation_np = np.asarray(self.pq_rotation)
        return self._pq_rotation_np

    @classmethod
    def build(
        cls,
        vectors: np.ndarray,   # (N, d): device i owns rows [i*N/ndev, ...)
        valid: np.ndarray,
        mesh: jax.sharding.Mesh,
        axis: str = "shards",
        nlist: int = 64,       # cells PER DEVICE
        nprobe: int = 16,
        kmeans_iters: int = 8,
        cell_cap_quantile: float = 0.98,
        dtype=jnp.float32,
        seed: int = 0,
        recall_target: float = 0.95,
        centroids: Optional[np.ndarray] = None,  # (ndev, nl, d) warm-start
        repl_axis: Optional[str] = None,  # 2-D mesh: the replica axis
        pq_subq: int = 0,                 # >0: PQ code cells (IVF-PQ)
        pq_codebooks: Optional[np.ndarray] = None,  # warm-start codebooks
        opq: bool = False,                # learned OPQ residual rotation
        pq_rotation: Optional[np.ndarray] = None,   # warm-start rotation
        pq_bits: int = 8,                 # 8 | 4 (fast-scan)
    ) -> "ShardedIVFIndex":
        ndev = mesh.shape[axis]
        n, d = vectors.shape
        if n % ndev != 0:
            raise ValueError(f"rows {n} % devices {ndev} != 0")
        per = n // ndev
        if pq_codebooks is not None and not pq_subq:
            from tpuvdb.kernels.pq import pq_code_bytes

            pq_subq = pq_code_bytes(pq_codebooks)
        if pq_subq:
            if pq_bits not in (8, 4):
                raise ValueError(f"pq_bits={pq_bits} must be 8 or 4")
            pq_m = pq_subq if pq_bits == 8 else 2 * pq_subq
            pq_j = 256 if pq_bits == 8 else 16
            if d % pq_m != 0:
                raise ValueError(
                    f"pq_subq={pq_subq} at pq_bits={pq_bits} needs "
                    f"{pq_m} subspaces to divide dim={d}")
            if dtype == jnp.int8:
                raise ValueError("pq_subq and int8 cells are exclusive")
            if (pq_codebooks is not None
                    and pq_codebooks.shape != (pq_m, pq_j, d // pq_m)):
                pq_codebooks = None  # stale warm shape/tier: retrain
            if pq_rotation is not None and pq_rotation.shape != (d, d):
                pq_rotation = None
                pq_codebooks = None  # codebooks are tied to their rotation
            if opq and pq_codebooks is not None and pq_rotation is None:
                pq_codebooks = None  # un-rotated warm codebooks: retrain
            if not opq:
                pq_rotation = None
            # (codebooks train AFTER the per-device assignment below:
            # residual coding needs (x - c_assign) samples)
        warm = centroids
        if (warm is not None
                and (warm.ndim != 3 or warm.shape[0] != ndev
                     or warm.shape[2] != d)):
            warm = None  # partition geometry changed: retrain

        parts = []
        for dev in range(ndev):
            lo = dev * per
            part_vec = vectors[lo : lo + per]
            part_val = valid[lo : lo + per]
            live = np.flatnonzero(part_val)
            nl = max(1, min(nlist, max(1, len(live) // 4)))
            wc = None
            if warm is not None:
                wc = warm[dev][warm[dev][:, 0] < 1e29]  # drop table pads
            if len(live) == 0:
                # 1e30 pads, NOT zeros: a zero table saved for an empty
                # partition would pass the warm-start pad filter on a
                # later restart and collapse the device into one
                # degenerate cell (review finding, round 2)
                cents = np.full((nlist, d), 1e30, np.float32)
                assign = np.full(per, -1, np.int32)
            else:
                if wc is not None and len(wc):
                    # checkpoint warm-start: this device's trained
                    # centroids skip the per-device k-means run
                    cents = np.asarray(wc, np.float32)
                    nl = len(cents)
                else:
                    cents, _ = kmeans(part_vec[live],
                                      np.ones(len(live), bool),
                                      nlist=nl, iters=kmeans_iters,
                                      block_size=4096, seed=seed + dev)
                if nl < nlist:  # pad centroid table to the common size
                    cents = np.concatenate(
                        [cents, np.full((nlist - nl, d), 1e30, np.float32)])
                pad_rows = _round_up(per, 4096)
                vp = np.zeros((pad_rows, d), np.float32)
                vp[:per] = part_vec
                assign = np.asarray(assign_blockwise(
                    jnp.asarray(vp), jnp.asarray(cents[:nl]), block_size=4096
                ))[:per]
                assign = np.where(part_val, assign, -1).astype(np.int32)
            parts.append((part_vec, part_val, cents, assign, lo))

        if pq_subq and pq_codebooks is None:
            # residual codebooks: train on (x - c_assign) pooled across
            # devices (global codebooks over per-device coarse structures;
            # pre-split assignments — the residual DISTRIBUTION barely
            # moves under bisection, and encoding below uses final cells)
            from tpuvdb.kernels.pq import train_opq, train_pq

            rng_ = np.random.default_rng(seed)
            res_parts = []
            budget = 262_144
            for part_vec, part_val, cents, assign, _ in parts:
                live = np.flatnonzero(part_val & (assign >= 0))
                if not len(live):
                    continue
                take = (rng_.choice(live, min(len(live),
                                              budget // max(len(parts), 1)),
                                    replace=False)
                        if len(live) > budget // max(len(parts), 1)
                        else live)
                res_parts.append(part_vec[take] - cents[assign[take]])
            pooled_res = np.concatenate(res_parts).astype(np.float32)
            if opq:
                # one GLOBAL rotation over the pooled residuals (the
                # codebooks are global too, so the rotation must be)
                pq_codebooks, pq_rotation = train_opq(
                    pooled_res, m_subq=pq_m, seed=seed, n_codes=pq_j)
            else:
                pq_codebooks = train_pq(pooled_res, m_subq=pq_m,
                                        seed=seed, n_codes=pq_j)

        # common scan window across devices: pooled median * 1.25, then
        # per-device bisection of oversized cells + PACKED layout (see
        # index/ivf.py pack_cells — fixed-stride padding measured fill
        # ~0.43 under skew)
        from tpuvdb.index.ivf import pack_cells, split_oversized_cells

        pooled = []
        for _, part_val, _, assign, _ in parts:
            la = assign[assign >= 0]
            if len(la):
                pooled.append(np.bincount(la))
        pooled_sizes = (np.concatenate(pooled) if pooled
                        else np.asarray([1]))
        pooled_sizes = pooled_sizes[pooled_sizes > 0]
        cap = int(np.quantile(pooled_sizes, 0.5) * 1.25) if len(pooled_sizes) else 1
        if pq_subq:
            cap = min(cap, 2048)  # bound ADC candidates (index/ivf.py)
        cell_pad = max(_round_up(max(cap, 1), 128), 128)

        packed = []
        for dev, (part_vec, part_val, cents, assign, lo) in enumerate(parts):
            live_mask = part_val & (assign >= 0)
            if live_mask.any():
                cents2, assign2 = split_oversized_cells(
                    part_vec, assign, cents, cell_pad, seed=seed + dev)
            else:
                cents2, assign2 = cents, assign
            live = np.flatnonzero(part_val & (assign2 >= 0))
            gvec, gval_, grow, offs, lens, spill_local = pack_cells(
                part_vec, live, assign2[live], len(cents2), cell_pad)
            grow[grow >= 0] += lo          # local -> global physical rows
            spill_local = np.asarray(spill_local, np.int64)
            packed.append((cents2, gvec, gval_, grow, offs, lens,
                           (lo + spill_local).tolist(),
                           assign2[spill_local].astype(np.int32)))

        # common shapes across devices (stacked device-major arrays)
        nlist_c = max(len(pk[0]) for pk in packed)
        local_rows = max(pk[1].shape[0] for pk in packed)
        spill_n = max(max((len(pk[6]) for pk in packed), default=1), 1)
        # per-device spill reserve so append_rows can overflow full cells
        # without forcing a rebuild (scaled down for small partitions)
        reserve = min(4096, max(128, per // 8))
        spill_rows = _round_up(spill_n + reserve, 128)

        ndev_ = len(packed)
        cents_all = np.full((ndev_, nlist_c, d), 1e30, np.float32)
        grouped = np.zeros((ndev_, local_rows, d), np.float32)
        gval = np.zeros((ndev_, local_rows), bool)
        row_ids = np.full((ndev_, local_rows), -1, np.int64)
        offsets_all = np.zeros((ndev_, nlist_c), np.int32)
        lens_all = np.zeros((ndev_, nlist_c), np.int32)
        spill = np.zeros((ndev_, spill_rows, d), np.float32)
        sval = np.zeros((ndev_, spill_rows), bool)
        srow = np.full((ndev_, spill_rows), -1, np.int64)
        scell = np.zeros((ndev_, spill_rows), np.int32)
        for dev, (cents2, gvec, gval_, grow, offs, lens, spill_g,
                  spill_c) in enumerate(packed):
            nl, nr = len(cents2), gvec.shape[0]
            cents_all[dev, :nl] = cents2
            grouped[dev, :nr] = gvec
            gval[dev, :nr] = gval_
            row_ids[dev, :nr] = grow
            offsets_all[dev, :nl] = offs
            lens_all[dev, :nl] = lens
            # pad centroids' offsets point at the (always-invalid) tail
            offsets_all[dev, nl:] = max(local_rows - cell_pad, 0)
            for j, grow_row in enumerate(spill_g):
                spill[dev, j] = vectors[grow_row]
                sval[dev, j] = True
                srow[dev, j] = grow_row
            scell[dev, : len(spill_c)] = spill_c
        gsq = np.einsum("knd,knd->kn", grouped, grouped).astype(np.float32)
        ssq = np.einsum("knd,knd->kn", spill, spill).astype(np.float32)

        gscale = sscale = None
        if pq_subq:
            # RESIDUAL PQ code cells: each row encodes (x - c_cell); the
            # cell of a grouped position recovers from the packed offsets
            # (searchsorted over the ascending cell starts), spill rows
            # carry explicit cell ids. Pad rows encode garbage against a
            # zeroed centroid and stay masked by gval/sval.
            from tpuvdb.kernels.pq import encode_pq_residual_chunked

            gq = np.zeros(grouped.shape[:2] + (pq_subq,), np.uint8)
            sq8 = np.zeros(spill.shape[:2] + (pq_subq,), np.uint8)
            for dev in range(ndev_):
                cents2 = packed[dev][0]
                offs = packed[dev][4]
                safe = np.where(np.abs(cents2) > 1e29, 0.0,
                                cents2).astype(np.float32)
                pos_cell = np.clip(
                    np.searchsorted(offs, np.arange(local_rows),
                                    side="right") - 1, 0, len(offs) - 1)
                gq[dev], gsq[dev] = encode_pq_residual_chunked(
                    grouped[dev], None, safe[pos_cell], pq_codebooks,
                    rotation=pq_rotation)
                sq8[dev], ssq[dev] = encode_pq_residual_chunked(
                    spill[dev], None,
                    safe[np.clip(scell[dev], 0, len(safe) - 1)],
                    pq_codebooks, rotation=pq_rotation)
            grouped, spill = gq, sq8
        if dtype == jnp.int8:
            # scaled int8 cells: per-row quantization, exact f32 norms —
            # the HBM capacity knob for the 100M-scale config, now on the
            # distributed path too (was single-device only in r1)
            from tpuvdb.kernels.quant import quantize_rows_np

            gq = np.zeros(grouped.shape[:2] + (d,), np.int8)
            gscale = np.zeros(grouped.shape[:2], np.float32)
            sq8 = np.zeros(spill.shape[:2] + (d,), np.int8)
            sscale = np.zeros(spill.shape[:2], np.float32)
            for dev in range(ndev_):
                gq[dev], gscale[dev] = quantize_rows_np(grouped[dev])
                sq8[dev], sscale[dev] = quantize_rows_np(spill[dev])
            grouped, spill = gq, sq8

        def put(arr, spec):
            return jax.device_put(jnp.asarray(arr),
                                  NamedSharding(mesh, spec))

        Pax = P(axis)
        return cls(
            mesh, axis,
            centroids=put(cents_all, Pax),
            cell_offsets=put(offsets_all, Pax),
            cell_lens=put(lens_all, Pax),
            grouped=put(grouped if (dtype == jnp.int8 or pq_subq)
                        else grouped.astype(np.float32), Pax),
            gsq=put(gsq, Pax),
            gval=put(gval, Pax),
            spill=put(spill, Pax),
            ssq=put(ssq, Pax),
            sval=put(sval, Pax),
            row_ids=row_ids,
            spill_row_ids=srow,
            cell_pad=cell_pad,
            nprobe=min(nprobe, nlist_c),
            recall_target=recall_target,
            cell_scales=put(gscale, Pax) if gscale is not None else None,
            spill_scales=put(sscale, Pax) if sscale is not None else None,
            rows_per_dev=per,
            cell_caps=np.minimum(_round_up_arr_np(lens_all.astype(np.int64),
                                                  128), cell_pad),
            repl_axis=repl_axis,
            pq_codebooks=pq_codebooks,
            spill_cells=put(scell, Pax) if pq_subq else None,
            pq_rotation=pq_rotation,
        )

    def stats(self):
        from tpuvdb.index.ivf import IVFStats

        gval = np.asarray(self.gval)
        return IVFStats(
            nlist=int(self.centroids.shape[0] * self.centroids.shape[1]),
            cell_pad=self.cell_pad,
            spill_rows=int(np.asarray(self.sval).sum()),
            grouped_rows=int(self.grouped.shape[0] * self.grouped.shape[1]),
            fill=float(gval.mean()),
        )

    def _inverse_maps(self):
        """global phys row -> flat (dev*local+pos) slot, built once; makes
        deletes O(batch) with a device scatter of only the touched slots
        instead of np.isin over everything + full re-upload (r1 weak #4)."""
        if getattr(self, "_inv_g", None) is None:
            from tpuvdb.index.ivf import build_inverse_maps

            self._inv_g, self._inv_s = build_inverse_maps(
                self.row_ids, self.spill_row_ids)
        return self._inv_g, self._inv_s

    def invalidate_rows(self, physical_rows: np.ndarray):
        """Soft-delete by global physical row (engine delete path): O(batch)
        host lookup + bucketed scatter into the sharded masks; full rebuild
        happens at re-clustering."""
        from tpuvdb.index.ivf import IVFIndex, lookup_inverse

        phys = np.asarray(physical_rows, np.int64)
        if phys.size == 0:
            return
        g_hits, s_hits = lookup_inverse(*self._inverse_maps(), phys)
        ndev, local = self.gval.shape
        if len(g_hits):
            flat = self.gval.reshape(ndev * local)
            flat = IVFIndex._scatter_bucketed(flat, g_hits)
            self.gval = flat.reshape(ndev, local)
        sdev, slocal = self.sval.shape
        if len(s_hits):
            flat = self.sval.reshape(sdev * slocal)
            flat = IVFIndex._scatter_bucketed(flat, s_hits)
            self.sval = flat.reshape(sdev, slocal)

    def warm_append(self):
        """Compile the append-path scatter programs (one all-pad bucket
        per flat array shape) at (re)build time — mirrors
        IVFIndex.warm_append: the first serving-path append otherwise
        pays every compile while holding the engine lock."""
        from tpuvdb.index.ivf import IVFIndex

        ndev, local_rows = self.row_ids.shape
        sdev, spill_rows = self.spill_row_ids.shape
        d = self.grouped.shape[-1]
        Pax = NamedSharding(self.mesh, P(self.axis))
        z = np.zeros((1, d), np.float32)
        s1 = np.zeros(1, np.float32)
        plan = [("grouped", (ndev, local_rows, d), z),
                ("gsq", (ndev, local_rows), s1),
                ("spill", (sdev, spill_rows, d), z),
                ("ssq", (sdev, spill_rows), s1)]
        if self.quantized:
            plan += [("cell_scales", (ndev, local_rows), s1),
                     ("spill_scales", (sdev, spill_rows), s1)]
        for name, shape, payload in plan:
            arr = getattr(self, name)
            flat = arr.reshape((-1,) + arr.shape[2:])
            pad_pos = np.full(1, flat.shape[0], np.int64)  # dropped
            flat = IVFIndex._scatter_payload(flat, pad_pos, payload,
                                             flat.dtype)
            setattr(self, name, jax.device_put(flat.reshape(shape), Pax))
        for name, shape in (("gval", (ndev, local_rows)),
                            ("sval", (sdev, spill_rows))):
            arr = getattr(self, name)
            flat = arr.reshape(-1)
            pad_pos = np.full(1, flat.shape[0], np.int64)
            flat = IVFIndex._scatter_flags(flat, pad_pos)
            setattr(self, name, jax.device_put(flat.reshape(shape), Pax))
        if self.pq:
            from tpuvdb.kernels.pq import encode_pq_residual_chunked

            dim = int(self.centroids.shape[-1])
            encode_pq_residual_chunked(
                np.zeros((1, dim), np.float32), None,
                np.zeros((1, dim), np.float32),
                np.asarray(self.pq_codebooks),
                rotation=(np.asarray(self.pq_rotation)
                          if self.pq_rotation is not None else None))
            flat_sc = self.spill_cells.reshape(-1)
            pad_pos = np.full(1, flat_sc.shape[0], np.int64)
            flat_sc = IVFIndex._scatter_payload(
                flat_sc, pad_pos, np.zeros(1, np.int32), jnp.int32)
            self.spill_cells = jax.device_put(
                flat_sc.reshape(self.sval.shape),
                NamedSharding(self.mesh, P(self.axis)))

    def append_rows(self, physical_rows: np.ndarray,
                    vectors: np.ndarray) -> bool:
        """Incremental appends on the DISTRIBUTED index (same contract as
        IVFIndex.append_rows): each row routes to its owning device
        partition (global row // rows_per_dev, the build-time split),
        assigns to that device's nearest existing centroid, and lands in
        the cell's free window slots or the device's reserved spill tail.
        Allocation is fully planned before any mutation; False = some
        device is out of room (caller rebuilds)."""
        phys = np.asarray(physical_rows, np.int64)
        vecs = np.asarray(vectors, np.float32)
        m = len(phys)
        if m == 0:
            return True
        if not self.rows_per_dev:
            return False  # legacy ctor without ownership stride
        ndev, local_rows = self.row_ids.shape
        sdev, spill_rows = self.spill_row_ids.shape
        dev_of = phys // self.rows_per_dev
        if (dev_of >= ndev).any() or (dev_of < 0).any():
            return False  # rows outside the built partition: rebuild

        if self.cell_caps is None:
            return False  # legacy ctor without capacity table: rebuild
        cents_all = np.asarray(self.centroids)
        offs_all = np.asarray(self.cell_offsets).astype(np.int64)
        lens_all = np.asarray(self.cell_lens).astype(np.int64).copy()
        spill_fill = (np.asarray(self.spill_row_ids) >= 0).sum(axis=1)

        # ---- plan per device (host 2-means-style assignment: the batch
        # is small and per-device centroid tables differ in live count,
        # so a padded device call per device would compile per shape)
        g_pos_flat: list = []
        g_take: list = []
        s_pos_flat: list = []
        s_take: list = []
        assign_global = np.zeros(m, np.int32)  # residual-PQ encode cells
        for dev in range(ndev):
            sel = np.flatnonzero(dev_of == dev)
            if not len(sel):
                continue
            cents = cents_all[dev]
            live_c = cents[:, 0] < 1e29  # 1e30 rows pad the centroid table
            if not live_c.any():
                return False
            cids = np.flatnonzero(live_c)
            sub = vecs[sel]
            d2 = (np.einsum("nd,nd->n", sub, sub)[:, None]
                  - 2.0 * (sub @ cents[cids].T)
                  + np.einsum("kd,kd->k", cents[cids], cents[cids])[None, :])
            assign = cids[np.argmin(d2, axis=1)]
            assign_global[sel] = assign
            caps = self.cell_caps[dev]
            fill = int(spill_fill[dev])
            for i, c in zip(sel, assign):
                if lens_all[dev, c] < caps[c]:
                    pos = int(offs_all[dev, c] + lens_all[dev, c])
                    g_pos_flat.append(dev * local_rows + pos)
                    lens_all[dev, c] += 1
                    g_take.append(i)
                elif fill < spill_rows:
                    s_pos_flat.append(dev * spill_rows + fill)
                    fill += 1
                    s_take.append(i)
                else:
                    return False

        # ---- commit: the shared region helper on flattened views, then
        # re-shard each updated array back over the mesh axis
        from tpuvdb.index.ivf import commit_append_region

        if self.pq:
            # residual encode against each row's assigned cell on its
            # owning device (per-row centroid mode: tables differ per
            # device); assign_global was recorded in the plan loop
            from tpuvdb.kernels.pq import encode_pq_residual_chunked

            crows = cents_all[dev_of, assign_global]
            payload, sq = encode_pq_residual_chunked(
                vecs, None, crows, np.asarray(self.pq_codebooks),
                rotation=(np.asarray(self.pq_rotation)
                          if self.pq_rotation is not None else None))
        else:
            payload = vecs
            sq = np.einsum("nd,nd->n", vecs, vecs).astype(np.float32)
        if self.quantized:
            from tpuvdb.kernels.quant import quantize_rows_np

            qvecs, qscales = quantize_rows_np(vecs)
        Pax = NamedSharding(self.mesh, P(self.axis))

        def reshard(flat, shape):
            return jax.device_put(flat.reshape(shape), Pax)

        self.cell_lens = jax.device_put(
            jnp.asarray(lens_all, jnp.int32), Pax)
        self._inv_g = self._inv_s = None
        d = int(self.grouped.shape[-1])  # M for PQ cells, dim otherwise
        if g_take:
            gp = np.asarray(g_pos_flat, np.int64)
            gt = np.asarray(g_take, np.int64)
            self.row_ids = np.asarray(self.row_ids).copy()
            vec_a, sq_a, val_a, scale_a = commit_append_region(
                self.grouped.reshape(ndev * local_rows, d),
                self.gsq.reshape(-1), self.gval.reshape(-1),
                self.cell_scales.reshape(-1) if self.quantized else None,
                self.row_ids.reshape(-1), gp, phys[gt], payload[gt], sq[gt],
                qvecs[gt] if self.quantized else None,
                qscales[gt] if self.quantized else None)
            self.grouped = reshard(vec_a, (ndev, local_rows, d))
            self.gsq = reshard(sq_a, (ndev, local_rows))
            self.gval = reshard(val_a, (ndev, local_rows))
            if self.quantized:
                self.cell_scales = reshard(scale_a, (ndev, local_rows))
        if s_take:
            sp = np.asarray(s_pos_flat, np.int64)
            st = np.asarray(s_take, np.int64)
            self.spill_row_ids = np.asarray(self.spill_row_ids).copy()
            vec_a, sq_a, val_a, scale_a = commit_append_region(
                self.spill.reshape(sdev * spill_rows, d),
                self.ssq.reshape(-1), self.sval.reshape(-1),
                self.spill_scales.reshape(-1) if self.quantized else None,
                self.spill_row_ids.reshape(-1), sp, phys[st], payload[st],
                sq[st], qvecs[st] if self.quantized else None,
                qscales[st] if self.quantized else None)
            self.spill = reshard(vec_a, (sdev, spill_rows, d))
            self.ssq = reshard(sq_a, (sdev, spill_rows))
            self.sval = reshard(val_a, (sdev, spill_rows))
            if self.quantized:
                self.spill_scales = reshard(scale_a, (sdev, spill_rows))
            if self.pq:  # residual cell ids for the new spill rows
                from tpuvdb.index.ivf import IVFIndex

                flat_sc = IVFIndex._scatter_payload(
                    self.spill_cells.reshape(-1), sp,
                    assign_global[st].astype(np.int32), jnp.int32)
                self.spill_cells = reshard(flat_sc, (sdev, spill_rows))
        return True

    def masked_valid(self, cand_phys: np.ndarray):
        """Device validity masks restricted to `cand_phys` physical rows —
        the mesh half of the IVF filter pushdown; see
        IVFIndex.masked_valid. Masks re-shard over the mesh axis so the
        search program's P(axis) specs still hold."""
        from tpuvdb.index.ivf import _and_masks, lookup_inverse

        g_hits, s_hits = lookup_inverse(
            *self._inverse_maps(), np.asarray(cand_phys, np.int64))
        ndev, local = self.gval.shape
        sdev, slocal = self.sval.shape
        gmask = np.zeros(ndev * local, bool)
        gmask[g_hits] = True
        smask = np.zeros(sdev * slocal, bool)
        smask[s_hits] = True
        Pax = NamedSharding(self.mesh, P(self.axis))
        return (
            _and_masks(self.gval, jax.device_put(
                jnp.asarray(gmask.reshape(ndev, local)), Pax)),
            _and_masks(self.sval, jax.device_put(
                jnp.asarray(smask.reshape(sdev, slocal)), Pax)),
        )

    def search(self, queries: np.ndarray, k: int,
               nprobe: Optional[int] = None,
               valid_override=None,
               out_w: Optional[int] = None) -> Tuple[np.ndarray, np.ndarray]:
        # out_w (fetch-shrink, see index.ivf.IVFIndex.search) is accepted
        # for engine-call compatibility; the mesh program's collective
        # merge already returns exactly k columns, so there is nothing
        # narrower to fetch here.
        nprobe = min(nprobe or self.nprobe, self.centroids.shape[1])
        local_rows = self.grouped.shape[1]
        spill_rows = self.spill.shape[1]
        # PQ cells take the XLA ADC path everywhere (no pallas PQ probe)
        use_pallas = jax.default_backend() == "tpu" and not self.pq
        opq = self.pq and self.pq_rotation is not None
        fn = _build_program(self.mesh, self.axis, k, nprobe, self.cell_pad,
                            self.recall_target, local_rows, spill_rows,
                            use_pallas, quantized=self.quantized,
                            repl_axis=self.repl_axis, pq=self.pq, opq=opq)
        if self.quantized:
            gscale, sscale = self.cell_scales, self.spill_scales
        else:  # placeholder rides the same specs; the f32 branch ignores it
            gscale = self.gsq
            sscale = self.ssq
        gval, sval = (valid_override if valid_override is not None
                      else (self.gval, self.sval))
        q = jnp.asarray(queries, jnp.float32)
        qn = q.shape[0]
        pad = 0
        if self.repl_axis is not None:
            # query batch splits over the replica axis: pad to a multiple
            pad = (-qn) % self.mesh.shape[self.repl_axis]
            if pad:
                q = jnp.concatenate([q, jnp.zeros((pad, q.shape[1]),
                                                  q.dtype)])
        cbs = (self.pq_codebooks if self.pq
               else jnp.zeros((1, 1, 1), jnp.float32))  # rides the P() spec
        scells = (self.spill_cells if self.pq else self.sval)  # placeholder
        rot = (self.pq_rotation if opq
               else jnp.zeros((1, 1), jnp.float32))  # ignored when not opq
        dist, gids = fn(q, self.centroids,
                        self.cell_offsets, self.cell_lens,
                        self.grouped, gscale, self.gsq, gval,
                        self.spill, sscale, self.ssq, sval, cbs, scells,
                        rot)
        if pad:
            dist, gids = dist[:qn], gids[:qn]
        gids = np.asarray(gids)
        dist = np.asarray(dist)
        stride = local_rows + spill_rows
        rows = np.full_like(gids, -1, dtype=np.int64)
        ok = gids >= 0
        dev = np.where(ok, gids // stride, 0)
        loc = np.where(ok, gids % stride, 0)
        in_spill = ok & (loc >= local_rows)
        in_main = ok & ~in_spill
        rows[in_main] = self.row_ids[dev[in_main], loc[in_main]]
        rows[in_spill] = self.spill_row_ids[dev[in_spill],
                                            loc[in_spill] - local_rows]
        return dist, rows
