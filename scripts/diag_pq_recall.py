#!/usr/bin/env python
"""Diagnose the 8M x 768 IVF-PQ recall defect on a preserved corpus.

The measured full-stack run (scripts/bench_capacity_pq.py --rows 8000000,
BENCH_NOTES "IVF-PQ full-stack run") recorded recall@10 0.6125 at
nprobe 16 over 5354 built cells. This script separates the candidate
causes by sweeping nprobe on the SAME corpus (hardlink-preserved data
dir + checkpoint):

  * recall rises steeply with nprobe  -> under-probing (16/5354 = 0.3%
    of cells; the coarse quantizer is fine, the budget was too small)
  * recall plateaus low               -> encode-side defect (bisected-
    cell re-encode drift, scan-window clamp, or LUT/term bug)

Queries and the exact-over-stored oracle are regenerated exactly as the
bench built them (same rng(0) stream for the first ingest block).

Usage: python scripts/diag_pq_recall.py [--data-dir /tmp/pq8m_keep]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tpuvdb_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", default="/tmp/pq8m_keep")
    ap.add_argument("--rows", type=int, default=8_000_000)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--subq", type=int, default=96)
    ap.add_argument("--nlist", type=int, default=4096)
    ap.add_argument("--nprobes", default="16,64")
    ap.add_argument("--overfetches", default="10,40,100")
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()
    N, DIM, K = args.rows, args.dim, args.k
    nprobes = [int(x) for x in args.nprobes.split(",")]

    from tpuvdb.core.config import DBConfig
    from tpuvdb.engine.engine import VectorDBEngine

    shards = 4
    per_shard = (N // shards) + 65536
    results = {}
    # regenerate the bench's first block -> identical held-out queries
    rng = np.random.default_rng(0)
    cents = rng.standard_normal((4096, DIM)).astype(np.float32) * 3.0
    B = 65536
    cid = rng.integers(0, 4096, B)
    noise = rng.standard_normal((B, DIM), dtype=np.float32)
    block = noise * 0.4 + cents[cid]
    queries = block[:32].copy()

    cfg = DBConfig(
        vector_dim=DIM, shard_count=shards, shard_capacity=per_shard,
        mirror_init_cap=per_shard, mirror_dtype="int8",
        mirror_backend="mmap",
        index_type="ivf", ivf_pq_subq=args.subq,
        ivf_nlist=args.nlist, ivf_nprobe=nprobes[0],
        ivf_kmeans_iters=8, ivf_train_sample=262_144,
        rescore_mode="exact", rescore_overfetch=10,
        wal_enabled=False,
        checkpoint_every_puts=10 ** 12, compact_every_puts=10 ** 12,
        flush_batch=1 << 30,
    )
    t0 = time.perf_counter()
    eng = VectorDBEngine(cfg, data_dir=args.data_dir)
    log(f"engine open {time.perf_counter()-t0:.0f}s, count={eng.count():,}")
    # the IVF device index rebuilds lazily (warm codebooks skip training
    # but assign+encode re-runs over all mirror rows) — trigger it now so
    # _ivf_layout exists and the sweep times pure searches
    t0 = time.perf_counter()
    eng.flush()
    log(f"ivf rebuild (re-encode): {time.perf_counter()-t0:.0f}s")

    # exact oracle over the STORED (dequantized int8) rows
    layout = eng._ivf_layout
    best_d = np.full((len(queries), K), np.inf, np.float32)
    best_r = np.full((len(queries), K), -1, np.int64)
    qsq = np.einsum("nd,nd->n", queries, queries)
    t0 = time.perf_counter()
    for s_, m in enumerate(eng.mirrors):
        used = m.next_slot
        for lo in range(0, used, 262144):
            hi = min(lo + 262144, used)
            raw, scale, msq = m.raw_range(lo, hi)
            blk = raw.astype(np.float32) * np.asarray(scale)[:, None]
            d = (qsq[:, None] + np.asarray(msq)[None, :]
                 - 2.0 * queries @ blk.T)
            d = np.where(np.asarray(m.valid[lo:hi])[None, :], d, np.inf)
            rows = s_ * layout.phys_cap + np.arange(lo, hi)
            alld = np.concatenate([best_d, d], axis=1)
            allr = np.concatenate(
                [best_r, np.broadcast_to(rows, (len(queries), hi - lo))], 1)
            sel = np.argpartition(alld, K - 1, axis=1)[:, :K]
            best_d = np.take_along_axis(alld, sel, 1)
            best_r = np.take_along_axis(allr, sel, 1)
    log(f"oracle scan: {time.perf_counter()-t0:.0f}s")
    oracle_keys = []
    for qi in range(len(queries)):
        ks = set()
        for r_ in best_r[qi]:
            sh, sl = layout.shard_slot_of(int(r_))
            ks.add(eng.docstore.key_at(sh, sl))
        oracle_keys.append(ks)

    # grid sweep separates the two recall ceilings: recall that rises
    # with nprobe = under-probing; recall that rises with overfetch at
    # fixed nprobe = ADC-precision cap (true neighbors present in the
    # probed cells but ranked outside the re-rank window)
    overfetches = [int(x) for x in args.overfetches.split(",")]
    for nprobe in nprobes:
        eng._ivf.nprobe = nprobe  # per-call static arg; recompiles per value
        for ovf in overfetches:
            object.__setattr__(eng.config, "rescore_overfetch", ovf)
            eng.search_batch(queries, K)  # warm/compile at this config
            t0 = time.perf_counter()
            dists, keys = eng.search_batch(queries, K)
            dt = time.perf_counter() - t0
            rec = float(np.mean([
                len(set(keys[i][:K]) & oracle_keys[i]) / K
                for i in range(len(queries))]))
            log(f"nprobe={nprobe} overfetch={ovf}: recall@{K} {rec:.4f}, "
                f"batch-32 search {dt*1000:.0f} ms")
            results[f"np{nprobe}_ov{ovf}"] = {
                "recall_at_10": round(rec, 4),
                "batch32_ms": round(dt * 1000, 1)}

    print(json.dumps({"metric": "pq8m_recall_vs_nprobe",
                      "results": results}))


if __name__ == "__main__":
    main()
