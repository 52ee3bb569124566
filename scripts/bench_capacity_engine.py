#!/usr/bin/env python
"""ENGINE-level capacity proof: 8M x 768 int8 on one chip (VERDICT r2 #1).

Round 2's capacity demo (scripts/bench_capacity.py) drove raw kernels; the
engine itself could not operate there (f32 host mirrors alone were 24.5 GB
RSS). This script runs the FULL production stack at that size:

    put_rows bulk ingest -> mmap int8 shard mirrors (disk-backed rows)
    -> streaming device build (block uploads, no host corpus copy)
    -> engine.search_batch serving (device scan + fused re-rank + key
       resolution through the native reverse map)
    -> hardlink checkpoint -> restart-with-recovery at full size

and reports ingest rate, serving QPS (single-stream and thread-pipelined —
through the axon relay each batch pays one ~30-60 ms dispatch; pipelining
recovers the overlap a colocated host gets for free), recall@10 vs an
exact scan over the stored rows, restart time, and peak host RSS.

Usage: python scripts/bench_capacity_engine.py [--rows 8000000] [--dim 768]
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import shutil
import sys
import tempfile
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tpuvdb_jax_cache")
# runnable as `python scripts/bench_capacity_engine.py` from the repo root
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024 / 1024


def anon_gb() -> float:
    """CURRENT anonymous resident memory (GB) from smaps_rollup — the
    honest host-footprint number: ru_maxrss is a lifetime peak that also
    counts reclaimable mmap page cache (the disk-backed mirrors) and the
    relay client's transfer buffers; anonymous RSS is what the engine
    actually pins."""
    try:
        with open("/proc/self/smaps_rollup") as f:
            for line in f:
                if line.startswith("Anonymous:"):
                    return int(line.split()[1]) / 1024 / 1024
    except OSError:
        pass
    return -1.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=8_000_000)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--data-dir", default=None)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--skip-restart", action="store_true")
    args = ap.parse_args()

    from tpuvdb.core.config import DBConfig
    from tpuvdb.engine.engine import VectorDBEngine
    from tpuvdb.utils.hostmem import keep_malloc_warm

    keep_malloc_warm()  # first-touch costs ~100 MB/s on this host class
    N, DIM, K = args.rows, args.dim, args.k
    shards = 4
    data_dir = args.data_dir or tempfile.mkdtemp(prefix="tpuvdb_cap_")
    per_shard = (N // shards) + 65536
    cfg = DBConfig(
        vector_dim=DIM, shard_count=shards, shard_capacity=per_shard,
        mirror_init_cap=per_shard, mirror_dtype="int8",
        mirror_backend="mmap", storage_dtype="int8",
        rescore_mode="device", rescore_overfetch=16,
        wal_enabled=False,  # bulk load; durability = explicit checkpoint
        checkpoint_every_puts=10 ** 12, compact_every_puts=10 ** 12,
        flush_batch=1 << 30,  # searches never force a mid-ingest flush
    )
    import jax

    log(f"device: {jax.devices()[0].platform}, rows={N}, dim={DIM}, "
        f"data_dir={data_dir}, base rss {rss_gb():.2f} GB")
    eng = VectorDBEngine(cfg, data_dir=data_dir)

    # ---- ingest (synthesized per block: the full f32 corpus would be
    # 24.5 GB — exactly what capacity mode exists to avoid)
    rng = np.random.default_rng(0)
    n_clusters = 512
    cents = rng.standard_normal((n_clusters, DIM)).astype(np.float32) * 3.0
    B = 65536
    t0 = time.perf_counter()
    held_out = []
    for lo in range(0, N, B):
        n = min(B, N - lo)
        cid = rng.integers(0, n_clusters, n)
        block = (cents[cid]
                 + 0.4 * rng.standard_normal((n, DIM)).astype(np.float32))
        r = eng.put_rows([f"k{i}" for i in range(lo, lo + n)], block)
        assert r.success, r.message
        if lo == 0:
            held_out = block[:64].copy()  # queries from the data mixture
        if (lo // B) % 16 == 0:
            log(f"  ingested {lo + n:,}/{N:,} rows, rss {rss_gb():.2f} GB")
    ingest_s = time.perf_counter() - t0
    log(f"ingest: {N / ingest_s:,.0f} rows/s ({ingest_s:.0f}s), "
        f"rss {rss_gb():.2f} GB, anon {anon_gb():.2f} GB")

    # ---- device build (streaming)
    t0 = time.perf_counter()
    eng.flush()
    build_s = time.perf_counter() - t0
    info = eng.info()
    log(f"device build: {build_s:.1f}s, device {info['device_bytes']/2**30:.2f} "
        f"GiB, rss {rss_gb():.2f} GB, anon {anon_gb():.2f} GB")

    # ---- recall vs exact scan over the STORED (dequantized) rows,
    # computed host-side from the mmap mirrors in blocks
    queries = np.stack(held_out)[:32]
    layout = eng._index.layout
    best_d = np.full((len(queries), K), np.inf, np.float32)
    best_r = np.full((len(queries), K), -1, np.int64)
    qsq = np.einsum("nd,nd->n", queries, queries)
    for s, m in enumerate(eng.mirrors):
        used = m.next_slot
        for lo in range(0, used, 262144):
            hi = min(lo + 262144, used)
            raw, scale, msq = m.raw_range(lo, hi)
            blk = raw.astype(np.float32) * np.asarray(scale)[:, None]
            d = (qsq[:, None] + np.asarray(msq)[None, :]
                 - 2.0 * queries @ blk.T)
            d = np.where(np.asarray(m.valid[lo:hi])[None, :], d, np.inf)
            rows = s * layout.phys_cap + np.arange(lo, hi)
            alld = np.concatenate([best_d, d], axis=1)
            allr = np.concatenate(
                [best_r, np.broadcast_to(rows, (len(queries), hi - lo))], 1)
            sel = np.argpartition(alld, K - 1, axis=1)[:, :K]
            best_d = np.take_along_axis(alld, sel, 1)
            best_r = np.take_along_axis(allr, sel, 1)
    oracle_keys = []
    for qi in range(len(queries)):
        ks = set()
        for r_ in best_r[qi]:
            sh, sl = layout.shard_slot_of(int(r_))
            ks.add(eng.docstore.key_at(sh, sl))
        oracle_keys.append(ks)

    dists, keys = eng.search_batch(queries, K)
    recall = float(np.mean([
        len(set(keys[i][:K]) & oracle_keys[i]) / K
        for i in range(len(queries))]))
    log(f"recall@{K} vs exact-over-stored: {recall:.4f}")

    # ---- serving throughput
    qbatch = rng.standard_normal((args.batch, DIM)).astype(np.float32) * 0.1
    qbatch += cents[rng.integers(0, n_clusters, args.batch)]
    eng.search_batch(qbatch, K)  # warm
    t0 = time.perf_counter()
    iters = 20
    for _ in range(iters):
        eng.search_batch(qbatch, K)
    single = args.batch * iters / (time.perf_counter() - t0)
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=8) as pool:
        t0 = time.perf_counter()
        list(pool.map(lambda _: eng.search_batch(qbatch, K), range(64)))
        piped = args.batch * 64 / (time.perf_counter() - t0)
    log(f"engine serving: {single:,.0f} QPS single-stream, "
        f"{piped:,.0f} QPS pipelined x8 (batch {args.batch})")

    # ---- durability: checkpoint (hardlinks) + full restart
    t0 = time.perf_counter()
    ck = eng.save_checkpoint()
    ckpt_s = time.perf_counter() - t0
    log(f"checkpoint: {ckpt_s:.1f}s -> {ck}, rss {rss_gb():.2f} GB, "
        f"anon {anon_gb():.2f} GB")
    restart_s = None
    if not args.skip_restart:
        eng.stop_background_flush() if hasattr(eng, "stop_background_flush") else None
        if eng.wal is not None:
            eng.wal.close()
        del eng
        t0 = time.perf_counter()
        eng = VectorDBEngine(cfg, data_dir=data_dir)
        assert eng.count() == N, eng.count()
        eng.flush()
        # same query shape as the recall pass: restart_s measures recovery
        # + device rebuild, not a fresh XLA compile for a new batch shape
        d2, k2 = eng.search_batch(queries, K)
        assert all(k2[0][j] is not None for j in range(K))
        restart_s = time.perf_counter() - t0
        log(f"restart-with-recovery: {restart_s:.1f}s "
            f"(count={eng.count():,}), rss {rss_gb():.2f} GB, "
            f"anon {anon_gb():.2f} GB")

    out = {
        "metric": "engine_capacity_8m768_int8",
        "rows": N, "dim": DIM,
        "ingest_rows_per_s": round(N / ingest_s, 1),
        "build_s": round(build_s, 1),
        "device_gib": round(info["device_bytes"] / 2 ** 30, 2),
        "recall_at_10": round(recall, 4),
        "engine_qps_single": round(single, 1),
        "engine_qps_pipelined": round(piped, 1),
        "checkpoint_s": round(ckpt_s, 1),
        "restart_s": round(restart_s, 1) if restart_s else None,
        "peak_rss_gb": round(rss_gb(), 2),
        "anon_rss_gb": round(anon_gb(), 2),
    }
    print(json.dumps(out))
    if args.data_dir is None:
        shutil.rmtree(data_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
