"""Streaming ingest benchmark (BASELINE config 4).

Target: concurrent insert+query with WAL durability and shard compaction at
>= 1M vectors/hr (~278/s). Measures:
  * batched durable ingest rate (WAL group-commit + mirror writes)
  * search latency while ingest is running
  * WAL-replay recovery time

Run: python bench_streaming.py   (stderr diagnostics, one JSON line stdout)
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import threading
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from tpuvdb.core.config import DBConfig
    from tpuvdb.core.types import SearchRequest, VectorData
    from tpuvdb.engine.engine import VectorDBEngine

    dim = 512  # CLIP-shaped (reference storage config)
    n_total = 50_000
    batch = 512
    data_dir = tempfile.mkdtemp(prefix="tpuvdb_bench_")
    cfg = DBConfig(vector_dim=dim, shard_count=4, shard_capacity=1 << 17,
                   block_size=8192, checkpoint_every_puts=20_000,
                   compact_every_puts=10**9,
                   mirror_init_cap=1 << 14)  # sized to the corpus: no growth rebuilds
    eng = VectorDBEngine(cfg, data_dir=data_dir)
    eng.start_background_flush()
    rng = np.random.default_rng(0)
    vecs = rng.standard_normal((n_total, dim)).astype(np.float32)

    # serving warmup: compile the search + scatter programs before timing
    # (on the remote-compile relay each fresh shape costs tens of seconds)
    warm = [VectorData(key=f"warm{j}", vector=vecs[j]) for j in range(512)]
    eng.put_batch(warm)
    eng.flush()
    eng.search(SearchRequest(query_vector=vecs[0], top_k=10))
    log("warmup done")

    qlat = []
    stop = threading.Event()

    def searcher():
        q = vecs[123]
        while not stop.is_set():
            t0 = time.perf_counter()
            eng.search(SearchRequest(query_vector=q, top_k=10))
            qlat.append(time.perf_counter() - t0)
            time.sleep(0.01)

    s = threading.Thread(target=searcher)
    t0 = time.perf_counter()
    s.start()
    for i in range(0, n_total, batch):
        recs = [VectorData(key=f"k{i + j}", vector=vecs[i + j])
                for j in range(min(batch, n_total - i))]
        r = eng.put_batch(recs)
        assert r.success, r.message
    ingest_s = time.perf_counter() - t0
    stop.set()
    s.join()
    rate = n_total / ingest_s
    log(f"ingested {n_total} x {dim}d durably in {ingest_s:.1f}s "
        f"-> {rate:,.0f} vec/s ({rate * 3600 / 1e6:.1f}M/hr)")
    if qlat:
        ql = sorted(qlat)
        log(f"concurrent search p50 {ql[len(ql)//2]*1e3:.1f} ms "
            f"p95 {ql[int(len(ql)*0.95)]*1e3:.1f} ms over {len(ql)} queries")

    # recovery: reopen from checkpoint + WAL tail
    eng.wal.close()
    t0 = time.perf_counter()
    eng2 = VectorDBEngine(cfg, data_dir=data_dir)
    rec_s = time.perf_counter() - t0
    assert eng2.count() == n_total + 512  # corpus + warmup keys
    log(f"recovery (checkpoint + WAL tail replay): {rec_s:.1f}s")

    shutil.rmtree(data_dir, ignore_errors=True)
    target = 1e6 / 3600.0
    print(json.dumps({
        "metric": "durable_ingest_vectors_per_sec",
        "value": round(rate, 1),
        "unit": "vec/s",
        "vs_baseline": round(rate / target, 1),
        "ingest_total": n_total,
        "dim": dim,
        "concurrent_search_p50_ms": round(sorted(qlat)[len(qlat)//2]*1e3, 2) if qlat else None,
        "recovery_s": round(rec_s, 2),
    }))


if __name__ == "__main__":
    main()
