#!/usr/bin/env python
"""Serving-path stage accounting (VERDICT r3 weak #3).

bench_relay_concurrency.py established the transport pipelines to
~0.8 ms/call effective at >=8 threads, so the measured pipelined engine
QPS (44.7k at b512, BENCH_r03) is NOT transport serialization. This
script splits one engine search_batch into its real stages on the live
relay and reports where the per-batch milliseconds go:

  fetch_bw   — raw device->host bandwidth of a result-sized array
  dispatch   — jit call returning device handles (no fetch)
  fetch      — np.asarray of the (Q, dev_k) dists+rows handles
  keys       — docstore row->key resolution (host, C path)
  total      — engine.search_batch end to end
  threads=T  — search_batch from T concurrent clients

Run on the TPU relay: python scripts/diag_serving_path.py
"""

import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tpuvdb_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def med(vals):
    vals = sorted(vals)
    return vals[len(vals) // 2]


def main():
    import jax
    import jax.numpy as jnp

    from tpuvdb.core.config import DBConfig
    from tpuvdb.engine.engine import VectorDBEngine

    n, dim, batch, k = 1_000_000, 128, 512, 10
    rng = np.random.default_rng(0)
    corpus = rng.standard_normal((n, dim)).astype(np.float32)
    queries = (corpus[rng.choice(n, batch)]
               + 0.05 * rng.standard_normal((batch, dim))).astype(np.float32)

    # raw fetch bandwidth at result-ish sizes
    for kb in (4, 64, 1024, 16384):
        arr = jax.device_put(jnp.zeros((kb * 256,), jnp.float32))  # kb KiB
        np.asarray(arr)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(arr)
            ts.append(time.perf_counter() - t0)
        t = med(ts)
        log(f"fetch {kb:6d} KiB: {t*1000:8.2f} ms  "
            f"({kb/1024/t:,.1f} MiB/s)")

    cfg = DBConfig(
        vector_dim=dim, shard_count=4, shard_capacity=n,
        mirror_init_cap=n // 4 + 4096, storage_dtype="bfloat16",
        search_mode="pallas", wal_enabled=False,
        checkpoint_every_puts=10 ** 12, compact_every_puts=10 ** 12,
        flush_batch=1 << 30,
    )
    eng = VectorDBEngine(cfg)
    B = 65536
    t0 = time.perf_counter()
    for lo in range(0, n, B):
        hi = min(lo + B, n)
        eng.put_rows([f"r{i}" for i in range(lo, hi)], corpus[lo:hi])
    log(f"ingest {n/(time.perf_counter()-t0):,.0f} rows/s")
    t0 = time.perf_counter()
    eng.flush()
    log(f"build {time.perf_counter()-t0:.1f}s")

    q = queries.astype(np.float32)
    eng.search_batch(q, k)  # warm + compile

    # stage 1: the index device call, dispatch vs fetch
    idx = eng._index
    dev_k = 16  # pow2(k + 0 deletes), matches _flat_search_rows
    import tpuvdb.index.exact as exact_mod

    def dispatch_only():
        qj = jnp.asarray(q, jnp.float32)
        from tpuvdb.kernels.pallas_scan import (fit_block_rows,
                                                pallas_l2sq_topk_rescored)
        # mirror index.search's chosen path by calling it whole; then
        # subtract the fetch measured below
        return idx.search(q, dev_k)

    # full index.search (includes any internal np.asarray)
    ts = []
    for _ in range(7):
        t0 = time.perf_counter()
        d, r = idx.search(q, dev_k)
        ts.append(time.perf_counter() - t0)
    t_index = med(ts)
    is_np = isinstance(d, np.ndarray)
    log(f"index.search (b{batch}, dev_k {dev_k}): {t_index*1000:.2f} ms "
        f"(returns {'numpy' if is_np else 'device'} arrays, "
        f"dists {np.asarray(d).nbytes//1024} KiB + rows "
        f"{np.asarray(r).nbytes//1024} KiB)")

    # full engine path
    ts = []
    for _ in range(7):
        t0 = time.perf_counter()
        eng.search_batch(q, k)
        ts.append(time.perf_counter() - t0)
    t_total = med(ts)
    log(f"search_batch single: {t_total*1000:.2f} ms/batch "
        f"({batch/t_total:,.0f} QPS)")
    log(f"  non-index remainder: {(t_total-t_index)*1000:.2f} ms")

    snap = eng.timers.snapshot()
    for name, s in sorted(snap.items()):
        if name.startswith("search"):
            log(f"  stage {name}: p50 {s.get('p50_ms')} ms "
                f"(n={s.get('count')})")

    results = {"single_ms": round(t_total * 1000, 2),
               "index_ms": round(t_index * 1000, 2)}
    for t in (2, 4, 8, 16):
        with ThreadPoolExecutor(max_workers=t) as pool:
            list(pool.map(lambda _: eng.search_batch(q, k), range(t)))
            iters = 4 * t
            t0 = time.perf_counter()
            list(pool.map(lambda _: eng.search_batch(q, k), range(iters)))
            dt = (time.perf_counter() - t0) / iters
        qps = batch / dt
        results[f"threads_{t}_qps"] = round(qps, 1)
        log(f"threads={t:2d}: {dt*1000:7.2f} ms/batch effective "
            f"({qps:,.0f} QPS)")

    import json
    print(json.dumps({"metric": "serving_path_diag", **results}))


if __name__ == "__main__":
    main()
