"""Served-path benchmark: engine.search_batch end to end (VERDICT r2 #2).

The kernel bench (bench/scan.py) times raw device calls chained in a
fori_loop; this measures what a CLIENT gets from the engine: device scan +
staged-delta merge + generation check + bulk row->key resolution (native
reverse map) + response assembly.

Through the axon relay every batch pays one ~30-60 ms remote dispatch that
a colocated TPU host does not, so three numbers are reported:

  engine_qps_single    — sequential search_batch wall clock (relay-bound
                         on the dev relay; the honest lower bound)
  engine_qps_pipelined — 8 concurrent client threads (the engine releases
                         its lock around device calls, so requests overlap
                         exactly as a real server's would)
  engine_qps_projected — batch / (device kernel ms + measured host
                         assembly ms): what a colocated host serves, using
                         the fori_loop kernel time for the device part and
                         the engine's own stage timers for the host part

plus recall@10 vs the caller's oracle and the stage-timer split.
"""

from __future__ import annotations

import time
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Optional

import numpy as np


def run_engine_serving(
    corpus_np: np.ndarray,
    queries_np: np.ndarray,
    oracle_idx: Optional[np.ndarray],
    k: int = 10,
    batch: int = 512,
    iters: int = 12,
    threads: int = 8,
    kernel_ms_per_batch: Optional[float] = None,
    storage_dtype: str = "bfloat16",
    search_mode: str = "pallas",
    # default matches DBConfig.search_coalesce=False: the recorded A/B
    # (docs/BENCH_SERVING_AB_r5.json) measured direct dispatch faster at
    # the driver's 8-stream b512 flat-scan load (29.9k vs 27.2k piped),
    # with coalescing forming groups of ONE there — stacking only pays in
    # the many-small-batch regime the coalescer was built for
    coalesce: bool = False,
    log=print,
) -> Dict:
    from tpuvdb.core.config import DBConfig
    from tpuvdb.engine.engine import VectorDBEngine

    n, dim = corpus_np.shape
    cfg = DBConfig(
        vector_dim=dim, shard_count=4, shard_capacity=n,
        mirror_init_cap=n // 4 + 4096, storage_dtype=storage_dtype,
        search_mode=search_mode, search_coalesce=coalesce,
        wal_enabled=False,
        checkpoint_every_puts=10 ** 12, compact_every_puts=10 ** 12,
        flush_batch=1 << 30,
    )
    eng = VectorDBEngine(cfg)
    t0 = time.perf_counter()
    B = 65536
    for lo in range(0, n, B):
        hi = min(lo + B, n)
        r = eng.put_rows([f"r{i}" for i in range(lo, hi)], corpus_np[lo:hi])
        assert r.success, r.message
    ingest_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    eng.flush()
    build_s = time.perf_counter() - t0
    log(f"engine: ingest {n/ingest_s:,.0f} rows/s, device build {build_s:.1f}s")

    q = queries_np[:batch].astype(np.float32)
    dists, keys = eng.search_batch(q, k)  # warm/compile the base shape
    # warm the coalesced stack ladder too: under T concurrent streams the
    # group-commit coalescer forms pow2-padded stacks (up to T*batch) and
    # each distinct stack size is its own XLA program — a cold compile
    # inside the measured window would swamp the timing exactly the way a
    # cold production server would stall its first burst
    t0 = time.perf_counter()
    warmed = eng.warm_search(k, batch, max_stack=threads * batch)
    log(f"engine: warmed stack shapes {warmed} "
        f"({time.perf_counter()-t0:.1f}s)")
    recall = None
    if oracle_idx is not None:
        n_check = min(len(oracle_idx), batch)
        want = [{f"r{j}" for j in row} for row in oracle_idx[:n_check]]
        recall = float(np.mean([
            len(set(keys[i][:k]) & want[i]) / k for i in range(n_check)]))

    # single-stream
    t0 = time.perf_counter()
    for _ in range(iters):
        eng.search_batch(q, k)
    single_s = (time.perf_counter() - t0) / iters
    # pipelined: concurrent clients overlap the per-batch dispatch
    with ThreadPoolExecutor(max_workers=threads) as pool:
        list(pool.map(lambda _: eng.search_batch(q, k), range(threads)))
        t0 = time.perf_counter()
        total = threads * iters
        list(pool.map(lambda _: eng.search_batch(q, k), range(total)))
        piped_s = (time.perf_counter() - t0) / total

    snap = eng.timers.snapshot()
    # p50, not mean: on the shared relay box the mean is skewed by load
    # spikes (device p99 can hit seconds while p50 stays ~1 ms)
    stage = snap.get("search.assemble", {}) or {}
    assemble_ms = stage.get("p50_ms", stage.get("mean_ms", 0.0))
    projected = proj_piped = None
    if kernel_ms_per_batch:
        projected = batch / ((kernel_ms_per_batch + assemble_ms) / 1000.0)
        # device scan (TPU) and host assembly (CPU) are different
        # resources, and the engine demonstrably overlaps them (the lock
        # is released around device calls; the C resolution paths release
        # the GIL at the ctypes boundary) — steady-state pipelined
        # throughput is bounded by the slower STAGE, not their sum
        proj_piped = batch / (max(kernel_ms_per_batch, assemble_ms) / 1000.0)
    out = {
        "engine_qps_single": round(batch / single_s, 1),
        "engine_qps_pipelined": round(batch / piped_s, 1),
        "engine_qps_projected": round(projected, 1) if projected else None,
        "engine_qps_projected_pipelined": (round(proj_piped, 1)
                                           if proj_piped else None),
        "engine_recall_at_10": round(recall, 4) if recall is not None else None,
        "host_assemble_ms_per_batch": round(assemble_ms, 3),
        "batch": batch,
        "stage_timers": {k_: v for k_, v in snap.items()
                         if k_.startswith("search")},
        "search_groups": (dict(eng._search_coalescer.group_sizes)
                          if eng._search_coalescer else None),
    }
    log(f"engine serving: single {out['engine_qps_single']:,.0f} QPS, "
        f"pipelined x{threads} {out['engine_qps_pipelined']:,.0f} QPS, "
        f"projected-colocated {out['engine_qps_projected']} "
        f"(pipelined {out['engine_qps_projected_pipelined']}), "
        f"assemble {assemble_ms:.3f} ms/batch, recall {recall}")
    return out


def run_ivf_small_batch(
    corpus_np: np.ndarray,
    queries_np: np.ndarray,
    k: int = 10,
    batch: int = 8,
    iters: int = 30,
    log=print,
) -> Dict:
    """IVF where it wins (VERDICT r2 weak #7): small-batch latency through
    the engine. Reports p50 per-query latency and the build split."""
    from tpuvdb.core.config import DBConfig
    from tpuvdb.engine.engine import VectorDBEngine

    n, dim = corpus_np.shape
    cfg = DBConfig(
        vector_dim=dim, shard_count=4, shard_capacity=n,
        mirror_init_cap=n // 4 + 4096, index_type="ivf",
        ivf_nlist=1024, ivf_nprobe=64, ivf_kmeans_iters=6,
        ivf_train_sample=131072, wal_enabled=False,
        checkpoint_every_puts=10 ** 12, compact_every_puts=10 ** 12,
        flush_batch=1 << 30,
    )
    eng = VectorDBEngine(cfg)
    B = 65536
    for lo in range(0, n, B):
        hi = min(lo + B, n)
        eng.put_rows([f"r{i}" for i in range(lo, hi)], corpus_np[lo:hi])
    t0 = time.perf_counter()
    eng.flush()  # k-means build
    build_s = time.perf_counter() - t0
    q = queries_np[:batch].astype(np.float32)
    eng.search_batch(q, k)  # warm
    lats = []
    for _ in range(iters):
        t0 = time.perf_counter()
        eng.search_batch(q, k)
        lats.append((time.perf_counter() - t0) / batch)
    lats.sort()
    p50 = lats[len(lats) // 2] * 1000
    p95 = lats[int(len(lats) * 0.95)] * 1000
    log(f"ivf small-batch (b{batch}): p50 {p50:.3f} ms/query, "
        f"p95 {p95:.3f} ms/query, build {build_s:.0f}s")
    return {"ivf_build_s": round(build_s, 1),
            "ivf_p50_ms_per_query": round(p50, 3),
            "ivf_p95_ms_per_query": round(p95, 3),
            "ivf_batch": batch}  # own key: "batch" would clobber the
                                 # serving-path batch in the merged dict
