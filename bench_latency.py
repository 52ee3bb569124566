"""Host-inclusive search latency certification (BASELINE config 3).

Measures the FULL serving path — JSON-shaped request dict in, response dict
out, through DBService.rpc_search (decode, batcher coalescing, device scan,
key mapping, reply) — at batch sizes 1 / 8 / 64, and prints host-side
p50/p95/p99 per batch size plus the engine's per-stage timer snapshot.

This is deliberately NOT a device-only number: config 3's target is
"p50 < 2 ms per query at batch <= 8 on 8 chips", which can only be
certified on a timer that includes the host path. On the axon relay each
device call pays ~30-60 ms dispatch, so absolute numbers here are
relay-dominated; on directly-attached TPU hardware the same script gives
the certifiable figure (see docs/BENCH_NOTES.md).

Usage:  python bench_latency.py [--rows 100000] [--dim 512] [--reps 200]
Output: one JSON line per batch size + a human table.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=100_000)
    ap.add_argument("--dim", type=int, default=512)
    ap.add_argument("--reps", type=int, default=200)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--mode", default="int8",
                    choices=["exact", "approx", "int8", "pallas"])
    ap.add_argument("--index", default="flat", choices=["flat", "ivf"])
    args = ap.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tpuvdb_jax_cache")
    from tpuvdb.api.service import DBService
    from tpuvdb.core.config import DBConfig

    # "int8" is a storage dtype (scanned via the approx kernel); the other
    # modes are kernel choices over the configured storage dtype
    storage = "int8" if args.mode == "int8" else "float32"
    search_mode = "approx" if args.mode == "int8" else args.mode
    cfg = DBConfig(vector_dim=args.dim, shard_count=4,
                   shard_capacity=max(args.rows, 1024),
                   # pre-size mirrors: the growth ladder costs one XLA
                   # recompile per doubling through the remote-compile
                   # relay (minutes of ingest wall clock at 1M rows)
                   mirror_init_cap=max(args.rows, 1024) // 4 + 4096,
                   storage_dtype=storage, search_mode=search_mode,
                   index_type=args.index,
                   ivf_nlist=max(64, min(1024, args.rows // 256)),
                   ivf_nprobe=32, ivf_kmeans_iters=6)
    svc = DBService(cfg)
    rng = np.random.default_rng(0)

    # Dispatch floor: steady-state round trip of a TRIVIAL chained device
    # op — the per-call cost of the execution path (relay hop included)
    # that a colocated TPU host does not pay. The dispatch-subtracted
    # figures below are the defensible device+host latency claim.
    import jax
    import jax.numpy as jnp

    # a realistic micro-cycle: upload a small fresh array, run a tiny
    # kernel, MATERIALIZE the fresh result (np.asarray). Through the relay
    # materializing a fresh result is what costs a sync tick (~30-60 ms);
    # a scalar x+1 round trip measures ~0.03 ms and would understate the
    # floor by three orders of magnitude.
    triv = jax.jit(lambda x: x @ x)
    x_np = np.ones((8, 8), np.float32)
    np.asarray(triv(jnp.asarray(x_np)))
    floor = []
    for _ in range(30):
        t0 = time.perf_counter()
        np.asarray(triv(jnp.asarray(x_np)))
        floor.append(time.perf_counter() - t0)
    dispatch_ms = round(float(np.percentile(np.asarray(floor) * 1e3, 50)), 3)
    print(f"dispatch floor (micro execute+materialize cycle): "
          f"p50 {dispatch_ms} ms", flush=True)

    print(f"ingest {args.rows} x {args.dim} ...", flush=True)
    bs = 65536
    for lo in range(0, args.rows, bs):
        n = min(bs, args.rows - lo)
        vecs = rng.standard_normal((n, args.dim)).astype(np.float32)
        r = svc.engine.put_rows([f"k{lo + i}" for i in range(n)], vecs)
        assert r.success, r.message
    svc.engine.flush()

    results = {}
    for batch in (1, 8, 64):
        qs = rng.standard_normal((args.reps, batch, args.dim)).astype(np.float32)
        # warm the compile caches for this shape
        for w in range(3):
            if batch == 1:
                svc.rpc_search({"query_vector": qs[w, 0].tolist(),
                                "top_k": args.k})
            else:
                svc.rpc_search_batch(
                    {"query_vectors": qs[w].tolist(), "top_k": args.k})
        lat = []
        for r in range(args.reps):
            t0 = time.perf_counter()
            if batch == 1:
                resp = svc.rpc_search({"query_vector": qs[r, 0].tolist(),
                                       "top_k": args.k})
            else:
                resp = svc.rpc_search_batch(
                    {"query_vectors": qs[r].tolist(), "top_k": args.k})
            lat.append(time.perf_counter() - t0)
            assert resp["success"], resp
        s = np.sort(np.asarray(lat)) * 1e3  # ms per request
        per_q = s / batch
        p50 = float(np.percentile(s, 50))
        # conditional (colocated-host) claim: measured host+device p50
        # minus the dispatch floor — every search pays exactly one device
        # dispatch per batch through the batcher
        adj = max(0.0, p50 - dispatch_ms)
        row = {
            "batch": batch,
            "p50_ms": round(p50, 3),
            "p95_ms": round(float(np.percentile(s, 95)), 3),
            "p99_ms": round(float(np.percentile(s, 99)), 3),
            "per_query_p50_ms": round(float(np.percentile(per_q, 50)), 4),
            "p50_minus_dispatch_ms": round(adj, 3),
            "per_query_p50_minus_dispatch_ms": round(adj / batch, 4),
        }
        results[batch] = row
        print(json.dumps({"metric": f"search_latency_b{batch}",
                          "unit": "ms_host_p50", "value": row["p50_ms"],
                          "per_query_p50_ms": row["per_query_p50_ms"],
                          "p99_ms": row["p99_ms"], "mode": args.mode,
                          "index": args.index,
                          "dispatch_floor_ms": dispatch_ms,
                          "p50_minus_dispatch_ms": row["p50_minus_dispatch_ms"],
                          "per_query_p50_minus_dispatch_ms":
                              row["per_query_p50_minus_dispatch_ms"],
                          "rows": args.rows}), flush=True)

    print("\nbatch  p50_ms  p95_ms  p99_ms  per-query p50 | minus-dispatch"
          " (batch / per-query)")
    for b, r in results.items():
        print(f"{b:5d}  {r['p50_ms']:6.2f}  {r['p95_ms']:6.2f}  "
              f"{r['p99_ms']:6.2f}  {r['per_query_p50_ms']:.4f} ms | "
              f"{r['p50_minus_dispatch_ms']:.3f} / "
              f"{r['per_query_p50_minus_dispatch_ms']:.4f} ms")
    print("\nper-stage timers (service.search = host-inclusive):")
    snap = svc.engine.timers.snapshot()
    for name in sorted(snap):
        print(f"  {name:24s} {snap[name]}")
    svc.close()


if __name__ == "__main__":
    main()
