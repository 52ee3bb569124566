#!/usr/bin/env python
"""Serving A/B: group-commit coalescing ON vs OFF at serving batches.

VERDICT r3 weak #3 accounting companion: run the SAME engine serving
bench (tpuvdb/bench/engine_serving.py) with search coalescing toggled,
at small and large client batches, so the coalescing default is set by
measurement instead of intuition. Pair with
scripts/bench_relay_concurrency.py --payload (the transport ceiling
with engine-free calls) to separate engine cost from transport cost.

Usage: python scripts/bench_serving_ab.py [--rows 1000000] [--dim 128]
                                          [--batches 32,512]
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
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--batches", default="32,512")
    ap.add_argument("--threads", type=int, default=8)
    args = ap.parse_args()

    from tpuvdb.bench.engine_serving import run_engine_serving

    rng = np.random.default_rng(0)
    corpus = rng.standard_normal((args.rows, args.dim)).astype(np.float32)
    queries = rng.standard_normal((2048, args.dim)).astype(np.float32)

    out = {"metric": "serving_coalesce_ab", "rows": args.rows,
           "dim": args.dim, "threads": args.threads, "ab": {}}
    for b in (int(x) for x in args.batches.split(",")):
        for coalesce in (False, True):
            tag = f"b{b}_{'coalesce' if coalesce else 'direct'}"
            log(f"--- {tag} ---")
            t0 = time.perf_counter()
            stats = run_engine_serving(
                corpus, queries, None, batch=b, threads=args.threads,
                coalesce=coalesce, log=log)
            out["ab"][tag] = {
                "qps_single": stats.get("engine_qps_single"),
                "qps_pipelined": stats.get("engine_qps_pipelined"),
                "groups": stats.get("search_groups"),
                "wall_s": round(time.perf_counter() - t0, 1),
            }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
