#!/usr/bin/env python
"""Relay/device concurrency microbench (VERDICT r3 weak #3 accounting).

Times ONE fixed device program — a bf16 GEMM sized to ~10-30 ms of real
device work — dispatched from T=1,2,4,8,16 python threads, each thread
running its own chain of dependent calls. If the path to the device
executed requests with perfect overlap (pipelined dispatch, one queue),
QPS would scale ~linearly in T until device saturation; the measured
curve is the empirical ceiling for ANY engine serving through this path
(engine_qps_pipelined can't beat batch/batch_ms at the plateau).

This separates "the engine wastes concurrency" from "the transport
serializes" with a program that has no engine, no locks, no host work.
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


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--payload", action="store_true",
                    help="serving-shaped calls: per-call host->device "
                         "query upload (b x d f32) + device->host result "
                         "fetch (b x k), the transfers engine "
                         "search_batch pays that the pure-GEMM chain "
                         "does not")
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")

    # ~1 GFLOP-ish bf16 GEMM; adjust n for a 10-30 ms device time
    n = 4096
    a = jax.device_put(jnp.ones((n, n), jnp.bfloat16))

    if args.payload:
        b, d, k = args.batch, args.dim, args.k
        corpus = jax.device_put(jnp.ones((1 << 20, d), jnp.bfloat16))

        @jax.jit
        def score(q, c):  # scan-shaped: (b,d) x (N,d) -> top-k
            s = jax.lax.dot_general(
                q.astype(jnp.bfloat16), c, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            vals, idx = jax.lax.top_k(s, k)
            return vals, idx

        qnp = np.random.default_rng(0).standard_normal(
            (b, d)).astype(np.float32)
        jax.block_until_ready(score(qnp, corpus))  # compile

        def chain(iters):
            out = 0.0
            for i in range(iters):
                # fresh host array each call: the upload is part of the
                # serving cost being measured
                vals, idx = score(qnp + np.float32(i), corpus)
                out += float(vals[0, 0]) + int(np.asarray(idx)[0, 0])
            return out
    else:
        @jax.jit
        def step(x, s):
            # data-dependent on s so chained calls can't be batched/elided
            return jnp.sum((x + s * 1e-30) @ x) * 1e-30

        s0 = jnp.float32(0.0)
        float(step(a, s0))  # compile

        def chain(iters):
            s = jnp.float32(0.0)
            for _ in range(iters):
                s = step(a, s)
            return float(s)

    # single-dispatch latency (chained: each call waits on the previous)
    t0 = time.perf_counter()
    chain(10)
    per_call = (time.perf_counter() - t0) / 10
    log(f"chained per-call: {per_call*1000:.1f} ms")

    iters = max(4, int(1.5 / per_call / 8))
    results = {}
    for t in (1, 2, 4, 8, 16):
        with ThreadPoolExecutor(max_workers=t) as pool:
            list(pool.map(lambda _: chain(2), range(t)))  # warm threads
            t0 = time.perf_counter()
            list(pool.map(lambda _: chain(iters), range(t)))
            dt = time.perf_counter() - t0
        calls = t * iters
        rate = calls / dt
        results[t] = rate
        log(f"threads={t:2d}: {rate:6.1f} calls/s "
            f"({rate*per_call:.2f}x single-stream, "
            f"{dt/calls*1000:.1f} ms/call effective)")

    base = results[1]
    plateau = max(results.values())
    log(f"concurrency factor at plateau: {plateau/base:.2f}x over 1 thread")
    if args.payload:
        b = args.batch
        log(f"payload mode b{b}: transport-ceiling QPS = "
            f"{plateau * b:,.0f} (calls/s x batch at plateau)")
    import json
    print(json.dumps({
        "metric": ("relay_concurrency_payload" if args.payload
                   else "relay_concurrency"),
        "batch": args.batch if args.payload else None,
        "qps_ceiling": (round(plateau * args.batch, 1)
                        if args.payload else None),
        "per_call_ms": round(per_call * 1000, 2),
        "calls_per_s_by_threads": {str(k): round(v, 1)
                                   for k, v in results.items()},
        "concurrency_factor": round(plateau / base, 2),
    }))


if __name__ == "__main__":
    main()
