"""Headline benchmark: exact-scan QPS/chip on a SIFT1M-scale corpus.

BASELINE.md config 2: SIFT1M 128-d, one chip — target >= 50k QPS/chip exact
at recall@10 >= 0.95 vs brute force. The reference publishes no numbers
(BASELINE.json published:{}), so vs_baseline is measured against that
north-star target.

Prints ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": "qps", "vs_baseline": N/50000, ...}
Diagnostics go to stderr.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from tpuvdb.kernels.distance import l2sq_topk, numpy_oracle

    n, dim, k = 1_000_000, 128, 10
    q_batch = 256
    block = 65536
    recall_target = 0.95
    storage_dtype = jnp.bfloat16

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")

    # pad the 1M corpus to the next block multiple; padding slots are invalid
    n_pad = ((n + block - 1) // block) * block
    rng = np.random.default_rng(0)
    corpus_np = rng.standard_normal((n, dim)).astype(np.float32)
    sq_np = np.zeros(n_pad, dtype=np.float32)
    sq_np[:n] = np.einsum("nd,nd->n", corpus_np, corpus_np)
    queries_np = rng.standard_normal((q_batch, dim)).astype(np.float32)

    padded = np.zeros((n_pad, dim), dtype=np.float32)
    padded[:n] = corpus_np
    valid_np = np.zeros(n_pad, dtype=bool)
    valid_np[:n] = True

    corpus = jax.device_put(jnp.asarray(padded, dtype=storage_dtype))
    sqnorms = jax.device_put(jnp.asarray(sq_np))
    valid = jax.device_put(jnp.asarray(valid_np))
    queries = jax.device_put(jnp.asarray(queries_np))

    def run(q):
        return l2sq_topk(q, corpus, sqnorms, valid, k=k, block_size=block,
                         mode="approx", recall_target=recall_target)

    # compile + warmup
    t0 = time.perf_counter()
    dist, idx = run(queries)
    jax.block_until_ready((dist, idx))
    log(f"first call (compile+run): {time.perf_counter() - t0:.2f}s")

    # recall@10 vs numpy float64 oracle on a query subset
    n_check = 64
    odist, oidx = numpy_oracle(queries_np[:n_check], corpus_np, np.ones(n, bool), k)
    got = np.asarray(idx)[:n_check]
    recall = np.mean(
        [len(set(got[i]) & set(oidx[i])) / k for i in range(n_check)]
    )
    log(f"recall@{k} vs oracle: {recall:.4f}")

    # steady-state timing: the remote-execution relay makes per-call
    # block_until_ready unreliable, so chain iterations on-device with a
    # data dependency and read back one scalar
    import functools

    @functools.partial(jax.jit, static_argnames=("iters",))
    def timed_loop(q, corpus, sqnorms, valid, iters):
        def body(_, carry):
            d, i = l2sq_topk(q + carry * 1e-30, corpus, sqnorms, valid,
                             k=k, block_size=block, mode="approx",
                             recall_target=recall_target)
            return jnp.sum(d * 0.0) + jnp.float32(jnp.sum(i) % 7) * 1e-30 + carry
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    iters = 50
    float(timed_loop(queries, corpus, sqnorms, valid, iters=1))
    float(timed_loop(queries, corpus, sqnorms, valid, iters=1 + iters))
    best = float("inf")
    for _ in range(3):
        t1 = time.perf_counter()
        float(timed_loop(queries, corpus, sqnorms, valid, iters=1))
        t1 = time.perf_counter() - t1
        t2 = time.perf_counter()
        float(timed_loop(queries, corpus, sqnorms, valid, iters=1 + iters))
        t2 = time.perf_counter() - t2
        best = min(best, (t2 - t1) / iters)
    qps = q_batch / best
    lat_ms = best * 1000
    log(f"{lat_ms:.3f} ms/batch of {q_batch} -> {qps:,.0f} QPS")

    target = 50_000.0
    print(json.dumps({
        "metric": "scan_qps_per_chip_sift1m_shape",
        "value": round(qps, 1),
        "unit": "qps",
        "vs_baseline": round(qps / target, 3),
        "recall_at_10": round(float(recall), 4),
        "batch": q_batch,
        "corpus": [n, dim],
        "storage_dtype": "bfloat16",
        "batch_latency_ms": round(lat_ms, 3),
    }))


if __name__ == "__main__":
    main()
