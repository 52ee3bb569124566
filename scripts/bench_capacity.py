"""Capacity-scale demo: 8M x 768 (CLIP-shaped, unit-norm) int8 on ONE v5e.

BASELINE config 5 (LAION-100M class) math: 100M rows over 8+ chips needs
~12.5M rows/chip at 768-d. int8 storage = 0.75 KB/row -> 8M rows ~ 6.1 GB
of the 16 GB HBM. Measures the XLA int8 scan (+ exact dequant re-rank)
QPS and recall@10 against a streamed exact-f32 oracle.
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from tpuvdb.kernels.quant import (l2sq_topk_int8_rescored,
                                      l2sq_topk_int8_xla, quantize_rows_np)

    n, dim, k = 8_000_000, 768, 10
    chunk = 500_000
    n_clusters = 512
    rng = np.random.default_rng(0)
    centers = rng.standard_normal((n_clusters, dim)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)

    ci8 = np.empty((n, dim), np.int8)
    scales = np.empty(n, np.float32)
    sqn = np.empty(n, np.float32)
    n_check = 64
    # held-out queries from the same mixture
    qc = rng.integers(0, n_clusters, n_check)
    queries = centers[qc] + 0.25 * rng.standard_normal((n_check, dim)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    q512 = np.concatenate([queries] * 8)[:512].astype(np.float32)

    best_d = np.full((n_check, k), np.inf, np.float64)
    best_i = np.full((n_check, k), -1, np.int64)
    t0 = time.time()
    for lo in range(0, n, chunk):
        m = min(chunk, n - lo)
        cid = rng.integers(0, n_clusters, m)
        x = centers[cid] + 0.25 * rng.standard_normal((m, dim)).astype(np.float32)
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        ci8[lo:lo+m], scales[lo:lo+m] = quantize_rows_np(x)
        sqn[lo:lo+m] = np.einsum("nd,nd->n", x, x)
        # streamed exact oracle for the check queries
        d = (np.einsum("qd,qd->q", queries, queries)[:, None]
             - 2.0 * (queries @ x.T) + sqn[None, lo:lo+m])
        di = np.argpartition(d, k, axis=1)[:, :k]
        dv = np.take_along_axis(d, di, axis=1)
        alld = np.concatenate([best_d, dv], axis=1)
        alli = np.concatenate([best_i, di + lo], axis=1)
        order = np.argsort(alld, axis=1)[:, :k]
        best_d = np.take_along_axis(alld, order, axis=1)
        best_i = np.take_along_axis(alli, order, axis=1)
        if lo % 2_000_000 == 0:
            log(f"gen+oracle {lo/1e6:.0f}M / {n/1e6:.0f}M ({time.time()-t0:.0f}s)")
    log(f"corpus built in {time.time()-t0:.0f}s; host int8 {ci8.nbytes/2**30:.1f} GiB")

    corpus_i8 = jax.device_put(jnp.asarray(ci8))
    row_scales = jax.device_put(jnp.asarray(scales))
    sqnorms = jax.device_put(jnp.asarray(sqn))
    valid = jax.device_put(jnp.ones(n, bool))
    qdev = jax.device_put(jnp.asarray(q512))
    log("device arrays resident")

    def int8_fn(q, c, r, s, v):
        return l2sq_topk_int8_xla(q, c, r, s, v, k=k, recall_target=0.95)

    def resc_fn(q, c, r, s, v):
        return l2sq_topk_int8_rescored(q, c, r, s, v, k=k, fetch=32,
                                       recall_target=0.95)

    # (the Pallas bucketed sweep + fused re-rank was retired round 4:
    # it lost here too — 18.5k vs 26.3k QPS at 8M x 768; the predicted
    # constant-in-d fold advantage never flipped the balance)
    results = {}
    paths = [("int8_b128", int8_fn, 128),
             ("int8_b256", int8_fn, 256),
             ("int8_resc_b128", resc_fn, 128),
             ("int8_resc_b256", resc_fn, 256)]
    for name, fn, batch in paths:
        bq = qdev[:batch]
        arrays = (corpus_i8, row_scales, sqnorms, valid)
        t0 = time.perf_counter()
        dist, idx = fn(bq, *arrays)
        jax.block_until_ready((dist, idx))
        log(f"{name}: first call {time.perf_counter()-t0:.1f}s")
        got = np.asarray(idx)[:n_check]
        recall = float(np.mean([len(set(got[i]) & set(best_i[i])) / k
                                for i in range(n_check)]))

        @functools.partial(jax.jit, static_argnames=("iters",))
        def timed(q, *arrs, iters, fn=fn):
            def body(_, carry):
                d, i = fn(q + carry * 1e-30, *arrs)
                return jnp.sum(d * 0.0) + jnp.float32(jnp.sum(i) % 7) * 1e-30 + carry
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

        def measure(iters, reps):
            float(timed(bq, *arrays, iters=1))
            float(timed(bq, *arrays, iters=1 + iters))
            vals = []
            for _ in range(reps):
                t1 = time.perf_counter(); float(timed(bq, *arrays, iters=1))
                t1 = time.perf_counter() - t1
                t2 = time.perf_counter(); float(timed(bq, *arrays, iters=1 + iters))
                t2 = time.perf_counter() - t2
                vals.append((t2 - t1) / iters)
            pos = sorted(v for v in vals if v > 0)
            return pos[len(pos) // 2] if pos else -1.0

        best = measure(5, 3)
        if best <= 0:
            best = measure(20, 3)
        if best <= 0:
            log(f"{name}: measurement failed")
            continue
        qps = batch / best
        gbs = (n * dim + n * 12) / best / 2**30
        results[name] = {"qps": round(qps), "recall": round(recall, 4),
                         "ms": round(best * 1000, 2), "GiBps": round(gbs, 1)}
        log(f"{name}: {best*1000:.2f} ms -> {qps:,.0f} QPS, recall {recall:.4f}, "
            f"{gbs:.0f} GiB/s effective")

    print(json.dumps(results))


if __name__ == "__main__":
    import os
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tpuvdb_jax_cache")
    main()
