"""IVF measured where it is supposed to win (VERDICT r2 weak #7):
8M x 768 int8 cells on ONE v5e, small query batches.

The flat int8 scan reads the whole 6.1 GiB corpus per batch — its cost
is batch-independent, so small batches pay the full sweep. The IVF probe
reads nprobe * cell_pad rows per query (~1-2% of the corpus), which is
where sub-ms single-query latency and beyond-flat-QPS at small batch
must come from. Methodology matches bench_capacity.py: device-chained
fori_loop timing (relay dispatch excluded), recall vs a streamed exact
f32 oracle over the same clustered corpus.

Set TPUVDB_BENCH_CACHE=<dir> to cache the generated corpus + oracle
(~12 min of host time at 10M x 96) between runs.
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

N_CHECK = 64


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=8_000_000)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--nlist", type=int, default=4096)
    ap.add_argument("--k", type=int, default=10)
    # cluster std RELATIVE to unit-norm centers. At 0.25 the per-cluster
    # radius^2 (0.25^2 * dim) dwarfs the ~2.0 inter-center separation for
    # dim >= 64 — the corpus degenerates to one unimodal blob, which no
    # coarse quantizer can prune (measured recall@10 0.46 at nprobe 64 on
    # 10M x 96). 0.12 keeps clusters overlapping but real, like actual
    # embedding corpora (Deep1B descriptors are CNN features, clustered).
    ap.add_argument("--cluster-std", type=float, default=0.12)
    args = ap.parse_args()
    n, dim, k = args.rows, args.dim, args.k
    std = args.cluster_std
    chunk = 500_000
    n_gen_clusters = 512
    rng = np.random.default_rng(0)
    centers = rng.standard_normal((n_gen_clusters, dim)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)

    qc = rng.integers(0, n_gen_clusters, N_CHECK)
    queries = centers[qc] + std * rng.standard_normal(
        (N_CHECK, dim)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    q128 = np.concatenate([queries] * 2)[:128].astype(np.float32)

    cache = os.environ.get("TPUVDB_BENCH_CACHE")
    cache_file = (os.path.join(cache, f"capivf_{n}_{dim}_{std}_{k}.npz")
                  if cache else None)
    if cache_file and os.path.exists(cache_file):
        z = np.load(cache_file)
        vectors, best_i = z["vectors"], z["best_i"]
        log(f"corpus + oracle loaded from {cache_file}")
        return run(args, vectors, best_i, queries, q128)

    vectors = np.empty((n, dim), np.float32)
    best_d = np.full((N_CHECK, k), np.inf, np.float64)
    best_i = np.full((N_CHECK, k), -1, np.int64)
    t0 = time.time()
    for lo in range(0, n, chunk):
        m = min(chunk, n - lo)
        cid = rng.integers(0, n_gen_clusters, m)
        x = centers[cid] + std * rng.standard_normal(
            (m, dim)).astype(np.float32)
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        vectors[lo:lo + m] = x
        d = (np.einsum("qd,qd->q", queries, queries)[:, None]
             - 2.0 * (queries @ x.T)
             + np.einsum("nd,nd->n", x, x)[None, :])
        di = np.argpartition(d, k, axis=1)[:, :k]
        dv = np.take_along_axis(d, di, axis=1)
        alld = np.concatenate([best_d, dv], axis=1)
        alli = np.concatenate([best_i, di + lo], axis=1)
        order = np.argsort(alld, axis=1)[:, :k]
        best_d = np.take_along_axis(alld, order, axis=1)
        best_i = np.take_along_axis(alli, order, axis=1)
        if lo % 2_000_000 == 0:
            log(f"gen+oracle {lo/1e6:.0f}M / {n/1e6:.0f}M "
                f"({time.time()-t0:.0f}s)")
    log(f"corpus built in {time.time()-t0:.0f}s "
        f"({vectors.nbytes/2**30:.1f} GiB f32 host)")
    if cache_file:
        os.makedirs(cache, exist_ok=True)
        np.savez(cache_file, vectors=vectors, best_i=best_i)
        log(f"cached corpus + oracle to {cache_file}")
    run(args, vectors, best_i, queries, q128)


def run(args, vectors, best_i, queries, q128):
    from tpuvdb.index.ivf import IVFIndex
    from tpuvdb.kernels.pallas_ivf import pallas_ivf_search

    n, dim, k = vectors.shape[0], vectors.shape[1], args.k
    t0 = time.time()
    index = IVFIndex.build(vectors, np.ones(n, bool), nlist=args.nlist,
                           nprobe=32, dtype=jnp.int8, seed=0)
    del vectors  # free the f32 corpus: the index owns int8 cells
    log(f"IVF build {time.time()-t0:.0f}s: nlist={index.nlist}, "
        f"cell_pad={index.cell_pad}, grouped={index.grouped.shape}, "
        f"spill={index.spill.shape[0]}, "
        f"HBM ~{(index.grouped.nbytes + index.spill.nbytes)/2**30:.2f} GiB")

    oracle = [set(best_i[i]) for i in range(N_CHECK)]

    # recall sweep via the host wrapper (maps grouped ids -> physical rows)
    chosen = None
    rec = 0.0
    nprobe = 8
    for nprobe in (8, 16, 32, 64, 128, 256):
        try:
            _, rows = index.search(queries, k, nprobe=nprobe, max_batch=64)
        except Exception as e:
            # wide nprobe can exceed the kernel's SMEM scalar-prefetch
            # budget (measured: nprobe 128 at nlist 8192 / query_tile 8);
            # the curve below the ceiling is still the answer
            log(f"nprobe {nprobe}: kernel limit ({type(e).__name__}); "
                f"stopping sweep")
            break
        rec = float(np.mean([
            len(set(rows[i][rows[i] >= 0]) & oracle[i]) / k
            for i in range(N_CHECK)]))
        log(f"nprobe {nprobe}: recall@{k} {rec:.4f}")
        if chosen is None and rec >= 0.95:
            chosen = (nprobe, rec)
    if chosen is None:
        chosen = (nprobe, rec)
    nprobe, recall = chosen
    log(f"measuring at nprobe={nprobe} (recall {recall:.4f})")

    # device-chained timing: arrays as jit ARGUMENTS (closure constants
    # blow up the relay's compile payload), scalar-only readback
    cents = jnp.asarray(index.centroids, jnp.float32)
    arrays = (cents, index.grouped, index.grouped_sq, index.grouped_valid,
              index.cell_scales, index.spill, index.spill_sq,
              index.spill_valid, index.spill_scales, index.cell_offsets)

    def probe_fn(q, cents, grouped, gsq, gval, cscales, spill, ssq, sval,
                 sscales, coffs):
        return pallas_ivf_search(
            q, cents, grouped, gsq, gval,
            cell_pad=index.cell_pad, k=k, nprobe=nprobe, query_tile=8,
            spill=spill, spill_sq=ssq, spill_valid=sval,
            cell_scales=cscales, spill_scales=sscales, cell_offsets=coffs)

    @functools.partial(jax.jit, static_argnames=("iters",))
    def timed(q, *arrs, iters):
        def body(_, carry):
            d, i = probe_fn(q + carry * 1e-30, *arrs)
            return (jnp.sum(d * 0.0) + jnp.float32(jnp.sum(i) % 7) * 1e-30
                    + carry)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    results = {"nprobe": nprobe, "recall_at_10": round(recall, 4),
               "nlist": int(index.nlist), "cell_pad": int(index.cell_pad),
               "rows": n, "dim": dim,
               "hbm_gib": round((index.grouped.nbytes
                                 + index.spill.nbytes) / 2**30, 2)}
    for name, batch in (("b1", 1), ("b8", 8), ("b128", 128)):
        bq = jnp.asarray(q128[:batch])
        t0 = time.perf_counter()
        float(timed(bq, *arrays, iters=1))
        log(f"{name}: first call {time.perf_counter()-t0:.1f}s")

        def measure(iters, reps):
            float(timed(bq, *arrays, iters=1 + iters))
            vals = []
            for _ in range(reps):
                t1 = time.perf_counter()
                float(timed(bq, *arrays, iters=1))
                t1 = time.perf_counter() - t1
                t2 = time.perf_counter()
                float(timed(bq, *arrays, iters=1 + iters))
                t2 = time.perf_counter() - t2
                vals.append((t2 - t1) / iters)
            pos = sorted(v for v in vals if v > 0)
            return pos[len(pos) // 2] if pos else -1.0

        best = measure(10, 3)
        if best <= 0:
            best = measure(40, 3)
        if best <= 0:
            log(f"{name}: measurement failed")
            continue
        results[name] = {
            "ms_per_batch": round(best * 1000, 3),
            "us_per_query": round(best / batch * 1e6, 1),
            "qps": round(batch / best),
        }
        log(f"{name}: {best*1000:.3f} ms/batch -> "
            f"{best/batch*1e6:.1f} us/query, {batch/best:,.0f} QPS")

    print(json.dumps(results))


if __name__ == "__main__":
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/tmp/tpuvdb_jax_cache")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
    main()
