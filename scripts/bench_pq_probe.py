#!/usr/bin/env python
"""Micro-bench: IVF-PQ probe epilogue strategies on TPU.

Builds a mid-scale IVF-PQ index (default 2M x 768, M=96) and times the
probe at serving batches, comparing the ADC epilogues:
  * gather  — row-gather codes + take_along_axis LUT lookup (the
              _ivf_search_pq default)
  * onehot  — row-gather codes + chunked one-hot MXU einsum

Device-chained timing (fori_loop) — per-call block_until_ready through
the relay is meaningless (see bench.py)."""

import argparse
import functools
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
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--subq", type=int, default=96)
    ap.add_argument("--nlist", type=int, default=1024)
    ap.add_argument("--nprobe", type=int, default=16)
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--bits", type=int, default=8, choices=(8, 4))
    ap.add_argument("--tiles", default="8",
                    help="comma list of query_tile values to sweep")
    ap.add_argument("--skip-xla", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tpuvdb.index.ivf import IVFIndex, _ivf_search_pq
    from tpuvdb.utils.hostmem import keep_malloc_warm

    keep_malloc_warm()
    rng = np.random.default_rng(0)
    n, d = args.rows, args.dim
    nc = args.nlist
    cents = rng.standard_normal((nc, d)).astype(np.float32) * 3.0
    who = rng.integers(0, nc, n)
    x = cents[who] + 0.3 * rng.standard_normal((n, d)).astype(np.float32)
    del who

    t0 = time.time()
    idx = IVFIndex.build(x, np.ones(n, bool), nlist=nc, nprobe=args.nprobe,
                         kmeans_iters=8, pq_subq=args.subq, seed=1,
                         pq_bits=args.bits)
    log(f"build: {time.time()-t0:.1f}s nlist={idx.nlist} "
        f"cell_pad={idx.cell_pad} grouped={idx.grouped.shape} "
        f"codes {idx.grouped.nbytes/2**20:.0f} MiB")

    queries = (x[rng.choice(n, 512)]
               + 0.05 * rng.standard_normal((512, d))).astype(np.float32)
    q_dev = jax.device_put(jnp.asarray(queries))

    def timed_factory(fn, batch):
        bq = q_dev[:batch]

        @functools.partial(jax.jit, static_argnames=("iters",))
        def timed(q, iters):
            def body(i, carry):
                dist, gid = fn(q + carry * 1e-30)
                return jnp.sum(dist * 0.0) + jnp.float32(
                    jnp.sum(gid) % 7) * 1e-30 + carry
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

        return timed, bq

    def measure(fn, batch, iters=10, reps=3):
        timed, bq = timed_factory(fn, batch)
        float(timed(bq, iters=1))
        float(timed(bq, iters=1 + iters))
        vals = []
        for _ in range(reps):
            t1 = time.perf_counter(); float(timed(bq, iters=1))
            t1 = time.perf_counter() - t1
            t2 = time.perf_counter(); float(timed(bq, iters=1 + iters))
            t2 = time.perf_counter() - t2
            vals.append((t2 - t1) / iters)
        pos = sorted(v for v in vals if v > 0)
        return pos[len(pos) // 2] if pos else -1.0

    def search_fn(q):
        return _ivf_search_pq(
            q, idx.centroids, idx.cell_offsets, idx.cell_lens, idx.grouped,
            idx.pq_codebooks, idx.grouped_sq, idx.grouped_valid, idx.spill,
            idx.spill_cells, idx.spill_sq, idx.spill_valid,
            nprobe=args.nprobe, k=args.k,
            cell_pad=idx.cell_pad, recall_target=0.95,
            rotation=idx.pq_rotation)

    def pallas_fn_at(tile):
        from tpuvdb.kernels.pallas_pq import pallas_pq_search

        def fn(q):
            return pallas_pq_search(
                q, idx.centroids, idx.grouped, idx.pq_codebooks,
                idx.grouped_sq, idx.grouped_valid, idx.spill,
                idx.spill_cells, idx.spill_sq, idx.spill_valid,
                idx.cell_offsets, cell_pad=idx.cell_pad, k=args.k,
                nprobe=args.nprobe, rotation=idx.pq_rotation,
                query_tile=tile)
        return fn

    variants = [] if args.skip_xla else [("xla-adc", search_fn)]
    for t in (int(s) for s in args.tiles.split(",")):
        variants.append((f"pallas-qt{t}", pallas_fn_at(t)))
    for name, fn in variants:
        for batch in (1, 8, 64, 256):
            dt = measure(fn, batch)
            log(f"{name} b{batch}: {dt*1000:.2f} ms/batch "
                f"({dt/batch*1e6:.0f} us/q, {batch/dt:,.0f} QPS)")

    # quality: candidate recall before re-rank (vs exact top-k)
    qs = queries[:32]
    d2 = (np.sum(qs**2, 1)[:, None] - 2 * qs @ x.T + np.sum(x**2, 1)[None])
    oidx = np.argsort(d2, 1)[:, :10]
    _, rows = idx.search(qs, k=args.k, max_batch=32)
    rec = np.mean([len(set(rows[i][rows[i] >= 0].tolist())
                       & set(oidx[i].tolist())) / 10 for i in range(32)])
    log(f"candidate recall@10 (fetch {args.k}, pre-rerank): {rec:.4f}")


if __name__ == "__main__":
    main()
