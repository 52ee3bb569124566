"""b1 fixed-cost split for the packed IVF probe (VERDICT r3 weak #6).

The r3/r4 measurements put b1 at ~1.22-1.37 ms at 10M x 96 and attribute
the residue to the program AROUND the DMA loop (coarse scoring + top_k,
expand/sort/cumsum prologue, final top_k). This diag measures that split
directly with the same device-chained fori_loop methodology as
bench_capacity_ivf.py, then A/Bs the two candidate levers:

  * coarse_approx — jax.lax.approx_max_k for the coarse cell pick
    (TPU-native partial reduction; lax.top_k is a full sort over nlist)
  * cps_override  — more chunks per grid step at small batch (fewer grid
    steps, one wider MXU dot, more parallel chunk DMAs per step)

Recall@10 against the cached exact oracle arbitrates every variant.

Reference role: the ANN serving path of
/root/reference/src/datanode/handler.py:361 (hnswlib ef escalation).
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


def chained(fn, *arrays, iters=10, reps=3):
    """Median per-iteration device time of fn chained iters times."""

    @functools.partial(jax.jit, static_argnames=("n",))
    def timed(q, *arrs, n):
        def body(_, carry):
            out = fn(q + carry * 1e-30, *arrs)
            leaves = jax.tree_util.tree_leaves(out)
            acc = carry
            for lv in leaves:
                acc = acc + jnp.sum(lv).astype(jnp.float32) * 1e-30
            return acc
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    q = arrays[0]
    rest = arrays[1:]
    float(timed(q, *rest, n=1))   # compile
    vals = []
    for _ in range(reps):
        t1 = time.perf_counter()
        float(timed(q, *rest, n=1))
        t1 = time.perf_counter() - t1
        t2 = time.perf_counter()
        float(timed(q, *rest, n=1 + iters))
        t2 = time.perf_counter() - t2
        vals.append((t2 - t1) / iters)
    pos = sorted(v for v in vals if v > 0)
    return pos[len(pos) // 2] if pos else -1.0


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=10_000_000)
    ap.add_argument("--dim", type=int, default=96)
    ap.add_argument("--nlist", type=int, default=4096)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--nprobe", type=int, default=16)
    args = ap.parse_args()
    n, dim, k, nprobe = args.rows, args.dim, args.k, args.nprobe

    cache = os.environ.get("TPUVDB_BENCH_CACHE", "/root/bench_cache")
    corpus_file = os.path.join(cache, f"capivf_{n}_{dim}_0.12_{k}.npz")
    if not os.path.exists(corpus_file):
        log(f"missing cached corpus {corpus_file} — run bench_capacity_ivf "
            f"with TPUVDB_BENCH_CACHE first")
        sys.exit(1)
    z = np.load(corpus_file)
    best_i = z["best_i"]

    rng = np.random.default_rng(0)
    centers = rng.standard_normal((512, dim)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    qc = rng.integers(0, 512, N_CHECK)
    queries = (centers[qc]
               + 0.12 * rng.standard_normal((N_CHECK, dim)).astype(np.float32))
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)

    from tpuvdb.index.ivf import IVFIndex
    from tpuvdb.kernels import pallas_ivf as pivf

    idx_file = os.path.join(cache, f"diagivf_{n}_{dim}_{args.nlist}.npz")
    if os.path.exists(idx_file):
        index = IVFIndex.from_packed(np.load(idx_file))
        log(f"packed index loaded from {idx_file}")
    else:
        vectors = z["vectors"]
        t0 = time.time()
        index = IVFIndex.build(vectors, np.ones(n, bool), nlist=args.nlist,
                               nprobe=nprobe, dtype=jnp.int8, seed=0)
        log(f"IVF build {time.time()-t0:.0f}s: nlist={index.nlist}, "
            f"cell_pad={index.cell_pad}")
        del vectors
        np.savez(idx_file, **IVFIndex.packed_fetch(index.packed_capture()))
        log(f"packed index cached to {idx_file}")
    del z

    oracle = [set(best_i[i]) for i in range(N_CHECK)]
    cents = jnp.asarray(index.centroids, jnp.float32)
    arrays = (cents, index.grouped, index.grouped_sq, index.grouped_valid,
              index.cell_scales, index.spill, index.spill_sq,
              index.spill_valid, index.spill_scales, index.cell_offsets)

    results = {"rows": n, "dim": dim, "nlist": int(index.nlist),
               "cell_pad": int(index.cell_pad), "nprobe": nprobe}

    # ---- stage 1: coarse pick alone (exact vs approx)
    def coarse_exact(q, cents, *_):
        qf = q.astype(jnp.float32)
        c_sq = jnp.sum(cents * cents, axis=-1)
        s = 2.0 * jnp.dot(qf, cents.T,
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST) - c_sq[None, :]
        return jax.lax.top_k(s, nprobe)

    def coarse_approx(q, cents, *_):
        qf = q.astype(jnp.float32)
        c_sq = jnp.sum(cents * cents, axis=-1)
        s = 2.0 * jnp.dot(qf, cents.T,
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST) - c_sq[None, :]
        return jax.lax.approx_max_k(s, nprobe, recall_target=0.97)

    for b in (1, 128):
        bq = jnp.asarray(np.concatenate([queries] * 2)[:b] if b > N_CHECK
                         else queries[:b])
        t = chained(coarse_exact, bq, cents, iters=20)
        results[f"coarse_exact_b{b}_us"] = round(t * 1e6, 1)
        t = chained(coarse_approx, bq, cents, iters=20)
        results[f"coarse_approx_b{b}_us"] = round(t * 1e6, 1)
        log(f"b{b}: coarse exact {results[f'coarse_exact_b{b}_us']} us, "
            f"approx {results[f'coarse_approx_b{b}_us']} us")

    # ---- stage 2: full probe variants
    variants = [
        ("base", dict()),
        ("cps16", dict(cps_override=16)),
        ("cps32", dict(cps_override=32)),
        ("approx", dict(coarse_approx=True)),
        ("approx_cps32", dict(coarse_approx=True, cps_override=32)),
    ]
    q64 = jnp.asarray(queries)
    for name, kw in variants:
        def probe(q, *arrs, _kw=kw):
            (cents, grouped, gsq, gval, cscales, spill, ssq, sval,
             sscales, coffs) = arrs
            return pivf.pallas_ivf_search(
                q, cents, grouped, gsq, gval,
                cell_pad=index.cell_pad, k=k, nprobe=nprobe, query_tile=8,
                spill=spill, spill_sq=ssq, spill_valid=sval,
                cell_scales=cscales, spill_scales=sscales,
                cell_offsets=coffs, **_kw)

        # recall at b64 (query_tile 8 tiles of 8)
        try:
            _, rows64 = probe(q64, *arrays)
        except Exception as e:
            log(f"{name}: FAILED {type(e).__name__}: {e}")
            results[name] = {"error": str(type(e).__name__)}
            continue
        # map grouped/spill ids -> physical rows (same as IVFIndex.search)
        gid = np.asarray(rows64)
        rows_np = np.full_like(gid, -1, dtype=np.int64)
        gmask = gid >= 0
        in_spill = gid >= index.grouped.shape[0]
        rows_np[gmask & ~in_spill] = index.row_ids[gid[gmask & ~in_spill]]
        sp = gmask & in_spill
        if sp.any():
            rows_np[sp] = index.spill_row_ids[
                gid[sp] - index.grouped.shape[0]]
        rec = float(np.mean([
            len(set(rows_np[i][rows_np[i] >= 0]) & oracle[i]) / k
            for i in range(N_CHECK)]))

        entry = {"recall_at_10": round(rec, 4)}
        for b in (1, 8, 128):
            bq = jnp.asarray((np.concatenate([queries] * 2)[:b]
                              if b > N_CHECK else queries[:b]))
            t = chained(probe, bq, *arrays, iters=10)
            entry[f"b{b}_ms"] = round(t * 1000, 3)
        results[name] = entry
        log(f"{name}: recall {rec:.4f}, b1 {entry['b1_ms']} ms, "
            f"b8 {entry['b8_ms']} ms, b128 {entry['b128_ms']} ms")

    print(json.dumps(results))


if __name__ == "__main__":
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/tmp/tpuvdb_jax_cache")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
    main()
