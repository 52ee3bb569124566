"""Headline benchmark: scan QPS/chip on a SIFT1M-scale corpus (1M x 128).

BASELINE.md config 2 targets: >= 50k QPS/chip exact and >= 500k QPS/chip
IVF-flat, both at recall@10 >= 0.95 vs brute force. The reference itself
publishes no numbers (BASELINE.json published:{}), so vs_baseline compares
against those north-star targets.

Measures three production paths and reports the fastest that clears the
recall bar:
  * approx  — XLA fused GEMM + hardware PartialReduce (approx_max_k), bf16
  * pallas  — fused Mosaic scan kernel (bucketed streaming top-k), bf16
  * int8    — XLA int8 x int8 scan with exact norm correction

Timing note: the remote-execution relay makes per-call block_until_ready
unreliable, so iterations are chained ON DEVICE with a data dependency
(fori_loop) and only a scalar is read back; cost = (t[1+N] - t[1]) / N.

Prints ONE JSON line to stdout; diagnostics go to stderr.
"""

from __future__ import annotations

import functools
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
    from tpuvdb.kernels.pallas_scan import pallas_l2sq_topk
    from tpuvdb.kernels.quant import (l2sq_topk_int8_rescored,
                                      l2sq_topk_int8_xla, quantize_rows_np)

    n, dim, k = 1_000_000, 128, 10
    q_batch = 256
    max_batch = 512  # widest per-path batch measured below
    block = 65536
    recall_target = 0.95
    on_tpu = jax.default_backend() == "tpu"

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")

    rng = np.random.default_rng(0)
    # real SIFT1M when a dataset dir is mounted (TPUVDB_DATASET_DIR);
    # synthetic gaussian otherwise (zero-egress environments)
    from tpuvdb.bench.datasets import sift1m_if_available

    real = sift1m_if_available(max_rows=n)
    if real is not None:
        corpus_np, queries_real = real
        n, dim = corpus_np.shape
        dataset_note = f"real SIFT1M {n}x{dim}"
        log(f"using real SIFT1M: {n} x {dim}")
    else:
        import os as _os

        dataset_note = (
            "synthetic-adversarial (real dataset absent: "
            f"TPUVDB_DATASET_DIR={_os.environ.get('TPUVDB_DATASET_DIR', '<unset>')}"
            " has no sift/sift_base.fvecs — mount SIFT1M/Deep to get real"
            " recall numbers, zero builder work needed)")
    if real is None:
        # adversarial synthetic (VERDICT r1 #3: recall on NON-gaussian
        # data): zipf-sized tight clusters + near-duplicate shells +
        # a gaussian background — the distributions that broke recall
        # margins in r1 (docs/BENCH_NOTES.md)
        log("synthesizing adversarial clustered corpus")
        n_clusters = 256
        w = 1.0 / np.arange(1, n_clusters + 1)
        counts = rng.multinomial(int(n * 0.6), w / w.sum())
        parts = [rng.standard_normal((int(n * 0.2), dim)).astype(np.float32)]
        for m in counts[counts > 0]:
            c = rng.standard_normal(dim).astype(np.float32) * 4.0
            parts.append(c + 0.35 * rng.standard_normal((m, dim)).astype(np.float32))
        # near-duplicate shells: tight copies of random rows
        basep = np.concatenate(parts)
        dup_src = basep[rng.choice(len(basep), int(n * 0.2))]
        parts.append(dup_src + 0.02 * rng.standard_normal(dup_src.shape).astype(np.float32))
        corpus_np = np.concatenate(parts)[:n].astype(np.float32)
        corpus_np = corpus_np[rng.permutation(n)]
        queries_real = None
    n_pad = ((n + block - 1) // block) * block
    padded = np.zeros((n_pad, dim), np.float32)
    padded[:n] = corpus_np
    sq_np = np.zeros(n_pad, np.float32)
    sq_np[:n] = np.einsum("nd,nd->n", corpus_np, corpus_np)
    valid_np = np.zeros(n_pad, bool)
    valid_np[:n] = True
    if queries_real is not None and len(queries_real) >= max_batch:
        queries_np = queries_real[:max_batch].astype(np.float32)
    else:
        queries_np = rng.standard_normal((max_batch, dim)).astype(np.float32)

    corpus_bf16 = jax.device_put(jnp.asarray(padded, dtype=jnp.bfloat16))
    ci8_np, scales_np = quantize_rows_np(padded)
    corpus_i8 = jax.device_put(jnp.asarray(ci8_np))
    row_scales = jax.device_put(jnp.asarray(scales_np))
    sqnorms = jax.device_put(jnp.asarray(sq_np))
    valid = jax.device_put(jnp.asarray(valid_np))
    queries = jax.device_put(jnp.asarray(queries_np))

    # each path: (fn(q, *arrays), arrays, batch) — arrays must be jit
    # ARGUMENTS, not closure captures, or the corpus gets baked into the
    # compile payload
    def int8_fn(q, c, r, s, v):
        return l2sq_topk_int8_xla(q, c, r, s, v, k=k,
                                  recall_target=recall_target)

    # int8 scan + fused on-device exact re-rank of the overfetched
    # candidates: removes query-quantization + approx-selection error in
    # one program. fetch=32 is the measured sweet spot on v5e (recall
    # saturates at the corpus-quantization ceiling ~0.973 by fetch=64,
    # while approx_max_k selection cost grows steeply with fetch:
    # 32 -> 515k QPS, 64 -> 367k, 128 -> 255k at 1M x 128).
    def int8_rescored_fn(q, c, r, s, v):
        return l2sq_topk_int8_rescored(q, c, r, s, v, k=k, fetch=32,
                                       recall_target=recall_target)

    paths = {
        "approx_bf16": (
            lambda q, c, s, v: l2sq_topk(q, c, s, v, k=k, block_size=block,
                                         mode="approx",
                                         recall_target=recall_target),
            (corpus_bf16, sqnorms, valid),
            q_batch,
        ),
        "int8": (int8_fn, (corpus_i8, row_scales, sqnorms, valid), q_batch),
        "int8_b128": (int8_fn, (corpus_i8, row_scales, sqnorms, valid), 128),
        "int8_rescored": (
            int8_rescored_fn, (corpus_i8, row_scales, sqnorms, valid),
            q_batch),
    }
    if on_tpu:
        def pallas_fn(q, c, s, v):
            return pallas_l2sq_topk(q, c, s, v, k=k, block_rows=16384,
                                    n_buckets=512)

        paths["pallas_bf16"] = (
            pallas_fn, (corpus_bf16, sqnorms, valid), q_batch)
        # 512-query tiles amortize one corpus sweep over 2x more queries
        paths["pallas_bf16_b512"] = (
            pallas_fn, (corpus_bf16, sqnorms, valid), 512)

        # (pallas_int8_rescored retired round 4: it lost to the XLA
        # int8_rescored path at every measured shape — 329k vs 503k at
        # 1M x 128, 18.5k vs 26.3k at 8M x 768; the "constant-in-d VPU
        # fold" niche never materialized. See BENCH_NOTES.)

    # oracle for recall
    n_check = 64
    _, oidx = numpy_oracle(queries_np[:n_check], corpus_np,
                           np.ones(n, bool), k)

    results = {}
    for name, (fn, arrays, batch_n) in paths.items():
        bq = queries[:batch_n]
        t0 = time.perf_counter()
        dist, idx = fn(bq, *arrays)
        jax.block_until_ready((dist, idx))
        log(f"{name}: first call {time.perf_counter() - t0:.1f}s")
        got = np.asarray(idx)[:n_check]
        recall = float(np.mean(
            [len(set(got[i]) & set(oidx[i])) / k for i in range(n_check)]
        ))

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
            # median of positives: the shared pool occasionally makes the
            # 1-iter baseline slower than the chained run (negative delta)
            pos = sorted(v for v in vals if v > 0)
            return pos[len(pos) // 2] if pos else -1.0

        best = measure(20, 3)
        if best <= 0:
            log(f"{name}: noisy measurement, re-running with longer chain")
            best = measure(100, 3)
        if best <= 0:
            log(f"{name}: measurement failed (pool noise); skipping")
            continue
        qps = batch_n / best
        results[name] = {"qps": round(qps, 1), "recall_at_10": round(recall, 4),
                         "batch": batch_n,
                         "batch_latency_ms": round(best * 1000, 3)}
        log(f"{name}: {best*1000:.3f} ms/batch -> {qps:,.0f} QPS, "
            f"recall@10 {recall:.4f}")

    # ---- served path: the ENGINE end to end at the headline batch
    # (device scan + delta merge + key resolution + assembly), plus IVF
    # where it wins — small-batch latency (VERDICT r2 #2 / weak #7)
    engine_stats = {}
    try:
        from tpuvdb.bench.engine_serving import (run_engine_serving,
                                                 run_ivf_small_batch)

        serve_batch = 512
        kb = results.get("pallas_bf16_b512") or results.get("approx_bf16")
        kernel_ms = (kb["batch_latency_ms"] * serve_batch / kb["batch"]
                     if kb else None)
        engine_stats = run_engine_serving(
            corpus_np, queries_np, oidx, k=k, batch=serve_batch,
            kernel_ms_per_batch=kernel_ms,
            search_mode="pallas" if on_tpu else "approx", log=log)
        engine_stats.update(run_ivf_small_batch(
            corpus_np, queries_np, k=k, log=log))
    except Exception as e:  # the headline kernel numbers still publish
        log(f"engine serving bench failed: {type(e).__name__}: {e}")
        engine_stats = {"error": f"{type(e).__name__}: {e}"}

    # headline bar raised to 0.97 (VERDICT r1: don't headline a path with
    # a thin margin over the 0.95 floor); fall back to 0.95 then anything
    for bar in (0.97, 0.95, 0.0):
        qualifying = {k_: v for k_, v in results.items()
                      if v["recall_at_10"] >= bar}
        if qualifying:
            break
    best_name = max(qualifying, key=lambda k_: qualifying[k_]["qps"])
    best = results[best_name]
    target = 50_000.0

    # capacity-tier artifacts (VERDICT r3 #1: the PQ full-stack numbers
    # must reach the driver bench): scripts/bench_capacity_pq.py --out
    # writes these after its multi-hour run; the driver line carries the
    # recorded result so BENCH_rNN.json has the served PQ recall/QPS/
    # restart without re-running a 25-90 min build here
    import glob as _glob
    import os as _os
    capacity = {}
    _docs = _os.path.join(_os.path.dirname(_os.path.dirname(
        _os.path.dirname(_os.path.abspath(__file__)))), "docs")
    for p in sorted(_glob.glob(_os.path.join(_docs, "BENCH_PQ*.json"))):
        try:
            with open(p) as fh:
                art = json.load(fh)
            capacity[art.get("metric", _os.path.basename(p))] = art
        except Exception as e:
            log(f"capacity artifact {p} unreadable: {e}")

    print(json.dumps({
        "metric": "scan_qps_per_chip_sift1m_shape",
        "value": best["qps"],
        "unit": "qps",
        "vs_baseline": round(best["qps"] / target, 2),
        "recall_at_10": best["recall_at_10"],
        "best_path": best_name,
        "batch": best["batch"],
        "corpus": [n, dim],
        "dataset": dataset_note,
        "paths": results,
        "engine": engine_stats,
        "capacity_pq": capacity or None,
    }))


if __name__ == "__main__":
    main()
