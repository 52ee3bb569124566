#!/usr/bin/env python
"""ADC formulation microbench: where does the IVF-PQ probe's time go?

The PQ code stream is tiny (M bytes/row), so unlike every other scan in
this repo the ADC probe is NOT HBM-bound — the candidate scoring is
compute-bound on the one-hot expansion (rows x M x 256 VPU compares) and
the (Q, M*256) x (M*256, C) MXU contraction. This script measures, at
capacity shapes (the 16-32M x 768 tier of scripts/bench_capacity_pq.py):

  gather     jnp.take of candidate code rows (the XLA probe's DMA side)
  grouped    adc_scores_grouped  — the serving formulation (one-hot built
             once per query group, G x MXU overcount)
  onehot     adc_scores_gathered_onehot — per-query one-hot einsum
  grp16/oneh16  the same two kernels on the 4-bit fast-scan tier (same
             code BYTES, 2M subspaces of 16 codes — 8x fewer VPU
             compares and 8x fewer MXU MACs); tier detected from LUT width
  int8row    scoring the same candidates from int8 ROWS (d-wide gather)

Times are per-batch device-chained (fori_loop) like bench.py.
Usage: python scripts/bench_adc_micro.py [--q 32] [--r 32768] [--m 96]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tpuvdb_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--q", type=int, default=32)
    ap.add_argument("--r", type=int, default=32768)  # nprobe * cell_pad
    ap.add_argument("--m", type=int, default=96)     # code bytes/row
    ap.add_argument("--d", type=int, default=768)
    ap.add_argument("--rows", type=int, default=4_000_000)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tpuvdb.kernels import pq as pqk

    Q, R, M, D = args.q, args.r, args.m, args.d
    rng = np.random.default_rng(0)
    codes_np = rng.integers(0, 256, (args.rows, M), dtype=np.uint8)
    codes = jnp.asarray(codes_np)
    cb = jnp.asarray(rng.standard_normal((M, 256, D // M)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((Q, D)), jnp.float32)
    cand = jnp.asarray(
        rng.integers(0, args.rows, (Q, R), dtype=np.int64).astype(np.int32))
    lut = pqk._pq_lut(q, cb)

    def timeit(name, fn, *xs):
        # fn takes (i, *xs) with i the ITERATION INDEX and must fold i
        # into its inputs — a loop-invariant body gets hoisted out of
        # the fori_loop by XLA and the "chained" run times pure dispatch.
        # Timing FETCHES THE SCALAR VALUE (float(...)): on the axon relay
        # block_until_ready returns immediately (async execution), so
        # only a device_get actually waits for the computation — without
        # it the bench reports 11 TB/s of fictional gather bandwidth.
        # Per-iter cost = (chained(1+iters) - chained(1)) / iters, like
        # bench/scan.py: the subtraction cancels the dispatch+fetch tick.
        def chained(it, *xs):
            def body(i, acc):
                r = fn(i, *xs)
                return acc + (r if r.dtype == jnp.float32
                              else r.astype(jnp.float32)).ravel()[0]
            return jax.lax.fori_loop(0, it, body, jnp.float32(0))
        g = jax.jit(chained, static_argnums=(0,))
        float(g(1, *xs))
        float(g(1 + args.iters, *xs))  # warm both compiles
        vals = []
        for _ in range(3):
            t1 = time.perf_counter(); float(g(1, *xs))
            t1 = time.perf_counter() - t1
            t2 = time.perf_counter(); float(g(1 + args.iters, *xs))
            t2 = time.perf_counter() - t2
            vals.append((t2 - t1) / args.iters)
        pos = sorted(v for v in vals if v > 0)
        if not pos:
            log(f"{name:>8}: measurement failed (pool noise)")
            return -1.0
        dt = pos[len(pos) // 2]
        per_cand = dt / (Q * R) * 1e9
        log(f"{name:>8}: {dt*1e3:8.3f} ms/batch  {per_cand:7.2f} ns/cand  "
            f"({Q*R/dt/1e9:.2f} Gcand/s)")
        return dt

    def perturb_cand(i, c):
        # iteration-dependent candidate set; cost: Q*R int adds (~1 us)
        return (c + i) % args.rows

    def perturb_lut(i, l):
        # iteration-dependent LUT; cost: Q*M*J f32 adds (~1 us)
        return l + jnp.float32(i) * 1e-12

    log(f"device: {jax.devices()[0].platform}, Q={Q} R={R} M={M} D={D}")

    # 1. gather only (the XLA probe's candidate fetch).  NOTE: every big
    # array is passed as a jit ARGUMENT, never a closure — closed-over
    # arrays are baked into the HLO as constants and shipped through the
    # relay's remote_compile, which rejects multi-GB programs (HTTP 413).
    timeit("gather",
           lambda i, cs, c: jnp.take(cs, perturb_cand(i, c), axis=0
                                     ).astype(jnp.float32).sum(),
           codes, cand)

    codes_g = jnp.take(codes, cand, axis=0)  # pre-gathered for scoring-only
    jax.block_until_ready(codes_g)

    # 2. grouped-GEMM ADC (current serving path)
    timeit("grouped",
           lambda i, l, cg: pqk.adc_scores_grouped(
               perturb_lut(i, l), cg).sum(),
           lut, codes_g)

    # 3. per-query one-hot einsum
    timeit("onehot",
           lambda i, l, cg: pqk.adc_scores_gathered_onehot(
               perturb_lut(i, l), cg).sum(),
           lut, codes_g)

    # 4. 4-bit fast-scan via the REAL kernel functions: same code bytes
    # reinterpreted as packed nibbles, LUT16 is (Q, 2M, 16) — both
    # formulations detect the tier from the LUT width.
    lut16 = jnp.asarray(rng.standard_normal((Q, 2 * M, 16)), jnp.float32)
    timeit("grp16",
           lambda i, l16, cg: pqk.adc_scores_grouped(
               perturb_lut(i, l16), cg).sum(),
           lut16, codes_g)
    timeit("oneh16",
           lambda i, l16, cg: pqk.adc_scores_gathered_onehot(
               perturb_lut(i, l16), cg).sum(),
           lut16, codes_g)

    # 5. int8 row scan reference: what scoring the same candidates from
    # int8 ROWS costs (d-wide gather + direct MXU dot, no one-hot).
    # Rows are generated ON DEVICE (jax.random) — a host ndarray at
    # rows x 768 int8 is ~3 GB and neither the relay transfer nor a
    # closure constant survives that size.
    del codes_np
    rows_i8 = jax.jit(
        lambda k: jax.random.randint(
            k, (args.rows, D), -127, 128, dtype=jnp.int8),
    )(jax.random.PRNGKey(0))
    jax.block_until_ready(rows_i8)

    def int8_ref(i, rw, qq, c):
        rv = jnp.take(rw, perturb_cand(i, c), axis=0).astype(jnp.bfloat16)
        return jnp.einsum("qd,qrd->qr", qq.astype(jnp.bfloat16), rv,
                          preferred_element_type=jnp.float32).sum()

    timeit("int8row", int8_ref, rows_i8, q, cand)


if __name__ == "__main__":
    main()
