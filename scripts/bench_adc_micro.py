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
  nib4       simulated 4-bit fast-scan: same code BYTES (M), 2M subspaces
             of 16 codes — 8x fewer VPU compares and 8x fewer MXU MACs

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
        f = jax.jit(fn)
        out = f(*xs)
        jax.block_until_ready(out)
        # chain on device via fori_loop to dodge relay dispatch ticks
        def chained(*xs):
            def body(i, acc):
                r = fn(*xs)
                return acc + (r if r.dtype == jnp.float32
                              else r.astype(jnp.float32)).ravel()[0]
            return jax.lax.fori_loop(0, args.iters, body, jnp.float32(0))
        g = jax.jit(chained)
        jax.block_until_ready(g(*xs))
        t0 = time.perf_counter()
        jax.block_until_ready(g(*xs))
        dt = (time.perf_counter() - t0) / args.iters
        per_cand = dt / (Q * R) * 1e9
        log(f"{name:>8}: {dt*1e3:8.3f} ms/batch  {per_cand:7.2f} ns/cand  "
            f"({Q*R/dt/1e9:.2f} Gcand/s)")
        return dt

    log(f"device: {jax.devices()[0].platform}, Q={Q} R={R} M={M} D={D}")

    # 1. gather only (the XLA probe's candidate fetch)
    timeit("gather", lambda c: jnp.take(codes, c, axis=0
                                        ).astype(jnp.float32).sum(), cand)

    codes_g = jnp.take(codes, cand, axis=0)  # pre-gathered for scoring-only
    jax.block_until_ready(codes_g)

    # 2. grouped-GEMM ADC (current serving path)
    timeit("grouped", lambda l, cg: pqk.adc_scores_grouped(l, cg).sum(),
           lut, codes_g)

    # 3. per-query one-hot einsum
    timeit("onehot",
           lambda l, cg: pqk.adc_scores_gathered_onehot(l, cg).sum(),
           lut, codes_g)

    # 4. simulated 4-bit fast-scan: same bytes, 2M subspaces of 16.
    # Codes reinterpret as nibbles; LUT16 is (Q, 2M, 16).
    lut16 = jnp.asarray(rng.standard_normal((Q, 2 * M, 16)), jnp.float32)

    def nib4(l16, cg, chunk=2048, q_group=8):
        q_n, r_n, m_b = cg.shape
        g = min(q_group, q_n)
        n_groups = q_n // g
        flat_r = g * r_n
        if flat_r % chunk:
            chunk = flat_r
        jota = jnp.arange(16, dtype=jnp.int32)
        l16g = l16.reshape(n_groups, g, 2 * m_b * 16).astype(jnp.bfloat16)
        cgf = cg.reshape(n_groups, flat_r, m_b).astype(jnp.int32)

        def per_group(l1, c1):
            def body(_, i):
                cgc = jax.lax.dynamic_slice_in_dim(c1, i * chunk, chunk)
                lo = cgc & 15
                hi = cgc >> 4
                nib = jnp.concatenate([lo, hi], axis=-1)  # (C, 2M)
                onehot = (nib[:, :, None] == jota).astype(jnp.bfloat16)
                out = jax.lax.dot_general(
                    l1, onehot.reshape(chunk, 2 * m_b * 16),
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                return 0, out

            _, blocks = jax.lax.scan(
                body, 0, jnp.arange(flat_r // chunk, dtype=jnp.int32))
            big = jnp.moveaxis(blocks, 0, 1).reshape(g, g, r_n)
            return big[jnp.arange(g), jnp.arange(g)]

        return jax.vmap(per_group)(l16g, cgf).reshape(-1, r_n)

    timeit("nib4", lambda l16, cg: nib4(l16, cg).sum(), lut16, codes_g)

    # 5. int8 row scan reference: what scoring the same candidates from
    # int8 ROWS costs (d-wide gather + direct MXU dot, no one-hot)
    rows_i8 = jnp.asarray(
        rng.integers(-127, 128, (args.rows, D), dtype=np.int8))

    def int8_ref(qq, c):
        rv = jnp.take(rows_i8, c, axis=0).astype(jnp.bfloat16)
        return jnp.einsum("qd,qrd->qr", qq.astype(jnp.bfloat16), rv,
                          preferred_element_type=jnp.float32).sum()

    timeit("int8row", int8_ref, q, cand)


if __name__ == "__main__":
    main()
