#!/usr/bin/env python
"""Round-5 PQ probe speed-of-light accounting (VERDICT r4 next #1).

Times `pallas_pq_search` at the EXACT 8M x 768 capacity shape of
docs/BENCH_PQ8M_r4.json (nlist ~5354, cell_pad 2048, nprobe 16, M=96)
with synthetic codes generated ON DEVICE (the kernel's cost does not
depend on code values, and a 768 MB host->relay upload would dominate
the session). Stages measured separately:

  coarse    — the (Q, d) x (d, nlist) centroid GEMM + top_k(nprobe)
  probe8    — full 8-bit probe (J=256): the r4 configuration
  probe4    — full 4-bit fast-scan probe (J=16, 2M subspaces): same
              stored bytes, 8x narrower one-hot MXU contraction
  qt/cps sweeps — query_tile and chunks-per-step sensitivity

Analytic ceiling at this shape, for the table in docs/BENCH_NOTES.md:
per b32, chunk visits = ceil(32/qt) tiles x qt*nprobe*(cell_pad/128)
chunks; MXU MACs/chunk = 128pad(qt) x (M*J) x 128. The one-hot GEMM's
output has only qt useful rows of the 128-row MXU tile, so utilization
<= qt/128 — the J-factor overcount plus this tile waste IS the 8-bit
floor; 4-bit divides the K dimension (M*J) by 8.

Usage: python scripts/bench_pq_kernel_r5.py [--rows 8000000] [--q 32]
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
    ap.add_argument("--rows", type=int, default=8_000_000)
    ap.add_argument("--d", type=int, default=768)
    ap.add_argument("--m", type=int, default=96)      # code bytes/row
    ap.add_argument("--q", type=int, default=32)
    ap.add_argument("--k", type=int, default=640)     # fetch width (64x k10)
    ap.add_argument("--nprobe", type=int, default=16)
    ap.add_argument("--nlist", type=int, default=5354)
    ap.add_argument("--cell-pad", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--sweep", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from tpuvdb.kernels.pallas_pq import pallas_pq_search

    D, M, Q = args.d, args.m, args.q
    # uniform 128-aligned cells covering the corpus
    cell_rows = max(128, ((args.rows // args.nlist) // 128) * 128)
    nlist = -(-args.rows // cell_rows)
    n_g = nlist * cell_rows
    log(f"shape: rows={args.rows} d={D} M={M} nlist={nlist} "
        f"cell_rows={cell_rows} n_g={n_g} cell_pad={args.cell_pad} "
        f"nprobe={args.nprobe} Q={Q} k={args.k}")

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    codes = jax.jit(lambda k: jax.random.randint(
        k, (n_g, M), 0, 256, dtype=jnp.uint8).astype(jnp.uint8))(key)
    jax.block_until_ready(codes)
    gsq = jax.jit(lambda k: jax.random.uniform(
        k, (n_g,), jnp.float32, 0.5, 2.0))(key)
    gval = jnp.ones((n_g,), bool)
    cents = jnp.asarray(rng.standard_normal((nlist, D)), jnp.float32)
    qs = jnp.asarray(rng.standard_normal((Q, D)), jnp.float32)
    offs = jnp.asarray(np.arange(nlist, dtype=np.int64) * cell_rows,
                       jnp.int32)
    # empty-ish spill block (128 invalid rows)
    s_codes = jnp.zeros((128, M), jnp.uint8)
    s_cells = jnp.zeros((128,), jnp.int32)
    s_sq = jnp.zeros((128,), jnp.float32)
    s_val = jnp.zeros((128,), bool)

    cb8 = jnp.asarray(rng.standard_normal((M, 256, D // M)) * 0.1,
                      jnp.float32)
    cb4 = jnp.asarray(rng.standard_normal((2 * M, 16, D // (2 * M))) * 0.1,
                      jnp.float32)

    # Per-call timing through the axon relay pays a fixed dispatch tick
    # (~26-45 ms) that would swamp every stage under ~50 ms — the r4
    # accounting gap. Chaining iterations in a device fori_loop removes
    # it, but wrapping the pallas probe in a loop is a fresh giant XLA
    # program and the remote-compile service drops the connection on it
    # (two broken-pipe kills at exactly that compile). So: stages whose
    # loop-wrapped compile is cheap (coarse) chain on device; the probe
    # stages reuse their already-cached per-call programs and subtract a
    # tick measured on a trivial pre-compiled op right before each stage.
    tick_op = jax.jit(lambda x: (x * 1.0000001).sum())
    tick_x = jnp.zeros((8, 8), jnp.float32)
    float(tick_op(tick_x))  # value fetch: the only true exec barrier here

    def relay_tick(n=15):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            float(tick_op(tick_x))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[len(ts) // 2]

    def timeit_chain(name, make_fn, reps=3):
        """make_fn(q) -> scalar checksum, chained in one device loop."""
        iters = args.iters

        @jax.jit
        def chained(q):
            def body(i, acc):
                # perturb q per iteration so XLA can't CSE the loop body
                return acc + make_fn(q + (i * 1e-12))
            return jax.lax.fori_loop(0, iters, body, 0.0)

        float(chained(qs))  # warm/compile; value fetch = exec barrier
        vals = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(chained(qs))
            vals.append((time.perf_counter() - t0) / iters)
        dt = sorted(vals)[len(vals) // 2]
        log(f"{name:>22}: {dt*1e3:9.3f} ms/b{Q}  ({Q/dt:9.1f} QPS)  [chained]")
        return dt * 1e3

    # checksum reducer: separate tiny program taking the probe OUTPUT as
    # an argument — wrapping the probe in an outer jit would capture the
    # 768 MB code table as a closure constant and ship it through
    # remote_compile (measured: broken pipe at exactly that upload)
    chk = jax.jit(lambda d: jnp.sum(jnp.where(jnp.isfinite(d), d, 0.0)))

    def timeit(name, fn, reps=None):
        """Per-call wall time minus the relay dispatch tick; the checksum
        fetch is 4 bytes so transfer time is in the tick, not the data."""
        reps = reps or max(args.iters, 6)
        float(chk(fn(qs)))  # warm/compile (disk-cached)
        tick = relay_tick()
        vals = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(chk(fn(qs)))  # 4-byte fetch: the only true exec barrier
            vals.append(time.perf_counter() - t0)
        vals.sort()
        dt = max(vals[len(vals) // 2] - tick, 1e-9)
        log(f"{name:>22}: {dt*1e3:9.3f} ms/b{Q}  ({Q/dt:9.1f} QPS)  "
            f"[per-call - {tick*1e3:.1f} ms tick]")
        return dt * 1e3

    out = {}

    # stage: coarse GEMM + cell pick alone (mirrors the probe's defaults:
    # HIGH-precision GEMM + approx_max_k partial reduction; the HIGHEST +
    # full-sort form measured 4.3/4.0 ms of a ~10 ms b32 probe)
    def coarse(q):
        c_sq = jnp.sum(cents * cents, axis=-1)
        qc2 = 2.0 * jnp.dot(q, cents.T,
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGH)
        _, cells = jax.lax.approx_max_k(qc2 - c_sq[None, :], args.nprobe,
                                        recall_target=0.97)
        return jnp.sum(cells).astype(jnp.float32)

    out["coarse_ms"] = timeit_chain("coarse+topk", coarse)

    def run(cb, qt, cps):
        def fn(q):
            d, i = pallas_pq_search(
                q, cents, codes, cb, gsq, gval,
                s_codes, s_cells, s_sq, s_val, offs,
                cell_pad=args.cell_pad, k=args.k, nprobe=args.nprobe,
                query_tile=qt, cps=cps)
            return d
        return fn

    out["probe8_qt8_ms"] = timeit("probe 8-bit qt8", run(cb8, 8, 8))
    out["probe4_qt8_ms"] = timeit("probe 4-bit qt8", run(cb4, 8, 8))
    if args.sweep:
        for qt in (16, 32):
            out[f"probe8_qt{qt}_ms"] = timeit(
                f"probe 8-bit qt{qt}", run(cb8, qt, 8))
            out[f"probe4_qt{qt}_ms"] = timeit(
                f"probe 4-bit qt{qt}", run(cb4, qt, 8))
        for cps in (4, 16):
            out[f"probe4_cps{cps}_ms"] = timeit(
                f"probe 4-bit cps{cps}", run(cb4, 8, cps))

    out.update(rows=args.rows, d=D, m=M, q=Q, k=args.k,
               nprobe=args.nprobe, nlist=nlist, cell_pad=args.cell_pad)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
