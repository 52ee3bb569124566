"""Pallas IVF-PQ probe (interpret mode) vs the XLA ADC path and a
reconstruction oracle.

The kernel must reproduce _ivf_search_pq's semantics exactly — residual
decomposition with the owning cell's centroid term, packed-chunk
over-scan, validity masks, spill region — while moving the one-hot ADC
into VMEM. Score parity is checked against a NUMPY reconstruction of
the decomposed distance (not against the XLA path's floats, so a shared
bug cannot hide)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpuvdb.index.ivf import IVFIndex
from tpuvdb.kernels.pallas_pq import pallas_pq_search


def _clustered(rng, n, d, n_clusters=32, noise=0.3):
    cents = rng.standard_normal((n_clusters, d)).astype(np.float32) * 3.0
    who = rng.integers(0, n_clusters, n)
    return (cents[who] + noise * rng.standard_normal((n, d))).astype(
        np.float32)


def _oracle(queries, vectors, valid, k):
    d2 = (np.sum(queries**2, 1)[:, None] - 2 * queries @ vectors.T
          + np.sum(vectors**2, 1)[None, :])
    d2 = np.where(valid[None, :], d2, np.inf)
    return np.argsort(d2, axis=1)[:, :k]


def _recon_dist(idx, queries, grouped_rows):
    """Numpy oracle for the RECONSTRUCTED distance of grouped rows:
    ||q - (c_cell + r_hat)||^2 from the stored codes/codebooks."""
    from tpuvdb.kernels.pq import _maybe_unpack

    cb = np.asarray(idx.pq_codebooks)                   # (M2, J, dsub)
    m2, n_codes, dsub = cb.shape
    offs = np.asarray(idx.cell_offsets)
    cents = np.asarray(idx.centroids)
    rot = (np.asarray(idx.pq_rotation) if idx.pq_rotation is not None
           else None)
    codes = np.asarray(_maybe_unpack(jnp.asarray(
        np.asarray(idx.grouped)[grouped_rows]), n_codes))  # (R, M2)
    r_hat = np.concatenate(
        [cb[m, codes[:, m]] for m in range(m2)], axis=-1)  # (R, d) rotated
    if rot is not None:
        r_hat = r_hat @ rot.T                              # back to original
    cell_of = np.searchsorted(offs, grouped_rows, side="right") - 1
    x_hat = cents[cell_of] + r_hat
    return np.sum((queries[:, None, :] - x_hat[None]) ** 2, axis=-1)


def _run(idx, q, k, nprobe):
    dist, gid = pallas_pq_search(
        jnp.asarray(q), idx.centroids, idx.grouped, idx.pq_codebooks,
        idx.grouped_sq, idx.grouped_valid, idx.spill, idx.spill_cells,
        idx.spill_sq, idx.spill_valid, idx.cell_offsets,
        cell_pad=idx.cell_pad, k=k, nprobe=nprobe,
        rotation=idx.pq_rotation, query_tile=8, cps=4, interpret=True)
    return np.asarray(dist), np.asarray(gid)


@pytest.fixture()
def built(rng):
    n, d = 6144, 32
    x = _clustered(rng, n, d)
    valid = np.ones(n, bool)
    idx = IVFIndex.build(x, valid, nlist=48, nprobe=16, kmeans_iters=6,
                         pq_subq=8, seed=2)
    return x, valid, idx


def test_recall_and_score_parity(built, rng):
    x, valid, idx = built
    k, fetch = 10, 100
    q = x[rng.choice(len(x), 8, replace=False)].copy()
    oidx = _oracle(q, x, valid, k)
    dist, gid = _run(idx, q, fetch, nprobe=16)

    hits = 0
    for i in range(len(q)):
        g = gid[i][gid[i] >= 0]
        main = g[g < idx.grouped.shape[0]]
        rows = idx.row_ids[main]
        spill = g[g >= idx.grouped.shape[0]] - idx.grouped.shape[0]
        rows = np.concatenate([rows, idx.spill_row_ids[spill]])
        cd = np.sum((x[rows] - q[i]) ** 2, axis=1)
        rer = rows[np.argsort(cd)[:k]]
        hits += len(set(rer.tolist()) & set(oidx[i].tolist()))
    assert hits / (len(q) * k) >= 0.9, hits

    # score parity vs numpy reconstruction (main-region rows)
    for i in range(4):
        g = gid[i][(gid[i] >= 0) & (gid[i] < idx.grouped.shape[0])][:20]
        want = _recon_dist(idx, q[i : i + 1], g)[0]
        got = dist[i][np.isin(gid[i], g)][: len(want)]
        # the LUT is bf16 (as in the XLA ADC path): M=8 subspace sums of
        # bf16-rounded O(5) entries carry ~0.1 absolute noise vs the f32
        # reconstruction; anything beyond that is a term-plumbing bug
        np.testing.assert_allclose(
            np.sort(got), np.sort(want), rtol=2e-2, atol=0.15)


def test_matches_xla_adc_path(built, rng):
    """Same candidates the XLA _ivf_search_pq serving path returns (both
    approximate selectors; compare top-k AFTER exact re-rank)."""
    x, valid, idx = built
    k, fetch = 10, 64
    q = x[rng.choice(len(x), 8, replace=False)].copy()
    _, rows_xla = idx.search(q, k=fetch)
    _, gid = _run(idx, q, fetch, nprobe=16)

    for i in range(len(q)):
        def rerank(rows):
            rows = rows[rows >= 0]
            cd = np.sum((x[rows] - q[i]) ** 2, axis=1)
            return set(rows[np.argsort(cd)[:k]].tolist())

        g = gid[i][gid[i] >= 0]
        main = g[g < idx.grouped.shape[0]]
        mine = np.concatenate(
            [idx.row_ids[main],
             idx.spill_row_ids[g[g >= idx.grouped.shape[0]]
                               - idx.grouped.shape[0]]])
        shared = len(rerank(mine) & rerank(rows_xla[i]))
        assert shared >= k - 2, (i, shared)


def test_deletes_excluded(built, rng):
    x, valid, idx = built
    q = x[5:6].copy()
    _, gid = _run(idx, q, 1, nprobe=16)
    hit = int(idx.row_ids[gid[0, 0]])
    assert hit == 5
    idx.invalidate_rows(np.asarray([hit]))
    _, gid2 = _run(idx, q, 5, nprobe=16)
    g = gid2[0][(gid2[0] >= 0) & (gid2[0] < idx.grouped.shape[0])]
    assert 5 not in idx.row_ids[g].tolist()


def test_4bit_tier(rng):
    n, d = 4096, 32
    x = _clustered(rng, n, d)
    valid = np.ones(n, bool)
    idx = IVFIndex.build(x, valid, nlist=32, nprobe=16, kmeans_iters=6,
                         pq_subq=4, pq_bits=4, seed=3)
    assert idx.pq_codebooks.shape[1] == 16  # packed 4-bit tier
    k, fetch = 10, 100
    q = x[rng.choice(len(x), 8, replace=False)].copy()
    oidx = _oracle(q, x, valid, k)
    _, gid = _run(idx, q, fetch, nprobe=16)
    hits = 0
    for i in range(len(q)):
        g = gid[i][gid[i] >= 0]
        main = g[g < idx.grouped.shape[0]]
        rows = np.concatenate(
            [idx.row_ids[main],
             idx.spill_row_ids[g[g >= idx.grouped.shape[0]]
                               - idx.grouped.shape[0]]])
        cd = np.sum((x[rows] - q[i]) ** 2, axis=1)
        rer = rows[np.argsort(cd)[:k]]
        hits += len(set(rer.tolist()) & set(oidx[i].tolist()))
    assert hits / (len(q) * k) >= 0.85, hits


def test_spill_rows_probed(rng):
    """Legacy no-split path forces spill; spill candidates must surface
    with their own cells' centroid terms."""
    n, d = 3072, 32
    x = _clustered(rng, n, d, n_clusters=8)
    valid = np.ones(n, bool)
    idx = IVFIndex.build(x, valid, nlist=8, nprobe=8, kmeans_iters=6,
                         pq_subq=8, seed=4, split_oversized=False,
                         cell_cap_quantile=0.5)
    assert idx.stats().spill_rows > 0
    k, fetch = 10, 100
    q = x[rng.choice(len(x), 8, replace=False)].copy()
    oidx = _oracle(q, x, valid, k)
    _, gid = _run(idx, q, fetch, nprobe=8)
    hits = got_spill = 0
    for i in range(len(q)):
        g = gid[i][gid[i] >= 0]
        main = g[g < idx.grouped.shape[0]]
        sp = g[g >= idx.grouped.shape[0]] - idx.grouped.shape[0]
        got_spill += len(sp)
        rows = np.concatenate([idx.row_ids[main], idx.spill_row_ids[sp]])
        cd = np.sum((x[rows] - q[i]) ** 2, axis=1)
        rer = rows[np.argsort(cd)[:k]]
        hits += len(set(rer.tolist()) & set(oidx[i].tolist()))
    assert got_spill > 0
    assert hits / (len(q) * k) >= 0.9, hits


def _jaxpr_has_gather(jaxpr):
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == "gather":
            return True
        for v in eqn.params.values():
            for j in (v if isinstance(v, (list, tuple)) else [v]):
                inner = getattr(j, "jaxpr", j)
                if hasattr(inner, "eqns") and _jaxpr_has_gather(inner):
                    return True
    return False


def test_probe_kernel_jaxpr_has_no_gather():
    """Mosaic cannot lower jnp's gather fallback. A sub-range slice
    combined with a newaxis (codes[:, m0:m1, None]) silently becomes a
    gather in this jax build, which only explodes at REAL capacity
    shapes (M2 > m_block activates the K-split loop) — the first
    16M x 768 run died on it at served-search time while every
    interpret-mode test passed. Assert the traced kernel jaxpr stays
    gather-free at a shape that exercises the K-split."""
    import jax

    m2, n_codes, dsub = 96, 256, 1       # m_block = 32 < m2: K-split on
    d = m2 * dsub
    nlist, cell_pad = 2, 128
    n_g = nlist * cell_pad
    S = jax.ShapeDtypeStruct
    args = (
        S((8, d), jnp.float32), S((nlist, d), jnp.float32),
        S((n_g, m2), jnp.uint8), S((m2, n_codes, dsub), jnp.float32),
        S((n_g,), jnp.float32), S((n_g,), jnp.bool_),
        S((4, m2), jnp.uint8), S((4,), jnp.int32),
        S((4,), jnp.float32), S((4,), jnp.bool_),
        S((nlist,), jnp.int32),
    )
    closed = jax.make_jaxpr(
        lambda *a: pallas_pq_search(*a, cell_pad=cell_pad, k=10, nprobe=2)
    )(*args)

    kernel_jaxprs = []

    def collect(jaxpr):
        for eqn in jaxpr.eqns:
            if eqn.primitive.name == "pallas_call":
                kernel_jaxprs.append(eqn.params["jaxpr"])
            for v in eqn.params.values():
                for j in (v if isinstance(v, (list, tuple)) else [v]):
                    inner = getattr(j, "jaxpr", None)
                    if inner is not None and hasattr(inner, "eqns"):
                        collect(inner)

    collect(closed.jaxpr)
    assert kernel_jaxprs, "pallas_call not found in traced jaxpr"
    for kj in kernel_jaxprs:
        inner = getattr(kj, "jaxpr", kj)
        assert not _jaxpr_has_gather(inner), (
            "gather primitive inside the pallas kernel jaxpr — Mosaic "
            "will fail to lower this at capacity shapes")
