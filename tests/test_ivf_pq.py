"""IVF-PQ index: PQ code cells under the packed-cell coarse quantizer.

The capacity tier beyond int8 cells (tests/test_ivf_int8.py): M bytes/row
instead of d. Distances rank against reconstructions, so the quality bar
here is recall-with-overfetch (the engine re-ranks exactly from the host
mirror); candidate-set behavior (deletes, appends, spill) must match the
flat-cell IVF semantics exactly."""

import numpy as np
import pytest

from tpuvdb.index.ivf import IVFIndex


def _clustered(rng, n, d, n_clusters=32, noise=0.3):
    cents = rng.standard_normal((n_clusters, d)).astype(np.float32) * 3.0
    who = rng.integers(0, n_clusters, n)
    return (cents[who] + noise * rng.standard_normal((n, d))).astype(np.float32)


def _oracle(queries, vectors, valid, k):
    d2 = (np.sum(queries**2, 1)[:, None] - 2 * queries @ vectors.T
          + np.sum(vectors**2, 1)[None, :])
    d2 = np.where(valid[None, :], d2, np.inf)
    idx = np.argsort(d2, axis=1)[:, :k]
    return idx


@pytest.fixture()
def built(rng):
    n, d = 6144, 32
    x = _clustered(rng, n, d)
    valid = np.ones(n, bool)
    idx = IVFIndex.build(x, valid, nlist=48, nprobe=16, kmeans_iters=6,
                         pq_subq=8, seed=2)
    return x, valid, idx


def test_build_shapes_and_flags(built):
    x, valid, idx = built
    assert idx.pq and not idx.quantized
    assert idx.grouped.dtype == np.uint8 and idx.grouped.shape[1] == 8
    assert idx.spill.dtype == np.uint8
    assert idx.pq_codebooks.shape == (8, 256, 4)


def test_recall_with_overfetch(built, rng):
    x, valid, idx = built
    k, fetch = 10, 100
    queries = x[rng.choice(len(x), 8, replace=False)].copy()
    oidx = _oracle(queries, x, valid, k)
    _, rows = idx.search(queries, k=fetch)
    hits = 0
    for i in range(len(queries)):
        cand = rows[i][rows[i] >= 0]
        # exact re-rank of the fetched candidates (the engine's job)
        cd = np.sum((x[cand] - queries[i]) ** 2, axis=1)
        rer = cand[np.argsort(cd)[:k]]
        hits += len(set(rer.tolist()) & set(oidx[i].tolist()))
    assert hits / (len(queries) * k) >= 0.9, hits


def test_delete_then_search_excludes(built, rng):
    x, valid, idx = built
    q = x[5:6].copy()
    _, rows = idx.search(q, k=1)
    hit = int(rows[0, 0])
    assert hit == 5  # self-query finds itself through PQ cells
    idx.invalidate_rows(np.asarray([hit]))
    _, rows2 = idx.search(q, k=5)
    assert hit not in rows2[0]


def test_append_rows_visible_and_encoded(built, rng):
    x, valid, idx = built
    idx.warm_append()
    d = x.shape[1]
    new = _clustered(rng, 64, d) * 0.5 + 7.0  # distinct offset region
    phys = np.arange(len(x), len(x) + 64)
    assert idx.append_rows(phys, new)
    # the appended region is far from the corpus: every nearest neighbor
    # must be an appended row (codes may tie among them — out-of-
    # distribution points quantize coarsely — so membership, not identity)
    _, rows = idx.search(new[:8], k=8, nprobe=idx.nlist)
    assert set(rows[:, 0].tolist()) <= set(phys.tolist()), rows[:, 0]
    # and the true self-row is inside the overfetched candidate set
    for i in range(8):
        assert phys[i] in rows[i], (i, rows[i])


def test_pq_int8_exclusive():
    import jax.numpy as jnp

    x = np.random.default_rng(0).standard_normal((512, 16)).astype(np.float32)
    with pytest.raises(ValueError):
        IVFIndex.build(x, np.ones(512, bool), nlist=4, pq_subq=4,
                       dtype=jnp.int8)


def test_stale_warm_codebooks_retrained(rng):
    x = _clustered(rng, 2048, 16)
    bad_cb = np.zeros((2, 256, 4), np.float32)  # wrong M for pq_subq=4
    idx = IVFIndex.build(x, np.ones(2048, bool), nlist=8, nprobe=8,
                         kmeans_iters=4, pq_subq=4, pq_codebooks=bad_cb)
    assert idx.pq_codebooks.shape == (4, 256, 4)
    _, rows = idx.search(x[:4], k=10)
    for i in range(4):  # self in the candidate set (codes may tie)
        assert i in rows[i], (i, rows[i])


def test_warm_codebooks_reused(rng):
    x = _clustered(rng, 2048, 16)
    idx1 = IVFIndex.build(x, np.ones(2048, bool), nlist=8, nprobe=8,
                          kmeans_iters=4, pq_subq=4, seed=5)
    cb = np.asarray(idx1.pq_codebooks)
    idx2 = IVFIndex.build(x, np.ones(2048, bool), nlist=8, nprobe=8,
                          kmeans_iters=4, pq_subq=4, pq_codebooks=cb)
    np.testing.assert_array_equal(np.asarray(idx2.pq_codebooks), cb)
