"""IVF: k-means quality, recall vs exact oracle, deletes, spill handling."""

import numpy as np
import pytest

from tpuvdb.index.ivf import IVFIndex
from tpuvdb.kernels.distance import numpy_oracle
from tpuvdb.kernels.kmeans import kmeans


def clustered_data(rng, n_clusters=16, per=256, d=32):
    centers = rng.standard_normal((n_clusters, d)) * 5
    data = np.concatenate([
        centers[i] + 0.3 * rng.standard_normal((per, d)) for i in range(n_clusters)
    ]).astype(np.float32)
    return data


def test_kmeans_converges_on_clusters():
    # local rng: cluster-recovery quality depends on the draw, keep it fixed
    rng = np.random.default_rng(3)
    data = clustered_data(rng)
    cents, assign = kmeans(data, np.ones(len(data), bool), nlist=16,
                           iters=20, block_size=1024)
    assert cents.shape == (16, 32)
    assert assign.shape == (len(data),)
    # points in the same true cluster should mostly share an assignment
    agree = 0
    for c in range(16):
        seg = assign[c * 256 : (c + 1) * 256]
        agree += (seg == np.bincount(seg[seg >= 0]).argmax()).mean()
    assert agree / 16 > 0.9


def test_kmeans_invalid_rows_excluded(rng):
    data = clustered_data(rng, n_clusters=4, per=64)
    valid = np.ones(len(data), bool)
    valid[::2] = False
    cents, assign = kmeans(data, valid, nlist=4, iters=8, block_size=256)
    assert (assign[::2] == -1).all()
    assert (assign[1::2] >= 0).all()


def test_ivf_recall_vs_oracle(rng):
    data = clustered_data(rng, n_clusters=32, per=128, d=32)
    valid = np.ones(len(data), bool)
    idx = IVFIndex.build(data, valid, nlist=32, nprobe=8, kmeans_iters=10)
    q = data[rng.choice(len(data), 64, replace=False)] + \
        0.05 * rng.standard_normal((64, 32)).astype(np.float32)
    dist, rows = idx.search(q, k=10)
    odist, oidx = numpy_oracle(q, data, valid, 10)
    recall = np.mean([
        len(set(rows[i][rows[i] >= 0]) & set(oidx[i])) / 10 for i in range(64)
    ])
    assert recall >= 0.9, f"recall {recall}"
    # distances of returned rows must be exact
    for i in range(4):
        for j in range(10):
            r = rows[i, j]
            if r >= 0:
                true = float(np.sum((q[i] - data[r]) ** 2))
                assert abs(true - dist[i, j]) < 1e-2


def test_ivf_full_nprobe_is_exhaustive(rng):
    data = rng.standard_normal((1000, 16)).astype(np.float32)
    valid = np.ones(1000, bool)
    idx = IVFIndex.build(data, valid, nlist=8, nprobe=8, kmeans_iters=5)
    q = data[:8]
    dist, rows = idx.search(q, k=1)
    # probing every cell == exact: each query finds itself
    assert (rows[:, 0] == np.arange(8)).all()
    assert (dist[:, 0] < 1e-2).all()


def test_ivf_invalidate_rows(rng):
    data = rng.standard_normal((512, 16)).astype(np.float32)
    valid = np.ones(512, bool)
    idx = IVFIndex.build(data, valid, nlist=4, nprobe=4, kmeans_iters=5)
    q = data[7:8]
    _, rows = idx.search(q, k=1)
    assert rows[0, 0] == 7
    idx.invalidate_rows(np.array([7]))
    _, rows = idx.search(q, k=1)
    assert rows[0, 0] != 7


def test_ivf_invalidate_ignores_negative_rows(rng):
    """A -1 physical row (failed upstream lookup) must be a no-op: numpy
    indexing would wrap it to inv[-1] and soft-delete an unrelated live
    slot (review finding, round 2)."""
    data = rng.standard_normal((512, 16)).astype(np.float32)
    valid = np.ones(512, bool)
    idx = IVFIndex.build(data, valid, nlist=4, nprobe=4, kmeans_iters=5)
    live_before = int(np.asarray(idx.grouped_valid).sum()
                      + np.asarray(idx.spill_valid).sum())
    idx.invalidate_rows(np.array([-1, -5, 10**9]))
    live_after = int(np.asarray(idx.grouped_valid).sum()
                     + np.asarray(idx.spill_valid).sum())
    assert live_after == live_before


def test_ivf_spill_region_scanned():
    # skewed data: one dominant cluster forces spill with a low quantile
    # cap (local rng: the spill condition is sensitive to the draw)
    rng = np.random.default_rng(7)
    data = np.concatenate([
        rng.standard_normal((900, 16)) * 0.1,          # dense blob
        rng.standard_normal((100, 16)) * 0.1 + 10.0,   # far blob
    ]).astype(np.float32)
    valid = np.ones(1000, bool)
    # cap below n/nlist so even cascade assignment can't place every row
    idx = IVFIndex.build(data, valid, nlist=2, nprobe=2, kmeans_iters=8,
                         cell_cap_quantile=0.25, split_oversized=False)
    assert idx.stats().spill_rows > 0
    # spilled rows must still be findable
    q = data[:16]
    _, rows = idx.search(q, k=1)
    assert (rows[:, 0] == np.arange(16)).sum() >= 14


def test_delete_cost_independent_of_corpus_size(rng):
    """VERDICT r1 #7: invalidate_rows must be O(batch), not O(corpus).
    Compare wall time of the same 64-row delete on a 16x larger corpus —
    the old np.isin + full-mask re-upload scaled linearly (16x); the
    inverse-map + bucketed-scatter path is near-flat (allow 6x slack for
    shared-CPU jitter)."""
    import time

    from tpuvdb.index.ivf import IVFIndex

    def build(n):
        vecs = rng.standard_normal((n, 32)).astype(np.float32)
        idx = IVFIndex.build(vecs, np.ones(n, bool), nlist=max(8, n // 512),
                             nprobe=4, kmeans_iters=2)
        # warm: first delete compiles the scatter for this shape
        idx.invalidate_rows(np.arange(4))
        return idx

    def timed(idx, rows):
        t0 = time.perf_counter()
        idx.invalidate_rows(rows)
        np.asarray(idx.grouped_valid)  # force
        return time.perf_counter() - t0

    small = build(16_384)
    big = build(16 * 16_384)
    batch_small = np.arange(100, 164)
    batch_big = np.arange(100, 164)
    t_small = min(timed(small, batch_small + i * 64) for i in range(3))
    t_big = min(timed(big, batch_big + i * 64) for i in range(3))
    assert t_big < 6 * max(t_small, 1e-4), (t_small, t_big)
    # and correctness: the deleted rows are really gone
    q = np.asarray(rng.standard_normal((1, 32)), np.float32)
    _, rows = big.search(q, k=10)
    assert not set(rows.ravel()).intersection(range(100, 164))


def test_ivf_fill_under_zipf_skew(rng):
    """VERDICT r1 #6 done-criterion: fill >= 0.8 on zipf-clustered data.
    The r1 quantile-cap layout measured fill ~0.43 here (every cell padded
    to near the hottest cell's size); splitting hot cells into real child
    centroids keeps padding near the median."""
    from tpuvdb.index.ivf import IVFIndex

    # zipf-sized clusters: a few huge, many small
    n_clusters = 40
    weights = 1.0 / np.arange(1, n_clusters + 1)
    weights /= weights.sum()
    n = 60_000
    counts = rng.multinomial(n, weights)
    blobs = []
    for c, m in enumerate(counts):
        if m == 0:
            continue
        center = rng.standard_normal(24) * 8.0
        blobs.append(center + 0.3 * rng.standard_normal((m, 24)))
    data = np.concatenate(blobs).astype(np.float32)
    perm = rng.permutation(len(data))
    data = data[perm]

    idx = IVFIndex.build(data, np.ones(len(data), bool), nlist=64,
                         nprobe=16, kmeans_iters=6)
    st = idx.stats()
    assert st.fill >= 0.8, f"fill {st.fill:.3f} under zipf skew"
    # spill must stay tiny (splitting, not spilling, absorbs hot cells)
    assert st.spill_rows < 0.02 * n, st.spill_rows

    # recall@10 vs brute force on 64 queries
    q = data[:64]
    d2 = ((q[:, None, :] - data[None, :, :]) ** 2).sum(-1)
    truth = np.argsort(d2, axis=1)[:, :10]
    _, got = idx.search(q, k=10)
    recall = np.mean([
        len(set(got[i]) & set(truth[i])) / 10 for i in range(len(q))
    ])
    assert recall >= 0.9, f"recall@10 {recall:.3f} after splitting"


def test_append_rows_searchable_and_deletable(rng):
    """Incremental appends (no re-clustering) must be found by search at
    exact distance, survive the inverse-map rebuild, and delete cleanly."""
    data = clustered_data(rng, n_clusters=8, per=128, d=32)
    valid = np.ones(len(data), bool)
    idx = IVFIndex.build(data, valid, nlist=8, nprobe=8, kmeans_iters=6)
    base = len(data)
    new = clustered_data(rng, n_clusters=8, per=4, d=32)  # near centers
    phys = base + np.arange(len(new))
    assert idx.append_rows(phys, new)
    d_, r_ = idx.search(new[:8], k=1)
    assert (r_[:, 0] == phys[:8]).all(), r_[:, 0]
    assert (d_[:, 0] < 1e-3).all()
    # delete an appended row: it must disappear
    idx.invalidate_rows(np.asarray([phys[0]]))
    d2, r2 = idx.search(new[:1], k=1)
    assert r2[0, 0] != phys[0]


def test_append_rows_int8_cells(rng):
    """Append into int8 cells/spill: quantized payload + scales + exact
    norms all scattered consistently. Appended points sit in a region
    far from every build row so int8 dot noise (~|x|*s, a few units at
    these norms) cannot flip the top-1."""
    data = clustered_data(rng, n_clusters=4, per=128, d=32)
    import jax.numpy as jnp

    idx = IVFIndex.build(data, np.ones(len(data), bool), nlist=4, nprobe=4,
                         kmeans_iters=6, dtype=jnp.int8)
    new = (20.0 + rng.standard_normal((8, 32))).astype(np.float32)
    phys = len(data) + np.arange(len(new))
    assert idx.append_rows(phys, new)
    d_, r_ = idx.search(new, k=1)
    assert (r_[:, 0] == phys).all()
    # |x|^2 ~ 12k here: int8 noise stays well under the ~50-unit gap to
    # the nearest other point
    assert (np.abs(d_[:, 0]) < 25.0).all()


def test_append_rows_capacity_exhaustion_no_mutation(rng):
    """When cells + spill are full, append_rows returns False and leaves
    the index fully intact (the engine then falls back to a rebuild)."""
    data = clustered_data(rng, n_clusters=2, per=128, d=16)
    idx = IVFIndex.build(data, np.ones(len(data), bool), nlist=2, nprobe=2,
                         kmeans_iters=4)
    lens0 = np.asarray(idx.cell_lens).copy()
    rows0 = np.asarray(idx.row_ids).copy()
    # hammer one cell until capacity runs out
    target = np.asarray(idx.centroids)[0]
    got_false = False
    base = len(data)
    for round_ in range(200):
        batch = (target + 0.01 * rng.standard_normal((256, 16))
                 ).astype(np.float32)
        phys = base + np.arange(256)
        ok = idx.append_rows(phys, batch)
        if not ok:
            got_false = True
            break
        base += 256
    assert got_false, "capacity never exhausted (reserve too large?)"
    # the failed call must not have mutated anything observable:
    # a stored vector is still found exactly
    d_, r_ = idx.search(data[:4], k=1)
    assert (r_[:, 0] == np.arange(4)).all()
    assert (d_[:, 0] < 1e-3).all()


def test_build_streaming_mirror_source_int8_bitexact(rng, tmp_path):
    """The streaming build over int8 mmap mirrors must (a) pack the
    mirrors' codes BIT-EXACT (no dequant/requant round trip) and (b)
    search-match a classic build over the dequantized f32 stack."""
    import jax.numpy as jnp

    from tpuvdb.index.ivf import MirrorRowSource
    from tpuvdb.index.layout import ShardMirror, StackedLayout

    d = 32
    data = clustered_data(rng, n_clusters=8, per=512, d=d)
    mirrors = []
    for s in range(2):
        m = ShardMirror(d, 1 << 16, init_cap=4096, dtype="int8",
                        path=str(tmp_path / f"shard_{s}"))
        part = data[s::2]
        m.write_batch(m.alloc(len(part)), part)
        mirrors.append(m)
    layout = StackedLayout.for_mirrors(mirrors, block=128)
    source = MirrorRowSource(mirrors, layout)
    assert source.all_int8
    valid = source.valid_array()
    assert int(valid.sum()) == len(data)

    idx = IVFIndex.build_streaming(source, valid, nlist=8, nprobe=8,
                                   kmeans_iters=8, dtype=jnp.int8, seed=7)
    # (a) every packed code row equals the mirror's stored codes
    grow = np.asarray(idx.row_ids)
    sel = np.flatnonzero(grow >= 0)[:256]
    codes = np.asarray(idx.grouped)[sel]
    scales = np.asarray(idx.cell_scales)[sel]
    mcodes, mscales, _ = source.gather_raw(grow[sel])
    np.testing.assert_array_equal(codes, mcodes)
    np.testing.assert_allclose(scales, mscales, rtol=0)

    # (b) same answers as the classic build over the dequantized stack
    vecs, _, valid2 = layout.stack(mirrors)
    ref = IVFIndex.build(vecs, valid2, nlist=8, nprobe=8,
                         kmeans_iters=8, dtype=jnp.int8, seed=7)
    q = data[:32]
    d1, r1 = idx.search(q, k=5)
    d2, r2 = ref.search(q, k=5)
    assert (r1[:, 0] == r2[:, 0]).mean() >= 0.95
    np.testing.assert_allclose(d1[:, 0], d2[:, 0], rtol=1e-3, atol=1e-3)
