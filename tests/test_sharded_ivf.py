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
