"""Bench package: fvecs/bvecs loaders, recall harness, chained timer."""

import struct

import numpy as np

from tpuvdb.bench.datasets import load_bvecs, load_fvecs, synthetic_corpus
from tpuvdb.bench.harness import chained_timer
from tpuvdb.bench.recall import recall_at_k, recall_curve


def test_fvecs_roundtrip(tmp_path, rng):
    data = rng.standard_normal((10, 4)).astype(np.float32)
    path = str(tmp_path / "x.fvecs")
    with open(path, "wb") as f:
        for row in data:
            f.write(struct.pack("<i", 4))
            f.write(row.tobytes())
    back = load_fvecs(path)
    np.testing.assert_array_equal(back, data)
    assert load_fvecs(path, max_rows=3).shape == (3, 4)


def test_bvecs_roundtrip(tmp_path, rng):
    data = rng.integers(0, 255, (7, 8), dtype=np.uint8)
    path = str(tmp_path / "x.bvecs")
    with open(path, "wb") as f:
        for row in data:
            f.write(struct.pack("<i", 8))
            f.write(row.tobytes())
    back = load_bvecs(path)
    np.testing.assert_array_equal(back, data.astype(np.float32))


def test_synthetic_corpus_shapes():
    c, q = synthetic_corpus(1000, 16, clustered=True, n_clusters=8)
    assert c.shape == (1000, 16) and q.shape == (1024, 16)
    c2, _ = synthetic_corpus(100, 8)
    assert c2.shape == (100, 8)


def test_recall_at_k():
    oracle = np.array([[1, 2, 3], [4, 5, 6]])
    got = np.array([[1, 2, 9], [4, -1, -1]])
    assert abs(recall_at_k(got, oracle) - 3 / 6) < 1e-9


def test_recall_curve_with_ivf(rng):
    from tpuvdb.index.ivf import IVFIndex

    c, _ = synthetic_corpus(2048, 16, clustered=True, n_clusters=16, seed=1)
    valid = np.ones(len(c), bool)
    idx = IVFIndex.build(c, valid, nlist=16, nprobe=4, kmeans_iters=6)
    q = c[:32]

    def search_fn(queries, k, nprobe):
        _, rows = idx.search(queries, k, nprobe=nprobe)
        return rows

    curve = recall_curve(search_fn, q, c, valid, k=5, sweep=[2, 16])
    assert curve[16] >= curve[2] - 1e-9
    assert curve[16] >= 0.95


def test_chained_timer_runs():
    import jax.numpy as jnp

    x = jnp.ones((64, 64))
    w = jnp.ones((64, 64))
    dt = chained_timer(lambda a, b: a @ b, (x, w), iters=4, reps=1)
    assert dt > 0
