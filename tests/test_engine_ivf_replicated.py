"""Engine IVF on a 2-D (repl, shards) mesh (VERDICT r2 missing #4).

The flat index has handled the replicated mesh since round 2
(index/exact.py 2-D branch); this pins the IVF branch: cell structures
replicate across the repl axis, query batches split over it, and the
engine raises loudly (instead of silently clustering on one device) for
mesh shapes the IVF path does not support.
"""

import numpy as np
import pytest

from tpuvdb.core.config import DBConfig
from tpuvdb.core.types import SearchRequest, VectorData
from tpuvdb.engine.engine import VectorDBEngine
from tpuvdb.mesh.replicated import create_mesh_2d


def _ivf_cfg(**kw):
    base = dict(vector_dim=16, shard_count=4, shard_capacity=8192,
                block_size=128, index_type="ivf", ivf_nlist=32,
                ivf_nprobe=8, ivf_kmeans_iters=4, ivf_delta_max=64,
                checkpoint_every_puts=10**9, compact_every_puts=10**9)
    base.update(kw)
    return DBConfig(**base)


def _fill(eng, rng, n, prefix="k"):
    vecs = {}
    batch = []
    for i in range(n):
        v = rng.standard_normal(16).astype(np.float32)
        vecs[f"{prefix}{i}"] = v
        batch.append(VectorData(key=f"{prefix}{i}", vector=v))
    assert eng.put_batch(batch).success
    return vecs


def test_engine_ivf_on_replicated_mesh_oracle_parity(rng):
    mesh = create_mesh_2d(2, 4)  # 2 replicas x 4 shards
    eng = VectorDBEngine(_ivf_cfg(), mesh=mesh)
    vecs = _fill(eng, rng, 600)
    eng.flush()
    from tpuvdb.mesh.sharded_ivf import ShardedIVFIndex

    assert isinstance(eng._ivf, ShardedIVFIndex)
    assert eng._ivf.repl_axis == "repl"

    # self-queries land exactly (odd batch exercises repl-axis padding)
    keys = [f"k{i}" for i in range(41, 54)]
    q = np.stack([vecs[k] for k in keys])
    _, got = eng.search_batch(q, 1)
    assert [g[0] for g in got] == keys

    # oracle parity: recall@5 vs brute force over the full corpus
    corpus_keys = sorted(vecs)
    mat = np.stack([vecs[k] for k in corpus_keys])
    queries = rng.standard_normal((16, 16)).astype(np.float32)
    d2 = (np.sum(queries**2, 1)[:, None] + np.sum(mat**2, 1)[None, :]
          - 2.0 * queries @ mat.T)
    oracle = np.argsort(d2, axis=1)[:, :5]
    dists, got = eng.search_batch(queries, 5)
    hits = 0
    for qi in range(queries.shape[0]):
        want = {corpus_keys[j] for j in oracle[qi]}
        hits += len(want & set(k for k in got[qi][:5] if k))
    assert hits / (queries.shape[0] * 5) >= 0.7  # nprobe 8/32 probe bound


def test_engine_ivf_replicated_append_and_delete(rng):
    mesh = create_mesh_2d(2, 4)
    eng = VectorDBEngine(_ivf_cfg(), mesh=mesh)
    vecs = _fill(eng, rng, 600)
    eng.flush()
    # overflow the delta so append_rows runs on the replicated index
    for wave in range(2):
        batch = []
        for i in range(100):
            v = rng.standard_normal(16).astype(np.float32)
            vecs[f"w{wave}_{i}"] = v
            batch.append(VectorData(key=f"w{wave}_{i}", vector=v))
        assert eng.put_batch(batch).success
        eng.flush()
    assert eng.stats.get("ivf_appends", 0) > 0
    for key in ("k42", "w0_5", "w1_99"):
        r = eng.search(SearchRequest(query_vector=vecs[key], top_k=3))
        assert r.success and r.search_result.keys[0] == key, key
        assert r.search_result.scores[0] < 1e-2
    assert eng.delete("w0_5").success
    eng.flush()
    r = eng.search(SearchRequest(query_vector=vecs["w0_5"], top_k=3))
    assert "w0_5" not in r.search_result.keys


def test_engine_ivf_unsupported_mesh_raises(rng):
    """A mesh whose axes the IVF path can't serve must raise, not quietly
    fall back to single-device clustering (VERDICT r2: 8x capacity
    surprise)."""
    import jax

    devs = np.array(jax.devices()[:8]).reshape(2, 2, 2)
    mesh = jax.sharding.Mesh(devs, ("a", "b", "shards"))
    eng = VectorDBEngine(_ivf_cfg(), mesh=mesh)
    _fill(eng, rng, 200)
    with pytest.raises(ValueError, match="IVF needs"):
        eng.flush()
