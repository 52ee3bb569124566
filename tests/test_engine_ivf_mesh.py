"""Engine with index_type=ivf over the 8-device mesh (distributed IVF)."""

import numpy as np

from tpuvdb.core.config import DBConfig
from tpuvdb.core.types import SearchRequest, VectorData
from tpuvdb.engine.engine import VectorDBEngine
from tpuvdb.mesh.mesh import create_mesh


def test_engine_ivf_on_mesh(rng):
    cfg = DBConfig(vector_dim=16, shard_count=4, shard_capacity=8192,
                   block_size=128, index_type="ivf", ivf_nlist=32,
                   ivf_nprobe=8, ivf_kmeans_iters=4, ivf_delta_max=64,
                   checkpoint_every_puts=10**9, compact_every_puts=10**9)
    eng = VectorDBEngine(cfg, mesh=create_mesh())
    vecs = {}
    batch = []
    for i in range(600):
        v = rng.standard_normal(16).astype(np.float32)
        vecs[f"k{i}"] = v
        batch.append(VectorData(key=f"k{i}", vector=v))
    assert eng.put_batch(batch).success
    eng.flush()
    from tpuvdb.mesh.sharded_ivf import ShardedIVFIndex

    assert isinstance(eng._ivf, ShardedIVFIndex)

    r = eng.search(SearchRequest(query_vector=vecs["k123"], top_k=3))
    assert r.search_result.keys[0] == "k123"
    assert r.search_result.scores[0] < 1e-2

    # delta insert visible, delete propagates
    v = rng.standard_normal(16).astype(np.float32)
    eng.put(VectorData(key="fresh", vector=v))
    r = eng.search(SearchRequest(query_vector=v, top_k=1))
    assert r.search_result.keys == ["fresh"]
    eng.delete("k123")
    r = eng.search(SearchRequest(query_vector=vecs["k123"], top_k=3))
    assert "k123" not in r.search_result.keys
    assert eng.info()["ivf"]["nlist"] > 0


def test_engine_mesh_ivf_incremental_append(rng):
    """Mesh-sharded IVF drains delta overflow through
    ShardedIVFIndex.append_rows (same plan-then-commit contract as the
    single-device index) — no full rebuild per wave."""
    cfg = DBConfig(vector_dim=16, shard_count=4, shard_capacity=8192,
                   block_size=128, index_type="ivf", ivf_nlist=32,
                   ivf_nprobe=8, ivf_kmeans_iters=4, ivf_delta_max=64,
                   checkpoint_every_puts=10**9, compact_every_puts=10**9)
    eng = VectorDBEngine(cfg, mesh=create_mesh())
    vecs = {}
    batch = []
    for i in range(600):
        v = rng.standard_normal(16).astype(np.float32)
        vecs[f"k{i}"] = v
        batch.append(VectorData(key=f"k{i}", vector=v))
    assert eng.put_batch(batch).success
    eng.flush()
    for wave in range(3):
        batch = []
        for i in range(100):
            v = rng.standard_normal(16).astype(np.float32)
            vecs[f"w{wave}_{i}"] = v
            batch.append(VectorData(key=f"w{wave}_{i}", vector=v))
        assert eng.put_batch(batch).success
        eng.flush()
    assert eng.stats.get("ivf_appends", 0) > 0
    for key in ("k42", "w0_5", "w2_99"):
        r = eng.search(SearchRequest(query_vector=vecs[key], top_k=3))
        assert r.success and r.search_result.keys[0] == key, key
        assert r.search_result.scores[0] < 1e-2
    assert eng.delete("w0_5").success
    eng.flush()
    r = eng.search(SearchRequest(query_vector=vecs["w0_5"], top_k=3))
    assert "w0_5" not in r.search_result.keys


def test_mesh_ivf_warm_restart_skips_training(rng, tmp_path):
    """Mesh engines get the same warm restart: checkpointed per-device
    centroid tables skip every per-device k-means training run."""
    d = str(tmp_path / "db")
    cfg = DBConfig(vector_dim=16, shard_count=4, shard_capacity=8192,
                   block_size=128, index_type="ivf", ivf_nlist=32,
                   ivf_nprobe=8, ivf_kmeans_iters=4, ivf_delta_max=10_000,
                   checkpoint_every_puts=10**9, compact_every_puts=10**9)
    eng = VectorDBEngine(cfg, mesh=create_mesh(), data_dir=d)
    vecs = {}
    batch = []
    for i in range(600):
        v = rng.standard_normal(16).astype(np.float32)
        vecs[f"k{i}"] = v
        batch.append(VectorData(key=f"k{i}", vector=v))
    assert eng.put_batch(batch).success
    eng.flush()
    eng.close()

    import tpuvdb.mesh.sharded_ivf as sivf_mod
    real = sivf_mod.kmeans

    def no_training(*a, **k):
        raise AssertionError("per-device k-means ran on a warm restart")

    sivf_mod.kmeans = no_training
    try:
        eng2 = VectorDBEngine(cfg, mesh=create_mesh(), data_dir=d)
        r = eng2.search(SearchRequest(query_vector=vecs["k123"], top_k=3))
        assert r.success and r.search_result.keys[0] == "k123"
        assert r.search_result.scores[0] < 1e-2
    finally:
        sivf_mod.kmeans = real
        eng2.close()
