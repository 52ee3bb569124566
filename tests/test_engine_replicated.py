"""Engine over a 2-D (repl, shards) mesh: real replication end to end."""

import numpy as np

from tpuvdb.core.config import DBConfig
from tpuvdb.core.types import SearchRequest, VectorData
from tpuvdb.engine.engine import VectorDBEngine
from tpuvdb.mesh.replicated import create_mesh_2d


def test_engine_on_replicated_mesh(rng):
    mesh = create_mesh_2d(2, 4)  # 2 replicas x 4 shards on the 8-dev mesh
    cfg = DBConfig(vector_dim=16, shard_count=4, shard_capacity=4096,
                   block_size=128, checkpoint_every_puts=10**9,
                   compact_every_puts=10**9)
    eng = VectorDBEngine(cfg, mesh=mesh)
    vecs = {}
    batch = []
    for i in range(300):
        v = rng.standard_normal(16).astype(np.float32)
        vecs[f"k{i}"] = v
        batch.append(VectorData(key=f"k{i}", vector=v))
    assert eng.put_batch(batch).success

    # batch of 1 (needs padding to the repl axis internally)
    r = eng.search(SearchRequest(query_vector=vecs["k7"], top_k=5))
    assert r.success
    assert r.search_result.keys[0] == "k7"
    assert r.search_result.scores[0] < 1e-3

    # deletes propagate to both replica groups
    eng.delete("k7")
    r = eng.search(SearchRequest(query_vector=vecs["k7"], top_k=5))
    assert "k7" not in r.search_result.keys

    # batched searches across replica groups return per-query correctness
    q = np.stack([vecs[f"k{i}"] for i in range(20, 26)])
    dists, keys = eng.search_batch(q, 1)
    assert [k[0] for k in keys] == [f"k{i}" for i in range(20, 26)]


def test_engine_int8_on_replicated_mesh(rng):
    mesh = create_mesh_2d(2, 4)
    cfg = DBConfig(vector_dim=16, shard_count=4, shard_capacity=4096,
                   block_size=128, storage_dtype="int8",
                   checkpoint_every_puts=10**9, compact_every_puts=10**9)
    eng = VectorDBEngine(cfg, mesh=mesh)
    vecs = {}
    batch = []
    for i in range(200):
        v = rng.standard_normal(16).astype(np.float32)
        vecs[f"k{i}"] = v
        batch.append(VectorData(key=f"k{i}", vector=v))
    assert eng.put_batch(batch).success
    r = eng.search(SearchRequest(query_vector=vecs["k9"], top_k=3))
    assert r.success and r.search_result.keys[0] == "k9"
    assert r.search_result.scores[0] < 2.0  # int8 noise, not exact zero


def test_engine_int8_device_rescore_on_replicated_mesh(rng):
    """rescore_mode=device on a 2-D mesh: the fused per-shard re-rank runs
    inside the collective program (round 3 — it used to be single-device
    only, with a silent host-path fallback on meshes). Scores come back
    exact over the stored (dequantized) rows, so a self-query's distance
    is bounded by quantization error alone."""
    mesh = create_mesh_2d(2, 4)
    cfg = DBConfig(vector_dim=16, shard_count=4, shard_capacity=4096,
                   block_size=128, storage_dtype="int8",
                   rescore_mode="device", rescore_overfetch=8,
                   checkpoint_every_puts=10**9, compact_every_puts=10**9)
    eng = VectorDBEngine(cfg, mesh=mesh)
    vecs = {}
    batch = []
    for i in range(200):
        v = rng.standard_normal(16).astype(np.float32)
        vecs[f"k{i}"] = v
        batch.append(VectorData(key=f"k{i}", vector=v))
    assert eng.put_batch(batch).success
    r = eng.search(SearchRequest(query_vector=vecs["k9"], top_k=3))
    assert eng._index.rescore_fetch > 0  # fused into the mesh program
    assert r.success and r.search_result.keys[0] == "k9"
    # exact distance to the dequantized row: ~(s_r/2)^2 * dim, far below
    # the raw int8-dot noise floor asserted in the unrescored test above
    assert r.search_result.scores[0] < 0.05, r.search_result.scores[0]

    q = np.stack([vecs[f"k{i}"] for i in range(30, 36)])
    dists, keys = eng.search_batch(q, 1)
    assert [k[0] for k in keys] == [f"k{i}" for i in range(30, 36)]
    assert all(d[0] < 0.05 for d in dists)
