"""Device-side filter pushdown for large candidate sets."""

import numpy as np

from tpuvdb.core.config import DBConfig
from tpuvdb.core.types import SearchRequest, VectorData
from tpuvdb.engine.engine import VectorDBEngine


def test_large_filter_uses_device_path(rng, monkeypatch):
    eng = VectorDBEngine(DBConfig(vector_dim=16, shard_count=2,
                                  shard_capacity=4096, block_size=128))
    monkeypatch.setattr(VectorDBEngine, "_FILTER_DEVICE_MIN", 50)
    vecs = {}
    batch = []
    for i in range(300):
        v = rng.standard_normal(16).astype(np.float32)
        vecs[f"k{i}"] = v
        tag = "big" if i < 200 else "small"
        batch.append(VectorData(key=f"k{i}", vector=v, metadata={"t": tag}))
    eng.put_batch(batch)

    # 200 candidates > threshold 50 -> device masked scan
    q = vecs["k10"]  # k10 is tagged "big"
    r = eng.search(SearchRequest(query_vector=q, top_k=3,
                                 filter_metadata={"t": "big"}))
    assert r.search_result.keys[0] == "k10"
    assert all(m == {"t": "big"} for m in r.search_result.metadatas)

    # a "big" query constrained to "small" must return only small tags and
    # never the query's own (big) key
    r = eng.search(SearchRequest(query_vector=q, top_k=5,
                                 filter_metadata={"t": "small"}))
    assert r.search_result.keys  # host path (100 < ... wait 100 > 50 -> device)
    assert all(m == {"t": "small"} for m in r.search_result.metadatas)
    assert "k10" not in r.search_result.keys

    # device path respects deletes
    eng.delete("k10")
    r = eng.search(SearchRequest(query_vector=q, top_k=3,
                                 filter_metadata={"t": "big"}))
    assert "k10" not in r.search_result.keys


def test_filter_device_matches_host(rng, monkeypatch):
    cfg = DBConfig(vector_dim=16, shard_count=2, shard_capacity=4096,
                   block_size=128)
    eng = VectorDBEngine(cfg)
    batch = []
    for i in range(200):
        batch.append(VectorData(
            key=f"k{i}", vector=rng.standard_normal(16).astype(np.float32),
            metadata={"g": str(i % 2)}))
    eng.put_batch(batch)
    q = eng.get("k8").vector_data.vector

    host = eng.search(SearchRequest(query_vector=q, top_k=5,
                                    filter_metadata={"g": "0"}))
    monkeypatch.setattr(VectorDBEngine, "_FILTER_DEVICE_MIN", 10)
    dev = eng.search(SearchRequest(query_vector=q, top_k=5,
                                   filter_metadata={"g": "0"}))
    assert host.search_result.keys == dev.search_result.keys
    np.testing.assert_allclose(host.search_result.scores,
                               dev.search_result.scores, rtol=1e-3, atol=1e-3)
