"""Engine end-to-end: put/get/delete/search, overwrite, filters, recovery."""

import numpy as np
import pytest

from tpuvdb.core.config import DBConfig
from tpuvdb.core.types import SearchRequest, VectorData
from tpuvdb.engine.engine import VectorDBEngine


def small_config(**kw):
    defaults = dict(
        vector_dim=16,
        shard_count=4,
        shard_capacity=4096,
        block_size=128,
        checkpoint_every_puts=10_000,
        compact_every_puts=1_000_000,
    )
    defaults.update(kw)
    return DBConfig(**defaults)


def fill(engine, rng, n, prefix="k"):
    vecs = {}
    batch = []
    for i in range(n):
        v = rng.standard_normal(16).astype(np.float32)
        key = f"{prefix}{i}"
        vecs[key] = v
        batch.append(VectorData(key=key, vector=v, metadata={"i": str(i)}))
    r = engine.put_batch(batch)
    assert r.success, r.message
    return vecs


def test_put_get_delete_search(rng):
    eng = VectorDBEngine(small_config())
    vecs = fill(eng, rng, 200)

    # get returns the exact vector + metadata
    r = eng.get("k42")
    assert r.success
    np.testing.assert_allclose(r.vector_data.vector, vecs["k42"], rtol=1e-6)
    assert r.vector_data.metadata == {"i": "42"}

    # search for a stored vector finds itself first
    r = eng.search(SearchRequest(query_vector=vecs["k17"], top_k=5))
    assert r.success
    assert r.search_result.keys[0] == "k17"
    assert r.search_result.scores[0] < 1e-3
    assert r.search_result.scores == sorted(r.search_result.scores)

    # delete then search: gone
    assert eng.delete("k17").success
    assert not eng.get("k17").success
    r = eng.search(SearchRequest(query_vector=vecs["k17"], top_k=5))
    assert "k17" not in r.search_result.keys

    # delete of a missing key fails like the reference
    assert not eng.delete("nope").success


def test_overwrite_semantics(rng):
    eng = VectorDBEngine(small_config())
    v1 = rng.standard_normal(16).astype(np.float32)
    v2 = rng.standard_normal(16).astype(np.float32)
    eng.put(VectorData(key="a", vector=v1, metadata={"ver": "1"}))
    eng.put(VectorData(key="a", vector=v2, metadata={"ver": "2"}))
    r = eng.get("a")
    np.testing.assert_allclose(r.vector_data.vector, v2, rtol=1e-6)
    assert r.vector_data.metadata == {"ver": "2"}
    # the old vector's slot must not surface in search
    r = eng.search(SearchRequest(query_vector=v1, top_k=3))
    assert r.search_result.keys.count("a") <= 1
    assert eng.count() == 1


def test_dim_check(rng):
    eng = VectorDBEngine(small_config())
    r = eng.put(VectorData(key="bad", vector=np.zeros(8)))
    assert not r.success and "dimension" in r.message


def test_metadata_filter_and_threshold(rng):
    eng = VectorDBEngine(small_config())
    fill(eng, rng, 100)
    q = eng.get("k5").vector_data.vector
    # filter to a single key's metadata
    r = eng.search(SearchRequest(query_vector=q, top_k=3,
                                 filter_metadata={"i": "7"}))
    assert r.search_result.keys == ["k7"]
    # threshold excludes far hits; self-match at ~0 passes
    r = eng.search(SearchRequest(query_vector=q, top_k=5, threshold=1e-3))
    assert r.search_result.keys == ["k5"]


def test_compaction_preserves_data(rng):
    eng = VectorDBEngine(small_config())
    vecs = fill(eng, rng, 300)
    for i in range(0, 300, 3):
        eng.delete(f"k{i}")
    eng.compact()
    assert eng.count() == 200
    live = sum(s["live"] for s in eng.info()["shards"])
    used = sum(s["used"] for s in eng.info()["shards"])
    assert live == used == 200  # dense after compaction
    r = eng.search(SearchRequest(query_vector=vecs["k1"], top_k=3))
    assert r.search_result.keys[0] == "k1"
    assert "k0" not in r.search_result.keys


def test_recovery_from_wal(rng, tmp_data_dir):
    cfg = small_config()
    eng = VectorDBEngine(cfg, data_dir=tmp_data_dir)
    vecs = fill(eng, rng, 50)
    eng.delete("k3")
    eng.wal.close()  # simulate crash: no checkpoint on exit

    eng2 = VectorDBEngine(small_config(), data_dir=tmp_data_dir)
    assert eng2.count() == 49
    r = eng2.get("k10")
    np.testing.assert_allclose(r.vector_data.vector, vecs["k10"], rtol=1e-6)
    assert not eng2.get("k3").success
    r = eng2.search(SearchRequest(query_vector=vecs["k20"], top_k=1))
    assert r.search_result.keys == ["k20"]


def test_recovery_from_checkpoint_plus_tail(rng, tmp_data_dir):
    cfg = small_config()
    eng = VectorDBEngine(cfg, data_dir=tmp_data_dir)
    vecs = fill(eng, rng, 30)
    eng.save_checkpoint()
    tail = fill(eng, rng, 10, prefix="tail")
    eng.delete("k0")
    eng.wal.close()  # crash after checkpoint + tail writes

    eng2 = VectorDBEngine(small_config(), data_dir=tmp_data_dir)
    assert eng2.count() == 30 + 10 - 1
    assert eng2.get("tail7").success
    assert not eng2.get("k0").success
    # stats record the replayed tail only (checkpoint carried the first 30)
    assert eng2.stats["wal_replayed"] == 11


def test_checkpoint_cadence(rng, tmp_data_dir):
    cfg = small_config(checkpoint_every_puts=20)
    eng = VectorDBEngine(cfg, data_dir=tmp_data_dir)
    # maintenance runs per batch commit; four 15-put batches cross the
    # 20-put threshold twice (15+15 -> ckpt, reset, 15+15 -> ckpt)
    for p in "abcd":
        fill(eng, rng, 15, prefix=p)
    assert eng.stats["checkpoints"] >= 2


def test_capacity_exceeded(rng):
    cfg = small_config(shard_capacity=8, shard_count=1)
    eng = VectorDBEngine(cfg)
    for i in range(8):
        r = eng.put(VectorData(key=f"k{i}", vector=np.zeros(16, np.float32)))
        assert r.success
    r = eng.put(VectorData(key="overflow", vector=np.zeros(16, np.float32)))
    assert not r.success and "capacity" in r.message.lower()
