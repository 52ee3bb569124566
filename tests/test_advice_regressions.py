"""Regression tests for the round-1 advisor findings (ADVICE.md).

Each test pins a specific fixed bug:
  1. overwrite at shard capacity must not lose the existing record
  2. search on an empty IVF engine returns empty, not a retry-limit error
  3. close() racing a cadence checkpoint must not deadlock (lock order)
"""

import threading

import numpy as np
import pytest

from tpuvdb.core.config import DBConfig
from tpuvdb.core.types import SearchRequest, VectorData
from tpuvdb.engine.engine import VectorDBEngine


def _vd(key, vec, **meta):
    return VectorData(key=key, vector=vec, metadata=meta)


def test_overwrite_at_capacity_keeps_old_record(rng, tmp_data_dir):
    """ADVICE high: _put_one used to soft-delete the old slot BEFORE
    alloc(); a CapacityExceeded on overwrite then silently dropped the key
    (and the next checkpoint made the loss durable)."""
    cfg = DBConfig(vector_dim=8, shard_count=1, shard_capacity=4,
                   block_size=128, data_dir=tmp_data_dir,
                   checkpoint_every_puts=10_000,
                   compact_every_puts=1_000_000)
    eng = VectorDBEngine(cfg)
    vecs = {}
    for i in range(4):  # fill the single shard to capacity
        v = rng.standard_normal(8).astype(np.float32)
        vecs[f"k{i}"] = v
        assert eng.put(_vd(f"k{i}", v)).success

    # overwrite k0: needs a fresh slot (soft-deleted slots are only
    # reclaimed by compaction), so this must FAIL -- and k0 must survive.
    r = eng.put(_vd("k0", rng.standard_normal(8).astype(np.float32)))
    assert not r.success and "capacity" in r.message

    g = eng.get("k0")
    assert g.success, "overwrite failure must not lose the existing record"
    np.testing.assert_allclose(g.vector_data.vector, vecs["k0"], rtol=1e-6)

    sr = eng.search(SearchRequest(query_vector=vecs["k0"], top_k=4))
    assert "k0" in sr.search_result.keys

    # and the loss must not become durable via checkpoint/restore
    eng.save_checkpoint()
    eng.close()
    eng2 = VectorDBEngine(cfg)
    g2 = eng2.get("k0")
    assert g2.success
    np.testing.assert_allclose(g2.vector_data.vector, vecs["k0"], rtol=1e-6)
    eng2.close()


def test_empty_ivf_engine_search_returns_empty(rng):
    """ADVICE medium: a fresh IVF-configured engine used to exhaust its
    search retries (flush with 0 rows leaves _ivf=None) and raise
    RuntimeError instead of returning empty results like flat mode."""
    cfg = DBConfig(vector_dim=8, shard_count=2, shard_capacity=1024,
                   block_size=128, index_type="ivf",
                   checkpoint_every_puts=10_000,
                   compact_every_puts=1_000_000)
    eng = VectorDBEngine(cfg)
    r = eng.search(SearchRequest(
        query_vector=rng.standard_normal(8).astype(np.float32), top_k=5))
    assert r.success
    assert r.search_result.keys == []

    dists, keys = eng.search_batch(
        rng.standard_normal((3, 8)).astype(np.float32), k=5)
    assert dists.shape[0] == 3
    assert all(k is None for row in keys for k in row)

    # after deleting everything, search must also return empty
    v = rng.standard_normal(8).astype(np.float32)
    assert eng.put(_vd("only", v)).success
    r = eng.search(SearchRequest(query_vector=v, top_k=1))
    assert r.search_result.keys == ["only"]
    assert eng.delete("only").success
    eng.flush()
    r = eng.search(SearchRequest(query_vector=v, top_k=1))
    assert r.success and r.search_result.keys == []


def test_close_racing_cadence_checkpoint_no_deadlock(rng, tmp_data_dir):
    """ADVICE medium: close() used to take the engine lock and then
    _ckpt_lock via save_checkpoint, inverting the maintenance path's
    _ckpt_lock -> _lock order; racing a cadence checkpoint deadlocked."""
    cfg = DBConfig(vector_dim=8, shard_count=2, shard_capacity=4096,
                   block_size=128, data_dir=tmp_data_dir,
                   checkpoint_every_puts=5,  # cadence fires constantly
                   compact_every_puts=1_000_000)
    eng = VectorDBEngine(cfg)
    stop = threading.Event()
    errors = []

    def writer():
        i = 0
        while not stop.is_set():
            try:
                eng.put(_vd(f"w{i}", rng.standard_normal(8).astype(np.float32)))
            except Exception as e:  # engine may be closing; only deadlock matters
                errors.append(e)
                return
            i += 1

    threads = [threading.Thread(target=writer) for _ in range(3)]
    for t in threads:
        t.start()
    # let cadence checkpoints start firing, then close concurrently
    import time
    time.sleep(0.3)
    closer = threading.Thread(target=eng.close)
    closer.start()
    closer.join(timeout=30)
    alive = closer.is_alive()
    stop.set()
    for t in threads:
        t.join(timeout=10)
    assert not alive, "close() deadlocked against a cadence checkpoint"
