"""Concurrent ingest + query (BASELINE config 4 semantics).

The reference serializes everything through a global RLock on a 5-worker
thread pool (src/datanode/handler.py:23). The engine keeps that coarse
correctness model (one lock, batched device flushes); these tests pin the
guarantees: no lost writes, read-your-writes after put returns, searches
never crash or return stale deleted keys mid-stream.
"""

import threading

import numpy as np

from tpuvdb.core.config import DBConfig
from tpuvdb.core.types import SearchRequest, VectorData
from tpuvdb.engine.engine import VectorDBEngine


def test_concurrent_ingest_and_search(rng, tmp_data_dir):
    cfg = DBConfig(vector_dim=16, shard_count=4, shard_capacity=65536,
                   block_size=128, checkpoint_every_puts=10**6,
                   compact_every_puts=10**6)
    eng = VectorDBEngine(cfg, data_dir=tmp_data_dir)
    n_writers, per = 4, 100
    errors = []
    done = threading.Event()

    def writer(tid):
        try:
            for i in range(0, per, 10):
                batch = [
                    VectorData(key=f"w{tid}_{i + j}",
                               vector=rng.standard_normal(16).astype(np.float32))
                    for j in range(10)
                ]
                r = eng.put_batch(batch)
                assert r.success, r.message
        except Exception as e:  # pragma: no cover
            errors.append(e)

    def searcher():
        q = rng.standard_normal(16).astype(np.float32)
        while not done.is_set():
            r = eng.search(SearchRequest(query_vector=q, top_k=5))
            assert r.success
            # results are sorted and deduped
            assert r.search_result.scores == sorted(r.search_result.scores)
            assert len(set(r.search_result.keys)) == len(r.search_result.keys)

    threads = [threading.Thread(target=writer, args=(t,)) for t in range(n_writers)]
    s = threading.Thread(target=searcher)
    s.start()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    done.set()
    s.join()
    assert not errors
    assert eng.count() == n_writers * per

    # read-your-writes: every written key is gettable and findable
    r = eng.get("w2_50")
    assert r.success
    sr = eng.search(SearchRequest(query_vector=r.vector_data.vector, top_k=1))
    assert sr.search_result.keys == ["w2_50"]

    # durability: all concurrent writes survive a crash-restart
    eng.wal.close()
    eng2 = VectorDBEngine(cfg, data_dir=tmp_data_dir)
    assert eng2.count() == n_writers * per


def test_delete_during_search_stream(rng):
    cfg = DBConfig(vector_dim=16, shard_count=2, shard_capacity=8192,
                   block_size=128, checkpoint_every_puts=10**6,
                   compact_every_puts=10**6)
    eng = VectorDBEngine(cfg)
    vecs = {}
    batch = []
    for i in range(200):
        v = rng.standard_normal(16).astype(np.float32)
        vecs[f"k{i}"] = v
        batch.append(VectorData(key=f"k{i}", vector=v))
    eng.put_batch(batch)
    stop = threading.Event()
    seen_deleted = []

    def searcher():
        while not stop.is_set():
            # sample the happened-before marker BEFORE issuing the search:
            # only searches that STARTED after delete() returned must miss k50
            was_deleted = deleted.is_set()
            r = eng.search(SearchRequest(query_vector=vecs["k50"], top_k=3))
            if was_deleted and "k50" in r.search_result.keys:
                seen_deleted.append(True)

    deleted = threading.Event()
    s = threading.Thread(target=searcher)
    s.start()
    eng.delete("k50")
    deleted.set()
    import time

    time.sleep(0.2)
    stop.set()
    s.join()
    assert not seen_deleted
