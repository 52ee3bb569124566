"""Search group-commit (engine/coalesce.py): concurrent search_batch
calls share one device call; results must be identical to solo calls."""

import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import pytest

from tpuvdb.core.config import DBConfig
from tpuvdb.engine.coalesce import SearchCoalescer
from tpuvdb.engine.engine import VectorDBEngine


def _mk_engine(n=2000, dim=16, coalesce=True):
    cfg = DBConfig(vector_dim=dim, shard_count=2, shard_capacity=n,
                   wal_enabled=False, search_coalesce=coalesce,
                   checkpoint_every_puts=10 ** 9,
                   compact_every_puts=10 ** 9)
    eng = VectorDBEngine(cfg)
    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((n, dim)).astype(np.float32)
    eng.put_rows([f"r{i}" for i in range(n)], vecs)
    eng.flush()
    return eng, vecs


def test_concurrent_matches_solo(rng):
    eng, vecs = _mk_engine()
    queries = [vecs[rng.integers(0, len(vecs), 32)]
               + 0.01 * rng.standard_normal((32, vecs.shape[1])).astype(
                   np.float32)
               for _ in range(12)]
    solo = [eng._search_batch_direct(q.astype(np.float32), 5, False)
            for q in queries]
    with ThreadPoolExecutor(max_workers=12) as pool:
        got = list(pool.map(lambda q: eng.search_batch(q, 5), queries))
    for (sd, sk), (gd, gk) in zip(solo, got):
        np.testing.assert_allclose(np.asarray(gd), np.asarray(sd),
                                   rtol=1e-5, atol=1e-5)
        assert [list(r) for r in gk] == [list(r) for r in sk]


def test_groups_actually_stack():
    """Batches arriving while a device call is in flight must share the
    NEXT direct call. Deterministic interleaving: the leader's direct
    call blocks until all followers have enqueued."""
    import time

    calls = []
    leader_in_direct = threading.Event()
    followers_queued = threading.Event()

    def direct(q, k, overfetch):
        calls.append(q.shape[0])
        if len(calls) == 1:
            leader_in_direct.set()
            assert followers_queued.wait(5)
            time.sleep(0.05)  # let followers reach the leader lock
        return (np.zeros((q.shape[0], k), np.float32),
                [["x"] * k for _ in range(q.shape[0])])

    # inflight=1 pins the single-leader regime so the stacking behavior
    # is deterministic (with slots free, followers would overlap instead)
    co = SearchCoalescer(direct, max_rows=4096, inflight=1)

    def call(i):
        if i > 0:
            assert leader_in_direct.wait(5)
        return co.search(np.zeros((8, 4), np.float32), 3, False)

    with ThreadPoolExecutor(max_workers=4) as pool:
        lead = pool.submit(call, 0)
        assert leader_in_direct.wait(5)
        folls = [pool.submit(call, i) for i in (1, 2, 3)]
        time.sleep(0.1)  # followers enqueue + block on the leader lock
        followers_queued.set()
        res = [lead.result(10)] + [f.result(10) for f in folls]
    assert all(r[0].shape == (8, 3) for r in res)
    # leader served alone (8); the 3 followers stacked (24 -> padded 32)
    assert calls == [8, 32]


def test_mixed_k_separate_groups():
    eng, vecs = _mk_engine(n=500)
    q = vecs[:16].astype(np.float32)
    with ThreadPoolExecutor(max_workers=8) as pool:
        futs = [pool.submit(eng.search_batch, q, k) for k in (3, 5, 3, 5,
                                                              7, 3, 5, 7)]
        out = [f.result() for f in futs]
    for (d, keys), k in zip(out, (3, 5, 3, 5, 7, 3, 5, 7)):
        assert np.asarray(d).shape[0] == 16
        assert len(keys[0]) >= k
        # self-query: nearest neighbor is the row itself
        assert keys[0][0] == "r0"


def test_exception_propagates_to_group():
    def direct(q, k, overfetch):
        raise RuntimeError("boom")

    co = SearchCoalescer(direct, max_rows=64)
    with pytest.raises(RuntimeError, match="boom"):
        co.search(np.zeros((4, 4), np.float32), 2, False)


def test_max_rows_never_splits_a_batch():
    calls = []

    def direct(q, k, overfetch):
        calls.append(q.shape[0])
        return (np.zeros((q.shape[0], k), np.float32),
                [[None] * k for _ in range(q.shape[0])])

    co = SearchCoalescer(direct, max_rows=16)
    d, keys = co.search(np.zeros((40, 4), np.float32), 2, False)
    assert d.shape == (40, 2) and calls == [40]


def test_warm_search_ladder():
    """warm_search must pre-run the base batch plus every pow2 stack the
    coalescer can form up to min(coalesce_max, max_stack) — the shapes a
    concurrent burst would otherwise compile cold in the hot path."""
    eng, _ = _mk_engine(n=500)
    assert eng.warm_search(5, 32, max_stack=128) == [32, 64, 128]
    # pow2 base: ladder starts strictly above it
    assert eng.warm_search(5, 64, max_stack=256) == [64, 128, 256]
    # coalescing off: only the base shape
    eng2, _ = _mk_engine(n=500, coalesce=False)
    assert eng2.warm_search(5, 48) == [48]


def test_groups_overlap_in_flight():
    """With inflight > 1, a caller arriving while a leader's device call
    is in flight must NOT wait for it (the r4 regression: a single
    leader lock serialized groups, forfeiting round-trip overlap on
    dispatch-tick-dominated transports)."""
    import time

    leader_in_direct = threading.Event()
    release_leader = threading.Event()

    def direct(q, k, overfetch):
        if not leader_in_direct.is_set():
            leader_in_direct.set()
            assert release_leader.wait(5)
        return (np.zeros((q.shape[0], k), np.float32),
                [["x"] * k for _ in range(q.shape[0])])

    co = SearchCoalescer(direct, max_rows=4096, inflight=2)
    with ThreadPoolExecutor(max_workers=2) as pool:
        lead = pool.submit(
            co.search, np.zeros((8, 4), np.float32), 3, False)
        assert leader_in_direct.wait(5)
        t0 = time.perf_counter()
        follow = co.search(np.zeros((8, 4), np.float32), 3, False)
        follow_s = time.perf_counter() - t0
        assert follow[0].shape == (8, 3)
        assert not lead.done()      # follower finished while leader waits
        release_leader.set()
        assert lead.result(5)[0].shape == (8, 3)
    assert follow_s < 2.0


def test_solo_caller_shape_unchanged():
    """A solo call must pass its batch through un-padded (compile-shape
    stability for single-stream servers)."""
    calls = []

    def direct(q, k, overfetch):
        calls.append(q.shape[0])
        return (np.zeros((q.shape[0], k), np.float32),
                [[None] * k for _ in range(q.shape[0])])

    co = SearchCoalescer(direct, max_rows=4096)
    co.search(np.zeros((12, 4), np.float32), 2, False)
    assert calls == [12]
