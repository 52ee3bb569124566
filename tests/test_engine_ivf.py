"""Engine with index_type=ivf: delta region, deletes, rebuild threshold."""

import numpy as np

from tpuvdb.core.config import DBConfig
from tpuvdb.core.types import SearchRequest, VectorData
from tpuvdb.engine.engine import VectorDBEngine


def ivf_config(**kw):
    d = dict(
        vector_dim=16,
        shard_count=4,
        shard_capacity=8192,
        block_size=128,
        index_type="ivf",
        ivf_nlist=8,
        ivf_nprobe=8,
        ivf_kmeans_iters=5,
        ivf_delta_max=64,
        checkpoint_every_puts=10_000,
        compact_every_puts=1_000_000,
    )
    d.update(kw)
    return DBConfig(**d)


def fill(eng, rng, n, prefix="k"):
    vecs = {}
    batch = []
    for i in range(n):
        v = rng.standard_normal(16).astype(np.float32)
        vecs[f"{prefix}{i}"] = v
        batch.append(VectorData(key=f"{prefix}{i}", vector=v))
    assert eng.put_batch(batch).success
    return vecs


def test_ivf_engine_end_to_end(rng):
    eng = VectorDBEngine(ivf_config())
    vecs = fill(eng, rng, 400)
    r = eng.search(SearchRequest(query_vector=vecs["k123"], top_k=5))
    assert r.success
    assert r.search_result.keys[0] == "k123"
    assert r.search_result.scores[0] < 1e-2
    assert eng.info()["ivf"] is not None


def test_ivf_staged_deletes_do_not_eat_topk_width(rng):
    """Review regression: with staged-write hysteresis, deletes no longer
    force a flush before search — the device still returns the deleted
    rows, which resolve to no key. search must refill from the overfetch
    padding and return a FULL top_k of live keys, not k minus the
    staged-delete hits."""
    eng = VectorDBEngine(ivf_config(flush_batch=1024))
    vecs = fill(eng, rng, 400)
    q = vecs["k42"]
    # make 10 of the query's nearest neighbors, then delete them STAGED
    near = [f"n{i}" for i in range(10)]
    batch = [VectorData(key=nk,
                        vector=q + 0.01 * rng.standard_normal(16).astype(np.float32))
             for nk in near]
    assert eng.put_batch(batch).success
    eng.flush()  # near-dups live in the device index
    for nk in near:
        assert eng.delete(nk).success  # staged only (hysteresis: no flush)
    r = eng.search(SearchRequest(query_vector=q, top_k=10))
    assert r.success
    keys = r.search_result.keys
    assert len(keys) == 10, f"expected 10 live hits, got {len(keys)}: {keys}"
    assert not (set(keys) & set(near))
    assert keys[0] == "k42"
    # flat mode has the same staged-delete path
    eng2 = VectorDBEngine(ivf_config(index_type="flat", flush_batch=1024))
    vecs2 = fill(eng2, rng, 400)
    q2 = vecs2["k42"]
    batch = [VectorData(key=f"n{i}",
                        vector=q2 + 0.01 * rng.standard_normal(16).astype(np.float32))
             for i in range(10)]
    assert eng2.put_batch(batch).success
    eng2.flush()
    for i in range(10):
        assert eng2.delete(f"n{i}").success
    r = eng2.search(SearchRequest(query_vector=q2, top_k=10))
    keys = r.search_result.keys
    assert len(keys) == 10, f"flat: expected 10 live hits, got {len(keys)}"
    assert keys[0] == "k42"


def test_ivf_delta_inserts_visible(rng):
    eng = VectorDBEngine(ivf_config())
    fill(eng, rng, 300)
    eng.flush()  # builds the IVF
    # small insert -> goes to delta (below ivf_delta_max), still findable
    v = rng.standard_normal(16).astype(np.float32)
    eng.put(VectorData(key="fresh", vector=v))
    r = eng.search(SearchRequest(query_vector=v, top_k=1))
    assert r.search_result.keys == ["fresh"]
    # hysteresis: the search served the STAGED row from the host delta
    # scan without forcing a flush (r1 flushed on every search under
    # ingest); an explicit flush moves it into the standing IVF delta
    assert eng.info()["staged"] == 1
    assert eng.info()["ivf_delta"] == 0
    eng.flush()
    assert eng.info()["staged"] == 0
    assert eng.info()["ivf_delta"] == 1
    r = eng.search(SearchRequest(query_vector=v, top_k=1))
    assert r.search_result.keys == ["fresh"]


def test_ivf_delta_overflow_triggers_rebuild(rng):
    eng = VectorDBEngine(ivf_config(ivf_delta_max=16))
    fill(eng, rng, 200)
    eng.flush()
    fill(eng, rng, 50, prefix="d")  # > delta_max -> re-cluster on next flush
    eng.flush()
    assert eng.info()["ivf_delta"] == 0
    q = eng.get("d25").vector_data.vector
    r = eng.search(SearchRequest(query_vector=q, top_k=1))
    assert r.search_result.keys == ["d25"]


def test_ivf_delete_and_overwrite(rng):
    eng = VectorDBEngine(ivf_config())
    vecs = fill(eng, rng, 200)
    eng.flush()
    eng.delete("k10")
    r = eng.search(SearchRequest(query_vector=vecs["k10"], top_k=3))
    assert "k10" not in r.search_result.keys

    v2 = rng.standard_normal(16).astype(np.float32)
    eng.put(VectorData(key="k11", vector=v2, metadata={"v": "2"}))
    r = eng.search(SearchRequest(query_vector=v2, top_k=1))
    assert r.search_result.keys == ["k11"]
    # old k11 vector must not resolve to k11 anymore
    r = eng.search(SearchRequest(query_vector=vecs["k11"], top_k=2))
    if "k11" in r.search_result.keys:
        i = r.search_result.keys.index("k11")
        old_d = float(np.sum((np.asarray(vecs["k11"]) - np.asarray(v2)) ** 2))
        assert abs(r.search_result.scores[i] - old_d) < 1e-2


def test_ivf_concurrent_ingest_search_bounded(rng):
    """VERDICT r1 #8 done-criterion: concurrent ingest+search in IVF mode
    with bounded search latency — sustained puts must NOT force a delta
    re-cluster (or any flush) on every search."""
    import threading
    import time

    eng = VectorDBEngine(ivf_config())
    vecs = fill(eng, rng, 400)
    eng.flush()
    flushes_before = eng.stats["flushes"]

    stop = threading.Event()
    errors = []

    def writer():
        i = 0
        while not stop.is_set():
            try:
                eng.put(VectorData(
                    key=f"w{i}",
                    vector=rng.standard_normal(16).astype(np.float32)))
            except Exception as e:  # pragma: no cover
                errors.append(e)
                return
            i += 1
            time.sleep(0.001)

    t = threading.Thread(target=writer)
    t.start()
    try:
        lat = []
        target = vecs["k7"]
        for _ in range(30):
            t0 = time.perf_counter()
            r = eng.search(SearchRequest(query_vector=target, top_k=5))
            lat.append(time.perf_counter() - t0)
            assert r.success
            assert r.search_result.keys[0] == "k7"
    finally:
        stop.set()
        t.join(timeout=10)
    assert not errors
    # searches did not trigger a flush storm: far fewer flushes than
    # searches (the r1 behavior flushed on EVERY search under ingest)
    flushes = eng.stats["flushes"] - flushes_before
    assert flushes < 10, f"{flushes} flushes for 30 searches under ingest"
    lat.sort()
    assert lat[len(lat) // 2] < 1.0  # bounded (CPU jit, generous)


def test_ivf_engine_incremental_append_instead_of_rebuild(rng):
    """Sustained ingest past ivf_delta_max must drain through
    IVFIndex.append_rows (stats['ivf_appends'] grows) rather than a full
    k-means rebuild, and every vector stays searchable."""
    eng = VectorDBEngine(ivf_config(ivf_delta_max=64))
    vecs = fill(eng, rng, 500)
    eng.flush()  # initial clustered build
    appends0 = eng.stats.get("ivf_appends", 0)
    # ingest 3 more delta_max-sized waves: each flush should append
    for wave in range(3):
        vecs.update(fill(eng, rng, 100, prefix=f"w{wave}_"))
        eng.flush()
    assert eng.stats.get("ivf_appends", 0) > appends0
    # the in-place append must bump the generation so an off-lock search
    # that snapshotted the delta pre-append retries instead of scoring
    # the same row twice (delta copy + appended copy)
    assert eng._generation > 0
    for key in ("k42", "w0_5", "w1_50", "w2_99"):
        r = eng.search(SearchRequest(query_vector=vecs[key], top_k=3))
        assert r.success and r.search_result.keys[0] == key, key
        assert r.search_result.scores[0] < 1e-2
    # deletes of appended rows take effect
    assert eng.delete("w1_50").success
    eng.flush()
    r = eng.search(SearchRequest(query_vector=vecs["w1_50"], top_k=3))
    assert "w1_50" not in r.search_result.keys


def test_ivf_warm_restart_skips_kmeans_training(rng, tmp_path, monkeypatch):
    """A restarted IVF engine rebuilds by ASSIGNMENT against the
    checkpointed centroids — no k-means training run (minutes at 1M
    rows). Proven by poisoning the trainer after recovery."""
    d = str(tmp_path / "db")
    cfg = ivf_config(ivf_delta_max=10_000, checkpoint_every_puts=10**9)
    eng = VectorDBEngine(cfg, data_dir=d)
    vecs = fill(eng, rng, 400)
    eng.flush()  # trains the initial clustering
    eng.close()  # checkpoints (centroids included)

    import tpuvdb.index.ivf as ivf_mod

    def no_training(*a, **k):
        raise AssertionError("k-means training ran on a warm restart")

    monkeypatch.setattr(ivf_mod, "kmeans", no_training)
    eng2 = VectorDBEngine(cfg, data_dir=d)
    r = eng2.search(SearchRequest(query_vector=vecs["k42"], top_k=3))
    assert r.success and r.search_result.keys[0] == "k42"
    assert r.search_result.scores[0] < 1e-2
    # and the warm centroids are one-shot: the NEXT rebuild retrains
    assert eng2._ivf_warm is None
    eng2.close()


def test_ivf_warm_restart_retrains_after_heavy_churn(rng, tmp_path):
    """Drift guard: when the corpus at restart is outside 2x of the size
    the centroids were TRAINED on, the warm start is discarded and
    k-means retrains (stale clustering cannot survive generations)."""
    d = str(tmp_path / "db")
    cfg = ivf_config(ivf_delta_max=10_000, checkpoint_every_puts=10**9)
    eng = VectorDBEngine(cfg, data_dir=d)
    vecs = fill(eng, rng, 400)
    eng.flush()
    for i in range(360):  # shrink live rows far below 0.5x
        eng.delete(f"k{i}")
    eng.close()

    eng2 = VectorDBEngine(cfg, data_dir=d)
    calls = []
    import tpuvdb.index.ivf as ivf_mod
    real = ivf_mod.kmeans

    def counting(*a, **k):
        calls.append(1)
        return real(*a, **k)

    ivf_mod.kmeans = counting
    try:
        r = eng2.search(SearchRequest(query_vector=vecs["k390"], top_k=3))
        assert r.success and r.search_result.keys[0] == "k390"
        assert calls, "expected a retrain after heavy churn"
    finally:
        ivf_mod.kmeans = real
        eng2.close()


def test_ivf_warm_restart_retrains_after_churn_neutral_drift(rng, tmp_path):
    """Delete-N-insert-N churn keeps the live count flat — only the
    cumulative mutation counter can see it. After churn exceeding the
    training corpus size, the warm start must be discarded."""
    d = str(tmp_path / "db")
    cfg = ivf_config(ivf_delta_max=10_000, checkpoint_every_puts=10**9)
    eng = VectorDBEngine(cfg, data_dir=d)
    vecs = fill(eng, rng, 300)
    eng.flush()  # trains at live=300, mut=300
    # churn-neutral rewrite: >300 mutations, live count unchanged
    for i in range(200):
        assert eng.delete(f"k{i}").success
        v = rng.standard_normal(16).astype(np.float32)
        vecs[f"r{i}"] = v
        assert eng.put(VectorData(key=f"r{i}", vector=v)).success
    eng.close()

    eng2 = VectorDBEngine(cfg, data_dir=d)
    calls = []
    import tpuvdb.index.ivf as ivf_mod
    real = ivf_mod.kmeans

    def counting(*a, **k):
        calls.append(1)
        return real(*a, **k)

    ivf_mod.kmeans = counting
    try:
        r = eng2.search(SearchRequest(query_vector=vecs["r42"], top_k=3))
        assert r.success and r.search_result.keys[0] == "r42"
        assert calls, "expected retrain: churn exceeded training corpus"
    finally:
        ivf_mod.kmeans = real
        eng2.close()
