"""Engine with ivf_pq_subq: IVF-PQ cells end to end — ADC candidates +
exact host re-rank, warm-restart codebook reuse, mesh guard, config
validation. The capacity tier beyond int8 (tests/test_engine_ivf.py is
the flat-cell twin)."""

import numpy as np
import pytest

from tpuvdb.core.config import DBConfig
from tpuvdb.core.types import SearchRequest, VectorData
from tpuvdb.engine.engine import VectorDBEngine


def pq_config(**kw):
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
        ivf_pq_subq=4,
        rescore_overfetch=16,
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


def test_pq_engine_end_to_end(rng):
    eng = VectorDBEngine(pq_config())
    vecs = fill(eng, rng, 400)
    eng.flush()
    assert eng._ivf is not None and eng._ivf.pq
    # the exact re-rank makes self-queries exact despite lossy cells
    for key in ("k3", "k123", "k321"):
        r = eng.search(SearchRequest(query_vector=vecs[key], top_k=5))
        assert r.success
        assert r.search_result.keys[0] == key
        assert r.search_result.scores[0] < 1e-2


def test_pq_delete_and_overwrite(rng):
    eng = VectorDBEngine(pq_config())
    vecs = fill(eng, rng, 300)
    eng.flush()
    assert eng.delete("k7").success
    r = eng.search(SearchRequest(query_vector=vecs["k7"], top_k=5))
    assert "k7" not in r.search_result.keys
    # overwrite: new vector wins
    nv = rng.standard_normal(16).astype(np.float32)
    eng.put(VectorData(key="k9", vector=nv))
    eng.flush()
    r = eng.search(SearchRequest(query_vector=nv, top_k=1))
    assert r.search_result.keys[0] == "k9"
    assert r.search_result.scores[0] < 1e-2


def test_pq_sustained_appends_drain_without_recluster(rng):
    """Overflowing ivf_delta_max drains through append_rows: codes are
    encoded with the trained codebooks, rows stay searchable."""
    eng = VectorDBEngine(pq_config(ivf_delta_max=64))
    fill(eng, rng, 300)
    eng.flush()
    vecs2 = fill(eng, rng, 200, prefix="m")  # > delta_max: appends
    eng.flush()
    assert eng.stats.get("ivf_appends", 0) > 0
    r = eng.search(SearchRequest(query_vector=vecs2["m150"], top_k=3))
    assert r.search_result.keys[0] == "m150"
    assert r.search_result.scores[0] < 1e-2


def test_pq_warm_restart_skips_codebook_training(rng, tmp_path,
                                                 monkeypatch):
    """Restart reuses checkpointed codebooks AND centroids: neither
    k-means nor PQ training may run on recovery."""
    d = str(tmp_path / "db")
    cfg = pq_config(ivf_delta_max=10_000, checkpoint_every_puts=10**9)
    eng = VectorDBEngine(cfg, data_dir=d)
    vecs = fill(eng, rng, 400)
    eng.flush()
    cb0 = np.asarray(eng._ivf.pq_codebooks)
    eng.close()

    import tpuvdb.index.ivf as ivf_mod
    import tpuvdb.kernels.pq as pq_mod

    def no_training(*a, **k):
        raise AssertionError("training ran on a warm restart")

    monkeypatch.setattr(ivf_mod, "kmeans", no_training)
    monkeypatch.setattr(pq_mod, "train_pq", no_training)
    eng2 = VectorDBEngine(cfg, data_dir=d)
    r = eng2.search(SearchRequest(query_vector=vecs["k42"], top_k=3))
    assert r.success and r.search_result.keys[0] == "k42"
    assert r.search_result.scores[0] < 1e-2
    np.testing.assert_array_equal(np.asarray(eng2._ivf.pq_codebooks), cb0)
    eng2.close()


def test_pq_filtered_search(rng):
    eng = VectorDBEngine(pq_config())
    batch = []
    vecs = {}
    for i in range(300):
        v = rng.standard_normal(16).astype(np.float32)
        vecs[f"k{i}"] = v
        batch.append(VectorData(key=f"k{i}", vector=v,
                                metadata={"par": str(i % 2)}))
    eng.put_batch(batch)
    eng.flush()
    r = eng.search(SearchRequest(query_vector=vecs["k10"], top_k=5,
                                 filter_metadata={"par": "1"}))
    assert r.success and len(r.search_result.keys) == 5
    assert all(int(k[1:]) % 2 == 1 for k in r.search_result.keys)


def test_pq_on_mesh_end_to_end(rng):
    """IVF-PQ on the 8-device mesh: per-device coarse structures over PQ
    code cells, collective top-k merge, exact re-rank — self-queries
    exact despite lossy cells."""
    from tpuvdb.mesh.mesh import create_mesh

    mesh = create_mesh()  # 8 virtual CPU devices
    if mesh.size <= 1:
        pytest.skip("needs multi-device mesh")
    eng = VectorDBEngine(pq_config(ivf_nlist=16), mesh=mesh)
    vecs = fill(eng, rng, 800)
    eng.flush()
    assert eng._ivf is not None and eng._ivf.pq
    for key in ("k3", "k123", "k700"):
        r = eng.search(SearchRequest(query_vector=vecs[key], top_k=5))
        assert r.success and r.search_result.keys[0] == key
        assert r.search_result.scores[0] < 1e-2
    # deletes flow through the sharded validity scatters
    assert eng.delete("k3").success
    r = eng.search(SearchRequest(query_vector=vecs["k3"], top_k=5))
    assert "k3" not in r.search_result.keys


def test_pq_on_mesh_appends(rng):
    from tpuvdb.mesh.mesh import create_mesh

    mesh = create_mesh()
    if mesh.size <= 1:
        pytest.skip("needs multi-device mesh")
    eng = VectorDBEngine(pq_config(ivf_nlist=16, ivf_delta_max=64),
                         mesh=mesh)
    fill(eng, rng, 600)
    eng.flush()
    vecs2 = fill(eng, rng, 200, prefix="m")
    eng.flush()
    assert eng.stats.get("ivf_appends", 0) > 0
    r = eng.search(SearchRequest(query_vector=vecs2["m150"], top_k=3))
    assert r.search_result.keys[0] == "m150"
    assert r.search_result.scores[0] < 1e-2


def test_pq_on_replicated_2d_mesh(rng):
    """PQ cells on the 2-D (repl, shards) mesh: codebooks replicate via
    the P() spec, query batches split over the repl axis (odd batch
    exercises the padding)."""
    from tpuvdb.mesh.replicated import create_mesh_2d

    mesh = create_mesh_2d(2, 4)
    eng = VectorDBEngine(pq_config(ivf_nlist=16), mesh=mesh)
    vecs = fill(eng, rng, 600)
    eng.flush()
    assert eng._ivf.pq and eng._ivf.repl_axis == "repl"
    keys = [f"k{i}" for i in range(41, 54)]  # 13 queries: odd batch
    q = np.stack([vecs[k] for k in keys])
    dists, got = eng.search_batch(q, 3)
    for i, k in enumerate(keys):
        assert got[i][0] == k, (i, got[i])
        assert dists[i][0] < 1e-2


def test_pq_config_validation():
    with pytest.raises(ValueError, match="divide"):
        DBConfig(vector_dim=30, index_type="ivf", ivf_pq_subq=7)
    with pytest.raises(ValueError, match="exclusive"):
        DBConfig(vector_dim=32, index_type="ivf", ivf_pq_subq=4,
                 storage_dtype="int8")
    # mirror_dtype int8 + PQ cells is the intended capacity pairing
    DBConfig(vector_dim=32, index_type="ivf", ivf_pq_subq=4,
             mirror_dtype="int8")


def test_pq_deep_rescore_window(rng):
    """PQ searches re-rank a deeper window than int8 (ADC error is much
    larger than int8 row error): fetch_k honors ivf_pq_rescore_overfetch.
    Measured basis: 8M x 768 recall@10 0.72 -> 0.99 as the window went
    10x -> 100x (docs/BENCH_NOTES.md, PQ recall diagnosis)."""
    eng = VectorDBEngine(pq_config(shard_capacity=512, ivf_delta_max=2048))
    fill(eng, rng, 1200)
    eng.flush()
    seen = {}
    orig = eng._ivf_search_rows

    def spy(queries, fetch_k, ivf, delta, n_del):
        seen["fetch_k"] = fetch_k
        return orig(queries, fetch_k, ivf, delta, n_del)

    eng._ivf_search_rows = spy
    q = rng.standard_normal((2, 16)).astype(np.float32)
    eng.search_batch(q, 5)
    # default ivf_pq_rescore_overfetch=64 beats rescore_overfetch=16
    assert seen["fetch_k"] >= 64 * 5

    # 0 falls back to the plain window
    eng2 = VectorDBEngine(pq_config(shard_capacity=512, ivf_delta_max=2048,
                                    ivf_pq_rescore_overfetch=0))
    fill(eng2, rng, 1200)
    eng2.flush()
    seen2 = {}
    orig2 = eng2._ivf_search_rows

    def spy2(queries, fetch_k, ivf, delta, n_del):
        seen2["fetch_k"] = fetch_k
        return orig2(queries, fetch_k, ivf, delta, n_del)

    eng2._ivf_search_rows = spy2
    eng2.search_batch(q, 5)
    assert seen2["fetch_k"] == 16 * 5


def test_pq_adaptive_rescore_matches_full_window(rng):
    """The error-bounded adaptive re-rank (config.ivf_pq_adaptive_rescore)
    must serve the same top-k as the full fixed window while gathering
    fewer candidate rows from the host mirrors."""
    corpus = {}
    engines = []
    for adaptive in (True, False):
        eng = VectorDBEngine(pq_config(
            shard_capacity=4096, ivf_delta_max=100_000,
            ivf_pq_adaptive_rescore=adaptive))
        engines.append(eng)
    # clustered rows: ADC error actually matters here
    cents = rng.standard_normal((8, 16)).astype(np.float32) * 3
    for i in range(1500):
        v = (cents[i % 8]
             + rng.standard_normal(16).astype(np.float32) * 0.2)
        corpus[f"k{i}"] = v
    from tpuvdb.core.types import VectorData as VD

    batch = [VD(key=k, vector=v) for k, v in corpus.items()]
    for eng in engines:
        assert eng.put_batch(batch).success
        eng.flush()
    ada, full = engines
    assert ada._ivf.pq_err > 0.0  # build calibrated the bound
    q = np.stack([corpus[f"k{i}"] for i in range(32)])
    q = q + rng.standard_normal(q.shape).astype(np.float32) * 0.05
    d_a, k_a = ada.search_batch(q, 10)
    d_f, k_f = full.search_batch(q, 10)
    for i in range(len(q)):
        assert k_a[i][:10] == k_f[i][:10], i
    np.testing.assert_allclose(d_a[:, :10], d_f[:, :10], rtol=1e-5)
    # and it actually skipped host work
    assert ada.stats["rescore_skipped_rows"] > 0
    assert full.stats["rescore_skipped_rows"] == 0


def test_pq_err_survives_checkpoint_restart(rng, tmp_path):
    """pq_err rides the warm checkpoint state like the codebooks: a
    restarted engine keeps the adaptive window without retraining, on
    both the warm-rebuild and packed-restore paths."""
    d = str(tmp_path / "db")
    cfg = pq_config(ivf_delta_max=10_000, checkpoint_every_puts=10**9)
    eng = VectorDBEngine(cfg, data_dir=d)
    vecs = fill(eng, rng, 400)
    eng.flush()
    err0 = eng._ivf.pq_err
    assert err0 > 0.0
    eng.close()
    eng2 = VectorDBEngine(cfg, data_dir=d)
    r = eng2.search(SearchRequest(query_vector=vecs["k7"], top_k=3))
    assert r.success and r.search_result.keys[0] == "k7"
    assert eng2._ivf.pq_err == pytest.approx(err0)
    eng2.close()


def test_search_width_is_caller_visible(rng):
    """r5: the returned width is bounded by what the caller asked for
    (k, or the overfetch slack), NOT the internal 64x-k rescore window —
    resolving 640 keys/query for a k=10 caller measured as serving
    overhead (docs/BENCH_NOTES.md, PQ served path accounting)."""
    eng = VectorDBEngine(pq_config(shard_capacity=512, ivf_delta_max=2048))
    fill(eng, rng, 1200)
    eng.flush()
    q = rng.standard_normal((3, 16)).astype(np.float32)
    d, keys = eng.search_batch(q, 5)
    assert d.shape == (3, 5)
    assert all(len(row) == 5 for row in keys)
    assert all(k_ is not None for row in keys for k_ in row)
    # overfetch=True widens to the post-filter slack, still << the window
    d2, keys2 = eng.search_batch(q, 5, overfetch=True)
    assert d2.shape[1] == max(2 * 5, 5 + 16)
    # ascending order within the returned width survives the truncation
    assert (np.diff(d, axis=1) >= -1e-5).all()


def test_search_width_refills_after_deletes(rng):
    """Staged deletes inside the candidate set must not eat the caller's
    width: the truncated return still carries k LIVE hits (slow-path
    compaction + the rescore top slack covers the staged-delete pad)."""
    eng = VectorDBEngine(pq_config(shard_capacity=512, ivf_delta_max=2048,
                                   flush_batch=1 << 30))
    vecs = fill(eng, rng, 1200)
    eng.flush()
    # query near a known row, then delete that row and its neighbors
    target = vecs["k7"]
    d0, keys0 = eng.search_batch(target.reshape(1, -1), 8)
    victims = [k_ for k_ in keys0[0][:4] if k_ is not None]
    for k_ in victims:
        assert eng.delete(k_).success
    d1, keys1 = eng.search_batch(target.reshape(1, -1), 8)
    live = [k_ for k_ in keys1[0] if k_ is not None]
    assert len(live) == 8, live
    assert not (set(live) & set(victims))
