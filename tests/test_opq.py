"""OPQ (optimized product quantization): learned orthogonal rotation of
the PQ (residual) space — better recall per code byte on CORRELATED data.

Plain PQ is OPQ's R = I special case, so the quality bar is relative:
on anisotropic data whose principal axes are NOT aligned with the PQ
coordinate blocks, OPQ must cut reconstruction error vs plain PQ; on the
correctness side every rotated path (flat ADC scan, residual IVF cells,
appends, checkpoint warm restart, mesh) must still match its oracle.
The reference has no quantization at all (f32 hnswlib,
/root/reference/src/datanode/handler.py:46) — this whole tier is
beyond-parity capacity work."""

import numpy as np
import pytest

from tpuvdb.kernels import pq
from tpuvdb.core.config import DBConfig
from tpuvdb.core.types import SearchRequest, VectorData
from tpuvdb.engine.engine import VectorDBEngine
from tpuvdb.index.ivf import IVFIndex


def _correlated(rng, n, d, decay=8.0):
    """Anisotropic gaussian with a random (non-axis-aligned) covariance:
    the setting where OPQ's rotation has something to find."""
    spec = np.exp(-np.arange(d) / decay)
    q, _ = np.linalg.qr(rng.standard_normal((d, d)))
    return ((rng.standard_normal((n, d)) * spec[None, :]) @ q.T
            ).astype(np.float32)


def _clustered_correlated(rng, n, d, n_clusters=24, decay=6.0):
    """Clusters whose within-cluster residuals are correlated — the
    residual-IVF-PQ analog of _correlated."""
    cents = rng.standard_normal((n_clusters, d)).astype(np.float32) * 3.0
    who = rng.integers(0, n_clusters, n)
    return (cents[who] + 0.5 * _correlated(rng, n, d, decay)
            ).astype(np.float32)


# --------------------------------------------------------------- kernels


def test_train_opq_orthogonal_and_beats_pq(rng):
    x = _correlated(rng, 12000, 32)
    r_cb, rot = pq.train_opq(x, m_subq=8, opq_iters=5, seed=1)
    assert rot.shape == (32, 32)
    np.testing.assert_allclose(rot @ rot.T, np.eye(32), atol=1e-5)

    cb = pq.train_pq(x, m_subq=8, seed=1)
    codes_pq, _ = pq.encode_pq(x, cb)
    err_pq = np.mean(np.sum((x - pq.decode_pq(codes_pq, cb)) ** 2, axis=1))
    codes_opq, rsq = pq.encode_pq(x, r_cb, rotation=rot)
    recon = pq.decode_pq(codes_opq, r_cb, rotation=rot)
    err_opq = np.mean(np.sum((x - recon) ** 2, axis=1))
    # rotations preserve norms: recon_sq needs no correction
    np.testing.assert_allclose(rsq, np.einsum("nd,nd->n", recon, recon),
                               rtol=2e-3, atol=2e-3)
    assert err_opq < 0.8 * err_pq, (err_opq, err_pq)


def test_pq_topk_with_rotation_matches_oracle(rng):
    import jax.numpy as jnp

    n, d, q_n, k = 2048, 32, 8, 10
    x = _correlated(rng, n, d)
    cb, rot = pq.train_opq(x, m_subq=8, opq_iters=4, seed=3)
    codes, rsq = pq.encode_pq(x, cb, block=512, rotation=rot)
    valid = np.ones(n, bool)
    valid[::11] = False
    q = rng.standard_normal((q_n, d)).astype(np.float32)
    dist, idx = pq.pq_topk(
        jnp.asarray(q), jnp.asarray(codes), jnp.asarray(cb),
        jnp.asarray(rsq), jnp.asarray(valid), k=k, block=512,
        rotation=jnp.asarray(rot))
    od, oi = pq.numpy_adc_oracle(q, codes, cb, rsq, valid, k, rotation=rot)
    agree = np.mean([len(set(np.asarray(idx)[i]) & set(oi[i])) / k
                     for i in range(q_n)])
    assert agree >= 0.9, agree
    # distances are true squared-L2 to the (unrotated) reconstruction
    recon = pq.decode_pq(codes, cb, rotation=rot)
    for i in range(q_n):
        j = int(np.asarray(idx)[i, 0])
        true = float(np.sum((q[i] - recon[j]) ** 2))
        np.testing.assert_allclose(float(np.asarray(dist)[i, 0]), true,
                                   rtol=5e-2, atol=5e-2)


# ------------------------------------------------------------- IVF index


def test_ivf_opq_build_and_self_recall(rng):
    n, d = 6144, 32
    x = _clustered_correlated(rng, n, d)
    valid = np.ones(n, bool)
    idx = IVFIndex.build(x, valid, nlist=48, nprobe=16, kmeans_iters=6,
                         pq_subq=8, opq=True, seed=2)
    assert idx.pq and idx.pq_rotation is not None
    q = x[rng.integers(0, n, 32)]
    dists, rows = idx.search(q, k=10)
    # self-queries: the true row must appear in the candidate top-10
    # (ADC ranks reconstructions; residual coding keeps self-hits near)
    hit = np.mean([np.any(rows[i] == np.flatnonzero(
        np.all(x == q[i], axis=1))[0]) for i in range(len(q))])
    assert hit >= 0.9, hit


def test_ivf_opq_quality_vs_plain_pq(rng):
    """On residual-correlated data the OPQ candidate set's recall@10
    (vs exact oracle) must be at least plain PQ's."""
    n, d, k = 6144, 32, 10
    x = _clustered_correlated(rng, n, d)
    valid = np.ones(n, bool)
    q = (x[rng.integers(0, n, 48)]
         + 0.05 * rng.standard_normal((48, d)).astype(np.float32))
    d2 = (np.sum(q**2, 1)[:, None] - 2 * q @ x.T + np.sum(x**2, 1)[None, :])
    oracle = np.argsort(d2, axis=1)[:, :k]

    def recall(opq):
        idx = IVFIndex.build(x, valid, nlist=48, nprobe=16,
                             kmeans_iters=6, pq_subq=8, opq=opq, seed=2)
        _, rows = idx.search(q, k=4 * k)  # overfetch like the engine
        return np.mean([len(set(rows[i]) & set(oracle[i])) / k
                        for i in range(len(q))])

    r_pq, r_opq = recall(False), recall(True)
    assert r_opq >= r_pq - 0.02, (r_opq, r_pq)
    assert r_opq >= 0.8, r_opq


def test_ivf_opq_append_rows_encoded_with_rotation(rng):
    n, d = 4096, 32
    x = _clustered_correlated(rng, n, d)
    idx = IVFIndex.build(x, np.ones(n, bool), nlist=32, nprobe=16,
                         kmeans_iters=5, pq_subq=8, opq=True, seed=4)
    extra = _clustered_correlated(rng, 64, d)
    assert idx.append_rows(np.arange(n, n + 64), extra)
    _, rows = idx.search(extra[:16], k=5)
    hits = np.mean([(n + i) in rows[i] for i in range(16)])
    assert hits >= 0.9, hits


def test_ivf_stale_or_missing_rotation_retrains(rng):
    n, d = 2048, 32
    x = _clustered_correlated(rng, n, d)
    cb = pq.train_pq(_correlated(rng, 1000, d), m_subq=8, seed=0)
    # warm codebooks WITHOUT a rotation under opq=True: unusable, retrain
    idx = IVFIndex.build(x, np.ones(n, bool), nlist=16, nprobe=8,
                         kmeans_iters=4, pq_subq=8, opq=True,
                         pq_codebooks=cb, seed=1)
    assert idx.pq_rotation is not None
    # wrong-shape rotation: both retrain
    idx2 = IVFIndex.build(x, np.ones(n, bool), nlist=16, nprobe=8,
                          kmeans_iters=4, pq_subq=8, opq=True,
                          pq_codebooks=cb,
                          pq_rotation=np.eye(16, dtype=np.float32), seed=1)
    assert idx2.pq_rotation is not None
    assert idx2.pq_rotation.shape == (d, d)
    # opq=False ignores a provided rotation (plain-PQ coding)
    idx3 = IVFIndex.build(x, np.ones(n, bool), nlist=16, nprobe=8,
                          kmeans_iters=4, pq_subq=8,
                          pq_rotation=np.eye(d, dtype=np.float32), seed=1)
    assert idx3.pq_rotation is None


# ---------------------------------------------------------------- engine


def opq_config(**kw):
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
        ivf_opq=True,
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


def test_engine_opq_end_to_end(rng):
    eng = VectorDBEngine(opq_config())
    vecs = fill(eng, rng, 400)
    eng.flush()
    assert eng._ivf is not None and eng._ivf.pq
    assert eng._ivf.pq_rotation is not None
    for key in ("k3", "k123", "k321"):
        r = eng.search(SearchRequest(query_vector=vecs[key], top_k=5))
        assert r.success and r.search_result.keys[0] == key
        assert r.search_result.scores[0] < 1e-2


def test_engine_opq_warm_restart_skips_all_training(rng, tmp_path,
                                                    monkeypatch):
    """Restart reuses checkpointed rotation + codebooks + centroids:
    neither k-means nor PQ nor OPQ training may run on recovery."""
    d = str(tmp_path / "db")
    cfg = opq_config(ivf_delta_max=10_000, checkpoint_every_puts=10**9)
    eng = VectorDBEngine(cfg, data_dir=d)
    vecs = fill(eng, rng, 400)
    eng.flush()
    rot0 = np.asarray(eng._ivf.pq_rotation)
    cb0 = np.asarray(eng._ivf.pq_codebooks)
    eng.close()

    import tpuvdb.index.ivf as ivf_mod
    import tpuvdb.kernels.pq as pq_mod

    def no_training(*a, **k):
        raise AssertionError("training ran on a warm restart")

    monkeypatch.setattr(ivf_mod, "kmeans", no_training)
    monkeypatch.setattr(pq_mod, "train_pq", no_training)
    monkeypatch.setattr(pq_mod, "train_opq", no_training)
    eng2 = VectorDBEngine(cfg, data_dir=d)
    r = eng2.search(SearchRequest(query_vector=vecs["k42"], top_k=3))
    assert r.success and r.search_result.keys[0] == "k42"
    assert r.search_result.scores[0] < 1e-2
    np.testing.assert_array_equal(np.asarray(eng2._ivf.pq_rotation), rot0)
    np.testing.assert_array_equal(np.asarray(eng2._ivf.pq_codebooks), cb0)
    eng2.close()


def test_engine_opq_appends_drain(rng):
    eng = VectorDBEngine(opq_config(ivf_delta_max=64))
    fill(eng, rng, 300)
    eng.flush()
    vecs2 = fill(eng, rng, 200, prefix="m")
    eng.flush()
    r = eng.search(SearchRequest(query_vector=vecs2["m150"], top_k=3))
    assert r.search_result.keys[0] == "m150"
    assert r.search_result.scores[0] < 1e-2


def test_opq_on_mesh_end_to_end(rng):
    """OPQ on the 8-device mesh: the rotation replicates to every device
    (P() spec, like the codebooks) and folds into each device's LUT."""
    from tpuvdb.mesh.mesh import create_mesh

    mesh = create_mesh()
    if mesh.size <= 1:
        pytest.skip("needs multi-device mesh")
    eng = VectorDBEngine(opq_config(ivf_nlist=16), mesh=mesh)
    vecs = fill(eng, rng, 800)
    eng.flush()
    assert eng._ivf is not None and eng._ivf.pq
    assert eng._ivf.pq_rotation is not None
    for key in ("k3", "k123", "k700"):
        r = eng.search(SearchRequest(query_vector=vecs[key], top_k=5))
        assert r.success and r.search_result.keys[0] == key
        assert r.search_result.scores[0] < 1e-2
    # appends encode against the replicated rotation
    vecs2 = fill(eng, rng, 100, prefix="m")
    eng.flush()
    r = eng.search(SearchRequest(query_vector=vecs2["m50"], top_k=3))
    assert r.search_result.keys[0] == "m50"


def test_opq_config_validation():
    with pytest.raises(ValueError, match="ivf_opq"):
        DBConfig(vector_dim=32, index_type="ivf", ivf_opq=True)
    # valid pairing parses
    DBConfig(vector_dim=32, index_type="ivf", ivf_pq_subq=4, ivf_opq=True)
