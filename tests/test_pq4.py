"""4-bit fast-scan PQ (ivf_pq_bits=4): two 4-bit codes packed per stored
byte — same bytes/row as the 8-bit tier, ~8x less ADC compute (16-wide
one-hot instead of 256). The probe is compute-bound on exactly that
one-hot (the code stream is tiny), so this is the capacity tier's
throughput knob; fidelity is coarser per code and the exact re-rank
recovers served ordering. The reference has no quantization at all."""

import numpy as np
import pytest

from tpuvdb.core.config import DBConfig
from tpuvdb.core.types import SearchRequest, VectorData
from tpuvdb.engine.engine import VectorDBEngine
from tpuvdb.index.ivf import IVFIndex
from tpuvdb.kernels import pq


def _clustered(rng, n, d, n_clusters=32, noise=0.3):
    cents = rng.standard_normal((n_clusters, d)).astype(np.float32) * 3.0
    who = rng.integers(0, n_clusters, n)
    return (cents[who] + noise * rng.standard_normal((n, d))).astype(np.float32)


# --------------------------------------------------------------- kernels


def test_nibble_pack_roundtrip(rng):
    c = rng.integers(0, 16, (257, 24), dtype=np.uint8)
    p = pq.pack_nibbles_np(c)
    assert p.shape == (257, 12)
    np.testing.assert_array_equal(pq.unpack_nibbles_np(p), c)


def test_pq4_train_encode_decode(rng):
    x = _clustered(rng, 8192, 64)
    m_bytes = 8
    cb = pq.train_pq(x, m_subq=2 * m_bytes, n_codes=16, iters=10, seed=1)
    assert cb.shape == (16, 16, 4)
    codes, rsq = pq.encode_pq(x, cb, block=1024)
    assert codes.shape == (8192, m_bytes) and codes.dtype == np.uint8
    recon = pq.decode_pq(codes, cb)
    np.testing.assert_allclose(rsq, np.einsum("nd,nd->n", recon, recon),
                               rtol=3e-3, atol=3e-3)
    # must still compress well below data variance
    mse = float(np.mean((recon - x) ** 2))
    assert mse < 0.6 * float(np.var(x)), mse


def test_pq4_topk_matches_oracle(rng):
    import jax.numpy as jnp

    n, d, k = 2048, 64, 10
    x = _clustered(rng, n, d)
    cb = pq.train_pq(x, m_subq=16, n_codes=16, iters=10, seed=3)
    codes, rsq = pq.encode_pq(x, cb, block=512)
    valid = np.ones(n, bool)
    valid[::13] = False
    q = rng.standard_normal((8, d)).astype(np.float32)
    dist, idx = pq.pq_topk(jnp.asarray(q), jnp.asarray(codes),
                           jnp.asarray(cb), jnp.asarray(rsq),
                           jnp.asarray(valid), k=k, block=512)
    od, oi = pq.numpy_adc_oracle(q, codes, cb, rsq, valid, k)
    agree = np.mean([len(set(np.asarray(idx)[i]) & set(oi[i])) / k
                     for i in range(8)])
    assert agree >= 0.9, agree


def test_pq4_adc_variants_agree(rng):
    import jax.numpy as jnp

    x = _clustered(rng, 4096, 64)
    cb = pq.train_pq(x, m_subq=16, n_codes=16, iters=8, seed=5)
    codes, _ = pq.encode_pq(x, cb)
    q = rng.standard_normal((8, 64)).astype(np.float32)
    lut = pq._pq_lut(jnp.asarray(q), jnp.asarray(cb))
    cand = rng.integers(0, 4096, (8, 512))
    cg = jnp.asarray(codes[cand])
    a = np.asarray(pq.adc_scores_gathered(lut, cg))
    b = np.asarray(pq.adc_scores_grouped(lut, cg))
    c = np.asarray(pq.adc_scores_gathered_onehot(lut, cg))
    # grouped/onehot run the MXU in bf16; gather is f32 — small drift
    np.testing.assert_allclose(b, a, rtol=5e-2, atol=0.25)
    np.testing.assert_allclose(c, a, rtol=5e-2, atol=0.25)


# ------------------------------------------------------------- IVF index


def test_ivf_pq4_recall_with_overfetch(rng):
    n, d, k = 6144, 32, 10
    x = _clustered(rng, n, d)
    valid = np.ones(n, bool)
    q = (x[rng.integers(0, n, 48)]
         + 0.05 * rng.standard_normal((48, d)).astype(np.float32))
    d2 = (np.sum(q**2, 1)[:, None] - 2 * q @ x.T + np.sum(x**2, 1)[None, :])
    oracle = np.argsort(d2, axis=1)[:, :k]
    idx = IVFIndex.build(x, valid, nlist=48, nprobe=16, kmeans_iters=6,
                         pq_subq=8, pq_bits=4, seed=2)
    assert idx.pq and idx.grouped.shape[1] == 8  # still 8 BYTES/row
    _, rows = idx.search(q, k=4 * k)
    rec = np.mean([len(set(rows[i]) & set(oracle[i])) / k
                   for i in range(len(q))])
    assert rec >= 0.75, rec


def test_ivf_pq4_append_and_delete(rng):
    n, d = 4096, 32
    x = _clustered(rng, n, d)
    idx = IVFIndex.build(x, np.ones(n, bool), nlist=32, nprobe=16,
                         kmeans_iters=5, pq_subq=8, pq_bits=4, seed=4)
    extra = _clustered(rng, 64, d)
    assert idx.append_rows(np.arange(n, n + 64), extra)
    _, rows = idx.search(extra[:16], k=5)
    hits = np.mean([(n + i) in rows[i] for i in range(16)])
    assert hits >= 0.9, hits
    idx.invalidate_rows(np.asarray([n + 3]))
    _, rows = idx.search(extra[3:4], k=5)
    assert (n + 3) not in rows[0]


def test_ivf_stale_bits_tier_retrains(rng):
    """Warm codebooks from the other bit tier must retrain, not crash."""
    n, d = 2048, 32
    x = _clustered(rng, n, d)
    cb8 = pq.train_pq(x, m_subq=8, seed=0)  # 8-bit shape
    idx = IVFIndex.build(x, np.ones(n, bool), nlist=16, nprobe=8,
                         kmeans_iters=4, pq_subq=8, pq_bits=4,
                         pq_codebooks=cb8, seed=1)
    assert idx.pq_codebooks.shape == (16, 16, 2)


# ---------------------------------------------------------------- engine


def pq4_config(**kw):
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
        ivf_pq_bits=4,
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


def test_engine_pq4_end_to_end(rng):
    eng = VectorDBEngine(pq4_config())
    vecs = fill(eng, rng, 400)
    eng.flush()
    assert eng._ivf is not None and eng._ivf.pq
    assert eng._ivf.pq_codebooks.shape == (8, 16, 2)
    for key in ("k3", "k123", "k321"):
        r = eng.search(SearchRequest(query_vector=vecs[key], top_k=5))
        assert r.success and r.search_result.keys[0] == key
        assert r.search_result.scores[0] < 1e-2


def test_engine_pq4_opq_combined(rng):
    eng = VectorDBEngine(pq4_config(ivf_opq=True))
    vecs = fill(eng, rng, 400)
    eng.flush()
    assert eng._ivf.pq_rotation is not None
    for key in ("k3", "k123"):
        r = eng.search(SearchRequest(query_vector=vecs[key], top_k=5))
        assert r.success and r.search_result.keys[0] == key
        assert r.search_result.scores[0] < 1e-2


def test_engine_pq4_warm_restart_and_tier_flip(rng, tmp_path, monkeypatch):
    d = str(tmp_path / "db")
    cfg = pq4_config(ivf_delta_max=10_000, checkpoint_every_puts=10**9)
    eng = VectorDBEngine(cfg, data_dir=d)
    vecs = fill(eng, rng, 400)
    eng.flush()
    cb0 = np.asarray(eng._ivf.pq_codebooks)
    eng.close()

    import tpuvdb.kernels.pq as pq_mod

    def no_training(*a, **k):
        raise AssertionError("PQ training ran on a warm restart")

    monkeypatch.setattr(pq_mod, "train_pq", no_training)
    eng2 = VectorDBEngine(cfg, data_dir=d)
    r = eng2.search(SearchRequest(query_vector=vecs["k42"], top_k=3))
    assert r.success and r.search_result.keys[0] == "k42"
    np.testing.assert_array_equal(np.asarray(eng2._ivf.pq_codebooks), cb0)
    eng2.close()
    monkeypatch.undo()

    # flipping the tier on restart: stale codebook shape retrains cleanly
    cfg8 = pq4_config(ivf_pq_bits=8, ivf_delta_max=10_000,
                      checkpoint_every_puts=10**9)
    eng3 = VectorDBEngine(cfg8, data_dir=d)
    eng3.flush()  # IVF rebuilds lazily; the flip happens here
    assert eng3._ivf.pq_codebooks.shape == (4, 256, 4)
    r = eng3.search(SearchRequest(query_vector=vecs["k42"], top_k=3))
    assert r.success and r.search_result.keys[0] == "k42"
    eng3.close()


def test_pq4_on_mesh_end_to_end(rng):
    from tpuvdb.mesh.mesh import create_mesh

    mesh = create_mesh()
    if mesh.size <= 1:
        pytest.skip("needs multi-device mesh")
    eng = VectorDBEngine(pq4_config(ivf_nlist=16), mesh=mesh)
    vecs = fill(eng, rng, 800)
    eng.flush()
    assert eng._ivf is not None and eng._ivf.pq
    for key in ("k3", "k123", "k700"):
        r = eng.search(SearchRequest(query_vector=vecs[key], top_k=5))
        assert r.success and r.search_result.keys[0] == key
        assert r.search_result.scores[0] < 1e-2
    vecs2 = fill(eng, rng, 100, prefix="m")
    eng.flush()
    r = eng.search(SearchRequest(query_vector=vecs2["m50"], top_k=3))
    assert r.search_result.keys[0] == "m50"


def test_pq4_config_validation():
    with pytest.raises(ValueError, match="must be 8 or 4"):
        DBConfig(vector_dim=32, index_type="ivf", ivf_pq_subq=4,
                 ivf_pq_bits=2)
    with pytest.raises(ValueError, match="subspaces"):
        # subq 16 divides 48 but 2*subq = 32 does not
        DBConfig(vector_dim=48, index_type="ivf", ivf_pq_subq=16,
                 ivf_pq_bits=4)
    DBConfig(vector_dim=32, index_type="ivf", ivf_pq_subq=4, ivf_pq_bits=4)
