"""PQ kernels vs numpy oracle (SURVEY.md §4 test plan item 3 style:
kernel-vs-oracle on CPU). The reference has no quantization at all; these
tests pin the beyond-parity PQ capacity tier's correctness."""

import numpy as np
import pytest

from tpuvdb.kernels import pq


def _clustered(rng, n, d, n_clusters=24, noise=0.25):
    cents = rng.standard_normal((n_clusters, d)).astype(np.float32) * 2.0
    who = rng.integers(0, n_clusters, n)
    return (cents[who] + noise * rng.standard_normal((n, d))).astype(np.float32)


def test_train_encode_roundtrip_quality(rng):
    """Codebooks must reduce reconstruction error well below data variance."""
    x = _clustered(rng, 4096, 32)
    cb = pq.train_pq(x, m_subq=8, iters=10, block=1024, seed=1)
    assert cb.shape == (8, 256, 4)
    codes, rsq = pq.encode_pq(x, cb, block=1024)
    assert codes.shape == (4096, 8) and codes.dtype == np.uint8
    recon = pq.decode_pq(codes, cb)
    mse = float(np.mean((recon - x) ** 2))
    var = float(np.var(x))
    assert mse < 0.25 * var, (mse, var)
    # recon_sq is the exact norm of the reconstruction
    np.testing.assert_allclose(rsq, np.einsum("nd,nd->n", recon, recon),
                               rtol=2e-4, atol=2e-4)


def test_encode_empty_and_pad(rng):
    cb = pq.train_pq(rng.standard_normal((512, 16)).astype(np.float32),
                     m_subq=4, iters=4, block=256)
    codes, rsq = pq.encode_pq(np.zeros((0, 16), np.float32), cb)
    assert codes.shape == (0, 4) and rsq.shape == (0,)
    # n not a multiple of block: padding must not corrupt real rows
    x = rng.standard_normal((77, 16)).astype(np.float32)
    codes, rsq = pq.encode_pq(x, cb, block=64)
    assert codes.shape == (77, 4)
    recon = pq.decode_pq(codes, cb)
    np.testing.assert_allclose(rsq, np.einsum("nd,nd->n", recon, recon),
                               rtol=2e-4, atol=2e-4)


def test_bad_subq_raises():
    with pytest.raises(ValueError):
        pq.train_pq(np.zeros((10, 30), np.float32), m_subq=7)


def test_pq_topk_matches_adc_oracle(rng):
    """The one-hot GEMM scan must reproduce exact ADC ranking (same
    candidate set; distances within bf16 GEMM rounding)."""
    import jax.numpy as jnp

    n, d, q_n, k = 1024, 32, 9, 10
    x = _clustered(rng, n, d)
    cb = pq.train_pq(x, m_subq=8, iters=10, block=256, seed=3)
    codes, rsq = pq.encode_pq(x, cb, block=256)
    valid = np.ones(n, bool)
    valid[rng.choice(n, 50, replace=False)] = False
    queries = _clustered(rng, q_n, d)

    dist, idx = pq.pq_topk(jnp.asarray(queries), jnp.asarray(codes),
                           jnp.asarray(cb), jnp.asarray(rsq),
                           jnp.asarray(valid), k=k, block=256)
    dist, idx = np.asarray(dist), np.asarray(idx)
    odist, oidx = pq.numpy_adc_oracle(queries, codes, cb, rsq, valid, k)

    # distances agree to bf16-accumulation tolerance...
    np.testing.assert_allclose(dist, odist, rtol=2e-2, atol=2e-2)
    # ...and the candidate sets match except at rounding-induced ties
    for i in range(q_n):
        inter = len(set(idx[i]) & set(oidx[i]))
        assert inter >= k - 2, (i, idx[i], oidx[i])


def test_pq_topk_all_invalid(rng):
    import jax.numpy as jnp

    x = rng.standard_normal((256, 16)).astype(np.float32)
    cb = pq.train_pq(x, m_subq=4, iters=4, block=256)
    codes, rsq = pq.encode_pq(x, cb, block=256)
    dist, idx = pq.pq_topk(jnp.asarray(x[:3]), jnp.asarray(codes),
                           jnp.asarray(cb), jnp.asarray(rsq),
                           jnp.asarray(np.zeros(256, bool)), k=5, block=256)
    assert np.all(np.asarray(idx) == -1)
    assert np.all(np.isinf(np.asarray(dist)))


def test_gathered_adc_variants_agree(rng):
    """Both IVF-probe epilogues (gather / one-hot) equal the direct LUT sum."""
    import jax.numpy as jnp

    q_n, r_n, m_subq, d = 5, 64, 8, 32
    x = _clustered(rng, 512, d)
    cb = pq.train_pq(x, m_subq=m_subq, iters=6, block=256)
    codes, _ = pq.encode_pq(x, cb, block=256)
    queries = _clustered(rng, q_n, d)
    cand = rng.integers(0, 512, (q_n, r_n))
    codes_g = codes[cand]  # (Q, R, M)

    lut = np.asarray(pq._pq_lut(jnp.asarray(queries), jnp.asarray(cb)))
    want = lut[np.arange(q_n)[:, None, None],
               np.arange(m_subq)[None, None, :],
               codes_g.astype(np.int64)].sum(-1)

    got_g = np.asarray(pq.adc_scores_gathered(
        jnp.asarray(lut), jnp.asarray(codes_g)))
    np.testing.assert_allclose(got_g, want, rtol=1e-5, atol=1e-5)

    # onehot variant rounds the LUT to bf16: abs error scales with the
    # per-row sum of |LUT| entries (~0.4% each), not with the cancelled sum
    got_oh = np.asarray(pq.adc_scores_gathered_onehot(
        jnp.asarray(lut), jnp.asarray(codes_g), chunk=16))
    tol = 0.008 * np.abs(lut).max() * m_subq
    np.testing.assert_allclose(got_oh, want, rtol=2e-2, atol=tol)

    # the serving-path grouped-GEMM formulation (incl. the query-group
    # padding path: 5 queries with q_group=4 -> one padded group)
    got_gr = np.asarray(pq.adc_scores_grouped(
        jnp.asarray(lut), jnp.asarray(codes_g), chunk=16, q_group=4))
    np.testing.assert_allclose(got_gr, want, rtol=2e-2, atol=tol)
    got_gr8 = np.asarray(pq.adc_scores_grouped(
        jnp.asarray(lut), jnp.asarray(codes_g), chunk=64, q_group=8))
    np.testing.assert_allclose(got_gr8, want, rtol=2e-2, atol=tol)


def test_recall_with_rescore_overfetch(rng):
    """End-to-end quality bar: PQ overfetch + exact re-rank recovers
    >= 0.95 recall@10 on clustered data at 16x compression."""
    n, d, q_n, k, fetch = 8192, 64, 16, 10, 128
    x = _clustered(rng, n, d, n_clusters=48)
    queries = x[rng.choice(n, q_n, replace=False)] + \
        0.05 * rng.standard_normal((q_n, d)).astype(np.float32)

    cb = pq.train_pq(x[:4096], m_subq=16, iters=12, block=1024)
    codes, rsq = pq.encode_pq(x, cb, block=1024)

    import jax.numpy as jnp
    _, fidx = pq.pq_topk(jnp.asarray(queries), jnp.asarray(codes),
                         jnp.asarray(cb), jnp.asarray(rsq),
                         jnp.asarray(np.ones(n, bool)), k=fetch, block=1024)
    fidx = np.asarray(fidx)

    # exact oracle
    d2 = (np.sum(queries**2, 1)[:, None] - 2 * queries @ x.T
          + np.sum(x**2, 1)[None, :])
    oidx = np.argsort(d2, axis=1)[:, :k]

    # exact re-rank of the fetched candidates
    hits = 0
    for i in range(q_n):
        cand = fidx[i][fidx[i] >= 0]
        cd = np.sum((x[cand] - queries[i]) ** 2, axis=1)
        rer = cand[np.argsort(cd)[:k]]
        hits += len(set(rer) & set(oidx[i]))
    recall = hits / (q_n * k)
    assert recall >= 0.95, recall
