"""Kernel correctness vs the numpy exact-scan oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpuvdb.kernels.distance import (
    l2sq_full,
    l2sq_topk_blockwise,
    numpy_oracle,
)


def make_corpus(rng, n, d, n_valid=None):
    corpus = rng.standard_normal((n, d)).astype(np.float32)
    valid = np.zeros(n, dtype=bool)
    n_valid = n if n_valid is None else n_valid
    valid[:n_valid] = True
    sq = np.sum(corpus * corpus, axis=1).astype(np.float32)
    return corpus, sq, valid


@pytest.mark.parametrize("n,d,k,block", [(1024, 64, 10, 256), (2048, 128, 5, 512)])
def test_blockwise_matches_oracle(rng, n, d, k, block):
    corpus, sq, valid = make_corpus(rng, n, d)
    q = rng.standard_normal((16, d)).astype(np.float32)
    dist, idx = l2sq_topk_blockwise(q, corpus, sq, valid, k=k, block_size=block)
    odist, oidx = numpy_oracle(q, corpus, valid, k)
    np.testing.assert_allclose(np.asarray(dist), odist, rtol=3e-3, atol=1e-2)
    # indices can differ on ties; verify by distance values of chosen indices
    chosen = np.take_along_axis(
        np.sum((q[:, None, :] - corpus[None, :, :]) ** 2, axis=-1),
        np.asarray(idx),
        axis=1,
    )
    np.testing.assert_allclose(chosen, odist, rtol=3e-3, atol=1e-2)


def test_full_matches_blockwise(rng):
    corpus, sq, valid = make_corpus(rng, 512, 32)
    q = rng.standard_normal((8, 32)).astype(np.float32)
    d1, i1 = l2sq_full(q, corpus, sq, valid, k=7)
    d2, i2 = l2sq_topk_blockwise(q, corpus, sq, valid, k=7, block_size=128)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=3e-3, atol=1e-2)


def test_soft_deleted_slots_excluded(rng):
    corpus, sq, valid = make_corpus(rng, 256, 16)
    q = corpus[:4].copy()  # exact matches at idx 0..3
    valid[0] = False  # soft-delete the best hit for query 0
    dist, idx = l2sq_full(q, corpus, sq, valid, k=3)
    assert 0 not in np.asarray(idx)[0]
    # query 1 still finds itself at distance ~0
    assert np.asarray(idx)[1, 0] == 1
    assert np.asarray(dist)[1, 0] < 1e-3


def test_empty_and_partial_corpus(rng):
    corpus, sq, valid = make_corpus(rng, 128, 16, n_valid=2)
    q = rng.standard_normal((3, 16)).astype(np.float32)
    dist, idx = l2sq_full(q, corpus, sq, valid, k=5)
    dist, idx = np.asarray(dist), np.asarray(idx)
    # only 2 real hits; remaining slots are -1/+inf
    assert (idx[:, :2] >= 0).all()
    assert (idx[:, 2:] == -1).all()
    assert np.isinf(dist[:, 2:]).all()

    all_invalid = np.zeros_like(valid)
    dist, idx = l2sq_full(q, corpus, sq, all_invalid, k=5)
    assert (np.asarray(idx) == -1).all()


def test_bfloat16_corpus_close_to_oracle(rng):
    corpus, sq, valid = make_corpus(rng, 1024, 64)
    q = rng.standard_normal((4, 64)).astype(np.float32)
    bf = jnp.asarray(corpus, dtype=jnp.bfloat16)
    dist, idx = l2sq_topk_blockwise(q, bf, sq, valid, k=10, block_size=256)
    odist, oidx = numpy_oracle(q, corpus, valid, k=10)
    # bf16 dots: loose tolerance, but top-10 sets should broadly agree
    overlap = np.mean(
        [len(set(np.asarray(idx)[i]) & set(oidx[i])) / 10.0 for i in range(4)]
    )
    assert overlap >= 0.8
    np.testing.assert_allclose(np.asarray(dist), odist, rtol=0.05, atol=0.5)
