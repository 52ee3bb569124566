"""Pallas fused scan vs the numpy oracle (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpuvdb.kernels.distance import numpy_oracle
from tpuvdb.kernels.pallas_scan import pallas_l2sq_topk


@pytest.mark.parametrize("n,d,k", [(1024, 128, 10)])
def test_pallas_matches_oracle(rng, n, d, k):
    corpus = rng.standard_normal((n, d)).astype(np.float32)
    sq = np.einsum("nd,nd->n", corpus, corpus).astype(np.float32)
    valid = np.ones(n, bool)
    valid[3] = False
    q = rng.standard_normal((16, d)).astype(np.float32)
    dist, idx = pallas_l2sq_topk(
        jnp.asarray(q), jnp.asarray(corpus), jnp.asarray(sq), jnp.asarray(valid),
        k=k, block_rows=256, n_buckets=128, query_tile=16, interpret=True,
    )
    dist, idx = np.asarray(dist), np.asarray(idx)
    odist, oidx = numpy_oracle(q, corpus, valid, k)
    assert 3 not in idx
    # bucketed candidates: allow rare collisions, require >=90% overlap and
    # exact distances for everything returned
    overlap = np.mean([len(set(idx[i]) & set(oidx[i])) / k for i in range(16)])
    assert overlap >= 0.9, overlap
    for i in range(16):
        for j in range(k):
            if idx[i, j] >= 0:
                true = float(np.sum((q[i] - corpus[idx[i, j]]) ** 2))
                assert abs(true - dist[i, j]) < 1e-2


def test_pallas_query_padding(rng):
    n, d = 512, 64
    corpus = rng.standard_normal((n, d)).astype(np.float32)
    sq = np.einsum("nd,nd->n", corpus, corpus).astype(np.float32)
    valid = np.ones(n, bool)
    q = corpus[:5]  # 5 queries, query_tile=8 -> padded internally
    dist, idx = pallas_l2sq_topk(
        jnp.asarray(q), jnp.asarray(corpus), jnp.asarray(sq), jnp.asarray(valid),
        k=3, block_rows=128, n_buckets=128, query_tile=8, interpret=True,
    )
    assert np.asarray(idx).shape == (5, 3)
    assert (np.asarray(idx)[:, 0] == np.arange(5)).all()
    assert (np.asarray(dist)[:, 0] < 1e-2).all()
