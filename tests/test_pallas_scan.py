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


def test_fit_block_rows_vmem_budget():
    """Dim-aware block sizing: a fixed 16384-row block OOMed scoped VMEM
    at dim 512 (found by the round-3 serve smoke on real TPU — the int8
    tile alone is 8 MB, double-buffered by the pallas pipeline)."""
    from tpuvdb.kernels.pallas_scan import fit_block_rows

    # headline bench shapes keep their measured-good block size
    assert fit_block_rows(1 << 20, 128, 1) == 16384   # int8 1M x 128
    assert fit_block_rows(1 << 20, 128, 2) == 16384   # bf16 (4 MB tile)
    # 512-d (the reference's CLIP dim): tile must shrink
    assert fit_block_rows(65536, 512, 1) == 8192      # int8 -> 4 MB
    assert fit_block_rows(65536, 512, 2) == 4096      # bf16 -> 4 MB
    # 768-d capacity shapes
    assert fit_block_rows(1 << 23, 768, 1) == 4096
    # non-divisible corpus halves down until it divides
    assert fit_block_rows(16384 + 8192, 512, 1) == 8192
    # nothing >= 512 divides: fall back to the XLA path
    assert fit_block_rows(1000, 512, 1) is None
    # absurd dim: tile can't fit at the minimum block either
    assert fit_block_rows(1 << 20, 1 << 14, 4) is None


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
