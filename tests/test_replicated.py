"""2-D (repl, shards) mesh: replicated corpus, query-parallel search."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpuvdb.kernels.distance import numpy_oracle
from tpuvdb.mesh.replicated import (
    create_mesh_2d,
    replicated_search,
    shard_corpus_replicated,
)


@pytest.mark.parametrize("repl,shards", [(2, 4), (4, 2)])
def test_replicated_search_matches_oracle(rng, repl, shards):
    mesh = create_mesh_2d(repl, shards)
    rows = shards * 256
    d = 32
    corpus = rng.standard_normal((rows, d)).astype(np.float32)
    valid = np.ones(rows, bool)
    valid[17] = False
    sq = np.einsum("nd,nd->n", corpus, corpus).astype(np.float32)
    q = rng.standard_normal((16, d)).astype(np.float32)

    vecs, sqd, vd = shard_corpus_replicated(
        mesh, jnp.asarray(corpus), jnp.asarray(sq), jnp.asarray(valid)
    )
    dist, out_rows = replicated_search(
        jnp.asarray(q), vecs, sqd, vd, k=10, block_size=128, mesh=mesh,
    )
    dist, out_rows = np.asarray(dist), np.asarray(out_rows)
    assert dist.shape == (16, 10)
    odist, oidx = numpy_oracle(q, corpus, valid, 10)
    np.testing.assert_allclose(dist, odist, rtol=3e-3, atol=1e-2)
    assert 17 not in out_rows
    # every query's hits must be correct, regardless of which replica
    # group served it (batch reassembly ordering)
    for i in range(16):
        chosen = [int(r) for r in out_rows[i] if r >= 0]
        true = [int(x) for x in oidx[i] if x >= 0]
        assert len(set(chosen) & set(true)) >= 9


def test_replica_groups_hold_full_copies(rng):
    """Each replica group must independently return correct results — the
    failure-domain property the reference's failover promises but lacks."""
    mesh = create_mesh_2d(2, 4)
    rows, d = 4 * 128, 16
    corpus = rng.standard_normal((rows, d)).astype(np.float32)
    sq = np.einsum("nd,nd->n", corpus, corpus).astype(np.float32)
    valid = np.ones(rows, bool)
    vecs, sqd, vd = shard_corpus_replicated(
        mesh, jnp.asarray(corpus), jnp.asarray(sq), jnp.asarray(valid)
    )
    # query batch of 2: one query per replica group; each is an exact
    # corpus row, so EACH group must find its own row in ITS full copy
    q = corpus[[100, 400]]
    dist, out_rows = replicated_search(
        jnp.asarray(q), vecs, sqd, vd, k=1, block_size=128, mesh=mesh,
    )
    assert list(np.asarray(out_rows)[:, 0]) == [100, 400]
    assert (np.asarray(dist)[:, 0] < 1e-2).all()
