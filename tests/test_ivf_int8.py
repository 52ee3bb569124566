"""Scaled int8 IVF cells: recall parity on both probe paths + engine combo."""

import numpy as np
import pytest

import jax.numpy as jnp

from tpuvdb.index.ivf import IVFIndex
from tpuvdb.kernels.distance import numpy_oracle


def clustered(rng, n_clusters=16, per=192, d=32):
    centers = rng.standard_normal((n_clusters, d)) * 5
    return np.concatenate([
        centers[i] + 0.3 * rng.standard_normal((per, d))
        for i in range(n_clusters)
    ]).astype(np.float32)


def test_int8_ivf_xla_path_recall(rng):
    # gaussian corpus + full probing isolates int8 quantization noise (the
    # clustered tight-shell corpus has near-equidistant neighbors where ANY
    # score noise shuffles exact top-10 — that bounds data, not the code)
    data = rng.standard_normal((2048, 32)).astype(np.float32)
    valid = np.ones(len(data), bool)
    idx = IVFIndex.build(data, valid, nlist=8, nprobe=8, kmeans_iters=6,
                         dtype=jnp.int8)
    assert idx.quantized and idx.grouped.dtype == jnp.int8
    qi = rng.choice(len(data), 32, replace=False)
    q = data[qi]
    dist, rows = idx.search(q, k=10)
    _, oidx = numpy_oracle(q, data, valid, 10)
    recall = np.mean([
        len(set(rows[i][rows[i] >= 0]) & set(oidx[i])) / 10 for i in range(32)
    ])
    assert recall >= 0.85, recall
    # every query finds itself first, at int8-noise-level distance
    assert (rows[:, 0] == qi).all()
    assert (dist[:, 0] < 2.0).all()


@pytest.mark.parametrize("packed", ["strided", "expanded", "compact"])
def test_int8_ivf_pallas_interpret(rng, packed):
    from tpuvdb.kernels.pallas_ivf import pallas_ivf_search

    data = rng.standard_normal((1024, 32)).astype(np.float32)
    valid = np.ones(len(data), bool)
    idx = IVFIndex.build(data, valid, nlist=8, nprobe=8, kmeans_iters=6,
                         dtype=jnp.int8)
    q = data[:8]
    dist, gid = pallas_ivf_search(
        jnp.asarray(q), idx.centroids, idx.grouped, idx.grouped_sq,
        idx.grouped_valid, cell_pad=idx.cell_pad, k=5, nprobe=8,
        query_tile=8, n_buckets=128, interpret=True,
        spill=idx.spill, spill_sq=idx.spill_sq, spill_valid=idx.spill_valid,
        cell_scales=idx.cell_scales, spill_scales=idx.spill_scales,
        cell_offsets=None if packed == "strided" else idx.cell_offsets,
        force_compact=packed == "compact",
    )
    gid = np.asarray(gid)
    N_g = idx.grouped.shape[0]
    rows = np.full_like(gid, -1, dtype=np.int64)
    ok = gid >= 0
    main = ok & (gid < N_g)
    sp = ok & ~main
    rows[main] = idx.row_ids[gid[main]]
    rows[sp] = idx.spill_row_ids[gid[sp] - N_g]
    assert (rows[:, 0] == np.arange(8)).all()  # self-retrieval
    assert (np.asarray(dist)[:, 0] < 2.0).all()


def test_int8_ivf_engine(rng):
    from tpuvdb.core.config import DBConfig
    from tpuvdb.core.types import SearchRequest, VectorData
    from tpuvdb.engine.engine import VectorDBEngine

    cfg = DBConfig(vector_dim=16, shard_count=2, shard_capacity=4096,
                   block_size=128, index_type="ivf", storage_dtype="int8",
                   ivf_nlist=8, ivf_nprobe=8, ivf_kmeans_iters=4,
                   checkpoint_every_puts=10**9, compact_every_puts=10**9)
    eng = VectorDBEngine(cfg)
    vecs = {}
    batch = []
    for i in range(300):
        v = rng.standard_normal(16).astype(np.float32)
        vecs[f"k{i}"] = v
        batch.append(VectorData(key=f"k{i}", vector=v))
    eng.put_batch(batch)
    r = eng.search(SearchRequest(query_vector=vecs["k42"], top_k=1))
    assert r.search_result.keys == ["k42"]
    assert eng._ivf.quantized


def test_engine_int8_rescore_tight_shells(rng):
    """VERDICT r1 next #3: int8 storage + overfetch->exact-f32 rescore must
    hold recall@10 >= 0.97 on adversarially TIGHT cluster shells, where raw
    int8 scores cannot rank within-cluster neighbors (score noise exceeds
    the margins)."""
    from tpuvdb.core.config import DBConfig
    from tpuvdb.core.types import VectorData
    from tpuvdb.engine.engine import VectorDBEngine

    centers = rng.standard_normal((8, 32)) * 5
    data = np.concatenate([
        centers[i] + 0.15 * rng.standard_normal((1024, 32))
        for i in range(8)
    ]).astype(np.float32)
    data = data[rng.permutation(len(data))]

    cfg = DBConfig(vector_dim=32, shard_count=2, shard_capacity=16384,
                   block_size=128, storage_dtype="int8",
                   rescore_overfetch=256)  # the overfetch-4k regime
    eng = VectorDBEngine(cfg)
    eng.put_batch([VectorData(key=f"k{i}", vector=data[i])
                   for i in range(len(data))])
    eng.flush()

    q = data[:48]
    d2 = ((q[:, None, :] - data[None, :, :]) ** 2).sum(-1)
    truth = [set(f"k{j}" for j in np.argsort(d2[i])[:10]) for i in range(48)]
    _, keys = eng.search_batch(q, k=10)
    recall = np.mean([
        len(set(keys[i][:10]) & truth[i]) / 10 for i in range(48)
    ])
    assert recall >= 0.97, f"int8+rescore recall {recall:.3f}"

    # control: rescore off -> the same data must do WORSE (proves the test
    # bites and the epilogue is what carries recall)
    cfg2 = DBConfig(vector_dim=32, shard_count=2, shard_capacity=16384,
                    block_size=128, storage_dtype="int8",
                    rescore_overfetch=0)
    eng2 = VectorDBEngine(cfg2)
    eng2.put_batch([VectorData(key=f"k{i}", vector=data[i])
                    for i in range(len(data))])
    eng2.flush()
    _, keys2 = eng2.search_batch(q, k=10)
    recall2 = np.mean([
        len(set(keys2[i][:10]) & truth[i]) / 10 for i in range(48)
    ])
    assert recall2 < recall, (recall2, recall)
