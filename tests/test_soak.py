"""Soak: sustained mixed workload keeps state bounded (no leak of slots,
staged buffers, or WAL segments after compaction + checkpointing)."""

import os

import numpy as np

from tpuvdb.core.config import DBConfig
from tpuvdb.core.types import SearchRequest, VectorData
from tpuvdb.engine.engine import VectorDBEngine


def test_sustained_overwrite_churn_stays_bounded(rng, tmp_data_dir):
    cfg = DBConfig(vector_dim=16, shard_count=2, shard_capacity=1 << 15,
                   block_size=128, checkpoint_every_puts=2000,
                   compact_every_puts=4000, wal_max_bytes=64 * 1024,
                   max_checkpoints=2)
    eng = VectorDBEngine(cfg, data_dir=tmp_data_dir)
    keys = [f"k{i}" for i in range(500)]

    # 12k ops over only 500 keys: overwrite churn forces soft deletes,
    # WAL rotations, periodic checkpoints and auto-compactions
    for round_ in range(24):
        batch = [VectorData(key=k, vector=rng.standard_normal(16).astype(np.float32))
                 for k in keys]
        eng.put_batch(batch)
        if round_ % 6 == 0:
            r = eng.search(SearchRequest(query_vector=batch[0].vector_np(16),
                                         top_k=3))
            assert r.success and r.search_result.keys[0] == "k0"

    assert eng.count() == 500
    assert eng.stats["compactions"] >= 2
    assert eng.stats["checkpoints"] >= 2
    # compaction keeps slot usage bounded: used slots can't exceed live keys
    # plus one churn round's worth of overwrites
    used = sum(s["used"] for s in eng.info()["shards"])
    assert used <= 500 + cfg.compact_every_puts

    # WAL truncation after checkpoints keeps segment count bounded
    segs = [f for f in os.listdir(os.path.join(tmp_data_dir, "wal"))]
    assert len(segs) < 40, len(segs)
    # checkpoint retention honored
    ckpts = os.listdir(os.path.join(tmp_data_dir, "checkpoints"))
    assert len([c for c in ckpts if c.startswith("checkpoint_")]) <= 2

    # recovery from the churned state is exact
    eng.wal.close()
    eng2 = VectorDBEngine(cfg, data_dir=tmp_data_dir)
    assert eng2.count() == 500
    for k in keys[:20]:
        np.testing.assert_allclose(
            eng2.get(k).vector_data.vector,
            eng.get(k).vector_data.vector, rtol=1e-6)
