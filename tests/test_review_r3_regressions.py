"""Regression tests for the round-3 review findings.

Each test pins a specific fixed bug:
  1. put_rows is all-or-nothing on capacity (no shard-grouped partial
     commit that a client cannot resume from)
  2. BatchingWriter: one malformed record fails only ITS caller, not
     every client coalesced into the same flush window
  3. checkpoints taken with the WAL disabled record the on-disk
     high-water LSN, so re-enabling the WAL never replays a stale tail
     over the newer state
  4. checkpoint finish() survives a concurrent compaction unlinking the
     mmap mirror files it was about to hardlink (falls back to inlining
     the snapshot's pinned views)
  5. StackedLayout.iter_blocks dequantizes int8 shards when streaming a
     MIXED-dtype mirror set as f32
  6. native docstore snapshots serialize to memory under the lock
     (byte-identical to the on-disk dump format)
"""

import os
import threading

import numpy as np
import pytest

from tpuvdb.core.config import DBConfig
from tpuvdb.core.types import VectorData
from tpuvdb.engine.engine import VectorDBEngine
from tpuvdb.index.layout import ShardMirror, StackedLayout


def _vd(key, vec, **meta):
    return VectorData(key=key, vector=vec, metadata=meta)


# ------------------------------------------------------- 1. all-or-nothing


def test_put_rows_capacity_is_all_or_nothing(rng, tmp_data_dir):
    """A batch that exceeds ANY shard's capacity must apply NO records:
    rows group by shard (not input order), so the old partial-commit
    answer ('capacity exceeded after N records') did not identify which
    records landed — a client resuming at N skipped never-applied rows."""
    cfg = DBConfig(vector_dim=8, shard_count=2, shard_capacity=8,
                   block_size=128, data_dir=tmp_data_dir,
                   checkpoint_every_puts=10 ** 9,
                   compact_every_puts=10 ** 9)
    eng = VectorDBEngine(cfg)
    # enough keys that both shards would receive rows, total > one
    # shard's remaining capacity
    keys = [f"k{i}" for i in range(20)]
    vecs = rng.standard_normal((20, 8)).astype(np.float32)
    r = eng.put_rows(keys, vecs)
    assert not r.success
    assert "no records applied" in r.message
    assert eng.count() == 0
    for k in keys:
        assert not eng.get(k).success
    # a batch that fits still works afterwards (state untouched)
    assert eng.put_rows(keys[:4], vecs[:4]).success
    assert eng.count() == 4


# ------------------------------------------------- 2. batcher isolation


def test_write_batcher_isolates_malformed_records(rng, tmp_data_dir):
    """One wrong-dimension vector in a coalesced flush window must fail
    only its own caller; the valid records in the same window apply."""
    from tpuvdb.api.batching import BatchingWriter

    cfg = DBConfig(vector_dim=8, shard_count=2, shard_capacity=1024,
                   block_size=128, data_dir=tmp_data_dir,
                   checkpoint_every_puts=10 ** 9,
                   compact_every_puts=10 ** 9)
    eng = VectorDBEngine(cfg)
    bw = BatchingWriter(eng)
    results = {}

    def put_one(key, dim):
        v = rng.standard_normal(dim).astype(np.float32)
        results[key] = bw.put(_vd(key, v))

    ts = [threading.Thread(target=put_one, args=(f"good{i}", 8))
          for i in range(8)]
    ts.append(threading.Thread(target=put_one, args=("bad", 5)))
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    bw.close()
    assert not results["bad"].success
    assert "dimension" in results["bad"].message
    for i in range(8):
        assert results[f"good{i}"].success, results[f"good{i}"].message
        assert eng.get(f"good{i}").success
    assert not eng.get("bad").success


# ------------------------------------------------- 3. WAL floor


def test_checkpoint_with_wal_disabled_records_floor(rng, tmp_data_dir):
    """Run with WAL on; restart with WAL off and overwrite a key; take a
    checkpoint; restart with WAL back on. The stale WAL tail (which
    predates the bulk load) must NOT replay over the newer value."""
    dim = 8
    base = dict(vector_dim=dim, shard_count=1, shard_capacity=1024,
                block_size=128, data_dir=tmp_data_dir,
                checkpoint_every_puts=10 ** 9,
                compact_every_puts=10 ** 9)
    v1 = rng.standard_normal(dim).astype(np.float32)
    v2 = rng.standard_normal(dim).astype(np.float32)

    eng = VectorDBEngine(DBConfig(**base, wal_enabled=True))
    assert eng.put(_vd("K", v1)).success  # WAL'd, NOT checkpointed
    eng.wal.close()  # simulate crash: WAL tail survives, no checkpoint

    # bulk-reload run with WAL off (the config.py documented flow)
    eng2 = VectorDBEngine(DBConfig(**base, wal_enabled=False))
    assert eng2.put(_vd("K", v2)).success
    assert eng2.save_checkpoint() is not None
    del eng2

    eng3 = VectorDBEngine(DBConfig(**base, wal_enabled=True))
    got = eng3.get("K")
    assert got.success
    np.testing.assert_allclose(got.vector_data.vector, v2, rtol=1e-5)
    # and new writes still get fresh (non-reused) sequence numbers
    assert eng3.put(_vd("K2", v1)).success
    assert eng3.wal.last_seq >= 2


# ------------------------------------- 4. hardlink race vs compaction


def test_checkpoint_finish_survives_unlinked_mirror_files(rng, tmp_path):
    """finish() must fall back to inlining the snapshot's pinned mmap
    views when a concurrent compaction unlinked the live file paths
    between the snapshot and the hardlink."""
    from tpuvdb.store.checkpoint import CheckpointManager

    dim = 8
    m = ShardMirror(dim, 1024, init_cap=128, dtype="int8",
                    path=str(tmp_path / "mirrors" / "shard_0"))
    rows = rng.standard_normal((16, dim)).astype(np.float32)
    first = m.alloc(16)
    m.write_batch(first, rows)
    snap = m.checkpoint_snapshot()
    m.unlink_files()  # what compact() does to swapped-out mirrors

    cm = CheckpointManager(str(tmp_path / "ckpts"), max_checkpoints=2)
    cfg = DBConfig(vector_dim=dim, shard_count=1, shard_capacity=1024,
                   storage_dtype="int8")
    path = cm.save_snapshot(cfg, doc_rows=[], shard_snaps=[snap],
                            wal_pos=0, dim=dim)
    assert path is not None
    # restore into a RAM mirror and compare dequantized rows
    m2 = ShardMirror(dim, 1024, init_cap=128, dtype="int8")
    cm._restore_shard(path, 0, m2)
    assert m2.used() == 16
    np.testing.assert_allclose(m2.rows_f32(np.arange(16)),
                               m.rows_f32(np.arange(16)), rtol=1e-6)


# --------------------------------------------- 5. mixed-dtype streaming


def test_iter_blocks_dequantizes_mixed_dtype_mirrors(rng):
    """Streaming a mixed (int8 + f32) mirror set as f32 blocks must
    dequantize the int8 shards — raw codes scored as f32 are garbage."""
    dim = 8
    m_q = ShardMirror(dim, 256, init_cap=256, dtype="int8")
    m_f = ShardMirror(dim, 256, init_cap=256, dtype="float32")
    rows_q = rng.standard_normal((200, dim)).astype(np.float32)
    rows_f = rng.standard_normal((200, dim)).astype(np.float32)
    m_q.write_batch(m_q.alloc(200), rows_q)
    m_f.write_batch(m_f.alloc(200), rows_f)
    layout = StackedLayout(num_shards=2, phys_cap=256, dim=dim)
    got = np.zeros((512, dim), np.float32)
    seen = np.zeros(512, bool)
    # block_rows < total forces the streaming path (the small-corpus
    # stack() path already dequantized correctly)
    for g0, vblk, sblk, qblk, mblk in layout.iter_blocks(
            [m_q, m_f], block_rows=128):
        assert sblk is None  # mixed set streams as f32
        got[g0:g0 + 128] = vblk
        seen[g0:g0 + 128] = True
    assert seen.all()
    # int8 shard rows must come back dequantized (small quant error)
    np.testing.assert_allclose(got[:200], rows_q, atol=0.05)
    np.testing.assert_allclose(got[256:456], rows_f, rtol=1e-6)


# --------------------------------------------- 6. in-memory kv snapshot


def test_native_snapshot_mem_matches_disk_dump(tmp_path):
    from tpuvdb import native

    if not native.available():
        pytest.skip("native library unavailable")
    kv = native.NativeKv()
    for i in range(100):
        kv.put(f"key{i}", i % 4, i, i * 10, b"m" * (i % 7))
    snap = kv.dump_mem()
    assert snap is not None
    mem = bytes(snap.view())
    snap.release()
    disk = str(tmp_path / "kv.bin")
    assert kv.dump(disk)
    assert mem == open(disk, "rb").read()
