"""Fault injection: torn checkpoints, corrupt WAL frames, crash-restart."""

import json
import os
import shutil

import numpy as np
import pytest

from tpuvdb.core.config import DBConfig
from tpuvdb.core.types import VectorData
from tpuvdb.engine.engine import VectorDBEngine
from tpuvdb.store.checkpoint import CheckpointManager


def cfg():
    return DBConfig(vector_dim=8, shard_count=2, shard_capacity=1024,
                    block_size=128, checkpoint_every_puts=10**6,
                    compact_every_puts=10**6)


def fill(eng, rng, n, prefix="k"):
    eng.put_batch([
        VectorData(key=f"{prefix}{i}",
                   vector=rng.standard_normal(8).astype(np.float32))
        for i in range(n)
    ])


def test_torn_checkpoint_ignored(rng, tmp_data_dir):
    c = cfg()
    eng = VectorDBEngine(c, data_dir=tmp_data_dir)
    fill(eng, rng, 20)
    eng.save_checkpoint()
    fill(eng, rng, 5, prefix="post")
    eng.save_checkpoint()
    eng.wal.close()

    ckpt_dir = os.path.join(tmp_data_dir, "checkpoints")
    ckpts = sorted(os.listdir(ckpt_dir))
    # simulate a crash mid-checkpoint: newest checkpoint lacks MANIFEST
    os.remove(os.path.join(ckpt_dir, ckpts[-1], "MANIFEST.json"))

    eng2 = VectorDBEngine(cfg(), data_dir=tmp_data_dir)
    # fell back to the older checkpoint; the WAL was truncated at the newer
    # one, but the older checkpoint + remaining tail must still give a
    # consistent view of everything checkpoint #1 covered
    assert eng2.count() >= 20
    assert eng2.get("k7").success


def test_corrupt_wal_frame_raises_cleanly(tmp_path):
    from tpuvdb.core import errors
    from tpuvdb.store.wal import WriteAheadLog

    wal = WriteAheadLog(str(tmp_path), fsync=False)
    wal.append("put", "a", vector=np.zeros(4, np.float32))
    wal.append("put", "b", vector=np.zeros(4, np.float32))
    wal.close()
    seg = [os.path.join(tmp_path, f) for f in os.listdir(tmp_path)
           if f.startswith("wal_")][0]
    data = bytearray(open(seg, "rb").read())
    data[10] ^= 0xFF  # flip a byte INSIDE the first record
    open(seg, "wb").write(bytes(data))
    wal2 = WriteAheadLog(str(tmp_path), fsync=False, native_backend=False)
    with pytest.raises(errors.WalCorruption):
        list(wal2.iter_records())


def test_checkpoint_dim_mismatch_rejected(rng, tmp_data_dir):
    from tpuvdb.core import errors

    eng = VectorDBEngine(cfg(), data_dir=tmp_data_dir)
    fill(eng, rng, 5)
    eng.save_checkpoint()
    eng.wal.close()
    bad = DBConfig(vector_dim=16, shard_count=2, shard_capacity=1024,
                   block_size=128)
    with pytest.raises(errors.CheckpointError):
        VectorDBEngine(bad, data_dir=tmp_data_dir)


def test_checkpoint_retention(rng, tmp_data_dir):
    c = cfg()
    c.max_checkpoints = 2
    eng = VectorDBEngine(c, data_dir=tmp_data_dir)
    for i in range(4):
        fill(eng, rng, 3, prefix=f"r{i}_")
        eng.save_checkpoint()
    ckpt_dir = os.path.join(tmp_data_dir, "checkpoints")
    assert len([d for d in os.listdir(ckpt_dir) if d.startswith("checkpoint_")]) <= 2
