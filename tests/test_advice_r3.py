"""Regression tests for the round-3 advisor findings (ADVICE.md r3).

  1. packed restore must serve with CURRENT config knobs (recall_target)
     and fall back to a rebuild when the OPQ toggle changed
  2. a checkpoint taken with an unmutated index must reuse (hardlink) the
     previous ivf_packed.npz instead of re-fetching the code table
  3. load_ivf_packed must not pin an open NpzFile handle
"""

import os

import numpy as np

from tpuvdb.core.config import DBConfig
from tpuvdb.core.types import VectorData
from tpuvdb.engine.engine import VectorDBEngine


def pq_config(tmp, **kw):
    d = dict(
        vector_dim=16,
        shard_count=2,
        shard_capacity=8192,
        block_size=128,
        index_type="ivf",
        ivf_nlist=8,
        ivf_nprobe=8,
        ivf_kmeans_iters=5,
        ivf_delta_max=10_000,
        ivf_pq_subq=4,
        rescore_overfetch=16,
        checkpoint_every_puts=10 ** 9,
        compact_every_puts=10 ** 9,
        max_checkpoints=10,
        data_dir=str(tmp),
    )
    d.update(kw)
    return DBConfig(**d)


def fill(eng, rng, n):
    batch = [VectorData(key=f"k{i}",
                        vector=rng.standard_normal(16).astype(np.float32))
             for i in range(n)]
    assert eng.put_batch(batch).success
    eng.flush()


def test_packed_restore_refreshes_recall_target(rng, tmp_path):
    """ADVICE r3 #1: restart with a changed cfg.recall_target must serve
    with the new value, not the checkpoint-era one baked into the npz."""
    eng = VectorDBEngine(pq_config(tmp_path, recall_target=0.95))
    fill(eng, rng, 512)
    eng.save_checkpoint()
    eng.close()

    eng2 = VectorDBEngine(pq_config(tmp_path, recall_target=0.99))
    fill_q = rng.standard_normal((4, 16)).astype(np.float32)
    eng2.search_batch(fill_q, k=5)  # triggers the lazy rebuild/restore
    assert eng2.stats.get("ivf_packed_restores", 0) == 1
    assert eng2._ivf.recall_target == 0.99
    eng2.close()


def test_opq_toggle_rejects_packed_restore(rng, tmp_path):
    """ADVICE r3 #1: codes trained without OPQ must not be restored into
    an OPQ-enabled engine (geometry differs) — rebuild instead."""
    eng = VectorDBEngine(pq_config(tmp_path, ivf_opq=False))
    fill(eng, rng, 512)
    eng.save_checkpoint()
    eng.close()

    eng2 = VectorDBEngine(pq_config(tmp_path, ivf_opq=True))
    q = rng.standard_normal((4, 16)).astype(np.float32)
    d, k = eng2.search_batch(q, k=5)
    assert eng2.stats.get("ivf_packed_restores", 0) == 0
    assert eng2._ivf is not None and eng2._ivf.pq_rotation is not None
    eng2.close()


def test_clean_checkpoint_reuses_packed_npz(rng, tmp_path, monkeypatch):
    """ADVICE r3 #2: a second checkpoint with no index mutation must NOT
    re-fetch the device code table — it hardlinks the previous npz."""
    eng = VectorDBEngine(pq_config(tmp_path))
    fill(eng, rng, 512)
    p1 = eng.save_checkpoint()
    npz1 = os.path.join(p1, "ivf_packed.npz")
    assert os.path.exists(npz1)

    # any device fetch on the clean path is the regression
    from tpuvdb.index.ivf import IVFIndex

    def no_fetch(cap):
        raise AssertionError("packed_fetch ran on a clean checkpoint")

    monkeypatch.setattr(IVFIndex, "packed_fetch", staticmethod(no_fetch))
    p2 = eng.save_checkpoint()
    npz2 = os.path.join(p2, "ivf_packed.npz")
    assert os.path.exists(npz2)
    assert os.stat(npz1).st_ino == os.stat(npz2).st_ino  # hardlinked
    monkeypatch.undo()

    # a put that only lands in the host delta region does NOT dirty the
    # device image (restore reconciles deltas from the mirrors), so the
    # npz stays reusable
    assert eng.put(VectorData(
        key="fresh", vector=rng.standard_normal(16).astype(np.float32)
    )).success
    eng.flush()
    p2b = eng.save_checkpoint()
    assert os.stat(os.path.join(p2b, "ivf_packed.npz")).st_ino \
        == os.stat(npz1).st_ino

    # but an index mutation (delete -> invalidate_rows) re-dirties: the
    # next checkpoint must fetch fresh state
    assert eng.delete("k0").success
    eng.flush()
    p3 = eng.save_checkpoint()
    npz3 = os.path.join(p3, "ivf_packed.npz")
    assert os.path.exists(npz3)
    assert os.stat(npz3).st_ino != os.stat(npz1).st_ino

    # and the reused npz restores correctly (end-to-end sanity)
    eng.close()
    eng2 = VectorDBEngine(pq_config(tmp_path))
    q = rng.standard_normal((2, 16)).astype(np.float32)
    eng2.search_batch(q, k=5)
    assert eng2.stats.get("ivf_packed_restores", 0) == 1
    assert eng2.count() == 512  # 512 + "fresh" - deleted "k0"
    eng2.close()


def test_load_ivf_packed_returns_plain_arrays(rng, tmp_path):
    """ADVICE r3 #3: load_ivf_packed must eagerly materialize (dict of
    ndarrays), not return an open NpzFile pinning the checkpoint dir."""
    eng = VectorDBEngine(pq_config(tmp_path))
    fill(eng, rng, 256)
    eng.save_checkpoint()
    packed = eng.ckpts.load_ivf_packed()
    assert isinstance(packed, dict)
    assert all(isinstance(v, np.ndarray) for v in packed.values())
    eng.close()
