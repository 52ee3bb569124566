"""Packed IVF-PQ checkpoint restore: restart uploads the checkpointed
code cells instead of re-running assign+encode over every mirror row
(the 778 s recovery at 8M x 768 — docs/BENCH_NOTES.md "Restart
re-encodes the world"). Covers: clean-restart restore with the full
streaming build forbidden, WAL-tail reconcile (appends + invalidations
on top of the restored image), and the fallbacks (flag off, stale
config)."""

import numpy as np
import pytest

from tpuvdb.core.config import DBConfig
from tpuvdb.core.types import SearchRequest, VectorData
from tpuvdb.engine.engine import VectorDBEngine


def pq_config(**kw):
    d = dict(
        vector_dim=16,
        shard_count=4,
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
    )
    d.update(kw)
    return DBConfig(**d)


def fill(eng, rng, n, prefix="k"):
    vecs = {}
    batch = []
    for i in range(n):
        v = rng.standard_normal(16).astype(np.float32)
        vecs[f"{prefix}{i}"] = v
        batch.append(VectorData(key=f"{prefix}{i}", vector=v))
    assert eng.put_batch(batch).success
    return vecs


def _forbid_build(monkeypatch):
    """Any full streaming rebuild on restart is the bug this feature
    removes — fail loudly if one runs."""
    import tpuvdb.index.ivf as ivf_mod

    def no_build(*a, **k):
        raise AssertionError("full IVF build ran on a packed restart")

    monkeypatch.setattr(ivf_mod.IVFIndex, "build_streaming",
                        classmethod(no_build))


def test_packed_restore_skips_reencode(rng, tmp_path, monkeypatch):
    d = str(tmp_path / "db")
    cfg = pq_config()
    eng = VectorDBEngine(cfg, data_dir=d)
    vecs = fill(eng, rng, 400)
    eng.flush()
    nlist0 = eng._ivf.nlist
    eng.close()  # checkpoint covers everything: restart has no WAL tail

    _forbid_build(monkeypatch)
    eng2 = VectorDBEngine(cfg, data_dir=d)
    r = eng2.search(SearchRequest(query_vector=vecs["k42"], top_k=3))
    assert r.success and r.search_result.keys[0] == "k42"
    assert r.search_result.scores[0] < 1e-2
    assert eng2._ivf.nlist == nlist0
    assert eng2.stats.get("ivf_packed_restores", 0) == 1
    eng2.close()


def test_packed_restore_reconciles_wal_tail(rng, tmp_path, monkeypatch):
    """Puts and deletes replayed from the WAL tail land ON TOP of the
    restored image: appended rows searchable, deleted rows gone, and
    still no full rebuild."""
    d = str(tmp_path / "db")
    cfg = pq_config()
    eng = VectorDBEngine(cfg, data_dir=d)
    vecs = fill(eng, rng, 400)
    eng.flush()
    eng.save_checkpoint()
    tail = fill(eng, rng, 60, prefix="t")  # after the checkpoint
    assert eng.delete("k7").success
    eng.wal.close()  # crash: tail lives only in the WAL

    _forbid_build(monkeypatch)
    eng2 = VectorDBEngine(cfg, data_dir=d)
    assert eng2.count() == 400 + 60 - 1
    r = eng2.search(SearchRequest(query_vector=tail["t13"], top_k=3))
    assert r.search_result.keys[0] == "t13"
    assert r.search_result.scores[0] < 1e-2
    r = eng2.search(SearchRequest(query_vector=vecs["k7"], top_k=10))
    assert "k7" not in r.search_result.keys
    # old rows still exact through the restored cells
    r = eng2.search(SearchRequest(query_vector=vecs["k123"], top_k=3))
    assert r.search_result.keys[0] == "k123"
    assert eng2.stats.get("ivf_packed_restores", 0) == 1
    eng2.close()


def test_packed_flag_off_writes_nothing(rng, tmp_path):
    import os

    d = str(tmp_path / "db")
    cfg = pq_config(ivf_checkpoint_packed=False)
    eng = VectorDBEngine(cfg, data_dir=d)
    fill(eng, rng, 300)
    eng.flush()
    eng.close()
    ckpt = eng.ckpts.latest()
    assert ckpt is not None
    assert not os.path.exists(os.path.join(ckpt, "ivf_packed.npz"))
    # restart still recovers through the warm re-encode path
    eng2 = VectorDBEngine(cfg, data_dir=d)
    assert eng2.count() == 300
    eng2.flush()
    assert eng2.stats.get("ivf_packed_restores", 0) == 0
    eng2.close()


def test_packed_stale_config_falls_back_to_build(rng, tmp_path):
    """A restart under a different PQ geometry must NOT upload the stale
    image — it retrains/rebuilds (codebooks with the old subq are useless
    for the new one)."""
    d = str(tmp_path / "db")
    eng = VectorDBEngine(pq_config(), data_dir=d)
    vecs = fill(eng, rng, 300)
    eng.flush()
    eng.close()

    cfg2 = pq_config(ivf_pq_subq=8)
    eng2 = VectorDBEngine(cfg2, data_dir=d)
    eng2.flush()
    assert eng2.stats.get("ivf_packed_restores", 0) == 0
    assert eng2._ivf is not None and eng2._ivf.pq
    r = eng2.search(SearchRequest(query_vector=vecs["k11"], top_k=3))
    assert r.search_result.keys[0] == "k11"
    eng2.close()


def test_packed_roundtrip_search_parity(rng, tmp_path, monkeypatch):
    """Restored index returns the SAME results as the pre-restart one on
    a query batch (identical cells + codes + re-rank)."""
    d = str(tmp_path / "db")
    cfg = pq_config()
    eng = VectorDBEngine(cfg, data_dir=d)
    fill(eng, rng, 500)
    eng.flush()
    qs = rng.standard_normal((16, 16)).astype(np.float32)
    d0, k0 = eng.search_batch(qs, 5)
    eng.close()

    _forbid_build(monkeypatch)
    eng2 = VectorDBEngine(cfg, data_dir=d)
    d1, k1 = eng2.search_batch(qs, 5)
    assert k0 == k1
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1), rtol=1e-5,
                               atol=1e-5)
    eng2.close()
