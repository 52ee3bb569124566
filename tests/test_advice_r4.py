"""Regression tests for the round-4 advisor findings (ADVICE.md r4).

  1 (medium, engine.py:1356): the off-lock exact re-rank must survive an
    IVF append flush that lands DURING the rescore — the post-rescore
    staleness check validates slot identity (_slot_generation, bumped
    only by compaction), not the device-buffer epoch (_generation, also
    bumped by the 0.05 s background IVF append flush). Without the
    split, sustained ingest in IVF-PQ mode discarded completed
    probe+rescore work on every flush and fell into the serialized
    fallback — re-serializing exactly the workload the off-lock rescore
    was built to pipeline.

  (Findings 2-4 — native rescore contiguity coercion, C bounds checks,
   strict rank assertions — are covered in tests/test_native_rescore.py.)
"""

import numpy as np

from tpuvdb.core.config import DBConfig
from tpuvdb.core.types import VectorData
from tpuvdb.engine.engine import VectorDBEngine


def mk_engine(tmp, **kw):
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
        rescore_overfetch=16,
        storage_dtype="int8",  # lossy tier => the exact host rescore runs
        checkpoint_every_puts=10 ** 9,
        compact_every_puts=10 ** 9,
        data_dir=str(tmp),
    )
    d.update(kw)
    return VectorDBEngine(DBConfig(**d))


def fill(eng, rng, n, base=0):
    batch = [VectorData(key=f"k{base + i}",
                        vector=rng.standard_normal(16).astype(np.float32))
             for i in range(n)]
    assert eng.put_batch(batch).success
    eng.flush()


def _one_search_parts(eng, rng, rescore):
    """Run the pre-assemble half of a search and return the captured
    (dists, rows, gen, slot_gen, fetch_k, layout) the way search_batch
    wires them into _assemble_results."""
    q = rng.standard_normal((2, 16)).astype(np.float32)
    # drive one real search to warm programs, then capture state
    assert eng.search_batch(q, k=5)[0] is not None
    with eng._lock:
        gen = eng._generation
        slot_gen = eng._slot_generation
    status, res = eng.search_batch(q, k=5)
    assert res is not None
    return q, gen, slot_gen


def test_rescore_survives_ivf_append_epoch_bump(rng, tmp_path):
    """A device-buffer epoch bump (IVF append flush) between the rescore
    and the key-resolution re-check must NOT retry a rescored search."""
    eng = mk_engine(tmp_path)
    fill(eng, rng, 512)
    q = rng.standard_normal((2, 16)).astype(np.float32)
    eng.search_batch(q, k=5)  # build the index / warm programs

    calls = {"n": 0}
    orig = eng._rescore_exact

    def rescore_with_flush(*a, **kw):
        out = orig(*a, **kw)
        if calls["n"] == 0:
            # simulate the background IVF append flush landing mid-rescore:
            # epoch bumps, slot identity does not
            with eng._lock:
                eng._generation += 1
            calls["n"] += 1
        return out

    eng._rescore_exact = rescore_with_flush
    status, res = eng.search_batch(q, k=5)
    assert res is not None and len(res[0][0]) > 0
    # the flush-during-rescore search completed on the FIRST attempt
    # (calls recorded exactly one rescore; a retry would have rescored
    # twice)
    assert calls["n"] == 1
    eng.close()


def test_rescore_retries_on_compaction_slot_bump(rng, tmp_path):
    """Compaction (slot reuse) during the rescore MUST still retry: slot
    identity changed, so candidate rows map to different keys."""
    eng = mk_engine(tmp_path)
    fill(eng, rng, 512)
    q = rng.standard_normal((2, 16)).astype(np.float32)
    eng.search_batch(q, k=5)

    seen = {"n": 0}
    orig = eng._rescore_exact

    def rescore_with_compact(*a, **kw):
        out = orig(*a, **kw)
        if seen["n"] == 0:
            with eng._lock:
                eng._generation += 1
                eng._slot_generation += 1  # what _swap_compacted does
        seen["n"] += 1
        return out

    eng._rescore_exact = rescore_with_compact
    status, res = eng.search_batch(q, k=5)
    # the search still SUCCEEDS (bounded retries re-run it), but the
    # first attempt was discarded: at least two rescores ran
    assert res is not None
    assert seen["n"] >= 2
    eng.close()


def test_compaction_bumps_both_generations(rng, tmp_path):
    eng = mk_engine(tmp_path, index_type="flat")
    fill(eng, rng, 256)
    g0, s0 = eng._generation, eng._slot_generation
    eng.compact()
    assert eng._generation > g0
    assert eng._slot_generation > s0
    eng.close()
