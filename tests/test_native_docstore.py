"""DocStore on the native C++ KV backend: engine round trip + recovery."""

import numpy as np
import pytest

from tpuvdb import native
from tpuvdb.core.config import DBConfig
from tpuvdb.core.types import SearchRequest, VectorData
from tpuvdb.engine.engine import VectorDBEngine
from tpuvdb.store.kv import DocEntry, DocStore

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library failed to build"
)


def test_native_docstore_parity(rng):
    py = DocStore(backend="python")
    nat = DocStore(backend="native")
    assert nat.backend == "native"
    for store in (py, nat):
        store.put(DocEntry("a", 1, 5, {"x": "1"}, 100))
        store.put(DocEntry("b", 0, 2, {"x": "2"}, 200))
        store.put(DocEntry("a", 1, 6, {"x": "3"}, 300))  # overwrite
    for store in (py, nat):
        assert len(store) == 2
        e = store.get("a")
        assert (e.shard, e.slot, e.metadata, e.timestamp) == (1, 6, {"x": "3"}, 300)
        assert store.key_at(1, 6) == "a"
        assert store.key_at(1, 5) is None  # overwrite unmapped the old slot
        assert store.find_by_metadata({"x": "3"}) == {(1, 6)}
        assert store.delete("b").slot == 2
        assert store.get("b") is None
        assert sorted(store.keys()) == ["a"]


def test_native_docstore_dump_load(tmp_path):
    nat = DocStore(backend="native")
    for i in range(500):
        nat.put(DocEntry(f"k{i}", i % 4, i, {"i": str(i)}, i * 10))
    p = str(tmp_path / "docs.msgpack")
    nat.dump(p)
    # snapshots are backend-interchangeable
    back_py = DocStore.load(p, backend="python")
    back_nat = DocStore.load(p, backend="native")
    for store in (back_py, back_nat):
        assert len(store) == 500
        assert store.get("k123").metadata == {"i": "123"}
        assert store.key_at(123 % 4, 123) == "k123"


def test_engine_with_native_docstore(rng, tmp_data_dir):
    cfg = DBConfig(vector_dim=16, shard_count=2, shard_capacity=2048,
                   block_size=128, docstore_backend="native",
                   checkpoint_every_puts=10**9, compact_every_puts=10**9)
    eng = VectorDBEngine(cfg, data_dir=tmp_data_dir)
    assert eng.docstore.backend == "native"
    vecs = {}
    batch = []
    for i in range(100):
        v = rng.standard_normal(16).astype(np.float32)
        vecs[f"k{i}"] = v
        batch.append(VectorData(key=f"k{i}", vector=v, metadata={"i": str(i)}))
    eng.put_batch(batch)
    r = eng.search(SearchRequest(query_vector=vecs["k42"], top_k=1))
    assert r.search_result.keys == ["k42"]
    eng.save_checkpoint()
    eng.wal.close()

    eng2 = VectorDBEngine(cfg, data_dir=tmp_data_dir)
    assert eng2.docstore.backend == "native"
    assert eng2.count() == 100
    assert eng2.get("k7").vector_data.metadata == {"i": "7"}


def test_keys_at_bulk_matches_key_at():
    """Bulk reverse lookup (one lock per batch, per-shard list cache) must
    agree with per-row key_at across shard switches, stale slots, and
    out-of-range indices."""
    store = DocStore(backend="python")
    for i in range(50):
        store.put(DocEntry(f"k{i}", i % 3, i // 3, {}, i))
    store.delete("k7")
    shards = [0, 1, 2, 0, 0, 1, 9, 2, 1]
    slots = [0, 0, 0, 16, 999, 2, 0, 1, 2]
    bulk = store.keys_at_bulk(shards, slots)
    assert bulk == [store.key_at(sh, sl) for sh, sl in zip(shards, slots)]
    assert store.keys_at_bulk([], []) == []


@pytest.mark.parametrize("backend", ["python", "native"])
def test_keys_rows_fused_resolution(backend):
    """keys_rows (fused liveness + key resolution over flat row ids — the
    serving fast path, one FFI crossing on the native backend) must agree
    with the two-pass slots_live + key_at decomposition, and its miss
    count must certify all-live exactly."""
    if backend == "native" and not native.available():
        pytest.skip("native library unavailable")
    store = DocStore(backend=backend)
    phys_cap = 64
    for i in range(50):
        store.put(DocEntry(f"k{i}", i % 4, i // 4, {}, i))
    store.delete("k7")

    rows = [0 * phys_cap + 0, 1 * phys_cap + 0, 3 * phys_cap + 2,  # live
            -1,                                   # device pad
            1 * phys_cap + 63,                    # in-range dead slot
            9 * phys_cap + 2]                     # out-of-range shard
    keys, miss = store.keys_rows(rows, phys_cap)
    want = [None if r < 0 else store.key_at(r // phys_cap, r % phys_cap)
            for r in rows]
    assert keys == want
    assert miss == sum(1 for w in want if w is None) == 3

    # all-live certification: miss == 0 iff every row resolves
    live_rows = [(i % 4) * phys_cap + i // 4 for i in range(50) if i != 7]
    keys2, miss2 = store.keys_rows(live_rows, phys_cap)
    assert miss2 == 0 and None not in keys2
    assert keys2 == [f"k{i}" for i in range(50) if i != 7]

    # k7's old slot is unmapped after the delete -> counted missing
    _, miss3 = store.keys_rows([(7 % 4) * phys_cap + 7 // 4], phys_cap)
    assert miss3 == 1


def test_put_rows_bulk_fast_path_semantics(rng):
    """Columnar ingest fast path (put_rows_bulk): entries land with empty
    metadata, overwrites report previous placements for soft-deletes, and
    the fast path refuses when the metadata index is non-empty (an
    overwritten predecessor's metadata must leave the inverted index)."""
    if not native.available():
        pytest.skip("native library unavailable")
    store = DocStore(backend="native")
    res = store.put_rows_bulk([f"k{i}" for i in range(10)], 2, 100)
    assert res is not None
    prev_sh, prev_sl = res
    assert (prev_sh == -1).all()
    e = store.get("k3")
    assert (e.shard, e.slot, e.metadata) == (2, 103, {})
    assert store.key_at(2, 103) == "k3"
    # overwrite: prevs report the old placement
    prev_sh, prev_sl = store.put_rows_bulk(["k3", "k99"], 1, 0)
    assert prev_sh.tolist() == [2, -1] and prev_sl.tolist() == [103, -1]
    assert store.get("k3").shard == 1
    # a metadata-carrying entry disables the fast path
    store.put(DocEntry("meta", 0, 7, {"a": "b"}, 0))
    assert store.put_rows_bulk(["x"], 0, 8) is None


def test_engine_fast_ingest_matches_generic(rng):
    """put_rows fast path (no metadata/WAL/journal) must be observationally
    identical to the generic loop: same docstore state, same staged sets,
    same soft-deletes on overwrite."""
    from tpuvdb.core.config import DBConfig
    from tpuvdb.engine.engine import VectorDBEngine

    vecs = rng.standard_normal((64, 16)).astype(np.float32)
    keys = [f"k{i}" for i in range(64)]
    engines = []
    for backend in ("native", "python"):  # python backend = generic loop
        cfg = DBConfig(vector_dim=16, shard_count=4, shard_capacity=4096,
                       wal_enabled=False, docstore_backend=backend,
                       checkpoint_every_puts=10**9,
                       compact_every_puts=10**9)
        eng = VectorDBEngine(cfg)
        eng.put_rows(keys, vecs)
        eng.put_rows(keys[:10], vecs[:10])  # overwrites
        engines.append(eng)
    a, b = engines
    assert len(a.docstore) == len(b.docstore) == 64
    assert sorted(a._staged_deletes) == sorted(b._staged_deletes)
    assert a._staged_updates == b._staged_updates
    for k in keys:
        ea, eb = a.docstore.get(k), b.docstore.get(k)
        assert (ea.shard, ea.slot, ea.metadata) == (eb.shard, eb.slot,
                                                    eb.metadata)
