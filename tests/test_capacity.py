"""Capacity-mode tests: int8 + mmap shard mirrors, zero-copy/hardlink
checkpoints, streaming device builds, and the native docstore snapshot.

These are the engine-side guarantees behind running the kernel-proven
8M x 768 int8 corpus on one chip with bounded host RSS (VERDICT r2 #1):
rows live in disk-backed int8 files, checkpoints hardlink them instead of
copying, and device builds stream blocks instead of stacking a full host
copy. Scaled down here; scripts/bench_capacity.py exercises the full size.
"""

import os

import numpy as np
import pytest

from tpuvdb.core.config import DBConfig
from tpuvdb.core.types import VectorData
from tpuvdb.engine.engine import VectorDBEngine

DIM = 32


def cfg(**kw):
    base = dict(vector_dim=DIM, shard_count=2, shard_capacity=4096,
                mirror_init_cap=256, block_size=128, flush_batch=64,
                checkpoint_every_puts=10 ** 9,
                compact_every_puts=10 ** 9, wal_fsync=False,
                search_mode="exact")
    base.update(kw)
    return DBConfig(**base)


def fill(eng, rng, n, prefix="k"):
    batch = [VectorData(key=f"{prefix}{i}",
                        vector=rng.standard_normal(DIM).astype(np.float32),
                        metadata={}, timestamp=i)
             for i in range(n)]
    r = eng.put_batch(batch)
    assert r.success, r.message
    return batch


def oracle_top1(batch, q):
    mat = np.stack([np.asarray(b.vector, np.float32) for b in batch])
    d = ((mat - q) ** 2).sum(1)
    return batch[int(np.argmin(d))].key


# ----------------------------------------------------------- int8 mirrors


def test_int8_mirror_roundtrip_and_search(rng, tmp_data_dir):
    eng = VectorDBEngine(cfg(mirror_dtype="int8", storage_dtype="int8",
                             mirror_backend="ram"))
    batch = fill(eng, rng, 300)
    # get() returns the dequantized row (capacity-mode semantic): close to
    # the original within int8 quantization error
    r = eng.get("k7")
    assert r.success
    got = np.asarray(r.vector_data.vector, np.float32)
    orig = np.asarray(batch[7].vector, np.float32)
    assert np.abs(got - orig).max() <= np.abs(orig).max() / 127.0 + 1e-6
    q = rng.standard_normal(DIM).astype(np.float32)
    hits = eng.search_hits(q, 5)
    assert len(hits) == 5
    assert hits[0].key == oracle_top1(batch, q)


def test_int8_mirror_host_bytes_quartered(rng):
    e8 = VectorDBEngine(cfg(mirror_dtype="int8", storage_dtype="int8"))
    e32 = VectorDBEngine(cfg())
    fill(e8, rng, 300)
    fill(e32, rng, 300)
    b8 = e8.host_bytes()["mirror_ram"]
    b32 = e32.host_bytes()["mirror_ram"]
    # int8 rows are dim + 8 bytes/row vs f32's 4*dim + 4: ~3.6x at dim=32
    assert b8 < b32 * 0.4


# ------------------------------------------------------------ mmap mirrors


def test_mmap_mirror_engine_end_to_end(rng, tmp_data_dir):
    eng = VectorDBEngine(cfg(mirror_backend="mmap", mirror_dtype="int8",
                             storage_dtype="int8"),
                         data_dir=tmp_data_dir)
    batch = fill(eng, rng, 500)
    assert eng.host_bytes()["mirror_ram"] == 0  # rows live in mapped files
    mdir = os.path.join(tmp_data_dir, "mirrors")
    assert any(f.endswith(".vec") for f in os.listdir(mdir))
    q = rng.standard_normal(DIM).astype(np.float32)
    hits = eng.search_hits(q, 5)
    assert hits[0].key == oracle_top1(batch, q)
    eng.close()


def test_mmap_checkpoint_hardlinks_and_recovery(rng, tmp_data_dir):
    c = cfg(mirror_backend="mmap", mirror_dtype="int8",
            storage_dtype="int8")
    eng = VectorDBEngine(c, data_dir=tmp_data_dir)
    batch = fill(eng, rng, 400)
    path = eng.save_checkpoint()
    # rows after the checkpoint land in the WAL tail only
    tail = [VectorData(key="tail0",
                       vector=rng.standard_normal(DIM).astype(np.float32),
                       metadata={}, timestamp=999)]
    eng.put_batch(tail)
    eng.delete("k3")
    # the checkpointed vector file is a HARDLINK of the live one (zero-copy
    # snapshot), not an npz copy
    vec_links = [f for f in os.listdir(path) if f.endswith(".vec")]
    assert len(vec_links) == c.shard_count
    assert os.stat(os.path.join(path, vec_links[0])).st_nlink >= 2
    eng.wal.close()  # simulate crash without the exit checkpoint

    eng2 = VectorDBEngine(c, data_dir=tmp_data_dir)
    assert eng2.count() == 400  # 400 + tail - k3
    assert eng2.get("tail0").success
    assert not eng2.get("k3").success
    q = rng.standard_normal(DIM).astype(np.float32)
    live = [b for b in batch if b.key != "k3"] + tail
    assert eng2.search_hits(q, 3)[0].key == oracle_top1(live, q)
    eng2.close()


def test_mmap_compact_unlinks_old_generation(rng, tmp_data_dir):
    eng = VectorDBEngine(cfg(mirror_backend="mmap"), data_dir=tmp_data_dir)
    fill(eng, rng, 200)
    mdir = os.path.join(tmp_data_dir, "mirrors")
    before = set(os.listdir(mdir))
    for i in range(50):
        eng.delete(f"k{i}")
    eng.compact()
    after = set(os.listdir(mdir))
    assert before.isdisjoint(after)  # a fresh generation replaced the old
    assert eng.count() == 150
    r = eng.get("k160")
    assert r.success
    eng.close()


@pytest.mark.parametrize("src,dst", [("float32", "int8"),
                                     ("int8", "float32")])
def test_cross_dtype_checkpoint_restore(rng, tmp_data_dir, src, dst):
    eng = VectorDBEngine(cfg(mirror_dtype=src), data_dir=tmp_data_dir)
    batch = fill(eng, rng, 120)
    eng.close()  # exit checkpoint
    eng2 = VectorDBEngine(cfg(mirror_dtype=dst), data_dir=tmp_data_dir)
    assert eng2.count() == 120
    got = np.asarray(eng2.get("k5").vector_data.vector, np.float32)
    orig = np.asarray(batch[5].vector, np.float32)
    assert np.abs(got - orig).max() <= np.abs(orig).max() / 127.0 + 1e-6
    eng2.close()


def test_v1_checkpoint_still_restores(rng, tmp_data_dir):
    """Round-2 checkpoints (f32 vectors+valid npz, no fmt key) load."""
    eng = VectorDBEngine(cfg(), data_dir=tmp_data_dir)
    batch = fill(eng, rng, 60)
    eng.close()
    # rewrite the newest checkpoint's shards in the old format
    ck = eng.ckpts.latest()
    for i in range(2):
        p = os.path.join(ck, f"shard_{i}.npz")
        z = np.load(p, allow_pickle=False)
        n = int(z["n"])
        np.savez(p, vectors=np.asarray(z["vectors"], np.float32),
                 valid=z["valid"], next_slot=np.int64(n),
                 deleted=z["deleted"])
    eng2 = VectorDBEngine(cfg(), data_dir=tmp_data_dir)
    assert eng2.count() == 60
    q = rng.standard_normal(DIM).astype(np.float32)
    assert eng2.search_hits(q, 1)[0].key == oracle_top1(batch, q)
    eng2.close()


# --------------------------------------------------------- streaming build


@pytest.mark.parametrize("mirror_dtype,storage", [
    ("float32", "float32"), ("float32", "int8"),
    ("int8", "int8"), ("int8", "float32")])
def test_streaming_build_matches_stack(rng, mirror_dtype, storage):
    import jax.numpy as jnp

    from tpuvdb.index.exact import DeviceExactIndex
    from tpuvdb.index.layout import ShardMirror

    dt = {"float32": jnp.float32, "int8": jnp.int8}[storage]
    mirrors = [ShardMirror(DIM, 4096, init_cap=256, block=128,
                           dtype=mirror_dtype) for _ in range(2)]
    for m in mirrors:
        n = int(rng.integers(150, 250))
        first = m.alloc(n)
        m.write_batch(first, rng.standard_normal((n, DIM)).astype(np.float32))
        m.mark_deleted(3)
    a = DeviceExactIndex.build(mirrors, dtype=dt, block_size=128,
                               search_mode="exact", stream=False)
    b = DeviceExactIndex.build(mirrors, dtype=dt, block_size=128,
                               search_mode="exact", stream=True)
    q = rng.standard_normal((4, DIM)).astype(np.float32)
    da, ra = a.search(q, 10)
    db, rb = b.search(q, 10)
    np.testing.assert_array_equal(ra, rb)
    np.testing.assert_allclose(da, db, rtol=1e-5, atol=1e-5)


def test_streaming_build_multiblock(rng):
    """Force multiple stream blocks (block < total rows) via monkeypatched
    block size and check row-level parity with the stacked build."""
    import jax.numpy as jnp

    from tpuvdb.index import exact as ex
    from tpuvdb.index.layout import ShardMirror

    mirrors = [ShardMirror(DIM, 4096, init_cap=1024, block=128,
                           dtype="int8") for _ in range(2)]
    for m in mirrors:
        first = m.alloc(900)
        m.write_batch(first, rng.standard_normal((900, DIM)).astype(np.float32))
    old = ex.DeviceExactIndex._STREAM_BLOCK_ROWS
    ex.DeviceExactIndex._STREAM_BLOCK_ROWS = 256  # 1024-row shards -> 8 blocks
    try:
        b = ex.DeviceExactIndex.build(mirrors, dtype=jnp.int8,
                                      block_size=128, search_mode="exact",
                                      stream=True)
    finally:
        ex.DeviceExactIndex._STREAM_BLOCK_ROWS = old
    a = ex.DeviceExactIndex.build(mirrors, dtype=jnp.int8, block_size=128,
                                  search_mode="exact", stream=False)
    np.testing.assert_array_equal(np.asarray(a.valid), np.asarray(b.valid))
    np.testing.assert_array_equal(np.asarray(a.vectors),
                                  np.asarray(b.vectors))
    np.testing.assert_allclose(np.asarray(a.sqnorms), np.asarray(b.sqnorms),
                               rtol=1e-5)


# ------------------------------------------------------- native docstore IO


def test_native_docstore_snapshot_roundtrip(tmp_path):
    from tpuvdb.store.kv import DocEntry, DocStore

    store = DocStore(backend="auto")
    for i in range(200):
        store.put(DocEntry(key=f"k{i}", shard=i % 4, slot=i // 4,
                           metadata={"tag": str(i % 3)}, timestamp=i))
    p = str(tmp_path / "doc.kv")
    if store.backend == "native":
        store.dump_native(p)
    else:
        pytest.skip("native library unavailable")
    back = DocStore.load_native_file(p, backend="native")
    assert len(back) == 200
    e = back.get("k13")
    assert (e.shard, e.slot, e.metadata) == (13 % 4, 13 // 4, {"tag": "1"})
    assert back.key_at(1, 3) == "k13"
    assert back.find_by_metadata({"tag": "1"}) is not None
    # python fallback reader parses the same binary format
    pyback = DocStore.load_native_file(p, backend="python")
    assert len(pyback) == 200
    assert pyback.get("k13").metadata == {"tag": "1"}


def test_engine_checkpoint_native_docstore(rng, tmp_data_dir):
    from tpuvdb import native

    if not native.available():
        pytest.skip("native library unavailable")
    c = cfg(docstore_backend="native")
    eng = VectorDBEngine(c, data_dir=tmp_data_dir)
    batch = fill(eng, rng, 150)
    eng.close()
    ck = VectorDBEngine(c, data_dir=tmp_data_dir)
    assert ck.count() == 150
    assert ck.docstore.backend == "native"
    q = rng.standard_normal(DIM).astype(np.float32)
    assert ck.search_hits(q, 1)[0].key == oracle_top1(batch, q)
    ck.close()
