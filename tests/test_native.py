"""Native C++ host runtime: WAL writer, KV store, mmap vector file."""

import os
import threading

import numpy as np
import pytest

from tpuvdb import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library failed to build"
)


def test_wal_writer_durability(tmp_path):
    path = str(tmp_path / "wal.bin")
    w = native.NativeWalWriter(path, fsync=True)
    t1 = w.append(b"hello ")
    t2 = w.append(b"world")
    assert w.sync(t2)
    assert open(path, "rb").read() == b"hello world"
    w.close()
    # reopen appends
    w2 = native.NativeWalWriter(path, fsync=False)
    w2.append_sync(b"!")
    w2.close()
    assert open(path, "rb").read() == b"hello world!"


def test_wal_writer_concurrent(tmp_path):
    path = str(tmp_path / "wal.bin")
    w = native.NativeWalWriter(path, fsync=False)
    n_threads, per = 8, 200

    def worker(tid):
        for i in range(per):
            w.append_sync(f"{tid:02d}:{i:04d};".encode())

    threads = [threading.Thread(target=worker, args=(t,)) for t in range(n_threads)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    w.close()
    data = open(path, "rb").read().decode()
    recs = [r for r in data.split(";") if r]
    # no torn/interleaved records, none lost
    assert len(recs) == n_threads * per
    assert len(set(recs)) == n_threads * per
    assert all(len(r) == 7 and r[2] == ":" for r in recs)


def test_kv_store_roundtrip(tmp_path):
    kv = native.NativeKv()
    assert kv.get("missing") is None
    assert not kv.put("a", 1, 100, 1111, b"meta-a")  # new
    assert kv.put("a", 2, 200, 2222, b"meta-a2")     # overwrite
    got = kv.get("a")
    assert got == (2, 200, 2222, b"meta-a2")
    assert len(kv) == 1
    assert kv.delete("a")
    assert not kv.delete("a")
    assert kv.get("a") is None

    # volume + snapshot
    for i in range(5000):
        kv.put(f"key_{i}", i % 7, i, i * 10, f"m{i}".encode())
    assert len(kv) == 5000
    snap = str(tmp_path / "kv.bin")
    assert kv.dump(snap)
    kv2 = native.NativeKv()
    assert kv2.load(snap)
    assert len(kv2) == 5000
    assert kv2.get("key_4321") == (4321 % 7, 4321, 43210, b"m4321")
    kv.close()
    kv2.close()


def test_kv_tombstone_reuse():
    kv = native.NativeKv()
    for i in range(1000):
        kv.put(f"k{i}", 0, i, 0)
    for i in range(0, 1000, 2):
        kv.delete(f"k{i}")
    for i in range(0, 1000, 2):
        kv.put(f"k{i}", 0, i + 1, 0)
    assert len(kv) == 1000
    assert kv.get("k10")[1] == 11
    assert kv.get("k11")[1] == 11
    kv.close()


def test_vector_file(tmp_path):
    path = str(tmp_path / "vecs.bin")
    dim = 16
    vf = native.NativeVectorFile(path, rows=100, row_bytes=dim * 4)
    arr = vf.as_array(np.float32, dim)
    data = np.arange(dim, dtype=np.float32)
    vf.write(42, data.tobytes()) if hasattr(vf, "write") else None
    arr[42] = data
    arr[7] = data * 2
    assert vf.flush()
    vf.close()
    # persisted across reopen
    vf2 = native.NativeVectorFile(path, rows=100, row_bytes=dim * 4)
    arr2 = vf2.as_array(np.float32, dim)
    np.testing.assert_array_equal(arr2[42], data)
    np.testing.assert_array_equal(arr2[7], data * 2)
    vf2.close()
