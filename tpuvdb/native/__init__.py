"""ctypes bindings for the native host runtime (see src/tpuvdb_native.cpp).

Builds the shared library on first use with g++ (no pybind11 in this
environment; plain C ABI + ctypes). Everything degrades gracefully: callers
check `available()` and fall back to the pure-Python paths.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "src", "tpuvdb_native.cpp")
_BUILD_DIR = os.path.join(_HERE, "build")
_SO = os.path.join(_BUILD_DIR, "libtpuvdb_native.so")

_lib = None
_lib_lock = threading.Lock()
_build_failed = False


def _build() -> Optional[str]:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    # -O3: the rescore kernels need the vectorizer's full cost model
    # (int8->f32 widening dot); ISA selection stays runtime-safe via
    # target_clones in the source, so no -march here — the .so is built
    # per machine but may be reached over NFS by another
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
           _SRC, "-o", _SO + ".tmp"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(_SO + ".tmp", _SO)
        return _SO
    except (subprocess.SubprocessError, OSError):
        return None


def _load():
    global _lib, _build_failed
    with _lib_lock:
        if _lib is not None or _build_failed:
            return _lib
        so = _build()
        if so is None:
            _build_failed = True
            return None
        lib = ctypes.CDLL(so)
        c = ctypes
        lib.wal_open.restype = c.c_void_p
        lib.wal_open.argtypes = [c.c_char_p, c.c_int]
        lib.wal_append.restype = c.c_uint64
        lib.wal_append.argtypes = [c.c_void_p, c.c_char_p, c.c_uint64]
        lib.wal_sync.restype = c.c_int
        lib.wal_sync.argtypes = [c.c_void_p, c.c_uint64]
        lib.wal_durable.restype = c.c_uint64
        lib.wal_durable.argtypes = [c.c_void_p]
        lib.wal_close.argtypes = [c.c_void_p]

        lib.kv_create.restype = c.c_void_p
        lib.kv_destroy.argtypes = [c.c_void_p]
        lib.kv_put.restype = c.c_int
        lib.kv_put.argtypes = [c.c_void_p, c.c_char_p, c.c_uint32, c.c_int32,
                               c.c_int64, c.c_int64, c.c_char_p, c.c_uint32]
        lib.kv_get.restype = c.c_int
        lib.kv_get.argtypes = [c.c_void_p, c.c_char_p, c.c_uint32,
                               c.POINTER(c.c_int32), c.POINTER(c.c_int64),
                               c.POINTER(c.c_int64), c.c_char_p, c.c_uint32,
                               c.POINTER(c.c_uint32)]
        lib.kv_del.restype = c.c_int
        lib.kv_del.argtypes = [c.c_void_p, c.c_char_p, c.c_uint32]
        lib.kv_size.restype = c.c_uint64
        lib.kv_size.argtypes = [c.c_void_p]
        lib.kv_next.restype = c.c_int
        lib.kv_next.argtypes = [c.c_void_p, c.POINTER(c.c_uint64), c.c_char_p,
                                c.c_uint32, c.POINTER(c.c_uint32),
                                c.POINTER(c.c_int32), c.POINTER(c.c_int64),
                                c.POINTER(c.c_int64), c.c_char_p, c.c_uint32,
                                c.POINTER(c.c_uint32)]
        lib.kv_dump.restype = c.c_int
        lib.kv_dump.argtypes = [c.c_void_p, c.c_char_p]
        if hasattr(lib, "kv_dump_mem"):  # stale .so tolerance
            lib.kv_dump_mem.restype = c.c_int
            lib.kv_dump_mem.argtypes = [
                c.c_void_p, c.POINTER(c.POINTER(c.c_uint8)),
                c.POINTER(c.c_uint64)]
            lib.kv_buf_free.restype = None
            lib.kv_buf_free.argtypes = [c.POINTER(c.c_uint8)]
        lib.kv_load.restype = c.c_int
        lib.kv_load.argtypes = [c.c_void_p, c.c_char_p]
        lib.kv_put_many.restype = c.c_int
        lib.kv_put_many.argtypes = [
            c.c_void_p, c.c_char_p, c.POINTER(c.c_uint32),
            c.POINTER(c.c_int32), c.POINTER(c.c_int64),
            c.POINTER(c.c_int64), c.c_char_p, c.POINTER(c.c_uint32),
            c.c_uint64, c.POINTER(c.c_int32), c.POINTER(c.c_int64)]
        lib.kv_nonempty_vals.restype = c.c_uint64
        lib.kv_nonempty_vals.argtypes = [c.c_void_p]
        lib.kv_key_at.restype = c.c_int
        lib.kv_key_at.argtypes = [c.c_void_p, c.c_int32, c.c_int64,
                                  c.c_char_p, c.c_uint32,
                                  c.POINTER(c.c_uint32)]
        lib.kv_slots_live.restype = c.c_int
        lib.kv_slots_live.argtypes = [c.c_void_p, c.POINTER(c.c_int32),
                                      c.POINTER(c.c_int64), c.c_uint64,
                                      c.c_char_p]
        lib.kv_keys_at.restype = c.c_int
        lib.kv_keys_at.argtypes = [c.c_void_p, c.POINTER(c.c_int32),
                                   c.POINTER(c.c_int64), c.c_uint64,
                                   c.c_char_p, c.c_uint64,
                                   c.POINTER(c.c_uint32)]
        if hasattr(lib, "kv_rows_keys"):  # stale .so tolerance
            lib.kv_rows_keys.restype = c.c_int
            lib.kv_rows_keys.argtypes = [
                c.c_void_p, c.POINTER(c.c_int64), c.c_uint64, c.c_int64,
                c.c_char_p, c.c_uint64, c.POINTER(c.c_uint32),
                c.POINTER(c.c_uint32)]
        if hasattr(lib, "kv_export_entries"):  # stale .so tolerance
            lib.kv_export_sizes.restype = c.c_int
            lib.kv_export_sizes.argtypes = [
                c.c_void_p, c.POINTER(c.c_uint64), c.POINTER(c.c_uint64),
                c.POINTER(c.c_uint64)]
            lib.kv_export_entries.restype = c.c_int
            lib.kv_export_entries.argtypes = [
                c.c_void_p, c.c_char_p, c.c_uint64, c.POINTER(c.c_uint32),
                c.POINTER(c.c_int32), c.POINTER(c.c_int64),
                c.POINTER(c.c_int64), c.c_char_p, c.c_uint64,
                c.POINTER(c.c_uint32), c.c_uint64, c.POINTER(c.c_uint64)]

        if hasattr(lib, "rescore2_rows_int8"):  # stale .so tolerance
            f32p = c.POINTER(c.c_float)
            i64p = c.POINTER(c.c_int64)
            lib.rescore2_rows_int8.restype = None
            lib.rescore2_rows_int8.argtypes = [
                f32p, f32p, c.c_int64, c.c_int64, c.c_int64, c.c_int64,
                c.POINTER(c.c_int8), f32p, f32p, i64p, i64p, c.c_int64,
                f32p]
            lib.rescore2_rows_f32.restype = None
            lib.rescore2_rows_f32.argtypes = [
                f32p, f32p, c.c_int64, c.c_int64, c.c_int64, c.c_int64,
                f32p, f32p, i64p, i64p, c.c_int64, f32p]

        lib.vf_open.restype = c.c_void_p
        lib.vf_open.argtypes = [c.c_char_p, c.c_uint64, c.c_uint64]
        lib.vf_data.restype = c.POINTER(c.c_uint8)
        lib.vf_data.argtypes = [c.c_void_p]
        lib.vf_write.restype = c.c_int
        lib.vf_write.argtypes = [c.c_void_p, c.c_uint64, c.c_char_p]
        lib.vf_read.restype = c.c_int
        lib.vf_read.argtypes = [c.c_void_p, c.c_uint64, c.c_char_p]
        lib.vf_flush.restype = c.c_int
        lib.vf_flush.argtypes = [c.c_void_p]
        lib.vf_close.argtypes = [c.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def rescore_available() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "rescore2_rows_int8")


def rescore_rows(q, qsq, fetch_w, vec, scale, sq, slots, opos, out):
    """Fused exact-rescore epilogue (see src rescore_rows_*): writes
    qsq[qi] - 2*scale*(q[qi].vec[slot]) + sq[slot] into out[opos] for each
    candidate, streaming int8/f32 mirror rows through registers once
    instead of materializing a (n, d) f32 gather. `vec` is the mirror's
    backing array (int8 quantized or f32); `scale` is None for f32.
    Caller guarantees: q/qsq/sq/out f32 C-contiguous, slots/opos int64,
    out pre-filled with the missing-candidate sentinel."""
    import numpy as np

    lib = _load()
    c = ctypes
    f32p = c.POINTER(c.c_float)
    i64p = c.POINTER(c.c_int64)
    n = len(slots)
    if n == 0:
        return
    slots_a = np.ascontiguousarray(slots, np.int64)
    opos_a = np.ascontiguousarray(opos, np.int64)
    # the C kernels read raw pointers with no stride/dtype information:
    # a strided view or float64 array passed by a future caller would be
    # silent garbage (or OOB reads). Turn pointer misuse into a loud
    # error; ascontiguousarray is a no-op for the engine's call site,
    # which already builds these contiguous (advisor r4).
    q = np.ascontiguousarray(q, np.float32)
    qsq = np.ascontiguousarray(qsq, np.float32)
    sq = np.ascontiguousarray(sq, np.float32)
    out_ok = (isinstance(out, np.ndarray) and out.dtype == np.float32
              and out.flags.c_contiguous)
    if not out_ok:
        raise ValueError("rescore_rows: out must be f32 C-contiguous "
                         "(written in place)")
    if not (isinstance(vec, np.ndarray) and vec.flags.c_contiguous):
        raise ValueError("rescore_rows: vec must be C-contiguous")
    if scale is not None:
        if vec.dtype != np.int8:
            raise ValueError("rescore_rows: int8 path needs int8 vec")
        scale = np.ascontiguousarray(scale, np.float32)
    elif vec.dtype != np.float32:
        raise ValueError("rescore_rows: f32 path needs f32 vec")
    n_rows = vec.shape[0]
    out_n = out.size
    if scale is not None:
        lib.rescore2_rows_int8(
            q.ctypes.data_as(f32p), qsq.ctypes.data_as(f32p),
            q.shape[1], fetch_w, n_rows, out_n,
            vec.ctypes.data_as(c.POINTER(c.c_int8)),
            scale.ctypes.data_as(f32p), sq.ctypes.data_as(f32p),
            slots_a.ctypes.data_as(i64p), opos_a.ctypes.data_as(i64p),
            n, out.ctypes.data_as(f32p))
    else:
        lib.rescore2_rows_f32(
            q.ctypes.data_as(f32p), qsq.ctypes.data_as(f32p),
            q.shape[1], fetch_w, n_rows, out_n,
            vec.ctypes.data_as(f32p),
            sq.ctypes.data_as(f32p),
            slots_a.ctypes.data_as(i64p), opos_a.ctypes.data_as(i64p),
            n, out.ctypes.data_as(f32p))


_fastlist = None
_fastlist_tried = False
_FASTLIST_SRC = os.path.join(_HERE, "src", "fastlist.c")


def _load_fastlist():
    """CPython extension with C-speed list builders (src/fastlist.c):
    built lazily like the main .so, loaded as a real extension module.
    Returns None (pure-python fallback) on any failure."""
    global _fastlist, _fastlist_tried
    with _lib_lock:
        if _fastlist_tried:
            return _fastlist
        _fastlist_tried = True
        import sysconfig

        so = os.path.join(_BUILD_DIR, "tpuvdb_fastlist.so")
        try:
            os.makedirs(_BUILD_DIR, exist_ok=True)
            if (not os.path.exists(so)
                    or os.path.getmtime(so) < os.path.getmtime(_FASTLIST_SRC)):
                cmd = ["gcc", "-O2", "-shared", "-fPIC",
                       "-I", sysconfig.get_path("include"),
                       _FASTLIST_SRC, "-o", so + ".tmp"]
                subprocess.run(cmd, check=True, capture_output=True,
                               timeout=120)
                os.replace(so + ".tmp", so)
            import importlib.machinery
            import importlib.util

            loader = importlib.machinery.ExtensionFileLoader(
                "tpuvdb_fastlist", so)
            spec = importlib.util.spec_from_file_location(
                "tpuvdb_fastlist", so, loader=loader)
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
            _fastlist = mod
        except (subprocess.SubprocessError, OSError, ImportError):
            _fastlist = None
        return _fastlist


class NativeWalWriter:
    """Group-commit append file: many threads append, one C++ thread
    writes+fsyncs, producers block only until THEIR ticket is durable."""

    def __init__(self, path: str, fsync: bool = True):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._h = lib.wal_open(path.encode(), 1 if fsync else 0)
        if not self._h:
            raise OSError(f"wal_open failed: {path}")

    def append(self, data: bytes) -> int:
        return self._lib.wal_append(self._h, data, len(data))

    def sync(self, ticket: int) -> bool:
        """Block until `ticket` is durable. Raises OSError on a persistent
        writer IO failure (e.g. ENOSPC) instead of wedging the caller."""
        if not self._lib.wal_sync(self._h, ticket):
            raise OSError(
                "native WAL writer failed (disk full or IO error); "
                f"ticket {ticket} will never become durable")
        return True

    def append_sync(self, data: bytes) -> None:
        self.sync(self.append(data))

    def close(self):
        if self._h:
            self._lib.wal_close(self._h)
            self._h = None


class NativeKv:
    """String key -> (shard, slot, ts, value-blob) map in C++."""

    _VAL_CAP = 1 << 20

    def __init__(self):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._h = lib.kv_create()
        self._buf = ctypes.create_string_buffer(self._VAL_CAP)

    def put(self, key: str, shard: int, slot: int, ts: int, value: bytes = b"") -> bool:
        k = key.encode()
        return bool(self._lib.kv_put(self._h, k, len(k), shard, slot, ts,
                                     value, len(value)))

    def get(self, key: str) -> Optional[Tuple[int, int, int, bytes]]:
        k = key.encode()
        shard = ctypes.c_int32()
        slot = ctypes.c_int64()
        ts = ctypes.c_int64()
        vlen = ctypes.c_uint32()
        ok = self._lib.kv_get(self._h, k, len(k), ctypes.byref(shard),
                              ctypes.byref(slot), ctypes.byref(ts), self._buf,
                              len(self._buf), ctypes.byref(vlen))
        if ok == 2:  # value larger than the scratch buffer: grow and retry
            self._buf = ctypes.create_string_buffer(
                max(vlen.value, 2 * len(self._buf)))
            ok = self._lib.kv_get(self._h, k, len(k), ctypes.byref(shard),
                                  ctypes.byref(slot), ctypes.byref(ts),
                                  self._buf, len(self._buf),
                                  ctypes.byref(vlen))
        if ok != 1:
            return None
        return (shard.value, slot.value, ts.value,
                ctypes.string_at(self._buf, vlen.value))

    def put_many(self, keys, shards, slots, tss, values=None, raw=False):
        """Bulk insert: ONE FFI crossing for the whole batch (the per-key
        ctypes round trip dominated bulk ingest). Returns a list of
        (prev_shard, prev_slot) per key, (-1, -1) = new key — or, with
        raw=True, the two numpy arrays directly (the columnar ingest path
        skips the n-tuple materialization). values=None = all-empty."""
        import numpy as np

        n = len(keys)
        kbs = [k.encode() for k in keys]
        keys_blob = b"".join(kbs)
        key_lens = np.fromiter((len(b) for b in kbs), np.uint32, n)
        if values is None:
            vals_blob = b""
            val_lens = np.zeros(n, np.uint32)
        else:
            vals_blob = b"".join(values)
            val_lens = np.fromiter((len(v) for v in values), np.uint32, n)
        shards_a = np.asarray(shards, np.int32)
        slots_a = np.asarray(slots, np.int64)
        tss_a = np.asarray(tss, np.int64)
        prev_sh = np.empty(n, np.int32)
        prev_sl = np.empty(n, np.int64)
        c = ctypes
        u32p = c.POINTER(c.c_uint32)
        self._lib.kv_put_many(
            self._h, keys_blob, key_lens.ctypes.data_as(u32p),
            shards_a.ctypes.data_as(c.POINTER(c.c_int32)),
            slots_a.ctypes.data_as(c.POINTER(c.c_int64)),
            tss_a.ctypes.data_as(c.POINTER(c.c_int64)),
            vals_blob, val_lens.ctypes.data_as(u32p), n,
            prev_sh.ctypes.data_as(c.POINTER(c.c_int32)),
            prev_sl.ctypes.data_as(c.POINTER(c.c_int64)))
        if raw:
            return prev_sh, prev_sl
        return list(zip(prev_sh.tolist(), prev_sl.tolist()))

    def key_at(self, shard: int, slot: int) -> Optional[str]:
        klen = ctypes.c_uint32()
        buf = ctypes.create_string_buffer(4096)
        ok = self._lib.kv_key_at(self._h, shard, slot, buf, len(buf),
                                 ctypes.byref(klen))
        if ok == 2:
            buf = ctypes.create_string_buffer(klen.value)
            ok = self._lib.kv_key_at(self._h, shard, slot, buf, len(buf),
                                     ctypes.byref(klen))
        if ok != 1:
            return None
        return ctypes.string_at(buf, klen.value).decode()

    def slots_live(self, shards, slots):
        """Bool liveness per (shard, slot) — one FFI crossing, NO string
        materialization. The search path compacts dead/padded candidates
        on this before resolving any keys."""
        import numpy as np

        shards_a = np.ascontiguousarray(shards, np.int32)
        slots_a = np.ascontiguousarray(slots, np.int64)
        n = len(shards_a)
        out = np.empty(n, np.uint8)
        c = ctypes
        self._lib.kv_slots_live(
            self._h, shards_a.ctypes.data_as(c.POINTER(c.c_int32)),
            slots_a.ctypes.data_as(c.POINTER(c.c_int64)), n,
            out.ctypes.data_as(c.c_char_p))
        return out.astype(bool)

    def keys_at(self, shards, slots) -> list:
        """Bulk (shard, slot) -> key, one FFI crossing; None = unmapped.
        ASCII key blobs decode once and slice (≈5x cheaper than a per-key
        bytes.decode at serving batch sizes); non-ASCII keys fall back to
        per-key decoding. NOT thread-safe with itself (scratch buffer) —
        all callers hold the DocStore lock."""
        import numpy as np

        shards_a = np.ascontiguousarray(shards, np.int32)
        slots_a = np.ascontiguousarray(slots, np.int64)
        n = len(shards_a)
        lens = np.empty(n, np.uint32)
        c = ctypes
        out = getattr(self, "_keys_buf", None)
        if out is None or len(out) < max(64 * n, 4096):
            out = ctypes.create_string_buffer(max(64 * n, 8192))
            self._keys_buf = out
        while True:
            ok = self._lib.kv_keys_at(
                self._h, shards_a.ctypes.data_as(c.POINTER(c.c_int32)),
                slots_a.ctypes.data_as(c.POINTER(c.c_int64)), n,
                out, len(out), lens.ctypes.data_as(c.POINTER(c.c_uint32)))
            if ok:
                break
            out = ctypes.create_string_buffer(len(out) * 4)
            self._keys_buf = out
        fl = _load_fastlist()
        if fl is not None:
            # C-speed list build (~60 ns/key vs ~0.5 us for the python
            # slicing below): `out` and `lens` stay alive as locals for
            # the duration of the call, which is the module's contract
            return fl.keys_from_buffer(ctypes.addressof(out),
                                       lens.ctypes.data, n)
        lens_l = lens.tolist()
        total = int(lens.sum())
        blob = ctypes.string_at(out, total)
        res: list = []
        off = 0
        if blob.isascii():
            s = blob.decode()  # one C-speed pass; byte offset == char offset
            for ln in lens_l:
                if ln == 0:
                    res.append(None)
                else:
                    res.append(s[off : off + ln])
                    off += ln
        else:
            for ln in lens_l:
                if ln == 0:
                    res.append(None)
                else:
                    res.append(blob[off : off + ln].decode())
                    off += ln
        return res

    def rows_keys(self, rows, phys_cap: int, row: int = 0):
        """Fused liveness + key resolution for FLAT global row ids (the
        serving fast path): one FFI crossing decomposes shard/slot in C
        with prefetch and returns (keys, n_missing). Negative rows
        resolve to None. With row > 0 the keys come back as len(rows)/row
        row-sized inner lists (the engine's per-query shape) built in C.
        Requires a fresh .so (kv_rows_keys); callers check for None and
        fall back to slots_live + keys_at. NOT thread-safe with itself
        (scratch buffer) — callers hold the DocStore lock."""
        if not hasattr(self._lib, "kv_rows_keys"):
            return None
        import numpy as np

        rows_a = np.ascontiguousarray(rows, np.int64)
        n = len(rows_a)
        lens = np.empty(n, np.uint32)
        miss = ctypes.c_uint32(0)
        c = ctypes
        out = getattr(self, "_keys_buf", None)
        if out is None or len(out) < max(64 * n, 4096):
            out = ctypes.create_string_buffer(max(64 * n, 8192))
            self._keys_buf = out
        while True:
            ok = self._lib.kv_rows_keys(
                self._h, rows_a.ctypes.data_as(c.POINTER(c.c_int64)), n,
                phys_cap, out, len(out),
                lens.ctypes.data_as(c.POINTER(c.c_uint32)),
                ctypes.byref(miss))
            if ok:
                break
            out = ctypes.create_string_buffer(len(out) * 4)
            self._keys_buf = out
        fl = _load_fastlist()
        if fl is not None:
            if row > 0 and n % row == 0 and hasattr(
                    fl, "keys_from_buffer_rows"):
                keys = fl.keys_from_buffer_rows(
                    ctypes.addressof(out), lens.ctypes.data, n, row)
            else:
                keys = fl.keys_from_buffer(ctypes.addressof(out),
                                           lens.ctypes.data, n)
                if row > 0 and n % row == 0:
                    keys = [keys[i:i + row] for i in range(0, n, row)]
        else:
            keys = []
            off = 0
            blob = ctypes.string_at(out, int(lens.sum()))
            for ln in lens.tolist():
                keys.append(blob[off:off + ln].decode() if ln else None)
                off += ln
            if row > 0 and n % row == 0:
                keys = [keys[i:i + row] for i in range(0, n, row)]
        return keys, int(miss.value)

    def export_packed(self):
        """Columnar snapshot of every live entry in ONE FFI crossing
        (memcpy speed — taken under the engine lock by compaction, where
        the per-item `items()` cursor cost ~40 s/M keys of serving stall).
        Returns raw packed buffers {keys_blob, key_lens, shards, slots,
        tss, vals_blob, val_lens} (keys decode lazily OFF-lock via
        DocStore.snapshot_columns, or never — put_packed reinserts the
        blobs verbatim) or None on a stale .so."""
        if not hasattr(self._lib, "kv_export_entries"):
            return None
        import numpy as np

        c = ctypes
        n = c.c_uint64()
        kb = c.c_uint64()
        vb = c.c_uint64()
        self._lib.kv_export_sizes(self._h, c.byref(n), c.byref(kb),
                                  c.byref(vb))
        while True:
            cap_n = n.value
            keys_buf = ctypes.create_string_buffer(max(int(kb.value), 1))
            vals_buf = ctypes.create_string_buffer(max(int(vb.value), 1))
            key_lens = np.empty(max(cap_n, 1), np.uint32)
            val_lens = np.empty(max(cap_n, 1), np.uint32)
            shards = np.empty(max(cap_n, 1), np.int32)
            slots = np.empty(max(cap_n, 1), np.int64)
            tss = np.empty(max(cap_n, 1), np.int64)
            n_out = c.c_uint64()
            ok = self._lib.kv_export_entries(
                self._h, keys_buf, len(keys_buf),
                key_lens.ctypes.data_as(c.POINTER(c.c_uint32)),
                shards.ctypes.data_as(c.POINTER(c.c_int32)),
                slots.ctypes.data_as(c.POINTER(c.c_int64)),
                tss.ctypes.data_as(c.POINTER(c.c_int64)),
                vals_buf, len(vals_buf),
                val_lens.ctypes.data_as(c.POINTER(c.c_uint32)),
                cap_n, c.byref(n_out))
            if ok:
                break
            # raced with concurrent growth: re-size and retry
            self._lib.kv_export_sizes(self._h, c.byref(n), c.byref(kb),
                                      c.byref(vb))
        m = int(n_out.value)
        return {
            "keys_blob": ctypes.string_at(keys_buf,
                                          int(key_lens[:m].sum())),
            "key_lens": key_lens[:m],
            "shards": shards[:m],
            "slots": slots[:m],
            "tss": tss[:m],
            "vals_blob": ctypes.string_at(vals_buf,
                                          int(val_lens[:m].sum())),
            "val_lens": val_lens[:m],
        }

    @staticmethod
    def decode_keys(keys_blob: bytes, key_lens) -> list:
        """list[str] from a packed key blob (C-speed via fastlist)."""
        n = len(key_lens)
        fl = _load_fastlist()
        if fl is not None:
            buf = ctypes.create_string_buffer(keys_blob, len(keys_blob))
            import numpy as np

            lens = np.ascontiguousarray(key_lens, np.uint32)
            return fl.keys_from_buffer(ctypes.addressof(buf),
                                       lens.ctypes.data, n)
        keys = []
        off = 0
        for ln in list(key_lens):
            keys.append(keys_blob[off:off + int(ln)].decode())
            off += int(ln)
        return keys

    def put_packed(self, keys_blob: bytes, key_lens, shards, slots, tss,
                   vals_blob: bytes, val_lens):
        """Bulk insert of ALREADY-PACKED buffers (the export_packed
        format) in one FFI crossing — compaction reinserts its snapshot
        with remapped slots without materializing a single python string
        or msgpack blob."""
        import numpy as np

        c = ctypes
        n = len(key_lens)
        u32p = c.POINTER(c.c_uint32)
        kl = np.ascontiguousarray(key_lens, np.uint32)
        vl = np.ascontiguousarray(val_lens, np.uint32)
        sh = np.ascontiguousarray(shards, np.int32)
        sl = np.ascontiguousarray(slots, np.int64)
        ts = np.ascontiguousarray(tss, np.int64)
        prev_sh = np.empty(n, np.int32)
        prev_sl = np.empty(n, np.int64)
        self._lib.kv_put_many(
            self._h, keys_blob, kl.ctypes.data_as(u32p),
            sh.ctypes.data_as(c.POINTER(c.c_int32)),
            sl.ctypes.data_as(c.POINTER(c.c_int64)),
            ts.ctypes.data_as(c.POINTER(c.c_int64)),
            vals_blob, vl.ctypes.data_as(u32p), n,
            prev_sh.ctypes.data_as(c.POINTER(c.c_int32)),
            prev_sl.ctypes.data_as(c.POINTER(c.c_int64)))

    def delete(self, key: str) -> bool:
        k = key.encode()
        return bool(self._lib.kv_del(self._h, k, len(k)))

    def __len__(self) -> int:
        return self._lib.kv_size(self._h)

    def items(self):
        """Iterate (key, shard, slot, ts, value) over all live entries."""
        cursor = ctypes.c_uint64(0)
        kbuf = ctypes.create_string_buffer(4096)
        klen = ctypes.c_uint32()
        shard = ctypes.c_int32()
        slot = ctypes.c_int64()
        ts = ctypes.c_int64()
        vlen = ctypes.c_uint32()
        while True:
            ok = self._lib.kv_next(self._h, ctypes.byref(cursor), kbuf,
                                   len(kbuf), ctypes.byref(klen),
                                   ctypes.byref(shard), ctypes.byref(slot),
                                   ctypes.byref(ts), self._buf,
                                   len(self._buf), ctypes.byref(vlen))
            if ok == 0:
                return
            if ok == 2:  # entry larger than buffers: grow, cursor unchanged
                if klen.value > len(kbuf):
                    kbuf = ctypes.create_string_buffer(
                        max(klen.value, 2 * len(kbuf)))
                if vlen.value > len(self._buf):
                    self._buf = ctypes.create_string_buffer(
                        max(vlen.value, 2 * len(self._buf)))
                continue
            yield (ctypes.string_at(kbuf, klen.value).decode(),
                   shard.value, slot.value, ts.value,
                   ctypes.string_at(self._buf, vlen.value))

    def nonempty_vals(self) -> int:
        return self._lib.kv_nonempty_vals(self._h)

    def dump(self, path: str) -> bool:
        return bool(self._lib.kv_dump(self._h, path.encode()))

    def dump_mem(self):
        """Consistent snapshot serialized into C memory (same binary
        format as dump()). Memory-speed under the store mutex — callers
        snapshot under their serving lock and write the returned buffer
        to disk with the lock RELEASED. Returns a zero-copy memoryview;
        call .release_buf() on the returned holder when written."""
        if not hasattr(self._lib, "kv_dump_mem"):
            return None
        buf = ctypes.POINTER(ctypes.c_uint8)()
        n = ctypes.c_uint64()
        if self._lib.kv_dump_mem(self._h, ctypes.byref(buf),
                                 ctypes.byref(n)) != 1:
            return None
        return _KvSnapshotBuf(self._lib, buf, n.value)

    def load(self, path: str) -> bool:
        return bool(self._lib.kv_load(self._h, path.encode()))

    def close(self):
        if self._h:
            self._lib.kv_destroy(self._h)
            self._h = None


class _KvSnapshotBuf:
    """Owns a malloc'd kv_dump_mem buffer; exposes it as a zero-copy
    memoryview for file.write(), frees on release()/GC."""

    def __init__(self, lib, buf, n: int):
        self._lib = lib
        self._buf = buf
        self.nbytes = n

    def view(self) -> memoryview:
        return memoryview(
            (ctypes.c_uint8 * self.nbytes).from_address(
                ctypes.addressof(self._buf.contents))).cast("B")

    def release(self):
        if self._buf:
            self._lib.kv_buf_free(self._buf)
            self._buf = None

    def __del__(self):
        try:
            self.release()
        except Exception:
            pass


class NativeVectorFile:
    """mmap-backed (rows, row_bytes) store; exposes a zero-copy numpy view."""

    def __init__(self, path: str, rows: int, row_bytes: int):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._h = lib.vf_open(path.encode(), rows, row_bytes)
        if not self._h:
            raise OSError(f"vf_open failed: {path}")
        self.rows = rows
        self.row_bytes = row_bytes

    def as_array(self, dtype, cols: int):
        import numpy as np

        ptr = self._lib.vf_data(self._h)
        buf = ctypes.cast(
            ptr, ctypes.POINTER(ctypes.c_uint8 * (self.rows * self.row_bytes))
        ).contents
        return np.frombuffer(buf, dtype=dtype).reshape(self.rows, cols)

    def flush(self) -> bool:
        return bool(self._lib.vf_flush(self._h))

    def close(self):
        if self._h:
            self._lib.vf_close(self._h)
            self._h = None
