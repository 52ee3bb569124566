"""Host document store: key -> (shard, slot, metadata, timestamp).

Role parity: the reference keeps a LevelDB of key -> JSON{hnsw_id, vector,
metadata} per data node (src/datanode/handler.py:50,287-297) and recovers
keys from index ids with a full O(n) LevelDB scan per search hit
(src/datanode/handler.py:136-153). Here the forward map is a hash map and
the reverse map is a dense per-shard slot->key table, so id->key is O(1).

Two forward-map backends:
  * "python" (default): dict of DocEntry — simplest, fastest for <~10M keys
  * "native": the C++ open-addressing store (tpuvdb.native.NativeKv) —
    the LevelDB-role engine for 100M-key scale, metadata packed as msgpack
    blobs in its arena (falls back to python when the library is absent)

Vector payloads are NOT stored here: they live in the shard host mirror
(tpuvdb.index.layout), slot-addressed, which also serves as the checkpoint
image and the device rebuild source. `get` therefore reads host state only
and never touches the device — mirroring the reference's split where `get`
reads the doc store, not the HNSW index (src/datanode/handler.py:411-428).
"""

from __future__ import annotations

import dataclasses
import os
import threading
from typing import Dict, Iterator, List, Optional, Set, Tuple

import msgpack


@dataclasses.dataclass
class DocEntry:
    key: str
    shard: int
    slot: int  # slot index within the shard
    metadata: Dict[str, str]
    timestamp: int


class DocStore:
    def __init__(self, backend: str = "auto"):
        self._lock = threading.RLock()
        self._native = None
        if backend in ("native", "auto"):
            try:
                from tpuvdb import native

                if native.available():
                    self._native = native.NativeKv()
            except Exception:
                self._native = None
        self._docs: Dict[str, DocEntry] = {}
        # reverse map: shard -> list where index==slot, value==key or None
        self._slots: Dict[int, List[Optional[str]]] = {}
        # inverted metadata index: field -> value -> {(shard, slot)} — powers
        # filter pushdown (the reference accepts but ignores filters,
        # src/coordinator/handler.py:186-189)
        self._meta: Dict[str, Dict[str, Set[Tuple[int, int]]]] = {}

    @property
    def backend(self) -> str:
        return "native" if self._native is not None else "python"

    # -------------------------------------------------- forward-map plumbing

    def _map_get(self, key: str) -> Optional[DocEntry]:
        if self._native is not None:
            got = self._native.get(key)
            if got is None:
                return None
            shard, slot, ts, blob = got
            md = msgpack.unpackb(blob, raw=False) if blob else {}
            return DocEntry(key=key, shard=shard, slot=slot,
                            metadata=md, timestamp=ts)
        return self._docs.get(key)

    def _map_put(self, e: DocEntry):
        if self._native is not None:
            blob = msgpack.packb(e.metadata, use_bin_type=True) if e.metadata else b""
            self._native.put(e.key, e.shard, e.slot, e.timestamp, blob)
        else:
            self._docs[e.key] = e

    def _map_del(self, key: str):
        if self._native is not None:
            self._native.delete(key)
        else:
            self._docs.pop(key, None)

    def _map_iter(self) -> Iterator[DocEntry]:
        if self._native is not None:
            for key, shard, slot, ts, blob in self._native.items():
                md = msgpack.unpackb(blob, raw=False) if blob else {}
                yield DocEntry(key=key, shard=shard, slot=slot,
                               metadata=md, timestamp=ts)
        else:
            yield from self._docs.values()

    def _meta_add(self, e: "DocEntry"):
        for k, v in e.metadata.items():
            self._meta.setdefault(k, {}).setdefault(v, set()).add((e.shard, e.slot))

    def _meta_remove(self, e: "DocEntry"):
        for k, v in e.metadata.items():
            vals = self._meta.get(k)
            if not vals:
                continue
            s = vals.get(v)
            if s is not None:
                s.discard((e.shard, e.slot))
                if not s:
                    del vals[v]
            if not vals:
                self._meta.pop(k, None)

    # ------------------------------------------------------------------- ops

    def put(self, entry: DocEntry) -> Optional[DocEntry]:
        """Insert/overwrite. Returns the previous entry for this key, if any."""
        with self._lock:
            prev = self._map_get(entry.key)
            self._map_put(entry)
            if self._native is None:
                # the native store maintains its own (shard, slot) -> key
                # reverse table in C++ (no interpreter-resident slot lists)
                slots = self._slots.setdefault(entry.shard, [])
                if entry.slot >= len(slots):
                    slots.extend([None] * (entry.slot + 1 - len(slots)))
                slots[entry.slot] = entry.key
            if prev is not None:
                self._meta_remove(prev)
                if (self._native is None
                        and (prev.shard, prev.slot) != (entry.shard, entry.slot)):
                    pslots = self._slots.get(prev.shard)
                    if pslots and prev.slot < len(pslots) and pslots[prev.slot] == entry.key:
                        pslots[prev.slot] = None
            self._meta_add(entry)
            return prev

    def put_many(self, entries: List[DocEntry]) -> List[Optional[Tuple[int, int]]]:
        """Bulk insert/overwrite; returns per entry the PREVIOUS (shard,
        slot) placement of its key, or None for new keys (the engine
        soft-deletes those slots). On the native backend with no
        pre-existing metadata this is ONE FFI crossing for the whole
        batch — the per-key ctypes round trip dominated bulk ingest."""
        with self._lock:
            dup_free = len({e.key for e in entries}) == len(entries)
            if self._native is not None and not self._meta and dup_free:
                blobs = [(msgpack.packb(e.metadata, use_bin_type=True)
                          if e.metadata else b"") for e in entries]
                prevs = self._native.put_many(
                    [e.key for e in entries],
                    [e.shard for e in entries],
                    [e.slot for e in entries],
                    [e.timestamp for e in entries], blobs)
                # _meta was empty, so no overwritten predecessor carried
                # metadata (duplicate keys within the batch are excluded
                # above) — only additions to index
                for e in entries:
                    if e.metadata:
                        self._meta_add(e)
                return [None if ps < 0 else (ps, pl) for ps, pl in prevs]
            out: List[Optional[Tuple[int, int]]] = []
            for e in entries:
                prev = self.put(e)
                out.append(None if prev is None
                           else (prev.shard, prev.slot))
            return out

    def put_rows_bulk(self, keys: List[str], shard: int, first_slot: int):
        """Columnar ingest fast path: metadata-free entries at consecutive
        slots, one FFI crossing, numpy prev arrays back (no DocEntry, no
        per-row tuples). Returns (prev_shards, prev_slots) with -1 = new
        key, or None when the fast path doesn't apply (python backend, or
        a non-empty metadata index — an overwritten predecessor might
        carry metadata that must leave the inverted index)."""
        import numpy as np

        with self._lock:
            if self._native is None or self._meta:
                return None
            n = len(keys)
            return self._native.put_many(
                keys, np.full(n, shard, np.int32),
                np.arange(first_slot, first_slot + n, dtype=np.int64),
                np.zeros(n, np.int64), values=None, raw=True)

    def get(self, key: str) -> Optional[DocEntry]:
        with self._lock:
            return self._map_get(key)

    def delete(self, key: str) -> Optional[DocEntry]:
        with self._lock:
            e = self._map_get(key)
            if e is not None:
                self._map_del(key)
                if self._native is None:
                    slots = self._slots.get(e.shard)
                    if slots and e.slot < len(slots) and slots[e.slot] == key:
                        slots[e.slot] = None
                self._meta_remove(e)
            return e

    def find_by_metadata(self, flt: Dict[str, str]) -> Optional[Set[Tuple[int, int]]]:
        """(shard, slot) set matching ALL field=value pairs; None = no filter."""
        if not flt:
            return None
        with self._lock:
            sets = []
            for k, v in flt.items():
                s = self._meta.get(k, {}).get(v)
                if not s:
                    return set()
                sets.append(s)
            sets.sort(key=len)
            out = set(sets[0])
            for s in sets[1:]:
                out &= s
            return out

    def slots_live(self, shards, slots):
        """Bool array: does each (shard, slot) map to a live key? No
        strings materialize — the search path compacts its candidate
        matrix on this before resolving only the surviving keys."""
        import numpy as np

        with self._lock:
            if self._native is not None:
                return self._native.slots_live(shards, slots)
            out = np.zeros(len(shards), bool)
            by_shard = self._slots
            for i, (sh, sl) in enumerate(zip(shards, slots)):
                lst = by_shard.get(int(sh))
                out[i] = (lst is not None and sl < len(lst)
                          and lst[sl] is not None)
            return out

    def key_at(self, shard: int, slot: int) -> Optional[str]:
        """O(1) reverse lookup (fixes the reference's O(n) scan)."""
        with self._lock:
            if self._native is not None:
                return self._native.key_at(shard, slot)
            slots = self._slots.get(shard)
            if slots is None or slot >= len(slots):
                return None
            return slots[slot]

    def export_snapshot(self):
        """Consistent snapshot of all entries, optimized for a caller that
        holds the ENGINE lock (compaction): on the native backend this is
        one memcpy-speed FFI crossing (the per-item `entries()` cursor cost
        ~40 s of under-lock serving stall per 1M keys); on the python
        backend a list of the live DocEntry refs. Decode with
        snapshot_columns() with the lock RELEASED."""
        with self._lock:
            if self._native is not None:
                packed = self._native.export_packed()
                if packed is not None:
                    return ("packed", packed)
            return ("entries", list(self._map_iter()))

    @staticmethod
    def snapshot_columns(snap):
        """(keys list, shards i32, slots i64, tss i64, metadatas list) from
        an export_snapshot() — run OUTSIDE the engine lock (key decode and
        msgpack decode of non-empty metadata blobs happen here)."""
        import numpy as np

        kind, data = snap
        if kind == "packed":
            from tpuvdb.native import NativeKv

            keys = NativeKv.decode_keys(data["keys_blob"], data["key_lens"])
            val_lens = data["val_lens"]
            n = len(keys)
            if int(val_lens.sum()) == 0:
                mds: List[Dict[str, str]] = [{} for _ in range(n)]
            else:
                blob = data["vals_blob"]
                offs = np.zeros(n + 1, np.int64)
                np.cumsum(val_lens, out=offs[1:])
                mds = [
                    (msgpack.unpackb(blob[offs[i]:offs[i + 1]], raw=False)
                     if val_lens[i] else {})
                    for i in range(n)
                ]
            return (keys, data["shards"], data["slots"], data["tss"], mds)
        entries = data
        n = len(entries)
        shards = np.fromiter((e.shard for e in entries), np.int32, n)
        slots = np.fromiter((e.slot for e in entries), np.int64, n)
        tss = np.fromiter((e.timestamp for e in entries), np.int64, n)
        return ([e.key for e in entries], shards, slots, tss,
                [e.metadata for e in entries])

    @staticmethod
    def snapshot_shard_slots(snap):
        """(shards i32, slots i64) only — lets compaction plan the mirror
        copy without decoding a single key."""
        import numpy as np

        kind, data = snap
        if kind == "packed":
            return data["shards"], data["slots"]
        entries = data
        n = len(entries)
        return (np.fromiter((e.shard for e in entries), np.int32, n),
                np.fromiter((e.slot for e in entries), np.int64, n))

    def load_packed_remapped(self, snap, new_slots) -> bool:
        """Compaction fast path: reinsert a packed snapshot with remapped
        slots in ONE FFI crossing — zero python strings, zero msgpack
        round trips (the blobs pass through verbatim). Rebuilds the
        inverted metadata index from the (usually few) entries that carry
        metadata. Returns False when the fast path doesn't apply (python
        backend, entry-list snapshot, or stale .so)."""
        import numpy as np

        kind, data = snap
        if kind != "packed" or self._native is None:
            return False
        with self._lock:
            self._native.put_packed(
                data["keys_blob"], data["key_lens"], data["shards"],
                new_slots, data["tss"], data["vals_blob"], data["val_lens"])
            val_lens = data["val_lens"]
            if int(val_lens.sum()):
                from tpuvdb.native import NativeKv

                keys = NativeKv.decode_keys(data["keys_blob"],
                                            data["key_lens"])
                blob = data["vals_blob"]
                n = len(keys)
                offs = np.zeros(n + 1, np.int64)
                np.cumsum(val_lens, out=offs[1:])
                shards = data["shards"]
                for i in np.flatnonzero(val_lens).tolist():
                    md = msgpack.unpackb(blob[offs[i]:offs[i + 1]],
                                         raw=False)
                    self._meta_add(DocEntry(
                        key=keys[i], shard=int(shards[i]),
                        slot=int(new_slots[i]), metadata=md,
                        timestamp=int(data["tss"][i])))
        return True

    def keys_rows(self, rows, phys_cap: int, row: int = 0):
        """Fused liveness + key resolution over FLAT global row ids
        (shard = row // phys_cap, slot = row % phys_cap; negative = pad).
        Returns (keys, n_missing) in ONE lock acquisition and — on the
        native backend — one FFI crossing with C-side shard/slot
        decomposition and prefetch. With row > 0 the keys come back as
        row-sized inner lists (the engine's per-query shape), built in C.
        n_missing == 0 certifies every row resolved live, so the serving
        fast path skips the separate liveness bitmap + compaction pass
        entirely."""
        with self._lock:
            if self._native is not None:
                res = self._native.rows_keys(rows, phys_cap, row)
                if res is not None:
                    return res
            # python fallback (dict backend or stale .so)
            by_shard = self._slots if self._native is None else None
            out: List[Optional[str]] = []
            miss = 0
            for r in rows:
                r = int(r)
                if r < 0:
                    out.append(None)
                    miss += 1
                    continue
                sh, sl = r // phys_cap, r % phys_cap
                if by_shard is None:
                    key = self._native.key_at(sh, sl)
                else:
                    lst = by_shard.get(sh)
                    key = (lst[sl] if lst is not None and sl < len(lst)
                           else None)
                if key is None:
                    miss += 1
                out.append(key)
            if row > 0 and len(out) % row == 0:
                out = [out[i:i + row] for i in range(0, len(out), row)]
            return out, miss

    def keys_at_bulk(self, shards, slots) -> List[Optional[str]]:
        """Vectorized key_at over parallel (shard, slot) sequences: ONE
        lock acquisition (and, on the native backend, one FFI crossing)
        for the whole batch. The search path resolves Q * fetch_k
        candidate rows per batch; a per-row key_at was
        lock-acquisition-bound at serving batch sizes."""
        with self._lock:
            if self._native is not None:
                return self._native.keys_at(shards, slots)
            by_shard = self._slots
            out: List[Optional[str]] = []
            cache_sh = -1
            cache_lst: Optional[List[Optional[str]]] = None
            for sh, sl in zip(shards, slots):
                if sh != cache_sh:
                    cache_sh = sh
                    cache_lst = by_shard.get(sh)
                out.append(cache_lst[sl]
                           if cache_lst is not None and sl < len(cache_lst)
                           else None)
            return out

    def __len__(self) -> int:
        if self._native is not None:
            return len(self._native)
        return len(self._docs)

    def __contains__(self, key: str) -> bool:
        return self.get(key) is not None

    def keys(self) -> List[str]:
        with self._lock:
            if self._native is not None:
                return [e.key for e in self._map_iter()]
            return list(self._docs.keys())

    def entries(self) -> Iterator[DocEntry]:
        with self._lock:
            return iter(list(self._map_iter()))

    def shard_count_used(self) -> int:
        with self._lock:
            return max(self._slots.keys(), default=-1) + 1

    # ---------------------------------------------------------- serialization

    def dump(self, path: str) -> None:
        with self._lock:
            payload = {
                "docs": [
                    (e.key, e.shard, e.slot, e.metadata, e.timestamp)
                    for e in self._map_iter()
                ]
            }
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(msgpack.packb(payload, use_bin_type=True))
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)

    @classmethod
    def load(cls, path: str, backend: str = "python") -> "DocStore":
        store = cls(backend=backend)
        with open(path, "rb") as f:
            payload = msgpack.unpackb(f.read(), raw=False)
        for key, shard, slot, metadata, ts in payload["docs"]:
            store.put(DocEntry(key=key, shard=shard, slot=slot,
                               metadata=dict(metadata), timestamp=ts))
        return store

    # ------------------------------------------------ native binary snapshots

    def dump_native(self, path: str) -> None:
        """C++ binary snapshot (checkpoint fast path): the native store
        serializes its table directly to disk — no python materialization
        of per-entry tuples. Only valid on the native backend."""
        if self._native is None:
            raise RuntimeError("dump_native requires the native backend")
        with self._lock:
            if not self._native.dump(path):
                raise OSError(f"native docstore dump failed: {path}")

    def snapshot_native_mem(self):
        """Consistent in-memory snapshot of the native table (checkpoint
        fast path): memory-speed under the locks, so the engine can hold
        its serving lock only for the memcpy and write the blob to disk
        off-lock. Returns a buffer holder (write .view(), then
        .release()) or None when the .so predates kv_dump_mem."""
        if self._native is None:
            raise RuntimeError(
                "snapshot_native_mem requires the native backend")
        with self._lock:
            return self._native.dump_mem()

    @classmethod
    def load_native_file(cls, path: str, backend: str = "auto") -> "DocStore":
        """Restore from a dump_native snapshot. With the native library
        present the C++ loader parses it; otherwise a python reader of the
        same binary format rebuilds a python-backed store (checkpoints stay
        portable across environments without the .so)."""
        store = cls(backend=backend)
        if store._native is not None:
            if not store._native.load(path):
                raise OSError(f"native docstore load failed: {path}")
            # the C++ loader rebuilt the (shard, slot) -> key reverse table
            # itself; only the metadata inverted index needs a python pass,
            # and only when some entry actually carries metadata
            if store._native.nonempty_vals():
                with store._lock:
                    for key, shard, slot, ts, blob in store._native.items():
                        if blob:
                            md = msgpack.unpackb(blob, raw=False)
                            if md:
                                store._meta_add(DocEntry(
                                    key=key, shard=shard, slot=slot,
                                    metadata=md, timestamp=ts))
            return store
        for key, shard, slot, ts, blob in _iter_kv_dump(path):
            md = msgpack.unpackb(blob, raw=False) if blob else {}
            store.put(DocEntry(key=key, shard=shard, slot=slot,
                               metadata=md, timestamp=ts))
        return store


def _iter_kv_dump(path: str):
    """Python reader for the native KvStore's binary snapshot format
    (native/src/tpuvdb_native.cpp kv_dump): [u64 count] then per entry
    [u32 klen][key][i32 shard][i64 slot][i64 ts][u32 vlen][val]."""
    import struct

    with open(path, "rb") as f:
        hdr = f.read(8)
        if len(hdr) < 8:
            return
        (count,) = struct.unpack("<Q", hdr)
        for _ in range(count):
            kl = f.read(4)
            if len(kl) < 4:
                return
            (klen,) = struct.unpack("<I", kl)
            key = f.read(klen).decode()
            rest = f.read(24)
            if len(rest) < 24:
                return
            shard, slot, ts, vlen = struct.unpack("<iqqI", rest)
            val = f.read(vlen)
            yield key, shard, slot, ts, val
