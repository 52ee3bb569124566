"""Shard memory layout.

Host side: one `ShardMirror` per logical shard — a growable (capacity, dim)
row store plus a validity mask and an append-only slot allocator. The
mirror is the durable source of truth (checkpoints serialize it; the device
buffers are derived from it), the analog of the reference's hnswlib
index.bin + deleted_ids.json pair (src/datanode/handler.py:46-53,123-133)
but laid out for GEMM scanning instead of graph traversal.

Capacity modes (round 3): the classic mirror is an in-RAM float32 array —
24.5 GB of host RSS at the kernel-proven 8M x 768 scale, which made the
ENGINE the capacity bottleneck. Two orthogonal knobs fix that:

  * dtype="int8"    — rows are stored quantized (1 byte/dim) with a per-row
    dequant scale and the squared norm of the DEQUANTIZED row (so host
    rescoring and device scanning rank against the same stored values).
    `vector_at`/`rows_f32` dequantize on read.
  * path=...        — rows live in a disk-backed, mmap'd vector file (the
    native VectorFile from tpuvdb/native, np.memmap fallback), playing the
    disk-resident role LevelDB plays for the reference's doc payloads
    (src/datanode/handler.py:50): host RSS is O(touched pages), growth is
    a watermark bump (the file is preallocated sparse at full capacity),
    and checkpoints hardlink the immutable file instead of copying GBs.

Slot rows are append-only and immutable once written (overwrite = fresh
slot + soft delete), which is what makes zero-copy checkpoint views and
hardlink snapshots crash-consistent: a concurrent append only ever touches
rows >= the snapshot's recorded next_slot.

Soft deletes: slots are never reused until `compact()` rebuilds the mirror
densely — the same soft-delete + periodic-rebuild design as the reference
(_rebuild_hnsw_index, src/datanode/handler.py:91-120) but without its
stop-the-world full-index save on every put.
"""

from __future__ import annotations

import dataclasses
import os
import uuid
from typing import Dict, List, Optional, Tuple

import numpy as np

from tpuvdb.core import errors


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def quantize_block(vecs: np.ndarray) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(q int8, scales f32, sq f32 of the DEQUANTIZED rows) for a block of
    f32 rows — the host-mirror twin of kernels.quant.quantize_rows_np,
    except sq matches what a scanner of the stored rows actually sees."""
    vecs = np.asarray(vecs, np.float32)
    absmax = np.abs(vecs).max(axis=-1)
    scales = np.where(absmax > 0, absmax / 127.0, 1.0).astype(np.float32)
    q = np.clip(np.rint(vecs / scales[:, None]), -127, 127).astype(np.int8)
    qf = q.astype(np.float32)
    sq = (np.einsum("nd,nd->n", qf, qf) * scales * scales).astype(np.float32)
    return q, scales, sq


class _VecFile:
    """One mmap'd row store: native VectorFile when the .so builds,
    np.memmap otherwise. Never explicitly unmapped — the view may be held
    by an off-lock checkpoint writer after the owning mirror is swapped
    away; the mapping is released when the last reference is GC'd
    (NativeVectorFile closes in __del__; unlinking the path while mapped
    is safe on POSIX)."""

    def __init__(self, path: str, rows: int, dtype, cols: int):
        self.path = path
        self.rows = rows
        itemsize = np.dtype(dtype).itemsize
        self._native = None
        try:
            from tpuvdb import native

            if native.available():
                self._native = native.NativeVectorFile(
                    path, rows, cols * itemsize)
                self.arr = self._native.as_array(dtype, cols)
        except Exception:
            self._native = None
        if self._native is None:
            self.arr = np.memmap(path, dtype=dtype, mode="w+"
                                 if not os.path.exists(path) else "r+",
                                 shape=(rows, cols))

    def flush(self):
        if self._native is not None:
            self._native.flush()
        else:
            self.arr.flush()

    def __del__(self):
        native = getattr(self, "_native", None)
        if native is not None:
            try:
                native.close()
            except Exception:
                pass


class ShardMirror:
    def __init__(
        self,
        dim: int,
        capacity: int,
        init_cap: int = 16384,
        block: int = 128,
        dtype: str = "float32",
        path: Optional[str] = None,
    ):
        """path=None keeps rows in RAM; otherwise rows live in mmap files
        `{path}_g<uuid>.{vec,scale,sq}` preallocated (sparse) at full
        capacity, so growth never copies and checkpoints hardlink."""
        self.dim = dim
        self.capacity = capacity  # logical max slots
        self.block = block
        self.dtype = dtype
        self.quantized = dtype == "int8"
        self._qdtype = np.int8 if self.quantized else np.float32
        self.path_prefix = path
        self._files: Dict[str, _VecFile] = {}
        init = min(_round_up(init_cap, block), _round_up(capacity, block))
        if path is None:
            self._vec = np.zeros((init, dim), dtype=self._qdtype)
            self._scale = (np.ones(init, np.float32)
                           if self.quantized else None)
            self._sq = np.zeros(init, np.float32)
            self._phys = init
        else:
            self._open_files(link_from=None)
            self._phys = init
        # validity + allocator metadata always live in RAM (1 byte/row)
        full = _round_up(capacity, block)
        self.valid = np.zeros(full if path is not None else init, dtype=bool)
        self.next_slot = 0
        self.deleted = 0

    # ------------------------------------------------------------- mmap files

    def _gen_paths(self) -> Dict[str, str]:
        gen = uuid.uuid4().hex[:10]
        base = f"{self.path_prefix}_g{gen}"
        names = {"vec": base + ".vec", "sq": base + ".sq"}
        if self.quantized:
            names["scale"] = base + ".scale"
        return names

    def _open_files(self, link_from: Optional[Dict[str, str]]):
        """Create (or hardlink from a checkpoint) this mirror's backing
        files under a fresh generation name and mmap them at full
        capacity. Hardlinked restores share the immutable [:n) prefix with
        the checkpoint; appends touch rows beyond every snapshot's
        recorded watermark, so the shared inode stays consistent."""
        os.makedirs(os.path.dirname(self.path_prefix), exist_ok=True)
        full = _round_up(self.capacity, self.block)
        self.file_paths = self._gen_paths()
        if link_from:
            for part, dst in self.file_paths.items():
                src = link_from.get(part)
                if src is None:
                    raise errors.CheckpointError(
                        f"checkpoint missing mirror file part {part!r}")
                try:
                    os.link(src, dst)
                except OSError:
                    import shutil

                    shutil.copyfile(src, dst)
        self._files["vec"] = _VecFile(self.file_paths["vec"], full,
                                      self._qdtype, self.dim)
        self._vec = self._files["vec"].arr
        self._files["sq"] = _VecFile(self.file_paths["sq"], full,
                                     np.float32, 1)
        self._sq = self._files["sq"].arr.reshape(-1)
        if self.quantized:
            self._files["scale"] = _VecFile(self.file_paths["scale"], full,
                                            np.float32, 1)
            self._scale = self._files["scale"].arr.reshape(-1)
        else:
            self._scale = None

    @property
    def mmap_backed(self) -> bool:
        return self.path_prefix is not None

    def flush_files(self):
        """msync the mmap files (no-op for RAM mirrors) — called before a
        checkpoint hardlinks them."""
        for f in self._files.values():
            f.flush()

    def unlink_files(self):
        """Remove this mirror's directory entries (compaction swapped it
        out). The mapping itself stays valid for any live view/reference
        (off-lock checkpoint writers) until GC."""
        for p in getattr(self, "file_paths", {}).values():
            try:
                os.unlink(p)
            except OSError:
                pass

    # -------------------------------------------------------------- allocator

    @property
    def phys_cap(self) -> int:
        return self._phys

    def used(self) -> int:
        return self.next_slot

    def live(self) -> int:
        return self.next_slot - self.deleted

    def _grow_to(self, n: int):
        new_cap = self._phys
        while new_cap < n:
            new_cap *= 2
        new_cap = min(_round_up(new_cap, self.block),
                      _round_up(self.capacity, self.block))
        if new_cap < n:
            raise errors.CapacityExceeded(
                f"shard full: {n} > capacity {self.capacity}"
            )
        if self.mmap_backed:
            # file preallocated at full capacity: growth = watermark bump
            self._phys = new_cap
            return
        v = np.zeros((new_cap, self.dim), dtype=self._qdtype)
        v[: self._phys] = self._vec
        sq = np.zeros(new_cap, np.float32)
        sq[: self._phys] = self._sq
        m = np.zeros(new_cap, dtype=bool)
        m[: self._phys] = self.valid
        if self.quantized:
            sc = np.ones(new_cap, np.float32)
            sc[: self._phys] = self._scale
            self._scale = sc
        self._vec, self._sq, self.valid = v, sq, m
        self._phys = new_cap

    def alloc(self, n: int = 1) -> int:
        """Reserve n consecutive slots; returns the first slot."""
        if self.next_slot + n > self.capacity:
            raise errors.CapacityExceeded(
                f"shard full: {self.next_slot + n} > capacity {self.capacity}"
            )
        if self.next_slot + n > self._phys:
            self._grow_to(self.next_slot + n)
        first = self.next_slot
        self.next_slot += n
        return first

    # ------------------------------------------------------------- row access

    def write(self, slot: int, vec: np.ndarray):
        vec = np.asarray(vec, np.float32)
        if self.quantized:
            a = float(np.abs(vec).max())
            s = a / 127.0 if a > 0 else 1.0
            q = np.clip(np.rint(vec / s), -127, 127).astype(np.int8)
            self._vec[slot] = q
            self._scale[slot] = s
            qf = q.astype(np.float32)
            self._sq[slot] = float(qf @ qf) * s * s
        else:
            self._vec[slot] = vec
            self._sq[slot] = float(vec @ vec)
        self.valid[slot] = True

    def write_batch(self, first_slot: int, vecs: np.ndarray):
        """Vectorized write of consecutive slots [first_slot, +n)."""
        vecs = np.asarray(vecs, np.float32)
        n = vecs.shape[0]
        sl = slice(first_slot, first_slot + n)
        if self.quantized:
            q, scales, sq = quantize_block(vecs)
            self._vec[sl] = q
            self._scale[sl] = scales
            self._sq[sl] = sq
        else:
            self._vec[sl] = vecs
            self._sq[sl] = np.einsum("nd,nd->n", vecs, vecs)
        self.valid[sl] = True

    def write_raw_batch(self, first_slot: int, vec, scale, sq):
        """Bulk write of rows ALREADY in this mirror's stored dtype —
        pairs with rows_raw so compaction copies int8 codes bit-exactly
        between mirror generations instead of dequantizing to f32 and
        re-quantizing row by row. scale is ignored for unquantized
        mirrors."""
        n = len(vec)
        sl = slice(first_slot, first_slot + n)
        self._vec[sl] = vec
        self._sq[sl] = np.asarray(sq).reshape(-1)
        if self.quantized:
            self._scale[sl] = np.asarray(scale).reshape(-1)
        self.valid[sl] = True

    def mark_deleted(self, slot: int):
        if self.valid[slot]:
            self.valid[slot] = False
            self.deleted += 1

    def vector_at(self, slot: int) -> np.ndarray:
        """The stored row as f32 (dequantized for int8 mirrors — get()
        returns what the scanner scores, the capacity-mode semantic)."""
        if self.quantized:
            return self._vec[slot].astype(np.float32) * self._scale[slot]
        return np.asarray(self._vec[slot], np.float32)

    def rows_f32(self, slots: np.ndarray) -> np.ndarray:
        """Bulk dequantized rows (rescore path: one fancy-index gather)."""
        if self.quantized:
            return (self._vec[slots].astype(np.float32)
                    * np.asarray(self._scale[slots])[:, None])
        return np.asarray(self._vec[slots], np.float32)

    def rescore_into(self, q: np.ndarray, qsq: np.ndarray, fetch_w: int,
                     slots: np.ndarray, opos: np.ndarray, out: np.ndarray):
        """Fused native exact-rescore over this mirror's stored rows:
        out[opos] = |q[opos//fetch_w] - stored|^2, streaming each int8/f32
        row through registers once and reusing the precomputed ||v||^2
        (no (n, d) f32 gather transient). Caller checks
        native.rescore_available() and pre-fills out with +inf."""
        from tpuvdb import native

        native.rescore_rows(q, qsq, fetch_w, self._vec,
                            self._scale if self.quantized else None,
                            self._sq, slots, opos, out)

    def rows_raw(self, slots: np.ndarray):
        """Bulk rows in the STORED dtype: (codes, scales|None, sq) — one
        fancy-index gather each. int8 mirrors return their original
        per-row quantization untouched, so a consumer packing int8 cells
        (streaming IVF build) copies codes bit-exactly instead of
        dequantizing 25 GB of f32 to requantize it back."""
        return (self._vec[slots],
                np.asarray(self._scale[slots]) if self.quantized else None,
                np.asarray(self._sq[slots]))

    def raw_range(self, lo: int, hi: int):
        """(rows_raw, scales|None, sq) zero-copy views of [lo, hi) in the
        stored dtype — streaming device uploads and checkpoints read these."""
        return (self._vec[lo:hi],
                self._scale[lo:hi] if self.quantized else None,
                self._sq[lo:hi])

    def is_valid(self, slot: int) -> bool:
        return bool(self.valid[slot]) if slot < self._phys else False

    # ------------------------------------------------------------ checkpoints

    def checkpoint_snapshot(self) -> dict:
        """Capture a crash-consistent snapshot descriptor under the engine
        lock (cheap: views + a copy of the small validity prefix). Rows
        [:n) are immutable, so the views stay correct while the caller
        writes them to disk with the lock RELEASED; `store_ref` keeps the
        mmap alive across a concurrent compaction swap."""
        n = self.next_slot
        return {
            "dtype": self.dtype,
            "n": n,
            "deleted": self.deleted,
            "valid": self.valid[:n].copy(),
            "vec": self._vec[:n],
            "scale": self._scale[:n] if self.quantized else None,
            "sq": self._sq[:n],
            "mmap_paths": dict(self.file_paths) if self.mmap_backed else None,
            "store_ref": self,
        }

    def load_raw(self, vec, scale, sq, valid, n: int, deleted: int):
        """Restore rows stored in THIS mirror's dtype (checkpoint fast
        path). Copies [:n) into the backing store."""
        if n:
            if n > self._phys:
                self._grow_to(n)
            self._vec[:n] = vec
            self._sq[:n] = np.asarray(sq).reshape(-1)
            if self.quantized:
                self._scale[:n] = np.asarray(scale).reshape(-1)
            self.valid[:n] = valid
        self.next_slot = n
        self.deleted = deleted

    def load_f32(self, vecs: np.ndarray, valid, n: int, deleted: int):
        """Restore from f32 rows (cross-dtype checkpoint): vectorized
        quantization when this mirror is int8."""
        if n:
            if n > self._phys:
                self._grow_to(n)
            self.write_batch(0, vecs[:n])
            self.valid[:n] = valid
        self.next_slot = n
        self.deleted = deleted

    def adopt_checkpoint_files(self, link_from: Dict[str, str], n: int,
                               deleted: int, valid) -> None:
        """mmap->mmap restore without copying: hardlink the checkpoint's
        row files in as this mirror's backing store (same dtype/geometry
        validated by the caller)."""
        self.unlink_files()  # drop the empty files __init__ created
        self._open_files(link_from=link_from)
        if n > self._phys:
            self._grow_to(n)
        self.valid[:n] = valid
        self.next_slot = n
        self.deleted = deleted


@dataclasses.dataclass
class StackedLayout:
    """Geometry of the stacked device row space."""

    num_shards: int
    phys_cap: int  # common physical capacity per shard (rows)
    dim: int

    @property
    def total_rows(self) -> int:
        return self.num_shards * self.phys_cap

    def row_of(self, shard: int, slot: int) -> int:
        return shard * self.phys_cap + slot

    def shard_slot_of(self, row: int) -> Tuple[int, int]:
        return row // self.phys_cap, row % self.phys_cap

    @classmethod
    def for_mirrors(
        cls,
        mirrors: List[ShardMirror],
        block: int,
        min_rows_multiple: int = 1,
    ) -> "StackedLayout":
        """Common phys_cap = max mirror phys_cap, rounded so the stacked row
        count is a multiple of block and of min_rows_multiple (device count)."""
        import math

        num = len(mirrors)
        dim = mirrors[0].dim
        cap = max(m.phys_cap for m in mirrors)
        # total rows (num * cap) must divide evenly across devices AND into
        # scan blocks: num * cap ≡ 0 (mod L) with L = block * devices, i.e.
        # cap must be a multiple of L / gcd(num, L). (A previous increment-
        # until-divisible loop here never terminated for e.g. 3 shards on an
        # 8-device mesh.)
        L = block * min_rows_multiple
        step = L // math.gcd(num, L)
        cap = _round_up(_round_up(cap, block), step)
        return cls(num_shards=num, phys_cap=cap, dim=dim)

    def stack(self, mirrors: List[ShardMirror], dtype=np.float32):
        """Materialize (total_rows, dim) f32 vectors + sqnorms + valid.
        Int8 mirrors dequantize per shard; sqnorms come from the stored
        per-row norms (of the dequantized rows), not a fresh einsum."""
        vecs = np.zeros((self.total_rows, self.dim), dtype=np.float32)
        sq = np.zeros(self.total_rows, dtype=np.float32)
        valid = np.zeros(self.total_rows, dtype=bool)
        for s, m in enumerate(mirrors):
            r0 = s * self.phys_cap
            n = m.next_slot
            if not n:
                continue
            raw, scale, msq = m.raw_range(0, n)
            if m.quantized:
                vecs[r0 : r0 + n] = (raw.astype(np.float32)
                                     * np.asarray(scale)[:, None])
            else:
                vecs[r0 : r0 + n] = raw
            sq[r0 : r0 + n] = np.asarray(msq).reshape(-1)
            valid[r0 : r0 + n] = m.valid[:n]
        return vecs.astype(dtype), sq, valid

    def stack_raw_int8(self, mirrors: List[ShardMirror]):
        """(qvecs int8, scales, sq, valid) straight from int8 mirrors —
        no f32 materialization (1 byte/dim host transient, not 4)."""
        q = np.zeros((self.total_rows, self.dim), dtype=np.int8)
        scales = np.ones(self.total_rows, dtype=np.float32)
        sq = np.zeros(self.total_rows, dtype=np.float32)
        valid = np.zeros(self.total_rows, dtype=bool)
        for s, m in enumerate(mirrors):
            r0 = s * self.phys_cap
            n = m.next_slot
            if not n:
                continue
            raw, scale, msq = m.raw_range(0, n)
            q[r0 : r0 + n] = raw
            scales[r0 : r0 + n] = np.asarray(scale).reshape(-1)
            sq[r0 : r0 + n] = np.asarray(msq).reshape(-1)
            valid[r0 : r0 + n] = m.valid[:n]
        return q, scales, sq, valid

    def iter_blocks(self, mirrors: List[ShardMirror], block_rows: int):
        """Yield (start_row, vec_raw, scales|None, sq, valid) fixed-size
        blocks of the stacked row space, assembled from mirror views one
        block at a time — the streaming device build reads these so the
        host never materializes the full stacked corpus. The final block
        overlaps backward to keep the shape static (identical content is
        rewritten, so the overlap is harmless)."""
        total = self.total_rows
        if total <= block_rows:
            if all(m.quantized for m in mirrors):
                q, scales, sq, valid = self.stack_raw_int8(mirrors)
                yield 0, q, scales, sq, valid
            else:
                vecs, sq, valid = self.stack(mirrors)
                yield 0, vecs, None, sq, valid
            return
        quantized = all(m.quantized for m in mirrors)
        vdtype = np.int8 if quantized else np.float32
        g0 = 0
        while g0 < total:
            if g0 + block_rows > total:
                g0 = total - block_rows  # overlap-rewrite the tail
            g1 = g0 + block_rows
            vblk = np.zeros((block_rows, self.dim), vdtype)
            sblk = np.ones(block_rows, np.float32) if quantized else None
            qblk = np.zeros(block_rows, np.float32)
            mblk = np.zeros(block_rows, bool)
            s_first = g0 // self.phys_cap
            s_last = (g1 - 1) // self.phys_cap
            for s in range(s_first, s_last + 1):
                m = mirrors[s]
                r0 = s * self.phys_cap
                lo = max(g0, r0)
                hi = min(g1, r0 + m.next_slot)
                if hi <= lo:
                    continue
                raw, scale, msq = m.raw_range(lo - r0, hi - r0)
                b0, b1 = lo - g0, hi - g0
                if quantized:
                    vblk[b0:b1] = raw
                    sblk[b0:b1] = np.asarray(scale).reshape(-1)
                elif m.quantized:
                    # mixed-dtype mirrors stream as f32: int8 shards must
                    # DEQUANTIZE into the f32 block (raw codes scored as
                    # f32 would be garbage distances for those shards)
                    vblk[b0:b1] = (raw.astype(np.float32)
                                   * np.asarray(scale).reshape(-1)[:, None])
                else:
                    vblk[b0:b1] = raw
                qblk[b0:b1] = np.asarray(msq).reshape(-1)
                mblk[b0:b1] = m.valid[lo - r0 : hi - r0]
            yield g0, vblk, sblk, qblk, mblk
            g0 = g1
