"""Shard memory layout.

Host side: one `ShardMirror` per logical shard — a growable (capacity, dim)
float32 array plus a validity mask and an append-only slot allocator. The
mirror is the durable source of truth (checkpoints serialize it; the device
buffers are derived from it), the analog of the reference's hnswlib
index.bin + deleted_ids.json pair (src/datanode/handler.py:46-53,123-133)
but laid out for GEMM scanning instead of graph traversal.

Device side (see index/exact.py): all shards stack into one
(num_shards * phys_cap, dim) row space so a single XLA program scans the
whole corpus; physical row = shard * phys_cap + slot. phys_cap grows by
doubling (multiples of the scan block size) up to the configured
shard_capacity, the analog of hnswlib max_elements=1M
(src/datanode/handler.py:86).

Soft deletes: slots are never reused until `compact()` rebuilds the mirror
densely — the same soft-delete + periodic-rebuild design as the reference
(_rebuild_hnsw_index, src/datanode/handler.py:91-120) but without its
stop-the-world full-index save on every put.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import numpy as np

from tpuvdb.core import errors


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class ShardMirror:
    def __init__(self, dim: int, capacity: int, init_cap: int = 16384, block: int = 128):
        self.dim = dim
        self.capacity = capacity  # logical max slots
        self.block = block
        init = min(_round_up(init_cap, block), _round_up(capacity, block))
        self.vectors = np.zeros((init, dim), dtype=np.float32)
        self.valid = np.zeros(init, dtype=bool)
        self.next_slot = 0
        self.deleted = 0

    @property
    def phys_cap(self) -> int:
        return self.vectors.shape[0]

    def used(self) -> int:
        return self.next_slot

    def live(self) -> int:
        return self.next_slot - self.deleted

    def _grow_to(self, n: int):
        new_cap = self.phys_cap
        while new_cap < n:
            new_cap *= 2
        new_cap = min(_round_up(new_cap, self.block), _round_up(self.capacity, self.block))
        if new_cap < n:
            raise errors.CapacityExceeded(
                f"shard full: {n} > capacity {self.capacity}"
            )
        v = np.zeros((new_cap, self.dim), dtype=np.float32)
        v[: self.phys_cap] = self.vectors
        m = np.zeros(new_cap, dtype=bool)
        m[: self.phys_cap] = self.valid
        self.vectors, self.valid = v, m

    def alloc(self, n: int = 1) -> int:
        """Reserve n consecutive slots; returns the first slot."""
        if self.next_slot + n > self.capacity:
            raise errors.CapacityExceeded(
                f"shard full: {self.next_slot + n} > capacity {self.capacity}"
            )
        if self.next_slot + n > self.phys_cap:
            self._grow_to(self.next_slot + n)
        first = self.next_slot
        self.next_slot += n
        return first

    def write(self, slot: int, vec: np.ndarray):
        self.vectors[slot] = vec
        self.valid[slot] = True

    def mark_deleted(self, slot: int):
        if self.valid[slot]:
            self.valid[slot] = False
            self.deleted += 1

    def vector_at(self, slot: int) -> np.ndarray:
        return self.vectors[slot]

    def is_valid(self, slot: int) -> bool:
        return bool(self.valid[slot]) if slot < self.phys_cap else False


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
        """Materialize (total_rows, dim) vectors + sqnorms + valid from mirrors."""
        vecs = np.zeros((self.total_rows, self.dim), dtype=np.float32)
        valid = np.zeros(self.total_rows, dtype=bool)
        for s, m in enumerate(mirrors):
            r0 = s * self.phys_cap
            n = m.next_slot
            vecs[r0 : r0 + n] = m.vectors[:n]
            valid[r0 : r0 + n] = m.valid[:n]
        sq = np.einsum("nd,nd->n", vecs, vecs).astype(np.float32)
        return vecs.astype(dtype), sq, valid
