"""Group-commit coalescing for concurrent engine searches.

The serving bottleneck under concurrency is per-device-call fixed cost:
each engine.search_batch runs its own device program (query upload +
dispatch + paired result fetch), and through the axon relay every call
pays a ~30 ms round-trip tick that a colocated host pays in microseconds
but still pays as kernel launch + sync overhead. The scan kernels are
bandwidth-bound — one corpus sweep over a 4096-query stack costs barely
more than over 512 — so T concurrent batches SHOULD share one sweep.

This is the WAL group-commit shape applied to reads (the write analog is
api/batching.py's BatchingWriter): callers enqueue their batch under a
mutex, then contend on a per-(k, overfetch) leader SEMAPHORE. Whoever
acquires a slot drains every queued batch (up to max_rows), stacks the
queries, runs ONE direct search, and resolves each caller's slice. No
worker thread, no coalescing window: a solo caller's group is just
itself, and stacking emerges exactly when calls back up.

The semaphore width (`inflight`) is the round-4 regression fix: a single
leader LOCK serialized whole groups, so a transport with a long fixed
dispatch tick (the axon relay pays ~45 ms per device call; even a
colocated host pays launch + sync) lost the request overlap the
un-coalesced path had — BENCH_r04 measured 22.6k pipelined QPS vs r3's
44.7k direct at identical shapes, with mostly 2-3-deep groups stacking
~1.5k rows per serialized tick. With N slots, up to N stacked device
calls overlap in flight; when the device is fast the coalescer degrades
gracefully to overlapped direct calls (groups of 1), and when calls
back up deeper than N the stacking resumes. Both regimes beat either
pure strategy: see docs/BENCH_NOTES "serving coalesce A/B" (round 5).

Groups are keyed by (k, overfetch) so every member shares the leader's
fetch width and rescore semantics; mixed-k workloads simply form
separate groups. Stacked shapes are padded up to a power of two so the
number of distinct compiled batch shapes stays logarithmic.

The reference has no analog — its datanode serves each Thrift request
with its own hnswlib knn_query (src/datanode/handler.py:359-364).
"""

from __future__ import annotations

import threading
from concurrent.futures import Future
from typing import Callable, Dict, List, Tuple

import numpy as np


class SearchCoalescer:
    def __init__(self, direct: Callable, max_rows: int = 4096,
                 inflight: int = 4):
        """direct: fn(queries, k, overfetch) -> (dists, keys) — the
        engine's un-coalesced search path (retry loop included).
        inflight: max concurrent device calls per (k, overfetch) group
        key — the overlap/stacking trade described in the module doc."""
        self._direct = direct
        self._max_rows = max(1, max_rows)
        self._inflight = max(1, inflight)
        self._mu = threading.Lock()
        self._pending: Dict[Tuple[int, bool], List] = {}
        self._leader: Dict[Tuple[int, bool], threading.Semaphore] = {}
        # observability: {batches-per-group: count} — how much stacking
        # the workload actually gets (engine info surfaces it)
        self.group_sizes: Dict[int, int] = {}

    def search(self, queries: np.ndarray, k: int, overfetch: bool):
        key = (int(k), bool(overfetch))
        fut: Future = Future()
        with self._mu:
            self._pending.setdefault(key, []).append((queries, fut))
            sem = self._leader.setdefault(
                key, threading.Semaphore(self._inflight))
        # Loop: a drained group is capped at max_rows, so one _serve may
        # resolve only batches queued AHEAD of ours — keep taking a
        # leader slot (serving whoever is queued) until our own batch is
        # either resolved or in flight under another leader. A solo
        # caller passes through exactly once.
        while not fut.done():
            with sem:
                if fut.done():
                    break
                took_any = self._serve(key, k, overfetch)
            if not fut.done() and not took_any:
                # queue was empty, so OUR batch was claimed by a leader
                # that is still in flight — block instead of spinning
                break
        return fut.result()

    def _serve(self, key, k: int, overfetch: bool) -> bool:
        """Caller holds a leader slot. Drain whole queued batches up to
        max_rows (never split a batch; a single oversized batch still
        runs alone) and resolve their futures from one direct call.
        Returns whether any batch was taken."""
        with self._mu:
            queued = self._pending.get(key, [])
            group, rows = [], 0
            while queued and (not group
                              or rows + queued[0][0].shape[0]
                              <= self._max_rows):
                q, f = queued.pop(0)
                group.append((q, f))
                rows += q.shape[0]
        if not group:
            return False
        self.group_sizes[len(group)] = self.group_sizes.get(
            len(group), 0) + 1
        try:
            if len(group) == 1:
                dists, keys = self._direct(group[0][0], k, overfetch)
                group[0][1].set_result((dists, keys))
                return True
            stacked = np.concatenate(
                [np.asarray(q, np.float32) for q, _ in group])
            # pad the stack to the next power of two: group sizes vary
            # call to call, and each distinct query count is a separate
            # XLA compile (~30 s cold on big corpora)
            pad = (1 << (rows - 1).bit_length()) - rows
            if pad:
                stacked = np.concatenate(
                    [stacked, np.zeros((pad, stacked.shape[1]),
                                       np.float32)])
            dists, keys = self._direct(stacked, k, overfetch)
            lo = 0
            for q, f in group:
                hi = lo + q.shape[0]
                f.set_result((dists[lo:hi], keys[lo:hi]))
                lo = hi
        except BaseException as e:
            for _, f in group:
                if not f.done():
                    f.set_exception(e)
        return True
