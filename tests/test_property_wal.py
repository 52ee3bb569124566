"""Stateful property test: WAL vs a model log.

Random appends / batch appends / reopens / checkpoint-style truncations;
invariants: replay yields exactly the model's surviving last-op-per-key
records, LSNs never regress, and records past a truncation point survive.
"""

import shutil
import tempfile

import numpy as np
from hypothesis import settings, strategies as st
from hypothesis.stateful import RuleBasedStateMachine, invariant, rule

from tpuvdb.store.wal import WriteAheadLog

KEYS = [f"k{i}" for i in range(6)]


class WalModel(RuleBasedStateMachine):
    def __init__(self):
        super().__init__()
        self.dir = tempfile.mkdtemp(prefix="tpuvdb_walprop_")
        # small segments force rotation churn
        self.wal = WriteAheadLog(self.dir, max_bytes=512, fsync=False)
        self.records = []  # (seq, op, key)
        self.truncated_through = 0

    def teardown(self):
        self.wal.close()
        shutil.rmtree(self.dir, ignore_errors=True)

    @rule(key=st.sampled_from(KEYS), op=st.sampled_from(["put", "delete"]))
    def append(self, key, op):
        vec = np.arange(4, dtype=np.float32) if op == "put" else None
        self.wal.append(op, key, vector=vec)
        self.records.append((self.wal.last_seq, op, key))

    @rule(n=st.integers(min_value=1, max_value=4))
    def append_batch(self, n):
        recs = [{"op": "put", "key": KEYS[i % len(KEYS)],
                 "vector": np.full(4, i, np.float32)} for i in range(n)]
        self.wal.append_batch(recs)
        last = self.wal.last_seq
        for i, r in enumerate(recs):
            self.records.append((last - n + 1 + i, "put", r["key"]))

    @rule()
    def reopen(self):
        self.wal.close()
        self.wal = WriteAheadLog(self.dir, max_bytes=512, fsync=False)

    @rule()
    def checkpoint_truncate(self):
        pos = self.wal.last_seq
        self.wal.truncate_through(pos)
        self.truncated_through = max(self.truncated_through, pos)

    @invariant()
    def lsn_never_regresses(self):
        if self.records:
            assert self.wal.last_seq >= self.records[-1][0]

    @invariant()
    def tail_replay_exact(self):
        """Records past the truncation point replay exactly (last-op-per-key
        dedup over the tail)."""
        tail = [(s, op, k) for s, op, k in self.records
                if s > self.truncated_through]
        expect = {}
        for s, op, k in tail:
            expect[k] = (s, op)
        got = {r["key"]: (r["seq"], r["op"])
               for r in self.wal.replay(after_seq=self.truncated_through)}
        assert got == expect, (got, expect)


WalModel.TestCase.settings = settings(
    max_examples=40, stateful_step_count=40, deadline=None)
TestWalModel = WalModel.TestCase
