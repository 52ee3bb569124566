"""Stateful property test: python and native DocStore backends in lockstep.

Every rule applies the same op to both; invariants require identical
observable state (forward map, reverse map, metadata index)."""

import pytest
from hypothesis import settings, strategies as st
from hypothesis.stateful import RuleBasedStateMachine, invariant, rule

from tpuvdb import native
from tpuvdb.store.kv import DocEntry, DocStore

KEYS = [f"k{i}" for i in range(8)]
TAGS = ["x", "y", "z"]


class DocStores(RuleBasedStateMachine):
    def __init__(self):
        super().__init__()
        self.py = DocStore(backend="python")
        self.nat = DocStore(backend="native")
        self.slot = 0

    @rule(key=st.sampled_from(KEYS), shard=st.integers(0, 3),
          tag=st.sampled_from(TAGS))
    def put(self, key, shard, tag):
        self.slot += 1
        e = DocEntry(key=key, shard=shard, slot=self.slot,
                     metadata={"t": tag}, timestamp=self.slot * 10)
        p1 = self.py.put(e)
        p2 = self.nat.put(DocEntry(**e.__dict__))
        assert (p1 is None) == (p2 is None)
        if p1 is not None:
            assert (p1.shard, p1.slot, p1.metadata) == \
                (p2.shard, p2.slot, p2.metadata)

    @rule(key=st.sampled_from(KEYS))
    def delete(self, key):
        d1 = self.py.delete(key)
        d2 = self.nat.delete(key)
        assert (d1 is None) == (d2 is None)

    @invariant()
    def same_state(self):
        assert len(self.py) == len(self.nat)
        assert sorted(self.py.keys()) == sorted(self.nat.keys())
        for key in KEYS:
            a, b = self.py.get(key), self.nat.get(key)
            assert (a is None) == (b is None)
            if a is not None:
                assert (a.shard, a.slot, a.metadata, a.timestamp) == \
                    (b.shard, b.slot, b.metadata, b.timestamp)
                assert self.py.key_at(a.shard, a.slot) == key
                assert self.nat.key_at(a.shard, a.slot) == key
        for tag in TAGS:
            assert self.py.find_by_metadata({"t": tag}) == \
                self.nat.find_by_metadata({"t": tag})


DocStores.TestCase.settings = settings(
    max_examples=40, stateful_step_count=40, deadline=None)

if not native.available():  # pragma: no cover
    DocStores = pytest.mark.skip("native library unavailable")(DocStores)

TestDocStores = DocStores.TestCase
