"""Property-based stateful test: the engine vs a model dict.

Hypothesis drives random sequences of put/overwrite/delete/flush/compact/
checkpoint and checks after every step that:
  * get() returns exactly the model's vector + metadata
  * searching a stored vector returns its key first at ~0 distance
  * count() matches the model
  * deleted/overwritten slots never resurface
"""

import numpy as np
from hypothesis import settings, strategies as st
from hypothesis.stateful import RuleBasedStateMachine, invariant, rule

from tpuvdb.core.config import DBConfig
from tpuvdb.core.types import SearchRequest, VectorData
from tpuvdb.engine.engine import VectorDBEngine

KEYS = [f"key{i}" for i in range(12)]
DIM = 8


class EngineModel(RuleBasedStateMachine):
    def __init__(self):
        super().__init__()
        import tempfile

        self.data_dir = tempfile.mkdtemp(prefix="tpuvdb_prop_")
        self.cfg = DBConfig(
            vector_dim=DIM, shard_count=2, shard_capacity=4096,
            block_size=128, checkpoint_every_puts=10**9,
            compact_every_puts=10**9)
        self.eng = VectorDBEngine(self.cfg, data_dir=self.data_dir)
        self.model = {}  # key -> (vector, metadata)
        self.rng = np.random.default_rng(0)

    def teardown(self):
        import shutil

        self.eng.wal.close()
        shutil.rmtree(self.data_dir, ignore_errors=True)

    @rule(key=st.sampled_from(KEYS), tag=st.sampled_from(["a", "b", "c"]))
    def put(self, key, tag):
        v = self.rng.standard_normal(DIM).astype(np.float32)
        r = self.eng.put(VectorData(key=key, vector=v, metadata={"t": tag}))
        assert r.success
        self.model[key] = (v, {"t": tag})

    @rule(key=st.sampled_from(KEYS))
    def delete(self, key):
        r = self.eng.delete(key)
        assert r.success == (key in self.model)
        self.model.pop(key, None)

    @rule()
    def flush(self):
        self.eng.flush()

    @rule()
    def compact(self):
        self.eng.compact()

    @rule()
    def checkpoint(self):
        self.eng.save_checkpoint()

    @rule()
    def crash_restart(self):
        """Simulated crash (no graceful close) + recovery: WAL-acked state
        must survive byte-for-byte."""
        self.eng.wal.close()
        self.eng = VectorDBEngine(self.cfg, data_dir=self.data_dir)

    @invariant()
    def count_matches(self):
        assert self.eng.count() == len(self.model)

    @invariant()
    def gets_match(self):
        for key, (v, md) in self.model.items():
            r = self.eng.get(key)
            assert r.success, key
            np.testing.assert_allclose(r.vector_data.vector, v, rtol=1e-6)
            assert r.vector_data.metadata == md
        for key in KEYS:
            if key not in self.model:
                assert not self.eng.get(key).success

    @invariant()
    def searches_find_current_vectors(self):
        # spot-check one live key per step (full sweep would be slow)
        if not self.model:
            return
        key = sorted(self.model)[0]
        v, _ = self.model[key]
        r = self.eng.search(SearchRequest(query_vector=v, top_k=2))
        assert r.success
        assert r.search_result.keys[0] == key, (key, r.search_result.keys)
        assert r.search_result.scores[0] < 1e-3
        # no stale keys in results
        for k2 in r.search_result.keys:
            assert k2 in self.model


EngineModel.TestCase.settings = settings(
    max_examples=40, stateful_step_count=50, deadline=None)
TestEngineModel = EngineModel.TestCase


class EngineModelIVF(EngineModel):
    """Same model, IVF index: exercises cell invalidation, the delta set,
    and re-clustering under random op sequences."""

    def __init__(self):
        super().__init__()
        self.cfg = DBConfig(
            vector_dim=DIM, shard_count=2, shard_capacity=4096,
            block_size=128, index_type="ivf", ivf_nlist=4, ivf_nprobe=4,
            ivf_kmeans_iters=3, ivf_delta_max=8,
            checkpoint_every_puts=10**9, compact_every_puts=10**9)
        self.eng.close()
        import shutil
        import tempfile

        shutil.rmtree(self.data_dir, ignore_errors=True)
        self.data_dir = tempfile.mkdtemp(prefix="tpuvdb_prop_ivf_")
        self.eng = VectorDBEngine(self.cfg, data_dir=self.data_dir)


EngineModelIVF.TestCase.settings = settings(
    max_examples=20, stateful_step_count=30, deadline=None)
TestEngineModelIVF = EngineModelIVF.TestCase
