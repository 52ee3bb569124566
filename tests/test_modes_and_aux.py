"""Search-mode variants, profiler hooks, multi-host bootstrap info."""

import os

import numpy as np
import pytest

from tpuvdb.core.config import DBConfig
from tpuvdb.core.types import SearchRequest, VectorData
from tpuvdb.engine.engine import VectorDBEngine


@pytest.mark.parametrize("mode", ["exact", "approx", "pallas"])
def test_engine_search_modes(rng, mode):
    # on CPU, "pallas" falls back to approx and approx falls back to exact
    # top-k — all three must produce correct results through the engine
    cfg = DBConfig(vector_dim=16, shard_count=2, shard_capacity=2048,
                   block_size=128, search_mode=mode)
    eng = VectorDBEngine(cfg)
    vecs = {}
    batch = []
    for i in range(150):
        v = rng.standard_normal(16).astype(np.float32)
        vecs[f"k{i}"] = v
        batch.append(VectorData(key=f"k{i}", vector=v))
    eng.put_batch(batch)
    r = eng.search(SearchRequest(query_vector=vecs["k77"], top_k=5))
    assert r.success
    assert r.search_result.keys[0] == "k77"
    assert r.search_result.scores == sorted(r.search_result.scores)


def test_stage_timer_snapshot(rng):
    eng = VectorDBEngine(DBConfig(vector_dim=8, shard_count=2,
                                  shard_capacity=512, block_size=128))
    eng.put(VectorData(key="a", vector=np.zeros(8, np.float32)))
    eng.search(SearchRequest(query_vector=np.zeros(8), top_k=1))
    snap = eng.info()["latency"]
    assert "search.device" in snap
    assert snap["search.device"]["count"] >= 1
    assert snap["search.device"]["p50_ms"] >= 0


def test_device_trace_writes_profile(tmp_path):
    import jax.numpy as jnp

    from tpuvdb.utils.tracing import device_trace

    with device_trace(str(tmp_path)):
        (jnp.ones((64, 64)) @ jnp.ones((64, 64))).block_until_ready()
    # a trace directory with at least one file must exist
    found = [f for _, _, files in os.walk(tmp_path) for f in files]
    assert found, "no profiler output written"


def test_bootstrap_single_host_info():
    from tpuvdb.cluster.bootstrap import initialize_multihost

    info = initialize_multihost()
    assert info["process_count"] >= 1
    assert info["global_devices"] >= 1
    assert info["process_index"] == 0


def test_fast_init_embedder_matches_contract():
    from tpuvdb.embed.clip import CLIPConfig, CLIPEmbedder

    cfg = CLIPConfig(embed_dim=16, vocab_size=256, text_width=32,
                     text_layers=1, text_heads=2, context_length=8,
                     image_size=32, patch_size=32, vision_width=32,
                     vision_layers=1, vision_heads=2)
    e = CLIPEmbedder(cfg, fast_init=True)
    v = e.text2vec("hello world")
    assert v.shape == (16,)
    assert abs(np.linalg.norm(v) - 1.0) < 1e-4
    assert np.isfinite(v).all()
