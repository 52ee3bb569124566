"""Remote ingest/search client (VectorDBOperation parity) + registry watches."""

import numpy as np
import pytest

from tpuvdb.api.server import DBServer
from tpuvdb.api.service import DBService
from tpuvdb.cluster.membership import NodeRegistry
from tpuvdb.core.config import DBConfig
from tpuvdb.embed.clip import CLIPConfig, CLIPEmbedder


@pytest.fixture()
def clip_server():
    svc = DBService(DBConfig(vector_dim=32, shard_count=2,
                             shard_capacity=1024, block_size=128))
    srv = DBServer(svc, port=0)
    srv.start_background()
    yield srv
    srv.shutdown()
    svc.close()


def tiny_embedder():
    return CLIPEmbedder(CLIPConfig(
        embed_dim=32, vocab_size=512, text_width=64, text_layers=2,
        text_heads=2, context_length=16, image_size=64, patch_size=32,
        vision_width=64, vision_layers=2, vision_heads=2,
    ))


def test_remote_image_ingest_and_text_search(clip_server, tmp_path, rng):
    from PIL import Image

    from tpuvdb.embed.client import VectorDBOperation

    for i in range(3):
        Image.fromarray(rng.integers(0, 255, (72, 72, 3), np.uint8)).save(
            str(tmp_path / f"pic_{i}.jpg")
        )
    op = VectorDBOperation(clip_server.address, embedder=tiny_embedder(),
                           vector_dim=32)
    out = op.batch_put_images(str(tmp_path), dataset="remote", batch_size=2)
    assert out["ingested"] == 3
    res = op.text_search("whatever", top_k=2)
    assert len(res) == 2
    assert res[0]["metadata"]["dataset"] == "remote"
    assert res[0]["score"] <= res[1]["score"]

    r = op.put_image(str(tmp_path / "pic_0.jpg"), key="again")
    assert r["success"]


def test_registry_watch_callbacks():
    reg = NodeRegistry(shard_count=2, replica_count=1)
    events = []
    reg.subscribe(lambda nodes: events.append(
        {n.node_id: n.online for n in nodes}))
    reg.register_node("a", "h:1")
    reg.register_node("b", "h:2")
    reg.mark_offline("a")
    reg.deregister_node("b")
    assert len(events) == 4
    assert events[1] == {"a": True, "b": True}
    assert events[2] == {"a": False, "b": True}
    assert events[3] == {"a": False}
