"""Narrative integration test: the reference's three call stacks
(SURVEY.md §3) executed end-to-end against tpuvdb.

  §3.4 register -> §3.1 put (write path) -> §3.2 text->image search (read
  path) -> §3.3 restart/recovery — one continuous story, the workflow a
  user of the reference would migrate."""

import numpy as np
import pytest

from tpuvdb.api.server import DBServer
from tpuvdb.api.service import DBService
from tpuvdb.api.client import DBClient
from tpuvdb.core.config import DBConfig
from tpuvdb.embed.clip import CLIPConfig, CLIPEmbedder


def tiny_embedder():
    return CLIPEmbedder(CLIPConfig(
        embed_dim=32, vocab_size=512, text_width=64, text_layers=2,
        text_heads=2, context_length=16, image_size=64, patch_size=32,
        vision_width=64, vision_layers=2, vision_heads=2,
    ))


def test_reference_workflow(tmp_path, rng):
    cfg = DBConfig(vector_dim=32, shard_count=4, replica_count=2,
                   shard_capacity=2048, block_size=128)
    data_dir = str(tmp_path / "db")
    emb = tiny_embedder()
    svc = DBService(cfg, data_dir=data_dir, embedder=emb,
                    image_root=str(tmp_path))
    srv = DBServer(svc, port=0)
    srv.start_background()
    client = DBClient(srv.address)

    # --- §3.4 node registration / shard assignment ----------------------
    assert client.call("register_node",
                       {"node_id": "node_1",
                        "address": "127.0.0.1:9091"})["success"]
    nodes = client.call("list_nodes", {})
    assert any(n["node_id"] == "node_1" for n in nodes["nodes"])
    assert len(nodes["shard_map"]) == 4  # full round-robin reassignment

    # --- §3.1 the write path: embed images, put through the coordinator -
    from PIL import Image

    for i in range(6):  # the reference bundles 6 test_data JPEGs
        img = Image.fromarray(rng.integers(0, 255, (96, 128, 3), np.uint8))
        p = str(tmp_path / f"photo_{i}.jpg")
        img.save(p)
        r = svc.put_image(p, dataset="unsplash")
        assert r["success"], r

    # overwrite semantics: re-putting a key replaces it (§3.1 :253-261)
    r0 = svc.put_image(str(tmp_path / "photo_0.jpg"), key="photo_0.jpg",
                       dataset="unsplash")
    assert r0["success"]
    info = client.call("info", {})["info"]
    assert info["docs"] == 6

    # --- §3.2 the read path: text -> image over HTTP ---------------------
    import http.client
    import json

    conn = http.client.HTTPConnection(srv.host, srv.port)
    body = json.dumps({"text": "a cat sitting on the sofa", "topk": 3})
    conn.request("POST", "/api/search", body,
                 {"Content-Type": "application/json"})
    resp = json.loads(conn.getresponse().read())
    assert len(resp["results"]) == 3
    scores = [r["score"] for r in resp["results"]]
    assert scores == sorted(scores)  # ascending squared-L2 (ref semantics)
    assert all(r["metadata"]["dataset"] == "unsplash" for r in resp["results"])
    # the image files resolve through /static (frontend contract)
    fname = resp["results"][0]["file_path"].split("/")[-1]
    conn.request("GET", f"/static/{fname}")
    assert conn.getresponse().status == 200

    # image self-retrieval: the strongest signal the pipeline is coherent
    qv = emb.image2vec(str(tmp_path / "photo_3.jpg"))
    r = client.call("search", {"query_vector": [float(x) for x in qv],
                               "top_k": 1})
    assert r["search_result"]["keys"] == ["photo_3.jpg"]
    assert r["search_result"]["scores"][0] < 1e-3

    # --- §3.3 restart / recovery (checkpoint + WAL tail) ----------------
    assert client.call("checkpoint", {})["success"]
    srv.shutdown()
    svc.engine.wal.close()  # simulated crash: no graceful close

    svc2 = DBService(cfg, data_dir=data_dir, embedder=emb)
    assert svc2.engine.count() == 6
    hits = svc2.engine.search_hits(qv, 1)
    assert hits[0].key == "photo_3.jpg"
    svc2.close()
    svc.close()
