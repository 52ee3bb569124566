"""HTTP server + client + CLI end-to-end against an in-process service."""

import json

import numpy as np
import pytest
from click.testing import CliRunner

from tpuvdb.api.cli import cli
from tpuvdb.api.client import DBClient
from tpuvdb.api.server import DBServer
from tpuvdb.api.service import DBService
from tpuvdb.core.config import DBConfig


def small_config():
    return DBConfig(vector_dim=8, shard_count=4, shard_capacity=1024, block_size=128)


@pytest.fixture()
def server():
    svc = DBService(small_config())
    srv = DBServer(svc, port=0)  # ephemeral port
    srv.start_background()
    yield srv
    srv.shutdown()
    svc.close()


def test_http_roundtrip(server, rng):
    client = DBClient(server.address)
    v = rng.standard_normal(8).astype(np.float32)
    r = client.call("put", {"key": "a", "vector": v.tolist(),
                            "metadata": {"tag": "x"}})
    assert r["success"], r
    r = client.call("get", {"key": "a"})
    assert r["success"]
    np.testing.assert_allclose(r["vector_data"]["vector"], v, rtol=1e-6)

    r = client.call("search", {"query_vector": v.tolist(), "top_k": 1})
    assert r["success"]
    assert r["search_result"]["keys"] == ["a"]

    r = client.call("delete", {"key": "a"})
    assert r["success"]
    assert not client.call("get", {"key": "a"})["success"]

    # unknown method -> failed Response, not HTTP error
    r = client.call("nope", {})
    assert not r["success"] and "unknown method" in r["message"]


def test_search_batch_rpc(server, rng):
    client = DBClient(server.address)
    vecs = {}
    for i in range(20):
        v = rng.standard_normal(8).astype(np.float32)
        vecs[f"b{i}"] = v
        client.call("put", {"key": f"b{i}", "vector": v.tolist()})
    qs = [vecs["b3"].tolist(), vecs["b7"].tolist()]
    r = client.call("search_batch", {"query_vectors": qs, "top_k": 2})
    assert r["success"], r
    assert len(r["results"]) == 2
    assert r["results"][0]["keys"][0] == "b3"
    assert r["results"][1]["keys"][0] == "b7"
    # dim mismatch is a clean failure
    r = client.call("search_batch", {"query_vectors": [[1.0, 2.0]]})
    assert not r["success"]


def test_register_and_list_nodes(server):
    client = DBClient(server.address)
    r = client.call("register_node", {"node_id": "ext1", "address": "127.0.0.1:9999"})
    assert r["success"]
    r = client.call("list_nodes", {})
    ids = {n["node_id"] for n in r["nodes"]}
    assert "ext1" in ids
    assert any(n["virtual"] for n in r["nodes"])
    assert r["shard_map"]


def test_static_path_traversal_blocked(server, tmp_path):
    import http.client

    conn = http.client.HTTPConnection(server.host, server.port)
    for path in ("/static/../../etc/passwd", "/static/..%2f..%2fetc%2fpasswd"):
        conn.request("GET", path)
        resp = conn.getresponse()
        body = resp.read()
        assert resp.status in (400, 404), (path, resp.status)
        assert b"root:" not in body


def test_healthz_and_frontend(server):
    import http.client

    conn = http.client.HTTPConnection(server.host, server.port)
    conn.request("GET", "/healthz")
    assert json.loads(conn.getresponse().read())["ok"]
    conn.request("GET", "/")
    resp = conn.getresponse()
    body = resp.read().decode()
    assert resp.status == 200 and "tpuvdb" in body


def test_cli_embedded(tmp_data_dir, rng, monkeypatch):
    monkeypatch.setenv("TPUVDB_VECTOR_DIM", "8")
    runner = CliRunner()
    vec = ",".join(str(x) for x in rng.standard_normal(8))
    base = ["--data-dir", tmp_data_dir]
    # "--" guards vectors whose first component is negative
    r = runner.invoke(cli, base + ["put", "-m", "color=red", "--", "k1", vec])
    assert r.exit_code == 0, r.output
    r = runner.invoke(cli, base + ["get", "k1"])
    assert r.exit_code == 0 and "color" in r.output
    r = runner.invoke(cli, base + ["search", "-k", "3", "--", vec])
    assert r.exit_code == 0 and "k1" in r.output
    r = runner.invoke(cli, base + ["list-nodes"])
    assert r.exit_code == 0 and "online" in r.output
    r = runner.invoke(cli, base + ["delete", "k1"])
    assert r.exit_code == 0
    r = runner.invoke(cli, base + ["get", "k1"])
    assert r.exit_code == 1


def test_cli_remote(server, rng):
    runner = CliRunner()
    vec = ",".join(str(x) for x in rng.standard_normal(8))
    base = ["--coord-addr", server.address]
    r = runner.invoke(cli, base + ["put", "--", "rk", vec])
    assert r.exit_code == 0, r.output
    r = runner.invoke(cli, base + ["search", "--", vec])
    assert r.exit_code == 0 and "rk" in r.output
    r = runner.invoke(cli, base + ["info"])
    assert r.exit_code == 0 and '"docs"' in r.output


def test_put_batch_rpc_and_misspelled_field(server, rng):
    client = DBClient(server.address)
    vs = rng.standard_normal((4, 8)).astype(np.float32)
    recs = [{"key": f"b{i}", "vector": vs[i].tolist()} for i in range(4)]
    r = client.call("put_batch", {"records": recs})
    assert r["success"], r
    r = client.call("search", {"query_vector": vs[2].tolist(), "top_k": 1})
    assert r["search_result"]["keys"] == ["b2"]
    # a misspelled field used to "succeed" as an empty batch (cost a false
    # bug hunt in round 3) — it must fail loudly now
    r = client.call("put_batch", {"items": recs})
    assert not r["success"] and "records" in r["message"]
    # an explicit empty batch is still a valid no-op
    assert client.call("put_batch", {"records": []})["success"]
