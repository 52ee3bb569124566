"""Coordinator routing semantics: ops fail when the shard master is offline."""

import numpy as np

from tpuvdb.api.service import DBService
from tpuvdb.core.config import DBConfig
from tpuvdb.utils.sharding_utils import get_shard_id


def test_ops_fail_when_shard_offline(rng):
    svc = DBService(DBConfig(vector_dim=8, shard_count=4,
                             shard_capacity=512, block_size=128))
    v = rng.standard_normal(8).tolist()
    assert svc.handle("put", {"key": "a", "vector": v})["success"]

    # drain every virtual node -> all shards lose their master
    for n in svc.registry.list_nodes():
        svc.registry.mark_offline(n.node_id)
    r = svc.handle("put", {"key": "b", "vector": v})
    assert not r["success"] and "no online node" in r["message"]
    assert not svc.handle("get", {"key": "a"})["success"]
    assert not svc.handle("delete", {"key": "a"})["success"]

    # bring one node back: only keys whose shard failed over to it succeed
    svc.registry.mark_online("shard_0")
    shard_a = get_shard_id("a", 4)
    assert svc.registry.get_shard_nodes(shard_a)["master"] == ["shard_0"]
    assert svc.handle("get", {"key": "a"})["success"]
    svc.close()
