"""Membership / shard-map / health semantics (ZK-manager parity)."""

from tpuvdb.cluster.membership import NodeRegistry
from tpuvdb.utils.sharding_utils import assign_shards_to_nodes, get_shard_id


def test_shard_id_stable():
    # MD5 routing must be deterministic and in range
    for key in ["a", "hello", "image_123.jpg"]:
        sid = get_shard_id(key, 4)
        assert 0 <= sid < 4
        assert sid == get_shard_id(key, 4)


def test_assign_round_robin():
    m = assign_shards_to_nodes(["n0", "n1", "n2"], shard_count=4, replica_count=2)
    assert m[0]["master"] == ["n0"]
    assert m[1]["master"] == ["n1"]
    assert m[3]["master"] == ["n0"]
    assert "n0" not in m[0]["slaves"] and len(m[0]["slaves"]) == 2


def test_register_and_failover():
    reg = NodeRegistry(shard_count=4, replica_count=2)
    reg.register_node("n0", "10.0.0.1:9090")
    reg.register_node("n1", "10.0.0.2:9090")
    nodes = {n.node_id for n in reg.list_nodes()}
    assert nodes == {"n0", "n1"}

    sm = reg.get_shard_nodes(0)
    master = sm["master"][0]
    reg.mark_offline(master)
    sm2 = reg.get_shard_nodes(0)
    assert sm2["master"] and sm2["master"][0] != master

    # all offline -> empty
    for nid in list(nodes):
        reg.mark_offline(nid)
    assert reg.get_shard_nodes(0) == {"master": [], "slaves": []}

    reg.mark_online("n1")
    assert reg.get_shard_nodes(0)["master"] == ["n1"]


def test_virtual_nodes_always_online():
    reg = NodeRegistry(shard_count=4, replica_count=2)
    reg.register_virtual_nodes(4)
    health = reg.check_health_once()
    assert all(health.values())
    assert len(reg.online_nodes()) == 4


def test_deregister_rebuilds_map():
    reg = NodeRegistry(shard_count=2, replica_count=1)
    reg.register_node("a", "h:1")
    reg.register_node("b", "h:2")
    assert reg.deregister_node("a")
    assert not reg.deregister_node("a")
    assert reg.get_shard_nodes(0)["master"] == ["b"]


def test_tcp_probe_marks_offline():
    reg = NodeRegistry(shard_count=2, replica_count=1, probe_timeout_s=0.2)
    reg.register_node("dead", "127.0.0.1:1")  # nothing listens on port 1
    health = reg.check_health_once()
    assert health == {"dead": False}
    assert reg.get_node("dead").online is False
