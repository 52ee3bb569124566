from tpuvdb.cluster.membership import NodeRegistry, NodeInfo

__all__ = ["NodeRegistry", "NodeInfo"]
