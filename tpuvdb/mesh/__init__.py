from tpuvdb.mesh.mesh import create_mesh, device_count
from tpuvdb.mesh.sharded import sharded_search

__all__ = ["create_mesh", "device_count", "sharded_search"]
