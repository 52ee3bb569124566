from tpuvdb.utils.sharding_utils import get_shard_id, assign_shards_to_nodes
from tpuvdb.utils.vector_utils import as_f32_matrix, l2_normalize

__all__ = [
    "get_shard_id",
    "assign_shards_to_nodes",
    "as_f32_matrix",
    "l2_normalize",
]
