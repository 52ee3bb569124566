"""tpuvdb — TPU-native distributed vector database.

A brand-new JAX/XLA/Pallas rebuild of the capabilities of the reference
system `f1ybaozii/Distributed-Vector-Database` (coordinator/datanode vector
DB over Thrift+ZooKeeper with hnswlib ANN per node). Instead of that process
topology, each TPU chip owns a vector shard resident in HBM, per-shard search
is a fused distance+top-k scan, and the cross-shard merge is a collective
top-k reduction inside one XLA program.

Reference parity map (see SURVEY.md):
  core/      wire types          <- src/vector_db.thrift:13-49
  kernels/   distance+topk scan  <- hnswlib knn_query (src/datanode/handler.py:364)
  index/     shard layout        <- hnswlib index + soft-delete set
  mesh/      collective search   <- coordinator scatter-gather (src/coordinator/handler.py:173-228)
  store/     WAL + KV + ckpt     <- wal_manager.py, plyvel LevelDB, checkpoints
  engine/    put/get/delete/search orchestration <- datanode/coordinator handlers
  embed/     flax CLIP towers    <- clip/embedding.py
  api/       CLI + HTTP          <- src/cli/main_cli.py, clip/backend.py
  cluster/   membership/health   <- src/utils/zk_manager.py
"""

__version__ = "0.1.0"


def __getattr__(name):
    # lazy top-level conveniences (keep `import tpuvdb` free of jax imports)
    if name == "VectorDBEngine":
        from tpuvdb.engine.engine import VectorDBEngine

        return VectorDBEngine
    if name == "DBConfig":
        from tpuvdb.core.config import DBConfig

        return DBConfig
    if name in ("VectorData", "SearchRequest", "SearchResult", "Response"):
        from tpuvdb.core import types

        return getattr(types, name)
    raise AttributeError(f"module 'tpuvdb' has no attribute {name!r}")
