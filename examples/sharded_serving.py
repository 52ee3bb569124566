"""Serving over a device mesh: shard, replicate, and batch-search.

Run: python examples/sharded_serving.py
(on CPU, simulate a mesh first:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python examples/sharded_serving.py)
"""

import numpy as np


def main():
    import jax

    from tpuvdb import DBConfig, SearchRequest, VectorData, VectorDBEngine

    ndev = len(jax.devices())
    print(f"{ndev} devices")

    if ndev >= 4 and ndev % 2 == 0:
        # 2 replica groups x ndev/2 shards: each group holds a full corpus
        # copy (fault domain) and serves half of every query batch
        from tpuvdb.mesh.replicated import create_mesh_2d

        mesh = create_mesh_2d(2, ndev // 2)
        print(f"mesh: 2 replicas x {ndev // 2} shards")
    elif ndev > 1:
        from tpuvdb.mesh.mesh import create_mesh

        mesh = create_mesh()
        print(f"mesh: {ndev} shards")
    else:
        mesh = None

    cfg = DBConfig(vector_dim=128, shard_count=4, storage_dtype="bfloat16")
    eng = VectorDBEngine(cfg, mesh=mesh)

    rng = np.random.default_rng(0)
    vecs = rng.standard_normal((50_000, 128)).astype(np.float32)
    eng.put_batch([VectorData(key=f"v{i}", vector=vecs[i])
                   for i in range(len(vecs))])

    # batched search: one collective program over the whole mesh
    queries = vecs[:64] + 0.01 * rng.standard_normal((64, 128)).astype(np.float32)
    dists, keys = eng.search_batch(queries, k=3)
    hit = sum(keys[i][0] == f"v{i}" for i in range(64))
    print(f"self-retrieval: {hit}/64, example: {keys[0][:3]}")

    r = eng.search(SearchRequest(query_vector=vecs[7], top_k=3))
    print("single query:", r.search_result.keys)


if __name__ == "__main__":
    main()
