"""Federated coordinator: multi-host deployments over DCN/TCP.

Within one TPU slice, tpuvdb needs no coordinator process — the mesh is the
cluster (one XLA program owns every shard). Across slices/pods WITHOUT
shared ICI, the reference's coordinator/datanode topology is the right
shape, and this module is its rebuild:

  * data nodes are plain `tpuvdb serve` instances that register here
    (each one internally a full mesh-sharded engine);
  * `put`/`get`/`delete` route by MD5 shard hash to the shard's master
    node (src/coordinator/handler.py:117-170 semantics), with
    mark-offline-on-connection-failure (handler.py:128-130);
  * `search` fans out to ALL online nodes IN PARALLEL and merges with
    dedup-by-key + ascending sort + truncation
    (src/coordinator/handler.py:173-228 — which fans out sequentially;
    latency there is the sum of per-node round trips, here the max);
  * node failure mid-search degrades to partial results, matching the
    reference's skip-and-continue behavior (handler.py:197-199).

Replication: puts are also forwarded to slave nodes via the `replicate`
RPC (REPLICA_COUNT semantics the reference declares but never implements).
"""

from __future__ import annotations

import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Dict, List, Optional

from tpuvdb.api.client import DBClient
from tpuvdb.cluster.membership import NodeRegistry
from tpuvdb.core.config import DBConfig
from tpuvdb.core.types import Response, SearchRequest, SearchResult, VectorData
from tpuvdb.utils.logging import get_logger
from tpuvdb.utils.sharding_utils import get_shard_id

logger = get_logger("tpuvdb.federation")


class FederatedCoordinator:
    def __init__(self, config: Optional[DBConfig] = None,
                 max_workers: int = 16):
        self.config = config or DBConfig()
        self.registry = NodeRegistry(
            shard_count=self.config.shard_count,
            replica_count=self.config.replica_count,
            health_interval_s=self.config.health_check_interval_s,
        )
        self._clients: Dict[str, DBClient] = {}
        self._clients_lock = threading.Lock()
        self._pool = ThreadPoolExecutor(max_workers=max_workers,
                                        thread_name_prefix="tpuvdb-fed")

    # ---------------------------------------------------------------- helpers

    def _client(self, node_id: str) -> Optional[DBClient]:
        node = self.registry.get_node(node_id)
        if node is None or not node.online:
            return None
        with self._clients_lock:
            c = self._clients.get(node_id)
            if c is None:
                c = DBClient(node.address, timeout=self.config.rpc_timeout_s)
                self._clients[node_id] = c
            return c

    def _call_node(self, node_id: str, method: str,
                   params: Dict[str, Any]) -> Optional[Dict[str, Any]]:
        """One RPC; connection failure marks the node offline (ref parity)."""
        c = self._client(node_id)
        if c is None:
            return None
        try:
            return c.call(method, params)
        except OSError as e:
            logger.warning("node %s unreachable (%s); marking offline",
                           node_id, e)
            self.registry.mark_offline(node_id)
            return None

    def _master_for_key(self, key: str) -> Optional[str]:
        shard = get_shard_id(key, self.config.shard_count)
        nodes = self.registry.get_shard_nodes(shard)
        return nodes["master"][0] if nodes["master"] else None

    def _slaves_for_key(self, key: str) -> List[str]:
        shard = get_shard_id(key, self.config.shard_count)
        return self.registry.get_shard_nodes(shard)["slaves"]

    # ------------------------------------------------------------ membership

    def register_node(self, node_id: str, address: str) -> Response:
        self.registry.register_node(node_id, address)
        logger.info("registered node %s at %s", node_id, address)
        return Response.ok(f"registered {node_id}")

    # ------------------------------------------------------------------- ops

    def put(self, data: VectorData) -> Response:
        master = self._master_for_key(data.key)
        if master is None:
            return Response.fail(
                f"no online node for shard of key {data.key!r}")
        r = self._call_node(master, "put", data.to_dict())
        if r is None:
            return Response.fail(f"master {master} unreachable")
        # replicate to slaves (best effort; the reference declares this and
        # never does it — SURVEY.md §2.3)
        for slave in self._slaves_for_key(data.key):
            self._pool.submit(self._call_node, slave, "replicate",
                              {"op_type": "put", "data": data.to_dict(),
                               "no_wal": False})
        return Response.from_dict(r)

    def get(self, key: str) -> Response:
        master = self._master_for_key(key)
        if master is None:
            return Response.fail(f"no online node for shard of key {key!r}")
        r = self._call_node(master, "get", {"key": key})
        if r is None:
            # failover read: slaves hold real replicas here
            for slave in self._slaves_for_key(key):
                r = self._call_node(slave, "get", {"key": key})
                if r is not None:
                    break
        return Response.from_dict(r) if r else Response.fail(
            f"no reachable replica for key {key!r}")

    def delete(self, key: str) -> Response:
        master = self._master_for_key(key)
        if master is None:
            return Response.fail(f"no online node for shard of key {key!r}")
        r = self._call_node(master, "delete", {"key": key})
        for slave in self._slaves_for_key(key):
            self._pool.submit(self._call_node, slave, "replicate",
                              {"op_type": "delete", "data": {"key": key}})
        return Response.from_dict(r) if r else Response.fail(
            f"master {master} unreachable")

    def search(self, req: SearchRequest) -> Response:
        """Parallel scatter-gather with dedup-by-key + ascending merge."""
        nodes = self.registry.online_nodes()
        if not nodes:
            return Response.fail("no online nodes")
        params = req.to_dict()
        futures = {
            nid: self._pool.submit(self._call_node, nid, "search", params)
            for nid in nodes
        }
        best: Dict[str, Dict[str, Any]] = {}  # key -> hit (lowest score wins)
        reached = 0
        for nid, fut in futures.items():
            r = fut.result()
            if not r or not r.get("success"):
                continue  # skip-and-continue (ref handler.py:197-199)
            reached += 1
            sr = r.get("search_result") or {}
            for i, key in enumerate(sr.get("keys", [])):
                score = sr["scores"][i]
                cur = best.get(key)
                if cur is None or score < cur["score"]:
                    best[key] = {
                        "score": score,
                        "vector": sr["vectors"][i] if i < len(sr.get("vectors", [])) else [],
                        "metadata": sr["metadatas"][i] if i < len(sr.get("metadatas", [])) else {},
                    }
        if reached == 0:
            return Response.fail("all nodes unreachable")
        ordered = sorted(best.items(), key=lambda kv: kv[1]["score"])
        k = req.top_k if req.top_k > 0 else self.config.default_top_k
        out = SearchResult()
        for key, h in ordered[:k]:
            out.keys.append(key)
            out.scores.append(float(h["score"]))
            out.vectors.append(list(h["vector"]))
            out.metadatas.append(dict(h["metadata"]))
        return Response.ok(f"{len(out)} results ({reached} nodes)",
                           search_result=out)

    # ------------------------------------------------------- HTTP dispatch
    # duck-types DBService.handle() so tpuvdb.api.server.DBServer can serve
    # a coordinator directly (`tpuvdb coordinate`)

    image_root = None

    def handle(self, method: str, params: Dict[str, Any]) -> Dict[str, Any]:
        try:
            if method == "put":
                return self.put(VectorData.from_dict(params)).to_dict()
            if method == "get":
                return self.get(params["key"]).to_dict()
            if method == "delete":
                return self.delete(params["key"]).to_dict()
            if method == "search":
                return self.search(SearchRequest.from_dict(params)).to_dict()
            if method == "register_node":
                return self.register_node(params["node_id"],
                                          params["address"]).to_dict()
            if method == "list_nodes":
                nodes = [
                    {"node_id": n.node_id, "address": n.address,
                     "online": n.online, "virtual": n.is_virtual}
                    for n in self.registry.list_nodes()
                ]
                d = Response.ok(f"{len(nodes)} nodes").to_dict()
                d["nodes"] = nodes
                d["shard_map"] = {str(k): v for k, v
                                  in self.registry.shard_map().items()}
                return d
            return Response.fail(f"unknown method: {method}").to_dict()
        except Exception as e:
            return Response.fail(f"{type(e).__name__}: {e}").to_dict()

    def text_search(self, text: str, topk: int = 5) -> Dict[str, Any]:
        raise NotImplementedError(
            "text search runs on data nodes; query them directly")

    def close(self):
        self.registry.stop_health_loop()
        self._pool.shutdown(wait=False)
        with self._clients_lock:
            for c in self._clients.values():
                c.close()
