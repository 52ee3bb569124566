"""HTTP client for the coordinator surface.

The analog of the reference's Thrift client + connection pool
(src/coordinator/handler.py:23-72, clip/db_operation.py:29-41): plain
keep-alive HTTP with JSON bodies. Used by the CLI in remote mode and by
application-layer helpers.
"""

from __future__ import annotations

import http.client
import json
import threading
from typing import Any, Dict, Optional

from tpuvdb.core.types import Response


class DBClient:
    def __init__(self, address: str = "127.0.0.1:8081", timeout: float = 20.0):
        # timeout parity: RPC_TIMEOUT 20 s (Config/rpc_config.py:5)
        host, _, port = address.partition(":")
        self.host = host
        self.port = int(port or 8081)
        self.timeout = timeout
        self._local = threading.local()

    def _conn(self) -> http.client.HTTPConnection:
        conn = getattr(self._local, "conn", None)
        if conn is None:
            conn = http.client.HTTPConnection(self.host, self.port,
                                              timeout=self.timeout)
            self._local.conn = conn
        return conn

    def call(self, method: str, params: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
        body = json.dumps(params or {}).encode("utf-8")
        for attempt in (0, 1):  # one retry on a stale keep-alive connection
            conn = self._conn()
            try:
                conn.request("POST", f"/rpc/{method}", body,
                             {"Content-Type": "application/json"})
                resp = conn.getresponse()
                data = resp.read()
                return json.loads(data.decode("utf-8"))
            except (http.client.HTTPException, ConnectionError, OSError):
                self.close()
                if attempt:
                    raise
        raise RuntimeError("unreachable")

    def response(self, method: str, params: Optional[Dict[str, Any]] = None) -> Response:
        return Response.from_dict(self.call(method, params))

    def api_search(self, text: str, topk: int = 5) -> Dict[str, Any]:
        body = json.dumps({"text": text, "topk": topk}).encode("utf-8")
        conn = self._conn()
        conn.request("POST", "/api/search", body,
                     {"Content-Type": "application/json"})
        resp = conn.getresponse()
        return json.loads(resp.read().decode("utf-8"))

    def close(self):
        conn = getattr(self._local, "conn", None)
        if conn is not None:
            try:
                conn.close()
            except Exception:
                pass
            self._local.conn = None
