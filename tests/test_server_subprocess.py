"""Ops-level end-to-end: launch `tpuvdb serve` as a real subprocess (the
way scripts/start_server.sh does), drive it over HTTP, shut it down."""

import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest

from tpuvdb.api.client import DBClient


def _free_port() -> int:
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_serve_subprocess_roundtrip(tmp_path, rng):
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["TPUVDB_PLATFORM"] = "cpu"  # site hooks may clobber JAX_PLATFORMS
    env["TPUVDB_LOG_LEVEL"] = "DEBUG"
    env["TPUVDB_HTTP_LOG"] = "1"
    # persistent compile cache: the subprocess otherwise cold-compiles every
    # run (minutes on a contended single core)
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/tpuvdb_jax_cache"
    env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "1"
    env["TPUVDB_VECTOR_DIM"] = "8"
    env["TPUVDB_SHARD_CAPACITY"] = "1024"
    proc = subprocess.Popen(
        [sys.executable, "-m", "tpuvdb.api.cli", "serve",
         "--port", str(port), "--data-dir", str(tmp_path / "db"),
         "--no-mesh"],
        env=env, cwd=os.path.dirname(os.path.dirname(__file__)),
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
    )
    # generous: the first search triggers the subprocess's first XLA compile
    # on a single contended CPU core (observed up to ~90 s in-suite)
    client = DBClient(f"127.0.0.1:{port}", timeout=300)
    try:
        # generous: the subprocess pays a cold jax import on a single
        # contended CPU core (slowest when the rest of the suite ran first)
        import http.client

        # 600 s: a COLD-cache XLA compile in the subprocess measured
        # >375 s when the host is loaded (compile-cache hits take ~90 s)
        deadline = time.monotonic() + 600
        healthy = False
        while time.monotonic() < deadline:
            if proc.poll() is not None:
                out = proc.stdout.read().decode(errors="replace")
                pytest.fail(f"server died during startup (rc={proc.returncode}); "
                            f"output:\n{out[-4000:]}")
            try:
                conn = http.client.HTTPConnection("127.0.0.1", port, timeout=2)
                conn.request("GET", "/healthz")
                if conn.getresponse().status == 200:
                    healthy = True
                    break
            except (OSError, http.client.HTTPException):
                pass
            time.sleep(1)
        if not healthy:
            proc.send_signal(signal.SIGKILL)
            out = proc.stdout.read().decode(errors="replace")
            pytest.fail(f"server never became healthy; output:\n{out[-4000:]}")

        v = rng.standard_normal(8).astype(np.float32)
        try:
            assert client.call("put", {"key": "sp", "vector": v.tolist()})["success"]
            r = client.call("search", {"query_vector": v.tolist(), "top_k": 1})
            assert r["success"] and r["search_result"]["keys"] == ["sp"]
            r = client.call("list_nodes", {})
            assert r["success"] and r["nodes"]
        except Exception:
            proc.send_signal(signal.SIGKILL)
            out = proc.stdout.read().decode(errors="replace")
            pytest.fail(f"RPC failed; server output:\n{out[-4000:]}")
    finally:
        proc.send_signal(signal.SIGTERM)
        try:
            proc.wait(timeout=15)
        except subprocess.TimeoutExpired:
            proc.kill()
    # graceful shutdown wrote a final checkpoint (engine.close in serve)
    ckpts = (tmp_path / "db" / "checkpoints")
    assert ckpts.exists() and any(ckpts.iterdir())
