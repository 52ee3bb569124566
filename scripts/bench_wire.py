#!/usr/bin/env python
"""Binary-wire vs JSON bulk-transfer measurement (VERDICT r4 weak #4).

Times the paginated export RPC — the data plane under backups, rejoin
sync, and rebalance — against one in-process data node over real HTTP,
with the client speaking (a) JSON and (b) the binary wire framing
(core/wire.py: msgpack envelope + raw-f32 vector planes). Also times a
2-node coordinator sync_all (export + replicate both directions of the
same wire). Prints one JSON line for docs/BENCH_NOTES.md.

Role parity: the reference moves bulk data as Thrift TBinaryProtocol
(/root/reference/src/coordinator/handler.py:40-44); the JSON column is
what a naive HTTP port would pay.

Usage: python scripts/bench_wire.py [--rows 100000] [--dim 512]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

if os.environ.get("TPUVDB_CPU"):
    # wire throughput is host/HTTP-bound — run the engines on CPU so the
    # measurement neither waits on nor disturbs the shared TPU relay
    # (sitecustomize pins JAX_PLATFORMS; only the config API overrides it)
    import jax

    jax.config.update("jax_platforms", "cpu")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def export_all(client, limit=2000):
    n = 0
    cursor = 0
    while cursor >= 0:
        r = client.call("export", {"cursor": cursor, "limit": limit})
        assert r["success"], r
        n += len(r["records"])
        cursor = int(r.get("cursor", -1))
    return n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=100_000)
    ap.add_argument("--dim", type=int, default=512)
    args = ap.parse_args()

    from tpuvdb.api.client import DBClient
    from tpuvdb.api.server import DBServer
    from tpuvdb.api.service import DBService
    from tpuvdb.cluster.federation import FederatedCoordinator
    from tpuvdb.core.config import DBConfig
    from tpuvdb.core.types import VectorData

    def cfg():
        return DBConfig(vector_dim=args.dim, shard_count=4,
                        replica_count=1, shard_capacity=args.rows + 4096,
                        block_size=4096, wal_enabled=False,
                        rebalance_debounce_s=0,
                        checkpoint_every_puts=10 ** 12,
                        compact_every_puts=10 ** 12)

    rng = np.random.default_rng(0)
    svc = DBService(cfg())
    srv = DBServer(svc, port=0)
    srv.start_background()
    log(f"ingesting {args.rows} x {args.dim} ...")
    B = 8192
    for lo in range(0, args.rows, B):
        hi = min(lo + B, args.rows)
        r = svc.engine.put_rows(
            [f"k{i}" for i in range(lo, hi)],
            rng.standard_normal((hi - lo, args.dim)).astype(np.float32))
        assert r.success
    payload_mb = args.rows * args.dim * 4 / 1e6

    out = {"metric": "wire_bulk_transfer", "rows": args.rows,
           "dim": args.dim, "payload_mb": round(payload_mb, 1)}
    for name, binary in (("json", False), ("binary", True)):
        c = DBClient(srv.address, timeout=300, binary=binary)
        export_all(c, limit=500)  # warm connection + code paths (small)
        t0 = time.perf_counter()
        n = export_all(c)
        dt = time.perf_counter() - t0
        assert n == args.rows, (n, args.rows)
        out[f"export_{name}_s"] = round(dt, 2)
        out[f"export_{name}_mb_s"] = round(payload_mb / dt, 1)
        log(f"export {name:>6}: {dt:7.2f} s  "
            f"({payload_mb / dt:8.1f} MB/s of vector payload)")
    out["export_speedup"] = round(
        out["export_json_s"] / out["export_binary_s"], 2)

    # sync_all between two nodes through a coordinator (export one side,
    # replicate-push the other; both directions ride the same wire)
    svc2 = DBServer(DBService(cfg()), port=0)
    svc2.start_background()
    coord = FederatedCoordinator(cfg())
    coord.register_node("n0", srv.address)
    coord.register_node("n1", svc2.address)
    t0 = time.perf_counter()
    r = coord.sync_all()
    dt = time.perf_counter() - t0
    assert r.success, r.message
    out["sync_all_2node_s"] = round(dt, 2)
    out["sync_all_peak_records"] = coord._sync_peak_records
    log(f"sync_all (binary wire, 2 nodes): {dt:.2f} s; "
        f"peak held records {coord._sync_peak_records}")
    coord.close()
    srv.shutdown()
    svc2.shutdown()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
