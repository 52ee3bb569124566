"""Bulk export/import round trip (the get_all_vectors analog, done right)."""

import numpy as np
from click.testing import CliRunner

from tpuvdb.api.cli import cli
from tpuvdb.api.service import DBService
from tpuvdb.core.config import DBConfig
from tpuvdb.core.types import VectorData


def test_export_rpc_pagination(rng):
    svc = DBService(DBConfig(vector_dim=8, shard_count=2,
                             shard_capacity=1024, block_size=128))
    for i in range(25):
        svc.engine.put(VectorData(key=f"e{i:02d}",
                                  vector=rng.standard_normal(8),
                                  metadata={"i": str(i)}))
    seen = []
    cursor = 0
    while cursor >= 0:
        r = svc.handle("export", {"cursor": cursor, "limit": 10})
        assert r["success"]
        seen.extend(rec["key"] for rec in r["records"])
        cursor = r["cursor"]
    assert sorted(seen) == [f"e{i:02d}" for i in range(25)]
    assert len(seen) == len(set(seen))
    svc.close()


def test_cli_export_import_roundtrip(tmp_path, rng, monkeypatch):
    monkeypatch.setenv("TPUVDB_VECTOR_DIM", "8")
    runner = CliRunner()
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    dump = str(tmp_path / "dump.msgpack")

    base_src = ["--data-dir", src]
    vec = {}
    for i in range(15):
        v = rng.standard_normal(8)
        vec[f"x{i}"] = v
        arg = ",".join(f"{x:.6f}" for x in v)
        r = runner.invoke(cli, base_src + ["put", "-m", f"i={i}", "--",
                                          f"x{i}", arg])
        assert r.exit_code == 0, r.output
    r = runner.invoke(cli, base_src + ["export", dump])
    assert r.exit_code == 0 and "exported 15" in r.output

    r = runner.invoke(cli, ["--data-dir", dst, "import", dump])
    assert r.exit_code == 0 and "imported 15" in r.output
    r = runner.invoke(cli, ["--data-dir", dst, "get", "x7"])
    assert r.exit_code == 0 and "'i': '7'" in r.output.replace('"', "'")
