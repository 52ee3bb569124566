"""Docstore + engine scale tests (VERDICT r2 #5 / #1): 10M-key native KV
throughput/RSS/snapshot numbers, and a subprocess RSS pin for the
mmap+int8 engine at a scaled-down ratio of the 8M x 768 capacity target.

Marked slow — run with `python -m pytest tests/test_docstore_scale.py -m slow`.
Results feed docs/BENCH_NOTES.md.
"""

import os
import resource
import subprocess
import sys
import time

import pytest

pytestmark = pytest.mark.slow


def _rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def test_native_docstore_10m_keys(tmp_path):
    from tpuvdb import native
    from tpuvdb.store.kv import DocEntry, DocStore

    if not native.available():
        pytest.skip("native library unavailable")
    N = 10_000_000
    B = 100_000
    store = DocStore(backend="native")
    rss0 = _rss_mb()
    t0 = time.perf_counter()
    for lo in range(0, N, B):
        entries = [DocEntry(key=f"key:{i:09d}", shard=i % 8, slot=i // 8,
                            metadata={}, timestamp=i)
                   for i in range(lo, lo + B)]
        store.put_many(entries)
    ingest_s = time.perf_counter() - t0
    rss_mb = _rss_mb() - rss0
    assert len(store) == N
    assert ingest_s < 300, f"10M-key ingest took {ingest_s:.0f}s"
    # C++ arena + table + reverse map; a python dict of 10M DocEntries is
    # ~4+ GB — the native store must stay under 2 GB
    assert rss_mb < 2048, f"10M keys took {rss_mb:.0f} MB RSS"

    # point ops stay O(1) at size
    t0 = time.perf_counter()
    for i in range(0, N, N // 1000):
        e = store.get(f"key:{i:09d}")
        assert e is not None and e.slot == i // 8
        assert store.key_at(i % 8, i // 8) == f"key:{i:09d}"
    assert time.perf_counter() - t0 < 2.0

    # snapshot + restore round trip
    p = str(tmp_path / "big.kv")
    t0 = time.perf_counter()
    store.dump_native(p)
    dump_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    back = DocStore.load_native_file(p, backend="native")
    load_s = time.perf_counter() - t0
    assert len(back) == N
    assert back.key_at(3, 1000) is not None
    assert dump_s < 120 and load_s < 300, (dump_s, load_s)
    print(f"\n10M keys: ingest {N/ingest_s/1e6:.2f}M/s, RSS {rss_mb:.0f}MB, "
          f"dump {dump_s:.1f}s, load {load_s:.1f}s")


_RSS_PIN_SCRIPT = r"""
import json, resource, sys, tempfile
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from tpuvdb.core.config import DBConfig
from tpuvdb.engine.engine import VectorDBEngine

N, DIM = 400_000, 768
d = tempfile.mkdtemp()
cfg = DBConfig(vector_dim=DIM, shard_count=4, shard_capacity=1 << 20,
               mirror_init_cap=N // 4 + 1024, mirror_dtype="int8",
               mirror_backend="mmap", storage_dtype="int8",
               wal_enabled=False, checkpoint_every_puts=10**9,
               compact_every_puts=10**9, search_mode="exact")
eng = VectorDBEngine(cfg, data_dir=d)
rng = np.random.default_rng(0)
base = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0
B = 16384
for lo in range(0, N, B):
    n = min(B, N - lo)
    eng.put_rows([f"k{i}" for i in range(lo, lo + n)],
                 rng.standard_normal((n, DIM)).astype(np.float32))
eng.flush()
hits = eng.search_hits(rng.standard_normal(DIM).astype(np.float32), 10)
assert len(hits) == 10
eng.save_checkpoint()
peak = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0
print(json.dumps({"base_mb": base, "peak_mb": peak,
                  "host": eng.host_bytes()}))
"""


def test_engine_rss_pinned_at_ratio(tmp_path):
    """Scaled-down pin of the capacity claim: 400k x 768 (a 1/20 ratio of
    8M) through the FULL engine (ingest + flush + search + checkpoint) in
    a fresh subprocess. The f32-era engine held corpus + device copy +
    checkpoint copy in RSS (~3x 1.2GB here); the mmap+int8 engine must
    stay under base + corpus_int8(dev) + slack. Extrapolated to 8M x 768:
    ~6.2GB device + ~1.5GB overhead < the 8GB bound."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # single CPU device: no 8x virtual buffers
    r = subprocess.run([sys.executable, "-c", _RSS_PIN_SCRIPT],
                       capture_output=True, text=True, timeout=600, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    import json

    out = json.loads(r.stdout.strip().splitlines()[-1])
    corpus_f32_mb = 400_000 * 768 * 4 / 1e6  # 1229 MB
    corpus_i8_mb = corpus_f32_mb / 4
    growth = out["peak_mb"] - out["base_mb"]
    # rows on device (CPU backend counts as RSS) + mmap page cache +
    # python overhead; must be far below what ONE f32 host mirror alone
    # would have cost, let alone the old stack+checkpoint copies (3x f32)
    assert growth < corpus_i8_mb * 2.5 + 400, (
        f"RSS grew {growth:.0f} MB (int8 corpus is {corpus_i8_mb:.0f} MB)")
    assert out["host"]["mirror_ram"] == 0
    print(f"\nRSS pin: base {out['base_mb']:.0f} MB, "
          f"peak {out['peak_mb']:.0f} MB, growth {growth:.0f} MB "
          f"(f32 corpus would be {corpus_f32_mb:.0f} MB)")
