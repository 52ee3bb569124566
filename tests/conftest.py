"""Test harness: run everything on CPU with 8 virtual devices.

Per SURVEY.md §4: the reference has no tests at all; here the multi-shard
mesh, scatter-gather, and collective top-k run under pytest on a simulated
8-device CPU mesh. The outer environment pins JAX to a TPU platform and its
site hook re-exports JAX_PLATFORMS, so the env var alone is not enough —
jax.config.update is authoritative. Must run before any backend is used.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture()
def rng(request):
    """Per-test deterministic rng: seed derives from the test id, so data
    never depends on which other tests ran first (a session-scoped rng
    caused order-dependent flakes repeatedly)."""
    import zlib

    seed = zlib.crc32(request.node.nodeid.encode()) & 0xFFFF
    return np.random.default_rng(seed)


@pytest.fixture()
def tmp_data_dir(tmp_path):
    d = tmp_path / "vdb"
    d.mkdir()
    return str(d)
