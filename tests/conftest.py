"""Test harness: run everything on CPU with 8 virtual devices.

Per SURVEY.md §4: the reference has no tests at all; here the multi-shard
mesh, scatter-gather, and collective top-k run under pytest on a simulated
8-device CPU mesh (XLA_FLAGS=--xla_force_host_platform_device_count=8).
Must run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # hard-set: the outer env pins a TPU platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture()
def tmp_data_dir(tmp_path):
    d = tmp_path / "vdb"
    d.mkdir()
    return str(d)
