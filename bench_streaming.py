#!/usr/bin/env python
"""Driver entry: streaming ingest benchmark (see tpuvdb/bench/streaming.py)."""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tpuvdb_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

from tpuvdb.bench.streaming import main

if __name__ == "__main__":
    main()
