#!/usr/bin/env python
"""Driver entry: CLIP text->image e2e benchmark (see tpuvdb/bench/clip_e2e.py)."""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tpuvdb_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

from tpuvdb.bench.clip_e2e import main

if __name__ == "__main__":
    main()
