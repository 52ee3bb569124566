#!/usr/bin/env python
"""Driver entry: headline scan benchmark (see tpuvdb/bench/scan.py).
Prints ONE JSON line to stdout; diagnostics to stderr."""

import os

# persistent compile cache: repeat runs skip the 1-2 min XLA compiles
# (harmless no-op if the backend can't serialize executables)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tpuvdb_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

from tpuvdb.bench.scan import main

if __name__ == "__main__":
    main()
