#!/usr/bin/env python
"""Driver entry: streaming ingest benchmark (see tpuvdb/bench/streaming.py)."""

from tpuvdb.bench.streaming import main

if __name__ == "__main__":
    main()
