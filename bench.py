#!/usr/bin/env python
"""Driver entry: headline scan benchmark (see tpuvdb/bench/scan.py).
Prints ONE JSON line to stdout; diagnostics to stderr."""

from tpuvdb.bench.scan import main

if __name__ == "__main__":
    main()
