#!/usr/bin/env python
"""Driver entry: CLIP text->image e2e benchmark (see tpuvdb/bench/clip_e2e.py)."""

from tpuvdb.bench.clip_e2e import main

if __name__ == "__main__":
    main()
