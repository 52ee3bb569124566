#!/usr/bin/env python
"""Fetch evaluation datasets (parity: Scripts/download_dataset.py, which
pulls the unsplash-25k photo corpus).

Supports:
  unsplash25k — photo corpus for the CLIP text->image demo
  sift1m      — the ANN benchmark corpus (BASELINE config 2)

Zero-egress environments can't download; point TPUVDB_DATASET_DIR at a
pre-populated directory instead, or use bench.py's synthetic corpus.
"""

import argparse
import os
import sys
import tarfile
import urllib.request

DATASETS = {
    "unsplash25k": (
        "https://huggingface.co/datasets/jamescalam/unsplash-25k-photos/resolve/main/photos.tsv000",
        "photos.tsv",
    ),
    "sift1m": (
        "ftp://ftp.irisa.fr/local/texmex/corpus/sift.tar.gz",
        "sift.tar.gz",
    ),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dataset", choices=sorted(DATASETS))
    ap.add_argument("--out", default=os.environ.get("TPUVDB_DATASET_DIR", "datasets"))
    args = ap.parse_args()
    url, fname = DATASETS[args.dataset]
    os.makedirs(args.out, exist_ok=True)
    dest = os.path.join(args.out, fname)
    if os.path.exists(dest):
        print(f"already present: {dest}")
        return
    print(f"downloading {url} -> {dest}")
    try:
        urllib.request.urlretrieve(url, dest)
    except Exception as e:
        print(f"download failed ({e}); this environment may have no egress",
              file=sys.stderr)
        sys.exit(1)
    if dest.endswith(".tar.gz"):
        with tarfile.open(dest) as tf:
            tf.extractall(args.out)
        print(f"extracted to {args.out}")


if __name__ == "__main__":
    main()
