#!/usr/bin/env python
"""Convert text file encodings (parity: Scripts/trasfer_gbk.py, which
converts GBK-encoded files to UTF-8)."""

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("--from-enc", default="gbk")
    ap.add_argument("--to-enc", default="utf-8")
    args = ap.parse_args()
    with open(args.src, "r", encoding=args.from_enc, errors="replace") as f:
        text = f.read()
    with open(args.dst, "w", encoding=args.to_enc) as f:
        f.write(text)
    print(f"converted {args.src} ({args.from_enc}) -> {args.dst} ({args.to_enc})")


if __name__ == "__main__":
    main()
