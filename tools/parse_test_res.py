#!/usr/bin/env python
"""Aggregate results across seeds/runs — the ``parse_test_res.py`` the
reference's ``run_parse.sh`` scripts call but never ship (SURVEY.md §2.5;
scripts/mudpt/run_parse.sh:22-27 greps ``accuracy`` / ``macro_f1``).

Reads either structured ``metrics.jsonl`` (preferred, written by this
framework) or plain ``log.txt`` files (reference-style prose), walks a
directory tree of runs (e.g. output/<dataset>/<cfg>/seed_*), and prints
mean +/- std per metric per group.

Usage:
  python tools/parse_test_res.py OUTPUT_DIR [--keyword accuracy macro_f1]
      [--group-depth N] [--split test]
"""

from __future__ import annotations

import argparse
import json
import os
import re
from collections import defaultdict
from statistics import mean, stdev


def read_metrics_jsonl(path: str, split: str):
    results = {}
    with open(path) as f:
        for line in f:
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            if rec.get("kind") == "eval" and rec.get("split") == split:
                results = {
                    k: v
                    for k, v in rec.items()
                    if isinstance(v, (int, float)) and k not in ("time", "epoch")
                }
    return results


def read_log_txt(path: str, keywords):
    """Parse reference-style prose logs: lines like '* accuracy: 82.3%'."""
    results = {}
    with open(path, errors="replace") as f:
        for line in f:
            for kw in keywords:
                m = re.search(rf"{re.escape(kw)}[:=\s]+([0-9.]+)", line)
                if m:
                    results[kw] = float(m.group(1))
    return results


def collect(root: str, split: str, keywords):
    runs = []
    for dirpath, _dirnames, filenames in os.walk(root):
        res = None
        if "metrics.jsonl" in filenames:
            res = read_metrics_jsonl(os.path.join(dirpath, "metrics.jsonl"), split)
        if not res and "log.txt" in filenames:
            res = read_log_txt(os.path.join(dirpath, "log.txt"), keywords)
        if res:
            runs.append((os.path.relpath(dirpath, root), res))
    return runs


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("directory")
    ap.add_argument("--keyword", nargs="+", default=["accuracy", "macro_f1"])
    ap.add_argument("--split", default="test")
    ap.add_argument(
        "--group-depth",
        type=int,
        default=-1,
        help="group runs by the first N path components (-1: all in one group)",
    )
    args = ap.parse_args()

    runs = collect(args.directory, args.split, args.keyword)
    if not runs:
        print(f"No results found under {args.directory}")
        return

    groups = defaultdict(list)
    for rel, res in runs:
        if args.group_depth >= 0:
            key = "/".join(rel.split(os.sep)[: args.group_depth]) or "."
        else:
            key = "."
        groups[key].append(res)

    for key in sorted(groups):
        rows = groups[key]
        print(f"== {key}  ({len(rows)} runs)")
        for kw in args.keyword:
            vals = [r[kw] for r in rows if kw in r]
            if not vals:
                continue
            sd = stdev(vals) if len(vals) > 1 else 0.0
            print(f"   {kw}: {mean(vals):.2f} +/- {sd:.2f}  (n={len(vals)})")


if __name__ == "__main__":
    main()
