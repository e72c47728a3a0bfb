#!/usr/bin/env python
"""Bench-trend regression gate (VERDICT r05 #5).

Compares two bench artifacts per query and FAILS (exit 1) on any
regression above the noise gate — automating the per-round check the
judge runs by hand so a slow plan never ships silently.

Inputs: BENCH_r{N}.json driver artifacts (whose ``tail`` holds the
last KBs of bench.py stdout — possibly truncated at the HEAD, so only
the queries visible in BOTH tails are compared), or raw bench.py
stdout files (one JSON line with a ``queries`` dict). Gate: new wall
> RATIO x old AND new wall > FLOOR seconds (sub-floor walls are pure
box noise).

Usage:
    python tools/bench_trend.py OLD NEW [--ratio 1.5] [--floor 0.5]
    python tools/bench_trend.py            # auto: two newest BENCH_r*
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

_PAIR = re.compile(r'"((?:q|w)\d+[a-z0-9_]*)":\s*([0-9.]+)')


def load_walls(path: str) -> dict[str, float]:
    """Per-query walls from a driver artifact or raw bench stdout."""
    with open(path) as f:
        text = f.read()
    try:
        doc = json.loads(text)
    except json.JSONDecodeError:
        doc = None
    if isinstance(doc, dict) and "tail" in doc:
        text = doc["tail"]
    elif isinstance(doc, dict) and "queries" in doc:
        return {k: float(v) for k, v in doc["queries"].items()}
    walls = {}
    for name, val in _PAIR.findall(text):
        walls[name] = float(val)
    return walls


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("old", nargs="?", help="previous bench artifact")
    ap.add_argument("new", nargs="?", help="current bench artifact")
    ap.add_argument("--ratio", type=float, default=1.5)
    ap.add_argument("--floor", type=float, default=0.5)
    args = ap.parse_args()

    old_path, new_path = args.old, args.new
    if not (old_path and new_path):
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        arts = sorted(glob.glob(os.path.join(root, "BENCH_r*.json")))
        if len(arts) < 2:
            print("need two BENCH_r*.json artifacts or explicit paths")
            return 2
        old_path, new_path = arts[-2], arts[-1]

    old = load_walls(old_path)
    new = load_walls(new_path)
    shared = sorted(set(old) & set(new))
    if not shared:
        print(f"no shared queries between {old_path} and {new_path}")
        return 2

    regressions = []
    improved = 0
    for name in shared:
        o, n = old[name], new[name]
        if n > args.ratio * o and n > args.floor:
            regressions.append((name, o, n))
        elif o > args.ratio * n and o > args.floor:
            improved += 1

    print(
        f"bench-trend: {len(shared)} shared queries "
        f"({os.path.basename(old_path)} -> {os.path.basename(new_path)}), "
        f"gate >{args.ratio}x above {args.floor}s: "
        f"{len(regressions)} regressions, {improved} improvements"
    )
    for name, o, n in sorted(regressions, key=lambda r: r[2] / r[1], reverse=True):
        print(f"  REGRESSION {name}: {o:.3f}s -> {n:.3f}s ({n / o:.2f}x)")
    return 1 if regressions else 0


if __name__ == "__main__":
    sys.exit(main())
