#!/usr/bin/env python
"""Bench-trend regression gate (VERDICT r05 #5, r06 #1/#2).

Compares two bench artifacts per query and FAILS (exit 1) on any
regression above the noise gate — automating the per-round check the
judge runs by hand so a slow plan never ships silently.

Inputs, in preference order:
- ``bench_full_r{N}.json`` (written by bench.py since round 7): the
  COMPLETE per-query dict, so the gate covers the whole registry;
- raw bench.py stdout files (one JSON line with a ``queries`` dict);
- ``BENCH_r{N}.json`` driver artifacts, whose ``tail`` holds only the
  last KBs of stdout (possibly truncated at the HEAD — only queries
  visible in BOTH tails are compared). When auto-discovering, a
  ``bench_full_r{N}.json`` sibling replaces the truncated driver
  artifact for the same round.

Gate: drift-normalized new wall > RATIO x max(old wall, FLOOR).

- The floor applies to BOTH sides, so a query whose old wall sat in
  the sub-floor noise band (where ±0.2 s box jitter swamps the
  signal) must exceed RATIO x FLOOR to count as a regression, exactly
  as a new sub-floor wall never counts. (r7: q54 0.371 s -> 0.597 s
  tripped the one-sided gate with UNCHANGED code — isolated re-runs
  settle at 0.57-0.67 s; the old wall was the noise tail.)
- Box-drift normalization: the shared box runs other tenants, and
  whole-artifact speed drifts round over round (r5 -> r6 -> r7 mean
  s/query: 0.89 -> 0.98 -> ~1.06, with UNCHANGED queries like q55
  moving 0.83 -> 1.3 in lockstep with the rest). A per-QUERY
  regression is one that moved relative to its round, so the gate
  divides each ratio by the MEDIAN ratio across shared super-floor
  queries (printed as "box drift") before comparing. A global
  slowdown moves the median, not the verdicts; a single slow plan
  still stands out.

Expected regressions (VERDICT r06 #1): a deliberate trade (e.g. an
operator gaining a stronger multi-batch oracle at fixed per-trigger
cost) is recorded in ``BENCH_WAIVERS.json`` at the repo root:

    {"q42_stateful_totals": {"max_ratio": 5.0, "round": 6,
                             "reason": "..."}}

A regression within its waiver's ``max_ratio`` prints as WAIVED and
does not fail the gate; beyond it, the gate is red as usual.

Usage:
    python tools/bench_trend.py OLD NEW [--ratio 1.5] [--floor 0.5]
    python tools/bench_trend.py            # auto: two newest rounds
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

_PAIR = re.compile(r'"((?:q|w)\d+[a-z0-9_]*)":\s*([0-9.]+)')
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _pairs_near_queries_block(text: str) -> dict[str, float]:
    """Anchor the pair regex to the bench ``"queries": {`` block
    (ADVICE r06: a bare scan would treat ANY q-named numeric field in
    the captured stdout as a timing). A HEAD-truncated tail may have
    lost the anchor itself; then fall back to scanning up to the block
    terminator only."""
    start = text.find('"queries": {')
    if start >= 0:
        text = text[start + len('"queries": {'):]
    end = text.find("}")
    if end >= 0:
        text = text[:end]
    return {name: float(val) for name, val in _PAIR.findall(text)}


def load_walls(path: str) -> dict[str, float]:
    """Per-query walls from a full/raw bench artifact or a driver tail."""
    with open(path) as f:
        text = f.read()
    try:
        doc = json.loads(text)
    except json.JSONDecodeError:
        doc = None
    if isinstance(doc, dict) and "queries" in doc:
        return {k: float(v) for k, v in doc["queries"].items()}
    if isinstance(doc, dict) and "tail" in doc:
        text = doc["tail"]
    return _pairs_near_queries_block(text)


def load_waivers() -> dict[str, dict]:
    path = os.path.join(_ROOT, "BENCH_WAIVERS.json")
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        return json.load(f)


def _auto_paths() -> tuple[str, str] | None:
    """Two newest rounds; prefer the full artifact for each round."""
    rounds: dict[int, str] = {}
    for path in glob.glob(os.path.join(_ROOT, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if m:
            rounds[int(m.group(1))] = path
    for path in glob.glob(os.path.join(_ROOT, "bench_full_r*.json")):
        m = re.search(r"bench_full_r(\d+)\.json$", path)
        if m:
            rounds[int(m.group(1))] = path  # full beats truncated tail
    if len(rounds) < 2:
        return None
    ns = sorted(rounds)
    return rounds[ns[-2]], rounds[ns[-1]]


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("old", nargs="?", help="previous bench artifact")
    ap.add_argument("new", nargs="?", help="current bench artifact")
    ap.add_argument("--ratio", type=float, default=1.5)
    ap.add_argument("--floor", type=float, default=0.5)
    args = ap.parse_args()

    old_path, new_path = args.old, args.new
    if not (old_path and new_path):
        auto = _auto_paths()
        if auto is None:
            print("need two bench artifacts or explicit paths")
            return 2
        old_path, new_path = auto

    old = load_walls(old_path)
    new = load_walls(new_path)
    shared = sorted(set(old) & set(new))
    if not shared:
        print(f"no shared queries between {old_path} and {new_path}")
        return 2

    # box-drift estimate: median per-query ratio over pairs clear of
    # the floor on at least one side (sub-floor pairs are noise)
    import statistics

    ratios = [
        new[k] / old[k]
        for k in shared
        if max(old[k], new[k]) > args.floor and old[k] > 0
    ]
    drift = statistics.median(ratios) if ratios else 1.0

    waivers = load_waivers()
    regressions, waived = [], []
    improved = 0
    for name in shared:
        o, n = old[name], new[name]
        nd = n / drift  # drift-normalized new wall
        if nd > args.ratio * max(o, args.floor):
            w = waivers.get(name)
            if w and nd <= float(w.get("max_ratio", 0)) * o:
                waived.append((name, o, n, w))
            else:
                regressions.append((name, o, n))
        elif o > args.ratio * max(nd, args.floor):
            improved += 1

    print(
        f"bench-trend: {len(shared)} shared queries "
        f"({os.path.basename(old_path)} -> {os.path.basename(new_path)}), "
        f"box drift {drift:.2f}x, "
        f"gate >{args.ratio}x above {args.floor}s after drift: "
        f"{len(regressions)} regressions, {len(waived)} waived, "
        f"{improved} improvements"
    )
    for name, o, n, w in waived:
        print(
            f"  WAIVED {name}: {o:.3f}s -> {n:.3f}s ({n / o:.2f}x "
            f"<= {w.get('max_ratio')}x, r{w.get('round')}: "
            f"{w.get('reason', '')})"
        )
    for name, o, n in sorted(regressions, key=lambda r: r[2] / r[1], reverse=True):
        print(f"  REGRESSION {name}: {o:.3f}s -> {n:.3f}s ({n / o:.2f}x)")
    return 1 if regressions else 0


if __name__ == "__main__":
    sys.exit(main())
