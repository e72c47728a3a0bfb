"""Aggregates every plan module's QUERIES/ORACLE into the driver contract.

A query appears in ``all_queries()`` always; in ``all_oracles()`` only
when an exact ANSI-SQL twin exists (non-SQL-expressible ops get the
driver's weaker rows-only check, per the contract).
"""

from __future__ import annotations

import importlib
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_MODULE_NAMES = (
    "star", "llm", "weather", "analytics", "streaming_queries", "extensions",
    "curation", "corpus", "behavior", "temporal", "layout",
    "sql_frontdoor",
)
# star is the core relational surface with no optional dependencies —
# if it cannot import, the engine is broken and an empty-but-"successful"
# registry would hide that; it fails hard. The rest degrade loudly.
_REQUIRED = ("star",)

# name -> exception message for any optional plan module that failed to
# import. Kept visible (and loudly warned) rather than silently
# swallowed: a missing dependency in the harness environment would
# otherwise shrink the registered inventory while every remaining check
# still passes.
IMPORT_FAILURES: dict[str, str] = {}


def _modules():
    mods = []
    for name in _MODULE_NAMES:
        try:
            mods.append(importlib.import_module(f".{name}", __package__))
        except ImportError as e:
            if name in _REQUIRED:
                raise
            IMPORT_FAILURES[name] = str(e)
            print(
                f"WARNING: plan module {name!r} failed to import and its "
                f"queries are NOT registered: {e}",
                file=sys.stderr,
            )
    return mods


def all_queries() -> dict[str, QueryFn]:
    out: dict[str, QueryFn] = {}
    for m in _modules():
        overlap = out.keys() & m.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {sorted(overlap)}")
        out.update(m.QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _modules():
        out.update(getattr(m, "ORACLE", {}))
    return out


def all_bounds() -> dict[str, dict]:
    """Error-bound differentials for sketch queries with no exact SQL
    twin (q43 HLL++, q62 GK): each entry's ``sql`` computes per-key
    [lo, hi] brackets from exact DuckDB aggregates, and ``checks`` lists
    (spark_col, lo_col, hi_col) triples the harness asserts per row."""
    out: dict[str, dict] = {}
    for m in _modules():
        out.update(getattr(m, "BOUNDS", {}))
    return out
