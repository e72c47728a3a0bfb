"""Aggregates every plan module's QUERIES/ORACLE into the driver contract.

A query appears in ``all_queries()`` always; in ``all_oracles()`` only
when an exact ANSI-SQL twin exists (non-SQL-expressible ops get the
driver's weaker rows-only check, per the contract).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def _modules():
    from . import star

    mods = [star]
    try:
        from . import llm

        mods.append(llm)
    except ImportError:
        pass
    try:
        from . import weather

        mods.append(weather)
    except ImportError:
        pass
    try:
        from . import analytics

        mods.append(analytics)
    except ImportError:
        pass
    try:
        from . import streaming_queries

        mods.append(streaming_queries)
    except ImportError:
        pass
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
