"""Tracked persistence for operator-internal frames.

Dedup/similarity pipelines persist intermediate frames (exploded
shingles, fingerprints, LSH buckets) because several consumers in one
returned plan read them. The operator cannot unpersist what it returns
lazily — so every persist is registered here and callers that know a
query's lifetime (bench between queries, long-lived services between
batches) call ``release_all()``. Without release, blocks stay pinned
for the session; MEMORY_AND_DISK evicts under pressure, so this is a
hygiene lever, not a correctness one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_LIVE: list[DataFrame] = []


def persist_tracked(
    df: DataFrame, level: StorageLevel = StorageLevel.MEMORY_AND_DISK
) -> DataFrame:
    out = df.persist(level)
    _LIVE.append(out)
    return out


def release_all() -> int:
    """Unpersist every tracked frame; returns how many were released."""
    n = 0
    while _LIVE:
        df = _LIVE.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass  # session already stopped / frame GC'd
    return n
