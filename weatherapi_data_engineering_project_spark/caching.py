"""Tracked persistence for operator-internal frames.

Dedup/similarity pipelines persist intermediate frames (exploded
shingles, fingerprints, LSH buckets) because several consumers in one
returned plan read them. The operator cannot unpersist what it returns
lazily — so every persist is registered here and callers that know a
query's lifetime (bench between queries, long-lived services between
batches) call ``release_all()``. Without release, blocks stay pinned
for the session; MEMORY_AND_DISK evicts under pressure, so this is a
hygiene lever, not a correctness one.

``checkpoint_tracked`` does the same bookkeeping for eager
``localCheckpoint`` frames (iterative operators: label-prop rounds,
PageRank ranks, MMR picks). localCheckpoint blocks are NOT covered by
``DataFrame.unpersist`` — the persisted RDD hides behind the returned
Dataset's ``LogicalRDD`` — so release reaches through the JVM plan to
unpersist that RDD directly (VERDICT r04 #2: 123 queries' worth of
un-released checkpoint blocks skewed the committed differential's late
queries up to 17×). A released checkpoint frame is DEAD — its lineage
was truncated at materialization — so ``release_all`` is only safe at
query-lifetime boundaries, exactly where it was already called.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_LIVE: list[DataFrame] = []
_LIVE_CP: list[DataFrame] = []


def persist_tracked(
    df: DataFrame, level: StorageLevel = StorageLevel.MEMORY_AND_DISK
) -> DataFrame:
    out = df.persist(level)
    _LIVE.append(out)
    return out


def checkpoint_tracked(df: DataFrame) -> DataFrame:
    """Eagerly localCheckpoint ``df`` and register the result for
    ``release_all``. Use for operator-internal iteration state; never
    for frames that must outlive the query's consumption."""
    out = df.localCheckpoint(eager=True)
    _LIVE_CP.append(out)
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
    while _LIVE_CP:
        df = _LIVE_CP.pop()
        try:
            # the checkpointed blocks live on the LogicalRDD's RDD, not
            # on the Dataset — unpersist it directly (verified: frees
            # the block-manager entries; the frame is unusable after)
            df._jdf.queryExecution().analyzed().rdd().unpersist(False)
            n += 1
        except Exception:
            pass  # session stopped / plan shape changed / already freed
    return n
