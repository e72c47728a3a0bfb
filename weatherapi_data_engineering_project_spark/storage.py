"""Physical-layout utilities: bucketed tables and salted skew joins.

At 100 TB the dominant cost of the engine's recurring joins (fact⋈fact
on surrogate keys, upsert anti-joins, dedup candidate verification) is
the shuffle. Two standard layouts remove or tame it:

- **Bucketing** (``write_bucketed``): persist both join sides
  hash-bucketed by the join key. Spark's bucketed scan exposes the
  bucket distribution, so an equi-join on the bucket key plans as a
  SortMergeJoin with ZERO Exchange on either side — the join cost
  becomes a local merge per bucket, and it amortizes over every
  downstream query that joins on the same key. This is the Spark-native
  equivalent of the reference warehouse's clustered stage/target tables.
- **Salting** (``salted_join``): when one key dominates (a viral
  document's shingle, a null-ish default key), hash partitioning sends
  the whole key to one task. Salting splits each hot left-side key into
  ``n_salts`` shards and replicates the matching right-side rows across
  shards, then joins on (key, salt) — the hot key's work spreads over
  n_salts tasks. AQE's skew-join split handles moderate skew
  automatically; salting is the deliberate version for the extreme tail.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) parquet table.

    Joins between two tables bucketed identically on the join key plan
    with no Exchange (verify with ``assert_no_exchange``); sorting
    within buckets additionally removes the Sort below SortMergeJoin.
    """
    writer = df.write.format("parquet").mode("overwrite")
    if path:
        writer = writer.option("path", path)
    writer = writer.bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def assert_no_shuffle(df: DataFrame) -> None:
    """Raise if the physical plan contains a shuffle exchange — the
    bucketed-join invariant a layout regression would silently break.
    BroadcastExchange is allowed (it moves a small relation, not the
    partitioned data)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re

    if re.search(r"Exchange (hash|range|Single)", plan):
        raise AssertionError(f"plan contains a shuffle:\n{plan}")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: shard hot left keys, replicate right rows.

    left gets salt = pmod(monotonically_increasing_id, n_salts) — a
    per-ROW uniform spread independent of row content. (Content hashing
    would send byte-identical duplicate rows of a hot key to one shard,
    re-creating the exact skew the salt exists to break for
    duplicate-heavy keys.) The salt only routes rows, so the join
    result is unchanged; right is exploded n_salts× so every
    (key, salt) shard finds its match. Right side must be the smaller
    relation (it is replicated).

    Inner/left/semi/anti joins are supported (replication cannot
    duplicate or null-extend LEFT rows under any of them); right/full
    outer are rejected — an unmatched right-side row would null-extend
    once per replica and surface n_salts duplicates.
    """
    allowed = (
        "inner", "left", "left_outer", "leftouter",
        "semi", "left_semi", "leftsemi",
        "anti", "left_anti", "leftanti",
    )
    if how not in allowed:
        raise ValueError(
            f"salted_join supports inner/left/semi/anti joins, got {how!r}: "
            "replicated right rows would duplicate under right/full outer"
        )
    salted_left = left.withColumn(
        "_salt",
        F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).cast("int"),
    )
    salted_right = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return (
        salted_left.join(salted_right, on=[key, "_salt"], how=how)
        .drop("_salt")
    )
