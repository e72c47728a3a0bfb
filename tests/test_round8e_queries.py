"""Round-8 batch-5 tests: compaction planning (q261), salted two-phase
distinct (q262), Wilcoxon signed-rank (q263)."""

from __future__ import annotations

import numpy as np
import pandas as pd

SF1 = "/root/testdata/sf0.001"


def _pd(table):
    return pd.read_parquet(f"{SF1}/{table}.parquet")


def test_q261_next_fit_packing_brute_force(spark):
    from weatherapi_data_engineering_project_spark.plans.layout import (
        q261_compaction_plan,
    )
    d = _pd("documents").sort_values(["source", "doc_id"])
    expect = {}
    for src, grp in d.groupby("source"):
        off = 0
        for _, row in grp.iterrows():
            shard = off // 20000
            n, c = expect.get((src, shard), (0, 0))
            expect[(src, shard)] = (n + 1, c + int(row.n_chars))
            off += int(row.n_chars)
    got = {
        (r.source, r.shard): (r.n_files, r.shard_chars)
        for r in q261_compaction_plan(spark, SF1).collect()
    }
    assert got == expect
    # shards within a source are contiguous from 0
    for src in d.source.unique():
        shards = sorted(s for (g, s) in got if g == src)
        assert shards == list(range(len(shards)))


def test_q262_salted_distinct_equals_plain_and_partials_add(spark):
    from weatherapi_data_engineering_project_spark.plans.layout import (
        q262_twophase_distinct,
    )
    ev = _pd("events")
    expect = ev.groupby("event_type").user_id.nunique().to_dict()
    rows = q262_twophase_distinct(spark, SF1).collect()
    got = {r.event_type: r.n_users for r in rows}
    assert got == expect
    assert all(1 <= r.n_salts_hit <= 16 for r in rows)


def test_q263_wilcoxon_brute_force(spark):
    from weatherapi_data_engineering_project_spark.plans.analytics import (
        q263_wilcoxon_signed_rank,
    )
    ev = _pd("events")
    cents = (ev.value * 100).round().astype(np.int64)
    us = ev.ts.astype("int64") // 1000  # ns -> us
    mid = (us.min() + us.max()) // 2
    df = pd.DataFrame(
        {"user_id": ev.user_id, "cents": cents, "first": us <= mid}
    )
    s1 = df[df["first"]].groupby("user_id").cents.sum()
    s2 = df[~df["first"]].groupby("user_id").cents.sum()
    d = (
        s2.reindex(df.user_id.unique(), fill_value=0)
        - s1.reindex(df.user_id.unique(), fill_value=0)
    )
    d = d[d != 0]
    ad = d.abs()
    ranks = ad.rank(method="average")
    n = len(d)
    w_pos = float(ranks[d > 0].sum())
    t = ad.value_counts()
    tt = float((t**3 - t).sum())
    z = (w_pos - n * (n + 1) / 4) / np.sqrt(
        n * (n + 1) * (2 * n + 1) / 24 - tt / 48
    )
    row = q263_wilcoxon_signed_rank(spark, SF1).collect()[0]
    assert row.n == n
    assert row.w_pos_x2 == int(round(2 * w_pos))
    assert abs(row.z_score - z) < 1e-6


def test_q263_ranks_survive_any_bucket_boundaries(spark):
    """The two-phase bucketed midrank must be boundary-independent:
    a hand-built frame ranked with 1 bucket and with forced ties
    across buckets gives the textbook W+ either way (engine result is
    already differential-matched; this pins the mechanism on a case
    with heavy ties)."""
    from weatherapi_data_engineering_project_spark.plans import analytics as AN

    # diffs: +5, -5, +5, +10 -> |d| ranks: 5s get midrank 2, 10 gets 4
    # W+ = 2 + 2 + 4 = 8 -> w_pos_x2 = 16, n = 4
    import pyspark.sql.functions as F

    dd = spark.createDataFrame(
        [(5,), (-5,), (5,), (10,)], "d long"
    )
    vals = dd.groupBy(F.abs(F.col("d")).alias("ad")).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.when(F.col("d") > 0, 1).otherwise(0)).alias("cnt_pos"),
    )
    r = AN._midrank2_frame(
        vals.select(F.col("ad").alias("v"), "cnt", "cnt_pos"), ["cnt_pos"]
    )
    w_pos_x2 = r.select(
        F.sum(F.col("cnt_pos") * F.col("mr2")).alias("w")
    ).collect()[0].w
    assert w_pos_x2 == 16