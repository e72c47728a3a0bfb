"""Round-8 batch-12 tests: append-mode window finalization semantics.

q266's oracle rests on two claims: (1) the sentinel-flush waves
finalize EVERY real day window before the AvailableNow drain stops,
and (2) the finalized result is independent of how the real events
split into micro-batches. Prove both mechanically, the way
test_q42_drain_is_batch_boundary_invariant proves the update-mode
claim.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F

SF1 = "/root/testdata/sf0.001"


def _drain_append_windows(spark, tmp_path, nfiles: int):
    """Run q266's protocol with the real events split into ``nfiles``
    replay files (wave 1), same sentinel waves, and return the
    finalized (day_idx, event_type) -> (n, cents) dict."""
    import os
    import time

    from weatherapi_data_engineering_project_spark.schemas import load_table

    ev = (
        load_table(spark, SF1, "events")
        .select("ts", "event_type", "value")
    )
    src = str(tmp_path / f"src{nfiles}")
    ckpt = str(tmp_path / f"ckpt{nfiles}")
    out = str(tmp_path / f"out{nfiles}")
    ev.repartition(nfiles).write.mode("overwrite").parquet(src)
    stats = ev.agg(
        F.max("ts").alias("m"),
        (F.max(F.unix_micros("ts")) / 86400000000)
        .cast("bigint")
        .alias("max_day"),
    ).first()
    for days, lo, hi, nparts in [(10, 1, 1 + nfiles, nfiles), (20, 17, 18, 1)]:
        time.sleep(1.0)
        spark.range(lo, hi, 1, nparts).select(
            (F.lit(stats.m) + F.expr(f"INTERVAL {days} DAYS")).alias("ts"),
            F.lit("__sentinel__").alias("event_type"),
            F.lit(0.0).alias("value"),
        ).write.mode("append").parquet(src)

    def sink(batch, bid):
        batch.write.mode("append").parquet(out)

    stream = (
        spark.readStream.schema(
            "ts timestamp, event_type string, value double"
        )
        .option("maxFilesPerTrigger", nfiles)
        .parquet(src)
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 day"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.expr("CAST(round(value * 100, 0) AS BIGINT)")
            ).alias("sum_cents"),
        )
        .select(
            (F.unix_micros(F.col("window.start")) / 86400000000)
            .cast("bigint")
            .alias("day_idx"),
            "event_type",
            "n_events",
            "sum_cents",
        )
    )
    q = (
        agg.writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    if q.isActive:
        q.stop()
    got = spark.read.parquet(out).filter(
        F.col("day_idx") <= F.lit(int(stats.max_day))
    )
    return {
        (r.day_idx, r.event_type): (r.n_events, r.sum_cents)
        for r in got.collect()
    }


def test_append_window_finalization_is_batch_boundary_invariant(
    spark, tmp_path
):
    finals = [
        _drain_append_windows(spark, tmp_path, nfiles)
        for nfiles in (2, 8)
    ]
    assert finals[0] == finals[1]
    # ...and equals the batch GROUP BY (complete finalization: no day
    # window lost to the missing trailing batch)
    ev = pd.read_parquet(f"{SF1}/events.parquet")
    us = (ev.ts - pd.Timestamp(0)) // pd.Timedelta(microseconds=1)
    cents = (ev.value * 100).round().astype("int64")
    g = pd.DataFrame(
        {"d": us // 86400000000, "t": ev.event_type, "c": cents}
    ).groupby(["d", "t"])
    expect = {
        k: (int(n), int(c))
        for k, n, c in zip(g.size().index, g.size(), g.c.sum())
    }
    assert finals[0] == expect

def test_q279_right_outer_emits_null_left_on_eviction(spark):
    """The RIGHT OUTER drain must contain genuine null-LEFT rows
    (orphan purchases, emitted only because click-side watermark
    eviction proved no click can arrive), every purchase exactly once
    among its null rows, and no sentinel leakage."""
    from weatherapi_data_engineering_project_spark.plans.streaming_queries import (
        q279_stream_right_outer_interval_join,
    )
    rows = q279_stream_right_outer_interval_join(spark, SF1).collect()
    nulls = [r for r in rows if r.event_id is None]
    assert len(nulls) > 0
    assert all(r.p_event_id is not None for r in rows)  # right side total
    assert all(r.user_id is not None for r in rows)     # coalesced key
    assert all((r.p_event_id or 0) >= 0 for r in rows)  # sentinels gone
    # equals the batch right join
    ev = pd.read_parquet(f"{SF1}/events.parquet")
    us = (ev.ts - pd.Timestamp(0)) // pd.Timedelta(microseconds=1)
    df = pd.DataFrame({"eid": ev.event_id, "u": ev.user_id, "us": us})
    clicks = df[df.eid % 2 == 0]
    buys = df[df.eid % 2 == 1]
    j = buys.merge(clicks, on="u", suffixes=("_p", "_c"))
    matched = j[(j.us_p >= j.us_c) & (j.us_p <= j.us_c + 3600000000)]
    n_pairs = len(matched)
    orphan_buys = set(buys.eid) - set(matched.eid_p)
    assert len(nulls) == len(orphan_buys)
    assert len(rows) == n_pairs + len(orphan_buys)
