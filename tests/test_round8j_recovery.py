"""Round-8 batch-10 tests: FK-integrity audit (q275) and streaming
checkpoint recovery — the state-store counterpart of the M1 upsert
kill-point suite (tests/test_partitioned_upsert.py).
"""

from __future__ import annotations

import os

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql.window import Window

SF1 = "/root/testdata/sf0.001"


def test_q275_fk_integrity_brute_force(spark):
    from weatherapi_data_engineering_project_spark.plans.extensions import (
        q275_fk_integrity,
    )
    rows = {r.relationship: r for r in q275_fk_integrity(spark, SF1).collect()}
    assert len(rows) == 6
    li = pd.read_parquet(f"{SF1}/lineitem.parquet")
    o = pd.read_parquet(f"{SF1}/orders.parquet")
    r = rows["lineitem->orders"]
    orphan = ~li.l_orderkey.isin(set(o.o_orderkey))
    assert r.n_child == len(li)
    assert r.n_orphans == int(orphan.sum())
    assert r.n_orphan_keys == li.l_orderkey[orphan].nunique()
    # generated testdata is referentially intact — the audit must SAY so
    assert all(r.n_orphans == 0 for r in rows.values())


def test_streaming_state_recovers_from_mid_drain_crash(spark, tmp_path):
    """Kill the stateful-totals stream after 2 of 6 micro-batches, then
    restart from the SAME checkpoint: the state store must resume (not
    recount), the failed batch must replay exactly once, and the final
    last-update-per-user totals must equal the batch GROUP BY — the
    streaming counterpart of the upsert kill-point suite."""
    from weatherapi_data_engineering_project_spark.session import (
        cloned_session,
    )
    from weatherapi_data_engineering_project_spark.streaming.windows import (
        running_user_totals,
    )

    ev = spark.read.parquet(f"{SF1}/events.parquet").select(
        "event_id",
        F.col("ts").cast("timestamp").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    ev.repartition(6).write.mode("overwrite").parquet(src)
    ddl = (
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string"
    )

    s2 = cloned_session(spark)

    class Boom(Exception):
        pass

    calls = {"n": 0}

    def crashing_sink(batch, bid):
        calls["n"] += 1
        if calls["n"] == 3:
            raise Boom("injected crash in micro-batch 3")
        batch.withColumn("bid", F.lit(bid)).write.mode("append").parquet(out)

    q = (
        running_user_totals(
            s2.readStream.schema(ddl)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        .writeStream.foreachBatch(crashing_sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(300)
        crashed = False
    except Exception:
        crashed = True
    assert crashed, "the injected batch-3 failure must surface"
    assert calls["n"] == 3

    def sink(batch, bid):
        batch.withColumn("bid", F.lit(bid)).write.mode("append").parquet(out)

    q2 = (
        running_user_totals(
            s2.readStream.schema(ddl)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(300)
    assert not q2.isActive

    updates = spark.read.parquet(out)
    # the crashed batch replayed under its ORIGINAL batch id, once
    assert updates.select("bid").distinct().count() == 6
    w = Window.partitionBy("user_id").orderBy(F.col("bid").desc())
    final = (
        updates.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "n_events", "sum_value")
    )
    got = {
        r.user_id: (r.n_events, round(r.sum_value, 2))
        for r in final.collect()
    }
    ep = pd.read_parquet(f"{SF1}/events.parquet")
    cents = (ep.value * 100).round().astype("int64")
    g = pd.DataFrame({"u": ep.user_id, "c": cents}).groupby("u")
    expect = {
        int(u): (int(n), round(int(c) / 100, 2))
        for u, n, c in zip(g.size().index, g.size(), g.c.sum())
    }
    assert got == expect