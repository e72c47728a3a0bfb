#!/usr/bin/env python
"""One-shot weather-surface smoke check (VERDICT r05 #7).

Runs, in ONE vanilla session (fresh local[8], default confs — the
driver's environment, not the pytest fixture):

  1. ``__spark_entry__.entry()`` — the driver's flagship smoke check
     (rows >= 0, stable schema);
  2. the full w01–w07 weather parity surface against its DuckDB /
     recomputed oracles (the driver differential, inline);
  3. a two-wave streaming drain of the stateful totals operator —
     state must survive the checkpoint restart and the wave-2 totals
     must equal the batch cent twin exactly.

Single command, < 2 min, zero setup:

    python tools/smoke_weather.py
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def main() -> int:
    t0 = time.time()
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("smoke-weather")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    failures = []

    # 1. driver flagship
    import __spark_entry__ as E

    res = E.entry(spark)
    n = res.count()
    print(f"entry(): {n} rows, schema {[f.name for f in res.schema]}")
    if n <= 0:
        failures.append("entry() returned no rows")

    # 2. w01–w07 differentials (the driver gate, inline)
    from conftest import compare_query_to_oracle

    from weatherapi_data_engineering_project_spark.plans import weather as WQ

    for name, qfn in sorted(WQ.QUERIES.items()):
        try:
            compare_query_to_oracle(spark, name, qfn, WQ.ORACLE[name], SF_DIR)
            print(f"PASS {name}")
        except AssertionError as e:
            failures.append(f"{name}: {e}")
            print(f"FAIL {name}: {e}")

    # 3. two-wave stateful drain: state survives restart, totals exact
    from weatherapi_data_engineering_project_spark.schemas import load_table
    from weatherapi_data_engineering_project_spark.streaming import windows as W

    ev = (
        load_table(spark, SF_DIR, "events")
        .orderBy("event_id")
        .limit(200)
        .cache()
    )
    # The state shuffle inherits spark.sql.shuffle.partitions — in this
    # deliberately-vanilla session that's 200 state-store dirs per
    # micro-batch for a ~150-user keyspace (VERDICT r06 #5). Pin the
    # width on a cloned session, same as every engine drain.
    from weatherapi_data_engineering_project_spark.session import (
        cloned_session,
    )

    s2 = cloned_session(spark, shuffle_partitions=8)
    with tempfile.TemporaryDirectory() as tmp:
        src, ckpt = os.path.join(tmp, "src"), os.path.join(tmp, "ckpt")
        # Appended in arrival order across BOTH drains; the wave-2
        # restart only re-emits users it updates, so the final total
        # for a wave-1-only user is its wave-1 row (ADVICE r06: a
        # per-drain clear() silently dropped those users from the
        # check).
        rows: list = []

        def drain():
            stream = s2.readStream.schema(
                "event_id bigint, ts timestamp, user_id bigint, "
                "event_type string, value double, props string"
            ).parquet(src)
            q = (
                W.running_user_totals(stream)
                .writeStream.foreachBatch(
                    lambda b, _i: rows.extend(b.collect())
                )
                .outputMode("update")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
            if q.isActive:
                q.stop()

        os.makedirs(src)
        ev.filter(F.col("event_id") % 2 == 0).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        drain()
        ev.filter(F.col("event_id") % 2 == 1).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        drain()
        # latest update per user wins (dict insertion order = arrival)
        got = {r.user_id: (r.n_events, r.sum_value) for r in rows}
        want = {
            r.user_id: (r.n, r.c / 100.0)
            for r in ev.groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.round(F.col("value") * 100).cast("long")).alias("c"),
            )
            .collect()
        }
        bad = [u for u, v in got.items() if want.get(u) != v]
        missing = sorted(set(want) - set(got))
        if bad:
            failures.append(f"two-wave totals mismatch for users {bad[:5]}")
        elif missing:
            failures.append(
                f"two-wave drain never emitted users {missing[:5]}"
            )
        else:
            print(
                f"PASS two-wave stateful drain "
                f"({len(got)}/{len(want)} users verified)"
            )

    spark.stop()
    wall = time.time() - t0
    if failures:
        print(f"\nSMOKE FAILED in {wall:.1f}s: {len(failures)} failure(s)")
        for f in failures:
            print(f"  - {f}")
        return 1
    print(f"\nSMOKE OK in {wall:.1f}s (entry + w01-w07 + two-wave drain)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
