"""Round-8 batch-4 tests: stream-stream semi join (q256), dynamic
partition pruning (q257), t-closeness (q258), classifier metrics
(q259), Neyman allocation (q260)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F

SF1 = "/root/testdata/sf0.001"


def _pd(table):
    return pd.read_parquet(f"{SF1}/{table}.parquet")


def test_q256_semi_join_matches_batch_and_is_linear(spark):
    """The streamed semi join equals the batch semi join, and each
    click appears at most once even when it matches many purchases."""
    from weatherapi_data_engineering_project_spark.plans.streaming_queries import (
        q256_stream_semi_join,
    )
    got = q256_stream_semi_join(spark, SF1)
    rows = got.collect()
    ids = [r.event_id for r in rows]
    assert len(ids) == len(set(ids))  # linear in clicks

    ev = _pd("events")[["event_id", "ts", "user_id"]]
    clicks = ev[ev.event_id % 2 == 0]
    buys = ev[ev.event_id % 2 == 1]
    j = clicks.merge(buys, on="user_id", suffixes=("", "_p"))
    m = j[
        (j.ts_p >= j.ts) & (j.ts_p <= j.ts + pd.Timedelta(hours=1))
    ].event_id.unique()
    assert sorted(ids) == sorted(m.tolist())


def test_q256_streaming_plan_is_semi_join(spark):
    """The streaming logical plan must be a left-semi join with
    watermarks on both sides (state stays bounded in a live run)."""
    from weatherapi_data_engineering_project_spark.streaming.windows import (
        stream_interval_join,
    )
    ev = spark.read.parquet(f"{SF1}/events.parquet").select(
        "event_id", F.col("ts").cast("timestamp").alias("ts"), "user_id"
    )
    j = stream_interval_join(
        ev.filter(F.col("event_id") % 2 == 0),
        ev.filter(F.col("event_id") % 2 == 1),
        how="left_semi",
    )
    assert j.columns == ["user_id", "event_id", "ts"]
    assert "LeftSemi" in j._jdf.queryExecution().optimizedPlan().toString()


def test_q257_dpp_subquery_in_fact_scan(spark):
    """The fact scan must carry a dynamicpruning partition filter —
    the dim-side filter prunes fact partitions at runtime."""
    from weatherapi_data_engineering_project_spark.plans.layout import (
        q257_dpp_prune,
    )
    df = q257_dpp_prune(spark, SF1)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan
    rows = {r.o_orderpriority: r.n_orders for r in df.collect()}
    o = _pd("orders")
    expect = (
        o[o.o_orderpriority.isin(["1-URGENT", "2-HIGH"])]
        .groupby("o_orderpriority")
        .size()
        .to_dict()
    )
    assert rows == expect


def test_q258_t_closeness_brute_force(spark):
    from weatherapi_data_engineering_project_spark.plans.behavior import (
        q258_t_closeness,
    )
    d = _pd("documents")
    d = d.assign(b=d.n_chars // 64)
    buckets = sorted(d.b.unique())
    glob = d.b.value_counts().reindex(buckets, fill_value=0).sort_index()
    gcum = glob.cumsum()
    nn = len(d)
    expect = {}
    for src, grp in d.groupby("source"):
        cnt = grp.b.value_counts().reindex(buckets, fill_value=0).sort_index()
        acum = cnt.cumsum()
        n_g = len(grp)
        gap_x = int((acum * nn - gcum * n_g).abs().sum())
        m = len(buckets)
        expect[src] = (n_g, gap_x, round(gap_x / ((m - 1) * n_g * nn), 9))
    got = {
        r.source: (r.n_docs, r.gap_x, r.t_emd)
        for r in q258_t_closeness(spark, SF1).collect()
    }
    assert got == expect


def test_q259_metrics_brute_force(spark):
    from weatherapi_data_engineering_project_spark.plans.llm import (
        q259_langid_metrics,
    )
    rows = q259_langid_metrics(spark, SF1).collect()
    d = _pd("documents")
    import re

    def pred(text):
        low = text.lower()
        has = lambda w: re.search(rf"(^|\s){w}(\s|$)", low)  # noqa: E731
        if has("the") or has("and"):
            return "en"
        if has("el") or has("los"):
            return "es"
        if has("le") or has("les"):
            return "fr"
        if has("der") or has("und"):
            return "de"
        return "unk"

    d = d.assign(pred=d.text.map(pred))
    f1s = []
    for r in rows:
        c = r.lang
        tp = int(((d.lang == c) & (d.pred == c)).sum())
        fp = int(((d.lang != c) & (d.pred == c)).sum())
        fn = int(((d.lang == c) & (d.pred != c)).sum())
        assert (r.tp, r.fp, r.fn) == (tp, fp, fn), c
        p = tp / (tp + fp) if tp + fp else 0.0
        rc = tp / (tp + fn) if tp + fn else 0.0
        f1 = 2 * p * rc / (p + rc) if p + rc else 0.0
        assert abs(r.f1 - f1) < 1e-6, c
        f1s.append(f1)
    assert abs(rows[0].macro_f1 - sum(f1s) / len(f1s)) < 1e-6


def test_q260_allocations_sum_to_budget_and_match_neyman(spark):
    from weatherapi_data_engineering_project_spark.plans.analytics import (
        q260_neyman_allocation,
    )
    rows = q260_neyman_allocation(spark, SF1).collect()
    assert sum(r.alloc for r in rows) == 1000

    d = _pd("documents")
    g = d.groupby("source").n_chars
    w = (g.count() * g.std(ddof=1)).fillna(0.0)
    quota = 1000 * w / w.sum()
    base = np.floor(quota)
    r = int(1000 - base.sum())
    rem = (quota - base).sort_values(ascending=False, kind="stable")
    # pandas sort is stable; replicate the (rem DESC, source ASC) order
    order = sorted(quota.index, key=lambda s: (-round(quota[s] - base[s], 12), s))
    bump = set(order[:r])
    expect = {
        s: int(base[s]) + (1 if s in bump else 0) for s in quota.index
    }
    got = {r_.source: r_.alloc for r_ in rows}
    assert got == expect