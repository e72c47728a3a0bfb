"""Round-9 unit tests: ADVICE r08 fixes (q281 densification, q260
zero-weight guard, session-keyed layout paths)."""

from __future__ import annotations

import os

import pytest

from weatherapi_data_engineering_project_spark.plans.analytics import (
    q260_neyman_allocation,
    q281_cochran_q,
)
from weatherapi_data_engineering_project_spark.plans.layout import (
    session_layout_base,
)


def test_cochran_q_densifies_zero_success_treatments(spark, tmp_path):
    """A treatment NO user favors must still emit a row (c_j = 0) and
    contribute its (k·0 − N)² = N² numerator term to Q."""
    # 3 users × 3 types; type 'z' has 1 event per user vs 10 for a/b,
    # so n_it·k > tot_i (3 > 21) never holds for z — zero successes.
    rows = []
    eid = 0
    for u in (1, 2, 3):
        for t, n in (("a", 10), ("b", 10), ("z", 1)):
            for _ in range(n):
                rows.append((eid, u, t))
                eid += 1
    spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, event_type string"
    ).selectExpr(
        "event_id",
        "timestamp'2024-01-01 00:00:00' as ts",
        "user_id",
        "event_type",
        "1.0 as value",
        "'' as props",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    out = {r.event_type: r for r in q281_cochran_q(spark, str(tmp_path)).collect()}
    assert set(out) == {"a", "b", "z"}, "zero-success type must emit a row"
    assert out["z"].n_users_above == 0
    assert out["a"].n_users_above == 3 and out["b"].n_users_above == 3

    # brute force: k=3, C=(3,3,0), N=6, every user r_i=2
    k, cs, n = 3, [3, 3, 0], 6
    sr, sr2 = 6, 12  # 3 users × r_i=2 / r_i²=4
    num = (k - 1) * sum((k * c - n) ** 2 for c in cs)
    q_expected = round(num / (k * (k * sr - sr2)), 6)
    assert out["z"].cochran_q == pytest.approx(q_expected, abs=0)
    assert out["z"].k_treatments == 3


def test_neyman_allocation_rejects_zero_total_weight(spark, tmp_path):
    """Every stratum a singleton -> every weight 0 -> the query must
    raise loudly instead of emitting NaN allocations."""
    spark.createDataFrame(
        [(1, "t", "en", "s1", 10), (2, "t", "en", "s2", 20),
         (3, "t", "en", "s3", 30)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    with pytest.raises(Exception, match="q260"):
        q260_neyman_allocation(spark, str(tmp_path)).collect()


def test_aqe_skew_join_splits_the_hot_partition(spark):
    """q284 plan pin: the final adaptive plan must show the runtime
    skew split — SortMergeJoin(skew=true) over an AQEShuffleRead
    marked skewed — and the values must equal the plain batch join
    (the differential asserts that; here we re-check the row count)."""
    from weatherapi_data_engineering_project_spark.plans.layout import (
        q284_aqe_skew_join,
    )

    df = q284_aqe_skew_join(spark, "/root/testdata/sf0.001")
    rows = df.collect()
    assert len(rows) == 7  # w in 1..7
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin(skew=true)" in plan, plan
    assert "AQEShuffleRead skewed" in plan, plan


def test_timeout_flush_evicts_all_real_user_state(spark):
    """q285 state-metrics assertion (VERDICT r08 #7): the state store
    must SHRINK to exactly the sentinel key after the watermark-driven
    flush — numRowsTotal drops from the full user count to 1, and the
    removals are observable per batch."""
    from weatherapi_data_engineering_project_spark.plans.streaming_queries import (
        LAST_STATE_METRICS,
        q285_stream_timeout_flush,
    )

    sf = "/root/testdata/sf0.001"
    out = q285_stream_timeout_flush(spark, sf).collect()
    n_users = (
        spark.read.parquet(f"{sf}/events.parquet")
        .select("user_id")
        .distinct()
        .count()
    )
    assert len(out) == n_users  # every user flushed exactly once
    metrics = LAST_STATE_METRICS["q285"]
    assert metrics, "no state metrics recorded"
    totals = [t for _bid, t, _rm in metrics]
    removed = sum(rm for _bid, _t, rm in metrics)
    assert max(totals) >= n_users  # state actually held every user
    assert totals[-1] == 1  # only the sentinel key survives
    assert removed == n_users  # evictions are counted, not silent


def test_session_layout_base_is_session_and_dataset_keyed(spark):
    a = session_layout_base(spark, "bkt_tables", "/root/testdata/sf0.001")
    b = session_layout_base(spark, "bkt_tables", "/root/testdata/sf0.01")
    assert a != b  # dataset-keyed
    assert a == session_layout_base(spark, "bkt_tables", "/root/testdata/sf0.001")
    assert spark.sparkContext.applicationId.replace("-", "")[-16:] in a
    assert os.path.basename(a).startswith("bkt_tables_")
