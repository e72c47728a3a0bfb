"""Differential tests: analytics queries (sessionize / as-of / rollup /
set ops) vs their DuckDB oracles, plus semantic unit checks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from weatherapi_data_engineering_project_spark.plans import analytics as A
from tests.conftest import SF_DIR, compare_query_to_oracle


@pytest.mark.parametrize("name", sorted(A.QUERIES))
def test_analytics_query_matches_oracle(spark, name):
    compare_query_to_oracle(spark, name, A.QUERIES[name], A.ORACLE[name], SF_DIR)


def test_sessionize_invariants(spark):
    """Sessions are disjoint, ordered, and cover every event exactly once."""
    sess = A.q31_sessionize(spark, SF_DIR)
    from weatherapi_data_engineering_project_spark.schemas import load_table

    n_events = load_table(spark, SF_DIR, "events").count()
    agg = sess.agg(
        F.sum("n_events").alias("total"),
        F.min("session_idx").alias("min_idx"),
    ).collect()[0]
    assert agg.total == n_events
    assert agg.min_idx == 1
    # within a user, sessions don't overlap: end(i) < start(i+1)
    bad = (
        sess.alias("a")
        .join(
            sess.alias("b"),
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.session_idx") + 1 == F.col("b.session_idx"))
            & (F.col("a.session_end") >= F.col("b.session_start")),
        )
        .count()
    )
    assert bad == 0


def test_asof_never_future(spark):
    """The matched purchase timestamp is never after the click."""
    res = A.q32_asof_join(spark, SF_DIR)
    assert res.filter(F.col("last_purchase_ts") > F.col("ts")).count() == 0


def test_rollup_totals_consistent(spark):
    """Grand total row equals the sum of the leaf rows."""
    r = A.q33_rollup(spark, SF_DIR).collect()
    leaves = [x for x in r if x.status != "ALL" and x.priority != "ALL"]
    grand = [x for x in r if x.status == "ALL" and x.priority == "ALL"]
    assert len(grand) == 1
    assert sum(x.n_orders for x in leaves) == grand[0].n_orders


def test_q43_approx_distinct_error_bound(spark):
    """HLL++ estimate within the configured 2% rsd (loose 3x bound) of
    the exact distinct count."""
    from weatherapi_data_engineering_project_spark.plans.streaming_queries import (
        q43_approx_distinct,
    )
    from weatherapi_data_engineering_project_spark.schemas import load_table

    approx = {r.event_type: r.n_users_approx
              for r in q43_approx_distinct(spark, SF_DIR).collect()}
    exact = {
        r.event_type: r.n
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for et, n in exact.items():
        assert abs(approx[et] - n) <= max(2, 0.06 * n), (et, approx[et], n)


def test_table_stats_matches_direct_aggregates(spark):
    """The melted stats equal per-column aggregates computed directly
    on the wide frame (no Expand) — same numbers, different plan."""
    from decimal import Decimal

    from pyspark.sql import functions as F

    from weatherapi_data_engineering_project_spark.plans.analytics import (
        _STATS_COLS,
    )
    from weatherapi_data_engineering_project_spark.schemas import load_table

    got = {r.col_name: r for r in A.q111_table_stats(spark, SF_DIR).collect()}
    li = load_table(spark, SF_DIR, "lineitem")
    n = li.count()
    for c in _STATS_COLS:
        direct = li.agg(
            F.countDistinct(c).alias("ndv"),
            F.min(c).alias("mn"),
            F.max(c).alias("mx"),
            F.sum(F.col(c).cast("decimal(18,2)")).cast("double").alias("s"),
        ).collect()[0]
        r = got[c]
        assert r.n_rows == n and r.n_null == 0
        assert r.ndv == direct.ndv
        assert r.min_val == direct.mn and r.max_val == direct.mx
        assert r.sum_val == direct.s


def test_quality_constraints_detects_planted_violation(spark):
    """The suite's temporal constraint flags the generator's real
    ship-before-order rows; the clean constraints all pass."""
    rows = {r.constraint_name: r
            for r in A.q115_quality_constraints(spark, SF_DIR).collect()}
    assert len(rows) == 6
    temporal = rows["lineitem.l_shipdate >= order date"]
    assert not temporal.passed and temporal.n_violations > 0
    for name, r in rows.items():
        if name != "lineitem.l_shipdate >= order date":
            assert r.passed and r.n_violations == 0
        assert r.n_checked > 0


def test_join_cardinality_estimate_is_sane(spark):
    r = A.q116_join_cardinality_estimate(spark, SF_DIR).collect()[0]
    assert r.exact_n > 0 and r.est_n >= 0
    # 1/8 pk-sample of a pk-fk join: estimate within 50% at tiny SF
    assert abs(r.est_n - r.exact_n) / r.exact_n < 0.5
    assert r.rel_err == round(abs(r.est_n - r.exact_n) / r.exact_n, 6)
