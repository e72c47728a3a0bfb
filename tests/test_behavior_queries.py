"""Event-behavior + heavy-hitter queries (q97-q99): differentials +
semantics."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR, SF_DIR_ORACLE, compare_query_to_oracle
from weatherapi_data_engineering_project_spark.plans import behavior as B


@pytest.mark.parametrize("name", sorted(B.ORACLE))
def test_behavior_oracle_differential(spark, name):
    compare_query_to_oracle(
        spark, name, B.QUERIES[name], B.ORACLE[name], SF_DIR_ORACLE
    )


def test_funnel_depths_partition_users(spark):
    from weatherapi_data_engineering_project_spark.schemas import load_table

    rows = B.q97_funnel_depth(spark, SF_DIR).collect()
    n_users = (
        load_table(spark, SF_DIR, "events").select("user_id").distinct().count()
    )
    assert sum(r.n_users for r in rows) == n_users
    assert all(0 <= r.depth <= 3 for r in rows)


def test_retention_day_zero_covers_every_user(spark):
    from weatherapi_data_engineering_project_spark.schemas import load_table

    rows = B.q98_retention_cohorts(spark, SF_DIR).collect()
    n_users = (
        load_table(spark, SF_DIR, "events").select("user_id").distinct().count()
    )
    # every user is active on their own cohort day (offset 0), and
    # offsets are never negative
    day0 = sum(r.n_users for r in rows if r.day_offset == 0)
    assert day0 == n_users
    assert all(r.day_offset >= 0 for r in rows)


def test_heavy_hitter_candidates_are_superset(spark):
    """The batch-frequent candidate stage must never lose a true heavy
    hitter: every term the exact GROUP BY puts over the threshold
    appears in q99's output (which only counts candidates)."""
    import duckdb

    res = {r.term for r in B.q99_heavy_hitters(spark, SF_DIR_ORACLE).collect()}
    con = duckdb.connect()
    truth = {
        r[0]
        for r in con.execute(
            B.ORACLE["q99_heavy_hitters"].replace(
                "FROM documents",
                f"FROM read_parquet('{SF_DIR_ORACLE}/documents.parquet')",
            )
        ).fetchall()
    }
    con.close()
    assert res == truth


def test_disorder_audit_recomputes_per_user(spark):
    """Lateness recomputed in Python from each user's arrival-ordered
    event list matches the window plan."""
    from collections import defaultdict

    from weatherapi_data_engineering_project_spark.plans import behavior as B
    from weatherapi_data_engineering_project_spark.schemas import load_table

    ev = defaultdict(list)
    for r in (
        load_table(spark, SF_DIR, "events")
        .select("user_id", "event_id", "ts")
        .collect()
    ):
        ev[r.user_id].append((r.event_id, r.ts))
    got = {r.user_id: r for r in
           B.q113_disorder_audit(spark, SF_DIR).collect()}
    assert set(got) == set(ev)
    for uid, rows in ev.items():
        rows.sort()
        hwm, n_late, max_late = None, 0, 0
        for _, ts in rows:
            if hwm is not None and hwm > ts:
                n_late += 1
                max_late = max(max_late, int((hwm - ts).total_seconds() * 1e6))
            hwm = ts if hwm is None else max(hwm, ts)
        r = got[uid]
        assert r.n_events == len(rows)
        assert r.n_late == n_late
        assert r.max_lateness_us == max_late
