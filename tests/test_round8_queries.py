"""Round-8 brute-force / property tests.

Covers: the q47 converged-clustering graduation (VERDICT r07 #2) — the
engine now runs label propagation to a fixpoint and the oracle is a
recursive-CTE transitive closure, so both sides must agree on graphs
whose diameter exceeds any fixed round count.
"""

from __future__ import annotations

import duckdb

import weatherapi_data_engineering_project_spark.operators.dedup as DD


def _closure_min_duckdb(edges):
    """The q47 oracle's labeling fragment, run standalone on an explicit
    edge list: recursive reach-set closure → per-node component MIN."""
    con = duckdb.connect()
    con.execute("CREATE TABLE pairs (id1 BIGINT, id2 BIGINT)")
    con.executemany("INSERT INTO pairs VALUES (?, ?)", edges)
    rows = con.execute(
        """
        WITH RECURSIVE
        e AS (SELECT id1 AS a, id2 AS b FROM pairs
              UNION ALL
              SELECT id2 AS a, id1 AS b FROM pairs),
        reach(id, x) AS (
            SELECT a AS id, a AS x FROM e
            UNION
            SELECT e.a, reach.x FROM e JOIN reach ON reach.id = e.b),
        l4 AS (SELECT id, MIN(x) AS rep FROM reach GROUP BY id)
        SELECT id, rep FROM l4
        """
    ).fetchall()
    con.close()
    return {int(i): int(r) for i, r in rows}


def test_q47_oracle_closure_matches_converged_engine_deep_chain(spark):
    """VERDICT r07 #2 done-criterion: a deliberately deep chain
    (diameter 12 > the historical 4 rounds) resolves identically in the
    engine's run-to-fixpoint propagation and the oracle's recursive-CTE
    closure — the labeling is now round-count-independent on BOTH
    sides."""
    edges = [(i, i + 1) for i in range(12)]           # diameter-12 chain
    edges += [(100, 101), (101, 102), (100, 102)]     # triangle
    edges += [(200, 201)]                             # isolated pair
    pairs = spark.createDataFrame(edges, "id1 long, id2 long")
    eng = {
        int(r.doc_id): int(r.cluster_rep)
        for r in DD.label_propagation_clusters_converged(pairs).collect()
    }
    assert eng == _closure_min_duckdb(edges)
    assert all(eng[i] == 0 for i in range(13))  # whole chain → one cluster


def test_converged_stops_early_and_respects_round_cap(spark):
    """The fixpoint loop stops as soon as a round changes nothing (a
    star graph converges in 2 rounds regardless of max_rounds), and a
    tight max_rounds cap degrades to the fixed-round labeling rather
    than looping — the documented bound on adversarial graphs."""
    star = [(0, i) for i in range(1, 8)]
    pairs = spark.createDataFrame(star, "id1 long, id2 long")
    eng = {
        int(r.doc_id): int(r.cluster_rep)
        for r in DD.label_propagation_clusters_converged(pairs, max_rounds=2).collect()
    }
    assert eng == {i: 0 for i in range(8)}

    chain = [(i, i + 1) for i in range(9)]
    cpairs = spark.createDataFrame(chain, "id1 long, id2 long")
    capped = {
        int(r.doc_id): int(r.cluster_rep)
        for r in DD.label_propagation_clusters_converged(cpairs, max_rounds=2).collect()
    }
    fixed = {
        int(r.doc_id): int(r.cluster_rep)
        for r in DD.label_propagation_clusters(cpairs, rounds=2).collect()
    }
    assert capped == fixed  # cap honored: identical to 2 fixed rounds
    assert any(v != 0 for v in capped.values())  # and genuinely short


def _phys(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q228_tpch_q2_plan_pins(spark):
    """Q2's correlated scalar MIN must decorrelate into a per-part
    aggregate joined back — never a cartesian/nested-loop — with every
    dim broadcast and the top-100 compiled to TakeOrderedAndProject."""
    from weatherapi_data_engineering_project_spark.plans.extensions import (
        q228_min_cost_supplier,
    )
    p = _phys(q228_min_cost_supplier(spark, "/root/testdata/sf0.001"))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "BroadcastHashJoin" in p  # nation/region/supplier dims
    assert "TakeOrderedAndProject" in p


def test_q229_tpch_q13_outer_join_preserved(spark):
    """Q13's ON-clause filter must NOT let the optimizer rewrite the
    outer join to inner (zero-order customers are the point), and the
    priority predicate must stay on the null-producing ORDERS side."""
    from weatherapi_data_engineering_project_spark.plans.extensions import (
        q229_order_count_distribution,
    )
    p = _phys(q229_order_count_distribution(spark, "/root/testdata/sf0.001"))
    assert "LeftOuter" in p
    assert "CartesianProduct" not in p
    # count(o_orderkey) over the outer join must still see every
    # customer: engine total equals the bare customer count
    df = q229_order_count_distribution(spark, "/root/testdata/sf0.001")
    from weatherapi_data_engineering_project_spark.schemas import load_table
    n_cust = load_table(spark, "/root/testdata/sf0.001", "customer").count()
    import pyspark.sql.functions as F
    total = df.agg(F.sum("custdist")).collect()[0][0]
    assert total == n_cust


def test_q230_tpch_q20_semi_join_chain(spark):
    """Q20's nested INs must compile to semi joins (predicate-subquery
    rewrite) and the correlated SUM to an aggregate join guarded by the
    integer threshold — no cartesian, no nested loop."""
    from weatherapi_data_engineering_project_spark.plans.extensions import (
        q230_excess_share_supplier,
    )
    p = _phys(q230_excess_share_supplier(spark, "/root/testdata/sf0.001"))
    assert p.count("LeftSemi") >= 2
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def _norm_optimized(df) -> str:
    """Canonicalized optimized logical plan with residual expression
    IDs normalized away — equality means Catalyst compiled two queries
    to the same plan, not merely that they agree on one dataset."""
    import re

    s = df._jdf.queryExecution().optimizedPlan().canonicalized().toString()
    return re.sub(r"#\d+", "#", s)


def test_sql_frontdoor_plans_equal_dataframe_twins(spark):
    """VERDICT r07 #5 done-criterion: each literal-SQL front-door query
    compiles to the IDENTICAL optimized plan as its DataFrame twin —
    the SQL surface is the same engine, not a parallel implementation."""
    from weatherapi_data_engineering_project_spark.plans import weather as W
    from weatherapi_data_engineering_project_spark.plans.extensions import (
        q219_shipping_priority,
    )
    from weatherapi_data_engineering_project_spark.plans.sql_frontdoor import (
        q231_sql_pricing_summary,
        q232_sql_shipping_priority,
        q233_sql_star_daily_summary,
    )
    from weatherapi_data_engineering_project_spark.plans.star import (
        q01_pricing_summary,
    )

    sf = "/root/testdata/sf0.001"
    assert _norm_optimized(q231_sql_pricing_summary(spark, sf)) == (
        _norm_optimized(q01_pricing_summary(spark, sf))
    )
    assert _norm_optimized(q232_sql_shipping_priority(spark, sf)) == (
        _norm_optimized(q219_shipping_priority(spark, sf))
    )
    assert _norm_optimized(q233_sql_star_daily_summary(spark, sf)) == (
        _norm_optimized(W.w06_star_daily_summary(spark, sf))
    )
