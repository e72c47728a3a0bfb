"""SQL-string front door (VERDICT r07 #5).

Every one of the engine's capabilities is a Python function, but the
reference's warehouse surface is SQL text (``location.sql``,
``condition.sql``, ``current_weather.sql`` — Snowflake worksheets a
user runs verbatim). This module proves the same front door exists
here: the testdata tables and the weather star register as
``spark.sql`` temp views, and three representative queries run from
LITERAL SQL strings that compile to the IDENTICAL optimized logical
plan as their DataFrame twins (pinned in
``tests/test_round8_queries.py`` via canonicalized-plan equality — not
just equal results, equal plans). A user who prefers SQL loses nothing:
same scans, same pushdown, same broadcast choices, same codegen.

The SQL texts mirror their DataFrame twins' structure deliberately —
e.g. q232 projects the exact-decimal revenue expression in a subquery
BEFORE the join, exactly where the DataFrame version projects it, so
even pre-optimization shapes align. Exactness conventions are
inherited verbatim (decimal-cast-then-sum, one final CAST AS DOUBLE).

Oracles: each front-door query reuses its DataFrame twin's
already-verified DuckDB oracle (q231 ← q01, q232 ← q219, q233 ← w06);
the pair (front-door SQL, twin oracle) is a genuine differential — the
Spark text is dialect-specific (LEFT SEMI JOIN, hints), not a copy of
the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .. import fixtures as FX
from . import weather_transform as WT
from .extensions import ORACLE as EXT_ORACLE
from .extensions import _register_views
from .star import ORACLE as STAR_ORACLE
from .weather import ORACLE as WEATHER_ORACLE

# TPC-H Q1 over the lineitem view — the literal-SQL twin of
# star.q01_pricing_summary (same decimal casts, same aliases).
Q231_SQL = """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                         AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(1)
               AS avg_qty,
           COUNT(1) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-06-01'
    GROUP BY l_returnflag, l_linestatus
"""

# TPC-H Q3 — the literal-SQL twin of extensions.q219_shipping_priority.
# LEFT SEMI JOIN is Spark SQL syntax (the DataFrame's how="left_semi");
# the revenue expression projects in a subquery before the join, where
# the DataFrame version projects it.
Q232_SQL = """
    SELECT l_orderkey, CAST(rev_d AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM (
      SELECT l_orderkey, o_orderdate, o_orderpriority, SUM(rev) AS rev_d
      FROM (SELECT l_orderkey,
                   CAST(l_extendedprice AS DECIMAL(18,2))
                       * (1 - CAST(l_discount AS DECIMAL(18,2))) AS rev
            FROM lineitem WHERE l_shipdate > TIMESTAMP '1998-01-01') li
      JOIN (SELECT o_orderkey, o_custkey, o_orderdate, o_orderpriority
            FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01') o
        ON l_orderkey = o_orderkey
      LEFT SEMI JOIN customer
        ON o_custkey = c_custkey AND c_mktsegment = 'BUILDING'
      GROUP BY l_orderkey, o_orderdate, o_orderpriority
      ORDER BY rev_d DESC, o_orderdate, l_orderkey
      LIMIT 10)
"""

# Weather star summary — the literal-SQL twin of
# weather.w06_star_daily_summary over the registered star views; the
# BROADCAST hint mirrors the DataFrame's F.broadcast on both dims.
Q233_SQL = """
    SELECT /*+ BROADCAST(l, c) */
           l.name AS city, f.forecast_date, c.condition_name,
           f.max_temp_c, f.min_temp_c, f.avg_humidity
    FROM fact_forecast_day f
    JOIN dim_location l USING (location_id)
    JOIN dim_condition c USING (condition_code)
"""


def q231_sql_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 from literal SQL text — plan-equal to q01 (pinned)."""
    _register_views(spark, sf_dir, "lineitem")
    return spark.sql(Q231_SQL)


def q232_sql_shipping_priority(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q3 from literal SQL text — plan-equal to q219 (pinned)."""
    _register_views(spark, sf_dir, "lineitem", "orders", "customer")
    return spark.sql(Q232_SQL)


def register_star_views(spark: SparkSession) -> None:
    """Expose the weather star schema as session temp views — the
    reference's warehouse table names (forecast_day_weather et al.
    adapted to this engine's frame names), backed by the REAL
    transform plans, so SQL text sees identical subplans to the
    DataFrame API."""
    docs = FX.docs_df(spark)
    WT.fact_forecast_day(docs, spark).createOrReplaceTempView(
        "fact_forecast_day"
    )
    WT.dim_location(docs, spark).createOrReplaceTempView("dim_location")
    WT.dim_condition(docs, spark).createOrReplaceTempView("dim_condition")


def q233_sql_star_daily_summary(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Weather star summary from literal SQL over the registered star
    views — plan-equal to w06 (pinned). ``sf_dir`` unused (weather
    star derives from the fixture docs, per the weather.py contract)."""
    register_star_views(spark)
    return spark.sql(Q233_SQL)


# Recursive CTE (Spark 4's WITH RECURSIVE, UNION ALL form): roll part
# retail cents up a strict binary hierarchy (parent(k) = floor(k/2)) —
# each node's ancestor chain is ~log2(|part|) rows, so the recursion
# materializes O(n·log n) rows and terminates structurally (the chain
# hits 1). Written as the SAME SQL text on both engines (`FLOOR(a/2)`
# instead of the dialect-split `DIV` / `//`), so the differential
# certifies Spark's recursive-CTE execution against DuckDB's.
Q264_SQL = """
    WITH RECURSIVE anc(node, a) AS (
        SELECT p_partkey, p_partkey FROM part
        UNION ALL
        SELECT node, CAST(FLOOR(a / 2) AS BIGINT) FROM anc WHERE a > 1
    )
    SELECT a AS ancestor,
           COUNT(*) AS n_desc,
           CAST(SUM(cents) AS BIGINT) AS subtree_cents
    FROM anc
    JOIN (SELECT p_partkey,
                 CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                     AS cents
          FROM part) p
      ON p.p_partkey = anc.node
    GROUP BY a
"""


def q264_recursive_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtree rollup via a RECURSIVE CTE: for every
    ancestor in the implicit binary part hierarchy, the count and
    exact retail-cent total of its whole subtree — the BOM/org-chart
    aggregation pattern, expressed in the same literal SQL Spark 4 and
    DuckDB both execute (UNION ALL recursion; Spark does not yet
    accept the deduplicating UNION form, so the hierarchy is a strict
    parent CHAIN that terminates structurally, not a graph closure —
    q47's fixpoint loop remains the cyclic-graph path).

    Scale shape: each recursion step is one self-join of the frontier
    against nothing but itself shrinking by halving — ~log2(n) rounds,
    frontier ≤ n rows; the rollup is one partial-agg shuffle on the
    ancestor key."""
    _register_views(spark, sf_dir, "part")
    return spark.sql(Q264_SQL)


# Window-function front door — the literal-SQL twin of
# star.q16_topk_per_group (same partition, same DESC order, same
# orderkey tiebreak, same rn <= 3 cut). Pinned plan-equal in
# tests/test_round8h_queries.py: SQL text and DataFrame compile to the
# identical optimized plan (WindowGroupLimit pushdown included).
Q272_SQL = """
    SELECT o_custkey, o_orderkey, o_totalprice, rn
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
              ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders)
    WHERE rn <= 3
"""


def q272_sql_topk_per_group(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Ranked top-k per group from LITERAL SQL text — extends the SQL
    front door (q231-q233 cover scan-agg, star join, weather star) to
    the window-function surface. A SQL user writing the textbook
    ROW_NUMBER-and-filter gets the same WindowGroupLimit-optimized
    plan the DataFrame twin (q16) gets."""
    _register_views(spark, sf_dir, "orders")
    return spark.sql(Q272_SQL)


QUERIES = {
    "q264_recursive_rollup": q264_recursive_rollup,
    "q272_sql_topk_per_group": q272_sql_topk_per_group,
    "q231_sql_pricing_summary": q231_sql_pricing_summary,
    "q232_sql_shipping_priority": q232_sql_shipping_priority,
    "q233_sql_star_daily_summary": q233_sql_star_daily_summary,
}

ORACLE = {
    # identical text on purpose: dialect-shared recursion (see Q264_SQL)
    "q264_recursive_rollup": Q264_SQL,
    "q272_sql_topk_per_group": STAR_ORACLE["q16_topk_per_group"],
    "q231_sql_pricing_summary": STAR_ORACLE["q01_pricing_summary"],
    "q232_sql_shipping_priority": EXT_ORACLE["q219_shipping_priority"],
    "q233_sql_star_daily_summary": WEATHER_ORACLE["w06_star_daily_summary"],
}
