"""Relational operator coverage on the driver star schema (SURVEY §2).

Each ``q_*`` function is a (spark, sf_dir) → DataFrame plan exercising
one or more operator IDs from SURVEY.md §2 on the driver testdata
tables; ``ORACLE`` carries the ANSI-SQL twin DuckDB runs on the same
parquet. Column names are aliased identically on both sides (the
driver's compare sorts columns by name before hashing).

Plan-shape notes (verified via ``.explain("formatted")``, see
tests/test_plans_shape.py):
- dims (region/nation/supplier) are broadcast — no shuffle on the fact
  side for star joins (J4).
- aggregations are partial+final hash aggregates (map-side combine).
- filters/projections reach the parquet scan (PushedFilters/ReadSchema).
- money sums aggregate in decimal (order-insensitive ⇒ reproducible
  under any partitioning; see functions/exact.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.exact import dsum
from ..operators.upsert import upsert
from ..schemas import load_table


# ---------------------------------------------------------------------------
# G-family: aggregation
# ---------------------------------------------------------------------------

def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: TPC-H-Q1-shaped grouped aggregation over lineitem.

    Operators: P8 filter (pushed to scan), G grouped agg with map-side
    partial aggregation; decimal-exact sums. One shuffle on the 6-value
    group key — at 100 TB this is the canonical partial+final hash agg.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-06-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price.cast("decimal(18,4)")).cast("double").alias("sum_disc_price"),
            F.sum(charge.cast("decimal(18,6)")).cast("double").alias("sum_charge"),
            (F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double")
             / F.count(F.lit(1))).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q05_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1: COUNT(DISTINCT pk) audit-style counts per group (cf. the
    pre-merge audits at location.sql:38, condition.sql:29, ...)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


def q06_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G4: SELECT DISTINCT row dedup (condition.sql:34-38, :73-78)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus").distinct()


def q07_first_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G3: deterministic first-wins dedup — first event per user.

    The reference's first-text-wins condition dict
    (DataTransformation.py:69-73) made deterministic via an explicit
    ordering (window row_number) instead of arrival order.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts"), F.col("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "ts", "event_type")
    )


# ---------------------------------------------------------------------------
# J-family: joins / set membership
# ---------------------------------------------------------------------------

def q02_star_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 star join: fact → dims with explicit broadcast of the small
    dimensions, grouped revenue per region/nation.

    lineitem⋈orders shuffles on the join key (unavoidable fact-fact
    join, AQE-coalesced); customer/nation/region ride in as broadcasts
    so the big side is never re-shuffled for them.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    revenue = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(revenue).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


def q03_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 semi-join: customers having a high-value order (the WHERE pk
    IN (SELECT pk FROM stage) shape of location.sql:65 et al.)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    big = o.filter(F.col("o_totalprice") > 400000.0).select("o_custkey")
    return c.join(big, c.c_custkey == big.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


def q04_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 anti-join: customers with no high-value order (the NOT IN insert
    guard of condition.sql:73-78; keys non-null so left_anti ≡ NOT IN)."""
    c = load_table(spark, sf_dir, "customer")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 300000.0)
        .select("o_custkey")
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_acctbal"
    )


def q14_merge_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1+G2+J1: the pre/post-merge audit-count pair as one plan
    (location.sql:38 and :62-68). Stage = open orders; target = orders."""
    o = load_table(spark, sf_dir, "orders")
    stage = o.filter(F.col("o_orderstatus") == "O").select("o_orderkey")
    n0 = stage.agg(F.countDistinct("o_orderkey").alias("n0"))
    n1 = (
        o.join(stage.distinct(), on="o_orderkey", how="left_semi")
        .agg(F.countDistinct("o_orderkey").alias("n1"))
    )
    return n0.crossJoin(n1)


# ---------------------------------------------------------------------------
# K-family: key construction / scalar expressions
# ---------------------------------------------------------------------------

def q08_surrogate_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1/K2/K7/K8: surrogate keys "{id}_{yyyyMMdd}" + path interpolation
    (DataTransformation.py:85-89, :168-170; file keys at :61-62).

    Pure codegen'd expressions (concat_ws/date_format) — the Spark-first
    replacement for the reference's per-record Python stamping loop.
    """
    o = load_table(spark, sf_dir, "orders")
    day = F.date_format("o_orderdate", "yyyyMMdd")
    return o.select(
        "o_orderkey",
        F.concat_ws("_", F.col("o_custkey").cast("string"), day).alias("order_day_id"),
        F.concat_ws(
            "/", F.lit("curated"), F.lit("orders"), day, F.col("o_orderkey").cast("string")
        ).alias("object_key"),
    )


def q09_case_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K10 CASE normalization (the code-1000→'Sunny' rewrite of
    condition.sql:57-66) applied to order status, then G-agg."""
    o = load_table(spark, sf_dir, "orders")
    norm = (
        F.when(F.col("o_orderstatus") == "O", F.lit("OPEN"))
        .when(F.col("o_orderstatus") == "F", F.lit("FULFILLED"))
        .otherwise(F.col("o_orderstatus"))
    )
    return (
        o.select(norm.alias("status_norm"), "o_totalprice")
        .groupBy("status_norm")
        .agg(dsum("o_totalprice").alias("total_price"), F.count(F.lit(1)).alias("n"))
    )


def q18_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access: JSON field extraction from the events
    props column (the engine's analogue of the reference's nested-JSON
    path access, DataTransformation.py:150)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select("event_type", k.alias("k"))
        .filter(F.col("k").isNotNull())
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.count(F.lit(1)).alias("n"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


# ---------------------------------------------------------------------------
# P-family: projection / filter
# ---------------------------------------------------------------------------

def q10_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1-P5+P8: select/rename/reorder with a pushed-down predicate.

    Mirrors the reference's manual column pruning + rename maps
    (DataTransformation.py:26-44); `.explain` shows the filter and the
    4-column ReadSchema pushed into the parquet scan.
    """
    p = load_table(spark, sf_dir, "part")
    return (
        p.filter((F.col("p_size") >= 25) & (F.col("p_retailprice") > 905.0))
        .select(
            "p_partkey",
            F.col("p_brand").alias("brand"),
            F.col("p_type").alias("part_type"),
            F.col("p_retailprice").alias("retail_price"),
        )
    )


# ---------------------------------------------------------------------------
# A-family: array / nested
# ---------------------------------------------------------------------------

def q11_array_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A3: array element selection by position — the reference keeps
    forecastday[1,2] and hour[0,10,20] (DataTransformation.py:202-205,
    :95-98); here: fixed positions of the embedding array."""
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.element_at("embedding", 1).cast("double").alias("v0"),
        F.element_at("embedding", 11).cast("double").alias("v10"),
        F.element_at("embedding", 21).cast("double").alias("v20"),
    )


def q12_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2/A3: posexplode of the embedding array with a positional filter
    (keep pos ∈ {0,10,20} — the hour-index selection shape). The filter
    sits directly on the generator output so Spark never materializes
    the dropped 61/64 of the rows downstream."""
    e = load_table(spark, sf_dir, "embeddings")
    return (
        e.select("vec_id", F.posexplode("embedding").alias("pos", "val"))
        .filter(F.col("pos").isin(0, 10, 20))
        .select("vec_id", "pos", F.col("val").cast("double").alias("val"))
    )


# ---------------------------------------------------------------------------
# M-family: upsert
# ---------------------------------------------------------------------------

def _orders_updates(o: DataFrame) -> DataFrame:
    """Synthetic stage batch: every open order re-delivered with a new
    price (UPDATE branch) + new synthetic keys (INSERT branch)."""
    updated = o.filter(F.col("o_orderstatus") == "O").select(
        "o_orderkey",
        "o_custkey",
        F.lit("U").alias("o_orderstatus"),
        # scale 4 ≥ the product's exact decimal scale (2+2), so the cast
        # never rounds — Spark's string-based HALF_UP and DuckDB's binary
        # rounding would disagree on true .xx5 midpoints at scale 2.
        (F.col("o_totalprice") * 1.05).cast("decimal(18,4)").cast("double").alias("o_totalprice"),
    )
    inserted = o.filter(F.col("o_custkey") < 100).select(
        (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
        "o_custkey",
        F.lit("N").alias("o_orderstatus"),
        F.col("o_totalprice"),
    )
    return updated.unionByName(inserted)


def q13_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1 MERGE upsert (location.sql:43-59 et al.): anti-join + union
    with window-dedup of the stage. See operators/upsert.py."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    return upsert(o, _orders_updates(o), keys=["o_orderkey"])


# ---------------------------------------------------------------------------
# Window / top-k / rollup (engine extensions; SURVEY §2.I)
# ---------------------------------------------------------------------------

def q15_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running cumulative spend per customer (window aggregation).
    Decimal-typed running sum so segment-tree vs sequential window
    evaluation cannot produce float drift."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w)
        .cast("double")
        .alias("running_spend"),
    )


def q16_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by price (rank-based top-k; deterministic
    tiebreak on key)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


def q17_hour_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bucketed rollup on the events stream table — the batch twin
    of the streaming tumbling-window aggregation (streaming/load.py uses
    the same grouping under readStream)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", "ts").alias("hour_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", scale=6).alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


# ---------------------------------------------------------------------------
# Registry + oracle SQL
# ---------------------------------------------------------------------------

QUERIES = {
    "q01_pricing_summary": q01_pricing_summary,
    "q02_star_revenue": q02_star_revenue,
    "q03_semi_join": q03_semi_join,
    "q04_anti_join": q04_anti_join,
    "q05_count_distinct": q05_count_distinct,
    "q06_distinct": q06_distinct,
    "q07_first_wins": q07_first_wins,
    "q08_surrogate_key": q08_surrogate_key,
    "q09_case_normalize": q09_case_normalize,
    "q10_projection": q10_projection,
    "q11_array_index": q11_array_index,
    "q12_explode": q12_explode,
    "q13_upsert": q13_upsert,
    "q14_merge_audit": q14_merge_audit,
    "q15_window_running": q15_window_running,
    "q16_topk_per_group": q16_topk_per_group,
    "q17_hour_rollup": q17_hour_rollup,
    "q18_json_extract": q18_json_extract,
}

ORACLE = {
    "q01_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2001-06-01 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    "q02_star_revenue": """
        SELECT r_name, n_name,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
               COUNT(*) AS n_lineitems
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
    """,
    "q03_semi_join": """
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer
        WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000.0)
    """,
    "q04_anti_join": """
        SELECT c_custkey, c_name, c_acctbal
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
    """,
    "q05_count_distinct": """
        SELECT o_orderstatus,
               COUNT(DISTINCT o_custkey) AS n_customers,
               COUNT(*) AS n_orders
        FROM orders GROUP BY o_orderstatus
    """,
    "q06_distinct": """
        SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
    """,
    "q07_first_wins": """
        SELECT user_id, event_id, ts, event_type
        FROM (SELECT user_id, event_id, ts, event_type,
                     ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
              FROM events)
        WHERE rn = 1
    """,
    "q08_surrogate_key": """
        SELECT o_orderkey,
               CAST(o_custkey AS VARCHAR) || '_' || strftime(o_orderdate, '%Y%m%d') AS order_day_id,
               'curated/orders/' || strftime(o_orderdate, '%Y%m%d') || '/' || CAST(o_orderkey AS VARCHAR) AS object_key
        FROM orders
    """,
    "q09_case_normalize": """
        SELECT CASE WHEN o_orderstatus = 'O' THEN 'OPEN'
                    WHEN o_orderstatus = 'F' THEN 'FULFILLED'
                    ELSE o_orderstatus END AS status_norm,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
               COUNT(*) AS n
        FROM orders
        GROUP BY 1
    """,
    "q10_projection": """
        SELECT p_partkey, p_brand AS brand, p_type AS part_type,
               p_retailprice AS retail_price
        FROM part
        WHERE p_size >= 25 AND p_retailprice > 905.0
    """,
    "q11_array_index": """
        SELECT vec_id,
               CAST(embedding[1] AS DOUBLE) AS v0,
               CAST(embedding[11] AS DOUBLE) AS v10,
               CAST(embedding[21] AS DOUBLE) AS v20
        FROM embeddings
    """,
    "q12_explode": """
        SELECT vec_id, pos, CAST(val AS DOUBLE) AS val
        FROM (SELECT vec_id,
                     generate_subscripts(embedding, 1) - 1 AS pos,
                     unnest(embedding) AS val
              FROM embeddings)
        WHERE pos IN (0, 10, 20)
    """,
    "q13_upsert": """
        WITH updates AS (
            SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
                   CAST(CAST(o_totalprice * 1.05 AS DECIMAL(18,4)) AS DOUBLE) AS o_totalprice
            FROM orders WHERE o_orderstatus = 'O'
            UNION ALL
            SELECT o_orderkey + 10000000, o_custkey, 'N', o_totalprice
            FROM orders WHERE o_custkey < 100
        )
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        FROM orders
        WHERE o_orderkey NOT IN (SELECT o_orderkey FROM updates)
        UNION ALL
        SELECT * FROM updates
    """,
    "q14_merge_audit": """
        SELECT (SELECT COUNT(DISTINCT o_orderkey) FROM orders WHERE o_orderstatus = 'O') AS n0,
               (SELECT COUNT(DISTINCT o_orderkey) FROM orders
                WHERE o_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'O')) AS n1
    """,
    "q15_window_running": """
        SELECT o_orderkey, o_custkey, o_orderdate,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                   AS running_spend
        FROM orders
    """,
    "q16_topk_per_group": """
        SELECT o_custkey, o_orderkey, o_totalprice, rn
        FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                     ROW_NUMBER() OVER (PARTITION BY o_custkey
                                        ORDER BY o_totalprice DESC, o_orderkey) AS rn
              FROM orders)
        WHERE rn <= 3
    """,
    "q17_hour_rollup": """
        SELECT date_trunc('hour', ts) AS hour_start, event_type,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
               COUNT(DISTINCT user_id) AS n_users
        FROM events
        GROUP BY 1, 2
    """,
    "q18_json_extract": """
        SELECT event_type,
               CAST(SUM(k) AS BIGINT) AS sum_k, COUNT(*) AS n,
               MIN(k) AS min_k, MAX(k) AS max_k
        FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS INT) AS k
              FROM events)
        WHERE k IS NOT NULL
        GROUP BY event_type
    """,
}
