"""Time-series / multi-level analytics operators over the events stream
table and orders: gap sessionization, as-of join, rollup, set ops.

These widen §2 coverage with the operators any production use of the
reference's fact tables needs (and that Spark users expect from an
analytics engine): the reference itself has none of them (SURVEY.md
§2.I — "no theta/range/as-of joins, no window functions, no
union/intersect/except"), so they are engine extensions, each with an
exact ANSI-SQL oracle.

Scale notes (100 TB story):
- sessionize and as-of are single-shuffle window plans: ONE exchange
  hash-partitioned by user_id, then both the lag/cumsum (sessionize)
  and the last-non-null carry (as-of) run inside the sorted partition.
  No joins, no second shuffle; at 1000 executors each user's timeline
  lands on one task, and AQE handles hot users via skew-split only if
  a single user exceeds a partition (then salting by day is the known
  mitigation).
- the as-of join is deliberately NOT a range join (which Spark plans
  as broadcast-nested-loop): union the two sides, sort once, carry the
  last right-side timestamp forward — O(n log n) instead of O(n·m).
- rollup is Catalyst's Expand + partial hash aggregate: map-side
  combine happens before the single shuffle, so the shuffle carries
  one row per (group × grouping-set) per task, not per input row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..schemas import load_table

SESSION_GAP_US = 4 * 3600 * 1_000_000  # 4 h gap closes a session


def q31_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: a >4 h silence starts a new session.

    lag + cumulative-sum over a (user_id, ts) window — the batch twin
    of streaming ``session_window`` (streaming/windows.py uses the
    built-in; this formulation is what a SQL engine can verify).
    """
    ev = load_table(spark, sf_dir, "events")
    # event_id tiebreak: with ts alone, tied timestamps make lag/cumsum
    # nondeterministic across engines; the surrogate id pins the order.
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    new_s = F.when(
        prev.isNull()
        | (F.unix_micros(F.col("ts")) - F.unix_micros(prev) > SESSION_GAP_US),
        F.lit(1),
    ).otherwise(F.lit(0))
    sess = ev.withColumn("new_s", new_s).withColumn(
        "session_idx",
        F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sess.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.sum(F.col("value").cast("decimal(18,6)"))
        .cast("double")
        .alias("sum_value"),
    )


def q32_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each click matched to the latest purchase at-or-before
    it by the same user (NULL if none yet).

    Implemented as union + sorted last-non-null carry (see module
    docstring); the DuckDB oracle uses its native ASOF LEFT JOIN, so
    this differentially proves our composition implements the real
    as-of semantics. Ties (purchase ts == click ts) count as matched:
    the right side sorts before the left at equal ts.
    """
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", F.lit(None).cast("timestamp").alias("p_ts"),
        F.lit(0).alias("is_right"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.lit(None).cast("long").alias("event_id"), "user_id", "ts",
        F.col("ts").alias("p_ts"), F.lit(1).alias("is_right"),
    )
    both = clicks.unionByName(purchases)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("is_right").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = both.withColumn(
        "last_purchase_ts", F.last("p_ts", ignorenulls=True).over(w)
    )
    return carried.filter(F.col("is_right") == 0).select(
        "event_id", "user_id", "ts", "last_purchase_ts"
    )


def q33_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-level ROLLUP: (status, priority) → status subtotals → grand
    total, one Expand + single-shuffle hash aggregate."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "sum_price",
        )
    )


def q34_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operators: (1995 buyers ∩ 1996 buyers) \\ finished-order
    buyers — INTERSECT and EXCEPT with DISTINCT semantics, planned by
    Catalyst as hash semi/anti joins on the pre-aggregated key sets."""
    o = load_table(spark, sf_dir, "orders")
    buyers_95 = o.filter(F.year("o_orderdate") == 1995).select("o_custkey")
    buyers_96 = o.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    finished = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return buyers_95.intersect(buyers_96).subtract(finished)


def q36_exact_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distributed median of order price per priority.

    Formulated as rank-vs-count window selection + decimal average of
    the (one or two) middle rows — identical arithmetic in any engine,
    unlike percentile interpolation whose float rounding is
    implementation-defined. One shuffle (window partition), then a
    two-row-per-group aggregate.
    """
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice"), F.col("o_orderkey")
    )
    ranked = o.select(
        "o_orderpriority",
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1))
        .over(Window.partitionBy("o_orderpriority"))
        .alias("n"),
    )
    mid = ranked.filter(
        (F.col("rn") == F.floor((F.col("n") + 1) / 2))
        | (F.col("rn") == F.floor(F.col("n") / 2) + 1)
    )
    return mid.groupBy("o_orderpriority").agg(
        F.avg("price").cast("double").alias("median_price"),
        F.max("n").alias("n_orders"),
    )


def q37_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: order counts + decimal revenue per priority, one column
    pair per status — Catalyst plans it as a single hash aggregate with
    conditional expressions (which is exactly the SQL oracle's FILTER
    formulation)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("rev"),
        )
    )


def q38_scalar_gauntlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-function coverage in one projection: math, string, date,
    and conditional functions whose results are exactly defined (no
    implementation-defined float transcendentals), so the oracle match
    is bit-exact."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.abs(F.col("o_totalprice") * -1).alias("abs_price"),
        F.round(F.col("o_totalprice"), 0).alias("round_price"),
        F.floor("o_totalprice").cast("long").alias("floor_price"),
        F.ceil("o_totalprice").cast("long").alias("ceil_price"),
        F.pmod(F.col("o_orderkey"), F.lit(7)).alias("key_mod7"),
        F.sqrt(F.col("o_orderkey").cast("double")).alias("key_sqrt"),
        F.upper(F.substring("o_orderpriority", 1, 3)).alias("prio3"),
        F.lpad(F.col("o_orderkey").cast("string"), 12, "0").alias("key_pad"),
        F.length("o_orderpriority").alias("prio_len"),
        F.concat_ws("|", "o_orderstatus", "o_orderpriority").alias("tag"),
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.date_add(F.to_date("o_orderdate"), 30).alias("due_date"),
        F.last_day("o_orderdate").alias("month_end"),
        F.greatest(F.year("o_orderdate"), F.lit(1996)).alias("y_floor"),
        F.coalesce(
            F.nullif("o_orderstatus", F.lit("P")), F.lit("PENDING")
        ).alias("status_norm"),
    )


def q44_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join: for every error event, how many events the
    same user produced in the following hour.

    Equality on user_id + a range predicate on ts: Catalyst plans the
    equi-part as the join key and evaluates the range as a join filter,
    so this stays a hash/sort-merge join — never a nested loop. (A pure
    range join with no equality would be the BNL trap; keying by entity
    is what makes interval joins scale.)
    """
    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"), F.col("user_id"), F.col("ts").alias("err_ts")
    )
    later = ev.select("user_id", F.col("ts").alias("ev_ts"))
    joined = errors.join(later, on="user_id").filter(
        (F.col("ev_ts") > F.col("err_ts"))
        & (F.unix_micros("ev_ts") - F.unix_micros("err_ts") <= 3600 * 1_000_000)
    )
    return (
        joined.groupBy("error_id", "user_id")
        .agg(F.count(F.lit(1)).alias("n_following"))
    )


def q45_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column operators: per-user event-type counts packed
    into a map (map_from_entries ∘ collect aggregate), then consumed
    back out via explode + map cardinality. The flattened output is what
    the oracle recomputes directly — the map round-trip itself is the
    Spark surface under test."""
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    mapped = per_type.groupBy("user_id").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("event_type", "n")))
        ).alias("type_counts")
    )
    return mapped.select(
        "user_id",
        F.size("type_counts").alias("n_types"),
        F.explode("type_counts").alias("event_type", "n_events"),
    )


def q78_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT — the inverse of q37's pivot and a distinct operator:
    wide part metrics melt into (metric, value) long form via
    ``DataFrame.unpivot`` (Catalyst's Expand node: one pass, rows×k
    output, no shuffle, no join). The oracle states the same reshape
    as a UNION ALL of per-metric projections, which is also the
    engine-portable fallback formulation."""
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_size").cast("double").alias("p_size"),
        F.col("p_retailprice").cast("double").alias("p_retailprice"),
    )
    return p.unpivot(
        ids=["p_partkey"],
        values=["p_size", "p_retailprice"],
        variableColumnName="metric",
        valueColumnName="value",
    )


# q111's audited numeric columns. All four are 2-decimal money/rate
# doubles in this dataset, so the decimal(18,2) sum is exact and the
# final CAST ... AS DOUBLE is the repo's q01 convention.
_STATS_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def q111_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style per-column statistics as a query — the stats
    collector a cost-based optimizer (and every data-quality monitor)
    runs per table: for each audited numeric column of lineitem, row
    count, null count, exact distinct count, min/max, and the
    decimal-exact sum. The wide table melts via ``unpivot`` (q78's
    Expand node — one pass, rows x k, no shuffle), then ONE grouped
    aggregate per column name computes everything; the exact ndv is a
    (col_name, val)-keyed partial agg, the distributed shape of
    ANALYZE .. COMPUTE STATISTICS (which would use HLL where q43
    shows the sketch path)."""
    li = load_table(spark, sf_dir, "lineitem").select(*_STATS_COLS)
    long = li.unpivot(
        ids=[],
        values=list(_STATS_COLS),
        variableColumnName="col_name",
        valueColumnName="val",
    )
    return long.groupBy("col_name").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("val").isNull().cast("long")).alias("n_null"),
        F.countDistinct("val").alias("ndv"),
        F.min("val").alias("min_val"),
        F.max("val").alias("max_val"),
        F.sum(F.col("val").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_val"),
    )


def q115_quality_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality constraint suite — the deequ/dbt-test shape: each
    declared constraint (uniqueness, referential integrity, range,
    accepted values, non-null) evaluates to one (constraint,
    n_checked, n_violations, passed) row; the suite is the UNION of
    independent scalar aggregates, so a scheduler can run it after
    every load (the reference's G1/G2 COUNT-DISTINCT audits are the
    two-table special case of this operator).

    Scale shape: every constraint is one partial agg over its own
    scan (count/distinct/conditional-sum); the FK check is one
    broadcast anti-join keyed on the dim pk. No constraint ever
    materializes violating ROWS — only counts travel."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    def row(name, checked_col, viol_col):
        return F.struct(
            F.lit(name).alias("constraint_name"),
            checked_col.cast("long").alias("n_checked"),
            viol_col.cast("long").alias("n_violations"),
        )

    uniq = o.agg(
        row(
            "orders.o_orderkey unique",
            F.count(F.lit(1)),
            F.count(F.lit(1)) - F.countDistinct("o_orderkey"),
        ).alias("r")
    )
    fk = li.join(
        F.broadcast(o.select("o_orderkey")),
        li.l_orderkey == F.col("o_orderkey"),
        "left",
    ).agg(
        row(
            "lineitem.l_orderkey -> orders",
            F.count(F.lit(1)),
            F.sum(F.col("o_orderkey").isNull().cast("long")),
        ).alias("r")
    )
    qty = li.agg(
        row(
            "lineitem.l_quantity in [1,50]",
            F.count(F.lit(1)),
            F.sum(
                (~F.col("l_quantity").between(1.0, 50.0)).cast("long")
            ),
        ).alias("r")
    )
    disc = li.agg(
        row(
            "lineitem.l_discount in [0,0.1]",
            F.count(F.lit(1)),
            F.sum(
                (~F.col("l_discount").between(0.0, 0.1)).cast("long")
            ),
        ).alias("r")
    )
    status = o.agg(
        row(
            "orders.o_orderstatus accepted",
            F.count(F.lit(1)),
            F.sum(
                (~F.col("o_orderstatus").isin("O", "F", "P")).cast("long")
            ),
        ).alias("r")
    )
    # cross-table temporal invariant — the one this synthetic generator
    # actually violates, proving the suite detects, not just rubber-stamps
    temporal = li.join(
        F.broadcast(o.select("o_orderkey", "o_orderdate")),
        li.l_orderkey == F.col("o_orderkey"),
    ).agg(
        row(
            "lineitem.l_shipdate >= order date",
            F.count(F.lit(1)),
            F.sum((F.col("l_shipdate") < F.col("o_orderdate")).cast("long")),
        ).alias("r")
    )
    suite = (
        uniq.unionByName(fk)
        .unionByName(qty)
        .unionByName(disc)
        .unionByName(status)
        .unionByName(temporal)
    )
    return suite.select("r.*").withColumn(
        "passed", F.col("n_violations") == 0
    )


# q116 sampling rate: keep orders whose md5(o_orderkey) first byte is
# < 0x20 — exactly 32/256 = 1/8 of hash space, deterministic on any
# cluster (the q39 hash-sampling technique applied to cardinality
# estimation, the sampled input to a cost-based join planner).
_CARD_SCALE = 8


def q116_join_cardinality_estimate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Join-cardinality estimation by deterministic key sampling:
    join lineitem against a 1/8 md5-hash sample of orders, scale the
    hit count back up, and report it against the exact join count
    with the relative error — the statistics pass a cost-based
    optimizer runs INSTEAD of the full join at 100 TB (here the exact
    side exists only as the differential's truth). Sampling the DIM
    side by its pk keeps the estimate unbiased for pk-fk joins: every
    fact row's key is kept with probability exactly 1/8."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    samp = o.filter(
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 2) < "20"
    )
    est = li.join(
        F.broadcast(samp), li.l_orderkey == samp.o_orderkey
    ).agg((F.count(F.lit(1)) * _CARD_SCALE).alias("est_n"))
    exact = li.join(
        F.broadcast(o), li.l_orderkey == o.o_orderkey
    ).agg(F.count(F.lit(1)).alias("exact_n"))
    return exact.crossJoin(est).select(
        "exact_n",
        "est_n",
        F.round(
            F.abs(F.col("est_n") - F.col("exact_n")).cast("double")
            / F.col("exact_n"),
            6,
        ).alias("rel_err"),
    )


QUERIES = {
    "q31_sessionize": q31_sessionize,
    "q32_asof_join": q32_asof_join,
    "q33_rollup": q33_rollup,
    "q34_setops": q34_setops,
    "q36_exact_median": q36_exact_median,
    "q37_pivot": q37_pivot,
    "q38_scalar_gauntlet": q38_scalar_gauntlet,
    "q44_range_join": q44_range_join,
    "q45_map_functions": q45_map_functions,
    "q78_unpivot": q78_unpivot,
    "q111_table_stats": q111_table_stats,
    "q115_quality_constraints": q115_quality_constraints,
    "q116_join_cardinality_estimate": q116_join_cardinality_estimate,
}

ORACLE = {
    "q31_sessionize": f"""
        WITH marked AS (
            SELECT user_id, event_id, ts, value,
                   CASE WHEN lag(ts) OVER w IS NULL
                          OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                             > {SESSION_GAP_US}
                        THEN 1 ELSE 0 END AS new_s
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        numbered AS (
            SELECT user_id, ts, value,
                   -- CAST: DuckDB's window SUM yields HUGEINT; Spark's is
                   -- BIGINT, and the driver hash distinguishes the types.
                   CAST(SUM(new_s) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id
                                         ROWS UNBOUNDED PRECEDING)
                        AS BIGINT) AS session_idx
            FROM marked)
        SELECT user_id, session_idx,
               COUNT(*) AS n_events,
               MIN(ts) AS session_start,
               MAX(ts) AS session_end,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        FROM numbered
        GROUP BY user_id, session_idx
    """,
    "q32_asof_join": """
        SELECT c.event_id, c.user_id, c.ts, p.ts AS last_purchase_ts
        FROM (SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'click') c
        ASOF LEFT JOIN (SELECT user_id, ts FROM events
                        WHERE event_type = 'purchase') p
          ON c.user_id = p.user_id AND p.ts <= c.ts
    """,
    "q33_rollup": """
        SELECT COALESCE(o_orderstatus, 'ALL') AS status,
               COALESCE(o_orderpriority, 'ALL') AS priority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM orders
        GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
    """,
    "q34_setops": """
        (SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
         INTERSECT
         SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996)
        EXCEPT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    "q36_exact_median": """
        WITH ranked AS (
            SELECT o_orderpriority,
                   CAST(o_totalprice AS DECIMAL(18,2)) AS price,
                   ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                      ORDER BY o_totalprice, o_orderkey) AS rn,
                   COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
            FROM orders)
        SELECT o_orderpriority,
               CAST(AVG(price) AS DOUBLE) AS median_price,
               MAX(n) AS n_orders
        FROM ranked
        WHERE rn = floor((n + 1) / 2.0) OR rn = floor(n / 2.0) + 1
        GROUP BY o_orderpriority
    """,
    "q37_pivot": """
        SELECT o_orderpriority,
               COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS "F_n",
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                    FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS "F_rev",
               COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS "O_n",
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                    FILTER (WHERE o_orderstatus = 'O') AS DOUBLE) AS "O_rev",
               COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS "P_n",
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                    FILTER (WHERE o_orderstatus = 'P') AS DOUBLE) AS "P_rev"
        FROM orders
        GROUP BY o_orderpriority
    """,
    "q44_range_join": """
        SELECT e.event_id AS error_id, e.user_id,
               COUNT(*) AS n_following
        FROM (SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'error') e
        JOIN events f
          ON f.user_id = e.user_id
         AND f.ts > e.ts
         AND epoch_us(f.ts) - epoch_us(e.ts) <= 3600000000
        GROUP BY e.event_id, e.user_id
    """,
    "q45_map_functions": """
        SELECT user_id,
               COUNT(*) OVER (PARTITION BY user_id) AS n_types,
               event_type,
               n_events
        FROM (SELECT user_id, event_type, COUNT(*) AS n_events
              FROM events GROUP BY user_id, event_type)
    """,
    "q38_scalar_gauntlet": """
        SELECT o_orderkey,
               abs(o_totalprice * -1) AS abs_price,
               round(o_totalprice, 0) AS round_price,
               CAST(floor(o_totalprice) AS BIGINT) AS floor_price,
               CAST(ceil(o_totalprice) AS BIGINT) AS ceil_price,
               o_orderkey % 7 AS key_mod7,
               sqrt(CAST(o_orderkey AS DOUBLE)) AS key_sqrt,
               upper(substr(o_orderpriority, 1, 3)) AS prio3,
               lpad(CAST(o_orderkey AS VARCHAR), 12, '0') AS key_pad,
               length(o_orderpriority) AS prio_len,
               concat_ws('|', o_orderstatus, o_orderpriority) AS tag,
               year(o_orderdate) AS y,
               month(o_orderdate) AS m,
               day(o_orderdate) AS d,
               CAST(o_orderdate AS DATE) + 30 AS due_date,
               last_day(CAST(o_orderdate AS DATE)) AS month_end,
               greatest(year(o_orderdate), 1996) AS y_floor,
               coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS status_norm
        FROM orders
    """,
    "q78_unpivot": """
        SELECT p_partkey, 'p_size' AS metric,
               CAST(p_size AS DOUBLE) AS value
        FROM part
        UNION ALL
        SELECT p_partkey, 'p_retailprice' AS metric,
               CAST(p_retailprice AS DOUBLE) AS value
        FROM part
    """,
    "q111_table_stats": f"""
        WITH long AS (
            {" UNION ALL ".join(
                f"SELECT '{c}' AS col_name, {c} AS val FROM lineitem"
                for c in _STATS_COLS
            )})
        SELECT col_name,
               COUNT(*) AS n_rows,
               CAST(SUM(CASE WHEN val IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_null,
               COUNT(DISTINCT val) AS ndv,
               MIN(val) AS min_val,
               MAX(val) AS max_val,
               CAST(SUM(CAST(val AS DECIMAL(18,2))) AS DOUBLE) AS sum_val
        FROM long GROUP BY col_name
    """,
    "q115_quality_constraints": """
        WITH suite AS (
            SELECT 'orders.o_orderkey unique' AS constraint_name,
                   COUNT(*) AS n_checked,
                   COUNT(*) - COUNT(DISTINCT o_orderkey) AS n_violations
            FROM orders
            UNION ALL
            SELECT 'lineitem.l_orderkey -> orders',
                   COUNT(*),
                   CAST(SUM(CASE WHEN o.o_orderkey IS NULL
                                 THEN 1 ELSE 0 END) AS BIGINT)
            FROM lineitem l LEFT JOIN orders o
              ON l.l_orderkey = o.o_orderkey
            UNION ALL
            SELECT 'lineitem.l_quantity in [1,50]',
                   COUNT(*),
                   CAST(SUM(CASE WHEN l_quantity BETWEEN 1.0 AND 50.0
                                 THEN 0 ELSE 1 END) AS BIGINT)
            FROM lineitem
            UNION ALL
            SELECT 'lineitem.l_discount in [0,0.1]',
                   COUNT(*),
                   CAST(SUM(CASE WHEN l_discount BETWEEN 0.0 AND 0.1
                                 THEN 0 ELSE 1 END) AS BIGINT)
            FROM lineitem
            UNION ALL
            SELECT 'orders.o_orderstatus accepted',
                   COUNT(*),
                   CAST(SUM(CASE WHEN o_orderstatus IN ('O','F','P')
                                 THEN 0 ELSE 1 END) AS BIGINT)
            FROM orders
            UNION ALL
            SELECT 'lineitem.l_shipdate >= order date',
                   COUNT(*),
                   CAST(SUM(CASE WHEN l.l_shipdate < o.o_orderdate
                                 THEN 1 ELSE 0 END) AS BIGINT)
            FROM lineitem l JOIN orders o
              ON l.l_orderkey = o.o_orderkey)
        SELECT constraint_name, n_checked, n_violations,
               n_violations = 0 AS passed
        FROM suite
    """,
    "q116_join_cardinality_estimate": """
        WITH samp AS (
            SELECT o_orderkey FROM orders
            WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) < '20'),
        est AS (
            SELECT CAST(COUNT(*) * 8 AS BIGINT) AS est_n
            FROM lineitem l JOIN samp s ON l.l_orderkey = s.o_orderkey),
        exact AS (
            SELECT COUNT(*) AS exact_n
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
        SELECT exact_n, est_n,
               ROUND(CAST(ABS(est_n - exact_n) AS DOUBLE) / exact_n, 6)
                   AS rel_err
        FROM exact CROSS JOIN est
    """,
}
