"""Temporal warehouse operators (round 4b, part 3): SCD2 dimension
history, time-weighted averages, calendar gap-filling.

Engine extensions beyond the reference (SURVEY.md §2.I), extending its
warehouse theme: the reference's MERGE upserts keep only current state
(type-1); q100 derives the full type-2 validity history. q101/q102 are
the hypertable-style time-series operators (TWAP, gapfill+locf) that a
metrics warehouse layers on an event log.

Scale notes (100 TB story):
- All three window over (user_id) partitions — per-entity history is
  the natural partition and is bounded; no global sorts anywhere.
- q101's weighted sums accumulate decimal(value) x integer(microsecond
  duration) — both exact, so the per-user TWAP is partitioning-
  independent and the only float op is the final division.
- q102 generates each user's calendar with sequence() row-locally
  (days-per-user array, no cross join against a calendar table) and
  forward-fills with last(..., ignorenulls=True) over the bounded
  per-user frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..schemas import load_table


def q100_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension history derived from the event
    log: per user, consecutive runs of the same event_type collapse
    into one VERSION row with [valid_from, valid_to) bounds and an
    is_current flag — the gaps-and-islands + LEAD construction every
    warehouse uses to upgrade type-1 state to auditable history
    (the reference's MERGE keeps only current state; this is the
    history it discards). Ties broken by event_id so version
    boundaries are engine-identical."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.select(
        "user_id", "ts", "event_id", "event_type"
    ).withColumn(
        "is_new",
        (
            F.lag("event_type").over(w).isNull()
            | (F.lag("event_type").over(w) != F.col("event_type"))
        ).cast("long"),
    )
    versioned = marked.withColumn(
        "version",
        F.sum("is_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    runs = versioned.groupBy("user_id", "version").agg(
        F.first("event_type").alias("state"),
        F.min("ts").alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    wv = Window.partitionBy("user_id").orderBy("version")
    return runs.select(
        "user_id",
        "version",
        "state",
        "valid_from",
        F.lead("valid_from").over(wv).alias("valid_to"),
        F.lead("valid_from").over(wv).isNull().alias("is_current"),
        "n_events",
    )


def q101_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per user over the event series:
    each event's value holds until the user's next event (piecewise-
    constant), weighted by that duration in microseconds; the last
    event carries zero weight. TWAP = sum(value * dur) / sum(dur),
    accumulated as exact decimal x integer so the result is
    partitioning-independent; only the final division is float,
    rounded to 6dp on both engines."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    delta = ev.select(
        "user_id",
        F.col("value").cast("decimal(18,2)").alias("v"),
        (F.unix_micros(F.lead("ts").over(w)) - F.unix_micros(F.col("ts")))
        .alias("dur_us"),
    ).filter(F.col("dur_us").isNotNull())
    agg = delta.groupBy("user_id").agg(
        F.sum(F.col("v") * F.col("dur_us")).alias("wsum"),
        F.sum("dur_us").alias("dsum"),
        F.count(F.lit(1)).alias("n_intervals"),
    )
    return agg.select(
        "user_id",
        "n_intervals",
        F.round(
            F.col("wsum").cast("double") / F.col("dsum").cast("double"), 6
        ).alias("twap"),
    )


def q102_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar gap-fill with last-observation-carried-forward: per
    user, every day from first to last activity; days with events
    report that day's LAST value (by ts, event_id), silent days carry
    the previous value forward and are flagged filled=true — the
    time_bucket_gapfill + locf pair of hypertable warehouses. The
    calendar is generated row-locally per user (sequence over the
    day span), never via a cross join against a calendar table."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            "user_id",
            F.date_trunc("day", "ts").cast("date").alias("day"),
            F.struct("ts", "event_id", F.col("value").alias("v")).alias("s"),
        )
        .groupBy("user_id", "day")
        .agg(F.max("s")["v"].alias("day_value"))
    )
    span = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    cal = span.select(
        "user_id",
        F.explode(
            F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))
        ).alias("day"),
    )
    joined = cal.join(daily, ["user_id", "day"], "left")
    wfill = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "user_id",
        "day",
        F.last("day_value", ignorenulls=True).over(wfill).alias("value"),
        F.col("day_value").isNull().alias("filled"),
    )


# q169 ACF formula — ONE shared SQL string both engines evaluate
# verbatim over exact integer aggregates (q135 convention): with
# x̄ = s/n, n²·Σ(x_t−x̄)(x_{t+k}−x̄) = n²·Σx_t·x_{t+k} − n·s·(A_k+B_k)
# + (n−k)·s², and n²·Σ(x_t−x̄)² = n²·Σx² − n·s² — every term is an
# exact integer cast to DOUBLE (all far below 2^53 at bench scales;
# the casts are where a petabyte-scale deployment would switch the
# aggregates to DECIMAL before the division).
_ACF = (
    "CASE WHEN (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)"
    " * CAST(p2 AS DOUBLE)) - (CAST(n AS DOUBLE) * CAST(s AS DOUBLE)"
    " * CAST(s AS DOUBLE)) > 0 THEN"
    " ROUND(((CAST(n AS DOUBLE) * CAST(n AS DOUBLE)"
    " * CAST(pk AS DOUBLE))"
    " - (CAST(n AS DOUBLE) * CAST(s AS DOUBLE)"
    " * (CAST(ak AS DOUBLE) + CAST(bk AS DOUBLE)))"
    " + ((CAST(n AS DOUBLE) - CAST(lag AS DOUBLE))"
    " * CAST(s AS DOUBLE) * CAST(s AS DOUBLE)))"
    " / ((CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(p2 AS DOUBLE))"
    " - (CAST(n AS DOUBLE) * CAST(s AS DOUBLE) * CAST(s AS DOUBLE))), 6)"
    " ELSE NULL END"
)


def q169_daily_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the daily event-count series at lags 1–7 —
    the seasonality/self-similarity probe behind capacity planning and
    anomaly baselines (a strong lag-7 says weekly rhythm; fast decay
    says the counts are memoryless). The calendar is densified first
    (q102's rule: silent days count 0), so lags mean calendar days,
    not observed-row offsets.

    Exactness: the classic ACF estimator r_k = Σ(x_t−x̄)(x_{t+k}−x̄)
    / Σ(x_t−x̄)² is algebraically rescaled by n² so every aggregate
    is an exact integer; ONE shared double chain (_ACF) does the only
    division on both engines.

    Scale shape: the corpus collapses to the day grid in one
    partial-agg shuffle; everything after (the 7-lag self-join, the
    scalar totals) runs on the days-sized frame — bounded by the
    calendar, not the data."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("x"))
    span = daily.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    cal = span.select(
        "d0",
        F.explode(
            F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))
        ).alias("day"),
    )
    grid = cal.join(daily, "day", "left").select(
        F.datediff("day", "d0").cast("long").alias("t"),
        F.coalesce("x", F.lit(0)).cast("long").alias("x"),
    )
    tot = grid.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("s"),
        F.sum(F.col("x") * F.col("x")).alias("p2"),
    )
    lags = spark.range(1, 8).select(F.col("id").alias("lag"))
    pr = (
        grid.alias("a")
        .crossJoin(F.broadcast(lags))
        .join(
            grid.alias("b"),
            F.col("b.t") == F.col("a.t") + F.col("lag"),
        )
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(F.col("a.x") * F.col("b.x")).alias("pk"),
            F.sum(F.col("a.x")).alias("ak"),
            F.sum(F.col("b.x")).alias("bk"),
        )
    )
    return pr.crossJoin(F.broadcast(tot)).select(
        F.col("lag").cast("int").alias("lag"),
        "n_pairs",
        F.expr(_ACF).alias("acf"),
    )


def q194_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint scan over the daily purchase-revenue series —
    "did the level shift, and when?": the classic offline CUSUM
    statistic C_t = Σ_{i≤t}(x_i − x̄) peaks at the most likely change
    day (q117's z-scores flag single outlier days; CUSUM detects a
    sustained LEVEL shift those miss). The calendar is densified
    (q102's rule: silent days are 0-revenue days, not missing rows).
    Output: one row per calendar day with the cent revenue, the
    D-scaled integer CUSUM, and the peak flag.

    Exactness: revenue is exact integer cents; C_t is rescaled by the
    day count D — D·prefix_t − (t+1)·S — so the whole curve INCLUDING
    the argmax compare is exact integer arithmetic; no division
    anywhere. Scale shape: the event log collapses to the calendar
    grid in one partial-agg shuffle; the prefix sum and the peak scan
    run as a broadcast triangular join + 1-row max on the
    calendar-bounded frame (q169's discipline — the calendar, unlike
    a score domain, cannot outgrow a task)."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("day", "ts").cast("date").alias("day"))
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("x")
        )
    )
    span = daily.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    cal = span.select(
        "d0",
        F.explode(
            F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))
        ).alias("day"),
    )
    grid = cal.join(daily, "day", "left").select(
        "day",
        F.datediff("day", "d0").cast("long").alias("t"),
        F.coalesce("x", F.lit(0)).cast("long").alias("x"),
    )
    tot = grid.agg(
        F.count(F.lit(1)).alias("nd"), F.sum("x").alias("s")
    )
    pref = (
        grid.alias("a")
        .join(F.broadcast(grid.alias("b")), F.col("b.t") <= F.col("a.t"))
        .groupBy(
            F.col("a.day").alias("day"),
            F.col("a.t").alias("t"),
            F.col("a.x").alias("x"),
        )
        .agg(F.sum("b.x").alias("p"))
    )
    cus = pref.crossJoin(F.broadcast(tot)).select(
        "day",
        F.col("x").alias("rev_cents"),
        (F.col("nd") * F.col("p") - (F.col("t") + 1) * F.col("s")).alias(
            "cusum_scaled"
        ),
    )
    mx = cus.agg(F.max(F.abs("cusum_scaled")).alias("m"))
    return cus.crossJoin(F.broadcast(mx)).select(
        "day",
        "rev_cents",
        "cusum_scaled",
        (F.abs("cusum_scaled") == F.col("m")).alias("is_peak"),
    )


def q206_seasonal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality profile of event traffic: daily totals
    grouped into the 7 weekday slots, each with its mean daily volume
    and multiplicative seasonal index (slot mean ÷ global daily mean) —
    the decomposition every capacity planner and anomaly detector
    (q117's z-scores, q194's CUSUM) needs BEFORE flagging deviations:
    a quiet Sunday is seasonality, not drift. Weekday slot is the
    engine-portable epoch anchor ``days_since_1970 mod 7`` (slot 0 =
    Thursday) — both engines derive it by exact integer date
    arithmetic, no locale/week-start conventions involved. Output: one
    row per slot — n_days, total events, mean daily volume, index.

    Exactness: daily counts are integers; the index
    (s·D)/(n_d·S_total) stays a ratio of exact integer products in one
    shared double formula (q127 discipline). Scale shape: events
    collapse to the calendar grid in ONE partial-agg shuffle; the slot
    rollup and the global scalar aggregate a ≤tens-of-rows frame."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(F.date_trunc("day", "ts").cast("date").alias("day"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn(
            "dow", F.expr("CAST(datediff(day, DATE '1970-01-01') % 7 AS INT)")
        )
    )
    slots = daily.groupBy("dow").agg(
        F.count(F.lit(1)).alias("n_days"), F.sum("c").alias("n_events")
    )
    tot = slots.agg(
        F.sum("n_days").alias("d_total"), F.sum("n_events").alias("s_total")
    )
    return slots.crossJoin(F.broadcast(tot)).select(
        "dow",
        "n_days",
        "n_events",
        F.expr(
            "ROUND(CAST(n_events AS DOUBLE) / CAST(n_days AS DOUBLE), 6)"
        ).alias("avg_daily"),
        F.expr(
            "ROUND((CAST(n_events AS DOUBLE) * CAST(d_total AS DOUBLE))"
            " / (CAST(n_days AS DOUBLE) * CAST(s_total AS DOUBLE)), 6)"
        ).alias("seasonal_index"),
    )


def q225_weekly_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week revenue profile: ISO-agnostic epoch-anchored
    weeks (days-since-1970 DIV 7 — the q206 portability trick, no
    locale week-start conventions), each with purchase revenue, the
    prior week's revenue, WoW percent change, and the trailing 4-week
    average — the growth table every business review starts from,
    with the same exactness discipline as the batch ledger (revenue
    in DECIMAL(18,2); only the two ratios are floats, rounded once).
    Output: one row per week with ≥1 event.

    Scale shape: events collapse to the weekly grid in ONE partial
    agg; lag/average windows run over the CALENDAR-bounded weekly
    frame (the q194 precedent — weeks cannot outnumber days/7), so no
    window partition grows with event volume."""
    ev = load_table(spark, sf_dir, "events")
    wk = (
        ev.select(
            F.expr(
                "CAST(datediff(CAST(date_trunc('day', ts) AS DATE),"
                " DATE '1970-01-01') DIV 7 AS BIGINT)"
            ).alias("week"),
            F.when(F.col("event_type") == "purchase", F.col("value"))
            .otherwise(F.lit(0.0))
            .cast("decimal(18,2)")
            .alias("rev"),
        )
        .groupBy("week")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("rev").alias("rev_d"),
        )
    )
    w = Window.orderBy("week")
    r = wk.withColumn("prev_d", F.lag("rev_d").over(w)).withColumn(
        "avg4_d",
        F.avg(F.col("rev_d").cast("double")).over(w.rowsBetween(-3, 0)),
    )
    return r.select(
        "week",
        "n_events",
        F.col("rev_d").cast("double").alias("revenue"),
        F.col("prev_d").cast("double").alias("prev_revenue"),
        F.expr(
            "CASE WHEN prev_d > 0 THEN"
            " ROUND((CAST(rev_d AS DOUBLE) - CAST(prev_d AS DOUBLE))"
            " / CAST(prev_d AS DOUBLE), 6) ELSE NULL END"
        ).alias("wow_change"),
        F.round(F.col("avg4_d"), 6).alias("avg_4wk"),
    )


def q273_interval_union_time(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Interval-union coverage per user: treat each event as a 5-minute
    activity interval [ts, ts+5 min) and report, per user, how much
    wall-clock the UNION of those intervals covers and how many
    disjoint activity islands it merges into — the billing/engagement
    metric that double-counting (q184 counts concurrency instead)
    gets wrong. Gaps-and-islands: an event opens a new island iff its
    start exceeds the running max end of all earlier intervals; island
    coverage is its max end − its min start, summed per user.

    Exactness: pure epoch-microsecond integers end to end. Scale
    shape: ONE window shuffle partitioned by user_id (the per-entity
    timeline contract), then a two-level partial agg on (user,
    island)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("us"),
        (F.unix_micros("ts") + F.lit(300000000)).alias("en"),
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    marked = ev.withColumn(
        "prev_max_end",
        F.max("en").over(w.rowsBetween(Window.unboundedPreceding, -1)),
    ).withColumn(
        "is_new",
        F.when(
            F.col("prev_max_end").isNull()
            | (F.col("us") > F.col("prev_max_end")),
            1,
        ).otherwise(0),
    )
    islanded = marked.withColumn(
        "island",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    per_island = islanded.groupBy("user_id", "island").agg(
        (F.max("en") - F.min("us")).alias("cov")
    )
    return per_island.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_islands"),
        F.sum("cov").cast("bigint").alias("covered_us"),
    )


def q276_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-neighbor as-of join: each click (even event_id) pairs
    with the closest purchase (odd) of the same user within ±30
    minutes — either direction, unlike q32's backward-only as-of. The
    pandas `merge_asof(direction='nearest')` semantic, done
    distributed: a user-equi join banded by the tolerance, then ONE
    row per click by (|Δt|, purchase_id) rank. Clicks with no purchase
    in the band drop (the match report counts them via n_candidates).

    Exactness: Δt is exact integer microseconds; the nearest choice
    tiebreaks on purchase_id, so selection is deterministic
    cross-engine. Scale shape: the band join shuffles on user_id;
    the per-click top-1 window partitions by click id."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.unix_micros("ts").alias("us")
    )
    clicks = ev.filter(F.col("event_id") % 2 == 0).select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("cu"),
        F.col("us").alias("cus"),
    )
    buys = ev.filter(F.col("event_id") % 2 == 1).select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("pu"),
        F.col("us").alias("pus"),
    )
    band = clicks.join(
        buys,
        (F.col("cu") == F.col("pu"))
        & (F.col("pus") >= F.col("cus") - 1800000000)
        & (F.col("pus") <= F.col("cus") + 1800000000),
    ).select(
        "click_id",
        F.col("cu").alias("user_id"),
        "purchase_id",
        F.abs(F.col("pus") - F.col("cus")).alias("abs_lag_us"),
        (F.col("pus") - F.col("cus")).alias("lag_us"),
    )
    w = Window.partitionBy("click_id").orderBy("abs_lag_us", "purchase_id")
    return (
        band.withColumn("rn", F.row_number().over(w))
        .withColumn(
            "n_candidates",
            F.count(F.lit(1)).over(Window.partitionBy("click_id")),
        )
        .filter(F.col("rn") == 1)
        .select(
            "click_id",
            "user_id",
            "purchase_id",
            "lag_us",
            F.col("n_candidates").cast("bigint").alias("n_candidates"),
        )
    )


QUERIES = {
    "q100_scd2_history": q100_scd2_history,
    "q276_asof_nearest": q276_asof_nearest,
    "q273_interval_union_time": q273_interval_union_time,
    "q206_seasonal_profile": q206_seasonal_profile,
    "q225_weekly_growth": q225_weekly_growth,
    "q194_cusum_changepoint": q194_cusum_changepoint,
    "q101_twap": q101_twap,
    "q102_gapfill_locf": q102_gapfill_locf,
    "q169_daily_autocorr": q169_daily_autocorr,
}

ORACLE = {
    "q276_asof_nearest": """
        WITH ev AS (
            SELECT event_id, user_id, epoch_us(ts) AS us FROM events),
        band AS (
            SELECT c.event_id AS click_id, c.user_id,
                   p.event_id AS purchase_id,
                   ABS(p.us - c.us) AS abs_lag_us,
                   p.us - c.us AS lag_us
            FROM ev c JOIN ev p
              ON c.user_id = p.user_id
             AND c.event_id % 2 = 0 AND p.event_id % 2 = 1
             AND p.us BETWEEN c.us - 1800000000 AND c.us + 1800000000),
        ranked AS (
            SELECT click_id, user_id, purchase_id, lag_us,
                   ROW_NUMBER() OVER (PARTITION BY click_id
                       ORDER BY abs_lag_us, purchase_id) AS rn,
                   COUNT(*) OVER (PARTITION BY click_id) AS n_candidates
            FROM band)
        SELECT click_id, user_id, purchase_id, lag_us,
               CAST(n_candidates AS BIGINT) AS n_candidates
        FROM ranked WHERE rn = 1
    """,
    "q273_interval_union_time": """
        WITH ev AS (
            SELECT user_id, event_id, epoch_us(ts) AS us,
                   epoch_us(ts) + 300000000 AS en
            FROM events),
        marked AS (
            SELECT user_id, event_id, us, en,
                   CASE WHEN MAX(en) OVER w IS NULL
                             OR us > MAX(en) OVER w
                        THEN 1 ELSE 0 END AS is_new
            FROM ev
            WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        islanded AS (
            SELECT user_id, us, en,
                   SUM(is_new) OVER (PARTITION BY user_id
                       ORDER BY us, event_id
                       ROWS UNBOUNDED PRECEDING) AS island
            FROM marked),
        per_island AS (
            SELECT user_id, island, MAX(en) - MIN(us) AS cov
            FROM islanded GROUP BY 1, 2)
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_islands,
               CAST(SUM(cov) AS BIGINT) AS covered_us
        FROM per_island GROUP BY user_id
    """,
    "q225_weekly_growth": """
        WITH wk AS (
            SELECT CAST(date_diff('day', DATE '1970-01-01',
                                  CAST(date_trunc('day', ts) AS DATE))
                        // 7 AS BIGINT) AS week,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   SUM(CAST(CASE WHEN event_type = 'purchase'
                                 THEN value ELSE 0 END
                            AS DECIMAL(18,2))) AS rev_d
            FROM events GROUP BY 1),
        r AS (
            SELECT week, n_events, rev_d,
                   lag(rev_d) OVER (ORDER BY week) AS prev_d,
                   AVG(CAST(rev_d AS DOUBLE))
                       OVER (ORDER BY week
                             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
                       AS avg4_d
            FROM wk)
        SELECT week, n_events,
               CAST(rev_d AS DOUBLE) AS revenue,
               CAST(prev_d AS DOUBLE) AS prev_revenue,
               CASE WHEN prev_d > 0 THEN
                   ROUND((CAST(rev_d AS DOUBLE) - CAST(prev_d AS DOUBLE))
                         / CAST(prev_d AS DOUBLE), 6)
               ELSE NULL END AS wow_change,
               ROUND(avg4_d, 6) AS avg_4wk
        FROM r
    """,
    "q206_seasonal_profile": """
        WITH daily AS (
            SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
                   COUNT(*) AS c
            FROM events GROUP BY 1),
        slotted AS (
            SELECT CAST(date_diff('day', DATE '1970-01-01', day) % 7
                        AS INT) AS dow,
                   c
            FROM daily),
        slots AS (
            SELECT dow,
                   CAST(COUNT(*) AS BIGINT) AS n_days,
                   CAST(SUM(c) AS BIGINT) AS n_events
            FROM slotted GROUP BY dow),
        tot AS (
            SELECT CAST(SUM(n_days) AS BIGINT) AS d_total,
                   CAST(SUM(n_events) AS BIGINT) AS s_total
            FROM slots)
        SELECT dow, n_days, n_events,
               ROUND(CAST(n_events AS DOUBLE) / CAST(n_days AS DOUBLE), 6)
                   AS avg_daily,
               ROUND((CAST(n_events AS DOUBLE) * CAST(d_total AS DOUBLE))
                     / (CAST(n_days AS DOUBLE) * CAST(s_total AS DOUBLE)),
                     6) AS seasonal_index
        FROM slots, tot
    """,
    "q100_scd2_history": """
        WITH marked AS (
            SELECT user_id, ts, event_id, event_type,
                   CASE WHEN LAG(event_type) OVER w IS NULL
                             OR LAG(event_type) OVER w <> event_type
                        THEN 1 ELSE 0 END AS is_new
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        versioned AS (
            SELECT user_id, ts, event_type,
                   CAST(SUM(is_new) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS version
            FROM marked),
        runs AS (
            SELECT user_id, version,
                   any_value(event_type) AS state,
                   MIN(ts) AS valid_from,
                   COUNT(*) AS n_events
            FROM versioned GROUP BY user_id, version)
        SELECT user_id, version, state, valid_from,
               LEAD(valid_from) OVER wv AS valid_to,
               LEAD(valid_from) OVER wv IS NULL AS is_current,
               n_events
        FROM runs
        WINDOW wv AS (PARTITION BY user_id ORDER BY version)
    """,
    "q101_twap": """
        WITH delta AS (
            SELECT user_id,
                   CAST(value AS DECIMAL(18,2)) AS v,
                   epoch_us(LEAD(ts) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id))
                       - epoch_us(ts) AS dur_us
            FROM events),
        agg AS (
            SELECT user_id,
                   SUM(v * dur_us) AS wsum,
                   CAST(SUM(dur_us) AS BIGINT) AS dsum,
                   COUNT(*) AS n_intervals
            FROM delta WHERE dur_us IS NOT NULL
            GROUP BY user_id)
        SELECT user_id, n_intervals,
               ROUND(CAST(wsum AS DOUBLE) / CAST(dsum AS DOUBLE), 6)
                   AS twap
        FROM agg
    """,
    "q102_gapfill_locf": """
        WITH daily AS (
            -- arg-max by (ts, event_id): this DuckDB's max_by has no
            -- struct key, so rank instead (same deterministic winner
            -- as Spark's max(struct(ts, event_id, v)))
            SELECT user_id, day, value AS day_value FROM (
                SELECT user_id,
                       CAST(date_trunc('day', ts) AS DATE) AS day,
                       value,
                       ROW_NUMBER() OVER (
                           PARTITION BY user_id,
                                        CAST(date_trunc('day', ts) AS DATE)
                           ORDER BY ts DESC, event_id DESC) AS rn
                FROM events) WHERE rn = 1),
        span AS (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1
                 FROM daily GROUP BY user_id),
        cal AS (SELECT user_id,
                       CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
                                                   CAST(d1 AS TIMESTAMP),
                                                   INTERVAL 1 DAY)) AS DATE)
                           AS day
                FROM span)
        SELECT c.user_id, c.day,
               last_value(d.day_value IGNORE NULLS) OVER (
                   PARTITION BY c.user_id ORDER BY c.day
                   ROWS UNBOUNDED PRECEDING) AS value,
               d.day_value IS NULL AS filled
        FROM cal c LEFT JOIN daily d
          ON d.user_id = c.user_id AND d.day = c.day
    """,
    "q194_cusum_changepoint": """
        WITH daily AS (
            SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
                   CAST(SUM(CAST(round(value * 100, 0) AS BIGINT))
                        AS BIGINT) AS x
            FROM events WHERE event_type = 'purchase' GROUP BY 1),
        span AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM daily),
        cal AS (SELECT d0,
                       CAST(unnest(generate_series(
                           CAST(d0 AS TIMESTAMP), CAST(d1 AS TIMESTAMP),
                           INTERVAL 1 DAY)) AS DATE) AS day
                FROM span),
        grid AS (SELECT c.day,
                        CAST(date_diff('day', c.d0, c.day) AS BIGINT)
                            AS t,
                        CAST(COALESCE(d.x, 0) AS BIGINT) AS x
                 FROM cal c LEFT JOIN daily d ON d.day = c.day),
        tot AS (SELECT COUNT(*) AS nd, CAST(SUM(x) AS BIGINT) AS s
                FROM grid),
        pref AS (SELECT a.day, a.t, a.x,
                        CAST(SUM(b.x) AS BIGINT) AS p
                 FROM grid a JOIN grid b ON b.t <= a.t
                 GROUP BY a.day, a.t, a.x),
        cus AS (SELECT day, x AS rev_cents,
                       nd * p - (t + 1) * s AS cusum_scaled
                FROM pref CROSS JOIN tot),
        mx AS (SELECT MAX(ABS(cusum_scaled)) AS m FROM cus)
        SELECT day, rev_cents, cusum_scaled,
               ABS(cusum_scaled) = m AS is_peak
        FROM cus CROSS JOIN mx
    """,
    "q169_daily_autocorr": f"""
        WITH daily AS (
            SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
                   COUNT(*) AS x
            FROM events GROUP BY 1),
        span AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM daily),
        cal AS (SELECT d0,
                       CAST(unnest(generate_series(
                           CAST(d0 AS TIMESTAMP), CAST(d1 AS TIMESTAMP),
                           INTERVAL 1 DAY)) AS DATE) AS day
                FROM span),
        grid AS (SELECT CAST(date_diff('day', c.d0, c.day) AS BIGINT)
                            AS t,
                        COALESCE(d.x, 0) AS x
                 FROM cal c LEFT JOIN daily d ON d.day = c.day),
        tot AS (SELECT COUNT(*) AS n, SUM(x) AS s, SUM(x * x) AS p2
                FROM grid),
        lg AS (SELECT unnest(generate_series(1, 7)) AS lag),
        pr AS (SELECT l.lag, COUNT(*) AS n_pairs,
                      SUM(a.x * b.x) AS pk,
                      SUM(a.x) AS ak, SUM(b.x) AS bk
               FROM grid a CROSS JOIN lg l
               JOIN grid b ON b.t = a.t + l.lag
               GROUP BY l.lag)
        SELECT CAST(lag AS INT) AS lag,
               CAST(n_pairs AS BIGINT) AS n_pairs,
               {_ACF} AS acf
        FROM pr CROSS JOIN tot
    """,
}
