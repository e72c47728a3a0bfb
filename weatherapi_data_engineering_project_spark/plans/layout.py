"""Physical-layout and sketch operators (round 4c): Z-order data
clustering, count-min frequency sketching, Bloom-filter join pruning.

Engine extensions beyond the reference (SURVEY.md §2.I). These are the
techniques a 100 TB warehouse uses to make the OTHER queries cheap:

- q106 computes the Z-order (Morton) clustering key used to lay files
  out so min/max footer stats prune on TWO dimensions at once — the
  layout step behind every "z-order by (a, b)" table optimizer. The
  interleave is pure per-row integer arithmetic (zero shuffle); only
  the per-bucket bounding-box audit aggregates, on the bucket key.
- q107 builds a count-min sketch over the event stream with
  plan-literal hash seeds. The d x w counter grid (3 x 128 here) is the
  fixed-size state that answers frequency point-queries over an
  unbounded stream; the build is ONE partial-agg shuffle over a x3
  row fan-out that map-side combine collapses to <= d*w rows per task.
- q108 expresses Spark's runtime Bloom-filter join pruning
  relationally: hash the small (filtered-dim) build side into a
  k-seed bucket set, broadcast it, and keep only probe keys whose k
  buckets ALL hit — a superset of the true semi-join (no false
  negatives) computed without shuffling the big side.

All three use deterministic integer arithmetic only (multiplicative
hashes with literal seeds, exact integer quantization), so each has a
full DuckDB oracle — the sketches here are NOT the opaque-register
kind (contrast q43's HLL, rows-only by contract).

Scale notes (100 TB story):
- q106's z-value is a projection; the min/max scalar pair is one
  1-row aggregate broadcast into it (same pattern as star.py's audit
  scalar). Range-bucketing by leading z-bits is also a projection, so
  the whole layout key assignment never shuffles the fact table; a
  real writer would follow with a repartitionByRange(z) write.
- q107's counter grid is d*w rows regardless of input size; the probe
  join broadcasts it. The exact side (for the audit) aggregates on
  user_id — the sketch exists precisely so that at 100 TB you DON'T
  need that exact pass; here it is the differential's truth.
- q108's bucket set is <= k * |filtered dim| rows (tiny), broadcast;
  the big-side candidates never shuffle to evaluate the filter. In a
  real plan the bloom_pass predicate sits on the fact scan BEFORE the
  join shuffle, which is exactly Spark's own
  spark.sql.optimizer.runtime.bloomFilter rewrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import load_table

# --- q106: Z-order (Morton) clustering --------------------------------

_ZBITS = 16  # quantization width per dimension -> 32-bit z-values
_ZBUCKET_SHIFT = 2 * _ZBITS - 6  # keep top 6 z-bits -> 64 range buckets


def _z_interleave_sql(xq: str, yq: str, shr) -> str:
    """Bit-interleave SQL for two {0..2^16-1} ints: x takes odd bits,
    y even. ``shr(expr, i)`` formats a right-shift for the target
    engine (Spark ``shiftright``, DuckDB ``>>``); the set-bit value is
    a plain integer literal so the text stays engine-portable."""
    terms = []
    for i in range(_ZBITS):
        terms.append(f"(({shr(xq, i)}) & 1) * {1 << (2 * i + 1)}")
        terms.append(f"(({shr(yq, i)}) & 1) * {1 << (2 * i)}")
    return " + ".join(terms)


def _spark_shr(e: str, i: int) -> str:
    return f"shiftright({e}, {i})"


def _duck_shr(e: str, i: int) -> str:
    return f"({e} >> {i})"


def q106_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout audit over lineitem on (l_partkey, l_suppkey):
    range-normalize each dimension to 16 bits with exact integer
    arithmetic, interleave into a 32-bit Morton code, assign 64 range
    buckets from the leading z-bits, and report each bucket's row
    count and per-dimension bounding box — the tightness of those
    boxes IS the data-skipping win (a file written per bucket prunes
    on both partkey AND suppkey predicates). Everything before the
    64-key audit aggregate is a shuffle-free projection."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    rng = li.agg(
        F.min("l_partkey").alias("minx"),
        F.max("l_partkey").alias("maxx"),
        F.min("l_suppkey").alias("miny"),
        F.max("l_suppkey").alias("maxy"),
    )
    q = li.crossJoin(F.broadcast(rng)).select(
        F.expr(
            "CAST((l_partkey - minx) * 65535 DIV greatest(maxx - minx, 1)"
            " AS BIGINT)"
        ).alias("xq"),
        F.expr(
            "CAST((l_suppkey - miny) * 65535 DIV greatest(maxy - miny, 1)"
            " AS BIGINT)"
        ).alias("yq"),
    )
    z = q.withColumn(
        "zval", F.expr(_z_interleave_sql("xq", "yq", _spark_shr))
    ).withColumn("bucket", F.expr(f"shiftright(zval, {_ZBUCKET_SHIFT})"))
    return z.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("xq").alias("min_xq"),
        F.max("xq").alias("max_xq"),
        F.min("yq").alias("min_yq"),
        F.max("yq").alias("max_yq"),
    )


# --- q107: count-min sketch -------------------------------------------

_CMS_SEEDS = ((0, 263, 71), (1, 997, 313), (2, 1543, 577))
_CMS_P = 1_000_003  # prime modulus for the multiplicative hash family
_CMS_W = 128  # counters per hash row (d*w = 384 cells, broadcast-tiny)


def _cms_seed_array():
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("si"),
                F.lit(a).cast("bigint").alias("a"),
                F.lit(b).cast("bigint").alias("b"),
            )
            for i, a, b in _CMS_SEEDS
        ]
    )


def q107_countmin_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over events.user_id with d=3 plan-literal hash
    seeds and w=128 counters per row: build the d x w counter grid in
    one partial-agg shuffle, then answer frequency point-queries for
    the 20 heaviest users as min over the d counters, audited against
    exact counts. The sketch guarantee (est >= exact, bounded
    overestimate) is visible in the output's overest column. Fully
    deterministic -> exact SQL oracle, unlike register-based q43."""
    ev = load_table(spark, sf_dir, "events").select("user_id")
    fanout = ev.select(
        F.explode(_cms_seed_array()).alias("s"), "user_id"
    ).select(
        F.col("s.si").alias("si"),
        (
            ((F.col("s.a") * F.col("user_id") + F.col("s.b")) % _CMS_P)
            % _CMS_W
        ).alias("bucket"),
    )
    counters = fanout.groupBy("si", "bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    probe = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .orderBy(F.desc("exact_n"), "user_id")
        .limit(20)
    )
    probed = probe.select(
        "user_id", "exact_n", F.explode(_cms_seed_array()).alias("s")
    ).select(
        "user_id",
        "exact_n",
        F.col("s.si").alias("si"),
        (
            ((F.col("s.a") * F.col("user_id") + F.col("s.b")) % _CMS_P)
            % _CMS_W
        ).alias("bucket"),
    )
    est = (
        probed.join(F.broadcast(counters), ["si", "bucket"])
        .groupBy("user_id", "exact_n")
        .agg(F.min("cnt").alias("cms_est"))
    )
    return est.select(
        "user_id",
        "exact_n",
        "cms_est",
        (F.col("cms_est") - F.col("exact_n")).alias("overest"),
    )


# --- q108: Bloom-filter join pruning ----------------------------------

_BLOOM_SEEDS = ((0, 433, 97), (1, 877, 241), (2, 1987, 659))
_BLOOM_M = 256  # bit positions
_BLOOM_K = len(_BLOOM_SEEDS)


def _bloom_seed_array():
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("si"),
                F.lit(a).cast("bigint").alias("a"),
                F.lit(b).cast("bigint").alias("b"),
            )
            for i, a, b in _BLOOM_SEEDS
        ]
    )


def q108_bloom_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter join pruning, relationally: hash the build side
    (suppliers of nations 0-2, the filtered dim) into a k=3-seed
    bucket set, broadcast it, and keep each probe-side l_suppkey only
    if ALL k of its buckets hit. Output is every key that passes the
    bloom with its true membership — a superset of the semi-join with
    zero false negatives; is_member=false rows are the sketch's false
    positives (m=256 keeps a few visible at test scale). This is
    Spark's runtime bloom-join rewrite expressed as a plan the
    optimizer can't decline."""
    sup = load_table(spark, sf_dir, "supplier")
    members = sup.filter(F.col("s_nationkey") <= 2).select("s_suppkey")
    bset = (
        members.select(F.explode(_bloom_seed_array()).alias("s"), "s_suppkey")
        .select(
            F.col("s.si").alias("si"),
            (
                ((F.col("s.a") * F.col("s_suppkey") + F.col("s.b")) % _CMS_P)
                % _BLOOM_M
            ).alias("bucket"),
        )
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    cand = (
        load_table(spark, sf_dir, "lineitem").select("l_suppkey").distinct()
    )
    pairs = cand.select(
        "l_suppkey", F.explode(_bloom_seed_array()).alias("s")
    ).select(
        "l_suppkey",
        F.col("s.si").alias("si"),
        (
            ((F.col("s.a") * F.col("l_suppkey") + F.col("s.b")) % _CMS_P)
            % _BLOOM_M
        ).alias("bucket"),
    )
    hits = (
        pairs.join(F.broadcast(bset), ["si", "bucket"], "left")
        .groupBy("l_suppkey")
        .agg(F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_hits"))
        .filter(F.col("n_hits") == _BLOOM_K)
    )
    membership = members.select(
        F.col("s_suppkey").alias("l_suppkey"), F.lit(True).alias("is_member")
    )
    return (
        hits.join(F.broadcast(membership), "l_suppkey", "left")
        .select(
            "l_suppkey",
            F.coalesce(F.col("is_member"), F.lit(False)).alias("is_member"),
        )
    )


QUERIES = {
    "q106_zorder_layout": q106_zorder_layout,
    "q107_countmin_sketch": q107_countmin_sketch,
    "q108_bloom_prune": q108_bloom_prune,
}

_DUCK_SEEDS = ", ".join(f"({i}, {a}, {b})" for i, a, b in _CMS_SEEDS)
_DUCK_BLOOM_SEEDS = ", ".join(f"({i}, {a}, {b})" for i, a, b in _BLOOM_SEEDS)

ORACLE = {
    "q106_zorder_layout": f"""
        WITH rng AS (
            SELECT MIN(l_partkey) AS minx, MAX(l_partkey) AS maxx,
                   MIN(l_suppkey) AS miny, MAX(l_suppkey) AS maxy
            FROM lineitem),
        q AS (
            SELECT CAST((l_partkey - minx) * 65535
                        // GREATEST(maxx - minx, 1) AS BIGINT) AS xq,
                   CAST((l_suppkey - miny) * 65535
                        // GREATEST(maxy - miny, 1) AS BIGINT) AS yq
            FROM lineitem CROSS JOIN rng),
        z AS (
            SELECT xq, yq,
                   {_z_interleave_sql('xq', 'yq', _duck_shr)} AS zval
            FROM q)
        SELECT CAST(zval >> {_ZBUCKET_SHIFT} AS BIGINT) AS bucket,
               COUNT(*) AS n,
               MIN(xq) AS min_xq, MAX(xq) AS max_xq,
               MIN(yq) AS min_yq, MAX(yq) AS max_yq
        FROM z GROUP BY 1
    """,
    "q107_countmin_sketch": f"""
        WITH seeds(si, a, b) AS (VALUES {_DUCK_SEEDS}),
        counters AS (
            SELECT si,
                   ((a * user_id + b) % {_CMS_P}) % {_CMS_W} AS bucket,
                   COUNT(*) AS cnt
            FROM events CROSS JOIN seeds
            GROUP BY 1, 2),
        probe AS (
            SELECT user_id, COUNT(*) AS exact_n
            FROM events GROUP BY 1
            ORDER BY exact_n DESC, user_id LIMIT 20),
        est AS (
            SELECT p.user_id, p.exact_n, MIN(c.cnt) AS cms_est
            FROM probe p CROSS JOIN seeds s
            JOIN counters c
              ON c.si = s.si
             AND c.bucket = ((s.a * p.user_id + s.b) % {_CMS_P}) % {_CMS_W}
            GROUP BY 1, 2)
        SELECT user_id,
               CAST(exact_n AS BIGINT) AS exact_n,
               CAST(cms_est AS BIGINT) AS cms_est,
               CAST(cms_est - exact_n AS BIGINT) AS overest
        FROM est
    """,
    "q108_bloom_prune": f"""
        WITH seeds(si, a, b) AS (VALUES {_DUCK_BLOOM_SEEDS}),
        members AS (
            SELECT s_suppkey FROM supplier WHERE s_nationkey <= 2),
        bset AS (
            SELECT DISTINCT si,
                   ((a * s_suppkey + b) % {_CMS_P}) % {_BLOOM_M} AS bucket
            FROM members CROSS JOIN seeds),
        cand AS (SELECT DISTINCT l_suppkey FROM lineitem),
        pairs AS (
            SELECT c.l_suppkey, s.si,
                   ((s.a * c.l_suppkey + s.b) % {_CMS_P}) % {_BLOOM_M}
                       AS bucket
            FROM cand c CROSS JOIN seeds s),
        hits AS (
            SELECT p.l_suppkey,
                   COUNT(b.bucket) AS n_hits
            FROM pairs p LEFT JOIN bset b
              ON b.si = p.si AND b.bucket = p.bucket
            GROUP BY 1
            HAVING COUNT(b.bucket) = {_BLOOM_K})
        SELECT h.l_suppkey,
               COALESCE(m.s_suppkey IS NOT NULL, FALSE) AS is_member
        FROM hits h LEFT JOIN members m ON m.s_suppkey = h.l_suppkey
    """,
}
