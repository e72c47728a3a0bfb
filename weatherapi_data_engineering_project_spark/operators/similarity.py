"""Similarity search over embedding columns (array<float>).

Engine extensions beyond the reference (SURVEY.md §2.I):

- ``cosine_topk``: brute-force exact top-k against a query vector —
  the correctness baseline. The dot product is computed by exploding
  positions and joining the (tiny, broadcast) query vector, then a
  grouped decimal SUM: decimal accumulation is exact and associative,
  so the score is bit-identical under any partitioning — which is what
  lets a distributed run be compared against a single-node oracle (and
  lets two cluster runs agree).
- ``signlsh_topk``: the scale path — deterministic sign-LSH (random
  hyperplanes derived from md5, so both engines and every executor
  agree without shipping a model), bucket by bit signature, then exact
  re-rank *within bucket only*. At 100 TB the bucketed join touches
  ~1/2^bits of the corpus per query instead of all of it.

Why not a Pandas UDF? At this shape the JVM path (explode + broadcast
join + hash agg, all codegen'd) has no Python serialization cost and
AQE handles skew; an Arrow-batched kernel becomes worth it only for
very high dims — see operators/multimodal-style UDF plumbing for that
escape hatch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

# Exact-cast scale for double products: products of float32-origin
# doubles carry ≤17 significant digits; scale 25 keeps any rounding
# divergence ≥ 8 orders below a double ulp of the final score.
_DEC = "decimal(38,25)"
# Scores are re-rounded to scale 12 before the final double cast:
# decimal→decimal rounding is engine-identical, and a scale-12 unscaled
# value < 2^53 makes the decimal→double conversion exact everywhere
# (a high-scale decimal→double is NOT correctly rounded in all engines).
_DEC_OUT = "decimal(30,12)"


def _score(dot_dec, n2_a, n2_b):
    """cosine as double from decimal dot/norms, rounded to 6 decimals.

    Decimal accumulation makes the Spark-side result partitioning-
    independent; the final round absorbs the ~1e-11 cross-engine noise
    of double↔decimal conversions (neither engine's high-scale decimal
    cast is correctly rounded). Ranking downstream uses the rounded
    score + id tiebreak, so orderings are engine-identical too.
    """
    raw = dot_dec.cast(_DEC_OUT).cast("double") / (
        F.sqrt(n2_a.cast(_DEC_OUT).cast("double"))
        * F.sqrt(n2_b.cast(_DEC_OUT).cast("double"))
    )
    return F.round(raw, 6)


def _positions(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias("vid"),
        F.posexplode(vec_col).alias("pos", "v"),
    ).select("vid", "pos", F.col("v").cast("double").alias("v"))


def cosine_topk(
    embeddings: DataFrame,
    query_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine to the embedding of ``query_id``.

    Returns (vec_id, cosine, rn) with deterministic id tiebreak.
    """
    e = _positions(embeddings, id_col, vec_col)
    q = (
        _positions(embeddings.filter(F.col(id_col) == query_id), id_col, vec_col)
        .select("pos", F.col("v").alias("qv"))
    )
    dots = (
        e.join(F.broadcast(q), on="pos")
        .groupBy("vid")
        .agg(
            F.sum((F.col("v") * F.col("qv")).cast(_DEC)).alias("dot"),
            F.sum((F.col("v") * F.col("v")).cast(_DEC)).alias("n2"),
        )
    )
    qn = q.agg(F.sum((F.col("qv") * F.col("qv")).cast(_DEC)).alias("qn2"))
    cos = _score(F.col("dot"), F.col("n2"), F.col("qn2"))
    ranked = (
        dots.crossJoin(F.broadcast(qn))
        .select(F.col("vid").alias("vec_id"), cos.alias("cosine"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.orderBy(F.col("cosine").desc(), F.col("vec_id"))
            ),
        )
    )
    return ranked.filter(F.col("rn") <= k)


def signlsh_buckets(
    embeddings: DataFrame,
    n_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic sign-LSH bucket per vector.

    Hyperplane weight w(bit, pos) = +1 if the first hex digit of
    md5('{bit}_{pos}') is ≥ '8' else −1 — reproducible everywhere with
    no side-channel model. Projections accumulate in decimal so the
    sign (hence the bucket) is partitioning-independent.
    """
    e = _positions(embeddings, id_col, vec_col)
    bits = F.explode(F.sequence(F.lit(0), F.lit(n_bits - 1))).alias("bit")
    eb = e.select("vid", "pos", "v", bits)
    w = F.when(
        F.substring(F.md5(F.concat_ws("_", F.col("bit"), F.col("pos"))), 1, 1)
        >= F.lit("8"),
        F.lit(1.0),
    ).otherwise(F.lit(-1.0))
    proj = (
        eb.groupBy("vid", "bit")
        .agg(F.sum((w * F.col("v")).cast(_DEC)).alias("proj"))
        .select(
            "vid",
            "bit",
            F.when(F.col("proj") >= 0, F.lit("1")).otherwise(F.lit("0")).alias("b"),
        )
    )
    # assemble the bit string in bit order (max of the single non-null
    # per-bit value — a pivot without a Python loop over rows)
    bit_cols = [
        F.max(F.when(F.col("bit") == i, F.col("b"))).alias(f"b{i}")
        for i in range(n_bits)
    ]
    sigs = proj.groupBy("vid").agg(*bit_cols)
    return sigs.select(
        F.col("vid").alias(id_col),
        F.concat_ws("", *[F.col(f"b{i}") for i in range(n_bits)]).alias("bucket"),
    )


def signlsh_topk(
    embeddings: DataFrame,
    k: int = 3,
    n_bits: int = 8,
    max_query_id: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN: exact cosine re-rank restricted to same-bucket candidates.

    Returns (query_id, vec_id, cosine, rn ≤ k). ``max_query_id`` bounds
    the query set (for tests/oracle); None means all-vs-bucket.
    """
    buckets = signlsh_buckets(embeddings, n_bits, id_col, vec_col)
    e = _positions(embeddings, id_col, vec_col)
    norms = e.groupBy("vid").agg(
        F.sum((F.col("v") * F.col("v")).cast(_DEC)).alias("n2")
    )

    qb = buckets.select(F.col(id_col).alias("qid"), "bucket")
    if max_query_id is not None:
        qb = qb.filter(F.col("qid") < max_query_id)
    cands = (
        qb.join(buckets, on="bucket")
        .filter(F.col("qid") != F.col(id_col))
        .select("qid", F.col(id_col).alias("cid"))
    )

    qe = e.select(F.col("vid").alias("qid"), "pos", F.col("v").alias("qv"))
    ce = e.select(F.col("vid").alias("cid"), "pos", "v")
    dots = (
        cands.join(qe, on="qid")
        .join(ce, on=["cid", "pos"])
        .groupBy("qid", "cid")
        .agg(F.sum((F.col("qv") * F.col("v")).cast(_DEC)).alias("dot"))
    )
    qn = norms.select(F.col("vid").alias("qid"), F.col("n2").alias("qn2"))
    cn = norms.select(F.col("vid").alias("cid"), F.col("n2").alias("cn2"))
    cos = _score(F.col("dot"), F.col("qn2"), F.col("cn2"))
    ranked = (
        dots.join(qn, on="qid")
        .join(cn, on="cid")
        .select(
            F.col("qid").alias("query_id"),
            F.col("cid").alias("vec_id"),
            cos.alias("cosine"),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.col("cosine").desc(), F.col("vec_id")
                )
            ),
        )
    )
    return ranked.filter(F.col("rn") <= k)
