"""Corpus-curation queries round 4: split assignment, PII scrubbing,
mixture reweighting, Zipf head-term statistics.

Engine extensions beyond the reference (SURVEY.md §2.I), extending the
plans/llm.py training-data surface with the curation steps that come
AFTER dedup/quality filtering in a real pipeline: carve reproducible
train/val/test splits, account for + redact PII-shaped spans, compute
temperature-based domain mixing weights, and fit the Zipf head of each
source's term distribution as a corpus-health signal.

Same contract as every other plan module: exact ANSI-SQL oracle twins,
identical column aliases on both sides, decimal/ROUND conventions per
functions/exact.py where floats are observable.

Scale notes (100 TB story):
- q79/q80 are scan-side projections + one partial-agg shuffle — the
  same shape as q19/q39; md5-hash splitting needs no RNG state and is
  stable under any partitioning.
- q81 aggregates to a sources-sized frame; the scalar total/normalizer
  ride tiny broadcast cross joins (the audit-scalar precedent), never
  a corpus-side shuffle.
- q82's per-source ranking window filters on row_number <= K, which
  Spark plans as WindowGroupLimit: every map task keeps a local top-K
  before the shuffle, so per-source state is bounded by K — the
  unbounded-vocab single-task window never materializes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import text as TX
from ..schemas import load_table

_TOK = "string_split_regex(lower(trim(text)), '\\s+')"

# PII patterns written in the Java-regex/RE2 common subset so Spark and
# DuckDB match identical spans. Replacement order is part of the query
# contract: email -> url -> phone.
_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_URL = r"https?://[^\s]+"
_PHONE = r"\d{3}[-. ]\d{3}[-. ]\d{4}"

# Zipf head size: the fit runs on each source's top-K terms (standard
# practice — the head is where the power law holds), which is also what
# keeps the ranking window WindowGroupLimit-bounded.
_ZIPF_HEAD = 500


def q79_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split accounting: assign each doc by
    the first byte of md5(doc_id) — <5% test, next ~5% val, rest train
    (reproducible on any cluster, any partitioning, no RNG state; the
    q39 hash-sampling technique applied to split carving). Returns per
    (source, split) doc and token counts — the manifest a training run
    records before materializing shards."""
    d = load_table(spark, sf_dir, "documents")
    h2 = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    split = (
        F.when(h2 < "0d", F.lit("test"))
        .when(h2 < "1a", F.lit("val"))
        .otherwise(F.lit("train"))
    )
    return (
        d.select(
            "source",
            split.alias("split"),
            TX.token_count("text").alias("nt"),
        )
        .groupBy("source", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nt").alias("n_tokens"),
        )
    )


def q80_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII accounting + redaction: count email/URL/phone spans and
    fingerprint the redacted text. The synthetic corpus contains no
    natural PII, so the query INJECTS deterministic PII-shaped spans
    (derived from doc_id, identically on both engines) before
    scrubbing — the differential then verifies real match counts and a
    real multi-pattern rewrite, not a no-op. Replacement order
    (email -> url -> phone) is part of the contract."""
    d = load_table(spark, sf_dir, "documents")
    aug = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com via https://ex.example/"),
        F.col("doc_id").cast("string"),
        F.lit(" or 555-010 555-0100"),
        # every 3rd doc also carries a phone-shaped span
        F.when(
            F.col("doc_id") % 3 == 0, F.lit(" call 415-555-0199 now")
        ).otherwise(F.lit("")),
    )
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(aug, _EMAIL, "<EMAIL>"), _URL, "<URL>"
        ),
        _PHONE,
        "<PHONE>",
    )
    return d.select(
        "doc_id",
        F.regexp_count(aug, F.lit(_EMAIL)).cast("long").alias("n_emails"),
        F.regexp_count(aug, F.lit(_URL)).cast("long").alias("n_urls"),
        F.regexp_count(aug, F.lit(_PHONE)).cast("long").alias("n_phones"),
        F.md5(red).alias("redacted_fp"),
    )


def q81_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based domain mixing (the multilingual-sampling
    standard, alpha = 0.5): per-source sampling weight proportional to
    p^alpha, renormalized — upweights small sources, tempers dominant
    ones. Output: raw share, tempered weight, and the expected token
    budget per source under the reweighting. The per-source frame is
    sources-sized; totals ride broadcast scalar cross joins."""
    d = load_table(spark, sf_dir, "documents")
    per = (
        d.select("source", TX.token_count("text").alias("nt"))
        .groupBy("source")
        .agg(F.sum("nt").alias("n_tokens"))
    )
    tot = per.agg(F.sum("n_tokens").alias("total"))
    pa = per.crossJoin(F.broadcast(tot)).select(
        F.sqrt(F.col("n_tokens") / F.col("total")).alias("pa")
    )
    z = pa.agg(F.sum("pa").alias("z"))
    w = F.sqrt(F.col("n_tokens") / F.col("total")) / F.col("z")
    return (
        per.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(z))
        .select(
            "source",
            "n_tokens",
            F.round(F.col("n_tokens") / F.col("total"), 6).alias("p_raw"),
            F.round(w, 6).alias("weight"),
            F.round(w * F.col("total"), 3).alias("expected_tokens"),
        )
    )


def q82_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf head fit per source: rank the top-500 terms by frequency
    and regress ln(freq) on ln(rank) — the log-log slope (~ -1 for
    natural text) is the standard corpus-health / synthetic-text
    signal. The rank window filters row_number <= K, which Spark plans
    as WindowGroupLimit (bounded per-task state); regr_slope runs on
    the tiny head frame. ROUND(,6) absorbs cross-engine float
    association noise in the moment sums."""
    d = load_table(spark, sf_dir, "documents")
    freq = (
        d.select("source", F.explode(TX.tokens("text")).alias("term"))
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    wspec = Window.partitionBy("source").orderBy(
        F.col("freq").desc(), F.col("term")
    )
    head = freq.withColumn("rn", F.row_number().over(wspec)).filter(
        F.col("rn") <= _ZIPF_HEAD
    )
    return head.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.round(
            F.expr("regr_slope(ln(freq), ln(rn))"), 6
        ).alias("zipf_slope"),
    )


QUERIES = {
    "q79_split_assign": q79_split_assign,
    "q80_pii_scrub": q80_pii_scrub,
    "q81_temperature_mix": q81_temperature_mix,
    "q82_zipf_slope": q82_zipf_slope,
}

ORACLE = {
    "q79_split_assign": f"""
        SELECT source,
               CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '0d'
                    THEN 'test'
                    WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '1a'
                    THEN 'val'
                    ELSE 'train' END AS split,
               COUNT(*) AS n_docs,
               CAST(SUM(len({_TOK})) AS BIGINT) AS n_tokens
        FROM documents
        GROUP BY 1, 2
    """,
    "q80_pii_scrub": f"""
        WITH aug AS (
            SELECT doc_id,
                   text || ' contact user' || CAST(doc_id AS VARCHAR)
                        || '@example.com via https://ex.example/'
                        || CAST(doc_id AS VARCHAR)
                        || ' or 555-010 555-0100'
                        || CASE WHEN doc_id % 3 = 0
                                THEN ' call 415-555-0199 now'
                                ELSE '' END AS a
            FROM documents)
        SELECT doc_id,
               CAST(len(regexp_extract_all(a, '{_EMAIL}')) AS BIGINT)
                   AS n_emails,
               CAST(len(regexp_extract_all(a, '{_URL}')) AS BIGINT)
                   AS n_urls,
               CAST(len(regexp_extract_all(a, '{_PHONE}')) AS BIGINT)
                   AS n_phones,
               md5(regexp_replace(
                       regexp_replace(
                           regexp_replace(a, '{_EMAIL}', '<EMAIL>', 'g'),
                           '{_URL}', '<URL>', 'g'),
                       '{_PHONE}', '<PHONE>', 'g')) AS redacted_fp
        FROM aug
    """,
    "q81_temperature_mix": f"""
        WITH per AS (SELECT source,
                            CAST(SUM(len({_TOK})) AS BIGINT) AS n_tokens
                     FROM documents GROUP BY source),
        tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total FROM per),
        z AS (SELECT SUM(sqrt(n_tokens / total)) AS z FROM per, tot)
        SELECT source, n_tokens,
               ROUND(n_tokens / total, 6) AS p_raw,
               ROUND(sqrt(n_tokens / total) / z, 6) AS weight,
               ROUND(sqrt(n_tokens / total) / z * total, 3)
                   AS expected_tokens
        FROM per, tot, z
    """,
    "q82_zipf_slope": f"""
        WITH tok AS (SELECT source, unnest({_TOK}) AS term FROM documents),
        freq AS (SELECT source, term, COUNT(*) AS freq
                 FROM tok GROUP BY source, term),
        head AS (SELECT source, term, freq,
                        ROW_NUMBER() OVER (PARTITION BY source
                                           ORDER BY freq DESC, term) AS rn
                 FROM freq QUALIFY rn <= {_ZIPF_HEAD})
        SELECT source,
               COUNT(*) AS n_terms,
               ROUND(regr_slope(ln(freq), ln(rn)), 6) AS zipf_slope
        FROM head GROUP BY source
    """,
}
