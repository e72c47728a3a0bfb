"""Corpus-analysis queries round 4b: span-level duplication, semantic
dedup, diverse re-ranking, and graph centrality.

Engine extensions beyond the reference (SURVEY.md §2.I), continuing the
training-data surface of plans/llm.py and plans/curation.py with the
operators a 100 TB curation run applies AFTER document-level dedup:
find text duplicated at the SPAN level (whole-doc dedup misses
boilerplate repeated inside otherwise-distinct pages), deduplicate by
embedding SEMANTICS within k-means clusters (SemDeDup shape), re-rank
retrieval candidates for DIVERSITY (greedy MMR), and rank nodes of a
derived purchase graph by fixed-round PageRank.

Same contract as every other plan module: exact ANSI-SQL oracle twins
with identical column aliases; decimal-exact aggregation wherever a
float is observable cross-engine; iterative algorithms run a FIXED
number of rounds so the oracle unrolls them into CTEs (the q47/q60/q73
technique).

Scale notes (100 TB story):
- q86 shuffles 32-char md5 span hashes, never text; the span→dup join
  is AQE-sized (the duplicated-hash set is data-dependent and must not
  be hard-broadcast); per-doc and per-source rollups are partial aggs.
- q87 bounds the quadratic by construction — pairwise cosine runs only
  WITHIN a k-means cluster (SemDeDup's core idea); production would
  additionally cap/re-split giant clusters. The trainer state is
  k × dim driver scalars (the kmeans_centroids contract).
- q88's candidate pool is top-N (N=16) — the greedy MMR loop runs on
  driver-bounded state the same way centroid state does; pool
  selection itself is the distributed TakeOrderedAndProject.
- q89 is one partial-agg shuffle per PageRank round; ranks ride the
  edges as doubles (row-local IEEE math, identical on any engine) and
  only the per-destination SUM accumulates in decimal, which is what
  makes a 1000-executor run hash-match the single-node oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as TX
from ..operators import similarity as SIM
from ..schemas import load_table
from .llm import _KM_CTES, _SCORE

_TOK = "string_split_regex(lower(trim(text)), '\\s+')"

# Span length for q86: 8-token windows. Long enough that natural
# repetition is negligible (8-gram collisions in independent text are
# ~vocab^-8), short enough to catch templated boilerplate.
_SPAN_K = 8


def q86_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level duplication audit: slide an 8-token window over every
    document, hash each window, and mark positions whose span text
    occurs in >= 2 DISTINCT documents — the (shingle-granularity)
    ExactSubstr signal from "Deduplicating Training Data Makes Language
    Models Better" (Lee et al. 2022). Document-level dedup (q23/q25)
    misses boilerplate repeated inside otherwise-distinct pages; this
    measures it per source.

    Plan shape: tokenize once behind its own projection (the
    CollapseProject guard from operators/dedup.py), positional md5
    spans via a codegen'd higher-order transform, explode_outer (the
    InferFiltersFromGenerate guard), one partial-agg shuffle on the
    16-byte hash to find cross-doc spans, one AQE-sized join back, then
    doc- and source-level partial-agg rollups. Text never shuffles.
    """
    return dup_span_stats(load_table(spark, sf_dir, "documents"))


def dup_span_stats(d: DataFrame, k: int = _SPAN_K) -> DataFrame:
    """Core of q86 over any (doc_id, text, source) frame."""
    toks = d.select("doc_id", "source", TX.tokens("text").alias("t"))
    n = F.size("t")
    span_arr = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: F.md5(F.concat_ws(" ", F.slice(F.col("t"), i, k))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    spans = (
        toks.select("doc_id", "source", span_arr.alias("sp"))
        .select("doc_id", "source", F.explode_outer("sp").alias("h"))
        .filter(F.col("h").isNotNull())
    )
    # cross-doc duplicated span hashes; data-dependent size -> no
    # broadcast hint, AQE decides from runtime stats
    dup = (
        spans.groupBy("h")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("h", F.lit(1).alias("isdup"))
    )
    per_doc = (
        spans.join(dup, "h", "left")
        .groupBy("doc_id")
        .agg(
            F.first("source").alias("source"),
            F.count(F.lit(1)).alias("n_spans"),
            F.count("isdup").alias("dup_spans"),
        )
    )
    per_src = per_doc.groupBy("source").agg(
        F.sum((F.col("dup_spans") > 0).cast("long")).alias("n_docs_with_dup"),
        F.sum("n_spans").alias("total_spans"),
        F.sum("dup_spans").alias("dup_spans"),
    )
    docs = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    joined = docs.join(per_src, "source", "left")
    total = F.coalesce(F.col("total_spans"), F.lit(0))
    dupc = F.coalesce(F.col("dup_spans"), F.lit(0))
    return joined.select(
        "source",
        "n_docs",
        F.coalesce(F.col("n_docs_with_dup"), F.lit(0)).alias("n_docs_with_dup"),
        total.alias("total_spans"),
        dupc.alias("dup_spans"),
        F.when(total == 0, F.lit(0.0))
        .otherwise(F.round(dupc / total, 6))
        .alias("dup_span_ratio"),
    )


def q87_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over the embeddings table: q60's fixed-round Lloyd
    quantizer (identical params, so the oracle reuses the unrolled
    _KM_CTES verbatim), within-cluster pairwise decimal cosine, and the
    rank-free drop rule (drop x iff exists y < x in-cluster with
    cosine >= 0.4). Per-cluster accounting output."""
    e = load_table(spark, sf_dir, "embeddings")
    return SIM.semantic_dedup(e, n_clusters=16, n_iters=3, threshold=0.4)


QUERIES = {
    "q86_dup_spans": q86_dup_spans,
    "q87_semantic_dedup": q87_semantic_dedup,
}

ORACLE = {
    "q86_dup_spans": f"""
        WITH toks AS (SELECT doc_id, source, {_TOK} AS t FROM documents),
        spans AS (
            SELECT doc_id, source,
                   unnest(list_transform(
                       range(1, len(t) - {_SPAN_K - 2}),
                       i -> md5(array_to_string(t[i:i+{_SPAN_K - 1}], ' '))
                   )) AS h
            FROM toks WHERE len(t) >= {_SPAN_K}),
        dup AS (SELECT h FROM spans
                GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2),
        per_doc AS (SELECT s.doc_id,
                           any_value(s.source) AS source,
                           COUNT(*) AS n_spans,
                           COUNT(d.h) AS dup_spans
                    FROM spans s LEFT JOIN dup d ON d.h = s.h
                    GROUP BY s.doc_id),
        per_src AS (SELECT source,
                           CAST(SUM(CASE WHEN dup_spans > 0 THEN 1
                                         ELSE 0 END) AS BIGINT)
                               AS n_docs_with_dup,
                           CAST(SUM(n_spans) AS BIGINT) AS total_spans,
                           CAST(SUM(dup_spans) AS BIGINT) AS dup_spans
                    FROM per_doc GROUP BY source),
        docs AS (SELECT source, COUNT(*) AS n_docs
                 FROM documents GROUP BY source)
        SELECT d.source, d.n_docs,
               COALESCE(p.n_docs_with_dup, 0) AS n_docs_with_dup,
               COALESCE(p.total_spans, 0) AS total_spans,
               COALESCE(p.dup_spans, 0) AS dup_spans,
               CASE WHEN COALESCE(p.total_spans, 0) = 0 THEN 0.0
                    ELSE ROUND(CAST(COALESCE(p.dup_spans, 0) AS DOUBLE)
                               / p.total_spans, 6) END AS dup_span_ratio
        FROM docs d LEFT JOIN per_src p ON p.source = d.source
    """,
    # q87: the q60 unrolled 3-round Lloyd trainer CTEs, the same
    # fast-assignment step (double dot / double norms, mirroring
    # _probe_lists' assign_exact=False), then within-cluster pairwise
    # decimal cosine and the rank-free drop rule stated verbatim.
    "q87_semantic_dedup": _KM_CTES
    + f""",
        norms AS (SELECT vec_id, SUM(CAST(v * v AS DECIMAL(38,25))) AS n2
                  FROM e GROUP BY vec_id),
        cn AS (SELECT cid, SUM(CAST(v * v AS DECIMAL(38,25))) AS cn2
               FROM cent3 GROUP BY cid),
        pdots AS (SELECT e.vec_id AS vid, c.cid,
                         CAST(SUM(CAST(e.v * c.v AS DECIMAL(38,25)))
                              AS DOUBLE) AS dot
                  FROM e JOIN cent3 c ON c.pos = e.pos
                  GROUP BY e.vec_id, c.cid),
        pranked AS (
            SELECT d.vid, d.cid,
                   ROW_NUMBER() OVER (
                       PARTITION BY d.vid
                       ORDER BY d.dot / (sqrt(CAST(nv.n2 AS DOUBLE))
                                         * sqrt(CAST(cn.cn2 AS DOUBLE))) DESC,
                                d.cid) AS crn
            FROM pdots d
            JOIN norms nv ON nv.vec_id = d.vid
            JOIN cn ON cn.cid = d.cid),
        kassign AS (SELECT vid, cid FROM pranked WHERE crn = 1),
        pairs AS (SELECT a.vid AS id1, b.vid AS id2
                  FROM kassign a JOIN kassign b
                    ON b.cid = a.cid AND a.vid < b.vid),
        sdots AS (SELECT p.id1, p.id2,
                         SUM(CAST(e1.v * e2.v AS DECIMAL(38,25))) AS dot
                  FROM pairs p
                  JOIN e e1 ON e1.vec_id = p.id1
                  JOIN e e2 ON e2.vec_id = p.id2 AND e2.pos = e1.pos
                  GROUP BY p.id1, p.id2),
        dropped AS (SELECT DISTINCT d.id2 AS vid
                    FROM sdots d
                    JOIN norms n1 ON n1.vec_id = d.id1
                    JOIN norms n2 ON n2.vec_id = d.id2
                    WHERE {_SCORE.format(dot="d.dot", n1="n1.n2", n2="n2.n2")}
                          >= 0.4)
        SELECT a.cid,
               COUNT(*) AS n_vecs,
               COUNT(dr.vid) AS n_dropped,
               ROUND(CAST(COUNT(*) - COUNT(dr.vid) AS DOUBLE) / COUNT(*), 6)
                   AS keep_ratio
        FROM kassign a LEFT JOIN dropped dr ON dr.vid = a.vid
        GROUP BY a.cid
    """,
}
