"""Focused tests for the round-12 OPTIMIZATION session's operator-
internal changes (OPTIMIZATION_r12.md): each rewrite claimed
bit-identical results via a cheaper plan/action shape — these pin the
equivalences independently of the registry differentials.

- label_propagation_clusters_converged folded the init frame, round-1
  join, and per-round changed-count join into the aggregations; the
  NULL-typed `old` column is cast to the edge frame's id type, so
  string-keyed graphs must work too (registry graphs are long-keyed).
- signlsh_buckets builds its projection as ONE SQL expression string;
  the parsed lambdas must produce the same buckets as per-bit Python
  lambda builders over F.lit arrays (the pre-r12 formulation).
- _probe_lists consumes kmeans_centroids' driver-resident rows without
  a dim probe or collect; the literal plan (constant-folded cn2) must
  rank probes identically to the collect path.
- corpus_dim memoizes the first() dim probe by (semantic hash, files,
  column), with the corpus_row_count non-memoizable boundaries.
"""

from __future__ import annotations

from conftest import SF_DIR

from pyspark.sql import functions as F

from weatherapi_data_engineering_project_spark.operators import dedup as DD
from weatherapi_data_engineering_project_spark.operators import (
    similarity as SIM,
)
from weatherapi_data_engineering_project_spark.schemas import load_table


def test_converged_label_prop_handles_string_ids(spark):
    """The folded changed-count carries the previous label as a
    NULL-typed MIN column cast to the id type — exercise a STRING-keyed
    graph (chain + isolated pair) to pin the cast path the long-keyed
    registry graphs never touch."""
    edges = [("b", "c"), ("a", "b"), ("x", "y")]
    pairs = spark.createDataFrame(edges, "id1 string, id2 string")
    got = {
        r.doc_id: r.cluster_rep
        for r in DD.label_propagation_clusters_converged(pairs).collect()
    }
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_converged_label_prop_empty_pairs(spark):
    pairs = spark.createDataFrame([], "id1 long, id2 long")
    assert DD.label_propagation_clusters_converged(pairs).count() == 0


def test_signlsh_buckets_expr_matches_per_bit_lambda_build(spark):
    """The one-expr projection must be bit-identical to the pre-r12
    per-bit F.lit-array formulation (same Catalyst nodes, one parse)."""
    e = load_table(spark, SF_DIR, "embeddings")
    n_bits = 12
    got = sorted(
        (int(r["vec_id"]), r["bucket"])
        for r in SIM.signlsh_buckets(e, n_bits).collect()
    )
    dim = SIM.corpus_dim(e, "embedding")
    weights = SIM._hyperplane_weights(n_bits, dim)
    src = SIM._ensure_parallelism(e)
    bit_chars = []
    for bit in range(n_bits):
        warr = F.array(*[F.lit(w) for w in weights[bit]])
        proj = SIM._dot_arrays(F.col("embedding"), warr)
        bit_chars.append(
            F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0"))
        )
    ref = sorted(
        (int(r["vec_id"]), r["bucket"])
        for r in src.select(
            F.col("vec_id"), F.concat(*bit_chars).alias("bucket")
        ).collect()
    )
    assert got == ref


def test_probe_lists_driver_rows_path_matches_collect_path(spark):
    """kmeans_centroids' attached rows let _probe_lists skip the dim
    probe + collect; the constant-folded cn2 literal must rank probes
    exactly like the collected-decimal formulation."""
    e = load_table(spark, SF_DIR, "embeddings")
    cents = SIM.kmeans_centroids(e, 16, n_iters=2)
    assert getattr(cents, "_kmeans_driver_rows", None), (
        "trainer must attach its driver rows"
    )
    fast = sorted(
        (int(r["vid"]), [int(c) for c in r["probe_cids"]])
        for r in SIM._probe_lists(
            e, cents, 2, False, "vec_id", "embedding"
        ).collect()
    )
    # strip the attribute via a no-op select: same data, collect path
    stripped = cents.select("cid", "cvec")
    assert getattr(stripped, "_kmeans_driver_rows", None) is None
    slow = sorted(
        (int(r["vid"]), [int(c) for c in r["probe_cids"]])
        for r in SIM._probe_lists(
            e, stripped, 2, False, "vec_id", "embedding"
        ).collect()
    )
    assert fast == slow


def test_corpus_dim_memoizes_scan_frames_only(spark):
    e = load_table(spark, SF_DIR, "embeddings")
    d1 = SIM.corpus_dim(e, "embedding")
    assert d1 > 0
    n_keys = len(SIM._DIM_MEMO)
    assert SIM.corpus_dim(e, "embedding") == d1
    assert len(SIM._DIM_MEMO) == n_keys  # second call is a memo hit
    # in-memory frames (no scan files) probe every time, never memoize
    local = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0])], "vec_id long, embedding array<float>"
    )
    assert SIM.corpus_dim(local, "embedding") == 3
    assert len(SIM._DIM_MEMO) == n_keys


def test_prefix_verify_broadcast_and_exploded_paths_agree(spark, monkeypatch):
    """The corpus-bound switch in prefix_filter_pairs must be a pure
    plan choice: forcing the above-bound (exploded candidate-driven)
    verify on a small corpus yields row-identical output to the
    broadcast array_intersect path."""
    d = load_table(spark, SF_DIR, "documents")
    fast = sorted(
        map(tuple, DD.prefix_filter_pairs(d, "text", "doc_id").collect())
    )
    monkeypatch.setattr(DD, "_SHINGLE_SET_BROADCAST_MAX_ROWS", 0)
    slow = sorted(
        map(tuple, DD.prefix_filter_pairs(d, "text", "doc_id").collect())
    )
    assert fast == slow
