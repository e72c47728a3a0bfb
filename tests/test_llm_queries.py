"""Differential tests for the LLM-pipeline queries + operator invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from weatherapi_data_engineering_project_spark.operators import dedup as DD
from weatherapi_data_engineering_project_spark.operators import similarity as SIM
from weatherapi_data_engineering_project_spark.plans import llm
from weatherapi_data_engineering_project_spark.schemas import load_table
from tests.conftest import SF_DIR, compare_query_to_oracle


@pytest.mark.parametrize("name", sorted(llm.QUERIES))
def test_llm_query_matches_oracle(spark, name):
    if name not in llm.ORACLE:
        pytest.skip("rows-only query")
    compare_query_to_oracle(spark, name, llm.QUERIES[name], llm.ORACLE[name], SF_DIR)


def test_minhash_is_subset_of_allpairs(spark):
    """LSH candidates can only *miss* true pairs, never invent them."""
    d = load_table(spark, SF_DIR, "documents")
    allp = {
        (r.id1, r.id2)
        for r in DD.jaccard_pairs(d, "text", "doc_id", 0.4).collect()
    }
    lsh = {
        (r.id1, r.id2)
        for r in DD.minhash_lsh_pairs(d, "text", "doc_id", 0.4).collect()
    }
    assert lsh <= allp
    # with 25 planted high-jaccard pairs, 4 bands of 2 should catch most
    if allp:
        assert len(lsh) >= len(allp) * 0.6


def test_cosine_topk_self_is_rank1(spark):
    e = load_table(spark, SF_DIR, "embeddings")
    top = SIM.cosine_topk(e, query_id=0, k=3).collect()
    assert top[0].vec_id == 0 and abs(top[0].cosine - 1.0) < 1e-12


def test_signlsh_ann_matches_brute_force_within_bucket(spark):
    """Every ANN hit must score exactly what brute force says."""
    e = load_table(spark, SF_DIR, "embeddings")
    ann = SIM.signlsh_topk(e, k=3, max_query_id=5).collect()
    if not ann:
        pytest.skip("no same-bucket candidates at this SF")
    by_query = {}
    for r in ann:
        by_query.setdefault(r.query_id, []).append(r)
    for qid, rows in by_query.items():
        brute = {
            r.vec_id: r.cosine
            for r in SIM.cosine_topk(e, query_id=qid, k=500).collect()
        }
        for r in rows:
            assert abs(brute[r.vec_id] - r.cosine) < 1e-12


def test_exact_dedup_counts(spark):
    d = load_table(spark, SF_DIR, "documents")
    res = DD.exact_dedup(d, "text", "doc_id")
    assert res.agg(F.sum("n_docs")).collect()[0][0] == d.count()


def test_q47_clusters_converged_and_consistent(spark):
    """4 rounds reach the fixpoint on this data (one extra round changes
    nothing), reps are cluster minima, and every paired doc is labeled."""
    from weatherapi_data_engineering_project_spark.operators import dedup as DD
    from weatherapi_data_engineering_project_spark.plans.llm import (
        JACCARD_THRESHOLD,
    )
    from weatherapi_data_engineering_project_spark.schemas import load_table

    d = load_table(spark, SF_DIR, "documents")
    pairs = DD.jaccard_pairs(d, "text", "doc_id", JACCARD_THRESHOLD)
    r4 = {(r.doc_id, r.cluster_rep)
          for r in DD.label_propagation_clusters(pairs, rounds=4).collect()}
    r5 = {(r.doc_id, r.cluster_rep)
          for r in DD.label_propagation_clusters(pairs, rounds=5).collect()}
    assert r4 == r5, "label propagation not converged in 4 rounds"
    reps = {}
    for doc, rep in r4:
        reps.setdefault(rep, []).append(doc)
        assert rep <= doc
    for rep, members in reps.items():
        assert rep == min(members)
    paired = {x for r in pairs.collect() for x in (r.id1, r.id2)}
    assert {d for d, _ in r4} == paired
