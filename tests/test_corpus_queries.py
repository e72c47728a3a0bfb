"""Corpus-analysis queries (q86+): oracle differentials + semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR, SF_DIR_ORACLE, compare_query_to_oracle
from weatherapi_data_engineering_project_spark.plans import corpus as C


@pytest.mark.parametrize("name", sorted(C.ORACLE))
def test_corpus_oracle_differential(spark, name):
    compare_query_to_oracle(
        spark, name, C.QUERIES[name], C.ORACLE[name], SF_DIR_ORACLE
    )


def test_dup_spans_planted_boilerplate(spark):
    """Two docs sharing an 8-token boilerplate prefix are both flagged;
    a short doc (< 8 tokens) contributes zero spans but still counts."""
    boiler = "terms of service apply to all content here"  # 8 tokens
    df = spark.createDataFrame(
        [
            (0, boiler + " unique tail alpha beta", "a"),
            (1, boiler + " other ending gamma delta", "a"),
            (2, "completely different words nothing shared at all okay", "b"),
            (3, "tiny doc", "b"),
        ],
        "doc_id long, text string, source string",
    )
    rows = {r.source: r for r in C.dup_span_stats(df).collect()}
    assert rows["a"].n_docs_with_dup == 2
    assert rows["a"].dup_spans >= 2  # the shared prefix window, both docs
    assert rows["b"].n_docs == 2
    assert rows["b"].n_docs_with_dup == 0
    assert rows["b"].dup_spans == 0
