"""Differential tests: every registered star query vs its DuckDB oracle.

Runs at sf0.001 by default (fast); the driver runs the same comparison
at sf0.01. Set SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 to match
the driver exactly.
"""

from __future__ import annotations

import pytest

from weatherapi_data_engineering_project_spark.plans import star
from tests.conftest import SF_DIR, compare_query_to_oracle


@pytest.mark.parametrize("name", sorted(star.QUERIES))
def test_star_query_matches_oracle(spark, name):
    if name not in star.ORACLE:
        pytest.skip("rows-only query")
    compare_query_to_oracle(spark, name, star.QUERIES[name], star.ORACLE[name], SF_DIR)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) >= {"l_returnflag", "sum_qty", "count_order"}


def test_registry_consistency():
    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs), "oracle for unregistered query"


EXPECTED_QUERIES = {
    "q43", "q44", "q45", "q46", "q47",
    # star q01-q18
    *(f"q{i:02d}" for i in range(1, 19)),
    # llm q19-q30, q35, q39-q41
    *(f"q{i}" for i in range(19, 31)), "q35", "q39", "q40", "q41",
    # analytics q31-q34, q36-q38
    "q31", "q32", "q33", "q34", "q36", "q37", "q38",
    # streaming q42, weather w01-w05
    "q42", *(f"w{i:02d}" for i in range(1, 6)),
}


def test_registry_complete():
    """Guard against a silent ImportError dropping a plan module: every
    expected query id must be registered (the registry's module list
    tolerates ImportError by design, which would otherwise shrink the
    graded inventory without failing anything)."""
    import __spark_entry__ as e

    got_prefixes = {name.split("_")[0] for name in e.queries()}
    missing = EXPECTED_QUERIES - got_prefixes
    assert not missing, f"queries missing from registry: {sorted(missing)}"


def test_k9_url_decode_roundtrip(spark):
    """K9 (DataTransformation.py:143): url-decoding of object keys.
    Unit roundtrip for the '+'-as-space shape; the registry-level
    differential lives in w08_decoded_object_keys (oracle decodes the
    fixture's %xx charset via chained replace — this DuckDB build has
    no url_decode builtin, VERDICT r06 #7)."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("curated/orders/1995%2F01%2F02/42.csv",),
         ("a%20file+name.json",)],
        "encoded_key string",
    )
    out = {r.encoded_key: r.key for r in df.select(
        "encoded_key", F.url_decode("encoded_key").alias("key")
    ).collect()}
    assert out["curated/orders/1995%2F01%2F02/42.csv"] == "curated/orders/1995/01/02/42.csv"
    assert out["a%20file+name.json"] == "a file name.json"
