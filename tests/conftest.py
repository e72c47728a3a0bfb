"""Shared Spark session + DuckDB oracle helpers for the test suite."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from weatherapi_data_engineering_project_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
TESTDATA_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="engine-tests", shuffle_partitions=8)
    yield s


def make_duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """DuckDB connection with the testdata tables registered as views —
    mirrors the driver's oracle environment."""
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


@pytest.fixture(scope="session")
def duck():
    return make_duck(SF_DIR)


def normalize_cell(v):
    import datetime
    import math

    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(normalize_cell(x) for x in v)
    return v


def df_to_comparable(cols, rows):
    """Order-insensitive canonical form: sort columns by name, then rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon = [tuple(normalize_cell(r[i]) for i in order) for r in rows]
    canon.sort(key=repr)
    return [cols[i] for i in order], canon


def compare_query_to_oracle(spark, name: str, qfn, sql: str, sf_dir: str):
    """Replicates the driver's differential gate: row-count, sorted column
    names, and order-insensitive values must all match."""
    sdf = qfn(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    con = make_duck(sf_dir)
    res = con.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = [tuple(r) for r in res.fetchall()]
    con.close()

    assert len(srows) == len(drows), (
        f"{name}: rowcount spark={len(srows)} duckdb={len(drows)}"
    )
    sc, sv = df_to_comparable(scols, srows)
    dc, dv = df_to_comparable(dcols, drows)
    assert sc == dc, f"{name}: columns spark={sc} duckdb={dc}"
    mismatches = [
        (a, b) for a, b in zip(sv, dv) if a != b
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)}/{len(sv)} rows differ; first: "
        f"spark={mismatches[0][0]} duckdb={mismatches[0][1]}"
    )
