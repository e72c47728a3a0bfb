"""Executable reference differential (VERDICT r08 task #2).

Runs the reference's OWN transform — ``/root/reference/DataTransformation.py``,
imported read-only, with its S3 client monkeypatched to an in-memory dict —
over the FIXTURES.md F1 documents, and diffs its five CSV outputs against the
Spark pipeline's curated CSVs column-by-column. Until now the weather
pipeline's parity with the reference rested on SURVEY.md citations; this file
makes it an executable differential.

Documented deviations (weather_transform.py:10-26), each asserted EXPLICITLY
below — the test fails if a deviation silently disappears (i.e. if either
side changes semantics without this file being updated):

  D1 humidity: the reference populates FACT_CURRENT humidity from
     ``current.cloud`` (DataTransformation.py:189 — copy-paste bug); Spark
     uses ``current.humidity``. Fixture carries humidity != cloud so the
     difference is observable (FIXTURES.md F4).
  D2 unknown city: the reference f-string-interpolates None into surrogate
     keys ("None_20240601") and ships the rows; Spark null-propagates the
     key and ``pipeline.transform_to_curated`` filters NULL-key rows at the
     curated boundary (they would fail the warehouse PK load).
  D3 condition first-wins (DataTransformation.py:69-73) is pandas
     insertion-order-dependent per city file; Spark resolves MIN(text) per
     code deterministically. The reference's own warehouse dedups across
     stage files anyway (condition.sql:34-38), so any-wins is the semantics.
  D4 code-1000→'Sunny' happens in the reference's WAREHOUSE SQL
     (condition.sql:57-66), downstream of its transform: the reference
     curated CSV says 'Clear'; Spark's curated CSV already says 'Sunny'
     (the rewrite is applied at build time, weather_transform.py:186-220).

Float parity needs no tolerance: fixture numerics are quarter-precision
(exactly representable), both sides round-trip them through decimal text.
"""

from __future__ import annotations

import hashlib
import importlib.util
import io
import json
import os
import urllib.parse

import botocore.exceptions
import pandas as pd
import pytest

from weatherapi_data_engineering_project_spark import fixtures
from weatherapi_data_engineering_project_spark import schemas as S
from weatherapi_data_engineering_project_spark.pipeline import (
    TABLES,
    transform_to_curated,
)

REF_PATH = "/root/reference/DataTransformation.py"
RAW_BUCKET = "weather-etl-raw-bucket"
STAGE_BUCKET = "weather-etl-snowflake-stage-bucket"
KNOWN = {"New Delhi": "DEL", "Mumbai": "MUM", "Kochi": "KOC"}  # fixture subset
UNKNOWN_CITY = "Atlantis"


class _FakeS3:
    """Dict-backed stand-in for the five boto3 S3 calls the reference makes
    (get/put/head/copy/delete — DataTransformation.py:55-66, :116-123,
    :131-246)."""

    def __init__(self):
        self.store: dict[tuple[str, str], bytes] = {}

    def put_object(self, Bucket, Key, Body):
        self.store[(Bucket, Key)] = Body.encode() if isinstance(Body, str) else Body

    def get_object(self, Bucket, Key):
        return {"Body": io.BytesIO(self.store[(Bucket, Key)])}

    def head_object(self, Bucket, Key):
        if (Bucket, Key) not in self.store:
            raise botocore.exceptions.ClientError(
                {"Error": {"Code": "404"}}, "HeadObject"
            )
        return {}

    def copy_object(self, Bucket, CopySource, Key):
        self.store[(Bucket, Key)] = self.store[
            (CopySource["Bucket"], CopySource["Key"])
        ]

    def delete_object(self, Bucket, Key):
        del self.store[(Bucket, Key)]


class _FakeBoto3:
    def __init__(self, s3):
        self._s3 = s3

    def client(self, name):
        assert name == "s3"
        return self._s3


# exec'ing the reference file is arbitrary code execution inside every
# pytest run, and /root/reference is explicitly untrusted public
# content — pin the exact bytes we audited (ADVICE r09) and refuse to
# run anything else. If the reference legitimately changes, re-audit it
# and update the digest.
REF_SHA256 = "89cced4426fb780f1cf412b5193cb592912747db4ac03dcc999a5a038e1bcea6"


def _load_reference():
    blob = open(REF_PATH, "rb").read()
    digest = hashlib.sha256(blob).hexdigest()
    if digest != REF_SHA256:
        raise AssertionError(
            f"{REF_PATH} sha256 {digest} != audited {REF_SHA256}; "
            "refusing to exec an unaudited reference file"
        )
    spec = importlib.util.spec_from_file_location("ref_transform", REF_PATH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_out():
    """Run the reference lambda once per fixture doc (its unit of work is
    one S3-object event) and collect its five CSV families, concatenated
    across cities, plus the per-city condition frames (needed for D3)."""
    ref = _load_reference()
    s3 = _FakeS3()
    ref.boto3 = _FakeBoto3(s3)  # module-local patch; real boto3 untouched

    ymd = fixtures.RUN_DATE.replace("-", "")
    for d in fixtures.docs():
        key = f"api_data_stage/{d['location']['name']}_{ymd}.json"
        s3.put_object(Bucket=RAW_BUCKET, Key=key, Body=json.dumps(d))
        # S3 event notifications URL-encode the key (spaces → '+', '/' kept);
        # the reference unquote_plus-es it (DataTransformation.py:143).
        event = {
            "Records": [
                {"s3": {"object": {"key": urllib.parse.quote_plus(key, safe="/")}}}
            ]
        }
        ref.lambda_handler(event, None)

    def read_family(prefix: str) -> pd.DataFrame:
        frames = [
            pd.read_csv(io.BytesIO(body))
            for (b, k), body in sorted(s3.store.items())
            if b == STAGE_BUCKET and k.startswith(prefix)
        ]
        assert frames, f"reference produced no {prefix} files"
        return pd.concat(frames, ignore_index=True)

    per_city_condition = {
        k.split("/")[1].split("_")[0]: pd.read_csv(io.BytesIO(body))
        for (b, k), body in s3.store.items()
        if b == STAGE_BUCKET and k.startswith("condition/")
    }
    return {
        "location": read_family("location/"),
        "current_weather": read_family("current_weather/"),
        "forecast_day_weather": read_family("forecast_day_weather/"),
        "forecast_hour_weather": read_family("forecast_hour_weather/"),
        "condition": read_family("condition/"),
        "condition_by_city": per_city_condition,
        "raw_store_keys": sorted(k for (b, k) in s3.store if b == RAW_BUCKET),
    }


@pytest.fixture(scope="module", params=["batch", "stream"])
def spark_curated(request, spark, tmp_path_factory):
    """The Spark pipeline's output over the same docs, in BOTH planes
    (VERDICT r09 #7):

    - "batch": the curated zone CSVs read back with the declared
      schemas (exactly what EP3 would load) — the transform itself.
    - "stream": the same curated zone DRAINED through the real
      streaming loader (streaming/load.py: checkpointed readStream →
      foreachBatch MERGE upsert → warehouse parquet) and the WAREHOUSE
      tables read back — so every reference assertion below also holds
      after the full EP3 path, proving batch/stream parity against the
      reference itself rather than against each other.
    """
    curated = str(tmp_path_factory.mktemp(f"ref_diff_curated_{request.param}"))
    transform_to_curated(fixtures.docs_df(spark), curated, spark, run_tag="refdiff")
    out = {}
    if request.param == "batch":
        for name, (_fn, schema, _keys, _parts, _derived) in TABLES.items():
            path = os.path.join(curated, name, "refdiff")
            out[name] = (
                spark.read.option("header", True).schema(schema).csv(path).toPandas()
            )
        return out
    from weatherapi_data_engineering_project_spark.pipeline import run_load

    warehouse = str(tmp_path_factory.mktemp("ref_diff_warehouse"))
    ckpt = str(tmp_path_factory.mktemp("ref_diff_ckpt"))
    run_load(spark, curated, warehouse, ckpt)
    for name, (_fn, schema, _keys, _parts, derived) in TABLES.items():
        df = spark.read.parquet(os.path.join(warehouse, name))
        # load-time derived columns (the hour fact's key-extracted
        # partition date) exist only warehouse-side; drop them so the
        # comparison universe is the reference's CSV columns
        for extra in (derived or {}):
            if extra not in schema.fieldNames():
                df = df.drop(extra)
        out[name] = df.toPandas()
    return out


def _column_by_column(ref_df, spark_df, key, table):
    """Sort both sides by key and assert per-column exact equality."""
    assert sorted(ref_df[key]) == sorted(spark_df[key]), (
        f"{table}: key sets differ: ref={sorted(ref_df[key])} "
        f"spark={sorted(spark_df[key])}"
    )
    r = ref_df.sort_values(key).reset_index(drop=True)
    s = spark_df.sort_values(key).reset_index(drop=True)
    assert set(r.columns) == set(s.columns), (
        f"{table}: columns ref={sorted(r.columns)} spark={sorted(s.columns)}"
    )
    for col in r.columns:
        rv, sv = list(r[col]), list(s[col])
        assert rv == sv, f"{table}.{col}: ref={rv} spark={sv}"


def test_location_matches_and_unknown_city_is_filtered(ref_out, spark_curated):
    ref = ref_out["location"]
    mine = spark_curated["location"]

    # D2: the reference ships the unknown city with a missing location_id...
    atl = ref[ref["name"] == UNKNOWN_CITY]
    assert len(atl) == 1 and atl["location_id"].isna().all()
    # ...Spark's curated zone excludes it (NULL PK would fail the load).
    assert UNKNOWN_CITY not in set(mine["name"])

    ref_known = ref[ref["name"] != UNKNOWN_CITY].copy()
    _column_by_column(ref_known, mine, key="location_id", table="location")
    assert set(mine["location_id"]) == set(KNOWN.values())


def test_current_weather_matches_modulo_humidity_bug(ref_out, spark_curated):
    ref = ref_out["current_weather"]
    mine = spark_curated["current_weather"]

    # D2: reference emits the None-keyed row; Spark filters it.
    none_rows = ref[ref["current_weather_id"].str.startswith("None_")]
    assert len(none_rows) == 1
    ref = ref[~ref["current_weather_id"].str.startswith("None_")].copy()

    # D1: in the reference, humidity is a copy of cloud — on EVERY row —
    # while the fixture's true humidity differs from cloud on every doc.
    assert list(ref["humidity"]) == list(ref["cloud"])
    by_name = {d["location"]["name"]: d["current"] for d in fixtures.docs()}
    mine_h = dict(zip(mine["location_id"], mine["humidity"]))
    for name, code in KNOWN.items():
        assert by_name[name]["humidity"] != by_name[name]["cloud"]
        assert mine_h[code] == by_name[name]["humidity"]  # corrected semantics

    # Every OTHER column matches the reference exactly.
    ref["weather_date"] = pd.to_datetime(ref["weather_date"]).dt.date
    _column_by_column(
        ref.drop(columns=["humidity"]),
        mine.drop(columns=["humidity"]),
        key="current_weather_id",
        table="current_weather",
    )


def test_forecast_day_matches(ref_out, spark_curated):
    ref = ref_out["forecast_day_weather"]
    mine = spark_curated["forecast_day_weather"]

    none_rows = ref[ref["forecast_day_weather_id"].str.startswith("None_")]
    assert len(none_rows) == 2  # D2: day positions {1,2} of the unknown city
    ref = ref[~ref["forecast_day_weather_id"].str.startswith("None_")].copy()

    ref["forecast_date"] = pd.to_datetime(ref["forecast_date"]).dt.date
    _column_by_column(
        ref, mine, key="forecast_day_weather_id", table="forecast_day_weather"
    )
    # A1 semantics: exactly 2 rows per known doc, positions {1,2} → dates
    # 2024-06-02/03 (today's position 0 dropped, DataTransformation.py:204).
    assert len(mine) == 2 * len(KNOWN)
    assert {str(d) for d in mine["forecast_date"]} == {"2024-06-02", "2024-06-03"}


def test_forecast_hour_matches(ref_out, spark_curated):
    ref = ref_out["forecast_hour_weather"]
    mine = spark_curated["forecast_hour_weather"]

    none_rows = ref[ref["forecast_hour_weather_id"].str.startswith("None_")]
    assert len(none_rows) == 6  # D2: 3 hours × 2 days of the unknown city
    ref = ref[~ref["forecast_hour_weather_id"].str.startswith("None_")].copy()

    ref["forecast_datetime"] = pd.to_datetime(ref["forecast_datetime"])
    mine = mine.copy()
    mine["forecast_datetime"] = pd.to_datetime(mine["forecast_datetime"])
    _column_by_column(
        ref, mine, key="forecast_hour_weather_id", table="forecast_hour_weather"
    )
    # A3/K3 semantics: 6 rows per known doc; hour index from the KEY suffix.
    assert len(mine) == 6 * len(KNOWN)
    assert {k.rsplit("_", 1)[1] for k in mine["forecast_hour_weather_id"]} == {
        "0", "10", "20"
    }


def test_condition_semantics(ref_out, spark_curated):
    ref_all = ref_out["condition"]
    mine = spark_curated["condition"]

    # D3 precondition: the cross-city conflict is real — code 1101 carries
    # different first-win texts in different city files.
    by_city = ref_out["condition_by_city"]
    texts_1101 = {
        t
        for df in by_city.values()
        for t in df.loc[df["condition_code"] == 1101, "condition_name"]
    }
    assert texts_1101 == {"CondA", "CondB"}

    # D4: the reference's transform-stage CSV still says 'Clear' for 1000;
    # the rewrite is warehouse-side SQL (condition.sql:57-66).
    assert set(
        ref_all.loc[ref_all["condition_code"] == 1000, "condition_name"]
    ) == {"Clear"}
    assert (
        mine.loc[mine["condition_code"] == 1000, "condition_name"].iloc[0] == "Sunny"
    )

    # Same code universe on both sides (the unknown city's conditions ARE
    # included — the condition dim has no location key to null out).
    assert set(ref_all["condition_code"]) == set(mine["condition_code"])

    # D3 resolution: applying the reference's OWN warehouse semantics
    # (Sunny rewrite, then any-wins dedup — here deterministic MIN) to the
    # union of its stage files reproduces Spark's dim exactly.
    ref_wh = ref_all.copy()
    ref_wh.loc[ref_wh["condition_code"] == 1000, "condition_name"] = "Sunny"
    expected = (
        ref_wh.groupby("condition_code")["condition_name"].min().to_dict()
    )
    got = dict(zip(mine["condition_code"], mine["condition_name"]))
    assert got == expected


def test_reference_archives_raw_objects(ref_out):
    """S7 parity: after each run the reference copies the raw object to the
    history prefix and deletes the stage copy — mirrored by our gated
    archive (streaming/load.py:190-227)."""
    keys = ref_out["raw_store_keys"]
    assert all(k.startswith("api_data_history/") for k in keys)
    assert len(keys) == len(fixtures.docs())
