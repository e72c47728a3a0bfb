"""Schema constants.

Two families:

1. The WeatherAPI document + 5-table star schema of the reference.
   The reference declares every warehouse column ``VARCHAR(255)``
   (``location.sql:2-17``, ``condition.sql:2-8``,
   ``current_weather.sql:2-33``, ``forecast_day_weather.sql:2-45``,
   ``forecast_hour_weather.sql:2-47``). We use the *logical* types the
   data actually carries (SURVEY.md §1.2) — doubles for temps/wind,
   ints for 0/1 flags and percents, date/timestamp for temporal — and
   document that as a deliberate deviation: stringly-typed storage at
   100 TB wastes scan bandwidth and defeats predicate pushdown.

2. The driver testdata star schema (TESTDATA.md / FIXTURES.md F8),
   declared explicitly so scans never pay schema inference and so
   column pruning is checkable against a fixed ReadSchema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# WeatherAPI nested document (FIXTURES.md F1; evidenced by the normalization
# paths at DataTransformation.py:26-28, :95, :150-161, :168-192, :202).
# ---------------------------------------------------------------------------

CONDITION_STRUCT = T.StructType(
    [
        T.StructField("code", T.IntegerType()),
        T.StructField("text", T.StringType()),
    ]
)

_HOUR_FIELDS = [
    T.StructField("time", T.StringType()),  # "yyyy-MM-dd HH:mm"
    T.StructField("temp_c", T.DoubleType()),
    T.StructField("is_day", T.IntegerType()),
    T.StructField("wind_kph", T.DoubleType()),
    T.StructField("wind_dir", T.StringType()),
    T.StructField("pressure_mb", T.DoubleType()),
    T.StructField("precip_mm", T.DoubleType()),
    T.StructField("humidity", T.IntegerType()),
    T.StructField("cloud", T.IntegerType()),
    T.StructField("dewpoint_c", T.DoubleType()),
    T.StructField("gust_kph", T.DoubleType()),
    T.StructField("will_it_rain", T.IntegerType()),
    T.StructField("chance_of_rain", T.IntegerType()),
    T.StructField("will_it_snow", T.IntegerType()),
    T.StructField("chance_of_snow", T.IntegerType()),
    T.StructField("snow_cm", T.DoubleType()),
    T.StructField("uv", T.DoubleType()),
    T.StructField("condition", CONDITION_STRUCT),
]

_DAY_FIELDS = [
    T.StructField("maxtemp_c", T.DoubleType()),
    T.StructField("avgtemp_c", T.DoubleType()),
    T.StructField("mintemp_c", T.DoubleType()),
    T.StructField("maxwind_kph", T.DoubleType()),
    T.StructField("totalprecip_mm", T.DoubleType()),
    T.StructField("totalsnow_cm", T.DoubleType()),
    T.StructField("avghumidity", T.DoubleType()),
    T.StructField("daily_will_it_rain", T.IntegerType()),
    T.StructField("daily_chance_of_rain", T.IntegerType()),
    T.StructField("daily_will_it_snow", T.IntegerType()),
    T.StructField("daily_chance_of_snow", T.IntegerType()),
    T.StructField("uv", T.DoubleType()),
    T.StructField("condition", CONDITION_STRUCT),
]

_ASTRO_FIELDS = [
    T.StructField("sunrise", T.StringType()),
    T.StructField("sunset", T.StringType()),
    T.StructField("moonrise", T.StringType()),
    T.StructField("moonset", T.StringType()),
]

FORECASTDAY_STRUCT = T.StructType(
    [
        T.StructField("date", T.StringType()),  # "yyyy-MM-dd"
        T.StructField("day", T.StructType(_DAY_FIELDS)),
        T.StructField("astro", T.StructType(_ASTRO_FIELDS)),
        T.StructField("hour", T.ArrayType(T.StructType(_HOUR_FIELDS))),
    ]
)

WEATHER_DOC_SCHEMA = T.StructType(
    [
        T.StructField(
            "location",
            T.StructType(
                [
                    T.StructField("name", T.StringType()),
                    T.StructField("region", T.StringType()),
                    T.StructField("country", T.StringType()),
                    T.StructField("lat", T.DoubleType()),
                    T.StructField("lon", T.DoubleType()),
                ]
            ),
        ),
        T.StructField(
            "current",
            T.StructType(
                [
                    T.StructField("last_updated", T.StringType()),
                    T.StructField("temp_c", T.DoubleType()),
                    T.StructField("is_day", T.IntegerType()),
                    T.StructField("wind_kph", T.DoubleType()),
                    T.StructField("wind_dir", T.StringType()),
                    T.StructField("pressure_mb", T.DoubleType()),
                    T.StructField("precip_mm", T.DoubleType()),
                    T.StructField("humidity", T.IntegerType()),
                    T.StructField("cloud", T.IntegerType()),
                    T.StructField("dewpoint_c", T.DoubleType()),
                    T.StructField("gust_kph", T.DoubleType()),
                    T.StructField("condition", CONDITION_STRUCT),
                ]
            ),
        ),
        T.StructField(
            "forecast",
            T.StructType(
                [T.StructField("forecastday", T.ArrayType(FORECASTDAY_STRUCT))]
            ),
        ),
    ]
)

# ---------------------------------------------------------------------------
# Star-schema warehouse tables (logical types; column names/order mirror the
# reference DDLs cited in the module docstring).
# ---------------------------------------------------------------------------

DIM_LOCATION_SCHEMA = T.StructType(
    [
        T.StructField("location_id", T.StringType()),  # PK (location.sql:12)
        T.StructField("name", T.StringType()),
        T.StructField("region", T.StringType()),
        T.StructField("country", T.StringType()),
        T.StructField("latitude", T.DoubleType()),
        T.StructField("longitude", T.DoubleType()),
    ]
)

DIM_CONDITION_SCHEMA = T.StructType(
    [
        T.StructField("condition_code", T.IntegerType()),  # PK (condition.sql:7)
        T.StructField("condition_name", T.StringType()),
    ]
)

FACT_CURRENT_SCHEMA = T.StructType(
    [
        T.StructField("current_weather_id", T.StringType()),
        T.StructField("location_id", T.StringType()),
        T.StructField("condition_code", T.IntegerType()),
        T.StructField("temperature_c", T.DoubleType()),
        T.StructField("is_day", T.IntegerType()),
        T.StructField("wind_kph", T.DoubleType()),
        T.StructField("wind_dir", T.StringType()),
        T.StructField("pressure_mb", T.DoubleType()),
        T.StructField("precip_mm", T.DoubleType()),
        T.StructField("humidity", T.IntegerType()),
        T.StructField("cloud", T.IntegerType()),
        T.StructField("dewpoint_c", T.DoubleType()),
        T.StructField("gust_kph", T.DoubleType()),
        T.StructField("weather_date", T.DateType()),
    ]
)

FACT_FORECAST_DAY_SCHEMA = T.StructType(
    [
        T.StructField("forecast_day_weather_id", T.StringType()),  # PK
        T.StructField("location_id", T.StringType()),
        T.StructField("condition_code", T.IntegerType()),
        T.StructField("forecast_date", T.DateType()),
        T.StructField("max_temp_c", T.DoubleType()),
        T.StructField("avg_temp_c", T.DoubleType()),
        T.StructField("min_temp_c", T.DoubleType()),
        T.StructField("max_wind_kph", T.DoubleType()),
        T.StructField("total_precip_mm", T.DoubleType()),
        T.StructField("total_snow_cm", T.DoubleType()),
        T.StructField("avg_humidity", T.DoubleType()),
        T.StructField("daily_will_it_rain", T.IntegerType()),
        T.StructField("daily_chance_of_rain", T.IntegerType()),
        T.StructField("daily_will_it_snow", T.IntegerType()),
        T.StructField("daily_chance_of_snow", T.IntegerType()),
        T.StructField("uv", T.DoubleType()),
        T.StructField("sunrise_time", T.StringType()),
        T.StructField("sunset_time", T.StringType()),
        T.StructField("moonrise_time", T.StringType()),
        T.StructField("moonset_time", T.StringType()),
    ]
)

FACT_FORECAST_HOUR_SCHEMA = T.StructType(
    [
        T.StructField("forecast_hour_weather_id", T.StringType()),  # PK
        T.StructField("forecast_day_weather_id", T.StringType()),  # FK → day fact
        T.StructField("location_id", T.StringType()),
        T.StructField("condition_code", T.IntegerType()),
        T.StructField("forecast_datetime", T.TimestampType()),
        T.StructField("temp_c", T.DoubleType()),
        T.StructField("is_day", T.IntegerType()),
        T.StructField("wind_kph", T.DoubleType()),
        T.StructField("wind_dir", T.StringType()),
        T.StructField("pressure_mb", T.DoubleType()),
        T.StructField("precip_mm", T.DoubleType()),
        T.StructField("humidity", T.IntegerType()),
        T.StructField("cloud", T.IntegerType()),
        T.StructField("dewpoint_c", T.DoubleType()),
        T.StructField("gust_kph", T.DoubleType()),
        T.StructField("will_it_rain", T.IntegerType()),
        T.StructField("chance_of_rain", T.IntegerType()),
        T.StructField("will_it_snow", T.IntegerType()),
        T.StructField("chance_of_snow", T.IntegerType()),
        T.StructField("snow_cm", T.DoubleType()),
        T.StructField("uv", T.DoubleType()),
    ]
)

# ---------------------------------------------------------------------------
# Driver testdata tables (TESTDATA.md).
# ---------------------------------------------------------------------------

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one testdata parquet table.

    Plain ``spark.read.parquet`` — the parquet footer carries the schema,
    so Catalyst gets column pruning + predicate pushdown for free; no
    inference pass, no driver-side listing beyond the single file.
    """
    if name not in TESTDATA_TABLES:
        raise KeyError(f"unknown testdata table {name!r}")
    if name == "events":
        # events.ts is written as parquet TIMESTAMP(NANOS). Spark's
        # handling of that type has changed across versions, so cover
        # every observed shape and normalize to a microsecond
        # TIMESTAMP_LTZ either way:
        # - older readers reject NANOS outright unless
        #   legacy.parquet.nanosAsLong=true maps it to INT64 nanos —
        #   narrow with integer division (double division would lose
        #   precision above 2^53 ns; the testdata is µs-aligned and
        #   DuckDB's reader does the same narrowing);
        # - Spark 4.1 reads NANOS natively as a µs-truncated
        #   TIMESTAMP_NTZ and silently ignores the legacy conf — cast
        #   NTZ→LTZ (interpreted in the session tz and rendered back in
        #   the same tz, so collected values round-trip identically and
        #   match DuckDB's naive read), because downstream time
        #   arithmetic (unix_micros) accepts only TIMESTAMP_LTZ.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        from pyspark.sql import functions as F

        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def as_varchar(df: DataFrame) -> DataFrame:
    """VARCHAR-parity mode (SURVEY §1.3): cast every column to string.

    The reference warehouse declares ALL columns ``VARCHAR(255)``
    (``location.sql:2-17``, ``condition.sql:2-8``,
    ``current_weather.sql:2-33``, ``forecast_day_weather.sql:2-45``,
    ``forecast_hour_weather.sql:2-47``); the engine's typed schemas are
    the documented default (stringly-typed storage defeats pushdown and
    scan pruning at scale), and this helper is the byte-parity escape
    hatch for consumers that need the reference's stringly surface —
    apply it at the write boundary, never inside plans. Spark's cast
    renders dates as yyyy-MM-dd, timestamps as
    yyyy-MM-dd HH:mm:ss[.SSSSSS], and keeps integral/decimal text
    exact, so keys and numerics round-trip losslessly."""
    from pyspark.sql import functions as F

    return df.select(
        *[F.col(c).cast("string").alias(c) for c in df.columns]
    )
