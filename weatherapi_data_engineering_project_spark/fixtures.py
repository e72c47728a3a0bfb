"""Deterministic WeatherAPI-document fixtures (FIXTURES.md F1).

One source of truth generates BOTH the nested Spark documents (input
to the real transform) and flattened ANSI-SQL VALUES clauses (input to
the DuckDB oracle), so the weather transform itself is differentially
hash-verified: Spark does the real nested explode/keys/joins; the
oracle recomputes the same outputs from flat literals.

All numerics are quarter-precision (exactly representable in binary)
so double literals round-trip identically through both engines.

The fixture exercises the edge semantics called out in FIXTURES.md:
an unknown city (NULL location_id, K4), condition code 1000 with text
'Clear' (K10 'Sunny' rewrite), and duplicate condition codes with
conflicting texts (G3 dedup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .schemas import WEATHER_DOC_SCHEMA

RUN_DATE = "2024-06-01"

CITIES = [
    # (name, region, country) — 3 known cities + 1 unknown (K4 null id)
    ("New Delhi", "Delhi", "India"),
    ("Mumbai", "Maharashtra", "India"),
    ("Kochi", "Kerala", "India"),
    ("Atlantis", "Nowhere", "Unknown"),
]

WIND_DIRS = ["N", "S", "E", "W"]


def _current_condition(i: int) -> dict:
    # city 0 → code 1000 'Clear' (K10); cities 1 and 2 share code 1101
    # with conflicting texts (G3); city 3 unique.
    if i == 0:
        return {"code": 1000, "text": "Clear"}
    if i in (1, 2):
        return {"code": 1101, "text": "CondA" if i == 1 else "CondB"}
    return {"code": 1103, "text": "Cond3"}


def _day_condition(i: int, d: int) -> dict:
    if (i + d) % 3 == 0:
        return {"code": 1000, "text": "Clear"}
    return {"code": 1200 + ((i + d) % 3), "text": f"DayCond{(i + d) % 3}"}


def _hour_condition(h: int) -> dict:
    return {"code": 1300 + (h % 4), "text": f"HourCond{h % 4}"}


def _hour(i: int, d: int, h: int, date: str) -> dict:
    return {
        "time": f"{date} {h:02d}:00",
        "temp_c": 15.0 + 0.25 * h + i + d,
        "is_day": 1 if 6 <= h < 18 else 0,
        "wind_kph": 3.0 + 0.5 * h,
        "wind_dir": WIND_DIRS[h % 4],
        "pressure_mb": 1001.0 + d,
        "precip_mm": 0.25 * (h % 3),
        "humidity": 30 + h,
        "cloud": 20 + h,
        "dewpoint_c": 8.0 + 0.5 * i,
        "gust_kph": 6.5 + h,
        "will_it_rain": h % 2,
        "chance_of_rain": 4 * h,
        "will_it_snow": 0,
        "chance_of_snow": 0,
        "snow_cm": 0.0,
        "uv": 4.0,
        "condition": _hour_condition(h),
    }


def _forecastday(i: int, d: int) -> dict:
    date = f"2024-06-{d + 1:02d}"
    return {
        "date": date,
        "day": {
            "maxtemp_c": 30.0 + i + d,
            "avgtemp_c": 25.0 + i + d,
            "mintemp_c": 20.0 + i + d,
            "maxwind_kph": 10.5 + d,
            "totalprecip_mm": 0.5 * d,
            "totalsnow_cm": 0.0,
            "avghumidity": 50.0 + d,
            "daily_will_it_rain": d % 2,
            "daily_chance_of_rain": 10 * d,
            "daily_will_it_snow": (i + d) % 2,
            "daily_chance_of_snow": 5 * d,
            "uv": 5.0,
            "condition": _day_condition(i, d),
        },
        "astro": {
            "sunrise": f"05:3{d} AM",
            "sunset": f"06:4{d} PM",
            "moonrise": f"09:1{d} PM",
            "moonset": f"04:2{d} AM",
        },
        "hour": [_hour(i, d, h, date) for h in range(24)],
    }


def doc(i: int) -> dict:
    name, region, country = CITIES[i]
    return {
        "location": {
            "name": name,
            "region": region,
            "country": country,
            "lat": 10.25 * i + 0.5,
            "lon": 70.0 + i,
        },
        "current": {
            "last_updated": f"{RUN_DATE} 08:30",
            "temp_c": 20.0 + i,
            "is_day": i % 2,
            "wind_kph": 5.5 + i,
            "wind_dir": WIND_DIRS[i],
            "pressure_mb": 1000.0 + i,
            "precip_mm": 0.25 * i,
            "humidity": 40 + i,
            "cloud": 60 + i,  # != humidity so the ref's humidity←cloud bug is observable
            "dewpoint_c": 10.5 + i,
            "gust_kph": 8.75 + i,
            "condition": _current_condition(i),
        },
        "forecast": {"forecastday": [_forecastday(i, d) for d in range(3)]},
    }


def docs() -> list[dict]:
    return [doc(i) for i in range(len(CITIES))]


def raw_docs(day_offset: int = 0) -> list[dict]:
    """Documents as plain dicts for the raw JSON zone; ``day_offset``
    shifts the run date and the whole forecast window — a later
    extraction day with non-overlapping surrogate keys."""
    if day_offset == 0:
        return docs()
    import copy
    import datetime

    shifted = []
    delta = datetime.timedelta(days=day_offset)
    for d0 in docs():
        d2 = copy.deepcopy(d0)
        run = datetime.date.fromisoformat(RUN_DATE) + delta
        d2["current"]["last_updated"] = f"{run.isoformat()} 08:30"
        for fd in d2["forecast"]["forecastday"]:
            nd = datetime.date.fromisoformat(fd["date"]) + delta
            fd["date"] = nd.isoformat()
            for h in fd["hour"]:
                h["time"] = f"{nd.isoformat()} " + h["time"].split(" ", 1)[1]
        shifted.append(d2)
    return shifted


def object_keys() -> list[tuple[str]]:
    """K9 fixture (DataTransformation.py:143): the URL-encoded S3-style
    raw-zone object keys a listing would return — one per city per run,
    date path slash-encoded (%2F) and city-name spaces encoded (%20),
    exactly the shapes the reference decodes before parsing the key.
    Encoded at fixture-build time with stdlib ``quote`` so the Spark
    query and the oracle share literal strings (decode parity is the
    thing under test; encode parity is not)."""
    from urllib.parse import quote

    date_path = RUN_DATE.replace("-", "/")
    ymd = RUN_DATE.replace("-", "")
    return [
        (quote(f"raw/weather/{date_path}/{name}_{ymd}.json", safe=""),)
        for name, _region, _country in CITIES
    ]


def docs_df(spark: SparkSession) -> DataFrame:
    """Fixture docs as a cached DataFrame, memoized per session.

    Five weather queries each start from this frame; without the memo
    every action re-serializes the nested local rows through py4j
    (~0.5 s per query of pure conversion overhead)."""
    cached = getattr(spark, "_weather_fixture_docs", None)
    if cached is not None:
        return cached
    df = spark.createDataFrame(docs(), schema=WEATHER_DOC_SCHEMA).cache()
    spark._weather_fixture_docs = df
    return df


# ---------------------------------------------------------------------------
# SQL VALUES generation (the oracle's flat view of the same fixture)
# ---------------------------------------------------------------------------

def _lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, float):
        return f"CAST({v!r} AS DOUBLE)"
    if isinstance(v, bool):
        raise TypeError("no boolean fixture columns")
    return str(v)


def _values(rows: list[tuple], columns: list[str], alias: str) -> str:
    body = ",\n            ".join(
        "(" + ", ".join(_lit(v) for v in row) + ")" for row in rows
    )
    return f"(VALUES\n            {body}) AS {alias}({', '.join(columns)})"


def object_key_values() -> str:
    return _values(object_keys(), ["encoded_key"], "v")


def city_map_values() -> str:
    from .plans.weather_transform import CITY_CODES

    return _values(list(CITY_CODES), ["name", "location_id"], "m")


def location_values() -> str:
    rows = [
        (d["location"]["name"], d["location"]["region"], d["location"]["country"],
         d["location"]["lat"], d["location"]["lon"])
        for d in docs()
    ]
    return _values(rows, ["name", "region", "country", "latitude", "longitude"], "v")


def current_values() -> str:
    rows = []
    for d in docs():
        c = d["current"]
        rows.append(
            (d["location"]["name"], c["last_updated"], c["temp_c"], c["is_day"],
             c["wind_kph"], c["wind_dir"], c["pressure_mb"], c["precip_mm"],
             c["humidity"], c["cloud"], c["dewpoint_c"], c["gust_kph"],
             c["condition"]["code"])
        )
    return _values(
        rows,
        ["name", "last_updated", "temp_c", "is_day", "wind_kph", "wind_dir",
         "pressure_mb", "precip_mm", "humidity", "cloud", "dewpoint_c",
         "gust_kph", "condition_code"],
        "v",
    )


def forecast_day_values() -> str:
    """All 3 day positions — the oracle applies the pos IN (1,2) filter."""
    rows = []
    for d in docs():
        for pos, fd in enumerate(d["forecast"]["forecastday"]):
            day, astro = fd["day"], fd["astro"]
            rows.append(
                (d["location"]["name"], pos, fd["date"],
                 day["condition"]["code"], day["maxtemp_c"], day["avgtemp_c"],
                 day["mintemp_c"], day["maxwind_kph"], day["totalprecip_mm"],
                 day["totalsnow_cm"], day["avghumidity"],
                 day["daily_will_it_rain"], day["daily_chance_of_rain"],
                 day["daily_will_it_snow"], day["daily_chance_of_snow"],
                 day["uv"], astro["sunrise"], astro["sunset"],
                 astro["moonrise"], astro["moonset"])
            )
    return _values(
        rows,
        ["name", "day_pos", "fd_date", "condition_code", "max_temp_c",
         "avg_temp_c", "min_temp_c", "max_wind_kph", "total_precip_mm",
         "total_snow_cm", "avg_humidity", "daily_will_it_rain",
         "daily_chance_of_rain", "daily_will_it_snow", "daily_chance_of_snow",
         "uv", "sunrise_time", "sunset_time", "moonrise_time", "moonset_time"],
        "v",
    )


def forecast_hour_values() -> str:
    """All 24 hour positions for day positions 1 and 2 — the oracle
    applies the hour pos IN (0,10,20) filter."""
    rows = []
    for d in docs():
        for pos, fd in enumerate(d["forecast"]["forecastday"]):
            if pos not in (1, 2):
                continue
            for hpos, h in enumerate(fd["hour"]):
                rows.append(
                    (d["location"]["name"], fd["date"], hpos, h["time"],
                     h["condition"]["code"], h["temp_c"], h["is_day"],
                     h["wind_kph"], h["wind_dir"], h["pressure_mb"],
                     h["precip_mm"], h["humidity"], h["cloud"],
                     h["dewpoint_c"], h["gust_kph"], h["will_it_rain"],
                     h["chance_of_rain"], h["will_it_snow"],
                     h["chance_of_snow"], h["snow_cm"], h["uv"])
                )
    return _values(
        rows,
        ["name", "fd_date", "hour_pos", "h_time", "condition_code", "temp_c",
         "is_day", "wind_kph", "wind_dir", "pressure_mb", "precip_mm",
         "humidity", "cloud", "dewpoint_c", "gust_kph", "will_it_rain",
         "chance_of_rain", "will_it_snow", "chance_of_snow", "snow_cm", "uv"],
        "v",
    )


def condition_values() -> str:
    """Exactly the (code, text) stream the transform's union sees:
    current for every doc, day conditions at pos {1,2}, hour conditions
    at pos {0,10,20} of those days."""
    rows = []
    for d in docs():
        c = d["current"]["condition"]
        rows.append((c["code"], c["text"]))
        for pos, fd in enumerate(d["forecast"]["forecastday"]):
            if pos not in (1, 2):
                continue
            dc = fd["day"]["condition"]
            rows.append((dc["code"], dc["text"]))
            for hpos, h in enumerate(fd["hour"]):
                if hpos in (0, 10, 20):
                    hc = h["condition"]
                    rows.append((hc["code"], hc["text"]))
    return _values(rows, ["condition_code", "condition_name"], "v")
