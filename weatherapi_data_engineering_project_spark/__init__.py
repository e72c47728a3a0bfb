"""weatherapi_data_engineering_project_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference repo ``SrujanGowda-10/WeatherApi-Data-Engineering-project``
(a WeatherAPI → S3 → Snowflake star-schema ETL pipeline), plus the
large-scale training-data-pipeline operators a 100 TB deployment needs
(dedup, similarity search, text analysis, multimodal plumbing).

Layout
------
- ``session``    : SparkSession builder tuned for both local tests and clusters
- ``schemas``    : StructType constants (WeatherAPI doc, star schema, testdata)
- ``functions/`` : scalar expression builders (keys, text stats, multimodal)
- ``operators/`` : composite operators (upsert, dedup, similarity, topk)
- ``plans/``     : end-to-end query plans (star analytics, weather transform)
- ``sources/``   : sources/sinks (REST poller, file zones)
- ``streaming/`` : Structured Streaming incremental load (Snowpipe semantics)

Everything is built only from public Apache Spark APIs. Where behavior
mirrors the reference, docstrings cite ``<file>:<line>`` in
``/root/reference`` so parity can be audited.
"""

__version__ = "0.1.0"
