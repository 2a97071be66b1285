"""lab3_lakehouse_spark — a PySpark-native lakehouse analytics engine.

A from-scratch, Spark-first rebuild of the capabilities of the reference
``mavikulov/Lab3-Lakehouse`` (a PySpark+Delta medallion ETL over NYC taxi
data; see SURVEY.md), generalized into a reusable engine:

- ``session``    — SparkSession factory tuned for large-scale work (AQE,
                   UTC, Arrow, adaptive skew handling).
- ``catalog``    — table registry over parquet/Delta paths with explicit
                   schema contracts (no ``inferSchema`` by default).
- ``sources``    — typed ingestion (CSV/parquet/JSON) and medallion-tier
                   writers (partitioned, clustered).
- ``operators``  — relational + LLM-data-pipeline operator library
                   (aggregation, joins, windows, dedup, similarity, text).
- ``functions``  — scalar/vector function helpers (JVM-side first).
- ``plans``      — pipeline composition + plan introspection utilities.
- ``streaming``  — Structured Streaming windowed aggregation.
- ``ml``         — distributed ML parity (spark.ml RandomForest).

Everything is built on public PySpark 4.x APIs only.
"""

__version__ = "0.1.0"

from lab3_lakehouse_spark.session import build_session, tune_session  # noqa: F401
from lab3_lakehouse_spark.catalog import TABLES, load_table, register_views  # noqa: F401
