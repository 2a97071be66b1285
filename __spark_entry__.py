"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``lab3_lakehouse_spark/``; queries register
themselves in ``lab3_lakehouse_spark.queries`` (one entry per operator
from SURVEY.md §2 + the §2.7/north-star extension surface).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from lab3_lakehouse_spark.queries import ORACLES, QUERIES

SF0001_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: A1 daily revenue (the reference's signature gold
    aggregate, etl_pipeline.py:107-116) over the sf0.001 corpus."""
    return QUERIES["daily_revenue"](spark, SF0001_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
