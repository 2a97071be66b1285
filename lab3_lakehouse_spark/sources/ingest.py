"""Typed ingestion operators (SURVEY §2.1 S1, §2.2 P1/P3/P5).

The reference reads CSV with ``header=true, inferSchema=true``
(``etl_pipeline.py:49-51``) and then re-parses/casts defensively
(``etl_pipeline.py:55-59``, ``utils.py:17-24``). At 100 TB,
``inferSchema`` is wrong by construction — it *double-scans* the input
to guess types. The engine inverts the default: explicit
``StructType`` contracts, with inference as an opt-in for exploration.

Schema tolerance (the reference's ``if col in df.columns`` probes,
``etl_pipeline.py:55,58``) is kept: ingestion accepts missing columns
rather than failing, because upstream producers change schemas without
notice at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    header: bool = True,
    infer: bool = False,
    timestamp_format: str | None = None,
) -> DataFrame:
    """S1: header-aware CSV scan with an explicit schema contract.

    ``infer=True`` (exploration only) reproduces the reference's
    behavior; production callers pass ``schema`` so the read is
    single-pass and the contract is pinned at the source.
    """
    reader = spark.read.option("header", str(header).lower())
    if timestamp_format:
        reader = reader.option("timestampFormat", timestamp_format)
    if schema is not None:
        reader = reader.schema(schema)
    elif infer:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def parse_timestamps(
    df: DataFrame, cols: list[str], fmt: str | None = None
) -> DataFrame:
    """P1 + P5: string → timestamp for each *present* column (schema
    probe mirrors ``etl_pipeline.py:55-59``; absent columns are skipped,
    not an error)."""
    for c in cols:
        if c in df.columns:
            df = df.withColumn(
                c, F.to_timestamp(F.col(c), fmt) if fmt else F.to_timestamp(F.col(c))
            )
    return df


def apply_casts(df: DataFrame, casts: dict[str, str]) -> DataFrame:
    """P3: pin the column contract with explicit casts (schema-tolerant:
    absent columns skipped). ``casts`` maps column → Spark type name
    (``"int"``, ``"float"``, ``"double"``, ``"timestamp"``, ...)."""
    for c, t in casts.items():
        if c in df.columns:
            df = df.withColumn(c, F.col(c).cast(t))
    return df


def add_date_parts(
    df: DataFrame, ts_col: str, parts: tuple[str, ...] = ("year", "month")
) -> DataFrame:
    """P2: derive partition columns from an event-time column
    (generalizes ``etl_pipeline.py:61-62``). Supported parts: year,
    month, day, hour."""
    fns = {"year": F.year, "month": F.month, "day": F.dayofmonth, "hour": F.hour}
    for p in parts:
        df = df.withColumn(p, fns[p](F.col(ts_col)))
    return df
