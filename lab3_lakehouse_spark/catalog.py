"""Thin table catalog: names → parquet/Delta paths, with schema contracts.

Generalizes the reference's hard-coded tier paths
(``etl_pipeline.py:19-26``: bronze/silver/gold constants) into a registry
usable from both the DataFrame front door (``load_table``) and the SQL
front door (``register_views`` + ``spark.sql``).

Reads are plain ``spark.read.parquet`` — schema comes from parquet footers
(a *metadata* read, not a data scan, so it is 100 TB-safe) and is then
validated against the contract in ``schemas.TESTDATA_SCHEMAS`` when
``validate=True``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lab3_lakehouse_spark.schemas import TESTDATA_SCHEMAS

TABLES: tuple[str, ...] = (
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

#: Small dimension tables — always broadcast-join candidates. At TPC-H
#: scale these stay tiny (region=5, nation=25) or modest relative to the
#: fact tables; used by operators.joins to pick broadcast hints.
SMALL_DIMS: frozenset[str] = frozenset({"region", "nation", "supplier", "part", "customer"})


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


#: Columns whose at-rest encoding has varied across testdata versions
#: (parquet TIMESTAMP(NANOS) → long under ``nanosAsLong``; naive
#: TIMESTAMP(MICROS) → TIMESTAMP_NTZ): normalized to plain TimestampType
#: on load so the rest of the engine sees ONE type. The session timezone
#: is pinned to UTC (session.py), so the NTZ→LTZ cast is lossless.
NS_TIMESTAMP_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def load_table(
    spark: SparkSession, sf_dir: str, name: str, validate: bool = False
) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, name))
    for c in NS_TIMESTAMP_COLS.get(name, ()):
        if c not in df.columns:
            continue
        dt = dict(df.dtypes)[c]
        if dt == "bigint":
            # `div`, not `/`: float division garbles µs precision on
            # ~1e18 ns epoch values (doubles carry only 2^53)
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
        elif dt == "timestamp_ntz":
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    if validate and name in TESTDATA_SCHEMAS:
        expected = {f.name for f in TESTDATA_SCHEMAS[name].fields}
        got = set(df.columns)
        if expected - got:
            raise ValueError(
                f"table {name!r} missing contracted columns: {sorted(expected - got)}"
            )
    return df


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Spread a CPU-dense input across all cores.

    Small-at-rest corpora (documents/embeddings at low SF) arrive as
    one parquet split, so per-row hashing/LSH/decode work runs on a
    single core while 31 idle. Repartition ONLY when the scan yields
    fewer partitions than the session's parallelism — at 100 TB the
    scan already produces >= cores splits and this is a no-op, so it
    never adds a shuffle to a big table.
    """
    from lab3_lakehouse_spark.session import default_parallelism

    target = min_partitions or default_parallelism()
    if _estimated_scan_partitions(df) >= target:
        return df
    return df.repartition(target)


def _estimated_scan_partitions(df: DataFrame) -> int:
    """Partition count of a scan without requiring the RDD API.

    Classic sessions give the exact number (plan conversion only — no
    job). Under Spark Connect there is no client-side RDD, so the file
    count stands in: it lower-bounds the split count (large files only
    add splits), which errs toward repartitioning borderline inputs —
    harmless, since at scale file count >> cores keeps fan_out a no-op.
    """
    try:
        return df.rdd.getNumPartitions()
    except Exception:
        return len(df.inputFiles())


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """SQL front door: expose every table as a temp view for ``spark.sql``."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
