"""Typed ingestion operators (SURVEY §2.1 S1, §2.2 P1/P3/P5).

The reference reads CSV with ``header=true, inferSchema=true``
(``etl_pipeline.py:49-51``) and then re-parses/casts defensively
(``etl_pipeline.py:55-59``, ``utils.py:17-24``). At 100 TB,
``inferSchema`` is wrong by construction — it *double-scans* the input
to guess types. The engine inverts the default: explicit
``StructType`` contracts, with inference as an opt-in for exploration.

Column-level transformations (timestamp parse, casts, date parts) are
the projection operators in ``operators/derive`` — re-exported here so
ingestion call sites read as one vocabulary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lab3_lakehouse_spark.operators.derive import (  # noqa: F401
    add_date_parts,
    cast_columns,
    parse_timestamps,
)


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


def apply_casts(df: DataFrame, casts: dict[str, str]) -> DataFrame:
    """P3 with string type names (``"int"``, ``"float"``, ...) —
    convenience wrapper over :func:`cast_columns` (schema-tolerant)."""
    return cast_columns(df, casts, strict=False)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    infer: bool = False,
) -> DataFrame:
    """S1 companion: newline-delimited JSON scan with an explicit
    schema contract — the interchange format most raw web/event dumps
    arrive in before they become columnar tiers.

    Same inversion as :func:`read_csv`: schema inference double-scans
    (and, for JSON, unions object shapes across the whole input), so
    production callers pass ``schema`` and the read is single-pass with
    full predicate/column pruning available to Catalyst. Fields absent
    in a line surface as NULLs (schema-tolerant by construction);
    malformed lines go to ``_corrupt_record`` under the default
    PERMISSIVE mode rather than failing the scan.
    """
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    elif not infer:
        raise ValueError("pass a schema, or opt in to inference (infer=True)")
    return reader.json(path)


def bootstrap_sample(
    spark: SparkSession,
    src_path: str,
    out_path: str,
    n_rows: int = 100_000,
    fmt: str = "parquet",
) -> DataFrame:
    """S5: bootstrap a bounded working sample from a (possibly huge)
    columnar source into a single CSV — the reference's dataset
    bootstrap (download_dataset.py:7-16: fetch public parquet, truncate
    to ``sample_size`` rows, save CSV) re-expressed in-engine. Network
    transport stays out of scope (a shell concern); the sampling and
    hand-off are the engine's job.

    ``limit(n)`` short-circuits the scan (Spark's CollectLimit reads
    only the partitions it needs — bounded work however large the
    source); ``coalesce(1)`` is safe BECAUSE the frame is already
    limit-bounded, and gives the single portable file a bootstrap
    exists to produce. Returns the sampled frame for immediate use.
    """
    df = spark.read.format(fmt).load(src_path).limit(n_rows)
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(out_path)
    return df


def read_orc(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
) -> DataFrame:
    """S1 companion: ORC scan — the other mainstream columnar format
    (Hive-lineage warehouses hand data over as ORC as often as
    Parquet). Native Spark reader, so predicate pushdown, column
    pruning, and vectorized decoding all apply exactly as for parquet;
    an explicit ``schema`` both documents the contract and lets Spark
    skip the footer-merge pass over many files."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    compression: str = "zstd",
) -> None:
    """ORC hand-off tier for Hive-lineage consumers: same layout
    policy as the parquet medallion writer (partition columns optional,
    zstd default), so a downstream warehouse can mount the directory
    as an external table unchanged."""
    writer = df.write.mode("overwrite").option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def read_text_corpus(spark: SparkSession, path: str) -> DataFrame:
    """Raw-text corpus ingestion: one document per line (the WET/LM
    dump convention), emitting ``(source_file, text, doc_hash)``.

    Document identity at ingest is the CONTENT hash (md5), not a line
    number: ``spark.read.text`` gives no stable per-line ordinal
    without a zipWithIndex pass (an RDD barrier that breaks pushdown
    and costs an extra stage at 100 TB), and content-addressed ids are
    what the exact-dedup stage keys on anyway — identical lines
    collapsing to one id is the semantics the pipeline wants. Empty
    lines are dropped at the scan (pushed filter).
    """
    return (
        spark.read.text(path)
        .select(
            F.input_file_name().alias("source_file"),
            F.col("value").alias("text"),
        )
        .filter(F.length("text") > 0)
        .withColumn("doc_hash", F.md5("text"))
    )


def read_binary_media(spark: SparkSession, path: str, glob: str | None = None) -> DataFrame:
    """Multimodal ingestion front door: Spark's ``binaryFile`` source →
    the engine's opaque-binary media schema (``media_id`` = file path,
    ``content`` = bytes, plus size/mtime metadata). Decode/feature
    stages (operators/multimodal.py) consume this frame unchanged.

    Scale: binaryFile is a real FileFormat — partition pruning over
    directory layout and ``pathGlobFilter`` predicate both apply, and
    files stream in as one row each (no driver-side listing of
    content). Oversized assets should be length-filtered BEFORE decode
    (the ``length`` column is metadata — filtering on it never reads
    file bodies).
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    return df.select(
        F.col("path").alias("media_id"),
        F.col("content"),
        F.col("length").alias("n_bytes"),
        F.col("modificationTime").alias("modified_at"),
    )


def _avro_available(spark: SparkSession) -> bool:
    """The avro source ships outside core Spark (spark-avro jar); this
    container has no jar and installs are prohibited, so avro paths
    are env-gated exactly like Delta (sources/medallion.py)."""
    try:
        spark.read.format("avro").schema("x INT").load("/nonexistent-avro-probe")
        return True
    except Exception as ex:  # pragma: no cover - env-dependent
        return "Failed to find data source" not in str(ex)


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Avro scan (Kafka-lineage hand-offs). Raises a clear error when
    the spark-avro jar is absent rather than Spark's generic
    data-source failure."""
    if not _avro_available(spark):
        raise RuntimeError(
            "avro source requires the spark-avro jar on the session classpath"
        )
    return spark.read.format("avro").load(path)  # pragma: no cover - env-gated


def write_avro(df: DataFrame, path: str) -> None:
    """Avro hand-off tier (row-oriented — the right format when the
    consumer is a streaming bus, not a warehouse scan)."""
    if not _avro_available(df.sparkSession):
        raise RuntimeError(
            "avro sink requires the spark-avro jar on the session classpath"
        )
    df.write.mode("overwrite").format("avro").save(path)  # pragma: no cover
