"""Continuous corpus ingestion: Structured Streaming → near-dup gate →
append-only corpus tier.

This is the STREAMING lid on the persisted-signature-store cycle the
batch example (`examples/incremental_ingest_pipeline.py`) established:
documents arrive as files, each micro-batch is exact-deduped against
the corpus fingerprints, LSH-probed against the persisted band store
(operators/dedup.py `minhash_candidates_vs_bands` — the corpus text is
never re-read), and only survivors append to the corpus AND extend the
store. Dedup cost per batch is therefore proportional to the BATCH,
not the corpus (measured: SCALE_r05.json probe alpha 0.09).

Delivery semantics: file sources are exactly-once on the READ side
(the checkpoint tracks consumed files); the foreachBatch body performs
three appends (corpus, bands, hashes) that are not atomic together, so
a crash between them can leave a batch partially applied — on restart
the batch REPLAYS, and the exact-fingerprint gate drops the rows that
already landed in the corpus tier, restoring idempotence for the
corpus itself (store re-appends are harmless duplicates for candidate
generation: the verify step dedups pairs). This is the standard
at-least-once + idempotent-sink contract of foreachBatch — same class
as streaming/windows.to_tier, documented rather than hidden.

The micro-batch body is the EXACT batch-pipeline composition — one
code path, two drivers (the reference's batch-vs-stream split kept two
engines in sync by hand; here the stream IS the batch operator chain).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lab3_lakehouse_spark.operators import dedup as dedup_ops

#: Arriving-document schema for the file stream (one JSON doc per line).
DOC_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("source", T.StringType()),
    ]
)


def _hashed(docs: DataFrame) -> DataFrame:
    return docs.select(
        F.col("doc_id").alias("__id"),
        dedup_ops.shingle_hashes("text", 3).alias("__h"),
    )


def _read_or_empty(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """Bootstrap-safe tier read: before the first batch lands, the
    corpus/store paths don't exist yet — an empty frame with the right
    schema keeps every join in the batch body uniform."""
    if os.path.isdir(path):
        return spark.read.schema(schema).parquet(path)
    return spark.createDataFrame([], schema)


_FP_SCHEMA = T.StructType([T.StructField("fp", T.StringType())])
_BANDS_SCHEMA = T.StructType(
    [
        T.StructField("__id", T.LongType()),
        T.StructField("band", T.IntegerType()),
        T.StructField("bh", T.LongType()),
    ]
)
_HASHES_SCHEMA = T.StructType(
    [
        T.StructField("__id", T.LongType()),
        T.StructField("__h", T.ArrayType(T.LongType())),
    ]
)


def stream_ingest_with_dedup(
    spark: SparkSession,
    src_dir: str,
    out_root: str,
    *,
    threshold: float = 0.8,
    max_band_bucket: int = 1000,
    max_files_per_trigger: int = 1,
):
    """Start the continuous-ingestion stream; returns the
    StreamingQuery (caller owns stop/awaitTermination).

    ``max_files_per_trigger=1`` processes arrival files one batch at a
    time, so every file is deduped against everything that arrived
    before it — the semantics a daily-drop ingest wants. Raise it when
    intra-batch dedup granularity is file-group-level anyway.
    """
    corpus_path = f"{out_root}/corpus"
    bands_path = f"{out_root}/store/bands"
    hashes_path = f"{out_root}/store/hashes"
    checkpoint = f"{out_root}/_checkpoint"

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch = dedup_ops.exact_dedup(batch_df, ["text"], ["doc_id"]).withColumn(
            "fp", dedup_ops.fingerprint("text")
        )
        known_fp = _read_or_empty(spark, corpus_path, _FP_SCHEMA).select("fp")
        fresh = batch.join(known_fp, "fp", "left_anti").localCheckpoint(eager=False)

        fresh_hashed = _hashed(fresh).localCheckpoint(eager=False)
        stored_bands = _read_or_empty(spark, bands_path, _BANDS_SCHEMA)
        stored_hashes = _read_or_empty(spark, hashes_path, _HASHES_SCHEMA)
        cands = dedup_ops.minhash_candidates_vs_bands(
            fresh_hashed, stored_bands, max_bucket=max_band_bucket
        )
        dup_ids = (
            dedup_ops.minhash_verify_hashed(
                cands,
                fresh_hashed.unionByName(stored_hashes),
                threshold=threshold,
            )
            .select(F.col("id_a").alias("doc_id"))
            .distinct()
        )
        survivors = fresh.join(dup_ids, "doc_id", "left_anti").localCheckpoint(
            eager=True
        )

        survivors.select("doc_id", "text", "source", "fp").write.mode(
            "append"
        ).parquet(corpus_path)
        surv_hashed = _hashed(survivors)
        dedup_ops.banded_signatures(surv_hashed).write.mode("append").parquet(
            bands_path
        )
        surv_hashed.write.mode("append").parquet(hashes_path)

    stream = (
        spark.readStream.schema(DOC_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(src_dir)
    )
    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .start()
    )
