"""Streaming distribution-drift monitoring: a Structured Streaming lid
on the PSI operator (operators/events.value_drift_psi) — the live
retrain-gate alarm.

The batch PSI query compares two halves of one stored table; production
monitoring wants the OTHER shape: a frozen reference distribution
(computed once from the gold history) probed by every arriving
micro-batch. The reference bucket counts are a ≤ n_buckets-row frame
materialized once with ``localCheckpoint``; per batch the only work is
one scan-side bucketing + a ≤ n_buckets-key count of the BATCH, joined
against the broadcast reference — cost tracks the batch, never the
history. Each batch appends one row ``(batch_id, n_events, psi,
alarm)`` to the monitor tier, so the sink is an append-only time series
a dashboard tails.

Same at-least-once + idempotent-read contract as the other foreachBatch
sinks (streaming/windows.to_tier): a replayed batch re-appends its row;
consumers key on batch_id (latest wins) — documented, not hidden.

Bucketing matches value_drift_psi exactly (constant cut points,
greatest(0, least(B-1, floor(v/width))) clamping, smoothed shares
(n + ½)/(N + ½·B)), so the streamed PSI of a batch equals the batch
form on the same rows — pinned by test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Arriving-event schema for the file stream (one JSON event per line).
EVENT_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _bucket(value_col: str, n_buckets: int, bucket_width: float):
    return F.greatest(
        F.lit(0),
        F.least(
            F.lit(n_buckets - 1),
            F.floor(F.col(value_col) / F.lit(float(bucket_width))),
        ),
    ).cast("long")


def bucket_counts(
    df: DataFrame,
    *,
    value_col: str = "value",
    n_buckets: int = 10,
    bucket_width: float = 50.0,
) -> DataFrame:
    """Fixed-width bucket counts ``(bucket, n)`` over the full
    ``0..n_buckets-1`` spine (absent buckets report 0) — the mergeable
    distribution summary both the reference and each batch reduce to.
    """
    spark = df.sparkSession
    c = (
        df.filter(F.col(value_col).isNotNull())
        .select(_bucket(value_col, n_buckets, bucket_width).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    spine = spark.range(n_buckets).select(F.col("id").alias("bucket"))
    return spine.join(c, "bucket", "left").select(
        "bucket", F.coalesce(F.col("n"), F.lit(0)).alias("n")
    )


def psi_between(
    ref_counts: DataFrame,
    cur_counts: DataFrame,
    *,
    n_buckets: int | None = None,
) -> DataFrame:
    """Single-row PSI between two bucket-count frames (same spine):
    ``(n_ref, n_cur, psi)`` with the value_drift_psi smoothing, so a
    zero-event side stays finite. Callers that know the spine size
    (the streaming monitor runs this per micro-batch) pass
    ``n_buckets`` so the plan stays fully lazy — the fallback
    ``count()`` is a driver-side action, fine once, wrong in a loop."""
    if n_buckets is None:
        n_buckets = ref_counts.count()  # spine is complete by construction
    smooth = 0.5 * n_buckets
    j = (
        ref_counts.withColumnRenamed("n", "n_ref")
        .join(cur_counts.withColumnRenamed("n", "n_cur"), "bucket")
        .crossJoin(
            F.broadcast(
                ref_counts.agg(F.sum("n").cast("double").alias("tot_ref"))
            )
        )
        .crossJoin(
            F.broadcast(
                cur_counts.agg(F.sum("n").cast("double").alias("tot_cur"))
            )
        )
    )
    pa = (F.col("n_ref").cast("double") + F.lit(0.5)) / (
        F.col("tot_ref") + F.lit(smooth)
    )
    pb = (F.col("n_cur").cast("double") + F.lit(0.5)) / (
        F.col("tot_cur") + F.lit(smooth)
    )
    return j.agg(
        F.sum("n_ref").cast("long").alias("n_ref"),
        F.sum("n_cur").cast("long").alias("n_cur"),
        F.sum((pa - pb) * F.log(pa / pb)).alias("psi"),
    )


def stream_psi_monitor(
    spark: SparkSession,
    src_dir: str,
    out_root: str,
    reference: DataFrame,
    *,
    value_col: str = "value",
    n_buckets: int = 10,
    bucket_width: float = 50.0,
    alarm_threshold: float = 0.2,
    max_files_per_trigger: int = 1,
):
    """Start the drift monitor; returns the StreamingQuery (caller owns
    stop/awaitTermination). ``reference`` is the frozen baseline frame
    (e.g. last month's gold tier); its bucket counts are computed ONCE.
    Rows land in ``{out_root}/psi`` as
    ``(batch_id, n_ref, n_cur, psi, alarm)``.
    """
    ref_counts = bucket_counts(
        reference,
        value_col=value_col,
        n_buckets=n_buckets,
        bucket_width=bucket_width,
    ).localCheckpoint(eager=True)
    psi_path = f"{out_root}/psi"
    checkpoint = f"{out_root}/_checkpoint"

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        cur = bucket_counts(
            batch_df,
            value_col=value_col,
            n_buckets=n_buckets,
            bucket_width=bucket_width,
        )
        row = psi_between(ref_counts, cur, n_buckets=n_buckets).select(
            F.lit(batch_id).cast("long").alias("batch_id"),
            "n_ref",
            "n_cur",
            "psi",
            (F.col("psi") >= F.lit(alarm_threshold)).alias("alarm"),
        )
        row.write.mode("append").parquet(psi_path)

    stream = (
        spark.readStream.schema(EVENT_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(src_dir)
    )
    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .start()
    )
