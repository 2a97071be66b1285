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


def stream_cusum_monitor(
    spark: SparkSession,
    src_dir: str,
    out_root: str,
    reference: DataFrame,
    *,
    value_col: str = "value",
    k_frac: float = 0.02,
    h_frac: float = 0.15,
    max_files_per_trigger: int = 1,
):
    """Streaming two-sided CUSUM over the per-batch mean — the stateful
    complement to :func:`stream_psi_monitor`: PSI alarms on
    distribution shape per batch, CUSUM accumulates small sustained
    LEVEL shifts across batches (the drift PSI's binning smooths over).
    μ is frozen from the reference frame once; slack k = k_frac·μ and
    threshold h = h_frac·μ match the batch operator
    (queries/statops.revenue_cusum_changepoints).

    State (S⁺, S⁻) lives in the monitor tier itself: each batch reads
    its PREDECESSOR row and appends its updated row, so a restart
    resumes from the stored state with no side channel. The common-path
    predecessor read is a one-row LATEST-ROW SIDECAR
    (``{out_root}/cusum_latest``, overwritten every batch) — O(1) per
    batch regardless of stream age. A full scan of the append-only tier
    (which grows one row per batch, so listing it is O(batches)) runs
    ONLY on the rare paths where the sidecar can't answer: first batch,
    a REPLAYED batch (the sidecar already holds this batch's own row —
    its predecessor must be re-read from history so the re-appended row
    is identical), or a corrupt/in-flight sidecar. Replay contract: a
    re-run batch re-reads the same predecessor and re-appends an
    IDENTICAL row — consumers keyed on batch_id (latest wins) see
    idempotent values, matching the other foreachBatch sinks'
    at-least-once semantics.
    """
    mu = float(
        reference.filter(F.col(value_col).isNotNull())
        .agg(F.round(F.avg(value_col), 4).alias("mu"))
        .first()["mu"]
    )
    k, h = k_frac * mu, h_frac * mu
    path = f"{out_root}/cusum"
    latest_path = f"{out_root}/cusum_latest"
    checkpoint = f"{out_root}/_checkpoint"

    def _predecessor(batch_id: int):
        try:
            side = spark.read.parquet(latest_path).collect()
            if len(side) == 1 and side[0]["batch_id"] < batch_id:
                return side[0]
        except Exception:
            pass  # no sidecar yet (first batch) or mid-write — fall back
        try:  # replay/restart fallback: scan the tier for the true prior
            prior = (
                spark.read.parquet(path)
                .filter(F.col("batch_id") < batch_id)
                .orderBy(F.col("batch_id").desc())
                .limit(1)
                .collect()
            )
            return prior[0] if prior else None
        except Exception:
            return None  # first batch: no tier yet

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        agg = (
            batch_df.filter(F.col(value_col).isNotNull())
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.avg(value_col), 4).alias("x"),
            )
            .first()
        )
        sp = sn = 0.0
        prior = _predecessor(batch_id)
        if prior is not None:
            sp, sn = prior["cusum_pos"], prior["cusum_neg"]
        if agg["n"]:
            x = float(agg["x"])
            sp = max(0.0, sp + x - mu - k)
            sn = max(0.0, sn + mu - x - k)
        row = spark.createDataFrame(
            [
                (
                    int(batch_id),
                    int(agg["n"] or 0),
                    float(agg["x"]) if agg["n"] else None,
                    round(sp, 4),
                    round(sn, 4),
                    bool(sp > h or sn > h),
                )
            ],
            "batch_id long, n_events long, batch_mean double, "
            "cusum_pos double, cusum_neg double, alarm boolean",
        )
        row.write.mode("append").parquet(path)
        # refresh the O(1) sidecar AFTER the tier append: if the
        # overwrite is interrupted, the fallback scan still recovers
        row.write.mode("overwrite").parquet(latest_path)

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


def stream_chi2_monitor(
    spark: SparkSession,
    src_dir: str,
    out_root: str,
    reference: DataFrame,
    *,
    category_col: str = "event_type",
    alarm_threshold: float = 9.488,  # chi2 critical, df=4, p=0.05
    max_files_per_trigger: int = 1,
):
    """Streaming chi-square mix monitor — the CATEGORICAL member of the
    drift trio (PSI watches the value distribution's shape, CUSUM the
    level, this the event-TYPE mix): the reference category shares are
    frozen once (half-count smoothed, the batch operator's convention —
    queries/scaleops.categorical_drift_chi2); every micro-batch's
    counts are tested against expected = n_batch · share_ref and the
    summed χ² statistic lands in ``{out_root}/chi2`` as
    ``(batch_id, n_events, chi2, alarm)``. Default threshold is the
    df=4 / p=0.05 critical value (5 event types in this corpus) —
    callers with other category counts pass their own.

    Per-batch cost: one grouped count of the BATCH joined against the
    ≤-categories broadcast reference — independent of stream age and
    corpus size; stateless across batches (each batch is its own test),
    so replay is trivially idempotent."""
    ref = (
        reference.groupBy(F.col(category_col).alias("cat"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_ref"))
        .localCheckpoint(eager=True)
    )
    chi_path = f"{out_root}/chi2"
    checkpoint = f"{out_root}/_checkpoint"

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        cur = batch_df.groupBy(F.col(category_col).alias("cat")).agg(
            F.count(F.lit(1)).cast("long").alias("n_cur")
        )
        joined = ref.join(cur, "cat", "full_outer").select(
            F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
            F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
        )
        tot = joined.agg(
            F.sum("n_ref").cast("double").alias("tr"),
            F.sum("n_cur").cast("double").alias("tc"),
        )
        e = (F.col("n_ref") + F.lit(0.5)) * (F.col("tc") / F.col("tr"))
        row = (
            joined.crossJoin(F.broadcast(tot))
            .agg(
                F.sum("n_cur").cast("long").alias("n_events"),
                F.round(
                    F.sum((F.col("n_cur") - e) * (F.col("n_cur") - e) / e), 4
                ).alias("chi2"),
            )
            .select(
                F.lit(batch_id).cast("long").alias("batch_id"),
                "n_events",
                "chi2",
                (F.col("chi2") > F.lit(alarm_threshold)).alias("alarm"),
            )
        )
        row.write.mode("append").parquet(chi_path)

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


def stream_conversion_monitor(
    spark: SparkSession,
    src_dir: str,
    out_root: str,
    reference: DataFrame,
    *,
    value_min: float = 130.0,
    alarm_z: float = 1.96,   # two-sided p=0.05
    max_files_per_trigger: int = 1,
):
    """Streaming CONVERSION-RATE monitor — the proportions leg of the
    drift family (PSI: value shape, CUSUM: level, χ²: category mix,
    mix-share: mixture; this: the decision metric most experiments
    ship). The reference conversion rate (high-value purchases / all
    events, value >= ``value_min`` — the engine's conversion contract,
    `conversion_rate_ztest`) is frozen once; every micro-batch is
    tested against it with the pooled two-proportion z and the sidecar
    row ``(batch_id, n_events, n_conv, rate, z, alarm)`` lands in
    ``{out_root}/conversion``. A degenerate pool (all or none
    converted in reference+batch) emits NULL z, no alarm — the batch
    operator's guard.

    Per-batch cost: one filtered count of the BATCH against two frozen
    scalars — independent of stream age. Stateless across batches, so
    a replayed batch re-appends a row IDENTICAL to its first delivery
    (the row is a deterministic function of the batch contents and the
    frozen reference) — at-least-once replay therefore duplicates
    sidecar rows rather than corrupting them, and consumers de-dup on
    ``batch_id`` (the same duplicate-row contract the CUSUM monitor
    documents; pinned by the replay test in
    tests/test_pipeline_streaming_ml.py)."""
    ref_row = (
        reference.agg(
            F.count(F.lit(1)).cast("double").alias("n_ref"),
            F.count(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("value") >= F.lit(value_min)),
                    1,
                )
            )
            .cast("double")
            .alias("c_ref"),
        )
        .localCheckpoint(eager=True)
    )
    conv_path = f"{out_root}/conversion"
    checkpoint = f"{out_root}/_checkpoint"

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        cur = batch_df.agg(
            F.count(F.lit(1)).cast("double").alias("n_cur"),
            F.count(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("value") >= F.lit(value_min)),
                    1,
                )
            )
            .cast("double")
            .alias("c_cur"),
        )
        j = cur.crossJoin(F.broadcast(ref_row))
        n_r, c_r = F.col("n_ref"), F.col("c_ref")
        n_c, c_c = F.col("n_cur"), F.col("c_cur")
        pool = (c_r + c_c) / (n_r + n_c)
        z = F.when(
            ((c_r + c_c) > 0) & ((c_r + c_c) < (n_r + n_c)) & (n_c > 0),
            F.round(
                (c_c / n_c - c_r / n_r)
                / F.sqrt(pool * (1.0 - pool) * (1.0 / n_r + 1.0 / n_c)),
                4,
            ),
        )
        row = j.select(
            F.lit(batch_id).cast("long").alias("batch_id"),
            n_c.cast("long").alias("n_events"),
            c_c.cast("long").alias("n_conv"),
            F.when(n_c > 0, F.round(c_c / n_c, 4)).alias("rate"),
            z.alias("z"),
            F.coalesce(F.abs(z) > F.lit(alarm_z), F.lit(False)).alias(
                "alarm"
            ),
        )
        row.write.mode("append").parquet(conv_path)

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


def stream_mix_monitor(
    spark: SparkSession,
    src_dir: str,
    out_root: str,
    targets: DataFrame,
    *,
    source_col: str = "source",
    text_col: str = "text",
    share_col: str = "target_share",
    drift_threshold: float = 0.05,
    max_files_per_trigger: int = 1,
):
    """Streaming temperature-mix drift monitor — the lid on the
    mixture MATERIALIZER (streaming/ingest.stream_rate_mix): the
    offline-fitted per-source target token shares (round4-pinned,
    domain_temperature_mix's output) are the contract a mixing stream
    is supposed to deliver; every micro-batch's ACHIEVED token share
    per source is measured against it and the worst absolute drift
    lands in ``{out_root}/mixshare`` as ``(batch_id, n_docs, n_tokens,
    max_share_drift, worst_source, alarm)``. A drifting mixture is the
    silent way a curated pretraining corpus rots — a source whose
    crawler stalls under-delivers its share and nothing else fails —
    so this belongs next to PSI (values), CUSUM (level) and χ² (event
    mix) in the drift quartet.

    Sources ABSENT from the batch still count (full-outer join against
    the broadcast target frame → achieved share 0 vs their target),
    and unexpected sources drift against a 0 target. Stateless per
    batch (each batch is its own audit; replay re-appends the identical
    row — the standard at-least-once/idempotent-read contract), and
    per-batch cost is one grouped count of the BATCH against a
    ≤ n_sources broadcast frame — independent of stream age."""
    tgt = targets.select(
        F.col(source_col).alias("src"),
        F.col(share_col).cast("double").alias("t_share"),
    ).localCheckpoint(eager=True)
    share_path = f"{out_root}/mixshare"
    checkpoint = f"{out_root}/_checkpoint"

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        toks = F.size(F.split(F.lower(F.col(text_col)), r"\s+"))
        cur = batch_df.groupBy(F.col(source_col).alias("src")).agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(toks).cast("long").alias("n_tok"),
        )
        joined = tgt.join(cur, "src", "full_outer").select(
            "src",
            F.coalesce("t_share", F.lit(0.0)).alias("t_share"),
            F.coalesce("n_docs", F.lit(0)).alias("n_docs"),
            F.coalesce("n_tok", F.lit(0)).alias("n_tok"),
        )
        tot = joined.agg(F.sum("n_tok").cast("double").alias("tt"))
        drift = F.abs(
            F.col("n_tok").cast("double")
            / F.greatest(F.col("tt"), F.lit(1.0))
            - F.col("t_share")
        )
        row = (
            joined.crossJoin(F.broadcast(tot))
            .agg(
                F.sum("n_docs").cast("long").alias("n_docs"),
                F.sum("n_tok").cast("long").alias("n_tokens"),
                F.round(F.max(drift), 4).alias("max_share_drift"),
                F.max(F.struct(drift.alias("d"), F.col("src"))).alias("__w"),
            )
            .select(
                F.lit(batch_id).cast("long").alias("batch_id"),
                "n_docs",
                "n_tokens",
                "max_share_drift",
                F.col("__w.src").alias("worst_source"),
                (F.col("max_share_drift") > F.lit(drift_threshold)).alias(
                    "alarm"
                ),
            )
        )
        row.write.mode("append").parquet(share_path)

    from lab3_lakehouse_spark.streaming.ingest import DOC_STREAM_SCHEMA

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


def stream_kll_quantiles(
    spark: SparkSession,
    src_dir: str,
    out_root: str,
    *,
    value_col: str = "value",
    k: int = 128,
    shards: int = 4,
    max_files_per_trigger: int = 1,
):
    """Streaming KLL quantile tier — the store-sketches-not-numbers
    design over TIME: every micro-batch reduces to its own deterministic
    KLL compactor rows (operators/sketches.kll_sketch_rollup, batch
    cost ∝ batch) appended to ``{out_root}/kll`` tagged with batch_id;
    :func:`kll_store_quantiles` then merges ALL stored sketch rows —
    metadata-sized work at any stream age — into up-to-now quantile
    estimates. This is what a number can't do (a stored p99 can't
    absorb tomorrow's data) and the reason the quantile tier stores
    compactors: any time-grain rollup (day→week→all-time) is a merge,
    never a rescan. At-least-once replay appends IDENTICAL rows:
    the shard is a data hash (pmod(xxhash64(value), shards) — NOT
    spark_partition_id, which would reassign shards under different
    file splits or executor counts) and the compactor is deterministic
    in the shard contents, so a replayed batch reproduces its rows
    byte-for-byte and consumers dedup on (batch_id, shard, level) —
    the standard foreachBatch contract."""
    checkpoint = f"{out_root}/_checkpoint"

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        kll_append_batch(
            out_root, batch_df, batch_id,
            value_col=value_col, k=k, shards=shards,
        )

    from lab3_lakehouse_spark.streaming.ingest import DOC_STREAM_SCHEMA

    schema = (
        EVENT_STREAM_SCHEMA if value_col == "value" else DOC_STREAM_SCHEMA
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(src_dir)
    )
    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def kll_append_batch(
    store_root: str,
    batch_df: DataFrame,
    batch_id: int,
    *,
    value_col: str = "value",
    k: int = 128,
    shards: int = 4,
) -> None:
    """Append one batch's KLL compactor rows to a persisted quantile
    tier — the per-micro-batch body of :func:`stream_kll_quantiles`,
    shared with batch callers and the lifecycle tests: batch cost ∝
    the batch (one rollup pass), the existing tier is never read
    (stores.append_rows), and the emitted rows are a deterministic
    function of (batch contents, batch_id) — the replay contract."""
    from lab3_lakehouse_spark import stores
    from lab3_lakehouse_spark.operators import sketches

    sk = sketches.kll_sketch_rollup(
        batch_df, [], value_col, k=k, shards=shards
    )
    stores.append_rows(
        sk.select(
            F.lit(batch_id).cast("long").alias("batch_id"),
            "__shard",
            "level",
            "items",
        ),
        store_root,
        "kll",
    )


def kll_store_quantiles(
    spark: SparkSession,
    store_root: str,
    qs: list[float],
    *,
    k: int = 128,
    shards: int = 4,
) -> DataFrame:
    """Merge every sketch row in a streaming KLL tier into up-to-now
    quantile estimates ``(q, est)``. Each (batch, shard) pair becomes
    one mergeable compactor; total input is batches·shards·k·levels
    VALUES — metadata, regardless of how much data the stream has
    absorbed. Deterministic: the same store contents always merge to
    the same estimates (shard order is pinned by the composite id)."""
    from lab3_lakehouse_spark import stores
    from lab3_lakehouse_spark.operators import sketches

    sk = stores.read_tier(spark, store_root, "kll").select(
        (F.col("batch_id") * F.lit(shards) + F.col("__shard")).alias(
            "__shard"
        ),
        "level",
        "items",
    )
    return sketches.kll_merge_quantiles(sk, [], qs, k=k)


def kll_compact_store(
    spark: SparkSession,
    src_root: str,
    dst_root: str,
    *,
    k: int = 128,
    shards: int = 4,
) -> None:
    """Disk-level GC for a streaming KLL quantile tier: fold the
    batches·shards compactor rows that per-micro-batch appends
    accumulate into ONE compactor row-set (operators/sketches.
    kll_sketch_compact — the same deterministic shard-ordered merge
    every reader runs, so estimates from the compacted tier are
    BIT-IDENTICAL), written to a NEW root per the stores.gc_write
    contract: the live tier is never mutated, swap-in is the caller's
    atomic step (:func:`lab3_lakehouse_spark.stores.swap_root`).
    Compaction touches only sketch rows — metadata-sized work at any
    stream age — and the result reads back through
    :func:`kll_store_quantiles` unchanged.

    Compacted rows are stamped ``batch_id = -1`` — a RESERVED sentinel
    no streaming writer can produce (foreachBatch batch_ids start at
    0) — so a fresh-checkpoint stream that later appends into the
    swapped-in root cannot collide with the compacted row-set: the
    reader's composite shard for the sentinel is ``-shards``, disjoint
    from every ``batch_id ≥ 0`` composite, and a SECOND compaction of
    a mixed tier maps the sentinel rows into ``[-shards, 0)`` — still
    disjoint, so compacted and raw tiers interleave freely even across
    checkpoint resets."""
    from lab3_lakehouse_spark import stores
    from lab3_lakehouse_spark.operators import sketches

    sk = stores.read_tier(spark, src_root, "kll").select(
        (F.col("batch_id") * F.lit(shards) + F.col("__shard")).alias(
            "__shard"
        ),
        "level",
        "items",
    )
    folded = sketches.kll_sketch_compact(sk, [], k=k).select(
        F.lit(-1).cast("long").alias("batch_id"),
        "__shard",
        "level",
        "items",
    )
    stores.gc_write(folded, dst_root, "kll", coalesce=1)
