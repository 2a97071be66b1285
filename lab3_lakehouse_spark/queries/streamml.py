"""Streaming and ML queries (SURVEY §7 steps 7-8).

The streaming queries ARE oracle-checked: with
``Trigger.AvailableNow`` + complete output mode, Structured Streaming
processes every file currently in the source and emits the full
aggregate — semantically identical to the batch query (Spark's unified
API guarantee), so the batch oracles apply verbatim (tumbling counts,
session gaps-and-islands). RF training uses an assert-style oracle
(row totals + split/metric sanity booleans — model internals aren't
SQL); stream-vs-batch and metric assertions also live in
tests/test_pipeline_streaming_ml.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lab3_lakehouse_spark.ml import regression as ml
from lab3_lakehouse_spark.queries.registry import query
from lab3_lakehouse_spark.queries._util import round4, sql_round4
from lab3_lakehouse_spark.session import tune_session
from lab3_lakehouse_spark.streaming import windows as sw


@query(
    "streaming_tumbling_hourly",
    oracle=f"""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           count(*)                           AS n_events,
           {sql_round4('sum(value)')}         AS sum_value
    FROM events
    GROUP BY 1
    """,
)
def streaming_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling window over ``events`` as a FILE STREAM (readStream →
    window agg → memory sink, AvailableNow). Matches the batch oracle
    exactly — the unified-API parity the engine's streaming tier relies
    on."""
    tune_session(spark)
    agg = (
        sw.stream_events(spark, sf_dir)
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            round4(F.sum("value")).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "sum_value")
    )
    return sw.run_to_memory(agg, spark, output_mode="complete")


@query(
    "sliding_window_counts",
    oracle=f"""
    WITH buckets AS (
        SELECT time_bucket(INTERVAL '30 minutes', ts) AS w, value FROM events
        UNION ALL
        SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes' AS w,
               value
        FROM events
    )
    SELECT w                           AS window_start,
           count(*)                    AS n_events,
           {sql_round4('sum(value)')}  AS sum_value
    FROM buckets
    GROUP BY w
    """,
)
def sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding event-time windows (1 h window, 30 min slide) in batch:
    each event expands into window/slide = 2 buckets. The oracle builds
    the same expansion as a UNION ALL of the two shifted 30-min grids —
    both engines align sub-day buckets on :00/:30 boundaries."""
    tune_session(spark)
    from lab3_lakehouse_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            round4(F.sum("value")).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "sum_value")
    )


@query(
    "streaming_session_windows",
    oracle=f"""
    WITH gaps AS (
        SELECT user_id, ts, value,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         < INTERVAL '30 minutes'
                    THEN 0 ELSE 1 END AS new_session
        FROM events
    ), sessions AS (
        SELECT user_id, ts, value,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS session_id
        FROM gaps
    )
    SELECT user_id,
           min(ts)                          AS session_start,
           max(ts) + INTERVAL '30 minutes'  AS session_end,
           count(*)                         AS n_events,
           {sql_round4('sum(value)')}       AS session_value
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def streaming_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows (30-min gap) on the event STREAM,
    drained with AvailableNow — oracle-checked against the batch
    gaps-and-islands SQL (the same oracle that proves the batch
    ``session_window`` semantics; Spark session end = last event + gap).
    Stream-vs-batch equality is additionally asserted in tests."""
    tune_session(spark)
    agg = sw.session_windows(sw.stream_events(spark, sf_dir), gap="30 minutes")
    res = sw.run_to_memory(agg, spark, output_mode="complete")
    return res.select(
        "user_id", "session_start", "session_end", "n_events",
        round4(F.col("session_value")).alias("session_value"),
    )


@query(
    "streaming_dedup_users",
    oracle="""
    SELECT event_type, count(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY event_type
    """,
)
def streaming_dedup_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact deduplication (streaming/joins.py:dedup_stream):
    first occurrence of each (user_id, event_type) wins, watermark
    bounds the dedup state — THE mechanism that makes exactly-once
    per-key semantics affordable on an infinite stream (state is
    O(keys inside the watermark horizon), not O(stream)).

    Which physical row survives depends on micro-batch arrival order,
    so the query aggregates to an arrival-order-independent result
    (distinct users per event type) that the batch oracle checks
    exactly. The watermark is sized past the corpus's event-time span
    so AvailableNow drains every key (late-data eviction semantics are
    unit-tested in tests/test_pipeline_streaming_ml.py)."""
    tune_session(spark)
    from lab3_lakehouse_spark.streaming.joins import dedup_stream

    deduped = dedup_stream(
        sw.stream_events(spark, sf_dir),
        keys=["user_id", "event_type"],
        watermark="720 hours",
    )
    agg = deduped.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_users")
    )
    return sw.run_to_memory(agg, spark, output_mode="complete")


@query(
    "streaming_static_enrichment",
    oracle="""
    SELECT c.c_mktsegment AS segment, count(*) AS n_events
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def streaming_static_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join — the third Structured Streaming join mode
    (besides stream-stream interval join and windowed aggs): each
    micro-batch of the event stream is enriched against a BATCH
    dimension table, no state store involved (the static side is just
    re-planned per batch; at scale it broadcasts). Aggregated per
    segment so the result is micro-batch-partition independent; the
    batch oracle applies verbatim."""
    tune_session(spark)
    from lab3_lakehouse_spark.catalog import load_table

    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), F.col("c_mktsegment").alias("segment")
    )
    enriched = sw.stream_events(spark, sf_dir).join(dim, "user_id")
    agg = enriched.groupBy("segment").agg(F.count(F.lit(1)).alias("n_events"))
    return sw.run_to_memory(agg, spark, output_mode="complete")


@query(
    "streaming_purchase_view_join",
    oracle="""
    SELECT p.event_id AS p_id, v.event_id AS v_id
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id
     AND v.ts <= p.ts AND v.ts >= p.ts - INTERVAL 1 HOUR
    """,
)
def streaming_purchase_view_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM interval join (purchases ⋈ views within 1 h, per
    user), drained with AvailableNow — equals the batch interval-join
    SQL, so it is oracle-checked like a batch query. Watermarks on both
    sides bound the join state at scale."""
    tune_session(spark)
    from lab3_lakehouse_spark.streaming import joins as sj

    ev = sw.stream_events(spark, sf_dir)
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("p_id")
    )
    v = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("v_id")
    )
    joined = sj.interval_join(p, v, key="user_id", lookback="1 hour").select(
        F.col("l.p_id").alias("p_id"), F.col("r.v_id").alias("v_id")
    )
    return sw.run_to_memory(joined, spark, output_mode="append")


@query(
    "streaming_stateful_user_totals",
    oracle=f"""
    SELECT user_id,
           {sql_round4('sum(value)')} AS total_value,
           count(*)                   AS n_events,
           max(ts)                    AS last_ts
    FROM events
    GROUP BY user_id
    """,
)
def streaming_stateful_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSTOM STATEFUL streaming operator (applyInPandasWithState):
    per-user running totals over the event stream, update mode. The
    state transition is arbitrary Python over Arrow batches; Spark owns
    partitioning (state shards with its key), checkpointing, recovery.

    Oracle-checked with a REAL oracle: after draining the stream
    (AvailableNow), the latest emission per user — update mode re-emits
    a key each batch it's touched, and n_events is cumulative, so max
    n_events IS the final state — must equal the batch per-user
    aggregate. This is the streaming≡batch contract for user-defined
    state, same as the built-in window queries above."""
    tune_session(spark)
    from pyspark.sql import Window

    from lab3_lakehouse_spark.streaming import stateful

    upd = stateful.running_user_totals(sw.stream_events(spark, sf_dir))
    res = sw.run_to_memory(upd, spark, output_mode="update")
    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        res.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            "user_id",
            round4(F.col("total_value")).alias("total_value"),
            "n_events",
            "last_ts",
        )
    )


@query(
    "ml_feature_table",
    oracle=f"""
    WITH gold AS (
        SELECT user_id,
               CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               {sql_round4('sum(value)')}               AS daily_revenue,
               count(*)                                 AS trip_count,
               {sql_round4('avg(value)')}               AS avg_value
        FROM events
        GROUP BY user_id, date_trunc('day', ts)
    )
    SELECT CAST(user_id AS DOUBLE)             AS user_id_f,
           CAST((dayofweek(day) + 6) % 7 AS DOUBLE) AS day_of_week,
           CAST(month(day) AS DOUBLE)          AS month,
           CAST(trip_count AS DOUBLE)          AS trip_count,
           CAST(avg_value AS DOUBLE)           AS avg_value,
           CAST(daily_revenue AS DOUBLE)       AS label
    FROM gold
    """,
)
def ml_feature_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1 feature derivation, distributed — including the deliberate
    pandas day-of-week convention (Monday=0; Spark dayofweek is
    1=Sunday, DuckDB's is 0=Sunday — both sides convert)."""
    tune_session(spark)
    from lab3_lakehouse_spark.queries.parity import daily_revenue

    return ml.revenue_features(daily_revenue(spark, sf_dir))


@query(
    "ml_rf_metrics",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_total,
           true AS split_ok, true AS metrics_ok
    FROM (SELECT user_id, date_trunc('day', ts) AS d FROM events GROUP BY 1, 2)
    """,
)
def ml_rf_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M2+M3: seeded 80/20 split + RandomForest(20 trees) + MAE/RMSE/R²,
    fully in spark.ml (the reference's sklearn exit, de-single-noded).

    Assert-style oracle: model internals aren't SQL, so the query emits
    the feature-row total (SQL-checkable: split halves must add back up
    to the gold-table row count) plus booleans for the seeded-split
    fraction and metric sanity (finite, rmse ≥ mae > 0, r² ≤ 1)."""
    import math

    tune_session(spark)
    feats = ml_feature_table(spark, sf_dir)
    r = ml.train_random_forest(feats)
    n_total = r.n_train + r.n_test
    split_ok = 0.75 <= r.n_train / n_total <= 0.85
    metrics_ok = (
        all(math.isfinite(m) for m in (r.mae, r.rmse, r.r2))
        and r.rmse >= r.mae > 0
        and r.r2 <= 1.0
    )
    return spark.createDataFrame(
        [(n_total, bool(split_ok), bool(metrics_ok))],
        "n_total long, split_ok boolean, metrics_ok boolean",
    )
