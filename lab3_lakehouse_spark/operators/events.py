"""Event-stream analytics operators: debounce, sequence transitions,
first-touch funnels, cohort retention, gap-filled resampling, and
seasonal-naive anomaly ranking.

Extracted from the round-4 query bodies (queries/scaleops.py) so the
catalog queries and composed pipelines (examples/
event_analytics_pipeline.py) share one implementation. Every operator
is a pure DataFrame transformation over an event log with at least
``(id, ts, key, type)`` columns; the shapes are the one-shuffle-on-the-
sequence-key patterns that hold at 100 TB (see each docstring).

No counterpart in the reference (its 333-line ETL has no windows or
sequence analytics; SURVEY §2.7 gap surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def throttle(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    id_col: str = "event_id",
    min_gap_us: int = 300_000_000,
) -> DataFrame:
    """Debounce: drop a row when the previous RAW row of the same key
    is closer than ``min_gap_us`` microseconds — duplicate-click /
    retry-storm suppression. One LAG window on the key; the gap
    compares exact microseconds, never truncated seconds.

    Raw-predecessor semantics (deliberate — it keeps the operator one
    LAG window, and it is what the DuckDB oracle expresses): each event
    is compared to the previous event AS INGESTED, so a sustained storm
    of sub-gap events is suppressed entirely after its first event —
    the storm's own events keep resetting the clock. This differs from
    the streaming ``throttle_stream`` (dropDuplicatesWithinWatermark),
    which compares against the last KEPT event's state and re-emits
    once that state expires; the two agree exactly when bursts are
    separated by more than the gap (the planted-test regime), and they
    are cousins, not twins, in a sustained storm. A last-kept-event
    batch variant is a sessionization (segment-accumulation) problem —
    use ``session_windows``-style gap splitting and keep each
    segment's first event if true rate-limiting is needed."""
    w = Window.partitionBy(*key_cols).orderBy(ts_col, id_col)
    t = df.withColumn("__prev_ts", F.lag(ts_col).over(w))
    return t.filter(
        F.col("__prev_ts").isNull()
        | (F.unix_micros(F.col(ts_col)) - F.unix_micros(F.col("__prev_ts"))
           > F.lit(min_gap_us))
    ).drop("__prev_ts")


def transition_counts(
    df: DataFrame,
    seq_key: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition counts over per-key sequences:
    one LEAD window per key (id tie-break for equal timestamps), one
    grouped count → ``(from_type, to_type, n_transitions)``."""
    w = Window.partitionBy(seq_key).orderBy(ts_col, id_col)
    seq = df.withColumn("__next", F.lead(type_col).over(w))
    return (
        seq.filter(F.col("__next").isNotNull())
        .groupBy(
            F.col(type_col).alias("from_type"),
            F.col("__next").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )


def first_touch_stages(
    df: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-user first-touch timestamp per funnel stage via conditional
    MIN — no pivot, no self-joins; single shuffle on the user key.
    Output: ``(user_col, t_<stage>...)``."""
    return df.groupBy(user_col).agg(
        *[
            F.min(F.when(F.col(type_col) == s, F.col(ts_col))).alias(f"t_{s}")
            for s in stages
        ]
    )


def funnel_summary(df: DataFrame, stages: list[str], user_col: str = "user_id") -> DataFrame:
    """Ordered-conversion summary over a :func:`first_touch_stages`
    frame: a user converts stage k when its first touch is strictly
    after stage k-1's. One scalar agg; rates are exact integer
    divisions (round them at the presentation edge)."""
    conds = []
    cond = None
    for prev, cur in zip(stages, stages[1:]):
        step = F.col(f"t_{cur}") > F.col(f"t_{prev}")
        cond = step if cond is None else (cond & step)
        conds.append(cond)
    aggs = [
        F.count(F.lit(1)).alias("n_users"),
        F.count(f"t_{stages[0]}").alias(f"n_{stages[0]}"),
    ]
    for cur, c in zip(stages[1:], conds):
        aggs.append(F.count(F.when(c, 1)).alias(f"n_{cur}_conv"))
    return df.agg(*aggs)


def retention_cohorts(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Cohort retention triangle: users bucketed by first-seen day,
    activity counted per (cohort, day-offset) cell. Two shuffles on the
    user key. Cohort day emitted as a midnight TIMESTAMP (engine
    convention — see queries/parity.py)."""
    first_seen = df.groupBy(user_col).agg(
        F.min(F.to_date(ts_col)).alias("__cohort_day")
    )
    return (
        df.join(first_seen, user_col)
        .groupBy(
            F.col("__cohort_day").cast("timestamp").alias("cohort_day"),
            F.datediff(F.to_date(ts_col), F.col("__cohort_day"))
            .cast("long")
            .alias("day_offset"),
        )
        .agg(F.countDistinct(user_col).alias("n_users"))
    )


def gap_filled_counts(
    df: DataFrame,
    series_col: str = "event_type",
    ts_col: str = "ts",
    grain: str = "day",
    max_buckets: int = 200_000,
) -> DataFrame:
    """Gap-filled resample (the hypertable ``time_bucket_gapfill``
    pattern): every series key gets the full global bucket spine
    (observed min..max), left-joined onto real per-bucket counts with
    zero-fill. ``grain`` is ``day`` or ``hour``.

    Scale shape: the grid is O(buckets × keys) BY SEMANTICS — with a
    high-cardinality series column (user_id) that is spine×users rows,
    unavoidable for this output. What must not happen is materializing
    it driver-side or through a broadcast nested-loop: the grid is
    generated EXECUTOR-SIDE by exploding one global-bounds
    ``sequence`` per distinct-series row (the distinct frame is
    partitioned on the series key, so generation shards with it), then
    joined to the grouped counts on (bucket, series) — a keyed shuffle
    join, never a cartesian. ``max_buckets`` bounds the one genuinely
    unbounded axis: a mis-parsed 1970 timestamp would otherwise ask
    ``sequence`` for decades of hourly buckets on every row; the guard
    fails fast at plan execution with the real bucket count in the
    error instead of OOMing an executor.
    """
    step = {"day": "INTERVAL 1 DAY", "hour": "INTERVAL 1 HOUR"}[grain]
    bucket = (
        F.to_date(ts_col).cast("timestamp")
        if grain == "day"
        else F.date_trunc("hour", F.col(ts_col))
    )
    bounds = df.agg(
        F.date_trunc(grain, F.min(ts_col)).alias("b0"),
        F.date_trunc(grain, F.max(ts_col)).alias("b1"),
    )
    per_grain_sec = {"day": 86400, "hour": 3600}[grain]
    n_buckets = (
        F.unix_timestamp("b1") - F.unix_timestamp("b0")
    ) / F.lit(per_grain_sec) + F.lit(1)
    # the guard is folded into b1 itself (not a side column a projection
    # would prune away): sequence() can't evaluate without tripping it.
    # Null-safe on purpose: an EMPTY input has NULL min/max bounds, so
    # the condition must pass them through (sequence(NULL, NULL) is NULL,
    # explode(NULL) yields no rows → empty result) instead of falling
    # into the raise_error branch with a NULL-concat message.
    guarded = bounds.select(
        "b0",
        F.when(
            n_buckets.isNull() | (n_buckets <= F.lit(max_buckets)), F.col("b1")
        )
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        f"gap_filled_counts: spine would exceed max_buckets="
                        f"{max_buckets} ({grain} buckets: "
                    ),
                    n_buckets.cast("long").cast("string"),
                    F.lit("); check timestamp bounds or raise max_buckets"),
                )
            ).cast("timestamp")
        )
        .alias("b1"),
    )
    series = df.select(series_col).distinct()
    # per-series explode of the (broadcast, 1-row) bounds: grid rows are
    # born on the executors holding the series keys — no crossJoin, no
    # driver materialization, shards with series cardinality
    grid = series.join(F.broadcast(guarded), how="cross").select(
        series_col,
        F.explode(F.sequence("b0", "b1", F.expr(step))).alias("bucket"),
    )
    counts = df.groupBy(bucket.alias("bucket"), series_col).agg(
        F.count(F.lit(1)).alias("__n")
    )
    return grid.join(counts, ["bucket", series_col], "left").select(
        "bucket", series_col, F.coalesce("__n", F.lit(0)).alias("n_events")
    )


def seasonal_residual_topk(
    hourly: DataFrame,
    series_col: str = "event_type",
    bucket_col: str = "bucket",
    n_col: str = "n_events",
    lag_buckets: int = 24,
    k: int = 5,
) -> DataFrame:
    """Seasonal-naive anomaly ranking over a gap-filled bucket frame:
    each bucket's count vs the count ``lag_buckets`` earlier (on a
    gap-filled grid the lag really is "same hour yesterday"), top-k
    absolute residuals per series. Integer-only arithmetic — the
    ranking can never flip on a float boundary."""
    w = Window.partitionBy(series_col).orderBy(bucket_col)
    lagged = hourly.withColumn(
        "baseline_n", F.lag(n_col, lag_buckets).over(w)
    ).filter(F.col("baseline_n").isNotNull())
    wr = Window.partitionBy(series_col).orderBy(
        F.abs(F.col(n_col) - F.col("baseline_n")).desc(), F.col(bucket_col)
    )
    return (
        lagged.withColumn("residual", F.col(n_col) - F.col("baseline_n"))
        .withColumn("rank", F.row_number().over(wr).cast("long"))
        .filter(F.col("rank") <= k)
    )


def value_drift_psi(
    ev: DataFrame,
    *,
    split_ts: str,
    value_col: str = "value",
    ts_col: str = "ts",
    n_buckets: int = 10,
    bucket_width: float = 50.0,
) -> DataFrame:
    """Population Stability Index inputs for the ``value_col``
    distribution, reference period (before ``split_ts``) vs current —
    per-bucket rows ``(bucket, n_ref, n_cur, p_ref, p_cur, psi_term)``
    with UNROUNDED floats (query layer applies the round4 policy).

    Cut points are constants (``bucket_width``-wide, capped at
    ``n_buckets``), so bucketing is a scan-side expression — no
    quantile pre-pass; shares are smoothed ``(n + ½)/(N + ½·B)`` to
    keep ln finite on empty buckets. Values are clamped into
    ``[0, n_buckets-1]`` from BOTH sides — negative values land in
    bucket 0 rather than silently vanishing from the PSI denominator
    (the spine join would otherwise exclude bucket −1 from counts and
    totals alike). Sum of psi_term ≥ 0.2 is the conventional drift
    alarm; the per-bucket attribution is what you debug with."""
    spark = ev.sparkSession
    graded = ev.filter(F.col(value_col).isNotNull()).select(
        (F.col(ts_col) < F.lit(split_ts).cast("timestamp")).alias("is_ref"),
        F.greatest(
            F.lit(0),
            F.least(
                F.lit(n_buckets - 1),
                F.floor(F.col(value_col) / F.lit(float(bucket_width))),
            ),
        ).cast("long").alias("bucket"),
    )
    counts = graded.groupBy("bucket").agg(
        F.sum(F.when(F.col("is_ref"), 1).otherwise(0)).alias("n_ref"),
        F.sum(F.when(F.col("is_ref"), 0).otherwise(1)).alias("n_cur"),
    )
    spine = spark.range(n_buckets).select(F.col("id").alias("bucket"))
    filled = (
        spine.join(counts, "bucket", "left")
        .select(
            "bucket",
            F.coalesce(F.col("n_ref"), F.lit(0)).alias("n_ref"),
            F.coalesce(F.col("n_cur"), F.lit(0)).alias("n_cur"),
        )
        .localCheckpoint(eager=False)
    )
    tot = filled.agg(
        F.sum("n_ref").cast("double").alias("tot_ref"),
        F.sum("n_cur").cast("double").alias("tot_cur"),
    )
    smooth = 0.5 * n_buckets
    pa = (F.col("n_ref").cast("double") + F.lit(0.5)) / (
        F.col("tot_ref") + F.lit(smooth)
    )
    pb = (F.col("n_cur").cast("double") + F.lit(0.5)) / (
        F.col("tot_cur") + F.lit(smooth)
    )
    return filled.crossJoin(F.broadcast(tot)).select(
        "bucket",
        "n_ref",
        "n_cur",
        pa.alias("p_ref"),
        pb.alias("p_cur"),
        ((pa - pb) * F.log(pa / pb)).alias("psi_term"),
    )


def interval_coverage(
    df: DataFrame,
    *,
    key_col: str,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Per-key interval UNION: merge overlapping/touching intervals and
    report ``(key, n_intervals, n_segments, covered_s)`` — total
    covered seconds after de-overlapping. The complement of the
    interval-overlap JOIN already in the kit: coverage answers "how
    long was the user actually active / the device actually up",
    where naively summing durations double-counts overlaps.

    Classic sweep as two PARTITIONED windows (both keyed on ``key_col``
    — one shuffle total): a running max of previous interval ends
    marks each row that starts a new disjoint segment, the running sum
    of those marks numbers the segments, and a grouped min/max per
    segment yields exact merged spans. Endpoints are exact integer
    microseconds (``unix_micros``) so lengths are integers until one
    final division."""
    from pyspark.sql import Window

    s = F.unix_micros(F.col(start_col))
    e = F.unix_micros(F.col(end_col))
    w = Window.partitionBy("key").orderBy("__s", "__e")
    prev_end = F.max("__e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    rows = (
        df.select(F.col(key_col).alias("key"), s.alias("__s"), e.alias("__e"))
        .withColumn(
            "__new",
            F.when(
                prev_end.isNull() | (F.col("__s") > prev_end), 1
            ).otherwise(0),
        )
        .withColumn(
            "__seg",
            F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    segs = rows.groupBy("key", "__seg").agg(
        F.count(F.lit(1)).alias("__n"),
        F.min("__s").alias("__ss"),
        F.max("__e").alias("__se"),
    )
    return segs.groupBy("key").agg(
        F.sum("__n").alias("n_intervals"),
        F.count(F.lit(1)).alias("n_segments"),
        (
            F.sum(F.col("__se") - F.col("__ss")).cast("double") / F.lit(1e6)
        ).alias("covered_s"),
    )


def inter_event_burstiness(
    ev: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    min_events: int = 3,
) -> DataFrame:
    """Per-user inter-event-time statistics + the Goh–Barabási
    burstiness coefficient B = (σ−μ)/(σ+μ) over the user's gap
    distribution: B → −1 for a metronome (periodic polling / bots),
    ≈ 0 for a Poisson process, → +1 for bursty human sessions — the
    one-number separator of organic vs automated activity, and a
    rate-model sanity check (μ is the MLE of the exponential mean).

    Emits ``(user, n_events, mean_gap_s, std_gap_s, burstiness)`` for
    users with ≥ ``min_events`` events (≥ 2 gaps, else σ is
    degenerate); population σ (``stddev_pop``). B is guarded to 0.0
    when σ+μ = 0 (all gaps zero).

    Scale: gaps come from ONE user-partitioned lag window (the shuffle
    key is the same user key the aggregation needs — one shuffle
    total), stats are a grouped agg; nothing global, state is O(users).
    """
    from pyspark.sql import Window

    w = Window.partitionBy("user").orderBy("__ts")
    # gaps via EXACT integer microseconds (unix_micros both engines):
    # the int difference is exact, and µs/1e6 is one correctly-rounded
    # IEEE division — bit-identical cross-engine, where subtracting two
    # epoch doubles could differ in the low bits.
    gaps = (
        ev.select(F.col(user_col).alias("user"), F.col(ts_col).alias("__ts"))
        .withColumn("__prev", F.lag("__ts").over(w))
        .withColumn(
            "gap_s",
            (
                F.unix_micros(F.col("__ts")) - F.unix_micros(F.col("__prev"))
            ).cast("double")
            / F.lit(1e6),
        )
    )
    stats = gaps.groupBy("user").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.avg("gap_s").alias("mu"),
        F.stddev_pop("gap_s").alias("sigma"),
    )
    b = F.when(
        (F.col("sigma") + F.col("mu")) > 0,
        (F.col("sigma") - F.col("mu")) / (F.col("sigma") + F.col("mu")),
    ).otherwise(F.lit(0.0))
    return stats.filter(F.col("n_events") >= min_events).select(
        "user",
        "n_events",
        F.col("mu").alias("mean_gap_s"),
        F.col("sigma").alias("std_gap_s"),
        b.alias("burstiness"),
    )


def value_drift_ks(
    ev: DataFrame,
    *,
    split_ts: str,
    value_col: str = "value",
    ts_col: str = "ts",
    n_buckets: int = 64,
) -> DataFrame:
    """EXACT two-sample Kolmogorov–Smirnov statistic of the
    ``value_col`` distribution, reference period (before ``split_ts``)
    vs current: sup over observed values of |F_ref(x) − F_cur(x)|.
    The complement of :func:`value_drift_psi` — PSI is binned (blind
    to within-bucket shifts) while KS is the exact strongest
    single-point CDF gap, the standard nonparametric drift test.

    One row out: ``(n_ref, n_cur, ks_stat, at_value)`` with
    ``at_value`` the (smallest) value attaining the sup.

    Scale: the naive form is a running sum over a GLOBAL value
    ordering — the un-partitioned-window anti-pattern. This uses the
    two-phase trick of ``operators/windows.global_row_number``: the
    distinct-value frame is range-bucketed by one approx_percentile
    pass (error only skews bucket SIZES, never correctness), cumsums
    run per-bucket (partitioned window), and each bucket adds the
    broadcast prefix total of its predecessors (≤ ``n_buckets`` rows).
    The final sup is a TakeOrdered over the distinct-value frame. The
    CDF doubles are bit-identical cross-engine: integer cumsums ≤ 2⁵³
    through one correctly-rounded IEEE division each."""
    from pyspark.sql import Window

    counts = (
        ev.filter(F.col(value_col).isNotNull())
        .select(
            (F.col(ts_col) < F.lit(split_ts).cast("timestamp")).alias("is_ref"),
            F.col(value_col).cast("double").alias("v"),
        )
        .groupBy("v")
        .agg(
            F.sum(F.when(F.col("is_ref"), 1).otherwise(0)).alias("n_ref"),
            F.sum(F.when(F.col("is_ref"), 0).otherwise(1)).alias("n_cur"),
        )
        .localCheckpoint(eager=False)
    )
    probs = F.array(*[F.lit(i / n_buckets) for i in range(1, n_buckets)])
    cuts = counts.agg(
        F.approx_percentile(F.col("v"), probs, F.lit(10000)).alias("__cuts")
    )
    bucketed = (
        counts.crossJoin(F.broadcast(cuts))
        .withColumn(
            "__b",
            F.aggregate(
                F.col("__cuts"),
                F.lit(0),
                lambda acc, c: acc + F.when(F.col("v") > c, 1).otherwise(0),
            ),
        )
        .drop("__cuts")
    )
    w_off = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        bucketed.groupBy("__b")
        .agg(F.sum("n_ref").alias("__br"), F.sum("n_cur").alias("__bc"))
        .select(
            "__b",
            F.coalesce(F.sum("__br").over(w_off), F.lit(0)).alias("__offr"),
            F.coalesce(F.sum("__bc").over(w_off), F.lit(0)).alias("__offc"),
        )
    )
    w_in = (
        Window.partitionBy("__b")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tot = counts.agg(
        F.sum("n_ref").cast("double").alias("__tr"),
        F.sum("n_cur").cast("double").alias("__tc"),
    )
    cum = (
        bucketed.join(F.broadcast(offsets), "__b")
        .select(
            "v",
            (F.sum("n_ref").over(w_in) + F.col("__offr")).alias("__cr"),
            (F.sum("n_cur").over(w_in) + F.col("__offc")).alias("__cc"),
        )
        .crossJoin(F.broadcast(tot))
    )
    diff = F.abs(
        F.col("__cr").cast("double") / F.col("__tr")
        - F.col("__cc").cast("double") / F.col("__tc")
    )
    # KS is undefined when either sample is empty (the CDF ratio is
    # 0/0): emit NO row rather than a NaN that would sort above every
    # real statistic under desc
    cum = cum.filter((F.col("__tr") > 0) & (F.col("__tc") > 0))
    return (
        cum.select(
            F.col("__tr").cast("long").alias("n_ref"),
            F.col("__tc").cast("long").alias("n_cur"),
            diff.alias("ks_stat"),
            F.col("v").alias("at_value"),
        )
        .orderBy(F.desc("ks_stat"), F.asc("at_value"))
        .limit(1)
    )


def daily_user_novelty(
    ev: DataFrame, *, user_col: str = "user_id", ts_col: str = "ts"
) -> DataFrame:
    """New-vs-returning users per day via a first-seen DIMENSION (one
    grouped min per user, joined back) — the scale-safe form of the
    "cumulative distinct" ask: both aggregations shard on the user key
    and no running-distinct state accumulates. Emits ``(day, n_active,
    n_new, novelty_rate)`` with the rate unrounded."""
    day = F.date_trunc("day", F.col(ts_col))
    first_seen = ev.groupBy(user_col).agg(F.min(day).alias("d0"))
    graded = ev.select(day.alias("day"), user_col).join(first_seen, user_col)
    return (
        graded.groupBy("day")
        .agg(
            F.countDistinct(user_col).alias("n_active"),
            F.countDistinct(
                F.when(F.col("day") == F.col("d0"), F.col(user_col))
            ).alias("n_new"),
        )
        .select(
            F.col("day").cast("timestamp").alias("day"),
            "n_active",
            "n_new",
            (
                F.col("n_new").cast("double") / F.col("n_active").cast("double")
            ).alias("novelty_rate"),
        )
    )
