"""Temporal / interval join queries: as-of join and binned range join
(operators Spark lacks natively — SURVEY §2.7 extension surface,
"custom operators" built as compositions of stock DataFrame ops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lab3_lakehouse_spark.catalog import load_table
from lab3_lakehouse_spark.operators import joins as join_ops
from lab3_lakehouse_spark.queries.registry import query
from lab3_lakehouse_spark.queries._util import round4, sql_round4
from lab3_lakehouse_spark.session import tune_session

#: price bands for the range-join demo — deliberately non-uniform so the
#: binned implementation is exercised across bin boundaries.
PRICE_BANDS: tuple[tuple[str, float, float], ...] = (
    ("budget", 0.0, 30_000.0),
    ("mid", 30_000.0, 100_000.0),
    ("premium", 100_000.0, 250_000.0),
    ("luxury", 250_000.0, 500_001.0),
)

_BANDS_SQL = ", ".join(f"('{n}', {lo}, {hi})" for n, lo, hi in PRICE_BANDS)


@query(
    "asof_purchase_last_view",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts AS purchase_ts, p.value AS purchase_value,
           v.ts AS view_ts_asof
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND v.ts <= p.ts
    """,
)
def asof_purchase_last_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: each purchase gets the latest prior view by
    the same user (attribution-style). One shuffle on user_id via the
    union + carry-forward pattern — no join fan-out (operators/joins.py
    asof_join)."""
    tune_session(spark)
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts", "value"
    )
    views = ev.filter(F.col("event_type") == "view").select("user_id", "ts")
    out = join_ops.asof_join(
        purchases, views, key="user_id", left_ts="ts", right_ts="ts",
        right_cols=[], suffix="_view",
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
        F.col("ts_view").alias("view_ts_asof"),
    )


@query(
    "asof_view_next_purchase",
    oracle="""
    WITH v AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'
    ), p AS (
        SELECT user_id, ts, value, event_id AS p_eid
        FROM events WHERE event_type = 'purchase'
    ), m AS (
        SELECT v.event_id, v.user_id, v.ts,
               p.ts AS p_ts, p.value AS p_value,
               row_number() OVER (PARTITION BY v.event_id
                                  ORDER BY p.ts, p.p_eid) AS rn
        FROM v LEFT JOIN p ON p.user_id = v.user_id AND p.ts >= v.ts
    )
    SELECT event_id, user_id, ts AS view_ts,
           p_ts AS next_purchase_ts,
           p_value AS next_purchase_value,
           CAST(date_diff('second', ts, p_ts) AS BIGINT)
               AS seconds_to_convert
    FROM m WHERE rn = 1
    """,
)
def asof_view_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join (operators/joins.asof_join_forward): each
    view gets the EARLIEST subsequent purchase by the same user — the
    time-to-convert attribution that the backward as-of
    (asof_purchase_last_view) can't express. Same union +
    carry pattern mirrored to ``first(ignorenulls) over (current →
    partition end)``: ONE shuffle on user_id, zero join fan-out (the
    oracle's inequality join + row_number is the semantic twin; at
    scale it would explode to |views|·|purchases| per user before the
    rank cut). Equal-timestamp purchases are pinned by event_id
    (``right_order``) so both engines pick the identical row."""
    tune_session(spark)
    ev = load_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "event_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value", F.col("event_id").alias("p_eid")
    )
    out = join_ops.asof_join_forward(
        views, purchases, key="user_id", left_ts="ts", right_ts="ts",
        right_cols=["value"], suffix="_next", right_order="p_eid",
    )
    secs = (
        F.unix_timestamp("ts_next") - F.unix_timestamp("ts")
    ).cast("long")
    return out.select(
        "event_id",
        "user_id",
        F.col("ts").alias("view_ts"),
        F.col("ts_next").alias("next_purchase_ts"),
        F.col("value_next").alias("next_purchase_value"),
        secs.alias("seconds_to_convert"),
    )


@query(
    "window_trailing_1h_sum",
    oracle=f"""
    SELECT user_id, event_id, ts,
           {sql_round4('''sum(value) OVER (
               PARTITION BY user_id ORDER BY ts
               RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)''')}
               AS trailing_1h_value
    FROM events
    """,
)
def window_trailing_1h_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window frame (trailing 1-hour sum per user) — the
    moving-aggregate family ROWS frames can't express when events are
    irregularly spaced. Spark takes range bounds as longs, so the
    ordering key is epoch MICROSECONDS (``unix_micros``): event
    timestamps carry fractional seconds, and a seconds-truncated key
    shifts the frame boundary by up to 1s relative to the oracle's
    full-precision INTERVAL frame (observed as a real mismatch at
    sf0.1 density). The emitted ts stays a timestamp."""
    tune_session(spark)
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    spec = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        round4(F.sum("value").over(spec)).alias("trailing_1h_value"),
    )


@query(
    "salted_join_lineitem_supplier",
    oracle=f"""
    SELECT l.l_orderkey, l.l_linenumber, s.s_name,
           {sql_round4('sum(l_extendedprice)')} AS price_sum
    FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
    GROUP BY l.l_orderkey, l.l_linenumber, s.s_name
    """,
)
def salted_join_lineitem_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted join, oracle-checked against the PLAIN join SQL —
    proving salting is a pure physical rewrite (identical results, hot
    keys spread across salt_buckets reducers)."""
    tune_session(spark)
    from lab3_lakehouse_spark.operators.joins import skew_salted_join

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_suppkey", "l_extendedprice"
    )
    sup = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_name"
    )
    joined = skew_salted_join(li, sup, on="l_suppkey", salt_buckets=8)
    return joined.groupBy("l_orderkey", "l_linenumber", "s_name").agg(
        round4(F.sum("l_extendedprice")).alias("price_sum")
    )


@query(
    "range_join_price_bands",
    oracle=f"""
    SELECT band,
           count(*)                          AS n_orders,
           {sql_round4('avg(o_totalprice)')} AS avg_price
    FROM orders
    JOIN (VALUES {_BANDS_SQL}) AS bands(band, lo, hi)
      ON o_totalprice >= lo AND o_totalprice < hi
    GROUP BY band
    """,
)
def range_join_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval range join as a binned equi-join (no
    nested-loop): orders classified into non-uniform price bands, then
    aggregated."""
    tune_session(spark)
    orders = load_table(spark, sf_dir, "orders")
    bands = spark.createDataFrame(list(PRICE_BANDS), ["band", "lo", "hi"])
    joined = join_ops.binned_range_join(
        orders.select("o_orderkey", "o_totalprice"),
        bands,
        point_col="o_totalprice",
        lo_col="lo",
        hi_col="hi",
        bin_width=25_000.0,
    )
    return joined.groupBy("band").agg(
        F.count(F.lit(1)).alias("n_orders"),
        round4(F.avg("o_totalprice")).alias("avg_price"),
    )
