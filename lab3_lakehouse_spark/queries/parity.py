"""Reference-parity queries: the medallion workload of
``mavikulov/Lab3-Lakehouse`` re-expressed over the synthetic corpus
(FIXTURES.md maps taxi columns → events/lineitem columns).

Determinism-for-differential-testing conventions used throughout the
catalog:

- aggregate doubles are rounded with ``_util.round4`` on BOTH sides
  (same IEEE expression in both engines) — partial-agg summation order
  differs from DuckDB's sequential order at ~1e-12 relative, and plain
  ``round()`` half-way semantics differ between engines;
- pure row-level arithmetic is NOT rounded — identical IEEE expression
  trees give bit-identical doubles;
- date/time parts are cast to ``long`` (DuckDB returns BIGINT); no
  query emits a DATE column (DuckDB's DATE becomes datetime64 via
  pandas while Spark's stays ``date`` — always emit TIMESTAMP);
- every computed column is aliased identically in Spark and SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lab3_lakehouse_spark.catalog import load_table
from lab3_lakehouse_spark.operators import aggregate as agg_ops
from lab3_lakehouse_spark.operators import quality as quality_ops
from lab3_lakehouse_spark.queries.registry import query
from lab3_lakehouse_spark.queries._util import round4, sql_round4
from lab3_lakehouse_spark.session import tune_session


# --- A1: daily revenue (etl_pipeline.py:107-116, generalized) -------------

@query(
    "daily_revenue",
    oracle=f"""
    SELECT user_id,
           CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           {sql_round4('sum(value)')}               AS daily_revenue,
           count(*)                                 AS trip_count,
           {sql_round4('avg(value)')}               AS avg_value
    FROM events
    GROUP BY user_id, date_trunc('day', ts)
    """,
)
def daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2.4 A1: grouped multi-agg with a truncated-time expression
    key. One partial+final hash aggregate; scales with group cardinality."""
    tune_session(spark)
    ev = load_table(spark, sf_dir, "events")
    out = agg_ops.time_bucketed_agg(
        ev,
        group_cols=["user_id"],
        ts_col="ts",
        grain="day",
        aggs=[
            round4(F.sum("value")).alias("daily_revenue"),
            F.count(F.lit(1)).alias("trip_count"),
            round4(F.avg("value")).alias("avg_value"),
        ],
        bucket_name="day",
    )
    return out


# --- A2: hourly demand (etl_pipeline.py:130-136, generalized) -------------

@query(
    "hourly_demand",
    oracle=f"""
    SELECT event_type,
           hour(ts)                   AS hour_of_day,
           count(*)                   AS trip_count,
           {sql_round4('avg(value)')} AS avg_value
    FROM events
    GROUP BY event_type, hour(ts)
    """,
)
def hourly_demand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2.4 A2: grouped agg keyed on an extracted time part."""
    tune_session(spark)
    ev = load_table(spark, sf_dir, "events")
    out = agg_ops.time_part_agg(
        ev,
        group_cols=["event_type"],
        ts_col="ts",
        part="hour",
        aggs=[
            F.count(F.lit(1)).alias("trip_count"),
            round4(F.avg("value")).alias("avg_value"),
        ],
        part_name="hour_of_day",
    )
    return out.withColumn("hour_of_day", F.col("hour_of_day").cast("long"))


# --- F1/F2: conjunctive quality filter incl. column-vs-column -------------

def _lineitem_quality_preds():
    revenue = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return {
        "nonpos_quantity": F.col("l_quantity") > 0,
        "nonpos_price": F.col("l_extendedprice") > 0,
        "disc_range": (F.col("l_discount") >= 0) & (F.col("l_discount") <= 0.5),
        # column-vs-column predicate, mirroring utils.py:32 (pickup < dropoff)
        "tax_lt_price": F.col("l_tax") < F.col("l_extendedprice"),
        # range filter on a derived column, mirroring utils.py:43-46
        "revenue_range": (revenue > 0) & (revenue < 1_000_000),
    }


_QUALITY_WHERE = """
        l_quantity > 0
        AND l_extendedprice > 0
        AND l_discount >= 0 AND l_discount <= 0.5
        AND l_tax < l_extendedprice
        AND (l_extendedprice * (1.0 - l_discount)) > 0
        AND (l_extendedprice * (1.0 - l_discount)) < 1000000
"""


@query(
    "quality_filter",
    oracle=f"""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount,
           l_tax, l_extendedprice * (1.0 - l_discount) AS revenue
    FROM lineitem
    WHERE {_QUALITY_WHERE}
    """,
)
def quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2.3 F1+F2: conjunctive positivity/range filter with a
    column-vs-column term and a derived-column range term. Predicates are
    pushed to the parquet scan by Catalyst (verified in tests via
    plans.explain_has_pushed_filters)."""
    tune_session(spark)
    li = load_table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    out = quality_ops.conjunctive_filter(li, list(_lineitem_quality_preds().values()))
    return out.select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
        "l_discount", "l_tax", revenue.alias("revenue"),
    )


# --- F3: rejected-row accounting, single pass -----------------------------

@query(
    "reject_report",
    oracle="""
    SELECT count(*)                                             AS n_input,
           CAST(sum(CASE WHEN NOT (l_quantity > 0) THEN 1 ELSE 0 END) AS BIGINT)       AS rejected_nonpos_quantity,
           CAST(sum(CASE WHEN NOT (l_extendedprice > 0) THEN 1 ELSE 0 END) AS BIGINT)  AS rejected_nonpos_price,
           CAST(sum(CASE WHEN NOT (l_discount >= 0 AND l_discount <= 0.5) THEN 1 ELSE 0 END) AS BIGINT) AS rejected_disc_range,
           CAST(sum(CASE WHEN NOT (l_tax < l_extendedprice) THEN 1 ELSE 0 END) AS BIGINT) AS rejected_tax_lt_price,
           CAST(sum(CASE WHEN NOT ((l_extendedprice * (1.0 - l_discount)) > 0
                          AND (l_extendedprice * (1.0 - l_discount)) < 1000000) THEN 1 ELSE 0 END) AS BIGINT) AS rejected_revenue_range,
           CAST(sum(CASE WHEN l_quantity > 0 AND l_extendedprice > 0
                          AND l_discount >= 0 AND l_discount <= 0.5
                          AND l_tax < l_extendedprice
                          AND (l_extendedprice * (1.0 - l_discount)) > 0
                          AND (l_extendedprice * (1.0 - l_discount)) < 1000000
                     THEN 1 ELSE 0 END) AS BIGINT)              AS n_passed
    FROM lineitem
    """,
)
def reject_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2.3 F3 rebuilt scalably: per-predicate reject counts in ONE
    aggregation pass, vs the reference's repeated count() scans
    (utils.py:26,34,48 — 3 extra full scans)."""
    tune_session(spark)
    li = load_table(spark, sf_dir, "lineitem")
    return quality_ops.reject_report(li, _lineitem_quality_preds())


# --- P2/P4: typed projection + derived metrics ----------------------------

@query(
    "derived_metrics",
    oracle="""
    SELECT l_orderkey,
           l_linenumber,
           year(l_shipdate)  AS ship_year,
           month(l_shipdate) AS ship_month,
           l_extendedprice * (1.0 - l_discount)                 AS revenue,
           l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS charge
    FROM lineitem
    """,
)
def derived_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2.2 P2+P4: date-part derivation and arithmetic derived
    metrics. Unrounded: identical IEEE expression trees are
    bit-deterministic across engines. Narrow op — no shuffle."""
    tune_session(spark)
    li = load_table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.year("l_shipdate").cast("long").alias("ship_year"),
        F.month("l_shipdate").cast("long").alias("ship_month"),
        revenue.alias("revenue"),
        (revenue * (F.lit(1.0) + F.col("l_tax"))).alias("charge"),
    )


# --- TPC-H Q1-shaped pricing summary (the flagship analytical agg) --------

@query(
    "pricing_summary",
    oracle=f"""
    SELECT l_returnflag,
           l_linestatus,
           {sql_round4('sum(l_quantity)')}      AS sum_qty,
           {sql_round4('sum(l_extendedprice)')} AS sum_base_price,
           {sql_round4("sum(l_extendedprice * (1.0 - l_discount))")} AS sum_disc_price,
           {sql_round4("sum(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax))")} AS sum_charge,
           {sql_round4('avg(l_quantity)')}      AS avg_qty,
           {sql_round4('avg(l_extendedprice)')} AS avg_price,
           {sql_round4('avg(l_discount)')}      AS avg_disc,
           count(*)                             AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy multi-aggregate — the canonical
    throughput benchmark for the agg path (bench.py headline)."""
    tune_session(spark)
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    charge = disc_price * (F.lit(1.0) + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            round4(F.sum("l_quantity")).alias("sum_qty"),
            round4(F.sum("l_extendedprice")).alias("sum_base_price"),
            round4(F.sum(disc_price)).alias("sum_disc_price"),
            round4(F.sum(charge)).alias("sum_charge"),
            round4(F.avg("l_quantity")).alias("avg_qty"),
            round4(F.avg("l_extendedprice")).alias("avg_price"),
            round4(F.avg("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
