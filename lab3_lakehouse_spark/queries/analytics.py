"""Analytics extras: exact distribution statistics and the SQL front
door (SURVEY §3 — "two equivalent front doors": DataFrame builder and
``spark.sql`` over the registered table catalog).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lab3_lakehouse_spark.catalog import load_table, register_views
from lab3_lakehouse_spark.queries.registry import query
from lab3_lakehouse_spark.queries._util import round4, sql_round4
from lab3_lakehouse_spark.session import tune_session


@query(
    "value_percentiles",
    oracle=f"""
    SELECT event_type,
           {sql_round4('quantile_cont(value, 0.5)')}  AS p50,
           {sql_round4('quantile_cont(value, 0.9)')}  AS p90,
           {sql_round4('quantile_cont(value, 0.99)')} AS p99,
           {sql_round4('max(value)')}                 AS max_value
    FROM events
    GROUP BY event_type
    """,
)
def value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous percentiles per group (both engines use linear
    interpolation; outputs rounded with the shared round4 policy). At
    100 TB switch to ``percentile_approx`` — exact percentile holds the
    full group in memory; the approx variant is a fixed-size sketch."""
    tune_session(spark)
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        round4(F.percentile("value", F.lit(0.5))).alias("p50"),
        round4(F.percentile("value", F.lit(0.9))).alias("p90"),
        round4(F.percentile("value", F.lit(0.99))).alias("p99"),
        round4(F.max("value")).alias("max_value"),
    )


@query(
    "salted_agg_event_type",
    oracle=f"""
    SELECT event_type,
           count(*)                   AS cnt,
           {sql_round4('sum(value)')} AS sum_value
    FROM events
    GROUP BY event_type
    """,
)
def salted_agg_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation on a low-cardinality (≡ skew-prone)
    key, oracle-checked against the plain GROUP BY — like the salted
    join, salting must be a pure physical rewrite."""
    tune_session(spark)
    from lab3_lakehouse_spark.operators.aggregate import salted_agg

    ev = load_table(spark, sf_dir, "events")
    out = salted_agg(ev, ["event_type"], ["value"], salt_buckets=16)
    return out.select(
        "event_type", "cnt", round4(F.col("sum_value")).alias("sum_value")
    )


_LATE_ORDERS_SQL = """
    SELECT o.o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL '60' DAY
    )
    GROUP BY o.o_orderpriority
"""


@query(
    "sql_late_order_priority",
    oracle="""
    SELECT o.o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    )
    GROUP BY o.o_orderpriority
    """,
)
def sql_late_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape through the SQL FRONT DOOR: ``spark.sql`` over the
    registered view catalog, with a correlated EXISTS subquery —
    Catalyst decorrelates it to a left-semi join (same physical plan the
    DataFrame ``join(how='left_semi')`` path produces)."""
    tune_session(spark)
    register_views(spark, sf_dir, ("orders", "lineitem"))
    return spark.sql(_LATE_ORDERS_SQL)
