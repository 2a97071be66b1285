"""Standard relational surface (SURVEY §2.7 gap list): joins, windows,
sort/limit/top-k, set ops, distinct, rollup/cube/grouping sets, scalar
functions, and batch time-window aggregation.

The reference has NONE of these (verified absent, SURVEY §2.7); each is
a stock Spark primitive wrapped by the operator library. Determinism
conventions are as in ``parity.py`` (round4 for aggregate doubles, no
DATE outputs, date-parts cast to long, window ranks cast to long,
total tie-broken orderings everywhere a limit/rank is involved).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lab3_lakehouse_spark.catalog import load_table, register_views
from lab3_lakehouse_spark.operators import joins as join_ops
from lab3_lakehouse_spark.operators import setops as set_ops
from lab3_lakehouse_spark.operators import windows as win_ops
from lab3_lakehouse_spark.operators import aggregate as agg_ops
from lab3_lakehouse_spark.queries._util import round4, sql_round4
from lab3_lakehouse_spark.queries.registry import query
from lab3_lakehouse_spark.session import tune_session

_REVENUE = "l_extendedprice * (1.0 - l_discount)"


# ---------------------------------------------------------------- joins --

@query(
    "join_customer_orders",
    oracle="""
    SELECT o.o_orderkey, c.c_custkey, c.c_name, c.c_mktsegment, o.o_totalprice
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def join_customer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join, dimension side broadcast (customer is a contract
    SMALL_DIM — fact side never shuffles)."""
    tune_session(spark)
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    out = join_ops.equi_join(
        orders, customer.withColumnRenamed("c_custkey", "o_custkey"),
        on="o_custkey", how="inner", broadcast_right=True,
    )
    return out.select(
        "o_orderkey", F.col("o_custkey").alias("c_custkey"),
        "c_name", "c_mktsegment", "o_totalprice",
    )


@query(
    "join_left_order_stats",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           count(o.o_orderkey) AS n_orders,
           {sql_round4('coalesce(sum(o.o_totalprice), 0.0)')} AS total_spend
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
)
def join_left_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join + aggregate: customers with zero orders kept."""
    tune_session(spark)
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    joined = customer.join(
        orders, on=customer.c_custkey == orders.o_custkey, how="left"
    )
    return joined.groupBy("c_custkey", "c_name").agg(
        F.count("o_orderkey").alias("n_orders"),
        round4(F.coalesce(F.sum("o_totalprice"), F.lit(0.0))).alias("total_spend"),
    )


@query(
    "join_semi_customers_with_urgent_orders",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: EXISTS without duplicating or widening rows."""
    tune_session(spark)
    customer = load_table(spark, sf_dir, "customer")
    urgent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    out = join_ops.equi_join(
        customer, urgent, on=customer.c_custkey == urgent.o_custkey, how="left_semi"
    )
    return out.select("c_custkey", "c_name", "c_mktsegment")


@query(
    "join_anti_customers_without_urgent_orders",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: NOT EXISTS (filtered right side so the result is
    non-empty at every SF — the semi-join's exact complement)."""
    tune_session(spark)
    customer = load_table(spark, sf_dir, "customer")
    urgent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    out = join_ops.equi_join(
        customer, urgent, on=customer.c_custkey == urgent.o_custkey, how="left_anti"
    )
    return out.select("c_custkey", "c_name")


@query(
    "regional_revenue",
    oracle=f"""
    SELECT r.r_name, n.n_name,
           {sql_round4(f'sum({_REVENUE})')} AS revenue,
           count(*) AS n_lineitems
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey  = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
)
def regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped star join: fact ⋈ 4 dims, every dim broadcast
    (catalog.SMALL_DIMS) — the fact table streams through a single
    narrow pipeline with zero shuffles until the final aggregate."""
    tune_session(spark)
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    revenue = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    joined = join_ops.star_join(
        li,
        [
            (orders.withColumnRenamed("o_orderkey", "l_orderkey"), "l_orderkey", "orders"),
            (customer.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey", "customer"),
            (nation.withColumnRenamed("n_nationkey", "c_nationkey"), "c_nationkey", "nation"),
            (region.withColumnRenamed("r_regionkey", "n_regionkey"), "n_regionkey", "region"),
        ],
        small_dim_names=("orders", "customer", "nation", "region"),
    )
    return joined.groupBy("r_name", "n_name").agg(
        round4(F.sum(revenue)).alias("revenue"),
        F.count(F.lit(1)).alias("n_lineitems"),
    )


@query(
    "top_building_orders",
    oracle=f"""
    SELECT o.o_orderkey,
           CAST(o.o_orderdate AS TIMESTAMP) AS o_orderdate,
           {sql_round4(f'sum({_REVENUE})')} AS revenue
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY o.o_orderkey, o.o_orderdate
    ORDER BY revenue DESC, o.o_orderkey
    LIMIT 10
    """,
)
def top_building_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → join → agg → global top-10
    (TakeOrdered, not a full sort). Ordering is tie-broken on the key and
    applied to the ROUNDED revenue so both engines pick identical rows."""
    tune_session(spark)
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    building = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    revenue = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    agg = (
        li.join(F.broadcast(orders.withColumnRenamed("o_orderkey", "l_orderkey")), "l_orderkey")
        .join(F.broadcast(building.withColumnRenamed("c_custkey", "o_custkey")), "o_custkey")
        .groupBy(F.col("l_orderkey").alias("o_orderkey"), "o_orderdate")
        .agg(round4(F.sum(revenue)).alias("revenue"))
    )
    return win_ops.global_top_n(
        agg, [F.col("revenue").desc(), F.col("o_orderkey").asc()], 10
    )


# -------------------------------------------------------------- windows --

@query(
    "window_top_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           CAST(row_number() OVER (PARTITION BY o_custkey
                                   ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
    FROM orders
    QUALIFY rn <= 3
    """,
)
def window_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via row_number (the scalable top-k idiom: one
    shuffle on the group key, no global sort)."""
    tune_session(spark)
    orders = load_table(spark, sf_dir, "orders")
    out = win_ops.top_k_per_group(
        orders.select("o_custkey", "o_orderkey", "o_totalprice"),
        partition_by=["o_custkey"],
        order_by=[F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        k=3,
    )
    return out.withColumn("rn", F.col("rn").cast("long"))


@query(
    "window_running_spend",
    oracle=f"""
    SELECT o_custkey, o_orderkey,
           CAST(o_orderdate AS TIMESTAMP) AS o_orderdate,
           {sql_round4('''sum(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)''')} AS running_spend
    FROM orders
    """,
)
def window_running_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running (cumulative) aggregate per key, ordered by event time with
    a key tie-break for a total order."""
    tune_session(spark)
    orders = load_table(spark, sf_dir, "orders")
    spec = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        round4(F.sum("o_totalprice").over(spec)).alias("running_spend"),
    )


@query(
    "window_lag_lead_events",
    oracle="""
    SELECT user_id, event_id, value,
           lag(value)  OVER w AS value_lag,
           lead(value) OVER w AS value_lead
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_lag_lead_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead analytics over an event stream, per user."""
    tune_session(spark)
    ev = load_table(spark, sf_dir, "events")
    out = win_ops.lag_lead(
        ev.select("user_id", "event_id", "ts", "value"),
        partition_by=["user_id"],
        order_by=[F.col("ts").asc(), F.col("event_id").asc()],
        col="value",
    )
    return out.select("user_id", "event_id", "value", "value_lag", "value_lead")


@query(
    "window_rank_parts_by_price",
    oracle="""
    SELECT p_brand, p_partkey, p_retailprice,
           CAST(rank() OVER (PARTITION BY p_brand
                             ORDER BY p_retailprice DESC) AS BIGINT)       AS price_rank,
           CAST(dense_rank() OVER (PARTITION BY p_brand
                                   ORDER BY p_retailprice DESC) AS BIGINT) AS price_dense_rank
    FROM part
    """,
)
def window_rank_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank + dense_rank with (possibly tied) value ordering — tie groups
    get identical ranks in both engines, so no tie-break is needed."""
    tune_session(spark)
    part = load_table(spark, sf_dir, "part")
    spec = Window.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc())
    return part.select(
        "p_brand",
        "p_partkey",
        "p_retailprice",
        F.rank().over(spec).cast("long").alias("price_rank"),
        F.dense_rank().over(spec).cast("long").alias("price_dense_rank"),
    )


@query(
    "window_distribution_ranks",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           CAST(ntile(4) OVER w AS BIGINT) AS price_quartile,
           percent_rank() OVER w           AS pct_rank,
           cume_dist() OVER w              AS cdist,
           first_value(o_orderkey) OVER w  AS cheapest_key
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice, o_orderkey)
    """,
)
def window_distribution_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-rank window family: ntile quartiles, percent_rank,
    cume_dist, first_value. The ORDER BY carries an o_orderkey
    tie-break because ntile assigns by ROW POSITION (ties split across
    buckets arbitrarily without a total order — unlike rank/dense_rank
    which window_rank_parts_by_price covers tie-group-exactly).
    percent_rank and cume_dist are exact rational doubles of row
    counts → bit-identical cross-engine, no rounding policy needed."""
    tune_session(spark)
    orders = load_table(spark, sf_dir, "orders")
    spec = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(spec).cast("long").alias("price_quartile"),
        F.percent_rank().over(spec).alias("pct_rank"),
        F.cume_dist().over(spec).alias("cdist"),
        F.first("o_orderkey").over(spec).alias("cheapest_key"),
    )


@query(
    "global_top_orders",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderpriority
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
)
def global_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sort+limit → TakeOrdered (per-partition heaps + driver
    merge of 20 rows, not a cluster-wide sort)."""
    tune_session(spark)
    orders = load_table(spark, sf_dir, "orders")
    return win_ops.global_top_n(
        orders.select("o_orderkey", "o_totalprice", "o_orderpriority"),
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        20,
    )


# -------------------------------------------------------------- set ops --

_OPEN = "SELECT o_orderkey FROM orders WHERE o_orderstatus = 'O'"
_BIG = "SELECT o_orderkey FROM orders WHERE o_totalprice > 150000"


def _order_slices(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    orders = load_table(spark, sf_dir, "orders")
    open_orders = orders.filter(F.col("o_orderstatus") == "O").select("o_orderkey")
    big_orders = orders.filter(F.col("o_totalprice") > 150000).select("o_orderkey")
    return open_orders, big_orders


@query("set_union_orders", oracle=f"{_OPEN} UNION {_BIG}")
def set_union_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    a, b = _order_slices(spark, sf_dir)
    return set_ops.union_distinct(a, b)


@query("set_intersect_orders", oracle=f"{_OPEN} INTERSECT {_BIG}")
def set_intersect_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    a, b = _order_slices(spark, sf_dir)
    return set_ops.intersect(a, b)


@query("set_except_orders", oracle=f"{_OPEN} EXCEPT {_BIG}")
def set_except_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    a, b = _order_slices(spark, sf_dir)
    return set_ops.except_rows(a, b)


# ------------------------------------------------------------- distinct --

@query(
    "distinct_user_event_types",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def distinct_user_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    ev = load_table(spark, sf_dir, "events")
    return agg_ops.distinct_rows(ev, ["user_id", "event_type"])


@query(
    "distinct_user_count",
    oracle="SELECT count(DISTINCT user_id) AS n_users, count(*) AS n_events FROM events",
)
def distinct_user_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "approx_distinct_users",
    oracle="""
    SELECT count(DISTINCT user_id) AS n_exact, true AS within_3rsd
    FROM events
    """,
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++): the 100 TB default for
    distinct counts — constant memory, no per-key dedup shuffle.

    Assert-style oracle: the HLL estimate itself is Spark-specific, so
    the query emits the exact count (SQL-checkable) plus the boolean
    ``|approx − exact| ≤ 3·rsd·exact`` — the driver now verifies the
    accuracy contract instead of merely counting rows."""
    tune_session(spark)
    ev = load_table(spark, sf_dir, "events")
    rsd = 0.02
    return (
        ev.agg(
            F.countDistinct("user_id").alias("n_exact"),
            F.approx_count_distinct("user_id", rsd).alias("__approx"),
        )
        .select(
            "n_exact",
            (
                F.abs(F.col("__approx") - F.col("n_exact"))
                <= F.lit(3 * rsd) * F.col("n_exact")
            ).alias("within_3rsd"),
        )
    )


# -------------------------------------------- rollup / cube / grouping --

@query(
    "rollup_lineitem_status",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_round4('sum(l_quantity)')} AS sum_qty,
           count(*) AS n_items
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_lineitem_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP: hierarchical subtotals + grand total in one pass."""
    tune_session(spark)
    li = load_table(spark, sf_dir, "lineitem")
    return agg_ops.rollup_agg(
        li,
        ["l_returnflag", "l_linestatus"],
        [round4(F.sum("l_quantity")).alias("sum_qty"), F.count(F.lit(1)).alias("n_items")],
    )


@query(
    "cube_order_status_priority",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n_orders,
           {sql_round4('sum(o_totalprice)')} AS total_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_order_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all grouping combinations in one pass."""
    tune_session(spark)
    orders = load_table(spark, sf_dir, "orders")
    return agg_ops.cube_agg(
        orders,
        ["o_orderstatus", "o_orderpriority"],
        [F.count(F.lit(1)).alias("n_orders"), round4(F.sum("o_totalprice")).alias("total_price")],
    )


@query(
    "grouping_sets_orders",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n_orders,
           {sql_round4('avg(o_totalprice)')} AS avg_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
)
def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS via the engine's SQL front door (spark.sql) — the
    second entry point the reference never had (spark.sql is never
    called in the reference; SURVEY §2.7)."""
    tune_session(spark)
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(
        f"""
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n_orders,
               {sql_round4('avg(o_totalprice)')} AS avg_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


# ------------------------------------------------------ scalar functions --

@query(
    "scalar_string_funcs",
    oracle="""
    SELECT doc_id,
           upper(lang)                       AS lang_uc,
           substring(text, 1, 20)            AS prefix,
           CAST(length(text) AS BIGINT)      AS n_chars_str,
           replace(lang, 'e', '_')           AS lang_repl,
           concat(source, ':', lang)         AS src_lang,
           CAST(strpos(text, 'data') AS BIGINT) AS data_pos
    FROM documents
    """,
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar catalog: upper/substring/length/replace/concat/locate."""
    tune_session(spark)
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.upper("lang").alias("lang_uc"),
        F.substring("text", 1, 20).alias("prefix"),
        F.length("text").cast("long").alias("n_chars_str"),
        F.replace(F.col("lang"), F.lit("e"), F.lit("_")).alias("lang_repl"),
        F.concat(F.col("source"), F.lit(":"), F.col("lang")).alias("src_lang"),
        F.locate("data", F.col("text")).cast("long").alias("data_pos"),
    )


@query(
    "scalar_date_funcs",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate)                         AS o_year,
           month(o_orderdate)                        AS o_month,
           dayofmonth(o_orderdate)                   AS o_day,
           dayofweek(o_orderdate)                    AS o_dow,
           date_diff('day', o_orderdate, TIMESTAMP '2002-01-01 00:00:00') AS days_to_2002,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP)         AS month_end
    FROM orders
    """,
)
def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time scalar catalog. Convention notes: Spark dayofweek is
    1=Sunday..7 while ANSI engines use 0=Sunday..6 → emit ``dayofweek-1``
    (this is the M1 convention hazard from SURVEY §2.6 made explicit);
    DATE-typed results are cast to TIMESTAMP (catalog policy)."""
    tune_session(spark)
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("o_year"),
        F.month("o_orderdate").cast("long").alias("o_month"),
        F.dayofmonth("o_orderdate").cast("long").alias("o_day"),
        (F.dayofweek("o_orderdate") - F.lit(1)).cast("long").alias("o_dow"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate")).cast("long").alias("days_to_2002"),
        F.last_day("o_orderdate").cast("timestamp").alias("month_end"),
    )


@query(
    "scalar_math_funcs",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           abs(l_discount - 0.05)                    AS abs_disc_delta,
           CAST(ceil(l_quantity / 7.0) AS DOUBLE)    AS qty_ceil7,
           CAST(floor(l_quantity / 7.0) AS DOUBLE)   AS qty_floor7,
           sqrt(l_extendedprice)                     AS price_sqrt,
           {sql_round4('ln(1.0 + l_extendedprice)')} AS price_ln,
           l_quantity * l_quantity                   AS qty_sq,
           CAST(l_quantity AS BIGINT) % 5            AS qty_mod5
    FROM lineitem
    """,
)
def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math scalar catalog. sqrt/abs/mod are IEEE-exact cross-engine;
    ln goes through round4 (libm implementations may differ by 1 ulp)."""
    tune_session(spark)
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - F.lit(0.05)).alias("abs_disc_delta"),
        F.ceil(F.col("l_quantity") / F.lit(7.0)).cast("double").alias("qty_ceil7"),
        F.floor(F.col("l_quantity") / F.lit(7.0)).cast("double").alias("qty_floor7"),
        F.sqrt("l_extendedprice").alias("price_sqrt"),
        round4(F.log(F.lit(1.0) + F.col("l_extendedprice"))).alias("price_ln"),
        (F.col("l_quantity") * F.col("l_quantity")).alias("qty_sq"),
        (F.col("l_quantity").cast("long") % F.lit(5)).alias("qty_mod5"),
    )


@query(
    "json_extract_props",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k')         AS k_str,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
    FROM events
    """,
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar extraction from a string column (events.props)."""
    tune_session(spark)
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("long").alias("k_val"),
    )


# ------------------------------------------------- batch time windows ----

@query(
    "tumbling_window_hourly",
    oracle=f"""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           count(*)                           AS n_events,
           {sql_round4('sum(value)')}         AS sum_value
    FROM events
    GROUP BY 1
    """,
)
def tumbling_window_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time window in batch — the same F.window operator
    the streaming tier uses (streaming/windows.py), so batch and stream
    share semantics."""
    tune_session(spark)
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            round4(F.sum("value")).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "sum_value")
    )


@query(
    "session_window_per_user",
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
           min(ts)                    AS session_start,
           count(*)                   AS n_events,
           {sql_round4('sum(value)')} AS sum_value
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def session_window_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-min inactivity gap) in batch via
    F.session_window — the oracle is the classic gaps-and-islands SQL,
    proving the semantics equivalence. Streaming variant shares this
    operator (streaming/windows.py)."""
    tune_session(spark)
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            round4(F.sum("value")).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


@query(
    "union_evolved_event_slices",
    oracle="""
    SELECT user_id, event_type, value
    FROM events WHERE event_type = 'purchase'
    UNION ALL BY NAME
    SELECT user_id, event_type, ts
    FROM events WHERE event_type = 'signup'
    """,
)
def union_evolved_event_slices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union (operators/setops.py:union_evolved):
    purchase rows carry ``value``, signup rows carry ``ts`` — the
    frames align by column NAME with NULL fill, exactly DuckDB's
    ``UNION ALL BY NAME``. The driver's compare sorts columns by name,
    so the engines' differing column orders are immaterial."""
    tune_session(spark)
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_type", "value"
    )
    b = ev.filter(F.col("event_type") == "signup").select(
        "user_id", "event_type", "ts"
    )
    return set_ops.union_evolved(a, b)


@query(
    "global_balance_ranks",
    oracle="""
    SELECT c_custkey, c_acctbal,
           CAST(row_number() OVER (ORDER BY c_acctbal DESC, c_custkey)
                AS BIGINT) AS rank
    FROM customer
    """,
)
def global_balance_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact GLOBAL ranking of every customer by account balance —
    ``row_number() OVER (ORDER BY ...)`` semantics WITHOUT the
    single-partition sort that window spec forces on both engines'
    naive plans. Runs operators/windows.global_row_number: bucket by
    broadcast approx-percentile cuts (monotone ⇒ bucket order = metric
    order), partitioned row_number per bucket, cumulative bucket
    offsets broadcast back — rank exactness is independent of the cut
    accuracy, so the sketch is safe. This is the operator the r4
    verdict's Pareto/RFM scale fixes sidestepped (top-k / cut-point
    comparisons); when the full ranking itself is the product (billing
    tiers, leaderboards), this is the 100 TB plan. No rounding needed:
    c_acctbal is compared and emitted verbatim, never aggregated."""
    tune_session(spark)
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    return win_ops.global_row_number(
        cust, "c_acctbal", ["c_custkey"], rank_col="rank", ascending=False
    )
