"""SQL front-door depth suite (round 5): the hard classic OLAP shapes
the registry's Q1/Q4/Q5/Q10/Q17/Q18/Q22 family didn't yet cover, each
runnable verbatim on BOTH engines (one SQL string is the Spark query
AND the DuckDB oracle) so the driver's differential check covers the
whole plan, not a re-implementation.

Shapes and why they matter at 100 TB:

- Q7 volume shipping: 6-way join with a DISJUNCTIVE cross-dimension
  predicate (nation pairs) — Catalyst must push the nation filters into
  both tiny dimension scans and broadcast them; the fact table is
  touched once.
- Q8 market share: two ratios of conditional aggregates over an 8-way
  snowflake — the share computation must stay one pass (no
  re-aggregation join).
- Q9 nation profit (adapted: margin proxy from p_retailprice — the
  corpus has no partsupp tier): join-heavy profit rollup by
  (nation, year).
- Q14 promo share: CASE-conditional share per month — a single grouped
  pass over one join.
- Q19 disjunctive DNF predicate: OR-of-ANDs across scan columns of two
  tables — the predicate classic that breaks naive pushdown; the
  brand/size legs must reach the part scan.

Determinism policy (see queries/_util): every float aggregate is
round4-ed AFTER aggregation; ratios round4 the ratio (ulp noise in the
inputs is far below 1e-4); years/months emitted as BIGINT/TIMESTAMP.
Reference parity: extends SURVEY §2.7's "SQL front door" family
(reference runs no SQL at all — its 333-line ETL is hard-coded;
/root/reference/src/etl_pipeline.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from lab3_lakehouse_spark.catalog import register_views
from lab3_lakehouse_spark.queries._util import sql_round4
from lab3_lakehouse_spark.queries.registry import query
from lab3_lakehouse_spark.session import tune_session

_VOLUME_SHIPPING_SQL = f"""
    SELECT supp_nation, cust_nation, l_year,
           {sql_round4('sum(volume)')} AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(EXTRACT(YEAR FROM l.l_shipdate) AS BIGINT) AS l_year,
               l.l_extendedprice * (1 - l.l_discount) AS volume
        FROM supplier s
        JOIN lineitem l ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        WHERE (n1.n_name = 'NATION_20' AND n2.n_name = 'NATION_11')
           OR (n1.n_name = 'NATION_11' AND n2.n_name = 'NATION_20')
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
"""


@query("sql_volume_shipping", oracle=_VOLUME_SHIPPING_SQL)
def sql_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by
    ship year. The disjunctive nation-pair predicate sits across TWO
    dimension aliases; Catalyst pushes each nation's IN-set into its
    own broadcast side, so lineitem (the 100 TB table) is scanned once
    and every join is a broadcast hash join (plan pinned in
    tests/test_plans.py)."""
    tune_session(spark)
    register_views(
        spark, sf_dir, ("supplier", "lineitem", "orders", "customer", "nation")
    )
    return spark.sql(_VOLUME_SHIPPING_SQL)


_MARKET_SHARE_SQL = f"""
    SELECT o_year,
           {sql_round4("sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)"
                       " / sum(volume)")} AS mkt_share
    FROM (
        SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS o_year,
               l.l_extendedprice * (1 - l.l_discount) AS volume,
               n2.n_name AS nation
        FROM part p
        JOIN lineitem l ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
        JOIN region r ON n1.n_regionkey = r.r_regionkey
        JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
        WHERE r.r_name = 'EUROPE' AND p.p_type = 'ECONOMY'
    ) all_sales
    GROUP BY o_year
"""


@query("sql_national_market_share", oracle=_MARKET_SHARE_SQL)
def sql_national_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's ECONOMY-part
    purchase volume per order year. The share is a CASE-conditional
    sum over the SAME grouped pass as the denominator — one aggregate,
    never a join of two aggregations — and the 7-way snowflake resolves
    to broadcast joins around the single lineitem scan."""
    tune_session(spark)
    register_views(
        spark,
        sf_dir,
        ("part", "lineitem", "supplier", "orders", "customer", "nation", "region"),
    )
    return spark.sql(_MARKET_SHARE_SQL)


_NATION_PROFIT_SQL = f"""
    SELECT nation, o_year, {sql_round4('sum(amount)')} AS profit
    FROM (
        SELECT n.n_name AS nation,
               CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS o_year,
               l.l_extendedprice * (1 - l.l_discount)
                   - 0.5 * p.p_retailprice * l.l_quantity AS amount
        FROM part p
        JOIN lineitem l ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE p.p_name LIKE '%a%'
    ) profit
    GROUP BY nation, o_year
"""


@query("sql_nation_profit", oracle=_NATION_PROFIT_SQL)
def sql_nation_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape, adapted to the corpus (no partsupp tier: the
    cost term is a 0.5 · p_retailprice · quantity margin proxy):
    profit by supplier nation and order year over a 5-way join with a
    LIKE filter on the part dimension. The LIKE prunes part BEFORE it
    broadcasts; lineitem scans once."""
    tune_session(spark)
    register_views(
        spark, sf_dir, ("part", "lineitem", "supplier", "orders", "nation")
    )
    return spark.sql(_NATION_PROFIT_SQL)


_PROMO_SHARE_SQL = f"""
    SELECT CAST(date_trunc('month', l.l_shipdate) AS TIMESTAMP) AS ship_month,
           {sql_round4("100.0 * sum(CASE WHEN p.p_type = 'PROMO'"
                       " THEN l.l_extendedprice * (1 - l.l_discount)"
                       " ELSE 0 END) / sum(l.l_extendedprice * (1 - l.l_discount))")}
               AS promo_share_pct
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    GROUP BY date_trunc('month', l.l_shipdate)
"""


@query("sql_promo_revenue_share", oracle=_PROMO_SHARE_SQL)
def sql_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: percentage of each ship month's revenue coming
    from PROMO-type parts — numerator and denominator in ONE grouped
    pass (CASE-conditional sum), part broadcast into the lineitem
    scan."""
    tune_session(spark)
    register_views(spark, sf_dir, ("lineitem", "part"))
    return spark.sql(_PROMO_SHARE_SQL)


_DISJUNCTIVE_SQL = f"""
    SELECT {sql_round4('sum(l.l_extendedprice * (1 - l.l_discount))')} AS revenue,
           count(*) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 30)
"""


@query("sql_disjunctive_revenue", oracle=_DISJUNCTIVE_SQL)
def sql_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: an OR-of-ANDs (DNF) predicate spanning columns
    of BOTH join sides — the pushdown classic. Catalyst must derive the
    single-table implications (the brand/size union prunes the part
    scan, the quantity union prunes lineitem) instead of evaluating the
    whole DNF post-join; the quantity range union [1,30] reaches the
    lineitem scan as a pushed filter (pinned in tests/test_plans.py)."""
    tune_session(spark)
    register_views(spark, sf_dir, ("lineitem", "part"))
    return spark.sql(_DISJUNCTIVE_SQL)
