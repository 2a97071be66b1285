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


_ORDER_COUNT_DIST_SQL = """
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o
          ON c.c_custkey = o.o_custkey
         AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    ) c_orders
    GROUP BY c_count
"""


@query("sql_order_count_distribution", oracle=_ORDER_COUNT_DIST_SQL)
def sql_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of per-customer order counts,
    INCLUDING zero-order customers. The filter lives in the LEFT JOIN's
    ON clause (a WHERE would silently turn the join inner and drop the
    zero bucket — the classic outer-join bug), and the double
    aggregation is two cheap shuffles: the first on c_custkey (the
    fact's natural key), the second on the tiny count domain. All-count
    output → no float policy needed."""
    tune_session(spark)
    register_views(spark, sf_dir, ("customer", "orders"))
    return spark.sql(_ORDER_COUNT_DIST_SQL)


_WAITING_SUPPLIERS_SQL = """
    SELECT s.s_name, count(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1
          FROM lineitem l3
          JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > o3.o_orderdate + INTERVAL 90 DAY
      )
    GROUP BY s.s_name
"""


@query("sql_waiting_suppliers", oracle=_WAITING_SUPPLIERS_SQL)
def sql_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (adapted: the corpus has no commit/receipt
    dates, so "late" is shipped > 90 days after the order date):
    suppliers who were the SOLE late shipper on a finalized
    multi-supplier order. The hardest decorrelation classic — one
    correlated EXISTS plus one correlated NOT EXISTS over the same
    fact table. The NOT EXISTS leg re-joins orders INSIDE the subquery
    so the only correlated predicate is the l_orderkey equality;
    Catalyst then plans both legs as existence joins on the orderkey
    (semi + anti), i.e. the fact table shuffles on its natural key
    three times and nothing is re-executed per outer row."""
    tune_session(spark)
    register_views(spark, sf_dir, ("supplier", "lineitem", "orders"))
    return spark.sql(_WAITING_SUPPLIERS_SQL)


_PART_PROMO_SUPPLIERS_SQL = """
    SELECT s.s_suppkey, s.s_name, s.s_acctbal
    FROM supplier s
    WHERE s.s_suppkey IN (
        SELECT l.l_suppkey
        FROM lineitem l
        WHERE l.l_partkey IN (
            SELECT p_partkey FROM part WHERE p_name LIKE '%gear%'
        )
          AND l.l_shipdate >= TIMESTAMP '1998-01-01'
        GROUP BY l.l_suppkey
        HAVING sum(l.l_quantity) > 1225
    )
"""


@query("sql_part_promotion_suppliers", oracle=_PART_PROMO_SUPPLIERS_SQL)
def sql_part_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (adapted: no partsupp tier, so "availability"
    becomes shipped volume): suppliers who moved > 1225 units of
    gear-type parts since 1998 — a NESTED IN: the inner part-name IN
    prunes lineitem via a broadcast semi join BEFORE the grouped
    HAVING, whose survivor set semi-joins the tiny supplier dim.
    Determinism: quantities are integral doubles (probed), so the
    HAVING sum is exact and the 1225 threshold sits ≥ 4 units from the
    nearest attained sum; s_acctbal is a raw parquet column
    (bit-identical cross-engine, no rounding policy needed)."""
    tune_session(spark)
    register_views(spark, sf_dir, ("supplier", "lineitem", "part"))
    return spark.sql(_PART_PROMO_SUPPLIERS_SQL)


_TOP_REVENUE_SUPPLIER_SQL = f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               {sql_round4('sum(l_extendedprice * (1 - l_discount))')}
                   AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
"""


@query("sql_top_revenue_supplier", oracle=_TOP_REVENUE_SUPPLIER_SQL)
def sql_top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: a CTE referenced TWICE — once as the join input
    and once inside an uncorrelated scalar-max subquery — selecting the
    quarter's top-revenue supplier(s). The float-equality trap is
    defused by round4-ing total_revenue INSIDE the CTE: the max
    comparison then runs on identical doubles in both engines, and a
    genuine tie at 4 decimals emits BOTH suppliers on both engines
    (deterministic either way). At scale the CTE is one grouped pass
    over the quarter's partition-pruned slice; the scalar max is a
    broadcast of one double."""
    tune_session(spark)
    register_views(spark, sf_dir, ("supplier", "lineitem"))
    return spark.sql(_TOP_REVENUE_SUPPLIER_SQL)


_IMPORTANT_PARTS_SQL = f"""
    SELECT l_partkey, {sql_round4('sum(l_extendedprice * (1 - l_discount))')}
               AS part_value
    FROM lineitem
    GROUP BY l_partkey
    HAVING sum(l_extendedprice * (1 - l_discount)) >
           0.0005 * (SELECT sum(l_extendedprice * (1 - l_discount)) FROM lineitem)
"""


@query("sql_important_parts", oracle=_IMPORTANT_PARTS_SQL)
def sql_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (adapted: part revenue in lieu of the absent
    partsupp stock value): parts whose revenue exceeds a fixed fraction
    of TOTAL revenue — an uncorrelated scalar subquery inside HAVING.
    Both aggregations are one grouped pass each; the global total
    evaluates once and broadcasts as a literal into the HAVING filter.
    Determinism: the comparison is on RAW sums, but the nearest
    attained share sits 1.0e-08 from the 5e-4 threshold (probed at
    sf0.01) while cross-engine fold noise is ~1e-15 relative — seven
    orders of margin; emitted values go through round4 as usual."""
    tune_session(spark)
    register_views(spark, sf_dir, ("lineitem",))
    return spark.sql(_IMPORTANT_PARTS_SQL)


_SUPPLIER_COUNT_SQL = """
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND l.l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_suppkey % 7 = 0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
"""


@query("sql_part_supplier_counts", oracle=_SUPPLIER_COUNT_SQL)
def sql_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (adapted: the excluded-supplier list comes from
    a deterministic key predicate instead of the absent s_comment):
    distinct-supplier counts per part attribute group with a NOT IN
    subquery. NOT IN is the null-trap shape — Spark must plan a
    null-aware anti join (the excluded set is provably non-null here,
    so it degenerates to a plain broadcast anti join) — and
    count(DISTINCT) forces the two-phase distinct aggregation."""
    tune_session(spark)
    register_views(spark, sf_dir, ("lineitem", "part", "supplier"))
    return spark.sql(_SUPPLIER_COUNT_SQL)


_FORECAST_REVENUE_SQL = f"""
    SELECT ship_year, {sql_round4('sum(discounted)')} AS revenue
    FROM (
        SELECT CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS ship_year,
               l_extendedprice * l_discount AS discounted
        FROM lineitem
        WHERE l_discount >= CAST(0.03 AS DOUBLE)
          AND l_discount <= CAST(0.07 AS DOUBLE)
          AND l_quantity < 24
    ) q
    GROUP BY ship_year
"""


@query("sql_forecast_revenue", oracle=_FORECAST_REVENUE_SQL)
def sql_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: the canonical scan-only filter-aggregate —
    revenue uplift from dropping mid-band discounts on small-quantity
    lines, per ship year. No join at all: the whole query is one
    partition-local scan + partial aggregate, and every predicate
    (discount band, quantity cap) reaches the parquet reader as a
    pushed filter — the plan that proves the scan path itself is
    optimal before any join shape matters. Determinism: the discount
    band compares the stored doubles against explicit DOUBLE casts of
    the literals (DuckDB would otherwise parse 0.03 as DECIMAL and
    round the COLUMN to compare, silently shifting the band edge)."""
    tune_session(spark)
    register_views(spark, sf_dir, ("lineitem",))
    return spark.sql(_FORECAST_REVENUE_SQL)


_SHIPMODE_PRIORITY_SQL = """
    SELECT delay_class,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM (
        SELECT o.o_orderpriority,
               CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                    THEN 'LATE'
                    WHEN l.l_shipdate > o.o_orderdate + INTERVAL 21 DAY
                    THEN 'SLOW'
                    ELSE 'FAST' END AS delay_class
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE EXTRACT(YEAR FROM l.l_shipdate) = 1997
    ) graded
    GROUP BY delay_class
"""


@query("sql_shipmode_priority", oracle=_SHIPMODE_PRIORITY_SQL)
def sql_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (adapted: the corpus has no l_shipmode /
    commit / receipt columns, so the mode axis becomes a ship-DELAY
    class derived from shipdate - orderdate): for one ship year, how
    many high-priority vs low-priority order lines fall in each delay
    class. The Q12 signature survives intact — a fact-to-fact join
    whose grouping key is DERIVED from columns of both sides, with the
    dual CASE-conditional counts in one grouped pass (never two
    aggregations joined). At scale the year predicate prunes lineitem
    before the join and the integer counts need no float policy."""
    tune_session(spark)
    register_views(spark, sf_dir, ("lineitem", "orders"))
    return spark.sql(_SHIPMODE_PRIORITY_SQL)


_CHEAPEST_SUPPLIER_SQL = """
    SELECT p.p_partkey, s.s_suppkey, s.s_name,
           l.l_extendedprice / l.l_quantity AS unit_price
    FROM part p
    JOIN lineitem l ON l.l_partkey = p.p_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    WHERE p.p_size = 15
      AND l.l_extendedprice / l.l_quantity = (
          SELECT min(l2.l_extendedprice / l2.l_quantity)
          FROM lineitem l2
          WHERE l2.l_partkey = p.p_partkey
      )
"""


@query("sql_cheapest_supplier_per_part", oracle=_CHEAPEST_SUPPLIER_SQL)
def sql_cheapest_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (adapted: minimal shipped unit price in lieu of
    the absent ps_supplycost): for every size-15 part, the supplier(s)
    that achieved its minimum unit price — a correlated scalar MIN
    decorrelated into an aggregate + join-back (argmin join). Float
    equality is SAFE here, deliberately: unit_price is a per-row
    division (bit-identical on both engines) and MIN over a set of
    doubles is order-insensitive, so the equality compares identical
    bits — no rounding policy required, and genuine ties emit the same
    multiple rows on both engines."""
    tune_session(spark)
    register_views(spark, sf_dir, ("part", "lineitem", "supplier"))
    return spark.sql(_CHEAPEST_SUPPLIER_SQL)


_SHIPPING_PRIORITY_SQL = f"""
    SELECT l.l_orderkey,
           {sql_round4("sum(l.l_extendedprice * (1 - l.l_discount))")}
               AS revenue,
           CAST(o.o_orderdate AS TIMESTAMP) AS o_orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1997-03-15'
      AND l.l_shipdate > TIMESTAMP '1997-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
"""


@query("sql_shipping_priority", oracle=_SHIPPING_PRIORITY_SQL)
def sql_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (the one Q-shape the suite was missing): top-10
    unshipped BUILDING-segment orders by outstanding revenue as of a
    cutoff date. Both date predicates are PushedFilters on their own
    scans (orders by order date, lineitem by ship date) BEFORE the
    fact-fact join, the customer segment filter broadcasts, and the
    top-10 plans as TakeOrderedAndProject over the grouped frame — no
    global sort. Revenue is round4-pinned BEFORE the rank cut
    (the catalog float-rank rule) with the order-key tie-break, so
    both engines cut the identical boundary."""
    tune_session(spark)
    register_views(spark, sf_dir, ("customer", "orders", "lineitem"))
    return spark.sql(_SHIPPING_PRIORITY_SQL)
