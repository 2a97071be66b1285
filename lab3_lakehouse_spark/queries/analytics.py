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
    "approx_percentiles_contract",
    oracle="""
    SELECT event_type, count(*) AS n,
           true AS p50_within_eps, true AS p90_within_eps
    FROM events
    GROUP BY event_type
    """,
)
def approx_percentiles_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``percentile_approx`` (Greenwald-Khanna sketch) — the 100 TB
    percentile path: constant-memory mergeable sketch per group instead
    of the full-sort/full-materialize exact percentile.

    Assert-style oracle (the approx_distinct_users pattern): the sketch
    value is Spark-specific, so the query emits the group size
    (SQL-checkable) plus booleans asserting the GK rank guarantee —
    the exact rank of the returned value is within ``ε·n + 1`` of the
    target rank ``p·n``, ε = 1/accuracy. The rank is measured against
    the real data by a second aggregation, so the driver verifies the
    sketch's accuracy contract end-to-end, not just that it ran.
    """
    tune_session(spark)
    ev = load_table(spark, sf_dir, "events")
    accuracy = 1000
    eps = 1.0 / accuracy
    approx = ev.groupBy("event_type").agg(
        F.percentile_approx("value", F.lit(0.5), F.lit(accuracy)).alias("__a50"),
        F.percentile_approx("value", F.lit(0.9), F.lit(accuracy)).alias("__a90"),
    )
    ranked = (
        ev.join(F.broadcast(approx), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("value") <= F.col("__a50")).cast("long")).alias("__r50"),
            F.sum((F.col("value") <= F.col("__a90")).cast("long")).alias("__r90"),
        )
    )
    n = F.col("n").cast("double")
    bound = F.lit(eps) * n + F.lit(1.0)
    return ranked.select(
        "event_type",
        "n",
        (F.abs(F.col("__r50").cast("double") - F.lit(0.5) * n) <= bound).alias(
            "p50_within_eps"
        ),
        (F.abs(F.col("__r90").cast("double") - F.lit(0.9) * n) <= bound).alias(
            "p90_within_eps"
        ),
    )


_KLL_QS = [0.1, 0.5, 0.9]
_KLL_K, _KLL_SHARDS, _KLL_EPS = 256, 8, 0.015


@query(
    "kll_quantile_contract",
    oracle=f"""
    SELECT event_type, q, CAST(count(*) AS BIGINT) AS n,
           true AS rank_within_eps
    FROM events
    CROSS JOIN (SELECT unnest([{', '.join(repr(q) for q in _KLL_QS)}]) AS q) qs
    WHERE value IS NOT NULL
    GROUP BY event_type, q
    """,
)
def kll_quantile_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE quantile sketch (KLL/MRL compactors, deterministic
    alternating-parity variant — operators/sketches.py) — the rank
    member of the mergeable family next to HLL (distinct), CMS
    (frequency) and KMV (θ): per-(event_type × shard) partial sketches
    built in one ``applyInPandas`` pass, merged to key grain on sketch
    ROWS only (k·log(n/k) values per shard — metadata-sized at any
    corpus size), quantiles estimated from the merged compactors. This
    is what ``percentile_approx`` (approx_percentiles_contract) can't
    do across SEPARATELY-STORED aggregates: a persisted per-day KLL
    tier rolls up to week/month grain without rescanning raw events.

    Assert-style oracle (the HLL pattern): estimates are
    sketch-internal, so the query measures each estimate's EXACT rank
    against the real data in a second pass and emits booleans pinning
    the achieved rank error within ε = 0.015 (empirical deterministic
    bound ~5× tighter at k=256) — the driver verifies the sketch's
    accuracy contract end-to-end."""
    from lab3_lakehouse_spark.operators import sketches

    tune_session(spark)
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    sk = sketches.kll_sketch_rollup(
        ev, ["event_type"], "value", k=_KLL_K, shards=_KLL_SHARDS
    )
    ests = sketches.kll_merge_quantiles(
        sk, ["event_type"], _KLL_QS, k=_KLL_K
    )
    ranked = (
        ev.join(F.broadcast(ests), "event_type")
        .groupBy("event_type", "q")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum((F.col("value") <= F.col("est")).cast("long")).alias("__r"),
        )
    )
    n = F.col("n").cast("double")
    bound = F.lit(_KLL_EPS) * n + F.lit(1.0)
    return ranked.select(
        "event_type",
        "q",
        "n",
        (F.abs(F.col("__r").cast("double") - F.col("q") * n) <= bound).alias(
            "rank_within_eps"
        ),
    )


@query(
    "kll_tier_compaction",
    oracle=f"""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           true AS compaction_shrinks,
           true AS estimates_identical
    FROM events
    WHERE value IS NOT NULL
    GROUP BY event_type
    """,
)
def kll_tier_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-tier GC (operators/sketches.kll_sketch_compact): a
    long-lived KLL store accumulates batches·shards sketch rows
    forever (the streaming tier appends per micro-batch); compaction
    folds each key to ONE compactor without touching raw data — and
    because the fold is the same deterministic shard-ordered merge the
    reader runs, every quantile estimate from the compacted tier is
    BIT-IDENTICAL to the uncompacted tier's. The entry pins both
    properties per key: the compacted tier is no larger (row count),
    and the three contract quantiles (q ∈ {{0.1, 0.5, 0.9}}) are exactly
    equal before/after — the invariant that makes compaction safe to
    run on any maintenance cadence. The cross-engine numeric is the
    per-key value count (the KLL accuracy contract itself is
    driver-checked by kll_quantile_contract)."""
    from lab3_lakehouse_spark.operators import sketches

    tune_session(spark)
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    sk = sketches.kll_sketch_rollup(
        ev, ["event_type"], "value", k=_KLL_K, shards=_KLL_SHARDS
    ).localCheckpoint(eager=False)  # feeds compaction AND both readers
    compacted = sketches.kll_sketch_compact(
        sk, ["event_type"], k=_KLL_K
    ).localCheckpoint(eager=False)  # read for rows AND estimates
    est_pre = sketches.kll_merge_quantiles(
        sk, ["event_type"], _KLL_QS, k=_KLL_K
    )
    est_post = sketches.kll_merge_quantiles(
        compacted, ["event_type"], _KLL_QS, k=_KLL_K
    )
    rows_pre = sk.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("__rows_pre")
    )
    rows_post = compacted.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("__rows_post")
    )
    eq = (
        est_pre.withColumnRenamed("est", "__e_pre")
        .join(
            est_post.withColumnRenamed("est", "__e_post"),
            ["event_type", "q"],
        )
        .groupBy("event_type")
        .agg(
            F.min(F.col("__e_pre") == F.col("__e_post")).alias(
                "estimates_identical"
            )
        )
    )
    n_by_key = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    return (
        n_by_key.join(rows_pre, "event_type")
        .join(rows_post, "event_type")
        .join(eq, "event_type")
        .select(
            "event_type",
            "n",
            (F.col("__rows_post") <= F.col("__rows_pre")).alias(
                "compaction_shrinks"
            ),
            "estimates_identical",
        )
    )


@query(
    "streaming_kll_store",
    oracle=f"""
    SELECT q, CAST(count(*) AS BIGINT) AS n,
           true AS rank_within_eps,
           true AS gc_identical
    FROM events
    CROSS JOIN (SELECT unnest([{', '.join(repr(q) for q in _KLL_QS)}]) AS q) qs
    WHERE value IS NOT NULL
    GROUP BY q
    """,
)
def streaming_kll_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The KLL quantile tier fed by a STREAM — the continuous lid on
    kll_quantile_contract, mirroring streaming_bm25_index for the
    sketch-store family: events arrive as a file stream (4 JSON
    slices, maxFilesPerTrigger=2 → multiple real micro-batches), every
    micro-batch appends its own deterministic compactor rows through
    streaming/monitor.stream_kll_quantiles (batch cost ∝ batch; the
    tier is never read by the writer), and after the stream drains the
    store merge (kll_store_quantiles) estimates quantiles of EVERYTHING
    the stream has seen — metadata-sized work at any stream age.

    Differential contract (assert-style, the HLL/KLL pattern — the
    estimates are sketch-internal, so the entry measures them against
    the raw data and pins booleans): (a) each estimate's exact rank is
    within ε·n + 1 of the target (mergeability: micro-batch sketches
    merged must keep the contract bound — ε=0.015 at k=256 holds with
    ~5× margin empirically); (b) disk-level GC (streaming/monitor.
    kll_compact_store — the stores.py lifecycle's compaction leg)
    folds the batches×shards rows to one compactor row-set in a NEW
    root and every estimate read from it is BIT-IDENTICAL. Eager by
    necessity (stream + store build at call time; roots via
    _util.scratch_dir)."""
    import shutil

    from lab3_lakehouse_spark.queries._util import scratch_dir
    from lab3_lakehouse_spark.streaming import monitor as st_mon

    tune_session(spark)
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    src = scratch_dir("kll_stream_src_")
    store = scratch_dir("kll_stream_store_")
    gc_root = scratch_dir("kll_stream_gc_")
    try:
        ev.select(
            "event_id", "ts", "user_id", "event_type", "value"
        ).repartition(4).write.mode("overwrite").json(src)
        sq = st_mon.stream_kll_quantiles(
            spark, src, store,
            k=_KLL_K, shards=_KLL_SHARDS, max_files_per_trigger=2,
        )
        sq.processAllAvailable()
        sq.stop()
        est = st_mon.kll_store_quantiles(
            spark, store, _KLL_QS, k=_KLL_K, shards=_KLL_SHARDS
        )
        st_mon.kll_compact_store(
            spark, store, gc_root, k=_KLL_K, shards=_KLL_SHARDS
        )
        est_gc = st_mon.kll_store_quantiles(
            spark, gc_root, _KLL_QS, k=_KLL_K, shards=_KLL_SHARDS
        )
        eq = (
            est.withColumnRenamed("est", "__pre")
            .join(est_gc.withColumnRenamed("est", "__post"), "q")
            .select(
                "q", (F.col("__pre") == F.col("__post")).alias("gc_identical")
            )
        )
        ranked = (
            ev.crossJoin(F.broadcast(est))
            .groupBy("q")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum(
                    (F.col("value") <= F.col("est")).cast("long")
                ).alias("__r"),
            )
        )
        n = F.col("n").cast("double")
        bound = F.lit(_KLL_EPS) * n + F.lit(1.0)
        out = (
            ranked.join(F.broadcast(eq), "q")
            .select(
                "q",
                "n",
                (
                    F.abs(F.col("__r").cast("double") - F.col("q") * n)
                    <= bound
                ).alias("rank_within_eps"),
                "gc_identical",
            )
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(store, ignore_errors=True)
        shutil.rmtree(gc_root, ignore_errors=True)


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


_SMALL_QTY_SQL = """
    SELECT p.p_brand,
           CAST(floor(sum(l.l_extendedprice) / 7.0 * 10000.0 + 0.5) AS DOUBLE)
               / 10000.0 AS avg_yearly,
           count(*) AS n_small_qty
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_quantity < (
        SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = l.l_partkey
    )
    GROUP BY p.p_brand
"""


@query("sql_small_qty_revenue", oracle=_SMALL_QTY_SQL)
def sql_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated SCALAR subquery (per-part average)
    through the SQL front door. Catalyst decorrelates it into an
    aggregate-then-join — one pass over lineitem for the averages, no
    per-row re-execution. Cross-engine exact: l_quantity is
    integer-valued, so the correlated avg is order-independent and the
    ``<`` threshold comparison cannot flip between engines; only the
    final revenue sum needs round4."""
    tune_session(spark)
    register_views(spark, sf_dir, ("lineitem", "part"))
    return spark.sql(_SMALL_QTY_SQL)


_LARGE_VOLUME_SQL = f"""
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           CAST(o.o_orderdate AS TIMESTAMP) AS o_orderdate,
           o.o_totalprice,
           {sql_round4('sum(l.l_quantity)')} AS sum_qty
    FROM customer c
    JOIN orders o   ON o.o_custkey  = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING sum(l_quantity) > 250
    )
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
"""


@query("sql_large_volume_customers", oracle=_LARGE_VOLUME_SQL)
def sql_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: IN-subquery over a grouped HAVING aggregate.
    Catalyst rewrites the IN into a left-semi join against the
    aggregated subquery (one pass over lineitem for the per-order sums,
    then a semi-join probe — no per-row subquery re-execution), then
    the 3-way join + final agg + top-100. Completes the decorrelation
    family: EXISTS (Q4 shape), correlated scalar (Q17 shape), aggregate
    IN (this). Ordering ties break on o_orderkey; l_quantity sums are
    integer-valued doubles, so the HAVING threshold cannot flip
    cross-engine — only the reported sum is round4'd."""
    tune_session(spark)
    register_views(spark, sf_dir, ("customer", "orders", "lineitem"))
    return spark.sql(_LARGE_VOLUME_SQL)


EVENT_TYPES: tuple[str, ...] = ("click", "error", "purchase", "signup", "view")


@query(
    "pivot_user_event_counts",
    oracle=f"""
    SELECT user_id,
           {", ".join(f"CAST(sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS n_{t}" for t in EVENT_TYPES)}
    FROM events
    GROUP BY user_id
    """,
)
def pivot_user_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long → wide): per-user counts, one column per event type.
    The pivot values are declared explicitly — at scale an undeclared
    pivot needs an extra distinct-values job before planning."""
    tune_session(spark)
    ev = load_table(spark, sf_dir, "events")
    wide = (
        ev.groupBy("user_id")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))
    )
    return wide.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).cast("long").alias(f"n_{t}") for t in EVENT_TYPES],
    )


@query(
    "unpivot_order_amounts",
    oracle="""
    SELECT o_orderkey, 'total' AS measure, o_totalprice AS amount FROM orders
    UNION ALL
    SELECT o_orderkey, 'half' AS measure, o_totalprice / 2.0 AS amount FROM orders
    """,
)
def unpivot_order_amounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt (wide → long) via the native unpivot operator —
    a narrow transform, no shuffle."""
    tune_session(spark)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_totalprice").alias("total"),
        (F.col("o_totalprice") / 2.0).alias("half"),
    )
    return orders.unpivot(
        ids=["o_orderkey"], values=["total", "half"],
        variableColumnName="measure", valueColumnName="amount",
    )


@query(
    "explode_embedding_positions",
    oracle="""
    SELECT vec_id,
           CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS pos,
           CAST(unnest(embedding) AS DOUBLE)                  AS component
    FROM embeddings
    WHERE vec_id < 16
    """,
)
def explode_embedding_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral explode (posexplode) of an array column into rows —
    row-count expansion is |array| per row; filter FIRST so the
    explosion happens on the pruned set."""
    tune_session(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.filter(F.col("vec_id") < 16)
        .select("vec_id", F.posexplode("embedding").alias("pos", "component"))
        .select("vec_id", "pos", F.col("component").cast("double").alias("component"))
    )


@query(
    "latest_event_per_user",
    oracle="""
    SELECT user_id,
           arg_max(event_type, ts) AS last_event_type,
           arg_max(value, ts)      AS last_value,
           max(ts)                 AS last_ts
    FROM events
    GROUP BY user_id
    """,
)
def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/arg_max: latest row's attributes per group in ONE hash agg
    — no self-join back, no window sort. (ts values are unique in the
    corpus; ties would need a composite ordering key.)"""
    tune_session(spark)
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.max_by("event_type", "ts").alias("last_event_type"),
        F.max_by("value", "ts").alias("last_value"),
        F.max("ts").alias("last_ts"),
    )


_BALANCE_PROSPECTS_SQL = """
    WITH avg_bal AS (
        SELECT CAST(floor(avg(c_acctbal) * 10000.0 + 0.5) AS DOUBLE) / 10000.0
                   AS threshold
        FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c.c_mktsegment AS segment,
           count(*) AS n_prospects,
           CAST(floor(sum(c.c_acctbal) * 10000.0 + 0.5) AS DOUBLE) / 10000.0
               AS total_bal
    FROM customer c, avg_bal a
    WHERE c.c_acctbal > a.threshold
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY c.c_mktsegment
"""


@query("sql_balance_prospects", oracle=_BALANCE_PROSPECTS_SQL)
def sql_balance_prospects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: uncorrelated scalar subquery (global average
    balance) + correlated NOT EXISTS (customers above the average
    balance with no urgent orders), through the SQL front door.
    Catalyst plans the scalar as a one-row broadcast (computed once,
    never per row) and decorrelates NOT EXISTS into a left-anti join —
    completing the decorrelation family (EXISTS/Q4, scalar/Q17,
    aggregate-IN/Q18). The threshold is round4'd INSIDE the query on
    both engines, so the avg's summation-order ulp difference cannot
    flip the comparison for a customer sitting exactly on the boundary."""
    tune_session(spark)
    register_views(spark, sf_dir, ("customer", "orders"))
    return spark.sql(_BALANCE_PROSPECTS_SQL)


_RETURNED_ITEM_SQL = f"""
    SELECT c.c_custkey AS custkey,
           c.c_name AS name,
           n.n_name AS nation,
           {sql_round4("sum(l.l_extendedprice * (1 - l.l_discount))")} AS revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1996-04-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, custkey
    LIMIT 20
"""


@query("sql_returned_item_report", oracle=_RETURNED_ITEM_SQL)
def sql_returned_item_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by returned-item revenue in a
    quarter — fact⋈fact⋈dim⋈dim star with a date-range predicate,
    through the SQL front door. The o_orderdate and l_returnflag
    filters push to the parquet scans BEFORE the joins (Catalyst
    filter pushdown); customer/nation broadcast. The top-20 is ordered
    by the round4'd revenue with a custkey tie-break, so the cross-row
    summation-order ulp between engines cannot reorder the cut."""
    tune_session(spark)
    register_views(spark, sf_dir, ("customer", "orders", "lineitem", "nation"))
    return spark.sql(_RETURNED_ITEM_SQL)


@query(
    "order_price_histogram",
    oracle=f"""
    SELECT CAST(floor(o_totalprice / 25000.0) AS BIGINT) AS bin,
           {sql_round4('floor(o_totalprice / 25000.0) * 25000.0')} AS bin_lo,
           CAST(count(*) AS BIGINT) AS n_orders,
           {sql_round4('sum(o_totalprice)')} AS total_price
    FROM orders
    GROUP BY bin, bin_lo
    """,
)
def order_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram over order totals (the width_bucket
    pattern with explicit edge math so both engines bin identically:
    o_totalprice is double, /25000.0 and floor are the same IEEE ops).
    Shape at scale: bin id computed scan-side → ONE hash agg with
    map-side combine; the histogram frame is as small as the bin count
    regardless of input size."""
    tune_session(spark)
    orders = load_table(spark, sf_dir, "orders")
    b = F.floor(F.col("o_totalprice") / F.lit(25000.0))
    return orders.groupBy(
        b.cast("long").alias("bin"),
        round4(b * F.lit(25000.0)).alias("bin_lo"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        round4(F.sum("o_totalprice")).alias("total_price"),
    )


_PROFILE_COLS = [
    ("o_orderkey", True), ("o_custkey", True), ("o_orderstatus", False),
    ("o_totalprice", True), ("o_orderdate", False), ("o_orderpriority", False),
]

_PROFILE_ORACLE = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS "column",
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) - count({c}) AS BIGINT) AS n_nulls,
           CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
           {f'CAST(min({c}) AS DOUBLE)' if num else 'CAST(NULL AS DOUBLE)'} AS min_value,
           {f'CAST(max({c}) AS DOUBLE)' if num else 'CAST(NULL AS DOUBLE)'} AS max_value
    FROM orders"""
    for c, num in _PROFILE_COLS
)


@query("profile_orders_columns", oracle=_PROFILE_ORACLE)
def profile_orders_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style column profile of the orders table in ONE pass
    (operators/profiling.py:profile_columns): row/null/exact-distinct
    counts for every column, numeric min/max as doubles. min/max are
    exact data values (no cross-row arithmetic), so no rounding is
    needed for the cross-engine compare."""
    tune_session(spark)
    from lab3_lakehouse_spark.operators.profiling import profile_columns

    orders = load_table(spark, sf_dir, "orders")
    return profile_columns(orders)


def _fd_oracle_leg(table: str, lhs: list[str], rhs: str) -> str:
    name = f"{','.join(lhs)}->{rhs}"
    keys = ", ".join(lhs)
    return f"""SELECT '{name}' AS fd,
           CAST(count(*) AS BIGINT) AS n_lhs,
           CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_violating,
           sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) = 0 AS fd_holds
    FROM (SELECT {keys}, count(DISTINCT {rhs}) AS nd
          FROM {table} GROUP BY {keys})"""


_FD_CANDIDATES = [
    ("orders", ["o_orderkey"], "o_custkey"),       # key FD — must hold
    ("orders", ["o_custkey"], "o_orderpriority"),  # expected violated
    ("orders", ["o_orderdate"], "o_orderstatus"),  # expected violated
    ("lineitem", ["l_orderkey"], "l_shipdate"),    # expected violated
    ("lineitem", ["l_orderkey", "l_linenumber"], "l_shipdate"),  # key FD
]

_FD_ORACLE = "\nUNION ALL\n".join(
    _fd_oracle_leg(t, lhs, rhs) for t, lhs, rhs in _FD_CANDIDATES
)


@query("functional_dependency_audit", oracle=_FD_ORACLE)
def functional_dependency_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-FD validation (the data-quality primitive behind FD
    discovery à la Metanome, re-derived): for each declared candidate
    ``lhs → rhs``, count LHS values that determine more than one
    distinct RHS — zero violations iff the dependency holds. The
    candidate list mixes key FDs that MUST hold (o_orderkey →
    o_custkey; (l_orderkey, l_linenumber) → l_shipdate) with
    plausible-but-false ones, so the audit's both verdicts are
    exercised. This is the schema-contract check run before relying on
    a column as a join key or a dedup grain.

    Scale: one grouped countDistinct per candidate (map-side partial
    agg, one keyed shuffle each), candidates independent — a sweep of
    hundreds of FDs parallelizes trivially and each output is one
    row."""
    from lab3_lakehouse_spark.operators.profiling import fd_violation_stats

    tune_session(spark)
    frames = []
    for table, lhs, rhs in _FD_CANDIDATES:
        df = load_table(spark, sf_dir, table)
        frames.append(fd_violation_stats(df, lhs, rhs))
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


@query(
    "hll_mergeable_daily_users",
    oracle="""
    WITH per_day AS (
        SELECT date_trunc('day', ts) AS day,
               count(DISTINCT user_id) AS n_exact
        FROM events GROUP BY day
    )
    SELECT CAST(count(*) AS BIGINT) AS n_days,
           (SELECT count(DISTINCT user_id) FROM events) AS n_users_exact,
           true AS all_days_within_3pct,
           true AS merged_within_3pct
    FROM per_day
    """,
)
def hll_mergeable_daily_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE distinct-count rollup (operators/aggregate.py:
    hll_sketch_rollup/hll_merge): per-day Datasketches-HLL sketches of
    user_id, then a lossless union to the global estimate — the
    store-sketches-not-numbers pattern continuous aggregates need at
    100 TB (a number can't roll up; a sketch can, without rescanning
    raw events). Assert-style oracle: every per-day estimate and the
    merged global estimate must sit within 3% of the exact counts."""
    tune_session(spark)
    from lab3_lakehouse_spark.operators import aggregate as agg_ops

    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_trunc("day", F.col("ts"))
    )
    sk = agg_ops.hll_sketch_rollup(ev, ["day"], "user_id").localCheckpoint(
        eager=False
    )
    per_day = sk.select(
        "day", F.hll_sketch_estimate("hll").alias("est")
    ).join(
        ev.groupBy("day").agg(F.count_distinct("user_id").alias("n_exact")),
        "day",
    )
    day_ok = per_day.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.min(
            F.abs(F.col("est") - F.col("n_exact"))
            <= F.lit(0.03) * F.col("n_exact")
        ).alias("all_days_within_3pct"),
    )
    merged = agg_ops.hll_merge(sk, []).select(
        F.col("n_distinct_est").alias("est_global")
    )
    exact = ev.agg(F.count_distinct("user_id").alias("n_users_exact"))
    return (
        day_ok.crossJoin(merged)
        .crossJoin(exact)
        .select(
            F.col("n_days").cast("long").alias("n_days"),
            "n_users_exact",
            "all_days_within_3pct",
            (
                F.abs(F.col("est_global") - F.col("n_users_exact"))
                <= F.lit(0.03) * F.col("n_users_exact")
            ).alias("merged_within_3pct"),
        )
    )


@query(
    "approx_top_tokens_contract",
    oracle="""
    WITH counts AS (
        SELECT tok AS token, count(*) AS cnt
        FROM (SELECT unnest(regexp_split_to_array(lower(text), '\\s+')) AS tok
              FROM documents)
        GROUP BY tok
    )
    SELECT CAST(10 AS BIGINT) AS n_reported,
           true AS all_counts_exact,
           (SELECT max(cnt) FROM counts) AS max_token_cnt
    """,
)
def approx_top_tokens_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``approx_top_k`` (Datasketches frequent-items) over the token
    stream — the sketch path for heavy hitters when the vocabulary
    outgrows memory. Under capacity the sketch is EXACT, so the
    contract asserts every reported count equals the exact count and
    the max matches — checkable cross-engine while still executing the
    production sketch plan (one agg, no full-vocab shuffle)."""
    tune_session(spark)
    from lab3_lakehouse_spark.operators.dedup import tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tokens("text")).alias("token")).localCheckpoint(
        eager=False
    )
    top = toks.agg(
        F.expr("approx_top_k(token, 10)").alias("tk")
    ).select(F.explode("tk").alias("t")).select(
        F.col("t.item").alias("token"), F.col("t.count").alias("est")
    )
    exact = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    joined = top.join(exact, "token")
    return joined.agg(
        F.count(F.lit(1)).cast("long").alias("n_reported"),
        F.min(F.col("est") == F.col("cnt")).alias("all_counts_exact"),
        F.max("cnt").alias("max_token_cnt"),
    )


@query(
    "equi_depth_price_buckets",
    oracle="""
    WITH b AS (
        SELECT quantile_cont(o_totalprice, [0.25, 0.5, 0.75]) AS bs
        FROM orders
    )
    SELECT CAST(CASE WHEN o_totalprice <= bs[1] THEN 0
                     WHEN o_totalprice <= bs[2] THEN 1
                     WHEN o_totalprice <= bs[3] THEN 2
                     ELSE 3 END AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(floor(sum(o_totalprice) * 10000.0 + 0.5) AS DOUBLE) / 10000.0
               AS total_price
    FROM orders, b
    GROUP BY bucket
    """,
)
def equi_depth_price_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (quartile) histogram: exact interpolated quartile
    boundaries, then bucket counts/sums — the complement of the
    fixed-width histogram for skewed distributions. Both engines use
    linear interpolation on the sorted values, and a bucket edge can
    only coincide with a data value when the two straddling order
    statistics are equal (in which case both engines produce exactly
    that value) — so the <=-bucketing cannot diverge cross-engine.
    Scale shape: ONE percentile pass (sort-based agg to a 1-row frame),
    broadcast to the scan, one hash agg on the 4-row bucket key."""
    tune_session(spark)
    orders = load_table(spark, sf_dir, "orders")
    b = orders.agg(
        F.percentile("o_totalprice", F.lit([0.25, 0.5, 0.75])).alias("bs")
    )
    p = F.col("o_totalprice")
    bucket = (
        F.when(p <= F.col("bs")[0], 0)
        .when(p <= F.col("bs")[1], 1)
        .when(p <= F.col("bs")[2], 2)
        .otherwise(3)
    )
    return (
        orders.crossJoin(F.broadcast(b))
        .groupBy(bucket.cast("long").alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            round4(F.sum(p)).alias("total_price"),
        )
    )


@query(
    "lineitem_stat_moments",
    oracle=f"""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           {sql_round4('corr(l_quantity, l_extendedprice)')} AS qty_price_corr,
           {sql_round4('covar_samp(l_quantity, l_extendedprice)')} AS qty_price_covar,
           {sql_round4('stddev_samp(l_quantity)')} AS qty_stddev,
           {sql_round4('var_samp(l_extendedprice)')} AS price_var
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def lineitem_stat_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-moment statistical aggregates per group: Pearson
    correlation, sample covariance/variance/stddev — the numeric
    profiling layer over a fact table. All are one-pass co-moment
    aggregations (partial + final combine, one shuffle of constant
    width); cross-row accumulation order differs between engines, so
    every moment is round4'd — the catalog's standard policy."""
    tune_session(spark)
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        round4(F.corr("l_quantity", "l_extendedprice")).alias("qty_price_corr"),
        round4(F.covar_samp("l_quantity", "l_extendedprice")).alias("qty_price_covar"),
        round4(F.stddev_samp("l_quantity")).alias("qty_stddev"),
        round4(F.var_samp("l_extendedprice")).alias("price_var"),
    )


@query(
    "event_value_trends",
    oracle=f"""
    WITH pts AS (
        SELECT event_type,
               epoch_us(ts) / 86400000000.0 AS x,
               value AS y
        FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           {sql_round4('CASE WHEN var_samp(x) > 0 THEN covar_samp(x, y) / var_samp(x) END')} AS slope_per_day,
           {sql_round4('CASE WHEN var_samp(x) > 0 THEN avg(y) - covar_samp(x, y) / var_samp(x) * avg(x) END')}
               AS intercept
    FROM pts
    GROUP BY event_type
    """,
)
def event_value_trends(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group ordinary-least-squares trend (slope per day +
    intercept) in CLOSED FORM: slope = covar/var, intercept from the
    means — regression as pure one-pass aggregates (no ML fit, no
    per-group Python). The 100 TB shape: constant-width co-moment
    partials, one shuffle, however many rows. Time enters as exact
    integer microseconds scaled to days (fractional-second safe)."""
    tune_session(spark)
    ev = load_table(spark, sf_dir, "events")
    x = (F.unix_micros(F.col("ts")) / F.lit(86400000000.0)).alias("x")
    pts = ev.select("event_type", x, F.col("value").alias("y"))
    # degenerate groups (one point, or all points at one timestamp)
    # would give 0/0 = NaN in Spark but NULL in DuckDB — gate on
    # var > 0 so both engines emit NULL
    defined = F.var_samp("x") > 0
    slope = F.when(defined, F.covar_samp("x", "y") / F.var_samp("x"))
    return pts.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        round4(slope).alias("slope_per_day"),
        round4(F.when(defined, F.avg("y") - F.covar_samp("x", "y") / F.var_samp("x") * F.avg("x"))).alias("intercept"),
    )
