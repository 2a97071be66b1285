"""Mutation surface: MERGE / CDC-apply / SCD2 as oracle-checked queries.

The reference's tiers are Delta but write-once (``etl_pipeline.py:66-69``
only ever ``mode("overwrite")``); the mutation operators in
operators/merge.py fill that gap. Each query builds a DETERMINISTIC
change batch out of the corpus itself (key-modulus selections — no
randomness, no timestamps) and applies it, so the DuckDB oracle can
reconstruct the exact same merge with plain SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lab3_lakehouse_spark.catalog import load_table
from lab3_lakehouse_spark.operators import merge as merge_ops
from lab3_lakehouse_spark.queries._util import round4, sql_round4
from lab3_lakehouse_spark.queries.registry import query
from lab3_lakehouse_spark.session import tune_session


def _orders_cdc_batch(orders: DataFrame) -> DataFrame:
    """Deterministic CDC batch: updates (key%10==0, not %100), inserts
    (key%1000==0, shifted key space), deletes (key%100==0). Key sets are
    disjoint → at most one change row per target key, as MERGE requires."""
    updates = (
        orders.filter((F.col("o_orderkey") % 10 == 0) & (F.col("o_orderkey") % 100 != 0))
        .withColumn("o_orderstatus", F.lit("U"))
        .withColumn("o_totalprice", F.col("o_totalprice") * 1.1)
        .withColumn("__op", F.lit(merge_ops.OP_UPSERT))
    )
    inserts = (
        orders.filter(F.col("o_orderkey") % 1000 == 0)
        .withColumn("o_orderkey", F.col("o_orderkey") + 10_000_000)
        .withColumn("o_orderstatus", F.lit("N"))
        .withColumn("__op", F.lit(merge_ops.OP_UPSERT))
    )
    deletes = orders.filter(F.col("o_orderkey") % 100 == 0).withColumn(
        "__op", F.lit(merge_ops.OP_DELETE)
    )
    return updates.unionByName(inserts).unionByName(deletes)


_CDC_ORACLE = f"""
    WITH upserts AS (
        SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
               o_totalprice * 1.1 AS o_totalprice, o_orderpriority
        FROM orders WHERE o_orderkey % 10 = 0 AND o_orderkey % 100 <> 0
        UNION ALL
        SELECT o_orderkey + 10000000, o_custkey, 'N', o_totalprice, o_orderpriority
        FROM orders WHERE o_orderkey % 1000 = 0
    ),
    touched AS (
        SELECT o_orderkey FROM upserts
        UNION ALL
        SELECT o_orderkey FROM orders WHERE o_orderkey % 100 = 0
    )
    SELECT o_orderkey, o_custkey, o_orderstatus,
           {sql_round4('o_totalprice')} AS o_totalprice, o_orderpriority
    FROM (
        SELECT * FROM upserts
        UNION ALL
        SELECT t.o_orderkey, t.o_custkey, t.o_orderstatus, t.o_totalprice, t.o_orderpriority
        FROM orders t ANTI JOIN touched s ON t.o_orderkey = s.o_orderkey
    )
"""


@query("merge_cdc_orders", oracle=_CDC_ORACLE)
def merge_cdc_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-MERGE-equivalent CDC apply on ``orders``: one batch carrying
    updates, inserts, and deletes, merged in a single key-shuffle outer
    join (the snapshot side stays put when the batch is broadcast)."""
    tune_session(spark)
    orders = load_table(spark, sf_dir, "orders")
    merged = merge_ops.cdc_apply(
        orders, _orders_cdc_batch(orders), ["o_orderkey"], broadcast_source=True
    )
    return merged.select(
        "o_orderkey", "o_custkey", "o_orderstatus",
        round4(F.col("o_totalprice")).alias("o_totalprice"),
        "o_orderpriority",
    )


_SCD2_ORACLE = """
    WITH cur AS (
        SELECT o_custkey, o_orderpriority AS priority, min(o_orderdate) AS valid_from
        FROM orders WHERE o_orderkey % 3 = 0
        GROUP BY o_custkey, o_orderpriority
        QUALIFY row_number() OVER (PARTITION BY o_custkey ORDER BY min(o_orderdate), o_orderpriority) = 1
    ),
    upd AS (
        SELECT o_custkey, min(o_orderpriority) AS priority
        FROM orders WHERE o_orderkey % 3 = 1
        GROUP BY o_custkey
    ),
    changed AS (
        SELECT u.o_custkey, u.priority
        FROM upd u LEFT JOIN cur c ON u.o_custkey = c.o_custkey
        WHERE c.o_custkey IS NULL OR u.priority <> c.priority
    )
    SELECT c.o_custkey, c.priority, c.valid_from,
           CASE WHEN ch.o_custkey IS NOT NULL
                THEN TIMESTAMP '2000-01-01' END       AS valid_to,
           ch.o_custkey IS NULL                       AS is_current
    FROM cur c LEFT JOIN changed ch ON c.o_custkey = ch.o_custkey
    UNION ALL
    SELECT o_custkey, priority, TIMESTAMP '2000-01-01', NULL, true FROM changed
"""


@query("scd2_customer_priority", oracle=_SCD2_ORACLE)
def scd2_customer_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 history maintenance: seed a current-only dimension from one
    deterministic slice of ``orders``, apply a second slice as the update
    batch, and emit the versioned history (closed + current rows). Only
    the current slice joins the batch — closed history never shuffles."""
    tune_session(spark)
    orders = load_table(spark, sf_dir, "orders")
    seed = (
        orders.filter(F.col("o_orderkey") % 3 == 0)
        .groupBy("o_custkey", F.col("o_orderpriority").alias("priority"))
        .agg(F.min("o_orderdate").alias("valid_from"))
        .withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy("o_custkey").orderBy("valid_from", "priority")
            ),
        )
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        .withColumn("valid_to", F.lit(None).cast("timestamp"))
        .withColumn("is_current", F.lit(True))
    )
    updates = (
        orders.filter(F.col("o_orderkey") % 3 == 1)
        .groupBy("o_custkey")
        .agg(F.min("o_orderpriority").alias("priority"))
    )
    return merge_ops.scd2_apply(
        seed, updates,
        keys=["o_custkey"], tracked_cols=["priority"],
        effective_ts=F.lit("2000-01-01").cast("timestamp"),
    )


@query(
    "incremental_rollup_hourly",
    oracle=f"""
    SELECT event_type,
           date_trunc('hour', ts) AS bucket_ts,
           count(*) AS n_rows,
           {sql_round4('sum(value)')} AS total,
           {sql_round4('sum(value)')} / count(*) AS mean,
           min(value) AS vmin,
           max(value) AS vmax
    FROM events
    GROUP BY event_type, date_trunc('hour', ts)
    """,
)
def incremental_rollup_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate maintenance: the hourly per-type rollup is
    built INCREMENTALLY — two disjoint batches (event_id modulus; no
    randomness) refreshed one after the other into a persisted partials
    tier — then finalized. The oracle is the one-shot GROUP BY over all
    events: incremental merge must equal full recompute. Counts/min/max
    are exact; double totals carry ULP drift from the extra partial-sum
    level, absorbed by round4 (the corpus values are 2-decimal, so
    rounded totals never sit on a floor boundary) — and ``mean`` is
    derived from the ROUNDED total, because raw sum/count with
    power-of-2 counts lands exactly on round4 half-boundaries, where an
    ULP decides the digit."""
    import shutil
    import tempfile

    from lab3_lakehouse_spark.operators import rollup as rollup_ops

    tune_session(spark)
    ev = load_table(spark, sf_dir, "events")
    tmp = tempfile.mkdtemp(prefix="rollup_hourly_")
    path = f"{tmp}/hourly"
    try:
        for residue in (0, 1):
            batch = ev.filter(F.pmod("event_id", F.lit(2)) == residue)
            rollup_ops.refresh_rollup(
                spark, path, batch,
                ts_col="ts", bucket="hour", keys=["event_type"], value_col="value",
            )
        rolled = spark.read.parquet(path)
        total4 = round4(F.col("total"))
        out = rollup_ops.finalize(rolled, ["event_type"]).select(
            "event_type", "bucket_ts", "n_rows",
            total4.alias("total"),
            (total4 / F.col("n_rows")).alias("mean"),
            "vmin", "vmax",
        )
        # Pin the finalized frame in executor block storage (eager
        # localCheckpoint truncates lineage) so the temp tier can be
        # deleted — result stays distributed, no driver round-trip.
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


_SNAPSHOT_DIFF_ORACLE = f"""
    SELECT o_orderkey, 'changed' AS change_type,
           o_orderstatus AS old_o_orderstatus,
           'U' AS new_o_orderstatus,
           {sql_round4('o_totalprice')} AS old_o_totalprice,
           {sql_round4('o_totalprice * 1.1')} AS new_o_totalprice
    FROM orders WHERE o_orderkey % 10 = 0 AND o_orderkey % 100 <> 0
    UNION ALL
    SELECT o_orderkey, 'removed', o_orderstatus, CAST(NULL AS VARCHAR),
           {sql_round4('o_totalprice')}, CAST(NULL AS DOUBLE)
    FROM orders WHERE o_orderkey % 100 = 0
    UNION ALL
    SELECT o_orderkey + 10000000, 'added', CAST(NULL AS VARCHAR), 'N',
           CAST(NULL AS DOUBLE), {sql_round4('o_totalprice')}
    FROM orders WHERE o_orderkey % 1000 = 0
"""


@query("snapshot_diff_orders", oracle=_SNAPSHOT_DIFF_ORACLE)
def snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Version diff (change-data-feed reconstruction): apply the
    deterministic CDC batch to ``orders``, then diff the NEW snapshot
    against the OLD one with operators/merge.py:snapshot_diff — the
    diff must recover exactly the batch's added/removed/changed
    classification (which is what the oracle enumerates directly from
    the modulus definitions). One full outer join on the snapshot key;
    unchanged keys — the overwhelming majority at scale — are dropped
    before anything else happens, so the diff output is delta-sized."""
    tune_session(spark)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    merged = merge_ops.cdc_apply(
        load_table(spark, sf_dir, "orders"),
        _orders_cdc_batch(load_table(spark, sf_dir, "orders")),
        ["o_orderkey"],
        broadcast_source=True,
    ).select("o_orderkey", "o_orderstatus", "o_totalprice")
    diff = merge_ops.snapshot_diff(
        orders, merged, keys=["o_orderkey"],
        compare_cols=["o_orderstatus", "o_totalprice"],
    )
    return diff.select(
        "o_orderkey", "change_type",
        "old_o_orderstatus", "new_o_orderstatus",
        round4(F.col("old_o_totalprice")).alias("old_o_totalprice"),
        round4(F.col("new_o_totalprice")).alias("new_o_totalprice"),
    )

_RETRACTION_ORACLE = f"""
    WITH upserts AS (
        SELECT o_orderkey, o_custkey, o_totalprice * 1.1 AS o_totalprice
        FROM orders WHERE o_orderkey % 10 = 0 AND o_orderkey % 100 <> 0
        UNION ALL
        SELECT o_orderkey + 10000000, o_custkey, o_totalprice
        FROM orders WHERE o_orderkey % 1000 = 0
    ),
    touched AS (
        SELECT o_orderkey FROM upserts
        UNION ALL
        SELECT o_orderkey FROM orders WHERE o_orderkey % 100 = 0
    ),
    final AS (
        SELECT o_custkey, o_totalprice FROM upserts
        UNION ALL
        SELECT t.o_custkey, t.o_totalprice
        FROM orders t ANTI JOIN touched s ON t.o_orderkey = s.o_orderkey
    )
    SELECT o_custkey,
           CAST(count(*) AS BIGINT) AS n_orders,
           {sql_round4('sum(o_totalprice)')} AS total_spend
    FROM final GROUP BY o_custkey
"""


@query("incremental_agg_retractions", oracle=_RETRACTION_ORACLE)
def incremental_agg_retractions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retraction-based incremental aggregate maintenance — the
    differential-dataflow shape every streaming SQL engine uses for
    UPDATE/DELETE under a grouped view: the stored per-customer
    (count, sum) view absorbs a CDC batch as SIGNED DELTAS instead of
    recomputing. Deletes retract (−1, −old); updates retract the old
    row and add the new one (net 0, Δprice); inserts add (+1, new);
    groups whose maintained count hits 0 disappear — exactly the
    retraction stream a changelog consumer emits. The oracle recomputes
    the view from the post-CDC table: maintenance must equal recompute.

    Plan shape: the view-update path touches the BATCH, not the fact
    table — old values come from ONE broadcast-batch semi-lookup
    against the snapshot (batch keys broadcast; the snapshot is
    scanned, never shuffled), deltas aggregate partially map-side, and
    the maintained view updates via one keyed outer join on the
    ≤ |view| delta frame. The base view build here stands in for the
    already-materialized view of a real deployment (same stand-in as
    incremental_join_maintenance). Uses the SAME deterministic CDC
    batch as merge_cdc_orders (key-modulus slices)."""
    tune_session(spark)
    orders = load_table(spark, sf_dir, "orders")
    base_view = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("o_totalprice").alias("total_spend"),
    )
    batch = _orders_cdc_batch(orders)
    # old rows for every touched key that EXISTS in the snapshot — the
    # batch key set is broadcast, the snapshot is never shuffled
    old_rows = orders.join(
        F.broadcast(batch.select("o_orderkey").distinct()), "o_orderkey"
    )
    retract = old_rows.select(
        "o_custkey",
        F.lit(-1).cast("long").alias("__dn"),
        (-F.col("o_totalprice")).alias("__ds"),
    )
    add = batch.filter(F.col("__op") == merge_ops.OP_UPSERT).select(
        "o_custkey",
        F.lit(1).cast("long").alias("__dn"),
        F.col("o_totalprice").alias("__ds"),
    )
    delta = (
        retract.unionByName(add)
        .groupBy("o_custkey")
        .agg(F.sum("__dn").alias("__dn"), F.sum("__ds").alias("__ds"))
    )
    zero_l = F.lit(0).cast("long")
    maintained = (
        base_view.join(delta, "o_custkey", "full_outer")
        .select(
            "o_custkey",
            (
                F.coalesce("n_orders", zero_l) + F.coalesce("__dn", zero_l)
            ).alias("n_orders"),
            (
                F.coalesce("total_spend", F.lit(0.0))
                + F.coalesce("__ds", F.lit(0.0))
            ).alias("total_spend"),
        )
        .filter(F.col("n_orders") > 0)
    )
    return maintained.select(
        "o_custkey", "n_orders", round4(F.col("total_spend")).alias("total_spend")
    )
