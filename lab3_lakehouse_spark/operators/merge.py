"""MERGE / upsert / CDC-apply — the lakehouse mutation surface.

The reference manages its tiers with Delta (``etl_pipeline.py:66-69``)
but only ever overwrites; it has no MERGE, upsert, or CDC story. Real
medallion pipelines live on exactly that: silver tiers are maintained by
applying change batches to the previous snapshot, not by full rewrites.
This module provides Delta-``MERGE``-equivalent semantics as a pure
DataFrame transform, so it works on parquet tiers (this container has no
delta-spark) and drops onto ``DeltaTable.merge`` unchanged when Delta is
installed (``sources/medallion.merge_into`` picks the native path).

Scale notes (100 TB):
- the only shuffle is on the merge keys (both sides hash-partitioned by
  key for the outer join); with a small change batch pass
  ``broadcast_source=True`` and the snapshot side never shuffles at all;
- rows ride the join as-is — no collect, no driver loop;
- on Delta, file-level pruning makes this touch only matched files; the
  parquet fallback is a full-snapshot rewrite, which is the honest
  non-transactional floor.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: CDC operation column values understood by ``cdc_apply``.
OP_UPSERT = "U"
OP_DELETE = "D"


def _assert_unique_keys(df: DataFrame, keys: list[str], side: str) -> None:
    dup = df.groupBy(*keys).count().filter(F.col("count") > 1).limit(1).collect()
    if dup:
        raise ValueError(
            f"{side} has duplicate merge keys (e.g. {dup[0].asDict()}); "
            "MERGE requires at most one source row per target row "
            "(same contract as Delta's MERGE)."
        )


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    delete_condition: Column | None = None,
    broadcast_source: bool = False,
    validate_unique_source: bool = False,
) -> DataFrame:
    """Delta-MERGE semantics as a DataFrame transform.

    - matched & ``delete_condition`` (over source cols) → row dropped
    - matched otherwise → target row replaced by the source row
    - source-only → inserted
    - target-only → kept unchanged

    Column set of the result == column set of ``target``; ``source``
    must carry all target columns (extra source columns are ignored).
    ``validate_unique_source`` runs an extra key-uniqueness agg over the
    source (one pass over the *batch*, not the snapshot) — cheap
    insurance for CDC feeds that can double-emit.
    """
    if validate_unique_source:
        _assert_unique_keys(source, keys, "source")
    if broadcast_source:
        return _merge_broadcast(target, source, keys, delete_condition)
    if delete_condition is not None:
        # evaluate on the raw source — the condition may use columns
        # (e.g. a CDC op tag) that are not part of the target schema
        deletes = source.filter(delete_condition).select(*keys)
        src = source.filter(~delete_condition).select(*target.columns)
    else:
        deletes = None
        src = source.select(*target.columns)
    # explicit presence marker: the join is null-safe on keys, so a NULL
    # key can legitimately match — `__s.key IS NOT NULL` cannot detect it
    src = src.withColumn("__src_present", F.lit(True))
    t, s = target.alias("__t"), src.alias("__s")
    cond = [F.col(f"__t.{k}").eqNullSafe(F.col(f"__s.{k}")) for k in keys]
    merged = t.join(s, on=cond, how="full_outer").select(
        *[
            F.when(F.col("__s.__src_present"), F.col(f"__s.{c}"))
            .otherwise(F.col(f"__t.{c}"))
            .alias(c)
            for c in target.columns
        ]
    )
    if deletes is not None:
        # eqNullSafe, matching the broadcast path and Delta's `<=>`: a
        # delete row with a NULL merge key must remove the NULL-keyed
        # target row (name-based `=` would never match it).
        m, d = merged.alias("__m"), deletes.alias("__d")
        merged = m.join(
            d,
            on=[F.col(f"__m.{k}").eqNullSafe(F.col(f"__d.{k}")) for k in keys],
            how="left_anti",
        )
    return merged


def _merge_broadcast(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    delete_condition: Column | None,
) -> DataFrame:
    """Small-batch MERGE with ZERO snapshot shuffles.

    The general path's full-outer join sort-merge-shuffles the whole
    snapshot on the merge keys — at 100 TB that shuffle IS the cost of
    the merge. When the batch broadcasts, two broadcast-joined scans do
    the same work:
      1. snapshot LEFT JOIN broadcast(batch): update / delete / keep;
      2. snapshot keys SEMI JOIN broadcast(batch keys) → matched keys
         (≤ |batch| after distinct), and batch ANTI matched → inserts.
    """
    cols = target.columns
    marked = source.withColumn("__src_present", F.lit(True))
    t, s = target.alias("__t"), F.broadcast(marked).alias("__s")
    cond = [F.col(f"__t.{k}").eqNullSafe(F.col(f"__s.{k}")) for k in keys]
    joined = t.join(s, on=cond, how="left")
    present = F.coalesce(F.col("__s.__src_present"), F.lit(False))
    if delete_condition is not None:
        joined = joined.filter(~(present & delete_condition))
    updated = joined.select(
        *[F.when(present, F.col(f"__s.{c}")).otherwise(F.col(f"__t.{c}")).alias(c) for c in cols]
    )
    tk, sk = target.select(*keys).alias("__a"), source.select(*keys).alias("__b")
    kcond = [F.col(f"__a.{k}").eqNullSafe(F.col(f"__b.{k}")) for k in keys]
    matched = tk.join(F.broadcast(sk), on=kcond, how="left_semi").distinct()
    upserts = (
        source.filter(~delete_condition) if delete_condition is not None else source
    ).alias("__b")
    inserts = upserts.join(
        F.broadcast(matched.alias("__a")), on=kcond, how="left_anti"
    ).select(*cols)
    return updated.unionByName(inserts)


def cdc_apply(
    target: DataFrame,
    changes: DataFrame,
    keys: list[str],
    op_col: str = "__op",
    broadcast_source: bool = False,
) -> DataFrame:
    """Apply a CDC change batch (rows tagged ``__op`` in {'U','D'}) to a
    snapshot: 'U' upserts (update if matched, insert if not), 'D'
    deletes. The standard "apply changes into" operator of streaming
    lakehouse pipelines; pair with ``foreachBatch`` for the streaming
    tier (each micro-batch is one ``cdc_apply``).
    """
    return merge_upsert(
        target,
        changes,
        keys,
        delete_condition=F.col(op_col) == F.lit(OP_DELETE),
        broadcast_source=broadcast_source,
    )


def scd2_apply(
    history: DataFrame,
    updates: DataFrame,
    keys: list[str],
    tracked_cols: list[str],
    effective_ts: Column,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    is_current: str = "is_current",
) -> DataFrame:
    """Slowly-changing-dimension type 2: close the current version of
    every key whose tracked columns changed (``valid_to`` := batch
    timestamp, ``is_current`` := false) and append the new version.
    Unchanged keys and already-closed history pass through untouched.

    ``history`` carries ``keys + tracked_cols + valid_from/valid_to/
    is_current``; ``updates`` carries ``keys + tracked_cols``. One
    key-shuffle join against the *current* slice only — closed history
    never moves.
    """
    cur = history.filter(F.col(is_current))
    closed = history.filter(~F.col(is_current))
    changed_pred = None
    for c in tracked_cols:
        p = ~F.col(f"__u.{c}").eqNullSafe(F.col(f"__c.{c}"))
        changed_pred = p if changed_pred is None else (changed_pred | p)
    u, c_ = updates.alias("__u"), cur.alias("__c")
    joined = u.join(c_, on=[F.col(f"__u.{k}").eqNullSafe(F.col(f"__c.{k}")) for k in keys], how="left")
    # new versions: brand-new keys, or keys whose tracked values changed
    new_rows = joined.filter(
        F.col(f"__c.{keys[0]}").isNull() | changed_pred
    ).select(
        *[F.col(f"__u.{k}").alias(k) for k in keys],
        *[F.col(f"__u.{c}").alias(c) for c in tracked_cols],
        effective_ts.alias(valid_from),
        F.lit(None).cast("timestamp").alias(valid_to),
        F.lit(True).alias(is_current),
    )
    changed_keys = new_rows.select(*keys)
    # close the superseded current versions
    to_close = cur.join(changed_keys, on=keys, how="left_semi").select(
        *keys, *tracked_cols,
        F.col(valid_from),
        effective_ts.alias(valid_to),
        F.lit(False).alias(is_current),
    )
    untouched_cur = cur.join(changed_keys, on=keys, how="left_anti")
    cols = [*keys, *tracked_cols, valid_from, valid_to, is_current]
    return (
        closed.select(*cols)
        .unionByName(untouched_cur.select(*cols))
        .unionByName(to_close)
        .unionByName(new_rows)
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
    change_col: str = "change_type",
) -> DataFrame:
    """Table diff between two snapshot versions: one row per key that
    was 'added', 'removed', or 'changed' (unchanged keys are filtered
    out — at 100 TB the diff is small even when the snapshots are not).
    The inverse of :func:`cdc_apply`: ``snapshot_diff(t, cdc_apply(t,
    batch, keys), keys)`` recovers the batch's classification, which is
    exactly how lakehouse CDF (change-data-feed) readers reconstruct a
    change stream from two versions when the writer didn't record one.

    One full outer join on the key — at scale both sides shuffle on
    the snapshot's natural key (SortMergeJoin, AQE-sized), and column
    comparison is null-safe ``<=>`` per column (no row hashing, so the
    classification is engine-portable and survives column reordering).

    Output: ``keys + change_type + {old_/new_ for each compare_col}``.
    """
    compare_cols = compare_cols or [c for c in old.columns if c not in keys]
    # presence markers, not key-null checks: a legitimately-NULL key
    # value must not read as "row absent" under the null-safe join
    o = old.withColumn("__o_present", F.lit(True)).alias("__o")
    n = new.withColumn("__n_present", F.lit(True)).alias("__n")
    joined = o.join(
        n, on=[F.col(f"__o.{k}").eqNullSafe(F.col(f"__n.{k}")) for k in keys],
        how="full_outer",
    )
    old_present = F.col("__o.__o_present").isNotNull()
    new_present = F.col("__n.__n_present").isNotNull()
    changed_pred = None
    for c in compare_cols:
        p = ~F.col(f"__o.{c}").eqNullSafe(F.col(f"__n.{c}"))
        changed_pred = p if changed_pred is None else (changed_pred | p)
    change = (
        F.when(~new_present, F.lit("removed"))
        .when(~old_present, F.lit("added"))
        .when(changed_pred, F.lit("changed"))
    )  # unchanged -> NULL -> dropped by the filter below
    return (
        joined.select(
            *[
                F.coalesce(F.col(f"__o.{k}"), F.col(f"__n.{k}")).alias(k)
                for k in keys
            ],
            change.alias(change_col),
            *[F.col(f"__o.{c}").alias(f"old_{c}") for c in compare_cols],
            *[F.col(f"__n.{c}").alias(f"new_{c}") for c in compare_cols],
        )
        .filter(F.col(change_col).isNotNull())
    )
