"""Medallion tier management: materialize / optimize / compose
(SURVEY §2.1 S3-S4, §2.5 X1-X2, §3 EP1).

The reference chains bronze → silver → gold through *materialized Delta
tables on disk*, re-reading each tier (``etl_pipeline.py:77,96,150``) —
checkpoint-at-tier-boundary makes every tier independently queryable
and restartable. The engine keeps that property but generalizes:

- any table, any partition columns, parquet-native with Delta as an
  optional format (the container has no delta-spark; the writer
  degrades gracefully),
- layout sizing via AQE + ``target_partitions`` instead of the
  reference's hard-coded ``repartition(16)`` / ``repartition(8)``
  (``etl_pipeline.py:64,118`` — a fixed constant is always wrong in one
  direction at 100 TB),
- Z-order (X2, ``etl_pipeline.py:87-88``) maps to Delta
  ``executeZOrderBy`` when Delta is present; on plain parquet we apply
  *linear clustering* (``repartitionByRange`` + ``sortWithinPartitions``
  on the cluster columns), which gives parquet min/max row-group
  skipping on the same columns — the same data-skipping goal by
  parquet-native means.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _delta_available() -> bool:
    try:
        import delta  # noqa: F401

        return True
    except ImportError:
        return False


def _layout(
    df: DataFrame,
    partition_by: list[str] | None,
    cluster_by: list[str] | None,
    target_partitions: int | None,
) -> DataFrame:
    """The write-layout stage of :func:`materialize`, factored out so
    its physical plan is independently inspectable (plans/r15)."""
    out = df
    if cluster_by:
        cols = [F.col(c) for c in cluster_by]
        if target_partitions:
            out = out.repartitionByRange(target_partitions, *cols)
        else:
            out = out.repartitionByRange(*cols)
        out = out.sortWithinPartitions(*cols)
    elif partition_by:
        # co-locate rows of each output directory, avoiding the
        # files = tasks × partitions small-file explosion. r15 (guide
        # §6 "REBALANCE hint before the write"): the default is now an
        # AQE REBALANCE on the partition columns instead of
        # repartition(cols) — hash-repartitioning on LOW-cardinality
        # partition columns (year, month → ~tens of distinct values)
        # pins each output directory to ONE task, which at 100 TB
        # makes the biggest directory a multi-hundred-GB straggler
        # and one giant file. REBALANCE keeps the co-location but lets
        # AQE split oversized directories into advisory-sized tasks
        # (multiple right-sized files per dir) and coalesce tiny ones —
        # scale-adaptive in both directions, no constant to tune.
        # An explicit target_partitions still forces a plain hash
        # repartition (callers that pin file counts keep that control).
        cols = [F.col(c) for c in partition_by]
        out = (
            out.repartition(target_partitions, *cols)
            if target_partitions
            else out.hint("rebalance", *cols)
        )
    elif target_partitions:
        out = out.repartition(target_partitions)
    return out


def materialize(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    cluster_by: list[str] | None = None,
    target_partitions: int | None = None,
    dynamic_partition_overwrite: bool = False,
) -> None:
    """Write a tier table (S3/S4), layout-aware.

    - ``partition_by``: Hive-style directory partitioning.
    - ``cluster_by``: within-file clustering for min/max data skipping
      (parquet-native Z-order substitute; Delta Z-order is applied by
      ``optimize_table`` when Delta is available).
    - ``target_partitions``: output file-count control. None → trust
      AQE's coalescing (the at-scale default).
    - ``dynamic_partition_overwrite``: with ``mode="overwrite"`` +
      ``partition_by``, replace ONLY the partitions present in ``df``
      (incremental backfill: rewriting one day must not clobber the
      other 3 649 days of a 10-year tier). Per-writer option, so it
      never leaks session-wide config.
    """
    writer = _layout(
        df, partition_by, cluster_by, target_partitions
    ).write.format(fmt).mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
        if dynamic_partition_overwrite:
            writer = writer.option("partitionOverwriteMode", "dynamic")
    writer.save(path)


def materialize_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    path: str | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Persist a tier hash-bucketed (and optionally sorted) on its join
    key — the co-located-join layout.

    Two tables bucketed on the same key with the same bucket count
    sort-merge-join with ZERO exchanges (and zero sorts when sorted):
    at 100 TB, pre-bucketing the fact tables once removes the dominant
    shuffle from every subsequent key join and key aggregation.
    Bucketing rides the table catalog (``saveAsTable``), not a bare
    path — bucket metadata is what lets Catalyst elide the exchange.
    """
    w = (
        df.write.format(fmt)
        .mode(mode)
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucket_spec(spark: SparkSession, table: str) -> tuple[int, list[str]] | None:
    """(num_buckets, bucket_cols) of a catalog table from its metadata,
    or None if the table is not bucketed."""
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
    meta = {r["col_name"]: r["data_type"] for r in rows}
    if "Num Buckets" not in meta:
        return None
    cols = [c.strip("`") for c in meta["Bucket Columns"].strip("[]").split(", ")]
    return int(meta["Num Buckets"]), cols


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two bucketed tables on their bucket keys, validating up
    front (via catalog metadata) that the layouts actually co-locate:
    same bucket count, join keys covering the bucket columns. Spark
    only elides the exchange when output partitionings match —
    mismatched counts silently shuffle one side, which at 100 TB is the
    difference between a metadata-only merge join and rehashing a
    table. A layout mismatch here is a *pipeline bug* (someone rewrote
    a tier with different bucketing), so it fails loudly instead."""
    specs = []
    for t in (left_table, right_table):
        spec = bucket_spec(spark, t)
        if spec is None:
            raise ValueError(
                f"{t} is not bucketed — write it with materialize_bucketed"
            )
        specs.append(spec)
    (n_l, cols_l), (n_r, cols_r) = specs
    if n_l != n_r:
        raise ValueError(
            f"bucket-count mismatch ({left_table}: {n_l}, {right_table}: {n_r})"
            " — Spark would shuffle one side; rewrite with matching counts"
        )
    for cols, t in ((cols_l, left_table), (cols_r, right_table)):
        if not set(cols).issubset(on):
            raise ValueError(
                f"join keys {on} do not cover {t}'s bucket columns {cols}"
            )
    return spark.table(left_table).join(spark.table(right_table), on, how)


def merge_into(
    spark: SparkSession,
    path: str,
    source: DataFrame,
    keys: list[str],
    fmt: str = "parquet",
    delete_condition=None,
    broadcast_source: bool = True,
) -> None:
    """Apply a change batch to a persisted tier (Delta-MERGE parity).

    With delta-spark installed this delegates to the transactional
    ``DeltaTable.merge`` (file-pruned, ACID). On parquet tiers it is a
    read → ``operators.merge.merge_upsert`` → rewrite: correct but
    non-transactional and full-rewrite — the honest floor documented in
    operators/merge.py. Change batches are usually ≪ snapshot, so the
    source defaults to broadcast and the snapshot never shuffles.
    """
    from lab3_lakehouse_spark.operators.merge import merge_upsert

    if fmt == "delta" and _delta_available():
        from delta.tables import DeltaTable  # pragma: no cover - env-gated

        t = DeltaTable.forPath(spark, path)
        cond = " AND ".join(f"t.`{k}` <=> s.`{k}`" for k in keys)
        m = t.alias("t").merge(source.alias("s"), cond)
        if delete_condition is not None:
            m = m.whenMatchedDelete(condition=delete_condition)
        m.whenMatchedUpdateAll().whenNotMatchedInsertAll().execute()
        return
    snapshot = spark.read.format(fmt).load(path)
    merged = merge_upsert(
        snapshot, source, keys,
        delete_condition=delete_condition, broadcast_source=broadcast_source,
    )
    # parquet has no transaction log: Spark cannot overwrite a path it
    # is reading from, so stage the rewrite next to the tier and swap
    # via a same-filesystem rename (works on HDFS/S3A-committer/local;
    # the delete→rename window is the non-transactional cost vs Delta)
    staging = path.rstrip("/") + ".__staging__"
    merged.write.format(fmt).mode("overwrite").save(staging)
    fs, jpath = _hadoop_fs(spark, path)
    fs.delete(jpath(path), True)
    fs.rename(jpath(staging), jpath(path))


def _hadoop_fs(spark: SparkSession, path: str):
    """Hadoop FileSystem handle (local/HDFS/S3A) — classic sessions
    only: Spark Connect has no py4j ``_jvm``, and a staged-rename swap
    has no metadata fallback, so fail with a diagnostic up front
    (same hazard class as rollup.table_exists / versioned._fs)."""
    if not (hasattr(spark, "_jvm") and spark._jvm is not None):
        raise RuntimeError(
            "merge_into/compact_tier need a classic (py4j) SparkSession: "
            "Spark Connect has no JVM handle for Hadoop FileSystem renames"
        )
    jpath = spark._jvm.org.apache.hadoop.fs.Path
    return jpath(path).getFileSystem(spark._jsc.hadoopConfiguration()), jpath


def compact_tier(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    target_file_bytes: int = 128 * 1024 * 1024,
    partition_by: list[str] | None = None,
    sort_within: list[str] | None = None,
) -> dict[str, int]:
    """Small-file compaction (Delta ``OPTIMIZE``-compact parity for
    parquet tiers). Streaming sinks and incremental merges accrete
    files far below scan granularity; at 100 TB the scan cost of a
    fragmented tier is dominated by per-file open/footer overhead and
    lost row-group pruning, and the fix is a periodic rewrite toward
    ``target_file_bytes`` (default = the engine's 128 MiB
    ``maxPartitionBytes``, so one compacted file ≈ one scan split).

    Delta tiers delegate to the transactional ``optimize().
    executeCompaction()``. Parquet tiers rewrite: bytes are measured
    from the filesystem, the frame is repartitioned to
    ``ceil(bytes / target)`` output files (range-partitioned when
    ``sort_within`` is given, preserving cluster-by layouts), staged
    next to the tier, and swapped via same-filesystem rename — the
    merge_into pattern, same non-transactional window.

    Returns ``{"files_before", "files_after", "bytes", "n_target"}``
    for observability/assertions. Uses the Hadoop FS API via py4j
    (HDFS/S3A/local); like merge_into, classic sessions only.
    """
    import math

    fs, jpath = _hadoop_fs(spark, path)

    def _data_files() -> int:
        it, n = fs.listFiles(jpath(path), True), 0
        while it.hasNext():
            f = it.next().getPath().getName()
            n += not (f.startswith("_") or f.startswith("."))
        return n

    if fmt == "delta" and _delta_available():  # pragma: no cover - env-gated
        from delta.tables import DeltaTable

        before = _data_files()
        DeltaTable.forPath(spark, path).optimize().executeCompaction()
        return {
            "files_before": before, "files_after": _data_files(),
            "bytes": fs.getContentSummary(jpath(path)).getLength(),
            "n_target": -1,
        }

    total = fs.getContentSummary(jpath(path)).getLength()
    n_target = max(1, math.ceil(total / target_file_bytes))
    before = _data_files()
    df = read_tier(spark, path, fmt)
    if sort_within:
        cols = [F.col(c) for c in sort_within]
        out = df.repartitionByRange(n_target, *cols).sortWithinPartitions(*cols)
    elif partition_by:
        out = df.repartition(n_target, *[F.col(c) for c in partition_by])
    else:
        out = df.repartition(n_target)
    staging = path.rstrip("/") + ".__compacting__"
    writer = out.write.format(fmt).mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(staging)
    fs.delete(jpath(path), True)
    fs.rename(jpath(staging), jpath(path))
    return {
        "files_before": before,
        "files_after": _data_files(),
        "bytes": total,
        "n_target": n_target,
    }


def read_tier(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """S2: tier scan (schema from footers/log — metadata-only)."""
    return spark.read.format(fmt).load(path)


def morton_key(
    df: DataFrame, cols: list[str], bits_per_col: int = 16
) -> tuple[DataFrame, str]:
    """Attach a Morton (interleaved-bit Z-order) key over numeric columns.

    Each column is min-max normalized to ``bits_per_col`` bits (one tiny
    stats job), then the bits are interleaved so close values in ANY
    clustered column land near each other in key order. Sorting files by
    this key bounds every column's per-file min/max range —
    multi-dimensional data skipping, which lexicographic sorting only
    gives the leading column. Pure codegen'd shift/or arithmetic.
    """
    stats = df.agg(
        *[F.min(c).alias(f"lo_{c}") for c in cols],
        *[F.max(c).alias(f"hi_{c}") for c in cols],
    ).first()
    scale = (1 << bits_per_col) - 1
    key = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        lo = float(stats[f"lo_{c}"])
        span = float(stats[f"hi_{c}"]) - lo
        norm = (
            ((F.coalesce(F.col(c), F.lit(lo)).cast("double") - F.lit(lo))
             / F.lit(span if span > 0 else 1.0))
            * F.lit(float(scale))
        ).cast("long")
        for b in range(bits_per_col):
            key = key.bitwiseOR(
                F.shiftleft(
                    F.shiftright(norm, b).bitwiseAND(F.lit(1).cast("long")),
                    b * len(cols) + i,
                )
            )
    return df.withColumn("__zkey", key), "__zkey"


def optimize_table(
    spark: SparkSession,
    path: str,
    zorder_by: list[str],
    fmt: str = "parquet",
    target_partitions: int | None = None,
) -> str:
    """X2: layout optimization (generalizes ``etl_pipeline.py:87-88``).
    Delta → ``OPTIMIZE ... ZORDER BY``; parquet → rewrite clustered by a
    Morton key over the same columns (single column degenerates to a
    range sort). Returns the strategy applied (observability/tests)."""
    if fmt == "delta" and _delta_available():
        from delta.tables import DeltaTable

        DeltaTable.forPath(spark, path).optimize().executeZOrderBy(zorder_by)
        return "delta-zorder"
    df = read_tier(spark, path, fmt)
    if len(zorder_by) == 1:
        materialize(
            df, path + "__clustered", fmt=fmt, cluster_by=zorder_by,
            target_partitions=target_partitions,
        )
        return "parquet-linear-cluster"
    keyed, key = morton_key(df, zorder_by)
    parts = [target_partitions] if target_partitions else []
    clustered = (
        keyed.repartitionByRange(*parts, F.col(key))
        .sortWithinPartitions(key)
        .drop(key)
    )
    clustered.write.format(fmt).mode("overwrite").save(path + "__clustered")
    return "parquet-morton-cluster"


@dataclass
class Stage:
    """One tier boundary: transform, then checkpoint to disk."""

    name: str
    transform: Callable[[DataFrame], DataFrame]
    partition_by: list[str] | None = None
    cluster_by: list[str] | None = None


@dataclass
class Pipeline:
    """EP1 generalized: ``Pipeline(root, [bronze, silver, gold...])``.

    Each stage reads the previous tier *from disk* (not in-memory
    lineage), exactly reproducing the reference's restartability
    property: a failed gold build re-runs from silver, not from raw.
    """

    root: str
    stages: list[Stage]
    fmt: str = "parquet"
    paths: dict[str, str] = field(default_factory=dict)

    def tier_path(self, name: str) -> str:
        return f"{self.root}/{name}"

    def run(self, spark: SparkSession, source: DataFrame) -> dict[str, str]:
        df = source
        for st in self.stages:
            df = st.transform(df)
            p = self.tier_path(st.name)
            materialize(
                df,
                p,
                fmt=self.fmt,
                partition_by=st.partition_by,
                cluster_by=st.cluster_by,
            )
            self.paths[st.name] = p
            df = read_tier(spark, p, self.fmt)  # checkpoint boundary
        return dict(self.paths)
