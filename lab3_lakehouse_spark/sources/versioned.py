"""Parquet-native versioned tiers: snapshot isolation, time travel and
O(1) rollback without Delta Lake.

The reference keeps every tier in Delta (`src/etl_pipeline.py:36-41`),
which transparently provides versioned snapshots and atomic overwrite.
This container has no ``delta-spark``, and the plain-parquet fallback in
``medallion.merge_into`` documents its cost honestly: a delete→rename
window where a concurrent reader can catch the tier half-swapped. This
module closes that gap with parquet + filesystem primitives only:

- every write lands in a NEW immutable snapshot directory
  ``path/v=NNNNNNNN/`` (readers of v=K are never touched by the v=K+1
  write — snapshot isolation by immutability);
- a snapshot only becomes visible once Spark's job commit drops
  ``_SUCCESS`` into it (half-written snapshots are invisible);
- ``_LATEST`` marker: one tiny file whose content is the pinned
  version, published by write-temp + atomic ``FileSystem.rename`` —
  rollback is a metadata-only repoint, not a data rewrite;
- ``vacuum`` deletes all but the trailing K snapshots (never the
  pinned one) — Delta ``VACUUM`` parity.

At 100 TB the overhead vs Delta is the unshared data between
snapshots: a full-overwrite workflow duplicates the tier per version
(bounded by ``vacuum``), whereas Delta shares unchanged files. That is
the honest cost of log-free versioning; partition-level reuse would
need a manifest, i.e. re-inventing the Delta log.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

_VDIR = re.compile(r"^v=(\d{8})$")


def _fs(spark: SparkSession, path: str):
    """Hadoop FileSystem handle for ``path`` (works for local/HDFS/S3A).

    Requires a classic session: Spark Connect exposes no py4j ``_jvm``
    handle, so snapshot listing/commit-marker checks cannot run there —
    fail with a diagnostic instead of an AttributeError (same hazard
    class as rollup.table_exists / catalog.fan_out, which have
    metadata-based fallbacks; a filesystem mutation has none).
    """
    if not (hasattr(spark, "_jvm") and spark._jvm is not None):
        raise RuntimeError(
            "versioned tiers need a classic (py4j) SparkSession: Spark "
            "Connect has no JVM handle for Hadoop FileSystem operations"
        )
    jpath = spark._jvm.org.apache.hadoop.fs.Path
    return jpath(path).getFileSystem(spark._jsc.hadoopConfiguration()), jpath


def _committed_versions(spark: SparkSession, path: str) -> list[int]:
    """Versions whose snapshot directory carries a ``_SUCCESS`` commit
    marker, ascending."""
    fs, jpath = _fs(spark, path)
    if not fs.exists(jpath(path)):
        return []
    out = []
    for st in fs.listStatus(jpath(path)):
        m = _VDIR.match(st.getPath().getName())
        if m and fs.exists(jpath(f"{path}/v={m.group(1)}/_SUCCESS")):
            out.append(int(m.group(1)))
    return sorted(out)


def _read_marker(spark: SparkSession, path: str) -> int | None:
    fs, jpath = _fs(spark, path)
    marker = jpath(f"{path}/_LATEST")
    if not fs.exists(marker):
        return None
    stream = fs.open(marker)
    try:
        raw = bytes(stream.readAllBytes()).decode().strip()
    finally:
        stream.close()
    return int(raw) if raw else None


def _write_marker(spark: SparkSession, path: str, version: int) -> None:
    """Publish the pinned version via write-temp + atomic rename."""
    fs, jpath = _fs(spark, path)
    tmp = jpath(f"{path}/_LATEST.tmp")
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(str(version).encode()))
    finally:
        out.close()
    final = jpath(f"{path}/_LATEST")
    fs.delete(final, False)
    fs.rename(tmp, final)


def write_version(
    df: DataFrame,
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    partition_by: list[str] | None = None,
) -> int:
    """Write ``df`` as the next snapshot of the tier and publish it.
    Returns the new version number. Readers holding any older snapshot
    (or resolving `_LATEST` a moment earlier) are unaffected."""
    versions = _committed_versions(spark, path)
    new_v = (versions[-1] + 1) if versions else 1
    writer = df.write.format(fmt).mode("errorifexists")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(f"{path}/v={new_v:08d}")
    _write_marker(spark, path, new_v)
    return new_v


def resolve_version(spark: SparkSession, path: str, version: int | None = None) -> int:
    """The snapshot a read should use: an explicit pin, else `_LATEST`,
    else the newest committed snapshot."""
    if version is None:
        version = _read_marker(spark, path)
    committed = _committed_versions(spark, path)
    if not committed:
        raise FileNotFoundError(f"no committed snapshots under {path}")
    if version is None:
        return committed[-1]
    if version not in committed:
        raise ValueError(f"version {version} of {path} is not committed: {committed}")
    return version


def read_version(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    fmt: str = "parquet",
) -> DataFrame:
    """Time travel: read the pinned/latest (or an explicit) snapshot."""
    v = resolve_version(spark, path, version)
    return spark.read.format(fmt).load(f"{path}/v={v:08d}")


def history(spark: SparkSession, path: str) -> list[int]:
    """Committed snapshot versions, ascending (Delta HISTORY parity)."""
    return _committed_versions(spark, path)


def rollback(spark: SparkSession, path: str, version: int) -> None:
    """Repoint `_LATEST` at an older committed snapshot — metadata-only,
    no data rewrite; later snapshots stay readable by explicit pin."""
    if version not in _committed_versions(spark, path):
        raise ValueError(f"cannot roll back to uncommitted version {version}")
    _write_marker(spark, path, version)


def vacuum(spark: SparkSession, path: str, keep_last: int = 2) -> list[int]:
    """Delete all but the trailing ``keep_last`` snapshots; the pinned
    snapshot is always kept. Returns the versions removed."""
    fs, jpath = _fs(spark, path)
    committed = _committed_versions(spark, path)
    pinned = _read_marker(spark, path)
    keep = set(committed[-keep_last:]) | ({pinned} if pinned else set())
    removed = []
    for v in committed:
        if v not in keep:
            fs.delete(jpath(f"{path}/v={v:08d}"), True)
            removed.append(v)
    return removed


def merge_into_versioned(
    spark: SparkSession,
    path: str,
    source: DataFrame,
    keys: list[str],
    fmt: str = "parquet",
    delete_condition=None,
    broadcast_source: bool = True,
) -> int:
    """MERGE as a new snapshot: read the current version, apply
    ``operators.merge.merge_upsert``, write v+1, publish. Unlike the
    in-place ``medallion.merge_into`` parquet path there is NO
    delete→rename window — concurrent readers keep the old snapshot
    until the marker flips. Returns the new version."""
    from lab3_lakehouse_spark.operators.merge import merge_upsert

    snapshot = read_version(spark, path, fmt=fmt)
    merged = merge_upsert(
        snapshot, source, keys,
        delete_condition=delete_condition, broadcast_source=broadcast_source,
    )
    return write_version(merged, spark, path, fmt=fmt)
