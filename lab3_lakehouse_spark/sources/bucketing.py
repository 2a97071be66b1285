"""Bucketed tables: pre-shuffled storage for shuffle-free co-located
joins and aggregations (SURVEY §2.5 layout-optimization surface; the
reference's only layout tools are repartition-on-write and Z-order,
``etl_pipeline.py:64,87-88`` — bucketing is the missing third).

Why this matters at 100 TB: a fact-fact join (lineitem ⋈ orders on
orderkey) shuffles BOTH sides every time it runs. Writing each side
``bucketBy(N, key)`` pays that shuffle once at write time; every later
join or aggregation on the bucket key then satisfies the required
hash-clustered distribution straight off the scan — the physical plan
contains NO Exchange (pinned by tests/test_bucketing.py). A nightly
pipeline running dozens of joins over the same keys amortizes its
dominant cost to zero.

Mechanics worth knowing (and encoding):

- Both sides must use the SAME bucket count — Spark only elides the
  shuffle when the output partitioning matches; mismatched counts
  shuffle the smaller side (SPARK-17570 lineage). ``bucketed_join``
  checks this up front via catalog metadata instead of silently
  planning a shuffle.
- ``sortBy`` within buckets additionally removes the Sort under a
  SortMergeJoin (and gives min/max skipping inside each bucket file).
- Bucketed tables are a *table-catalog* feature (``saveAsTable``), not
  a path feature: ``spark.read.parquet(path)`` forgets bucketing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 16,
    sort_cols: list[str] | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Materialize ``df`` as a bucketed (optionally bucket-sorted)
    catalog table. The write shuffles on ``bucket_cols`` ONCE so that
    no later join/agg on those columns ever shuffles again."""
    writer = df.write.format(fmt).mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def bucket_spec(spark: SparkSession, table: str) -> tuple[int, list[str]] | None:
    """(num_buckets, bucket_cols) of a catalog table, or None if the
    table is not bucketed."""
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
    """Join two bucketed tables on their bucket keys, validating that
    the layouts actually co-locate (same bucket count, join keys ⊇
    bucket columns) — otherwise Spark silently plans the shuffle this
    layout exists to avoid, which at 100 TB is the difference between
    a metadata-only merge and rehashing both tables."""
    specs = []
    for t in (left_table, right_table):
        spec = bucket_spec(spark, t)
        if spec is None:
            raise ValueError(f"{t} is not bucketed — write it with write_bucketed")
        specs.append(spec)
    (n_l, cols_l), (n_r, cols_r) = specs
    if n_l != n_r:
        raise ValueError(
            f"bucket-count mismatch ({left_table}: {n_l}, {right_table}: {n_r}) "
            "— Spark would shuffle one side; rewrite with matching counts"
        )
    for cols, t in ((cols_l, left_table), (cols_r, right_table)):
        if not set(cols).issubset(on):
            raise ValueError(
                f"join keys {on} do not cover {t}'s bucket columns {cols}"
            )
    return spark.table(left_table).join(spark.table(right_table), on, how)
