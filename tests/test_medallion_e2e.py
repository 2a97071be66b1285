"""End-to-end medallion pipeline at sf0.1 (VERDICT r2 item 6): the
reference's EP1 workload shape (bronze → silver → gold, checkpointed at
every tier boundary) over the 100k-row events corpus, with tier row
counts and the gold aggregate verified against DuckDB computing the
same pipeline directly on the source parquet.

This is the switch-from-the-reference evidence at a non-toy scale: the
tiers are real partitioned/clustered parquet on disk, re-read between
stages (etl_pipeline.py:77,96,150 semantics), not in-memory lineage.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import duckdb
import pytest
from pyspark.sql import functions as F

from lab3_lakehouse_spark.catalog import load_table, table_path
from lab3_lakehouse_spark.queries._util import round4, sql_round4
from lab3_lakehouse_spark.sources import ingest
from lab3_lakehouse_spark.sources.medallion import Pipeline, Stage, read_tier
from lab3_lakehouse_spark.testing import compare_frames

SF01 = os.environ.get("SPARK_GRAFT_SF_BENCH", "/root/testdata/sf0.1")


@pytest.fixture(scope="module")
def tiers(spark):
    root = tempfile.mkdtemp(prefix="medallion_e2e_")
    ev = load_table(spark, SF01, "events")
    pipe = Pipeline(
        root=root,
        stages=[
            Stage(
                "bronze",
                lambda df: ingest.add_date_parts(df, "ts", ("year", "month")),
                partition_by=["year", "month"],
            ),
            Stage("silver", lambda df: df.filter(F.col("value") > 0),
                  cluster_by=["user_id"]),
            Stage(
                "gold",
                lambda df: df.groupBy(
                    "user_id", F.date_trunc("day", "ts").alias("day")
                ).agg(
                    F.sum("value").alias("daily_revenue"),
                    F.count(F.lit(1)).alias("trip_count"),
                    F.avg("value").alias("avg_value"),
                ),
            ),
        ],
    )
    paths = pipe.run(spark, ev)
    yield paths
    shutil.rmtree(root, ignore_errors=True)


def _duck():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{table_path(SF01, 'events')}'"
    )
    return con


def test_tier_row_counts_match_duckdb(spark, tiers):
    con = _duck()
    try:
        n_src = con.execute("SELECT count(*) FROM events").fetchone()[0]
        n_kept = con.execute(
            "SELECT count(*) FROM events WHERE value > 0"
        ).fetchone()[0]
    finally:
        con.close()
    assert n_src == 100_000  # sf0.1 corpus contract
    assert read_tier(spark, tiers["bronze"]).count() == n_src
    assert read_tier(spark, tiers["silver"]).count() == n_kept
    assert 0 < n_kept < n_src  # the quality filter actually rejects rows


def test_bronze_layout_is_hive_partitioned(tiers):
    years = [d for d in os.listdir(tiers["bronze"]) if d.startswith("year=")]
    assert years, "bronze must be Hive-partitioned by year"
    months = [
        d
        for d in os.listdir(os.path.join(tiers["bronze"], years[0]))
        if d.startswith("month=")
    ]
    assert months, "bronze must be Hive-partitioned by month under year"


def test_gold_aggregate_matches_duckdb(spark, tiers):
    """Full-frame differential on the gold tier: DuckDB recomputes the
    silver filter + gold aggregate straight from the source parquet;
    Spark's gold is read back FROM DISK (so the whole write/read path is
    in the loop). round4 both sides — catalog convention for aggregate
    doubles (partial-agg summation order differs cross-engine ~1e-12)."""
    gold = read_tier(spark, tiers["gold"]).select(
        "user_id",
        F.col("day").cast("timestamp").alias("day"),
        round4(F.col("daily_revenue")).alias("daily_revenue"),
        F.col("trip_count").alias("trip_count"),
        round4(F.col("avg_value")).alias("avg_value"),
    )
    con = _duck()
    try:
        oracle = con.execute(
            f"""
            SELECT user_id,
                   CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                   {sql_round4('sum(value)')}               AS daily_revenue,
                   count(*)                                 AS trip_count,
                   {sql_round4('avg(value)')}               AS avg_value
            FROM events
            WHERE value > 0
            GROUP BY user_id, date_trunc('day', ts)
            """
        ).df()
    finally:
        con.close()
    compare_frames(gold.toPandas(), oracle, "medallion_gold_sf0.1")
