"""Versioned parquet tiers: snapshot isolation, time travel, rollback,
vacuum, and the no-swap-window MERGE."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lab3_lakehouse_spark.catalog import load_table
from lab3_lakehouse_spark.sources import versioned as vt


def test_write_read_history_time_travel(spark, sf_small, tmpdir):
    ev = load_table(spark, sf_small, "events")
    root = f"{tmpdir}/tier"
    v1 = vt.write_version(ev.filter(F.col("value") > 0), spark, root)
    v2 = vt.write_version(ev, spark, root)
    assert (v1, v2) == (1, 2)
    assert vt.history(spark, root) == [1, 2]
    assert vt.read_version(spark, root).count() == ev.count()  # latest
    assert vt.read_version(spark, root, version=1).count() == ev.filter(
        F.col("value") > 0
    ).count()
    with pytest.raises(ValueError, match="not committed"):
        vt.read_version(spark, root, version=9)


def test_rollback_is_metadata_only_and_reversible(spark, sf_small, tmpdir):
    ev = load_table(spark, sf_small, "events")
    root = f"{tmpdir}/tier"
    vt.write_version(ev.limit(10), spark, root)
    vt.write_version(ev.limit(20), spark, root)
    vt.rollback(spark, root, 1)
    assert vt.read_version(spark, root).count() == 10
    # the newer snapshot is still there, readable by pin, and
    # re-promotable
    assert vt.read_version(spark, root, version=2).count() == 20
    vt.rollback(spark, root, 2)
    assert vt.read_version(spark, root).count() == 20


def test_snapshot_isolation_old_reader_survives_new_write(spark, sf_small, tmpdir):
    """A DataFrame resolved against v1 must stay valid (and correct)
    after v2 is published — immutability is the isolation mechanism."""
    ev = load_table(spark, sf_small, "events")
    root = f"{tmpdir}/tier"
    vt.write_version(ev.limit(10), spark, root)
    old_reader = vt.read_version(spark, root)  # resolves v1 paths now
    vt.write_version(ev.limit(50), spark, root)
    assert old_reader.count() == 10
    assert vt.read_version(spark, root).count() == 50


def test_vacuum_keeps_tail_and_pinned(spark, sf_small, tmpdir):
    ev = load_table(spark, sf_small, "events").limit(5)
    root = f"{tmpdir}/tier"
    for _ in range(4):
        vt.write_version(ev, spark, root)
    vt.rollback(spark, root, 2)  # pin an old version
    removed = vt.vacuum(spark, root, keep_last=2)
    assert removed == [1]  # 2 pinned, 3-4 are the tail
    assert vt.history(spark, root) == [2, 3, 4]
    assert vt.read_version(spark, root).count() == 5


def test_merge_into_versioned_no_swap_window(spark, sf_small, tmpdir):
    orders = load_table(spark, sf_small, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    root = f"{tmpdir}/orders"
    vt.write_version(orders, spark, root)
    old_reader = vt.read_version(spark, root)
    changes = orders.limit(10).withColumn("o_totalprice", F.lit(0.0))
    v2 = vt.merge_into_versioned(spark, root, changes, keys=["o_orderkey"])
    assert v2 == 2
    new = vt.read_version(spark, root)
    assert new.count() == orders.count()
    assert new.filter(F.col("o_totalprice") == 0.0).count() == 10
    # the pre-merge reader still sees the pre-merge tier
    assert old_reader.filter(F.col("o_totalprice") == 0.0).count() == 0
