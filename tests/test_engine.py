"""Facade tests: both front doors answer the same question with the
same result (Spark's DataFrame/SQL equivalence, surfaced by the engine).
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from lab3_lakehouse_spark.engine import LakehouseEngine


@pytest.fixture(scope="module")
def eng(spark, sf_small):
    return LakehouseEngine(spark, sf_small)


def test_front_door_equivalence(eng):
    df_door = (
        eng.table("orders")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    sql_door = eng.sql(
        "SELECT o_orderpriority, count(*) AS n FROM orders GROUP BY o_orderpriority"
    )
    assert {(r.o_orderpriority, r.n) for r in df_door.collect()} == {
        (r.o_orderpriority, r.n) for r in sql_door.collect()
    }


def test_materialize_and_optimize_roundtrip(spark, sf_small):
    root = tempfile.mkdtemp(prefix="engine_test_")
    try:
        eng = LakehouseEngine(spark, sf_small)
        eng.root = sf_small  # read source tables from testdata
        gold = (
            eng.table("events")
            .groupBy("user_id")
            .agg(F.sum("value").alias("total"))
        )
        out = LakehouseEngine(spark, root, register_sql=False)
        p = out.materialize(gold, "gold/user_totals")
        assert out.read_tier("gold/user_totals").count() == gold.count()
        strategy = out.optimize("gold/user_totals", zorder_by=["user_id"])
        assert strategy == "parquet-linear-cluster"
        assert p.startswith(root)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_priority_rotation_names_all_registered():
    """Every _PRIORITY entry must name a registered query — _ordered()
    silently drops unknown names, so a typo would silently shrink the
    driver's 50-slot verification window."""
    import __spark_entry__ as e
    from lab3_lakehouse_spark.queries import ORACLES, QUERIES

    unknown = [n for n in e._PRIORITY if n not in QUERIES]
    assert not unknown, f"_PRIORITY names unregistered queries: {unknown}"
    dupes = [n for n in set(e._PRIORITY) if e._PRIORITY.count(n) > 1]
    assert not dupes, f"duplicate _PRIORITY entries: {dupes}"
    window = list(e.queries())[:50]
    assert window == e._PRIORITY[:50], "window must follow the rotation order"
    assert set(e.oracle_sql()) == set(QUERIES) & set(ORACLES)
