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
