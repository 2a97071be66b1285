"""Validated bucketed-join path: beyond the zero-exchange plan pin in
test_pipeline_streaming_ml.py, bucketed_join must detect layout
mismatches via catalog metadata BEFORE planning — a silent shuffle on a
"co-located" join is the failure mode bucketing exists to prevent."""

from __future__ import annotations

import pytest

from lab3_lakehouse_spark.catalog import load_table
from lab3_lakehouse_spark.plans import analysis as pa
from lab3_lakehouse_spark.sources.medallion import (
    bucket_spec,
    bucketed_join,
    materialize_bucketed,
)


@pytest.fixture()
def cleanup_tables(spark):
    made: list[str] = []
    yield made
    for t in made:
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_join_validated_path_zero_exchange(
    spark, sf_small, tmpdir, cleanup_tables
):
    from pyspark.sql import functions as F

    orders = load_table(spark, sf_small, "orders").withColumnRenamed(
        "o_custkey", "custkey"
    )
    customer = load_table(spark, sf_small, "customer").withColumnRenamed(
        "c_custkey", "custkey"
    )
    materialize_bucketed(
        orders, "vj_orders", ["custkey"], 4, path=f"{tmpdir}/vj_orders"
    )
    materialize_bucketed(
        customer, "vj_customer", ["custkey"], 4, path=f"{tmpdir}/vj_customer"
    )
    cleanup_tables += ["vj_orders", "vj_customer"]
    assert bucket_spec(spark, "vj_orders") == (4, ["custkey"])
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = bucketed_join(spark, "vj_orders", "vj_customer", on=["custkey"])
        assert pa.count_nodes(joined, "Exchange") == 0
        # an aggregation on the bucket key also rides the layout
        agg = spark.table("vj_orders").groupBy("custkey").agg(
            F.sum("o_totalprice").alias("spend")
        )
        assert pa.count_nodes(agg, "Exchange") == 0
        assert joined.count() == orders.join(customer, "custkey").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_rejects_mismatched_layouts(
    spark, sf_small, tmpdir, cleanup_tables
):
    orders = load_table(spark, sf_small, "orders")
    materialize_bucketed(orders, "vm_a", ["o_custkey"], 4, path=f"{tmpdir}/a")
    materialize_bucketed(orders, "vm_b", ["o_custkey"], 8, path=f"{tmpdir}/b")
    cleanup_tables += ["vm_a", "vm_b", "vm_plain"]
    with pytest.raises(ValueError, match="bucket-count mismatch"):
        bucketed_join(spark, "vm_a", "vm_b", on=["o_custkey"])
    load_table(spark, sf_small, "customer").write.mode("overwrite").option(
        "path", f"{tmpdir}/plain"
    ).saveAsTable("vm_plain")
    with pytest.raises(ValueError, match="not bucketed"):
        bucketed_join(spark, "vm_a", "vm_plain", on=["o_custkey"])
    with pytest.raises(ValueError, match="do not cover"):
        materialize_bucketed(orders, "vm_c", ["o_custkey"], 4, path=f"{tmpdir}/c")
        cleanup_tables.append("vm_c")
        bucketed_join(spark, "vm_a", "vm_c", on=["o_orderkey"])
