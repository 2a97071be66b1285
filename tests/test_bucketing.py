"""Bucketed-table layout: the written-once shuffle must actually be
elided at join time (the whole point of the feature at 100 TB)."""

from __future__ import annotations

import pytest

from lab3_lakehouse_spark.catalog import load_table
from lab3_lakehouse_spark.plans import analysis as pa
from lab3_lakehouse_spark.sources import bucketing


@pytest.fixture()
def no_broadcast(spark):
    """Force the join planner away from broadcast so the test proves the
    bucketed SortMergeJoin path (broadcast is also shuffle-free but
    wouldn't exercise bucketing)."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_zero_exchanges(spark, sf_small, no_broadcast):
    orders = load_table(spark, sf_small, "orders")
    customer = load_table(spark, sf_small, "customer")
    bucketing.write_bucketed(
        orders, "b_orders", ["o_custkey"], num_buckets=4, sort_cols=["o_custkey"]
    )
    bucketing.write_bucketed(
        customer, "b_customer", ["c_custkey"], num_buckets=4, sort_cols=["c_custkey"]
    )
    # differently-named keys: join on an equality expression directly
    joined = spark.table("b_orders").join(
        spark.table("b_customer"),
        spark.table("b_orders").o_custkey == spark.table("b_customer").c_custkey,
    )
    assert pa.count_nodes(joined, "Exchange") == 0, joined._jdf.queryExecution().toString()
    assert pa.count_nodes(joined, "SortMergeJoin") == 1


def test_bucketed_join_same_name_keys_and_agg_reuse(spark, sf_small, no_broadcast):
    """bucketed_join's validated path, plus: an aggregation on the
    bucket key also rides the bucketing (no exchange before the agg)."""
    from pyspark.sql import functions as F

    orders = load_table(spark, sf_small, "orders").withColumnRenamed(
        "o_custkey", "custkey"
    )
    customer = load_table(spark, sf_small, "customer").withColumnRenamed(
        "c_custkey", "custkey"
    )
    bucketing.write_bucketed(orders, "bk_orders", ["custkey"], num_buckets=4)
    bucketing.write_bucketed(customer, "bk_customer", ["custkey"], num_buckets=4)
    joined = bucketing.bucketed_join(spark, "bk_orders", "bk_customer", on=["custkey"])
    assert pa.count_nodes(joined, "Exchange") == 0
    agg = spark.table("bk_orders").groupBy("custkey").agg(
        F.sum("o_totalprice").alias("spend")
    )
    assert pa.count_nodes(agg, "Exchange") == 0
    # correctness: same rows as the unbucketed join
    plain = orders.join(customer, "custkey")
    assert joined.count() == plain.count()


def test_bucketed_join_rejects_mismatched_layouts(spark, sf_small):
    orders = load_table(spark, sf_small, "orders")
    bucketing.write_bucketed(orders, "bm_a", ["o_custkey"], num_buckets=4)
    bucketing.write_bucketed(orders, "bm_b", ["o_custkey"], num_buckets=8)
    with pytest.raises(ValueError, match="bucket-count mismatch"):
        bucketing.bucketed_join(spark, "bm_a", "bm_b", on=["o_custkey"])
    plain_path = load_table(spark, sf_small, "customer")
    plain_path.write.mode("overwrite").saveAsTable("bm_plain")
    with pytest.raises(ValueError, match="not bucketed"):
        bucketing.bucketed_join(spark, "bm_a", "bm_plain", on=["o_custkey"])
