"""Planted-semantics tests for the SQL front-door suite: the oracle
parity gate proves cross-engine agreement on the synthetic corpus; the
tests here pin the SEMANTIC edge paths the corpus may not isolate —
the Q13 zero-order bucket and the Q21 sole-late-supplier logic."""

from __future__ import annotations

import datetime

from lab3_lakehouse_spark.queries import QUERIES


def _write(spark, tmp_path, name, rows, schema):
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        f"{tmp_path}/{name}.parquet"
    )


TS = datetime.datetime


def test_q13_counts_zero_order_customers(spark, tmp_path):
    """A customer with no orders AND a customer with only filtered-out
    (urgent) orders must both land in the zero bucket — the ON-clause
    placement of the priority filter is exactly what preserves them."""
    _write(spark, tmp_path, "customer",
           [(1, "a", 0, 0.0, "B"), (2, "b", 0, 0.0, "B"), (3, "c", 0, 0.0, "B")],
           "c_custkey long, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string")
    d = TS(1995, 1, 1)
    _write(spark, tmp_path, "orders",
           [(10, 1, "O", 1.0, d, "5-LOW"), (11, 1, "O", 1.0, d, "5-LOW"),
            (12, 2, "O", 1.0, d, "1-URGENT")],   # c2's only order is urgent
           "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, o_orderdate timestamp, o_orderpriority string")
    out = QUERIES["sql_order_count_distribution"](spark, str(tmp_path))
    got = {r["c_count"]: r["custdist"] for r in out.collect()}
    assert got == {2: 1, 0: 2}, got


def test_q21_only_sole_late_supplier_on_multi_supplier_f_order_counts(spark, tmp_path):
    """Four planted orders isolate each leg of the Q21 predicate:
    sole-late on multi-supplier 'F' counts; both-late counts nobody
    (NOT EXISTS); single-supplier counts nobody (EXISTS); non-'F'
    status counts nobody."""
    _write(spark, tmp_path, "supplier",
           [(1, "S1", 0, 0.0), (2, "S2", 0, 0.0)],
           "s_suppkey long, s_name string, s_nationkey int, s_acctbal double")
    d = TS(1995, 1, 1)
    _write(spark, tmp_path, "orders",
           [(1, 1, "F", 1.0, d, "5-LOW"), (2, 1, "F", 1.0, d, "5-LOW"),
            (3, 1, "F", 1.0, d, "5-LOW"), (4, 1, "O", 1.0, d, "5-LOW")],
           "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, o_orderdate timestamp, o_orderpriority string")
    late, ontime = TS(1995, 6, 1), TS(1995, 1, 15)

    def li(ok, sk, ship):
        return (ok, 1, sk, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", ship)

    _write(spark, tmp_path, "lineitem",
           [li(1, 1, late), li(1, 2, ontime),     # order 1: S1 sole late -> counts
            li(2, 1, late), li(2, 2, late),       # order 2: both late -> nobody
            li(3, 1, late),                       # order 3: single supplier -> nobody
            li(4, 2, late), li(4, 1, ontime)],    # order 4: status 'O' -> nobody
           "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
           "l_quantity double, l_extendedprice double, l_discount double, l_tax double, "
           "l_returnflag string, l_linestatus string, l_shipdate timestamp")
    out = QUERIES["sql_waiting_suppliers"](spark, str(tmp_path))
    assert [(r["s_name"], r["numwait"]) for r in out.collect()] == [("S1", 1)]
