"""Property tests (SURVEY §5.4) for semantics-sensitive spots: the
cross-engine float-rounding policy, event-time bucket boundaries, and
as-of join semantics — hypothesis generates the adversarial cases
(half-way rounding points, boundary-aligned timestamps, tie timestamps)
that fixed fixtures miss.

Examples are kept low (each example is a Spark job); the generators are
biased toward the boundaries that matter.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import duckdb
import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from lab3_lakehouse_spark.operators.derive import duration_minutes
from lab3_lakehouse_spark.queries._util import round4, sql_round4

# doubles incl. exact half-way points at the 4th decimal
_half_way = st.integers(min_value=-10**8, max_value=10**8).map(lambda n: n / 2e4)
_doubles = st.one_of(
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=64),
    _half_way,
)


@settings(max_examples=8, deadline=None)
@given(st.lists(_doubles, min_size=1, max_size=40))
def test_round4_matches_duckdb_bitwise(spark, xs):
    """round4 must be the SAME IEEE computation in both engines — even at
    half-way points where each engine's native round() disagrees."""
    sdf = spark.createDataFrame([(x,) for x in xs], ["x"])
    got = [r.y for r in sdf.select(round4(F.col("x")).alias("y")).collect()]
    con = duckdb.connect()
    expected = [
        con.execute(f"SELECT {sql_round4('CAST(? AS DOUBLE)')}", [x]).fetchone()[0]
        for x in xs
    ]
    assert got == expected  # bit-exact, no tolerance


_base = datetime(2024, 1, 1)
# timestamps biased toward window boundaries (whole hours / half hours)
_ts = st.one_of(
    st.integers(min_value=0, max_value=10**6).map(lambda s: _base + timedelta(seconds=s)),
    st.integers(min_value=0, max_value=300).map(lambda m: _base + timedelta(minutes=30 * m)),
)


@settings(max_examples=8, deadline=None)
@given(st.lists(_ts, min_size=1, max_size=30))
def test_tumbling_bucket_matches_duckdb_time_bucket(spark, tss):
    """Spark window() and DuckDB time_bucket must assign every timestamp
    — including boundary-aligned ones — to the same 1h bucket."""
    sdf = spark.createDataFrame([(t,) for t in tss], ["ts"])
    got = {
        (r.ts, r.w)
        for r in sdf.select(
            "ts", F.window("ts", "1 hour").start.alias("w")
        ).collect()
    }
    con = duckdb.connect()
    expected = set()
    for t in tss:
        w = con.execute(
            "SELECT time_bucket(INTERVAL '1 hour', CAST(? AS TIMESTAMP))", [t]
        ).fetchone()[0]
        expected.add((t, w))
    assert got == expected


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),      # key
            st.integers(min_value=0, max_value=120),    # minutes offset
            st.booleans(),                               # left or right side
        ),
        min_size=2,
        max_size=24,
    )
)
def test_asof_join_matches_python_reference(spark, rows):
    """asof_join == brute-force python: max right.ts <= left.ts per key
    (ties included), None when absent."""
    from lab3_lakehouse_spark.operators.joins import asof_join

    lefts, rights = [], []
    for i, (k, m, is_left) in enumerate(rows):
        t = _base + timedelta(minutes=m)
        (lefts if is_left else rights).append((k, t, i))
    if not lefts or not rights:
        return
    left = spark.createDataFrame(lefts, ["k", "ts", "lid"])
    right = spark.createDataFrame(rights, ["k", "ts", "rid"])
    out = asof_join(left, right, key="k", right_cols=[])
    got = {r.lid: r.ts_asof for r in out.collect()}
    expected = {}
    for k, t, lid in lefts:
        cand = [rt for rk, rt, _ in rights if rk == k and rt <= t]
        expected[lid] = max(cand) if cand else None
    assert got == expected


@settings(max_examples=8, deadline=None)
@given(
    st.integers(min_value=0, max_value=10**7),
    st.integers(min_value=0, max_value=10**7),
)
def test_duration_minutes_exact(spark, s_sec, e_sec):
    s, e = _base + timedelta(seconds=s_sec), _base + timedelta(seconds=e_sec)
    df = spark.createDataFrame([(s, e)], ["a", "b"])
    got = df.select(duration_minutes("a", "b").alias("d")).first().d
    assert got == (e_sec - s_sec) / 60.0


# --------------------------------------------- connected components ------

_edge_lists = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=30),
        st.integers(min_value=0, max_value=30),
    ).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=40,
)


def _union_find(edges):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return {v: find(v) for v in parent}


@settings(max_examples=6, deadline=None)
@given(_edge_lists)
def test_connected_components_both_algorithms_match_union_find(spark, edges):
    """Random graphs (self-loop-free, dup/reversed edges allowed): both
    distributed algorithms must produce exactly the min-id component
    labeling a sequential union-find computes."""
    from lab3_lakehouse_spark.operators import dedup as dedup_ops

    expected = _union_find(edges)
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    for algo in ("hash-min", "alternating"):
        got = {
            r.vertex: r.component
            for r in dedup_ops.connected_components(df, algorithm=algo).collect()
        }
        assert got == expected, algo
