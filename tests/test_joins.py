"""Unit tests for the temporal/interval join operators (edge cases the
oracle differential can't isolate)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from lab3_lakehouse_spark.operators import joins as join_ops


def _ts(s: str):
    return datetime.fromisoformat(s)


def test_asof_join_backward_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), "l1"),
            (1, _ts("2024-01-01T12:00:00"), "l2"),
            (2, _ts("2024-01-01T09:00:00"), "l3"),  # before any right row
        ],
        ["k", "ts", "lv"],
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T09:30:00"), "r1"),
            (1, _ts("2024-01-01T12:00:00"), "r2"),  # tie with l2 → inclusive
            (2, _ts("2024-01-01T11:00:00"), "r3"),
        ],
        ["k", "ts", "rv"],
    )
    out = {
        r.lv: (r.rv_asof, r.ts_asof)
        for r in join_ops.asof_join(left, right, key="k").collect()
    }
    assert out["l1"] == ("r1", _ts("2024-01-01T09:30:00"))
    assert out["l2"] == ("r2", _ts("2024-01-01T12:00:00"))  # <= is inclusive
    assert out["l3"] == (None, None)  # left join: no prior match → nulls


def test_asof_join_null_payload_attached_atomically(spark):
    """The matched right row travels as one struct: a NULL in its payload
    stays NULL instead of being back-filled from an OLDER right row
    (DuckDB/pandas ASOF semantics)."""
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T12:00:00"), "l1")], ["k", "ts", "lv"]
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T09:00:00"), "old", 10.0),
            (1, _ts("2024-01-01T11:00:00"), None, 20.0),  # latest: rv is NULL
        ],
        ["k", "ts", "rv", "rx"],
    )
    row = join_ops.asof_join(left, right, key="k").collect()[0]
    assert row.rx_asof == 20.0
    assert row.rv_asof is None  # NOT "old" — no per-column back-fill
    assert row.ts_asof == _ts("2024-01-01T11:00:00")


def test_binned_range_join_boundaries(spark):
    points = spark.createDataFrame([(i, float(i)) for i in range(10)], ["id", "x"])
    ranges = spark.createDataFrame(
        [("a", 0.0, 3.0), ("b", 3.0, 7.0), ("c", 8.5, 9.5)], ["r", "lo", "hi"]
    )
    out = join_ops.binned_range_join(points, ranges, "x", "lo", "hi", bin_width=2.0)
    got = sorted((r.id, r.r) for r in out.collect())
    # [lo, hi): 3.0 belongs to b, not a; 7,8 uncovered; 9 in c
    expected = sorted(
        [(0, "a"), (1, "a"), (2, "a"), (3, "b"), (4, "b"), (5, "b"), (6, "b"), (9, "c")]
    )
    assert got == expected


def test_binned_range_join_no_duplicate_pairs(spark):
    """A range spanning many bins must still match each point once."""
    points = spark.createDataFrame([(1, 5.0)], ["id", "x"])
    ranges = spark.createDataFrame([("wide", 0.0, 100.0)], ["r", "lo", "hi"])
    out = join_ops.binned_range_join(points, ranges, "x", "lo", "hi", bin_width=1.0)
    assert out.count() == 1


def test_skew_salted_join_matches_plain_join(spark):
    left = spark.createDataFrame(
        [(i % 3, i) for i in range(100)], ["k", "v"]
    )
    right = spark.createDataFrame([(0, "hot"), (1, "warm"), (5, "miss")], ["k", "w"])
    plain = {(r.k, r.v, r.w) for r in left.join(right, "k").collect()}
    salted = {
        (r.k, r.v, r.w)
        for r in join_ops.skew_salted_join(left, right, "k", salt_buckets=4).collect()
    }
    assert salted == plain


def test_skew_salted_join_rejects_unsupported_how(spark):
    """Right/full/semi/anti are incorrect under right-side replication
    (unmatched right rows surface salt_buckets times) — must refuse."""
    import pytest

    df = spark.createDataFrame([(1, "a")], ["k", "v"])
    for how in ("right", "full", "left_semi", "left_anti"):
        with pytest.raises(ValueError, match="skew_salted_join supports"):
            join_ops.skew_salted_join(df, df, "k", how=how)


def test_salt_source_skips_map_columns(spark):
    """Default salt source must drop MapType columns (xxhash64 rejects
    them) but keep everything else; explicit salt_cols pass verbatim."""
    df = spark.createDataFrame(
        [(1, {"a": 1}, "x")], ["k", "m", "v"]
    )
    assert join_ops._hashable_salt_source(df, None) == ["k", "v"]
    assert join_ops._hashable_salt_source(df, ["k"]) == ["k"]
    # and the salted join actually runs on a frame carrying a map column
    out = join_ops.skew_salted_join(
        df, spark.createDataFrame([(1, 9)], ["k", "w"]), "k", salt_buckets=4
    )
    assert out.count() == 1


def test_asof_forward_basics_and_tiebreak(spark):
    """Forward as-of: earliest right row with ts >= left ts; inclusive
    at equal timestamps; unmatched lefts keep NULLs; equal-ts right
    rows resolved by the right_order pin."""
    import datetime as dt

    from lab3_lakehouse_spark.operators import joins as join_ops

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
    left = spark.createDataFrame(
        [(1, t(10), "a"), (1, t(25), "b"), (2, t(5), "c")],
        ["k", "ts", "tag"],
    )
    right = spark.createDataFrame(
        [
            (1, t(10), 100, 1),   # equal ts → inclusive match for "a"
            (1, t(12), 200, 3),
            (1, t(12), 150, 2),   # same ts as above → lower rid wins
            (1, t(30), 300, 4),
        ],
        ["k", "ts", "val", "rid"],
    )
    out = {
        r["tag"]: r
        for r in join_ops.asof_join_forward(
            left, right, key="k", right_cols=["val"],
            suffix="_next", right_order="rid",
        ).collect()
    }
    assert out["a"]["val_next"] == 100          # inclusive >= at t=10
    assert out["b"]["val_next"] == 300          # next after t=25
    assert out["c"]["val_next"] is None         # key 2: no right rows
    assert out["c"]["ts_next"] is None
    # tie-break check: a left row at t=11 must pick rid=2 (150), not 3
    left2 = spark.createDataFrame([(1, t(11), "x")], ["k", "ts", "tag"])
    row = join_ops.asof_join_forward(
        left2, right, key="k", right_cols=["val"],
        suffix="_next", right_order="rid",
    ).collect()[0]
    assert row["val_next"] == 150
