"""Unit tests for the round-4 scale-pattern operators (sketches,
runtime-filter join, funnel, quota, filtered ANN) on planted data —
the oracle-parity gate covers the real tables; these pin semantics
and plan shapes on inputs where the expected answer is hand-checkable.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from lab3_lakehouse_spark.operators import sketches
from lab3_lakehouse_spark.operators.similarity import filtered_brute_force_topk
from lab3_lakehouse_spark.plans.analysis import count_nodes


# ------------------------------------------------------------- CMS ----


def test_cms_never_undercounts(spark):
    rows = [("a",)] * 7 + [("b",)] * 3 + [("c",)] * 1
    df = spark.createDataFrame(rows, ["k"])
    cms = sketches.cms_build(df, "k", depth=4, width=16)
    keys = spark.createDataFrame([("a",), ("b",), ("c",), ("zz",)], ["k"])
    est = {r["k"]: r["cms_n"] for r in
           sketches.cms_estimate(cms, keys, "k", depth=4, width=16).collect()}
    assert est["a"] >= 7 and est["b"] >= 3 and est["c"] >= 1
    # a key the sketch never saw can only collide upward, never go negative
    assert est["zz"] >= 0


def test_portable_hash60_null_key_matches_duckdb(spark):
    """Null keys must hash to NULL on BOTH engines (the r4 ADVICE
    divergence: concat_ws skipped the NULL and Spark sketched
    'seed|' while the DuckDB `||` twin dropped the row)."""
    import duckdb

    df = spark.createDataFrame([("a",), (None,)], ["k"])
    got = [
        r["h"]
        for r in df.select(sketches.portable_hash60("k", 7).alias("h")).collect()
    ]
    con = duckdb.connect()
    try:
        want = [
            r[0]
            for r in con.execute(
                f"SELECT {sketches.sql_hash60('k', 7)} FROM"
                " (VALUES ('a'), (NULL)) t(k)"
            ).fetchall()
        ]
    finally:
        con.close()
    assert sorted(got, key=str) == sorted(want, key=str)
    assert None in got  # null propagates, never hashes as 'seed|'


def test_cms_slices_merge_to_whole(spark):
    """Cell tables from disjoint slices re-aggregate to the sketch of
    the union — the mergeability contract that makes per-day sketches
    roll up to any grain."""
    s1 = spark.createDataFrame([("a",)] * 4 + [("b",)] * 2, ["k"])
    s2 = spark.createDataFrame([("a",)] * 1 + [("c",)] * 5, ["k"])
    whole = sketches.cms_build(s1.union(s2), "k", depth=3, width=8)
    merged = (
        sketches.cms_build(s1, "k", depth=3, width=8)
        .union(sketches.cms_build(s2, "k", depth=3, width=8))
        .groupBy("r", "b")
        .agg(F.sum("cnt").alias("cnt"))
    )
    assert sorted(map(tuple, whole.collect())) == sorted(map(tuple, merged.collect()))


# ----------------------------------------------------------- Bloom ----


def test_bloom_no_false_negatives_and_merges(spark):
    keys = spark.createDataFrame([(i,) for i in range(50)], ["k"])
    bits = sketches.bloom_build(keys, "k", n_bits=1024, n_hashes=3)
    probe = spark.createDataFrame([(i,) for i in range(200)], ["k"])
    flagged = sketches.bloom_probe(probe, F.col("k"), bits, n_bits=1024, n_hashes=3)
    got = {r["k"]: r["bloom_pass"] for r in flagged.collect()}
    assert all(got[i] for i in range(50)), "member keys must always pass"
    fp = sum(got[i] for i in range(50, 200))
    assert fp < 75, f"false-positive rate implausibly high: {fp}/150"
    # bit sets from key slices union to the whole filter
    half1 = sketches.bloom_build(keys.filter("k < 25"), "k", 1024, 3)
    half2 = sketches.bloom_build(keys.filter("k >= 25"), "k", 1024, 3)
    merged = half1.union(half2).distinct()
    assert sorted(r["bit"] for r in merged.collect()) == sorted(
        r["bit"] for r in bits.collect()
    )


def test_bloom_probe_side_never_shuffles(spark):
    """The probe plan must be broadcast joins only — no Exchange of the
    fact side (the entire point of the runtime-filter pattern)."""
    keys = spark.createDataFrame([(i,) for i in range(10)], ["k"])
    bits = sketches.bloom_build(keys, "k", n_bits=256, n_hashes=3)
    probe = spark.createDataFrame([(i,) for i in range(100)], ["k"])
    flagged = sketches.bloom_probe(probe, F.col("k"), bits, n_bits=256, n_hashes=3)
    plan = flagged._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


# ---------------------------------------------------- filtered ANN ----


def test_filtered_topk_respects_metadata_filter(spark):
    rows = [
        (0, [1.0, 0.0], 1),
        (1, [0.9, 0.1], 1),
        (2, [1.0, 0.01], 2),  # closer, but wrong label — must be excluded
        (3, [0.0, 1.0], 1),
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    out = filtered_brute_force_topk(
        emb, emb.filter("vec_id = 0"), "vec_id", "embedding",
        filter_cols=["label"], k=2,
    ).collect()
    ids = [r["neighbor_id"] for r in out]
    assert ids == [1, 3], f"label filter violated: {ids}"


def test_filtered_topk_plan_joins_on_filter_not_cross(spark):
    emb = spark.createDataFrame(
        [(i, [float(i), 1.0], i % 3) for i in range(30)],
        ["vec_id", "embedding", "label"],
    )
    df = filtered_brute_force_topk(
        emb, emb.filter("vec_id < 2"), "vec_id", "embedding",
        filter_cols=["label"], k=2,
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan, "filter must be a hash-join key"


# ------------------------------------------------ planted semantics ----


@pytest.fixture(scope="module")
def planted_events(spark):
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        # u1: full funnel in order
        (1, t0, 1, "view", 1.0, "{}"),
        (2, t0 + dt.timedelta(hours=1), 1, "click", 1.0, "{}"),
        (3, t0 + dt.timedelta(hours=2), 1, "purchase", 10.0, "{}"),
        # u2: click BEFORE view → not a conversion
        (4, t0, 2, "click", 1.0, "{}"),
        (5, t0 + dt.timedelta(hours=1), 2, "view", 1.0, "{}"),
        # u3: view only
        (6, t0, 3, "view", 1.0, "{}"),
    ]
    return spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )


def test_funnel_semantics_on_planted_events(spark, planted_events, tmp_path):
    from lab3_lakehouse_spark.queries.scaleops import funnel_stage_conversion

    path = str(tmp_path / "events.parquet")
    planted_events.write.parquet(path)
    # reuse the query body against the planted dir (other tables unused)
    row = funnel_stage_conversion(spark, str(tmp_path)).collect()[0]
    assert row["n_users"] == 3
    assert row["n_view"] == 3
    assert row["n_view_then_click"] == 1  # only u1 clicked after first view
    assert row["n_full_funnel"] == 1


def test_quota_cap_and_determinism(spark, sf_small):
    from lab3_lakehouse_spark.queries.scaleops import per_source_document_quota

    a = per_source_document_quota(spark, sf_small).collect()
    b = per_source_document_quota(spark, sf_small).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b)), "must be deterministic"
    per_src: dict[str, int] = {}
    for r in a:
        per_src[r["source"]] = per_src.get(r["source"], 0) + 1
    assert all(v <= 5 for v in per_src.values())


def test_time_decay_weights_are_exact_halving(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 10, 8, 0, 0)
    rows = [
        (1, t0, 7, "view", 8.0, "{}"),                       # newest day → w=1
        (2, t0 - dt.timedelta(days=1), 7, "view", 8.0, "{}"),  # w=1/2
        (3, t0 - dt.timedelta(days=3), 7, "view", 8.0, "{}"),  # w=1/8
    ]
    spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).write.parquet(str(tmp_path / "events.parquet"))
    from lab3_lakehouse_spark.queries.scaleops import time_decay_user_value

    row = time_decay_user_value(spark, str(tmp_path)).collect()[0]
    assert row["decayed_value"] == 8.0 + 4.0 + 1.0


def test_time_decay_survives_multi_month_span(spark, tmp_path):
    """Planted >63-day span (the ADVICE r4 wrap bug): Java masks shifts
    mod 64, so an unclamped 1<<63 flips the weight negative and 1<<64
    wraps to 1 — and DuckDB raises Out-of-Range at shift 63. The clamp
    at 62 must (a) keep every weight positive, (b) score day-0 events
    at full weight, and (c) agree with the DuckDB oracle bit-for-bit
    on the same long-span input."""
    import duckdb

    t0 = dt.datetime(2024, 6, 1, 12, 0, 0)
    rows = [
        (1, t0, 7, "view", 8.0, "{}"),                          # w = 1
        (2, t0 - dt.timedelta(days=63), 7, "view", 8.0, "{}"),  # clamped
        (3, t0 - dt.timedelta(days=64), 7, "view", 8.0, "{}"),  # would wrap to w=1
        (4, t0 - dt.timedelta(days=200), 7, "view", 8.0, "{}"),
    ]
    path = str(tmp_path / "events.parquet")
    spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).write.parquet(path)
    from lab3_lakehouse_spark.queries import ORACLES
    from lab3_lakehouse_spark.queries.scaleops import time_decay_user_value
    from lab3_lakehouse_spark.testing import compare_frames

    spark_pdf = time_decay_user_value(spark, str(tmp_path)).toPandas()
    # weights stay positive and the day-0 event dominates: 8 ≤ v < 8 + ε
    v = float(spark_pdf["decayed_value"].iloc[0])
    assert 8.0 <= v < 8.0001
    con = duckdb.connect()
    try:
        con.execute(f"CREATE VIEW events AS SELECT * FROM '{path}/*.parquet'")
        oracle_pdf = con.execute(ORACLES["time_decay_user_value"]).df()
    finally:
        con.close()
    compare_frames(spark_pdf, oracle_pdf, "time_decay_multi_month")


def test_gap_fill_emits_zero_rows_for_missing_days(spark, tmp_path):
    t0 = dt.datetime(2024, 3, 1, 0, 0, 0)
    rows = [
        (1, t0, 1, "view", 1.0, "{}"),
        (2, t0 + dt.timedelta(days=3), 1, "view", 1.0, "{}"),
    ]
    spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).write.parquet(str(tmp_path / "events.parquet"))
    from lab3_lakehouse_spark.queries.scaleops import events_gap_filled_daily

    out = events_gap_filled_daily(spark, str(tmp_path)).collect()
    assert len(out) == 4  # 4-day spine × 1 event type
    by_day = {r["day"].day: r["n_events"] for r in out}
    assert by_day[1] == 1 and by_day[2] == 0 and by_day[3] == 0 and by_day[4] == 1


def test_gap_fill_spine_guard_trips_on_runaway_bounds(spark):
    """A mis-parsed 1970 epoch next to a 2024 timestamp would demand a
    ~473k-hour spine PER SERIES KEY; the max_buckets guard fails the
    job at execution with the offending bucket count instead of
    exploding the grid."""
    import pyspark.sql.utils  # noqa: F401

    from lab3_lakehouse_spark.operators import events as events_ops

    rows = [
        (dt.datetime(1970, 1, 1), "view"),
        (dt.datetime(2024, 1, 1), "view"),
    ]
    df = spark.createDataFrame(rows, ["ts", "event_type"])
    import pytest as _pytest

    with _pytest.raises(Exception, match="max_buckets"):
        events_ops.gap_filled_counts(df, grain="hour").collect()
    # and the same bounds pass when the caller raises the budget
    ok = events_ops.gap_filled_counts(
        df, grain="day", max_buckets=30_000
    ).collect()
    assert len(ok) == 19724  # days from 1970-01-01 through 2024-01-01


def test_gap_fill_empty_input_yields_empty_frame(spark):
    """EMPTY input: min/max bounds are NULL, so the max_buckets guard
    must pass the NULL through (sequence(NULL,NULL) → explode yields no
    rows) instead of tripping raise_error while building the 1-row
    bounds frame (the r7 regression: the guard condition evaluated NULL
    and fell into the error branch)."""
    import pyspark.sql.types as T

    from lab3_lakehouse_spark.operators import events as events_ops

    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType()),
            T.StructField("event_type", T.StringType()),
        ]
    )
    df = spark.createDataFrame([], schema)
    assert events_ops.gap_filled_counts(df, grain="hour").collect() == []


def test_gap_fill_high_cardinality_series_stays_keyed(spark):
    """With a high-cardinality series column (user_id) the grid is
    spine×users BY SEMANTICS; the plan must generate it executor-side
    (explode per series row) and close with a KEYED join — no
    cartesian product against a multi-row frame."""
    from lab3_lakehouse_spark.operators import events as events_ops

    t0 = dt.datetime(2024, 3, 1)
    rows = [
        (t0 + dt.timedelta(days=d), uid) for uid in range(200) for d in (0, 2)
    ]
    df = spark.createDataFrame(rows, ["ts", "user_id"])
    out = events_ops.gap_filled_counts(df, series_col="user_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    rows_out = out.collect()
    assert len(rows_out) == 3 * 200  # full 3-day spine for every user
    zero_fill = [r for r in rows_out if r.n_events == 0]
    assert len(zero_fill) == 200  # each user misses exactly one day


# --------------------------------------------- round-4 batch 2 ----


def test_shared_span_detects_planted_verbatim_overlap(spark, tmp_path):
    shared = "alpha bravo charlie delta echo foxtrot golf hotel india juliett"
    rows = [
        (1, f"{shared} unique tail one two three four five six seven", "en", "s1", 10),
        (2, f"different head words here {shared}", "en", "s2", 10),
        (3, "no overlap at all just fresh tokens everywhere in this one", "en", "s3", 10),
    ]
    spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    ).write.parquet(str(tmp_path / "documents.parquet"))
    from lab3_lakehouse_spark.queries.scaleops import shared_span_dup_report

    out = shared_span_dup_report(spark, str(tmp_path)).collect()
    assert len(out) == 1, f"exactly the planted 10-gram should be shared: {out}"
    assert out[0]["n_docs"] == 2 and out[0]["min_doc_id"] == 1


def test_referential_integrity_flags_planted_orphans(spark, tmp_path):
    spark.createDataFrame(
        [(1, "a", 1, 0.0, "BUILDING")],
        ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
    ).write.parquet(str(tmp_path / "customer.parquet"))
    spark.createDataFrame(
        [(10, 1, "O", 5.0, "1996-01-01", "1-URGENT"),
         (11, 99, "O", 5.0, "1996-01-01", "1-URGENT")],  # orphan custkey 99
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
         "o_orderdate", "o_orderpriority"],
    ).write.parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        [(10, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", "1996-01-02")],
        ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
         "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
         "l_linestatus", "l_shipdate"],
    ).write.parquet(str(tmp_path / "lineitem.parquet"))
    spark.createDataFrame([(1,)], ["p_partkey"]).write.parquet(
        str(tmp_path / "part.parquet"))
    spark.createDataFrame([(1,)], ["s_suppkey"]).write.parquet(
        str(tmp_path / "supplier.parquet"))
    from lab3_lakehouse_spark.queries.scaleops import referential_integrity_audit

    got = {r["relation"]: (r["n_child"], r["n_orphans"])
           for r in referential_integrity_audit(spark, str(tmp_path)).collect()}
    assert got["orders->customer"] == (2, 1)
    assert got["lineitem->orders"] == (1, 0)


def test_throttle_keeps_first_and_spaced_events(spark, tmp_path):
    import datetime as dt
    t0 = dt.datetime(2024, 5, 1, 9, 0, 0)
    rows = [
        (1, t0, 1, "click", 1.0, "{}"),
        (2, t0 + dt.timedelta(seconds=100), 1, "click", 1.0, "{}"),  # < 5 min → drop
        (3, t0 + dt.timedelta(seconds=400), 1, "click", 1.0, "{}"),  # >5 min after #1 → keep
        (4, t0 + dt.timedelta(seconds=100), 1, "view", 1.0, "{}"),   # other type → keep
    ]
    spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).write.parquet(str(tmp_path / "events.parquet"))
    from lab3_lakehouse_spark.queries.scaleops import throttled_event_stream

    kept = sorted(r["event_id"]
                  for r in throttled_event_stream(spark, str(tmp_path)).collect())
    # the gap is measured vs the previous RAW event (lag), strictly
    # greater than 300 s: #2 is 100 s after #1 (drop), #3 is exactly
    # 300 s after #2 (not > 300 → drop), #4 is the type's first (keep)
    assert kept == [1, 4]


def test_transition_matrix_counts_planted_sequence(spark, tmp_path):
    import datetime as dt
    t0 = dt.datetime(2024, 5, 1, 9, 0, 0)
    rows = [
        (1, t0, 1, "view", 1.0, "{}"),
        (2, t0 + dt.timedelta(minutes=1), 1, "click", 1.0, "{}"),
        (3, t0 + dt.timedelta(minutes=2), 1, "view", 1.0, "{}"),
        (4, t0 + dt.timedelta(minutes=3), 1, "click", 1.0, "{}"),
        (5, t0, 2, "view", 1.0, "{}"),
    ]
    spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).write.parquet(str(tmp_path / "events.parquet"))
    from lab3_lakehouse_spark.queries.scaleops import event_transition_matrix

    got = {(r["from_type"], r["to_type"]): r["n_transitions"]
           for r in event_transition_matrix(spark, str(tmp_path)).collect()}
    assert got == {("view", "click"): 2, ("click", "view"): 1}


def test_skew_report_flags_planted_hot_key(spark, tmp_path):
    import datetime as dt
    t0 = dt.datetime(2024, 6, 1)
    rows = [(i, t0, 999, "view", 1.0, "{}") for i in range(90)]   # hot user
    rows += [(100 + i, t0, i, "view", 1.0, "{}") for i in range(10)]  # 10 singletons
    spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).write.parquet(str(tmp_path / "events.parquet"))
    # minimal companion tables so the other audits run
    spark.createDataFrame([(1, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", "1996-01-02")],
        ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
         "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
         "l_linestatus", "l_shipdate"]).write.parquet(str(tmp_path / "lineitem.parquet"))
    spark.createDataFrame([(1, 1, "O", 5.0, "1996-01-01", "1-URGENT")],
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
         "o_orderdate", "o_orderpriority"]).write.parquet(str(tmp_path / "orders.parquet"))
    from lab3_lakehouse_spark.queries.scaleops import join_key_skew_report

    got = {r["key_col"]: r for r in join_key_skew_report(spark, str(tmp_path)).collect()}
    ev = got["events.user_id"]
    assert ev["n_rows"] == 100 and ev["n_keys"] == 11
    assert ev["max_key_rows"] == 90
    # max/mean = 90 / (100/11) = 9.9 — clearly flagged as skewed
    assert abs(ev["skew_max_over_mean"] - 9.9) < 1e-9


def test_seasonal_residual_finds_planted_spike(spark, tmp_path):
    import datetime as dt
    t0 = dt.datetime(2024, 7, 1, 0, 0, 0)
    rows = []
    eid = 0
    # two days of 1-event hours, except hour 30 (day 2, 06:00) has 50 events
    for h in range(48):
        n = 50 if h == 30 else 1
        for _ in range(n):
            rows.append((eid, t0 + dt.timedelta(hours=h), 1, "view", 1.0, "{}"))
            eid += 1
    spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).write.parquet(str(tmp_path / "events.parquet"))
    from lab3_lakehouse_spark.queries.scaleops import seasonal_residual_anomalies

    out = seasonal_residual_anomalies(spark, str(tmp_path)).collect()
    top = [r for r in out if r["rank"] == 1][0]
    assert top["hr"] == t0 + dt.timedelta(hours=30)
    assert top["residual"] == 49  # 50 vs 1 at the same hour yesterday


def test_cardinality_preflight_matches_actual_join(spark, sf_small):
    from lab3_lakehouse_spark.catalog import load_table
    from lab3_lakehouse_spark.queries.scaleops import join_cardinality_preflight

    got = {r["join_name"]: r["n_out"]
           for r in join_cardinality_preflight(spark, sf_small).collect()}
    li = load_table(spark, sf_small, "lineitem")
    orders = load_table(spark, sf_small, "orders")
    actual = li.join(orders, li["l_orderkey"] == orders["o_orderkey"]).count()
    assert got["lineitem*orders"] == actual


def test_span_dedup_plan_is_single_exchange(spark, sf_small):
    """The span-dedup pass must be explode → one hash-agg exchange on
    the md5 fingerprint — no join, no extra shuffle."""
    from lab3_lakehouse_spark.queries.scaleops import shared_span_dup_report

    df = shared_span_dup_report(spark, sf_small)
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_exchange = plan.count("Exchange") - plan.count("BroadcastExchange")
    assert n_exchange <= 2, plan  # fan_out repartition + fingerprint agg
    assert "Join" not in plan


def test_cms_query_shares_one_token_explode(spark, sf_small):
    """cms_heavy_tokens_contract checkpoints the exploded token frame so
    the exact-count side and the sketch build don't re-tokenize."""
    from lab3_lakehouse_spark.queries.scaleops import cms_heavy_tokens_contract

    df = cms_heavy_tokens_contract(spark, sf_small)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the scan of documents appears at most once in the executed plan —
    # everything else reads the checkpointed RDD
    assert plan.count("documents.parquet") <= 1, plan


def test_bipartite_lsh_finds_cross_corpus_dup_only(spark):
    """Bipartite candidates must pair probe-vs-index only — never
    within either side — and catch a planted verbatim duplicate."""
    from lab3_lakehouse_spark.operators import dedup as dedup_ops

    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (10, base),                                  # index
        (11, "completely different text with no overlap whatsoever here"),
        (20, base),                                  # probe: dup of 10
        (21, "another unrelated probe document with fresh tokens only"),
    ]
    hashed = spark.createDataFrame(rows, ["doc_id", "text"]).select(
        F.col("doc_id").alias("__id"),
        dedup_ops.shingle_hashes("text", 3).alias("__h"),
    ).localCheckpoint(eager=False)
    cands = dedup_ops.minhash_lsh_candidates_bipartite(
        hashed.filter("__id >= 20"), hashed.filter("__id < 20")
    )
    verified = dedup_ops.minhash_verify_hashed(cands, hashed, threshold=0.8)
    got = [(r["id_a"], r["id_b"]) for r in verified.collect()]
    assert got == [(20, 10)], got


def test_nfc_normalize_on_planted_unicode(spark, tmp_path):
    """Combining-mark text must normalize to precomposed form; the
    Spark operator and DuckDB's nfc_normalize must agree byte-for-byte."""
    import duckdb

    from lab3_lakehouse_spark.operators.text import nfc_normalize

    decomposed = "cafe\u0301 cre\u0300me"   # e + combining accents (NFD)
    precomposed = "caf\u00e9 cr\u00e8me"    # precomposed \u00e9 / \u00e8 (NFC)
    assert decomposed != precomposed and len(decomposed) == len(precomposed) + 2
    rows = [(1, decomposed, "fr", "s1", 10), (2, "plain ascii", "en", "s2", 11)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    got = {r["doc_id"]: r["norm"]
           for r in df.select("doc_id", nfc_normalize("text").alias("norm")).collect()}
    assert got[1] == precomposed
    assert got[2] == "plain ascii"
    duck = duckdb.sql("select nfc_normalize(?)", params=[decomposed]).fetchone()[0]
    assert got[1] == duck, "Spark unicodedata and DuckDB utf8proc must agree"


# ------------------------------------------- scalable global rank ----


def test_global_row_number_exact_and_tie_stable(spark):
    """global_row_number must equal the naive global window's answer on
    planted data with duplicate metrics (ties break on the key, never
    straddle buckets) and assign each rank exactly once."""
    from lab3_lakehouse_spark.operators import windows as win_ops

    rows = [(i, float(v)) for i, v in enumerate([5, 3, 9, 3, 9, 1, 9, 7, 3, 2] * 5)]
    df = spark.createDataFrame(rows, ["k", "v"])
    got = {
        r["k"]: r["rank"]
        for r in win_ops.global_row_number(
            df, "v", ["k"], ascending=False, n_buckets=4
        ).collect()
    }
    want = {
        k: rank + 1
        for rank, (k, _) in enumerate(
            sorted(rows, key=lambda t: (-t[1], t[0]))
        )
    }
    assert got == want
    assert sorted(got.values()) == list(range(1, len(rows) + 1))


def test_global_row_number_plan_partitions_the_big_window(spark, sf_small):
    """The data-sized window must be hash-partitioned on the bucket id;
    the only un-partitioned frames are the one-row cuts aggregate and
    the <= n_buckets offsets table."""
    from lab3_lakehouse_spark.plans.analysis import formatted_plan
    from lab3_lakehouse_spark.queries import QUERIES

    plan = formatted_plan(QUERIES["global_balance_ranks"](spark, sf_small))
    assert "hashpartitioning(__b" in plan, plan


# ---------------------------------------------------------- pagerank ----


def test_pagerank_planted_star_graph(spark):
    """Hub of a 4-spoke star must outrank every spoke; ranks sum to ~1
    on a symmetric graph (no dangling leakage)."""
    from lab3_lakehouse_spark.operators import graph as graph_ops

    edges = [(0, i) for i in range(1, 5)] + [(i, 0) for i in range(1, 5)]
    e = spark.createDataFrame(edges, ["src", "dst"])
    r = {
        row.node: row.rank
        for row in graph_ops.pagerank(e, iterations=10).collect()
    }
    assert len(r) == 5
    assert all(r[0] > r[i] for i in range(1, 5))
    spoke = [r[i] for i in range(1, 5)]
    assert max(spoke) - min(spoke) < 1e-12  # symmetric spokes tie exactly
    assert abs(sum(r.values()) - 1.0) < 1e-9


def test_cooccurrence_edges_planted(spark):
    from lab3_lakehouse_spark.operators import graph as graph_ops

    df = spark.createDataFrame(
        [(1, "a"), (1, "b"), (1, "b"), (2, "c")], ["basket", "item"]
    )
    got = sorted(
        (r.src, r.dst)
        for r in graph_ops.cooccurrence_edges(
            df, group_col="basket", item_col="item"
        ).collect()
    )
    # both directions, deduped, no self-loops, singleton basket inert
    assert got == [("a", "b"), ("b", "a")]


def test_kmv_small_set_rule_exact_below_k(spark):
    """Below k cells the sketch IS the distinct set: estimate must be
    the exact count, and a saturated segment must use the theta rule."""
    from pyspark.sql import functions as F

    from lab3_lakehouse_spark.operators import sketches

    rows = [("small", f"u{i}") for i in range(5)] + [
        ("big", f"v{i}") for i in range(200)
    ]
    df = spark.createDataFrame(rows, ["seg", "user"])
    cells = sketches.kmv_cells(df, segment_col="seg", key_col="user", k=64)
    stats = (
        cells.groupBy("segment")
        .agg(F.max("h").alias("theta"), F.count(F.lit(1)).alias("nc"))
        .withColumn("est", sketches.kmv_estimate(F.col("theta"), F.col("nc"), 64))
        .collect()
    )
    by = {r.segment: r for r in stats}
    assert by["small"].nc == 5 and by["small"].est == 5.0
    assert by["big"].nc == 64
    # saturated estimate within a loose KMV error band of the truth
    assert 100 < by["big"].est < 400


def test_psi_detects_planted_drift(spark, tmp_path):
    """A genuinely shifted distribution must produce a PSI sum above the
    0.2 alarm line; an identical split stays near zero."""
    import datetime as _dt

    from pyspark.sql import functions as F

    from lab3_lakehouse_spark.queries import QUERIES

    ref_day = _dt.datetime(2024, 1, 10)
    cur_day = _dt.datetime(2024, 1, 20)
    rows = [(i, ref_day, "u", "view", 10.0 + (i % 5), "{}") for i in range(300)]
    rows += [(1000 + i, cur_day, "u", "view", 410.0 + (i % 5), "{}") for i in range(300)]
    spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).write.parquet(str(tmp_path / "events.parquet"))
    out = QUERIES["distribution_drift_psi"](spark, str(tmp_path))
    total = out.agg(F.sum("psi_term")).first()[0]
    assert total > 0.2, total  # mass moved from bucket 0 to bucket 8

    # identical halves: same values both periods → PSI ~ 0
    rows2 = [(i, ref_day, "u", "view", 10.0 + (i % 50), "{}") for i in range(300)]
    rows2 += [(1000 + i, cur_day, "u", "view", 10.0 + (i % 50), "{}") for i in range(300)]
    import shutil
    shutil.rmtree(str(tmp_path / "events.parquet"))
    spark.createDataFrame(
        rows2, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).write.parquet(str(tmp_path / "events.parquet"))
    flat = QUERIES["distribution_drift_psi"](spark, str(tmp_path))
    assert abs(flat.agg(F.sum("psi_term")).first()[0]) < 0.01


def test_psi_clamps_negative_values_into_bucket_zero(spark):
    """ADVICE r5: negative values must land in bucket 0, not silently
    vanish from the PSI denominator (floor(v/width) < 0 used to be
    excluded by the spine join from counts AND totals)."""
    import datetime as _dt

    from lab3_lakehouse_spark.operators import events as events_ops

    ref_day = _dt.datetime(2024, 1, 10)
    cur_day = _dt.datetime(2024, 1, 20)
    rows = [(ref_day, -25.0)] * 10 + [(ref_day, 75.0)] * 10
    rows += [(cur_day, -25.0)] * 10 + [(cur_day, 75.0)] * 10
    ev = spark.createDataFrame(rows, ["ts", "value"])
    out = events_ops.value_drift_psi(ev, split_ts="2024-01-16").collect()
    by = {r.bucket: r for r in out}
    # the 10 negative rows per period are IN bucket 0 and in the totals
    assert by[0].n_ref == 10 and by[0].n_cur == 10
    assert sum(r.n_ref for r in out) == 20 and sum(r.n_cur for r in out) == 20


def test_label_propagation_two_planted_cliques(spark):
    """Two 4-cliques joined by a single bridge edge: 2-round LPA must
    label each clique with its own minimum id, and the bridge must not
    merge them (one vote never beats three)."""
    from lab3_lakehouse_spark.operators import graph as graph_ops

    def clique(ids):
        return [(a, b) for a in ids for b in ids if a != b]

    edges = clique([1, 2, 3, 4]) + clique([10, 11, 12, 13]) + [(4, 10), (10, 4)]
    e = spark.createDataFrame(edges, ["src", "dst"])
    out = {r.node: r.label for r in graph_ops.label_propagation(e, iterations=2).collect()}
    assert {out[i] for i in (1, 2, 3, 4)} == {1}
    assert {out[i] for i in (10, 11, 12, 13)} == {10}


def test_triangle_stats_planted_graph(spark):
    """K4 plus a pendant: each K4 node sits on C(3,2)=3 triangles, the
    pendant on none; clustering coefficient is exact."""
    from lab3_lakehouse_spark.operators import graph as graph_ops

    k4 = [(a, b) for a in (1, 2, 3, 4) for b in (1, 2, 3, 4) if a < b]
    edges = k4 + [(4, 5)]
    e = spark.createDataFrame(edges, ["src", "dst"])
    out = {r.node: r for r in graph_ops.triangle_stats(e).collect()}
    for n in (1, 2, 3):
        assert out[n].n_triangles == 3 and out[n].deg == 3
        assert abs(out[n].clustering_coeff - 1.0) < 1e-12
    assert out[4].deg == 4 and out[4].n_triangles == 3
    assert abs(out[4].clustering_coeff - 0.5) < 1e-12  # 2*3/(4*3)
    assert out[5].n_triangles == 0 and out[5].clustering_coeff == 0.0
    # total triangle count: K4 has exactly 4 triangles
    assert sum(r.n_triangles for r in out.values()) == 3 * 4


def test_triangle_stats_orientation_is_acyclic_and_symmetric_input_ok(spark):
    """Symmetrized input (both directions) must not double-count, and a
    triangle with a degree tie still counts exactly once."""
    from pyspark.sql import functions as F

    from lab3_lakehouse_spark.operators import graph as graph_ops

    tri = [(1, 2), (2, 3), (1, 3)]
    both = tri + [(b, a) for a, b in tri]
    e = spark.createDataFrame(both, ["src", "dst"])
    out = graph_ops.triangle_stats(e).collect()
    assert all(r.n_triangles == 1 for r in out)


def test_ks_exact_on_hand_computed_case(spark):
    """4 ref values {1,2,3,4}, 4 cur values {3,4,5,6}: the CDF gap is
    maximal at value 2 (F_ref=0.5, F_cur=0) — KS = 0.5 exactly."""
    import datetime as _dt

    from lab3_lakehouse_spark.operators import events as events_ops

    ref_day = _dt.datetime(2024, 1, 10)
    cur_day = _dt.datetime(2024, 1, 20)
    rows = [(ref_day, float(v)) for v in (1, 2, 3, 4)]
    rows += [(cur_day, float(v)) for v in (3, 4, 5, 6)]
    ev = spark.createDataFrame(rows, ["ts", "value"])
    out = events_ops.value_drift_ks(ev, split_ts="2024-01-16").collect()[0]
    assert out.n_ref == 4 and out.n_cur == 4
    assert abs(out.ks_stat - 0.5) < 1e-12
    assert out.at_value == 2.0

    # identical samples → KS 0
    rows2 = [(ref_day, float(v)) for v in (1, 2, 3)]
    rows2 += [(cur_day, float(v)) for v in (1, 2, 3)]
    ev2 = spark.createDataFrame(rows2, ["ts", "value"])
    assert events_ops.value_drift_ks(ev2, split_ts="2024-01-16").collect()[0].ks_stat == 0.0


def test_ks_matches_bruteforce_window_form(spark, sf_medium):
    """The two-phase bucketed cumsum must equal the naive global-window
    KS on real data (the correctness claim of the scale-safe form)."""
    from pyspark.sql import Window

    from lab3_lakehouse_spark.catalog import load_table
    from lab3_lakehouse_spark.operators import events as events_ops

    ev = load_table(spark, sf_medium, "events")
    got = events_ops.value_drift_ks(ev, split_ts="2024-01-16").collect()[0]

    graded = ev.filter(F.col("value").isNotNull()).select(
        (F.col("ts") < F.lit("2024-01-16").cast("timestamp")).alias("is_ref"),
        F.col("value").cast("double").alias("v"),
    )
    c = graded.groupBy("v").agg(
        F.sum(F.when(F.col("is_ref"), 1).otherwise(0)).alias("nr"),
        F.sum(F.when(F.col("is_ref"), 0).otherwise(1)).alias("nc"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    tots = c.agg(F.sum("nr").alias("tr"), F.sum("nc").alias("tc")).collect()[0]
    naive = (
        c.select(
            "v",
            (F.sum("nr").over(w).cast("double") / F.lit(float(tots.tr))
             - F.sum("nc").over(w).cast("double") / F.lit(float(tots.tc))
             ).alias("d"),
        )
        .select("v", F.abs(F.col("d")).alias("ad"))
        .orderBy(F.desc("ad"), "v")
        .limit(1)
        .collect()[0]
    )
    assert abs(got.ks_stat - naive.ad) < 1e-12
    assert got.at_value == naive.v


def test_ks_plan_has_no_unpartitioned_big_window(spark, sf_medium):
    """The distinct-value cumsum must run under a PARTITIONED window;
    the only un-partitioned pieces are the ≤n_buckets offset frame and
    the final TakeOrdered."""
    from lab3_lakehouse_spark.catalog import load_table
    from lab3_lakehouse_spark.operators import events as events_ops

    ev = load_table(spark, sf_medium, "events")
    plan = (
        events_ops.value_drift_ks(ev, split_ts="2024-01-16")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    # the big window is keyed on the bucket id
    assert "partitionspec=[__b" in plan.replace(" ", "").lower() or "__b" in plan


def test_benford_digit_extraction_boundaries(spark, tmp_path):
    """Digit extraction must be exact at powers of ten (the case
    floor(log10) gets wrong by an ulp) and for sub-10 prices."""
    import datetime as _dt

    from lab3_lakehouse_spark.queries import QUERIES

    d = _dt.datetime(2024, 1, 1)
    prices = [1000.00, 999.99, 1.0, 9.99, 100.0, 55.5]
    rows = [
        (i, i, "O", float(p), d, "1-URGENT", f"Clerk#{i}", 0, "c")
        for i, p in enumerate(prices)
    ]
    spark.createDataFrame(
        rows,
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
         "o_orderdate", "o_orderpriority", "o_clerk", "o_shippriority",
         "o_comment"],
    ).write.parquet(str(tmp_path / "orders.parquet"))
    out = {r.digit: r.n_orders for r in
           QUERIES["benford_price_audit"](spark, str(tmp_path)).collect()}
    # 1000.00→1, 999.99→9, 1.0→1, 9.99→9, 100.0→1, 55.5→5
    assert out[1] == 3 and out[9] == 2 and out[5] == 1
    assert sum(out.values()) == 6


def test_crossval_folds_deterministic_and_partition_stable(spark, sf_small):
    from lab3_lakehouse_spark.queries import QUERIES

    a = QUERIES["crossval_fold_balance"](spark, sf_small).collect()
    b = QUERIES["crossval_fold_balance"](spark, sf_small).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert {r.fold for r in a} <= set(range(5))
    # every source's shares sum to 1
    by_src: dict[str, float] = {}
    for r in a:
        by_src[r.source] = by_src.get(r.source, 0.0) + r.share_of_source
    assert all(abs(v - 1.0) < 0.01 for v in by_src.values())


def test_burstiness_periodic_vs_bursty(spark):
    """A metronome (equal gaps) has sigma=0 → B = −1; a heavy-tailed
    gap mix pushes B positive."""
    import datetime as _dt

    from lab3_lakehouse_spark.operators import events as events_ops

    t0 = _dt.datetime(2024, 1, 1)
    rows = [(1, t0 + _dt.timedelta(seconds=60 * i)) for i in range(10)]
    # user 2: nine 1-second gaps then one 10-hour gap
    rows += [(2, t0 + _dt.timedelta(seconds=i)) for i in range(10)]
    rows += [(2, t0 + _dt.timedelta(hours=10))]
    ev = spark.createDataFrame(rows, ["user_id", "ts"])
    out = {r.user: r for r in events_ops.inter_event_burstiness(ev).collect()}
    assert abs(out[1].burstiness - (-1.0)) < 1e-12
    assert abs(out[1].mean_gap_s - 60.0) < 1e-9 and out[1].std_gap_s == 0.0
    # one dominant outlier among 10 gaps bounds B at
    # (√(n−1)−1)/(√(n−1)+1) = 0.5 — assert it approaches that bound
    assert out[2].burstiness > 0.45


def test_edge_embeddedness_k4_plus_pendant(spark):
    """K4: every edge has exactly 2 common neighbors and Jaccard 1.0
    (neighborhoods coincide after excluding endpoints); the pendant
    edge has none."""
    from lab3_lakehouse_spark.operators import graph as graph_ops

    k4 = [(a, b) for a in (1, 2, 3, 4) for b in (1, 2, 3, 4) if a < b]
    e = spark.createDataFrame(k4 + [(4, 5)], ["src", "dst"])
    out = {(r.a, r.b): r for r in graph_ops.edge_embeddedness(e).collect()}
    for pair in [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]:
        assert out[pair].n_common == 2, pair
    assert abs(out[(1, 2)].jaccard - 1.0) < 1e-12  # 2 / (2+2-2)
    # edge (3,4): deg_4 = 4 (pendant inflates) → J = 2/(2+3-2)
    assert abs(out[(3, 4)].jaccard - 2.0 / 3.0) < 1e-12
    assert out[(4, 5)].n_common == 0 and out[(4, 5)].jaccard == 0.0


def test_rolling_kmv_exact_below_k(spark, tmp_path):
    """With fewer than k distinct users in every window, the KMV
    small-set rule makes the estimate EXACT."""
    import datetime as _dt

    from lab3_lakehouse_spark.queries import QUERIES

    rows = []
    eid = 0
    d0 = _dt.datetime(2024, 3, 1)
    for day in range(10):
        for u in range(5 + day):  # growing distinct-user count
            rows.append((eid, d0 + _dt.timedelta(days=day), u, "view", 1.0, "{}"))
            eid += 1
    spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).write.parquet(str(tmp_path / "events.parquet"))
    out = QUERIES["rolling_7d_distinct_users"](spark, str(tmp_path)).collect()
    assert len(out) == 10
    for r in out:
        assert r.est_distinct_7d == float(r.exact_distinct_7d), r
    # day 10's window covers days 4..10 → users 0..13 = 14 distinct
    assert out[-1].exact_distinct_7d == 14


def test_interval_coverage_hand_case(spark):
    """[0,10] ∪ [5,15] ∪ [20,30] → two segments, 25 s covered; an
    interval touching a segment end (start == prev end) merges."""
    import datetime as _dt

    from lab3_lakehouse_spark.operators import events as events_ops

    t0 = _dt.datetime(2024, 1, 1)
    iv = [(1, 0, 10), (1, 5, 15), (1, 20, 30), (2, 0, 5), (2, 5, 9)]
    rows = [
        (u, t0 + _dt.timedelta(seconds=s), t0 + _dt.timedelta(seconds=e))
        for u, s, e in iv
    ]
    df = spark.createDataFrame(rows, ["u", "s", "e"])
    out = {
        r.key: r
        for r in events_ops.interval_coverage(
            df, key_col="u", start_col="s", end_col="e"
        ).collect()
    }
    assert out[1].n_intervals == 3 and out[1].n_segments == 2
    assert abs(out[1].covered_s - 25.0) < 1e-9
    # user 2: [0,5] and [5,9] touch (start == prev end) → ONE segment
    assert out[2].n_segments == 1 and abs(out[2].covered_s - 9.0) < 1e-9


def test_jl_projection_preserves_norms(spark, sf_medium):
    """JL with a ±1/√d matrix: norm ratios concentrate around 1 —
    check every vector stays within a generous band and the corpus
    mean is tight (E[ratio²] = 1 exactly for sign matrices)."""
    from lab3_lakehouse_spark.queries import QUERIES

    rows = QUERIES["embedding_random_projection"](spark, sf_medium).collect()
    assert len(rows) > 0
    ratios = [r.norm_ratio for r in rows]
    assert all(0.4 < x < 1.8 for x in ratios), (min(ratios), max(ratios))
    mean_sq = sum(x * x for x in ratios) / len(ratios)
    assert 0.85 < mean_sq < 1.15, mean_sq


def test_association_rules_planted_lift(spark, tmp_path):
    """A pair that always co-occurs must show lift ≫ 1 and confidence
    1.0; independent frequent items hover near lift 1."""
    import datetime as _dt

    from lab3_lakehouse_spark.queries import QUERIES

    rows = []
    d = _dt.datetime(2024, 1, 1)
    lk = 0
    # 10 baskets {100, 200} (perfect pair) out of 40 total baskets;
    # item 300 appears in every basket (independent of everything)
    for o in range(40):
        items = [300]
        if o < 10:
            items += [100, 200]
        items.append(400 + o)  # unique noise item per basket
        for it in items:
            rows.append((o, it, lk, 1.0, 1.0, 0.0, 0.0, "N", "O", d, d, d,
                         "x", "y", "z"))
            lk += 1
    cols = ["l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
            "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
            "l_linestatus", "l_shipdate", "l_commitdate", "l_receiptdate",
            "l_shipinstruct", "l_shipmode", "l_comment"]
    spark.createDataFrame(rows, cols).write.parquet(
        str(tmp_path / "lineitem.parquet")
    )
    out = {(r.ante, r.cons): r for r in
           QUERIES["basket_association_rules"](spark, str(tmp_path)).collect()}
    r = out[(100, 200)]
    assert r.confidence == 1.0 and r.n_both == 10
    assert abs(r.lift - 4.0) < 1e-9  # 10*40 / (10*10)
    # the perfect pair outranks any rule involving the ubiquitous item
    assert r.lift > max(
        v.lift for k, v in out.items() if 300 in k
    )


def test_ewma_hand_computed(spark, tmp_path):
    """Three days, alpha 0.3: ewma = [r1, .3r2+.7r1, .3r3+.21r2+.49r1]."""
    import datetime as _dt

    from lab3_lakehouse_spark.queries import QUERIES

    days = [_dt.datetime(2024, 1, i + 1) for i in range(3)]
    rev = [100.0, 200.0, 50.0]
    rows = [
        (i, i, "O", rev[i], days[i], "1-URGENT", "c", 0, "x")
        for i in range(3)
    ]
    spark.createDataFrame(
        rows,
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
         "o_orderdate", "o_orderpriority", "o_clerk", "o_shippriority",
         "o_comment"],
    ).write.parquet(str(tmp_path / "orders.parquet"))
    out = sorted(
        QUERIES["daily_revenue_ewma"](spark, str(tmp_path)).collect(),
        key=lambda r: r.day,
    )
    expect = [100.0, 0.3 * 200 + 0.7 * 100, 0.3 * 50 + 0.21 * 200 + 0.49 * 100]
    for r, e in zip(out, expect):
        assert abs(r.ewma - e) < 1e-9, (r.day, r.ewma, e)
        assert abs(r.residual - (r.revenue - e)) < 1e-9


def test_ks_empty_side_emits_no_row(spark):
    """KS with an empty reference or current sample is undefined —
    the operator must emit nothing, not a NaN that wins the sort."""
    import datetime as _dt

    from lab3_lakehouse_spark.operators import events as events_ops

    cur_day = _dt.datetime(2024, 1, 20)
    ev = spark.createDataFrame(
        [(cur_day, float(v)) for v in (1, 2, 3)], ["ts", "value"]
    )
    assert events_ops.value_drift_ks(ev, split_ts="2024-01-16").count() == 0


# ------------------------------------------------------------- KLL ----


def test_kll_kernel_merge_equals_bulk_and_bounds_error():
    """Sharded-build-then-merge must estimate as well as a single bulk
    build (mergeability), and both must hit the deterministic rank
    bound the registry contract asserts (ε = 0.015 with slack +1)."""
    import numpy as np

    from lab3_lakehouse_spark.operators.sketches import (
        _kll_insert,
        _kll_merge,
        _kll_quantiles,
    )

    rng = np.random.RandomState(3)
    data = rng.lognormal(2.0, 1.5, size=200_000)
    k = 256
    merged = [[[], 0]]
    for shard in np.array_split(data, 8):
        lv = [[[], 0]]
        _kll_insert(lv, shard.tolist(), k)
        merged = _kll_merge(merged, lv, k)
    srt = np.sort(data)
    for q, est in zip([0.1, 0.5, 0.9], _kll_quantiles(merged, [0.1, 0.5, 0.9])):
        rank = np.searchsorted(srt, est, side="right")
        assert abs(rank - q * len(data)) <= 0.015 * len(data) + 1


def test_kll_kernel_is_deterministic():
    """Two builds over the same shard contents give identical level
    structure — the replayability the alternating-parity compactor
    buys over coin-flip KLL."""
    import numpy as np

    from lab3_lakehouse_spark.operators.sketches import _kll_insert

    rng = np.random.RandomState(5)
    data = rng.normal(size=50_000).tolist()
    builds = []
    for _ in range(2):
        lv = [[[], 0]]
        _kll_insert(lv, data, 128)
        builds.append([(sorted(items), p) for items, p in lv])
    assert builds[0] == builds[1]


def test_kll_spark_rollup_merges_across_shards(spark):
    """The Spark rollup path: per-shard sketch rows exist, merge to key
    grain returns one estimate per (key, q), and the estimate's exact
    rank respects the contract bound on a skewed planted column."""
    import numpy as np

    rows = []
    rng = np.random.RandomState(9)
    for g, scale in (("a", 1.0), ("b", 50.0)):
        for v in rng.exponential(scale, size=4000):
            rows.append((g, float(v)))
    df = spark.createDataFrame(rows, ["g", "v"]).repartition(8)
    sk = sketches.kll_sketch_rollup(df, ["g"], "v", k=128, shards=4)
    assert sk.filter(F.col("items").isNull()).count() == 0
    ests = sketches.kll_merge_quantiles(sk, ["g"], [0.5, 0.9], k=128)
    got = {(r["g"], r["q"]): r["est"] for r in ests.collect()}
    assert len(got) == 4
    by_g = {"a": [], "b": []}
    for g, v in rows:
        by_g[g].append(v)
    for (g, q), est in got.items():
        srt = np.sort(by_g[g])
        rank = np.searchsorted(srt, est, side="right")
        assert abs(rank - q * len(srt)) <= 0.015 * len(srt) + 1, (g, q)


# ------------------------------------------- dup-span interval union ----


def test_dup_span_repair_planted_overlap(spark):
    """Planted corpus: two docs share a 14-token verbatim block (→ 5
    consecutive shared 10-windows, ONE island), and a third doc shares
    two separate 10-token blocks whose token intervals overlap only
    via the window gap — the interval union must count each covered
    token once."""
    import os
    import tempfile

    import duckdb

    from lab3_lakehouse_spark.queries import ORACLES
    from lab3_lakehouse_spark.queries.scaleops import dup_span_repair_report
    from lab3_lakehouse_spark.testing import compare_frames

    shared = " ".join(f"s{i}" for i in range(14))          # 14 tokens
    uniq = lambda p, n: " ".join(f"{p}{i}" for i in range(n))
    rows = [
        (1, f"{uniq('a', 8)} {shared} {uniq('b', 8)}", "en", "web"),
        (2, f"{uniq('c', 5)} {shared} {uniq('d', 11)}", "en", "web"),
        (3, uniq("e", 40), "en", "web"),                    # clean doc
    ]
    tmp = tempfile.mkdtemp(prefix="spanrep_")
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"])
    df.write.mode("overwrite").parquet(os.path.join(tmp, "documents.parquet"))
    # fabricate the other table files the loader may probe lazily: only
    # documents is read by this query
    got = dup_span_repair_report(spark, tmp).orderBy("doc_id").toPandas()
    assert list(got["doc_id"]) == [1, 2]
    # doc 1: shared block spans tokens 9..22 → 14 tokens, 1 merged span
    r1 = got[got.doc_id == 1].iloc[0]
    assert r1["n_dup_spans"] == 1 and r1["dup_tokens"] == 14
    assert r1["n_tokens"] == 30
    assert abs(r1["dup_frac"] - round(14 / 30, 4)) < 1e-9
    # doc 2: same block at tokens 6..19
    r2 = got[got.doc_id == 2].iloc[0]
    assert r2["n_dup_spans"] == 1 and r2["dup_tokens"] == 14
    # and the DuckDB oracle agrees on the planted corpus too (register
    # only the documents view — the query touches nothing else)
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"'{os.path.join(tmp, 'documents.parquet')}/*.parquet'"
        )
        oracle = con.execute(ORACLES["dup_span_repair_report"]).df()
    finally:
        con.close()
    compare_frames(got, oracle, "dup_span_repair_planted")
