"""Planted-fixture tests for the round-7 statistical/structural ops
(queries/statops.py). The differential oracle gate runs separately in
test_oracle_parity; these pin the SEMANTICS on constructed inputs."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from lab3_lakehouse_spark.queries import QUERIES


def _write(spark, tmp_path, table, rows, cols):
    spark.createDataFrame(rows, cols).write.parquet(
        str(tmp_path / f"{table}.parquet")
    )


def test_bootstrap_replicates_cover_true_mean(spark, tmp_path):
    """Poisson(1) weights: every replicate's effective count is a
    near-n draw (binomial-ish concentration), the replicate means
    scatter around the true mean, and the draw is deterministic
    (same hash seed → identical frame on re-run)."""
    n = 2000
    rows = [(i, 100.0 + (i % 7)) for i in range(n)]
    _write(spark, tmp_path, "orders", rows, ["o_orderkey", "o_totalprice"])
    out = QUERIES["bootstrap_revenue_ci"](spark, str(tmp_path)).collect()
    assert len(out) == 50
    true_mean = sum(r[1] for r in rows) / n
    for r in out:
        assert abs(r["n_eff"] - n) < 5 * math.sqrt(n), r
        assert abs(r["mean_revenue"] - true_mean) < 1.0, r
    again = QUERIES["bootstrap_revenue_ci"](spark, str(tmp_path)).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_theilsen_ignores_spike_ols_does_not(spark, tmp_path):
    """Linear revenue +10/day with one 10× spike day: the pairwise
    median stays ~10, OLS is dragged visibly."""
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for d in range(30):
        rev = 1000.0 + 10.0 * d
        if d == 15:
            rev *= 10
        rows.append((d, rev, t0 + dt.timedelta(days=d)))
    _write(spark, tmp_path, "orders", rows,
           ["o_orderkey", "o_totalprice", "o_orderdate"])
    r = QUERIES["revenue_theilsen_trend"](spark, str(tmp_path)).first()
    assert r["n_days"] == 30 and r["n_pairs"] == 30 * 29 // 2
    assert r["theilsen_slope"] == pytest.approx(10.0, abs=2.0)
    assert abs(r["ols_slope"] - 10.0) > 5 * abs(r["theilsen_slope"] - 10.0)


def test_kcore_keeps_clique_drops_fringe(spark, tmp_path):
    """6-clique (degree 5 inside) + a pendant path: k = floor(0.8·avg
    degree)+1 peels the fringe, the clique survives intact with its
    full residual degree."""
    clique = list(range(6))
    edges = [(a, b) for a in clique for b in clique if a < b]
    # pendant path 100-101-102 hanging off node 0
    edges += [(0, 100), (100, 101), (101, 102)]
    rows = []
    for i, (a, b) in enumerate(edges):
        rows += [(1000 + i, a), (1000 + i, b)]  # one 2-item order per edge
    _write(spark, tmp_path, "lineitem", rows, ["l_orderkey", "l_partkey"])
    out = {r["node"]: r["residual_deg"]
           for r in QUERIES["kcore_part_graph"](spark, str(tmp_path)).collect()}
    assert set(out) == set(clique)
    assert out[0] == 5 and all(out[v] == 5 for v in clique)


def test_trigram_paths_counts_planted_sequences(spark, tmp_path):
    t0 = dt.datetime(2024, 5, 1)
    seqs = {
        1: ["view", "view", "purchase"],
        2: ["view", "view", "purchase"],
        3: ["view", "click", "purchase"],
    }
    rows = []
    eid = 0
    for uid, seq in seqs.items():
        for j, et in enumerate(seq):
            rows.append((eid, t0 + dt.timedelta(minutes=j), uid, et, 1.0, "{}"))
            eid += 1
    _write(spark, tmp_path, "events", rows,
           ["event_id", "ts", "user_id", "event_type", "value", "props"])
    out = {r["path"]: r["n"]
           for r in QUERIES["event_type_trigram_paths"](spark, str(tmp_path)).collect()}
    assert out == {"view>view>purchase": 2, "view>click>purchase": 1}


def test_temperature_mix_upweights_tail_source(spark, tmp_path):
    """1:4 token split → shares .2/.8; τ=2 weights ∝ sqrt(share) →
    1/3 and 2/3; tail boost 5/3, head 5/6."""
    rows = [(1, "a b c d e", "en", "tail", 9)]
    rows += [(2 + i, "a b c d e", "en", "head", 9) for i in range(4)]
    _write(spark, tmp_path, "documents", rows,
           ["doc_id", "text", "lang", "source", "n_chars"])
    out = {r["source"]: r
           for r in QUERIES["domain_temperature_mix"](spark, str(tmp_path)).collect()}
    assert out["tail"]["token_share"] == pytest.approx(0.2)
    assert out["tail"]["temp_weight"] == pytest.approx(1 / 3, abs=1e-4)
    assert out["head"]["temp_weight"] == pytest.approx(2 / 3, abs=1e-4)
    assert out["tail"]["boost"] == pytest.approx(5 / 3, abs=1e-3)
    assert out["head"]["boost"] == pytest.approx(5 / 6, abs=1e-3)


def test_rank_ensemble_percentiles_and_composite(spark, tmp_path):
    """3 docs with strictly ordered signals → percentiles {0, .5, 1}
    per signal, composite = their mean."""
    rows = [
        (1, "aaa aaa aaa unique1 unique2", "en", "s", 9),      # repetitive
        (2, "plain words here nothing odd at all", "en", "s", 9),
        (3, "zq1 zq2 zq3 zq4 zq5 zq6 zq7", "en", "s", 9),      # all-rare
    ]
    _write(spark, tmp_path, "documents", rows,
           ["doc_id", "text", "lang", "source", "n_chars"])
    out = {r["doc_id"]: r
           for r in QUERIES["doc_quality_rank_ensemble"](spark, str(tmp_path)).collect()}
    assert len(out) == 3
    for r in out.values():
        vals = [r["pct_repetition"], r["pct_rare"], r["pct_surprisal"]]
        assert all(v in (0.0, 0.5, 1.0) for v in vals), r
        assert r["quality_score"] == pytest.approx(sum(vals) / 3, abs=2e-4)
    # doc 1 is the most repetitive → worst (highest) repetition pct
    assert out[1]["pct_repetition"] == 1.0


def test_cusum_two_sided_alarms_on_step_shift(spark, tmp_path):
    """Step from 100 to 200 at day 10 (mu = 150): the negative CUSUM
    alarms during the low half, the positive during the high half, and
    the folded values match the hand recursion."""
    t0 = dt.datetime(2024, 1, 1)
    rows = [(i, 100.0, t0 + dt.timedelta(days=i)) for i in range(10)]
    rows += [(10 + i, 200.0, t0 + dt.timedelta(days=10 + i)) for i in range(10)]
    _write(spark, tmp_path, "orders", rows,
           ["o_orderkey", "o_totalprice", "o_orderdate"])
    out = sorted(
        QUERIES["revenue_cusum_changepoints"](spark, str(tmp_path)).collect(),
        key=lambda r: r["day"],
    )
    assert len(out) == 20
    mu, k = 150.0, 3.0
    sp = sn = 0.0
    for i, r in enumerate(out):
        x = 100.0 if i < 10 else 200.0
        sp = max(0.0, sp + x - mu - k)
        sn = max(0.0, sn + mu - x - k)
        assert r["cusum_pos"] == pytest.approx(sp, abs=1e-4), i
        assert r["cusum_neg"] == pytest.approx(sn, abs=1e-4), i
    assert out[1]["alarm"] and out[1]["cusum_neg"] > 0     # low half: S- fires
    assert out[11]["alarm"] and out[11]["cusum_pos"] > 0   # high half: S+ fires


def test_holt_trend_matches_hand_recursion_on_ramp(spark, tmp_path):
    """Linear ramp 100, 110, 120, …: the folded (level, trend) match
    the hand recursion day by day, and the trend converges toward the
    true slope (10/day) — the property the trendless EWMA cannot
    have."""
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i, 100.0 + 10.0 * i, t0 + dt.timedelta(days=i)) for i in range(15)
    ]
    _write(spark, tmp_path, "orders", rows,
           ["o_orderkey", "o_totalprice", "o_orderdate"])
    out = sorted(
        QUERIES["revenue_holt_trend"](spark, str(tmp_path)).collect(),
        key=lambda r: r["day"],
    )
    assert len(out) == 15
    lvl, tr = 100.0, 0.0
    for i, r in enumerate(out):
        x = 100.0 + 10.0 * i
        if i > 0:
            lnew = 0.3 * x + 0.7 * (lvl + tr)
            tr = 0.2 * (lnew - lvl) + 0.8 * tr
            lvl = lnew
        assert r["level"] == pytest.approx(lvl, abs=1e-4), i
        assert r["trend"] == pytest.approx(tr, abs=1e-4), i
        assert r["forecast_next"] == pytest.approx(lvl + tr, abs=2e-4), i
    # trend approaches the true slope (10/day) — with b1=0 init it
    # overshoots before settling (classic Holt transient), so bound
    # loosely around the slope rather than from below only
    assert 8.0 < out[-1]["trend"] < 12.0
    assert abs(out[-1]["trend"] - 10.0) < abs(out[2]["trend"] - 10.0)


def test_retraction_ivm_equals_recompute_and_drops_empty_groups(spark, tmp_path):
    """Planted CDC: customer 1 keeps orders (one updated ×1.1),
    customer 2's only order is deleted (group must DISAPPEAR),
    customer 3 untouched. Maintained view == recompute by hand."""
    t0 = dt.datetime(2024, 1, 1)
    # keys: 10 = update (%10==0, not %100), 100 = delete (%100==0),
    # 7/13 untouched; 1000 = insert source (new key 10001000)
    rows = [
        (10, 1, "O", 100.0, "P1", t0),
        (7, 1, "O", 50.0, "P1", t0),
        (100, 2, "O", 30.0, "P1", t0),
        (13, 3, "O", 20.0, "P1", t0),
        (1000, 3, "O", 40.0, "P1", t0),
    ]
    _write(spark, tmp_path, "orders", rows,
           ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderpriority", "o_orderdate"])
    out = {r["o_custkey"]: r
           for r in QUERIES["incremental_agg_retractions"](
               spark, str(tmp_path)).collect()}
    # cust 2: sole order deleted → no row at all
    assert set(out) == {1, 3}
    # key 1000 is BOTH deleted (%100==0) and re-inserted as 10001000
    assert out[1]["n_orders"] == 2
    assert out[1]["total_spend"] == pytest.approx(100.0 * 1.1 + 50.0, abs=1e-4)
    assert out[3]["n_orders"] == 2  # 13 untouched + re-inserted copy of 1000
    assert out[3]["total_spend"] == pytest.approx(20.0 + 40.0, abs=1e-4)


def test_pq_codes_compress_and_clustered_recall(spark):
    """PQ on CLUSTERED vectors: 3 well-separated clusters in 8-d,
    m=2 subspaces — codes within a cluster agree, ADC top-k finds
    same-cluster neighbors with NO re-rank at all (rerank == k)."""
    import numpy as np

    from lab3_lakehouse_spark.operators import similarity as sim_ops

    rng = np.random.RandomState(7)
    centers = np.array([[5.0] * 8, [-5.0] * 8, [5.0] * 4 + [-5.0] * 4])
    rows = []
    for i in range(90):
        c = i % 3
        rows.append((i, (centers[c] + rng.normal(0, 0.1, 8)).tolist()))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    # each 4-d subspace has exactly TWO natural groups (+5s / −5s):
    # n_codes=2 so Lloyd lands one centroid per group (more codes
    # would legitimately split a group between two centroids)
    coded, books = sim_ops.pq_build(
        df, "vec_id", "embedding", dim=8, m=2, n_codes=2, seed=3
    )
    assert books.shape == (2, 2, 4)
    codes = {r["neighbor_id"]: tuple(r["__codes"]) for r in coded.collect()}
    for cl in range(3):
        members = [codes[i] for i in range(90) if i % 3 == cl]
        assert len(set(members)) == 1, f"cluster {cl} codes diverge"
    q = df.filter(F.col("vec_id") < 3)
    out = sim_ops.pq_topk(
        coded, books, q, "vec_id", "embedding", k=5, rerank=5
    ).collect()
    assert len(out) == 15
    for r in out:
        assert r["neighbor_id"] % 3 == r["query_id"] % 3, r


def test_pq_build_tiny_corpus_and_deterministic_sample(spark):
    """(a) A corpus smaller than n_codes must still build a full-shape
    codebook (seeding with replacement) instead of raising in
    rng.choice; (b) the training sample is the train_cap smallest
    (crc32(id), id) rows — a pure function of the id set — so two
    builds over DIFFERENT partitionings yield bit-identical codebooks
    (the r7 sample was scan-order dependent)."""
    import numpy as np

    from lab3_lakehouse_spark.operators import similarity as sim_ops

    rng = np.random.RandomState(11)
    rows = [(i, rng.normal(0, 1, 8).tolist()) for i in range(10)]
    tiny = spark.createDataFrame(rows, ["vec_id", "embedding"])
    coded, books = sim_ops.pq_build(
        tiny, "vec_id", "embedding", dim=8, m=2, n_codes=16, seed=5
    )
    assert books.shape == (2, 16, 4)
    assert coded.count() == 10

    rows2 = [(i, rng.normal(0, 1, 8).tolist()) for i in range(300)]
    base = spark.createDataFrame(rows2, ["vec_id", "embedding"])
    _, b1 = sim_ops.pq_build(
        base.repartition(1), "vec_id", "embedding", dim=8, m=2, n_codes=4
    )
    _, b2 = sim_ops.pq_build(
        base.repartition(13, "vec_id").sortWithinPartitions(
            F.col("vec_id").desc()
        ),
        "vec_id",
        "embedding",
        dim=8,
        m=2,
        n_codes=4,
    )
    assert np.array_equal(b1, b2)


def test_exact_median_matches_statistics_median(spark):
    """_exact_median_1row == quantile_cont(0.5) (avg of the two middle
    order statistics) on planted odd/even/tied/negative lists."""
    import statistics

    from lab3_lakehouse_spark.queries.statops import _exact_median_1row

    cases = [
        [1.0, 2.0, 3.0],
        [4.0, 1.0, 3.0, 2.0],
        [5.0] * 10,
        [-3.0, -1.0, -2.0, 10.0, 7.0],
        [float(x % 17) - 8.0 for x in range(1001)],
        [float((x * 37) % 101) for x in range(2000)],
    ]
    for vals in cases:
        df = spark.createDataFrame([(v,) for v in vals], ["v"])
        r = _exact_median_1row(df, "v").first()
        assert r["n"] == len(vals)
        assert r["med"] == pytest.approx(statistics.median(vals)), vals[:5]


def test_retrieval_mrr_on_planted_clusters(spark, tmp_path):
    """3 tight clusters (one per label): every query's nearest
    neighbors share its label → first_rel_rank 1, rr 1.0, hits@10 = 10."""
    import numpy as np

    rng = np.random.RandomState(11)
    centers = {lbl: rng.normal(0, 1, 64) * 5 for lbl in (0, 1, 2)}
    rows = []
    for i in range(60):
        lbl = i % 3
        rows.append((i, (centers[lbl] + rng.normal(0, 0.05, 64)).tolist(), lbl))
    _write(spark, tmp_path, "embeddings", rows, ["vec_id", "embedding", "label"])
    out = {r["query_id"]: r
           for r in QUERIES["retrieval_label_mrr"](spark, str(tmp_path)).collect()}
    assert len(out) == 16
    for r in out.values():
        assert r["first_rel_rank"] == 1 and r["reciprocal_rank"] == 1.0, r
        assert r["hits_at_10"] == 10, r


def test_funnel_deadline_excludes_late_conversions(spark, tmp_path):
    """User A converts within the 7-day windows, user B clicks on day 8
    (late), user C views only: exactly one windowed full funnel."""
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, 1, "view", 1.0, "{}"),
        (2, t0 + dt.timedelta(days=2), 1, "click", 1.0, "{}"),
        (3, t0 + dt.timedelta(days=5), 1, "purchase", 1.0, "{}"),
        (4, t0, 2, "view", 1.0, "{}"),
        (5, t0 + dt.timedelta(days=8), 2, "click", 1.0, "{}"),
        (6, t0, 3, "view", 1.0, "{}"),
    ]
    _write(spark, tmp_path, "events", rows,
           ["event_id", "ts", "user_id", "event_type", "value", "props"])
    r = QUERIES["funnel_conversion_deadline"](spark, str(tmp_path)).first()
    assert r["n_users"] == 3 and r["n_view"] == 3
    assert r["n_click_in_window"] == 1      # user B's click is late
    assert r["n_purchase_in_window"] == 1
    assert r["purchase_rate"] == 1.0


def test_k_anonymity_flags_small_groups(spark, tmp_path):
    rows = [(i, 0, "BUILDING") for i in range(10)]       # big group: safe
    rows += [(100 + i, 1, "MACHINERY") for i in range(3)]  # < 6: at risk
    _write(spark, tmp_path, "customer", rows,
           ["c_custkey", "c_nationkey", "c_mktsegment"])
    out = {(r["nationkey"], r["mktsegment"]): r
           for r in QUERIES["k_anonymity_audit"](spark, str(tmp_path)).collect()}
    assert not out[(0, "BUILDING")]["at_risk"]
    assert out[(1, "MACHINERY")]["at_risk"]
    assert out[(1, "MACHINERY")]["group_size"] == 3
