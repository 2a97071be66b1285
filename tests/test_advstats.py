"""Unit tests for queries/advstats.py — skyline, Kaplan–Meier, Welch,
Spearman, Gini, ACF, assortativity. Each test plants a known structure
and checks the operator recovers it (numpy reference implementations
where a closed form exists — scipy is absent in the sandbox)."""

from __future__ import annotations

import datetime as dt
import math

import numpy as np
import pandas as pd
import pytest

from lab3_lakehouse_spark.queries import QUERIES


def _write(spark, tmp_path, table, rows, cols):
    spark.createDataFrame(rows, cols).write.parquet(
        str(tmp_path / f"{table}.parquet")
    )


# ------------------------------------------------------------ skyline ----


def test_local_skyline_prune_keeps_frontier_drops_only_dominated():
    from lab3_lakehouse_spark.queries.advstats import _local_skyline

    rng = np.random.default_rng(7)
    pdf = pd.DataFrame(
        {
            "p_partkey": np.arange(400, dtype=np.int64),
            "p_retailprice": rng.uniform(1, 100, 400).round(2),
            "p_size": rng.integers(1, 50, 400).astype(np.int32),
        }
    )
    kept = pd.concat(list(_local_skyline(iter([pdf]))))

    def dominated(row, frame):
        return bool(
            (
                (frame.p_retailprice <= row.p_retailprice)
                & (frame.p_size >= row.p_size)
                & (
                    (frame.p_retailprice < row.p_retailprice)
                    | (frame.p_size > row.p_size)
                )
            ).any()
        )

    true_sky = {
        int(r.p_partkey) for r in pdf.itertuples() if not dominated(r, pdf)
    }
    kept_keys = set(kept.p_partkey.astype(int))
    assert true_sky <= kept_keys, "prune dropped a frontier row"
    dropped = set(pdf.p_partkey.astype(int)) - kept_keys
    for k in dropped:
        row = pdf[pdf.p_partkey == k].iloc[0]
        assert dominated(row, pdf), f"prune dropped non-dominated part {k}"


def test_skyline_matches_bruteforce(spark, tmp_path):
    rows = [
        (1, 10.0, 5),   # frontier
        (2, 10.0, 5),   # tie of 1 -> both kept (no strict dominance)
        (3, 10.0, 4),   # dominated by 1 (same price, smaller)
        (4, 5.0, 3),    # frontier (cheapest-for-size 3)
        (5, 20.0, 9),   # frontier (biggest)
        (6, 25.0, 9),   # dominated by 5 (pricier, same size)
        (7, 4.0, 1),    # frontier (cheapest overall)
        (8, 6.0, 1),    # dominated by 7 and 4
    ]
    _write(spark, tmp_path, "part", rows,
           ["p_partkey", "p_retailprice", "p_size"])
    got = {
        r["part_key"]
        for r in QUERIES["part_price_size_skyline"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got == {1, 2, 4, 5, 7}


# ------------------------------------------------------ Kaplan–Meier ----


def test_kaplan_meier_hand_computed_with_censoring(spark, tmp_path):
    """3 converters at hours 1, 1, 3; one censored at hour 2; one
    censored at horizon. KM: S(1) = 1 - 2/5 = 0.6; at t=3 risk set is
    {converter3, horizon-censored} = 2 -> S(3) = 0.6 * (1 - 1/2) = 0.3.
    The hour-2 censored subject leaves the risk set WITHOUT counting as
    an event — the property a naive converter-average gets wrong."""
    t0 = dt.datetime(2024, 1, 1)
    h = dt.timedelta(hours=1)
    rows = []
    # every user: a first event (click, low value) at t0
    for u in ["a", "b", "c", "d", "e"]:
        rows.append((f"s{u}", t0, u, "click", 1.0))
    # converters: high-value purchase at t0+1h (a, b) and t0+3h (c)
    rows.append(("pa", t0 + 1 * h, "a", "purchase", 200.0))
    rows.append(("pb", t0 + 1 * h, "b", "purchase", 150.0))
    rows.append(("pc", t0 + 3 * h, "c", "purchase", 131.0))
    # d: an event at +2h but never a qualifying purchase -> censored at
    # horizon (+5h) NOT at +2h (KM censors at last observation window,
    # which for this contract is the corpus horizon)
    rows.append(("xd", t0 + 2 * h, "d", "purchase", 50.0))
    # e: nothing further -> censored at horizon
    rows.append(("he", t0 + 5 * h, "e", "click", 1.0))
    _write(spark, tmp_path, "events", rows,
           ["event_id", "ts", "user_id", "event_type", "value"])
    out = {
        r["dur_hours"]: r
        for r in QUERIES["kaplan_meier_conversion"](
            spark, str(tmp_path)
        ).collect()
    }
    # death times: hour 1 (d=2) and hour 3 (d=1); d and e censored at 5h
    assert set(out) == {1, 3}
    assert out[1]["n_events"] == 2 and out[1]["n_at_risk"] == 5
    assert out[1]["survival"] == pytest.approx(0.6, abs=1e-4)
    # at t=3: subjects with dur >= 3 are c (3), d (5h censor), e (5h)
    assert out[3]["n_at_risk"] == 3
    assert out[3]["survival"] == pytest.approx(0.6 * (1 - 1 / 3), abs=1e-4)


def test_kaplan_meier_risk_wipeout_yields_zero_not_null(spark, tmp_path):
    """If the last at-risk subjects all convert at the same hour the
    ln(0) branch must short-circuit to survival 0.0 (Spark's log(0) is
    NULL, DuckDB's is -inf — the guarded CASE keeps both at 0.0)."""
    t0 = dt.datetime(2024, 1, 1)
    h = dt.timedelta(hours=1)
    rows = []
    for u in ["a", "b"]:
        rows.append((f"s{u}", t0, u, "click", 1.0))
        rows.append((f"p{u}", t0 + 2 * h, u, "purchase", 999.0))
    _write(spark, tmp_path, "events", rows,
           ["event_id", "ts", "user_id", "event_type", "value"])
    out = QUERIES["kaplan_meier_conversion"](spark, str(tmp_path)).collect()
    assert len(out) == 1
    assert out[0]["n_events"] == 2 and out[0]["n_at_risk"] == 2
    assert out[0]["survival"] == 0.0


# ------------------------------------------------------ Welch t-test ----


def test_welch_matches_numpy(spark, sf_small):
    out = QUERIES["welch_ttest_purchase_click"](spark, sf_small).first()
    ev = pd.read_parquet(f"{sf_small}/events.parquet")
    a = ev[(ev.event_type == "purchase") & ev.value.notna()].value.to_numpy()
    b = ev[(ev.event_type == "click") & ev.value.notna()].value.to_numpy()
    na, nb = len(a), len(b)
    va, vb = a.var(ddof=1), b.var(ddof=1)
    t = (a.mean() - b.mean()) / math.sqrt(va / na + vb / nb)
    df = (va / na + vb / nb) ** 2 / (
        (va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1)
    )
    assert out["n_a"] == na and out["n_b"] == nb
    assert out["t_stat"] == pytest.approx(t, abs=2e-4)
    assert out["welch_df"] == pytest.approx(df, rel=1e-3)


# --------------------------------------------------------- Spearman ----


def _avg_ranks(x: np.ndarray) -> np.ndarray:
    order = np.argsort(x, kind="stable")
    ranks = np.empty(len(x), dtype=float)
    sx = x[order]
    i = 0
    while i < len(sx):
        j = i
        while j + 1 < len(sx) and sx[j + 1] == sx[i]:
            j += 1
        ranks[order[i: j + 1]] = (i + j) / 2.0 + 1.0
        i = j + 1
    return ranks


def test_spearman_matches_numpy_average_ranks(spark, sf_small):
    out = {
        r["event_type"]: r
        for r in QUERIES["spearman_value_hour"](spark, sf_small).collect()
    }
    ev = pd.read_parquet(f"{sf_small}/events.parquet")
    ev = ev[ev.value.notna()]
    for etype, grp in ev.groupby("event_type"):
        rx = _avg_ranks(grp.value.to_numpy())
        ry = _avg_ranks(grp.ts.dt.hour.to_numpy().astype(float))
        rho = np.corrcoef(rx, ry)[0, 1]
        assert out[etype]["n_events"] == len(grp)
        assert out[etype]["spearman_rho"] == pytest.approx(rho, abs=2e-4), etype


def test_spearman_perfect_monotone_is_one(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (f"e{i}", t0 + dt.timedelta(hours=i % 24), "u", "click",
         float(i % 24) * 3.0 + 1.0)
        for i in range(48)
    ]
    _write(spark, tmp_path, "events", rows,
           ["event_id", "ts", "user_id", "event_type", "value"])
    out = QUERIES["spearman_value_hour"](spark, str(tmp_path)).first()
    assert out["spearman_rho"] == pytest.approx(1.0, abs=1e-4)


# ------------------------------------------------------------- Gini ----


def test_gini_equal_spend_is_zero_and_concentration_is_high(spark, tmp_path):
    orders = []
    # segment EQ: 10 customers, one order of 100 each -> Gini 0
    for i in range(10):
        orders.append((1000 + i, 100 + i, 100.0))
    # segment SKEW: 9 customers spend 1, one spends 1000
    for i in range(9):
        orders.append((2000 + i, 200 + i, 1.0))
    orders.append((2009, 209, 1000.0))
    custs = [(100 + i, "EQ") for i in range(10)] + [
        (200 + i, "SKEW") for i in range(10)
    ]
    _write(spark, tmp_path, "orders", orders,
           ["o_orderkey", "o_custkey", "o_totalprice"])
    _write(spark, tmp_path, "customer", custs, ["c_custkey", "c_mktsegment"])
    out = {
        r["segment"]: r
        for r in QUERIES["gini_segment_spend"](spark, str(tmp_path)).collect()
    }
    assert out["EQ"]["gini"] == pytest.approx(0.0, abs=1e-4)
    # exact rank formula on [1]*9 + [1000]
    x = np.array([1.0] * 9 + [1000.0])
    rn = np.arange(1, 11)
    g = (2 * (rn * x).sum() - 11 * x.sum()) / (10 * x.sum())
    assert out["SKEW"]["gini"] == pytest.approx(g, abs=1e-4)
    assert out["SKEW"]["n_customers"] == 10


def test_gini_matches_numpy_on_real_data(spark, sf_small):
    out = {
        r["segment"]: r["gini"]
        for r in QUERIES["gini_segment_spend"](spark, sf_small).collect()
    }
    orders = pd.read_parquet(f"{sf_small}/orders.parquet")
    cust = pd.read_parquet(f"{sf_small}/customer.parquet")
    spend = (
        orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
        .groupby(["c_mktsegment", "o_custkey"])["o_totalprice"]
        .sum()
        .reset_index()
    )
    for seg, grp in spend.groupby("c_mktsegment"):
        x = np.sort(grp.o_totalprice.to_numpy())
        n = len(x)
        rn = np.arange(1, n + 1)
        g = (2 * (rn * x).sum() - (n + 1) * x.sum()) / (n * x.sum())
        assert out[seg] == pytest.approx(g, abs=1e-3), seg


# -------------------------------------------------------------- ACF ----


def test_acf_detects_weekly_cycle(spark, tmp_path):
    """Planted period-7 series: lag-7 autocorrelation ~1, lag-1 far
    below it."""
    base = dt.datetime(2024, 1, 1)
    pattern = [100.0, 200.0, 300.0, 400.0, 300.0, 200.0, 100.0]
    rows = [
        (i, base + dt.timedelta(days=i), pattern[i % 7])
        for i in range(70)
    ]
    _write(spark, tmp_path, "orders", rows,
           ["o_orderkey", "o_orderdate", "o_totalprice"])
    out = {
        r["lag"]: r
        for r in QUERIES["acf_daily_revenue"](spark, str(tmp_path)).collect()
    }
    assert set(out) == set(range(1, 8))
    assert out[7]["acf"] > 0.85
    assert out[7]["acf"] > out[1]["acf"] + 0.3
    assert out[7]["n_pairs"] == 63


def test_acf_matches_numpy(spark, sf_small):
    out = {
        r["lag"]: r["acf"]
        for r in QUERIES["acf_daily_revenue"](spark, sf_small).collect()
    }
    orders = pd.read_parquet(f"{sf_small}/orders.parquet")
    daily = (
        orders.assign(day=orders.o_orderdate.dt.floor("D"))
        .groupby("day")["o_totalprice"]
        .sum()
        .sort_index()
        .to_numpy()
    )
    # mirror the engine's round4 pinning of the daily series + mean
    daily = np.floor(daily * 1e4 + 0.5) / 1e4
    mu = math.floor(daily.mean() * 1e4 + 0.5) / 1e4
    den = ((daily - mu) ** 2).sum()
    for k in range(1, 8):
        num = ((daily[:-k] - mu) * (daily[k:] - mu)).sum()
        assert out[k] == pytest.approx(num / den, abs=2e-4), k


# ----------------------------------------------- degree assortativity ----


def test_assortativity_star_graph_is_minus_one(spark, tmp_path):
    """Baskets {hub, leaf_i} build a star: every edge joins the deg-k
    hub to a deg-1 leaf -> assortativity exactly -1."""
    rows = []
    for i in range(1, 9):
        rows.append((i, 999))      # hub part in every order
        rows.append((i, i))        # one distinct leaf per order
    _write(spark, tmp_path, "lineitem", rows, ["l_orderkey", "l_partkey"])
    out = QUERIES["copurchase_degree_assortativity"](
        spark, str(tmp_path)
    ).first()
    assert out["n_nodes"] == 9 and out["n_edges"] == 8
    assert out["assortativity"] == pytest.approx(-1.0, abs=1e-4)


def test_assortativity_matches_numpy(spark, sf_small):
    out = QUERIES["copurchase_degree_assortativity"](spark, sf_small).first()
    li = pd.read_parquet(f"{sf_small}/lineitem.parquet")
    pairs = li.merge(li, on="l_orderkey")
    pairs = pairs[pairs.l_partkey_x < pairs.l_partkey_y]
    e = pairs[["l_partkey_x", "l_partkey_y"]].drop_duplicates()
    deg = pd.concat(
        [e.l_partkey_x, e.l_partkey_y]
    ).value_counts()
    x = np.concatenate([deg[e.l_partkey_x].to_numpy(float),
                        deg[e.l_partkey_y].to_numpy(float)])
    y = np.concatenate([deg[e.l_partkey_y].to_numpy(float),
                        deg[e.l_partkey_x].to_numpy(float)])
    r = np.corrcoef(x, y)[0, 1]
    assert out["n_edges"] == len(e)
    assert out["assortativity"] == pytest.approx(r, abs=2e-4)
