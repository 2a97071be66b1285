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


@given(
    n_words=st.integers(min_value=1, max_value=40),
    n_tokens=st.integers(min_value=2, max_value=12),
    stride_frac=st.integers(min_value=1, max_value=12),
)
@settings(max_examples=12, deadline=None)
def test_chunking_covers_every_token_in_order(spark, n_words, n_tokens, stride_frac):
    """Property: with stride ≤ n_tokens, the chunk sequence covers every
    token of the document in order, first chunk starts at token 0, and
    consecutive chunk starts differ by exactly `stride`."""
    from lab3_lakehouse_spark.operators.text import chunk_token_windows

    stride = min(stride_frac, n_tokens)  # overlap or exact tiling, never gaps
    words = [f"w{i}" for i in range(n_words)]
    df = spark.createDataFrame([(1, " ".join(words))], ["id", "text"])
    rows = (
        chunk_token_windows(df, "text", n_tokens=n_tokens, stride=stride)
        .orderBy("chunk_idx")
        .collect()
    )
    assert rows[0]["chunk_idx"] == 0
    seen = []
    for r in rows:
        start = r["chunk_idx"] * stride
        expect = words[start:start + n_tokens]
        assert r["chunk"].split() == expect
        seen.extend(expect)
    assert set(seen) == set(words)  # full coverage, no token dropped


@given(
    vec=st.lists(
        st.floats(
            min_value=-100.0, max_value=100.0,
            allow_nan=False, allow_infinity=False,
        ).filter(lambda x: abs(x) > 1e-9),
        min_size=1, max_size=16,
    )
)
@settings(max_examples=12, deadline=None)
def test_quantize_int8_error_bound_and_range(spark, vec):
    """Property: int8 codes stay in [-127,127] and reconstruction error
    per element is ≤ scale/2 (round-to-nearest guarantee)."""
    from lab3_lakehouse_spark.functions.vector import dequantize, quantize_int8

    df = spark.createDataFrame([(vec,)], ["vec"])
    r = df.select(
        quantize_int8("vec").alias("q"),
        F.col("vec").cast("array<double>").alias("v"),
    ).select(
        F.col("q.scale").alias("scale"),
        F.col("q.q").alias("codes"),
        F.zip_with(
            dequantize(F.col("q")), F.col("v"), lambda d, x: F.abs(x - d)
        ).alias("err"),
    ).first()
    assert all(-127 <= c <= 127 for c in r["codes"])
    assert all(e <= r["scale"] / 2 + 1e-9 for e in r["err"])


# ------------------------------------------- round-4 sketches ----

_keys = st.lists(
    st.text(alphabet="abcdefgh", min_size=1, max_size=4), min_size=1, max_size=60
)


@settings(max_examples=6, deadline=None)
@given(_keys)
def test_cms_estimate_dominates_exact_count(spark, ks):
    """CMS guarantee on arbitrary multisets: estimate >= true count for
    every key that appears (cells only ever over-count)."""
    from collections import Counter

    from lab3_lakehouse_spark.operators import sketches

    df = spark.createDataFrame([(k,) for k in ks], ["k"])
    cms = sketches.cms_build(df, "k", depth=3, width=8)
    uniq = spark.createDataFrame([(k,) for k in set(ks)], ["k"])
    est = {
        r["k"]: r["cms_n"]
        for r in sketches.cms_estimate(cms, uniq, "k", depth=3, width=8).collect()
    }
    truth = Counter(ks)
    assert all(est[k] >= n for k, n in truth.items()), (est, truth)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=40),
    st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=40),
)
def test_bloom_membership_never_misses(spark, members, probes):
    """No false negatives for ANY member/probe sets — the Bloom hard
    guarantee, independent of collisions."""
    from lab3_lakehouse_spark.operators import sketches

    mdf = spark.createDataFrame([(k,) for k in set(members)], ["k"])
    bits = sketches.bloom_build(mdf, "k", n_bits=128, n_hashes=2)
    pdf = spark.createDataFrame([(k,) for k in set(members) | set(probes)], ["k"])
    got = {
        r["k"]: r["bloom_pass"]
        for r in sketches.bloom_probe(
            pdf, F.col("k"), bits, n_bits=128, n_hashes=2
        ).collect()
    }
    assert all(got[k] for k in set(members))


@settings(max_examples=10, deadline=None)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 7), st.integers(0, 7)).filter(
            lambda e: e[0] != e[1]
        ),
        min_size=1,
        max_size=20,
    )
)
def test_pagerank_conserves_mass_on_symmetrized_graphs(spark, edges):
    """On any symmetrized edge set every node has out-edges, so no
    rank leaks: the vector must sum to 1 after every iteration count,
    and each rank stays within [teleport_floor, 1]."""
    from lab3_lakehouse_spark.operators import graph as graph_ops

    sym = sorted({(a, b) for a, b in edges} | {(b, a) for a, b in edges})
    e = spark.createDataFrame(sym, ["src", "dst"])
    ranks = graph_ops.pagerank(e, iterations=4)
    rows = ranks.collect()
    n = len(rows)
    total = sum(r.rank for r in rows)
    assert abs(total - 1.0) < 1e-9
    floor = (1.0 - 0.85) / n
    assert all(floor - 1e-12 <= r.rank <= 1.0 for r in rows)


@settings(max_examples=8, deadline=None)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 7), st.integers(0, 7)).filter(
            lambda e: e[0] != e[1]
        ),
        min_size=1,
        max_size=18,
    )
)
def test_triangle_stats_matches_bruteforce(spark, edges):
    """Degree-oriented triangle counts equal itertools brute force on
    arbitrary small graphs (any direction mix, duplicates included)."""
    import itertools

    from lab3_lakehouse_spark.operators import graph as graph_ops

    und = sorted({(min(a, b), max(a, b)) for a, b in edges})
    nodes = sorted({n for e in und for n in e})
    eset = set(und)
    expected = {n: 0 for n in nodes}
    for x, y, z in itertools.combinations(nodes, 3):
        if (x, y) in eset and (x, z) in eset and (y, z) in eset:
            expected[x] += 1
            expected[y] += 1
            expected[z] += 1
    e = spark.createDataFrame(edges, ["src", "dst"])
    got = {r.node: r.n_triangles for r in graph_ops.triangle_stats(e).collect()}
    assert got == expected
    # per-edge embeddedness consistency: 3 * total triangles = sum of
    # per-edge common-neighbor counts
    emb = graph_ops.edge_embeddedness(e).collect()
    assert sum(r.n_common for r in emb) == sum(expected.values())
    for r in emb:
        assert 0.0 <= r.jaccard <= 1.0


@settings(max_examples=8, deadline=None)
@given(
    sizes=st.lists(st.integers(3, 5), min_size=1, max_size=3),
)
def test_label_propagation_labels_disjoint_cliques(spark, sizes):
    """On disjoint cliques (size >= 3 — synchronous LPA oscillates on
    K2, the known bipartite case) every clique converges to its
    minimum id within 2 rounds, and labels never cross components."""
    from lab3_lakehouse_spark.operators import graph as graph_ops

    edges, base = [], 0
    comp = {}
    for s in sizes:
        ids = list(range(base, base + s))
        for a in ids:
            comp[a] = base
            for b in ids:
                if a != b:
                    edges.append((a, b))
        base += s + 3  # gap keeps id ranges disjoint
    e = spark.createDataFrame(edges, ["src", "dst"])
    out = {r.node: r.label for r in
           graph_ops.label_propagation(e, iterations=2).collect()}
    for node, label in out.items():
        assert label == comp[node], (node, label, comp[node])


def test_label_propagation_k2_sync_oscillates_self_vote_converges(spark):
    """The K2 fixture: pure synchronous LPA swaps the two labels every
    round (period-2 oscillation — the documented bipartite semantic),
    while the damped ``self_vote`` variant turns each swap into a tie
    and collapses the pair to the smaller id in one round, then stays
    fixed."""
    from lab3_lakehouse_spark.operators import graph as graph_ops

    e = spark.createDataFrame([(1, 2), (2, 1)], ["src", "dst"])
    # sync: odd iteration counts leave the labels swapped
    swapped = {r.node: r.label for r in
               graph_ops.label_propagation(e, iterations=1).collect()}
    assert swapped == {1: 2, 2: 1}
    back = {r.node: r.label for r in
            graph_ops.label_propagation(e, iterations=2).collect()}
    assert back == {1: 1, 2: 2}  # ... and even counts swap them back
    # damped: converged to one community by round 1, stable at round 2
    for its in (1, 2):
        damped = {r.node: r.label for r in graph_ops.label_propagation(
            e, iterations=its, self_vote=True).collect()}
        assert damped == {1: 1, 2: 1}, (its, damped)


def test_label_propagation_accepts_string_node_ids(spark):
    """The tie-break negates the vote COUNT, not the label, so string
    node ids work end-to-end (the rest of the graph module already
    accepted them)."""
    from lab3_lakehouse_spark.operators import graph as graph_ops

    tri = [("a", "b"), ("b", "c"), ("a", "c")]
    edges = tri + [(y, x) for x, y in tri]
    e = spark.createDataFrame(edges, ["src", "dst"])
    out = {r.node: r.label for r in
           graph_ops.label_propagation(e, iterations=2).collect()}
    assert out == {"a": "a", "b": "a", "c": "a"}


@settings(max_examples=8, deadline=None)
@given(
    gaps=st.lists(st.integers(1, 10_000), min_size=2, max_size=25),
)
def test_burstiness_bounded_and_mean_exact(spark, gaps):
    """B ∈ [−1, 1) for positive gaps, and the mean gap is the exact
    rational mean of the planted gaps."""
    import datetime as _dt

    from lab3_lakehouse_spark.operators import events as events_ops

    t = _dt.datetime(2024, 1, 1)
    rows = [(1, t)]
    for g in gaps:
        t = t + _dt.timedelta(seconds=g)
        rows.append((1, t))
    ev = spark.createDataFrame(rows, ["user_id", "ts"])
    out = events_ops.inter_event_burstiness(ev).collect()[0]
    assert -1.0 <= out.burstiness < 1.0
    assert abs(out.mean_gap_s - sum(gaps) / len(gaps)) < 1e-6
    assert out.n_events == len(gaps) + 1


@settings(max_examples=8, deadline=None)
@given(
    ref=st.lists(st.floats(0, 500, allow_nan=False), min_size=1, max_size=30),
    cur=st.lists(st.floats(0, 500, allow_nan=False), min_size=1, max_size=30),
)
def test_ks_bounded_and_zero_iff_identical(spark, ref, cur):
    """KS ∈ [0, 1] always; 0 when the two samples are identical."""
    import datetime as _dt

    from lab3_lakehouse_spark.operators import events as events_ops

    r_day, c_day = _dt.datetime(2024, 1, 10), _dt.datetime(2024, 1, 20)
    rows = [(r_day, float(v)) for v in ref] + [(c_day, float(v)) for v in cur]
    ev = spark.createDataFrame(rows, ["ts", "value"])
    out = events_ops.value_drift_ks(ev, split_ts="2024-01-16").collect()[0]
    assert 0.0 <= out.ks_stat <= 1.0
    if sorted(ref) == sorted(cur):
        assert out.ks_stat == 0.0


def test_bootstrap_weights_follow_poisson_pmf(spark):
    """The hash-drawn Poisson(1) weights' empirical frequencies over a
    large key set match the pmf the pinned CDF cut points encode —
    i.e. the inverse-CDF draw is calibrated, not merely deterministic.
    20k (key, replicate=0) draws; tolerance 4σ per weight class."""
    import math as _math

    from pyspark.sql import functions as F

    from lab3_lakehouse_spark.operators.sketches import portable_hash60
    from lab3_lakehouse_spark.queries.statops import (
        _BOOT_CDF,
        _BOOT_MAX_W,
        _BOOT_SEED,
        _TWO60,
    )

    n = 20_000
    df = spark.range(n).select(F.col("id").cast("string").alias("k"))
    u = (
        portable_hash60(
            F.concat(F.col("k"), F.lit(":"), F.lit("0")), _BOOT_SEED
        ).cast("double")
        / F.lit(_TWO60)
    )
    w = F.lit(_BOOT_MAX_W - 1)
    for k in range(len(_BOOT_CDF) - 1, -1, -1):
        w = F.when(u < F.lit(_BOOT_CDF[k]), F.lit(k)).otherwise(w)
    counts = {r["w"]: r["c"] for r in
              df.select(w.alias("w")).groupBy("w").agg(
                  F.count(F.lit(1)).alias("c")).collect()}
    pmf = [_math.exp(-1.0) / _math.factorial(k) for k in range(_BOOT_MAX_W - 1)]
    for k, p in enumerate(pmf):
        exp, sd = n * p, _math.sqrt(n * p * (1 - p))
        assert abs(counts.get(k, 0) - exp) < 4 * sd + 1, (k, counts.get(k, 0), exp)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),
            st.floats(min_value=0.0, max_value=3.0, allow_nan=False, width=64),
        ),
        min_size=1,
        max_size=3,
        unique_by=lambda t: t[0],
    )
)
def test_materialize_rate_mix_copy_counts_exact(spark, rate_rows):
    """For EVERY doc, the emitted copy count is exactly
    floor(rate) + [u <= frac] with u = (hash60(id)+1)/2^60 — verified
    against a Python replay of the identical md5 hash; copies are
    0..n-1 with no gaps. Hypothesis drives the rates across whole,
    fractional, zero and >2 values."""
    import hashlib

    from lab3_lakehouse_spark.operators import sampling as sample_ops

    sources = [s for s, _ in rate_rows]
    docs = [(i, sources[i % len(sources)]) for i in range(60)]
    df = spark.createDataFrame(docs, ["doc_id", "source"])
    rates = spark.createDataFrame(rate_rows, ["source", "boost"])
    out = sample_ops.materialize_rate_mix(
        df, rates, id_col="doc_id", source_col="source", seed=31
    ).collect()
    got: dict[int, list[int]] = {}
    for r in out:
        got.setdefault(r.doc_id, []).append(r.copy)
    rate_of = dict(rate_rows)
    import math as m

    for doc_id, source in docs:
        rate = rate_of[source]
        h = int(hashlib.md5(f"31|{doc_id}".encode()).hexdigest()[:15], 16)
        u = (h + 1) / float(1 << 60)
        expect = int(m.floor(rate)) + (1 if u <= rate - m.floor(rate) else 0)
        copies = sorted(got.get(doc_id, []))
        assert copies == list(range(expect)), (doc_id, rate, u, copies)


def test_dsir_weights_favor_target_lookalike_docs(spark):
    """Planted separation: target docs use vocabulary X, raw-only docs
    vocabulary Y, probe docs are pure-X / pure-Y / mixed. The DSIR log
    weight must rank pure-X > mixed > pure-Y — the ordering property
    the importance ratio exists for (exact values are covered by the
    oracle gate)."""
    from pyspark.sql import Row

    from lab3_lakehouse_spark.operators import text as text_ops

    x_text = "alpha beta gamma delta " * 6
    y_text = "omega sigma theta kappa " * 6
    rows = [Row(doc_id=i, text=x_text, grp="target") for i in range(10)]
    rows += [Row(doc_id=100 + i, text=y_text, grp="raw") for i in range(10)]
    rows += [
        Row(doc_id=200, text=x_text, grp="probe"),
        Row(doc_id=201, text=(x_text + y_text), grp="probe"),
        Row(doc_id=202, text=y_text, grp="probe"),
    ]
    df = spark.createDataFrame(rows)
    w = {
        r["doc_id"]: r["log_weight"]
        for r in text_ops.dsir_log_weights(
            df, "doc_id", "text", F.col("grp") == "target", buckets=256
        ).collect()
    }
    assert w[200] > w[201] > w[202], w
    assert w[200] > 0 > w[202]


# ------------------------------------------------------------- KLL ----


@given(
    st.lists(
        st.floats(min_value=-1e6, max_value=1e6,
                  allow_nan=False, allow_infinity=False),
        min_size=50, max_size=2000,
    ),
    st.integers(min_value=1, max_value=6),
)
@settings(max_examples=25, deadline=None)
def test_kll_rank_bound_property(values, n_shards):
    """Any shard split of any value list merges to estimates within
    the contract rank bound — the deterministic-KLL guarantee the
    registry contract asserts on the real tables, hypothesis-driven."""
    import numpy as np

    from lab3_lakehouse_spark.operators.sketches import (
        _kll_insert,
        _kll_merge,
        _kll_quantiles,
    )

    k = 128
    arr = np.asarray(values, dtype="float64")
    merged = [[[], 0]]
    for shard in np.array_split(arr, n_shards):
        lv = [[[], 0]]
        _kll_insert(lv, shard.tolist(), k)
        merged = _kll_merge(merged, lv, k)
    srt = np.sort(arr)
    n = len(srt)
    for q, est in zip([0.25, 0.5, 0.75], _kll_quantiles(merged, [0.25, 0.5, 0.75])):
        lo = np.searchsorted(srt, est, side="left")
        hi = np.searchsorted(srt, est, side="right")
        # est is an actual input value: any rank in [lo, hi] is a valid
        # rank for it (duplicates), so the error is the distance from
        # the target rank to that interval
        target = q * n
        err = 0.0 if lo <= target <= hi else min(
            abs(lo - target), abs(hi - target)
        )
        assert err <= 0.015 * n + 1, (q, est, lo, hi, n)


@given(
    st.lists(
        st.floats(min_value=0, max_value=1000,
                  allow_nan=False, allow_infinity=False),
        min_size=20, max_size=120,
    ),
    st.randoms(use_true_random=False),
)
@settings(max_examples=5, deadline=None)
def test_winsorized_query_matches_numpy(spark, values, rnd):
    """The REGISTRY QUERY's rank-cut winsorized mean equals the direct
    numpy computation (sort, clamp to the k+1-th / n−k-th order
    statistics, average) for arbitrary inputs — including tie-heavy
    ones. Runs winsorized_mean_event_values itself against a temp
    events table (the r9 version of this test recomputed both sides
    in numpy and could not catch a Spark-side regression)."""
    import shutil
    import tempfile

    import numpy as np

    from lab3_lakehouse_spark.queries import QUERIES

    # duplicate some values so ties straddle the cut boundaries
    vals = list(values) + rnd.sample(values, k=min(10, len(values)))
    q = 0.1
    n = len(vals)
    k = int(np.floor(q * n))
    srt = np.sort(np.asarray(vals, dtype="float64"))
    lo, hi = srt[k], srt[n - k - 1]
    expected = float(np.mean(np.clip(srt, lo, hi)))
    expected_raw = float(np.mean(srt))

    tmp = tempfile.mkdtemp(prefix="winsor_")
    try:
        spark.createDataFrame(
            [(int(i), "evt", float(v)) for i, v in enumerate(vals)],
            ["event_id", "event_type", "value"],
        ).write.parquet(f"{tmp}/events.parquet")
        row = QUERIES["winsorized_mean_event_values"](spark, tmp).collect()
        assert len(row) == 1 and row[0]["n"] == n and row[0]["k"] == k
        # query output is round4-ed; compare at that precision
        assert abs(row[0]["winsorized_mean"] - expected) <= 1e-4 + 1e-9
        assert abs(row[0]["raw_mean"] - expected_raw) <= 1e-4 + 1e-9
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_kll_sketch_rows_invariant_to_partitioning(spark):
    """The r10 replay contract (ADVICE r9): sketch rows are a pure
    function of the DATA — shard ids derive from xxhash64(value), not
    spark_partition_id, and the bulk-insert compactor is a pure
    function of the shard multiset — so the same rows produce
    byte-identical sketch rows under ANY file split / partition
    layout. This is what lets at-least-once replays of the streaming
    quantile tier be deduped on (batch_id, shard, level)."""
    import numpy as np

    from lab3_lakehouse_spark.operators import sketches

    rng = np.random.RandomState(7)
    rows = [("g" + str(i % 3), float(v)) for i, v in enumerate(rng.normal(size=400))]
    df = spark.createDataFrame(rows, ["k", "value"])

    def rows_of(parts):
        sk = sketches.kll_sketch_rollup(
            df.repartition(parts), ["k"], "value", k=64, shards=4
        )
        return sorted(
            (r["k"], r["__shard"], r["level"], tuple(r["items"]))
            for r in sk.collect()
        )

    a, b = rows_of(2), rows_of(11)
    assert a == b


def test_kll_compaction_preserves_estimates_exactly(spark):
    """kll_sketch_compact folds a key's shard rows into one compactor
    with the SAME deterministic merge the reader runs — quantile
    estimates from the compacted tier must be bit-identical, and the
    compacted tier must be no larger."""
    import numpy as np

    from lab3_lakehouse_spark.operators import sketches

    rng = np.random.RandomState(13)
    rows = [("g" + str(i % 2), float(v)) for i, v in enumerate(rng.exponential(size=600))]
    df = spark.createDataFrame(rows, ["k", "value"])
    sk = sketches.kll_sketch_rollup(df, ["k"], "value", k=64, shards=4)
    sk = sk.localCheckpoint(eager=False)
    compacted = sketches.kll_sketch_compact(sk, ["k"], k=64)
    qs = [0.1, 0.5, 0.9]
    pre = {
        (r["k"], r["q"]): r["est"]
        for r in sketches.kll_merge_quantiles(sk, ["k"], qs, k=64).collect()
    }
    post = {
        (r["k"], r["q"]): r["est"]
        for r in sketches.kll_merge_quantiles(
            compacted, ["k"], qs, k=64
        ).collect()
    }
    assert pre == post  # bit-identical, no tolerance
    assert compacted.count() <= sk.count()


# ---------------------------------------- round-10 continuation ops ----


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(
            # integer grid: distinct values stay distinct under
            # exp(v/200) (adjacent grid points differ by ~0.5% —
            # far beyond float eps), so the transform preserves the
            # TIE STRUCTURE exactly; free floats can collide post-
            # transform and legitimately change average ranks
            st.integers(min_value=1, max_value=500).map(float),
            st.booleans(),
        ),
        min_size=4,
        max_size=60,
    )
)
def test_mannwhitney_invariant_under_monotone_transform(spark, tmp_path_factory, rows):
    """U and z depend only on RANKS: applying exp(x/200) (strictly
    monotone) to every value must leave the statistic unchanged — the
    defining nonparametric property, and a direct check that the
    grouped-distinct rank formulation is rank-correct."""
    import datetime as dt
    import math

    from lab3_lakehouse_spark.queries import QUERIES

    # need both arms represented
    if not any(b for _, b in rows) or not all(b for _, b in rows):
        rows = rows + [(1.0, True), (2.0, False)]
    t0 = dt.datetime(2024, 1, 1)

    def run(transform):
        d = tmp_path_factory.mktemp("mw")
        data = [
            (f"e{i}", t0, "u", "purchase" if is_a else "click",
             transform(v))
            for i, (v, is_a) in enumerate(rows)
        ]
        spark.createDataFrame(
            data, ["event_id", "ts", "user_id", "event_type", "value"]
        ).write.parquet(str(d / "events.parquet"))
        return QUERIES["mannwhitney_value_shift"](spark, str(d)).first()

    base = run(lambda v: v)
    warped = run(lambda v: math.exp(v / 200.0))
    assert base["u_stat"] == warped["u_stat"]
    assert base["z_score"] == warped["z_score"]
    assert base["n_a"] == warped["n_a"] and base["n_b"] == warped["n_b"]


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=200),   # first-event offset h
            st.one_of(st.none(), st.integers(min_value=0, max_value=400)),
        ),
        min_size=2,
        max_size=40,
    )
)
def test_kaplan_meier_curve_is_valid_survival_function(spark, tmp_path_factory, subjects):
    """On arbitrary censored data the KM curve must be non-increasing,
    within [0, 1], and the at-risk counts non-increasing over time —
    the defining survival-function invariants."""
    import datetime as dt

    from lab3_lakehouse_spark.queries import QUERIES

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for u, (start_h, conv_delta) in enumerate(subjects):
        uid = f"u{u}"
        rows.append((f"s{uid}", t0 + dt.timedelta(hours=start_h), uid,
                     "click", 1.0))
        if conv_delta is not None:
            rows.append(
                (f"p{uid}",
                 t0 + dt.timedelta(hours=start_h + conv_delta),
                 uid, "purchase", 200.0)
            )
    d = tmp_path_factory.mktemp("km")
    spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value"]
    ).write.parquet(str(d / "events.parquet"))
    out = (
        QUERIES["kaplan_meier_conversion"](spark, str(d))
        .orderBy("dur_hours")
        .collect()
    )
    prev_s, prev_risk = 1.0 + 1e-9, None
    for r in out:
        assert 0.0 <= r["survival"] <= 1.0
        assert r["survival"] <= prev_s + 1e-9, "survival must not increase"
        assert r["n_events"] >= 1 and r["n_at_risk"] >= r["n_events"]
        if prev_risk is not None:
            assert r["n_at_risk"] <= prev_risk, "risk set must shrink"
        prev_s, prev_risk = r["survival"], r["n_at_risk"]


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.floats(min_value=1.0, max_value=200.0, allow_nan=False,
                      width=64),
            st.integers(min_value=1, max_value=60),
        ),
        min_size=1,
        max_size=50,
    )
)
def test_skyline_equals_bruteforce_on_random_frames(spark, tmp_path_factory, parts):
    """Distributed two-phase skyline == the quadratic dominance
    definition, on arbitrary (price, size) clouds incl. ties."""
    from lab3_lakehouse_spark.queries import QUERIES

    d = tmp_path_factory.mktemp("sky")
    rows = [(i, float(p), s) for i, (p, s) in enumerate(parts)]
    spark.createDataFrame(
        rows, ["p_partkey", "p_retailprice", "p_size"]
    ).write.parquet(str(d / "part.parquet"))
    got = {
        r["part_key"]
        for r in QUERIES["part_price_size_skyline"](spark, str(d)).collect()
    }
    want = set()
    for i, (p, s) in enumerate(parts):
        dominated = any(
            (q <= p and t >= s and (q < p or t > s))
            for j, (q, t) in enumerate(parts)
            if j != i
        )
        if not dominated:
            want.add(i)
    assert got == want


@settings(max_examples=4, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),      # user
            st.integers(min_value=0, max_value=500),    # minute offset
            st.sampled_from(["view", "click", "purchase"]),
            st.floats(min_value=1.0, max_value=300.0, allow_nan=False,
                      width=64),
        ),
        min_size=3,
        max_size=60,
    )
)
def test_attribution_books_balance_property(spark, tmp_path_factory, events):
    """On arbitrary event streams, the credited revenue summed over
    channels equals the total value of TOUCHED purchases, and credited
    conversions equal their count — the credit rule sums to exactly 1
    per conversion by construction."""
    import datetime as dt

    from lab3_lakehouse_spark.queries import QUERIES

    t0 = dt.datetime(2024, 3, 1)
    rows = [
        (f"e{i}", t0 + dt.timedelta(minutes=m), f"u{u}", et, v)
        for i, (u, m, et, v) in enumerate(events)
    ]
    d = tmp_path_factory.mktemp("attr")
    spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value"]
    ).write.parquet(str(d / "events.parquet"))
    out = QUERIES["multi_touch_attribution"](spark, str(d)).collect()
    # reference: touched purchases (any same-user earlier touch in 7d)
    touched_total, n_touched = 0.0, 0
    for i, (u, m, et, v) in enumerate(events):
        if et != "purchase":
            continue
        has_touch = any(
            u2 == u and et2 in ("view", "click") and m2 < m
            and m2 >= m - 7 * 24 * 60
            for (u2, m2, et2, _v2) in events
        )
        if has_touch:
            touched_total += v
            n_touched += 1
    got_rev = sum(r["credited_revenue"] for r in out)
    got_conv = sum(r["credited_conversions"] for r in out)
    assert got_rev == pytest.approx(touched_total, abs=1e-2)
    assert got_conv == pytest.approx(n_touched, abs=1e-6)


# ---------------------------------- r11: calibration equivariance ----

_cal_rows = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c"]),
        st.integers(min_value=1, max_value=500),
    ),
    min_size=4,
    max_size=40,
)


@settings(max_examples=6, deadline=None)
@given(_cal_rows)
def test_calibration_equivariant_under_monotone_transform(
    spark, tmp_path_factory, rows
):
    """Quantile normalization is rank-based, so a strictly increasing
    transform of the value column must (a) leave every source_quantile
    unchanged and (b) map every calibrated value through the SAME
    transform — the scale-free operator contract the docstring claims
    (n_chars stands in for any per-source score)."""
    from lab3_lakehouse_spark.queries import QUERIES

    def run(vals):
        d = tmp_path_factory.mktemp("cal")
        spark.createDataFrame(
            [(i, s, v) for i, (s, v) in enumerate(vals)],
            ["doc_id", "source", "n_chars"],
        ).write.parquet(str(d / "documents.parquet"))
        return {
            r.doc_id: r
            for r in QUERIES["source_length_calibration"](
                spark, str(d)
            ).collect()
        }

    base = run(rows)
    f = lambda v: 3 * v + 7  # strictly increasing, integer-preserving
    mapped = run([(s, f(v)) for s, v in rows])
    assert set(base) == set(mapped)
    for k in base:
        assert base[k].source_quantile == mapped[k].source_quantile, k
        assert f(base[k].calibrated_n_chars) == mapped[k].calibrated_n_chars, k


# -------------------------------------- r11: JSD mixture diagnostic ----

_jsd_docs = st.lists(
    st.tuples(
        st.sampled_from(["s0", "s1", "s2"]),
        st.lists(
            st.sampled_from(["t0", "t1", "t2", "t3", "t4"]),
            min_size=1,
            max_size=8,
        ),
    ),
    min_size=2,
    max_size=20,
)


@settings(max_examples=6, deadline=None)
@given(_jsd_docs)
def test_jsd_bounded_and_duplication_invariant(
    spark, tmp_path_factory, docs
):
    """On ANY corpus: 0 ≤ JSD ≤ 1 bit (the Jensen–Shannon bound), and
    duplicating every document (fresh ids) changes no distribution, so
    every per-source JSD is unchanged — the diagnostic measures the
    MIX, not the volume."""
    from lab3_lakehouse_spark.queries import QUERIES

    def run(docrows):
        d = tmp_path_factory.mktemp("jsd")
        spark.createDataFrame(
            docrows, ["doc_id", "source", "text"]
        ).write.parquet(str(d / "documents.parquet"))
        return {
            r.source: r.jsd_bits
            for r in QUERIES["source_token_jsd"](spark, str(d)).collect()
        }

    rows = [
        (i, s, " ".join(toks)) for i, (s, toks) in enumerate(docs)
    ]
    got = run(rows)
    for s, j in got.items():
        assert -1e-9 <= j <= 1.0 + 1e-9, (s, j)
    doubled = rows + [
        (1000 + i, s, t) for (i, s, t) in rows
    ]
    again = run(doubled)
    assert again == got


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.lists(
            st.sampled_from(["u0", "u1", "u2", "u3"]),
            min_size=1, max_size=6,
        ),
        min_size=1, max_size=10,
    )
)
def test_good_turing_mass_extremes(spark, tmp_path_factory, docs):
    """N₁/N pins its extremes: a corpus where every token occurrence is
    a distinct type has unseen mass exactly 1.0; one where every type
    occurs ≥ 2 times has exactly 0.0. Built from the SAME generated
    shape so the property covers arbitrary doc partitionings."""
    from lab3_lakehouse_spark.queries import QUERIES

    def run(rows):
        d = tmp_path_factory.mktemp("gt")
        spark.createDataFrame(
            rows, ["doc_id", "source", "text"]
        ).write.parquet(str(d / "documents.parquet"))
        out = QUERIES["good_turing_oov_estimate"](spark, str(d)).collect()
        assert len(out) == 1
        return out[0]

    # all-distinct: token j of doc i becomes unique "d{i}_t{j}"
    uniq = [
        (i, "src", " ".join(f"d{i}_t{j}" for j in range(len(toks))))
        for i, toks in enumerate(docs)
    ]
    r = run(uniq)
    assert r.gt_unseen_mass == 1.0 and r.n_singletons == r.n_tokens
    # every type doubled: repeat each token twice in place
    doubled = [
        (i, "src", " ".join(f"w{j} w{j}" for j in range(len(toks))))
        for i, toks in enumerate(docs)
    ]
    r2 = run(doubled)
    assert r2.gt_unseen_mass == 0.0 and r2.n_singletons == 0


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.integers(min_value=1, max_value=5000), min_size=2,
             max_size=12)
)
def test_waterfill_invariants_on_random_token_counts(spark, toks):
    """Property test for the closed-form capped waterfill (r12): for
    ANY positive per-source token counts, the allocation must satisfy
    the waterfilling optimality conditions — (1) budget exactly
    conserved (sum alloc == B, exact because capped allocs are
    integers and the uncapped share divides the integer remainder),
    (2) every alloc ≤ its cap, (3) all uncapped sources sit at ONE
    water level that is ≥ every capped source's cap (the exchange
    argument: otherwise moving budget from an uncapped to a capped
    source would equalize further), and (4) a sequential
    cap-and-redistribute reference fixed point computed in plain
    Python agrees on WHICH sources cap and on the level."""
    from lab3_lakehouse_spark.queries.corpus import _waterfill_frame

    tok = spark.createDataFrame(
        [(f"s{i}", t) for i, t in enumerate(toks)],
        "source string, n_tokens long",
    )
    rows = {r.source: r for r in _waterfill_frame(tok).collect()}
    total = sum(toks)
    budget = (9 * total) // 5
    # plain-Python sequential reference: sort by cap, cap greedily
    order = sorted((2 * t, f"s{i}") for i, t in enumerate(toks))
    rem_b, rem_n, capped_ref = budget, len(toks), set()
    for cap, name in order:
        if cap * rem_n <= rem_b:
            capped_ref.add(name)
            rem_b -= cap
            rem_n -= 1
    level = rem_b / rem_n if rem_n else 0.0

    assert {s for s, r in rows.items() if r.capped} == capped_ref
    allocs = {s: r.alloc_tokens for s, r in rows.items()}
    for s, r in rows.items():
        assert r.cap_tokens == 2 * r.n_tokens
        assert r.alloc_tokens <= r.cap_tokens + 1e-9
        if r.capped:
            assert r.alloc_tokens == float(r.cap_tokens)
            if rem_n:  # caps sit at or below the water level
                assert r.cap_tokens <= level + 1e-6
        else:
            assert abs(r.alloc_tokens - round(level, 4)) <= 1e-9
    if rem_n:  # budget conserved (uncapped rows absorb the remainder)
        assert abs(sum(allocs.values())
                   - (budget - (rem_b - rem_n * round(level, 4)))) < 1e-6
        assert abs(sum(allocs.values()) - budget) <= rem_n * 1e-4 + 1e-9
