"""Statistical-resampling and structural analytics (round 7): Poisson
bootstrap uncertainty, robust Theil–Sen trend, CUSUM change points,
k-core peeling, event path mining, temperature-smoothed corpus mixing,
rank-ensemble quality scoring, retrieval-MRR evaluation, deadline-
bounded funnels, and k-anonymity auditing.

Every query carries a FULL DuckDB oracle. Cross-engine determinism
follows the engine conventions: portable md5-derived hashing for any
randomness (operators/sketches.portable_hash60), pinned double
literals for shared constants, exact integer/integer divisions where
possible, ``round4`` on every emitted float that crosses a
float-summation boundary.

No counterpart in the reference (SURVEY §2.7 extension surface).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lab3_lakehouse_spark.catalog import fan_out, load_table
from lab3_lakehouse_spark.operators import graph as graph_ops
from lab3_lakehouse_spark.operators import sampling as sampling_ops
from lab3_lakehouse_spark.operators.sketches import portable_hash60, sql_hash60
from lab3_lakehouse_spark.queries._util import round4, sql_round4
from lab3_lakehouse_spark.queries.registry import query
from lab3_lakehouse_spark.session import tune_session

# ------------------------------------------------- Poisson bootstrap ----

_BOOT_B = 50          # bootstrap replicates
_BOOT_SEED = 71       # portable-hash seed
_BOOT_MAX_W = 7       # CDF tail cut: P(Poisson(1) > 6) ≈ 8.3e-5

#: cumulative Poisson(1) CDF cut points P(X <= k), k = 0..5 — computed
#: once in Python and injected into BOTH engines as the same double
#: literal (repr round-trips exactly), so the inverse-CDF draw can
#: never straddle an engine-specific libm difference.
_BOOT_CDF = [
    sum(math.exp(-1.0) / math.factorial(i) for i in range(k + 1))
    for k in range(_BOOT_MAX_W - 1)
]

#: 2^60 as an exact double — the uniform draw is h / 2^60 with h the
#: 60-bit portable hash, an exact IEEE division on both engines.
_TWO60 = float(1 << 60)


def _boot_weight_sql(u: str) -> str:
    """Inverse-CDF Poisson(1) weight from a uniform expression."""
    cases = " ".join(
        f"WHEN {u} < CAST({c!r} AS DOUBLE) THEN {k}"
        for k, c in enumerate(_BOOT_CDF)
    )
    return f"(CASE {cases} ELSE {_BOOT_MAX_W - 1} END)"


def _bootstrap_oracle() -> str:
    h = sql_hash60("CAST(o_orderkey AS VARCHAR) || ':' || CAST(b AS VARCHAR)", _BOOT_SEED)
    u = f"({h})::DOUBLE / CAST({_TWO60!r} AS DOUBLE)"
    return f"""
    WITH reps AS (
        SELECT o.o_orderkey, o.o_totalprice, r.b,
               {_boot_weight_sql(u)} AS w
        FROM orders o
        CROSS JOIN (SELECT unnest(generate_series(0, {_BOOT_B - 1})) AS b) r
    )
    SELECT b AS replicate,
           CAST(sum(w) AS BIGINT) AS n_eff,
           {sql_round4('sum(w * o_totalprice) / sum(w)')} AS mean_revenue
    FROM reps
    GROUP BY b
    """


@query("bootstrap_revenue_ci", oracle=_bootstrap_oracle())
def bootstrap_revenue_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass Poisson bootstrap of mean order revenue — the
    uncertainty-quantification technique that actually works on massive
    data (Chamandy et al. 2012, "Estimating Uncertainty for Massive
    Data Streams"): instead of B full resamples (B passes, or a
    driver-side sample), every row draws an independent Poisson(1)
    weight per replicate from a hash of (row key, replicate id), and
    the B weighted means come out of ONE grouped aggregation. The
    replicate distribution is the sampling distribution of the mean;
    consumers take its percentiles as the CI.

    Scale shape: the ×B explode happens executor-side inside the scan
    stage, and hash partial aggregation collapses each partition to B
    rows before the exchange — shuffle volume is B × partitions rows,
    INDEPENDENT of the fact-table size. The weight is inverse-CDF from
    the md5-portable uniform with the cumulative-CDF cut points pinned
    as shared double literals, so DuckDB redraws bit-identical weights
    and the differential check covers the resampling itself, not just
    the plumbing. round4 on the means (cross-partition float sum
    order), exact BIGINT effective counts.
    """
    tune_session(spark)
    # fan_out: a low-SF orders table is ONE parquet split — without the
    # spread, the x50 explode + 7.5M md5 draws run on a single core
    orders = fan_out(
        load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    )
    reps = orders.select(
        "o_orderkey",
        "o_totalprice",
        F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B - 1))).alias("b"),
    )
    u = (
        portable_hash60(
            F.concat(
                F.col("o_orderkey").cast("string"),
                F.lit(":"),
                F.col("b").cast("string"),
            ),
            _BOOT_SEED,
        ).cast("double")
        / F.lit(_TWO60)
    )
    w = F.lit(_BOOT_MAX_W - 1)
    for k in range(len(_BOOT_CDF) - 1, -1, -1):
        w = F.when(u < F.lit(_BOOT_CDF[k]), F.lit(k)).otherwise(w)
    return (
        reps.withColumn("w", w)
        .groupBy(F.col("b").alias("replicate"))
        .agg(
            F.sum("w").cast("long").alias("n_eff"),
            round4(
                F.sum(F.col("w") * F.col("o_totalprice")) / F.sum("w")
            ).alias("mean_revenue"),
        )
    )


# --------------------------------------------------- Theil–Sen trend ----


def _exact_median_1row(df: DataFrame, col: str, n_buckets: int = 64) -> DataFrame:
    """Exact median of one column as a 1-row frame ``(n, med)`` —
    quantile_cont(0.5) semantics (average of the two middle order
    statistics for even n).

    Two-phase selection, NOT F.median (whose exact implementation
    buffers every value into the final aggregation — 8.6 s on 2.9M
    rows) and NOT a full bucketed ranking: approx_percentile cut points
    bucket the rows scan-side, the ≤ n_buckets cumulative counts
    locate which bucket(s) hold the middle ranks, and ONLY those
    bucket(s) (≈ n/n_buckets rows) pay a sort. Sketch error skews
    bucket sizes, never the selected values."""
    m = F.col(col)
    probs = F.array(*[F.lit(i / n_buckets) for i in range(1, n_buckets)])
    cuts = df.agg(F.approx_percentile(m, probs, F.lit(10000)).alias("__cuts"))
    bucketed = (
        df.crossJoin(F.broadcast(cuts))
        .withColumn(
            "__b",
            F.aggregate(
                F.col("__cuts"),
                F.lit(0),
                lambda acc, c: acc + F.when(m > c, 1).otherwise(0),
            ),
        )
        .drop("__cuts")
        .localCheckpoint(eager=False)
    )
    counts = bucketed.groupBy("__b").agg(F.count(F.lit(1)).alias("__bn"))
    w_off = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "__off", F.coalesce(F.sum("__bn").over(w_off), F.lit(0))
    ).crossJoin(
        F.broadcast(counts.agg(F.sum("__bn").alias("n")))
    )
    mid_lo = F.floor((F.col("n") + 1) / 2)
    mid_hi = F.floor(F.col("n") / 2) + 1
    # bucket(s) whose global-rank range [off+1, off+bn] covers a middle rank
    target = offsets.filter(
        (F.col("__off") < mid_hi) & (F.col("__off") + F.col("__bn") >= mid_lo)
    ).select("__b", "__off", "n")
    cand = bucketed.join(F.broadcast(target), "__b")
    w_in = Window.partitionBy("__b").orderBy(m.asc())
    return (
        cand.withColumn("__r", F.row_number().over(w_in) + F.col("__off"))
        .filter(
            (F.col("__r") == F.floor((F.col("n") + 1) / 2))
            | (F.col("__r") == F.floor(F.col("n") / 2) + 1)
        )
        .agg(F.first("n").alias("n"), F.avg(m).alias("med"))
    )


def _theilsen_oracle() -> str:
    return f"""
    WITH daily AS (
        SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
               {sql_round4('CAST(sum(o_totalprice) AS DOUBLE)')} AS rev
        FROM orders GROUP BY day
    ),
    ranked AS (
        SELECT day, rev, row_number() OVER (ORDER BY day) AS rn FROM daily
    ),
    slopes AS (
        SELECT (b.rev - a.rev) / CAST(b.rn - a.rn AS DOUBLE) AS slope
        FROM ranked a JOIN ranked b ON a.rn < b.rn
    ),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS n_pairs,
               quantile_cont(slope, 0.5) AS med
        FROM slopes
    ),
    ols AS (
        SELECT (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope
        FROM (
            SELECT CAST(count(*) AS DOUBLE) AS n,
                   sum(CAST(rn AS DOUBLE)) AS sx, sum(rev) AS sy,
                   sum(rn * rev) AS sxy, sum(CAST(rn AS DOUBLE) * rn) AS sxx
            FROM ranked
        )
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM ranked) AS n_days,
           s.n_pairs,
           {sql_round4('s.med')} AS theilsen_slope,
           {sql_round4('ols.slope')} AS ols_slope
    FROM s CROSS JOIN ols
    """


_REGION_OLS_ORACLE = f"""
    WITH daily AS (
        SELECT r.r_name AS region,
               CAST(date_trunc('day', o.o_orderdate) AS TIMESTAMP) AS day,
               {sql_round4('CAST(sum(o.o_totalprice) AS DOUBLE)')} AS rev
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        GROUP BY region, day
    ),
    ranked AS (
        SELECT region, rev,
               row_number() OVER (PARTITION BY region ORDER BY day) AS rn
        FROM daily
    ),
    sums AS (
        SELECT region,
               CAST(count(*) AS DOUBLE) AS n,
               sum(CAST(rn AS DOUBLE)) AS sx, sum(rev) AS sy,
               sum(rn * rev) AS sxy, sum(CAST(rn AS DOUBLE) * rn) AS sxx
        FROM ranked GROUP BY region
    )
    SELECT region,
           CAST(n AS BIGINT) AS n_days,
           {sql_round4('(n * sxy - sx * sy) / (n * sxx - sx * sx)')}
               AS ols_slope,
           {sql_round4('sy / n')} AS mean_daily_rev
    FROM sums
"""


@query("region_revenue_ols", oracle=_REGION_OLS_ORACLE)
def region_revenue_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED least-squares trend: per-region daily-revenue OLS slope
    — the segment-level growth decomposition a single global trend
    (revenue_theilsen_trend) can't show: a flat total can hide one
    region growing while another shrinks. Same closed-form sums as the
    global OLS (slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²)) with the day
    RANK inside each region as x (exact integers — the denominator is
    exact) and the round4-PINNED daily revenue as y, so both engines
    fold identical values and the division is the only libm-free float
    op. Plan: one star join (broadcast dims) + grouped daily pass, one
    per-region ranking window on the days-sized frame, one grouped sum
    pass — the fact table is scanned once."""
    tune_session(spark)
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    daily = (
        orders.join(
            F.broadcast(customer.select("c_custkey", "c_nationkey")),
            orders["o_custkey"] == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_regionkey")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(region.select("r_regionkey", "r_name")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy(
            F.col("r_name").alias("region"),
            F.date_trunc("day", "o_orderdate").alias("day"),
        )
        .agg(round4(F.sum("o_totalprice").cast("double")).alias("rev"))
    )
    w = Window.partitionBy("region").orderBy("day")
    ranked = daily.select(
        "region", "rev", F.row_number().over(w).alias("__rn")
    )
    x = F.col("__rn").cast("double")
    sums = ranked.groupBy("region").agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
        F.sum(x).alias("__sx"),
        F.sum("rev").alias("__sy"),
        F.sum(F.col("__rn") * F.col("rev")).alias("__sxy"),
        F.sum(x * F.col("__rn")).alias("__sxx"),
    )
    n, sx, sy = F.col("__n"), F.col("__sx"), F.col("__sy")
    sxy, sxx = F.col("__sxy"), F.col("__sxx")
    return sums.select(
        "region",
        n.cast("long").alias("n_days"),
        round4((n * sxy - sx * sy) / (n * sxx - sx * sx)).alias("ols_slope"),
        round4(sy / n).alias("mean_daily_rev"),
    )


@query("revenue_theilsen_trend", oracle=_theilsen_oracle())
def revenue_theilsen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust daily-revenue trend: the Theil–Sen estimator (median of
    all pairwise day-to-day slopes) next to the OLS slope it
    out-robusts — a handful of promo-spike days drags OLS but moves
    the pairwise median not at all; the gap between the two columns IS
    the outlier diagnostic.

    Scale shape mirrors daily_revenue_ewma: the O(days²) pairwise join
    runs on the DAILY AGGREGATE frame, which is O(days) rows at ANY
    corpus size — the one data-sized operation is the daily groupBy.
    The day-rank window rides that same bounded frame (the ≤ few-
    thousand-row spine exception, not the global-sort anti-pattern).
    Daily revenues are round4-ed BEFORE the pairwise slopes so both
    engines difference identical doubles; each slope is then one exact
    IEEE division.

    The median of the millions of slopes is the two-phase exact
    selection (``_exact_median_1row``): bucket by approx-percentile
    cut points, locate the middle ranks from the ≤64-row cumulative
    counts, sort ONLY the bucket holding them — quantile_cont(0.5)
    semantics (round4 absorbs the (a+b)/2-vs-lerp last-ulp
    difference). F.median's exact implementation buffers every value
    into the final aggregation: measured 8.6 s on 2.9M slopes vs
    ~1.5 s for the selection. The nested-loop pair join emits ONE
    partition, so the slope frame is re-spread first.
    """
    from lab3_lakehouse_spark.session import default_parallelism

    tune_session(spark)
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.date_trunc("day", "o_orderdate").alias("day")
    ).agg(round4(F.sum("o_totalprice").cast("double")).alias("rev"))
    ranked = daily.withColumn(
        "rn", F.row_number().over(Window.orderBy("day"))
    ).localCheckpoint(eager=False)
    # the streamed side of the nested-loop pair join is spread across
    # the cores BEFORE the join (its output inherits the streamed
    # side's partitioning — left as the window's single partition, all
    # O(days²) pair evaluation runs on one core); recomputing the
    # cheap join per consumer beats checkpointing 2.9M rows (measured)
    a = ranked.repartition(default_parallelism()).select(
        F.col("rn").alias("ri"), F.col("rev").alias("va")
    )
    b = ranked.select(F.col("rn").alias("rj"), F.col("rev").alias("vb"))
    slopes = a.join(b, F.col("ri") < F.col("rj")).select(
        (
            (F.col("vb") - F.col("va"))
            / (F.col("rj") - F.col("ri")).cast("double")
        ).alias("slope")
    )
    s = _exact_median_1row(slopes, "slope").select(
        F.col("n").alias("n_pairs"), "med"
    )
    n = F.count(F.lit(1)).cast("double")
    rn_d = F.col("rn").cast("double")
    ols = ranked.agg(
        n.alias("n"),
        F.sum(rn_d).alias("sx"),
        F.sum("rev").alias("sy"),
        F.sum(rn_d * F.col("rev")).alias("sxy"),
        F.sum(rn_d * rn_d).alias("sxx"),
        F.count(F.lit(1)).alias("n_days"),
    ).select(
        "n_days",
        (
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        ).alias("ols"),
    )
    return (
        s.crossJoin(F.broadcast(ols))
        .select(
            F.col("n_days").cast("long").alias("n_days"),
            F.col("n_pairs").cast("long").alias("n_pairs"),
            round4(F.col("med")).alias("theilsen_slope"),
            round4(F.col("ols")).alias("ols_slope"),
        )
    )


# -------------------------------------------------------- k-core peel ----

_KCORE_ROUNDS = 3     # fixed peeling rounds (deterministic, both engines)

#: k is DATA-DERIVED — floor(0.8 × average degree) + 1 — so the peel
#: bites but does not cascade to extinction at any scale factor (a
#: fixed literal peels nothing at sf0.01 and everything at sf10; k at
#: the full average collapses this quasi-random graph to an empty
#: core within 3 rounds — no dense-core structure survives its own
#: mean). floor of exact IEEE ops on two < 2^53 integers and a pinned
#: 0.8 literal: identical in both engines.
_KCORE_K_SQL = (
    "floor(CAST(0.8 AS DOUBLE) * (count(*)::DOUBLE / count(DISTINCT u))) + 1"
)


def _kcore_oracle() -> str:
    return f"""
    WITH RECURSIVE e AS MATERIALIZED (
        SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS a,
                        greatest(a.l_partkey, b.l_partkey) AS b
        FROM lineitem a
        JOIN lineitem b ON a.l_orderkey = b.l_orderkey
                       AND a.l_partkey <> b.l_partkey
    ),
    ue AS MATERIALIZED (
        SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e
    ),
    kth AS MATERIALIZED (SELECT {_KCORE_K_SQL} AS kv FROM ue),
    alive(r, nodes) AS (
        SELECT 0, (SELECT list(DISTINCT u ORDER BY u) FROM ue)
        UNION ALL
        SELECT r + 1,
               (SELECT coalesce(list(u ORDER BY u), CAST([] AS BIGINT[]))
                FROM (
                    SELECT ue.u
                    FROM ue
                    WHERE list_contains(alive.nodes, ue.u)
                      AND list_contains(alive.nodes, ue.v)
                    GROUP BY ue.u
                    HAVING count(*) >= (SELECT kv FROM kth)
                ))
        FROM alive WHERE r < {_KCORE_ROUNDS}
    ),
    final AS MATERIALIZED (SELECT nodes FROM alive WHERE r = {_KCORE_ROUNDS})
    SELECT CAST(ue.u AS BIGINT) AS node,
           CAST(count(*) AS BIGINT) AS residual_deg
    FROM ue, final
    WHERE list_contains(final.nodes, ue.u)
      AND list_contains(final.nodes, ue.v)
    GROUP BY ue.u
    """


@query("kcore_part_graph", oracle=_kcore_oracle())
def kcore_part_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core peeling of the co-purchase graph: iteratively drop nodes
    with fewer than k surviving neighbors — the standard dense-subgraph
    / spam-cluster extractor and the preprocessing step that bounds
    triangle and clique work on power-law graphs. k = floor(0.8 × mean
    degree) + 1 (data-derived — see the module constant for why);
    FIXED peel rounds (not run-to-fixpoint) so the Spark loop and the
    DuckDB recursive CTE compute the identical intermediate by
    construction; survivors are emitted with their residual degree
    among survivors.

    Scale: each round is two semi-joins of the edge list against the
    O(alive) node frame (Catalyst broadcasts while it fits) plus one
    degree count — the same keyed-only shuffle discipline as the
    LPA/PageRank loops, lineage cut per round with localCheckpoint.
    The threshold rides a broadcast 1-row frame: zero driver-side
    actions besides the checkpoints; rounds are a constant.
    """
    tune_session(spark)
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # the ordered edge list is consumed once (by the symmetrize) — lazy;
    # the symmetric frame is the loop's working set — one materialization
    e = graph_ops.cooccurrence_edges(
        li, group_col="l_orderkey", item_col="l_partkey", symmetric=False
    )
    cur = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=True)
    kth = cur.agg(
        (
            F.floor(
                F.lit(0.8)
                * (
                    F.count(F.lit(1)).cast("double")
                    / F.count_distinct(F.col("src")).cast("double")
                )
            )
            + F.lit(1)
        )
        .cast("long")
        .alias("kv")
    )

    # peeling maintains the SURVIVING-EDGE frame, not an alive-node set
    # probed against the full edge list: edges only shrink, so each
    # round's scan is over the previous round's survivors
    for _ in range(_KCORE_ROUNDS):
        alive = (
            cur.groupBy(F.col("src").alias("node"))
            .agg(F.count(F.lit(1)).alias("deg"))
            .crossJoin(F.broadcast(kth))
            .filter(F.col("deg") >= F.col("kv"))
            .select("node")
            .localCheckpoint(eager=True)
        )
        cur = (
            cur.join(alive.select(F.col("node").alias("src")), "src", "left_semi")
            .join(alive.select(F.col("node").alias("dst")), "dst", "left_semi")
            .localCheckpoint(eager=True)
        )
    return (
        cur.groupBy(F.col("src").alias("node"))
        .agg(F.count(F.lit(1)).alias("residual_deg"))
        .select(F.col("node").cast("long").alias("node"), "residual_deg")
    )


# ----------------------------------------------------- trigram paths ----

_PATHS_TOPK = 20


def _trigram_paths_oracle() -> str:
    return f"""
    WITH seq AS (
        SELECT user_id, event_type,
               lead(event_type, 1) OVER w AS e2,
               lead(event_type, 2) OVER w AS e3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_type || '>' || e2 || '>' || e3 AS path,
           CAST(count(*) AS BIGINT) AS n
    FROM seq
    WHERE e2 IS NOT NULL AND e3 IS NOT NULL
    GROUP BY path
    ORDER BY n DESC, path
    LIMIT {_PATHS_TOPK}
    """


@query("event_type_trigram_paths", oracle=_trigram_paths_oracle())
def event_type_trigram_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence mining one level up from the Markov transition matrix:
    the top-k most frequent 3-step event-type paths per user stream —
    the "how do users actually move" report (view>view>purchase vs
    view>click>purchase is a product decision). Two leads over the
    user-partitioned window (scale-fine: partitioned, never global),
    one grouped count over the tiny path vocabulary (map-side partial
    collapse — same shape as heavy_hitter_tokens), TakeOrdered top-k.
    Ordering ties broken on (ts, event_id) — total and identical in
    both engines."""
    tune_session(spark)
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e2").isNotNull() & F.col("e3").isNotNull())
    return (
        seq.select(
            F.concat_ws(">", "event_type", "e2", "e3").alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "path")
        .limit(_PATHS_TOPK)
    )


# ------------------------------------------------- temperature mixing ----


def _temperature_mix_oracle() -> str:
    return f"""
    WITH per AS (
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(len(regexp_split_to_array(text, '\\s+'))) AS BIGINT)
                   AS n_tokens
        FROM documents GROUP BY source
    ),
    tot AS (SELECT CAST(sum(n_tokens) AS DOUBLE) AS t FROM per),
    q AS (
        SELECT source, n_docs, n_tokens,
               n_tokens::DOUBLE / tot.t AS p,
               sqrt(n_tokens::DOUBLE / tot.t) AS qraw
        FROM per CROSS JOIN tot
    ),
    z AS (SELECT sum(qraw) AS zq FROM q)
    SELECT source, n_docs, n_tokens,
           {sql_round4('p')} AS token_share,
           {sql_round4('qraw / z.zq')} AS temp_weight,
           {sql_round4('(qraw / z.zq) / p')} AS boost
    FROM q CROSS JOIN z
    """


@query("domain_temperature_mix", oracle=_temperature_mix_oracle())
def domain_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-smoothed source mixing (the multilingual/multi-domain
    sampling rule of XLM-R / mT5, τ = 2 ⇒ weights ∝ share^(1/2)):
    up-samples tail sources and down-samples the head relative to
    natural token share; the emitted ``boost`` column is the
    oversampling factor a sampler applies per source. One grouped pass
    for per-source token totals, two broadcast singletons for the
    normalizers. share^(1/2) is computed as ``sqrt`` — IEEE-exact and
    bit-identical cross-engine, where a generic ``pow(x, 0.5)`` would
    trust two libms; the final divisions cross a ≤ n_sources float sum,
    hence round4."""
    tune_session(spark)
    docs = load_table(spark, sf_dir, "documents")
    per = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split("text", r"\s+"))).cast("long").alias("n_tokens"),
    )
    tot = per.agg(F.sum("n_tokens").cast("double").alias("t"))
    q = per.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_tokens",
        (F.col("n_tokens").cast("double") / F.col("t")).alias("p"),
        F.sqrt(F.col("n_tokens").cast("double") / F.col("t")).alias("qraw"),
    )
    z = q.agg(F.sum("qraw").alias("zq"))
    return q.crossJoin(F.broadcast(z)).select(
        "source",
        "n_docs",
        "n_tokens",
        round4(F.col("p")).alias("token_share"),
        round4(F.col("qraw") / F.col("zq")).alias("temp_weight"),
        round4((F.col("qraw") / F.col("zq")) / F.col("p")).alias("boost"),
    )


def _mix_materialized_oracle() -> str:
    # rates = the _temperature_mix_oracle math (round4-pinned boost —
    # the pin is what makes the fractional part cross-engine identical);
    # draws = floor(boost) whole copies + a hashed fractional copy,
    # u = (hash60(doc_id)+1)/2^60 exactly as operators/sampling.
    # materialize_rate_mix computes it (seed 31).
    u = f"({sql_hash60('d.doc_id', 31)} + 1)::DOUBLE / 1152921504606846976.0"
    return f"""
    WITH per AS (
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(len(regexp_split_to_array(text, '\\s+'))) AS BIGINT)
                   AS n_tokens
        FROM documents GROUP BY source
    ),
    tot AS (SELECT CAST(sum(n_tokens) AS DOUBLE) AS t FROM per),
    q AS (
        SELECT source, n_docs, n_tokens,
               n_tokens::DOUBLE / tot.t AS p,
               sqrt(n_tokens::DOUBLE / tot.t) AS qraw
        FROM per CROSS JOIN tot
    ),
    z AS (SELECT sum(qraw) AS zq FROM q),
    rates AS (
        SELECT source, n_docs,
               {sql_round4('qraw / z.zq')} AS temp_weight,
               {sql_round4('(qraw / z.zq) / p')} AS boost
        FROM q CROSS JOIN z
    ),
    docs_t AS (
        SELECT doc_id, source,
               CAST(len(regexp_split_to_array(text, '\\s+')) AS BIGINT) AS toks
        FROM documents
    ),
    draws AS (
        SELECT d.source, d.toks,
               CAST(floor(r.boost) AS BIGINT)
                 + CASE WHEN {u} <= r.boost - floor(r.boost)
                        THEN 1 ELSE 0 END AS n_copies
        FROM docs_t d JOIN rates r USING (source)
    ),
    mix AS (
        SELECT source,
               CAST(sum(n_copies) AS BIGINT) AS achieved_docs,
               CAST(sum(n_copies * toks) AS BIGINT) AS achieved_tokens
        FROM draws GROUP BY source
    ),
    mtot AS (SELECT CAST(sum(achieved_tokens) AS DOUBLE) AS mt FROM mix)
    SELECT r.source,
           r.n_docs AS n_docs_natural,
           r.boost AS target_boost,
           r.temp_weight AS target_share,
           COALESCE(m.achieved_docs, 0) AS achieved_docs,
           COALESCE(m.achieved_tokens, 0) AS achieved_tokens,
           {sql_round4('COALESCE(m.achieved_tokens, 0)::DOUBLE / mtot.mt')}
               AS achieved_share
    FROM rates r LEFT JOIN mix m USING (source) CROSS JOIN mtot
    """


@query("temperature_mix_materialized", oracle=_mix_materialized_oracle())
def temperature_mix_materialized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mixing loop CLOSED: domain_temperature_mix computes per-source
    target weights; this query APPLIES them
    (operators/sampling.materialize_rate_mix — floor(boost) whole copies
    per doc + a hash-drawn fractional copy, deterministic in doc_id) and
    emits the per-source achieved-vs-target accounting a curator signs
    off on: achieved doc/token counts of the materialized mixture and
    the achieved token share next to the temperature target share.
    Everything is exactly reproducible in both engines — boost is
    round4-pinned BEFORE sampling, the draw is portable_hash60 — so the
    oracle replays the identical mixture, not just its expectation.
    Plan: one grouped pass for rates (broadcast back), one corpus scan
    exploded ≤ ceil(boost)× for the mixture, one grouped pass for the
    accounting; the corpus is never shuffled."""
    tune_session(spark)
    docs = load_table(spark, sf_dir, "documents")
    # the ≤ n_sources rate frame feeds BOTH the mixture broadcast and
    # the final accounting join — localCheckpoint it once so its
    # corpus-scanning lineage isn't re-run per consumer (lazy: 20 rows)
    rates = (
        domain_temperature_mix(spark, sf_dir)
        .select("source", "n_docs", "temp_weight", "boost")
        .localCheckpoint(eager=False)
    )
    docs_t = docs.select(
        "doc_id",
        "source",
        F.size(F.split("text", r"\s+")).cast("long").alias("__toks"),
    )
    mix = sampling_ops.materialize_rate_mix(
        docs_t, rates, id_col="doc_id", source_col="source", seed=31
    )
    # acct feeds TWO consumers (the accounting join and the mtot total);
    # without a reuse point the corpus explode + grouped aggregation
    # lineage would execute twice — same treatment as rates above
    # (lazy localCheckpoint: ≤ n_sources rows)
    acct = (
        mix.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("achieved_docs"),
            F.sum("__toks").cast("long").alias("achieved_tokens"),
        )
        .localCheckpoint(eager=False)
    )
    mtot = acct.agg(F.sum("achieved_tokens").cast("double").alias("mt"))
    return (
        rates.join(F.broadcast(acct), "source", "left")
        .crossJoin(F.broadcast(mtot))
        .select(
            "source",
            F.col("n_docs").alias("n_docs_natural"),
            F.col("boost").alias("target_boost"),
            F.col("temp_weight").alias("target_share"),
            F.coalesce("achieved_docs", F.lit(0)).alias("achieved_docs"),
            F.coalesce("achieved_tokens", F.lit(0)).alias("achieved_tokens"),
            round4(
                F.coalesce("achieved_tokens", F.lit(0)).cast("double")
                / F.col("mt")
            ).alias("achieved_share"),
        )
    )


# ------------------------------------------- quality rank ensemble ----


def _ensemble_oracle() -> str:
    # ranking mirrors global_row_number exactly: row_number with the
    # doc_id tie-break, percentile = (rank-1)/(n-1) — exact int ratios.
    # Surprisal is round4-ed BEFORE ranking (raw float ranks could flip
    # on a last-ulp libm difference; the rounded value is shared).
    return f"""
    WITH toks AS (
        SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\\s+')) AS token
        FROM documents
    ),
    corpus AS (SELECT token, count(*) AS cnt FROM toks GROUP BY token),
    tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS t FROM corpus),
    tokstats AS (
        SELECT doc_id,
               count(CASE WHEN cnt <= 2 THEN 1 END)::DOUBLE / count(*) AS rare_frac,
               {sql_round4(f"avg(-ln(cnt::DOUBLE / tot.t) / 0.6931471805599453)")}
                   AS surprisal
        FROM toks JOIN corpus USING (token) CROSS JOIN tot
        GROUP BY doc_id
    ),
    per_tok AS (
        SELECT doc_id, token, count(*) AS c FROM toks GROUP BY doc_id, token
    ),
    rep AS (
        SELECT doc_id, max(c)::DOUBLE / sum(c) AS top_token_ratio
        FROM per_tok GROUP BY doc_id
    ),
    sig AS (
        SELECT r.doc_id, r.top_token_ratio, ts.rare_frac, ts.surprisal
        FROM rep r JOIN tokstats ts ON ts.doc_id = r.doc_id
    ),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM sig),
    ranked AS (
        SELECT doc_id,
               row_number() OVER (ORDER BY top_token_ratio ASC, doc_id) AS r_rep,
               row_number() OVER (ORDER BY rare_frac ASC, doc_id)       AS r_rare,
               row_number() OVER (ORDER BY surprisal DESC, doc_id)      AS r_surp
        FROM sig
    )
    SELECT ranked.doc_id,
           {sql_round4('(r_rep - 1)::DOUBLE / (n.n - 1)')}  AS pct_repetition,
           {sql_round4('(r_rare - 1)::DOUBLE / (n.n - 1)')} AS pct_rare,
           {sql_round4('(r_surp - 1)::DOUBLE / (n.n - 1)')} AS pct_surprisal,
           {sql_round4('''((r_rep - 1)::DOUBLE / (n.n - 1)
              + (r_rare - 1)::DOUBLE / (n.n - 1)
              + (r_surp - 1)::DOUBLE / (n.n - 1)) / 3.0''')} AS quality_score
    FROM ranked CROSS JOIN n
    """


@query("doc_quality_rank_ensemble", oracle=_ensemble_oracle())
def doc_quality_rank_ensemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-ensemble quality scoring — how production corpora actually
    blend incommensurable quality signals (a repetition ratio, a
    rare-token fraction and a surprisal live on different scales;
    their PERCENTILES don't): each signal is converted to its global
    percentile and the composite is the mean percentile, the score a
    top-X% corpus cut is taken on.

    The global percentile is the scale-safe two-phase ranking
    (operators/windows.global_row_number — approx_percentile cut
    points, PARTITIONED per-bucket row_number, broadcast offsets),
    run once per signal over the doc-keyed frame: never a
    single-partition global sort, which is the anti-pattern a naive
    percent_rank() would lower to at a billion documents. Percentile =
    (rank−1)/(n−1): exact integer ratio; the only float signal
    (surprisal) is round4-ed BEFORE ranking so both engines rank
    identical doubles; the better direction is pinned per signal
    (repetition/rare ascending-good, surprisal descending-good).
    """
    from lab3_lakehouse_spark.catalog import fan_out
    from lab3_lakehouse_spark.operators import text as text_ops
    from lab3_lakehouse_spark.operators import windows as win_ops
    from lab3_lakehouse_spark.operators.dedup import tokens

    tune_session(spark)
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    rep = text_ops.repetition_features(docs.select("doc_id", "text")).select(
        "doc_id", "top_token_ratio"
    )
    toks = docs.select(
        "doc_id", F.explode(tokens("text")).alias("token")
    ).localCheckpoint(eager=False)
    corpus = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    tot = corpus.agg(F.sum("cnt").cast("double").alias("t"))
    tokstats = (
        toks.join(corpus, "token")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            (
                F.count(F.when(F.col("cnt") <= 2, 1)).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("rare_frac"),
            round4(
                F.avg(
                    -F.log(F.col("cnt").cast("double") / F.col("t"))
                    / F.lit(0.6931471805599453)
                )
            ).alias("surprisal"),
        )
    )
    sig = rep.join(tokstats, "doc_id").localCheckpoint(eager=False)
    n = sig.agg(F.count(F.lit(1)).alias("n"))

    ranked = win_ops.global_row_number(
        sig, "top_token_ratio", ["doc_id"], rank_col="r_rep", ascending=True
    )
    ranked = win_ops.global_row_number(
        ranked, "rare_frac", ["doc_id"], rank_col="r_rare", ascending=True
    )
    ranked = win_ops.global_row_number(
        ranked, "surprisal", ["doc_id"], rank_col="r_surp", ascending=False
    )
    pct = lambda r: (F.col(r) - 1).cast("double") / (F.col("n") - 1)  # noqa: E731
    return ranked.crossJoin(F.broadcast(n)).select(
        "doc_id",
        round4(pct("r_rep")).alias("pct_repetition"),
        round4(pct("r_rare")).alias("pct_rare"),
        round4(pct("r_surp")).alias("pct_surprisal"),
        round4(
            (pct("r_rep") + pct("r_rare") + pct("r_surp")) / F.lit(3.0)
        ).alias("quality_score"),
    )


# ----------------------------------------------- CUSUM change point ----

_CUSUM_K_FRAC = 0.02   # slack, as a fraction of mean daily revenue
_CUSUM_H_FRAC = 0.15   # alarm threshold, as a fraction of mean


def _cusum_oracle() -> str:
    return f"""
    WITH RECURSIVE daily AS MATERIALIZED (
        SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
               {sql_round4('CAST(sum(o_totalprice) AS DOUBLE)')} AS rev
        FROM orders GROUP BY day
    ),
    ranked AS MATERIALIZED (
        SELECT day, rev, row_number() OVER (ORDER BY day) AS rn FROM daily
    ),
    p AS MATERIALIZED (
        SELECT {sql_round4('avg(rev)')} AS mu FROM ranked
    ),
    cus(rn, day, rev, sp, sn) AS (
        SELECT rn, day, rev,
               greatest(CAST(0.0 AS DOUBLE),
                        rev - p.mu - CAST({_CUSUM_K_FRAC} AS DOUBLE) * p.mu),
               greatest(CAST(0.0 AS DOUBLE),
                        p.mu - rev - CAST({_CUSUM_K_FRAC} AS DOUBLE) * p.mu)
        FROM ranked CROSS JOIN p WHERE rn = 1
        UNION ALL
        SELECT r.rn, r.day, r.rev,
               greatest(CAST(0.0 AS DOUBLE),
                        cus.sp + r.rev - p.mu - CAST({_CUSUM_K_FRAC} AS DOUBLE) * p.mu),
               greatest(CAST(0.0 AS DOUBLE),
                        cus.sn + p.mu - r.rev - CAST({_CUSUM_K_FRAC} AS DOUBLE) * p.mu)
        FROM cus JOIN ranked r ON r.rn = cus.rn + 1 CROSS JOIN p
    )
    SELECT cus.day, cus.rev,
           {sql_round4('cus.sp')} AS cusum_pos,
           {sql_round4('cus.sn')} AS cusum_neg,
           (cus.sp > CAST({_CUSUM_H_FRAC} AS DOUBLE) * p.mu
            OR cus.sn > CAST({_CUSUM_H_FRAC} AS DOUBLE) * p.mu) AS alarm
    FROM cus CROSS JOIN p
    """


@query("revenue_cusum_changepoints", oracle=_cusum_oracle())
def revenue_cusum_changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided CUSUM change-point monitor on daily revenue (Page
    1954): S⁺ accumulates upward deviations beyond a slack k, S⁻
    downward; either crossing h flags a sustained level shift — the
    drift detector that catches slow creep the EWMA residual and the
    24h seasonal-naive both smooth over. k and h are pinned fractions
    of mean daily revenue.

    The recursion S_t = max(0, S_{t-1} + x_t − μ − k) is inherently
    sequential, so it runs as ONE ordered array fold over the daily
    aggregate frame — O(days) rows at any corpus size, the same
    bounded-frame discipline as daily_revenue_ewma/theilsen (the data-
    sized work is the daily groupBy; the fold is a single executor-side
    pass over ≤ thousands of days). Daily revenues and μ are round4-ed
    BEFORE the recursion so both engines fold identical doubles in
    identical order (Spark folds the day-sorted array; DuckDB recurses
    over rn) — the recursion then agrees bit-for-bit, and comparisons
    against k·μ / h·μ cannot straddle an engine difference.
    """
    tune_session(spark)
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.date_trunc("day", "o_orderdate").alias("day")
    ).agg(round4(F.sum("o_totalprice").cast("double")).alias("rev"))
    mu = daily.agg(round4(F.avg("rev")).alias("mu"))

    # one row: the day-sorted (day, rev) array + the fold
    arr = daily.agg(
        F.array_sort(F.collect_list(F.struct("day", "rev"))).alias("xs")
    ).crossJoin(F.broadcast(mu))
    k = F.col("mu") * F.lit(_CUSUM_K_FRAC)
    h = F.col("mu") * F.lit(_CUSUM_H_FRAC)
    zero = F.lit(0.0).cast("double")
    folded = arr.select(
        F.aggregate(
            F.col("xs"),
            F.struct(
                zero.alias("sp"),
                zero.alias("sn"),
                F.array().cast(
                    "array<struct<day:timestamp,rev:double,"
                    "cusum_pos:double,cusum_neg:double,alarm:boolean>>"
                ).alias("out"),
            ),
            lambda acc, x: F.struct(
                F.greatest(zero, acc["sp"] + x["rev"] - F.col("mu") - k).alias("sp"),
                F.greatest(zero, acc["sn"] + F.col("mu") - x["rev"] - k).alias("sn"),
                F.concat(
                    acc["out"],
                    F.array(
                        F.struct(
                            x["day"].alias("day"),
                            x["rev"].alias("rev"),
                            F.greatest(
                                zero, acc["sp"] + x["rev"] - F.col("mu") - k
                            ).alias("cusum_pos"),
                            F.greatest(
                                zero, acc["sn"] + F.col("mu") - x["rev"] - k
                            ).alias("cusum_neg"),
                            (
                                (
                                    F.greatest(
                                        zero,
                                        acc["sp"] + x["rev"] - F.col("mu") - k,
                                    )
                                    > h
                                )
                                | (
                                    F.greatest(
                                        zero,
                                        acc["sn"] + F.col("mu") - x["rev"] - k,
                                    )
                                    > h
                                )
                            ).alias("alarm"),
                        )
                    ),
                ).alias("out"),
            ),
            lambda acc: acc["out"],
        ).alias("out")
    )
    row = folded.select(F.explode("out").alias("r"))
    return row.select(
        F.col("r.day").alias("day"),
        F.col("r.rev").alias("rev"),
        round4(F.col("r.cusum_pos")).alias("cusum_pos"),
        round4(F.col("r.cusum_neg")).alias("cusum_neg"),
        F.col("r.alarm").alias("alarm"),
    )


# --------------------------------------------- Holt linear trend ----

#: Holt smoothing constants, written as PAIRED pinned literals (α and
#: 1−α both hardcoded) so neither engine ever computes a complement.
_HOLT_A, _HOLT_A1 = 0.3, 0.7
_HOLT_B, _HOLT_B1 = 0.2, 0.8


def _holt_oracle() -> str:
    a, a1 = f"CAST({_HOLT_A} AS DOUBLE)", f"CAST({_HOLT_A1} AS DOUBLE)"
    b, b1 = f"CAST({_HOLT_B} AS DOUBLE)", f"CAST({_HOLT_B1} AS DOUBLE)"
    lnew = f"{a} * r.rev + {a1} * (h.l + h.b)"
    return f"""
    WITH RECURSIVE daily AS MATERIALIZED (
        SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
               {sql_round4('CAST(sum(o_totalprice) AS DOUBLE)')} AS rev
        FROM orders GROUP BY day
    ),
    ranked AS MATERIALIZED (
        SELECT day, rev, row_number() OVER (ORDER BY day) AS rn FROM daily
    ),
    holt(rn, day, rev, l, b) AS (
        SELECT rn, day, rev, rev, CAST(0.0 AS DOUBLE)
        FROM ranked WHERE rn = 1
        UNION ALL
        SELECT r.rn, r.day, r.rev,
               {lnew},
               {b} * (({lnew}) - h.l) + {b1} * h.b
        FROM holt h JOIN ranked r ON r.rn = h.rn + 1
    )
    SELECT day, rev,
           {sql_round4('l')} AS level,
           {sql_round4('b')} AS trend,
           {sql_round4('l + b')} AS forecast_next
    FROM holt
    """


@query("revenue_holt_trend", oracle=_holt_oracle())
def revenue_holt_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double-exponential smoothing on daily revenue (level +
    trend — the forecasting step up from the plain EWMA, which has no
    trend state and lags every ramp): l_t = α·x_t + (1−α)(l_{t−1} +
    b_{t−1}), b_t = β(l_t − l_{t−1}) + (1−β)b_{t−1}, with the one-step
    forecast l+b per day. Init l₁ = x₁, b₁ = 0 (documented choice —
    both engines identical by construction).

    Same discipline as revenue_cusum_changepoints: the recursion is
    inherently sequential, so it runs as ONE ordered array fold over
    the round4-pinned daily frame (O(days) at any corpus size; the
    data-sized work is the daily groupBy). α/1−α and β/1−β are PAIRED
    pinned literals so neither engine computes a complement, and the
    update expression trees match the oracle's recursive CTE exactly —
    the recursion agrees bit-for-bit before the output round4."""
    tune_session(spark)
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.date_trunc("day", "o_orderdate").alias("day")
    ).agg(round4(F.sum("o_totalprice").cast("double")).alias("rev"))
    arr = daily.agg(
        F.array_sort(F.collect_list(F.struct("day", "rev"))).alias("xs")
    )
    a, a1 = F.lit(_HOLT_A), F.lit(_HOLT_A1)
    b, b1 = F.lit(_HOLT_B), F.lit(_HOLT_B1)
    zero = F.lit(0.0).cast("double")

    def l_new(acc, x):
        return F.when(
            acc["n"] > 0, a * x["rev"] + a1 * (acc["l"] + acc["b"])
        ).otherwise(x["rev"])

    def b_new(acc, x):
        return F.when(
            acc["n"] > 0, b * (l_new(acc, x) - acc["l"]) + b1 * acc["b"]
        ).otherwise(zero)

    folded = arr.select(
        F.aggregate(
            F.col("xs"),
            F.struct(
                zero.alias("l"),
                zero.alias("b"),
                F.lit(0).cast("int").alias("n"),
                F.array()
                .cast(
                    "array<struct<day:timestamp,rev:double,"
                    "level:double,trend:double>>"
                )
                .alias("out"),
            ),
            lambda acc, x: F.struct(
                l_new(acc, x).alias("l"),
                b_new(acc, x).alias("b"),
                (acc["n"] + F.lit(1)).alias("n"),
                F.concat(
                    acc["out"],
                    F.array(
                        F.struct(
                            x["day"].alias("day"),
                            x["rev"].alias("rev"),
                            l_new(acc, x).alias("level"),
                            b_new(acc, x).alias("trend"),
                        )
                    ),
                ).alias("out"),
            ),
            lambda acc: acc["out"],
        ).alias("out")
    )
    r = folded.select(F.explode("out").alias("r"))
    return r.select(
        F.col("r.day").alias("day"),
        F.col("r.rev").alias("rev"),
        round4(F.col("r.level")).alias("level"),
        round4(F.col("r.trend")).alias("trend"),
        round4(F.col("r.level") + F.col("r.trend")).alias("forecast_next"),
    )


# ------------------------------------------------- retrieval eval ----

_MRR_QUERIES = 16    # eval query set
_MRR_DEPTH = 100     # ranking depth (MRR@100)


def _mrr_oracle() -> str:
    cos = "list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[])"
    return f"""
    WITH ranked AS (
        SELECT q.vec_id AS query_id, q.label AS q_label, c.label AS c_label,
               CAST(row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY {cos} DESC, c.vec_id) AS BIGINT) AS rank
        FROM embeddings q JOIN embeddings c ON c.vec_id != q.vec_id
        WHERE q.vec_id < {_MRR_QUERIES}
        QUALIFY rank <= {_MRR_DEPTH}
    )
    SELECT query_id,
           any_value(q_label) AS label,
           min(CASE WHEN c_label = q_label THEN rank END) AS first_rel_rank,
           {sql_round4(f'''coalesce(1.0 / min(CASE WHEN c_label = q_label
               THEN rank END), CAST(0.0 AS DOUBLE))''')} AS reciprocal_rank,
           CAST(count(CASE WHEN c_label = q_label AND rank <= 10 THEN 1 END)
               AS BIGINT) AS hits_at_10
    FROM ranked
    GROUP BY query_id
    """


@query("retrieval_label_mrr", oracle=_mrr_oracle())
def retrieval_label_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality evaluation over the embedding corpus: treat
    each query vector's LABEL as its relevance judgment (same label =
    relevant — the standard proxy when explicit qrels don't exist) and
    report, per query, the rank of the first relevant neighbor in the
    exact cosine top-100, its reciprocal rank (mean over queries =
    MRR@100, THE retrieval eval number), and hits@10. This is the eval
    side of the ANN family: brute-force gives the attainable ceiling
    that ann_{lsh,ivf,pq}_topk are recall-gated against.

    Plan: the ranked frame is brute_force_topk's shape — broadcast
    query set × one corpus scan, per-query top-k via a PARTITIONED
    window — then one grouped pass folds ranks into the eval columns.
    Cosines are the engine's left-fold HOFs, bit-identical to the
    oracle's list_cosine_similarity (the ann_topk_bruteforce
    precedent), so the rankings agree row-for-row."""
    from lab3_lakehouse_spark.operators import similarity as sim_ops

    tune_session(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < _MRR_QUERIES)
    bf = sim_ops.brute_force_topk(
        emb, q, "vec_id", "embedding", k=_MRR_DEPTH
    )
    labels = emb.select("vec_id", "label")
    j = (
        bf.join(
            labels.select(
                F.col("vec_id").alias("query_id"), F.col("label").alias("q_label")
            ),
            "query_id",
        )
        .join(
            labels.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("label").alias("c_label"),
            ),
            "neighbor_id",
        )
    )
    rel_rank = F.min(F.when(F.col("c_label") == F.col("q_label"), F.col("rank")))
    return j.groupBy("query_id").agg(
        F.first("q_label").alias("label"),
        rel_rank.alias("first_rel_rank"),
        round4(
            F.coalesce(F.lit(1.0) / rel_rank, F.lit(0.0))
        ).alias("reciprocal_rank"),
        F.count(
            F.when((F.col("c_label") == F.col("q_label")) & (F.col("rank") <= 10), 1)
        ).alias("hits_at_10"),
    )


# ------------------------------------------------- nDCG@10 eval ----

#: Pinned gain/ideal tables (the bootstrap-CDF "repr-pinned literals"
#: convention): both engines consume the SAME Python-computed doubles,
#: so no libm log is ever taken at query time. gain[r] = 1/log2(r+1);
#: idcg[j] = sum of the first j gains (idcg[0] = 0 → NULL-free index).
_NDCG_DEPTH = 10
_NDCG_GAINS = [
    1.0 / (math.log(r + 1) / math.log(2.0)) for r in range(1, _NDCG_DEPTH + 1)
]
_NDCG_IDCG = [0.0]
for _g in _NDCG_GAINS:
    _NDCG_IDCG.append(_NDCG_IDCG[-1] + _g)


def _ndcg_oracle() -> str:
    cos = "list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[])"
    gains = ", ".join(repr(g) for g in _NDCG_GAINS)
    idcg = ", ".join(repr(v) for v in _NDCG_IDCG)
    return f"""
    WITH ranked AS (
        SELECT q.vec_id AS query_id, q.label AS q_label, c.label AS c_label,
               CAST(row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY {cos} DESC, c.vec_id) AS BIGINT) AS rank
        FROM embeddings q JOIN embeddings c ON c.vec_id != q.vec_id
        WHERE q.vec_id < {_MRR_QUERIES}
        QUALIFY rank <= {_NDCG_DEPTH}
    ),
    nrel AS (
        SELECT label, CAST(count(*) AS BIGINT) AS n_label FROM embeddings
        GROUP BY label
    ),
    per AS (
        SELECT query_id, any_value(q_label) AS label,
               sum(CASE WHEN c_label = q_label
                        THEN ([{gains}])[rank] ELSE 0.0 END) AS dcg
        FROM ranked GROUP BY query_id
    )
    SELECT per.query_id, per.label,
           nrel.n_label - 1 AS n_relevant,
           {sql_round4('per.dcg')} AS dcg_at_10,
           {sql_round4(
               f'per.dcg / ([{idcg}])[least(nrel.n_label - 1, '
               f'{_NDCG_DEPTH}) + 1]'
           )} AS ndcg_at_10
    FROM per JOIN nrel ON nrel.label = per.label
    WHERE nrel.n_label > 1
    """


@query("retrieval_label_ndcg", oracle=_ndcg_oracle())
def retrieval_label_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nDCG@10 retrieval eval — the graded companion to
    retrieval_label_mrr (MRR sees only the FIRST relevant hit; nDCG
    credits every relevant hit, discounted by rank): per query, DCG@10
    with binary label relevance and the ideal-DCG normalizer from the
    query label's corpus frequency. The 1/log2(rank+1) gains and the
    ideal partial sums are repr-pinned Python literals consumed by
    BOTH engines (the bootstrap-CDF convention) — no query-time libm
    log anywhere, so the only cross-engine float noise is the ≤10-term
    per-group sum order, absorbed by round4. Plan: brute_force_topk's
    broadcast-queries × one-corpus-scan ranked frame, one grouped
    fold, broadcast label-frequency dim."""
    from lab3_lakehouse_spark.operators import similarity as sim_ops

    tune_session(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < _MRR_QUERIES)
    bf = sim_ops.brute_force_topk(emb, q, "vec_id", "embedding", k=_NDCG_DEPTH)
    labels = emb.select("vec_id", "label")
    gains = F.array(*[F.lit(g) for g in _NDCG_GAINS])
    idcg = F.array(*[F.lit(v) for v in _NDCG_IDCG])
    nrel = emb.groupBy("label").agg(F.count(F.lit(1)).alias("n_label"))
    j = (
        bf.join(
            labels.select(
                F.col("vec_id").alias("query_id"),
                F.col("label").alias("q_label"),
            ),
            "query_id",
        )
        .join(
            labels.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("label").alias("c_label"),
            ),
            "neighbor_id",
        )
    )
    per = j.groupBy("query_id").agg(
        F.first("q_label").alias("label"),
        F.sum(
            F.when(
                F.col("c_label") == F.col("q_label"),
                F.element_at(gains, F.col("rank").cast("int")),
            ).otherwise(F.lit(0.0))
        ).alias("__dcg"),
    )
    n_rel = F.col("n_label") - F.lit(1)
    # A query whose label is unique in the corpus has n_relevant = 0 and
    # idcg = 0: dividing would give NULL here but NaN in DuckDB (IEEE
    # 0.0/0.0) — a latent cross-engine divergence on a meaningless row.
    # Both engines exclude such queries instead.
    return per.join(F.broadcast(nrel), "label").filter(n_rel >= 1).select(
        "query_id",
        "label",
        n_rel.cast("long").alias("n_relevant"),
        round4(F.col("__dcg")).alias("dcg_at_10"),
        round4(
            F.col("__dcg")
            / F.element_at(
                idcg,
                (F.least(n_rel, F.lit(_NDCG_DEPTH)) + F.lit(1)).cast("int"),
            )
        ).alias("ndcg_at_10"),
    )


# ------------------------------------------- deadline-bounded funnel ----

_FUNNEL_DEADLINE_DAYS = 7


def _funnel_deadline_oracle() -> str:
    dl = f"INTERVAL {_FUNNEL_DEADLINE_DAYS} DAY"
    return f"""
    WITH s AS (
        SELECT user_id,
               min(ts) FILTER (WHERE event_type = 'view')     AS t_view,
               min(ts) FILTER (WHERE event_type = 'click')    AS t_click,
               min(ts) FILTER (WHERE event_type = 'purchase') AS t_purchase
        FROM events GROUP BY user_id
    )
    SELECT count(*) AS n_users,
           count(t_view) AS n_view,
           count(CASE WHEN t_click > t_view
                       AND t_click <= t_view + {dl} THEN 1 END)
               AS n_click_in_window,
           count(CASE WHEN t_click > t_view AND t_click <= t_view + {dl}
                       AND t_purchase > t_click
                       AND t_purchase <= t_click + {dl} THEN 1 END)
               AS n_purchase_in_window,
           {sql_round4(f'''count(CASE WHEN t_click > t_view
                AND t_click <= t_view + {dl} THEN 1 END)::DOUBLE
                / count(t_view)''')} AS click_rate,
           {sql_round4(f'''count(CASE WHEN t_click > t_view AND t_click <= t_view + {dl}
                AND t_purchase > t_click AND t_purchase <= t_click + {dl}
                THEN 1 END)::DOUBLE
                / count(CASE WHEN t_click > t_view
                             AND t_click <= t_view + {dl} THEN 1 END)''')}
               AS purchase_rate
    FROM s
    """


@query("funnel_conversion_deadline", oracle=_funnel_deadline_oracle())
def funnel_conversion_deadline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch funnel with a CONVERSION DEADLINE: each step counts
    only if it happens within 7 days of the previous step — the form
    real attribution uses (an unbounded funnel credits a purchase
    months after the view; rates become meaninglessly high). Same
    single-shuffle shape as funnel_stage_conversion: one per-user
    min-per-stage aggregation, then a scalar fold — the deadline is a
    pure comparison on the already-aggregated timestamps, adding zero
    data movement."""
    tune_session(spark)
    ev = load_table(spark, sf_dir, "events")
    s = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "t_purchase"
        ),
    )
    dl = F.expr(f"INTERVAL {_FUNNEL_DEADLINE_DAYS} DAY")
    click_ok = (F.col("t_click") > F.col("t_view")) & (
        F.col("t_click") <= F.col("t_view") + dl
    )
    buy_ok = click_ok & (F.col("t_purchase") > F.col("t_click")) & (
        F.col("t_purchase") <= F.col("t_click") + dl
    )
    n_click = F.count(F.when(click_ok, 1))
    n_buy = F.count(F.when(buy_ok, 1))
    return s.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("t_view").alias("n_view"),
        n_click.alias("n_click_in_window"),
        n_buy.alias("n_purchase_in_window"),
        round4(n_click.cast("double") / F.count("t_view")).alias("click_rate"),
        round4(n_buy.cast("double") / n_click).alias("purchase_rate"),
    )


# --------------------------------------------------- k-anonymity ----

_KANON_K = 6


def _kanon_oracle() -> str:
    return f"""
    SELECT c_nationkey AS nationkey,
           c_mktsegment AS mktsegment,
           CAST(count(*) AS BIGINT) AS group_size,
           count(*) < {_KANON_K} AS at_risk
    FROM customer
    GROUP BY c_nationkey, c_mktsegment
    """


_LDIV_L = 3
_LDIV_BAND = 2000.0


def _ldiv_oracle() -> str:
    return f"""
    SELECT c_nationkey AS nationkey,
           c_mktsegment AS mktsegment,
           CAST(count(*) AS BIGINT) AS group_size,
           CAST(count(DISTINCT floor(c_acctbal / {_LDIV_BAND})) AS BIGINT)
               AS n_sensitive_values,
           count(DISTINCT floor(c_acctbal / {_LDIV_BAND})) >= {_LDIV_L}
               AS l_diverse
    FROM customer
    GROUP BY c_nationkey, c_mktsegment
    """


@query("l_diversity_audit", oracle=_ldiv_oracle())
def l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al. 2007, re-derived) —
    the governance check k-anonymity misses: a class can be large yet
    leak the sensitive attribute if every member SHARES it (the
    homogeneity attack). Same quasi-identifier classes as
    k_anonymity_audit; the sensitive attribute is the account-balance
    band (floor(bal/2000) — a categorical proxy, exact int both
    engines); a class is l-diverse iff it spans ≥ l distinct bands.
    One grouped count-distinct with partial aggregation; output
    bounded by the class count, not rows."""
    tune_session(spark)
    cust = load_table(spark, sf_dir, "customer")
    band = F.floor(F.col("c_acctbal") / F.lit(_LDIV_BAND))
    nd = F.countDistinct(band)
    return cust.groupBy(
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_mktsegment").alias("mktsegment"),
    ).agg(
        F.count(F.lit(1)).alias("group_size"),
        nd.alias("n_sensitive_values"),
        (nd >= F.lit(_LDIV_L)).alias("l_diverse"),
    )


_TCLOSE_T = 0.15


def _tclose_oracle() -> str:
    return f"""
    WITH b AS (
        SELECT c_nationkey AS nationkey, c_mktsegment AS mktsegment,
               CAST(floor(c_acctbal / {_LDIV_BAND}) AS BIGINT) AS band
        FROM customer
    ),
    tot AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                   CAST(count(DISTINCT band) AS DOUBLE) AS m FROM b),
    gband AS (SELECT band, CAST(count(*) AS DOUBLE) AS gcnt FROM b
              GROUP BY band),
    grp AS (SELECT nationkey, mktsegment,
                   CAST(count(*) AS DOUBLE) AS n_g
            FROM b GROUP BY nationkey, mktsegment),
    gb AS (SELECT nationkey, mktsegment, band,
                  CAST(count(*) AS DOUBLE) AS cnt
           FROM b GROUP BY nationkey, mktsegment, band),
    terms AS (
        SELECT grp.nationkey, grp.mktsegment, grp.n_g, gband.band,
               coalesce(gb.cnt, 0.0) / grp.n_g - gband.gcnt / tot.n AS d,
               tot.m AS m
        FROM grp CROSS JOIN gband CROSS JOIN tot
        LEFT JOIN gb USING (nationkey, mktsegment, band)
    ),
    cs AS (
        SELECT nationkey, mktsegment, n_g, m,
               sum(d) OVER (PARTITION BY nationkey, mktsegment
                            ORDER BY band
                            ROWS UNBOUNDED PRECEDING) AS c
        FROM terms
    )
    SELECT nationkey, mktsegment,
           CAST(max(n_g) AS BIGINT) AS group_size,
           {sql_round4('sum(abs(c)) / (max(m) - 1.0)')} AS emd,
           {sql_round4('sum(abs(c)) / (max(m) - 1.0)')} <= {_TCLOSE_T}
               AS t_close
    FROM cs
    GROUP BY nationkey, mktsegment
    """


@query("t_closeness_audit", oracle=_tclose_oracle())
def t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian 2007, re-derived
    from the published definition) — the third member of the privacy
    trio: a class can be large (k-anonymous) AND span many sensitive
    values (l-diverse) yet still leak if its sensitive DISTRIBUTION
    differs from the table's (a skew attack: 90% of one band inside a
    class is a disclosure even with l distinct bands present). Same
    quasi-identifier classes and account-balance bands as the k-anon /
    l-div entries; the distance is the ordered-attribute Earth-Mover's
    Distance — (1/(m−1))·Σᵢ |Σⱼ≤ᵢ (pⱼ − qⱼ)| over the m globally-
    observed bands, the closed form the paper gives for totally-
    ordered domains.

    Cross-engine exactness: p and q are exact integer/integer double
    divisions; the cumulative sum folds in band order (a total order
    per class) so both engines add the same doubles in the same
    sequence; only the final Σ|·| over m≈6 bands is aggregation-order
    sensitive, and the comparison happens on the round4-pinned value
    in BOTH engines. Plan shape: two grouped counts + one ≤6-row
    broadcast grid join + one partitioned cumsum window — output and
    every intermediate after the scans are bounded by |classes| × m,
    never rows."""
    from pyspark.sql import Window

    tune_session(spark)
    cust = load_table(spark, sf_dir, "customer")
    b = cust.select(
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_mktsegment").alias("mktsegment"),
        F.floor(F.col("c_acctbal") / F.lit(_LDIV_BAND))
        .cast("long")
        .alias("band"),
    ).localCheckpoint(eager=False)  # feeds 3 grouped passes + totals
    tot = b.agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
        F.countDistinct("band").cast("double").alias("__m"),
    )
    glob = b.groupBy("band").agg(
        F.count(F.lit(1)).cast("double").alias("__gcnt")
    )
    grp = b.groupBy("nationkey", "mktsegment").agg(
        F.count(F.lit(1)).cast("double").alias("__ng")
    )
    gb = b.groupBy("nationkey", "mktsegment", "band").agg(
        F.count(F.lit(1)).cast("double").alias("__cnt")
    )
    grid = (
        grp.crossJoin(F.broadcast(glob))
        .crossJoin(F.broadcast(tot))
        .join(F.broadcast(gb), ["nationkey", "mktsegment", "band"], "left")
        .select(
            "nationkey",
            "mktsegment",
            "__ng",
            "__m",
            "band",
            (
                F.coalesce(F.col("__cnt"), F.lit(0.0)) / F.col("__ng")
                - F.col("__gcnt") / F.col("__n")
            ).alias("__d"),
        )
    )
    w = (
        Window.partitionBy("nationkey", "mktsegment")
        .orderBy("band")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cs = grid.withColumn("__c", F.sum("__d").over(w))
    emd = round4(F.sum(F.abs(F.col("__c"))) / (F.max("__m") - F.lit(1.0)))
    return cs.groupBy("nationkey", "mktsegment").agg(
        F.max("__ng").cast("long").alias("group_size"),
        emd.alias("emd"),
        (emd <= F.lit(_TCLOSE_T)).alias("t_close"),
    )


@query("k_anonymity_audit", oracle=_kanon_oracle())
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the customer quasi-identifiers
    (nationkey × market segment): any equivalence class smaller than k
    re-identifies its members by those attributes alone — the
    pre-release governance check run before a dataset (or its derived
    training corpus) leaves the boundary. One grouped count with
    map-side partial aggregation; the flag is a pure comparison. At
    100 TB the quasi-identifier class count — not the row count —
    bounds the output."""
    tune_session(spark)
    cust = load_table(spark, sf_dir, "customer")
    return cust.groupBy(
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_mktsegment").alias("mktsegment"),
    ).agg(
        F.count(F.lit(1)).alias("group_size"),
        (F.count(F.lit(1)) < F.lit(_KANON_K)).alias("at_risk"),
    )
