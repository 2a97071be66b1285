"""Inferential and frontier analytics (round 10 continuation): skyline
(Pareto-frontier) selection, Kaplan–Meier survival, Welch's two-sample
t-test, Spearman rank correlation, Gini/Lorenz concentration, daily
autocorrelation, and graph degree assortativity.

Every query carries a FULL DuckDB oracle. Cross-engine determinism
follows the engine conventions (queries/_util.py): exact integer
arithmetic wherever possible (ranks, counts, microsecond epochs,
degrees), ``round4``-pinned intermediates whenever a float aggregate is
REUSED downstream (so both engines continue from the identical double),
and ``round4`` on every emitted float. ``ln``/``exp``/``sqrt`` appear
only on bit-identical inputs: IEEE ``sqrt`` is correctly rounded
(bit-equal cross-engine) and the ≤1-ulp ``ln``/``exp`` libm skew is
absorbed by the output rounding — the established surprisal/entropy
precedent (queries/statops.py).

No counterpart in the reference (SURVEY §2.7 extension surface).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lab3_lakehouse_spark.catalog import fan_out, load_table
from lab3_lakehouse_spark.queries._util import round4, sql_round4
from lab3_lakehouse_spark.queries.registry import query
from lab3_lakehouse_spark.session import tune_session

# ------------------------------------------------------------ skyline ----

_SKYLINE_SCHEMA = "p_partkey long, p_retailprice double, p_size int"

_SKYLINE_ORACLE = """
    SELECT CAST(p.p_partkey AS BIGINT) AS part_key,
           p.p_retailprice AS retail_price,
           CAST(p.p_size AS BIGINT) AS size
    FROM part p
    WHERE p.p_retailprice IS NOT NULL AND p.p_size IS NOT NULL
      AND NOT EXISTS (
        SELECT 1 FROM part q
        WHERE q.p_retailprice <= p.p_retailprice
          AND q.p_size >= p.p_size
          AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)
    )
"""


def _local_skyline(batches: Iterator) -> Iterator:
    """Partition-local skyline prune (block-nested-loop step of the
    distributed skyline): sort by (price asc, size desc) and drop every
    row whose size is STRICTLY below the running max of earlier rows —
    such a row is certainly dominated (an earlier row has price <= and
    size >, strict in size, or price < with size >=). Ties and
    equal-size survivors are KEPT (conservative superset); the exact
    global stage finishes the job. Output is O(local frontier), so the
    global stage sees candidates, not the table."""
    import pandas as pd  # noqa: F401  (schema contract)

    for pdf in batches:
        if len(pdf) == 0:
            yield pdf
            continue
        s = pdf.sort_values(
            ["p_retailprice", "p_size"], ascending=[True, False]
        ).reset_index(drop=True)
        run = s["p_size"].cummax().shift(1)
        keep = ~(run > s["p_size"])  # NaN (first row) compares False -> kept
        yield s[keep]


@query("part_price_size_skyline", oracle=_SKYLINE_ORACLE)
def part_price_size_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline / Pareto-frontier query (Börzsönyi et al. 2001): the
    parts not dominated on (price ↓, size ↑) — "no other part is at
    least as cheap AND at least as big, strictly better in one". The
    naive formulation is an all-pairs anti-join (the oracle's
    NOT EXISTS — quadratic, dead at scale); the distributed algorithm
    is the classic two-phase skyline: (1) a partition-LOCAL prune
    (mapInPandas, one sort + cummax per partition, no shuffle) whose
    union is a tiny superset of the answer — on uniform data the local
    frontier is O(log² n) rows — and (2) an EXACT dominance check on
    the surviving candidates via one per-price aggregate plus one
    running-max window over the candidates' distinct prices (a frame
    that is O(frontier), so the unpartitioned window is bounded at any
    corpus size). A candidate is dominated iff the max size at a
    STRICTLY cheaper price is >= its size, or the max size at ITS OWN
    price is > its size. Raw parquet doubles are compared, never
    arithmetic — bit-stable cross-engine."""
    tune_session(spark)
    part = fan_out(
        load_table(spark, sf_dir, "part")
        .select("p_partkey", "p_retailprice", "p_size")
        # NULL dimensions are excluded from the dominance order in BOTH
        # engines (the oracle filters identically) — without the pin,
        # DuckDB's NOT EXISTS would keep a NULL-price row that Spark's
        # inner join drops
        .filter(
            F.col("p_retailprice").isNotNull() & F.col("p_size").isNotNull()
        )
    )
    # one prune pass feeds BOTH consumers (the candidate probe side and
    # the per-price frontier build) — without the checkpoint the
    # mapInPandas sort runs twice over the full table
    cand = part.mapInPandas(_local_skyline, schema=_SKYLINE_SCHEMA)
    cand = cand.localCheckpoint(eager=False)
    by_price = cand.groupBy("p_retailprice").agg(
        F.max("p_size").alias("__mx")
    )
    w = Window.orderBy("p_retailprice").rowsBetween(
        Window.unboundedPreceding, -1
    )
    strict = by_price.select(
        "p_retailprice",
        F.col("__mx").alias("__same_mx"),
        F.max("__mx").over(w).alias("__strict_mx"),
    )
    # coalesce guards the NULL __strict_mx of the cheapest price row
    out = cand.join(F.broadcast(strict), "p_retailprice").filter(
        ~F.coalesce(F.col("__strict_mx") >= F.col("p_size"), F.lit(False))
        & ~(F.col("__same_mx") > F.col("p_size"))
    )
    return out.select(
        F.col("p_partkey").cast("long").alias("part_key"),
        F.col("p_retailprice").alias("retail_price"),
        F.col("p_size").cast("long").alias("size"),
    )


# ------------------------------------------------------ Kaplan–Meier ----

_KM_VALUE_MIN = 130.0   # "conversion" = first purchase with value >= 130
_US_PER_HOUR = 3_600_000_000  # life-table granularity: 1 hour


def _km_oracle() -> str:
    return f"""
    WITH firsts AS (
        SELECT user_id, min(epoch_us(ts)) AS t0 FROM events GROUP BY user_id
    ),
    hits AS (
        SELECT user_id, min(epoch_us(ts)) AS td
        FROM events
        WHERE event_type = 'purchase' AND value >= {_KM_VALUE_MIN!r}
        GROUP BY user_id
    ),
    horizon AS (SELECT max(epoch_us(ts)) AS tmax FROM events),
    subj AS (
        SELECT CASE WHEN h.td IS NOT NULL
                    THEN (h.td - f.t0) // {_US_PER_HOUR}
                    ELSE (x.tmax - f.t0) // {_US_PER_HOUR} END AS dur_h,
               CASE WHEN h.td IS NOT NULL THEN 1 ELSE 0 END AS evt
        FROM firsts f
        LEFT JOIN hits h USING (user_id)
        CROSS JOIN horizon x
    ),
    total AS (SELECT count(*) AS n FROM subj),
    durs AS (
        SELECT dur_h, count(*) AS c_all, sum(evt) AS d
        FROM subj GROUP BY dur_h
    ),
    risk AS (
        SELECT dur_h, d,
               t.n - coalesce(sum(c_all) OVER (
                   ORDER BY dur_h
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS n_risk
        FROM durs CROSS JOIN total t
    ),
    deaths AS (SELECT dur_h, d, n_risk FROM risk WHERE d > 0),
    curve AS (
        SELECT dur_h, d, n_risk,
               sum(CASE WHEN d < n_risk
                        THEN ln((n_risk - d) / CAST(n_risk AS DOUBLE))
                        ELSE 0.0 END) OVER (
                   ORDER BY dur_h
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS lnsum,
               max(CASE WHEN d >= n_risk THEN 1 ELSE 0 END) OVER (
                   ORDER BY dur_h
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS hit_zero
        FROM deaths
    )
    SELECT CAST(dur_h AS BIGINT) AS dur_hours,
           CAST(d AS BIGINT) AS n_events,
           CAST(n_risk AS BIGINT) AS n_at_risk,
           CASE WHEN hit_zero = 1 THEN 0.0
                ELSE {sql_round4('exp(lnsum)')} END AS survival
    FROM curve
    """


@query("kaplan_meier_conversion", oracle=_km_oracle())
def kaplan_meier_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier survival curve for time-to-conversion: per user,
    the duration from their FIRST event to their first HIGH-VALUE
    purchase (value >= 130); users who never convert are right-CENSORED
    at the corpus horizon — the estimator uses them correctly (they
    leave the risk set without counting as conversions), which a naive
    "average time among converters" gets wrong. S(t) = prod over event
    times <= t of (1 - d_i / n_i), with n_i the at-risk count
    (dur >= t_i, censored-at-t still at risk — the standard KM tie
    convention).

    Scale shape: everything up to the curve is keyed on user_id (two
    grouped aggs + one join, ONE shuffle key); durations are bucketed
    to exact integer HOURS (life-table granularity) so the curve frame
    is bounded by the horizon in hours at ANY corpus size — the
    unpartitioned cumulative windows run on that bounded frame, never
    on subjects. Microsecond epochs and hour buckets are exact integer
    arithmetic (``DIV``); the only floats are the (n-d)/n ratio (one
    IEEE division of exact ints — bit-stable), its ln, and the final
    exp — round4-absorbed. d = n (risk set wiped out) short-circuits to
    survival 0 rather than ln(0), which Spark NULLs but DuckDB -infs.
    """
    tune_session(spark)
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "value", F.unix_micros("ts").alias("t_us")
    )
    firsts = ev.groupBy("user_id").agg(F.min("t_us").alias("t0"))
    hits = (
        ev.filter(
            (F.col("event_type") == "purchase")
            & (F.col("value") >= F.lit(_KM_VALUE_MIN))
        )
        .groupBy("user_id")
        .agg(F.min("t_us").alias("td"))
    )
    horizon = ev.agg(F.max("t_us").alias("tmax"))
    subj = (
        firsts.join(hits, "user_id", "left")
        .crossJoin(F.broadcast(horizon))
        .select(
            F.expr(
                f"CASE WHEN td IS NOT NULL THEN (td - t0) DIV {_US_PER_HOUR} "
                f"ELSE (tmax - t0) DIV {_US_PER_HOUR} END"
            ).alias("dur_h"),
            F.when(F.col("td").isNotNull(), F.lit(1))
            .otherwise(F.lit(0))
            .alias("evt"),
        )
    )
    total = subj.agg(F.count(F.lit(1)).alias("n"))
    durs = subj.groupBy("dur_h").agg(
        F.count(F.lit(1)).alias("c_all"), F.sum("evt").alias("d")
    )
    w_prev = Window.orderBy("dur_h").rowsBetween(Window.unboundedPreceding, -1)
    risk = (
        durs.crossJoin(F.broadcast(total))
        .select(
            "dur_h",
            "d",
            (
                F.col("n")
                - F.coalesce(F.sum("c_all").over(w_prev), F.lit(0))
            ).alias("n_risk"),
        )
        .filter(F.col("d") > 0)
    )
    w_cum = Window.orderBy("dur_h").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    term = F.when(
        F.col("d") < F.col("n_risk"),
        F.log(
            (F.col("n_risk") - F.col("d")) / F.col("n_risk").cast("double")
        ),
    ).otherwise(F.lit(0.0))
    wiped = F.when(F.col("d") >= F.col("n_risk"), F.lit(1)).otherwise(F.lit(0))
    curve = risk.select(
        "dur_h",
        "d",
        "n_risk",
        F.sum(term).over(w_cum).alias("lnsum"),
        F.max(wiped).over(w_cum).alias("hit_zero"),
    )
    return curve.select(
        F.col("dur_h").cast("long").alias("dur_hours"),
        F.col("d").cast("long").alias("n_events"),
        F.col("n_risk").cast("long").alias("n_at_risk"),
        F.when(F.col("hit_zero") == 1, F.lit(0.0))
        .otherwise(round4(F.exp("lnsum")))
        .alias("survival"),
    )


# ------------------------------------------------------ Welch t-test ----

_WELCH_A = "purchase"
_WELCH_B = "click"


def _welch_oracle() -> str:
    # variance from raw sums — the SAME formula Spark evaluates, so both
    # engines pin the identical round4 double before the t / df math
    ma = sql_round4("s1a / na")
    mb = sql_round4("s1b / nb")
    va = sql_round4("(s2a - s1a * s1a / na) / (na - 1)")
    vb = sql_round4("(s2b - s1b * s1b / nb) / (nb - 1)")
    return f"""
    WITH sums AS (
        SELECT CAST(count(*) FILTER (WHERE event_type = '{_WELCH_A}') AS DOUBLE) AS na,
               sum(value)         FILTER (WHERE event_type = '{_WELCH_A}') AS s1a,
               sum(value * value) FILTER (WHERE event_type = '{_WELCH_A}') AS s2a,
               CAST(count(*) FILTER (WHERE event_type = '{_WELCH_B}') AS DOUBLE) AS nb,
               sum(value)         FILTER (WHERE event_type = '{_WELCH_B}') AS s1b,
               sum(value * value) FILTER (WHERE event_type = '{_WELCH_B}') AS s2b
        FROM events
        WHERE event_type IN ('{_WELCH_A}', '{_WELCH_B}') AND value IS NOT NULL
    ),
    pinned AS (
        SELECT na, nb, {ma} AS ma, {mb} AS mb, {va} AS va, {vb} AS vb
        FROM sums
    )
    SELECT CAST(na AS BIGINT) AS n_a,
           CAST(nb AS BIGINT) AS n_b,
           ma AS mean_a, mb AS mean_b, va AS var_a, vb AS var_b,
           {sql_round4('(ma - mb) / sqrt(va / na + vb / nb)')} AS t_stat,
           {sql_round4(
               '(va / na + vb / nb) * (va / na + vb / nb)'
               ' / ((va / na) * (va / na) / (na - 1)'
               '  + (vb / nb) * (vb / nb) / (nb - 1))'
           )} AS welch_df
    FROM pinned
    """


@query("welch_ttest_purchase_click", oracle=_welch_oracle())
def welch_ttest_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance two-sample t-test between purchase and
    click event values — the A/B-test primitive (never assume pooled
    variance on observational segments). Means and sample variances
    come from ONE conditional aggregation pass (count / Σx / Σx² per
    arm — map-side combinable, shuffle is 1 row), are round4-PINNED,
    and the t statistic and Welch–Satterthwaite df are closed-form
    arithmetic on the pinned doubles — bit-identical cross-engine.
    Scale: a single scan with partial aggregation; output is one row
    regardless of corpus size."""
    tune_session(spark)
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin(_WELCH_A, _WELCH_B)
        & F.col("value").isNotNull()
    )
    is_a = F.col("event_type") == _WELCH_A
    v = F.col("value")
    sums = ev.agg(
        F.count(F.when(is_a, 1)).cast("double").alias("na"),
        F.sum(F.when(is_a, v)).alias("s1a"),
        F.sum(F.when(is_a, v * v)).alias("s2a"),
        F.count(F.when(~is_a, 1)).cast("double").alias("nb"),
        F.sum(F.when(~is_a, v)).alias("s1b"),
        F.sum(F.when(~is_a, v * v)).alias("s2b"),
    )
    na, nb = F.col("na"), F.col("nb")
    pinned = sums.select(
        na,
        nb,
        round4(F.col("s1a") / na).alias("ma"),
        round4(F.col("s1b") / nb).alias("mb"),
        round4(
            (F.col("s2a") - F.col("s1a") * F.col("s1a") / na) / (na - 1)
        ).alias("va"),
        round4(
            (F.col("s2b") - F.col("s1b") * F.col("s1b") / nb) / (nb - 1)
        ).alias("vb"),
    )
    ma, mb, va, vb = (F.col(c) for c in ("ma", "mb", "va", "vb"))
    sea, seb = va / na, vb / nb
    return pinned.select(
        na.cast("long").alias("n_a"),
        nb.cast("long").alias("n_b"),
        ma.alias("mean_a"),
        mb.alias("mean_b"),
        va.alias("var_a"),
        vb.alias("var_b"),
        round4((ma - mb) / F.sqrt(sea + seb)).alias("t_stat"),
        round4(
            (sea + seb) * (sea + seb)
            / (sea * sea / (na - 1) + seb * seb / (nb - 1))
        ).alias("welch_df"),
    )


# ------------------------------------------------- Spearman (ties) ----


def _spearman_oracle() -> str:
    r = (
        "(n * sxy - sx * sy)"
        " / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))"
    )
    return f"""
    WITH base AS (
        SELECT event_type,
               value,
               CAST(hour(ts) AS DOUBLE) AS h
        FROM events WHERE value IS NOT NULL
    ),
    ranked AS (
        SELECT event_type,
               rank() OVER (PARTITION BY event_type ORDER BY value)
                 + (count(*) OVER (PARTITION BY event_type, value) - 1) / 2.0
                 AS rx,
               rank() OVER (PARTITION BY event_type ORDER BY h)
                 + (count(*) OVER (PARTITION BY event_type, h) - 1) / 2.0
                 AS ry
        FROM base
    ),
    sums AS (
        SELECT event_type,
               CAST(count(*) AS DOUBLE) AS n,
               sum(rx) AS sx, sum(ry) AS sy, sum(rx * ry) AS sxy,
               sum(rx * rx) AS sxx, sum(ry * ry) AS syy
        FROM ranked GROUP BY event_type
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n_events,
           {sql_round4(r)} AS spearman_rho
    FROM sums
    """


@query("spearman_value_hour", oracle=_spearman_oracle())
def spearman_value_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation (tie-corrected) between event value
    and hour-of-day, per event type — the monotonic-association
    screen that Pearson misses on non-linear but ordered effects
    ("do values drift later in the day?"). Ties get AVERAGE ranks
    (min-rank + (tie_count-1)/2 — fractional .5 ranks are exact
    binary doubles), then rho is Pearson on the ranks via closed-form
    sums. Every rank and sum is exact integer-or-half arithmetic below
    2^53, so numerator and denominator are bit-identical cross-engine;
    IEEE sqrt is correctly rounded — the ONLY rounding is the emitted
    round4.

    Scale shape: ranking is two windows partitioned BY EVENT TYPE
    (the analysis key — each group sorts within its own partition
    range, the per-key sort is Spark's bread and butter), then one
    grouped sum pass; shuffle is keyed on event_type throughout. At
    extreme per-key cardinality the exact ranks would swap to a KLL
    CDF approximation (operators/sketches.py) — documented
    alternative, not needed at any tested SF."""
    tune_session(spark)
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    base = ev.select(
        "event_type",
        "value",
        F.hour("ts").cast("double").alias("h"),
    )
    wv = Window.partitionBy("event_type").orderBy("value")
    wh = Window.partitionBy("event_type").orderBy("h")
    tv = Window.partitionBy("event_type", "value")
    th = Window.partitionBy("event_type", "h")
    ranked = base.select(
        "event_type",
        (
            F.rank().over(wv) + (F.count(F.lit(1)).over(tv) - 1) / 2.0
        ).alias("rx"),
        (
            F.rank().over(wh) + (F.count(F.lit(1)).over(th) - 1) / 2.0
        ).alias("ry"),
    )
    sums = ranked.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("rx").alias("sx"),
        F.sum("ry").alias("sy"),
        F.sum(F.col("rx") * F.col("ry")).alias("sxy"),
        F.sum(F.col("rx") * F.col("rx")).alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).alias("syy"),
    )
    n = F.col("n")
    sx, sy = F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    return sums.select(
        "event_type",
        n.cast("long").alias("n_events"),
        round4(
            (n * sxy - sx * sy)
            / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
        ).alias("spearman_rho"),
    )


# ------------------------------------------------------ Gini / Lorenz ----


def _gini_oracle() -> str:
    g = "(2.0 * srx - (n + 1.0) * sx) / (n * sx)"
    return f"""
    WITH spend AS (
        SELECT c.c_mktsegment AS segment,
               o.o_custkey AS k,
               {sql_round4('sum(o.o_totalprice)')} AS x
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY segment, k
    ),
    ranked AS (
        SELECT segment, x,
               CAST(row_number() OVER (
                   PARTITION BY segment ORDER BY x, k) AS DOUBLE) AS rn
        FROM spend
    ),
    sums AS (
        SELECT segment,
               CAST(count(*) AS DOUBLE) AS n,
               sum(x) AS sx,
               sum(rn * x) AS srx
        FROM ranked GROUP BY segment
    )
    SELECT segment,
           CAST(n AS BIGINT) AS n_customers,
           {sql_round4('sx')} AS total_spend,
           {sql_round4(g)} AS gini
    FROM sums
    """


@query("gini_segment_spend", oracle=_gini_oracle())
def gini_segment_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini concentration of customer spend per market segment — the
    Lorenz-curve summary ("how unequal is revenue across customers"),
    computed by the exact rank formula G = (2·Σ rn·x − (n+1)·Σx)/(n·Σx)
    with spend ascending and row_number ties broken on the customer key
    (deterministic in both engines). Per-customer spend is round4-
    PINNED before ranking so both engines rank the identical doubles.

    Scale shape: one grouped agg keyed on the customer (fact scanned
    once), one ranking window PARTITIONED by segment (per-key sort),
    one grouped sum — all shuffles on analysis keys, output is
    O(segments)."""
    tune_session(spark)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    )
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    spend = (
        orders.join(
            F.broadcast(customer),
            orders["o_custkey"] == customer["c_custkey"],
        )
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.col("o_custkey").alias("k"),
        )
        .agg(round4(F.sum("o_totalprice")).alias("x"))
    )
    w = Window.partitionBy("segment").orderBy("x", "k")
    ranked = spend.select(
        "segment", "x", F.row_number().over(w).cast("double").alias("rn")
    )
    sums = ranked.groupBy("segment").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("rn") * F.col("x")).alias("srx"),
    )
    n, sx, srx = F.col("n"), F.col("sx"), F.col("srx")
    return sums.select(
        "segment",
        n.cast("long").alias("n_customers"),
        round4(sx).alias("total_spend"),
        round4((2.0 * srx - (n + 1.0) * sx) / (n * sx)).alias("gini"),
    )


# ------------------------------------------------------------- ACF ----

_ACF_MAX_LAG = 7


def _acf_oracle() -> str:
    return f"""
    WITH daily AS (
        SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
               {sql_round4('CAST(sum(o_totalprice) AS DOUBLE)')} AS rev
        FROM orders GROUP BY day
    ),
    ranked AS (
        SELECT rev, row_number() OVER (ORDER BY day) AS rn FROM daily
    ),
    m AS (SELECT {sql_round4('avg(rev)')} AS mu FROM ranked),
    den AS (
        SELECT sum((rev - mu) * (rev - mu)) AS d
        FROM ranked CROSS JOIN m
    ),
    lags AS (SELECT unnest(generate_series(1, {_ACF_MAX_LAG})) AS lag),
    pairs AS (
        SELECT l.lag, a.rev AS xa, b.rev AS xb
        FROM lags l
        JOIN ranked a ON true
        JOIN ranked b ON b.rn = a.rn + l.lag
    )
    SELECT p.lag,
           CAST(count(*) AS BIGINT) AS n_pairs,
           {sql_round4('sum((xa - mu) * (xb - mu)) / max(den.d)')} AS acf
    FROM pairs p CROSS JOIN m CROSS JOIN den
    GROUP BY p.lag
    """


@query("acf_daily_revenue", oracle=_acf_oracle())
def acf_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function of daily revenue at lags 1..7 — the
    weekly-seasonality / momentum diagnostic (a lag-7 spike = weekly
    cycle; slow decay = trend — the Box–Jenkins model-identification
    step). r_k = Σ(x_t − μ)(x_{t+k} − μ) / Σ(x_t − μ)² with the GLOBAL
    mean (standard ACF, not per-lag means). The daily revenue AND the
    mean are round4-pinned so both engines form identical centered
    products; the remaining float sums differ only in order (round4-
    absorbed).

    Scale shape mirrors the trend family (theilsen/holt/ewma): the
    fact table collapses to the O(days) daily frame FIRST, and every
    window/join after that — the ranking window, the 7 lead columns
    from ONE window pass, the mean/denominator 1-row broadcasts —
    runs on that bounded frame. One fact shuffle total."""
    tune_session(spark)
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.date_trunc("day", "o_orderdate").alias("day")
    ).agg(round4(F.sum("o_totalprice").cast("double")).alias("rev"))
    w = Window.orderBy("day")
    leads = daily.select(
        "rev",
        *[
            F.lead("rev", k).over(w).alias(f"l{k}")
            for k in range(1, _ACF_MAX_LAG + 1)
        ],
    )
    m = daily.agg(round4(F.avg("rev")).alias("mu"))
    den = daily.crossJoin(F.broadcast(m)).agg(
        F.sum((F.col("rev") - F.col("mu")) * (F.col("rev") - F.col("mu"))
              ).alias("d")
    )
    stack_expr = "stack({}, {}) as (lag, xb)".format(
        _ACF_MAX_LAG,
        ", ".join(f"{k}, l{k}" for k in range(1, _ACF_MAX_LAG + 1)),
    )
    pairs = leads.select(F.col("rev").alias("xa"), F.expr(stack_expr)).filter(
        F.col("xb").isNotNull()
    )
    out = (
        pairs.crossJoin(F.broadcast(m))
        .crossJoin(F.broadcast(den))
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            round4(
                F.sum(
                    (F.col("xa") - F.col("mu")) * (F.col("xb") - F.col("mu"))
                )
                / F.max("d")
            ).alias("acf"),
        )
    )
    return out.select(F.col("lag").cast("int").alias("lag"), "n_pairs", "acf")


# ------------------------------------------- degree assortativity ----


def _assortativity_oracle() -> str:
    r = (
        "(m * sxy - sx * sy)"
        " / sqrt((m * sxx - sx * sx) * (m * syy - sy * sy))"
    )
    return f"""
    WITH e AS (
        SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS a,
                        greatest(a.l_partkey, b.l_partkey) AS b
        FROM lineitem a
        JOIN lineitem b ON a.l_orderkey = b.l_orderkey
                       AND a.l_partkey <> b.l_partkey
    ),
    deg AS (
        SELECT node, CAST(count(*) AS DOUBLE) AS deg FROM (
            SELECT a AS node FROM e UNION ALL SELECT b FROM e
        ) q GROUP BY node
    ),
    directed AS (
        SELECT a AS u, b AS v FROM e
        UNION ALL
        SELECT b, a FROM e
    ),
    pairs AS (
        SELECT du.deg AS x, dv.deg AS y
        FROM directed d
        JOIN deg du ON du.node = d.u
        JOIN deg dv ON dv.node = d.v
    ),
    sums AS (
        SELECT CAST(count(*) AS DOUBLE) AS m,
               sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
               sum(x * x) AS sxx, sum(y * y) AS syy
        FROM pairs
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_nodes,
           (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
           {sql_round4(r)} AS assortativity
    FROM sums
    """


@query("copurchase_degree_assortativity", oracle=_assortativity_oracle())
def copurchase_degree_assortativity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Degree assortativity of the co-purchase graph (Newman 2002):
    Pearson correlation of endpoint degrees over the DIRECTED edge list
    (each undirected edge counted both ways, the standard convention) —
    positive = hubs link to hubs (social-like), negative = hub-and-
    spoke (technological/retail-like). The one-number mixing summary
    that complements the per-edge embeddedness view.

    All inputs are exact integers (degrees, counts), so the Pearson
    sums are exact below 2^53 and the closed-form ratio is bit-stable
    cross-engine (IEEE sqrt is correctly rounded); round4 only on the
    emitted coefficient. Scale shape: the edge build shuffles once on
    the order key (bounded basket fan-out), degrees are one grouped
    count, and the degree joins broadcast the O(nodes) degree frame —
    output is one row."""
    from lab3_lakehouse_spark.operators import graph as graph_ops

    tune_session(spark)
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    edges = graph_ops.cooccurrence_edges(
        li, group_col="l_orderkey", item_col="l_partkey", symmetric=False
    )
    deg = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("double").alias("deg"))
    )
    directed = edges.select(
        F.col("src").alias("u"), F.col("dst").alias("v")
    ).unionByName(edges.select(F.col("dst").alias("u"), F.col("src").alias("v")))
    pairs = (
        directed.join(
            F.broadcast(deg.select(F.col("node").alias("u"), F.col("deg").alias("x"))),
            "u",
        )
        .join(
            F.broadcast(deg.select(F.col("node").alias("v"), F.col("deg").alias("y"))),
            "v",
        )
        .select("x", "y")
    )
    sums = pairs.agg(
        F.count(F.lit(1)).cast("double").alias("m"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n_nodes = deg.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    n_edges = edges.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    m = F.col("m")
    sx, sy = F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    return (
        sums.crossJoin(F.broadcast(n_nodes))
        .crossJoin(F.broadcast(n_edges))
        .select(
            "n_nodes",
            "n_edges",
            round4(
                (m * sxy - sx * sy)
                / F.sqrt((m * sxx - sx * sx) * (m * syy - sy * sy))
            ).alias("assortativity"),
        )
    )
