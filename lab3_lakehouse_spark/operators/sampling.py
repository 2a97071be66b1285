"""Deterministic stratified sampling for training-data mixing.

Corpus mixing ("20% of crawl, 80% of curated") must be reproducible
across reruns and engines, so the production pattern is a *deterministic*
keep-predicate on a stable key — not Bernoulli `sample()`, whose output
depends on partition layout and RNG stream.  ``id mod 100 < rate`` keeps
an exact, rerun-stable, engine-portable subset per stratum, and it
executes as a scan-side filter (predicate-pushdown friendly, zero
shuffles at 100 TB).

A thin wrapper over Spark's seeded per-stratum Bernoulli ``sampleBy`` is
included for the cases where statistical (rather than reproducible)
sampling is wanted; it is not oracle-checkable by construction.

Reference parity: the reference's only sampling is the bootstrap
``head(100000)`` truncation (download_dataset.py:7); this generalizes it
to per-stratum rates.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def stratified_keep_predicate(
    id_col: str,
    stratum_col: str,
    pct_by_stratum: Mapping[str, int],
    default_pct: int,
) -> Column:
    """``pmod(id, 100) < pct(stratum)`` with per-stratum percentages."""
    pct: Column = F.lit(int(default_pct))
    for value, p in sorted(pct_by_stratum.items()):
        pct = F.when(F.col(stratum_col) == F.lit(value), F.lit(int(p))).otherwise(pct)
    return F.pmod(F.col(id_col), F.lit(100)) < pct


def deterministic_stratified_sample(
    df: DataFrame,
    *,
    id_col: str,
    stratum_col: str,
    pct_by_stratum: Mapping[str, int],
    default_pct: int = 100,
) -> DataFrame:
    """Exact, rerun-stable stratified subset (see module docstring)."""
    return df.filter(
        stratified_keep_predicate(id_col, stratum_col, pct_by_stratum, default_pct)
    )


def bernoulli_stratified_sample(
    df: DataFrame,
    *,
    stratum_col: str,
    fractions: Mapping[str, float],
    seed: int = 42,
) -> DataFrame:
    """Seeded per-stratum Bernoulli sample (Spark ``sampleBy``)."""
    return df.sampleBy(stratum_col, dict(fractions), seed=seed)


def cap_per_key(
    df: DataFrame,
    *,
    key_col: str,
    k: int,
    id_col: str,
    rank_col: str | None = None,
) -> DataFrame:
    """Per-key quota cap (the C4/RefinedWeb anti-domination rule): keep
    at most ``k`` rows per ``key_col`` value, chosen in a deterministic
    pseudo-random order — md5 of the id, reproducible on any engine and
    any rerun, unlike ``rand()``. Pass ``rank_col`` to keep the pick
    rank in the output.

    Scale: one window sort per key partition. Heavy keys (the ones the
    cap exists to cut) dominate the sort cost; when ``k`` is much
    smaller than the largest partitions, pre-prune with a cheap hash
    range filter (``pmod(hash(id), P) < ceil(margin·k·P/n_key)``)
    before the exact window so the sort only sees a small multiple of
    ``k`` rows per key.
    """
    w = Window.partitionBy(key_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    rank = rank_col or "__quota_rank"
    out = (
        df.withColumn(rank, F.row_number().over(w).cast("long"))
        .filter(F.col(rank) <= k)
    )
    return out if rank_col else out.drop(rank)


# ---------------------------------------------- weighted reservoir ----

#: 2^60 — the range of :func:`~lab3_lakehouse_spark.operators.sketches.
#: portable_hash60`; divides a hash into a uniform double in (0, 1].
_HASH60_RANGE = float(1 << 60)


def weighted_priority(id_col: str, weight_col: Column | str, seed: int = 7) -> Column:
    """Efraimidis–Spirakis A-Res priority ``ln(u) / w`` with a
    DETERMINISTIC uniform ``u = (hash60(id) + 1) / 2^60`` in (0, 1].

    Taking the top-n rows by this priority draws a weighted sample
    WITHOUT replacement (inclusion probability proportional to weight,
    per Efraimidis & Spirakis 2006, "Weighted random sampling with a
    reservoir") — but, unlike ``rand()``-keyed reservoirs, the draw is
    reproducible across reruns, partition layouts, and engines, because
    the randomness comes from an md5 of the stable id. The priority is
    engine-portable: the hash is integer-exact on both engines and
    ``ln`` agrees to ≤1 ulp, far below any realistic rank gap.

    PRECONDITION: weights must be strictly positive. ``w = 0`` yields
    −Inf (or NaN when ``u`` is exactly 1, and NaN sorts ABOVE every
    double under ``desc`` in Spark — such a row would win the sample);
    ``w < 0`` flips the sign and makes the row win deterministically.
    :func:`weighted_sample_topn` enforces the precondition by
    filtering; callers using this column directly must do the same.
    """
    from lab3_lakehouse_spark.operators.sketches import portable_hash60

    u = (
        (portable_hash60(F.col(id_col).cast("string"), seed) + F.lit(1)).cast("double")
        / F.lit(_HASH60_RANGE)
    )
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    return F.log(u) / w.cast("double")


def weighted_sample_topn(
    df: DataFrame,
    *,
    id_col: str,
    weight_col: str,
    n: int,
    seed: int = 7,
    priority_col: str = "priority",
) -> DataFrame:
    """Deterministic weighted sample of ``n`` rows without replacement.

    Scale: ``orderBy(...).limit(n)`` plans as TakeOrdered — each
    partition keeps its local top-n and only n·partitions candidate
    rows move to the driver-side merge, so there is NO global sort and
    no single-partition shuffle at any corpus size. The priority column
    is kept (caller may drop) so audits can re-verify the draw.

    Rows with non-positive (or null) weight are EXCLUDED — the A-Res
    priority is undefined there (see :func:`weighted_priority`), and a
    zero-weight row must have zero inclusion probability anyway.
    """
    pr = weighted_priority(id_col, weight_col, seed)
    w = F.col(weight_col)
    return (
        df.filter(w.cast("double") > 0)
        .withColumn(priority_col, pr)
        .orderBy(F.desc(priority_col), F.col(id_col))
        .limit(n)
    )


def materialize_rate_mix(
    df: DataFrame,
    rates: DataFrame,
    *,
    id_col: str,
    source_col: str,
    rate_col: str = "boost",
    seed: int = 31,
    copy_col: str = "copy",
) -> DataFrame:
    """APPLY a per-source sampling rate to the corpus — the step that
    turns mixture *weights* (domain_temperature_mix / source_mix_weights
    emit them) into an actual materialized mixture. Each row of ``df``
    appears ``floor(rate)`` times unconditionally plus one more time iff
    its deterministic uniform ``u = (hash60(id)+1)/2^60`` falls below
    the fractional part — so rates below 1 hash-subsample, rates above 1
    oversample by whole copies + a hashed fractional copy, and the
    expected per-source token mass is exactly ``rate × natural mass``.
    Emits every input column plus ``copy`` (0-based repeat index), so
    downstream packing/shuffling can distinguish repeats.

    Determinism is the contract: the draw is a pure function of the id
    (portable md5-derived hash, identical in ANSI SQL), so the mixture
    is reproducible across reruns, partition layouts, and engines —
    corpus-lineage auditing can re-verify exactly which documents a
    training mix contains. The int→double cast of the 60-bit hash is
    the same IEEE round-to-nearest on both engines, so the ``u ≤ frac``
    comparison can never diverge; callers must pin ``rate`` to 4
    decimals (round4) BEFORE passing it in, so ``frac`` is cross-engine
    identical too.

    Scale shape: ``rates`` is ≤ n_sources rows → broadcast join; one
    corpus scan, per-row explode bounded by ``ceil(rate)``; no shuffle
    of the corpus at all (``array_repeat`` + ``posexplode`` stay in the
    scan stage).
    """
    from lab3_lakehouse_spark.operators.sketches import portable_hash60

    rate = F.col(rate_col)
    u = (
        (portable_hash60(F.col(id_col).cast("string"), seed) + F.lit(1)).cast(
            "double"
        )
        / F.lit(_HASH60_RANGE)
    )
    n_copies = (
        F.floor(rate).cast("int")
        + (u <= (rate - F.floor(rate))).cast("int")
    )
    joined = df.join(
        F.broadcast(rates.select(source_col, rate_col)), source_col
    )
    exploded = joined.select(
        *df.columns,
        F.posexplode(F.array_repeat(F.lit(True), n_copies)).alias(
            copy_col, "__one"
        ),
    )
    return exploded.drop("__one")


def source_mix_weights(
    df: DataFrame,
    *,
    source_col: str,
    weight: Column,
    cap: float = 4.0,
) -> DataFrame:
    """Per-source mixture-rebalancing weights against a uniform target:
    ``min(cap, target_share / actual_share)`` where ``actual_share`` is
    the source's share of total ``weight`` (tokens, usually) and the
    target is ``1 / n_sources`` — the DoReMi/Pile-style resampling knob
    computed FROM the corpus instead of hand-set, with the cap bounding
    how hard a tiny source can be upsampled.

    Emits ``(source, n_docs, n_tokens, actual_share, mix_weight)`` with
    the float columns UNROUNDED (query-layer callers apply the round4
    policy). One grouped pass over the corpus; the totals come back as
    a broadcast singleton — no second fact scan.
    """
    per_src = df.groupBy(F.col(source_col).alias("source")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(weight).cast("double").alias("n_tokens"),
    )
    tot = per_src.agg(
        F.sum("n_tokens").cast("double").alias("total_tokens"),
        F.count(F.lit(1)).cast("double").alias("n_sources"),
    )
    share = F.col("n_tokens") / F.col("total_tokens")
    return per_src.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_tokens",
        share.alias("actual_share"),
        F.least(
            F.lit(float(cap)), (F.lit(1.0) / F.col("n_sources")) / share
        ).alias("mix_weight"),
    )


# ------------------------------ persisted bottom-k sample tier ----


def sample_store_append(
    store_root: str,
    df: DataFrame,
    id_col: str = "doc_id",
    *,
    k: int = 64,
    seed: int = 131,
) -> None:
    """Append one batch's candidate rows to a persisted UNIFORM-sample
    tier — the ``sample`` family of the stores.py lifecycle. The tier
    stores each batch's bottom-``k`` ids by ``portable_hash60(id,
    seed)``; because "global bottom-k of a union" = "bottom-k of the
    per-part bottom-ks", :func:`sample_store_draw` reconstructs the
    EXACT uniform-without-replacement k-sample of everything ever
    appended from batches·k stored rows — metadata-sized at any corpus
    age (the bottom-k sketch of Cohen & Kaplan 2007, here used as a
    maintainable sample rather than a cardinality estimator).

    Append cost ∝ the batch (one hash scan + per-partition top-k
    merge, TakeOrderedAndProject — no global sort); the existing store
    is never read. At-least-once replay re-appends IDENTICAL rows (the
    hash is deterministic) and the reader de-duplicates by id, so the
    tier is fully idempotent — no batch_id accounting needed.
    ``k``/``seed`` must match across appends and draws."""
    from lab3_lakehouse_spark import stores
    from lab3_lakehouse_spark.operators.sketches import portable_hash60

    mins = (
        df.select(F.col(id_col).cast("long").alias("doc_id"))
        .distinct()
        .select("doc_id", portable_hash60(F.col("doc_id"), seed).alias("h"))
        .orderBy("h", "doc_id")
        .limit(k)
    )
    stores.append_rows(mins, store_root, "mins", buckets=1)


def sample_store_draw(spark, store_root: str, *, k: int = 64) -> DataFrame:
    """The exact uniform k-sample of every id ever appended: merge the
    stored per-batch bottom-k rows (dedup by id — replays collapse),
    keep the global bottom-k. Input is batches·k rows, so the draw is
    metadata work regardless of corpus size, and it is DETERMINISTIC:
    the same appended id set always yields the same sample, on any
    engine, under any partitioning or batch history (pinned by the
    randomized-append property test)."""
    from lab3_lakehouse_spark import stores

    return (
        stores.read_tier(spark, store_root, "mins")
        .dropDuplicates(["doc_id"])
        .orderBy("h", "doc_id")
        .limit(k)
    )


def sample_store_compact(
    spark, src_root: str, dst_root: str, *, k: int = 64
) -> None:
    """Disk GC for the sample tier: fold the batches·k accumulated
    rows to the single global bottom-k row-set, written to a NEW root
    per the stores.gc_write contract (live probes undisturbed; swap-in
    is stores.swap_root). Draws from the compacted tier are identical
    by construction — the fold IS the draw."""
    from lab3_lakehouse_spark import stores

    stores.gc_write(
        sample_store_draw(spark, src_root, k=k), dst_root, "mins", coalesce=1
    )


def weighted_sample_store_append(
    store_root: str,
    df: DataFrame,
    id_col: str = "doc_id",
    weight_col: str = "n_chars",
    *,
    k: int = 64,
    seed: int = 7,
) -> None:
    """Weighted twin of :func:`sample_store_append` — the ``priorities``
    tier of the ``sample`` family: each batch appends only its top-k
    rows by the deterministic Efraimidis–Spirakis priority
    (:func:`weighted_priority`, inclusion probability ∝ weight), and
    because per-item priorities are independent of batching, "global
    top-k of a union" = "top-k of the per-batch top-ks" — the
    A-ExpJ reservoir argument, realized as a mergeable persisted tier.
    Same contracts as the uniform tier: append cost ∝ the batch
    (TakeOrderedAndProject), store never read, replay-idempotent
    (deterministic rows, id-dedup on draw). Non-positive/null weights
    are excluded (the weighted_priority precondition). ``k``/``seed``
    and the weight SEMANTICS must match across appends — a doc's
    priority must not change between batches (re-appending an id with
    a different weight breaks the reservoir argument; ids are unique
    across batches per the store contract)."""
    from lab3_lakehouse_spark import stores

    w = F.col(weight_col)
    tops = (
        df.filter(w.cast("double") > 0)
        .select(
            F.col(id_col).cast("long").alias("doc_id"),
            weighted_priority(id_col, weight_col, seed).alias("priority"),
        )
        .dropDuplicates(["doc_id"])
        .orderBy(F.desc("priority"), "doc_id")
        .limit(k)
    )
    stores.append_rows(tops, store_root, "priorities", buckets=1)


def weighted_sample_store_draw(spark, store_root: str, *, k: int = 64) -> DataFrame:
    """The exact weighted k-sample (without replacement, inclusion ∝
    weight) of every id ever appended: merge the stored per-batch
    top-k priority rows, dedup by id, keep the global top-k —
    batches·k input rows, deterministic in the appended id/weight set."""
    from lab3_lakehouse_spark import stores

    return (
        stores.read_tier(spark, store_root, "priorities")
        .dropDuplicates(["doc_id"])
        .orderBy(F.desc("priority"), "doc_id")
        .limit(k)
    )


def weighted_sample_store_compact(
    spark, src_root: str, dst_root: str, *, k: int = 64
) -> None:
    """Disk GC for the weighted tier — the fold IS the draw (the
    uniform-tier contract, desc order)."""
    from lab3_lakehouse_spark import stores

    stores.gc_write(
        weighted_sample_store_draw(spark, src_root, k=k),
        dst_root,
        "priorities",
        coalesce=1,
    )
