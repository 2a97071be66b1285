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
