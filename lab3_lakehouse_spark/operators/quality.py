"""Quality filtering with single-pass rejected-row accounting.

Generalizes the reference's silver-tier cleaning:

- F1 conjunctive positivity filter + column-vs-column predicate
  (``src/utils.py:27-33``; the col-vs-col term is ``pickup < dropoff``
  at ``utils.py:32``),
- F2 range filter on a derived column (``src/utils.py:43-46``),
- F3 rejected-row accounting via before/after ``count()``
  (``src/utils.py:26,34-36,48``) — which costs *three extra full scans*.

The engine replaces F3's repeated ``count()`` actions with
``df.observe``: metrics are accumulated inside the same job that
produces the filtered output, so quality observability is free at
100 TB instead of doubling the scan bill (SURVEY §4 "eager
double-scans").
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def conjunctive_filter(df: DataFrame, predicates: Sequence[Column]) -> DataFrame:
    """F1/F2: AND of arbitrary predicates (incl. column-vs-column)."""
    combined = F.lit(True)
    for p in predicates:
        combined = combined & p
    return df.filter(combined)


def filter_with_metrics(
    df: DataFrame, predicates: Sequence[Column], observation_name: str = "quality"
) -> tuple[DataFrame, Observation]:
    """Filtered frame + an Observation carrying pass/reject counts.

    Usage::

        clean, obs = filter_with_metrics(df, preds)
        clean.write.parquet(...)          # one job
        obs.get["n_rejected"]             # no extra scan

    Note: Observation metrics materialize when an *action* runs on the
    returned frame.
    """
    combined = F.lit(True)
    for p in predicates:
        combined = combined & p
    obs = Observation(observation_name)
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("n_input"),
        F.sum(F.when(combined, 0).otherwise(1)).alias("n_rejected"),
    )
    return observed.filter(combined), obs


def reject_report(df: DataFrame, predicates: dict[str, Column]) -> DataFrame:
    """Per-predicate reject counts in ONE aggregation pass.

    The reference can only report the total delta; this reports which
    rule rejected how many rows (a row may violate several rules), plus
    totals — still a single scan.
    """
    aggs = [F.count(F.lit(1)).alias("n_input")]
    combined = F.lit(True)
    for name, p in predicates.items():
        aggs.append(F.sum(F.when(~p, 1).otherwise(0)).alias(f"rejected_{name}"))
        combined = combined & p
    aggs.append(F.sum(F.when(combined, 1).otherwise(0)).alias("n_passed"))
    return df.agg(*aggs)


def impute_group_mean(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    out_col: str | None = None,
) -> DataFrame:
    """Mean-imputation of NULLs in ``value_col`` using the per-group
    mean of the non-null values; adds ``out_col`` (default
    ``<value_col>_imputed``) and a ``was_imputed`` flag.

    Scale shape: the group means come from a ``groupBy().avg()`` —
    map-side partial combine collapses each partition to its group
    count before ONE shuffle of tiny partials — and re-attach via a
    join on the group key. The means frame is as small as the group
    cardinality, so AQE broadcasts it; the window-function alternative
    (``avg OVER (PARTITION BY …)``) would instead shuffle the FULL
    table into one partition per group — the skew trap this avoids.
    """
    out_col = out_col or f"{value_col}_imputed"
    means = df.groupBy(*group_cols).agg(F.avg(value_col).alias("__grp_mean"))
    return (
        df.join(means, list(group_cols), "left")
        .withColumn(out_col, F.coalesce(F.col(value_col), F.col("__grp_mean")))
        .withColumn("was_imputed", F.col(value_col).isNull())
        .drop("__grp_mean")
    )
