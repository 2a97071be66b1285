"""End-to-end event-analytics pipeline on the engine — the product-
analytics workload composed from the operator kit the way a data team
would chain it (companion to examples/llm_corpus_pipeline.py, which
composes the corpus side):

    events
      → debounce            (operators/events.throttle: drop retry-storm
                             duplicates before anything downstream
                             double-counts them)
      → silver tier         (sources/medallion.materialize, clustered by
                             user for the sequence windows that follow)
      → gold reports:
          funnel            (first_touch_stages + funnel_summary)
          transitions       (transition_counts Markov matrix)
          retention         (retention_cohorts triangle)
          daily activity    (gap_filled_counts, zero-filled)
          anomalies         (hourly gap-fill → seasonal_residual_topk)
          value drift       (value_drift_psi: PSI retrain gate,
                             value_drift_ks: exact-KS second opinion)
          burstiness        (inter_event_burstiness: bot screen)
          novelty           (daily_user_novelty: new vs returning)
      → each report materialized as a gold tier table

Every stage is the production formulation: one shuffle on the sequence
key for the windows, broadcast-sized spines for the gap fill, integer-
only anomaly ranking. The same composition is the 100 TB plan — the
debounce and every report partition on user/series keys, so at scale
the exchanges coalesce instead of multiplying.

Run: ``python examples/event_analytics_pipeline.py [sf_dir] [out_dir]``.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

from pyspark.sql import SparkSession

from lab3_lakehouse_spark.catalog import load_table
from lab3_lakehouse_spark.operators import events as events_ops
from lab3_lakehouse_spark.sources.medallion import materialize, read_tier


def run_event_analytics(
    spark: SparkSession,
    sf_dir: str,
    out_root: str,
    min_gap_us: int = 300_000_000,
    funnel_stages: list[str] | None = None,
) -> dict[str, int]:
    """Build the debounced silver tier and the five gold report tables.
    Returns per-artifact row counts."""
    stages = funnel_stages or ["view", "click", "purchase"]
    raw = load_table(spark, sf_dir, "events")

    # 1. debounce → silver (clustered by the sequence key every
    #    downstream window partitions on)
    silver_path = os.path.join(out_root, "silver", "events_debounced")
    debounced = events_ops.throttle(
        raw, ["user_id", "event_type"], min_gap_us=min_gap_us
    )
    materialize(debounced, silver_path, cluster_by=["user_id"])
    ev = read_tier(spark, silver_path)

    # 2. gold reports — each a one-or-two-shuffle aggregate over silver
    gold = {
        "funnel": events_ops.funnel_summary(
            events_ops.first_touch_stages(ev, stages), stages
        ),
        "transitions": events_ops.transition_counts(ev),
        "retention": events_ops.retention_cohorts(ev),
        "daily_activity": events_ops.gap_filled_counts(ev, grain="day"),
        "anomalies": events_ops.seasonal_residual_topk(
            events_ops.gap_filled_counts(ev, grain="hour"), lag_buckets=24, k=5
        ),
        # drift gate: value-distribution PSI across the month midpoint —
        # the retrain alarm a training pipeline checks BEFORE consuming
        # this tier (sum(psi_term) >= 0.2 blocks the downstream job)
        "value_drift": events_ops.value_drift_psi(ev, split_ts="2024-01-16"),
        # second opinion on the same gate: exact two-sample KS — PSI is
        # binned (blind to within-bucket shifts), KS is the exact
        # strongest CDF gap; alarm on EITHER
        "value_drift_ks": events_ops.value_drift_ks(ev, split_ts="2024-01-16"),
        # behavioral screen: metronomic users (B near -1) are bots the
        # debounce alone cannot catch (they never fire inside the gap)
        "burstiness": events_ops.inter_event_burstiness(ev),
        # audience composition: new-vs-returning decomposition per day
        "novelty": events_ops.daily_user_novelty(ev),
    }
    counts: dict[str, int] = {"input": raw.count(), "debounced": ev.count()}
    for name, df in gold.items():
        path = os.path.join(out_root, "gold", name)
        materialize(df, path)
        counts[name] = read_tier(spark, path).count()
    return counts


def main() -> None:
    from lab3_lakehouse_spark.session import build_session

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp("event_analytics")
    spark = build_session(app_name="event-analytics-pipeline")
    try:
        print(run_event_analytics(spark, sf_dir, out))
    finally:
        if len(sys.argv) <= 2:
            shutil.rmtree(out, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
