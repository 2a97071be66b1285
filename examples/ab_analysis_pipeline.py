"""End-to-end A/B experiment-analysis pipeline — the experimentation
workload composed from the round-10 statistical kit the way a growth
team would chain it (companion to event_analytics_pipeline.py, which
covers monitoring, and llm_corpus_pipeline.py, the corpus side):

    events
      → arm assignment       (first-touch: view-first vs click-first)
      → effect estimates, three lenses on "did the arms differ":
          means               (welch_ttest_purchase_click — CLT lens)
          ranks               (mannwhitney_value_shift — nonparametric
                               lens, robust to the skew engagement
                               values always have)
          proportions         (conversion_rate_ztest — the decision
                               metric most experiments actually ship)
      → time-to-effect        (kaplan_meier_conversion — the survival
                               curve with right-censoring; average
                               time-to-convert among converters is the
                               classic biased shortcut this replaces)
      → revenue attribution   (multi_touch_attribution — which channel
                               earns the purchase value, U-shaped)
      → seasonality guards    (spearman_value_hour: monotone
                               time-of-day drift that would confound a
                               sequential test; acf_daily_revenue:
                               weekly cycle the duration of the
                               experiment must cover)
      → each report materialized as a gold tier table

Every stage is a registered catalog query (oracle-checked against
DuckDB at sf0.01 by the driver), so this pipeline is a composition of
verified parts — the same composition is the 100 TB plan: every
report shuffles on user/conversion/analysis keys only.

Run: ``python examples/ab_analysis_pipeline.py [sf_dir] [out_dir]``.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

from pyspark.sql import SparkSession

from lab3_lakehouse_spark.queries import QUERIES
from lab3_lakehouse_spark.sources.medallion import materialize, read_tier

#: gold report → catalog query powering it
_REPORTS = {
    "effect_means": "welch_ttest_purchase_click",
    "effect_ranks": "mannwhitney_value_shift",
    "effect_conversion": "conversion_rate_ztest",
    "time_to_convert": "kaplan_meier_conversion",
    "attribution": "multi_touch_attribution",
    "hour_drift": "spearman_value_hour",
    "weekly_cycle": "acf_daily_revenue",
}


def run_ab_analysis(
    spark: SparkSession, sf_dir: str, out_root: str
) -> dict[str, int]:
    """Materialize the seven experiment-analysis gold tables; returns
    per-artifact row counts."""
    counts: dict[str, int] = {}
    for name, qname in _REPORTS.items():
        path = os.path.join(out_root, "gold", name)
        materialize(QUERIES[qname](spark, sf_dir), path)
        counts[name] = read_tier(spark, path).count()
    return counts


def main() -> None:
    from lab3_lakehouse_spark.session import build_session

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp("ab_analysis")
    spark = build_session(app_name="ab-analysis-pipeline")
    try:
        print(run_ab_analysis(spark, sf_dir, out))
    finally:
        if len(sys.argv) <= 2:
            shutil.rmtree(out, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
