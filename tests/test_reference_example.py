"""Smoke the end-to-end reference-workload example (examples/
reference_pipeline.py) — the strongest switch-from-the-reference
evidence: CSV -> bronze -> silver(+metrics, +clustering) -> gold -> RF."""

from __future__ import annotations

import shutil
import sys
import tempfile

import pytest

sys.path.insert(0, "examples")


def test_reference_pipeline_end_to_end(spark):
    from reference_pipeline import generate_sample_csv, run_pipeline

    work = tempfile.mkdtemp(prefix="taxi_e2e_")
    csv = f"{work}/taxi.csv"
    try:
        generate_sample_csv(csv, n=5000)
        out = run_pipeline(spark, csv, work)
        assert out["n_input"] == 5000
        assert 0 < out["n_rejected"] < 5000
        assert out["gold_daily_rows"] > 0
        assert out["rmse"] >= out["mae"] > 0
        assert out["r2"] <= 1.0
    finally:
        shutil.rmtree(work, ignore_errors=True)
