"""Bench harness regression tests.

Round 2 shipped ``_bench_overrides()`` as dead code — ``main()`` kept
timing the catalog bodies (which carry O(n²) verification scaffolding),
so BENCH_r02 showed a phantom 3.5× regression on
``doc_fingerprint_matches``. These tests pin the wiring so the bench
always times the production operators.
"""

from __future__ import annotations

import bench
from lab3_lakehouse_spark.queries import QUERIES


def test_every_override_targets_a_headline_query():
    overrides = bench._bench_overrides()
    assert overrides, "override table unexpectedly empty"
    for name in overrides:
        assert name in bench.HEADLINE, f"{name} overridden but not benched"
        assert name in QUERIES, f"{name} overridden but not registered"


def test_timed_path_resolves_through_overrides():
    """The timed path must consult _bench_overrides(), not QUERIES
    directly — the exact bug of round 2 (defined but never called).
    Since round 5 the timed path is run_single (executed in a fresh
    child JVM per query); main() only orchestrates children."""
    assert "_bench_overrides" in bench.run_single.__code__.co_names
    assert "_child" in bench.main.__code__.co_names


def test_fresh_jvm_child_measures_one_query(monkeypatch):
    """End-to-end child smoke (the r4 verdict isolation fix): forking
    `bench.py --one <name>` must start its own JVM, warm up, time the
    query at $SPARK_GRAFT_SF_DIR and print one parseable JSON line."""
    import os

    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", os.environ.get(
        "SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001"))
    secs = bench._child("daily_revenue")
    assert 0 < secs < 120


def test_overrides_differ_from_catalog_bodies():
    """An override that just re-exports the catalog body would silently
    reintroduce scaffolding into the timed path."""
    overrides = bench._bench_overrides()
    for name, fn in overrides.items():
        assert fn is not QUERIES[name], f"{name} override is the catalog body"


def test_headline_names_are_registered():
    missing = [n for n in bench.HEADLINE if n not in QUERIES]
    assert not missing, f"HEADLINE references unregistered queries: {missing}"
