#!/usr/bin/env python
"""Deterministic execution-shape profile for registry queries: run one
query (after a sf0.001 plan warm-up) and report how many Spark JOBS it
launches plus wall time. Job count is a host-noise-free before/after
metric for driver-loop-bound entries (store lifecycles, GD loops,
probe sweeps) where the fixed per-job cost dominates the sf0.1 bench.

    python scripts/job_profile.py <query> [<query> ...]
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARM = os.environ.get("SPARK_GRAFT_WARMUP_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    from lab3_lakehouse_spark.queries import QUERIES
    from lab3_lakehouse_spark.session import build_session

    names = sys.argv[1:]
    spark = build_session(app_name="job-profile")
    sc = spark.sparkContext
    for name in names:
        fn = QUERIES[name]
        fn(spark, WARM).write.format("noop").mode("overwrite").save()
        group = f"profile-{name}"
        sc.setJobGroup(group, name)
        t0 = time.perf_counter()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        sc.setJobGroup(None, None)
        jobs = sc.statusTracker().getJobIdsForGroup(group)
        print(f"{name}: jobs={len(jobs)} wall={wall:.2f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
