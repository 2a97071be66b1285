#!/usr/bin/env python
"""Dump formatted physical plans for the r15-touched queries into
plans/r15/<query>_<suffix>.txt (suffix from argv[1]: 'before' at the
pre-optimization commit, 'after' at HEAD). Store-lifecycle entries
checkpoint their result away, so the interesting probe frames are
rebuilt uncheckpointed here (the scripts/dump_plans.py device); the
medallion bronze layout is a write, so its pre-write frame is planned
via sources.medallion._layout."""
from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(REPO, "plans", "r15")


def _scratch(prefix: str) -> str:
    import atexit
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, tmp, ignore_errors=True)
    return tmp


def _ivfpq_probe(spark):
    """The ann_store_ivfpq_topk PROBE plan (the r15 ADC-expression
    evidence: before = ArrowEvalPython in the scoring stage, after =
    pure Project)."""
    from pyspark.sql import functions as F

    from lab3_lakehouse_spark.catalog import load_table
    from lab3_lakehouse_spark.operators import similarity as sim_ops

    emb = load_table(spark, SF_DIR, "embeddings")
    q = emb.filter(F.col("vec_id") < 8)
    tmp = _scratch("plans_r15_ivfpq_")
    fit = sim_ops.ivfpq_store_init(
        tmp, emb, "vec_id", "embedding", n_centroids=16, dim=64, m=8,
        n_codes=32,
    )
    sim_ops.ivfpq_store_append(spark, tmp, emb, "vec_id", "embedding", meta=fit)
    return sim_ops.ivfpq_store_topk(
        spark, tmp, emb, q, "vec_id", "embedding", k=5, n_probe=8,
        rerank=400, meta=fit,
    )


def _medallion_bronze(spark):
    """The bronze-tier write layout (r15: repartition(year, month) →
    AQE REBALANCE on the partition columns)."""
    from lab3_lakehouse_spark.catalog import load_table
    from lab3_lakehouse_spark.sources import ingest
    from lab3_lakehouse_spark.sources import medallion as med

    ev = load_table(spark, SF_DIR, "events")
    bronze = ingest.add_date_parts(ev, "ts", ("year", "month"))
    if hasattr(med, "_layout"):  # r15 split; 'before' commit predates it
        return med._layout(bronze, ["year", "month"], None, None)
    from pyspark.sql import functions as F

    return bronze.repartition(F.col("year"), F.col("month"))


#: query name -> frame builder (None = QUERIES[name](spark, SF_DIR))
TARGETS: dict = {
    "ann_pq_topk": None,               # ADC expression (2 -> 1 Python node)
    "ann_ivfpq_topk": None,            # ADC expression (2 -> 1 Python node)
    "ann_store_ivfpq_topk": _ivfpq_probe,  # probe: 1 -> 0 Python nodes
    "lsh_banding_frontier": None,      # salted (lang, band) pair tier
    "word_jaccard_near_dups": None,    # the shared pair tier, pure form
    "medallion_bronze": _medallion_bronze,  # REBALANCE write layout
}


def main() -> None:
    from lab3_lakehouse_spark.plans.analysis import formatted_plan
    from lab3_lakehouse_spark.queries import QUERIES
    from lab3_lakehouse_spark.session import build_session

    suffix = sys.argv[1]
    os.makedirs(OUT, exist_ok=True)
    spark = build_session(app_name=f"dump-r15-{suffix}")
    for name, builder in TARGETS.items():
        frame = builder(spark) if builder else QUERIES[name](spark, SF_DIR)
        plan = formatted_plan(frame)
        plan = re.sub(r"\[codegen id : \d+\]", "[codegen]", plan)
        plan = re.sub(r"file:[^\s,\]]+", "<path>", plan)
        with open(os.path.join(OUT, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan.rstrip() + "\n")
        print(f"wrote {name}_{suffix}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
