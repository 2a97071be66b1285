"""Continuous-ingestion pipeline on the engine — the daily-crawl
lifecycle composed from the operator kit (third composed example,
alongside the corpus-build and event-analytics pipelines):

    DAY 1 (bootstrap)
      corpus split      → exact dedup → versioned corpus tier v1
                        → PERSIST the MinHash signature store:
                          (id, shingle-hashes) + banded (id, band, bh)

    DAY 2..N (each delta batch)
      delta split       → exact dedup WITHIN the batch
                        → exact dedup AGAINST the corpus
                          (anti-join on the md5 content fingerprint)
                        → near-dup dedup AGAINST the corpus:
                          band the delta only, probe the STORED band
                          table, verify candidates on stored hashes
                          (operators/dedup.minhash_candidates_vs_bands)
                        → append survivors → corpus tier v2
                        → extend the signature store with the survivors

The point at 100 TB: a daily run's cost is proportional to the DELTA —
the corpus is touched only through its fingerprint column and its
persisted band/hash tables, never re-tokenized, never re-scanned as
text.

Run: ``python examples/incremental_ingest_pipeline.py [sf_dir] [out]``.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lab3_lakehouse_spark.catalog import fan_out, load_table
from lab3_lakehouse_spark.operators import dedup as dedup_ops
from lab3_lakehouse_spark.sources import versioned as vt
from lab3_lakehouse_spark.sources.medallion import read_tier


def _hashed(docs: DataFrame) -> DataFrame:
    """(__id, __h) shingle-hash frame — the verify half of the store."""
    return docs.select(
        F.col("doc_id").alias("__id"),
        dedup_ops.shingle_hashes("text", 3).alias("__h"),
    )


def run_incremental_ingest(
    spark: SparkSession,
    sf_dir: str,
    out_root: str,
    near_dup_threshold: float = 0.8,
    max_band_bucket: int = 1000,
) -> dict[str, int]:
    """Bootstrap the corpus from one split, then ingest the other split
    as a delta batch against the persisted signature store. Returns
    per-stage counts.

    ``max_band_bucket`` guards the probe join: a hot bucket in the
    persisted store multiplies EVERY future delta batch by its
    membership, so buckets above the cap are excluded from candidate
    probing and accounted in the report (``hot_buckets_dropped`` /
    ``hot_bucket_max_members``) — the operator's cue to mine that
    cluster in the exact-dedup tier instead."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    corpus_raw = docs.filter(F.col("doc_id") % 5 != 0)
    delta_raw = docs.filter(F.col("doc_id") % 5 == 0)

    corpus_path = f"{out_root}/corpus"
    store_root = f"{out_root}/signature_store"
    bands_path = f"{store_root}/bands"
    hashes_path = f"{store_root}/hashes"

    # ---- day 1: bootstrap -------------------------------------------
    corpus = dedup_ops.exact_dedup(corpus_raw, ["text"], ["doc_id"]).withColumn(
        "fp", dedup_ops.fingerprint("text")
    )
    v1 = vt.write_version(corpus, spark, corpus_path)
    hashed = _hashed(corpus)
    dedup_ops.minhash_store_append(store_root, hashed)

    # ---- day 2: delta batch against the store -----------------------
    corpus_v1 = vt.read_version(spark, corpus_path, version=v1)
    delta = dedup_ops.exact_dedup(delta_raw, ["text"], ["doc_id"]).withColumn(
        "fp", dedup_ops.fingerprint("text")
    )
    # exact: drop delta docs whose content fingerprint already exists
    delta_exact = delta.join(
        corpus_v1.select("fp"), "fp", "left_anti"
    ).localCheckpoint(eager=False)

    # near: band ONLY the delta, probe the stored band table, verify on
    # stored hashes — corpus text is never touched
    delta_hashed = _hashed(delta_exact).localCheckpoint(eager=False)
    stored_bands = read_tier(spark, bands_path)
    hot = dedup_ops.hot_band_buckets(stored_bands, max_band_bucket)
    cands = dedup_ops.minhash_candidates_vs_bands(
        delta_hashed, stored_bands, max_bucket=max_band_bucket
    )
    verified = dedup_ops.minhash_verify_hashed(
        cands,
        delta_hashed.unionByName(read_tier(spark, hashes_path)),
        threshold=near_dup_threshold,
    )
    dup_delta_ids = verified.select(F.col("id_a").alias("doc_id")).distinct()
    survivors = delta_exact.join(dup_delta_ids, "doc_id", "left_anti")

    # append → v2, and extend the store with the survivors
    v2 = vt.write_version(corpus_v1.unionByName(survivors), spark, corpus_path)
    surv_hashed = _hashed(survivors)
    dedup_ops.minhash_store_append(store_root, surv_hashed)

    hot_row = hot.agg(
        F.count(F.lit(1)).alias("n"), F.max("n_members").alias("mx")
    ).first()
    return {
        "hot_buckets_dropped": int(hot_row["n"] or 0),
        "hot_bucket_max_members": int(hot_row["mx"] or 0),
        "corpus_v1": corpus_v1.count(),
        "delta_raw": delta_raw.count(),
        "delta_after_exact": delta_exact.count(),
        "delta_near_dups": dup_delta_ids.count(),
        "delta_survivors": survivors.count(),
        "corpus_v2": vt.read_version(spark, corpus_path, version=v2).count(),
        "v1": v1,
        "v2": v2,
    }


def main() -> None:
    from lab3_lakehouse_spark.session import build_session

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp("incremental")
    spark = build_session(app_name="incremental-ingest-pipeline")
    try:
        print(run_incremental_ingest(spark, sf_dir, out))
    finally:
        if len(sys.argv) <= 2:
            shutil.rmtree(out, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
