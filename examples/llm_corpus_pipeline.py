"""End-to-end LLM training-corpus pipeline on the engine — the
north-star workload (BASELINE.json) composed from the operator kit,
the way a data team would actually chain it:

    documents
      → quality gate           (operators/text.quality_features)
      → language ID            (operators/text.lang_id_heuristic)
      → exact dedup            (operators/dedup.exact_dedup)
      → near-dup collapse      (MinHash-LSH pairs → verify →
                                connected components → keep each
                                component's smallest doc_id)
      → decontamination        (operators/text.ngram_overlap vs a
                                held-out benchmark split)
      → source quota cap       (operators/sampling.cap_per_key,
                                C4-style anti-domination; optional)
      → PII scrub              (operators/text.redact_pii, audit counts)
      → embedding chunks       (operators/text.chunk_token_windows,
                                side branch for the retrieval corpus)
      → sequence packing       (operators/packing.pack_concat_chop)
      → versioned corpus tier  (sources/versioned.write_version)

Every stage is the PRODUCTION formulation (LSH banding, hash-shuffle
dedup, postings-join decontamination — no brute force anywhere), so the
same composition is the 100 TB plan. Stage row counts are collected
once at the end from a single cached frame per stage boundary.

Run: ``python examples/llm_corpus_pipeline.py [sf_dir] [out_dir]``.
"""

from __future__ import annotations

import shutil
import sys
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lab3_lakehouse_spark.catalog import fan_out, load_table
from lab3_lakehouse_spark.operators import dedup as dedup_ops
from lab3_lakehouse_spark.operators import packing as pack_ops
from lab3_lakehouse_spark.operators import sampling as sampling_ops
from lab3_lakehouse_spark.operators import text as text_ops
from lab3_lakehouse_spark.sources import versioned as vt


def run_corpus_pipeline(
    spark: SparkSession,
    sf_dir: str,
    out_root: str,
    seq_len: int = 512,
    near_dup_threshold: float = 0.8,
    contamination_threshold: float = 0.5,
    max_docs_per_source: int | None = None,
    max_band_bucket: int = 1000,
    apply_temperature_mix: bool = False,
) -> dict[str, int]:
    """Build a packed, deduplicated, decontaminated corpus tier.
    Returns per-stage surviving row counts (monotonically
    non-increasing until packing).

    ``max_band_bucket`` is the LSH hot-bucket cap (always ON here —
    mass boilerplate that survives exact dedup is a crawl-scale
    certainty, and one hot bucket is an n² pair bomb): band buckets
    larger than the cap are excluded from candidate generation and
    ACCOUNTED in the returned report (``hot_buckets_dropped`` count +
    ``hot_bucket_max_members``) so an operator sees exactly what was
    routed away from the quadratic tier. Members of a capped bucket
    still collide in their other bands, so genuine near-dup pairs
    outside the pathological cluster are unaffected (planted e2e test:
    tests/test_llm_corpus_pipeline.py)."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))

    # 1. quality gate: drop degenerate docs before any expensive op
    quality = text_ops.quality_features(docs).filter(
        (F.col("n_tokens") >= 5) & (F.col("mean_token_len") < 20)
    )

    # 2. language ID (kept as metadata; a real run would partition by it)
    tagged = quality.withColumn(
        "lang_pred", text_ops.lang_id_heuristic(F.col("text"))
    )

    # 3. exact dedup — cheapest tier first, shrinks the LSH input
    exact = dedup_ops.exact_dedup(tagged, ["text"], ["doc_id"])

    # 4. near-dup collapse: one shingle-hash pass shared by candidates
    #    and verification, then component-root survivors. The band
    #    table is built ONCE (checkpointed) so the hot-bucket report
    #    and the capped candidate join read the same frame.
    hashed = exact.select(
        F.col("doc_id").alias("__id"),
        dedup_ops.shingle_hashes("text", 3).alias("__h"),
    ).localCheckpoint(eager=False)
    banded = dedup_ops.banded_signatures(
        hashed, num_perm=64, bands=16
    ).localCheckpoint(eager=False)
    hot = dedup_ops.hot_band_buckets(banded, max_band_bucket)
    pairs = dedup_ops.minhash_verify_hashed(
        dedup_ops.minhash_lsh_candidates_from_bands(
            dedup_ops.cap_band_buckets(banded, max_band_bucket)
        ),
        hashed,
        threshold=near_dup_threshold,
    )
    components = dedup_ops.connected_components(pairs, "id_a", "id_b")
    non_roots = components.filter(F.col("vertex") != F.col("component")).select(
        F.col("vertex").alias("doc_id")
    )
    deduped = exact.join(non_roots, "doc_id", "left_anti")

    # 5. decontamination against the held-out benchmark split
    bench = docs.filter(F.col("doc_id") % 10 == 0)
    corpus = deduped.filter(F.col("doc_id") % 10 != 0)
    overlaps = text_ops.ngram_overlap(corpus, bench, shingle_n=3)
    contaminated = overlaps.filter(
        F.col("n_overlap").cast("double") / F.col("n_shingles").cast("double")
        >= contamination_threshold
    ).select("doc_id").distinct()
    clean = corpus.join(contaminated, "doc_id", "left_anti")

    # 5a. per-source quota cap (C4-style anti-domination): bound how
    #     many documents any single domain contributes to the mix —
    #     deterministic md5-ordered pick (operators/sampling.cap_per_key).
    #     None disables the cap (the synthetic corpus is already
    #     balanced); a real web crawl always sets it.
    capped = clean
    if max_docs_per_source is not None:
        capped = sampling_ops.cap_per_key(
            clean, key_col="source", k=max_docs_per_source, id_col="doc_id"
        )

    # 5a'. mixture diagnostics on the capped corpus: per-source token
    #      share vs a uniform target and the capped resample weight a
    #      mixing pass would apply (operators/sampling.
    #      source_mix_weights). Reported always; APPLIED when
    #      ``apply_temperature_mix`` is set (r8: the materializer
    #      exists) — τ=2 temperature boosts, round4-pinned, turned into
    #      floor(boost) whole copies + a hash-drawn fractional copy per
    #      doc (operators/sampling.materialize_rate_mix), so the
    #      published corpus IS the mixture, reproducibly.
    mix = sampling_ops.source_mix_weights(
        capped, source_col="source", weight=text_ops.token_count("text")
    )
    mixed = capped
    if apply_temperature_mix:
        from lab3_lakehouse_spark.queries._util import round4

        per = capped.groupBy("source").agg(
            F.sum(text_ops.token_count("text")).cast("double").alias("__nt")
        )
        tot = per.agg(F.sum("__nt").alias("__t"))
        q = per.crossJoin(F.broadcast(tot)).select(
            "source", F.sqrt(F.col("__nt") / F.col("__t")).alias("__q"),
            (F.col("__nt") / F.col("__t")).alias("__p"),
        )
        z = q.agg(F.sum("__q").alias("__z"))
        rates = q.crossJoin(F.broadcast(z)).select(
            "source",
            round4((F.col("__q") / F.col("__z")) / F.col("__p")).alias("boost"),
        )
        # repeats must not collide downstream: the copy index joins the
        # id so exact-dedup/packing order stay deterministic. The remap
        # base must exceed the LARGEST copy index any source can emit —
        # boost ∝ 1/sqrt(share), so a sufficiently tiny source can push
        # ceil(boost) past any hardcoded constant; derive it from the
        # actual rate frame (≤ n_sources rows — bounded metadata read).
        max_copies = max(
            int(
                rates.agg(
                    F.max(F.ceil(F.col("boost"))).alias("m")
                ).first()["m"]
                or 1
            ),
            1,
        )
        mixed = sampling_ops.materialize_rate_mix(
            capped, rates, id_col="doc_id", source_col="source"
        ).withColumn(
            "doc_id",
            F.col("doc_id") * F.lit(max_copies) + F.col("copy"),
        ).drop("copy")

    # 5b. PII scrub before publication — row-preserving; audit counts
    #     ride along as metadata (zero on a synthetic PII-free corpus,
    #     but the gate always runs: scrubbing is not optional at 100 TB).
    #     The raw column is DROPPED here: everything downstream (chunks,
    #     packing, the published tier) must see only redacted text, and
    #     n_tokens is recomputed because redaction rewrites the text.
    scrubbed = (
        text_ops.redact_pii(mixed, "text")
        .withColumn("text", F.col("text_redacted"))
        .drop("text_redacted")
        .withColumn("n_tokens", text_ops.token_count("text"))
    )

    # 5c. side branch: sliding-window chunks for the embedding/retrieval
    #     corpus (the LM corpus continues to packing below)
    chunks = text_ops.chunk_token_windows(
        scrubbed.select("doc_id", "text"), "text", n_tokens=64, stride=32,
    )

    # 6. concat-and-chop packing into fixed-length training sequences
    packed = pack_ops.pack_concat_chop(
        scrubbed.withColumn("shard", F.pmod(F.xxhash64("doc_id"), F.lit(8))),
        token_col="n_tokens",
        order_col="doc_id",
        shard_col="shard",
        seq_len=seq_len,
    )

    # 7. publish as an immutable corpus snapshot
    version = vt.write_version(packed, spark, f"{out_root}/corpus")

    stages: dict[str, DataFrame] = {
        "input": docs,
        "quality": quality,
        "exact_dedup": exact,
        "near_dedup": deduped,
        "decontaminated": clean,
        "source_capped": capped,
    }
    counts = {name: df.count() for name, df in stages.items()}
    # hot-bucket accounting: what the cap routed away from the pair
    # generator (count + worst offender; the full (band, bh, n) frame
    # is `hot` if an operator wants to mine the clusters)
    hot_rows = hot.agg(
        F.count(F.lit(1)).alias("n"), F.max("n_members").alias("mx")
    ).first()
    counts["hot_buckets_dropped"] = int(hot_rows["n"] or 0)
    counts["hot_bucket_max_members"] = int(hot_rows["mx"] or 0)
    counts["pii_hits"] = int(
        scrubbed.agg(
            F.sum(F.col("n_email") + F.col("n_ipv4") + F.col("n_phone"))
        ).first()[0]
        or 0
    )
    counts["embed_chunks"] = chunks.count()
    mix_row = mix.agg(
        F.count(F.lit(1)).alias("n_sources"),
        F.max("mix_weight").alias("mx"),
        F.min("mix_weight").alias("mn"),
    ).first()
    counts["mix_n_sources"] = int(mix_row["n_sources"] or 0)
    counts["mix_weight_max"] = round(float(mix_row["mx"] or 0.0), 4)
    counts["mix_weight_min"] = round(float(mix_row["mn"] or 0.0), 4)
    if apply_temperature_mix:
        counts["mixture_docs"] = mixed.count()
    final = vt.read_version(spark, f"{out_root}/corpus")
    counts["packed_rows"] = final.count()
    counts["n_packs"] = final.select("shard", "pack_id").distinct().count()
    counts["corpus_version"] = version

    # loader schedule (r13): token-balanced snake shards over the
    # SURVIVING docs — the placement any trainer/loader re-derives
    # deterministically (deterministic_shard_assignment's frame; the
    # epoch visit order is then rank of hash60(epoch#doc_id) within
    # each shard, computed not stored — epoch_shuffle_plan)
    from lab3_lakehouse_spark.queries.corpus import _snake_shard_frame

    shard_tokens = [
        int(r["t"])
        for r in _snake_shard_frame(capped)
        .groupBy("shard")
        .agg(F.sum("n_tokens").alias("t"))
        .collect()
    ]
    counts["loader_shards"] = len(shard_tokens)
    counts["loader_token_imbalance"] = round(
        max(shard_tokens) / max(1, min(shard_tokens)), 4
    )

    # tokenizer design probe (r14): what a 1k-word vocabulary buys on
    # the SURVIVING corpus — the vocab_coverage_curve collapse + the
    # two-phase bucketed rank, run where a tokenizer would actually be
    # trained (after dedup/decontamination, not on the raw crawl)
    from lab3_lakehouse_spark.operators import windows as win_ops

    wc = (
        capped.select(F.explode(F.split(F.col("text"), r"\s+")).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    rk = win_ops.global_row_number(
        wc, metric="c", tie_breakers=("w",), rank_col="r", ascending=False
    )
    cov = rk.agg(
        F.sum(
            F.when(F.col("r") <= 1000, F.col("c")).otherwise(F.lit(0))
        ).alias("cov"),
        F.sum("c").alias("tot"),
        F.count(F.lit(1)).alias("v"),
    ).first()
    counts["vocab_total"] = int(cov["v"] or 0)
    counts["vocab_top1000_coverage"] = round(
        float(cov["cov"] or 0) / float(cov["tot"] or 1), 4
    )
    return counts


def main() -> None:
    from lab3_lakehouse_spark.session import build_session

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp("llm_corpus")
    spark = build_session(app_name="llm-corpus-pipeline")
    try:
        print(run_corpus_pipeline(spark, sf_dir, out))
    finally:
        if len(sys.argv) <= 2:
            shutil.rmtree(out, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
