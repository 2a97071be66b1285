"""The composed LLM-corpus pipeline example must run end-to-end with
monotone stage shrinkage and a committed versioned output."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent / "examples"))


def test_corpus_pipeline_end_to_end(spark, sf_small, tmpdir):
    from llm_corpus_pipeline import run_corpus_pipeline

    from lab3_lakehouse_spark.sources import versioned as vt

    c = run_corpus_pipeline(spark, sf_small, str(tmpdir), seq_len=128)
    # each cleaning stage can only shrink the corpus
    assert c["input"] >= c["quality"] >= c["exact_dedup"] >= c["near_dedup"]
    # decontamination also removes the benchmark split itself
    assert c["near_dedup"] > c["decontaminated"] >= 1
    assert c["packed_rows"] == c["decontaminated"]
    assert c["pii_hits"] == 0  # synthetic corpus carries no organic PII
    # every surviving doc yields at least one embedding chunk
    assert c["embed_chunks"] >= c["decontaminated"]
    assert 1 <= c["n_packs"] <= c["packed_rows"]
    assert vt.history(spark, f"{tmpdir}/corpus") == [c["corpus_version"]]
    # rerun publishes a NEW snapshot with identical content (determinism)
    c2 = run_corpus_pipeline(spark, sf_small, str(tmpdir), seq_len=128)
    assert c2["packed_rows"] == c["packed_rows"]
    assert c2["corpus_version"] == c["corpus_version"] + 1
    a = vt.read_version(spark, f"{tmpdir}/corpus", version=c["corpus_version"])
    b = vt.read_version(spark, f"{tmpdir}/corpus", version=c2["corpus_version"])
    key = ["doc_id", "shard", "pack_id", "start_offset"]
    assert a.select(*key).subtract(b.select(*key)).count() == 0
    assert b.select(*key).subtract(a.select(*key)).count() == 0


def test_corpus_pipeline_source_quota_cap(spark, sf_small, tmpdir):
    from llm_corpus_pipeline import run_corpus_pipeline

    c = run_corpus_pipeline(
        spark, sf_small, str(tmpdir), seq_len=128, max_docs_per_source=1
    )
    # 20 sources in the corpus → at most 20 docs survive the cap
    assert c["source_capped"] <= 20
    assert c["source_capped"] < c["decontaminated"]
    assert c["packed_rows"] == c["source_capped"]
    # rerun is deterministic (md5 pick order, not rand())
    c2 = run_corpus_pipeline(
        spark, sf_small, str(tmpdir), seq_len=128, max_docs_per_source=1
    )
    assert c2["source_capped"] == c["source_capped"]


def test_event_analytics_pipeline_end_to_end(spark, sf_small, tmpdir):
    from event_analytics_pipeline import run_event_analytics

    c = run_event_analytics(spark, sf_small, str(tmpdir))
    assert c["debounced"] <= c["input"]
    assert c["funnel"] == 1
    assert 1 <= c["transitions"] <= 25  # at most |types|^2 cells
    assert c["retention"] >= 1
    # daily activity is a full zero-filled grid: days x types
    assert c["daily_activity"] % 1 == 0 and c["daily_activity"] >= c["retention"]
    assert c["anomalies"] <= 5 * 5  # top-5 per series
    # determinism: identical rerun counts
    c2 = run_event_analytics(spark, sf_small, str(tmpdir))
    assert c2 == c


def test_incremental_ingest_pipeline_end_to_end(spark, sf_medium, tmpdir):
    from incremental_ingest_pipeline import run_incremental_ingest

    from lab3_lakehouse_spark.sources import versioned as vt

    c = run_incremental_ingest(spark, sf_medium, str(tmpdir))
    # bookkeeping identities
    assert c["delta_survivors"] == c["delta_after_exact"] - c["delta_near_dups"]
    assert c["corpus_v2"] == c["corpus_v1"] + c["delta_survivors"]
    assert c["v2"] == c["v1"] + 1
    # the sf0.01 corpus plants cross-split near-dups — the store must
    # catch them (incremental_near_dup_new_docs finds 14 pairs there)
    assert c["delta_near_dups"] >= 1
    # v1 snapshot is immutable: re-reading it still gives the old count
    assert vt.read_version(spark, f"{tmpdir}/corpus", version=c["v1"]).count() == c["corpus_v1"]
