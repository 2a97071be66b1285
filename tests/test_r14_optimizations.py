"""Focused pins for the r14 optimization-round rewrites: every change
claimed value-identical in OPTIMIZATION_r14.md gets an equality test
against the un-optimized formulation it replaced."""

from __future__ import annotations

import shutil
import tempfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from lab3_lakehouse_spark.catalog import load_table
from lab3_lakehouse_spark.functions.vector import cosine_similarity
from lab3_lakehouse_spark.operators import similarity as sim_ops

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF, "embeddings")


def test_store_init_returns_exactly_what_load_meta_reads_back(spark, emb):
    """Meta threading (ivfpq_store_append/topk ``meta=``) rests on one
    assumption: the (cents, books) ivfpq_store_init returns are
    bit-identical to re-loading the tiers it just wrote — float64
    round-trips parquet exactly."""
    root = tempfile.mkdtemp(prefix="r14_meta_roundtrip_")
    try:
        fit = sim_ops.ivfpq_store_init(
            root, emb, "vec_id", "embedding",
            n_centroids=8, dim=64, m=8, n_codes=16,
        )
        cents, books = sim_ops.ivfpq_load_meta(spark, root)
        assert fit[0] == cents
        assert np.array_equal(fit[1], books)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_shared_fit_sample_matches_per_fit_collects(spark, emb):
    """ivfpq_store_init now collects the (crc32(id), id)-ordered fit
    sample ONCE for both quantizer fits; the fused fits must equal
    running each legacy fit (own sample collect) separately."""
    cents_legacy = sim_ops._fit_centroids_sample(
        emb, "vec_id", "embedding", n_centroids=8, seed=42
    )
    books_legacy = sim_ops._pq_fit_codebooks(
        emb, "vec_id", "embedding", dim=64, m=8, n_codes=16, seed=42
    )
    X = sim_ops._fit_sample_matrix(emb, "vec_id", "embedding")
    assert cents_legacy == sim_ops._lloyd_centroids_from_matrix(
        X, n_centroids=8, seed=42
    )
    assert np.array_equal(
        books_legacy,
        sim_ops._pq_codebooks_from_matrix(X, m=8, sub=8, n_codes=16, seed=42),
    )


def test_hoisted_cosine_equals_naive_per_pair_cosine(spark, emb):
    """cosine_pairs_blocked pre-casts and pre-computes norms per
    vector; the emitted cosine must be bit-identical to the naive
    per-pair cosine_similarity it replaced (same folds, same tree,
    fewer evaluations)."""
    pairs = sim_ops.cosine_pairs_blocked(
        emb, "vec_id", "embedding", "label", threshold=0.0
    ).select("id_a", "id_b", "cosine")
    a = emb.select(
        F.col("label").alias("__blk"),
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("__va"),
    )
    b = emb.select(
        F.col("label").alias("__blk"),
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("__vb"),
    )
    naive = (
        a.join(b, on="__blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            cosine_similarity(F.col("__va"), F.col("__vb")).alias("cosine"),
        )
        .filter(F.col("cosine") >= 0.0)  # the operator's threshold cut
    )
    # exact (bitwise) equality: exceptAll in both directions on the
    # raw double — any last-ulp drift would surface as a residue row
    assert pairs.exceptAll(naive).count() == 0
    assert naive.exceptAll(pairs).count() == 0


def test_nested_transform_assign_matches_unrolled_reference(spark, emb):
    """kmeans_assign_portable's one-transform assignment must pick the
    same cluster per row as the r13 per-centroid-unrolled HOF chain —
    including non-contiguous centroid ids (empty-cluster shape)."""
    from pyspark.sql import Column

    cents = [
        (0, [0.1] * 64),
        (3, [-0.2] * 64),   # deliberately non-contiguous ids
        (7, [0.05] * 32 + [-0.05] * 32),
    ]

    def d2_unrolled(cent: list[float]) -> Column:
        c = F.array(*[F.lit(float(x)) for x in cent])
        diff2 = F.zip_with(
            F.col("__vd"), c, lambda x, y: (x - y) * (x - y)
        )
        return F.aggregate(diff2, F.lit(0.0), lambda acc, x: acc + x)

    unrolled = F.array_min(
        F.array(
            *[
                F.struct(
                    d2_unrolled(c).alias("d"),
                    F.lit(cid).cast("bigint").alias("c"),
                )
                for cid, c in cents
            ]
        )
    )["c"]

    ids = F.lit([int(cid) for cid, _ in cents])
    vecs = F.lit([[float(x) for x in c] for _, c in cents])
    nested = F.array_min(
        F.transform(
            vecs,
            lambda c, i: F.struct(
                F.aggregate(
                    F.zip_with(
                        F.col("__vd"), c, lambda x, y: (x - y) * (x - y)
                    ),
                    F.lit(0.0),
                    lambda a, x: a + x,
                ).alias("d"),
                F.element_at(ids, i + F.lit(1)).cast("bigint").alias("c"),
            ),
        )
    )["c"]

    with_vd = emb.withColumn("__vd", F.col("embedding").cast("array<double>"))
    diff = with_vd.select(
        "vec_id", unrolled.alias("u"), nested.alias("n")
    ).filter(F.col("u") != F.col("n"))
    assert diff.count() == 0
    picked = {
        r["n"] for r in with_vd.select(nested.alias("n")).distinct().collect()
    }
    assert picked <= {0, 3, 7}  # explicit ids, not array positions


def test_banded_passthrough_writes_identical_bands_tier(spark):
    """minhash_store_append(banded=...) must write exactly the rows the
    internal banding would have written."""
    from lab3_lakehouse_spark import stores
    from lab3_lakehouse_spark.operators import dedup as dedup_ops

    docs = load_table(spark, SF, "documents").limit(50)
    hashed = docs.select(
        F.col("doc_id").alias("__id"),
        dedup_ops.shingle_hashes("text", 3).alias("__h"),
    ).localCheckpoint(eager=True)
    r1 = tempfile.mkdtemp(prefix="r14_bands_internal_")
    r2 = tempfile.mkdtemp(prefix="r14_bands_passthru_")
    try:
        dedup_ops.minhash_store_append(r1, hashed)
        banded = dedup_ops.banded_signatures(hashed).localCheckpoint(
            eager=False
        )
        dedup_ops.minhash_store_append(
            r2, hashed, banded=banded, banded_params=(64, 16, 42)
        )
        t1 = stores.read_tier(spark, r1, "bands")
        t2 = stores.read_tier(spark, r2, "bands")
        assert t1.exceptAll(t2).count() == 0
        assert t2.exceptAll(t1).count() == 0
    finally:
        shutil.rmtree(r1, ignore_errors=True)
        shutil.rmtree(r2, ignore_errors=True)


def test_store_probe_with_and_without_meta_identical(spark, emb):
    """ivfpq_store_topk(meta=...) must return row-identical results to
    the load-from-tier path (the ann_store_ivfpq_topk entries thread
    the fit through; the driver contract depends on equality)."""
    root = tempfile.mkdtemp(prefix="r14_probe_meta_")
    try:
        fit = sim_ops.ivfpq_store_init(
            root, emb, "vec_id", "embedding",
            n_centroids=8, dim=64, m=8, n_codes=16,
        )
        sim_ops.ivfpq_store_append(
            spark, root, emb, "vec_id", "embedding", meta=fit
        )
        q = emb.filter(F.col("vec_id") < 4)
        with_meta = sim_ops.ivfpq_store_topk(
            spark, root, emb, q, "vec_id", "embedding",
            k=5, n_probe=4, rerank=50, meta=fit,
        )
        without = sim_ops.ivfpq_store_topk(
            spark, root, emb, q, "vec_id", "embedding",
            k=5, n_probe=4, rerank=50,
        )
        assert with_meta.exceptAll(without).count() == 0
        assert without.exceptAll(with_meta).count() == 0
    finally:
        shutil.rmtree(root, ignore_errors=True)
