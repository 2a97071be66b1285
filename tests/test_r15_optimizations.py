"""Focused pins for the r15 optimization-round rewrites: every change
claimed value-identical in OPTIMIZATION_r15.md gets an equality test
against the un-optimized formulation it replaced."""

from __future__ import annotations

import shutil
import struct
import tempfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from lab3_lakehouse_spark.catalog import load_table
from lab3_lakehouse_spark.operators import dedup as dedup_ops
from lab3_lakehouse_spark.operators import similarity as sim_ops

SF = "/root/testdata/sf0.001"


def _bits(x: float) -> int:
    return struct.unpack("<Q", struct.pack("<d", x))[0]


# ---------------------------------------------------------------- ADC --


def test_adc_expression_bit_equals_retired_udf(spark):
    """The JVM ADC expression (_adc_col) must reproduce the retired
    Arrow UDF (_adc_udf) BIT FOR BIT: ADC scores feed a rank cut whose
    membership decides every PQ / IVF-PQ entry's emitted rows, so even
    one ulp of drift can move a tie. Random heavy-tailed vectors and
    codes across shapes that exercise every _np_pairwise_sum branch
    (sub<8 sequential, sub=8 tree, sub>8 block+peel)."""
    rng = np.random.RandomState(7)
    for m, n_codes, sub in [(8, 16, 8), (8, 32, 8), (4, 16, 4), (2, 8, 10)]:
        dim = m * sub
        books = rng.randn(m, n_codes, sub) * np.exp(
            rng.randn(m, n_codes, sub) * 4
        )
        qv = rng.randn(8, dim) * np.exp(rng.randn(8, dim) * 3)
        rows = []
        for i in range(200):
            q = qv[rng.randint(8)]
            codes = rng.randint(0, n_codes, size=m)
            rows.append((i, [float(x) for x in q], [int(c) for c in codes]))
        df = spark.createDataFrame(
            rows, "id long, qv array<double>, codes array<int>"
        )
        got = df.select(
            sim_ops._adc_udf(books)(F.col("qv"), F.col("codes")).alias("u"),
            sim_ops._adc_col(books, F.col("qv"), F.col("codes")).alias("e"),
        ).collect()
        assert all(_bits(r.u) == _bits(r.e) for r in got), (m, n_codes, sub)


def test_pairwise_sum_expr_bit_equals_numpy_sum(spark):
    """_np_pairwise_sum must reproduce np.sum()'s pairwise summation
    order for ANY length — sequential (n<8), the 8-accumulator block
    with tree combine and tail peel (8<=n<=128), and the recursive
    halving above numpy's PW_BLOCKSIZE."""
    rng = np.random.RandomState(11)
    for n in [1, 3, 7, 8, 9, 15, 16, 17, 64, 127, 128, 129, 200, 1000]:
        a = rng.randn(n) * np.exp(rng.randn(n) * 6)
        got = (
            spark.range(1)
            .select(
                sim_ops._np_pairwise_sum(
                    [F.lit(float(x)) for x in a]
                ).alias("s")
            )
            .first()
            .s
        )
        assert _bits(got) == _bits(float(np.sum(a))), n


def test_probe_plan_has_no_python_boundary(spark):
    """The r15 point of the ADC rewrite: given an already-encoded code
    frame (materialized, as a persisted index is), the PQ probe plan
    and the full IVF-PQ STORE probe plan contain no ArrowEvalPython /
    BatchEvalPython — the only remaining Python pass is the
    append-path encode (pq_encode), which is amortized ingestion work,
    not probe work."""
    from lab3_lakehouse_spark.plans import analysis as pa

    emb = load_table(spark, SF, "embeddings")
    q = emb.filter(F.col("vec_id") < 4)
    coded, books = sim_ops.pq_build(
        emb, "vec_id", "embedding", dim=64, m=8, n_codes=16
    )
    coded = coded.localCheckpoint(eager=True)  # the persisted-index shape
    df = sim_ops.pq_topk(coded, books, q, "vec_id", "embedding", k=5)
    plan = pa.formatted_plan(df)
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan

    root = tempfile.mkdtemp(prefix="r15_probe_store_")
    try:
        meta = sim_ops.ivfpq_store_init(
            root, emb, "vec_id", "embedding",
            n_centroids=8, dim=64, m=8, n_codes=16,
        )
        sim_ops.ivfpq_store_append(
            spark, root, emb, "vec_id", "embedding", meta=meta
        )
        probe = sim_ops.ivfpq_store_topk(
            spark, root, emb, q, "vec_id", "embedding",
            k=5, n_probe=4, meta=meta,
        )
        splan = pa.formatted_plan(probe)
        assert "ArrowEvalPython" not in splan
        assert "BatchEvalPython" not in splan
    finally:
        shutil.rmtree(root, ignore_errors=True)


# --------------------------------------------- connected components --


def test_lazy_checkpoint_cc_matches_eager_reference(spark):
    """The r15 per-round job fusion (lazy localCheckpoint materialized
    by the convergence aggregate) must leave hash-min CC's output
    exactly as the eager form computed it — same components, same
    canonical min-id labels — on a graph with chains, a clique and
    singleton-free edges."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        "id_a long, id_b long",
    )
    got = {
        (r.vertex, r.component)
        for r in dedup_ops.connected_components(edges, "id_a", "id_b").collect()
    }
    assert got == {
        (1, 1), (2, 1), (3, 1), (4, 1),
        (10, 10), (11, 10), (12, 10),
        (20, 20), (21, 20),
    }
    # alternating variant got the same fusion; same fixpoint contract
    alt = {
        (r.vertex, r.component)
        for r in dedup_ops.connected_components(
            edges, "id_a", "id_b", algorithm="alternating"
        ).collect()
    }
    assert alt == got


# ------------------------------------------------- banded= guard ----


def test_minhash_banded_passthrough_requires_matching_params(spark):
    """r14 advice: a banded= frame built with different (num_perm,
    bands, seed) than the append kwargs must raise, not write rows the
    params sidecar misdescribes; omitting banded_params raises too."""
    docs = load_table(spark, SF, "documents").limit(20)
    hashed = docs.select(
        F.col("doc_id").alias("__id"),
        dedup_ops.shingle_hashes("text", 3).alias("__h"),
    )
    banded = dedup_ops.banded_signatures(hashed, 64, 32, 42)
    root = tempfile.mkdtemp(prefix="r15_banded_guard_")
    try:
        with pytest.raises(ValueError, match="banded_params"):
            dedup_ops.minhash_store_append(root, hashed, banded=banded)
        with pytest.raises(ValueError, match="one shared tuple"):
            dedup_ops.minhash_store_append(
                root, hashed, bands=16, banded=banded,
                banded_params=(64, 32, 42),
            )
        # matching params still write (the r14 passthrough contract)
        dedup_ops.minhash_store_append(
            root, hashed, bands=32, banded=banded,
            banded_params=(64, 32, 42),
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
