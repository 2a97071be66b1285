"""Edge-case unit tests for the round-3 operator additions (chunking,
interval overlap, profiling, imputation, quantization, semantic dedup,
fuzzy matching) — the boundary behaviors the corpus-level oracle
differentials exercise only statistically.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from lab3_lakehouse_spark.operators.dedup import edit_distance_pairs
from lab3_lakehouse_spark.operators.joins import interval_overlap_join
from lab3_lakehouse_spark.operators.profiling import profile_columns
from lab3_lakehouse_spark.operators.quality import impute_group_mean
from lab3_lakehouse_spark.operators.similarity import semantic_dedup
from lab3_lakehouse_spark.operators.text import chunk_token_windows


def test_chunking_short_doc_single_whole_chunk(spark):
    df = spark.createDataFrame([Row(id=1, text="alpha beta gamma")])
    out = chunk_token_windows(df, "text", n_tokens=8, stride=4).collect()
    assert len(out) == 1
    assert out[0]["chunk"] == "alpha beta gamma"
    assert out[0]["chunk_idx"] == 0 and out[0]["n_chunk_tokens"] == 3


def test_chunking_boundary_counts(spark):
    words = " ".join(f"w{i}" for i in range(8))
    df = spark.createDataFrame([Row(id=1, text=words)])
    # len == n → exactly one chunk
    assert chunk_token_windows(df, "text", 8, 4).count() == 1
    # len == n+1 → a second, shorter chunk starting at the stride
    out = chunk_token_windows(
        spark.createDataFrame([Row(id=1, text=words + " w8")]), "text", 8, 4
    ).orderBy("chunk_idx").collect()
    assert [r["n_chunk_tokens"] for r in out] == [8, 5]
    assert out[1]["chunk"].split() == ["w4", "w5", "w6", "w7", "w8"]


def test_interval_overlap_exact_touch_and_multibin_dedup(spark):
    a = spark.createDataFrame(
        [Row(k=1, s="2024-01-01 00:00:00", e="2024-01-01 01:00:00")]
    ).select("k", F.col("s").cast("timestamp"), F.col("e").cast("timestamp"))
    # touches exactly at a's end (closed intervals → 0-second overlap);
    # b spans many 600s bins — the pair must still appear exactly once
    b = spark.createDataFrame(
        [Row(k=1, s="2024-01-01 01:00:00", e="2024-01-01 03:00:00"),
         Row(k=1, s="2024-01-01 05:00:00", e="2024-01-01 06:00:00")]
    ).select("k", F.col("s").cast("timestamp"), F.col("e").cast("timestamp"))
    a = a.toDF("k", "a_s", "a_e")
    b = b.toDF("k", "b_s", "b_e")
    out = interval_overlap_join(
        a, b, ["k"], "a_s", "a_e", "b_s", "b_e", bin_seconds=600
    ).collect()
    assert len(out) == 1  # only the touching pair; emitted once


def test_profile_columns_approx_shape_and_accuracy(spark):
    df = spark.range(1000).selectExpr(
        "id", "CAST(id % 13 AS DOUBLE) AS v",
        "CASE WHEN id % 10 = 0 THEN NULL ELSE 'x' END AS s",
    )
    rows = {r["column"]: r for r in profile_columns(df, approx=True).collect()}
    assert rows["s"]["n_nulls"] == 100 and rows["s"]["min_value"] is None
    assert rows["v"]["min_value"] == 0.0 and rows["v"]["max_value"] == 12.0
    # HLL estimate of 13 distinct values is exact at this cardinality
    assert abs(rows["v"]["n_distinct"] - 13) <= 1


def test_impute_group_mean_all_null_group_stays_null(spark):
    df = spark.createDataFrame(
        [Row(g="a", v=2.0), Row(g="a", v=None), Row(g="b", v=None)]
    )
    rows = {(r["g"], r["v"]): r for r in impute_group_mean(df, "v", ["g"]).collect()}
    assert rows[("a", None)]["v_imputed"] == 2.0
    assert rows[("a", None)]["was_imputed"] is True
    assert rows[("b", None)]["v_imputed"] is None  # no donor values
    assert rows[("a", 2.0)]["was_imputed"] is False


def test_edit_distance_pairs_blocked_and_thresholded(spark):
    df = spark.createDataFrame([
        Row(id=1, name="red widget", blk="A"),
        Row(id=2, name="red widgit", blk="A"),   # dist 1 → pair
        Row(id=3, name="blue bolt", blk="A"),    # far → no pair
        Row(id=4, name="red widget", blk="B"),   # other block → never paired
    ])
    out = edit_distance_pairs(df, "id", "name", "blk", max_dist=2).collect()
    assert [(r["id_a"], r["id_b"], r["edit_dist"]) for r in out] == [(1, 2, 1)]


def test_semantic_dedup_flags_lowest_id_keeper(spark):
    df = spark.createDataFrame([
        Row(id=10, vec=[1.0, 0.0], blk=1),
        Row(id=11, vec=[1.0, 0.001], blk=1),   # ~identical → dup of 10
        Row(id=12, vec=[0.0, 1.0], blk=1),     # orthogonal → keeper
        Row(id=13, vec=[1.0, 0.0], blk=2),     # same vec, other block → keeper
    ])
    rows = {r["id"]: r for r in semantic_dedup(df, "id", "vec", "blk", 0.9).collect()}
    assert rows[11]["is_dup"] and rows[11]["dup_of"] == 10
    assert not rows[10]["is_dup"] and not rows[12]["is_dup"] and not rows[13]["is_dup"]


def test_kmeans_assign_portable_recovers_planted_clusters(spark):
    """Two tight planted clusters in 4-d: the portable assigner must
    (a) put every point with its own group, (b) label clusters by
    seed order (seeds = lowest ids), and (c) be invariant to
    partitioning/scan order — the property the SQL oracle relies on."""
    import numpy as np

    from lab3_lakehouse_spark.operators.similarity import (
        kmeans_assign_portable,
    )

    rng = np.random.RandomState(3)
    rows = []
    for i in range(40):
        base = [5.0] * 4 if i % 2 == 0 else [-5.0] * 4
        rows.append((i, (np.array(base) + rng.normal(0, 0.1, 4)).tolist()))
    df = spark.createDataFrame(rows, ["id", "vec"])
    out = {
        r["id"]: r["cluster"]
        for r in kmeans_assign_portable(df, "id", "vec", dim=4, k=2).collect()
    }
    # id 0 (even → +5 group) seeds cluster 0, id 1 seeds cluster 1
    assert all(out[i] == i % 2 for i in range(40)), out
    shuffled = df.repartition(7, "vec").sortWithinPartitions(F.col("id").desc())
    out2 = {
        r["id"]: r["cluster"]
        for r in kmeans_assign_portable(
            shuffled, "id", "vec", dim=4, k=2
        ).collect()
    }
    assert out == out2


def test_semantic_dedup_clustered_flags_within_cluster_only(spark):
    """SemDeDup end-to-end on planted data: near-identical vectors in
    the same k-means cell are flagged against the lowest-id keeper;
    an equally-near pair SPLIT across cells is not (the documented
    recall trade the cluster pruning makes)."""
    import numpy as np

    from lab3_lakehouse_spark.operators.similarity import (
        kmeans_assign_portable,
        semantic_dedup,
    )

    rng = np.random.RandomState(9)
    rows = []
    for i in range(30):
        base = [8.0, 0.0, 0.0, 0.0] if i % 2 == 0 else [0.0, 8.0, 0.0, 0.0]
        rows.append((i, (np.array(base) + rng.normal(0, 0.05, 4)).tolist()))
    df = spark.createDataFrame(rows, ["id", "vec"])
    assigned = kmeans_assign_portable(df, "id", "vec", dim=4, k=2)
    out = {
        r["id"]: r
        for r in semantic_dedup(
            assigned, "id", "vec", "cluster", threshold=0.99
        ).collect()
    }
    assert len(out) == 30
    # every even id > 0 dups onto keeper 0; every odd id > 1 onto 1
    assert not out[0]["is_dup"] and not out[1]["is_dup"]
    for i in range(2, 30):
        assert out[i]["is_dup"] and out[i]["dup_of"] == i % 2, out[i]
    # cross-cluster pairs were never compared: clusters differ
    assert out[0]["cluster"] != out[1]["cluster"]


def test_quantize_int8_roundtrip_error_bound(spark):
    from lab3_lakehouse_spark.functions.vector import dequantize, quantize_int8

    df = spark.createDataFrame([Row(vec=[0.5, -1.0, 0.25, 0.0])])
    r = df.select(
        quantize_int8("vec").alias("q"), F.col("vec").cast("array<double>").alias("v")
    ).select(
        F.col("q.scale").alias("scale"),
        F.col("q.q").alias("codes"),
        F.zip_with(
            dequantize(F.col("q")), F.col("v"), lambda d, x: F.abs(x - d)
        ).alias("err"),
    ).first()
    assert r["scale"] == pytest.approx(1.0 / 127.0)
    assert max(abs(c) for c in r["codes"]) == 127
    assert all(e <= r["scale"] / 2 + 1e-12 for e in r["err"])


def test_corpus_quality_gate_one_pass_plan_and_attribution(spark):
    """The composed gate reads the documents parquet at most TWICE
    (scan-side signal pass + shared token pipeline) — per-rule
    re-scanning would show >= 4 scans. Flags must agree with the
    stand-alone per-rule computations on the same rows."""
    from lab3_lakehouse_spark.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    df = QUERIES["corpus_quality_gate"](spark, sf)
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_scans = plan.count("documents.parquet")
    assert 1 <= n_scans <= 2, f"expected <=2 documents scans, saw {n_scans}"

    rows = {r["doc_id"]: r for r in df.collect()}
    assert rows  # non-degenerate
    for r in rows.values():
        assert r["keep"] == (
            r["pass_repetition"] and r["pass_rare"]
            and r["pass_surprisal"] and r["pass_lang"]
        )
    # spot-check one rule against its stand-alone catalog query
    rep = {r["doc_id"]: r for r in
           QUERIES["gopher_repetition_rules"](spark, sf).collect()}
    for doc_id, r in rows.items():
        g = rep[doc_id]
        expect = (
            g["top_token_ratio"] <= 0.2
            and (g["dup_bigram_fraction"] is None or g["dup_bigram_fraction"] <= 0.1)
            and (g["dup_trigram_fraction"] is None or g["dup_trigram_fraction"] <= 0.1)
        )
        assert r["pass_repetition"] == expect, doc_id


def test_token_budget_waterfill_cascading_caps(spark, tmp_path):
    """Planted skew where the waterfill must cap a 3-source PREFIX
    before the level settles (the prefix-AND self-consistency the
    closed form relies on): sources of 10/10/100/1000 tokens, budget
    9T/5 = 2016, cap 2 epochs → the three small sources saturate at
    2 epochs each and the big one absorbs the rest exactly."""
    from lab3_lakehouse_spark.queries import QUERIES

    rows = []
    for src, n_tok in [("a", 10), ("b", 10), ("c", 100), ("d", 1000)]:
        text = " ".join(f"w{i}" for i in range(n_tok))
        rows.append((hash(src) % 1000, "en", len(text), text, src))
    spark.createDataFrame(
        rows, ["doc_id", "lang", "n_chars", "text", "source"]
    ).write.parquet(str(tmp_path / "documents.parquet"))
    out = {
        r.source: r
        for r in QUERIES["token_budget_epoch_allocation"](
            spark, str(tmp_path)
        ).collect()
    }
    assert out["a"].budget == 2016
    assert out["a"].capped and out["b"].capped and out["c"].capped
    assert not out["d"].capped
    assert (out["a"].alloc_tokens, out["b"].alloc_tokens) == (20.0, 20.0)
    assert out["c"].alloc_tokens == 200.0
    assert out["d"].alloc_tokens == 1776.0  # (2016 - 240) / 1
    assert out["a"].epochs == 2.0 and out["d"].epochs == 1.776
    # budget exactly conserved
    assert sum(r.alloc_tokens for r in out.values()) == 2016.0


def test_snake_shard_assignment_balances_and_is_deterministic(spark):
    """deterministic_shard_assignment: the snake draft over the global
    token-count rank must (a) give every shard the same doc count ±1,
    (b) keep shard token totals within one max-document of each other
    on this skewed corpus, (c) be a pure function of the data (two
    evaluations agree row for row), and (d) cover every doc exactly
    once."""
    import random

    from lab3_lakehouse_spark.queries.corpus import (
        _N_SHARDS,
        deterministic_shard_assignment,
    )

    rng = random.Random(11)
    rows = [
        Row(doc_id=i, text=" ".join("w" for _ in range(rng.randint(1, 400))))
        for i in range(173)
    ]
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(rows).write.parquet(f"{d}/documents.parquet")
        out1 = {
            r.doc_id: (r.n_tokens, r.shard, r.shard_total_tokens)
            for r in deterministic_shard_assignment(spark, d).collect()
        }
        out2 = {
            r.doc_id: (r.n_tokens, r.shard, r.shard_total_tokens)
            for r in deterministic_shard_assignment(spark, d).collect()
        }
    assert out1 == out2  # pure function of the corpus
    assert sorted(out1) == list(range(173))  # every doc exactly once
    from collections import Counter

    per_shard_docs = Counter(s for _, s, _ in out1.values())
    assert len(per_shard_docs) == _N_SHARDS
    assert max(per_shard_docs.values()) - min(per_shard_docs.values()) <= 1
    totals = {}
    for n, s, tot in out1.values():
        totals.setdefault(s, 0)
        totals[s] += n
    # the emitted shard_total_tokens column agrees with recomputation
    for n, s, tot in out1.values():
        assert totals[s] == tot
    max_doc = max(n for n, _, _ in out1.values())
    assert max(totals.values()) - min(totals.values()) <= max_doc


def test_semantic_decontamination_flags_planted_leak(spark):
    """A corpus vector that is a scaled copy of a benchmark vector
    (cosine 1.0 — the paraphrase/translation leak shape n-gram decon
    misses) must be flagged; an orthogonal vector must not; and the
    benchmark rows themselves never appear in the output."""
    import tempfile

    from lab3_lakehouse_spark.queries.corpus import semantic_decontamination

    dim = 64
    e0 = [1.0] + [0.0] * (dim - 1)
    e1 = [0.0, 1.0] + [0.0] * (dim - 2)
    rows = [
        Row(vec_id=0, embedding=e0, label=0),           # benchmark (0 % 25)
        Row(vec_id=1, embedding=[x * 3.0 for x in e0], label=0),  # leak
        Row(vec_id=2, embedding=e1, label=1),           # orthogonal: clean
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(rows).write.parquet(f"{d}/embeddings.parquet")
        out = {
            r.vec_id: (r.max_benchmark_cosine, r.contaminated)
            for r in semantic_decontamination(spark, d).collect()
        }
    assert set(out) == {1, 2}  # benchmark vec 0 excluded from output
    assert out[1] == (1.0, True)   # scaled copy: cosine exactly 1
    assert out[2] == (0.0, False)  # orthogonal: clean


def test_epoch_shuffle_plan_fresh_permutation_per_epoch(spark):
    """epoch_shuffle_plan: each (shard, epoch) position column must be
    a permutation of 1..|shard|, epochs must produce DIFFERENT orders
    (the epoch id is inside the hash), and the whole schedule must be
    reproducible (two evaluations identical)."""
    import random
    import tempfile

    from lab3_lakehouse_spark.queries.corpus import (
        _N_EPOCHS,
        epoch_shuffle_plan,
    )

    rng = random.Random(5)
    rows = [
        Row(doc_id=i, text=" ".join("w" for _ in range(rng.randint(1, 99))))
        for i in range(120)
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(rows).write.parquet(f"{d}/documents.parquet")
        out1 = sorted(
            (r.doc_id, r.shard, r.epoch, r.position)
            for r in epoch_shuffle_plan(spark, d).collect()
        )
        out2 = sorted(
            (r.doc_id, r.shard, r.epoch, r.position)
            for r in epoch_shuffle_plan(spark, d).collect()
        )
    assert out1 == out2  # reproducible without storing
    from collections import defaultdict

    per = defaultdict(dict)  # (shard, epoch) -> {position: doc}
    for doc, shard, epoch, pos in out1:
        per[(shard, epoch)][pos] = doc
    for (shard, epoch), d_ in per.items():
        assert sorted(d_) == list(range(1, len(d_) + 1))  # a permutation
    # same shard, different epochs -> different visit orders
    shards = {s for s, _ in per}
    differing = 0
    for s in shards:
        orders = [
            [per[(s, e)][p] for p in sorted(per[(s, e)])]
            for e in range(_N_EPOCHS)
        ]
        assert all(sorted(o) == sorted(orders[0]) for o in orders)  # same docs
        if len({tuple(o) for o in orders}) == _N_EPOCHS:
            differing += 1
    assert differing == len(shards)  # every shard reshuffles every epoch


def test_curriculum_phases_integer_formula_matches_ntile_semantics(spark):
    """curriculum_quality_phases: the explicit ((rank-1)k)//n + 1 cut
    must give front-loaded equal-count phases (sizes differ by at most
    one, larger first) and phase 1 must hold the highest scores."""
    import tempfile

    from lab3_lakehouse_spark.queries.corpus import curriculum_quality_phases

    # 10 docs with strictly decreasing stopword ratio ("the" density)
    rows = [
        Row(
            doc_id=i,
            text=" ".join(["the"] * (10 - i) + ["zzz"] * (i + 1)),
        )
        for i in range(10)
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(rows).write.parquet(f"{d}/documents.parquet")
        out = {
            r.doc_id: (r.phase, r.quality_score, r.phase_tokens)
            for r in curriculum_quality_phases(spark, d).collect()
        }
    phases = [out[i][0] for i in range(10)]
    # scores strictly decrease with doc_id, so phases are monotone and
    # front-loaded: 4, 3, 3
    assert phases == [1, 1, 1, 1, 2, 2, 2, 3, 3, 3]
    from collections import Counter

    sizes = Counter(phases)
    assert sizes[1] == 4 and sizes[2] == 3 and sizes[3] == 3


def test_streaming_semantic_decon_equals_batch(spark, sf_small):
    """Stream-equals-batch parity for the continuous decon gate: the
    drained 3-micro-batch stream must produce exactly the batch
    operator's verdict table (same max cosines, same flags), and every
    non-benchmark vector must appear exactly once."""
    from lab3_lakehouse_spark.queries.corpus import (
        semantic_decontamination,
        streaming_semantic_decontamination,
    )

    batch = sorted(
        tuple(r) for r in semantic_decontamination(spark, sf_small).collect()
    )
    streamed = sorted(
        tuple(r)
        for r in streaming_semantic_decontamination(
            spark, sf_small
        ).collect()
    )
    assert streamed == batch
    assert len({t[0] for t in streamed}) == len(streamed)


def test_packed_manifest_full_sequences_and_token_conservation(spark):
    """packed_batch_manifest: per (shard, epoch), (a) every sequence
    except the last is exactly full (concat-and-chop leaves no
    internal padding), (b) seq_ids are contiguous from 0, (c) the
    manifest's token total equals the shard's token total (nothing
    lost or double-counted across sequence boundaries), (d) position
    spans are ordered and non-degenerate, and (e) the manifest is a
    pure function of the corpus (two evaluations agree)."""
    import random
    import tempfile
    from collections import defaultdict

    from lab3_lakehouse_spark.queries.corpus import (
        _MANIFEST_SEQ_LEN,
        _N_EPOCHS,
        packed_batch_manifest,
    )

    rng = random.Random(23)
    rows = [
        Row(doc_id=i, text=" ".join("w" for _ in range(rng.randint(1, 400))))
        for i in range(151)
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(rows).write.parquet(f"{d}/documents.parquet")
        out1 = sorted(
            tuple(r) for r in packed_batch_manifest(spark, d).collect()
        )
        out2 = sorted(
            tuple(r) for r in packed_batch_manifest(spark, d).collect()
        )
    assert out1 == out2  # pure function of the corpus
    by_se = defaultdict(list)
    for shard, epoch, seq_id, n_docs, seq_tokens, fp, lp, fill in out1:
        by_se[(shard, epoch)].append((seq_id, n_docs, seq_tokens, fp, lp, fill))
        assert n_docs >= 1 and fp <= lp
        assert fill == math.floor(seq_tokens / _MANIFEST_SEQ_LEN * 10000.0 + 0.5) / 10000.0
    total_tokens = sum(len(r.text.split()) for r in rows)
    epochs_seen = {e for _, e in by_se}
    assert epochs_seen == set(range(_N_EPOCHS))
    grand = 0
    for (shard, epoch), seqs in by_se.items():
        seqs.sort()
        ids = [s[0] for s in seqs]
        assert ids == list(range(len(ids)))  # contiguous from 0
        for seq_id, _, seq_tokens, _, _, _ in seqs[:-1]:
            assert seq_tokens == _MANIFEST_SEQ_LEN, (shard, epoch, seq_id)
        assert 0 < seqs[-1][2] <= _MANIFEST_SEQ_LEN
        grand += sum(s[2] for s in seqs)
    # each epoch repacks the SAME corpus: total manifest tokens = E x corpus
    assert grand == total_tokens * _N_EPOCHS


def test_quality_classifier_agrees_with_sparkml_logreg(spark, sf_small):
    """The GD-trained classifier (the bit-replayable trajectory the
    oracle verifies) must agree with spark.ml's LogisticRegression on
    the SAME design matrix — keeping the MLlib surface honest without
    putting its non-replayable LBFGS float path inside the
    differential contract: (a) the GD iterate CONVERGES to the LBFGS
    coefficient direction (cosine >= 0.95 at 200 replica steps —
    same optimizer target, the entry's 16 steps are an early stop on
    the same trajectory), (b) the entry's emitted scores rank-agree
    with spark.ml's (Spearman >= 0.9), (c) both models' rank-sum AUC
    within 0.05 of each other."""
    import math as m

    import numpy as np

    from lab3_lakehouse_spark.catalog import load_table
    from lab3_lakehouse_spark.operators import text as text_ops
    from lab3_lakehouse_spark.queries.corpus import (
        _QC_STEPS,
        corpus_quality_gate,
        quality_classifier_curriculum,
    )

    entry = {
        r.doc_id: (r.model_score, r.model_auc)
        for r in quality_classifier_curriculum(spark, sf_small).collect()
    }

    # the same design matrix, rebuilt independently of the entry
    gate = corpus_quality_gate(spark, sf_small).select("doc_id", "keep")
    docs = load_table(spark, sf_small, "documents")
    t = F.col("text")
    n_tok = text_ops.token_count(t)
    lower_toks = F.split(F.lower(t), r"\s+")
    feats = docs.select(
        "doc_id",
        F.log(n_tok.cast("double")).alias("x1"),
        (
            (F.length(t).cast("double") - (n_tok - F.lit(1)).cast("double"))
            / n_tok.cast("double")
        ).alias("x2"),
        (text_ops.stopword_count(t).cast("double") / n_tok.cast("double")).alias("x3"),
        (
            F.size(F.array_distinct(lower_toks)).cast("double")
            / n_tok.cast("double")
        ).alias("x4"),
    ).join(gate, "doc_id")
    pdf = feats.toPandas().sort_values("doc_id").reset_index(drop=True)
    X = pdf[["x1", "x2", "x3", "x4"]].to_numpy()
    y = pdf["keep"].to_numpy().astype(float)
    Z = (X - X.mean(0)) / np.maximum(X.std(0), 1e-4)

    # GD replica (same recipe as the entry): the entry's step count for
    # the score comparison, a long run for the convergence-direction one
    D = np.column_stack([np.ones(len(Z)), Z])

    def gd(steps: int):
        b = np.zeros(5)
        for _ in range(steps):
            p = 1.0 / (1.0 + np.exp(-(D @ b)))
            b = b - D.T @ (p - y) / len(y)
        return b

    s_gd = D @ gd(_QC_STEPS)
    b_converged = gd(200)

    # spark.ml LogisticRegression on the identical standardized matrix
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.linalg import Vectors

    mldf = spark.createDataFrame(
        [(Vectors.dense(z.tolist()), float(lbl)) for z, lbl in zip(Z, y)],
        ["features", "label"],
    )
    lr = LogisticRegression(
        maxIter=100, regParam=0.0, standardization=False, featuresCol="features"
    )
    model = lr.fit(mldf)
    b_lr = np.array(model.coefficients.toArray())

    cos = float(
        b_converged[1:]
        @ b_lr
        / (np.linalg.norm(b_converged[1:]) * np.linalg.norm(b_lr))
    )
    assert cos >= 0.95, cos

    # rank agreement between the ENTRY's emitted scores and spark.ml's
    s_lr = np.array(
        [float(model.intercept) + float(z @ b_lr) for z in Z]
    )
    s_entry = np.array([entry[d][0] for d in pdf["doc_id"]])

    def spearman(a, b):
        ra = np.argsort(np.argsort(a)).astype(float)
        rb = np.argsort(np.argsort(b)).astype(float)
        ra -= ra.mean(); rb -= rb.mean()
        return float((ra @ rb) / m.sqrt((ra @ ra) * (rb @ rb)))

    assert spearman(s_entry, s_lr) >= 0.9
    assert spearman(s_gd, s_lr) >= 0.9

    def rank_auc(s):
        order = np.argsort(s, kind="stable")
        ranks = np.empty(len(s)); ranks[order] = np.arange(1, len(s) + 1)
        n1 = y.sum(); n0 = len(y) - n1
        return (ranks[y == 1].sum() - n1 * (n1 + 1) / 2) / (n1 * n0)

    auc_entry = entry[next(iter(entry))][1]
    assert abs(rank_auc(s_lr) - auc_entry) <= 0.05


# ------------------------------------ r14: n-gram novelty profile ----


def test_ngram_novelty_planted_first_occurrence(spark, tmp_path):
    """Planted corpus: first writer of a trigram owns it (smallest
    doc_id), exact copies score zero novelty, and partially-seen docs
    score the unseen fraction."""
    from pyspark.sql import Row

    from lab3_lakehouse_spark.queries.corpus import ngram_novelty_profile

    rows = [
        Row(doc_id=0, source="s0", text="x y z x y z"),   # 3 novel grams
        Row(doc_id=1, source="s0", text="x y z w"),       # 1 of 2 novel
        Row(doc_id=2, source="s1", text="x y z x y z"),   # exact copy
        Row(doc_id=3, source="s1", text="a b"),           # too short
    ]
    spark.createDataFrame(rows).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    out = {
        r.doc_id: (r.n_grams, r.n_novel, r.novelty_rate)
        for r in ngram_novelty_profile(spark, str(tmp_path)).collect()
    }
    # doc 0: grams {x y z, y z x, z x y} all first here
    assert out[0] == (3, 3, 1.0)
    # doc 1: {x y z (seen), y z w (new)}
    assert out[1] == (2, 1, 0.5)
    # doc 2: exact copy of doc 0 -> zero novelty
    assert out[2] == (3, 0, 0.0)
    # doc 3: shorter than the gram width -> no row at all
    assert 3 not in out


def test_ngram_novelty_single_scan_no_gram_join(spark, sf_small):
    """Plan pin: one scan of the documents parquet, and the wide gram
    frame is aggregated (never joined) — the only joins in the plan are
    the skinny doc-keyed assembly."""
    from lab3_lakehouse_spark.queries.corpus import ngram_novelty_profile

    df = ngram_novelty_profile(spark, sf_small)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("documents.parquet") == 1
    total = df.agg(
        F.sum("n_novel").alias("nv"), F.sum("n_grams").alias("ng")
    ).collect()[0]
    # every gram has exactly one first occurrence; novel <= grams
    assert 0 < total["nv"] <= total["ng"]


# ------------------------------- r14: cluster-balanced sampling ----


def test_cluster_balanced_sample_preserves_tail_mode(spark, tmp_path):
    """Planted two-mode geometry: a 100-vector dominant mode and a
    5-vector tail mode far away (tail holds the lowest ids, so it owns
    seed centroids). The balanced sample must keep EVERY tail vector
    while quota-capping the dominant mode — the whole point of
    stratifying on content: a uniform draw of the same size would keep
    the modes' 20:1 imbalance."""
    import random

    from pyspark.sql import Row

    from lab3_lakehouse_spark.queries.corpus import (
        _CBS_QUOTA,
        cluster_balanced_sample,
    )

    rng = random.Random(5)
    rows = []
    for i in range(5):  # tail mode: ids 0-4 near +e0
        v = [0.0] * 64
        v[0] = 10.0 + rng.uniform(-0.1, 0.1)
        v[1] = rng.uniform(-0.1, 0.1)
        rows.append(Row(vec_id=i, embedding=v, label=1))
    for i in range(5, 105):  # dominant mode: ids 5-104 near -e2
        v = [0.0] * 64
        v[2] = -10.0 + rng.uniform(-0.5, 0.5)
        v[3] = rng.uniform(-0.5, 0.5)
        rows.append(Row(vec_id=i, embedding=v, label=0))
    spark.createDataFrame(rows).write.parquet(
        str(tmp_path / "embeddings.parquet")
    )
    out = cluster_balanced_sample(spark, str(tmp_path)).collect()
    sampled = {r.vec_id for r in out}
    # every tail vector survives
    assert {0, 1, 2, 3, 4} <= sampled
    # the dominant mode is quota-capped, not carried wholesale
    dominant = [r for r in out if r.vec_id >= 5]
    assert 0 < len(dominant) < 100
    # per-cluster realized take == min(cell_size, quota), and the
    # emitted audit columns agree with recomputation
    from collections import Counter

    per_cluster = Counter(r.cluster for r in out)
    for r in out:
        assert r.cell_take == min(r.cell_size, _CBS_QUOTA)
        assert per_cluster[r.cluster] == r.cell_take
        assert 1 <= r.pick_rank <= _CBS_QUOTA
    # deterministic: identical on rerun
    out2 = cluster_balanced_sample(spark, str(tmp_path)).collect()
    assert sorted((r.vec_id, r.pick_rank) for r in out2) == sorted(
        (r.vec_id, r.pick_rank) for r in out
    )


# --------------------------------- r14: vocab coverage curve ----


def test_vocab_coverage_curve_matches_counter(spark, tmp_path):
    """Planted 150-word Zipf-ish vocabulary recomputed with a Python
    Counter: exact covered/total tokens at every candidate size, and
    coverage strictly increasing while the size is below the vocab."""
    import random
    from collections import Counter

    from pyspark.sql import Row

    from lab3_lakehouse_spark.queries.corpus import (
        _VOCAB_SIZES,
        vocab_coverage_curve,
    )

    rng = random.Random(3)
    words = []
    for i in range(150):
        words += [f"w{i:03d}"] * (151 - i)
    rng.shuffle(words)
    rows = [
        Row(doc_id=d, text=" ".join(words[d * 200 : (d + 1) * 200]))
        for d in range((len(words) + 199) // 200)
    ]
    spark.createDataFrame(rows).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    cnt = Counter(words)
    total = sum(cnt.values())
    by_rank = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    out = {
        r.vocab_size: r
        for r in vocab_coverage_curve(spark, str(tmp_path)).collect()
    }
    assert set(out) == set(_VOCAB_SIZES)
    for n in _VOCAB_SIZES:
        expect = sum(c for _, c in by_rank[:n])
        assert out[n].covered_tokens == expect
        assert out[n].total_tokens == total
        assert out[n].vocab_total == 150
    # below the vocab size the curve strictly rises; at/after it, flat
    assert out[100].covered_tokens < out[500].covered_tokens
    assert out[500].covered_tokens == out[1000].covered_tokens == total
