"""LLM-data-pipeline queries (north star): deduplication, similarity
search, text analysis, multimodal plumbing — over ``documents`` and
``embeddings``.

Cross-engine facts this file relies on (probed, tests enforce):

- the Catalyst ``zip_with``/``aggregate`` cosine in functions/vector.py
  is BIT-IDENTICAL to DuckDB's ``list_cosine_similarity`` on
  ``DOUBLE[]`` (both fold left-to-right in double) → no rounding of
  similarities anywhere;
- tokenization is ``\\s+`` regex split on BOTH engines (Spark
  ``F.split(col, r"\\s+")`` ≡ DuckDB ``regexp_split_to_array(col,
  '\\s+')`` — probed identical on leading/trailing/empty/mixed
  whitespace), so the parity contract no longer depends on the corpus
  being single-spaced;
- integer-ratio features (jaccard = |∩|/|∪|) are exact double divisions
  of ints → bit-identical.

LSH-based operators (MinHash, SimHash, random-projection ANN) use
engine-specific hashing (xxhash64) — not SQL-expressible → rows-only
driver check + planted-duplicate unit tests in tests/test_llmdata.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lab3_lakehouse_spark.catalog import fan_out, load_table
from lab3_lakehouse_spark.operators import dedup as dedup_ops
from lab3_lakehouse_spark.operators import multimodal as mm_ops
from lab3_lakehouse_spark.operators import similarity as sim_ops
from lab3_lakehouse_spark.operators import text as text_ops
from lab3_lakehouse_spark.queries._util import round4, sql_round4
from lab3_lakehouse_spark.queries.registry import query
from lab3_lakehouse_spark.session import tune_session

# ------------------------------------------------------------- dedup ----

@query(
    "dedup_exact_keep_first",
    oracle="""
    SELECT doc_id, text, lang, source, n_chars
    FROM documents
    QUALIFY row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1
    """,
)
def dedup_exact_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on content, deterministic keep-smallest-id (NOT
    dropDuplicates, which keeps an arbitrary row — lineage requires
    reproducibility)."""
    tune_session(spark)
    docs = load_table(spark, sf_dir, "documents")
    return dedup_ops.exact_dedup(docs, ["text"], ["doc_id"])


@query(
    "dedup_fingerprint_groups",
    oracle="""
    SELECT md5(text) AS fp, min(doc_id) AS keep_doc_id, count(*) AS n_copies
    FROM documents
    GROUP BY md5(text)
    """,
)
def dedup_fingerprint_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-fingerprint groups: the shuffle key for exact dedup at
    100 TB is the 128-bit hash, never the full text."""
    tune_session(spark)
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy(dedup_ops.fingerprint("text").alias("fp")).agg(
        F.min("doc_id").alias("keep_doc_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )


@query(
    "word_jaccard_near_dups",
    oracle="""
    WITH t AS (
        SELECT doc_id, lang,
               list_distinct(regexp_split_to_array(lower(text), '\\s+')) AS w
        FROM documents
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           len(list_intersect(a.w, b.w))::DOUBLE
             / (len(a.w) + len(b.w) - len(list_intersect(a.w, b.w))) AS jaccard
    FROM t a JOIN t b ON a.lang = b.lang AND a.doc_id < b.doc_id
    WHERE len(list_intersect(a.w, b.w))::DOUBLE
             / (len(a.w) + len(b.w) - len(list_intersect(a.w, b.w))) >= 0.8
    """,
)
def word_jaccard_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-set Jaccard near-dup pairs, blocked by language —
    the blocked-all-pairs pattern (pairs only within blocks, never n²
    across the corpus)."""
    tune_session(spark)
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    return _word_jaccard_pairs(docs)


def _word_jaccard_pairs(docs: DataFrame, threshold: float = 0.8) -> DataFrame:
    """Lang- and length-banded exact word-Jaccard pairs ≥ threshold
    (shared by the dup family). r13: delegates to
    :func:`operators.dedup.banded_word_jaccard_pairs` — the LOSSLESS
    length-band blocking key (bitlength of the distinct-word count;
    qualifying pairs differ by ≤1 band) cuts the per-lang-block
    quadratic constant without changing a single output row, so the
    unbanded oracle SQL still matches bit-for-bit."""
    return dedup_ops.banded_word_jaccard_pairs(docs, threshold)


@query(
    "dup_groups_connected",
    oracle="""
    WITH RECURSIVE t AS MATERIALIZED (
        SELECT doc_id, lang,
               list_distinct(regexp_split_to_array(lower(text), '\\s+')) AS w
        FROM documents
    ), pairs AS MATERIALIZED (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM t a JOIN t b ON a.lang = b.lang AND a.doc_id < b.doc_id
        WHERE len(list_intersect(a.w, b.w))::DOUBLE
              / (len(a.w) + len(b.w) - len(list_intersect(a.w, b.w))) >= 0.8
    ), edges AS MATERIALIZED (
        SELECT id_a AS u, id_b AS v FROM pairs
        UNION
        SELECT id_b AS u, id_a AS v FROM pairs
    ), reach(u, r) AS (
        SELECT u, u FROM (SELECT DISTINCT u FROM edges)
        UNION
        SELECT e.v, reach.r FROM reach JOIN edges e ON e.u = reach.u
    ), comp AS MATERIALIZED (
        SELECT u AS doc_id, min(r) AS component FROM reach GROUP BY u
    )
    SELECT doc_id, component,
           count(*) OVER (PARTITION BY component) AS group_size
    FROM comp
    """,
)
def dup_groups_connected(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-GROUP resolution: near-dup pairs (lang-blocked exact
    word-Jaccard ≥ 0.8 — the SQL-expressible pair tier) collapsed into
    connected components by iterative hash-min propagation
    (operators/dedup.py:connected_components). Output is one row per
    document that has at least one near-dup: its component id (= the
    smallest doc_id in the group, i.e. the row keep-smallest-id dedup
    retains) and the group size.

    The oracle resolves the same components in DuckDB with a recursive
    transitive-closure CTE — exact cross-engine agreement on an
    iterative/graph operator, not just on relational ops. (The
    recursive closure is O(n·|component|) and oracle-only; the Spark
    side stays one shuffle per propagation round.)
    """
    tune_session(spark)
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    pairs = _word_jaccard_pairs(docs)
    cc = dedup_ops.connected_components(pairs, "id_a", "id_b")
    return cc.select(
        F.col("vertex").alias("doc_id"),
        "component",
        F.count(F.lit(1))
        .over(Window.partitionBy("component"))
        .alias("group_size"),
    )


@query(
    "cross_source_dup_matrix",
    oracle="""
    WITH t AS (
        SELECT doc_id, lang, source,
               list_distinct(regexp_split_to_array(lower(text), '\\s+')) AS w
        FROM documents
    ), pairs AS (
        SELECT least(a.source, b.source) AS source_a,
               greatest(a.source, b.source) AS source_b
        FROM t a JOIN t b ON a.lang = b.lang AND a.doc_id < b.doc_id
        WHERE len(list_intersect(a.w, b.w))::DOUBLE
              / (len(a.w) + len(b.w) - len(list_intersect(a.w, b.w))) >= 0.8
    )
    SELECT source_a, source_b,
           CAST(count(*) AS BIGINT) AS n_dup_pairs,
           source_a = source_b AS within_source
    FROM pairs GROUP BY source_a, source_b
    """,
)
def cross_source_dup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHERE duplication comes from: near-dup pairs rolled up to an
    unordered (source, source) matrix — within-source counts are
    boilerplate/re-crawl signatures (fix the crawler), cross-source
    counts are syndication/mirroring (pick ONE canonical source in the
    mix, or the mixture weights double-count the shared mass). The
    pair tier is the lang-blocked exact word-Jaccard contract (the
    oracle-replay twin — at scale the pair source swaps to banded LSH,
    the dup_groups_connected substitution); the matrix itself is one
    broadcast source-lookup join on the bounded pair frame and one
    grouped count to a ≤ sources² grid."""
    tune_session(spark)
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    pairs = _word_jaccard_pairs(docs)
    src = docs.select("doc_id", "source")
    j = (
        pairs.join(
            F.broadcast(
                src.select(
                    F.col("doc_id").alias("id_a"),
                    F.col("source").alias("__sa"),
                )
            ),
            "id_a",
        )
        .join(
            F.broadcast(
                src.select(
                    F.col("doc_id").alias("id_b"),
                    F.col("source").alias("__sb"),
                )
            ),
            "id_b",
        )
        .select(
            F.least("__sa", "__sb").alias("source_a"),
            F.greatest("__sa", "__sb").alias("source_b"),
        )
    )
    return (
        j.groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_dup_pairs"))
        .withColumn(
            "within_source", F.col("source_a") == F.col("source_b")
        )
    )


@query(
    "dup_group_size_histogram",
    oracle="""
    WITH RECURSIVE t AS MATERIALIZED (
        SELECT doc_id, lang,
               list_distinct(regexp_split_to_array(lower(text), '\\s+')) AS w
        FROM documents
    ), pairs AS MATERIALIZED (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM t a JOIN t b ON a.lang = b.lang AND a.doc_id < b.doc_id
        WHERE len(list_intersect(a.w, b.w))::DOUBLE
              / (len(a.w) + len(b.w) - len(list_intersect(a.w, b.w))) >= 0.8
    ), edges AS MATERIALIZED (
        SELECT id_a AS u, id_b AS v FROM pairs
        UNION
        SELECT id_b AS u, id_a AS v FROM pairs
    ), reach(u, r) AS (
        SELECT u, u FROM (SELECT DISTINCT u FROM edges)
        UNION
        SELECT e.v, reach.r FROM reach JOIN edges e ON e.u = reach.u
    ), comp AS MATERIALIZED (
        SELECT u AS doc_id, min(r) AS component FROM reach GROUP BY u
    ), sizes AS MATERIALIZED (
        SELECT component, CAST(count(*) AS BIGINT) AS group_size
        FROM comp GROUP BY component
    )
    SELECT group_size,
           CAST(count(*) AS BIGINT) AS n_groups,
           CAST(count(*) * (group_size - 1) AS BIGINT) AS docs_removable
    FROM sizes GROUP BY group_size
    """,
)
def dup_group_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-group SIZE distribution — the one-page impact summary
    a curator reads before running dedup: how many near-dup groups
    exist at each size, and how many documents keep-one-per-group
    dedup would remove (Σ n_groups·(size−1)). A fat tail here (one
    10k-member group) is the mass-duplication signature that should be
    routed to the exact-dedup tier instead of pairwise verification —
    the same hot-spot the LSH bucket caps guard against, now visible
    as data. Rolls up dup_groups_connected's component frame
    (lang-blocked exact word-Jaccard ≥ 0.8 pairs → hash-min connected
    components) with two tiny grouped passes; the oracle resolves the
    identical components via DuckDB's recursive closure, so the
    histogram is differential-checked end-to-end."""
    tune_session(spark)
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    pairs = _word_jaccard_pairs(docs)
    cc = dedup_ops.connected_components(pairs, "id_a", "id_b")
    sizes = cc.groupBy("component").agg(
        F.count(F.lit(1)).cast("long").alias("group_size")
    )
    return sizes.groupBy("group_size").agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        (F.count(F.lit(1)) * (F.col("group_size") - F.lit(1)))
        .cast("long")
        .alias("docs_removable"),
    )


@query(
    "dup_component_density_audit",
    oracle="""
    WITH RECURSIVE t AS MATERIALIZED (
        SELECT doc_id, lang,
               list_distinct(regexp_split_to_array(lower(text), '\\s+')) AS w
        FROM documents
    ), pairs AS MATERIALIZED (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM t a JOIN t b ON a.lang = b.lang AND a.doc_id < b.doc_id
        WHERE len(list_intersect(a.w, b.w))::DOUBLE
              / (len(a.w) + len(b.w) - len(list_intersect(a.w, b.w))) >= 0.8
    ), edges AS MATERIALIZED (
        SELECT id_a AS u, id_b AS v FROM pairs
        UNION
        SELECT id_b AS u, id_a AS v FROM pairs
    ), reach(u, r) AS (
        SELECT u, u FROM (SELECT DISTINCT u FROM edges)
        UNION
        SELECT e.v, reach.r FROM reach JOIN edges e ON e.u = reach.u
    ), comp AS MATERIALIZED (
        SELECT u AS doc_id, min(r) AS component FROM reach GROUP BY u
    ), sizes AS MATERIALIZED (
        SELECT component, CAST(count(*) AS BIGINT) AS n_members
        FROM comp GROUP BY component
    ), pair_counts AS MATERIALIZED (
        SELECT c.component, CAST(count(*) AS BIGINT) AS n_pairs
        FROM pairs p JOIN comp c ON c.doc_id = p.id_a
        GROUP BY c.component
    )
    SELECT s.component, s.n_members, pc.n_pairs,
           CAST(floor((2.0 * pc.n_pairs
                / (s.n_members * (s.n_members - 1))) * 10000.0 + 0.5)
                AS DOUBLE) / 10000.0 AS density,
           pc.n_pairs = s.n_members * (s.n_members - 1) / 2 AS is_clique
    FROM sizes s JOIN pair_counts pc USING (component)
    """,
)
def dup_component_density_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitivity audit of the near-dup graph: per duplicate
    component, how many of the possible pairs actually verified —
    density 1.0 (clique) means every member is pairwise-similar (a true
    duplicate cluster: keep-one is safe); low density means the
    component is a CHAIN glued by transitive hops (A≈B≈C but A≉C — the
    classic over-merge failure of union-find dedup at a loose
    threshold, where keep-one silently deletes documents that are NOT
    duplicates of the keeper). This is the diagnostic that tunes τ:
    falling clique rates say the threshold is too loose. Pairs and
    components are the engine's own frames (lang-blocked exact
    word-Jaccard → hash-min CC — the oracle-replay twin; LSH at scale);
    the audit itself is two grouped counts joined on the ≤-components
    frame."""
    tune_session(spark)
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    pairs = _word_jaccard_pairs(docs).localCheckpoint(
        eager=False
    )  # feeds CC AND the per-component pair count
    cc = dedup_ops.connected_components(pairs, "id_a", "id_b")
    comp = cc.select(F.col("vertex").alias("doc_id"), "component")
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).cast("long").alias("n_members")
    )
    pc = (
        pairs.join(
            F.broadcast(comp.select(F.col("doc_id").alias("id_a"), "component")),
            "id_a",
        )
        .groupBy("component")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    )
    m = F.col("n_members")
    return sizes.join(pc, "component").select(
        "component",
        "n_members",
        "n_pairs",
        round4(
            F.lit(2.0) * F.col("n_pairs") / (m * (m - F.lit(1)))
        ).alias("density"),
        (F.col("n_pairs") == (m * (m - F.lit(1))) / F.lit(2)).alias(
            "is_clique"
        ),
    )


@query(
    "decontamination_ngram_overlap",
    oracle="""
    WITH w AS (
        SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS w FROM documents
    ), t AS (
        SELECT doc_id,
               list_distinct(
                 list_transform(generate_series(1, greatest(len(w)-2, 1)),
                                i -> array_to_string(w[i:i+2], ' '))
               ) AS s
        FROM w
    ), bench AS (
        SELECT doc_id AS bench_id, unnest(s) AS sh FROM t WHERE doc_id % 10 = 0
    ), corp AS (
        SELECT doc_id, len(s) AS n_shingles, unnest(s) AS sh
        FROM t WHERE doc_id % 10 <> 0
    ), ov AS (
        SELECT c.doc_id, b.bench_id,
               count(*) AS n_overlap, max(c.n_shingles) AS n_shingles
        FROM corp c JOIN bench b USING (sh)
        GROUP BY c.doc_id, b.bench_id
    ), best AS (
        SELECT doc_id, bench_id, n_overlap, n_shingles
        FROM ov
        QUALIFY row_number()
            OVER (PARTITION BY doc_id ORDER BY n_overlap DESC, bench_id) = 1
    )
    SELECT doc_id, bench_id, n_overlap, n_shingles,
           n_overlap::DOUBLE / n_shingles AS overlap_frac
    FROM best
    WHERE n_overlap::DOUBLE / n_shingles >= 0.5
    """,
)
def decontamination_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination over the documents corpus: docs with
    ``doc_id % 10 == 0`` play the held-out benchmark, the rest the
    training corpus; report each corpus doc whose best benchmark match
    shares ≥ 50% of its distinct 3-word shingles (operators/text.py:
    ngram_overlap — one equi-join on the 64-bit shingle hash, never
    doc×doc). The corpus here is cleanly bimodal (background best-match
    overlap ≤ 0.08, planted contamination ≥ 0.96 at sf0.01/sf0.1), so
    the 0.5 boundary is decision-stable.

    Cross-engine note: Spark joins on xxhash64(shingle), the oracle on
    the shingle string — identical counts up to 64-bit collisions
    (negligible, deterministic; same equivalence minhash_verify_hashed
    relies on). overlap_frac is an exact int/int double division —
    bit-identical, no rounding policy needed.
    """
    tune_session(spark)
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    bench = docs.filter(F.col("doc_id") % 10 == 0)
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    ov = text_ops.ngram_overlap(corpus, bench, shingle_n=3)
    w = Window.partitionBy("doc_id").orderBy(
        F.col("n_overlap").desc(), F.col("bench_id")
    )
    return (
        ov.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .withColumn(
            "overlap_frac",
            F.col("n_overlap").cast("double") / F.col("n_shingles").cast("double"),
        )
        .filter(F.col("overlap_frac") >= 0.5)
        .select("doc_id", "bench_id", "n_overlap", "n_shingles", "overlap_frac")
    )


@query(
    "tfidf_top_terms",
    oracle="""
    WITH terms AS (
        SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\\s+')) AS term
        FROM documents
    ), tf AS (
        SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY doc_id, term
    ), df AS (
        SELECT term, count(DISTINCT doc_id) AS df FROM terms GROUP BY term
    ), n AS (
        SELECT count(DISTINCT doc_id) AS n_docs FROM documents
    )
    SELECT doc_id, term, tf, df,
           tf::DOUBLE * n_docs::DOUBLE / df::DOUBLE AS score
    FROM tf JOIN df USING (term), n
    QUALIFY row_number()
        OVER (PARTITION BY doc_id ORDER BY score DESC, tf DESC, term) <= 3
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document keyword extraction: top-3 terms by tf-idf with a
    linear inverse document frequency (operators/text.py:
    linear_tfidf_top_terms — integer counting + one exact IEEE
    multiply/divide, so scores are bit-identical cross-engine; log-idf
    is a one-line swap where oracle determinism isn't required)."""
    tune_session(spark)
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    return text_ops.linear_tfidf_top_terms(docs, "doc_id", "text", top_k=3)


_BM25_QUERIES, _BM25_K = 8, 10
_BM25_K1, _BM25_B = 1.2, 0.75

def _bm25_oracle(k: int) -> str:
    return f"""
    WITH posts AS (
        SELECT doc_id, len(t) AS dl, unnest(t) AS term FROM (
            SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS t
            FROM documents)
    ),
    tf AS (
        SELECT doc_id, dl, term, CAST(count(*) AS BIGINT) AS tf
        FROM posts GROUP BY doc_id, dl, term
    ),
    dfreq AS (
        SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
        FROM tf GROUP BY term
    ),
    n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
    avgdl AS (
        SELECT {sql_round4('avg(dl)')} AS avgdl
        FROM (SELECT DISTINCT doc_id, dl FROM tf)
    ),
    q AS (
        SELECT doc_id AS query_id, term, CAST(count(*) AS BIGINT) AS qtf
        FROM (
            SELECT doc_id, unnest(
                regexp_split_to_array(lower(text), '\\s+')[1:4]) AS term
            FROM documents WHERE doc_id < {_BM25_QUERIES})
        GROUP BY doc_id, term
    ),
    qterms AS (
        SELECT q.query_id, q.term, q.qtf,
               ln(1.0 + (n.n - COALESCE(d.df, 0) + 0.5)
                      / (COALESCE(d.df, 0) + 0.5)) AS idf
        FROM q LEFT JOIN dfreq d USING (term) CROSS JOIN n
    ),
    scored AS (
        SELECT qt.query_id, tf.doc_id,
               {sql_round4(
                   'sum(qt.qtf * qt.idf * (tf.tf * 2.2) '
                   '/ (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / a.avgdl)))'
               )} AS score
        FROM tf JOIN qterms qt USING (term) CROSS JOIN avgdl a
        GROUP BY qt.query_id, tf.doc_id
    )
    SELECT query_id, doc_id, score,
           CAST(row_number() OVER (PARTITION BY query_id
                ORDER BY score DESC, doc_id) AS BIGINT) AS rank
    FROM scored
    QUALIFY rank <= {k}
"""


@query("bm25_lexical_topk", oracle=_bm25_oracle(_BM25_K))
def bm25_lexical_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 lexical retrieval (operators/text.bm25_topk) — the sparse
    baseline next to the dense ANN family: 8 queries (the first 4
    tokens of docs 0–7, duplicates kept as qtf) ranked over the corpus
    with Lucene-form idf, k1 = 1.2, b = 0.75 (k1+1 and 1−b ride as
    paired pinned literals; avgdl is round4-pinned before use). One
    corpus scan builds the postings with the doc length riding the
    grouping key; the ≤32-term query frame broadcasts onto them, so
    non-query terms never reach an aggregation. Top-10 per query,
    round4-before-rank with the doc_id tie-break."""
    tune_session(spark)
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    toks = F.split(F.lower(F.col("text")), r"\s+")
    q = (
        docs.filter(F.col("doc_id") < _BM25_QUERIES)
        .select(
            F.col("doc_id").alias("query_id"),
            F.explode(F.slice(toks, 1, 4)).alias("term"),
        )
        .groupBy("query_id", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("qtf"))
    )
    return text_ops.bm25_topk(
        docs, q, id_col="doc_id", text_col="text",
        k=_BM25_K, k1=_BM25_K1, b=_BM25_B,
    )


@query("bm25_postings_topk", oracle=_bm25_oracle(_BM25_K))
def bm25_postings_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 against a PERSISTED postings index — the retrieval shape
    that survives 100 TB: bm25_lexical_topk rebuilds postings per call
    (fine for a one-shot audit, corpus-scan cost per query batch);
    here the index is built ONCE to a tier (operators/text.
    bm25_append_batch — term-hash-clustered parquet + a per-batch
    (n_docs, dl_sum) meta sidecar) and the query probes it
    (bm25_topk_from_store): the ≤32-term query vocabulary pushes down
    as a ``term IN`` parquet filter onto the clustered store, so the
    probe reads index slivers while N/avgdl come from the sidecar.
    The store is populated in TWO appends (doc_id parity split — the
    daily-ingestion shape; append cost ∝ batch, existing store never
    read), and the probe must equal the one-shot scorer — the oracle
    is bm25_lexical_topk's, verbatim: same idf/saturation literals,
    same round4-before-rank, same tie-break.

    Unlike the rest of the catalog this entry is eager by necessity —
    a store probe needs the store to EXIST, so the build writes run at
    call time. The store root comes from ``_util.scratch_dir`` ($SPARK_
    GRAFT_SCRATCH on a real cluster, driver-local temp in local mode —
    see that helper's documented local-mode assumption); in production
    the index is a permanent tier built by ingestion, and only
    bm25_topk_from_store runs per query batch."""
    import shutil

    from lab3_lakehouse_spark.queries._util import scratch_dir

    tune_session(spark)
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    toks = F.split(F.lower(F.col("text")), r"\s+")
    q = (
        docs.filter(F.col("doc_id") < _BM25_QUERIES)
        .select(
            F.col("doc_id").alias("query_id"),
            F.explode(F.slice(toks, 1, 4)).alias("term"),
        )
        .groupBy("query_id", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("qtf"))
    )
    tmp = scratch_dir("bm25_store_")
    try:
        for residue in (0, 1):
            text_ops.bm25_append_batch(
                tmp, docs.filter(F.pmod("doc_id", F.lit(2)) == residue),
                id_col="doc_id", text_col="text",
            )
        out = text_ops.bm25_topk_from_store(
            spark, tmp, q, id_col="doc_id",
            k=_BM25_K, k1=_BM25_K1, b=_BM25_B,
        )
        # pin the result in executor block storage so the temp tier can
        # be deleted (the incremental_rollup_hourly pattern)
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@query("streaming_bm25_index", oracle=_bm25_oracle(_BM25_K))
def streaming_bm25_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BM25 postings store fed by a STREAM — the continuous lid on
    bm25_postings_topk: documents arrive as a file stream (4 JSON
    slices, maxFilesPerTrigger=2 → multiple real micro-batches), every
    micro-batch appends its postings + meta row through
    streaming/ingest.stream_bm25_append (append cost ∝ batch; the
    store is never read by the writer), and after the stream drains
    the SAME probe as the batch entry must equal the one-shot scorer —
    the oracle is bm25_lexical_topk's, verbatim. This is the shape a
    crawl pipeline runs: the index is always probe-ready, at any
    stream age, without ever rescanning the corpus."""
    import shutil

    from lab3_lakehouse_spark.queries._util import scratch_dir
    from lab3_lakehouse_spark.streaming.ingest import stream_bm25_append

    tune_session(spark)
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.col("text")), r"\s+")
    q = (
        docs.filter(F.col("doc_id") < _BM25_QUERIES)
        .select(
            F.col("doc_id").alias("query_id"),
            F.explode(F.slice(toks, 1, 4)).alias("term"),
        )
        .groupBy("query_id", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("qtf"))
    )
    src = scratch_dir("bm25_stream_src_")
    store = scratch_dir("bm25_stream_store_")
    try:
        docs.select("doc_id", "text", "source").repartition(4).write.mode(
            "overwrite"
        ).json(src)
        sq = stream_bm25_append(spark, src, store, max_files_per_trigger=2)
        sq.processAllAvailable()
        sq.stop()
        out = text_ops.bm25_topk_from_store(
            spark, store, q, id_col="doc_id",
            k=_BM25_K, k1=_BM25_K1, b=_BM25_B,
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(store, ignore_errors=True)


@query("bm25_store_compaction", oracle=_bm25_oracle(_BM25_K))
def bm25_store_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-store GC (operators/text.bm25_compact_store) — the
    maintenance pass a per-batch-append store needs: four small
    appends (doc_id mod 4 — the fragmented shape a micro-batch stream
    leaves behind) are re-clustered into one term-hash-bucketed tier
    plus a single folded meta row, written to a NEW root so live
    probes are never disturbed. Scoring from the compacted store must
    equal the one-shot scorer exactly (the verbatim bm25_lexical_topk
    oracle): compaction moves postings rows, never merges or drops
    them, and Σ n_docs / Σ dl_sum are the same integers however many
    meta rows they were split across. The KLL twin is
    kll_tier_compaction; together they pin the tier-GC discipline for
    both store families."""
    import shutil

    from lab3_lakehouse_spark.queries._util import scratch_dir

    tune_session(spark)
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    toks = F.split(F.lower(F.col("text")), r"\s+")
    q = (
        docs.filter(F.col("doc_id") < _BM25_QUERIES)
        .select(
            F.col("doc_id").alias("query_id"),
            F.explode(F.slice(toks, 1, 4)).alias("term"),
        )
        .groupBy("query_id", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("qtf"))
    )
    src_root = scratch_dir("bm25_frag_")
    dst_root = scratch_dir("bm25_compacted_")
    try:
        for residue in range(4):
            text_ops.bm25_append_batch(
                src_root,
                docs.filter(F.pmod("doc_id", F.lit(4)) == residue),
                id_col="doc_id", text_col="text",
            )
        text_ops.bm25_compact_store(spark, src_root, dst_root)
        out = text_ops.bm25_topk_from_store(
            spark, dst_root, q, id_col="doc_id",
            k=_BM25_K, k1=_BM25_K1, b=_BM25_B,
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(src_root, ignore_errors=True)
        shutil.rmtree(dst_root, ignore_errors=True)


_RRF_DEPTH, _RRF_K, _RRF_TOPK = 20, 60, 10


def _hybrid_rrf_oracle() -> str:
    cos = "list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[])"
    return f"""
    WITH bm AS ({_bm25_oracle(_RRF_DEPTH)}),
    dense AS (
        SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
               CAST(row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY {cos} DESC, c.vec_id) AS BIGINT) AS rank
        FROM embeddings q JOIN embeddings c ON c.vec_id != q.vec_id
        WHERE q.vec_id < {_BM25_QUERIES}
        QUALIFY rank <= {_RRF_DEPTH}
    ),
    contribs AS (
        SELECT query_id, doc_id, 1.0 / ({_RRF_K}.0 + rank) AS rrf FROM bm
        UNION ALL
        SELECT query_id, doc_id, 1.0 / ({_RRF_K}.0 + rank) AS rrf FROM dense
    ),
    fused AS (
        SELECT query_id, doc_id,
               {sql_round4('sum(rrf)')} AS rrf_score,
               CAST(count(*) AS BIGINT) AS n_systems
        FROM contribs GROUP BY query_id, doc_id
    )
    SELECT query_id, doc_id, rrf_score, n_systems,
           CAST(row_number() OVER (PARTITION BY query_id
                ORDER BY rrf_score DESC, doc_id) AS BIGINT) AS rank
    FROM fused
    QUALIFY rank <= {_RRF_TOPK}
    """


@query("hybrid_rrf_retrieval", oracle=_hybrid_rrf_oracle())
def hybrid_rrf_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via reciprocal-rank fusion — the production
    search-stack default: fuse the BM25 lexical top-20 (over document
    text) with the exact dense cosine top-20 (over the documents'
    embeddings; vec_id is the doc id in this corpus) by summed
    1/(60+rank), no cross-system score calibration needed
    (operators/windows.reciprocal_rank_fusion). n_systems exposes
    whether a hit came from one ranker or both — the debugging column
    hybrid rollouts live on. Both upstream rankers are the engine's own
    bounded top-k frames, so the fusion itself is broadcast-scale.

    Scale-vs-oracle pairing: the dense leg here is exact brute-force
    top-20 — the ORACLE-PARITY twin (the differential gate needs the
    exact ranking); at corpus scale the dense leg swaps to the ANN path
    (`ann_ivfpq_topk` — IVF routing + PQ ADC with the skinny rank
    exchange) and the fusion operator is unchanged. The composition
    point under test is the fusion, not the leg."""
    tune_session(spark)
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    emb = load_table(spark, sf_dir, "embeddings")
    toks = F.split(F.lower(F.col("text")), r"\s+")
    q = (
        docs.filter(F.col("doc_id") < _BM25_QUERIES)
        .select(
            F.col("doc_id").alias("query_id"),
            F.explode(F.slice(toks, 1, 4)).alias("term"),
        )
        .groupBy("query_id", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("qtf"))
    )
    bm = text_ops.bm25_topk(
        docs, q, id_col="doc_id", text_col="text",
        k=_RRF_DEPTH, k1=_BM25_K1, b=_BM25_B,
    ).select("query_id", "doc_id", "rank")
    dense = sim_ops.brute_force_topk(
        emb, emb.filter(F.col("vec_id") < _BM25_QUERIES),
        "vec_id", "embedding", k=_RRF_DEPTH,
    ).select(
        "query_id", F.col("neighbor_id").alias("doc_id"), "rank"
    )
    from lab3_lakehouse_spark.operators import windows as win_ops
    from lab3_lakehouse_spark.queries._util import round4 as _r4

    # keep EVERY candidate through the fusion (≤ 2·depth per query) and
    # cut only on the rounded rank below — cutting on the raw score
    # first could drop a candidate the oracle's rounded-score tie-break
    # keeps
    fused = win_ops.reciprocal_rank_fusion(
        [bm, dense], id_col="doc_id", rrf_k=_RRF_K, topk=2 * _RRF_DEPTH
    )
    # round4 BEFORE the final rank is the catalog rule — re-rank on the
    # rounded score so both engines cut the same boundary
    rounded = fused.select(
        "query_id", "doc_id",
        _r4(F.col("__score")).alias("rrf_score"), "n_systems",
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_score").desc(), F.col("doc_id").asc()
    )
    return (
        rounded.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= _RRF_TOPK)
    )


_RERANK_ORACLE = f"""
    WITH fused AS ({_hybrid_rrf_oracle()}),
    qt AS (
        SELECT doc_id AS query_id,
               list_distinct(
                   regexp_split_to_array(lower(text), '\\s+')[1:4]) AS qterms
        FROM documents WHERE doc_id < {_BM25_QUERIES}
    ),
    dt AS (
        SELECT doc_id,
               list_distinct(regexp_split_to_array(lower(text), '\\s+'))
                   AS dtoks
        FROM documents
    ),
    scored AS (
        SELECT f.query_id, f.doc_id,
               f.rank AS rrf_rank,
               {sql_round4('''len(list_intersect(qt.qterms, dt.dtoks))::DOUBLE
                   / len(qt.qterms)''')} AS coverage
        FROM fused f JOIN qt USING (query_id) JOIN dt USING (doc_id)
    )
    SELECT query_id, doc_id, rrf_rank, coverage,
           CAST(row_number() OVER (PARTITION BY query_id
                ORDER BY coverage DESC, rrf_rank, doc_id) AS BIGINT)
               AS rerank
    FROM scored
"""


@query("rerank_fused_candidates", oracle=_RERANK_ORACLE)
def rerank_fused_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-encoder-STYLE second-stage rerank over the hybrid RRF
    list — the two-tower production shape: cheap retrieval
    (BM25 + dense, fused) proposes a BOUNDED candidate set (top-10 ×
    8 queries), and only those ≤ 80 (query, doc) PAIRS are re-scored
    with a pairwise interaction model reading both texts — the
    expensive scorer never sees the corpus, which is the entire
    economics of rerankers at 100 TB. The interaction scorer here is
    deterministic query-term coverage (|qterms ∩ dtoks| / |qterms|,
    round4-before-rank, RRF-rank then doc-id tie-break) — the
    SQL-replayable stand-in for a neural cross-encoder (no torch in
    this environment: the documented FakeCodec-class boundary); the
    pandas-UDF slot is REAL and tested — operators/text.
    crossencoder_rerank runs an Arrow-batched scorer over the same
    bounded pair frame (tests/test_llmdata.py pins, via an
    accumulator, that the UDF sees exactly the candidate pairs and
    never the corpus), so a model-backed UDF swaps in with every
    other plan node unchanged. This oracle entry stays on the
    SQL-replayable expression twin.

    Plan: the fused frame broadcasts onto the corpus scan to fetch
    candidate texts (the ONLY corpus touch), scoring + rerank run on
    the candidate frame."""
    tune_session(spark)
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    from lab3_lakehouse_spark.queries._util import round4 as _r4

    fused = hybrid_rrf_retrieval(spark, sf_dir).select(
        "query_id", "doc_id", F.col("rank").alias("rrf_rank")
    )
    toks = F.array_distinct(F.split(F.lower(F.col("text")), r"\s+"))
    qt = docs.filter(F.col("doc_id") < _BM25_QUERIES).select(
        F.col("doc_id").alias("query_id"),
        F.array_distinct(
            F.slice(F.split(F.lower(F.col("text")), r"\s+"), 1, 4)
        ).alias("__qterms"),
    )
    dt = docs.select("doc_id", toks.alias("__dtoks"))
    scored = (
        dt.join(F.broadcast(fused), "doc_id")
        .join(F.broadcast(qt), "query_id")
        .select(
            "query_id",
            "doc_id",
            "rrf_rank",
            _r4(
                F.size(F.array_intersect("__qterms", "__dtoks")).cast(
                    "double"
                )
                / F.size("__qterms")
            ).alias("coverage"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("coverage").desc(), F.col("rrf_rank").asc(), F.col("doc_id").asc()
    )
    return scored.withColumn(
        "rerank", F.row_number().over(w).cast("long")
    )


@query(
    "minhash_lsh_near_dups",
    oracle="""
    WITH w AS (
      SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS w FROM documents
    ), t AS (
      SELECT doc_id,
             list_distinct(
               list_transform(generate_series(1, greatest(len(w)-2, 1)),
                              i -> array_to_string(w[i:i+2], ' '))
             ) AS s
      FROM w
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           len(list_intersect(a.s, b.s))::DOUBLE
             / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS jaccard
    FROM t a JOIN t b ON a.doc_id < b.doc_id
    WHERE len(list_intersect(a.s, b.s))::DOUBLE
             / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.8
    """,
)
def minhash_lsh_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + banded LSH candidates, exact-Jaccard verified — the
    100 TB near-dup path (band-key shuffle, candidates ≪ n²).

    shingle_n=3 (order-sensitive 3-word shingles): the standard
    near-dup measure for training corpora. The corpus here is
    template-generated from a small vocabulary, so *word-set* Jaccard
    between unrelated docs has median ≈0.7 — an n=1 configuration
    degenerates to ~80% of all pairs as candidates (measured at
    sf0.01), while n=3 stays selective. Word-set semantics are covered
    by the oracle-checked ``word_jaccard_near_dups``.

    Oracle-checked against the FULL exact answer: DuckDB computes every
    3-shingle-Jaccard ≥ 0.8 pair by brute force, so the driver verifies
    LSH recall end-to-end, not just precision. Sound because every true
    pair in this corpus sits at j ≥ 0.9 (verified at sf0.01/sf0.1),
    where the 16-band/4-row S-curve miss probability is < 5e-8 per pair
    and the xxhash64 seeds are fixed — the output is deterministic.
    Recall near the 0.8 boundary is additionally asserted with planted
    duplicates in tests/test_llmdata.py.
    """
    tune_session(spark)
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    # Tokenize + shingle-hash each doc ONCE; candidates and verification
    # both read this frame (localCheckpoint pins it past both subtrees —
    # the simhash_near_dups pattern). Saves a full second text scan.
    hashed = docs.select(
        F.col("doc_id").alias("__id"),
        dedup_ops.shingle_hashes("text", 3).alias("__h"),
    ).localCheckpoint(eager=False)
    cands = dedup_ops.minhash_lsh_candidates_from_hashes(
        hashed, num_perm=64, bands=16
    )
    return dedup_ops.minhash_verify_hashed(cands, hashed, threshold=0.8)


@query(
    "simhash_near_dups",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_docs, true AS banding_complete
    FROM documents
    """,
)
def simhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash(64) near-dup pairs, Hamming ≤ 3, banded on 16-bit chunks
    (pigeonhole guarantees recall for the distance bound).

    Assert-style oracle (simhash bits are xxhash64-derived — not SQL):
    the banded candidate pairs are compared against the brute-force
    all-pairs Hamming scan, both Spark-computed, and the query emits the
    doc count (SQL-checkable) plus ``banding_complete`` — true iff the
    banded pair set EQUALS the exhaustive one, i.e. the pigeonhole
    banding loses nothing and adds nothing. The pair list itself stays
    available via operators.dedup.simhash_pairs."""
    tune_session(spark)
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(F.col("doc_id").alias("__id"), F.col("text").alias("__t"))
    sims = dedup_ops.simhash64(base, "__id", "__t").localCheckpoint(eager=False)
    banded = dedup_ops.simhash_pairs_from_sims(sims, max_hamming=3).select(
        "id_a", "id_b"
    )
    l, r = sims.alias("l"), sims.alias("r")
    brute = (
        l.join(r, F.col("l.__id") < F.col("r.__id"))
        .filter(
            F.bit_count(F.col("l.simhash").bitwiseXOR(F.col("r.simhash"))) <= 3
        )
        .select(F.col("l.__id").alias("id_a"), F.col("r.__id").alias("id_b"))
    )
    sym_diff_empty = (
        banded.withColumn("__band", F.lit(1))
        .join(brute.withColumn("__brute", F.lit(1)), ["id_a", "id_b"], "full")
        .agg(
            (
                F.count(F.lit(1))
                == F.coalesce(F.sum(F.col("__band") * F.col("__brute")), F.lit(0))
            ).alias("banding_complete")
        )
    )
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    return n.crossJoin(sym_diff_empty).select("n_docs", "banding_complete")


# -------------------------------------------------------- similarity ----

@query(
    "embedding_cosine_pairs",
    oracle="""
    SELECT a.label, a.vec_id AS id_a, b.vec_id AS id_b,
           list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) AS cosine
    FROM embeddings a
    JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.3
    """,
)
def embedding_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs within label blocks — exact cosine via
    JVM higher-order functions (bit-identical to the oracle's
    list_cosine_similarity; no Python, no UDF)."""
    tune_session(spark)
    emb = fan_out(load_table(spark, sf_dir, "embeddings"))
    return sim_ops.cosine_pairs_blocked(
        emb, "vec_id", "embedding", "label", threshold=0.3
    ).select("label", "id_a", "id_b", "cosine")


_XLING_K = 4
_XLING_SRC, _XLING_TGT = "en", "fr"
_XLING_MARGIN = 1.05


def _xling_oracle() -> str:
    return f"""
    WITH sided AS (
        SELECT e.vec_id, e.embedding, d.lang
        FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
    ),
    cos AS (
        SELECT a.vec_id AS src_id, b.vec_id AS tgt_id,
               list_cosine_similarity(a.embedding::DOUBLE[],
                                      b.embedding::DOUBLE[]) AS c
        FROM sided a, sided b
        WHERE a.lang = '{_XLING_SRC}' AND b.lang = '{_XLING_TGT}'
    ),
    ranked AS (
        SELECT *,
               row_number() OVER (PARTITION BY src_id
                                  ORDER BY c DESC, tgt_id) AS ra,
               row_number() OVER (PARTITION BY tgt_id
                                  ORDER BY c DESC, src_id) AS rb
        FROM cos
    ),
    ka AS (SELECT src_id, sum(c) / {float(_XLING_K)} AS ka FROM ranked
           WHERE ra <= {_XLING_K} GROUP BY src_id),
    kb AS (SELECT tgt_id, sum(c) / {float(_XLING_K)} AS kb FROM ranked
           WHERE rb <= {_XLING_K} GROUP BY tgt_id),
    best AS (SELECT * FROM ranked WHERE ra = 1)
    SELECT best.src_id, best.tgt_id,
           {sql_round4("best.c")} AS cosine,
           {sql_round4("best.c / ((ka.ka + kb.kb) / 2.0)")} AS margin,
           {sql_round4("best.c / ((ka.ka + kb.kb) / 2.0)")}
               >= {_XLING_MARGIN} AS accepted
    FROM best
    JOIN ka ON best.src_id = ka.src_id
    JOIN kb ON best.tgt_id = kb.tgt_id
    """


@query("xlingual_mined_pairs", oracle=_xling_oracle())
def xlingual_mined_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-based bitext mining (re-derived from the published
    CCMatrix / Artetxe & Schwenk 2019 ratio-margin criterion): for
    every source-language (en) document, its best target-language (fr)
    candidate by embedding cosine, scored by the RATIO margin —
    cos(x, y) divided by the mean of the two sides' k-NN similarity
    averages — which suppresses hubness (a target that is everyone's
    nearest neighbor scores a high cosine but a low margin). Rows with
    ``accepted`` are the mined translation-pair candidates a parallel-
    corpus builder would keep; the margin itself is the ranking signal.

    Plan shape: ONE |src|x|tgt| cosine frame (target side broadcast —
    the smaller language by construction), both direction's k-NN means
    and the best-match pick are windows over that same frame, so the
    bipartite scan runs once. Both aggregates are 4-term per-group
    sums absorbed by round4 (the nDCG convention); the cosines
    themselves are the bit-identical JVM fold, so rank membership
    cannot diverge cross-engine, and ``accepted`` compares the ROUNDED
    margin on both engines. Scale: brute |A|x|B| is the
    oracle-replayable exact tier; at corpus scale both directions'
    k-NN lookups route through the persisted IVF-PQ store
    (ann_store_ivfpq_topk) with each language as a query batch — the
    same margin arithmetic over its top-k output."""
    tune_session(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("vec_id"), "lang"
    )
    sided = emb.join(docs, "vec_id")
    # double cast + L2 norm hoisted per VECTOR before the bipartite
    # join (r14): one fold per pair instead of three folds + four
    # casts — same doubles, same expression tree as cosine_similarity
    # (the cosine_pairs_blocked hoist)
    from lab3_lakehouse_spark.functions.vector import _dbl, dot, l2_norm

    a = sided.filter(F.col("lang") == _XLING_SRC).select(
        F.col("vec_id").alias("src_id"),
        _dbl(F.col("embedding")).alias("__av"),
        l2_norm(F.col("embedding")).alias("__an"),
    )
    b = sided.filter(F.col("lang") == _XLING_TGT).select(
        F.col("vec_id").alias("tgt_id"),
        _dbl(F.col("embedding")).alias("__bv"),
        l2_norm(F.col("embedding")).alias("__bn"),
    )
    cos = a.crossJoin(F.broadcast(b)).select(
        "src_id",
        "tgt_id",
        (
            dot(F.col("__av"), F.col("__bv"))
            / (F.col("__an") * F.col("__bn"))
        ).alias("__c"),
    )
    wa = Window.partitionBy("src_id").orderBy(F.desc("__c"), "tgt_id")
    wb = Window.partitionBy("tgt_id").orderBy(F.desc("__c"), "src_id")
    ranked = cos.withColumn("__ra", F.row_number().over(wa)).withColumn(
        "__rb", F.row_number().over(wb)
    )
    # all three consumers below read only rows inside a k-NN cut
    # (__ra == 1 ⊆ __ra ≤ k), so cut the |src|x|tgt| frame to the
    # ≤ k(|src|+|tgt|)-row union ONCE and checkpoint it (r14): the
    # bipartite cosine scan + both ranking windows now execute once —
    # the r13 plan embedded the full crossJoin+windows subtree three
    # times (12 parquet scans, 3 BroadcastNestedLoopJoins in the
    # initial physical plan). Row sets and downstream expressions are
    # unchanged, so every emitted value is identical.
    ranked = ranked.filter(
        (F.col("__ra") <= _XLING_K) | (F.col("__rb") <= _XLING_K)
    ).localCheckpoint(eager=False)
    knn_a = (
        ranked.filter(F.col("__ra") <= _XLING_K)
        .groupBy("src_id")
        .agg((F.sum("__c") / F.lit(float(_XLING_K))).alias("__ka"))
    )
    knn_b = (
        ranked.filter(F.col("__rb") <= _XLING_K)
        .groupBy("tgt_id")
        .agg((F.sum("__c") / F.lit(float(_XLING_K))).alias("__kb"))
    )
    return (
        ranked.filter(F.col("__ra") == 1)
        .join(knn_a, "src_id")
        .join(F.broadcast(knn_b), "tgt_id")
        .select(
            "src_id",
            "tgt_id",
            round4(F.col("__c")).alias("cosine"),
            round4(
                F.col("__c") / ((F.col("__ka") + F.col("__kb")) / F.lit(2.0))
            ).alias("margin"),
        )
        .withColumn("accepted", F.col("margin") >= F.lit(_XLING_MARGIN))
    )


@query(
    "ann_topk_bruteforce",
    oracle="""
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) AS cosine,
           CAST(row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC,
                        c.vec_id) AS BIGINT) AS rank
    FROM embeddings q JOIN embeddings c ON c.vec_id != q.vec_id
    WHERE q.vec_id < 8
    QUALIFY rank <= 5
    """,
)
def ann_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 neighbors for 8 query vectors: broadcast
    queries × one corpus scan + per-query top-k window. The correctness
    baseline every ANN variant is measured against."""
    tune_session(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    return sim_ops.brute_force_topk(
        emb, emb.filter(F.col("vec_id") < 8), "vec_id", "embedding", k=5
    )


_ANN_RECALL_ORACLE = """
    SELECT CAST(count(*) AS BIGINT)     AS n_queries,
           CAST(5 * count(*) AS BIGINT) AS n_bf_pairs,
           true                         AS recall_ok
    FROM embeddings WHERE vec_id < 8
"""


def _ann_recall_stats(bf: DataFrame, ann: DataFrame, floor: float) -> DataFrame:
    """Assert-style recall check: join the ANN top-k against the exact
    brute-force top-k (both Spark-computed, deterministic seeds) and
    emit counts + a recall-floor boolean — turning the formerly
    rows-only ANN queries into driver-verifiable contracts."""
    hits = ann.select("query_id", "neighbor_id").withColumn("__hit", F.lit(1))
    joined = bf.select("query_id", "neighbor_id").join(
        hits, ["query_id", "neighbor_id"], "left"
    )
    return joined.agg(
        F.countDistinct("query_id").alias("n_queries"),
        F.count(F.lit(1)).alias("n_bf_pairs"),
        (
            F.sum(F.coalesce(F.col("__hit"), F.lit(0))) / F.count(F.lit(1))
            >= F.lit(floor)
        ).alias("recall_ok"),
    )


@query("ann_ivf_topk", oracle=_ANN_RECALL_ORACLE)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: k-means cells + n_probe search + exact re-rank — the
    index-based scale path. Emits recall vs the exact brute-force top-k
    (floor 0.7; measured 0.90–0.925 at sf0.01/sf0.1 with 16 cells,
    n_probe=8 on this near-random corpus)."""
    tune_session(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 8)
    bf = sim_ops.brute_force_topk(emb, q, "vec_id", "embedding", k=5)
    ivf = sim_ops.ivf_topk(
        emb, q, "vec_id", "embedding", k=5, n_centroids=16, n_probe=8,
    )
    return _ann_recall_stats(bf, ivf, floor=0.7)


@query("ann_ivfpq_topk", oracle=_ANN_RECALL_ORACLE)
def ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ composed ANN (faiss IVFADC, Jégou et al. 2011 §IV): the
    coarse quantizer routes each query to 8 of 16 cells and only those
    cells' PQ codes are ADC-scanned — query cost is n_probe/n_centroids
    of an already-64×-compressed code frame, the layout that actually
    holds a billion vectors. Cell ids ride the encode scan (no
    build-time join); the rank exchange carries ids + the ADC double
    only (the pq_topk skinny-exchange contract). Emits recall vs the
    exact brute-force top-k (floor 0.7 — bounded by the IVF routing's
    ~0.9 on this near-random corpus; the deep re-rank recovers
    everything the probed cells contain)."""
    tune_session(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 8)
    bf = sim_ops.brute_force_topk(emb, q, "vec_id", "embedding", k=5)
    ivfpq = sim_ops.ivfpq_topk(
        emb, q, "vec_id", "embedding",
        k=5, n_centroids=16, n_probe=8, dim=64, m=8, n_codes=32, rerank=400,
    )
    return _ann_recall_stats(bf, ivfpq, floor=0.7)


_ANN_STORE_ORACLE = """
    SELECT CAST(count(*) AS BIGINT)     AS n_queries,
           CAST(5 * count(*) AS BIGINT) AS n_bf_pairs,
           true                         AS recall_ok,
           true                         AS store_matches_memory
    FROM embeddings WHERE vec_id < 8
"""


@query("ann_store_ivfpq_topk", oracle=_ANN_STORE_ORACLE)
def ann_store_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN against a PERSISTED IVF-PQ index — the retrieval-side gap
    the BM25 postings store closed for lexical, closed for dense:
    ann_ivfpq_topk re-fits and re-encodes per call (fine for a
    one-shot audit); here the index LIVES as parquet tiers
    (operators/similarity.ivfpq_store_init — centroids + codebooks
    metadata, kilobytes; ivfpq_store_append — cell-clustered code
    rows, append cost ∝ batch, existing codes NEVER read), and the
    query probes it (ivfpq_store_topk): the routed ≤16 cell ids push
    down as a ``__cell IN`` parquet filter so the probe reads
    n_probe/n_centroids of the code tier, and the exact re-rank
    fetches its bounded float vectors from the CORPUS tier, not the
    index. The store is populated in TWO appends (vec_id parity — the
    daily-ingestion shape), exactly like the BM25 store entry.

    Differential contract: (a) recall vs the exact brute-force top-k
    (floor 0.7, the ann_ivfpq_topk bound), and (b)
    ``store_matches_memory`` — the store probe must EQUAL, triple for
    triple, an in-memory probe of the same fitted index (same stored
    centroids/codebooks, same assignment and encode expressions), so
    the parquet round-trip + pushdown + append-path encode are pinned
    against the known-good in-memory path. Eager by necessity (store
    build at call time; root via _util.scratch_dir — see its
    documented local-mode assumption)."""
    import shutil

    from lab3_lakehouse_spark.queries._util import scratch_dir

    tune_session(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 8)
    bf = sim_ops.brute_force_topk(emb, q, "vec_id", "embedding", k=5)
    root = scratch_dir("ivfpq_store_")
    try:
        fit = sim_ops.ivfpq_store_init(
            root, emb, "vec_id", "embedding",
            n_centroids=16, dim=64, m=8, n_codes=32,
        )
        for residue in (0, 1):
            sim_ops.ivfpq_store_append(
                spark, root,
                emb.filter(F.pmod("vec_id", F.lit(2)) == residue),
                "vec_id", "embedding",
                meta=fit,  # same-process appends reuse the just-written fit
            )
        # ONE read-back of the persisted metadata tiers serves BOTH the
        # probe and the twin below (r14: was four separate tier loads —
        # init's duplicate fit collects + one load per append/probe/twin;
        # the parquet round-trip of the meta tiers stays witnessed here)
        cents, books = sim_ops.ivfpq_load_meta(spark, root)
        # the bounded (≤ |q|·k rows) probe result feeds recall stats AND
        # both exceptAll legs — checkpoint so the probe pipeline (store
        # read + ADC + re-rank) runs once, not three times
        store = sim_ops.ivfpq_store_topk(
            spark, root, emb, q, "vec_id", "embedding",
            k=5, n_probe=8, rerank=400, meta=(cents, books),
        ).localCheckpoint(eager=False)
        # in-memory twin SHARING the stored fit: same centroids, same
        # codebooks, same assignment/encode expressions — the only
        # difference is whether the code rows round-tripped parquet
        mem_index = sim_ops.pq_encode(
            sim_ops.assign_cells_literal(emb, "vec_id", "embedding", cents),
            "neighbor_id", "__cvec", books, keep=("__cell",),
        ).select("neighbor_id", "__cell", "__codes")
        rerank_vecs = emb.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").alias("__cvec"),
        )
        mem = sim_ops.ivfpq_probe_index(
            mem_index, books, cents, q, "vec_id", "embedding",
            rerank_vecs, k=5, n_probe=8, rerank=400,
        ).localCheckpoint(eager=False)  # feeds both exceptAll legs
        s_t = store.select("query_id", "neighbor_id", "rank")
        m_t = mem.select("query_id", "neighbor_id", "rank")
        match = (
            s_t.exceptAll(m_t)
            .unionByName(m_t.exceptAll(s_t))
            .agg((F.count(F.lit(1)) == 0).alias("store_matches_memory"))
        )
        out = _ann_recall_stats(bf, store, floor=0.7).crossJoin(match)
        # pin the 1-row result in executor block storage so the temp
        # tier can be deleted (the bm25_postings_topk pattern)
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


_REINDEX_DRIFT_THRESHOLD = 0.99

_REINDEX_SWAP_ORACLE = f"""
    WITH e AS (
        SELECT vec_id % 2 = 0 AS is_ref, t.i AS dim, embedding[t.i] AS v
        FROM embeddings, generate_series(1, 64) AS t(i)  -- dim=64
    ), cent AS (
        SELECT dim,
               {sql_round4('avg(CASE WHEN is_ref THEN v END)')} AS a,
               {sql_round4('avg(CASE WHEN NOT is_ref THEN v END)')} AS b
        FROM e GROUP BY dim
    ), d AS (
        SELECT sum(a * b) AS ab, sum(a * a) AS aa, sum(b * b) AS bb
        FROM cent
    ), nq AS (
        SELECT CAST(count(*) AS BIGINT) AS n
        FROM embeddings WHERE vec_id < 8
    )
    SELECT nq.n AS n_queries,
           CAST(5 * nq.n AS BIGINT) AS n_bf_pairs,
           {sql_round4('d.ab / (sqrt(d.aa) * sqrt(d.bb))')}
               AS drift_cosine,
           {sql_round4('d.ab / (sqrt(d.aa) * sqrt(d.bb))')}
               < {_REINDEX_DRIFT_THRESHOLD} AS reindex_triggered,
           true AS recall_ok,
           true AS swap_serves_refit,
           true AS fit_changed
    FROM d CROSS JOIN nq
"""


@query("ann_store_reindex_swap", oracle=_REINDEX_SWAP_ORACLE)
def ann_store_reindex_swap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The drift→reindex loop CLOSED end-to-end — the 100 TB operation
    the r12 pieces exist for (embedding_centroid_drift built the
    monitor, stores.swap_root the executable swap-in): a live IVF-PQ
    store whose fit has gone STALE (fitted on the reference half only
    — yesterday's distribution), a drift monitor that detects the
    shift, a refit+re-encode into a NEW root (never touching the live
    store — the gc_write discipline), an atomic ``swap_root``
    promotion, and a post-swap probe that must serve the REFIT index
    with full recall. In production this runs as: monitor fires →
    refit centroids/codebooks on a bounded sample (constant cost) →
    one linear re-encode pass of the corpus into the new root → swap
    → probes never see a half-updated index.

    Differential contract: (a) ``drift_cosine`` + ``reindex_triggered``
    — the monitor value itself is cross-engine checked (global
    ref-vs-candidate centroid cosine, per-dim means round4-pinned, the
    embedding_centroid_drift policy; the synthetic halves are
    independent draws, so the cosine sits near 0 and the < 0.99
    trigger fires deterministically at every SF); (b) ``recall_ok`` —
    the POST-swap probe of the live root must reach the brute-force
    recall floor (0.7, the ann_store_ivfpq_topk bound), so the swapped
    index actually answers; (c) ``swap_serves_refit`` — the post-swap
    store probe must EQUAL, triple for triple, an in-memory probe
    built from the refit metadata captured from the NEW root BEFORE
    the swap — proving the old path now serves the new index, not a
    cached or half-swapped one; (d) ``fit_changed`` — the refit
    centroids must differ from the stale ones (the swap moved real
    bits). Eager by necessity (store lifecycle at call time; roots via
    _util.scratch_dir — see its documented local-mode assumption)."""
    import shutil

    from lab3_lakehouse_spark import stores
    from lab3_lakehouse_spark.queries._util import scratch_dir

    tune_session(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 8)
    bf = sim_ops.brute_force_topk(emb, q, "vec_id", "embedding", k=5)
    is_ref = F.pmod("vec_id", F.lit(2)) == 0
    root = scratch_dir("ivfpq_reindex_")
    new_root = root.rstrip("/") + ".refit"
    try:
        # live store with the STALE fit: centroids/codebooks fitted on
        # the reference half only, full corpus appended in two batches
        stale_fit = sim_ops.ivfpq_store_init(
            root, emb.filter(is_ref), "vec_id", "embedding",
            n_centroids=16, dim=64, m=8, n_codes=32,
        )
        for residue in (0, 1):
            sim_ops.ivfpq_store_append(
                spark, root,
                emb.filter(F.pmod("vec_id", F.lit(2)) == residue),
                "vec_id", "embedding",
                meta=stale_fit,  # same-process ingestion reuses the fit
            )
        old_cents = stale_fit[0]

        # monitor: global ref-vs-candidate centroid cosine (the
        # embedding_centroid_drift math without the label split)
        e = emb.select(
            is_ref.alias("is_ref"), F.posexplode("embedding").alias("dim", "v")
        )
        cent = e.groupBy("dim").agg(
            round4(F.avg(F.when(F.col("is_ref"), F.col("v")))).alias("a"),
            round4(F.avg(F.when(~F.col("is_ref"), F.col("v")))).alias("b"),
        )
        cos = F.col("ab") / (F.sqrt(F.col("aa")) * F.sqrt(F.col("bb")))
        drift = cent.agg(
            F.sum(F.col("a") * F.col("b")).alias("ab"),
            F.sum(F.col("a") * F.col("a")).alias("aa"),
            F.sum(F.col("b") * F.col("b")).alias("bb"),
        ).select(
            round4(cos).alias("drift_cosine"),
            (round4(cos) < F.lit(_REINDEX_DRIFT_THRESHOLD)).alias(
                "reindex_triggered"
            ),
        )

        # refit on the FULL current corpus + linear re-encode, all into
        # a NEW root — the live store is never written during the GC
        refit = sim_ops.ivfpq_store_init(
            new_root, emb, "vec_id", "embedding",
            n_centroids=16, dim=64, m=8, n_codes=32,
        )
        # the re-encode is a GC pass, not daily ingestion: ONE linear
        # append of the whole corpus (the live store's two-batch append
        # history above is the daily shape; the refit compacts it)
        sim_ops.ivfpq_store_append(
            spark, new_root, emb, "vec_id", "embedding", meta=refit
        )
        # capture the refit metadata from the NEW root BEFORE the swap:
        # the in-memory twin below is the independent witness that the
        # post-swap probe serves THIS fit
        new_cents, new_books = sim_ops.ivfpq_load_meta(spark, new_root)
        mem_index = sim_ops.pq_encode(
            sim_ops.assign_cells_literal(
                emb, "vec_id", "embedding", new_cents
            ),
            "neighbor_id", "__cvec", new_books, keep=("__cell",),
        ).select("neighbor_id", "__cell", "__codes")
        rerank_vecs = emb.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").alias("__cvec"),
        )
        mem = sim_ops.ivfpq_probe_index(
            mem_index, new_books, new_cents, q, "vec_id", "embedding",
            rerank_vecs, k=5, n_probe=8, rerank=400,
        ).localCheckpoint(eager=False)  # feeds both exceptAll legs

        retired = stores.swap_root(root, new_root)
        shutil.rmtree(retired, ignore_errors=True)

        # post-swap probe of the LIVE root — now the refit index
        store = sim_ops.ivfpq_store_topk(
            spark, root, emb, q, "vec_id", "embedding",
            k=5, n_probe=8, rerank=400,
        ).localCheckpoint(eager=False)
        s_t = store.select("query_id", "neighbor_id", "rank")
        m_t = mem.select("query_id", "neighbor_id", "rank")
        match = (
            s_t.exceptAll(m_t)
            .unionByName(m_t.exceptAll(s_t))
            .agg((F.count(F.lit(1)) == 0).alias("swap_serves_refit"))
        )
        out = (
            _ann_recall_stats(bf, store, floor=0.7)
            .crossJoin(drift)
            .crossJoin(match)
            .withColumn("fit_changed", F.lit(old_cents != new_cents))
            .select(
                "n_queries", "n_bf_pairs", "drift_cosine",
                "reindex_triggered", "recall_ok", "swap_serves_refit",
                "fit_changed",
            )
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)
        shutil.rmtree(new_root, ignore_errors=True)
        shutil.rmtree(root.rstrip("/") + ".retired", ignore_errors=True)


_BAND_REBALANCE_ORACLE = f"""
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           {sql_round4('pow(1.0/16.0, 1.0/4.0)')} AS old_midpoint,
           {sql_round4('pow(1.0/32.0, 1.0/2.0)')} AS new_midpoint,
           true AS rebanded_matches_direct,
           true AS old_candidates_preserved,
           true AS swap_serves_rebanded
    FROM documents
"""


@query("minhash_band_rebalance", oracle=_BAND_REBALANCE_ORACLE)
def minhash_band_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold RETARGETING on the persisted LSH signature store —
    the maintenance op every dedup deployment eventually needs: the
    similarity threshold moves (here the banding midpoint drops from
    (1/16)^(1/4) = 0.5 to (1/32)^(1/2) ≈ 0.18 — catch more distant
    near-dups), which means a different (bands, rows-per-band) split
    of the SAME minhash permutations. Because the store's ``hashes``
    tier persists per-doc shingle-hash arrays, the re-band is ONE pass
    over that tier (operators/dedup.rebalance_signature_store) into a
    NEW root — the corpus text is never re-read or re-tokenized, which
    at 100 TB is the difference between a store-sized job and a full
    corpus re-scan — then ``stores.swap_root`` promotes it atomically.

    Differential contract: (a) ``rebanded_matches_direct`` — the bands
    tier rebuilt FROM THE STORE must equal, row for row, a direct
    re-band of the corpus-derived hash frame (the expensive path the
    store makes unnecessary); (b) ``old_candidates_preserved`` — with
    num_perm fixed and bands doubled, every old band's row block
    splits in two, so the old candidate set must be a SUBSET of the
    new one (monotone recall: loosening the threshold never loses
    pairs); (c) ``swap_serves_rebanded`` — the post-swap probe of the
    LIVE path must produce exactly the direct-twin candidate set; (d)
    the two S-curve midpoints are emitted as cross-engine-checked
    values (closed-form, round4). Eager by necessity (store lifecycle
    at call time; roots via _util.scratch_dir)."""
    import shutil

    from lab3_lakehouse_spark import stores
    from lab3_lakehouse_spark.queries._util import scratch_dir

    tune_session(spark)
    docs = load_table(spark, sf_dir, "documents")
    root = scratch_dir("minhash_rebal_")
    new_root = root.rstrip("/") + ".rebanded"
    try:
        hashed = docs.select(
            F.col("doc_id").alias("__id"),
            dedup_ops.shingle_hashes("text", 3).alias("__h"),
        ).localCheckpoint(eager=True)
        for residue in (0, 1):
            dedup_ops.minhash_store_append(
                root,
                hashed.filter(F.pmod("__id", F.lit(2)) == residue),
                num_perm=64,
                bands=16,
            )
        # pre-swap snapshot of the OLD candidate set — the live bands
        # tier is replaced below, so pin the rows now
        old_cands = dedup_ops.minhash_lsh_candidates_from_bands(
            stores.read_tier(spark, root, "bands")
        ).localCheckpoint(eager=True)

        # the re-band: one pass over the hashes tier, corpus never read
        dedup_ops.rebalance_signature_store(
            spark, root, new_root, num_perm=64, bands=32
        )
        # direct twin: re-band the corpus-derived hash frame (what the
        # store path must reproduce without touching text). Lazy
        # checkpoint (r14): the twin feeds both match_bands exceptAll
        # legs AND the candidate self-join behind swap_ok — without the
        # pin the 64-perm re-band evaluated up to 4x in one action.
        direct = dedup_ops.banded_signatures(hashed, 64, 32).localCheckpoint(
            eager=False
        )
        key = ["__id", "band", "bh"]
        rb = stores.read_tier(spark, new_root, "bands").select(*key)
        match_bands = (
            rb.exceptAll(direct.select(*key))
            .unionByName(direct.select(*key).exceptAll(rb))
            .agg(
                (F.count(F.lit(1)) == 0).alias("rebanded_matches_direct")
            )
            .localCheckpoint(eager=True)  # executes BEFORE the swap
        )                                 # renames new_root away

        retired = stores.swap_root(root, new_root)
        shutil.rmtree(retired, ignore_errors=True)

        # post-swap probe of the LIVE path — now the rebanded tier
        live_cands = dedup_ops.minhash_lsh_candidates_from_bands(
            stores.read_tier(spark, root, "bands")
        ).localCheckpoint(eager=False)  # feeds equality AND subset legs
        direct_cands = dedup_ops.minhash_lsh_candidates_from_bands(direct)
        pk = ["id_a", "id_b"]
        swap_ok = (
            live_cands.select(*pk).exceptAll(direct_cands.select(*pk))
            .unionByName(
                direct_cands.select(*pk).exceptAll(live_cands.select(*pk))
            )
            .agg((F.count(F.lit(1)) == 0).alias("swap_serves_rebanded"))
        )
        preserved = (
            old_cands.join(live_cands, pk, "left_anti")
            .agg(
                (F.count(F.lit(1)) == 0).alias("old_candidates_preserved")
            )
        )
        out = (
            docs.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
            .crossJoin(match_bands)
            .crossJoin(preserved)
            .crossJoin(swap_ok)
            .select(
                "n_docs",
                round4(
                    F.pow(F.lit(1.0 / 16.0), F.lit(1.0 / 4.0))
                ).alias("old_midpoint"),
                round4(
                    F.pow(F.lit(1.0 / 32.0), F.lit(1.0 / 2.0))
                ).alias("new_midpoint"),
                "rebanded_matches_direct",
                "old_candidates_preserved",
                "swap_serves_rebanded",
            )
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)
        shutil.rmtree(new_root, ignore_errors=True)
        shutil.rmtree(root.rstrip("/") + ".retired", ignore_errors=True)


_STORE_RERANK_DEPTH = 10

_STORE_RERANK_ORACLE = f"""
    SELECT CAST(count(*) AS BIGINT) AS n_queries,
           CAST({_STORE_RERANK_DEPTH} * count(*) AS BIGINT) AS n_pairs,
           CAST({_STORE_RERANK_DEPTH} * count(*) AS BIGINT) AS udf_rows,
           true AS udf_saw_only_candidates,
           true AS rerank_matches_twin
    FROM embeddings WHERE vec_id < {_BM25_QUERIES}
"""


@query("rerank_store_candidates", oracle=_STORE_RERANK_ORACLE)
def rerank_store_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The two r10 retrieval pieces COMPOSED into the production
    pipeline shape: first stage = the PERSISTED IVF-PQ index probe
    (ann_store_ivfpq_topk's path — routed ``__cell IN`` sliver read +
    ADC + bounded exact re-rank), second stage = the REAL Arrow-batched
    pandas-UDF cross-encoder slot (operators/text.crossencoder_rerank)
    over the ≤ |queries|·depth candidate pairs with both texts fetched
    by broadcast joins — the corpus text tier is scanned ONCE, for the
    candidate fetch; the expensive scorer never sees it at all.

    Differential contract (assert-style, the ANN-store pattern):
    (a) ``udf_rows`` — a Spark accumulator inside the scorer counts
    every row it EVER scored; the entry pins it equal to the candidate
    pair count (queries × depth), proving the composed plan feeds the
    UDF exactly the bounded frame and nothing else (the economics of
    rerankers at 100 TB, now pinned through the store-backed first
    stage, not just the RRF one); (b) ``rerank_matches_twin`` — the
    UDF's coverage score must equal, row for row after round4, the JVM
    expression twin (array_intersect/size) on the same frame, pinning
    the Arrow batch path against whole-stage codegen. Eager by
    necessity (store build + accumulator read at call time)."""
    import shutil

    from lab3_lakehouse_spark.queries._util import round4 as _r4
    from lab3_lakehouse_spark.queries._util import scratch_dir

    tune_session(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    q = emb.filter(F.col("vec_id") < _BM25_QUERIES)
    root = scratch_dir("ivfpq_rerank_store_")
    try:
        fit = sim_ops.ivfpq_store_init(
            root, emb, "vec_id", "embedding",
            n_centroids=16, dim=64, m=8, n_codes=32,
        )
        for residue in (0, 1):
            sim_ops.ivfpq_store_append(
                spark, root,
                emb.filter(F.pmod("vec_id", F.lit(2)) == residue),
                "vec_id", "embedding",
                meta=fit,  # same-process appends reuse the just-written fit
            )
        cands = sim_ops.ivfpq_store_topk(
            spark, root, emb, q, "vec_id", "embedding",
            k=_STORE_RERANK_DEPTH, n_probe=8, rerank=400, meta=fit,
        ).select(
            "query_id",
            F.col("neighbor_id").alias("doc_id"),
            F.col("rank").alias("ann_rank"),
        )
        # candidate text fetch: the ONLY corpus-text scan in the plan —
        # query texts are the first 4 tokens (the catalog's query
        # convention), doc texts ride a broadcast of the ≤ q·depth frame
        qt = docs.filter(F.col("doc_id") < _BM25_QUERIES).select(
            F.col("doc_id").alias("query_id"),
            F.array_join(
                F.slice(F.split(F.lower(F.col("text")), r"\s+"), 1, 4), " "
            ).alias("__qtext"),
        )
        dt = docs.select("doc_id", F.col("text").alias("__dtext"))
        pairs = (
            dt.join(F.broadcast(cands), "doc_id")
            .join(F.broadcast(qt), "query_id")
        )
        acc = spark.sparkContext.accumulator(0)
        reranked = text_ops.crossencoder_rerank(
            pairs,
            scorer=text_ops.coverage_crossencoder_udf(acc),
            tie_cols=("ann_rank",),
        ).localCheckpoint(eager=True)  # materialize → accumulator final
        udf_rows = int(acc.value)
        # JVM expression twin of the UDF's coverage on the SAME frame
        qtok = F.array_distinct(F.split(F.lower(F.col("__qtext")), r"\s+"))
        dtok = F.array_distinct(F.split(F.lower(F.col("__dtext")), r"\s+"))
        twin = F.size(F.array_intersect(qtok, dtok)).cast("double") / F.size(
            qtok
        )
        stats = reranked.agg(
            F.countDistinct("query_id").cast("long").alias("n_queries"),
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.min(_r4(F.col("ce_score")) == _r4(twin)).alias(
                "rerank_matches_twin"
            ),
        )
        out = stats.select(
            "n_queries",
            "n_pairs",
            F.lit(udf_rows).cast("long").alias("udf_rows"),
            (F.lit(udf_rows) == F.col("n_pairs")).alias(
                "udf_saw_only_candidates"
            ),
            "rerank_matches_twin",
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@query(
    "doc_fingerprint_matches",
    oracle="""
    WITH w AS (
      SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS w FROM documents
    ), sh AS (
      SELECT doc_id, unnest(list_distinct(
           list_transform(generate_series(1, greatest(len(w)-5, 1)),
                          i -> array_to_string(w[i:i+5], ' ')))) AS s
      FROM w
    )
    SELECT CAST(count(*) AS BIGINT) AS n_guaranteed_pairs,
           true AS guarantee_ok, true AS precision_ok
    FROM (SELECT DISTINCT a.doc_id, b.doc_id
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id)
    """,
)
def doc_fingerprint_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowed rolling-hash fingerprints (MOSS-style copy detection,
    k=3-word shingles, window w=4): docs sharing a fingerprint are
    copy-candidates — the shuffle key is the 64-bit fingerprint, never
    text.

    Oracle-checked via the two theorems that bound winnowing:
    (⊇) any pair sharing a run of ≥ w+k-1 = 6 words MUST share a
    fingerprint (``guarantee_ok``); (⊆) any pair sharing a fingerprint
    shares a 3-word shingle (``precision_ok``). The guaranteed-pair
    count is computed exactly by BOTH engines (Spark on shingle hashes,
    DuckDB on shingle strings) — a real cross-engine check, with the two
    containments asserted Spark-side. The raw fingerprint groups stay
    available via operators.text.winnowed_fingerprints."""
    tune_session(spark)
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    # Tokenize + hash tokens ONCE; all three shingle widths (winnowed
    # k=3, guarantee k=6, precision k=3) derive from this checkpointed
    # token-hash frame instead of re-scanning + re-tokenizing text 3×.
    base = docs.select(
        "doc_id", dedup_ops.token_hashes("text").alias("__th")
    ).localCheckpoint(eager=False)
    fps = base.select(
        "doc_id",
        F.explode(
            text_ops.winnowed_fingerprints_from_shingle_hashes(
                dedup_ops.shingle_hashes_from_token_hashes(F.col("__th"), 3), w=4
            )
        ).alias("fp"),
    )
    a, b = fps.alias("a"), fps.alias("b")
    fp_pairs = (
        a.join(
            b,
            on=[F.col("a.fp") == F.col("b.fp"), F.col("a.doc_id") < F.col("b.doc_id")],
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )
    sh6 = base.select(
        "doc_id",
        F.explode(
            dedup_ops.shingle_hashes_from_token_hashes(F.col("__th"), 6)
        ).alias("sh"),
    )
    g_pairs = (
        sh6.alias("a")
        .join(
            sh6.alias("b"),
            on=[F.col("a.sh") == F.col("b.sh"), F.col("a.doc_id") < F.col("b.doc_id")],
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )
    guarantee = g_pairs.join(fp_pairs, ["id_a", "id_b"], "left_anti").agg(
        (F.count(F.lit(1)) == 0).alias("guarantee_ok")
    )
    n_guaranteed = g_pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n_guaranteed_pairs")
    )
    sh3 = base.select(
        "doc_id",
        dedup_ops.shingle_hashes_from_token_hashes(F.col("__th"), 3).alias("sh3"),
    )
    precision = (
        fp_pairs.join(sh3.withColumnRenamed("doc_id", "id_a"), "id_a")
        .withColumnRenamed("sh3", "__sa")
        .join(sh3.withColumnRenamed("doc_id", "id_b"), "id_b")
        .agg(
            F.coalesce(
                F.min(F.size(F.array_intersect(F.col("__sa"), F.col("sh3"))) > 0),
                F.lit(True),
            ).alias("precision_ok")
        )
    )
    return (
        n_guaranteed.crossJoin(guarantee)
        .crossJoin(precision)
        .select("n_guaranteed_pairs", "guarantee_ok", "precision_ok")
    )


@query("ann_pq_topk", oracle=_ANN_RECALL_ORACLE)
def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (Jégou et al. 2011): each 64-float
    vector compresses to 8 codes from per-subspace codebooks (m=8,
    n_codes=32 → 5 bytes/vector vs 256 — the representation that makes
    billion-vector search fit in memory at all); queries scan the CODE
    frame with per-query distance lookup tables (ADC) and only the
    ADC top-400 touch the original floats for the exact re-rank.
    Codebooks are Lloyd-fit on a bounded hash-deterministic sample
    (the faiss convention — codebook quality saturates thousands of
    vectors before the corpus does). Emits recall vs the exact
    brute-force top-k (floor 0.8; measured 1.0 at sf0.01/sf0.1 —
    near-random embeddings need the deep re-rank, clustered real
    embeddings get away with far less)."""
    tune_session(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 8)
    bf = sim_ops.brute_force_topk(emb, q, "vec_id", "embedding", k=5)
    coded, books = sim_ops.pq_build(
        emb, "vec_id", "embedding", dim=64, m=8, n_codes=32
    )
    pq = sim_ops.pq_topk(
        coded, books, q, "vec_id", "embedding", k=5, rerank=400
    )
    return _ann_recall_stats(bf, pq, floor=0.8)


@query("ann_lsh_topk", oracle=_ANN_RECALL_ORACLE)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH ANN: bucket join + exact re-rank — the
    scale path when |queries| is too large for brute force. Emits recall
    vs the exact brute-force top-k (floor 0.8; measured 0.975–1.0 at
    sf0.01/sf0.1 with 4-bit hashes × 32 tables — this corpus is
    near-random, so recall needs many short hashes; clustered real
    embeddings get away with longer hashes and fewer tables)."""
    tune_session(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 8)
    bf = sim_ops.brute_force_topk(emb, q, "vec_id", "embedding", k=5)
    lsh = sim_ops.rp_lsh_topk(
        emb, q, "vec_id", "embedding", dim=64, k=5, n_bits=4, n_tables=32,
    )
    return _ann_recall_stats(bf, lsh, floor=0.8)


# ------------------------------------------------------ text analysis ----

_SW_SQL = "['" + "','".join(text_ops.STOPWORDS) + "']"


@query(
    "text_quality_features",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_split_to_array(text, '\\s+')) AS BIGINT) AS n_tokens,
           (length(text)::DOUBLE - (len(regexp_split_to_array(text, '\\s+')) - 1)::DOUBLE)
             / len(regexp_split_to_array(text, '\\s+'))::DOUBLE     AS mean_token_len,
           len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                           w -> list_contains({_SW_SQL}, w)))::DOUBLE
             / len(regexp_split_to_array(text, '\\s+'))::DOUBLE     AS stopword_ratio,
           len(regexp_extract_all(text, '[.,;:!?]'))::DOUBLE
             / length(text)::DOUBLE                     AS punct_ratio,
           len(regexp_extract_all(text, '[0-9]'))::DOUBLE
             / length(text)::DOUBLE                     AS digit_ratio
    FROM documents
    """,
)
def text_quality_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-signal features (Gopher/C4-style): token stats, stopword/
    punct/digit ratios — pure scan-pipeline expressions."""
    tune_session(spark)
    docs = load_table(spark, sf_dir, "documents")
    out = text_ops.quality_features(docs.select("doc_id", "text"), "text")
    return out.select(
        "doc_id", "n_tokens", "mean_token_len",
        "stopword_ratio", "punct_ratio", "digit_ratio",
    )


def _lang_score_sql(markers: tuple[str, ...]) -> str:
    lst = "['" + "','".join(markers) + "']"
    return (
        f"len(list_filter(regexp_split_to_array(lower(text), '\\s+'), "
        f"w -> list_contains({lst}, w)))"
    )


_LANG_SCORES = {
    lang: _lang_score_sql(m) for lang, m in text_ops.LANG_MARKERS.items()
}
_GREATEST = "greatest(" + ", ".join(f"s_{lang}" for lang in _LANG_SCORES) + ")"
_LANG_CASE = (
    "CASE WHEN " + _GREATEST + " = 0 THEN 'und' "
    + " ".join(
        f"WHEN s_{lang} = {_GREATEST} THEN '{lang}'" for lang in _LANG_SCORES
    )
    + " END"
)


@query(
    "lang_id_predictions",
    oracle=f"""
    WITH s AS (
        SELECT doc_id, lang, text,
               {", ".join(f"{sql} AS s_{lang}" for lang, sql in _LANG_SCORES.items())}
        FROM documents
    )
    SELECT doc_id, lang,
           {_LANG_CASE} AS lang_pred,
           CAST({_LANG_CASE} = lang AS BIGINT) AS is_match
    FROM s
    """,
)
def lang_id_predictions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language-ID heuristic vs the labeled lang column.
    (Real pipelines plug fastText here; the operator contract — text in,
    lang code out — is the same.)"""
    tune_session(spark)
    docs = load_table(spark, sf_dir, "documents")
    pred = text_ops.lang_id_heuristic(F.col("text"))
    return docs.select(
        "doc_id",
        "lang",
        pred.alias("lang_pred"),
        (pred == F.col("lang")).cast("long").alias("is_match"),
    )


@query(
    "token_counts",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_split_to_array(text, '\\s+')) AS BIGINT)   AS n_ws_tokens,
           CAST(len(regexp_extract_all(text,
                '{text_ops.BPE_ISH_PATTERN}')) AS BIGINT)  AS n_bpe_ish_tokens,
           CAST(length(text) AS BIGINT)                    AS n_chars_measured
    FROM documents
    """,
)
def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token accounting: whitespace tokens + BPE-ish regex sub-word
    tokens — the budget columns every training-data pipeline carries."""
    tune_session(spark)
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        text_ops.token_count("text").alias("n_ws_tokens"),
        text_ops.bpe_ish_token_count("text").alias("n_bpe_ish_tokens"),
        F.length("text").cast("long").alias("n_chars_measured"),
    )


_BPE_SQL = (
    "len(regexp_extract_all(text, '" + text_ops.BPE_ISH_PATTERN + "'))"
)
_WORDS_SQL = "len(regexp_split_to_array(text, '\\s+'))"
_BYTES_SQL = "octet_length(encode(text))"

_FERTILITY_ORACLE = f"""
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum({_BPE_SQL}) AS BIGINT) AS n_bpe_ish,
           CAST(sum({_WORDS_SQL}) AS BIGINT) AS n_words,
           CAST(sum({_BYTES_SQL}) AS BIGINT) AS n_bytes,
           {sql_round4(f'sum({_BPE_SQL})::DOUBLE / sum({_WORDS_SQL})')}
               AS fertility,
           {sql_round4(f'sum({_BYTES_SQL})::DOUBLE / sum({_BPE_SQL})')}
               AS bytes_per_token
    FROM documents GROUP BY source
"""

@query(
    "tokenizer_fertility_by_source",
    oracle=_FERTILITY_ORACLE,
)
def tokenizer_fertility_by_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Tokenizer FERTILITY per source — subword tokens per word, plus
    bytes per subword token: the compression diagnostic that decides
    token budgets and flags sources a tokenizer handles badly (high
    fertility = the vocabulary fragments that domain — code, non-Latin
    scripts, URLs — so its token share silently exceeds its byte
    share in the training mix). Pure scan-side Catalyst counting
    (BPE-ish regex pre-tokenizer, whitespace words, UTF-8 bytes) into
    ONE grouped pass keyed on the ≤ n_sources source column — at
    100 TB this costs the scan it is fused into."""
    tune_session(spark)
    docs = load_table(spark, sf_dir, "documents")
    bpe = text_ops.bpe_ish_token_count("text")
    words = text_ops.token_count("text")
    nbytes = F.octet_length(F.encode(F.col("text"), "UTF-8")).cast("long")
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(bpe).cast("long").alias("n_bpe_ish"),
        F.sum(words).cast("long").alias("n_words"),
        F.sum(nbytes).cast("long").alias("n_bytes"),
        round4(
            F.sum(bpe).cast("double") / F.sum(words).cast("double")
        ).alias("fertility"),
        round4(
            F.sum(nbytes).cast("double") / F.sum(bpe).cast("double")
        ).alias("bytes_per_token"),
    )


# -------------------------------------------------------- multimodal ----

@query(
    "binary_media_metadata",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           sha256(text)                               AS content_sha256
    FROM documents
    """,
)
def binary_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary media column + typed metadata, derived JVM-side
    (octet_length / sha2). The corpus has no real media, so payloads are
    UTF-8 bytes of text — the plumbing is payload-agnostic."""
    tune_session(spark)
    docs = load_table(spark, sf_dir, "documents")
    with_bin = mm_ops.text_as_binary(docs, "text", "content")
    with_meta = mm_ops.attach_media_metadata(with_bin, "content", "image")
    return with_meta.select(
        "doc_id",
        F.col("content_meta.n_bytes").alias("n_bytes"),
        F.sha2(F.col("text"), 256).alias("content_sha256"),
    )


@query(
    "media_phash_dup_partners",
    oracle="""
    SELECT a.doc_id, CAST(count(*) AS BIGINT) AS n_dup_partners
    FROM documents a JOIN documents b
      ON a.source = b.source AND a.doc_id != b.doc_id
    GROUP BY a.doc_id
    """,
)
def media_phash_dup_partners(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash media dedup end-to-end: per document, how many
    other documents carry a near-identical image (Hamming ≤ 6 on the
    64-bit aHash). The payload stand-in is the SOURCE name's bytes — a
    per-site banner image, so same-source docs share a picture — which
    gives the differential check teeth: identical payloads MUST meet at
    Hamming 0 through the banded join (the oracle is the same-source
    pair count), and the ~2⁻³⁴ chance that two DIFFERENT FakeCodec
    pixel fields land within 6 bits makes false pairs impossible in
    practice. The full path is production-shaped: one Arrow decode
    pass (mapInPandas), 16-bit-chunk banding, JVM bit_count — no
    all-pairs stage anywhere (operators/multimodal.media_phash_pairs)."""
    tune_session(spark)
    docs = load_table(spark, sf_dir, "documents")
    with_bin = mm_ops.text_as_binary(docs, "source", "content")
    pairs = mm_ops.media_phash_pairs(
        with_bin, id_col="doc_id", binary_col="content", max_hamming=6
    )
    sym = pairs.select(F.col("id_a").alias("doc_id")).unionAll(
        pairs.select(F.col("id_b").alias("doc_id"))
    )
    return sym.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_dup_partners")
    )


@query(
    "media_phash_store_partners",
    oracle="""
    SELECT a.doc_id, CAST(count(*) AS BIGINT) AS n_dup_partners
    FROM documents a JOIN documents b
      ON a.source = b.source AND a.doc_id != b.doc_id
    GROUP BY a.doc_id
    """,
)
def media_phash_store_partners(spark: SparkSession, sf_dir: str) -> DataFrame:
    """media_phash_dup_partners against a PERSISTED signature tier —
    the store member of the media-dedup family: the expensive Arrow
    decode runs ONCE at ingestion (operators/multimodal.
    phash_store_append — two doc_id-parity appends here, the
    daily-crawl shape; an append never reads the store), and the dedup
    probe (phash_pairs_from_store) reads 16-byte ``(doc_id, phash)``
    rows — at 10⁹ images the probe touches GBs of signatures, never
    the media. Banded-Hamming machinery, partner rollup, and the
    same-source differential oracle are shared verbatim with the
    decode-per-call twin, so the driver pins that the store round-trip
    changes nothing. Eager by necessity (store build at call time;
    root via _util.scratch_dir — see its local-mode note)."""
    import shutil

    from lab3_lakehouse_spark.queries._util import scratch_dir

    tune_session(spark)
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    with_bin = mm_ops.text_as_binary(docs, "source", "content")
    root = scratch_dir("phash_store_")
    try:
        for residue in (0, 1):
            mm_ops.phash_store_append(
                root,
                with_bin.filter(F.pmod("doc_id", F.lit(2)) == residue),
                id_col="doc_id",
                binary_col="content",
            )
        pairs = mm_ops.phash_pairs_from_store(spark, root, max_hamming=6)
        sym = pairs.select(F.col("id_a").alias("doc_id")).unionAll(
            pairs.select(F.col("id_b").alias("doc_id"))
        )
        out = sym.groupBy("doc_id").agg(
            F.count(F.lit(1)).cast("long").alias("n_dup_partners")
        )
        # pin past the temp tier's deletion (the store-entry pattern)
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


@query(
    "media_decode_features",
    oracle="""
    SELECT doc_id,
           CAST(32 + CAST(('0x' || substr(sha256(text), 1, 2)) AS INTEGER) % 97
                AS INTEGER) AS width,
           CAST(32 + CAST(('0x' || substr(sha256(text), 3, 2)) AS INTEGER) % 97
                AS INTEGER) AS height
    FROM documents
    """,
)
def media_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched mapInPandas decode+featurize (FakeCodec stands in
    for Pillow/torchaudio — see operators/multimodal.py). Exercises the
    real batch-iterator plumbing and schema contract.

    Oracle-checked end-to-end: FakeCodec derives image dims from the
    payload's sha256 (width/height = 32 + digest byte % 97), which the
    oracle recomputes in SQL from the hex digest — so the whole Python
    decode path (Arrow batches in, decoded rows out) is verified against
    an independent engine. The numpy-RNG pixel features
    (mean_intensity / feature_vec) stay in the operator API, covered by
    unit tests (tests/test_llmdata.py)."""
    tune_session(spark)
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    with_bin = mm_ops.text_as_binary(docs, "text", "content")
    out = mm_ops.decode_and_featurize_images(with_bin, "doc_id", "content")
    return out.select("doc_id", "width", "height")


@query(
    "media_frame_sample",
    oracle="""
    WITH d AS (
        SELECT doc_id, text, ((length(text) - 1) // 64) // 4 AS max_i
        FROM documents WHERE length(text) > 0
    ), idx AS (
        SELECT doc_id, text, unnest(generate_series(0, max_i)) AS i FROM d
    )
    SELECT doc_id,
           CAST(i AS INTEGER) AS frame_idx,
           sha256(substring(text, CAST(256 * i + 1 AS BIGINT), 64))
               AS frame_sha256
    FROM idx
    """,
)
def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling shape: one media row → many frame rows through the
    mapInPandas iterator API (row-count expansion is the point).

    Oracle-checked: frames are 64-byte payload chunks sampled every 4th,
    which the oracle reproduces with substring + sha256 over a lateral
    generate_series (the corpus is ASCII, so char offsets == byte
    offsets; sha256(VARCHAR) hashes UTF-8 bytes on both engines)."""
    tune_session(spark)
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    with_bin = mm_ops.text_as_binary(docs, "text", "content")
    return mm_ops.sample_frames(with_bin, "doc_id", "content", every_n=4)


# ---------------------------------------------- packing & sampling ----

@query(
    "pack_documents_concat_chop",
    oracle="""
    WITH tok AS (
        SELECT lang, doc_id,
               CAST(len(regexp_split_to_array(text, '\\s+')) AS BIGINT) AS n_tok
        FROM documents
    ),
    off AS (
        SELECT lang, doc_id, n_tok,
               sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id)
                   - n_tok AS start_offset
        FROM tok
    )
    SELECT lang,
           CAST(floor(start_offset / 512.0) AS BIGINT) AS pack_id,
           count(*)                     AS n_docs,
           CAST(sum(n_tok) AS BIGINT)   AS pack_tokens,
           min(doc_id)   AS first_doc,
           max(doc_id)   AS last_doc
    FROM off
    GROUP BY lang, pack_id
    """,
)
def pack_documents_concat_chop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chop sequence packing (seq_len=512, sharded by lang):
    one window prefix-sum per shard, then per-pack accounting. The
    deterministic (shard, doc_id) order makes packing reproducible."""
    from lab3_lakehouse_spark.operators import packing as pack_ops

    tune_session(spark)
    docs = load_table(spark, sf_dir, "documents").select(
        "lang", "doc_id", text_ops.token_count("text").alias("n_tok")
    )
    packed = pack_ops.pack_concat_chop(
        docs, token_col="n_tok", order_col="doc_id", shard_col="lang", seq_len=512
    )
    return pack_ops.pack_stats(
        packed, token_col="n_tok", order_col="doc_id", shard_col="lang"
    )


@query(
    "stratified_sample_documents",
    oracle="""
    SELECT lang, count(*) AS n_sampled,
           CAST(sum(len(regexp_split_to_array(text, '\\s+'))) AS BIGINT) AS sampled_tokens
    FROM documents
    WHERE doc_id % 100 < CASE lang
        WHEN 'en' THEN 80 WHEN 'zh' THEN 50 WHEN 'de' THEN 25 ELSE 10 END
    GROUP BY lang
    """,
)
def stratified_sample_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corpus-mixing sample: per-lang keep percentages via
    a scan-side ``id mod 100`` predicate (rerun-stable, pushdown-able —
    the reproducible alternative to Bernoulli sampleBy)."""
    from lab3_lakehouse_spark.operators import sampling as sample_ops

    tune_session(spark)
    docs = load_table(spark, sf_dir, "documents")
    kept = sample_ops.deterministic_stratified_sample(
        docs,
        id_col="doc_id",
        stratum_col="lang",
        pct_by_stratum={"en": 80, "zh": 50, "de": 25},
        default_pct=10,
    )
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum(text_ops.token_count("text")).alias("sampled_tokens"),
    )


@query(
    "containment_near_dups",
    oracle="""
    WITH t AS (
        SELECT doc_id, lang,
               list_distinct(regexp_split_to_array(lower(text), '\\s+')) AS w
        FROM documents
    )
    SELECT a.doc_id AS id_small, b.doc_id AS id_big,
           len(list_intersect(a.w, b.w))::DOUBLE / len(a.w) AS containment,
           len(a.w) AS n_small, len(b.w) AS n_big
    FROM t a JOIN t b
      ON a.lang = b.lang
     AND (len(a.w) < len(b.w)
          OR (len(a.w) = len(b.w) AND a.doc_id < b.doc_id))
    WHERE len(a.w) >= 20
      AND len(list_intersect(a.w, b.w))::DOUBLE / len(a.w) >= 0.9
    """,
)
def containment_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASYMMETRIC near-dup detection: word-set containment
    |A ∩ B| / |A| of the smaller document in the larger one. Catches
    the quote/subset class symmetric Jaccard structurally misses — a
    200-word doc embedded verbatim in a 10k-word doc has Jaccard ≈ 0.02
    but containment 1.0, and at crawl scale that subset relation is the
    dominant duplication mode (boilerplate-wrapped syndication).
    Pair orientation is deterministic: smaller word-set is the
    contained side, doc_id breaks exact size ties, and sets under 20
    distinct words are excluded (on a narrow vocabulary every tiny doc
    is trivially "contained" — noise, not duplication). Same
    lang-blocked exact tier as word_jaccard_near_dups (pairs only
    within blocks); the 100 TB candidate tier is LSH banding on the
    SMALL side's shingles (containment LSH), for which this exact
    formula is the verify stage. Integer-ratio output → exact double
    division, no rounding policy needed."""
    tune_session(spark)
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    t = docs.select(
        "doc_id", "lang",
        F.array_distinct(dedup_ops.tokens("text")).alias("w"),
    )
    a, b = t.alias("a"), t.alias("b")
    na, nb = F.size(F.col("a.w")), F.size(F.col("b.w"))
    inter = F.size(F.array_intersect(F.col("a.w"), F.col("b.w"))).cast("double")
    containment = inter / na.cast("double")
    return (
        a.filter(F.size("w") >= 20)
        .alias("a")
        .join(
            b,
            on=[
                F.col("a.lang") == F.col("b.lang"),
                (na < nb) | ((na == nb) & (F.col("a.doc_id") < F.col("b.doc_id"))),
            ],
        )
        .select(
            F.col("a.doc_id").alias("id_small"),
            F.col("b.doc_id").alias("id_big"),
            containment.alias("containment"),
            na.cast("long").alias("n_small"),
            nb.cast("long").alias("n_big"),
        )
        .filter(F.col("containment") >= 0.9)
    )


@query(
    "cross_source_containment",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, lang, source,
               list_distinct(regexp_split_to_array(lower(text), '\\s+')) AS w
        FROM documents
    ),
    pairs AS (
        SELECT a.source AS source_small, b.source AS source_big,
               len(list_intersect(a.w, b.w))::DOUBLE / len(a.w) AS c
        FROM t a JOIN t b
          ON a.lang = b.lang
         AND (len(a.w) < len(b.w)
              OR (len(a.w) = len(b.w) AND a.doc_id < b.doc_id))
        WHERE len(a.w) >= 20
          AND len(list_intersect(a.w, b.w))::DOUBLE / len(a.w) >= 0.9
    )
    SELECT source_small, source_big,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(CASE WHEN c >= 1.0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_full,
           {sql_round4('avg(c)')} AS mean_containment,
           source_small = source_big AS within_source
    FROM pairs
    GROUP BY source_small, source_big
    """,
)
def cross_source_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Syndication DIRECTION attribution: the containment pair tier
    (containment_near_dups — the asymmetric doc-in-doc class symmetric
    Jaccard misses) rolled up to (source-of-contained,
    source-of-container) — which feeds which. cross_source_dup_matrix
    answers "who shares near-identical docs with whom" (symmetric, so
    its matrix is triangular); containment is ORIENTED, so this matrix
    is directional: a high (A→B) count with a low (B→A) count reads
    "B republishes A wrapped in boilerplate" — the dedup-policy input
    for choosing which source's copies to keep. n_full counts exact
    subset pairs (containment = 1.0). Scale shape: the pair tier is
    the exact lang-blocked verify stage (LSH banding on the small
    side's shingles generates candidates at 100 TB); the rollup adds
    two broadcast id→source lookups and one grouped agg bounded by
    |sources|²."""
    tune_session(spark)
    docs = load_table(spark, sf_dir, "documents")
    pairs = containment_near_dups(spark, sf_dir)
    src = docs.select("doc_id", "source")
    joined = pairs.join(
        F.broadcast(
            src.select(
                F.col("doc_id").alias("id_small"),
                F.col("source").alias("source_small"),
            )
        ),
        "id_small",
    ).join(
        F.broadcast(
            src.select(
                F.col("doc_id").alias("id_big"),
                F.col("source").alias("source_big"),
            )
        ),
        "id_big",
    )
    return (
        joined.groupBy("source_small", "source_big")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum(
                (F.col("containment") >= F.lit(1.0)).cast("long")
            ).alias("n_full"),
            round4(F.avg("containment")).alias("mean_containment"),
        )
        .withColumn(
            "within_source", F.col("source_small") == F.col("source_big")
        )
    )


@query(
    "containment_prefix_filtered",
    oracle="""
    WITH t AS (
        SELECT doc_id, lang,
               list_distinct(regexp_split_to_array(lower(text), '\\s+')) AS w
        FROM documents
    )
    SELECT a.doc_id AS id_small, b.doc_id AS id_big,
           len(list_intersect(a.w, b.w))::DOUBLE / len(a.w) AS containment,
           len(a.w) AS n_small, len(b.w) AS n_big
    FROM t a JOIN t b
      ON a.lang = b.lang
     AND (len(a.w) < len(b.w)
          OR (len(a.w) = len(b.w) AND a.doc_id < b.doc_id))
    WHERE len(a.w) >= 20
      AND len(list_intersect(a.w, b.w))::DOUBLE / len(a.w) >= 0.9
    """,
)
def containment_prefix_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCALE path for containment dedup: prefix-filtering candidate
    generation (operators/dedup.py:prefix_filtered_containment — join
    only each small doc's rarest-vocabulary prefix against the block's
    postings) + exact verify. Prefix filtering is LOSSLESS, so the
    oracle is the very same brute-force SQL as containment_near_dups:
    the optimized path must reproduce the blocked-all-pairs answer
    bit for bit — candidate pruning that changed the answer would fail
    the driver hash, not just a recall contract.

    Measured honesty: on THIS synthetic corpus the pruning cannot
    engage — the per-block vocabulary is 155 tokens with rarest
    df ≈ 49 and 69 % of blocked pairs qualify (sf0.01: candidates
    18,032 of 18,054 pairs, 12,437 qualifying), so the brute-force
    twin is faster here. Prefix filtering pays off exactly when real
    crawl text does what this corpus doesn't: Zipfian vocabulary,
    qualifying pairs ≪ pairs. The planted test pins the pruning
    behavior on rare-vocab input; this query pins losslessness."""
    tune_session(spark)
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    return dedup_ops.prefix_filtered_containment(
        docs, id_col="doc_id", text_col="text", block_col="lang",
        threshold=0.9, min_small=20,
    )


# ------------------------------------------- tokenizer & mixing ----

@query(
    "bpe_pair_frequencies",
    oracle=r"""
    WITH toks AS (
        SELECT regexp_split_to_array(text, '\s+') AS t FROM documents
    ),
    pairs AS (
        SELECT z[1] AS tok_a, z[2] AS tok_b
        FROM (SELECT unnest(list_zip(t[:len(t)-1], t[2:])) AS z FROM toks) q
    )
    SELECT tok_a, tok_b, count(*) AS pair_count
    FROM pairs
    GROUP BY tok_a, tok_b
    ORDER BY pair_count DESC, tok_a, tok_b
    LIMIT 20
    """,
)
def bpe_pair_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One BPE merge round, distributed: count every adjacent token
    pair across the corpus and surface the top merge candidates —
    corpus-scale tokenizer training's hot loop (Sennrich et al. 2016).
    Pair explosion is partition-local (operators/text.py
    adjacent_token_pairs); the only shuffle is the pair-keyed count,
    and the top-20 is TakeOrdered (per-partition heads, no global
    sort). Ties at the cut are broken lexicographically on the pair
    itself, so membership is deterministic on both engines."""
    tune_session(spark)
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    pairs = text_ops.adjacent_token_pairs(docs, "text")
    return (
        pairs.groupBy("tok_a", "tok_b")
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .orderBy(F.desc("pair_count"), "tok_a", "tok_b")
        .limit(20)
    )


_BPE_STEPS = 6


def _bpe_train_oracle(k_steps: int = _BPE_STEPS) -> str:
    """Chained-CTE replay of the full merge trajectory: the SAME
    word-frequency collapse, argmax selection, and two-pass
    delimiter-bounded replace as the Spark loop, step by step.

    Every chained CTE is MATERIALIZED (r15, r14 verdict task #6):
    DuckDB inlines CTEs by default, and v{{k}} / m{{k}} are each
    referenced twice (v{{k}} by p{{k+1}} AND v{{k+1}}; m{{k}} by
    v{{k}} AND the final step row) — inlined, the k-step chain
    re-expands the vocabulary collapse O(2^k) times. Materialization
    pins each step's frame to one evaluation, exactly like the Spark
    loop's per-merge checkpoint; the emitted values are identical
    (exact integer/string arithmetic)."""
    blocks = [
        r"""
    v0 AS MATERIALIZED (
        SELECT CAST(count(*) AS BIGINT) AS wf,
               '|' || regexp_replace(w, '(.)', '\1|', 'g') AS sym
        FROM (
            SELECT unnest(regexp_split_to_array(text, '\s+')) AS w
            FROM documents
        ) q
        WHERE len(w) > 0 AND w NOT LIKE '%|%'
        GROUP BY w
    )"""
    ]
    for k in range(1, k_steps + 1):
        p = k - 1
        blocks.append(
            f"""
    p{k} AS MATERIALIZED (
        SELECT z[1] AS a, z[2] AS b, CAST(sum(wf) AS BIGINT) AS cnt
        FROM (
            SELECT wf,
                   unnest(list_zip(s[2:len(s)-2], s[3:len(s)-1])) AS z
            FROM (SELECT wf, string_split(sym, '|') AS s FROM v{p}) q
            WHERE len(s) >= 4
        ) q2
        GROUP BY a, b
    ),
    m{k} AS MATERIALIZED (
        SELECT a, b, cnt FROM p{k} ORDER BY cnt DESC, a, b LIMIT 1),
    v{k} AS MATERIALIZED (
        SELECT wf,
               replace(replace(sym,
                   '|' || m.a || '|' || m.b || '|',
                   '|' || m.a || m.b || '|'),
                   '|' || m.a || '|' || m.b || '|',
                   '|' || m.a || m.b || '|') AS sym
        FROM v{p}, m{k} m
    ),
    t{k} AS MATERIALIZED (
        SELECT CAST(sum((len(string_split(sym, '|')) - 2) * wf)
               AS BIGINT) AS toks
        FROM v{k}
    )"""
        )
    selects = [
        f"""
    SELECT CAST({k} AS BIGINT) AS step, a AS sym_a, b AS sym_b,
           a || b AS merged, cnt AS pair_weight,
           (SELECT toks FROM t{k}) AS corpus_tokens_after
    FROM m{k}"""
        for k in range(1, k_steps + 1)
    ]
    return "WITH" + ",".join(blocks) + "\n" + "\nUNION ALL".join(selects)


@query("bpe_train_apply", oracle=_bpe_train_oracle())
def bpe_train_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative BPE tokenizer TRAINING + application — the full loop
    bpe_pair_frequencies shows one round of (Sennrich et al. 2016):
    learn the top ``_BPE_STEPS`` merges end-to-end and measure the
    corpus token count after every merge. Output is the artifact a
    tokenizer build actually produces: one row per merge step with the
    learned pair, its corpus-weighted frequency, and the resulting
    corpus size — the compression trajectory that decides vocab size.

    Scale design (how real BPE trainers work at 100 TB): ONE corpus
    pass collapses the corpus to the word-frequency VOCABULARY table
    (Heaps' law: sublinear in corpus size), checkpointed once; every
    training iteration after that is vocab-sized — an adjacent
    symbol-pair explode + a pair-keyed weighted count + an argmax.
    The per-step driver fetch is ONE row (the winning pair — the
    n_centroids-style bounded metadata collect), and the merge is
    applied vocab-side with a literal ``replace``; corpus text is
    never re-read after the first pass.

    Determinism contract: pair weights are exact BIGINT sums; the
    argmax tie-breaks on (count DESC, sym_a, sym_b). Merge application
    is DELIMITER-BOUNDED two-pass string replace — '|a|b|' → '|ab|'
    applied twice — which both engines evaluate as leftmost
    non-overlapping global replace, so runs of a repeated symbol
    resolve identically cross-engine (a deterministic greedy variant
    of the reference BPE's leftmost-pair merge; the second pass
    catches the adjacent pair the first pass's consumed delimiter
    skipped). Tokens containing the delimiter are excluded up front
    on both engines."""
    tune_session(spark)
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    words = docs.select(
        F.explode(F.split(F.col("text"), r"\s+")).alias("w")
    ).filter((F.length("w") > 0) & (~F.col("w").contains("|")))
    vocab = (
        words.groupBy("w")
        .agg(F.count(F.lit(1)).alias("wf"))
        .select(
            "wf",
            F.concat(
                F.lit("|"), F.regexp_replace("w", "(.)", "$1|")
            ).alias("sym"),
        )
        .localCheckpoint(eager=True)  # the ONE corpus-pass collapse
    )
    rows: list[tuple] = []
    cur = vocab
    for k in range(1, _BPE_STEPS + 1):
        best = (
            cur.select(
                "wf",
                F.expr(
                    "slice(split(sym, '\\\\|'), 2,"
                    " size(split(sym, '\\\\|')) - 2)"
                ).alias("__s"),
            )
            .filter(F.size("__s") >= 2)
            .select(
                "wf",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(__s) - 1),"
                        " i -> struct(__s[i-1] AS a, __s[i] AS b))"
                    )
                ).alias("__p"),
            )
            .select("wf", "__p.a", "__p.b")
            .groupBy("a", "b")
            .agg(F.sum("wf").alias("cnt"))
            .orderBy(F.desc("cnt"), "a", "b")
            .limit(1)
            .collect()  # bounded metadata: the 1-row winning pair
        )
        if not best:
            break
        a, b, cnt = best[0]["a"], best[0]["b"], best[0]["cnt"]
        pat, rep = f"|{a}|{b}|", f"|{a}{b}|"
        # LAZY checkpoint (r14): the token-count aggregate right below
        # materializes it, so lineage stays flat across steps without
        # paying a separate checkpoint job per merge (was eager +
        # count: two vocab passes per step; now one)
        cur = cur.select(
            "wf",
            F.replace(
                F.replace("sym", F.lit(pat), F.lit(rep)),
                F.lit(pat),
                F.lit(rep),
            ).alias("sym"),
        ).localCheckpoint(eager=False)
        toks = cur.select(
            F.sum(
                (F.size(F.split("sym", r"\|")) - F.lit(2)) * F.col("wf")
            ).alias("t")
        ).collect()[0]["t"]  # bounded metadata: one corpus-size scalar
        rows.append((k, a, b, a + b, int(cnt), int(toks)))
    return spark.createDataFrame(
        rows,
        "step bigint, sym_a string, sym_b string, merged string,"
        " pair_weight bigint, corpus_tokens_after bigint",
    )


_W_SAMPLE_N = 50
_W_SAMPLE_SEED = 7


def _weighted_sample_oracle() -> str:
    from lab3_lakehouse_spark.operators.sketches import sql_hash60
    from lab3_lakehouse_spark.queries._util import sql_round4

    u = f"(({sql_hash60('doc_id', _W_SAMPLE_SEED)}) + 1) / 1152921504606846976.0"
    pr = f"ln({u}) / CAST(n_chars AS DOUBLE)"
    return f"""
    SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars,
           {sql_round4(pr)} AS priority
    FROM documents
    WHERE CAST(n_chars AS DOUBLE) > 0
    ORDER BY {pr} DESC, doc_id
    LIMIT {_W_SAMPLE_N}
    """


@query("weighted_doc_sample", oracle=_weighted_sample_oracle())
def weighted_doc_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis–Spirakis A-Res, operators/sampling.py
    weighted_sample_topn): draw 50 documents with inclusion
    probability proportional to length, reproducibly — the randomness
    is an md5 of the doc id, so the SAME sample comes out on any
    rerun, any partitioning, any engine (the oracle recomputes the
    identical priorities in SQL). Scale: TakeOrdered — per-partition
    top-n, no global sort; this is how you cut a weighted probe set
    from a 100 TB corpus in one scan."""
    from lab3_lakehouse_spark.operators import sampling as sample_ops
    from lab3_lakehouse_spark.queries._util import round4

    tune_session(spark)
    docs = load_table(spark, sf_dir, "documents")
    out = sample_ops.weighted_sample_topn(
        docs.select("doc_id", "source", "n_chars"),
        id_col="doc_id",
        weight_col="n_chars",
        n=_W_SAMPLE_N,
        seed=_W_SAMPLE_SEED,
    )
    return out.select(
        "doc_id",
        "source",
        F.col("n_chars").cast("long").alias("n_chars"),
        round4(F.col("priority")).alias("priority"),
    )


def _mix_weights_oracle() -> str:
    from lab3_lakehouse_spark.queries._util import sql_round4

    share = "n_tokens / total_tokens"
    return rf"""
    WITH per_src AS (
        SELECT source, count(*) AS n_docs,
               CAST(sum(len(regexp_split_to_array(text, '\s+'))) AS DOUBLE)
                   AS n_tokens
        FROM documents GROUP BY source
    ),
    tot AS (
        SELECT CAST(sum(n_tokens) AS DOUBLE) AS total_tokens,
               CAST(count(*) AS DOUBLE) AS n_sources
        FROM per_src
    )
    SELECT source, n_docs, CAST(n_tokens AS BIGINT) AS n_tokens,
           {sql_round4(share)} AS actual_share,
           {sql_round4(f'least(4.0, (1.0 / n_sources) / ({share}))')} AS mix_weight
    FROM per_src, tot
    """


@query("domain_mix_weights", oracle=_mix_weights_oracle())
def domain_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture rebalancing weights: per-source token share vs
    a uniform target, emitting the resample weight (capped at 4× to
    bound upsampling of tiny sources) that a mixing pass would apply —
    the DoReMi/Pile-style knob computed FROM the corpus instead of
    hand-set. One grouped pass per source (the 100 TB scan), then the
    totals join back as a broadcast singleton — no second fact scan."""
    from lab3_lakehouse_spark.operators import sampling as sample_ops
    from lab3_lakehouse_spark.queries._util import round4

    tune_session(spark)
    docs = load_table(spark, sf_dir, "documents")
    w = sample_ops.source_mix_weights(
        docs, source_col="source", weight=text_ops.token_count("text"), cap=4.0
    )
    return w.select(
        "source",
        "n_docs",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        round4(F.col("actual_share")).alias("actual_share"),
        round4(F.col("mix_weight")).alias("mix_weight"),
    )


#: ln(2) as the exact double both engines share as a literal — dividing
#: by a ln(2.0) CALL would trust two libms to agree on the last ulp.
_LN2 = "0.6931471805599453"


def _surprisal_oracle() -> str:
    from lab3_lakehouse_spark.queries._util import sql_round4

    return rf"""
    WITH tok AS (
        SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS token
        FROM documents
    ),
    vocab AS (
        SELECT token, CAST(count(*) AS DOUBLE) AS cnt FROM tok GROUP BY token
    ),
    tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS t FROM vocab)
    SELECT tok.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
           {sql_round4(f'avg(-ln(vocab.cnt / tot.t) / {_LN2})')}
               AS mean_surprisal_bits
    FROM tok JOIN vocab ON vocab.token = tok.token CROSS JOIN tot
    GROUP BY tok.doc_id
    """


@query("unigram_surprisal_scores", oracle=_surprisal_oracle())
def unigram_surprisal_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LM-free perplexity proxy: per-document mean unigram surprisal
    (−log₂ p(token) under the corpus's own unigram distribution) — the
    classic cheap stand-in for model-based quality scoring (docs of
    mostly rare tokens score high, boilerplate scores low). Two grouped
    passes over the exploded tokens (vocab build, per-doc mean) and one
    token-keyed join; the corpus total joins back as a broadcast
    singleton. The ln(2) divisor is a shared double LITERAL — both
    engines' ln(x) agree to ≤1 ulp but their ln(2.0) calls need not be
    the same bits, so the constant is pinned instead of computed."""
    from lab3_lakehouse_spark.queries._util import round4

    tune_session(spark)
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    tok = docs.select(
        "doc_id", F.explode(text_ops.whitespace_tokens("text")).alias("token")
    )
    vocab = tok.groupBy("token").agg(
        F.count(F.lit(1)).cast("double").alias("cnt")
    )
    tot = vocab.agg(F.sum("cnt").cast("double").alias("t"))
    ln2 = float(_LN2)
    return (
        tok.join(vocab, "token")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            round4(
                F.avg(-F.log(F.col("cnt") / F.col("t")) / F.lit(ln2))
            ).alias("mean_surprisal_bits"),
        )
    )


def _zipf_oracle() -> str:
    from lab3_lakehouse_spark.queries._util import sql_round4

    slope = "(s.n * s.sxy - s.sx * s.sy) / (s.n * s.sxx - s.sx * s.sx)"
    return rf"""
    WITH tok AS (
        SELECT unnest(regexp_split_to_array(text, '\s+')) AS token
        FROM documents
    ),
    vocab AS (
        SELECT token, CAST(count(*) AS DOUBLE) AS cnt FROM tok GROUP BY token
    ),
    ranked AS (
        SELECT cnt, row_number() OVER (ORDER BY cnt DESC, token) AS rk
        FROM vocab
    ),
    pts AS (
        SELECT ln(CAST(rk AS DOUBLE)) AS x, ln(cnt) AS y FROM ranked
    ),
    s AS (
        SELECT CAST(count(*) AS DOUBLE) AS n, sum(x) AS sx, sum(y) AS sy,
               sum(x * y) AS sxy, sum(x * x) AS sxx
        FROM pts
    )
    SELECT CAST(s.n AS BIGINT) AS vocab_size,
           {sql_round4(slope)} AS zipf_slope,
           {sql_round4(f'(s.sy - ({slope}) * s.sx) / s.n')} AS intercept
    FROM s
    """


@query("zipf_fit_tokens", oracle=_zipf_oracle())
def zipf_fit_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit of the corpus token-frequency curve: closed-form
    OLS of ln(freq) on ln(rank) — the one-number diagnostic that
    separates natural language (slope ≈ −1) from template spam and
    synthetic word soup. Ranking uses the scale-safe two-phase global
    row_number (operators/windows.py global_row_number — approx cut
    points + per-bucket window), NEVER a single-partition sort: the
    vocabulary of a 100 TB crawl is itself hundreds of millions of
    rows. The fit is five aggregate sums — one reduce."""
    from lab3_lakehouse_spark.operators import windows as win_ops
    from lab3_lakehouse_spark.queries._util import round4

    tune_session(spark)
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    vocab = (
        docs.select(F.explode(text_ops.whitespace_tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("double").alias("cnt"))
    )
    ranked = win_ops.global_row_number(
        vocab, metric="cnt", tie_breakers=["token"], rank_col="rk"
    )
    pts = ranked.select(
        F.log(F.col("rk").cast("double")).alias("x"), F.log("cnt").alias("y")
    )
    s = pts.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return s.select(
        F.col("n").cast("long").alias("vocab_size"),
        round4(slope).alias("zipf_slope"),
        round4((F.col("sy") - slope * F.col("sx")) / F.col("n")).alias("intercept"),
    )


def _jsd_oracle() -> str:
    from lab3_lakehouse_spark.queries._util import sql_round4

    return rf"""
    WITH tok AS (
        SELECT source, unnest(regexp_split_to_array(text, '\s+')) AS token
        FROM documents
    ),
    st AS (
        SELECT source, token, CAST(count(*) AS DOUBLE) AS c_st
        FROM tok GROUP BY source, token
    ),
    tt AS (
        SELECT token, CAST(count(*) AS DOUBLE) AS c_t FROM tok GROUP BY token
    ),
    ns AS (
        SELECT source, CAST(count(*) AS DOUBLE) AS n_s
        FROM tok GROUP BY source
    ),
    nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM tok),
    terms AS (
        SELECT st.source,
               st.c_st / ns.n_s AS p,
               tt.c_t / nn.n AS q
        FROM st JOIN tt USING (token) JOIN ns USING (source) CROSS JOIN nn
    ),
    agg AS (
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_shared_types,
               sum(0.5 * p * ln(p / ((p + q) / 2))
                   + 0.5 * q * ln(q / ((p + q) / 2))) AS present,
               sum(q) AS q_present
        FROM terms GROUP BY source
    )
    SELECT a.source,
           CAST(ns.n_s AS BIGINT) AS n_tokens,
           a.n_shared_types,
           {sql_round4(
               f'(a.present + 0.5 * (1.0 - a.q_present) * {_LN2}) / {_LN2}'
           )} AS jsd_bits
    FROM agg a JOIN ns ON ns.source = a.source
    """


@query("source_token_jsd", oracle=_jsd_oracle())
def source_token_jsd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Jensen–Shannon divergence between the source's
    unigram distribution and the POOLED corpus distribution (Lin 1991)
    — the mixture diagnostic a temperature mixer reads: JSD ≈ 0 means
    the source is interchangeable with the blend, large JSD flags the
    distinct-vocabulary sources whose up/down-weighting actually moves
    the mixture. JSD is used over KL because it is finite under the
    zero-probability asymmetry every real source pair has.

    Exact, not sampled: one (source, token) grouped pass, one token
    grouped pass, broadcast totals. Tokens ABSENT from a source still
    contribute to KL(Q‖M) — their total is 0.5·ln2·(1 − Σ_present q),
    folded in closed form so the per-source sum runs only over the
    source's own vocabulary (never |sources| × |corpus vocab|). Both
    engines evaluate the same ln expressions on identical exact count
    ratios; the ln(2) divisor is the shared pinned literal."""
    from lab3_lakehouse_spark.queries._util import round4

    tune_session(spark)
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    tok = docs.select(
        "source", F.explode(text_ops.whitespace_tokens("text")).alias("token")
    )
    st = tok.groupBy("source", "token").agg(
        F.count(F.lit(1)).cast("double").alias("c_st")
    )
    tt = tok.groupBy("token").agg(
        F.count(F.lit(1)).cast("double").alias("c_t")
    )
    ns = tok.groupBy("source").agg(
        F.count(F.lit(1)).cast("double").alias("n_s")
    )
    nn = tok.agg(F.count(F.lit(1)).cast("double").alias("n"))
    p = F.col("c_st") / F.col("n_s")
    q = F.col("c_t") / F.col("n")
    m = (p + q) / F.lit(2.0)
    ln2 = float(_LN2)
    agg = (
        st.join(tt, "token")
        .join(F.broadcast(ns), "source")
        .crossJoin(F.broadcast(nn))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shared_types"),
            F.sum(
                F.lit(0.5) * p * F.log(p / m)
                + F.lit(0.5) * q * F.log(q / m)
            ).alias("__present"),
            F.sum(q).alias("__q_present"),
            F.first("n_s").alias("__n_s"),
        )
    )
    return agg.select(
        "source",
        F.col("__n_s").cast("long").alias("n_tokens"),
        "n_shared_types",
        round4(
            (
                F.col("__present")
                + F.lit(0.5) * (F.lit(1.0) - F.col("__q_present")) * F.lit(ln2)
            )
            / F.lit(ln2)
        ).alias("jsd_bits"),
    )


@query(
    "good_turing_oov_estimate",
    oracle=rf"""
    WITH tok AS (
        SELECT source, unnest(regexp_split_to_array(text, '\s+')) AS token
        FROM documents
    ),
    st AS (
        SELECT source, token, count(*) AS c FROM tok GROUP BY source, token
    )
    SELECT source,
           CAST(sum(c) AS BIGINT)   AS n_tokens,
           CAST(count(*) AS BIGINT) AS vocab_size,
           CAST(count(*) FILTER (WHERE c = 1) AS BIGINT) AS n_singletons,
           CAST(count(*) FILTER (WHERE c = 2) AS BIGINT) AS n_doubletons,
           {sql_round4(
               'CAST(count(*) FILTER (WHERE c = 1) AS DOUBLE)'
               ' / CAST(sum(c) AS DOUBLE)'
           )} AS gt_unseen_mass
    FROM st GROUP BY source
    """,
)
def good_turing_oov_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Good–Turing unseen-token mass: P(next token is a
    NEW type) ≈ N₁/N — the hapax-legomena estimator (Good 1953; Gale &
    Sampson 1995's starting point). The number a curation pipeline
    reads before committing a tokenizer or a source budget: high
    unseen mass = open vocabulary still growing (more data from this
    source keeps buying new types — the Heaps'-law regime,
    `heaps_vocabulary_growth` is the longitudinal twin), near-zero =
    saturated/templated source. Doubleton count rides along (the next
    Good–Turing frequency-of-frequency; N₁, N₂ together give the
    Simple-GT discount for singletons).

    Exact integer counting: one (source, token) grouped pass, one
    per-source rollup — the estimate is one IEEE division of exact
    counts, bit-stable across engines."""
    from lab3_lakehouse_spark.queries._util import round4

    tune_session(spark)
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    tok = docs.select(
        "source", F.explode(text_ops.whitespace_tokens("text")).alias("token")
    )
    st = tok.groupBy("source", "token").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    return st.groupBy("source").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("vocab_size"),
        F.count(F.when(F.col("c") == 1, 1)).cast("long").alias("n_singletons"),
        F.count(F.when(F.col("c") == 2, 1)).cast("long").alias("n_doubletons"),
        round4(
            F.count(F.when(F.col("c") == 1, 1)).cast("double")
            / F.sum("c").cast("double")
        ).alias("gt_unseen_mass"),
    )


# --------------------------------------- bigram LM & collocations ----

def _bigram_surprisal_oracle() -> str:
    from lab3_lakehouse_spark.queries._util import sql_round4

    half = "CAST(0.5 AS DOUBLE)"
    p = f"(bg.c_ab + {half}) / (ctx.c_a + {half} * v.vv)"
    return rf"""
    WITH pairs AS (
        SELECT doc_id, z[1] AS tok_a, z[2] AS tok_b
        FROM (
            SELECT doc_id, unnest(list_zip(t[:len(t)-1], t[2:])) AS z
            FROM (SELECT doc_id, regexp_split_to_array(text, '\s+') AS t
                  FROM documents) q0
        ) q
    ),
    bg AS (SELECT tok_a, tok_b, CAST(count(*) AS DOUBLE) AS c_ab
           FROM pairs GROUP BY tok_a, tok_b),
    ctx AS (SELECT tok_a, CAST(count(*) AS DOUBLE) AS c_a
            FROM pairs GROUP BY tok_a),
    v AS (SELECT CAST(count(DISTINCT tok_b) AS DOUBLE) AS vv FROM pairs)
    SELECT p.doc_id, CAST(count(*) AS BIGINT) AS n_pairs,
           {sql_round4(f'avg(-ln({p}) / {_LN2})')}
               AS mean_bigram_surprisal_bits
    FROM pairs p
    JOIN bg ON bg.tok_a = p.tok_a AND bg.tok_b = p.tok_b
    JOIN ctx ON ctx.tok_a = p.tok_a
    CROSS JOIN v
    GROUP BY p.doc_id
    """


@query("bigram_surprisal_scores", oracle=_bigram_surprisal_oracle())
def bigram_surprisal_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional LM quality proxy: per-document mean bigram surprisal
    −log₂ P(wᵢ | wᵢ₋₁) under the corpus's own add-½-smoothed bigram
    model — one rung up the n-gram ladder from unigram_surprisal_scores
    (a doc of individually common but incoherently SEQUENCED tokens —
    shuffled spam — scores high here while the unigram scorer passes
    it; this is the cheap stand-in for KenLM-style perplexity
    filtering, the standard corpus-quality gate). Smoothing uses the
    right-context vocabulary size V: P = (c(ab)+½)/(c(a·)+½V), finite
    on unseen contexts by construction.

    Scale: pair explosion is partition-local
    (operators/text.adjacent_token_pairs); then two pair/context-keyed
    count shuffles, a pair-keyed join back, and one doc-keyed mean —
    every shuffle keyed, nothing global. V and ln(2) ride along as
    broadcast/pinned literals (ln(2) is a shared double literal — both
    engines' ln(x) agree to ≤1 ulp but their own ln(2.0) need not)."""
    from lab3_lakehouse_spark.queries._util import round4

    tune_session(spark)
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    pairs = text_ops.adjacent_token_pairs(docs, "text", keep=("doc_id",))
    bg = pairs.groupBy("tok_a", "tok_b").agg(
        F.count(F.lit(1)).cast("double").alias("c_ab")
    )
    ctx = pairs.groupBy("tok_a").agg(
        F.count(F.lit(1)).cast("double").alias("c_a")
    )
    v = pairs.agg(F.countDistinct("tok_b").cast("double").alias("vv"))
    ln2 = float(_LN2)
    p = (F.col("c_ab") + F.lit(0.5)) / (F.col("c_a") + F.lit(0.5) * F.col("vv"))
    return (
        pairs.join(bg, ["tok_a", "tok_b"])
        .join(ctx, "tok_a")
        .crossJoin(F.broadcast(v))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            round4(F.avg(-F.log(p) / F.lit(ln2))).alias(
                "mean_bigram_surprisal_bits"
            ),
        )
    )


_PMI_MIN_COUNT, _PMI_TOPK = 5, 20


def _pmi_oracle() -> str:
    from lab3_lakehouse_spark.queries._util import sql_round4

    ratio = "(bg.c_ab * n.np) / (la.c_a * rb.c_b)"
    return rf"""
    WITH pairs AS (
        SELECT z[1] AS tok_a, z[2] AS tok_b
        FROM (
            SELECT unnest(list_zip(t[:len(t)-1], t[2:])) AS z
            FROM (SELECT regexp_split_to_array(text, '\s+') AS t
                  FROM documents) q0
        ) q
    ),
    bg AS (SELECT tok_a, tok_b, CAST(count(*) AS DOUBLE) AS c_ab
           FROM pairs GROUP BY tok_a, tok_b),
    la AS (SELECT tok_a, CAST(count(*) AS DOUBLE) AS c_a
           FROM pairs GROUP BY tok_a),
    rb AS (SELECT tok_b, CAST(count(*) AS DOUBLE) AS c_b
           FROM pairs GROUP BY tok_b),
    n AS (SELECT CAST(count(*) AS DOUBLE) AS np FROM pairs)
    SELECT bg.tok_a, bg.tok_b, CAST(bg.c_ab AS BIGINT) AS pair_count,
           {sql_round4(f'ln({ratio})')} AS pmi
    FROM bg
    JOIN la ON la.tok_a = bg.tok_a
    JOIN rb ON rb.tok_b = bg.tok_b
    CROSS JOIN n
    WHERE bg.c_ab >= {_PMI_MIN_COUNT}
    ORDER BY {ratio} DESC, bg.tok_a, bg.tok_b
    LIMIT {_PMI_TOPK}
    """


@query("token_pmi_collocations", oracle=_pmi_oracle())
def token_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: top adjacent token pairs by pointwise mutual
    information, PMI = ln(p(ab) / (p(a)·p(b))) over the corpus bigram
    distribution, with a min-count floor (c(ab) ≥ 5) screening the
    unstable low-frequency tail — the classic phrase-detection /
    multiword-expression pass (Church & Hanks 1990) a tokenizer or
    n-gram-feature pipeline runs corpus-wide.

    Cross-engine determinism at the top-k cut: rows are ORDERED by the
    exact ratio (c_ab·N)/(c_a·c_b) — integer products ≤ 2⁵³ divided
    once, bit-identical IEEE on both engines — rather than by ln(ratio),
    whose ≤1-ulp libm divergence could flip near-ties at the boundary;
    ln being monotone, the order is the same, and ln is applied only to
    the emitted (rounded) column. Scale: partition-local pair
    explosion, three keyed count shuffles, joins back on the pair, and
    a TakeOrdered top-20 — no global sort."""
    from lab3_lakehouse_spark.queries._util import round4

    tune_session(spark)
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    pairs = text_ops.adjacent_token_pairs(docs, "text")
    bg = pairs.groupBy("tok_a", "tok_b").agg(
        F.count(F.lit(1)).cast("double").alias("c_ab")
    )
    la = pairs.groupBy("tok_a").agg(
        F.count(F.lit(1)).cast("double").alias("c_a")
    )
    rb = pairs.groupBy("tok_b").agg(
        F.count(F.lit(1)).cast("double").alias("c_b")
    )
    n = pairs.agg(F.count(F.lit(1)).cast("double").alias("np"))
    ratio = (F.col("c_ab") * F.col("np")) / (F.col("c_a") * F.col("c_b"))
    return (
        bg.filter(F.col("c_ab") >= _PMI_MIN_COUNT)
        .join(la, "tok_a")
        .join(rb, "tok_b")
        .crossJoin(F.broadcast(n))
        .withColumn("__ratio", ratio)
        .select(
            "tok_a",
            "tok_b",
            F.col("c_ab").cast("long").alias("pair_count"),
            round4(F.log("__ratio")).alias("pmi"),
            "__ratio",
        )
        .orderBy(F.desc("__ratio"), "tok_a", "tok_b")
        .limit(_PMI_TOPK)
        .drop("__ratio")
    )


_FOLD_K, _FOLD_SEED = 5, 13


def _fold_oracle() -> str:
    from lab3_lakehouse_spark.operators.sketches import sql_hash60
    from lab3_lakehouse_spark.queries._util import sql_round4

    fold = f"({sql_hash60('doc_id', _FOLD_SEED)}) % {_FOLD_K}"
    return f"""
    WITH assigned AS (
        SELECT {fold} AS fold, source, n_chars FROM documents
    ),
    per AS (
        SELECT fold, source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS n_chars
        FROM assigned GROUP BY fold, source
    ),
    tot AS (
        SELECT source, CAST(sum(n_docs) AS DOUBLE) AS src_docs
        FROM per GROUP BY source
    )
    SELECT per.fold, per.source, per.n_docs, per.n_chars,
           {sql_round4('CAST(per.n_docs AS DOUBLE) / tot.src_docs')}
               AS share_of_source
    FROM per JOIN tot ON tot.source = per.source
    ORDER BY per.fold, per.source
    """


@query("crossval_fold_balance", oracle=_fold_oracle())
def crossval_fold_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-fold assignment + balance audit: every document
    lands in fold ``hash60(doc_id) % k`` — the md5-derived portable
    hash, so the SAME split comes out on any rerun, any partitioning,
    any engine (no stored split table, no rand(); the fold of a doc is
    a pure function of its id — the property that keeps train/eval
    splits stable across pipeline reruns and prevents eval
    contamination by drift). Emits the fold × source grid with each
    fold's share of its source, i.e. exactly the table you check
    before trusting a cross-validation: hash folds are stratified in
    expectation, and a source whose shares stray far from 1/k signals
    id-structure correlated with the hash (or too few docs). One
    grouped count over the corpus + a source-keyed total joined back;
    scan is pruned to (doc_id, source, n_chars)."""
    from lab3_lakehouse_spark.operators.sketches import portable_hash60
    from lab3_lakehouse_spark.queries._util import round4

    tune_session(spark)
    docs = load_table(spark, sf_dir, "documents")
    assigned = docs.select(
        (
            portable_hash60(F.col("doc_id").cast("string"), _FOLD_SEED)
            % _FOLD_K
        ).alias("fold"),
        "source",
        "n_chars",
    )
    per = assigned.groupBy("fold", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("n_chars"),
    )
    tot = per.groupBy("source").agg(
        F.sum("n_docs").cast("double").alias("src_docs")
    )
    return (
        per.join(F.broadcast(tot), "source")
        .select(
            "fold",
            "source",
            "n_docs",
            "n_chars",
            round4(F.col("n_docs").cast("double") / F.col("src_docs")).alias(
                "share_of_source"
            ),
        )
        .orderBy("fold", "source")
    )


# ------------------------------------------ JL random projection ----

_JL_D_IN, _JL_D_OUT, _JL_SEED = 64, 16, 23


def _jl_signs() -> list[list[float]]:
    """±1 sign matrix derived from md5 — a COMPILE-TIME deterministic
    constant, identical in the Spark expression and the oracle SQL (the
    matrix is data both engines share, not per-engine randomness)."""
    import hashlib

    return [
        [
            1.0
            if int(
                hashlib.md5(f"{_JL_SEED}|{j}|{i}".encode()).hexdigest()[:8], 16
            )
            % 2
            == 0
            else -1.0
            for i in range(_JL_D_IN)
        ]
        for j in range(_JL_D_OUT)
    ]


def _jl_oracle() -> str:
    from lab3_lakehouse_spark.queries._util import sql_round4

    signs = _jl_signs()
    scale = 1.0 / (_JL_D_OUT ** 0.5)

    def p_sql(j: int) -> str:
        terms = " + ".join(
            f"({signs[j][i]} * CAST(embedding[{i + 1}] AS DOUBLE))"
            for i in range(_JL_D_IN)
        )
        return f"(({terms}) * {scale!r})"

    norm_in = " + ".join(
        f"(CAST(embedding[{i + 1}] AS DOUBLE) * CAST(embedding[{i + 1}] AS DOUBLE))"
        for i in range(_JL_D_IN)
    )
    norm_out = " + ".join(f"(p{j} * p{j})" for j in range(_JL_D_OUT))
    p_cols = ", ".join(f"{p_sql(j)} AS p{j}" for j in range(_JL_D_OUT))
    return f"""
    WITH proj AS (
        SELECT vec_id, {p_cols}, sqrt({norm_in}) AS norm_in
        FROM embeddings
    )
    SELECT vec_id,
           {sql_round4('p0')} AS p0,
           {sql_round4('p1')} AS p1,
           {sql_round4('p2')} AS p2,
           {sql_round4('p3')} AS p3,
           {sql_round4('norm_in')} AS norm_in,
           {sql_round4(f'sqrt({norm_out})')} AS norm_out,
           {sql_round4(f'sqrt({norm_out}) / norm_in')} AS norm_ratio
    FROM proj
    """


@query("embedding_random_projection", oracle=_jl_oracle())
def embedding_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson–Lindenstrauss dimensionality reduction 64 → 16 via a ±1
    sign matrix (Achlioptas 2001): the map-only preprocessing that cuts
    every downstream ANN/cosine cost 4× while approximately preserving
    norms and distances — at 100 TB you project ONCE at ingest and run
    LSH/IVF in the reduced space. The sign matrix is an md5-derived
    compile-time constant, so the projection is a pure scan-side
    expression: NO shuffle, NO UDF, whole-stage-codegen'd arithmetic,
    and the oracle evaluates the IDENTICAL left-associated sum chain —
    doubles match bit-for-bit before round4. Emits the first four
    projected coordinates plus input/output norms and their ratio (the
    JL quality check: ratios concentrate around 1)."""
    from lab3_lakehouse_spark.queries._util import round4

    tune_session(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    signs = _jl_signs()
    scale = 1.0 / (_JL_D_OUT ** 0.5)

    # higher-order functions, not unrolled chains: a 16×64 unrolled
    # expression tree sent Catalyst analysis + codegen to ~7 s; the
    # aggregate() lambda folds i ASCENDING — the same left-associated
    # order as the oracle's explicit sum chain, so doubles still match
    # bit-for-bit — with a constant-size plan.
    signs_lit = F.array(
        *[F.array(*[F.lit(s) for s in row]) for row in signs]
    )
    v = lambda i: F.element_at(F.col("embedding"), i + 1).cast("double")
    proj = F.transform(
        F.sequence(F.lit(1), F.lit(_JL_D_OUT)),
        lambda j: F.aggregate(
            F.sequence(F.lit(1), F.lit(_JL_D_IN)),
            F.lit(0.0),
            lambda acc, i: acc
            + F.element_at(F.element_at(F.col("__S"), j), i)
            * F.element_at(F.col("embedding"), i).cast("double"),
        )
        * F.lit(scale),
    )
    norm_in = F.sqrt(
        F.aggregate(
            F.sequence(F.lit(0), F.lit(_JL_D_IN - 1)),
            F.lit(0.0),
            lambda acc, i: acc + v(i) * v(i),
        )
    )
    cur = (
        emb.withColumn("__S", signs_lit)
        .withColumn("__p", proj)
        .withColumn("norm_in", norm_in)
        .withColumn(
            "norm_out",
            F.sqrt(
                F.aggregate(
                    F.col("__p"),
                    F.lit(0.0),
                    lambda acc, x: acc + x * x,
                )
            ),
        )
    )
    return cur.select(
        "vec_id",
        *[round4(F.col("__p")[j]).alias(f"p{j}") for j in range(4)],
        round4(F.col("norm_in")).alias("norm_in"),
        round4(F.col("norm_out")).alias("norm_out"),
        round4(F.col("norm_out") / F.col("norm_in")).alias("norm_ratio"),
    )


# ------------------------------------ embedding centroid drift ----

_CENTROID_DRIFT_ORACLE = f"""
    WITH e AS (
        SELECT label,
               vec_id % 2 = 0 AS is_ref,
               t.i AS dim,
               embedding[t.i] AS v
        FROM embeddings, generate_series(1, 64) AS t(i)  -- dim=64
             -- (fixed: DuckDB's generate_series can't be lateral)
    ), cent AS (
        SELECT label, dim,
               {sql_round4('avg(CASE WHEN is_ref THEN v END)')} AS a,
               {sql_round4('avg(CASE WHEN NOT is_ref THEN v END)')} AS b
        FROM e GROUP BY label, dim
    ), dots AS (
        SELECT label,
               sum(a * b) AS ab, sum(a * a) AS aa, sum(b * b) AS bb
        FROM cent GROUP BY label
    ), counts AS (
        SELECT label,
               CAST(count(CASE WHEN vec_id % 2 = 0 THEN 1 END)
                    AS BIGINT) AS n_ref,
               CAST(count(CASE WHEN vec_id % 2 <> 0 THEN 1 END)
                    AS BIGINT) AS n_cand
        FROM embeddings GROUP BY label
    )
    SELECT CAST(d.label AS BIGINT) AS label, c.n_ref, c.n_cand,
           {sql_round4('d.ab / (sqrt(d.aa) * sqrt(d.bb))')}
               AS centroid_cosine,
           {sql_round4('sqrt(d.bb) / sqrt(d.aa)')} AS centroid_norm_ratio
    FROM dots d JOIN counts c ON c.label = d.label
"""


@query("embedding_centroid_drift", oracle=_CENTROID_DRIFT_ORACLE)
def embedding_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-TIER drift monitor — the drift quintet's missing
    modality: scalar drift (PSI/KS) and categorical drift (chi-square)
    can't see an embedding-model regression that moves every vector a
    little, so this compares per-label centroids between a reference
    and a candidate snapshot (the vec_id parity halves here; in
    production, yesterday's tier vs today's re-embed). Per label:
    centroid cosine (direction drift — a re-embed with a silently
    updated model shows cos ≪ 1 long before retrieval metrics tank)
    and the centroid-norm ratio (scale drift — the embedding_norm_audit
    signal at the aggregate level). The per-dim means are round4-PINNED
    before any cross-dim math (the centroid policy every
    embedding-aggregate query in the catalog uses), so both engines run
    the cosine on identical 64-value inputs.

    Scale shape: ONE scan-side posexplode into a (label, half, dim)
    keyed aggregate — map-side combinable, dims × labels output rows —
    then all remaining math on the ≤ labels·dims bounded frame; no
    joins against the vector tier, no vector ever crosses a shuffle
    (exchanges carry (label, dim, partial-sum) rows). At 100 TB this is
    the cheapest possible full-tier pass: the same cost class as a
    grouped count."""
    tune_session(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        "label",
        (F.col("vec_id") % 2 == 0).alias("is_ref"),
        F.posexplode("embedding").alias("dim", "v"),
    )
    cent = e.groupBy("label", "dim").agg(
        round4(F.avg(F.when(F.col("is_ref"), F.col("v")))).alias("a"),
        round4(F.avg(F.when(~F.col("is_ref"), F.col("v")))).alias("b"),
    )
    dots = cent.groupBy("label").agg(
        F.sum(F.col("a") * F.col("b")).alias("ab"),
        F.sum(F.col("a") * F.col("a")).alias("aa"),
        F.sum(F.col("b") * F.col("b")).alias("bb"),
    )
    counts = emb.groupBy("label").agg(
        F.count(F.when(F.col("vec_id") % 2 == 0, 1))
        .cast("long")
        .alias("n_ref"),
        F.count(F.when(F.col("vec_id") % 2 != 0, 1))
        .cast("long")
        .alias("n_cand"),
    )
    return dots.join(counts, "label").select(
        F.col("label").cast("long").alias("label"),
        "n_ref",
        "n_cand",
        round4(
            F.col("ab") / (F.sqrt(F.col("aa")) * F.sqrt(F.col("bb")))
        ).alias("centroid_cosine"),
        round4(F.sqrt(F.col("bb")) / F.sqrt(F.col("aa"))).alias(
            "centroid_norm_ratio"
        ),
    )


# ----------------------------- ANN recall/cost frontier ----

_FRONTIER_PROBES = (1, 2, 4, 8, 16)

_ANN_FRONTIER_ORACLE = f"""
    WITH p AS (
        SELECT unnest([{', '.join(str(p) for p in _FRONTIER_PROBES)}])
            AS n_probe
    ), nq AS (
        SELECT CAST(count(*) AS BIGINT) AS n
        FROM embeddings WHERE vec_id < 8
    )
    SELECT CAST(p.n_probe AS BIGINT) AS n_probe,
           nq.n AS n_queries,
           {sql_round4('p.n_probe / 16.0')} AS scanned_fraction,
           true AS recall_ge_prev,
           true AS exact_when_all_cells
    FROM p CROSS JOIN nq
"""


@query("ann_recall_frontier", oracle=_ANN_FRONTIER_ORACLE)
def ann_recall_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The recall/cost TUNING CURVE for the persisted IVF-PQ store —
    the table an ANN deployment is actually configured from: one probe
    of the same store per ``n_probe`` in (1, 2, 4, 8, 16 = all cells),
    each reading only its routed cells' row groups, with recall
    measured against the exact brute-force top-k. Operators read off
    the knee: the n_probe where recall stops paying for scan fraction.

    The rerank depth is set ABOVE any possible candidate count, so the
    exact-cosine re-rank pool IS the full routed candidate set — and
    that makes two properties deterministic instead of empirical:
    (a) ``recall_ge_prev`` — more probed cells is a candidate-pool
    SUPERSET, and a true top-k member in the pool always survives an
    exact re-rank (only other true top-k members can displace it), so
    recall is monotone nondecreasing in n_probe BY CONSTRUCTION;
    (b) ``exact_when_all_cells`` — at n_probe = n_centroids the pool
    is the whole corpus (minus self), the re-rank is exact cosine, and
    recall is exactly 1.0: the frontier provably terminates at the
    brute-force answer. ``scanned_fraction`` = n_probe/16 (power-of-2
    division — bit-exact cross-engine).

    Scale shape: ONE store build amortized across the sweep; each
    probe is the ann_store_ivfpq_topk plan (routed ``__cell IN``
    sliver read + ADC + bounded re-rank); the recall joins are over
    ≤ |q|·k rows. Eager by necessity (store lifecycle at call time)."""
    import shutil

    from lab3_lakehouse_spark.queries._util import scratch_dir

    tune_session(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 8)
    bf = sim_ops.brute_force_topk(
        emb, q, "vec_id", "embedding", k=5
    ).localCheckpoint(eager=False)  # consumed once per probe setting
    root = scratch_dir("ann_frontier_")
    try:
        fit = sim_ops.ivfpq_store_init(
            root, emb, "vec_id", "embedding",
            n_centroids=16, dim=64, m=8, n_codes=32,
        )
        sim_ops.ivfpq_store_append(
            spark, root, emb, "vec_id", "embedding", meta=fit
        )
        bf_pairs = bf.select("query_id", "neighbor_id")
        # ONE read-back of the kilobyte metadata tiers for the whole
        # sweep (r14: was one load per probe setting — 5x two bounded
        # collects that always return the same rows; each probe still
        # reads its routed slivers of the persisted codes tier)
        meta = sim_ops.ivfpq_load_meta(spark, root)
        rows = []
        for n_probe in _FRONTIER_PROBES:
            ann = sim_ops.ivfpq_store_topk(
                spark, root, emb, q, "vec_id", "embedding",
                k=5, n_probe=n_probe, rerank=10**6, meta=meta,
            )
            stats = (
                bf_pairs.join(
                    ann.select("query_id", "neighbor_id").withColumn(
                        "__hit", F.lit(1)
                    ),
                    ["query_id", "neighbor_id"],
                    "left",
                )
                .agg(
                    F.countDistinct("query_id")
                    .cast("long")
                    .alias("n_queries"),
                    F.sum(F.coalesce(F.col("__hit"), F.lit(0))).alias(
                        "__hits"
                    ),
                    F.count(F.lit(1)).alias("__n"),
                )
                .select(
                    F.lit(n_probe).cast("long").alias("n_probe"),
                    "n_queries",
                    (F.col("__hits") / F.col("__n")).alias("__recall"),
                )
            )
            rows.append(stats)
        frontier = rows[0]
        for r in rows[1:]:
            frontier = frontier.unionByName(r)
        w = Window.orderBy("n_probe")  # 5-row frame — bounded by design
        out = frontier.select(
            "n_probe",
            "n_queries",
            round4(F.col("n_probe") / F.lit(16.0)).alias(
                "scanned_fraction"
            ),
            F.coalesce(
                F.col("__recall")
                >= F.lag("__recall").over(w),
                F.lit(True),
            ).alias("recall_ge_prev"),
            (
                (F.col("n_probe") < F.lit(16))
                | (F.col("__recall") == F.lit(1.0))
            ).alias("exact_when_all_cells"),
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


# ------------------------------------------ LSH banding frontier ----

_LSH_FRONTIER_PERMS = 64
#: (bands, rows_per_band) configurations of a 64-permutation signature
_LSH_FRONTIER_CONFIGS = ((8, 8), (16, 4), (32, 2), (64, 1))
#: observed-tail Jaccard buckets: [0.8,0.85) [0.85,0.9) [0.9,0.95) [0.95,1.0]
_LSH_FRONTIER_MIDS = (0.825, 0.875, 0.925, 0.975)


def _lsh_detect_prob(s: float, b: int, r: int) -> float:
    """S-curve P(candidate) = 1 - (1 - s^r)^b, computed ONCE in Python
    (power-of-two exponents via repeated squaring) and consumed by both
    engines as the same repr-pinned double literal — the bootstrap-CDF
    convention, so no query-time pow() anywhere."""
    sr = s
    e = 1
    while e < r:
        sr *= sr
        e *= 2
    q = 1.0 - sr
    e = 1
    while e < b:
        q *= q
        e *= 2
    return 1.0 - q


def _lsh_frontier_grid() -> list[tuple[int, int, int, float, float]]:
    return [
        (b, r, k, _LSH_FRONTIER_MIDS[k], _lsh_detect_prob(_LSH_FRONTIER_MIDS[k], b, r))
        for b, r in _LSH_FRONTIER_CONFIGS
        for k in range(len(_LSH_FRONTIER_MIDS))
    ]


def _lsh_frontier_oracle() -> str:
    # the e0 suffix forces DuckDB to LEX the literal as DOUBLE (strtod
    # round-trip of Python's repr); a bare decimal literal would parse
    # as DECIMAL(17,16) first and lose the last ulp on the cast
    grid_rows = ",\n        ".join(
        f"({b}, {r}, {k}, {s!r}e0, {p!r}e0)"
        for b, r, k, s, p in _lsh_frontier_grid()
    )
    jac = (
        "len(list_intersect(a.w, b.w))::DOUBLE"
        " / (len(a.w) + len(b.w) - len(list_intersect(a.w, b.w)))"
    )
    return f"""
    WITH t AS (
        SELECT doc_id, lang,
               list_distinct(regexp_split_to_array(lower(text), '\\s+')) AS w
        FROM documents
    ),
    pairs AS (
        SELECT {jac} AS j
        FROM t a JOIN t b ON a.lang = b.lang AND a.doc_id < b.doc_id
        WHERE {jac} >= 0.8
    ),
    hist AS (
        SELECT CAST(least(floor((j - 0.8) / 0.05), 3) AS BIGINT) AS bucket,
               CAST(count(*) AS BIGINT) AS n_pairs
        FROM pairs GROUP BY 1
    ),
    grid(bands, rows_per_band, bucket, s_mid, detect_prob) AS (
        VALUES {grid_rows}
    )
    SELECT CAST(g.bands AS BIGINT) AS bands,
           CAST(g.rows_per_band AS BIGINT) AS rows_per_band,
           CAST(g.bucket AS BIGINT) AS bucket,
           g.s_mid, g.detect_prob,
           CAST(coalesce(h.n_pairs, 0) AS BIGINT) AS n_pairs,
           {sql_round4("coalesce(h.n_pairs, 0) * (1.0 - g.detect_prob)")}
               AS expected_missed
    FROM grid g LEFT JOIN hist h ON h.bucket = g.bucket
    """


@query("lsh_banding_frontier", oracle=_lsh_frontier_oracle())
def lsh_banding_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MinHash-LSH TUNING table — the dedup analog of
    ann_recall_frontier: for every (bands, rows_per_band) split of a
    64-permutation signature, the S-curve detection probability
    P = 1 - (1 - s^r)^b at each observed-tail Jaccard bucket, joined
    with the corpus's ACTUAL qualifying-pair histogram to give the
    expected number of missed true pairs per configuration. This is
    the table an operator reads before choosing the banding (and
    before asking minhash_band_rebalance to re-band a live signature
    store): more bands → earlier S-curve threshold → fewer misses but
    more candidate verification work.

    Determinism: the 16 S-curve probabilities are computed once in
    Python (power-of-two exponents by repeated squaring) and consumed
    by BOTH engines as identical repr-pinned double literals — the
    bootstrap-CDF convention, no query-time pow(); the observed
    histogram comes from the LOSSLESS lang+length-banded exact pair
    tier (operators/dedup.banded_word_jaccard_pairs), whose jaccard
    doubles are exact int/int divisions, so bucket membership cannot
    diverge cross-engine. Scale, measured honestly (SCALE_r14_newops:
    alpha 1.34 under the amplifier): the exact pair tier is quadratic
    WITHIN (lang, length-band) blocks — that tier is the
    oracle-replayable twin, not the 100 TB path. At scale the observed
    tail comes from a bounded SAMPLE: either a hash-sampled subset of
    blocks (the histogram is a distribution estimate — sampling blocks
    preserves it) or the signature store's already-verified candidate
    pairs; everything after the histogram is a 16-row literal grid
    join either way."""
    tune_session(spark)
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    hist = (
        _word_jaccard_pairs(docs)
        .select(
            F.least(
                F.floor((F.col("jaccard") - F.lit(0.8)) / F.lit(0.05)),
                F.lit(3),
            )
            .cast("long")
            .alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )
    grid = spark.createDataFrame(
        _lsh_frontier_grid(),
        "bands bigint, rows_per_band bigint, bucket bigint,"
        " s_mid double, detect_prob double",
    )
    return (
        grid.join(F.broadcast(hist), "bucket", "left")
        .select(
            "bands",
            "rows_per_band",
            "bucket",
            "s_mid",
            "detect_prob",
            F.coalesce("n_pairs", F.lit(0)).cast("long").alias("n_pairs"),
            round4(
                F.coalesce("n_pairs", F.lit(0))
                * (F.lit(1.0) - F.col("detect_prob"))
            ).alias("expected_missed"),
        )
    )


# --------------------------------------- FFD bin-packing report ----

_FFD_W = 128       # sequence capacity (tokens)
_FFD_WINDOW = 256  # docs per packing window (bounded FFD group size)

_FFD_ORACLE = f"""
    WITH RECURSIVE toks AS MATERIALIZED (
        SELECT doc_id,
               least(len(regexp_split_to_array(text, '\\s+')),
                     {_FFD_W})::BIGINT AS len_eff,
               len(regexp_split_to_array(text, '\\s+'))::BIGINT AS n_tokens
        FROM documents
    ),
    ranked AS MATERIALIZED (
        SELECT *,
               row_number() OVER (ORDER BY len_eff DESC, doc_id) AS r
        FROM toks
    ),
    -- MATERIALIZED (r15, r14 verdict task #6): d is referenced by BOTH
    -- arms of the recursive fold below — DuckDB inlines CTEs by
    -- default, re-deriving toks/ranked (two full tokenize+sort passes)
    -- inside the recursion instead of once. Values are exact integers
    -- either way; only evaluation count changes.
    d AS MATERIALIZED (
        SELECT *, CAST((r - 1) // {_FFD_WINDOW} AS BIGINT) AS pack_window,
               row_number() OVER (
                   PARTITION BY CAST((r - 1) // {_FFD_WINDOW} AS BIGINT)
                   ORDER BY r
               ) AS i
        FROM ranked
    ),
    f AS (
        -- FFD fold: state = list of bin loads per window; docs arrive
        -- in (len_eff DESC, doc_id) order; first bin that fits wins,
        -- else a new bin opens
        SELECT d.pack_window, d.i, d.doc_id, d.n_tokens, d.len_eff,
               [d.len_eff] AS loads, 1::BIGINT AS bin
        FROM d WHERE d.i = 1
        UNION ALL
        SELECT d.pack_window, d.i, d.doc_id, d.n_tokens, d.len_eff,
               CASE WHEN fit.j IS NULL
                    THEN list_append(f.loads, d.len_eff)
                    ELSE list_transform(
                        range(1, len(f.loads) + 1),
                        x -> CASE WHEN x = fit.j
                                  THEN f.loads[x] + d.len_eff
                                  ELSE f.loads[x] END)
               END AS loads,
               coalesce(fit.j, len(f.loads) + 1)::BIGINT AS bin
        FROM f
        JOIN d ON d.pack_window = f.pack_window AND d.i = f.i + 1
        LEFT JOIN LATERAL (
            SELECT list_filter(
                range(1, len(f.loads) + 1),
                x -> f.loads[x] + d.len_eff <= {_FFD_W}
            )[1] AS j
        ) fit ON true
    )
    SELECT pack_window, doc_id, n_tokens, len_eff, bin,
           CAST(sum(len_eff) OVER (PARTITION BY pack_window, bin)
                AS BIGINT) AS bin_used,
           {sql_round4(
               f"sum(len_eff) OVER (PARTITION BY pack_window, bin)"
               f" / CAST({_FFD_W} AS DOUBLE)"
           )} AS fill_ratio
    FROM f
"""


@query("packing_ffd_report", oracle=_FFD_ORACLE)
def packing_ffd_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-fit-decreasing SEQUENCE packing — the no-split alternative
    to pack_documents_concat_chop: concat-chop wastes nothing but cuts
    documents across sequence boundaries (cross-doc attention
    contamination unless the trainer masks it); FFD keeps every
    document intact inside one sequence at the cost of some pad waste
    (classically ≤ 11/9·OPT + 6/9 bins — Dósa's tight FFD bound,
    public result). Output: the per-document bin assignment plus each
    bin's realized token load and fill ratio — the manifest a
    doc-integrity loader consumes, and the waste table you compare
    against packing_utilization_report before choosing a packer.

    Scale design: FFD is inherently sequential, so the corpus is cut
    into BOUNDED packing windows — consecutive ``_FFD_WINDOW``-doc
    slices of the global (len DESC, id) rank (two-phase bucketed
    ranking, no single-partition sort) — and each window packs
    independently in one Arrow-batched applyInPandas group (the
    documented custom-operator tier: per-group imperative logic the
    relational algebra can't express; group size is bounded by
    construction, so executor memory is bounded at ANY corpus size).
    Sorted-segmented FFD only forgoes cross-window bin sharing: with
    windows sorted by length the tail of one window and the head of
    the next differ by at most one length class, so the waste delta
    vs global FFD is bounded by one bin per window — the standard
    large-scale approximation.

    Determinism contract: the ENTIRE greedy trajectory replays in the
    oracle as a recursive-CTE fold over the same (len DESC, id) order
    (state = the per-window bin-load list; first-fit index via a list
    scan; recursion depth = window size, bounded). Docs longer than
    the capacity are clipped to ``len_eff`` (emitted alongside the
    true n_tokens so truncation is auditable). All integers exact;
    fill_ratio is one int/int division, round4-pinned."""
    from lab3_lakehouse_spark.operators import windows as win_ops

    tune_session(spark)
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id",
        F.least(F.size(F.split(F.col("text"), r"\s+")), F.lit(_FFD_W))
        .cast("long")
        .alias("len_eff"),
        F.size(F.split(F.col("text"), r"\s+")).cast("long").alias("n_tokens"),
    )
    ranked = win_ops.global_row_number(
        toks, metric="len_eff", tie_breakers=("doc_id",),
        rank_col="__r", ascending=False,
    ).withColumn(
        "pack_window", F.expr(f"(__r - 1) div {_FFD_WINDOW}").cast("bigint")
    )

    import pandas as pd

    def ffd(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["__r"]).reset_index(drop=True)
        loads: list[int] = []
        bins: list[int] = []
        for ln in pdf["len_eff"]:
            placed = None
            for j, ld in enumerate(loads):
                if ld + ln <= _FFD_W:
                    placed = j
                    break
            if placed is None:
                loads.append(int(ln))
                bins.append(len(loads))
            else:
                loads[placed] += int(ln)
                bins.append(placed + 1)
        pdf["bin"] = pd.Series(bins, dtype="int64")
        return pdf[["pack_window", "doc_id", "n_tokens", "len_eff", "bin"]]

    packed = ranked.groupBy("pack_window").applyInPandas(
        ffd,
        "pack_window bigint, doc_id bigint, n_tokens bigint,"
        " len_eff bigint, bin bigint",
    )
    wb = Window.partitionBy("pack_window", "bin")
    return packed.select(
        "pack_window",
        "doc_id",
        "n_tokens",
        "len_eff",
        "bin",
        F.sum("len_eff").over(wb).cast("long").alias("bin_used"),
        round4(
            F.sum("len_eff").over(wb) / F.lit(float(_FFD_W))
        ).alias("fill_ratio"),
    )
