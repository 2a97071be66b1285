"""Sequence packing for LLM pretraining pipelines.

The standard pretraining data layout concatenates documents in a
deterministic order and chops the token stream into fixed-length
sequences ("concat-and-chop"); a document whose tokens straddle a
boundary spans two sequences.  The pack assignment of a document is
therefore a pure function of its *starting offset* in the stream:

    pack_id = floor(start_offset / seq_len)
    start_offset = cumulative_tokens_before_this_doc

which is one window cumulative sum — no UDF, no iteration, and (unlike
first-fit bin packing) no sequential dependence beyond the prefix sum
Spark already parallelizes.

Scale note (100 TB): the window is partitioned by a shard column, so
each shard's prefix sum is independent — thousands of shards run in
parallel and no single ordering bottlenecks the job.  Shards are the
unit of reproducibility: (shard, id) order fully determines packing.

Reference parity: the reference (mavikulov/Lab3-Lakehouse) has no
packing surface; this extends the north-star LLM-data inventory
(BASELINE.json) alongside operators/dedup.py and operators/text.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pack_concat_chop(
    df: DataFrame,
    *,
    token_col: str,
    order_col: str,
    shard_col: str,
    seq_len: int,
) -> DataFrame:
    """Assign each row a ``pack_id`` under concat-and-chop packing.

    Adds ``start_offset`` (tokens before this doc within its shard) and
    ``pack_id`` (the fixed-length sequence its first token lands in).
    Deterministic given (shard_col, order_col) — rerunning on the same
    snapshot reproduces byte-identical packs.
    """
    w = Window.partitionBy(shard_col).orderBy(order_col)
    start = (F.sum(token_col).over(w) - F.col(token_col)).alias("start_offset")
    out = df.withColumn("start_offset", start)
    return out.withColumn(
        "pack_id",
        F.floor(F.col("start_offset") / F.lit(float(seq_len))).cast("long"),
    )


def pack_stats(
    packed: DataFrame,
    *,
    token_col: str,
    order_col: str,
    shard_col: str,
) -> DataFrame:
    """Per-pack accounting: doc count, token sum, id span."""
    return packed.groupBy(shard_col, "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_col).alias("pack_tokens"),
        F.min(order_col).alias("first_doc"),
        F.max(order_col).alias("last_doc"),
    )


def pack_span_manifest(
    df: DataFrame,
    *,
    token_col: str,
    order_col: str,
    shard_cols: tuple[str, ...],
    seq_len: int,
) -> DataFrame:
    """Per-sequence packing manifest under concat-and-chop: for every
    fixed-length sequence of the packed token stream, which documents
    contribute tokens to it and how full it is — the table a training
    data loader actually consumes (seq → doc spans), where
    :func:`pack_concat_chop` only answers the inverse (doc → pack).

    A document starting at offset ``start`` with ``n`` tokens spans
    sequences ``start // W .. (start + n - 1) // W``; its contribution
    to sequence ``s`` is ``min(start + n, (s+1)·W) − max(start, s·W)``
    tokens. Both are integer arithmetic on the shard-partitioned prefix
    sum, so the whole manifest is exact and bit-stable cross-engine
    (``fill_ratio`` divides by a power-of-two ``seq_len`` — even the
    double division is exact). Every sequence except a shard's last has
    ``seq_tokens == seq_len`` by construction.

    Scale shape: ONE partitioned window per shard tuple computes the
    prefix sum (no global sort), the span explode adds ``1 + n/W``
    rows per doc (bounded by document length), and the manifest
    aggregation groups on (shard…, seq_id) — co-partitioned with the
    window output, map-side combinable. Manifest rows ≈ total tokens /
    seq_len, i.e. the output is the size of the training schedule, not
    the corpus.
    """
    w = Window.partitionBy(*shard_cols).orderBy(order_col)
    start = (F.sum(token_col).over(w) - F.col(token_col)).cast("long")
    end = start + F.col(token_col).cast("long")
    spans = (
        df.withColumn("__start", start)
        .withColumn("__end", end)
        .withColumn(
            "seq_id",
            # `div` = exact integral division (a double `/` would round
            # past 2^53 — offsets in a 100 TB token stream get there)
            F.explode(
                F.sequence(
                    F.expr(f"__start div {int(seq_len)}").cast("long"),
                    F.expr(f"(__end - 1) div {int(seq_len)}").cast("long"),
                )
            ),
        )
        .withColumn(
            "__overlap",
            F.least(F.col("__end"), (F.col("seq_id") + 1) * seq_len)
            - F.greatest(F.col("__start"), F.col("seq_id") * seq_len),
        )
    )
    return spans.groupBy(*shard_cols, "seq_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("__overlap").cast("long").alias("seq_tokens"),
        F.min(order_col).cast("long").alias("first_position"),
        F.max(order_col).cast("long").alias("last_position"),
    )
