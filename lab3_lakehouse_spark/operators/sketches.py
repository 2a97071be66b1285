"""Relational probabilistic sketches: count-min and Bloom filters.

Both sketches are expressed as *DataFrames of sketch cells*, not opaque
binary blobs, which buys three things at 100 TB:

1. **Mergeable by construction** — CMS cells add (``groupBy(r, b).sum``)
   and Bloom bit sets union (``distinct``), so per-partition /
   per-day sketches roll up to any grain with plain aggregations,
   the same store-sketches-not-numbers design as the HLL rollup
   (operators/aggregate.py:154).
2. **Engine-portable** — every hash is an md5-derived 60-bit integer
   computed by identical string operations in Spark and ANSI SQL, so
   the driver's DuckDB oracle can rebuild the exact same sketch and
   the differential check covers the sketch *values*, not just row
   counts (unlike ``xxhash64``-based ops which get rows-only checks).
3. **Broadcast-size probe side** — a CMS of depth·width cells or a
   Bloom bit set of ≤ m rows is kilobytes; probing a 100 TB fact
   table is a broadcast hash join per hash function, no shuffle of
   the fact side. This is the runtime-filter pattern: build a Bloom
   filter from a selective dimension predicate, prune the fact scan
   *before* the expensive join/shuffle.

The md5 path is ~3× slower per row than ``xxhash64`` — for pipelines
that never need cross-engine parity, swap ``portable_hash60`` for
``F.xxhash64(F.lit(seed), col)``; every downstream shape is unchanged.

No counterpart in the reference (its 333-line ETL has no sketches;
closest is SURVEY §2.7's "distinct & approx" family which this extends).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def portable_hash60(col: Column | str, seed: int) -> Column:
    """Seeded 60-bit integer hash with an exact ANSI-SQL twin.

    Spark: ``conv(substring(md5(concat(seed, '|', x)), 1, 15), 16, 10)``;
    DuckDB: ``('0x' || substr(md5(seed || '|' || x), 1, 15))::BIGINT``
    (emitted by :func:`sql_hash60`). 15 hex chars = 60 bits → always a
    positive BIGINT, so ``% width`` agrees across engines (no negative-
    modulo divergence).

    NULL keys hash to NULL on BOTH engines: ``F.concat`` propagates
    NULL exactly like DuckDB's ``||`` (``concat_ws`` would silently
    skip it and hash ``'seed|'`` — the r4 ADVICE divergence, where a
    null key got sketched in Spark but dropped by the oracle). The
    sketch builders therefore share the engines' own contract: null
    keys contribute no cells/bits; callers that want nulls counted
    must coalesce to a sentinel BEFORE hashing, in both engines.
    """
    c = F.col(col) if isinstance(col, str) else col
    tagged = F.concat(F.lit(str(seed) + "|"), c.cast("string"))
    return F.conv(F.substring(F.md5(tagged), 1, 15), 16, 10).cast("long")


def sql_hash60(expr: str, seed: int) -> str:
    """The DuckDB twin of :func:`portable_hash60` for oracle SQL."""
    return f"('0x' || substr(md5('{seed}' || '|' || CAST(({expr}) AS VARCHAR)), 1, 15))::BIGINT"


# ------------------------------------------------------------ count-min ----

def cms_buckets(col: Column | str, depth: int, width: int) -> Column:
    """array<long> of the key's bucket per sketch row (one seeded hash
    each — the pairwise-independent family the CMS bound assumes)."""
    return F.array(*[portable_hash60(col, r) % width for r in range(depth)])


def cms_build(df: DataFrame, col: Column | str, depth: int = 4, width: int = 256) -> DataFrame:
    """Count-min sketch of a key column as a cell table ``(r, b, cnt)``.

    One narrow pass: each key row explodes to ``depth`` (row, bucket)
    pairs, then a single ``groupBy(r, b)`` — map-side partial combine
    collapses the per-partition cells to ≤ depth·width rows *before*
    the exchange, so shuffle volume is bounded by the sketch size times
    the partition count, independent of data volume. Merging sketches
    from different slices = union + re-sum of the same cell grid.
    """
    cells = df.select(F.posexplode(cms_buckets(col, depth, width)).alias("r", "b"))
    return cells.groupBy("r", "b").agg(F.count(F.lit(1)).alias("cnt"))


def cms_estimate(
    cms: DataFrame, keys: DataFrame, col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Point-estimate each key against a built sketch: min over the
    key's ``depth`` cells (missing cell → 0). The sketch side is
    broadcast — estimating any number of keys never shuffles them.
    Guarantee: estimate ≥ true count always (cells only over-count);
    over-estimate ≤ ε·N with prob 1-δ for width=⌈e/ε⌉, depth=⌈ln 1/δ⌉.
    """
    kb = keys.select(
        F.col(col), F.posexplode(cms_buckets(col, depth, width)).alias("r", "b")
    )
    joined = kb.join(F.broadcast(cms), ["r", "b"], "left")
    return joined.groupBy(col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_n")
    )


# --------------------------------------------------------------- bloom ----

#: seed base for Bloom hash functions — disjoint from CMS row seeds.
_BLOOM_SEED0 = 100


def bloom_bit_positions(col: Column | str, n_bits: int, n_hashes: int) -> list[Column]:
    return [
        portable_hash60(col, _BLOOM_SEED0 + s) % n_bits for s in range(n_hashes)
    ]


def bloom_build(
    keys: DataFrame, col: Column | str, n_bits: int = 4096, n_hashes: int = 3
) -> DataFrame:
    """Bloom filter of a key set as a set-bit table ``(bit)``.

    ≤ ``n_bits`` rows regardless of key count; sketches from disjoint
    key slices merge with ``union().distinct()``.
    """
    pos = F.explode(F.array(*bloom_bit_positions(col, n_bits, n_hashes)))
    return keys.select(pos.alias("bit")).distinct()


def bloom_probe(
    df: DataFrame,
    col: Column | str,
    bits: DataFrame,
    n_bits: int = 4096,
    n_hashes: int = 3,
    flag: str = "bloom_pass",
) -> DataFrame:
    """Tag each probe row with membership-in-filter (no false negatives).

    ``n_hashes`` broadcast LEFT joins of the tiny bit table against the
    row's bit positions — the probe side is never shuffled, which is
    the whole point: at 100 TB this runs inside the fact-table scan
    stage and drops non-matching rows before any exchange.
    """
    out = df
    markers = []
    for s, pos in enumerate(bloom_bit_positions(col, n_bits, n_hashes)):
        m = f"__bloom{s}"
        markers.append(m)
        out = out.join(
            F.broadcast(bits.select(F.col("bit").alias(m))),
            on=[pos == F.col(m)],
            how="left",
        )
    cond = F.col(markers[0]).isNotNull()
    for m in markers[1:]:
        cond = cond & F.col(m).isNotNull()
    return out.withColumn(flag, cond).drop(*markers)


def bloom_store_append(
    store_root: str,
    keys: DataFrame,
    col: Column | str,
    *,
    n_bits: int = 1 << 16,
    n_hashes: int = 3,
    batch_id: int | None = None,
) -> None:
    """Append one key batch to a PERSISTED Bloom tier — the membership
    counterpart of the BM25 postings / media-signature stores
    (operators/text.bm25_append_batch): cost proportional to the
    BATCH, the existing store is never read (append-only parquet), and
    disjoint appends compose because a Bloom filter's bit set is a
    union. Layout: ``{root}/bits`` accumulates set-bit rows (the
    reader de-duplicates — ≤ n_bits rows survive no matter how many
    batches appended); ``{root}/meta`` gets one ``(n_keys)`` row per
    batch so FP-rate accounting can estimate saturation without
    touching the keys again. n_bits/n_hashes must match across appends
    and probes (store them in the path or a config sidecar in
    production).

    Replay accounting: the BIT side is idempotent by construction (a
    replayed batch re-appends identical bit rows and the reader
    de-duplicates), but a replayed meta row would over-count keys —
    callers with a replay source (streaming foreachBatch) pass
    ``batch_id`` so ``bloom_store_meta`` can collapse duplicates;
    one-shot batch appends may leave it None."""
    from lab3_lakehouse_spark import stores

    bits = bloom_build(keys, col, n_bits, n_hashes)
    stores.append_rows(bits, store_root, "bits")
    meta = keys.agg(F.count(F.lit(1)).cast("long").alias("n_keys"))
    meta = meta.withColumn("batch_id", F.lit(batch_id).cast("long"))
    stores.append_sidecar(meta, store_root)


def bloom_store_bits(spark, store_root: str) -> DataFrame:
    """Read the merged bit set of a persisted Bloom tier: union of all
    appended batches, de-duplicated — ≤ n_bits rows, broadcastable
    into any probe scan at any store age."""
    from lab3_lakehouse_spark import stores

    return stores.read_tier(spark, store_root, "bits").distinct()


def bloom_store_meta(spark, store_root: str) -> DataFrame:
    """Replay-safe key accounting for a persisted Bloom tier: one
    ``(n_keys, batch_id)`` row per DISTINCT tagged batch (a checkpoint
    replay re-appends the same batch_id, which collapses here — the
    bit side was already idempotent), plus every untagged
    (NULL batch_id) one-shot append verbatim. The explicit read schema
    makes pre-r11 stores (meta files written before the batch_id
    column existed) read as untagged NULL rows instead of failing the
    mixed-schema union — no rebuild needed."""
    from lab3_lakehouse_spark import stores

    meta = stores.read_tier(
        spark, store_root, "meta", schema="n_keys long, batch_id long"
    )
    tagged = meta.filter(F.col("batch_id").isNotNull()).dropDuplicates(
        ["batch_id"]
    )
    return tagged.unionByName(meta.filter(F.col("batch_id").isNull()))


# ---------------------------------------------------------------- KMV ----

def kmv_cells(
    df: DataFrame,
    *,
    segment_col: str,
    key_col: str,
    k: int,
    seed: int = 11,
) -> DataFrame:
    """K-minimum-values distinct sketch per segment: the ``k`` smallest
    ``portable_hash60`` values of the segment's distinct keys — columns
    ``(segment, h, rn)``.

    KMV (Bar-Yossef et al. 2002) is the sketch family that gives
    DISTINCT-INTERSECTION estimates, which HLL cannot: cells from any
    two segments merge by "union hashes, keep k smallest", and the
    fraction of merged cells present in both inputs estimates the
    Jaccard of the key sets. Like every sketch in this module the hash
    is engine-portable, so cells — not just estimates — are
    reproducible cell-by-cell in the oracle.

    Scale: distinct → hash → per-segment top-k is one shuffle on the
    segment key plus a PARTITIONED window (never a global sort); the
    output is k rows per segment no matter the corpus size.
    """
    from pyspark.sql import Window

    seg = F.col(segment_col)
    distinct_keys = df.select(seg.alias("segment"), F.col(key_col).alias("k")).distinct()
    hashed = distinct_keys.select(
        "segment", portable_hash60(F.col("k"), seed).alias("h")
    ).distinct()
    w = Window.partitionBy("segment").orderBy("h")
    return (
        hashed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
    )


#: 2^60 as a double — the hash range KMV estimates divide by.
KMV_RANGE = float(1 << 60)


def kmv_estimate(theta: Column, n_cells: Column, k: int) -> Column:
    """Distinct-count estimate from a KMV sketch: ``(k-1) * 2^60 /
    theta`` when the sketch saturated (``n_cells = k``), else the exact
    cell count (the standard small-set rule — below ``k`` the sketch IS
    the distinct set)."""
    return F.when(
        n_cells < F.lit(k), n_cells.cast("double")
    ).otherwise(F.lit(float(k - 1)) * F.lit(KMV_RANGE) / theta.cast("double"))


# --------------------------------------------------------------------------
# KLL-style deterministic mergeable quantile sketch
# --------------------------------------------------------------------------
#
# The quantile member of the mergeable-sketch family (HLL = distinct,
# CMS = frequency, KMV = distinct-θ, this = rank): per-shard sketches
# built in ONE pass over the data, merged to any grain WITHOUT
# rescanning — the store-sketches-not-numbers design continuous
# aggregates need at 100 TB. The compactor is the KLL/MRL scheme
# (Karnin-Lang-Liberty 2016 / Munro-Paterson, re-derived from the
# published algorithms) with one deliberate change: compaction keeps
# alternating-offset items DETERMINISTICALLY (per-level parity flip)
# instead of coin-flipping, so a rebuild over the same shard contents
# yields the identical sketch — replayable pipelines beat the ~2×
# tighter randomized constant. Rank error stays O(log²(n/k)/k)·n
# (the classic deterministic bound); the registry contract measures
# the achieved error against the real data, so the guarantee is
# checked end-to-end, not assumed.


def _kll_insert(levels: list, values, k: int) -> None:
    """Bulk-insert values into level 0, compacting full levels upward.
    ``levels`` is a list of (items list, parity int) pairs mutated in
    place; level i items carry weight 2^i."""
    levels[0][0].extend(values)
    i = 0
    while i < len(levels):
        items, parity = levels[i]
        if len(items) <= k:
            i += 1
            continue
        items.sort()
        keep = items[parity::2]
        levels[i] = ([], parity ^ 1)
        if i + 1 == len(levels):
            levels.append(([], 0))
        levels[i + 1][0].extend(keep)
        i += 1


def _kll_merge(levels_a: list, levels_b: list, k: int) -> list:
    """Merge two level lists: concatenate per level, then re-compact."""
    out = []
    for i in range(max(len(levels_a), len(levels_b))):
        items: list = []
        parity = 0
        if i < len(levels_a):
            items.extend(levels_a[i][0])
            parity = levels_a[i][1]
        if i < len(levels_b):
            items.extend(levels_b[i][0])
        out.append((items, parity))
    # normalize into mutable pairs and compact any overfull level
    out = [[list(it), p] for it, p in out]
    i = 0
    while i < len(out):
        items, parity = out[i]
        if len(items) <= k:
            i += 1
            continue
        items.sort()
        keep = items[parity::2]
        out[i] = [[], parity ^ 1]
        if i + 1 == len(out):
            out.append([[], 0])
        out[i + 1][0].extend(keep)
        i += 1
    return out


def _kll_quantiles(levels: list, qs: list[float]) -> list[float]:
    """Weighted-rank quantile estimates from a level list."""
    import numpy as np

    vals, wts = [], []
    for i, (items, _parity) in enumerate(levels):
        vals.extend(items)
        wts.extend([1 << i] * len(items))
    if not vals:
        return [float("nan")] * len(qs)
    v = np.asarray(vals, dtype="float64")
    w = np.asarray(wts, dtype="float64")
    order = np.argsort(v, kind="mergesort")
    v, w = v[order], w[order]
    cw = np.cumsum(w)
    total = cw[-1]
    out = []
    for q in qs:
        target = q * total
        idx = int(np.searchsorted(cw, target, side="left"))
        out.append(float(v[min(idx, len(v) - 1)]))
    return out


def kll_sketch_rollup(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    *,
    k: int = 256,
    shards: int = 8,
    shard_col: str | None = None,
) -> DataFrame:
    """Per-(keys × shard) partial KLL sketches, serialized as
    ``(keys…, shard, level, items array<double>)`` rows — the
    persistable quantile store. One ``applyInPandas`` pass; a group is
    a SHARD of a key, never a whole key, so no executor ever holds a
    key's full data — the merge to key grain
    (:func:`kll_merge_quantiles`) touches only sketch rows
    (k·log(n/k) values per shard).

    The shard is derived from the DATA — ``pmod(xxhash64(shard_col or
    value_col), shards)`` — never from ``spark_partition_id()``: a
    replay with different file splits or executor count must reassign
    every row to the SAME shard, or at-least-once re-appends of a
    persisted sketch tier would not be recognizable as duplicates
    (the streaming/monitor.stream_kll_quantiles replay contract).
    Pass ``shard_col`` (a high-cardinality stable id) when the value
    column itself is heavily repeated — equal values always land in
    one shard, which skews shard sizes (never correctness: shards are
    merged before any estimate is read)."""
    import pandas as pd

    gcols = [*keys, "__shard"]
    schema = ", ".join(
        [f"`{c}` string" for c in keys]
        + ["__shard int", "level int", "items array<double>"]
    )

    def build(pdf: "pd.DataFrame") -> "pd.DataFrame":
        levels = [[[], 0]]
        _kll_insert(levels, pdf[value_col].dropna().tolist(), k)
        head = {c: pdf[c].iloc[0] for c in gcols}
        # emit items SORTED: per-(shard, level) content is a pure
        # function of the shard multiset (bulk insert + sorted
        # compaction), but the uncompacted level-0 residue keeps pdf
        # arrival order — sorting makes the stored ROW byte-identical
        # under any partition layout (the replay contract), and every
        # consumer (merge, quantile read) sorts anyway
        rows = [
            {**head, "level": i, "items": sorted(items)}
            for i, (items, _p) in enumerate(levels)
            if items
        ]
        return pd.DataFrame(
            rows, columns=[*gcols, "level", "items"]
        )

    return (
        df.filter(F.col(value_col).isNotNull())
        .withColumn(
            "__shard",
            F.pmod(
                F.xxhash64(F.col(shard_col or value_col)), F.lit(shards)
            ).cast("int"),
        )
        .groupBy(*gcols)
        .applyInPandas(build, schema)
    )


def kll_merge_quantiles(
    sketches: DataFrame,
    keys: list[str],
    qs: list[float],
    *,
    k: int = 256,
) -> DataFrame:
    """Merge per-shard KLL sketches to key grain and estimate the
    ``qs`` quantiles → ``(keys…, q, est)``. Input per group is sketch
    rows only (shards · k · levels values), so the merge is
    metadata-sized regardless of corpus size."""
    import pandas as pd

    schema = ", ".join(
        [f"`{c}` string" for c in keys] + ["q double", "est double"]
    )

    def merge(pdf: "pd.DataFrame") -> "pd.DataFrame":
        merged: list = [[[], 0]]
        # scalar grouper (not a 1-list): a single-key list grouper
        # yields scalar keys on pandas < 3.0, so a tuple unpack here
        # would TypeError on anything but the pinned pandas version
        for _s, grp in pdf.groupby("__shard", sort=True):
            # re-inflate implicit empty levels (levels with no items
            # were dropped at build time)
            lv = {int(r["level"]): list(r["items"]) for _, r in grp.iterrows()}
            levels = [[lv.get(i, []), 0] for i in range(max(lv) + 1)]
            merged = _kll_merge(merged, levels, k)
        ests = _kll_quantiles(merged, qs)
        head = {c: pdf[c].iloc[0] for c in keys}
        return pd.DataFrame(
            [{**head, "q": q, "est": e} for q, e in zip(qs, ests)],
            columns=[*keys, "q", "est"],
        )

    return sketches.groupBy(*keys).applyInPandas(merge, schema)


def kll_sketch_compact(
    sketches: DataFrame,
    keys: list[str],
    *,
    k: int = 256,
) -> DataFrame:
    """Store GC for a persisted KLL quantile tier: fold every sketch
    row of a key into ONE compactor (``__shard = 0``) — same output
    schema as :func:`kll_sketch_rollup`, so compacted and raw tiers
    interleave freely. A long-lived tier accumulates batches·shards
    rows forever (stream_kll_quantiles appends per micro-batch);
    compaction collapses a key to ≤ k·log(n/k) values WITHOUT
    rescanning any raw data, and — because the fold is the SAME
    deterministic shard-ordered merge :func:`kll_merge_quantiles`
    runs — every quantile estimate read from the compacted tier is
    BIT-IDENTICAL to the estimate the uncompacted tier produced
    (pinned by the kll_tier_compaction registry entry). Run it on the
    usual offline maintenance cadence; input per group is sketch rows
    only, so cost is metadata-sized at any corpus age."""
    import pandas as pd

    gcols = [*keys, "__shard"]
    schema = ", ".join(
        [f"`{c}` string" for c in keys]
        + ["__shard int", "level int", "items array<double>"]
    )

    def compact(pdf: "pd.DataFrame") -> "pd.DataFrame":
        merged: list = [[[], 0]]
        for _s, grp in pdf.groupby("__shard", sort=True):
            lv = {
                int(r["level"]): list(r["items"]) for _, r in grp.iterrows()
            }
            levels = [[lv.get(i, []), 0] for i in range(max(lv) + 1)]
            merged = _kll_merge(merged, levels, k)
        head = {c: pdf[c].iloc[0] for c in keys}
        rows = [
            {**head, "__shard": 0, "level": i, "items": sorted(items)}
            for i, (items, _p) in enumerate(merged)
            if items
        ]
        return pd.DataFrame(rows, columns=[*gcols, "level", "items"])

    return sketches.groupBy(*keys).applyInPandas(compact, schema)
