"""Join operators (absent from the reference — SURVEY §2.7 gap list).

The reference has **no joins**; this module supplies the standard
equi-join surface a lakehouse query engine needs, with scale-aware
strategy selection:

- ``equi_join``     — inner/left/right/full/semi/anti on named keys.
- ``broadcast_dim`` — explicit broadcast hint for small dimensions.
- ``star_join``     — fact ⋈ many dims, broadcasting every dim whose
  name is in ``catalog.SMALL_DIMS`` (region/nation/… stay broadcastable
  even at TPC-H SF100k; the fact side never shuffles for them).
- ``skew_salted_join`` — explicit salting fallback for a hot key when
  AQE skew-join splitting isn't enough.

Scale notes: with AQE on (session.py) Spark picks broadcast-hash vs
sort-merge from *runtime* sizes and splits skewed partitions; the
explicit ``F.broadcast`` hints here are for dims we know are small by
contract, which saves AQE the first wrong-sized shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

JOIN_TYPES = ("inner", "left", "right", "full", "left_semi", "left_anti", "cross")


def _hashable_salt_source(df: DataFrame, salt_cols: Sequence[str] | None) -> list[str]:
    """Columns to derive a deterministic salt from. Explicit
    ``salt_cols`` are used verbatim (caller asked for them — fail loudly
    if unhashable); the every-column default silently drops types
    ``xxhash64`` rejects (MapType, and nested types containing maps)."""
    if salt_cols:
        return list(salt_cols)
    cols = [f.name for f in df.schema.fields if "map<" not in f.dataType.simpleString()]
    if not cols:
        raise ValueError("no hashable columns to derive a salt from; pass salt_cols")
    return cols


def equi_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str] | list,
    how: str = "inner",
    broadcast_right: bool = False,
) -> DataFrame:
    if how not in JOIN_TYPES:
        raise ValueError(f"how must be one of {JOIN_TYPES}")
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, on=on, how=how)


def broadcast_dim(dim: DataFrame) -> DataFrame:
    return F.broadcast(dim)


def star_join(
    fact: DataFrame,
    dims: Sequence[tuple[DataFrame, str | Sequence[str] | list, str]],
    small_dim_names: Sequence[str] = (),
) -> DataFrame:
    """Join a fact table against a sequence of ``(dim, on, name)`` triples.

    Dims listed in ``small_dim_names`` get a broadcast hint; the rest are
    left to AQE. Join order is as given — put the most selective dim
    first so downstream joins see fewer fact rows (Catalyst/CBO may still
    reorder inner joins).
    """
    out = fact
    small = set(small_dim_names)
    for dim, on, name in dims:
        d = F.broadcast(dim) if name in small else dim
        out = out.join(d, on=on, how="inner")
    return out


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Sequence[str] = (),
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join: for each left row, attach the most recent
    right row with ``right_ts <= left_ts`` for the same key (left join —
    unmatched rows keep NULLs).

    Spark has no AsOfJoin operator; the scalable formulation is the
    union + carry-forward pattern: tag both inputs, union them, and run
    ``last(col, ignorenulls=True)`` over a window partitioned by key and
    ordered by (ts, side) — ONE shuffle on the key, zero join fan-out,
    no per-left-row range probe. (The naive alternative — inequality
    join + groupBy-max — explodes to |L|·|R| per key before aggregating.)
    Right rows order before left rows at equal ts, so ties are inclusive,
    matching DuckDB's ``ASOF JOIN ... ON r.ts <= l.ts`` semantics.

    The right payload travels as ONE struct column carried by a single
    ``last(ignorenulls=True)``, so the matched right row is attached
    atomically — NULLs in its payload columns stay NULL instead of being
    back-filled from older right rows (per-column carry would mix
    several right rows, diverging from DuckDB/pandas ASOF semantics).
    """
    from pyspark.sql import Window
    from pyspark.sql import types as T

    right_cols = list(right_cols) or [
        c for c in right.columns if c not in (key, right_ts)
    ]
    r_struct_type = T.StructType(
        [T.StructField(c, right.schema[c].dataType) for c in right_cols]
        + [T.StructField("__rts", right.schema[right_ts].dataType)]
    )
    lhs = left.select(
        F.col(key),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in left.columns if c not in (key, left_ts)],
        F.col(left_ts),
        F.lit(None).cast(r_struct_type).alias("__r"),
    )
    rhs = right.select(
        F.col(key),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in (key, left_ts)],
        F.lit(None).cast(left.schema[left_ts].dataType).alias(left_ts),
        F.struct(
            *[F.col(c).alias(c) for c in right_cols],
            F.col(right_ts).alias("__rts"),
        ).alias("__r"),
    )
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = lhs.unionByName(rhs).withColumn(
        "__rc", F.last("__r", ignorenulls=True).over(w)
    )
    keep = (
        [key]
        + [c for c in left.columns if c not in (key, left_ts)]
        + [left_ts]
        + [F.col(f"__rc.{c}").alias(f"{c}{suffix}") for c in right_cols]
        + [F.col("__rc.__rts").alias(f"{right_ts}{suffix}")]
    )
    return carried.filter(F.col("__side") == 1).select(*keep)


def binned_range_join(
    left: DataFrame,
    right: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: float,
) -> DataFrame:
    """Range join (point ∈ [lo, hi)) as an equi-join on bins.

    A naive inequality join plans as BroadcastNestedLoopJoin — O(|L|·|R|)
    compute even when the output is small. Binning makes it an equi-join:
    each point hashes to one bin, each range is exploded to the bins it
    covers (ranges ≫ bin_width explode wider — pick bin_width near the
    median range length), and the residual predicate filters exact
    membership. No duplicates: a point lives in exactly one bin.
    """
    lb = left.withColumn("__bin", F.floor(F.col(point_col) / F.lit(bin_width)))
    rb = right.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(bin_width)),
                F.floor(F.col(hi_col) / F.lit(bin_width)),
            )
        ),
    )
    return (
        lb.join(rb, on="__bin")
        .filter((F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) < F.col(hi_col)))
        .drop("__bin")
    )


def skew_salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt_buckets: int = 16,
    how: str = "inner",
    salt_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Salted equi-join for a skewed single-key join.

    Left rows get a salt in [0, salt_buckets); the right side is
    replicated ``salt_buckets``× with every salt value, and the join key
    becomes (key, salt) — spreading a hot key across reducers. Exact for
    inner/left joins (each left row matches exactly the same right rows
    as before). Prefer AQE skew-join; use this when one key alone
    exceeds a single executor's memory.

    The salt is derived DETERMINISTICALLY from row content
    (``xxhash64`` of ``salt_cols``, default: every hashable left column)
    — never from ``monotonically_increasing_id()``/``rand()``. A
    nondeterministic expression feeding a shuffle key is the SPARK-23207
    hazard: a map stage recomputed after a fetch failure can re-salt rows
    into different buckets than already-fetched output, silently dropping
    or duplicating rows. Pass a stable unique-id column as ``salt_cols``
    when one exists (cheaper than hashing the full row) — and ALWAYS when
    left rows can be fully duplicate: identical rows hash to one salt
    bucket, so the very duplicates a skewed workload tends to carry would
    all land on one reducer, defeating the salting.

    Only inner/left are supported: the right side is replicated
    ``salt_buckets``×, so for right/full joins every unmatched right row
    would surface ``salt_buckets`` times, and semi/anti existence
    semantics survive replication only by accident of the left-side salt.
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(
            f"skew_salted_join supports how in ('inner','left','left_outer'); "
            f"got {how!r} — right/full/semi/anti are incorrect under right-side "
            f"replication (use AQE skew-join instead)"
        )
    salt_src = [F.col(c) for c in _hashable_salt_source(left, salt_cols)]
    salted_left = left.withColumn(
        "__salt", F.pmod(F.xxhash64(*salt_src), F.lit(salt_buckets)).cast("long")
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))).alias("__salt")
    salted_right = right.select("*", salts).withColumn("__salt", F.col("__salt").cast("long"))
    out = salted_left.join(salted_right, on=[on, "__salt"], how=how)
    return out.drop("__salt")


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    keys: Sequence[str],
    a_start: str,
    a_end: str,
    b_start: str,
    b_end: str,
    bin_seconds: int = 600,
) -> DataFrame:
    """Interval–interval overlap join without a nested loop: each
    interval registers in every ``bin_seconds`` bucket it covers
    (``sequence`` + ``explode`` — fan-out ≤ ⌈len/bin⌉+1, ≈2 when bins
    are sized near the typical interval length), the sides equi-join on
    ``keys + bucket``, and the exact closed-interval overlap predicate
    filters the candidates. The generalization of the point-in-band
    binned range join (``range_join_binned``) to two interval sides.

    Each overlapping pair is emitted EXACTLY ONCE without a distinct:
    a pair is kept only in the bucket containing the overlap start
    (``floor(max(starts)/bin)``), so duplicate rows in the inputs
    survive faithfully and no dedup shuffle is needed.
    """
    def binned(df: DataFrame, s: str, e: str) -> DataFrame:
        lo = F.floor(F.unix_timestamp(F.col(s)) / bin_seconds).cast("long")
        hi = F.floor(F.unix_timestamp(F.col(e)) / bin_seconds).cast("long")
        return df.withColumn("__bin", F.explode(F.sequence(lo, hi)))

    al, bl = binned(a, a_start, a_end).alias("a"), binned(b, b_start, b_end).alias("b")
    overlap_start_bin = F.floor(
        F.greatest(
            F.unix_timestamp(F.col(f"a.{a_start}")),
            F.unix_timestamp(F.col(f"b.{b_start}")),
        )
        / bin_seconds
    ).cast("long")
    joined = al.join(
        bl,
        on=[F.col("a.__bin") == F.col("b.__bin")]
        + [F.col(f"a.{k}") == F.col(f"b.{k}") for k in keys],
    ).filter(
        (F.col(f"a.{a_start}") <= F.col(f"b.{b_end}"))
        & (F.col(f"b.{b_start}") <= F.col(f"a.{a_end}"))
        & (F.col("a.__bin") == overlap_start_bin)
    )
    return joined.select(
        *[F.col(f"a.{k}").alias(k) for k in keys],
        *[F.col(f"a.{c}") for c in a.columns if c not in keys],
        *[F.col(f"b.{c}") for c in b.columns if c not in keys],
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Sequence[str] = (),
    suffix: str = "_next",
    right_order: str | None = None,
) -> DataFrame:
    """FORWARD as-of join: for each left row, attach the EARLIEST right
    row with ``right_ts >= left_ts`` for the same key (left join —
    unmatched rows keep NULLs). The time-to-next-event shape
    (time-to-convert, next maintenance window, next price revision)
    that the backward :func:`asof_join` can't express.

    Same union + carry pattern, mirrored: one shuffle on the key,
    ``first(ignorenulls=True)`` over a window running from the current
    row to the partition END, ordered ``(ts, side)`` with LEFT rows
    before RIGHT rows at equal ts — ties are inclusive (a right row AT
    the left timestamp matches), the mirror of the backward operator's
    ``<=``. Pass ``right_order`` (a right-side column, e.g. its id) to
    pin which of several right rows at the SAME timestamp wins — the
    backward operator inherits the analogous ambiguity; forward callers
    that need oracle-exact output should always pin it."""
    from pyspark.sql import Window
    from pyspark.sql import types as T

    right_cols = list(right_cols) or [
        c for c in right.columns if c not in (key, right_ts)
    ]
    r_struct_type = T.StructType(
        [T.StructField(c, right.schema[c].dataType) for c in right_cols]
        + [T.StructField("__rts", right.schema[right_ts].dataType)]
    )
    tb_type = (
        right.schema[right_order].dataType if right_order else T.IntegerType()
    )
    lhs = left.select(
        F.col(key),
        F.col(left_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(tb_type).alias("__tb"),
        *[F.col(c) for c in left.columns if c not in (key, left_ts)],
        F.col(left_ts),
        F.lit(None).cast(r_struct_type).alias("__r"),
    )
    rhs = right.select(
        F.col(key),
        F.col(right_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        (F.col(right_order) if right_order else F.lit(None)).cast(
            tb_type
        ).alias("__tb"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
            if c not in (key, left_ts)
        ],
        F.lit(None).cast(left.schema[left_ts].dataType).alias(left_ts),
        F.struct(
            *[F.col(c).alias(c) for c in right_cols],
            F.col(right_ts).alias("__rts"),
        ).alias("__r"),
    )
    w = (
        Window.partitionBy(key)
        .orderBy(
            F.col("__ts").asc(), F.col("__side").asc(), F.col("__tb").asc()
        )
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    carried = lhs.unionByName(rhs).withColumn(
        "__rc", F.first("__r", ignorenulls=True).over(w)
    )
    keep = (
        [key]
        + [c for c in left.columns if c not in (key, left_ts)]
        + [left_ts]
        + [F.col(f"__rc.{c}").alias(f"{c}{suffix}") for c in right_cols]
        + [F.col("__rc.__rts").alias(f"{right_ts}{suffix}")]
    )
    return carried.filter(F.col("__side") == 0).select(*keep)
