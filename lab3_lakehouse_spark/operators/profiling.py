"""Table profiling: per-column statistics (row/null/distinct counts,
numeric min/max) in ONE distributed pass — the ANALYZE-TABLE-style
operator an engine needs before choosing join strategies, bucketing
keys, or histogram bins on unfamiliar 100 TB inputs.

No counterpart in the reference (its only introspection is pandas
``head``, download_dataset.py:7); this is north-star surface.

Scale shape: all statistics for all columns are expressions of a single
``df.agg(...)``. The exact multi-column ``count(DISTINCT ...)`` plans as
Catalyst's Expand strategy — one scan, rows multiplied by the number of
profiled columns before a partial/final hash agg. That trade (row
multiplication for single-pass exactness) is the standard one; for
wide tables at extreme scale, pass ``approx=True`` to swap in HLL
``approx_count_distinct`` (no Expand, one plain agg) at the cost of the
±rsd estimate. The tiny aggregated row is unpivoted with ``stack``,
never the input.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: types whose min/max are reported (cast to double) in the profile.
_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def profile_columns(
    df: DataFrame,
    cols: list[str] | None = None,
    approx: bool = False,
) -> DataFrame:
    """Profile ``cols`` (default: every column) of ``df`` into a LONG
    frame ``(column, n_rows, n_nulls, n_distinct, min_value, max_value)``
    — one row per profiled column; ``min_value``/``max_value`` are
    doubles for numeric columns and NULL otherwise (string/timestamp
    extrema are collation/format traps across engines and callers).
    """
    cols = list(df.columns) if cols is None else list(cols)
    schema = {f.name: f.dataType for f in df.schema.fields}

    ndv: Column = (
        (lambda c: F.approx_count_distinct(c)) if approx
        else (lambda c: F.count_distinct(F.col(c)))
    )
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.count(F.col(c)).alias(f"__nn_{c}"))
        aggs.append(ndv(c).alias(f"__nd_{c}"))
        if isinstance(schema[c], _NUMERIC):
            aggs.append(F.min(F.col(c)).cast("double").alias(f"__min_{c}"))
            aggs.append(F.max(F.col(c)).cast("double").alias(f"__max_{c}"))

    wide = df.agg(*aggs)

    def row(c: str) -> Column:
        is_num = isinstance(schema[c], _NUMERIC)
        null_d = F.lit(None).cast("double")
        return F.struct(
            F.lit(c).alias("column"),
            F.col("__n").cast("long").alias("n_rows"),
            (F.col("__n") - F.col(f"__nn_{c}")).cast("long").alias("n_nulls"),
            F.col(f"__nd_{c}").cast("long").alias("n_distinct"),
            (F.col(f"__min_{c}") if is_num else null_d).alias("min_value"),
            (F.col(f"__max_{c}") if is_num else null_d).alias("max_value"),
        )

    # inline(array(struct...)): the unpivot runs on the ONE aggregated
    # row — uniform field names make the row structs stack-compatible
    return wide.select(F.inline(F.array(*[row(c) for c in cols])))


def fd_violation_stats(
    df: DataFrame, lhs: list[str], rhs: str
) -> DataFrame:
    """Check one candidate functional dependency ``lhs → rhs``
    (the Metanome/data-quality FD-validation primitive, re-derived):
    one row ``(fd, n_lhs, n_violating, fd_holds)`` where
    ``n_violating`` counts LHS values determining MORE than one
    distinct RHS — zero iff the dependency holds exactly.

    Scale shape: one grouped ``countDistinct`` on the LHS key (partial
    aggregation map-side) folded to a single row — per-FD cost is one
    keyed shuffle of (lhs, rhs) pairs regardless of how many FDs a
    profiling sweep validates, and candidate FDs are validated
    independently so a sweep parallelizes trivially."""
    name = f"{','.join(lhs)}->{rhs}"
    per_lhs = df.groupBy(*[F.col(c) for c in lhs]).agg(
        F.countDistinct(rhs).alias("__nd")
    )
    viol = F.sum((F.col("__nd") > 1).cast("long"))
    return per_lhs.agg(
        F.lit(name).alias("fd"),
        F.count(F.lit(1)).cast("long").alias("n_lhs"),
        viol.cast("long").alias("n_violating"),
        (viol == 0).alias("fd_holds"),
    )
