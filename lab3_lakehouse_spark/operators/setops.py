"""Set operators (absent from the reference — SURVEY §2.7 gap list).

Thin named wrappers so pipelines read declaratively; semantics are
exactly Spark's (which match ANSI: UNION [ALL] / INTERSECT / EXCEPT).

Scale notes: ``union_all`` is a zero-shuffle concatenation of lineages;
``union_distinct``/``intersect``/``except`` each cost one hash shuffle
on all columns — same class as ``distinct()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def union_all(a: DataFrame, b: DataFrame, by_name: bool = True) -> DataFrame:
    return a.unionByName(b) if by_name else a.union(b)


def union_distinct(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.unionByName(b).distinct()


def intersect(a: DataFrame, b: DataFrame, keep_duplicates: bool = False) -> DataFrame:
    return a.intersectAll(b) if keep_duplicates else a.intersect(b)


def except_rows(a: DataFrame, b: DataFrame, keep_duplicates: bool = False) -> DataFrame:
    return a.exceptAll(b) if keep_duplicates else a.subtract(b)


def union_evolved(a: DataFrame, b: DataFrame) -> DataFrame:
    """Schema-evolution union: rows from frames whose schemas drifted
    (columns added/removed between corpus versions) align BY NAME, with
    absent columns NULL-filled — ``unionByName(allowMissingColumns)``.
    Positional union would silently misalign drifted schemas; this is
    the safe default when appending monthly drops of a long-lived
    dataset. Narrow op: no shuffle, columns aligned at plan time."""
    return a.unionByName(b, allowMissingColumns=True)
