"""Differential-testing harness: Spark result vs DuckDB oracle.

Replicates the verify driver's comparison (row-count + column names +
order-insensitive value compare) so every ``queries()`` /
``oracle_sql()`` pair can be validated locally before the driver runs
it. Strictness here ≥ driver strictness: values are compared as exact
canonical strings after dtype canonicalization, with no float
tolerance — queries are expected to make themselves deterministic
(exact arithmetic order, explicit rounding) rather than lean on fuzzy
comparison.
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
import math

import duckdb
import pandas as pd

from lab3_lakehouse_spark.catalog import TABLES, table_path


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Connection with every corpus table registered as a view (the
    driver pre-registers the same views)."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{table_path(sf_dir, t)}'"
        )
    return con


def _canon_value(v) -> str:
    # Dtype-FAITHFUL canonicalization, matching the verify driver: no
    # cross-dtype coercion. Decimal('3.0000') ≠ float 3.0 ≠ int 3 —
    # round 1 proved the driver distinguishes all three (DECIMAL leaks
    # from Spark-SQL literals, HUGEINT→float64 from DuckDB sums), so
    # the local harness must red on them too.
    if hasattr(v, "item") and type(v).__name__ != "ndarray":
        v = v.item()  # unwrap numpy scalars (np.int64 → int, np.float64 → float)
    if isinstance(v, _decimal.Decimal):
        return f"Decimal({v})"  # dtype-visible: never equals a float/int repr
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "NULL"
    if isinstance(v, float):
        return repr(v)  # 3.0 stays "3.0" — float ≠ int, like the driver
    if isinstance(v, (pd.Timestamp, _dt.datetime)):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    if isinstance(v, bool):
        return str(int(v))
    if pd.isna(v):
        return "NULL"
    return str(v)


def canonical_rows(pdf: pd.DataFrame) -> list[tuple[str, ...]]:
    """Columns sorted by name, every value canonicalized, rows sorted."""
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = [tuple(_canon_value(v) for v in row) for row in pdf.itertuples(index=False, name=None)]
    return sorted(rows)


class MismatchError(AssertionError):
    pass


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str = "query") -> None:
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        raise MismatchError(
            f"{name}: column mismatch spark={sorted(spark_pdf.columns)} oracle={sorted(oracle_pdf.columns)}"
        )
    if len(spark_pdf) != len(oracle_pdf):
        raise MismatchError(f"{name}: row count spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
    s_rows = canonical_rows(spark_pdf)
    o_rows = canonical_rows(oracle_pdf)
    if s_rows != o_rows:
        diffs = [
            (i, s, o) for i, (s, o) in enumerate(zip(s_rows, o_rows)) if s != o
        ][:5]
        raise MismatchError(f"{name}: value mismatch; first diffs (sorted-row idx, spark, oracle): {diffs}")


def check_query(spark, sf_dir: str, query_fn, sql: str, name: str = "query") -> int:
    """Run one Spark query + its oracle SQL and compare. Returns row count."""
    spark_pdf = query_fn(spark, sf_dir).toPandas()
    con = duckdb_connection(sf_dir)
    try:
        oracle_pdf = con.execute(sql).df()
    finally:
        con.close()
    compare_frames(spark_pdf, oracle_pdf, name)
    return len(spark_pdf)
