"""Shared determinism helpers for the query catalog.

Cross-engine float policy: aggregate outputs are rounded with an
expression that is the SAME IEEE-754 computation in Spark and in the
oracle SQL — ``floor(x*10⁴ + 0.5) / 10⁴`` — so both engines produce
bit-identical doubles even at half-way points, where Spark's
BigDecimal-based ``round()`` and DuckDB's scaled ``std::round`` can
legitimately disagree. (Plain ``round`` is NOT cross-engine stable;
see tests/test_oracle_parity.py history.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round4(col: Column) -> Column:
    """Deterministic 4-decimal rounding (half-up toward +inf)."""
    return F.floor(col * F.lit(10000.0) + F.lit(0.5)) / F.lit(10000.0)


def sql_round4(expr: str) -> str:
    """The oracle-SQL twin of :func:`round4` — same IEEE ops, same result."""
    return f"floor(({expr}) * 10000.0 + 0.5) / 10000.0"
