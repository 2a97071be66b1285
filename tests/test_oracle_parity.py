"""Differential tests: every registered query with an oracle must match
DuckDB exactly (row count + schema names + order-insensitive values) —
the same gate the verify driver applies at sf=0.01.
"""

from __future__ import annotations

import pytest

from lab3_lakehouse_spark.queries import ORACLES, QUERIES
from lab3_lakehouse_spark.testing import check_query


def _oracle_query_names() -> list[str]:
    return sorted(ORACLES)


@pytest.mark.parametrize("name", _oracle_query_names())
def test_query_matches_oracle(spark, sf_medium, name):
    """Runs at sf0.01 — the EXACT scale the verify driver checks (r4
    verdict item #5: sf0.001 can hide degenerate-group / threshold-
    boundary divergences the driver would catch; the event_value_trends
    NaN class). Set SPARK_GRAFT_SF_MEDIUM to override."""
    n = check_query(spark, sf_medium, QUERIES[name], ORACLES[name], name)
    assert n >= 0


def test_all_queries_return_rows_on_sf_small(spark, sf_small):
    """Rows-only smoke for queries without an oracle (LSH/streaming/ML)."""
    for name, fn in QUERIES.items():
        if name in ORACLES:
            continue
        df = fn(spark, sf_small)
        assert df.count() >= 0, name


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
