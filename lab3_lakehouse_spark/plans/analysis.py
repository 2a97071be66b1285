"""Physical-plan inspection helpers (SURVEY §4).

The engine adds no custom Catalyst rules — correctness there is
"Catalyst does it", which is only true if the plans actually show it.
These helpers turn ``explain()`` output into assertions so tests pin
the optimizer behavior the 100 TB design depends on:

- filters reach the parquet scan (``PushedFilters``),
- scans read only referenced columns (``ReadSchema``),
- small dims broadcast (``BroadcastHashJoin``), big joins sort-merge,
- aggregates are partial+final (two ``HashAggregate`` per agg),
- hot paths stay inside whole-stage codegen.

A plan regression (e.g. a UDF silently blocking pushdown) then fails a
test instead of shipping a 100×-slower scan.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The ``explain("formatted")`` text (captured, not printed)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """Every PushedFilters entry across the plan's file scans."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df)):
        if m.group(1).strip():
            out.extend(s.strip() for s in m.group(1).split(","))
    return out


def has_pushed_filter(df: DataFrame, column: str) -> bool:
    """True if some predicate on ``column`` reached a file scan."""
    return any(column in f for f in pushed_filters(df))


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema struct strings of all file scans (column pruning)."""
    return [
        m.group(1)
        for m in re.finditer(r"ReadSchema: (struct<[^\n]*)", formatted_plan(df))
    ]


def scan_reads_only(df: DataFrame, table_cols: set[str], allowed: set[str]) -> bool:
    """True if no file scan reads a column of ``table_cols`` outside
    ``allowed`` — i.e. pruning worked."""
    for schema in read_schemas(df):
        cols = set(re.findall(r"(\w+):", schema))
        if (cols & table_cols) - allowed:
            return False
    return True


def count_nodes(df: DataFrame, node: str) -> int:
    """Occurrences of a physical node in the formatted plan
    (e.g. 'BroadcastHashJoin', 'SortMergeJoin', 'HashAggregate',
    'Exchange', 'BroadcastNestedLoopJoin'). Counts only the numbered
    detail entries — formatted mode prints each node twice (tree +
    detail), which would double every count."""
    return len(
        re.findall(rf"^\(\d+\) {re.escape(node)}\b", formatted_plan(df), re.M)
    )


def exchange_inputs(df: DataFrame) -> list[tuple[str, list[str]]]:
    """``(arguments, input column names)`` for every shuffle ``Exchange``
    node (BroadcastExchange excluded — broadcasts are bounded by the
    driver's broadcast limit, shuffles are the scale hazard). Lets a
    test pin that a given exchange carries only the columns it should —
    e.g. that an ANN rank shuffle ships ids + a score, not the float
    vectors."""
    plan = formatted_plan(df)
    out: list[tuple[str, list[str]]] = []
    for m in re.finditer(
        r"^\(\d+\) Exchange\n((?:^(?!\(\d+\)).*\n?)*)", plan, re.M
    ):
        body = m.group(1)
        inp = re.search(r"Input \[\d+\]: \[([^\]]*)\]", body)
        args = re.search(r"Arguments: ([^\n]*)", body)
        cols = []
        if inp:
            cols = [
                c.strip().split("#")[0] for c in inp.group(1).split(",") if c.strip()
            ]
        out.append((args.group(1) if args else "", cols))
    return out


def codegen_stage_count(df: DataFrame, execute: bool = True) -> int:
    """Number of whole-stage-codegen stages (wider is not better per se,
    but ZERO on a scan-heavy plan means something blocked codegen).

    Under AQE, WholeStageCodegen wrappers are only inserted when each
    query stage is finalized — so the plan must be *executed* first
    (cheap at test SF) and read back from the same QueryExecution."""
    if execute:
        df.collect()
    return len(set(re.findall(r"\[codegen id : (\d+)\]", formatted_plan(df))))
