"""Iterative graph analytics on edge DataFrames.

PageRank here is the fixed-iteration power method expressed as joins —
the shape every distributed graph engine (Pregel, GraphX, GraphFrames)
lowers to anyway: per iteration, one join of the rank vector against the
edge list and one aggregation of contributions by destination. Keeping
it in the DataFrame API means Catalyst handles the physical strategy
(the rank vector is tiny relative to edges and broadcast-joins; the
contribution aggregation is ONE shuffle keyed on dst per iteration) and
AQE re-plans if the rank frame outgrows the broadcast threshold.

Scale notes (100 TB edge lists):
- Lineage is cut per iteration with ``localCheckpoint`` — the same
  discipline as the connected-components loop in operators/dedup.py —
  so plan size stays O(1) in the iteration count.
- Out-degrees are computed once and reused every round.
- The only driver-side scalar is the node count N (needed as a literal
  in the teleport term), one count() job before the loop — pass
  ``node_count`` to skip it when known.

Semantics: standard damped PageRank WITHOUT dangling-mass
redistribution — nodes with no out-edges absorb rank (their mass
re-enters only through the teleport term). On symmetrized edge lists
(the co-occurrence graphs this repo builds) every node has out-edges,
so the simplification is vacuous there; callers with genuinely dangling
nodes should symmetrize or accept the leaked mass.

No counterpart in the reference (SURVEY §2.7 extension surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping: float = 0.85,
    node_count: int | None = None,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list.

    Returns ``(node, rank)`` for every node that appears in ``edges``.
    Deterministic given the edge set: the float work is per-iteration
    contribution sums whose cross-engine/partition fold noise (~1e-15
    relative) stays far below any meaningful rank gap; consumers that
    hash results should round (queries/_util.round4) as usual.
    """
    # Materialize the (possibly expensive) edge derivation ONCE: the
    # edge list feeds the degree count, the node set, and every power
    # iteration — left lazy, Spark would re-run the upstream plan (e.g.
    # the basket self-join + distinct) once per consumer, turning 3
    # iterations into ~5 edge builds.
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).localCheckpoint(eager=True)
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).cast("double").alias("out_deg"))
    # degree-annotated edges, materialized once: per-iteration work is
    # then exactly one rank join + one dst-keyed aggregation
    e_deg = e.join(out_deg, "src").localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = float(node_count if node_count is not None else nodes.count())
    teleport = (1.0 - damping) / n

    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(iterations):
        contribs = (
            e_deg.join(ranks, e_deg["src"] == ranks["node"])
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("rank") / F.col("out_deg")).alias("contrib"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (
                    F.lit(teleport)
                    + F.lit(damping) * F.coalesce(F.col("contrib"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


def cooccurrence_edges(
    df: DataFrame, *, group_col: str, item_col: str
) -> DataFrame:
    """Distinct directed co-occurrence edges: items sharing a group
    value become mutual neighbors (both directions emitted, self-loops
    excluded). The self-join shuffles ONCE on the group key; per-group
    fan-out is O(items-per-group²), so this is for natural grouping
    keys with bounded membership (order baskets, sessions) — cap or
    sample oversized groups upstream for heavy-tailed keys.
    """
    a = df.select(F.col(group_col).alias("g"), F.col(item_col).alias("src"))
    b = df.select(F.col(group_col).alias("g"), F.col(item_col).alias("dst"))
    # dedupe the ORDERED pairs (src < dst) and symmetrize afterwards:
    # same edge set, half the rows through the distinct's shuffle
    ordered = (
        a.join(b, "g")
        .filter(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    return ordered.unionByName(
        ordered.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
