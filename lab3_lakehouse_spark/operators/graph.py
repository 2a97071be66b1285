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


def label_propagation(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 2,
    self_vote: bool = False,
) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007) over a
    SYMMETRIC edge list — the cheap community-detection pass: every
    node starts labeled with its own id, and each round adopts the most
    frequent label among its neighbors, ties broken by smallest label.
    Fully deterministic (unlike the async/random-order original), so
    the result is reproducible cross-engine and cross-partitioning —
    the property a differential oracle needs. Node/label ids may be any
    orderable type (numeric or string): the tie-break compares labels
    directly, only the vote COUNT is negated.

    ``self_vote=True`` is the damped variant: each node's current label
    counts as one extra vote. Pure synchronous LPA oscillates with
    period 2 on bipartite structure (K2: the two nodes swap labels
    forever); the self-vote turns every swap into a tie, and the
    tie-to-smallest rule then collapses the pair deterministically —
    the standard oscillation fix that keeps one-shuffle-per-round
    semantics (vs. async/coloring schedules, which serialize rounds).
    Defaults to False: the plain Raghavan semantic, as registered in
    the differential oracle.

    Returns ``(node, label)`` for every node with at least one edge.

    Scale: per round, ONE shuffle to count neighbor labels keyed on
    (node, label), then an argmax folded into a second aggregation —
    ``min_by(label, (-n_votes, label))`` — which partial-aggregates
    map-side and needs no per-node sort (a windowed row_number would
    sort every partition per round); no global sort, no driver
    participation; lineage is cut per round with ``localCheckpoint``
    (the CC/PageRank discipline). The label frame is O(nodes) while
    the join is edge-sized, so Catalyst/AQE broadcast the labels when
    they fit and shuffle-join past that.
    """
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).localCheckpoint(eager=True)
    labels = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    # struct comparison is lexicographic: min over (-n_votes, label)
    # is "most votes, ties to the SMALLEST label" — deterministic,
    # sort-free, and type-agnostic in the label (only the count,
    # always a bigint, is negated).
    argmax = F.min_by(
        "label", F.struct((-F.col("n_votes")).alias("__nv"), F.col("label"))
    )
    for _ in range(iterations):
        ballots = e.join(labels.withColumnRenamed("node", "dst"), "dst").select(
            F.col("src").alias("node"), "label"
        )
        if self_vote:
            ballots = ballots.unionByName(labels)
        votes = ballots.groupBy("node", "label").agg(
            F.count(F.lit(1)).alias("n_votes")
        )
        labels = (
            votes.groupBy("node")
            .agg(argmax.alias("label"))
            .localCheckpoint(eager=True)
        )
    return labels


def _undirected_with_degrees(
    edges: DataFrame, src: str, dst: str, normalized: bool = False
):
    """Normalize to one distinct undirected row per edge (``a < b``,
    self-loops dropped) plus the degree table — the shared front of the
    triangle/embeddedness computations. Both frames are materialized
    (localCheckpoint): every consumer walks them multiple times.

    ``normalized=True`` asserts the input already IS one ``src < dst``
    row per undirected edge (what ``cooccurrence_edges(symmetric=
    False)`` emits, straight off its own distinct) and skips the
    re-normalizing distinct — a full extra shuffle of the edge list
    for inputs that are normalized by construction."""
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    if not normalized:
        e = (
            e.select(
                F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
            )
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )
    e = e.localCheckpoint(eager=True)
    deg = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
        .localCheckpoint(eager=True)
    )
    return e, deg


def _oriented_triangle_lists(e: DataFrame, deg: DataFrame) -> DataFrame:
    """Enumerate each triangle exactly once, grouped by its lowest
    oriented edge: one row ``(x, y, __zs)`` per triangle-bearing edge,
    where ``__zs`` is the array of closing vertices (so the triangles
    are the rows of ``explode(__zs)``), in the (degree, id) total
    order. Orient every edge toward its higher-(deg, id) endpoint;
    out-neighbor fan-out is capped by orientation at O(√m) per node.

    Algorithm choice (the round-7 9 s → ~4 s lesson): the textbook
    lowering joins wedge pairs against closing edges, which
    MATERIALIZES AND SHUFFLES every wedge — Σ outdeg² rows. On a dense
    co-occurrence graph that is catastrophic: the sf0.1 co-purchase
    graph has 1.2M edges over 20k nodes (avg degree 120) and 41M
    wedges for only 1.9M triangles. This implementation is instead the
    edge-iterator with adjacency intersection (compact-forward,
    Latapy 2008): build each node's sorted OUT-neighbor array once
    (orientation caps its length at O(√m), so a row is bounded even
    for hubs), hang the arrays on both endpoints of every oriented
    edge, and take ``array_intersect`` executor-side. Each triangle
    {x<y<z} surfaces exactly once at its LOWEST oriented edge (x, y)
    as the common out-neighbor z (x→y, x→z, y→z; neither other edge
    of the triangle sees it: z's out-list excludes y, y's excludes x).
    Shuffle volume is O(m) — one groupBy plus two keyed joins of the
    edge list against the O(n) adjacency frame (broadcast when it
    fits) — wedges never exist as rows; the per-row intersection work
    is the same Σ-outdeg² term but as in-memory hash probes inside a
    codegen stage, not shuffled+sorted rows.

    Edges with a degree-1 endpoint lie on no triangle and are dropped
    before orientation — the filter rides the join that fetches the
    degrees.
    """
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("__da"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("__db"))
    a_first = (F.col("__da") < F.col("__db")) | (
        (F.col("__da") == F.col("__db")) & (F.col("a") < F.col("b"))
    )
    oriented = (
        e.join(da, "a")
        .join(db, "b")
        .filter((F.col("__da") >= 2) & (F.col("__db") >= 2))
        .select(
            F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("s"),
            F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("t"),
        )
        .localCheckpoint(eager=True)
    )
    adj = oriented.groupBy(F.col("s").alias("node")).agg(
        F.array_sort(F.collect_list("t")).alias("__nbrs")
    )
    # a head with no out-edges has an empty out-list and closes no
    # triangle — the inner join dropping it is the correct semantics
    return (
        oriented.join(
            adj.select(F.col("node").alias("s"), F.col("__nbrs").alias("__ns")),
            "s",
        )
        .join(
            adj.select(F.col("node").alias("t"), F.col("__nbrs").alias("__nt")),
            "t",
        )
        .select(
            F.col("s").alias("x"),
            F.col("t").alias("y"),
            F.array_intersect("__ns", "__nt").alias("__zs"),
        )
    )


def triangle_stats(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    normalized: bool = False,
) -> DataFrame:
    """Exact per-node triangle counts + local clustering coefficient
    via the degree-oriented ("forward") algorithm — the shape that
    survives skew: every undirected edge is oriented from its
    lower-``(degree, id)`` endpoint to the higher one, so wedge
    enumeration fans out on OUT-degree, which orientation caps at
    O(√m) even for hub nodes (a hub's edges all point INTO it). The
    naive adjacency self-join is quadratic in hub degree — the
    difference between this plan and one that dies on a 100 TB
    power-law graph.

    Accepts a directed/symmetrized or already-ordered edge list;
    self-loops dropped, edges deduped to one undirected row. Returns
    ``(node, degree, n_triangles, clustering_coeff)`` for every node,
    where ``clustering_coeff = 2·T / (deg·(deg−1))`` (0.0 for
    degree < 2).

    The triangle set is consumed in ONE pass: each ``(x, y, __zs)``
    list row explodes to per-node count structs — x and y credited
    ``size(__zs)`` in bulk, each closing vertex credited 1 — feeding a
    single keyed sum. No triangle materialization, no 3-projection
    union re-reading the frame.
    """
    e, deg = _undirected_with_degrees(edges, src, dst, normalized)
    tri = _oriented_triangle_lists(e, deg)
    nsz = F.size("__zs").cast("long")
    credit = F.explode(
        F.concat(
            F.array(
                F.struct(F.col("x").alias("node"), nsz.alias("n")),
                F.struct(F.col("y").alias("node"), nsz.alias("n")),
            ),
            F.transform(
                "__zs",
                lambda z: F.struct(
                    z.alias("node"), F.lit(1).cast("long").alias("n")
                ),
            ),
        )
    )
    tri_counts = (
        tri.select(credit.alias("c"))
        .groupBy(F.col("c.node").alias("node"))
        .agg(F.sum("c.n").alias("n_triangles"))
    )
    d = F.col("deg").cast("double")
    return (
        deg.join(tri_counts, "node", "left")
        .select(
            "node",
            "deg",
            F.coalesce(F.col("n_triangles"), F.lit(0)).alias("n_triangles"),
            F.when(
                F.col("deg") >= 2,
                F.lit(2.0)
                * F.coalesce(F.col("n_triangles"), F.lit(0)).cast("double")
                / (d * (d - F.lit(1.0))),
            )
            .otherwise(F.lit(0.0))
            .alias("clustering_coeff"),
        )
    )


def edge_embeddedness(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    min_common: int = 0,
    normalized: bool = False,
) -> DataFrame:
    """Per-EDGE neighborhood overlap: for every undirected edge (a, b),
    the number of common neighbors (= triangles through the edge) and
    the neighborhood Jaccard ``c / ((deg_a−1) + (deg_b−1) − c)``
    (endpoints excluded) — the embeddedness of Granovetter's
    weak-tie theory and the standard "related items" score over a
    co-occurrence graph: an edge with high embeddedness is inside a
    community, an edge with zero is a local bridge.

    Deliberately computed ONLY for pairs that are edges: common
    neighbors of an adjacent pair are exactly the triangles through it,
    so the degree-oriented triangle enumeration (wedge fan-out capped
    at O(√m) per node) does all the work — where all-pairs common
    neighbors would cost Σ deg² (hub-quadratic, the shape that dies on
    a power-law graph).

    Returns ``(a, b, deg_a, deg_b, n_common, jaccard)`` for every
    edge, ``a < b``. With ``min_common >= 1``, zero-triangle edges are
    excluded AND the plan skips the edge-table join entirely: every
    triangle edge already appears in the common-neighbor counts, so
    thresholded consumers (top-k embeddedness) avoid shuffling the
    full edge list against the counts — on the sf0.1 co-purchase
    graph that join is 1.2M ⋈ 1.2M rows for information the counts
    frame already holds.
    """
    e, deg = _undirected_with_degrees(edges, src, dst, normalized)
    # each triangle lies on its 3 edges — but the attribution consumes
    # the triangle set in ONE pass over the LIST form (the same shape
    # triangle_stats uses): a (x, y, __zs) row explodes to per-edge
    # credit structs — the lowest oriented edge (x, y) credited
    # size(__zs) in bulk, each closing vertex contributing 1 to (x, z)
    # and (y, z) — feeding a single keyed sum. The r7 version instead
    # unioned three projections of the exploded triangle frame, which
    # re-ran the adjacency-intersection joins 3× unless the frame was
    # persist()ed — a cache a library caller had to remember to clear
    # (and a lazy localCheckpoint stores DESERIALIZED row objects,
    # which OOMed the x30 graph). Single-consumption needs no reuse
    # point at all. Edges are re-ordered to (a < b) id form (the
    # orientation order is by DEGREE, so x<y<z does not imply id order).
    tri = _oriented_triangle_lists(e, deg)
    nsz = F.size("__zs").cast("long")

    def _pair(u, v, n):
        return F.struct(
            F.least(u, v).alias("a"), F.greatest(u, v).alias("b"), n.alias("n")
        )

    credit = F.explode(
        F.concat(
            F.array(_pair(F.col("x"), F.col("y"), nsz)),
            F.flatten(
                F.transform(
                    "__zs",
                    lambda z: F.array(
                        _pair(F.col("x"), z, F.lit(1).cast("long")),
                        _pair(F.col("y"), z, F.lit(1).cast("long")),
                    ),
                )
            ),
        )
    )
    common = (
        tri.select(credit.alias("c"))
        .groupBy(F.col("c.a").alias("a"), F.col("c.b").alias("b"))
        .agg(F.sum("c.n").alias("n_common"))
    )
    if min_common >= 1:
        base = common.filter(F.col("n_common") >= min_common)
    else:
        base = e.join(common, ["a", "b"], "left")
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("deg_b"))
    c = F.coalesce(F.col("n_common"), F.lit(0))
    denom = (F.col("deg_a") - F.lit(1)) + (F.col("deg_b") - F.lit(1)) - c
    # deg is O(nodes); Catalyst/AQE broadcasts it while it fits and
    # falls back to a shuffle join past the threshold — no forced hint
    return (
        base.join(da, "a")
        .join(db, "b")
        .select(
            "a",
            "b",
            "deg_a",
            "deg_b",
            c.alias("n_common"),
            F.when(denom > 0, c.cast("double") / denom.cast("double"))
            .otherwise(F.lit(0.0))
            .alias("jaccard"),
        )
    )


def cooccurrence_edges(
    df: DataFrame, *, group_col: str, item_col: str, symmetric: bool = True
) -> DataFrame:
    """Distinct co-occurrence edges: items sharing a group value become
    mutual neighbors (self-loops excluded). The self-join shuffles ONCE
    on the group key; per-group fan-out is O(items-per-group²), so
    this is for natural grouping keys with bounded membership (order
    baskets, sessions) — cap or sample oversized groups upstream for
    heavy-tailed keys.

    ``symmetric=True`` (default) emits both directions — what the
    directed-iteration consumers (PageRank, LPA) want. Undirected
    consumers (triangle_stats, edge_embeddedness) should pass
    ``symmetric=False`` for the ordered ``src < dst`` half: they would
    only fold the mirrored rows straight back through another
    distinct, a wasted full shuffle of 2× the edges.
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
    if not symmetric:
        return ordered
    return ordered.unionByName(
        ordered.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
