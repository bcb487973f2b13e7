"""Iterative graph analytics over relational edge lists (extension
family: the reference has no graph story; training-data pipelines use
link analysis for source authority weighting — PageRank over a
domain/citation graph is the classic quality prior, cf. the public
PageRank literature and every web-corpus curation stack).

Scale shape: each iteration is ONE equi-join of the (cached) edge list
with the current rank vector plus one partial-aggregated sum by
destination — the standard Pregel-style message pass in plain DataFrame
ops, the same loop skeleton as ``dedup.duplicate_clusters``'s min-label
propagation. ``localCheckpoint`` truncates the per-round lineage (an
uncut plan doubles per round). Rounds are a fixed constant, so total
cost is O(iterations) joins keyed on the node id; hot nodes are AQE
skew-splittable.

Determinism contract: ranks live in FIXED-POINT integer units (1e-12)
and every update uses integer floor arithmetic (``div``), so summation
order cannot perturb results — Spark and any SQL oracle (DuckDB
recursive CTE) produce IDENTICAL bigint ranks, no float tolerance
needed. Floor losses make the total mass drift down by < iterations *
n_nodes units; irrelevant for ranking and fully reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SCALE_UNITS = 1_000_000_000_000  # 1e12 fixed-point units == rank 1.0


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 10,
    damping_pct: int = 85,
) -> DataFrame:
    """Fixed-point PageRank over a DIRECTED edge list (callers wanting
    an undirected walk union the reversed edges first; dangling nodes —
    no out-edges — leak their damped mass, standard simplified model).

    rank_0(v) = SCALE // N
    rank_{i+1}(v) = (100 - d) * SCALE // (100 * N)
                    + d * sum_{u->v}(rank_i(u) // outdeg(u)) // 100

    with every division an integer floor — the whole recurrence is
    exact bigint arithmetic (see module docstring).

    Output: (node, rank_units bigint, rank double) — ``rank`` is just
    ``rank_units / SCALE`` for readability; comparisons should use the
    exact ``rank_units``.
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    if not 0 < damping_pct < 100:
        raise ValueError(f"damping_pct must be in (0, 100), got {damping_pct}")
    e = edges.select(
        F.col(src_col).alias("__src"), F.col(dst_col).alias("__dst")
    ).distinct().cache()
    # pin the loop-invariant frames ONCE — without the pins every
    # iteration re-derived nodes (union+distinct over e) and outdeg
    # (groupBy over e) from scratch, five redundant shuffles per run
    nodes = (
        e.select(F.col("__src").alias("node"))
        .union(e.select(F.col("__dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    outdeg = e.groupBy(F.col("__src").alias("node")).agg(
        F.count(F.lit(1)).alias("outdeg")
    ).localCheckpoint(eager=True)
    n_nodes = nodes.count()  # bounded: one long
    # rank state is one (node, rank, outdeg) row per node — tiny next
    # to the edge list. When the counted node total fits a broadcast
    # (same counted-gate pattern as duplicate_clusters), ship the STATE
    # to the edges each iteration so the edge list is never shuffled;
    # past the gate, fall back to the shuffle join (node count at 100TB
    # graph scale can exceed any broadcast budget).
    broadcast_state = n_nodes <= 2_000_000
    base = (100 - damping_pct) * SCALE_UNITS // (100 * n_nodes)
    ranks = nodes.withColumn(
        "rank_units", F.lit(SCALE_UNITS // n_nodes).cast("long")
    ).localCheckpoint(eager=True)
    for _ in range(iterations):
        state = ranks.join(outdeg, "node")
        if broadcast_state:
            state = F.broadcast(state)
        contrib = (
            e.join(state, e["__src"] == state["node"])
            .select(
                F.col("__dst").alias("node"),
                F.expr("rank_units div outdeg").alias("__c"),
            )
            .groupBy("node")
            .agg(F.sum("__c").alias("__csum"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                F.expr(
                    f"cast({base} + ({damping_pct} * coalesce(__csum, 0)) "
                    f"div 100 as bigint)"
                ).alias("rank_units"),
            )
            .localCheckpoint(eager=True)
        )
    e.unpersist()
    return ranks.select(
        "node",
        "rank_units",
        (F.col("rank_units").cast("double") / F.lit(float(SCALE_UNITS))).alias(
            "rank"
        ),
    )


def triangle_counts(
    edges: DataFrame, src: str = "id_a", dst: str = "id_b"
) -> DataFrame:
    """Per-node triangle counts + local clustering coefficient over an
    undirected edge list — the standard graph-cohesion measure; on a
    near-dup pair graph it separates tight duplicate families (cliques,
    coefficient ~1) from chain-shaped false-positive paths
    (coefficient ~0), which is exactly the signal a dedup-threshold
    audit needs.

    Scale shape (compact-forward, the published distributed
    formulation): edges are re-oriented from lower to higher
    (degree, id) order, which bounds every node's out-degree by
    O(sqrt(2m)) regardless of raw degree skew; wedges come from ONE
    self-join of the oriented list on the wedge center and close with
    ONE more equi-join against the oriented list — each triangle is
    found exactly once, and the worst hot-node wedge task is
    sqrt-bounded by construction (the naive orientation puts a
    celebrity node's full degree^2 in one task). Per-node counts are
    an explode + groupBy over the (bounded) triangle set.

    Determinism: triangle/degree counts are exact integers; the
    coefficient is one fixed double expression over them, rounded 6;
    nodes with degree < 2 yield NULL.

    Output: (node, degree BIGINT, n_triangles BIGINT,
    clustering DOUBLE).
    """
    # canonicalize to (least, greatest) BEFORE distinct so reversed
    # duplicates ((a,b) and (b,a)) collapse to one undirected edge.
    # MATERIALIZE the canonical edge list (localCheckpoint): it feeds
    # degree counting, orientation, and triangle closing — without the
    # cut, an expensive upstream (e.g. the LSH-verified pair pipeline)
    # re-executes once per consumer. The frame is 2 longs per edge.
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    both = und.unionByName(und.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = both.groupBy("u").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    # orient each undirected edge from lower to higher (deg, id)
    d1 = deg.select(F.col("u").alias("__n1"), F.col("deg").alias("__d1"))
    d2 = deg.select(F.col("u").alias("__n2"), F.col("deg").alias("__d2"))
    # oriented feeds both wedge sides AND the closing join — checkpoint
    # so the degree joins run once, not three times
    oriented = (
        both.join(d1, both["u"] == d1["__n1"])
        .join(d2, both["v"] == d2["__n2"])
        .where(
            (F.col("__d1") < F.col("__d2"))
            | ((F.col("__d1") == F.col("__d2")) & (F.col("u") < F.col("v")))
        )
        .select("u", "v")
        .localCheckpoint(eager=True)
    )
    # wedges centered at u: two oriented out-edges (u->v, u->w), v before
    # w in the same (deg, id) order — encoded by the oriented edge (v, w)
    e1 = oriented.select(F.col("u").alias("c"), F.col("v").alias("x"))
    e2 = oriented.select(F.col("u").alias("c"), F.col("v").alias("y"))
    wedges = e1.join(e2, "c").where(F.col("x") != F.col("y"))
    closer = oriented.select(F.col("u").alias("x"), F.col("v").alias("y"))
    tris = wedges.join(closer, ["x", "y"])  # triangle (c, x, y), once
    members = (
        tris.select(F.col("c").alias("node"))
        .unionAll(tris.select(F.col("x").alias("node")))
        .unionAll(tris.select(F.col("y").alias("node")))
    )
    per_node = members.groupBy("node").agg(
        F.count(F.lit(1)).cast("long").alias("n_triangles")
    )
    out = deg.join(per_node, deg["u"] == per_node["node"], "left").select(
        F.col("u").alias("node"),
        F.col("deg").alias("degree"),
        F.coalesce(F.col("n_triangles"), F.lit(0)).cast("long").alias("n_triangles"),
    )
    coeff = F.round(
        F.lit(2.0)
        * F.col("n_triangles").cast("double")
        / (F.col("degree").cast("double") * (F.col("degree").cast("double") - 1.0)),
        6,
    )
    return out.withColumn(
        "clustering", F.when(F.col("degree") >= 2, coeff)
    )
