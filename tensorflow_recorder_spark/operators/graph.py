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
    driver_state_threshold: int = 2_000_000,
    driver_edge_threshold: int = 2_000_000,
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
    # r11 top tier (the duplicate_clusters counted-gate pattern): when
    # the DISTINCT edge list itself fits the driver, the whole
    # fixed-point loop is a sparse int matvec — collect the edges once
    # and run every iteration as one numpy scatter-add (np.add.at on
    # int64 — exact, no float accumulation), zero distributed jobs in
    # the loop. The collect is explicitly bounded by the counted gate;
    # bigger graphs fall through to the two distributed tiers below.
    # Identical arithmetic: c = rank // outdeg per source (floor on
    # nonnegative int64 == Spark div), contrib summed exactly, then
    # base + d * contrib // 100 in Python ints.
    n_edges = e.count()  # bounded: one long; materializes the cache
    if n_edges <= driver_edge_threshold:
        import numpy as np
        import pandas as pd
        from pyspark.sql import types as T

        # Arrow transfer, NOT collect(): row-based collect pickles one
        # Row object per edge (measured 5.3 s for 1.17 M edges at
        # sf0.1); toPandas moves the same two long columns as Arrow
        # batches in ~0.2 s (guide §6, "Arrow for driver transfers").
        pdf = e.toPandas()
        e.unpersist()
        node_type = edges.schema[src_col].dataType
        src_v = pdf.iloc[:, 0].to_numpy()
        dst_v = pdf.iloc[:, 1].to_numpy()
        node_vals, flat_i = np.unique(
            np.concatenate([src_v, dst_v]), return_inverse=True
        )
        src_i, dst_i = flat_i[:n_edges], flat_i[n_edges:]
        n_nodes = len(node_vals)
        outdeg = np.bincount(src_i, minlength=n_nodes).astype(np.int64)
        base = (100 - damping_pct) * SCALE_UNITS // (100 * n_nodes)
        rank = np.full(n_nodes, SCALE_UNITS // n_nodes, dtype=np.int64)
        safe_deg = np.maximum(outdeg, 1)  # sinks never index c anyway
        for _ in range(iterations):
            c = rank // safe_deg
            contrib = np.zeros(n_nodes, dtype=np.int64)
            np.add.at(contrib, dst_i, c[src_i])
            rank = base + damping_pct * contrib // 100
        out = pd.DataFrame({"node": node_vals, "rank_units": rank})
        out_schema = T.StructType(
            [
                T.StructField("node", node_type),
                T.StructField("rank_units", T.LongType()),
            ]
        )
        return edges.sparkSession.createDataFrame(
            out, out_schema
        ).select(
            "node",
            "rank_units",
            (
                F.col("rank_units").cast("double")
                / F.lit(float(SCALE_UNITS))
            ).alias("rank"),
        )
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
    broadcast_state = n_nodes <= driver_state_threshold
    base = (100 - damping_pct) * SCALE_UNITS // (100 * n_nodes)
    if broadcast_state:
        # r11 (optimization round): below the gate the per-node state
        # (rank, outdeg) is driver-sized by construction, so the rank
        # UPDATE runs on the driver in exact Python ints and each
        # iteration costs exactly ONE distributed job — broadcast the
        # per-source contribution c_u = rank_u div outdeg_u to the
        # cached edge list, partial-aggregate by destination, collect
        # the node-bounded contribution vector. The previous shape paid
        # three jobs per iteration (state join + contrib agg + the
        # nodes left-join rebuild) plus a localCheckpoint
        # materialization; measured 7.7 s -> 2.6 s at sf0.1 on
        # rel_pagerank with bit-identical ranks (same floor arithmetic
        # in the same order — Python // on nonnegative ints is Spark's
        # div; the contribution SUM stays distributed and exact).
        # Above the gate the distributed loop below is unchanged.
        from pyspark.sql import types as T

        node_type = nodes.schema["node"].dataType
        node_rows = [r[0] for r in nodes.collect()]  # bounded by gate
        deg = {r[0]: r[1] for r in outdeg.collect()}  # subset of nodes
        rank = {v: SCALE_UNITS // n_nodes for v in node_rows}
        spark = edges.sparkSession
        c_schema = T.StructType(
            [
                T.StructField("node", node_type),
                T.StructField("__c", T.LongType()),
            ]
        )
        for _ in range(iterations):
            c_rows = [
                (v, rank[v] // deg[v]) for v in node_rows if v in deg
            ]
            contrib = (
                e.join(
                    F.broadcast(spark.createDataFrame(c_rows, c_schema)),
                    e["__src"] == F.col("node"),
                )
                .groupBy(F.col("__dst").alias("node"))
                .agg(F.sum("__c").alias("__csum"))
                .collect()
            )  # bounded: <= n_nodes rows
            csum = {r[0]: r[1] for r in contrib}
            rank = {
                v: base + damping_pct * csum.get(v, 0) // 100
                for v in node_rows
            }
        e.unpersist()
        out_schema = T.StructType(
            [
                T.StructField("node", node_type),
                T.StructField("rank_units", T.LongType()),
            ]
        )
        return spark.createDataFrame(
            [(v, rank[v]) for v in node_rows], out_schema
        ).select(
            "node",
            "rank_units",
            (
                F.col("rank_units").cast("double")
                / F.lit(float(SCALE_UNITS))
            ).alias("rank"),
        )
    ranks = nodes.withColumn(
        "rank_units", F.lit(SCALE_UNITS // n_nodes).cast("long")
    ).localCheckpoint(eager=True)
    for _ in range(iterations):
        state = ranks.join(outdeg, "node")
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
