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
    nodes = (
        e.select(F.col("__src").alias("node"))
        .union(e.select(F.col("__dst").alias("node")))
        .distinct()
    )
    outdeg = e.groupBy(F.col("__src").alias("node")).agg(
        F.count(F.lit(1)).alias("outdeg")
    )
    n_nodes = nodes.count()  # bounded: one long
    base = (100 - damping_pct) * SCALE_UNITS // (100 * n_nodes)
    ranks = nodes.withColumn(
        "rank_units", F.lit(SCALE_UNITS // n_nodes).cast("long")
    ).localCheckpoint(eager=True)
    for _ in range(iterations):
        contrib = (
            ranks.join(outdeg, "node")
            .join(e, ranks["node"] == e["__src"])
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
