"""Skew-resistance utilities: salted formulations of operators whose
single-key state would otherwise pin a hot key to one task.

AQE's skew handling splits oversized JOIN partitions, but WINDOW
partitions are not splittable — a window over a hot key (one nation with
millions of suppliers, one digest duplicated millions of times) is a
single-task sort no matter how many executors exist. The pattern here is
the standard two-phase rewrite: do the per-key work within (key, salt)
first — spreading the hot key over ``salt_buckets`` tasks and shrinking
it to a bounded candidate set — then finish on the pruned candidates.
Outputs are IDENTICAL to the unsalted formulation (oracle-checked); only
the physical strategy changes.

Related: ``dedup.exact_dedup(method='agg')`` applies the same idea via
partial aggregation + semi-join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def salted_topk_per_key(
    df: DataFrame,
    key_cols: list[str],
    order_by: list[Column],
    k: int,
    rank_alias: str = "rk",
    salt_buckets: int = 16,
    salt_on: str | None = None,
) -> DataFrame:
    """Top-k rows per key, skew-resistant (identical output to a single
    ``row_number`` window, different physical plan).

    Phase 1 ranks within (key, salt) — the hot key's rows spread across
    ``salt_buckets`` tasks and at most ``salt_buckets * k`` candidates
    per key survive. Phase 2 ranks the candidates per key: bounded
    input, so the unsplittable window partition is now tiny by
    construction. The global top-k is always a subset of the union of
    per-salt top-ks, so no correct row can be pruned.

    ``salt_on`` names a column whose hash spreads rows (default: the
    whole row via monotonically increasing partition spread is NOT used
    — pick a high-cardinality column like the row id for even salting).
    """
    salt_src = F.col(salt_on) if salt_on else F.spark_partition_id()
    salted = df.withColumn("__salt", F.pmod(F.hash(salt_src), F.lit(salt_buckets)))
    w1 = Window.partitionBy(*key_cols, "__salt").orderBy(*order_by)
    candidates = (
        salted.withColumn("__rn1", F.row_number().over(w1))
        .where(F.col("__rn1") <= k)
        .drop("__rn1", "__salt")
    )
    w2 = Window.partitionBy(*key_cols).orderBy(*order_by)
    return (
        candidates.withColumn(rank_alias, F.row_number().over(w2).cast("long"))
        .where(F.col(rank_alias) <= k)
    )
