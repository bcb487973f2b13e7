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


def skew_split_pairs(
    df: DataFrame,
    group_col: str,
    item_col: str,
    hot_threshold: int = 64,
    salt_buckets: int = 16,
    hot_keys: DataFrame | None = None,
) -> DataFrame:
    """Within-group unordered item pairs (a < b), skew-resistant —
    identical output to the naive keyed self-join, different physical
    plan for CELEBRITY GROUPS.

    The naive shape keys the self-join on ``group_col``; one group's
    O(k²) pair generation is then a single task no matter how many
    executors exist (a 1M-line basket at 100 TB is 5·10¹¹ pairs on one
    core — the straggler AQE cannot split, because the skew is in the
    JOIN OUTPUT, not the shuffle input bytes AQE's detector looks at).
    Rewrite: ONE join on (group, salt) with a CONDITIONAL salt —

      * rows of groups at or below ``hot_threshold`` items carry salt 0
        on both sides (the naive path, bounded by construction);
      * hot-group LEFT rows are bucketed by item hash, hot-group RIGHT
        rows are replicated ``salt_buckets`` times (explode of a
        per-row sequence), so each (a, b) pair is produced by exactly
        one (a's) bucket and the hot group's pair work spreads over
        ``salt_buckets`` tasks. Replication is paid ONLY on hot rows.

    Plan economics (measured, r8): the conditional-salt single join
    scans ``df`` exactly twice — the same as the naive self-join — so
    the uniform-data cost is naive + one broadcast-hash tag per side.
    ``hot_keys`` (a 1-column frame of hot ``group_col`` values) lets
    the caller derive hotness from a CHEAPER upstream frame (e.g. a
    raw-scan line count, an upper bound on the distinct-item count)
    instead of re-aggregating ``df``; when omitted it is counted from
    ``df`` directly. The hot-key set is broadcast — it is bounded by
    construction (keys with > threshold rows number at most
    rows/threshold).

    Output: (group_col, item_a, item_b) with item_a < item_b, distinct
    items per group assumed by the caller (dedupe upstream).
    """
    if hot_keys is None:
        hot_keys = (
            df.groupBy(group_col)
            .agg(F.count(F.lit(1)).alias("__n"))
            .where(F.col("__n") > hot_threshold)
            .select(group_col)
        )
    hot = F.broadcast(
        hot_keys.select(group_col).withColumn("__hot", F.lit(True))
    )
    left = (
        df.join(hot, group_col, "left")
        .withColumn(
            "__salt",
            F.when(
                F.col("__hot").isNotNull(),
                F.pmod(F.hash(item_col), F.lit(salt_buckets)),
            ).otherwise(F.lit(0)),
        )
        .drop("__hot")
    )
    right = (
        df.select(group_col, F.col(item_col).alias("__b"))
        .join(hot, group_col, "left")
        .withColumn(
            "__salt",
            F.explode(
                F.when(
                    F.col("__hot").isNotNull(),
                    F.sequence(F.lit(0), F.lit(salt_buckets - 1)),
                ).otherwise(F.array(F.lit(0)))
            ),
        )
        .drop("__hot")
    )
    return (
        left.join(right, [group_col, "__salt"])
        .where(F.col(item_col) < F.col("__b"))
        .select(
            group_col,
            F.col(item_col).alias("item_a"),
            F.col("__b").alias("item_b"),
        )
    )


def key_skew_profile(
    frames: list[tuple[str, DataFrame, str]],
) -> DataFrame:
    """Pre-join skew diagnostic: the frequency distribution of each
    candidate shuffle key, the number every salting/AQE decision above
    is made from. ``frames`` is [(label, df, key_col)]; output one row
    per key: (key, n_rows, n_keys, avg_freq, p50_freq, p99_freq,
    max_freq, skew_ratio, top_share, suggested_salt).

    ``skew_ratio`` = max/avg per-key frequency (1.0 = perfectly even);
    ``suggested_salt`` = ceil(max_freq / max(p50_freq, 1)) — the bucket
    count that splits the hottest key into median-key-sized slices,
    i.e. the ``salt_buckets`` argument :func:`salted_topk_per_key`
    wants and the reason `spark.sql.adaptive.skewJoin` thresholds
    exist.

    Scale shape: per key column one partial-aggregated groupBy (the
    count frame is bounded by key cardinality, never rows), then ONE
    exact-percentile aggregate over that bounded frame. At 100 TB this
    runs as a fraction of the join it diagnoses; the percentile can
    drop to ``percentile_approx`` with no plan change. No driver
    materialization — the result is C rows for C candidate keys.
    """
    if not frames:
        raise ValueError("frames must be non-empty")
    outs = []
    for label, df, key_col in frames:
        cnts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("__f"))
        outs.append(
            cnts.agg(
                F.lit(label).alias("key"),
                F.sum("__f").cast("long").alias("n_rows"),
                F.count(F.lit(1)).cast("long").alias("n_keys"),
                F.round(F.sum("__f") / F.count(F.lit(1)), 6).alias("avg_freq"),
                F.round(F.expr("percentile(__f, 0.5)"), 6).alias("p50_freq"),
                F.round(F.expr("percentile(__f, 0.99)"), 6).alias("p99_freq"),
                F.max("__f").cast("long").alias("max_freq"),
                F.round(
                    F.max("__f") / (F.sum("__f") / F.count(F.lit(1))), 6
                ).alias("skew_ratio"),
                F.round(F.max("__f") / F.sum("__f"), 6).alias("top_share"),
                F.ceil(
                    F.max("__f") / F.greatest(F.expr("percentile(__f, 0.5)"), F.lit(1.0))
                ).cast("long").alias("suggested_salt"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out
