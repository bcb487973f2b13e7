"""Split routing and split histogram (operators P1 / A1, SURVEY.md §2.3,
§2.4).

The reference partitions rows 4-way by the split column, routing unknown
values to DISCARD with a warning (/root/reference/tfrecorder/
beam_pipeline.py:73-88) and computes a driver-side split histogram to
decide which branches to build, requiring TRAIN
(beam_pipeline.py:158-161, 274-280).

Spark-first design: the 4-way physical partition becomes a *normalized
split column* — `when(col.isin(allowed), col).otherwise('DISCARD')` —
followed by either per-split filters off one cached lineage or, better, a
single `write.partitionBy(split)`. No shuffle is introduced: split
normalization is a narrow projection, and the write-side routing is
file-level. At 100 TB this is the only formulation that avoids scanning
the input four times.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..constants import DISCARD, SPLIT_VALUES, TRAIN


def normalize_split(df: DataFrame, split_key: str = "split") -> DataFrame:
    """Rewrite the split column so unknown values become DISCARD (P1).

    Reference semantics: beam_pipeline.py:84-87 (unknown -> DISCARD,
    warning, not an error). NULL is likewise unknown -> DISCARD.
    """
    col = F.col(split_key)
    return df.withColumn(
        split_key,
        F.when(col.isin(list(SPLIT_VALUES)), col).otherwise(F.lit(DISCARD)),
    )


def derive_split(
    df: DataFrame,
    key_col: str,
    split_key: str = "split",
    train_pct: int = 80,
    validation_pct: int = 10,
    salt: str = "",
) -> DataFrame:
    """Create a deterministic TRAIN/VALIDATION/TEST split column from a
    stable key (the step upstream of the reference, which assumes the
    split column already exists).

    The bucket is ``int(md5(salt:key)[:8]) % 100`` — a pure projection
    (no shuffle, no RNG state), so the assignment is (a) reproducible
    run-to-run and engine-portable, (b) stable under appends: a row's
    split never changes when other rows arrive, which per-row random
    sampling cannot guarantee. ``salt`` re-deals the assignment without
    touching the data (epoch-style re-splits). TEST gets the remainder.
    """
    test_floor = train_pct + validation_pct
    bucket = (
        f"cast(conv(substring(md5(concat('{salt}:', cast({key_col} as string))),"
        f" 1, 8), 16, 10) as bigint) % 100"
    )
    return df.withColumn(
        split_key,
        F.expr(
            f"CASE WHEN ({bucket}) < {train_pct} THEN 'TRAIN' "
            f"WHEN ({bucket}) < {test_floor} THEN 'VALIDATION' "
            f"ELSE 'TEST' END"
        ),
    )


def split_counts(df: DataFrame, split_key: str = "split") -> dict[str, int]:
    """Split histogram collected to the driver (A1). The result is at most
    |distinct split values| rows — safe to collect at any scale.

    Reference: beam_pipeline.py:158-161 (pandas value_counts on driver).
    """
    rows = df.groupBy(split_key).count().collect()
    return {r[split_key]: r["count"] for r in rows}


def require_train(counts: dict[str, int]) -> None:
    """TRAIN presence is mandatory (V3). Reference: beam_pipeline.py:279-280."""
    if counts.get(TRAIN, 0) <= 0:
        raise AttributeError("Dataset must contain a TRAIN split.")


def split_histogram_df(df: DataFrame, split_key: str = "split") -> DataFrame:
    """A1 as a declared query: normalized-split histogram as a DataFrame."""
    return (
        normalize_split(df, split_key)
        .groupBy(F.col(split_key).alias("split"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


def leakage_safe_split(
    df: DataFrame,
    clusters: DataFrame,
    id_col: str,
    cluster_id_col: str = "cluster_id",
    cluster_member_col: str = "id",
    split_key: str = "split",
    train_pct: int = 80,
    validation_pct: int = 10,
    salt: str = "",
) -> DataFrame:
    """Split assignment that can never leak near-duplicates across
    splits: rows are hashed into TRAIN/VALIDATION/TEST by their
    duplicate-cluster id (``clusters`` = (member id, cluster id), e.g.
    from ``dedup.duplicate_clusters`` over LSH-verified pairs;
    unclustered rows fall back to their own id), so every member of a
    duplicate family lands in the SAME split by construction. The
    prevention counterpart of the ``cross_split_exact_overlap``
    detector (P3): instead of measuring train->test contamination after
    the fact, the assignment makes it structurally impossible for any
    pair the dedup stage can see.

    Same md5-bucket determinism contract as :func:`derive_split`
    (reproducible, append-stable, salt re-deals).

    Scale shape: one equi-join of the corpus against the cluster map —
    the map is |clustered docs| rows (pairs-bearing docs only, usually
    orders below corpus size, broadcastable in practice) — then the
    same pure-projection hash split as ``derive_split``; no extra
    shuffle beyond the join.

    Output: input columns + ``group_key`` (the id the split was hashed
    on) + ``split_key``.
    """
    cmap = clusters.select(
        F.col(cluster_member_col).alias("__m"),
        F.col(cluster_id_col).alias("__c"),
    )
    joined = df.join(cmap, df[id_col] == cmap["__m"], "left").drop("__m")
    keyed = joined.withColumn(
        "group_key", F.coalesce(F.col("__c"), F.col(id_col)).cast("long")
    ).drop("__c")
    return derive_split(
        keyed,
        "group_key",
        split_key=split_key,
        train_pct=train_pct,
        validation_pct=validation_pct,
        salt=salt,
    )
