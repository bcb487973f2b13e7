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
