"""Privacy audit operators (E6 extension): k-anonymity / l-diversity
style risk measurement over quasi-identifier combinations — the
pre-release gate for a training corpus containing user-derived rows
(complements the value-level PII redaction in operators/text.py:449).

Scale shape: one groupBy on the quasi-identifier tuple (a single
shuffle whose key cardinality is the QI cross-product, far below row
count); the summary is a second metadata-scale aggregate. No driver
materialization; skewed QI groups are plain agg skew, handled by AQE.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def k_anonymity_groups(
    df: DataFrame, quasi_cols: Sequence[str], k: int = 5
) -> DataFrame:
    """Group sizes of every quasi-identifier combination, flagged when
    the group is smaller than ``k`` (those rows are re-identifiable to
    within < k candidates).

    Output: (*quasi_cols, n BIGINT, at_risk BOOLEAN).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    return (
        df.groupBy(*[F.col(c) for c in quasi_cols])
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .withColumn("at_risk", F.col("n") < k)
    )


def k_anonymity_summary(
    df: DataFrame,
    quasi_cols: Sequence[str],
    k: int = 5,
    sensitive_col: str | None = None,
) -> DataFrame:
    """One-row corpus risk report: group count, rows in at-risk groups,
    the achieved k (min group size), and — when ``sensitive_col`` is
    given — the minimum l-diversity (distinct sensitive values in the
    least-diverse group).

    Output: (n_groups, n_rows, rows_at_risk, min_group_size BIGINT,
    min_l_diversity BIGINT or NULL).
    """
    groups = df.groupBy(*[F.col(c) for c in quasi_cols]).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        *(
            [F.countDistinct(F.col(sensitive_col)).cast("long").alias("l")]
            if sensitive_col
            else []
        ),
    )
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum("n").cast("long").alias("n_rows"),
        F.sum(F.when(F.col("n") < k, F.col("n")).otherwise(0))
        .cast("long")
        .alias("rows_at_risk"),
        F.min("n").cast("long").alias("min_group_size"),
    ]
    if sensitive_col:
        aggs.append(F.min("l").cast("long").alias("min_l_diversity"))
    else:
        aggs.append(F.lit(None).cast("long").alias("min_l_diversity"))
    return groups.agg(*aggs)
