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


def dp_noisy_counts(
    df: DataFrame,
    group_cols: Sequence[str],
    epsilon: float = 1.0,
    seed: str = "dp",
) -> DataFrame:
    """Laplace-mechanism count release (Dwork et al. 2006, "Calibrating
    Noise to Sensitivity in Private Data Analysis" — public): per-group
    counts plus Laplace(1/epsilon) noise (count queries have
    sensitivity 1), released as a clamped non-negative integer. Output:
    (*group_cols, noisy_count double, released bigint).

    The noise here is DETERMINISTIC — an md5-derived uniform in
    (-0.5, 0.5) per (seed, group key) pushed through the Laplace
    inverse CDF — so releases are replayable and oracle-checkable
    across engines. A production DP deployment must swap the seed for
    a secret per-release nonce (determinism with a public seed
    provides no privacy); the MECHANISM (noise scale, clamping,
    sensitivity accounting) is what this operator pins down.

    Scale shape: one partial-aggregated groupBy (key space = the group
    cross-product, far below row count); the noise is per-GROUP column
    arithmetic over that bounded frame — no second data pass, no
    driver materialization.
    """
    counts = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("__n")
    )
    return dp_release(counts, group_cols, "__n", epsilon=epsilon, seed=seed)


def dp_release(
    counts: DataFrame,
    group_cols: Sequence[str],
    count_col: str,
    epsilon: float = 1.0,
    seed: str = "dp",
) -> DataFrame:
    """The finalize half of :func:`dp_noisy_counts`: apply the Laplace
    mechanism to ALREADY-AGGREGATED per-group counts. Split out so the
    streaming twin (``queries.q_s15_stream_dp_counts``) can drain a
    watermark-bounded streaming count into the SAME release path — the
    privacy accounting (noise scale, clamping) is defined once, and the
    batch/stream pair differ only in how the counts were produced.

    Output: (*group_cols, noisy_count double, released bigint).
    """
    if epsilon <= 0:
        raise ValueError(f"epsilon must be > 0, got {epsilon}")
    b = 1.0 / float(epsilon)
    # Collision-proof noise key (r4 advice): each group value becomes a
    # fixed-width md5 token BEFORE concatenation — a ':' inside a value
    # cannot shift field boundaries, and NULL encodes as its own token
    # ('n' vs 'v'+value) instead of being skipped, so distinct groups
    # can never share noise and NULL-valued groups still get a release.
    toks = [
        F.md5(
            F.coalesce(
                F.concat(F.lit("v"), F.col(c).cast("string")), F.lit("n")
            )
        )
        for c in group_cols
    ]
    key = F.concat_ws("", F.lit(seed), *toks)
    # md5-derived uniform in (-0.5, 0.5): 48-bit prefix of the digest
    u = (
        (F.conv(F.substring(F.md5(key), 1, 12), 16, 10).cast("double") + 0.5)
        / F.lit(281474976710656.0)
        - 0.5
    )
    lap = -F.lit(b) * F.signum(u) * F.log(1.0 - 2.0 * F.abs(u))
    noisy = F.round(F.col(count_col).cast("double") + lap, 6)
    return counts.select(
        *group_cols,
        noisy.alias("noisy_count"),
        F.greatest(F.round(noisy, 0), F.lit(0.0)).cast("long").alias("released"),
    )
