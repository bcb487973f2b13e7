"""Data-quality expectation suite (E6 extension): declarative
constraint checks evaluated in ONE aggregation pass over the table —
the Deequ/Great-Expectations pattern, re-expressed as a single Spark
agg + an in-plan unpivot (no driver collect, no per-constraint scan).

The reference validates schema shape only
(/root/reference/tfrecorder/converter.py:115-143); a 100 TB ingest gate
needs value-level checks too, and needs them without N table scans.

Scale shape: every metric is an aggregate expression folded into one
``df.agg(...)`` — Catalyst evaluates all of them in a single partial+
final aggregation (one shuffle of one row per partition). The unpivot
to (check_name, value, passed) rows is a ``stack`` over the single
aggregated row — pure metadata-scale work. ``unique`` constraints use
count(distinct) which Spark plans as expand+two-phase agg; with
multiple distinct columns the expand multiplies input rows, so at 100
TB prefer one unique-check per audit or the HLL variant in
operators/profile.py when approximation is acceptable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


class Expectation:
    """One named constraint: an aggregate metric expression plus a pass
    predicate over the metric value (both Column-valued)."""

    def __init__(self, name: str, metric: Column, passed: Column):
        self.name = name
        self.metric = metric
        self.passed = passed


def not_null(col: str) -> Expectation:
    """Fraction of non-null values must be 1.0."""
    m = F.avg(F.when(F.col(col).isNotNull(), 1.0).otherwise(0.0))
    return Expectation(f"not_null({col})", m, F.col("value") >= 1.0)


def unique(col: str) -> Expectation:
    """count(distinct col) / count(col) must be 1.0 (nulls excluded
    from both sides, matching SQL COUNT semantics)."""
    m = F.countDistinct(F.col(col)).cast("double") / F.count(F.col(col))
    return Expectation(f"unique({col})", m, F.col("value") >= 1.0)


def min_value(col: str, lo: float) -> Expectation:
    return Expectation(
        f"min({col})>={lo}", F.min(F.col(col)).cast("double"),
        F.col("value") >= float(lo),
    )


def max_value(col: str, hi: float) -> Expectation:
    return Expectation(
        f"max({col})<={hi}", F.max(F.col(col)).cast("double"),
        F.col("value") <= float(hi),
    )


def accepted_values(col: str, values: Sequence[str]) -> Expectation:
    """Fraction of non-null values inside the accepted set must be 1."""
    vals = sorted(values)
    m = F.avg(
        F.when(F.col(col).isin(list(vals)), 1.0).otherwise(0.0)
    )
    label = f"accepted_values({col})"
    return Expectation(label, m, F.col("value") >= 1.0)


def row_count_at_least(n: int) -> Expectation:
    return Expectation(
        f"row_count>={n}", F.count(F.lit(1)).cast("double"),
        F.col("value") >= float(n),
    )


def _validate_suite(expectations: Sequence[Expectation]) -> None:
    if not expectations:
        raise ValueError("expectations must be non-empty")
    names = [e.name for e in expectations]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate expectation names: {names}")


def grouped_metrics(
    df: DataFrame,
    group_cols: Sequence[str],
    expectations: Sequence[Expectation],
) -> DataFrame:
    """The aggregation half of a grouped audit: per group, one metric
    column ``m{i}`` per expectation (rounded 6). Split out so a
    Structured Streaming job can run THIS part in the state store
    (avg/min/count are all streaming-legal in complete mode) and hand
    the drained frame to :func:`finalize_expectations` — batch and
    stream share the finalize path and therefore the oracle."""
    _validate_suite(expectations)
    return df.groupBy(*[F.col(c) for c in group_cols]).agg(
        *[F.round(e.metric, 6).alias(f"m{i}") for i, e in enumerate(expectations)]
    )


def finalize_expectations(
    agg_df: DataFrame,
    group_cols: Sequence[str],
    expectations: Sequence[Expectation],
) -> DataFrame:
    """Unpivot a :func:`grouped_metrics` frame to (group_cols...,
    check_name, value DOUBLE, passed BOOLEAN) — a stack + CASE over
    group-cardinality rows, metadata-scale."""
    _validate_suite(expectations)
    pairs = ", ".join(
        f"'{e.name.replace(chr(39), chr(39)*2)}', m{i}"
        for i, e in enumerate(expectations)
    )
    long = agg_df.select(
        *[F.col(c) for c in group_cols],
        F.expr(f"stack({len(expectations)}, {pairs}) AS (check_name, value)"),
    )
    pred = None
    for e in expectations:
        cond = F.col("check_name") == e.name
        pred = F.when(cond, e.passed) if pred is None else pred.when(cond, e.passed)
    return long.select(
        *group_cols,
        "check_name",
        F.col("value").cast("double").alias("value"),
        pred.alias("passed"),
    )


def check_expectations_grouped(
    df: DataFrame,
    group_cols: Sequence[str],
    expectations: Sequence[Expectation],
) -> DataFrame:
    """Grouped audit (e.g. a per-day ingest gate): the whole suite per
    group in ONE aggregation pass — one shuffle keyed by the group
    tuple, then the metadata-scale unpivot. ``unique`` checks are not
    streaming-legal; avoid them in suites meant to run as a stream."""
    if not group_cols:
        raise ValueError("group_cols must be non-empty; use check_expectations")
    return finalize_expectations(
        grouped_metrics(df, group_cols, expectations), group_cols, expectations
    )


def check_expectations(
    df: DataFrame, expectations: Sequence[Expectation]
) -> DataFrame:
    """Evaluate all expectations in one aggregation pass.

    Output: (check_name STRING, value DOUBLE rounded 6, passed BOOLEAN),
    one row per expectation, ordered as declared. The whole suite costs
    one scan + one single-row shuffle regardless of suite size.
    """
    _validate_suite(expectations)
    agg_row = df.agg(
        *[F.round(e.metric, 6).alias(f"m{i}") for i, e in enumerate(expectations)]
    )
    pairs = ", ".join(
        f"'{e.name.replace(chr(39), chr(39)*2)}', m{i}"
        for i, e in enumerate(expectations)
    )
    long = agg_row.select(
        F.expr(
            f"stack({len(expectations)}, {pairs}) AS (check_name, value)"
        )
    )
    # pass predicates keyed by constraint name; CASE dispatch keeps the
    # whole evaluation in-plan
    pred = None
    for e in expectations:
        cond = F.col("check_name") == e.name
        pred = F.when(cond, e.passed) if pred is None else pred.when(cond, e.passed)
    return long.select(
        "check_name",
        F.col("value").cast("double").alias("value"),
        pred.alias("passed"),
    )
