"""Table profiling (E3/ops extension): per-column statistics in a
bounded number of passes — the data-quality dashboard behind every
ingest pipeline.

Two passes, both scale-fixed:

* counts/min/max: ONE global aggregate (partial-aggregated, no shuffle
  of data rows — the shuffle moves C partial states, C = column count).
* distinct estimates: every column's deterministic HyperLogLog runs in
  ONE shared pass — values stack into (column, register) keys, so the
  single groupBy's key space is C x 2^b registers regardless of row
  count (the same trick as training all PQ subspaces together).

Exact per-column countDistinct at 100 TB would be C full shuffles of
the data; the stacked-HLL profile is one bounded shuffle total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .sketches import hll_register_exprs


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    b: int = 10,
) -> DataFrame:
    """Per-column profile: (column, n_rows, n_nulls, n_distinct_est,
    min_value, max_value) — min/max rendered as strings of the native
    ordering's extremes; distincts are the deterministic HLL estimate
    (nulls excluded, matching COUNT(DISTINCT)).
    """
    cols = columns if columns is not None else df.columns
    if not cols:
        raise ValueError("no columns to profile")

    # Pass 1: one global aggregate for counts + native-order min/max.
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"__n_{c}"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nulls_{c}"),
            F.min(c).cast("string").alias(f"__min_{c}"),
            F.max(c).cast("string").alias(f"__max_{c}"),
        ]
    stats_row = df.agg(*aggs)
    stats = stats_row.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(f"__n_{c}").cast("long").alias("n_rows"),
                        F.col(f"__nulls_{c}").cast("long").alias("n_nulls"),
                        F.col(f"__min_{c}").alias("min_value"),
                        F.col(f"__max_{c}").alias("max_value"),
                    )
                    for c in cols
                ]
            )
        ).alias("s")
    ).select("s.*")

    # Pass 2: stacked HLL — one groupBy over (column, register) keys.
    stacked = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(c).cast("string").alias("v"),
                    )
                    for c in cols
                ]
            )
        ).alias("kv")
    ).select("kv.column", "kv.v").where(F.col("v").isNotNull())
    reg, rho = hll_register_exprs("v", b)
    registers = (
        stacked.select("column", F.expr(reg).alias("reg"), F.expr(rho).alias("rho"))
        .groupBy("column", "reg")
        .agg(F.max("rho").alias("max_rho"))
    )
    m = 1 << b
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = (
        registers.groupBy("column")
        .agg(
            F.sum(F.expr("pow(cast(2 as double), -max_rho)")).alias("inv_sum"),
            F.count(F.lit(1)).alias("n_nonzero"),
        )
        .select(
            "column",
            F.expr(
                f"round({alpha} * {m} * {m} / (inv_sum + ({m} - n_nonzero)), 4)"
            ).alias("raw_est"),
            (F.lit(m) - F.col("n_nonzero")).cast("long").alias("n_zero"),
        )
        .select(
            "column",
            F.expr(
                f"cast(round(CASE WHEN raw_est <= {2.5 * m} AND n_zero > 0 "
                f"THEN {m} * ln(cast({m} as double) / n_zero) "
                f"ELSE raw_est END) as bigint)"
            ).alias("n_distinct_est"),
        )
    )
    return stats.join(est, "column", "left").select(
        "column",
        "n_rows",
        "n_nulls",
        F.coalesce("n_distinct_est", F.lit(0)).cast("long").alias("n_distinct_est"),
        "min_value",
        "max_value",
    )
