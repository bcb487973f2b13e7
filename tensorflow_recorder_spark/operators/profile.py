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


def welch_ab_test(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
    z_crit: float = 1.96,
) -> DataFrame:
    """Welch's unequal-variance two-sample test between two groups
    (Welch 1947, "The generalization of 'Student's' problem" — public):
    the experiment-analysis staple for comparing a metric across two
    event/treatment populations without assuming equal variances.

    ``t = (m_a - m_b) / sqrt(v_a/n_a + v_b/n_b)`` with the
    Welch–Satterthwaite degrees of freedom; ``significant`` flags
    ``|t| > z_crit`` (the normal-approximation cut — exact
    t-distribution p-values need special functions no SQL engine
    shares, and at event-scale n the approximation is the standard
    practice).

    Plan shape at 100 TB: ONE partial-aggregated groupBy computing
    exact-decimal (n, sum, sum-of-squares) per group — three numbers
    per side cross the shuffle, never data rows — then a one-row
    two-sided pivot and a fixed double expression tree. Exact decimal
    moments (the v^2 product squares identical IEEE doubles before the
    order-independent decimal sum) make every derived double
    engine-identical, same float discipline as ``rolling_zscore``.

    Output: one row (group_a, group_b, n_a, n_b, mean_a, mean_b,
    var_a, var_b, t_stat, dof — doubles rounded 6, significant
    BOOLEAN).
    """
    moments = ab_moments(df, group_col, value_col, (group_a, group_b))
    return ab_finalize(moments, group_a, group_b, z_crit=z_crit)


def ab_moments(
    df: DataFrame,
    group_col: str,
    value_col: str,
    groups: tuple[str, str],
) -> DataFrame:
    """The aggregation half of :func:`welch_ab_test`: per-group exact
    (n, sum, sum-of-squares). Split out so the streaming twin
    (``queries.q_s18_stream_ab_test``) can run it as a complete-mode
    streaming aggregate — the state store holds three numbers per
    group — and drain into the SAME :func:`ab_finalize` expression
    tree. Output: (__g, __n, __s, __ss)."""
    g = df.where(F.col(group_col).isin(list(groups))).select(
        F.col(group_col).alias("__g"),
        F.col(value_col).cast("double").alias("__v"),
    )
    return g.groupBy("__g").agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum(F.col("__v").cast("decimal(18,6)")).cast("double").alias("__s"),
        F.sum((F.col("__v") * F.col("__v")).cast("decimal(28,10)"))
        .cast("double")
        .alias("__ss"),
    )


def ab_power(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
    z_alpha: float = 1.96,
    z_beta: float = 0.8416,
) -> DataFrame:
    """Minimum detectable effect for the two-sample comparison at the
    OBSERVED sample sizes and variances (the pre-readout every
    experiment review runs before trusting a null result: a
    non-significant test with an MDE larger than any plausible effect
    is just underpowered, not negative). Normal-approximation form
    (public, e.g. Kohavi et al., "Trustworthy Online Controlled
    Experiments"): ``mde_abs = (z_alpha + z_beta) *
    sqrt(v_a/n_a + v_b/n_b)``; ``mde_rel`` divides by the control
    mean. Defaults: two-sided alpha = 0.05, power = 80%.

    Same plan and float discipline as :func:`welch_ab_test` (shares
    :func:`ab_moments`): three exact-decimal numbers per side cross
    the shuffle, then one fixed double expression tree.

    Output: one row (group_a, group_b, n_a, n_b, mean_a, var_a,
    var_b, mde_abs, mde_rel — doubles rounded 6).
    """
    moments = ab_moments(df, group_col, value_col, (group_a, group_b))
    side = lambda name, lbl: [  # noqa: E731
        F.max(F.when(F.col("__g") == lbl, F.col(c))).alias(f"{c}_{name}")
        for c in ("__n", "__s", "__ss")
    ]
    one = moments.agg(*side("a", group_a), *side("b", group_b))
    na = F.col("__n_a").cast("double")
    nb = F.col("__n_b").cast("double")
    ma = F.col("__s_a") / na
    va = (F.col("__ss_a") - F.col("__s_a") * F.col("__s_a") / na) / (
        na - F.lit(1.0)
    )
    vb = (F.col("__ss_b") - F.col("__s_b") * F.col("__s_b") / nb) / (
        nb - F.lit(1.0)
    )
    se = F.sqrt(va / na + vb / nb)
    mde = F.lit(float(z_alpha) + float(z_beta)) * se
    return one.select(
        F.lit(group_a).alias("group_a"),
        F.lit(group_b).alias("group_b"),
        F.col("__n_a").cast("long").alias("n_a"),
        F.col("__n_b").cast("long").alias("n_b"),
        F.round(ma, 6).alias("mean_a"),
        F.round(va, 6).alias("var_a"),
        F.round(vb, 6).alias("var_b"),
        F.round(mde, 6).alias("mde_abs"),
        F.round(
            F.when(ma != 0, mde / ma), 6
        ).alias("mde_rel"),
    )


def ab_finalize(
    moments: DataFrame,
    group_a: str,
    group_b: str,
    z_crit: float = 1.96,
) -> DataFrame:
    """The one-row finalize half of :func:`welch_ab_test` over
    already-aggregated (__g, __n, __s, __ss) moments — one statistics
    definition, two ingestion modes (batch groupBy / streaming
    complete-mode drain)."""
    side = lambda name, lbl: [  # noqa: E731
        F.max(F.when(F.col("__g") == lbl, F.col(c))).alias(f"{c}_{name}")
        for c in ("__n", "__s", "__ss")
    ]
    one = moments.agg(*side("a", group_a), *side("b", group_b))

    def stats(sfx):
        n = F.col(f"__n_{sfx}").cast("double")
        m = F.col(f"__s_{sfx}") / n
        v = (F.col(f"__ss_{sfx}") - F.col(f"__s_{sfx}") * F.col(f"__s_{sfx}") / n) / (
            n - F.lit(1.0)
        )
        return n, m, v

    na, ma, va = stats("a")
    nb, mb, vb = stats("b")
    se2 = va / na + vb / nb
    # zero-variance sides (or n=1) yield NULL t/dof instead of a
    # divide-by-zero under ANSI mode; `significant` is then false
    t = F.when(se2 > 0, (ma - mb) / F.sqrt(se2))
    dof_den = (va / na) * (va / na) / (na - F.lit(1.0)) + (vb / nb) * (
        vb / nb
    ) / (nb - F.lit(1.0))
    dof = F.when(dof_den > 0, (se2 * se2) / dof_den)
    return one.select(
        F.lit(group_a).alias("group_a"),
        F.lit(group_b).alias("group_b"),
        F.col("__n_a").alias("n_a"),
        F.col("__n_b").alias("n_b"),
        F.round(ma, 6).alias("mean_a"),
        F.round(mb, 6).alias("mean_b"),
        F.round(va, 6).alias("var_a"),
        F.round(vb, 6).alias("var_b"),
        F.round(t, 6).alias("t_stat"),
        F.round(dof, 6).alias("dof"),
        F.coalesce(
            F.abs(t) > F.lit(float(z_crit)), F.lit(False)
        ).alias("significant"),
    )
