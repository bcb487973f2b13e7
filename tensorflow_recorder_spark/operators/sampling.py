"""Deterministic sampling operators (training-data pipeline staple).

``rand()``-based sampling is NOT reproducible on a cluster: a re-run
(or a single re-tried task) samples a different subset, which breaks
dataset versioning and makes failed-task retries corrupt a 100 TB
sample job. These operators decide membership as a PURE FUNCTION of the
row id — an md5-derived bucket — so the sample is identical across
retries, executors, partitionings, and engines (the DuckDB oracle
computes the same buckets).

The bucket expression is the md5-slice trick used throughout the E1
operators: ``int(md5(salt:id)[:8], 16) % 1_000_000`` gives a uniform
bucket in [0, 1e6); keep the row iff bucket < fraction * 1e6. Plan
shape: a narrow filter — pushed to the scan where possible, no shuffle,
no state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_DENOM = 1_000_000


def _bucket_expr(id_col: str, salt: str) -> str:
    return (
        f"pmod(cast(conv(substring(md5(concat('{salt}:', "
        f"cast({id_col} as string))), 1, 8), 16, 10) as bigint), {_DENOM})"
    )


def hash_sample(
    df: DataFrame, id_col: str, fraction: float, salt: str = "sample"
) -> DataFrame:
    """Keep a deterministic ~``fraction`` of rows keyed by ``id_col``.

    Changing ``salt`` draws an independent sample; the same salt always
    draws the same rows. Exactly reproducible, oracle-checkable.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return df.where(
        F.expr(_bucket_expr(id_col, salt)) < F.lit(int(fraction * _DENOM))
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    fractions: dict,
    default_fraction: float = 0.0,
    salt: str = "sample",
) -> DataFrame:
    """Per-stratum deterministic sampling (class rebalancing / source
    reweighting): each stratum keeps its own fraction; strata absent
    from ``fractions`` keep ``default_fraction``.

    The per-row threshold is a CASE over ``strata_col`` — still one
    narrow filter, no shuffle; the sampling decision composes with the
    same bucket as :func:`hash_sample`, so a row's membership at
    fraction f implies membership at every f' > f (nested samples —
    growing a sample never resamples the existing rows).
    """
    threshold: Column = F.lit(int(default_fraction * _DENOM))
    for value, frac in sorted(fractions.items()):
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for {value!r} must be in [0, 1]")
        threshold = (
            F.when(F.col(strata_col) == F.lit(value), F.lit(int(frac * _DENOM)))
            .otherwise(threshold)
        )
    return df.where(F.expr(_bucket_expr(id_col, salt)) < threshold)


def mixture_sample(
    df: DataFrame,
    source_col: str,
    id_col: str,
    token_count: Column,
    weights: dict,
    token_budget: float,
    salt: str = "mix",
) -> DataFrame:
    """Weighted data-mixture sampling: draw ~``token_budget`` tokens with
    per-source proportions ``weights`` (the "data mixing" step of an LLM
    training pipeline — e.g. 50% web, 20% code, ...).

    For each source ``s`` the target take is ``weights[s] *
    token_budget`` tokens; the sampling rate is ``min(1, take_s /
    total_tokens_s)`` (a source smaller than its target is taken whole —
    the cap, not an error). Sources absent from ``weights`` get rate 0.
    Membership is then the same deterministic md5 bucket as
    :func:`hash_sample`, so the drawn mixture is identical across
    retries, partitionings, and engines, and nested in the budget (a
    bigger budget only ever ADDS rows per source).

    Plan shape at 100 TB: one tiny partial-aggregated groupBy (one row
    per source) broadcast back onto the corpus, then a narrow
    deterministic filter — no corpus shuffle, no ``rand()``.

    Returns the sampled rows plus ``n_tokens`` and the per-source
    ``sample_rate`` applied.
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    for s, w in weights.items():
        if w < 0:
            raise ValueError(f"weight for {s!r} must be >= 0")
    if token_budget <= 0:
        raise ValueError(f"token_budget must be positive, got {token_budget}")

    with_tok = df.withColumn("n_tokens", token_count.cast("long"))
    totals = with_tok.groupBy(source_col).agg(
        F.sum("n_tokens").alias("__total_tokens")
    )
    weight: Column = F.lit(0.0)
    for value, w in sorted(weights.items()):
        weight = F.when(
            F.col(source_col) == F.lit(value), F.lit(float(w))
        ).otherwise(weight)
    rates = totals.select(
        F.col(source_col),
        F.least(
            F.lit(1.0),
            (weight * F.lit(float(token_budget))) / F.col("__total_tokens"),
        ).alias("sample_rate"),
    )
    joined = with_tok.join(F.broadcast(rates), source_col)
    return joined.where(
        F.expr(_bucket_expr(id_col, salt))
        < F.floor(F.col("sample_rate") * F.lit(float(_DENOM))).cast("bigint")
    )
