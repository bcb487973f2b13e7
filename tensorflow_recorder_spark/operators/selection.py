"""Data-selection operators (E6 extension): DSIR-style importance
weighting (Xie et al. 2023, "Data Selection for Language Models via
Importance Resampling" — public arXiv paper): score every source
document by how target-like its hashed n-gram profile is, then sample
proportionally. The standard way a pretraining pipeline upweights
high-quality/domain data without a trained classifier.

Scale shape: the fitted state is a B-bucket log-ratio table (B ~ 10^4,
kilobytes — broadcast); fitting is two explode + partial-aggregated
counts whose key space is B; scoring is one explode + broadcast join +
per-doc partial-aggregated sum. The corpus shuffles only on (doc,
bucket) partial sums — never on text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _feature_expr(text_col: str, buckets: int) -> str:
    """Hashed unigram+bigram feature buckets of the lowercased
    whitespace tokens: md5-derived, engine-reproducible (same hash
    family as operators/sketches.py)."""
    toks = f"filter(split(lower({text_col}), '\\\\s+'), t -> t <> '')"
    unis = f"transform({toks}, t -> t)"
    bis = (
        f"CASE WHEN size({toks}) < 2 THEN array() "
        f"ELSE zip_with(slice({toks}, 1, size({toks}) - 1), "
        f"slice({toks}, 2, size({toks}) - 1), (a, b) -> concat(a, ' ', b)) END"
    )
    return (
        f"transform(concat({unis}, {bis}), g -> "
        f"cast(conv(substring(md5(concat('f:', g)), 1, 8), 16, 10) as bigint) % {buckets})"
    )


def dsir_log_ratios(
    source: DataFrame,
    target: DataFrame,
    text_col: str,
    buckets: int = 4096,
) -> DataFrame:
    """Fit the DSIR importance model: per hashed feature bucket,
    ``log((target_count + 1) / target_total) - log((source_count + 1) /
    source_total)`` (add-one smoothing on both sides; totals include the
    smoothing mass B). Output: (bucket, log_ratio) — at most ``buckets``
    rows, the broadcastable fitted state.
    """
    if buckets < 1:
        raise ValueError(f"buckets must be >= 1, got {buckets}")

    def counts(df: DataFrame, name: str) -> DataFrame:
        return (
            df.select(F.explode(F.expr(_feature_expr(text_col, buckets))).alias("bucket"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias(name))
        )

    tc = counts(target, "tn")
    sc = counts(source, "sn")
    joined = (
        tc.join(sc, "bucket", "full")
        .select(
            "bucket",
            F.coalesce("tn", F.lit(0)).alias("tn"),
            F.coalesce("sn", F.lit(0)).alias("sn"),
        )
    )
    # totals ride along as single-row broadcast aggregates; the +B term
    # is the smoothing mass so probabilities sum to 1 over buckets
    tt = target.select(
        F.explode(F.expr(_feature_expr(text_col, buckets))).alias("b")
    ).agg((F.count(F.lit(1)) + buckets).alias("t_total"))
    st = source.select(
        F.explode(F.expr(_feature_expr(text_col, buckets))).alias("b")
    ).agg((F.count(F.lit(1)) + buckets).alias("s_total"))
    return (
        joined.crossJoin(F.broadcast(tt))
        .crossJoin(F.broadcast(st))
        .select(
            "bucket",
            F.round(
                F.log((F.col("tn") + 1.0) / F.col("t_total"))
                - F.log((F.col("sn") + 1.0) / F.col("s_total")),
                9,
            ).alias("log_ratio"),
        )
    )


def dsir_scores(
    df: DataFrame,
    log_ratios: DataFrame,
    text_col: str,
    id_col: str,
    buckets: int = 4096,
) -> DataFrame:
    """Score documents under a fitted DSIR model: importance weight =
    mean per-feature log-ratio (mean, not sum, so the score is
    length-invariant — a long document is not automatically
    target-like). Output: (id, n_features, dsir_score rounded 6);
    feature-less documents score 0.
    """
    feats = df.select(
        F.col(id_col),
        F.explode(F.expr(_feature_expr(text_col, buckets))).alias("bucket"),
    )
    scored = (
        feats.join(F.broadcast(log_ratios), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_features"),
            F.round(F.avg(F.coalesce("log_ratio", F.lit(0.0))), 6).alias("dsir_score"),
        )
    )
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_features", F.lit(0)).cast("long").alias("n_features"),
            F.coalesce("dsir_score", F.lit(0.0)).alias("dsir_score"),
        )
    )
