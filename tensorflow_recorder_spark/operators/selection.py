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
        # r11: spread before the per-token md5 explode (a one-file scan
        # ran the whole hashing pass in one task; metadata-gated, no-op
        # at scale)
        from ..functions.partitioning import spread_to_parallelism

        return (
            spread_to_parallelism(df)
            .select(F.explode(F.expr(_feature_expr(text_col, buckets))).alias("bucket"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias(name))
        )

    # localCheckpoint: each count frame (<= buckets rows) now feeds BOTH
    # the full-outer join and its derived total — without the pin the
    # corpus-wide explode would re-run per consumer
    tc = counts(target, "tn").localCheckpoint(eager=True)
    sc = counts(source, "sn").localCheckpoint(eager=True)
    joined = (
        tc.join(sc, "bucket", "full")
        .select(
            "bucket",
            F.coalesce("tn", F.lit(0)).alias("tn"),
            F.coalesce("sn", F.lit(0)).alias("sn"),
        )
    )
    # totals as single-row broadcast aggregates; the +B term is the
    # smoothing mass so probabilities sum to 1 over buckets.
    # r11: derived from the per-bucket COUNT frames — the exploded
    # feature total IS the sum of the bucket counts, so the two extra
    # corpus-wide md5 explode passes the old formulation paid for
    # t_total/s_total are pure waste (identical integers by identity:
    # sum over buckets of count == count over all exploded rows).
    tt = tc.agg((F.coalesce(F.sum("tn"), F.lit(0)) + buckets).alias("t_total"))
    st = sc.agg((F.coalesce(F.sum("sn"), F.lit(0)) + buckets).alias("s_total"))
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
    from ..functions.partitioning import spread_to_parallelism

    feats = spread_to_parallelism(df).select(
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
