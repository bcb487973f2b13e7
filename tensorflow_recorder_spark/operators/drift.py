"""Distribution-drift monitoring (extension family): Population
Stability Index between a reference window and a current window of a
numeric feature — THE standard production-ML drift gauge (PSI < 0.1
stable, 0.1-0.25 moderate shift, > 0.25 action). The reference
(TFRecorder) has no monitoring story; a 100 TB training pipeline needs
drift gates before retraining on a new snapshot.

Scale shape: the decile edges are ONE exact-percentile aggregation over
the reference (group-cardinality rows, broadcast back); bin assignment
is a row-local higher-order expression (no UDF); bin counts are two
partial-aggregated groupBys bounded by groups x bins; the PSI fold runs
over a 10-element sorted array per group. Nothing wide ever touches the
fact tables beyond the two bounded count aggregations.

Float discipline for engine parity: bin edges come from exact
interpolated percentiles (identical doubles in any engine), proportions
are exact-count ratios, and the cross-bin sum folds a BIN-SORTED array
left-to-right, so summation order — the usual float trap — is pinned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_EPS = 1e-6


def psi_drift(
    ref: DataFrame,
    cur: DataFrame,
    group_col: str,
    value_col: str,
    bins: int = 10,
) -> DataFrame:
    """PSI of ``value_col``'s distribution per ``group_col``, current
    vs reference. Bins are the reference's exact quantile edges
    (``bins`` equal-population buckets; ties may merge bins — the
    degenerate-distribution case degrades gracefully because both
    windows use the SAME edges). Proportions are clipped at 1e-6
    before the log so empty bins contribute a large-but-finite term.

    Output: (group, n_ref, n_cur, psi double rounded 6).
    """
    if bins < 2:
        raise ValueError(f"bins must be >= 2, got {bins}")
    edges = quantile_edges(ref, group_col, value_col, bins)
    rc = bin_counts(ref, edges, [group_col], value_col, "n_ref_bin")
    cc = bin_counts(cur, edges, [group_col], value_col, "n_cur_bin")
    return psi_from_binned_counts(rc, cc, [group_col])


def quantile_edges(
    ref: DataFrame, group_col: str, value_col: str, bins: int = 10
) -> DataFrame:
    """Per-group exact quantile bin edges fitted on the reference — one
    bounded aggregation, group-cardinality rows, broadcastable."""
    qs = ", ".join(str((i + 1) / bins) for i in range(bins - 1))
    return ref.groupBy(group_col).agg(
        F.expr(f"percentile({value_col}, array({qs}))").alias("__edges")
    )


def bin_counts(
    df: DataFrame,
    edges: DataFrame,
    group_cols: list,
    value_col: str,
    out: str,
) -> DataFrame:
    """Bin ``value_col`` against the broadcast reference edges and count
    per (*group_cols, bin). The bin assignment is a row-local
    higher-order expression; works identically on a streaming frame
    (stream-static broadcast join + streaming aggregation)."""
    join_keys = [c for c in edges.columns if c != "__edges"]
    with_bin = df.join(F.broadcast(edges), join_keys).select(
        *[F.col(c) for c in group_cols],
        F.expr(
            f"1 + aggregate(__edges, 0, "
            f"(acc, e) -> acc + CASE WHEN {value_col} > e THEN 1 ELSE 0 END)"
        ).alias("bin"),
    )
    return with_bin.groupBy(*group_cols, "bin").agg(F.count(F.lit(1)).alias(out))


def psi_from_binned_counts(
    ref_bins: DataFrame,
    cur_bins: DataFrame,
    group_cols: list,
) -> DataFrame:
    """Finalize PSI from two binned-count frames — the shared tail of
    :func:`psi_drift` and the streaming daily monitor (the stream emits
    binned counts; this closes them against the reference). Inputs:
    ``ref_bins`` (group..., bin, n_ref_bin), ``cur_bins`` (group...,
    bin, n_cur_bin). The current side may carry EXTRA group columns
    (e.g. day) absent from the reference side — pass them in
    ``group_cols`` and list the shared ones first; the reference join
    uses only the columns present in ``ref_bins``.

    Output: (*group_cols, n_ref, n_cur, psi double rounded 6).
    """
    ref_keys = [c for c in group_cols if c in ref_bins.columns]
    cur_keys = list(group_cols)
    extra = [c for c in cur_keys if c not in ref_keys]
    if extra:
        # replicate the reference bins onto every current slice (e.g.
        # each day) so a slice missing a reference bin still counts it
        # as zero-current; slices x bins is a bounded grid. The slice
        # frame derives FROM cur_bins, so its columns are renamed before
        # the re-join (identical expr-ids on both sides otherwise).
        slices = cur_bins.select(
            *[F.col(c).alias(f"__sl_{c}") for c in extra]
        ).distinct()
        ref_full = slices.crossJoin(F.broadcast(ref_bins))
        cond = None
        for c in extra:
            eq = ref_full[f"__sl_{c}"] == cur_bins[c]
            cond = eq if cond is None else cond & eq
        for k in (*ref_keys, "bin"):
            cond = cond & (ref_full[k] == cur_bins[k])
        both = ref_full.join(cur_bins, cond, "full_outer").select(
            *[
                F.coalesce(ref_full[f"__sl_{c}"], cur_bins[c]).alias(c)
                for c in extra
            ],
            *[
                F.coalesce(ref_full[k], cur_bins[k]).alias(k)
                for k in ref_keys
            ],
            F.coalesce(ref_full["bin"], cur_bins["bin"]).alias("bin"),
            F.coalesce("n_ref_bin", F.lit(0)).alias("n_ref_bin"),
            F.coalesce("n_cur_bin", F.lit(0)).alias("n_cur_bin"),
        )
        # restore caller-declared group order
        both = both.select(
            *[F.col(c) for c in cur_keys], "bin", "n_ref_bin", "n_cur_bin"
        )
    else:
        both = ref_bins.join(cur_bins, [*cur_keys, "bin"], "full_outer").select(
            *[F.col(c) for c in cur_keys],
            F.col("bin"),
            F.coalesce("n_ref_bin", F.lit(0)).alias("n_ref_bin"),
            F.coalesce("n_cur_bin", F.lit(0)).alias("n_cur_bin"),
        )
    totals = both.groupBy(*cur_keys).agg(
        F.sum("n_ref_bin").alias("__tr"), F.sum("n_cur_bin").alias("__tc")
    )
    terms = both.join(totals, cur_keys).select(
        *[F.col(c) for c in cur_keys],
        F.col("bin"),
        F.col("__tr"),
        F.col("__tc"),
        F.expr(
            f"(greatest(cast(n_ref_bin as double) / __tr, {_EPS}d)"
            f" - greatest(cast(n_cur_bin as double) / __tc, {_EPS}d))"
            f" * ln(greatest(cast(n_ref_bin as double) / __tr, {_EPS}d)"
            f" / greatest(cast(n_cur_bin as double) / __tc, {_EPS}d))"
        ).alias("__term"),
    )
    return terms.groupBy(*cur_keys).agg(
        F.max("__tr").cast("long").alias("n_ref"),
        F.max("__tc").cast("long").alias("n_cur"),
        F.round(
            F.expr(
                "aggregate(array_sort(collect_list(struct(bin, __term))), "
                "cast(0 as double), (acc, x) -> acc + x.__term)"
            ),
            6,
        ).alias("psi"),
    )


def embedding_drift(
    ref: DataFrame,
    cur: DataFrame,
    vec_col: str,
    group_col: str | None = None,
) -> DataFrame:
    """Embedding-space drift: L2 distance between the reference and
    current MEAN embedding (centroid shift), overall or per group — the
    cheap first-line monitor for representation drift before retraining
    an ANN index or a downstream head (centroid shift ~ 0 while PSI
    fires means the feature moved but the embedding space did not, and
    vice versa).

    Plan shape: ``posexplode`` fans each vector into (dim, component)
    rows, then ONE partial-aggregated groupBy per side computes
    per-dimension sums — shuffle bounded by groups x dims, never corpus
    size; the join of the two per-dimension tables is dims-bounded.

    Float discipline: component sums quantize to DECIMAL (exact,
    order-independent), the per-dimension delta and the final fold over
    the DIM-SORTED array use fixed double expression trees — engines
    agree bit-for-bit.

    Output: (group?, n_ref, n_cur, drift_l2 double rounded 6).
    """
    gcols = [group_col] if group_col else []

    def dim_means(df: DataFrame, side: str) -> DataFrame:
        exploded = df.select(
            *gcols, F.posexplode(F.col(vec_col)).alias("dim", "__v")
        )
        # float -> DOUBLE first (exact in every engine), THEN the decimal
        # quantization: a direct float->decimal cast is engine-specific
        return exploded.groupBy(*gcols, "dim").agg(
            F.sum(
                F.col("__v").cast("double").cast("decimal(28,10)")
            ).alias(f"__s_{side}"),
            F.count(F.lit(1)).alias(f"__n_{side}"),
        )
    r = dim_means(ref, "r")
    c = dim_means(cur, "c")
    joined = r.join(c, [*gcols, "dim"])
    delta = joined.select(
        *gcols,
        F.col("dim"),
        F.col("__n_r"),
        F.col("__n_c"),
        (
            F.col("__s_r").cast("double") / F.col("__n_r").cast("double")
            - F.col("__s_c").cast("double") / F.col("__n_c").cast("double")
        ).alias("__d"),
    )
    grouped = delta.groupBy(*gcols) if gcols else delta.groupBy()
    return grouped.agg(
        F.max("__n_r").cast("long").alias("n_ref"),
        F.max("__n_c").cast("long").alias("n_cur"),
        F.round(
            F.sqrt(
                F.expr(
                    "aggregate(array_sort(collect_list(struct(dim, __d))), "
                    "cast(0 as double), (acc, x) -> acc + x.__d * x.__d)"
                )
            ),
            6,
        ).alias("drift_l2"),
    )
