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

from pyspark.sql import Column, DataFrame, Window, functions as F

_DENOM = 1_000_000


def _bucket_expr(id_col: str, salt: str, denom: int = _DENOM) -> str:
    """The md5-slice bucket shared by every deterministic-membership
    operator (sampling, quotas, packing shards): one recipe, one
    engine-parity contract with the DuckDB oracles."""
    return (
        f"pmod(cast(conv(substring(md5(concat('{salt}:', "
        f"cast({id_col} as string))), 1, 8), 16, 10) as bigint), {denom})"
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


def with_shuffle_key(
    df: DataFrame, id_col: str, salt: str = "shuffle"
) -> DataFrame:
    """Deterministic training-order shuffle: attach ``shuffle_key``, the
    md5 of the salted id. Sorting by it IS the epoch's global shuffle —
    a pure function of (salt, id), so the order is identical across
    retries/engines, and a different ``salt`` is a fresh epoch
    permutation.

    At 100 TB the materialization is
    ``df.repartitionByRange(N, "shuffle_key").sortWithinPartitions(...)``
    — a range-partitioned total sort on a uniform 32-hex key: no skew,
    no single-task window, and consumers read shards in shard order.
    (Never ``orderBy(rand())``: not retry-stable, and a failed task
    resamples its partition.)
    """
    return df.withColumn(
        "shuffle_key",
        F.md5(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))),
    )


def source_token_quota(
    df: DataFrame,
    source_col: str,
    id_col: str,
    token_count: Column,
    quota_tokens: int,
    nshards: int = 1,
    salt: str = "quota",
) -> DataFrame:
    """Cap each source's token contribution at ``quota_tokens`` (the
    anti-domination rule of corpus curation: no single crawl/domain may
    exceed its budget).

    Docs are visited in deterministic md5-bucket order within their
    source (retry/engine-stable, and unbiased w.r.t. doc_id order); a
    doc is kept iff the running token total INCLUDING it fits the
    quota. Prefix semantics: the cut is a pure prefix of the per-shard
    order — the first doc that overflows ends the shard's intake (one
    window pass; greedy skip-and-continue would need a sequential
    rescan and changes the sample by at most one partial doc per
    shard). With
    ``nshards > 1`` the quota splits evenly across hash shards and the
    running sum is computed per (source, shard) — the scalable form:
    the window sort is bounded by a shard, not a whole source (a single
    source can be 40% of a 100 TB corpus; its shards are quota-sized).

    Returns the surviving rows with ``n_tokens`` attached.
    """
    if quota_tokens <= 0:
        raise ValueError(f"quota_tokens must be positive, got {quota_tokens}")
    if nshards <= 0:
        raise ValueError(f"nshards must be positive, got {nshards}")
    per_shard = quota_tokens // nshards
    with_tok = df.withColumn("n_tokens", token_count.cast("long")).withColumn(
        "__b", F.expr(_bucket_expr(id_col, salt))
    )
    w = (
        Window.partitionBy(F.col(source_col), F.col("__b") % F.lit(nshards))
        .orderBy("__b", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return (
        with_tok.withColumn("__cum", cum_before)
        .where(F.col("__cum") + F.col("n_tokens") <= F.lit(per_shard))
        .drop("__b", "__cum")
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    id_col: str,
    k: int,
    salt: str = "ws",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement of ``k`` rows
    (Efraimidis & Spirakis 2006, "Weighted random sampling with a
    reservoir" — public): each row draws priority u^(1/w) from an
    md5-derived uniform u and the k highest priorities win — the
    one-pass distributed form of weighted reservoir sampling, and the
    sampling half of importance resampling (pair with
    ``selection.dsir_scores`` weights).

    Determinism: u is a 32-bit md5 slice mapped into (0, 1], so the
    same (salt, id) always draws the same priority and the DuckDB
    oracle replays the draw exactly; priorities round to 9 digits
    before ranking with an id tie-break. Rows with weight <= 0 or NULL
    are excluded (zero probability). The rank is the salted two-phase
    top-k — no corpus-wide single-partition sort.
    Output: the sampled rows of ``df`` plus ``priority``.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from .skew import salted_topk_per_key

    u = (
        f"(cast(conv(substring(md5(concat('{salt}:', {id_col})), 1, 8), 16, 10) "
        f"as double) + 1.0) / 4294967296.0"
    )
    prioritized = df.where(
        F.col(weight_col).isNotNull() & (F.col(weight_col) > 0)
    ).withColumn(
        "priority",
        F.round(
            F.expr(f"pow({u}, 1.0 / cast({weight_col} as double))"), 9
        ),
    )
    ranked = salted_topk_per_key(
        prioritized.withColumn("__g", F.lit(1)),
        key_cols=["__g"],
        order_by=[F.desc("priority"), F.asc(id_col)],
        k=k,
        rank_alias="__rk",
        salt_on=id_col,
    )
    return ranked.drop("__g", "__rk")


def distributed_global_rank(
    df: DataFrame,
    sort_cols: list,
    num_partitions: int | None = None,
) -> tuple[DataFrame, int]:
    """Exact 1-based global rank under a total order — with NO
    single-partition stage anywhere in the plan.

    Two-phase rank, the pure-DataFrame twin of
    ``vocabulary.fit_vocabulary_large``'s zipWithIndex trick:

    1. ``repartitionByRange`` on the sort keys spreads the frame over
       ``num_partitions`` ORDERED ranges (Spark's distributed sort —
       every row in range p sorts before every row in range p+1);
    2. each range windows locally (``row_number`` partitioned by the
       physical partition id — partition-bounded state);
    3. per-range row COUNTS — never rows — cross the driver and come
       back as a broadcast pid→offset map added to the local rank.

    The range frame is pinned with an eager ``localCheckpoint`` so the
    count pass and the rank pass see identical partition assignment.
    Returns ``(frame + __rank column, total row count)``. Caller must
    drop the ``__pid``/``__rank`` helper columns.
    """
    npart = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    parted = (
        df.repartitionByRange(npart, *sort_cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    sizes = sorted(
        (r["__pid"], r["__n"])
        for r in parted.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("__n"))
        .collect()
    )
    offsets: dict[int, int] = {}
    total = 0
    for pid, n in sizes:
        offsets[pid] = total
        total += n
    if not offsets:
        return parted.withColumn("__rank", F.lit(1).cast("long")), 0
    off = F.coalesce(
        F.try_element_at(
            F.create_map(
                *[
                    F.lit(v)
                    for kv in offsets.items()
                    for v in (kv[0], kv[1])
                ]
            ),
            F.col("__pid"),
        ),
        F.lit(0),
    ).cast("long")
    w = Window.partitionBy("__pid").orderBy(*sort_cols)
    return (
        parted.withColumn(
            "__rank", (F.row_number().over(w).cast("long") + off)
        ),
        total,
    )


def curriculum_order(
    df: DataFrame,
    score_col: str,
    id_col: str,
    n_buckets: int = 10,
) -> DataFrame:
    """Deterministic curriculum ordering: rows are bucketed into
    ``n_buckets`` score percentiles (exact ntile semantics over score
    desc, id tie-break) and emitted interleaved — position p takes one
    row from each bucket in turn, so any training-order prefix contains
    a balanced mix of difficulties while still consuming best-first
    within each bucket. Output: (id, bucket, curriculum_pos).

    Scale shape (r4 verdict fix): the bucket is NOT computed with a
    global ``ntile`` window (that is a single-partition sort of the raw
    corpus). Instead :func:`distributed_global_rank` produces the exact
    global rank via a range-partitioned distributed sort plus broadcast
    count offsets, and the ntile bucket is derived from the rank by
    CLOSED-FORM ARITHMETIC — ntile(n) over N rows puts the first
    ``N mod n`` buckets at ``N div n + 1`` rows and the rest at
    ``N div n`` — so results are bit-identical to the windowed ntile
    (the DuckDB oracle keeps its textbook ntile formulation) while every
    stage stays partition-bounded.
    """
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    src = df.select(F.col(id_col), F.col(score_col))
    ranked, n_rows = distributed_global_rank(
        src, [F.desc(score_col), F.asc(id_col)]
    )
    q, r = divmod(n_rows, n_buckets)
    big = q + 1  # size of the first r buckets
    thr = r * big  # ranks 1..thr fall in the big buckets
    k0 = F.col("__rank") - 1  # 0-based global rank
    with_k = ranked.withColumn("__k0", k0)
    if q == 0:
        # fewer rows than buckets: ntile gives one row per bucket.
        bucket = F.col("__rank")
        within = F.lit(1).cast("long")
    else:
        in_big = F.col("__k0") < F.lit(thr)
        bucket = F.when(
            in_big, F.expr(f"__k0 div {big}") + F.lit(1)
        ).otherwise(
            F.lit(r + 1) + F.expr(f"(__k0 - {thr}) div {q}")
        )
        start = F.when(in_big, (bucket - 1) * F.lit(big)).otherwise(
            F.lit(thr) + (bucket - F.lit(r + 1)) * F.lit(q)
        )
        within = F.col("__rank") - start
    return (
        with_k.withColumn("bucket", bucket.cast("long"))
        .withColumn("__within", within.cast("long"))
        .select(
            id_col,
            "bucket",
            ((F.col("__within") - 1) * n_buckets + F.col("bucket") - 1)
            .cast("long")
            .alias("curriculum_pos"),
        )
    )


def bucket_by_length(
    df: DataFrame,
    id_col: str,
    token_count: Column,
    bucket_width: int = 64,
    batch_tokens: int = 4096,
    salt: str = "lenbatch",
) -> DataFrame:
    """Length-bucketed batch assignment: group rows into width-``bucket_
    width`` token-length buckets, then pack each bucket into batches of
    ``floor(batch_tokens / bucket_cap)`` rows in deterministic md5
    order — the standard dynamic-batching step that keeps padding waste
    bounded by the bucket width (every row in a batch pads to the same
    cap).

    Pinned semantics: bucket = floor((n_tokens - 1) / width) for
    n_tokens >= 1 (zero-token rows go to bucket 0); bucket cap =
    (bucket + 1) * width; rows_per_batch = max(1, batch_tokens // cap);
    batch ordinal = (row_number within bucket by (md5 bucket, id) - 1)
    // rows_per_batch. Everything is a pure function of (salt, id,
    n_tokens), so the batching is retry/engine-stable.

    Plan shape: one window partitioned BY BUCKET (bounded partitions —
    a bucket is never bigger than the corpus slice of one length band;
    at 100 TB shard the window key to (bucket, md5 % nshards) exactly
    like ``source_token_quota``). Output: (id, n_tokens, bucket,
    batch_in_bucket, rows_per_batch).
    """
    if bucket_width < 1:
        raise ValueError(f"bucket_width must be >= 1, got {bucket_width}")
    if batch_tokens < 1:
        raise ValueError(f"batch_tokens must be >= 1, got {batch_tokens}")
    with_tok = df.select(
        F.col(id_col), token_count.cast("long").alias("n_tokens")
    ).withColumn(
        "bucket",
        F.when(F.col("n_tokens") <= 0, F.lit(0))
        .otherwise(F.floor((F.col("n_tokens") - 1) / F.lit(bucket_width)))
        .cast("long"),
    )
    cap = (F.col("bucket") + 1) * F.lit(bucket_width)
    rows_per_batch = F.greatest(
        F.lit(1).cast("long"), F.floor(F.lit(batch_tokens) / cap)
    )
    w = Window.partitionBy("bucket").orderBy(
        F.expr(_bucket_expr(id_col, salt)), F.col(id_col)
    )
    return (
        with_tok.withColumn("__r", F.row_number().over(w))
        .select(
            id_col,
            "n_tokens",
            "bucket",
            F.floor((F.col("__r") - 1) / rows_per_batch)
            .cast("long")
            .alias("batch_in_bucket"),
            rows_per_batch.cast("long").alias("rows_per_batch"),
        )
    )


def class_weights(df: DataFrame, label_col: str) -> DataFrame:
    """Inverse-frequency class weights (sklearn's "balanced" rule,
    public): ``weight_c = n_rows / (n_classes * n_c)`` — the loss
    reweighting table for an imbalanced label column, computed as one
    tiny groupBy plus a broadcast scalar. NULL labels are excluded.

    Output: (label, n BIGINT, weight DOUBLE rounded 6).
    """
    counts = (
        df.where(F.col(label_col).isNotNull())
        .groupBy(F.col(label_col).alias("label"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    totals = counts.agg(
        F.sum("n").alias("__total"), F.count(F.lit(1)).alias("__k")
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "label",
            "n",
            F.round(
                F.col("__total").cast("double")
                / (F.col("__k") * F.col("n")).cast("double"),
                6,
            ).alias("weight"),
        )
    )


def kfold_assign(
    df: DataFrame, id_col: str, k: int = 5, salt: str = "kfold"
) -> DataFrame:
    """Deterministic k-fold cross-validation assignment: every row gets
    a ``fold`` in [0, k) from the shared md5-bucket recipe — the same
    engine-parity hash as :func:`hash_sample`, so folds are stable
    across runs, machines, and engines, and any fold's train/holdout
    split is reproducible by re-hashing (no persisted assignment table
    needed — the assignment IS the function).

    Map-only: no shuffle, no fitted state; at 100 TB this is a free
    projection pushed into the scan stage.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    return df.withColumn(
        "fold", F.expr(_bucket_expr(id_col, salt, k)).cast("long")
    )


def temperature_weights(
    df: DataFrame,
    source_col: str,
    token_count: Column,
    alpha: float = 0.5,
    token_budget: float | None = None,
) -> DataFrame:
    """Temperature-based mixture weighting: per-source sampling weight
    ``p_s = n_s^alpha / sum_j n_j^alpha`` over token counts — the
    standard multilingual/multi-source rebalancing rule (alpha=1 keeps
    natural proportions, alpha->0 approaches uniform; published as the
    temperature trick in the multilingual-NMT and LLM data-mixture
    literature). With ``token_budget`` set, also emits the resulting
    per-source ``sample_rate = min(1, p_s * budget / n_s)`` ready to
    feed :func:`mixture_sample`-style deterministic hash membership.

    Plan: ONE partial-aggregated groupBy to per-source token totals
    (source-cardinality rows), then the normalization is a broadcast of
    one scalar — nothing wide ever touches the corpus. Float
    discipline: token sums are exact longs; pow/divide are fixed double
    expressions over identical inputs, so engines agree bit-for-bit.

    Output: (source, n_tokens, weight double rounded 6[, sample_rate
    double rounded 6]).
    """
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    totals = (
        df.withColumn("__tok", token_count.cast("long"))
        .groupBy(source_col)
        .agg(F.sum("__tok").alias("n_tokens"))
    )
    a = float(alpha)
    # quantize n^alpha to DECIMAL before the denominator sum: the sum
    # becomes exact (order-independent), so engines agree bit-for-bit
    # however the partial aggregates combine
    powed = totals.withColumn(
        "__pw",
        F.pow(F.col("n_tokens").cast("double"), F.lit(a)).cast("decimal(28,10)"),
    )
    denom = powed.agg(F.sum("__pw").alias("__denom"))
    joined = powed.crossJoin(F.broadcast(denom))
    weight = F.col("__pw").cast("double") / F.col("__denom").cast("double")
    cols = [
        F.col(source_col),
        F.col("n_tokens"),
        F.round(weight, 6).alias("weight"),
    ]
    if token_budget is not None:
        if token_budget <= 0:
            raise ValueError(f"token_budget must be positive, got {token_budget}")
        cols.append(
            F.round(
                F.least(
                    F.lit(1.0),
                    weight
                    * F.lit(float(token_budget))
                    / F.col("n_tokens").cast("double"),
                ),
                6,
            ).alias("sample_rate")
        )
    return joined.select(*cols)


def token_budget_plan(
    df: DataFrame,
    text_col: str,
    source_col: str,
    budget_tokens: int,
) -> DataFrame:
    """Mixture planning: given a total token budget split evenly across
    sources, compute each source's sampling rate — the "how much of
    each source do we take to hit N tokens at these weights" arithmetic
    every corpus-mixture run starts from (the execution side is
    :func:`mixture_sample` / :func:`source_token_quota`). Output per
    source: (source, n_docs, n_tokens, weight, sample_rate,
    expected_tokens); rates cap at 1.0 (a source cannot over-deliver
    without upsampling, which is a curriculum decision, not a planning
    default).

    Scale shape: ONE corpus pass (token count inlined into the scan,
    partial-aggregated groupBy whose key space is the source list),
    then pure column arithmetic against the broadcast 1-row source
    count. The plan output is catalog-sized; nothing returns to the
    driver.
    """
    if budget_tokens < 1:
        raise ValueError(f"budget_tokens must be >= 1, got {budget_tokens}")
    n_tok = F.expr(
        f"size(filter(split(lower({text_col}), '\\\\s+'), t -> t <> ''))"
    )
    st = (
        df.select(F.col(source_col).alias("source"), n_tok.alias("__t"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("__t").cast("long").alias("n_tokens"),
        )
    )
    k = st.agg(F.count(F.lit(1)).alias("__ns"))
    rate = F.least(
        F.lit(1.0),
        F.round(
            F.lit(float(budget_tokens))
            * (F.lit(1.0) / F.col("__ns"))
            / F.col("n_tokens"),
            6,
        ),
    )
    return (
        st.crossJoin(F.broadcast(k))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.round(F.lit(1.0) / F.col("__ns"), 6).alias("weight"),
            rate.alias("sample_rate"),
            F.round(F.col("n_tokens") * rate, 0)
            .cast("long")
            .alias("expected_tokens"),
        )
    )


def epoch_allocation(
    df: DataFrame,
    text_col: str,
    source_col: str,
    budget_tokens: int,
    max_epochs: float = 4.0,
) -> DataFrame:
    """Data-constrained epoch planning (Muennighoff et al. 2022,
    "Scaling Data-Constrained Language Models", public): when the
    training budget exceeds a source's unique tokens, the source is
    REPEATED — but repetition stops paying off after ~4 epochs, so the
    plan caps epochs and reports the shortfall the mixture must
    reallocate. Per source (equal weights): target = budget / n_sources,
    epochs_needed = target / unique_tokens, epochs = min(needed,
    max_epochs), effective_tokens = unique_tokens * epochs, shortfall =
    target - effective for capped sources.

    Scale shape: identical to :func:`token_budget_plan` — ONE corpus
    pass (token count inlined into the scan, partial-aggregated groupBy
    over the source list), then column arithmetic against the broadcast
    1-row source count. Catalog-sized output.
    """
    if budget_tokens < 1:
        raise ValueError(f"budget_tokens must be >= 1, got {budget_tokens}")
    if max_epochs <= 0:
        raise ValueError(f"max_epochs must be > 0, got {max_epochs}")
    n_tok = F.expr(
        f"size(filter(split(lower({text_col}), '\\\\s+'), t -> t <> ''))"
    )
    st = (
        df.select(F.col(source_col).alias("source"), n_tok.alias("__t"))
        .groupBy("source")
        .agg(F.sum("__t").cast("long").alias("unique_tokens"))
    )
    k = st.agg(F.count(F.lit(1)).alias("__ns"))
    target = F.round(F.lit(float(budget_tokens)) / F.col("__ns"), 6)
    needed = F.round(target / F.col("unique_tokens"), 6)
    epochs = F.least(needed, F.lit(float(max_epochs)))
    effective = F.round(F.col("unique_tokens") * epochs, 0).cast("long")
    return (
        st.crossJoin(F.broadcast(k))
        .select(
            "source",
            "unique_tokens",
            target.alias("target_tokens"),
            needed.alias("epochs_needed"),
            F.round(epochs, 6).alias("epochs"),
            (needed > F.lit(float(max_epochs))).alias("capped"),
            effective.alias("effective_tokens"),
            F.greatest(
                F.round(target - effective, 0).cast("long"), F.lit(0).cast("long")
            ).alias("shortfall"),
        )
    )


def stratified_shards(
    df: DataFrame,
    source_col: str,
    id_col: str,
    nshards: int = 8,
    salt: str = "shard",
) -> DataFrame:
    """Source-stratified shard assignment + balance audit: docs are
    round-robined into ``nshards`` shards WITHIN each source (visit
    order = the deterministic md5 bucket, so the layout is
    retry/engine-stable), which guarantees every shard sees each
    source's count within 1 of even — the training-shard layout rule
    that stops a data-parallel epoch from feeding one worker a
    single-domain shard. Output per shard: (shard, n_docs, n_sources,
    max_source_docs) — the balance numbers a layout review reads.

    Scale shape: one per-source rank window (same bounded-sort caveat
    and shard-salting escape as :func:`source_token_quota`), then two
    partial aggregates whose key spaces are nshards x sources and
    nshards. Nothing driver-side.
    """
    if nshards <= 0:
        raise ValueError(f"nshards must be positive, got {nshards}")
    w = Window.partitionBy(source_col).orderBy(
        F.expr(_bucket_expr(id_col, salt)), F.col(id_col)
    )
    assigned = df.select(
        F.col(source_col).alias("source"),
        ((F.row_number().over(w) - 1) % nshards).cast("long").alias("shard"),
    )
    per_pair = assigned.groupBy("shard", "source").agg(
        F.count(F.lit(1)).cast("long").alias("__n")
    )
    return (
        per_pair.groupBy("shard")
        .agg(
            F.sum("__n").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_sources"),
            F.max("__n").cast("long").alias("max_source_docs"),
        )
    )


def anneal_schedule(
    df: DataFrame,
    text_col: str,
    source_col: str,
    budget_tokens: int = 100_000,
    anneal_frac: float = 0.2,
    quality_floor: float = 0.5,
) -> DataFrame:
    """Two-phase data-schedule planner (the mid-training anneal:
    warmup-stable-decay runs with a final phase upweighting
    high-quality data — MiniCPM / Llama-3 style, public): phase 1
    spends ``(1 - anneal_frac)`` of the token budget proportionally to
    each source's RAW token mass; phase 2 (the anneal) spends the rest
    proportionally to each source's HIGH-QUALITY token mass (docs whose
    heuristic quality score >= ``quality_floor``), so quality-dense
    sources get upweighted exactly when the learning rate decays.

    Output per source: raw/high-quality token totals, both phase
    allocations, and ``p2_epochs`` — how many passes over its
    high-quality slice the anneal implies (the repeat factor a
    mixture-weight reviewer sanity-checks against Muennighoff-style
    repeat limits, cf. :func:`epoch_allocation`).

    Integer-exact by construction: token counts are integers, both
    allocations are floor(budget * share) of int64 ratios, and the
    only doubles are final ratios of those integers (round 6). Scale
    shape: ONE corpus scan (token count + quality score in the same
    projection) -> |sources|-row aggregate -> catalog-sized arithmetic
    with the two totals broadcast as a single row. Nothing driver-side.
    """
    from .text import quality_exprs

    if not 0 < anneal_frac < 1:
        raise ValueError(f"anneal_frac must be in (0,1), got {anneal_frac}")
    toks = f"size(filter(split(lower({text_col}), '\\\\s+'), t -> t <> ''))"
    q = quality_exprs(text_col)["score"]
    per_source = (
        df.select(
            F.col(source_col).alias("source"),
            F.expr(toks).cast("long").alias("__t"),
            F.round(F.expr(q), 6).alias("__q"),
        )
        .groupBy("source")
        .agg(
            F.sum("__t").cast("long").alias("tokens"),
            F.sum(
                F.when(F.col("__q") >= quality_floor, F.col("__t")).otherwise(
                    F.lit(0)
                )
            )
            .cast("long")
            .alias("hq_tokens"),
        )
    )
    totals = per_source.agg(
        F.sum("tokens").alias("__tot"), F.sum("hq_tokens").alias("__hq_tot")
    )
    p1_budget = float(budget_tokens) * (1.0 - anneal_frac)
    p2_budget = float(budget_tokens) * anneal_frac
    p1 = F.floor(F.lit(p1_budget) * F.col("tokens") / F.col("__tot"))
    p2 = F.floor(
        F.lit(p2_budget)
        * F.col("hq_tokens")
        / F.expr("nullif(__hq_tot, 0)")
    )
    return per_source.crossJoin(F.broadcast(totals)).select(
        "source",
        "tokens",
        "hq_tokens",
        p1.cast("long").alias("p1_tokens"),
        F.coalesce(p2, F.lit(0)).cast("long").alias("p2_tokens"),
        F.round(
            F.coalesce(p2, F.lit(0)) / F.expr("nullif(hq_tokens, 0)"), 6
        ).alias("p2_epochs"),
    )


def quality_token_quota(
    df: DataFrame,
    source_col: str,
    id_col: str,
    token_count: Column,
    score_col: str,
    quota_tokens: int,
    nshards: int = 1,
    salt: str = "qquota",
) -> DataFrame:
    """Per-source token budget filled BEST-FIRST by a quality score —
    the curation refinement of :func:`source_token_quota`: instead of
    an unbiased hash-order sample, each source spends its budget on
    its highest-quality documents (score desc, id tiebreak), the
    standard quality-weighted mixture recipe.

    Same shard mechanics and prefix semantics as
    :func:`source_token_quota`: with ``nshards > 1`` the quota splits
    evenly across md5 hash shards and each shard takes ITS
    quality-ordered prefix — the window sort stays shard-bounded (a
    single source can be 40% of a 100 TB corpus; its shards are
    quota-sized), at the cost of selecting the per-shard rather than
    per-source global top (the kept set differs from the exact greedy
    by at most the quality boundary of each shard — documented
    trade). Scores round to 6 digits before ordering so the prefix is
    engine-portable.

    Returns the surviving rows with ``n_tokens`` attached.
    """
    if quota_tokens <= 0:
        raise ValueError(f"quota_tokens must be positive, got {quota_tokens}")
    if nshards <= 0:
        raise ValueError(f"nshards must be positive, got {nshards}")
    per_shard = quota_tokens // nshards
    with_tok = (
        df.withColumn("n_tokens", token_count.cast("long"))
        .withColumn("__b", F.expr(_bucket_expr(id_col, salt)))
        .withColumn("__q", F.round(F.col(score_col).cast("double"), 6))
    )
    w = (
        Window.partitionBy(F.col(source_col), F.col("__b") % F.lit(nshards))
        .orderBy(F.desc("__q"), F.asc(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return (
        with_tok.withColumn("__cum", cum_before)
        .where(F.col("__cum") + F.col("n_tokens") <= F.lit(per_shard))
        .drop("__b", "__cum", "__q")
    )
