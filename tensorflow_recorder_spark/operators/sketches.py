"""Deterministic streaming sketches (E3/E4 extension): count-min heavy
hitters and HyperLogLog distinct counting.

At 100 TB, exact per-key state for "which values are hot" and "how many
distinct users" is itself a shuffle problem; the production answer is a
BOUNDED sketch built with one partial-aggregated pass. Spark ships
approx_count_distinct (HLL++) and stat.countMinSketch, but their
merge-order-dependent internals cannot be replayed by another engine —
these implementations use md5-derived hash functions instead, so the
sketch contents (not just the trend) are bit-reproducible and the DuckDB
oracle can rebuild them exactly. The accuracy/width trade-offs are the
published ones (Cormode & Muthukrishnan 2005 for CMS; Flajolet et al.
2007 for HLL).

The reference has no sketch surface at all (its analytics stop at the
split histogram, SURVEY.md §2.5); these are extension operators for the
telemetry/curation side of a training-data pipeline.

Scale notes: both sketches reduce to a groupBy over a KEY SPACE THAT IS
THE SKETCH (d*w cells / m registers), not the data — partial aggregation
does almost all the work map-side, the shuffle moves kilobytes, and the
fitted sketch is a broadcastable table. Nothing here holds per-key
state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _bucket_expr(key_expr: str, salt: int, width: int) -> str:
    """Deterministic hash bucket: first 8 hex chars of md5('<salt>:'||key)
    mod width — the same construction both engines evaluate identically
    (matches the split-derivation hash in operators/split.py)."""
    return (
        f"cast(conv(substring(md5(concat('{salt}:', {key_expr})), 1, 8), 16, 10) "
        f"as bigint) % {width}"
    )


def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
    weight_col: str | None = None,
) -> DataFrame:
    """Build a count-min sketch over ``key_col``: ``depth`` independent
    hash rows x ``width`` buckets, cell = sum of weights (1 per row when
    ``weight_col`` is None). Output: (row_id, bucket, cell_count) —
    at most depth*width rows regardless of input size.

    One explode (depth rows per input row, a narrow map) + one
    partial-aggregated groupBy on (row_id, bucket): the combine runs
    map-side into at most depth*width cells per task, so the shuffle
    carries the sketch, not the data.
    """
    if depth < 1 or width < 1:
        raise ValueError(f"depth/width must be >= 1, got {depth}/{width}")
    weight = f"cast({weight_col} as long)" if weight_col else "1L"
    rows = df.select(
        F.explode(
            F.expr(
                "array("
                + ", ".join(
                    f"struct({d}L as row_id, "
                    f"{_bucket_expr(key_col, d, width)} as bucket, "
                    f"{weight} as w)"
                    for d in range(depth)
                )
                + ")"
            )
        ).alias("c")
    ).select("c.row_id", "c.bucket", "c.w")
    return rows.groupBy("row_id", "bucket").agg(
        F.sum("w").cast("long").alias("cell_count")
    )


def cms_heavy_hitters(
    df: DataFrame,
    key_col: str,
    threshold: int,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Keys whose count-min ESTIMATE (min over depth cells) reaches
    ``threshold``. Output: (key, est_count) with est_count >= the true
    count (one-sided CMS error).

    The sketch is depth*width cells -> broadcast; the candidate pass is
    the distinct keys joined against it map-side (each key probes its
    depth buckets). The distinct() is the only data-sized shuffle and is
    exactly the one any exact heavy-hitter query would pay — the win is
    that per-key counting state is O(sketch), not O(keys).
    """
    sketch = cms_build(df, key_col, depth=depth, width=width)
    keys = df.select(F.col(key_col).alias("key")).distinct()
    probes = keys.select(
        "key",
        F.explode(
            F.expr(
                "array("
                + ", ".join(
                    f"struct({d}L as row_id, {_bucket_expr('key', d, width)} as bucket)"
                    for d in range(depth)
                )
                + ")"
            )
        ).alias("p"),
    ).select("key", "p.row_id", "p.bucket")
    est = (
        probes.join(F.broadcast(sketch), ["row_id", "bucket"])
        .groupBy("key")
        .agg(F.min("cell_count").cast("long").alias("est_count"))
    )
    return est.where(F.col("est_count") >= threshold)


def hll_distinct(
    df: DataFrame,
    key_col: str,
    b: int = 10,
) -> DataFrame:
    """Deterministic HyperLogLog distinct-count estimate of ``key_col``
    with m = 2**b registers. Output: one row
    (n_distinct_est bigint, n_registers bigint, n_zero_registers bigint).

    Register index = first ``b`` bits of md5(key); rho = leading-zero
    count of the next 32 hash bits + 1; register = max(rho). The whole
    pass is ONE groupBy over at most m register ids (map-side combined),
    then a single-row driver-free aggregate — the canonical distributed
    distinct count when exact countDistinct's shuffle is the bottleneck.
    Raw Flajolet estimate with the standard small-range (linear
    counting) correction; both branches are exact integer/double
    expressions an oracle can replay.
    """
    registers = hll_registers(df, key_col, b)
    return hll_estimate(registers, b)


def hll_register_exprs(key_col: str, b: int) -> tuple[str, str]:
    """(register-id expr, rho expr) for the deterministic HLL hash —
    shared by the batch operator and the streaming variant
    (streaming/windows.py), so both build the SAME sketch."""
    if not 4 <= b <= 16:
        raise ValueError(f"b must be in [4, 16], got {b}")
    m = 1 << b
    # 12 hex chars = 48 bits: top b for the register, next 32 for rho.
    h48 = f"cast(conv(substring(md5(concat(':', {key_col})), 1, 12), 16, 10) as bigint)"
    reg = f"cast({h48} div 4294967296 as bigint) % {m}"
    tail = f"{h48} % 4294967296"
    # rho = 33 - bit_length(tail); conv(_, 10, 2) emits no leading zeros,
    # so its length IS the bit length (exact integer arithmetic — no
    # cross-engine log2 rounding to worry about)
    rho = (
        f"cast(CASE WHEN {tail} = 0 THEN 33 "
        f"ELSE 33 - length(conv({tail}, 10, 2)) END as int)"
    )
    return reg, rho


def hll_registers(df: DataFrame, key_col: str, b: int = 10) -> DataFrame:
    """The HLL sketch itself: (reg, max_rho), at most 2**b rows. This is
    the mergeable/storable form — union sketches of two datasets and
    re-max to combine them."""
    reg, rho = hll_register_exprs(key_col, b)
    return (
        df.select(F.expr(reg).alias("reg"), F.expr(rho).alias("rho"))
        .groupBy("reg")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_estimate(registers: DataFrame, b: int) -> DataFrame:
    """Finalize a register sketch into the single-row estimate (see
    :func:`hll_distinct` for the output contract)."""
    m = 1 << b
    alpha = 0.7213 / (1.0 + 1.079 / m)
    agg = registers.agg(
        F.sum(F.expr("pow(cast(2 as double), -max_rho)")).alias("inv_sum"),
        F.count(F.lit(1)).alias("n_nonzero"),
    )
    return agg.select(
        F.expr(
            # registers never observed contribute 2^0 = 1 each
            f"round({alpha} * {m} * {m} / (inv_sum + ({m} - n_nonzero)), 4)"
        ).alias("raw_est"),
        (F.lit(m) - F.col("n_nonzero")).cast("long").alias("n_zero_registers"),
    ).select(
        F.expr(
            # small-range correction: linear counting when raw <= 2.5m
            # and empty registers remain
            f"cast(round(CASE WHEN raw_est <= {2.5 * m} AND n_zero_registers > 0 "
            f"THEN {m} * ln(cast({m} as double) / n_zero_registers) "
            f"ELSE raw_est END) as bigint)"
        ).alias("n_distinct_est"),
        F.lit(m).cast("long").alias("n_registers"),
        F.col("n_zero_registers"),
    )


def bloom_build(
    df: DataFrame,
    key_col: str,
    m_bits: int = 1 << 20,
    k_hashes: int = 4,
) -> DataFrame:
    """Build a Bloom filter over ``key_col`` as its SET-BIT POSITION
    table: (pos) rows, at most min(m_bits, k*|keys|) of them — the
    relational form of the bitset, built with one explode + distinct
    (partial-aggregated; the shuffle carries positions, not keys).
    md5-derived positions (same ``_bucket_expr`` family as CMS), so the
    filter is bit-reproducible across engines and mergeable by UNION.
    """
    if m_bits < 1 or k_hashes < 1:
        raise ValueError(f"m_bits/k_hashes must be >= 1, got {m_bits}/{k_hashes}")
    return (
        df.select(
            F.explode(
                F.expr(
                    "array("
                    + ", ".join(
                        _bucket_expr(key_col, 1000 + d, m_bits)
                        for d in range(k_hashes)
                    )
                    + ")"
                )
            ).alias("pos")
        )
        .distinct()
    )


def bloom_probe(
    batch: DataFrame,
    bloom: DataFrame,
    key_col: str,
    m_bits: int = 1 << 20,
    k_hashes: int = 4,
) -> DataFrame:
    """Probe a Bloom position table: keys whose k positions are ALL set
    — possible members (no false negatives; false-positive rate the
    published (1-e^{-kn/m})^k). Output: (key, maybe_member boolean).

    The classic dedup-ingest pre-filter: a new batch is probed against
    the index corpus's filter and only bloom-positive rows continue to
    the expensive LSH/verify path. The position table is at most m_bits
    rows (a few MB) -> broadcast; probing is a map-side join + one
    batch-keyed aggregate, so the pre-filter never shuffles the batch
    payload.
    """
    if m_bits < 1 or k_hashes < 1:
        raise ValueError(f"m_bits/k_hashes must be >= 1, got {m_bits}/{k_hashes}")
    # distinct (key, pos): duplicate keys in the batch and intra-key
    # hash collisions must not skew the all-positions-set check, so the
    # membership test compares matched positions against the key's own
    # DISTINCT position count, not against k.
    probes = batch.select(
        F.col(key_col).alias("key"),
        F.explode(
            F.expr(
                "array("
                + ", ".join(
                    _bucket_expr(key_col, 1000 + d, m_bits) for d in range(k_hashes)
                )
                + ")"
            )
        ).alias("pos"),
    ).distinct()
    hit = F.broadcast(bloom.select("pos", F.lit(1).alias("__set")))
    return (
        probes.join(hit, "pos", "left")
        .groupBy("key")
        .agg((F.count("__set") == F.count(F.lit(1))).alias("maybe_member"))
    )


def hll_rolling_distinct(
    df: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    window_days: int = 3,
    b: int = 10,
) -> DataFrame:
    """Rolling N-day distinct-key estimate per day — the sketch-algebra
    win HLL exists for: ONE pass builds per-day register sketches
    (days x 2^b rows), and every rolling window is a MERGE of stored
    sketches (max over registers), not a re-scan of the data. An exact
    rolling countDistinct would re-shuffle the corpus once per window;
    this reshuffles sketch rows only.

    Output: (day string yyyy-MM-dd, n_distinct_est bigint) for each day
    with >= 1 event, estimating distincts over [day - window_days + 1,
    day]. Same estimator/correction as :func:`hll_distinct`.
    """
    if window_days < 1:
        raise ValueError(f"window_days must be >= 1, got {window_days}")
    from .events import normalize_event_time

    df = normalize_event_time(df, ts_col)
    reg, rho = hll_register_exprs(key_col, b)
    daily = (
        df.select(
            F.to_date(ts_col).alias("day"),
            F.expr(reg).alias("reg"),
            F.expr(rho).alias("rho"),
        )
        .groupBy("day", "reg")
        .agg(F.max("rho").alias("max_rho"))
    )
    # each daily register row feeds the windows ending on day..day+N-1;
    # restrict to windows whose END day actually has events
    active_days = daily.select("day").distinct().withColumnRenamed("day", "wday")
    contrib = daily.select(
        F.explode(
            F.expr(f"sequence(day, date_add(day, {window_days - 1}))")
        ).alias("wday"),
        "reg",
        "max_rho",
    ).join(F.broadcast(active_days), "wday")
    merged = contrib.groupBy("wday", "reg").agg(F.max("max_rho").alias("max_rho"))
    m = 1 << b
    alpha = 0.7213 / (1.0 + 1.079 / m)
    agg = merged.groupBy("wday").agg(
        F.sum(F.expr("pow(cast(2 as double), -max_rho)")).alias("inv_sum"),
        F.count(F.lit(1)).alias("n_nonzero"),
    )
    return agg.select(
        F.date_format("wday", "yyyy-MM-dd").alias("day"),
        F.expr(
            f"round({alpha} * {m} * {m} / (inv_sum + ({m} - n_nonzero)), 4)"
        ).alias("raw_est"),
        (F.lit(m) - F.col("n_nonzero")).alias("n_zero"),
    ).select(
        "day",
        F.expr(
            f"cast(round(CASE WHEN raw_est <= {2.5 * m} AND n_zero > 0 "
            f"THEN {m} * ln(cast({m} as double) / n_zero) "
            f"ELSE raw_est END) as bigint)"
        ).alias("n_distinct_est"),
    )


# ---------------------------------------------------------- histograms


def value_histogram(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lo: float,
    hi: float,
    bins: int,
) -> DataFrame:
    """Fixed-bin value histogram per group — the MERGEABLE quantile
    sketch: bin = clamp(floor((v - lo) / width), 0, bins - 1). Output:
    (*group_cols, bin, cnt).

    This is the production approx-quantile shape at 100 TB: per-group
    state is at most ``bins`` counters, the groupBy partial-aggregates
    map-side so the shuffle moves (groups x bins) rows regardless of
    data size, and two histograms MERGE by adding counts — so it works
    unchanged as a Structured Streaming aggregation (the state store
    holds the same bounded counters; percentile/percentile_approx are
    not available there). Out-of-range values clamp into the edge bins;
    pick (lo, hi) from domain knowledge or a prior ``rel_profile`` run.
    """
    if bins < 1:
        raise ValueError(f"bins must be >= 1, got {bins}")
    if not hi > lo:
        raise ValueError(f"need hi > lo, got ({lo}, {hi})")
    width = (hi - lo) / bins
    bin_expr = F.least(
        F.greatest(
            F.floor((F.col(value_col) - F.lit(float(lo))) / F.lit(width)),
            F.lit(0),
        ),
        F.lit(bins - 1),
    ).cast("long")
    return (
        df.select(*group_cols, bin_expr.alias("bin"))
        .groupBy(*group_cols, "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def histogram_quantiles(
    counts: DataFrame,
    group_cols: list[str],
    lo: float,
    hi: float,
    bins: int,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Finalize :func:`value_histogram` counts to interpolated quantile
    estimates. Output: (*group_cols, n, p<q>_est ...), one column per
    requested quantile (0.5 -> p50_est).

    For each q: target = q * n; the estimate sits in the first bin
    whose cumulative count reaches the target, linearly interpolated
    within the bin. All post-histogram work is over the bounded
    (groups x bins) frame: one cumulative window, one bounded
    min_by aggregate per (group, q). Shared verbatim by the batch
    query and the drained streaming twin — sketch algebra makes the
    two paths value-identical.
    """
    from pyspark.sql import Window

    width = (hi - lo) / bins
    w = Window.partitionBy(*group_cols).orderBy("bin")
    cum = counts.withColumn("cum", F.sum("cnt").over(w))
    tot = counts.groupBy(*group_cols).agg(F.sum("cnt").alias("n"))
    # the totals side re-reads the same source as `cum` (for a drained
    # streaming sink that is a literal self-join of one memory view, which
    # Spark's analyzer rejects with conflicting attributes) — rename the
    # join keys so the two sides share no attribute ids
    qf = tot.select(
        *[F.col(c).alias(f"__g_{c}") for c in group_cols],
        "n",
        F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q"),
    ).withColumn("target", F.col("q") * F.col("n"))
    sel = (
        cum.join(
            qf,
            [F.col(c).eqNullSafe(F.col(f"__g_{c}")) for c in group_cols],
        )
        .drop(*[f"__g_{c}" for c in group_cols])
        .where(F.col("cum") >= F.col("target"))
        .groupBy(*group_cols, "q", "n", "target")
        .agg(F.min_by(F.struct("bin", "cnt", "cum"), "bin").alias("s"))
        .select(
            *group_cols,
            "q",
            "n",
            F.round(
                F.lit(float(lo))
                + F.lit(width)
                * (
                    F.col("s.bin")
                    + (F.col("target") - (F.col("s.cum") - F.col("s.cnt")))
                    / F.col("s.cnt")
                ),
                6,
            ).alias("est"),
        )
    )
    aggs = [
        F.max(F.when(F.col("q") == float(q), F.col("est"))).alias(
            "p{:g}_est".format(round(q * 100, 4)).replace(".", "_")
        )
        for q in qs
    ]
    return sel.groupBy(*group_cols).agg(
        F.max("n").cast("long").alias("n"), *aggs
    )
