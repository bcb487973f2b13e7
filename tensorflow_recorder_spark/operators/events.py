"""Event-time operators (E4, SURVEY.md §2.9): time-bucket rollups,
sessionization, as-of latest-value.

The reference has no streaming or time semantics at all (SURVEY.md §2.8)
— these are the extension operators a training-data pipeline needs for
event/telemetry tables. Batch formulations here; the streaming variants
(watermarked windows over ``readStream``) live in ``streaming/``.

Scale notes: the rollup is a single partial-aggregated groupBy keyed by
(bucket, type) — low cardinality, no skew risk. Sessionization shuffles
once on user_id and then does per-user ordered scans (lag + running
sum); skewed power-users are handled by AQE skew-split since the window
partition key is the shuffle key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def normalize_event_time(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Normalize the event-time column to TIMESTAMP (LTZ) regardless of
    input flavor, so downstream numeric arithmetic (``cast("long")`` /
    ``cast("double")``) is legal:

    * ``timestamp``      — passthrough.
    * ``timestamp_ntz``  — parquet TIMESTAMP(isAdjustedToUTC=false) infers
      NTZ, which Spark refuses to cast to numerics; under a UTC session
      timezone the LTZ cast is value-identical.
    * ``bigint``         — epoch NANOSECONDS as long (what
      ``spark.sql.legacy.parquet.nanosAsLong`` yields for
      TIMESTAMP(NANOS) parquet), truncated to micros.
    * ``date``/``string`` — cast through timestamp.

    Every E4 operator calls this at entry, so the operators accept any
    flavor the storage layer produces (the driver's testdata has shipped
    all three at different times).
    """
    dt = dict(df.dtypes).get(ts_col)
    if dt == "timestamp" or dt is None:
        return df
    if dt == "timestamp_ntz":
        return df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if dt == "bigint":
        return df.withColumn(
            ts_col, F.expr(f"timestamp_micros(`{ts_col}` div 1000)")
        )
    return df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))


def hourly_rollup(df: DataFrame, ts_col: str = "ts", type_col: str = "event_type") -> DataFrame:
    """Tumbling 1-hour rollup: count + value stats per (hour, type).

    Uses ``date_trunc`` (not ``F.window``) so the bucket is a plain
    timestamp column — identical semantics, friendlier to downstream
    joins and to the SQL oracle. Output hour is formatted as a string
    for engine-portable comparison.
    """
    df = normalize_event_time(df, ts_col)
    return (
        df.groupBy(
            F.date_format(F.date_trunc("hour", F.col(ts_col)), "yyyy-MM-dd HH:mm:ss").alias(
                "hour"
            ),
            F.col(type_col).alias("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
    )


def sliding_rollup(
    df: DataFrame,
    window: str = "1 hour",
    slide: str = "15 minutes",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Sliding-window rollup: count + value sum per (window start, type)
    for hopping windows of ``window`` every ``slide``.

    ``F.window`` expands each event into window/slide assignments
    (epoch-aligned, same convention as Structured Streaming), then one
    partial-aggregated groupBy — the fan-out is window/slide rows per
    event before map-side combine collapses them to bucket cardinality.
    The streaming twin (watermarked) is ``streaming/windows.py``.
    """
    df = normalize_event_time(df, ts_col)
    win = F.window(F.col(ts_col), window, slide)
    return df.groupBy(
        F.date_format(win.start, "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        F.col(type_col).alias("event_type"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the gap since
    the user's previous event exceeds ``gap_minutes``.

    Classic lag + cumulative-sum-of-boundaries double window. Output:
    one row per session with bounds and size.
    """
    df = normalize_event_time(df, ts_col)
    gap_s = gap_minutes * 60
    w_user = Window.partitionBy(user_col).orderBy(F.col(ts_col), "event_id")
    with_gap = df.withColumn(
        "__new_session",
        F.when(
            F.col(ts_col).cast("long")
            - F.lag(F.col(ts_col).cast("long")).over(w_user)
            > gap_s,
            1,
        )
        .otherwise(0),
    )
    with_sid = with_gap.withColumn(
        "session_seq",
        F.sum("__new_session").over(
            w_user.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return (
        with_sid.groupBy(F.col(user_col).alias("user_id"), "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.date_format(F.min(ts_col), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.max(ts_col), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            (F.max(F.col(ts_col).cast("long")) - F.min(F.col(ts_col).cast("long"))).alias(
                "duration_s"
            ),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


def write_events_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str = "ts",
    date_col: str = "event_date",
) -> None:
    """Materialize the 100 TB event layout: parquet partitioned by event
    DATE. Time-range queries against the written table read only the
    touched day directories — the scan prune is enforced by the storage
    layout (``PartitionFilters`` on the date column), not by a filter
    the reader may or may not push. The storage half of the same
    pattern as :func:`~..similarity.write_ivf_index` (E4 applied to
    time instead of ANN cells).

    Day granularity is the standard event-lake choice: hour-level
    directories explode the file count (24x directories, small files);
    day directories keep partition count linear in retention while the
    in-day hour rollup stays a cheap in-partition aggregation.
    """
    df = normalize_event_time(df, ts_col)
    (
        df.withColumn(date_col, F.to_date(F.col(ts_col)))
        .write.partitionBy(date_col)
        .mode("overwrite")
        .parquet(path)
    )


def hourly_rollup_pruned(
    index: DataFrame,
    start_date: str,
    end_date: str,
    date_col: str = "event_date",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Hourly rollup over a date-partitioned event table, restricted to
    ``[start_date, end_date]`` (inclusive). The range predicate is on
    the PARTITION column, so it resolves to directory pruning at plan
    time — the scan never opens files outside the window (pinned by a
    plan-regression test)."""
    pruned = index.where(
        (F.col(date_col) >= F.lit(start_date).cast("date"))
        & (F.col(date_col) <= F.lit(end_date).cast("date"))
    )
    return hourly_rollup(pruned, ts_col=ts_col, type_col=type_col)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    right_cols: tuple[str, ...] = ("value",),
    suffix: str = "_asof",
    tolerance_seconds: float | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join with pandas ``merge_asof`` semantics: per key, each
    left row gets one right row by ``direction`` —

    * ``'backward'`` (default): latest right with ``right.ts <= left.ts``
      (the trades/quotes pattern).
    * ``'forward'``: earliest right with ``right.ts >= left.ts``.
    * ``'nearest'``: whichever of the two is closer in time (tie ->
      backward, matching pandas).

    ``tolerance_seconds`` bounds the match distance per direction
    (out-of-tolerance candidates are excluded BEFORE the nearest
    choice, like pandas); misses yield NULLs.

    Physical strategy — union + ordered window, the scalable as-of
    formulation: tag both inputs, union them, and carry right-side
    values across with ``last(ignoreNulls)`` over the preceding frame
    (backward) and/or ``first(ignoreNulls)`` over the following frame
    (forward). ONE shuffle on the join key; the two directions differ
    only in tie-ordering of ``__side``, so nearest costs a second
    in-partition sort, never a second exchange — no per-row range
    probe, no nested-loop join, and skewed keys are one window
    partition (vs the quadratic blow-up a naive range join suffers).
    Right-side columns surface as ``<col><suffix>``; unmatched left
    rows get NULLs.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward/forward/nearest, got {direction!r}")
    left = normalize_event_time(left, ts_col)
    right = normalize_event_time(right, ts_col)
    lcols = left.columns
    tagged_left = left.select(
        *lcols,
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_cols],
        # Reserved alias, NOT __r_{ts_col}: right_cols may legitimately
        # contain the ts column itself (carry the match timestamp out),
        # and the generated __r_{c} alias must not collide with it.
        F.lit(None).cast(right.schema[ts_col].dataType).alias("__asof_match_ts"),
    )
    tagged_right = right.select(
        *[
            F.col(c) if c in (key_col, ts_col) else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
        F.col(ts_col).alias("__asof_match_ts"),
    )
    unioned = tagged_left.unionByName(tagged_right)
    # Backward frame: right rows (side=0) sort BEFORE left at equal ts,
    # so the preceding frame includes them => inclusive <=.
    w_back = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # Forward frame: left rows sort BEFORE right at equal ts (side
    # desc), so the following frame includes equal-ts rights => >=.
    w_fwd = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col), F.desc("__side"))
        .rowsBetween(0, Window.unboundedFollowing)
    )
    want_back = direction in ("backward", "nearest")
    want_fwd = direction in ("forward", "nearest")
    proj = [*lcols, "__side"]
    for c in right_cols:
        if want_back:
            proj.append(
                F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w_back).alias(f"__b_{c}")
            )
        if want_fwd:
            proj.append(
                F.first(F.col(f"__r_{c}"), ignorenulls=True).over(w_fwd).alias(f"__f_{c}")
            )
    if want_back:
        proj.append(
            F.last(F.col("__asof_match_ts"), ignorenulls=True).over(w_back).alias("__asof_b_ts")
        )
    if want_fwd:
        proj.append(
            F.first(F.col("__asof_match_ts"), ignorenulls=True).over(w_fwd).alias("__asof_f_ts")
        )
    carried = unioned.select(*proj)
    out = carried.where(F.col("__side") == 1).drop("__side")

    tol = None if tolerance_seconds is None else float(tolerance_seconds)
    ts_d = F.col(ts_col).cast("double")
    back_dist = ts_d - F.col("__asof_b_ts").cast("double") if want_back else None
    fwd_dist = F.col("__asof_f_ts").cast("double") - ts_d if want_fwd else None
    back_ok = (
        None
        if not want_back
        else (back_dist <= F.lit(tol)) if tol is not None else F.col("__asof_b_ts").isNotNull()
    )
    fwd_ok = (
        None
        if not want_fwd
        else (fwd_dist <= F.lit(tol)) if tol is not None else F.col("__asof_f_ts").isNotNull()
    )

    if direction == "backward":
        picks = [
            F.when(F.coalesce(back_ok, F.lit(False)), F.col(f"__b_{c}")).alias(f"{c}{suffix}")
            for c in right_cols
        ]
    elif direction == "forward":
        picks = [
            F.when(F.coalesce(fwd_ok, F.lit(False)), F.col(f"__f_{c}")).alias(f"{c}{suffix}")
            for c in right_cols
        ]
    else:  # nearest: valid sides only; closer wins; tie -> backward
        bok = F.coalesce(back_ok, F.lit(False))
        fok = F.coalesce(fwd_ok, F.lit(False))
        use_back = bok & (~fok | (back_dist <= fwd_dist))
        picks = [
            F.when(use_back, F.col(f"__b_{c}"))
            .when(fok, F.col(f"__f_{c}"))
            .alias(f"{c}{suffix}")
            for c in right_cols
        ]
    return out.select(*lcols, *picks)


def asof_latest(
    df: DataFrame,
    cutoff: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """As-of join primitive: each user's latest event at or before
    ``cutoff`` (the per-key as-of lookup; a full as-of join composes
    this with a range-bucketed equi-join).

    ``max_by`` keeps it one partial-aggregated groupBy — no window sort.
    Ties on ts break by event_id (max wins) for determinism.
    """
    df = normalize_event_time(df, ts_col)
    filtered = df.where(F.col(ts_col) <= F.lit(cutoff).cast("timestamp"))
    return filtered.groupBy(F.col(user_col).alias("user_id")).agg(
        F.date_format(F.max(ts_col), "yyyy-MM-dd HH:mm:ss").alias("asof_ts"),
        F.max_by(
            F.col(value_col), F.struct(F.col(ts_col), F.col("event_id"))
        ).alias("asof_value"),
        F.max_by(
            F.col("event_type"), F.struct(F.col(ts_col), F.col("event_id"))
        ).alias("asof_type"),
    )


def funnel(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    step_a: str,
    step_b: str,
    max_gap_seconds: int,
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Two-step conversion funnel: per user, how many ``step_a`` events
    were followed by a ``step_b`` event within ``max_gap_seconds``.

    The declarative trap here is an (A, B) self-range-join — per-user
    quadratic on busy users. The scalable form is one window pass: for
    every event, the NEXT ``step_b`` timestamp is a reversed running
    ``min`` over the user's future rows; an A-row converts iff that
    next-B lands inside the gap. One shuffle (by user); window
    partitions are not AQE-splittable, but the per-row window state is
    a single running min, so a hot user costs a sort, not memory.
    Output per ``user_col`` value: ``n_a``, ``n_converted``, and the
    first conversion's A/B timestamps.

    Ties on ts order by ``id_col`` for determinism.
    """
    df = normalize_event_time(df, ts_col)
    w = (
        Window.partitionBy(user_col)
        .orderBy(F.col(ts_col), F.col(id_col))
        .rowsBetween(1, Window.unboundedFollowing)
    )
    next_b = F.min(
        F.when(F.col(type_col) == F.lit(step_b), F.col(ts_col))
    ).over(w)
    marked = df.withColumn("__next_b", next_b).where(
        F.col(type_col) == F.lit(step_a)
    )
    # NULL next-B (no future B at all) must count as not-converted, not
    # poison the sum into NULL
    converted = F.coalesce(
        F.col("__next_b")
        <= F.col(ts_col) + F.expr(f"INTERVAL {int(max_gap_seconds)} SECONDS"),
        F.lit(False),
    )
    return marked.groupBy(F.col(user_col)).agg(
        F.count(F.lit(1)).alias("n_a"),
        F.sum(converted.cast("long")).alias("n_converted"),
        F.date_format(
            F.min(F.when(converted, F.col(ts_col))), "yyyy-MM-dd HH:mm:ss"
        ).alias("first_conv_a_ts"),
        F.date_format(
            F.min(F.when(converted, F.col("__next_b"))), "yyyy-MM-dd HH:mm:ss"
        ).alias("first_conv_b_ts"),
    )


def cohort_retention(
    df: DataFrame,
    user_col: str,
    ts_col: str,
) -> DataFrame:
    """Weekly cohort retention (E4): users are cohorted by the Monday of
    the week of their FIRST event; each (cohort_week, week_offset) cell
    counts the distinct cohort members active in that later week — the
    standard retention triangle behind every product-analytics chart.

    Plan shape at scale: first-seen is one user-keyed partial-aggregated
    min; the events->first-seen join hashes on the SAME user key, so it
    reuses that shuffle's partitioning; the cell aggregate is a
    count-distinct over (cohort, offset, user), which Spark executes as
    a two-phase expand/agg — every stage is key-bounded, nothing global.
    Offsets are computed on week-truncated DATES (both engines truncate
    weeks to Monday), so the day diff is an exact multiple of 7.

    Output: (cohort_week string yyyy-MM-dd, week_offset bigint,
    n_users bigint).
    """
    df = normalize_event_time(df, ts_col)
    first = df.groupBy(user_col).agg(F.min(ts_col).alias("__first_ts"))
    joined = df.join(first, user_col)
    cohort = F.date_trunc("week", F.col("__first_ts")).cast("date")
    week = F.date_trunc("week", F.col(ts_col)).cast("date")
    return (
        joined.select(
            F.col(user_col),
            cohort.alias("__cohort"),
            (F.datediff(week, cohort) / 7).cast("long").alias("week_offset"),
        )
        .groupBy("__cohort", "week_offset")
        .agg(F.countDistinct(user_col).alias("n_users"))
        .select(
            F.date_format("__cohort", "yyyy-MM-dd").alias("cohort_week"),
            F.col("week_offset").cast("long").alias("week_offset"),
            F.col("n_users").cast("long").alias("n_users"),
        )
    )


def gap_fill_daily(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Calendar resampling with gap filling (time-series densification):
    aggregate events to per-key DAILY rows, then materialize every
    calendar day between each key's first and last active day — silent
    days appear explicitly with ``n_events = 0`` / ``sum_value = 0`` and
    a last-observation-carried-forward column (``locf_value`` = the most
    recent active day's daily sum). The dense per-key daily grid is what
    feature stores and forecasting pipelines consume; the raw event
    table has holes wherever a key was idle.

    Plan shape at scale: one partial-aggregated groupBy to daily rows
    (events collapse ~1e4:1 before anything wide happens), a per-key
    min/max span agg reusing the same key partitioning, a
    ``sequence()`` + ``explode`` that fans out only |span-days| rows per
    key (bounded by retention, NOT by event count), and a key+day
    equi-join of two already-key-partitioned sides. The LOCF pass is
    one ordered window over the dense grid — rows per key = span days,
    so the sort is retention-bounded. Nothing touches the driver.

    Daily sums aggregate in DECIMAL so the result is order-independent
    and engine-portable (float summation order would differ between
    engines).

    Output: (key, day string yyyy-MM-dd, n_events, sum_value double,
    locf_value double).
    """
    df = normalize_event_time(df, ts_col)
    daily = (
        df.groupBy(
            F.col(key_col), F.to_date(F.col(ts_col)).alias("__day")
        ).agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum(F.col(value_col).cast("decimal(18,6)")).alias("__sum"),
        )
    )
    span = daily.groupBy(key_col).agg(
        F.min("__day").alias("__d0"), F.max("__day").alias("__d1")
    )
    grid = span.select(
        key_col,
        F.explode(
            F.expr("sequence(__d0, __d1, interval 1 day)")
        ).alias("__day"),
    )
    dense = grid.join(daily, [key_col, "__day"], "left")
    w = (
        Window.partitionBy(key_col)
        .orderBy("__day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return dense.select(
        F.col(key_col),
        F.date_format("__day", "yyyy-MM-dd").alias("day"),
        F.coalesce(F.col("__n"), F.lit(0)).cast("long").alias("n_events"),
        F.round(F.coalesce(F.col("__sum"), F.lit(0)).cast("double"), 6).alias(
            "sum_value"
        ),
        F.round(
            F.last("__sum", ignorenulls=True).over(w).cast("double"), 6
        ).alias("locf_value"),
    )


def rolling_zscore(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    n: int = 20,
    z_threshold: float = 3.0,
    id_col: str = "event_id",
) -> DataFrame:
    """Trailing-window anomaly detection: for each event, the z-score of
    its value against the key's previous ``n`` events (frame
    ``[-n, -1]`` — the current value never contaminates its own
    baseline), flagged when ``|z| > z_threshold``. The standard online
    monitoring primitive (rate spikes, fraud value outliers) in batch
    form; one shuffle on the key, then ordered in-partition frames.

    Engine-portable float discipline: the window only accumulates
    EXACT decimal sums (sum v, sum v^2 — the v^2 product is computed in
    IEEE double first, so both engines square identical bits, then the
    exact decimal sum is order-independent); mean/variance/z are then
    derived with a fixed double expression tree over those exact sums,
    so two engines produce bit-identical doubles. Variance uses the
    sample (n-1) form; windows with < 2 prior events or zero variance
    yield NULL z.

    Output: (id, key, ts string, value, n_prior, z double rounded 6,
    is_anomaly boolean).
    """
    if n < 2:
        raise ValueError(f"n must be >= 2, got {n}")
    df = normalize_event_time(df, ts_col)
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col), F.col(id_col))
        .rowsBetween(-n, -1)
    )
    vdec = F.col(value_col).cast("decimal(18,6)")
    v2dec = (F.col(value_col) * F.col(value_col)).cast("decimal(28,10)")
    base = df.select(
        F.col(id_col),
        F.col(key_col),
        F.col(ts_col),
        F.col(value_col),
        F.count(F.lit(1)).over(w).alias("__np"),
        F.sum(vdec).over(w).cast("double").alias("__s"),
        F.sum(v2dec).over(w).cast("double").alias("__ss"),
    )
    nd = F.col("__np").cast("double")
    mean = F.col("__s") / nd
    var = (F.col("__ss") - F.col("__s") * F.col("__s") / nd) / (nd - F.lit(1.0))
    z = (F.col(value_col) - mean) / F.sqrt(var)
    z_ok = (F.col("__np") >= 2) & (var > 0)
    return base.select(
        F.col(id_col),
        F.col(key_col),
        F.date_format(ts_col, "yyyy-MM-dd HH:mm:ss").alias("ts"),
        F.col(value_col),
        F.col("__np").cast("long").alias("n_prior"),
        F.round(F.when(z_ok, z), 6).alias("z"),
        F.when(z_ok, F.abs(z) > F.lit(float(z_threshold)))
        .otherwise(F.lit(False))
        .alias("is_anomaly"),
    )


def ewma_by_key(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    alpha: float = 0.3,
    id_col: str = "event_id",
) -> DataFrame:
    """Per-key exponentially weighted moving average of ``value_col`` in
    event-time order: s_0 = v_0, s_i = (1-alpha)*s_{i-1} + alpha*v_i;
    one row per key with the final smoothed value — the batch analog of
    a stateful streaming smoother (applyInPandasWithState keeps the
    same recurrence as its per-key state).

    The recurrence is inherently sequential per key, so it runs as a
    ``collect_list`` + higher-order ``aggregate`` fold AFTER one
    key-partitioned shuffle: per-task memory is one key's
    (ts, id, value) triples — the same per-key bound as any ordered
    window (sessionize's sort carries the same rows); nothing is
    quadratic and the driver holds nothing. Both engines fold
    left-to-right over the identically-sorted array, so the float
    trajectory is reproducible to the rounded digit.

    Output: (key, n_events, ewma double rounded 6).
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    df = normalize_event_time(df, ts_col)
    a = float(alpha)
    ordered = (
        df.groupBy(F.col(key_col))
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col(ts_col).alias("t"),
                        F.col(id_col).alias("i"),
                        F.col(value_col).cast("double").alias("v"),
                    )
                )
            ).alias("__evs")
        )
    )
    fold = (
        f"aggregate(slice(__vals, 2, size(__vals) - 1), "
        f"cast(element_at(__vals, 1) as double), "
        f"(acc, x) -> acc * cast({1.0 - a} as double) + x * cast({a} as double))"
    )
    return (
        ordered.select(
            F.col(key_col),
            F.expr("transform(__evs, e -> e.v)").alias("__vals"),
        )
        .select(
            key_col,
            F.expr("size(__vals)").cast("long").alias("n_events"),
            F.round(F.expr(fold), 6).alias("ewma"),
        )
    )


def seasonal_decompose_daily(
    df: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    period: int = 7,
) -> DataFrame:
    """Classical additive seasonal decomposition of the per-group daily
    series: ``daily_value = trend + seasonal + residual`` — the moving-
    average decomposition every forecasting/anomaly pipeline runs
    before modeling (trend = centered ``period``-day rolling mean,
    seasonal = day-of-week mean of the detrended series, residual =
    remainder).

    Pinned engine-portable semantics: events collapse to per-(group,
    day) DAILY SUMS in DECIMAL (exact, order-independent) before
    anything wide; the trend window is ROWS -(period//2)..+(period//2)
    over OBSERVED days (compose with :func:`gap_fill_daily` upstream if
    the calendar has holes) and is NULL unless the frame is full; the
    detrended value quantizes to DECIMAL(18,6) before the day-of-week
    mean so the seasonal average is a single IEEE division over an
    exact sum; residual subtracts the ROUNDED seasonal. Edge days
    (first/last half-window) carry NULL trend/seasonal/residual.

    Plan shape at 100 TB: one partial-aggregated groupBy (~1e4:1
    collapse), one group-keyed window over retention-bounded daily
    rows, one (group x period)-cardinality aggregate broadcast back.
    The raw event table never shuffles.

    Output: (group, day yyyy-MM-dd, dow 0=Sunday, daily_value, trend,
    seasonal, residual — doubles rounded 6).
    """
    if period < 2:
        raise ValueError(f"period must be >= 2, got {period}")
    half = period // 2
    df = normalize_event_time(df, ts_col)
    daily = df.groupBy(
        F.col(group_col), F.to_date(F.col(ts_col)).alias("__day")
    ).agg(F.sum(F.col(value_col).cast("decimal(18,6)")).alias("__sum"))
    w = (
        Window.partitionBy(group_col)
        .orderBy("__day")
        .rowsBetween(-half, half)
    )
    trended = daily.select(
        F.col(group_col),
        F.col("__day"),
        F.col("__sum"),
        F.when(
            F.count(F.lit(1)).over(w) == period,
            F.sum("__sum").over(w).cast("double") / F.lit(float(period)),
        ).alias("__trend"),
    ).withColumn(
        "__dow", (F.dayofweek("__day") - 1).cast("long")
    ).withColumn(
        "__dtr",
        (F.col("__sum").cast("double") - F.col("__trend")).cast("decimal(18,6)"),
    )
    seas = trended.groupBy(group_col, "__dow").agg(
        F.when(
            F.count("__dtr") > 0,
            F.round(
                F.sum("__dtr").cast("double") / F.count("__dtr").cast("double"),
                6,
            ),
        ).alias("__seasonal")
    )
    joined = trended.join(F.broadcast(seas), [group_col, "__dow"], "left")
    return joined.select(
        F.col(group_col),
        F.date_format("__day", "yyyy-MM-dd").alias("day"),
        F.col("__dow").alias("dow"),
        F.round(F.col("__sum").cast("double"), 6).alias("daily_value"),
        F.round("__trend", 6).alias("trend"),
        F.when(F.col("__trend").isNotNull(), F.col("__seasonal")).alias(
            "seasonal"
        ),
        F.when(
            F.col("__trend").isNotNull(),
            F.round(
                F.col("__sum").cast("double")
                - F.col("__trend")
                - F.col("__seasonal"),
                6,
            ),
        ).alias("residual"),
    )


def attribution_join(
    from_df: DataFrame,
    to_df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    horizon_seconds: int = 3600,
) -> DataFrame:
    """Interval attribution join: every ``to_df`` event that lands
    within ``[t, t + horizon]`` of a ``from_df`` event by the same user
    — the click->conversion attribution primitive (all touches within
    the window; feed a min_by downstream for first/last-touch).

    Plan shape: an EQUI-join on the user key with the time range as a
    residual predicate — a plain AQE-skew-splittable hash/sort-merge
    join, never a range-probe cross product; per-key work is bounded by
    a user's events inside the horizon. The same formulation is
    streaming-legal: with watermarks on both sides and this range
    condition, Spark bounds the join state to the horizon (the
    stream-stream join in queries.s13 reuses it verbatim).

    Output: (user, src_id, dst_id, src_ts, dst_ts strings, lag_us
    BIGINT microseconds). Timestamps surface as formatted strings and
    the lag as exact integer micros — engine-portable.
    """
    if horizon_seconds <= 0:
        raise ValueError(f"horizon_seconds must be > 0, got {horizon_seconds}")
    a = normalize_event_time(from_df, ts_col).select(
        F.col(user_col).alias("user"),
        F.col(id_col).alias("src_id"),
        F.col(ts_col).alias("__src_ts"),
    )
    b = normalize_event_time(to_df, ts_col).select(
        F.col(user_col).alias("user"),
        F.col(id_col).alias("dst_id"),
        F.col(ts_col).alias("__dst_ts"),
    )
    joined = a.join(
        b,
        (a["user"] == b["user"])
        & (b["__dst_ts"] >= a["__src_ts"])
        & (
            b["__dst_ts"]
            <= a["__src_ts"] + F.expr(f"INTERVAL {int(horizon_seconds)} SECOND")
        ),
    ).drop(b["user"])
    return joined.select(
        "user",
        "src_id",
        "dst_id",
        F.date_format("__src_ts", "yyyy-MM-dd HH:mm:ss").alias("src_ts"),
        F.date_format("__dst_ts", "yyyy-MM-dd HH:mm:ss").alias("dst_ts"),
        (F.unix_micros("__dst_ts") - F.unix_micros("__src_ts")).alias("lag_us"),
    )


def interarrival_stats(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-user inter-arrival gap profile: mean/median/p95/max gap in
    seconds plus the coefficient of variation (burstiness — CV >> 1 is
    the classic bot/scraper signature, CV ~ 1 Poisson-like). The lag
    window is keyed per user (partition-bounded) and the result is one
    bounded row per user; the event table collapses before anything
    wide happens.

    Output: (user, n_events, mean_gap_s, p50_gap_s, p95_gap_s,
    max_gap_s, burstiness) — gap stats NULL for single-event users.
    """
    df = normalize_event_time(df, ts_col)
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(id_col))
    gapped = df.select(
        F.col(user_col).alias("user"),
        (
            (
                F.unix_micros(F.col(ts_col))
                - F.unix_micros(F.lag(ts_col).over(w))
            )
            / 1e6
        ).alias("gap_s"),
    )
    return gapped.groupBy("user").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.round(F.avg("gap_s"), 4).alias("mean_gap_s"),
        F.round(F.expr("percentile(gap_s, 0.5)"), 4).alias("p50_gap_s"),
        F.round(F.expr("percentile(gap_s, 0.95)"), 4).alias("p95_gap_s"),
        F.round(F.max("gap_s"), 4).alias("max_gap_s"),
        F.round(
            F.stddev_samp("gap_s") / F.expr("nullif(avg(gap_s), 0.0)"), 4
        ).alias("burstiness"),
    )


def transition_matrix(
    df: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next type | current type), the session-modeling /
    funnel-discovery staple. Adjacent pairs come from one lag window
    keyed per user (partition-bounded); counts and row totals are
    partial-agg groupBys bounded by type-cardinality², and the
    normalizing join broadcasts the per-from-type totals — the event
    table collapses ~1e4:1 before anything wide.

    Output: (from_type, to_type, n BIGINT, p DOUBLE rounded 6).
    """
    df = normalize_event_time(df, ts_col)
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(id_col))
    pairs = df.select(
        F.lag(type_col).over(w).alias("from_type"),
        F.col(type_col).alias("to_type"),
    ).where(F.col("from_type").isNotNull())
    # counts feeds both the totals aggregate and the normalizing join;
    # without a cut Spark evaluates the full-corpus lag window twice
    # (r5 review finding). The checkpointed frame is type-cardinality²
    # rows — trivially small.
    counts = (
        pairs.groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .localCheckpoint(eager=True)
    )
    totals = counts.groupBy("from_type").agg(F.sum("n").alias("__tot"))
    return (
        counts.join(F.broadcast(totals), "from_type")
        .select(
            "from_type",
            "to_type",
            "n",
            F.round(F.col("n") / F.col("__tot"), 6).alias("p"),
        )
    )


def daily_type_counts(
    df: DataFrame, ts_col: str = "ts", type_col: str = "event_type"
) -> DataFrame:
    """Per-(day, type) event counts — the bounded aggregate both the
    batch trend detector and its streaming twin rank over. One
    partial-aggregated groupBy; the raw event table collapses ~1e4:1
    before anything wide happens."""
    df = normalize_event_time(df, ts_col)
    return df.groupBy(
        F.date_format(F.to_date(ts_col), "yyyy-MM-dd").alias("day"),
        F.col(type_col).alias("event_type"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n_events"))


def trend_slope(
    daily: DataFrame,
    day_col: str = "day",
    type_col: str = "event_type",
    n_col: str = "n_events",
) -> DataFrame:
    """Per-type LINEAR trend: closed-form OLS slope/intercept of daily
    volume over the day index — the "is this stream growing and how
    fast" number next to :func:`trend_ranks`' ordinal view. Runs over
    the (day x type) aggregate (retention x type-cardinality rows,
    bounded regardless of event volume); the regression moments are
    one partial-agg groupBy of EXACT integer sums (day index x counts
    fit comfortably in BIGINT), so the only floating point is the
    final division — engine-exact after rounding.

    Output: (event_type, n_days, slope DOUBLE, intercept DOUBLE),
    slope in events/day; single-day types release NULL slope
    (denominator 0).
    """
    x = F.datediff(F.to_date(day_col), F.lit("1970-01-01").cast("date")).cast(
        "long"
    )
    y = F.col(n_col).cast("long")
    m = daily.groupBy(F.col(type_col).alias("event_type")).agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum(x).alias("__sx"),
        F.sum(y).alias("__sy"),
        F.sum(x * y).alias("__sxy"),
        F.sum(x * x).alias("__sxx"),
    )
    denom = F.col("__n") * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    slope = (
        F.col("__n") * F.col("__sxy") - F.col("__sx") * F.col("__sy")
    ) / F.nullif(denom.cast("double"), F.lit(0.0))
    return m.select(
        "event_type",
        F.col("__n").alias("n_days"),
        F.round(slope, 6).alias("slope"),
        F.round(
            (F.col("__sy") - slope * F.col("__sx")) / F.col("__n"), 6
        ).alias("intercept"),
    )


def holt_smoothing(
    daily: DataFrame,
    day_col: str = "day",
    type_col: str = "event_type",
    n_col: str = "n_events",
    alpha: float = 0.5,
    beta: float = 0.3,
) -> DataFrame:
    """Holt double-exponential smoothing per event type (Holt 1957,
    public): level + trend state folded over the daily series, the
    one-step forecaster that tracks a CHANGING trend where
    :func:`trend_slope`'s single OLS line and the seasonal-naive
    forecast cannot.

    ``level' = a*x + (1-a)*(level + trend)``;
    ``trend' = b*(level' - level) + (1-b)*trend``;
    init: first observation sets ``level = x, trend = 0``.

    Like :func:`cusum_changepoints`, the recurrence is inherently
    sequential per key, so it runs as ONE key-partitioned shuffle over
    the bounded (day x type) aggregate + a higher-order ``aggregate``
    fold (accumulator = [level, trend, n] doubles). Both engines fold
    the identically-sorted array left-to-right with the same IEEE ops,
    so trajectories match bit-for-bit.

    Output: (event_type, n_days, level, trend, forecast_next), doubles
    rounded 6 with ``forecast_next = level + trend``.
    """
    if not (0 < alpha <= 1 and 0 < beta <= 1):
        raise ValueError(f"alpha/beta must be in (0, 1], got {alpha}/{beta}")
    ordered = daily.groupBy(F.col(type_col).alias("event_type")).agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col(day_col).alias("d"),
                    F.col(n_col).cast("double").alias("v"),
                )
            )
        ).alias("__evs")
    )
    a = f"cast({float(alpha)} as double)"
    b = f"cast({float(beta)} as double)"
    ca = f"cast({1.0 - float(alpha)} as double)"
    cb = f"cast({1.0 - float(beta)} as double)"
    lvl = f"({a} * x + {ca} * (element_at(acc, 1) + element_at(acc, 2)))"
    fold = (
        f"aggregate(__vals, array(cast(0 as double), cast(0 as double), cast(0 as double)), "
        f"(acc, x) -> IF(element_at(acc, 3) = cast(0 as double), "
        f"array(x, cast(0 as double), cast(1 as double)), "
        f"array({lvl}, "
        f"{b} * ({lvl} - element_at(acc, 1)) + {cb} * element_at(acc, 2), "
        f"element_at(acc, 3) + cast(1 as double))))"
    )
    return (
        ordered.select(
            "event_type",
            F.expr("transform(__evs, e -> e.v)").alias("__vals"),
        )
        .withColumn("__st", F.expr(fold))
        .select(
            "event_type",
            F.expr("size(__vals)").cast("long").alias("n_days"),
            F.round(F.expr("element_at(__st, 1)"), 6).alias("level"),
            F.round(F.expr("element_at(__st, 2)"), 6).alias("trend"),
            F.round(
                F.expr("element_at(__st, 1) + element_at(__st, 2)"), 6
            ).alias("forecast_next"),
        )
    )


def trend_ranks(
    daily: DataFrame,
    day_col: str = "day",
    type_col: str = "event_type",
    n_col: str = "n_events",
) -> DataFrame:
    """Finalize stage of day-over-day trend detection: each type's
    daily volume rank plus its rank change vs the previous observed
    day. Shared verbatim by the batch operator (e4_trending) and the
    streaming twin (s16) — the drained streaming counters feed the
    SAME windows, so batch/stream parity holds by construction.

    Both windows run over the (day x type) aggregate — retention x
    type-cardinality rows, bounded regardless of event volume.

    Output: (day, event_type, n_events, rnk, prev_rnk, rank_delta).
    """
    w_day = Window.partitionBy(day_col).orderBy(
        F.desc(n_col), F.asc(type_col)
    )
    w_type = Window.partitionBy(type_col).orderBy(day_col)
    ranked = daily.withColumn(
        "rnk", F.row_number().over(w_day).cast("long")
    ).withColumn("prev_rnk", F.lag("rnk").over(w_type).cast("long"))
    return ranked.select(
        F.col(day_col).alias("day"),
        F.col(type_col).alias("event_type"),
        F.col(n_col).alias("n_events"),
        "rnk",
        "prev_rnk",
        (F.col("prev_rnk") - F.col("rnk")).cast("long").alias("rank_delta"),
    )


def cusum_changepoints(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    slack: float = 5.0,
    threshold: float = 50.0,
    id_col: str = "event_id",
    target: float | None = None,
) -> DataFrame:
    """Tabular CUSUM change-point detection per key (Page 1954,
    "Continuous Inspection Schemes" — public): the classic two-sided
    cumulative-sum control chart. In event-time order,

    ``S+ = max(0, S+ + (x - mean - slack))``,
    ``S- = max(0, S- + (mean - x - slack))``,

    an alarm fires when either side exceeds ``threshold`` (both sides
    reset after an alarm — the standard restart scheme). The baseline
    is the key's own series mean, or a FIXED in-control ``target``
    when given (the production-control-chart form, and the only form a
    STREAMING detector can use — the streaming twin
    ``streaming.stateful.streaming_cusum`` requires it); ``slack``
    absorbs in-control noise, ``threshold`` sets detection delay vs
    false-alarm trade.

    Like :func:`ewma_by_key`, the recurrence is inherently sequential
    per key, so it runs as ONE key-partitioned shuffle + a higher-order
    ``aggregate`` fold over the key's ordered values — per-task state
    is one key's doubles (the same bound as any ordered window), and
    the fold's accumulator is a 3-slot double array [S+, S-, alarms].
    Engine portability: the mean is a fixed double expression over an
    exact decimal sum (rounded 6), and both engines fold the
    identically-sorted array left-to-right with the same IEEE ops, so
    trajectories match bit-for-bit.

    Output: (key, n_events, mean DOUBLE, n_alarms BIGINT,
    final_sp/final_sn DOUBLE rounded 6).
    """
    if slack < 0 or threshold <= 0:
        raise ValueError(
            f"slack must be >= 0 and threshold > 0, got {slack}/{threshold}"
        )
    df = normalize_event_time(df, ts_col)
    mean_expr = (
        F.lit(round(float(target), 6))
        if target is not None
        else F.round(
            F.sum(F.col(value_col).cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        )
    )
    ordered = df.groupBy(F.col(key_col)).agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col(ts_col).alias("t"),
                    F.col(id_col).alias("i"),
                    F.col(value_col).cast("double").alias("v"),
                )
            )
        ).alias("__evs"),
        mean_expr.alias("__mean"),
    )
    k = float(slack)
    h = float(threshold)
    sp_raw = f"greatest(cast(0 as double), element_at(acc, 1) + (x - __mean - cast({k} as double)))"
    sn_raw = f"greatest(cast(0 as double), element_at(acc, 2) + (__mean - x - cast({k} as double)))"
    alarm = f"(({sp_raw}) > cast({h} as double) OR ({sn_raw}) > cast({h} as double))"
    fold = (
        f"aggregate(__vals, array(cast(0 as double), cast(0 as double), cast(0 as double)), "
        f"(acc, x) -> array("
        f"IF({alarm}, cast(0 as double), {sp_raw}), "
        f"IF({alarm}, cast(0 as double), {sn_raw}), "
        f"element_at(acc, 3) + IF({alarm}, cast(1 as double), cast(0 as double))))"
    )
    return (
        ordered.select(
            F.col(key_col),
            F.col("__mean"),
            F.expr("transform(__evs, e -> e.v)").alias("__vals"),
        )
        .withColumn("__st", F.expr(fold))
        .select(
            key_col,
            F.expr("size(__vals)").cast("long").alias("n_events"),
            F.col("__mean").alias("mean"),
            F.expr("element_at(__st, 3)").cast("long").alias("n_alarms"),
            F.round(F.expr("element_at(__st, 1)"), 6).alias("final_sp"),
            F.round(F.expr("element_at(__st, 2)"), 6).alias("final_sn"),
        )
    )


def funnel3(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    step_a: str,
    step_b: str,
    step_c: str,
    gap_ab_seconds: int,
    gap_bc_seconds: int,
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Three-step conversion funnel (A -> B within ``gap_ab`` -> C
    within ``gap_bc`` of the B): per user, how many A events started a
    full chain. Generalizes :func:`funnel`'s window rewrite to chained
    steps WITHOUT any self-join: pass 1 computes each event's next-C
    timestamp (reversed running min); pass 2 computes each event's
    next CONVERTING-B timestamp (reversed running min over B rows
    whose own next-C already landed in their window) — two window
    passes over the SAME (user, ts, id) sort order, so Spark executes
    them in one shuffle + one sort (the second Window reuses the
    first's partitioning/ordering). An A-row full-converts iff that
    next-converting-B lands within ``gap_ab``. The naive form is an
    A x B x C double range-join — per-user cubic on busy users; this
    is linear per row after one sort.

    Output per user: (n_a, n_full, first_full_a_ts).
    """
    df = normalize_event_time(df, ts_col)
    w = (
        Window.partitionBy(user_col)
        .orderBy(F.col(ts_col), F.col(id_col))
        .rowsBetween(1, Window.unboundedFollowing)
    )
    staged = df.withColumn(
        "__next_c",
        F.min(F.when(F.col(type_col) == F.lit(step_c), F.col(ts_col))).over(w),
    )
    b_converts = F.coalesce(
        F.col("__next_c")
        <= F.col(ts_col) + F.expr(f"INTERVAL {int(gap_bc_seconds)} SECONDS"),
        F.lit(False),
    )
    marked = staged.withColumn(
        "__b_conv_ts",
        F.min(
            F.when(
                (F.col(type_col) == F.lit(step_b)) & b_converts, F.col(ts_col)
            )
        ).over(w),
    ).where(F.col(type_col) == F.lit(step_a))
    full = F.coalesce(
        F.col("__b_conv_ts")
        <= F.col(ts_col) + F.expr(f"INTERVAL {int(gap_ab_seconds)} SECONDS"),
        F.lit(False),
    )
    return marked.groupBy(F.col(user_col)).agg(
        F.count(F.lit(1)).alias("n_a"),
        F.sum(full.cast("long")).alias("n_full"),
        F.date_format(
            F.min(F.when(full, F.col(ts_col))), "yyyy-MM-dd HH:mm:ss"
        ).alias("first_full_a_ts"),
    )


def time_to_convert(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    start_type: str = "signup",
    end_type: str = "purchase",
) -> DataFrame:
    """Time-to-event readout (the survival-curve summary behind every
    activation dashboard): per user, the delay from the FIRST
    ``start_type`` event to the first ``end_type`` AFTER it; rolled up
    to cohort conversion rate and exact interpolated delay quantiles.

    Plan shape: the 'first end AFTER the start' cannot fold into one
    aggregate (the start must be known first), so the scalable form is
    min-start (user-keyed partial agg) joined back to the end-type
    events on the SAME user key — the join reuses the aggregate's hash
    partitioning, so the pipeline costs one logical shuffle — then a
    second partial agg takes the min qualifying end. The final rollup
    is one row: users, converted, rate, median/p90 delay hours.
    """
    starts = (
        df.where(F.col(type_col) == start_type)
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("__s"))
    )
    ends = df.where(F.col(type_col) == end_type).select(
        user_col, F.col(ts_col).alias("__e")
    )
    first_end = (
        ends.join(starts, user_col)
        .where(F.col("__e") > F.col("__s"))
        .groupBy(user_col)
        .agg(F.min("__e").alias("__e"), F.min("__s").alias("__s"))
    )
    # cast-to-double keeps sub-second precision (unix_timestamp would
    # truncate to whole seconds and drift from any epoch()-based oracle)
    delays = first_end.select(
        (
            (F.col("__e").cast("double") - F.col("__s").cast("double"))
            / F.lit(3600.0)
        ).alias("__h")
    )
    n_started = starts.agg(
        F.count(F.lit(1)).cast("long").alias("n_started")
    )
    return (
        delays.agg(
            F.count(F.lit(1)).cast("long").alias("n_converted"),
            F.round(F.expr("percentile(__h, 0.5)"), 6).alias("median_hours"),
            F.round(F.expr("percentile(__h, 0.9)"), 6).alias("p90_hours"),
        )
        .crossJoin(F.broadcast(n_started))
        .select(
            "n_started",
            "n_converted",
            F.round(F.col("n_converted") / F.col("n_started"), 6).alias(
                "conversion_rate"
            ),
            "median_hours",
            "p90_hours",
        )
    )


def dau_stickiness(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    window_days: int = 7,
) -> DataFrame:
    """Exact DAU / WAU stickiness per day (the DAU/MAU-style engagement
    ratio every product dashboard tracks) WITHOUT a sliding
    count-distinct window: events collapse to distinct (user, day),
    then each user-day EXPLODES into the ``window_days`` later days it
    contributes to, and a second distinct + count gives the exact
    trailing-window active-user count. A window-function rolling
    distinct would re-sort per day and cannot partial-aggregate; the
    contribution-explode is ``window_days`` x |user-days| rows, all
    partial-aggregated with map-side combine — the exact-count
    companion to the mergeable-HLL plan in
    :func:`~.sketches.hll_rolling_distinct`.

    Output: (day, dau, wau, stickiness) for days with activity.
    """
    days = (
        df.select(F.col(user_col), F.to_date(ts_col).alias("__day"))
        .distinct()
    )
    dau = days.groupBy("__day").agg(
        F.count(F.lit(1)).cast("long").alias("dau")
    )
    wau = (
        days.select(
            user_col,
            F.explode(
                F.expr(
                    f"sequence(__day, date_add(__day, {int(window_days) - 1}))"
                )
            ).alias("__day"),
        )
        .distinct()
        .groupBy("__day")
        .agg(F.count(F.lit(1)).cast("long").alias("wau"))
    )
    return dau.join(wau, "__day").select(
        F.date_format("__day", "yyyy-MM-dd").alias("day"),
        "dau",
        "wau",
        F.round(F.col("dau") / F.col("wau"), 6).alias("stickiness"),
    )


def activity_streaks(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Longest consecutive-day activity streak per key — the classic
    gaps-and-islands rewrite (day_number - dense per-key rank is
    constant within a run of consecutive days), the engagement metric
    every retention dashboard carries next to the cohort triangle.

    Plan shape: raw events collapse FIRST to distinct (key, day) — one
    partial-agg distinct whose key space is users x active days — and
    every window after that runs on the collapsed frame, partitioned
    per key with partitions bounded by the calendar span (days per
    user), never by event volume. Output: (key, streak_days,
    streak_start, streak_end) for each key's LONGEST streak, earliest
    start winning ties — an explicit engine-portable tiebreak.
    """
    days = (
        df.select(F.col(key_col), F.to_date(ts_col).alias("__day"))
        .distinct()
    )
    w = Window.partitionBy(key_col).orderBy("__day")
    grouped = days.withColumn(
        "__grp",
        F.datediff(F.col("__day"), F.lit("1970-01-01"))
        - F.row_number().over(w),
    )
    streaks = grouped.groupBy(key_col, "__grp").agg(
        F.count(F.lit(1)).cast("long").alias("streak_days"),
        F.min("__day").alias("streak_start"),
        F.max("__day").alias("streak_end"),
    )
    pick = Window.partitionBy(key_col).orderBy(
        F.desc("streak_days"), F.asc("streak_start")
    )
    return (
        streaks.withColumn("__rk", F.row_number().over(pick))
        .where(F.col("__rk") == 1)
        .select(
            key_col,
            "streak_days",
            F.date_format("streak_start", "yyyy-MM-dd").alias("streak_start"),
            F.date_format("streak_end", "yyyy-MM-dd").alias("streak_end"),
        )
    )


def activity_gini(
    df: DataFrame,
    key_col: str = "user_id",
    group_col: str = "event_type",
) -> DataFrame:
    """Gini coefficient of per-key activity, per group — the standard
    inequality readout ("do 1% of users generate 90% of events?") that
    sits next to every DAU chart. The reference has no event analytics
    at all (SURVEY.md §2.8); this is extension surface.

    Exact WITHOUT a global sort: the textbook estimator needs values in
    rank order (a single-partition sort at corpus scale), but Gini has
    a pairwise identity

        G = sum_ij |x_i - x_j| / (2 * n * sum(x))

    that is order-free. Per-key counts collapse to a COUNT-OF-COUNTS
    histogram (distinct activity levels c with multiplicity m — key
    space bounded by the max per-key event count, thousands at most,
    never corpus-sized), and the pairwise sum becomes the histogram
    self-join  sum_kl m_k * m_l * |c_k - c_l|  — exact integer
    arithmetic in decimal(38,0), no window, no driver collect. The
    only doubles are the final division, written 2.0 * n * total
    left-to-right so DuckDB evaluates bit-identically.

    Output: one row per group — (group, n_keys, n_events, gini),
    gini rounded to 6.
    """
    per_key = df.groupBy(group_col, key_col).agg(
        F.count(F.lit(1)).cast("long").alias("__c")
    )
    return gini_from_counts(per_key, group_col, "__c")


def gini_from_counts(
    per_key: DataFrame, group_col: str, count_col: str = "__c"
) -> DataFrame:
    """Gini finalize over an already-collapsed per-key count frame —
    shared verbatim by the batch :func:`activity_gini` and the
    complete-mode streaming twin (whose state IS the per-key count
    frame), so batch and stream hash-match by construction."""
    per_key = per_key.select(
        group_col, F.col(count_col).cast("long").alias("__c")
    )
    hist = per_key.groupBy(group_col, "__c").agg(
        F.count(F.lit(1)).cast("long").alias("__m")
    )
    other = hist.select(
        F.col(group_col).alias("__g2"),
        F.col("__c").alias("__c2"),
        F.col("__m").alias("__m2"),
    )
    num = (
        hist.join(other, hist[group_col] == other["__g2"])
        .groupBy(group_col)
        .agg(
            F.sum(
                F.expr(
                    "CAST(__m AS DECIMAL(38,0)) * __m2 * abs(__c - __c2)"
                )
            ).alias("__num")
        )
    )
    totals = hist.groupBy(group_col).agg(
        F.sum("__m").cast("long").alias("n_keys"),
        F.sum(F.col("__m") * F.col("__c")).cast("long").alias("n_events"),
    )
    # join on a renamed key: totals and num share the hist lineage, and
    # a same-name equi-join over a streaming memory-sink scan trips
    # Spark's conflicting-reference resolution (batch plans dedup fine)
    num = num.select(F.col(group_col).alias("__g3"), "__num")
    return totals.join(
        num, F.col(group_col) == F.col("__g3")
    ).select(
        group_col,
        "n_keys",
        "n_events",
        F.round(
            F.col("__num").cast("double")
            / (
                F.lit(2.0)
                * F.col("n_keys").cast("double")
                * F.col("n_events").cast("double")
            ),
            6,
        ).alias("gini"),
    )
