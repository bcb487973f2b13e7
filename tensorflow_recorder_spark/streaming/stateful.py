"""Custom stateful streaming operators (SURVEY.md §2.9 streaming
extensions): semantics Structured Streaming's built-in windowed
aggregates cannot express, implemented over the public state-store APIs.

Two tiers:

* :func:`streaming_dedup` — exact streaming dedup via
  ``dropDuplicatesWithinWatermark``: state is ONE entry per key, evicted
  when the watermark passes, so state size is bounded by the horizon's
  key cardinality, not stream length.
* :func:`streaming_user_stats` — arbitrary per-key running state via
  Arrow-batched ``applyInPandasWithState`` (the escape hatch for
  operators with no built-in: per-key accumulators here, but the same
  shape carries CUSUM detectors, per-user rate limits, model state...).
  Emits the updated totals every micro-batch (update mode); the
  accumulators chosen (count/min/max) are order-independent, so the
  final emission is deterministic regardless of how the source batches.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_dedup(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup: keep the first event per key, with state
    bounded by the watermark horizon (a late duplicate arriving after
    the watermark passes its first occurrence is NOT suppressed — the
    documented trade for bounded state; widen ``watermark`` to widen the
    suppression window)."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def streaming_user_stats(
    stream: DataFrame,
    user_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-key running (count, min, max) via ``applyInPandasWithState``.

    Output: (user_id, n_events, min_value, max_value), re-emitted per
    micro-batch with the running totals; downstream takes the per-key
    max-n row (or the final batch) for end-of-stream totals. State is 3
    scalars per key — bounded by key cardinality.
    """
    out_schema = (
        f"{user_col} long, n_events long, min_value double, max_value double"
    )
    state_schema = "n long, mn double, mx double"

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, mn, mx = state.get
        else:
            n, mn, mx = 0, None, None
        for pdf in pdfs:
            vals = pdf[value_col].dropna()
            n += len(pdf)
            if len(vals):
                bmin, bmax = float(vals.min()), float(vals.max())
                mn = bmin if mn is None else min(mn, bmin)
                mx = bmax if mx is None else max(mx, bmax)
        state.update((n, mn, mx))
        yield pd.DataFrame(
            {
                user_col: [key[0]],
                "n_events": [n],
                "min_value": [mn],
                "max_value": [mx],
            }
        )

    return stream.groupBy(user_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_ewma(
    stream: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    alpha: float = 0.3,
    id_col: str = "event_id",
) -> DataFrame:
    """Per-key streaming EWMA via ``applyInPandasWithState`` — the
    streaming twin of ``operators.events.ewma_by_key``: state is
    (n, ewma) per key, the recurrence s_i = (1-a)*s_{i-1} + a*v_i
    applied in (ts, id) order WITHIN each micro-batch, carried across
    batches through the state store. Emits the running smoothed value
    per key per batch (update mode).

    Equal to the batch fold when batches arrive in event-time order
    (e.g. an availableNow drain of a single time-ordered source file);
    under cross-batch reordering the trajectory differs — that is the
    inherent streaming trade, and why the batch operator is the oracle
    of record.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    out_schema = f"{key_col} long, n_events long, ewma double"
    state_schema = "n long, s double"
    a = float(alpha)

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, s = state.get
        else:
            n, s = 0, None
        # ONE global sort of the key's whole micro-batch: a key whose
        # batch spans several Arrow chunks delivers them in arbitrary
        # order, so per-chunk sorting folds out of (ts, id) order
        # (r6 review finding; same pattern as streaming_anomaly).
        ordered = pd.concat(list(pdfs)).sort_values([ts_col, id_col])
        for v in ordered[value_col].astype(float):
            s = v if s is None else s * (1.0 - a) + v * a
            n += 1
        state.update((n, s))
        yield pd.DataFrame({key_col: [key[0]], "n_events": [n], "ewma": [s]})

    return stream.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_zscore(
    stream: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    n: int = 20,
    z_threshold: float = 3.0,
    id_col: str = "event_id",
) -> DataFrame:
    """Streaming trailing-window anomaly detection — the stateful twin
    of ``operators.events.rolling_zscore``: per key, the state store
    holds a deque of the last ``n`` values; each arriving event is
    scored against the deque BEFORE being pushed (frame [-n, -1], the
    event never contaminates its own baseline), emitted once, append
    semantics via update mode (each event appears in exactly one batch's
    emission).

    Engine-parity float discipline mirrors the batch operator exactly:
    the prior-window sums are accumulated as EXACT decimals (value
    quantized at 1e-6, IEEE-squared value quantized at 1e-10, both
    HALF_UP — the same quantization Spark's ``cast(x as decimal)``
    performs), converted once to double, then mean/variance/z use the
    identical double expression tree — so with an in-order drain the
    emitted rows are bit-identical to the batch result and share its
    oracle. Cross-batch reordering shifts which events precede which
    (the inherent streaming trade); within a batch, rows are processed
    in (ts, id) order.

    State per key is n floats — bounded regardless of stream length.
    """
    if n < 2:
        raise ValueError(f"n must be >= 2, got {n}")
    from decimal import ROUND_HALF_UP, Decimal

    out_schema = (
        f"{id_col} long, {key_col} long, ts string, {value_col} double, "
        "n_prior long, z double, is_anomaly boolean"
    )
    state_schema = "vals array<double>"
    thr = float(z_threshold)
    Q6 = Decimal("1e-6")
    Q10 = Decimal("1e-10")

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        window = list(state.get[0]) if state.exists else []
        rows = pd.concat(list(pdfs)).sort_values([ts_col, id_col])
        out = {c: [] for c in (id_col, "ts", value_col, "n_prior", "z", "anom")}
        for _, r in rows.iterrows():
            v = float(r[value_col])
            np_ = len(window)
            z = None
            anom = False
            if np_ >= 2:
                s = float(
                    sum(Decimal(x).quantize(Q6, ROUND_HALF_UP) for x in window)
                )
                ss = float(
                    sum(
                        Decimal(x * x).quantize(Q10, ROUND_HALF_UP)
                        for x in window
                    )
                )
                nd = float(np_)
                var = (ss - s * s / nd) / (nd - 1.0)
                if var > 0:
                    z = round((v - s / nd) / var**0.5, 6)
                    anom = abs((v - s / nd) / var**0.5) > thr
            out[id_col].append(int(r[id_col]))
            out["ts"].append(r[ts_col].strftime("%Y-%m-%d %H:%M:%S"))
            out[value_col].append(v)
            out["n_prior"].append(np_)
            out["z"].append(z)
            out["anom"].append(anom)
            window.append(v)
            if len(window) > n:
                window.pop(0)
        state.update((window,))
        yield pd.DataFrame(
            {
                id_col: out[id_col],
                key_col: key[0],
                "ts": out["ts"],
                value_col: out[value_col],
                "n_prior": out["n_prior"],
                "z": out["z"],
                "is_anomaly": out["anom"],
            }
        )

    return stream.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_cusum(
    stream: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    target: float = 250.0,
    slack: float = 5.0,
    threshold: float = 50.0,
    id_col: str = "event_id",
) -> DataFrame:
    """Per-key streaming CUSUM control chart via
    ``applyInPandasWithState`` — the streaming twin of
    ``operators.events.cusum_changepoints(target=...)``. A streaming
    detector can only chart against a FIXED in-control ``target``
    (the key's own global mean is unknowable online); state is 4
    scalars per key (S+, S-, alarm count, n), values fold in (ts, id)
    order WITHIN each micro-batch and the state carries across
    batches. Emits the running chart per key per batch (update mode).

    Equal to the batch fixed-target fold when batches arrive in
    event-time order (e.g. an availableNow drain of one time-ordered
    source); under cross-batch reordering the trajectory differs —
    the inherent streaming trade, same caveat as
    :func:`streaming_ewma`.

    Output: (key, n_events, n_alarms, final_sp, final_sn).
    """
    if slack < 0 or threshold <= 0:
        raise ValueError(
            f"slack must be >= 0 and threshold > 0, got {slack}/{threshold}"
        )
    out_schema = (
        f"{key_col} long, n_events long, n_alarms long, "
        f"final_sp double, final_sn double"
    )
    state_schema = "sp double, sn double, na long, n long"
    m = round(float(target), 6)
    k = float(slack)
    h = float(threshold)

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            sp, sn, na, n = state.get
        else:
            sp, sn, na, n = 0.0, 0.0, 0, 0
        # ONE global sort of the key's whole micro-batch: a key whose
        # batch spans several Arrow chunks delivers them in arbitrary
        # order, so per-chunk sorting folds out of (ts, id) order
        # (r6 review finding; same pattern as streaming_anomaly).
        ordered = pd.concat(list(pdfs)).sort_values([ts_col, id_col])
        for v in ordered[value_col].astype(float):
            sp_raw = max(0.0, sp + (v - m - k))
            sn_raw = max(0.0, sn + (m - v - k))
            if sp_raw > h or sn_raw > h:
                sp, sn, na = 0.0, 0.0, na + 1
            else:
                sp, sn = sp_raw, sn_raw
            n += 1
        state.update((sp, sn, na, n))
        yield pd.DataFrame(
            {
                key_col: [key[0]],
                "n_events": [n],
                "n_alarms": [na],
                "final_sp": [round(sp, 6)],
                "final_sn": [round(sn, 6)],
            }
        )

    return stream.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_interarrival(
    stream: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-key streaming inter-arrival profile via
    ``applyInPandasWithState`` — the streaming twin of
    ``operators.events.interarrival_stats``. State is 5 scalars per key
    (last event-time micros, gap count, gap sum, gap sum-of-squares,
    max gap), so the burstiness fingerprint streams with bounded state;
    the percentile columns of the batch operator are deliberately
    dropped — exact quantiles need the full gap distribution, which is
    precisely what a streaming detector cannot hold (the moment-based
    CV is the streamable core).

    Events fold in (ts, id) order WITHIN each micro-batch and the last
    timestamp carries across batches; equal to the batch fold when
    batches arrive in event-time order (an availableNow drain of one
    time-ordered source), the same caveat as :func:`streaming_cusum`.

    Output per batch (update mode): (key, n_events, mean_gap_s,
    max_gap_s, burstiness) — gap stats NULL until a key has 2 events.
    """
    out_schema = (
        f"{key_col} long, n_events long, mean_gap_s double, "
        f"max_gap_s double, burstiness double"
    )
    state_schema = (
        "last_us long, n long, gap_sum double, gap_sumsq double, "
        "gap_max double"
    )

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            last_us, n, gsum, gsumsq, gmax = state.get
        else:
            last_us, n, gsum, gsumsq, gmax = None, 0, 0.0, 0.0, 0.0
        ordered = pd.concat(list(pdfs)).sort_values([ts_col, id_col])
        for ts in ordered[ts_col]:
            us = int(ts.value // 1000)  # pandas Timestamp ns -> us
            if last_us is not None:
                gap = (us - last_us) / 1e6
                gsum += gap
                gsumsq += gap * gap
                gmax = max(gmax, gap)
            last_us = us
            n += 1
        state.update((last_us, n, gsum, gsumsq, gmax))
        gaps = n - 1
        if gaps >= 1:
            mean = gsum / gaps
            if gaps >= 2:
                var = max(0.0, (gsumsq - gaps * mean * mean) / (gaps - 1))
                burst = (var**0.5) / mean if mean != 0 else None
            else:
                burst = None
            mean_out = round(mean, 4)
            max_out = round(gmax, 4)
            burst_out = round(burst, 4) if burst is not None else None
        else:
            mean_out = max_out = burst_out = None
        # nullable Float64 so a None (single-event user) arrives in
        # Spark as NULL, not NaN — the oracle emits NULL there
        yield pd.DataFrame(
            {
                key_col: [key[0]],
                "n_events": [n],
                "mean_gap_s": pd.array([mean_out], dtype="Float64"),
                "max_gap_s": pd.array([max_out], dtype="Float64"),
                "burstiness": pd.array([burst_out], dtype="Float64"),
            }
        )

    return stream.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_rate_spikes(
    stream: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-key streaming peak-rate tracker via
    ``applyInPandasWithState`` — the streaming twin of the batch
    ``e4_rate_spikes`` argmax: each key keeps (current hour, count in
    that hour, best count so far, hour it happened) — 4 scalars, so
    the rate-limit / scraper fingerprint streams with bounded state.
    The peak updates only on a STRICT new maximum, which reproduces
    the batch query's earliest-hour tiebreak (a later hour that only
    equals the record never displaces it).

    Events fold in (ts, id) order WITHIN each micro-batch and the open
    hour carries across batches; equal to the batch argmax when
    batches arrive in event-time order (an availableNow drain of one
    time-ordered source), the same caveat as :func:`streaming_cusum`.

    Output per batch (update mode): (key, n_events, peak_per_hour,
    peak_hour_us) — peak_hour as epoch micros; callers format it.
    """
    out_schema = (
        f"{key_col} long, n_events long, peak_per_hour long, "
        "peak_hour_us long"
    )
    state_schema = (
        "cur_hour_us long, cur_n long, peak_n long, peak_hour_us long, "
        "n_total long"
    )
    hour_us = 3_600_000_000

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            cur_hour, cur_n, peak_n, peak_hour, n_total = state.get
        else:
            cur_hour, cur_n, peak_n, peak_hour, n_total = None, 0, 0, None, 0
        ordered = pd.concat(list(pdfs)).sort_values([ts_col, id_col])
        for ts in ordered[ts_col]:
            us = int(ts.value // 1000)  # pandas Timestamp ns -> us
            h = (us // hour_us) * hour_us
            if h != cur_hour:
                cur_hour, cur_n = h, 0
            cur_n += 1
            n_total += 1
            if cur_n > peak_n:
                peak_n, peak_hour = cur_n, cur_hour
        state.update((cur_hour, cur_n, peak_n, peak_hour, n_total))
        yield pd.DataFrame(
            {
                key_col: [key[0]],
                "n_events": [n_total],
                "peak_per_hour": [peak_n],
                "peak_hour_us": [peak_hour],
            }
        )

    return stream.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_streaks(
    stream: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-key streaming longest-consecutive-day streak via
    ``applyInPandasWithState`` — the streaming twin of the batch
    gaps-and-islands ``activity_streaks``: each key keeps (last day
    seen, current run length + start, best run length + start + end,
    total distinct days) — 7 scalars, all days as epoch-day ints, so
    the engagement streak streams with bounded state. The best run
    updates only on a STRICT new maximum, which reproduces the batch
    query's earliest-start tiebreak (a later equal-length run never
    displaces the record).

    Days fold in ascending order WITHIN each micro-batch (events
    collapse to the batch's distinct day set first) and the open run
    carries across batches; equal to the batch operator when batches
    arrive in event-time order (an availableNow drain of one
    time-ordered source), the same caveat as :func:`streaming_cusum`.

    Output per batch (update mode): (key, n_days, streak_days,
    streak_start_day, streak_end_day) — days as epoch-day ints;
    callers format them.
    """
    out_schema = (
        f"{key_col} long, n_days long, streak_days long, "
        "streak_start_day long, streak_end_day long"
    )
    state_schema = (
        "last_day long, cur_len long, cur_start long, best_len long, "
        "best_start long, best_end long, n_days long"
    )
    day_us = 86_400_000_000

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            last_day, cur_len, cur_start, best_len, best_start, best_end, n_days = (
                state.get
            )
        else:
            last_day, cur_len, cur_start = None, 0, None
            best_len, best_start, best_end, n_days = 0, None, None, 0
        batch = pd.concat(list(pdfs))
        days = sorted(
            {int(ts.value // 1000 // day_us) for ts in batch[ts_col]}
        )
        for d in days:
            if last_day is not None and d == last_day:
                continue
            if last_day is not None and d == last_day + 1:
                cur_len += 1
            else:
                cur_len, cur_start = 1, d
            last_day = d
            n_days += 1
            if cur_len > best_len:
                best_len, best_start, best_end = cur_len, cur_start, d
        state.update(
            (last_day, cur_len, cur_start, best_len, best_start, best_end, n_days)
        )
        yield pd.DataFrame(
            {
                key_col: [key[0]],
                "n_days": [n_days],
                "streak_days": [best_len],
                "streak_start_day": [best_start],
                "streak_end_day": [best_end],
            }
        )

    return stream.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_funnel(
    stream: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    step_a: str = "click",
    step_b: str = "purchase",
    max_gap_seconds: int = 3600,
) -> DataFrame:
    """Per-key streaming two-step funnel via ``applyInPandasWithState``
    — the streaming twin of the batch window-pass ``funnel``: each key
    keeps (A count, conversion count, first-conversion A/B timestamps,
    open A events). The open-A list is BOUNDED by the key's A-rate x
    the gap window, not by stream length: folding events in (ts, id)
    order, a ``step_b`` at time p converts every open A with
    ``a_ts >= p - gap`` (that B is exactly the A's next-B) and proves
    every older open A can never convert (its next-B is this p, already
    past its window) — so the open list EMPTIES at every B; an A also
    retires as soon as any later event passes ``a_ts + gap``.

    Equal to the batch operator under the same in-order-drain caveat
    as :func:`streaming_cusum`. Output per batch (update mode):
    (key, n_a, n_converted, first_conv_a_us, first_conv_b_us) with
    timestamps as epoch micros; callers format them.
    """
    out_schema = (
        f"{key_col} long, n_total long, n_a long, n_converted long, "
        "first_conv_a_us long, first_conv_b_us long"
    )
    state_schema = (
        "n_total long, n_a long, n_conv long, first_a_us long, "
        "first_b_us long, open_a array<long>"
    )
    gap_us = int(max_gap_seconds) * 1_000_000

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n_total, n_a, n_conv, first_a, first_b, open_a = state.get
            open_a = list(open_a) if open_a is not None else []
        else:
            n_total, n_a, n_conv, first_a, first_b, open_a = 0, 0, 0, None, None, []
        ordered = pd.concat(list(pdfs)).sort_values([ts_col, id_col])
        for ts, etype in zip(ordered[ts_col], ordered[type_col]):
            n_total += 1
            us = int(ts.value // 1000)
            # retire open As whose window this event's time has passed
            open_a = [a for a in open_a if us <= a + gap_us]
            if etype == step_a:
                n_a += 1
                open_a.append(us)
            elif etype == step_b and open_a:
                # every surviving open A converts with THIS B
                n_conv += len(open_a)
                if first_a is None:
                    first_a, first_b = min(open_a), us
                open_a = []
        state.update((n_total, n_a, n_conv, first_a, first_b, open_a))
        yield pd.DataFrame(
            {
                key_col: [key[0]],
                "n_total": [n_total],
                "n_a": [n_a],
                "n_converted": [n_conv],
                "first_conv_a_us": [first_a],
                "first_conv_b_us": [first_b],
            }
        )

    return stream.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_time_to_convert(
    stream: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    start_type: str = "signup",
    end_type: str = "purchase",
) -> DataFrame:
    """Per-key streaming time-to-event tracker via
    ``applyInPandasWithState`` — the streaming twin of the batch
    ``time_to_convert``: each key keeps (first start ts, first
    qualifying end ts, total events) — 3 scalars, so activation delay
    streams with constant state per user. Folding in (ts, id) order,
    the first ``start_type`` seen is the min-start and the first
    ``end_type`` strictly after it is the min qualifying end — exactly
    the batch operator's two aggregates, under the same in-order-drain
    caveat as :func:`streaming_cusum`.

    Output per batch (update mode): (key, n_events, start_us, end_us)
    with timestamps as epoch micros (NULL until observed).
    """
    out_schema = (
        f"{key_col} long, n_events long, start_us long, end_us long"
    )
    state_schema = "start_us long, end_us long, n_events long"

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            start_us, end_us, n_events = state.get
        else:
            start_us, end_us, n_events = None, None, 0
        ordered = pd.concat(list(pdfs)).sort_values([ts_col, id_col])
        for ts, etype in zip(ordered[ts_col], ordered[type_col]):
            n_events += 1
            us = int(ts.value // 1000)
            if etype == start_type and start_us is None:
                start_us = us
            elif (
                etype == end_type
                and start_us is not None
                and end_us is None
                and us > start_us
            ):
                end_us = us
        state.update((start_us, end_us, n_events))
        yield pd.DataFrame(
            {
                key_col: [key[0]],
                "n_events": [n_events],
                "start_us": [start_us],
                "end_us": [end_us],
            }
        )

    return stream.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_transitions(
    stream: DataFrame,
    key_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-key streaming Markov transition counts via
    ``applyInPandasWithState`` — the streaming twin of
    ``operators.events.transition_matrix``'s per-user lag stage. State
    per key is (last event type, JSON dict of cumulative
    (from -> to -> count)) — bounded by the event-type alphabet squared
    (single-digit cardinality in any real event taxonomy), NOT by
    stream length; the JSON encoding keeps the state schema
    fixed-width while the alphabet stays open.

    Events fold in (ts, id) order WITHIN each micro-batch and the last
    type carries across batches — equal to the batch lag when batches
    arrive in event-time order (an availableNow drain of one
    time-ordered source), the same caveat as ``streaming_cusum``.

    Emits each key's full CUMULATIVE count table every batch (update
    mode): (key, from_type, to_type, n). The global matrix is a
    downstream batch rollup over the final emission per key (sum n,
    normalize per from_type) — the same finalize the batch operator
    runs.
    """
    import json

    out_schema = (
        f"{key_col} long, from_type string, to_type string, n long"
    )
    state_schema = "last_type string, counts_json string"

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            last_type, counts_json = state.get
            counts = {
                tuple(k.split("\x00", 1)): v
                for k, v in json.loads(counts_json).items()
            }
        else:
            last_type, counts = None, {}
        ordered = pd.concat(list(pdfs)).sort_values([ts_col, id_col])
        for t in ordered[type_col]:
            t = str(t)
            if last_type is not None:
                pair = (last_type, t)
                counts[pair] = counts.get(pair, 0) + 1
            last_type = t
        state.update(
            (
                last_type,
                json.dumps(
                    {"\x00".join(k): v for k, v in counts.items()},
                    sort_keys=True,
                ),
            )
        )
        if counts:
            rows = sorted(counts.items())
            yield pd.DataFrame(
                {
                    key_col: [key[0]] * len(rows),
                    "from_type": [k[0] for k, _ in rows],
                    "to_type": [k[1] for k, _ in rows],
                    "n": [v for _, v in rows],
                }
            )

    return stream.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_new_vs_returning(
    stream: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    retain_days: int = 366,
) -> DataFrame:
    """Per-key streaming growth accounting via
    ``applyInPandasWithState`` — the streaming twin of the batch
    ``new_vs_returning`` daily rollup. Each key keeps its first active
    day, a FOLD LINE, and the set of active days newer than the fold
    line, so the distinct-(user, day) dedup the batch query does with
    a shuffle is exact under bounded cross-batch disorder; an
    out-of-order day that lands in a later micro-batch is still
    emitted exactly once (the pre-r7 two-scalar state silently dropped
    any day older than the advancing high-water mark, r6 advice). One
    row per (key, day) is emitted the first time that day appears,
    flagged ``is_new`` iff it is the key's first-ever day.

    State bound (r7 verdict item 4): after each batch, days older than
    ``max_seen - retain_days`` are folded out of the set and the fold
    line advances — a day at or below the fold line is treated as
    already-seen (it was either emitted before folding, or it is a
    late arrival beyond the disorder bound, dropped with watermark
    semantics). State per key is therefore O(retain_days) forever —
    three scalars plus at most ``retain_days`` day entries — instead
    of growing with the key's whole calendar lifetime. Exactness
    caveats: (a) a day arriving more than ``retain_days`` behind the
    key's newest seen day is dropped, the same late-data contract as
    a ``retain_days`` watermark; (b) each key's FIRST calendar day
    must not arrive after a later day of the same key, else its
    ``is_new`` flag lands on the wrong day — day totals stay exact
    either way.

    Output per batch (update mode): (key, day 'yyyy-MM-dd', is_new).
    """
    import json

    out_schema = f"{key_col} long, day string, is_new int"
    state_schema = "first_day long, fold_day long, days_json string"
    _NS_PER_DAY = 86_400_000_000_000
    _NO_FOLD = -(1 << 62)  # sentinel: nothing folded yet

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            first_day, fold_day, days_json = state.get
            seen = set(json.loads(days_json))
        else:
            first_day, fold_day, seen = None, _NO_FOLD, set()
        ordered = pd.concat(list(pdfs)).sort_values([ts_col, id_col])
        days: list[int] = []
        flags: list[int] = []
        for ts in ordered[ts_col]:
            d = int(ts.value // _NS_PER_DAY)
            if d <= fold_day or d in seen:
                continue
            seen.add(d)
            if first_day is None:
                first_day = d
            days.append(d)
            flags.append(1 if d == first_day else 0)
        if seen:
            new_fold = max(fold_day, max(seen) - retain_days)
            if new_fold > fold_day:
                seen = {d for d in seen if d > new_fold}
                fold_day = new_fold
        state.update((first_day, fold_day, json.dumps(sorted(seen))))
        if days:
            yield pd.DataFrame(
                {
                    key_col: [key[0]] * len(days),
                    "day": [
                        pd.Timestamp(d, unit="D").strftime("%Y-%m-%d")
                        for d in days
                    ],
                    "is_new": flags,
                }
            )

    return stream.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_out_of_order(
    stream: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-key streaming lateness monitor via
    ``applyInPandasWithState`` — the streaming twin of the batch
    ``out_of_order`` audit. Each key keeps exactly ONE scalar (the
    max event-time seen so far); an incoming event older than it is
    late, by that many micros. Folding in (id) order under the
    in-order drain (same caveat as :func:`streaming_cusum`)
    reproduces the batch running-max-over-preceding-ids window
    exactly. Emits one flag row per event so the |types|-row
    finalize is the batch rollup unchanged.

    Output per batch (update mode): (key, event_type, late_us) with
    late_us NULL for in-order events.
    """
    out_schema = f"{key_col} long, {type_col} string, late_us long"
    state_schema = "max_us long"

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (max_us,) = state.get if state.exists else (None,)
        ordered = pd.concat(list(pdfs)).sort_values(id_col)
        types: list[str] = []
        lates: list[int | None] = []
        for ts, etype in zip(ordered[ts_col], ordered[type_col]):
            us = int(ts.value // 1000)
            types.append(etype)
            lates.append(max_us - us if max_us is not None and us < max_us
                         else None)
            if max_us is None or us > max_us:
                max_us = us
        state.update((max_us,))
        yield pd.DataFrame(
            {
                key_col: [key[0]] * len(types),
                type_col: types,
                "late_us": pd.array(lates, dtype="Int64"),
            }
        )

    return stream.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
