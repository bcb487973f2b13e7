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
        for pdf in pdfs:
            ordered = pdf.sort_values([ts_col, id_col])
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
