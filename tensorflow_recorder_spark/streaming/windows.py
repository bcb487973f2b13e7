"""Streaming event-time operators (E4 under Structured Streaming).

Batch formulations live in ``operators/events.py``; these are the
unbounded variants with watermarks for late data. At scale the state
store is keyed by (window, type) / session key — bounded by watermark
horizon, not stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def streaming_hourly_rollup(
    stream: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling 1-hour rollup (streaming analog of
    operators.events.hourly_rollup). Append-mode capable: a window
    finalizes once the watermark passes its end."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), "1 hour").alias("win"), F.col(type_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            F.col(type_col).alias("event_type"),
            "n_events",
            "sum_value",
        )
    )


def streaming_sessionize(
    stream: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    watermark: str = "1 hour",
) -> DataFrame:
    """Gap-based sessions via the native ``session_window`` (state-store
    backed; sessions close when the watermark passes last_event + gap)."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(
            F.session_window(F.col(ts_col), f"{gap_minutes} minutes").alias("sess"),
            F.col(user_col),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
            # exact whole-second bounds (same cast as the batch
            # sessionize), so downstream depth rollups share the batch
            # duration arithmetic — session_window's own `end` is
            # last_event + gap, not the last event
            F.min(F.col(ts_col).cast("long")).alias("__first_s"),
            F.max(F.col(ts_col).cast("long")).alias("__last_s"),
        )
        .select(
            F.col(user_col).alias("user_id"),
            F.date_format("sess.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format("sess.end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_events",
            "sum_value",
            (F.col("__last_s") - F.col("__first_s")).alias("duration_s"),
        )
    )


def streaming_hll_registers(
    stream: DataFrame,
    key_col: str = "user_id",
    b: int = 10,
) -> DataFrame:
    """Streaming HyperLogLog: maintain the register sketch
    (operators/sketches.py) as a streaming aggregate. The state is AT
    MOST 2**b rows — a distinct-count whose streaming state does not
    grow with cardinality, which is the entire reason to sketch instead
    of ``dropDuplicates`` (whose state is one row per key until the
    watermark expires it).

    Emits the register rows (complete mode); callers finalize with
    ``sketches.hll_estimate`` batch-side — structured streaming forbids
    chained aggregations, and finalization is a constant-size
    presentation step, not state.
    """
    from ..operators.sketches import hll_register_exprs

    reg, rho = hll_register_exprs(key_col, b)
    return (
        stream.select(F.expr(reg).alias("reg"), F.expr(rho).alias("rho"))
        .groupBy("reg")
        .agg(F.max("rho").alias("max_rho"))
    )


def streaming_cms_cells(
    stream: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Streaming count-min sketch: maintain the depth x width cell
    counts as a streaming aggregate — bounded state (the sketch), any
    key cardinality. Same md5 hash rows as the batch
    ``sketches.cms_build``, so a drained stream sketch equals the batch
    sketch cell-for-cell; finalize heavy hitters batch-side by probing
    the drained cells (chained aggregations are not allowed in a single
    streaming query).
    """
    from ..operators.sketches import _bucket_expr

    if depth < 1 or width < 1:
        raise ValueError(f"depth/width must be >= 1, got {depth}/{width}")
    rows = stream.select(
        F.explode(
            F.expr(
                "array("
                + ", ".join(
                    f"struct({d}L as row_id, "
                    f"{_bucket_expr(key_col, d, width)} as bucket, 1L as w)"
                    for d in range(depth)
                )
                + ")"
            )
        ).alias("c")
    ).select("c.row_id", "c.bucket", "c.w")
    return rows.groupBy("row_id", "bucket").agg(
        F.sum("w").cast("long").alias("cell_count")
    )


def streaming_bloom_positions(
    stream: DataFrame,
    key_col: str,
    m_bits: int = 1 << 16,
    k_hashes: int = 4,
) -> DataFrame:
    """Streaming Bloom filter: maintain the set-bit position table as a
    streaming aggregate — state is at most m_bits rows however many
    keys stream past (the continuously-updated ingest pre-filter; a new
    batch probes the drained positions with ``sketches.bloom_probe``).
    Same md5 positions as the batch ``bloom_build``, so stream == batch
    position-for-position.
    """
    from ..operators.sketches import _bucket_expr

    if m_bits < 1 or k_hashes < 1:
        raise ValueError(f"m_bits/k_hashes must be >= 1, got {m_bits}/{k_hashes}")
    return (
        stream.select(
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
        .groupBy("pos")
        .agg(F.count(F.lit(1)).alias("__hits"))
        .select("pos")
    )


def streaming_daily_hll_registers(
    stream: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    b: int = 10,
) -> DataFrame:
    """Streaming per-day HLL registers: state is (days x 2^b) rows — the
    continuously-maintained form of the rolling-distinct dashboard
    (``sketches.hll_rolling_distinct`` merges the drained rows into any
    window batch-side). Day count is bounded by retention, so state
    stays bounded without a watermark; same md5 registers as batch."""
    from ..operators.sketches import hll_register_exprs

    reg, rho = hll_register_exprs(key_col, b)
    return (
        stream.select(
            F.to_date(ts_col).alias("day"),
            F.expr(reg).alias("reg"),
            F.expr(rho).alias("rho"),
        )
        .groupBy("day", "reg")
        .agg(F.max("rho").alias("max_rho"))
    )
