"""Interval operators (E4 extension): overlap join, incident derivation,
and a distributed sweep-line concurrency timeline.

The reference has no notion of time intervals (its pipeline is row-at-
a-time, /root/reference/tfrecorder/beam_pipeline.py); at 100 TB the
event log *is* the product, and "which sessions overlapped which
incident windows" / "how many sessions were concurrently open" are
the two interval questions every ops review asks.

Scale shapes chosen here:

* ``interval_join`` — Spark has no native range/overlap join; the
  naive theta-join (``l.start <= r.end AND r.start <= l.end``) plans a
  BroadcastNestedLoopJoin / cartesian and dies at scale. Instead both
  sides explode onto a fixed time-bucket grid and EQUI-join on the
  bucket, so Catalyst plans a plain hash/sort-merge join partitioned
  by bucket. A pair overlapping many buckets would match once per
  shared bucket; the classic first-common-bucket guard
  (``bucket == greatest(first_bucket(l), first_bucket(r))``) keeps
  exactly one match per pair with NO dedup shuffle. Bucket width is
  the knob: it bounds the explode factor (interval_length / bucket)
  and the per-bucket join fan-in — pick it near the median interval
  length.

* ``concurrency_by_hour`` — the textbook sweep line (sort all +1/-1
  endpoint deltas, running-sum) needs a GLOBAL prefix sum, which on one
  window means Exchange SinglePartition — fatal at scale. This is the
  two-level distributed prefix sum instead: per-bucket running sums
  (window PARTITIONED by hour bucket) plus an exclusive prefix over the
  tiny per-bucket-totals frame (one row per hour — bounded by the
  calendar, not the data), broadcast back. No corpus-sized single
  partition anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Overlap-join two interval frames (closed intervals, epoch-second
    LONG bounds): returns every (left row, right row) pair with
    ``l_start <= r_end AND r_start <= l_end``, plus ``overlap_s``.

    Both sides are exploded onto ``bucket_seconds``-wide grid cells
    spanned by each interval and equi-joined on the cell, so the plan
    is a shuffle/hash join on the bucket key — never a nested loop.
    The first-common-bucket predicate keeps one match per pair without
    a distinct. Left/right column sets must be disjoint.
    """
    b = int(bucket_seconds)
    if b <= 0:
        raise ValueError(f"bucket_seconds must be positive, got {bucket_seconds}")
    shared = set(left.columns) & set(right.columns)
    if shared:
        raise ValueError(
            "interval_join requires disjoint left/right column sets; "
            f"shared: {sorted(shared)}"
        )
    lb = left.withColumn(
        "__lbkt",
        F.explode(
            F.sequence(
                (F.col(l_start) / b).cast("long"), (F.col(l_end) / b).cast("long")
            )
        ),
    )
    rb = right.withColumn(
        "__rbkt",
        F.explode(
            F.sequence(
                (F.col(r_start) / b).cast("long"), (F.col(r_end) / b).cast("long")
            )
        ),
    )
    joined = lb.join(
        rb,
        (F.col("__lbkt") == F.col("__rbkt"))
        & (F.col(l_start) <= F.col(r_end))
        & (F.col(r_start) <= F.col(l_end))
        & (
            F.col("__lbkt")
            == F.greatest(
                (F.col(l_start) / b).cast("long"), (F.col(r_start) / b).cast("long")
            )
        ),
        "inner",
    )
    return joined.drop("__lbkt", "__rbkt").withColumn(
        "overlap_s",
        F.least(F.col(l_end), F.col(r_end))
        - F.greatest(F.col(l_start), F.col(r_start)),
    )


def hot_hour_incidents(
    events: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    factor: float = 2.0,
) -> DataFrame:
    """Derive incident windows per event type: hours whose event count
    is ``>= factor * that type's average hourly count``, with adjacent
    hot hours merged (gaps-and-islands) into one closed interval
    ``[inc_start, inc_end]`` (epoch seconds, end = last hot hour's
    59:59).

    All windows are PARTITIONED by event type over the per-(type, hour)
    aggregate — one row per active hour per type, bounded by the
    calendar; the corpus is reduced by the first groupBy before any
    window runs.
    """
    hourly = (
        events.groupBy(
            type_col, (F.col(ts_col).cast("long") / 3600).cast("long").alias("hr")
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w_type = Window.partitionBy(type_col)
    hot = (
        hourly.withColumn("avg_cnt", F.avg("cnt").over(w_type))
        .where(F.col("cnt") >= F.lit(factor) * F.col("avg_cnt"))
    )
    w_seq = Window.partitionBy(type_col).orderBy("hr")
    islands = hot.withColumn(
        "island", F.col("hr") - F.row_number().over(w_seq)
    )
    return islands.groupBy(type_col, "island").agg(
        (F.min("hr") * 3600).alias("inc_start"),
        (F.max("hr") * 3600 + 3599).alias("inc_end"),
        F.sum("cnt").alias("n_hot_events"),
    ).drop("island")


def concurrency_by_hour(
    intervals: DataFrame, start_col: str, end_col: str
) -> DataFrame:
    """Per-hour maximum concurrency of closed intervals (epoch-second
    LONG bounds) via a two-level distributed prefix sum.

    Each interval contributes +1 at ``start`` and -1 at ``end + 1``
    (closed semantics: still open AT its end second). Deltas are
    aggregated per change timestamp, running-summed WITHIN each hour
    bucket (window partitioned by hour), and each hour's carry-in
    offset comes from an exclusive prefix over the per-hour totals —
    a frame with one row per active hour (calendar-bounded), the only
    unpartitioned window in the plan. Output rows exist for hours with
    at least one change point; ``max_conc`` is the max concurrency
    attained at a change point in that hour.
    """
    starts = intervals.select(
        F.col(start_col).alias("t"), F.lit(1).alias("d")
    )
    ends = intervals.select(
        (F.col(end_col) + 1).alias("t"), F.lit(-1).alias("d")
    )
    net = (
        starts.unionAll(ends)
        .groupBy("t")
        .agg(F.sum("d").alias("net"))
        .withColumn("hr", (F.col("t") / 3600).cast("long"))
    )
    w_in = (
        Window.partitionBy("hr")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    within = net.withColumn("run", F.sum("net").over(w_in))
    totals = net.groupBy("hr").agg(F.sum("net").alias("hr_net"))
    w_off = (
        Window.orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, -1)
    )  # bounded: one row per active hour (see module docstring)
    offsets = totals.withColumn(
        "offset", F.coalesce(F.sum("hr_net").over(w_off), F.lit(0))
    ).select("hr", "offset")
    conc = within.join(F.broadcast(offsets), "hr").withColumn(
        "conc", F.col("run") + F.col("offset")
    )
    return conc.groupBy("hr").agg(
        F.max("conc").alias("max_conc"),
        F.count(F.lit(1)).alias("n_changes"),
    ).select(
        F.date_format(F.timestamp_seconds(F.col("hr") * 3600), "yyyy-MM-dd HH:mm")
        .alias("hour"),
        F.col("max_conc").cast("long").alias("max_conc"),
        F.col("n_changes").cast("long").alias("n_changes"),
    )
