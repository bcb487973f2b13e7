"""E4 event/time-series queries (sessionize, as-of, funnels, forecasts, anomaly, causal) + their oracles.

Split from the original single-module registry (r6 verdict item 7);
bodies are unchanged — see git history of queries.py.
"""
from __future__ import annotations
from collections.abc import Callable
from concurrent.futures import ThreadPoolExecutor
from pyspark.sql import DataFrame, SparkSession, Window, functions as F
from ..operators import dedup, events, similarity, text
from ..operators.scale import fit_and_apply_scale
from ..operators.split import normalize_split, split_histogram_df
from ..operators.vocabulary import (
    apply_vocabulary,
    fit_vocabulary,
    fit_vocabulary_large,
)
from ._shared import (
    _changepoint_finalize,
    _daily_audit_suite,
    _daily_err,
    _daily_xy,
    _events,
    _pchart_finalize,
    _pearson_finalize,
    _t,
    _tenure_finalize,
)


def q_e4_weekend_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4/ops: Welch test of the value metric between weekday and
    weekend events — the same exact-moments machinery as e4_ab_test
    applied to a DERIVED calendar grouping (any row expression can be
    an experiment arm; no categorical column required)."""
    from ..operators.profile import welch_ab_test

    ev = _events(spark, sf_dir).withColumn(
        "grp",
        F.when(F.dayofweek("ts").isin([1, 7]), F.lit("weekend")).otherwise(
            F.lit("weekday")
        ),
    )
    return welch_ab_test(ev, "grp", "value", "weekday", "weekend")

ORACLE_E4_WEEKEND_EFFECT = """
WITH ev AS (
  SELECT value,
         CASE WHEN dayofweek(ts) IN (0, 6) THEN 'weekend'
              ELSE 'weekday' END AS g
  FROM events
),
m AS (
  SELECT g,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS s,
         CAST(sum(CAST(value * value AS DECIMAL(28,10))) AS DOUBLE) AS ss
  FROM ev GROUP BY g
),
one AS (
  SELECT
    max(CASE WHEN g = 'weekday' THEN n END) AS n_a,
    max(CASE WHEN g = 'weekday' THEN s END) AS s_a,
    max(CASE WHEN g = 'weekday' THEN ss END) AS ss_a,
    max(CASE WHEN g = 'weekend' THEN n END) AS n_b,
    max(CASE WHEN g = 'weekend' THEN s END) AS s_b,
    max(CASE WHEN g = 'weekend' THEN ss END) AS ss_b
  FROM m
),
d AS (
  SELECT n_a, n_b,
         s_a / n_a AS ma, s_b / n_b AS mb,
         (ss_a - s_a * s_a / n_a) / (n_a - 1.0) AS va,
         (ss_b - s_b * s_b / n_b) / (n_b - 1.0) AS vb
  FROM one
),
t AS (
  SELECT n_a, n_b, ma, mb, va, vb,
         CASE WHEN va / n_a + vb / n_b > 0
              THEN (ma - mb) / sqrt(va / n_a + vb / n_b) END AS tt,
         CASE WHEN (va / n_a) * (va / n_a) / (n_a - 1.0)
                   + (vb / n_b) * (vb / n_b) / (n_b - 1.0) > 0
              THEN ((va / n_a + vb / n_b) * (va / n_a + vb / n_b)) /
                   ((va / n_a) * (va / n_a) / (n_a - 1.0)
                    + (vb / n_b) * (vb / n_b) / (n_b - 1.0)) END AS dof
  FROM d
)
SELECT 'weekday' AS group_a, 'weekend' AS group_b, n_a, n_b,
       round(ma, 6) AS mean_a, round(mb, 6) AS mean_b,
       round(va, 6) AS var_a, round(vb, 6) AS var_b,
       round(tt, 6) AS t_stat, round(dof, 6) AS dof,
       coalesce(abs(tt) > 1.96, false) AS significant
FROM t
"""

def q_e4_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4: one-step-ahead seasonal-naive forecast per event type —
    the last day's trend level plus the next day-of-week's seasonal
    component from the classical decomposition (the standard baseline
    every forecasting pipeline compares against). Pure composition
    over the seasonal output frame: two metadata-scale aggregates and
    a broadcast join; the event table is only touched by the
    decomposition itself."""
    from ..operators.events import seasonal_decompose_daily

    s = seasonal_decompose_daily(
        _events(spark, sf_dir), "event_type", "ts", "value", period=7
    )
    wt = s.where(F.col("trend").isNotNull())
    last = wt.groupBy("event_type").agg(F.max("day").alias("day"))
    base = wt.join(last, ["event_type", "day"]).select(
        "event_type", "day", "dow", "trend"
    )
    seas = (
        s.where(F.col("seasonal").isNotNull())
        .groupBy(F.col("event_type").alias("__t"), F.col("dow").alias("__d"))
        .agg(F.max("seasonal").alias("__s"))
    )
    j = base.join(
        F.broadcast(seas),
        (base["event_type"] == seas["__t"])
        & (seas["__d"] == (base["dow"] + 1) % 7),
        "left",
    )
    return j.select(
        "event_type",
        F.date_format(F.date_add(F.to_date("day"), 1), "yyyy-MM-dd").alias(
            "forecast_day"
        ),
        F.round(
            F.col("trend") + F.coalesce(F.col("__s"), F.lit(0.0)), 6
        ).alias("forecast"),
    )

def _oracle_forecast() -> str:
    return f"""
WITH sd AS ({ORACLE_E4_SEASONAL}),
wt AS (SELECT * FROM sd WHERE trend IS NOT NULL),
last AS (SELECT event_type, max(day) AS day FROM wt GROUP BY 1),
base AS (SELECT wt.* FROM wt JOIN last USING (event_type, day)),
seas AS (
  SELECT event_type, dow, max(seasonal) AS s2
  FROM sd WHERE seasonal IS NOT NULL GROUP BY 1, 2
)
SELECT base.event_type,
       strftime(CAST(base.day AS DATE) + 1, '%Y-%m-%d') AS forecast_day,
       round(base.trend + coalesce(seas.s2, 0), 6) AS forecast
FROM base LEFT JOIN seas
  ON seas.event_type = base.event_type AND seas.dow = (base.dow + 1) % 7
"""

def q_e4_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    dec = F.col("value").cast("decimal(18,6)")
    return ev.groupBy(
        F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss").alias(
            "hour"
        ),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(dec).cast("double").alias("sum_value"),
        (F.sum(dec).cast("double") / F.count(F.lit(1))).alias("avg_value"),
    )

def q_e4_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention triangle: users cohorted by the Monday of
    their first-event week; each (cohort_week, week_offset) counts
    distinct cohort members active that week. The events->first-seen
    join reuses the user-key shuffle partitioning."""
    return events.cohort_retention(_events(spark, sf_dir), "user_id", "ts")

ORACLE_E4_RETENTION = """
WITH first AS (
  SELECT user_id, min(ts) AS f FROM events GROUP BY user_id
)
SELECT strftime(date_trunc('week', first.f)::DATE, '%Y-%m-%d') AS cohort_week,
       CAST(date_diff('day', date_trunc('week', first.f)::DATE,
                      date_trunc('week', e.ts)::DATE) // 7 AS BIGINT)
         AS week_offset,
       CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
FROM events e JOIN first USING (user_id)
GROUP BY 1, 2
"""

ORACLE_E4_HOURLY = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
       event_type,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_value
FROM events GROUP BY 1, 2
"""

def q_e4_partitioned_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly rollup over the DATE-PARTITIONED event layout, pruned to
    2024-01-10..2024-01-12: materializes events partitioned by
    ``event_date`` (the 100 TB event-lake layout), then aggregates only
    the three pruned day directories — the scan's PartitionFilters
    carry the date bounds (pinned in tests/test_plans.py)."""
    import hashlib as _hashlib
    import os as _os

    path = _os.path.join(
        "/tmp",
        f"trs_events_by_date_{_hashlib.md5(sf_dir.encode()).hexdigest()[:10]}",
    )
    # Materialize once per sf_dir (testdata is immutable; the path is
    # keyed by sf_dir): re-declaring the query — the bench warm run —
    # then measures the pruned scan, not a layout rewrite.
    if not _os.path.exists(_os.path.join(path, "_SUCCESS")):
        events.write_events_partitioned(_events(spark, sf_dir), path)
    index = spark.read.parquet(path)
    pruned = index.where(
        (F.col("event_date") >= F.lit("2024-01-10").cast("date"))
        & (F.col("event_date") <= F.lit("2024-01-12").cast("date"))
    )
    dec = F.col("value").cast("decimal(18,6)")
    return pruned.groupBy(
        F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss").alias(
            "hour"
        ),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(dec).cast("double").alias("sum_value"),
        (F.sum(dec).cast("double") / F.count(F.lit(1))).alias("avg_value"),
    )

ORACLE_E4_PARTITIONED_ROLLUP = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
       event_type,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_value
FROM events
WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-10' AND DATE '2024-01-12'
GROUP BY 1, 2
"""

def q_e4_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    sess = events.sessionize(_events(spark, sf_dir), gap_minutes=30)
    return sess.select(
        "user_id",
        F.col("session_seq").cast("long").alias("session_seq"),
        "n_events",
        "session_start",
        "session_end",
        "duration_s",
    )

ORACLE_E4_SESSIONIZE = """
WITH flagged AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN epoch_us(ts) // 1000000 - lag(epoch_us(ts) // 1000000)
              OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
sid AS (
  SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM flagged
)
SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
       count(*) AS n_events,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
       max(epoch_us(ts) // 1000000) - min(epoch_us(ts) // 1000000) AS duration_s
FROM sid GROUP BY user_id, session_seq
"""

def q_e4_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping 1-hour windows every 15 minutes: each event lands in 4
    windows (F.window expansion), then one partial-aggregated groupBy.
    Decimal sums for engine-portable exactness."""
    ev = _events(spark, sf_dir)
    win = F.window(F.col("ts"), "1 hour", "15 minutes")
    dec = F.col("value").cast("decimal(18,6)")
    return ev.groupBy(
        F.date_format(win.start, "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(dec).cast("double").alias("sum_value"),
    )

ORACLE_E4_SLIDING = """
SELECT strftime(make_timestamp((epoch_us(ts) // 900000000) * 900000000
                               - k * 900000000), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events, (SELECT unnest(range(4)) AS k)
GROUP BY 1, 2
"""

def q_e4_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of JOIN (trades/quotes pattern): every click gets the user's
    latest purchase value at-or-before its timestamp, via the
    union+window single-shuffle formulation. The right side is deduped
    to one row per (user, ts) so tie semantics are engine-portable;
    oracle uses DuckDB's native ASOF LEFT JOIN."""
    ev = _events(spark, sf_dir)
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max_by("value", "event_id").alias("purchase_value"))
    )
    joined = events.asof_join(
        clicks, purchases, "user_id", "ts", right_cols=("purchase_value",)
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        "purchase_value_asof",
    )

ORACLE_E4_ASOF_JOIN = """
WITH clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
),
purch AS (
  SELECT user_id, ts, max_by(value, event_id) AS purchase_value
  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
)
SELECT c.event_id, c.user_id,
       strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS ts,
       p.purchase_value AS purchase_value_asof
FROM clicks c ASOF LEFT JOIN purch p
  ON c.user_id = p.user_id AND c.ts >= p.ts
"""

def q_e4_asof_join_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a bounded lookback (pandas merge_asof tolerance
    semantics): matches older than 1 hour yield NULL."""
    ev = _events(spark, sf_dir)
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max_by("value", "event_id").alias("purchase_value"))
    )
    joined = events.asof_join(
        clicks,
        purchases,
        "user_id",
        "ts",
        right_cols=("purchase_value",),
        tolerance_seconds=3600,
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        "purchase_value_asof",
    )

ORACLE_E4_ASOF_JOIN_TOLERANCE = """
WITH clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
),
purch AS (
  SELECT user_id, ts, max_by(value, event_id) AS purchase_value
  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
)
SELECT c.event_id, c.user_id,
       strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS ts,
       CASE WHEN epoch_us(c.ts) - epoch_us(p.ts) <= 3600000000
            THEN p.purchase_value END AS purchase_value_asof
FROM clicks c ASOF LEFT JOIN purch p
  ON c.user_id = p.user_id AND c.ts >= p.ts
"""

def q_e4_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join, direction='nearest' (pandas merge_asof semantics):
    each click matches the CLOSEST purchase in time within 1 hour,
    backward or forward, tie -> backward. Same union+two-window plan as
    the backward join — the second direction costs one in-partition
    sort, not a second shuffle."""
    ev = _events(spark, sf_dir)
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max_by("value", "event_id").alias("purchase_value"))
    )
    joined = events.asof_join(
        clicks,
        purchases,
        "user_id",
        "ts",
        right_cols=("purchase_value",),
        tolerance_seconds=3600,
        direction="nearest",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        F.col("purchase_value_asof"),
    )

ORACLE_E4_ASOF_NEAREST = """
WITH clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
),
purch AS (
  SELECT user_id, ts, max_by(value, event_id) AS purchase_value
  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
),
cand AS (
  SELECT c.event_id, c.user_id, c.ts, p.purchase_value,
         abs(epoch_us(c.ts) - epoch_us(p.ts)) AS dist,
         CASE WHEN p.ts <= c.ts THEN 0 ELSE 1 END AS fwd
  FROM clicks c JOIN purch p
    ON c.user_id = p.user_id
   AND abs(epoch_us(c.ts) - epoch_us(p.ts)) <= 3600000000
),
best AS (
  SELECT event_id, purchase_value,
         row_number() OVER (PARTITION BY event_id ORDER BY dist, fwd) AS rn
  FROM cand
)
SELECT c.event_id, c.user_id,
       strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS ts,
       b.purchase_value AS purchase_value_asof
FROM clicks c LEFT JOIN (SELECT event_id, purchase_value FROM best WHERE rn = 1) b
  ON c.event_id = b.event_id
"""

def q_e4_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA of event values in event-time order (alpha=0.3) —
    the batch analog of a stateful streaming smoother; sequential fold
    per key after one key-partitioned shuffle."""
    return events.ewma_by_key(_events(spark, sf_dir), "user_id", "ts", "value")

ORACLE_E4_EWMA = """
WITH ordered AS (
  SELECT user_id,
         list(value::DOUBLE ORDER BY ts, event_id) AS vals
  FROM events GROUP BY user_id
)
SELECT user_id, CAST(len(vals) AS BIGINT) AS n_events,
       round(list_reduce(vals, (acc, x) -> acc * 0.7 + x * 0.3), 6) AS ewma
FROM ordered
"""

def q_e4_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props: JSON field extraction (JVM-side
    get_json_object, no UDF) + grouped rollup over the extracted key."""
    ev = _events(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )

ORACLE_E4_JSON_PROPS = """
SELECT event_type,
       count(*) AS n_events,
       CAST(sum((props->>'k')::BIGINT) AS BIGINT) AS sum_k,
       min((props->>'k')::BIGINT) AS min_k,
       max((props->>'k')::BIGINT) AS max_k
FROM events GROUP BY event_type
"""

def q_e4_asof_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    return events.asof_latest(_events(spark, sf_dir), "2024-01-15 00:00:00")

ORACLE_E4_ASOF = """
WITH ranked AS (
  SELECT user_id, ts, value, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn,
         max(ts) OVER (PARTITION BY user_id) AS max_ts
  FROM events WHERE ts <= TIMESTAMP '2024-01-15 00:00:00'
)
SELECT user_id,
       strftime(max_ts, '%Y-%m-%d %H:%M:%S') AS asof_ts,
       value AS asof_value,
       event_type AS asof_type
FROM ranked WHERE rn = 1
"""

def q_e4_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-step conversion funnel (click -> purchase within 1h): one
    window pass computes each event's next-purchase timestamp (reversed
    running min), so busy users cost a sort, never a per-user quadratic
    self-join."""
    return events.funnel(
        _events(spark, sf_dir), "user_id", "ts",
        step_a="click", step_b="purchase", max_gap_seconds=3600,
    )

ORACLE_E4_FUNNEL = """
WITH e AS (
  SELECT user_id, event_id, event_type, ts,
         min(CASE WHEN event_type = 'purchase' THEN ts END) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_b
  FROM events
), a AS (
  SELECT *, next_b <= ts + INTERVAL 3600 SECONDS AS conv
  FROM e WHERE event_type = 'click'
)
SELECT user_id,
       count(*) AS n_a,
       CAST(sum(CASE WHEN conv THEN 1 ELSE 0 END) AS BIGINT) AS n_converted,
       strftime(min(CASE WHEN conv THEN ts END), '%Y-%m-%d %H:%M:%S')
         AS first_conv_a_ts,
       strftime(min(CASE WHEN conv THEN next_b END), '%Y-%m-%d %H:%M:%S')
         AS first_conv_b_ts
FROM a GROUP BY user_id
"""

def q_e4_hll_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic HyperLogLog distinct-user estimate over events
    (m=1024 registers; md5-derived register/rho so the sketch is
    bit-reproducible across engines — Spark's approx_count_distinct
    is not)."""
    from ..operators.sketches import hll_distinct

    return hll_distinct(_events(spark, sf_dir), "user_id", b=10)

ORACLE_E4_HLL_USERS = """
WITH h AS (
  SELECT ('0x' || substr(md5(':' || user_id::VARCHAR), 1, 12))::BIGINT AS h48
  FROM events
),
parts AS (
  SELECT (h48 // 4294967296) % 1024 AS reg, h48 % 4294967296 AS tail FROM h
),
regs AS (
  SELECT reg,
         max(CASE WHEN tail = 0 THEN 33 ELSE 33 - length(bin(tail)) END) AS max_rho
  FROM parts GROUP BY reg
),
agg AS (
  SELECT sum(power(2.0, -max_rho)) AS inv_sum, count(*) AS n_nonzero FROM regs
)
SELECT CAST(round(CASE WHEN raw_est <= 2560.0 AND n_zero_registers > 0
                  THEN 1024 * ln(1024.0 / n_zero_registers)
                  ELSE raw_est END) AS BIGINT) AS n_distinct_est,
       CAST(1024 AS BIGINT) AS n_registers,
       n_zero_registers
FROM (
  SELECT round(0.7213 / (1.0 + 1.079 / 1024) * 1024 * 1024
               / (inv_sum + (1024 - n_nonzero)), 4) AS raw_est,
         CAST(1024 - n_nonzero AS BIGINT) AS n_zero_registers
  FROM agg
)
"""

def q_e4_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 3-day distinct-user estimate per day from MERGED daily
    HLL sketches — windows combine stored registers (max), never
    re-scan events; the sketch-algebra pattern behind every
    DAU/WAU/MAU dashboard at scale."""
    from ..operators.sketches import hll_rolling_distinct

    return hll_rolling_distinct(
        _events(spark, sf_dir), "user_id", "ts", window_days=3, b=10
    )

ORACLE_E4_ROLLING_DISTINCT = """
WITH h AS (
  SELECT CAST(ts AS DATE) AS day,
         ('0x' || substr(md5(':' || user_id::VARCHAR), 1, 12))::BIGINT AS h48
  FROM events
),
daily AS (
  SELECT day, (h48 // 4294967296) % 1024 AS reg,
         max(CASE WHEN h48 % 4294967296 = 0 THEN 33
                  ELSE 33 - length(bin(h48 % 4294967296)) END) AS max_rho
  FROM h GROUP BY day, reg
),
active AS (SELECT DISTINCT day AS wday FROM daily),
contrib AS (
  SELECT w.wday, d.reg, d.max_rho
  FROM daily d
  JOIN active w ON w.wday >= d.day AND w.wday <= d.day + INTERVAL 2 DAY
),
merged AS (
  SELECT wday, reg, max(max_rho) AS max_rho FROM contrib GROUP BY wday, reg
),
agg AS (
  SELECT wday, sum(power(2.0, -max_rho)) AS inv_sum, count(*) AS n_nonzero
  FROM merged GROUP BY wday
)
SELECT strftime(wday, '%Y-%m-%d') AS day,
       CAST(round(CASE WHEN raw_est <= 2560.0 AND nz > 0
                  THEN 1024 * ln(1024.0 / nz) ELSE raw_est END) AS BIGINT)
         AS n_distinct_est
FROM (
  SELECT wday,
         round(0.7213 / (1.0 + 1.079 / 1024) * 1024 * 1024
               / (inv_sum + (1024 - n_nonzero)), 4) AS raw_est,
         CAST(1024 - n_nonzero AS BIGINT) AS nz
  FROM agg
)
"""

def q_e4_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4: calendar resample per user — dense daily grid between each
    user's first and last active day, zero-filled with an LOCF carry of
    the last active day's sum (feature-store densification)."""
    return events.gap_fill_daily(_events(spark, sf_dir), "user_id", "ts", "value")

ORACLE_E4_GAP_FILL = """
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS n,
         sum(CAST(value AS DECIMAL(18,6))) AS s
  FROM events GROUP BY user_id, CAST(ts AS DATE)
),
span AS (
  SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY user_id
),
grid AS (
  SELECT user_id, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
  FROM span
)
SELECT g.user_id, strftime(g.day, '%Y-%m-%d') AS day,
       CAST(coalesce(d.n, 0) AS BIGINT) AS n_events,
       round(CAST(coalesce(d.s, 0) AS DOUBLE), 6) AS sum_value,
       round(CAST(last_value(d.s IGNORE NULLS) OVER (
           PARTITION BY g.user_id ORDER BY g.day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 6)
         AS locf_value
FROM grid g LEFT JOIN daily d ON g.user_id = d.user_id AND g.day = d.day
"""

def q_e4_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4: trailing-window anomaly detection — z-score of each event's
    value against the user's previous 20 events, |z| > 3 flagged."""
    return events.rolling_zscore(
        _events(spark, sf_dir), "user_id", "ts", "value", n=20, z_threshold=3.0
    )

ORACLE_E4_ANOMALY = """
WITH base AS (
  SELECT event_id, user_id, ts, value,
         count(*) OVER w AS np,
         CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS s,
         CAST(sum(CAST(value * value AS DECIMAL(28,10))) OVER w AS DOUBLE) AS ss
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
)
SELECT event_id, user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts, value,
       CAST(np AS BIGINT) AS n_prior,
       round(CASE WHEN np >= 2 AND (ss - s * s / np) / (np - 1) > 0
                  THEN (value - s / np) / sqrt((ss - s * s / np) / (np - 1))
             END, 6) AS z,
       CASE WHEN np >= 2 AND (ss - s * s / np) / (np - 1) > 0
            THEN abs((value - s / np) / sqrt((ss - s * s / np) / (np - 1))) > 3.0
            ELSE FALSE END AS is_anomaly
FROM base
"""

def q_e4_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4/A4: percentile clipping of event values at the exact
    interpolated [p1, p99] per event type — fit is one tiny per-group
    aggregate broadcast back over the fact table."""
    from ..operators.scale import winsorize

    return winsorize(
        _events(spark, sf_dir).select("event_id", "event_type", "value"),
        "value",
        group_col="event_type",
        lower_q=0.01,
        upper_q=0.99,
    ).select("event_id", "event_type", "value", "value_wins")

ORACLE_E4_WINSORIZE = """
WITH b AS (
  SELECT event_type,
         quantile_cont(value, 0.01) AS lo,
         quantile_cont(value, 0.99) AS hi
  FROM events GROUP BY event_type
)
SELECT e.event_id, e.event_type, e.value,
       round(least(greatest(e.value, b.lo), b.hi), 6) AS value_wins
FROM events e JOIN b USING (event_type)
"""

def q_e4_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4: Population Stability Index drift monitor — value distribution
    of week 4 (Jan 22+) vs the week-1 reference (before Jan 8), decile
    bins fitted on the reference, per event type."""
    from ..operators.drift import psi_drift

    ev = _events(spark, sf_dir)
    ref = ev.where(F.col("ts") < F.lit("2024-01-08").cast("timestamp"))
    cur = ev.where(F.col("ts") >= F.lit("2024-01-22").cast("timestamp"))
    return psi_drift(ref, cur, "event_type", "value", bins=10)

ORACLE_E4_PSI_DRIFT = """
WITH ref AS (
  SELECT event_type, value FROM events WHERE ts < TIMESTAMP '2024-01-08'
),
cur AS (
  SELECT event_type, value FROM events WHERE ts >= TIMESTAMP '2024-01-22'
),
edges AS (
  SELECT event_type,
         quantile_cont(value, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9])
           AS es
  FROM ref GROUP BY event_type
),
rbin AS (
  SELECT r.event_type, 1 + len(list_filter(e.es, x -> r.value > x)) AS bin
  FROM ref r JOIN edges e USING (event_type)
),
cbin AS (
  SELECT c.event_type, 1 + len(list_filter(e.es, x -> c.value > x)) AS bin
  FROM cur c JOIN edges e USING (event_type)
),
rc AS (SELECT event_type, bin, count(*) AS nr FROM rbin GROUP BY 1, 2),
cc AS (SELECT event_type, bin, count(*) AS nc FROM cbin GROUP BY 1, 2),
b AS (
  SELECT coalesce(rc.event_type, cc.event_type) AS event_type,
         coalesce(rc.bin, cc.bin) AS bin,
         coalesce(nr, 0) AS nr, coalesce(nc, 0) AS nc
  FROM rc FULL OUTER JOIN cc
    ON rc.event_type = cc.event_type AND rc.bin = cc.bin
),
tot AS (SELECT event_type, sum(nr) AS tr, sum(nc) AS tc FROM b GROUP BY event_type),
terms AS (
  SELECT b.event_type, b.bin, t.tr, t.tc,
         (greatest(CAST(nr AS DOUBLE) / tr, 1e-6)
          - greatest(CAST(nc AS DOUBLE) / tc, 1e-6))
         * ln(greatest(CAST(nr AS DOUBLE) / tr, 1e-6)
              / greatest(CAST(nc AS DOUBLE) / tc, 1e-6)) AS term
  FROM b JOIN tot t USING (event_type)
)
SELECT event_type,
       CAST(max(tr) AS BIGINT) AS n_ref,
       CAST(max(tc) AS BIGINT) AS n_cur,
       round(list_reduce(list(term ORDER BY bin), (a, x) -> a + x), 6) AS psi
FROM terms GROUP BY event_type
"""

def q_e4_daily_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4/E6: per-day ingest quality gate — the expectation suite
    grouped by event day (completeness, value bounds, type domain,
    daily volume), one shuffle keyed by day."""
    from ..operators.audit import check_expectations_grouped

    ev = _events(spark, sf_dir).withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    return check_expectations_grouped(ev, ["day"], _daily_audit_suite())

ORACLE_E4_DAILY_AUDIT = """
WITH m AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day,
         round(avg(CASE WHEN props IS NOT NULL THEN 1.0 ELSE 0.0 END), 6)
           AS m0,
         round(CAST(min(value) AS DOUBLE), 6) AS m1,
         round(avg(CASE WHEN event_type IN
                   ('click', 'error', 'purchase', 'signup', 'view')
                   THEN 1.0 ELSE 0.0 END), 6) AS m2,
         round(CAST(count(*) AS DOUBLE), 6) AS m3
  FROM events GROUP BY 1
)
SELECT day, 'not_null(props)' AS check_name, m0 AS value,
       m0 >= 1.0 AS passed FROM m
UNION ALL SELECT day, 'min(value)>=0.0', m1, m1 >= 0.0 FROM m
UNION ALL SELECT day, 'accepted_values(event_type)', m2, m2 >= 1.0 FROM m
UNION ALL SELECT day, 'row_count>=300', m3, m3 >= 300.0 FROM m
"""

def q_e4_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4: classical additive seasonal decomposition of the per-type
    daily value series — centered 7-day rolling-mean trend, day-of-week
    seasonal, residual. Exact-decimal daily sums and quantized
    detrending pin engine parity."""
    from ..operators.events import seasonal_decompose_daily

    return seasonal_decompose_daily(
        _events(spark, sf_dir), "event_type", "ts", "value", period=7
    )

ORACLE_E4_SEASONAL = """
WITH daily AS (
  SELECT event_type, date_trunc('day', ts)::DATE AS d,
         sum(CAST(value AS DECIMAL(18,6))) AS s
  FROM events GROUP BY 1, 2
),
tr AS (
  SELECT event_type, d, s,
         CASE WHEN count(*) OVER w = 7
              THEN CAST(sum(s) OVER w AS DOUBLE) / 7.0 END AS trend
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY d
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
det AS (
  SELECT *, dayofweek(d) AS dw,
         CAST(CAST(s AS DOUBLE) - trend AS DECIMAL(18,6)) AS dtr
  FROM tr
),
seas AS (
  SELECT event_type, dw,
         CASE WHEN count(dtr) > 0
              THEN round(CAST(sum(dtr) AS DOUBLE) / count(dtr), 6) END
           AS seasonal
  FROM det GROUP BY 1, 2
)
SELECT det.event_type,
       strftime(det.d, '%Y-%m-%d') AS day,
       CAST(det.dw AS BIGINT) AS dow,
       round(CAST(det.s AS DOUBLE), 6) AS daily_value,
       round(det.trend, 6) AS trend,
       CASE WHEN det.trend IS NOT NULL THEN seas.seasonal END AS seasonal,
       CASE WHEN det.trend IS NOT NULL
            THEN round(CAST(det.s AS DOUBLE) - det.trend - seas.seasonal, 6)
       END AS residual
FROM det JOIN seas USING (event_type, dw)
"""

def q_e4_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4: click->purchase attribution — every purchase within 1 hour
    of a click by the same user. Equi-join on the user key with the
    time range as a residual predicate (no range-probe cross
    product)."""
    from ..operators.events import attribution_join

    ev = _events(spark, sf_dir)
    return attribution_join(
        ev.where(F.col("event_type") == "click"),
        ev.where(F.col("event_type") == "purchase"),
        horizon_seconds=3600,
    )

ORACLE_E4_ATTRIBUTION = """
SELECT a.user_id AS user,
       a.event_id AS src_id,
       b.event_id AS dst_id,
       strftime(a.ts, '%Y-%m-%d %H:%M:%S') AS src_ts,
       strftime(b.ts, '%Y-%m-%d %H:%M:%S') AS dst_ts,
       CAST(epoch_us(b.ts) - epoch_us(a.ts) AS BIGINT) AS lag_us
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
WHERE a.event_type = 'click' AND b.event_type = 'purchase'
"""

def q_e4_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4: mergeable histogram-sketch quantiles of the event value per
    type (50 fixed bins over [0, 500], linear interpolation within the
    hit bin) — the approx-quantile shape whose per-group state is
    bounded by the bin count, so it survives streaming state stores
    and 100 TB groupBys where exact `percentile` cannot."""
    from ..operators.sketches import histogram_quantiles, value_histogram

    counts = value_histogram(
        _events(spark, sf_dir), ["event_type"], "value", 0.0, 500.0, 50
    )
    return histogram_quantiles(counts, ["event_type"], 0.0, 500.0, 50)

ORACLE_E4_VALUE_QUANTILES = """
WITH b AS (
  SELECT event_type,
         CAST(least(greatest(floor((value - 0.0) / 10.0), 0), 49) AS BIGINT)
           AS bin
  FROM events
),
c AS (SELECT event_type, bin, count(*) AS cnt FROM b GROUP BY 1, 2),
cum AS (
  SELECT event_type, bin, cnt,
         sum(cnt) OVER (PARTITION BY event_type ORDER BY bin) AS cum
  FROM c
),
tot AS (SELECT event_type, sum(cnt) AS n FROM c GROUP BY 1),
qs AS (SELECT unnest([0.5, 0.9, 0.99]) AS q),
sel AS (
  SELECT cum.event_type, q, n,
         arg_min(bin, bin) AS bin,
         arg_min(cnt, bin) AS cnt,
         arg_min(cum, bin) AS cum
  FROM cum JOIN tot USING (event_type) CROSS JOIN qs
  WHERE cum >= q * n
  GROUP BY 1, 2, 3
),
est AS (
  SELECT event_type, q, n,
         round(0.0 + 10.0 * (bin + (q * n - (cum - cnt)) / cnt), 6) AS est
  FROM sel
)
SELECT event_type,
       CAST(max(n) AS BIGINT) AS n,
       max(CASE WHEN q = 0.5 THEN est END) AS p50_est,
       max(CASE WHEN q = 0.9 THEN est END) AS p90_est,
       max(CASE WHEN q = 0.99 THEN est END) AS p99_est
FROM est GROUP BY 1
"""

def q_e4_trending(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4: day-over-day trend detection — each event type's daily rank
    by volume plus its rank change vs the previous observed day (the
    'trending now' primitive behind ops dashboards and data-mixture
    monitors). Two bounded windows over the (day x type) aggregate —
    the raw event table collapses ~1e4:1 in one partial-aggregated
    groupBy before anything wide happens. The rank/lag finalize is
    shared verbatim with the streaming twin (s16)."""
    return events.trend_ranks(
        events.daily_type_counts(_events(spark, sf_dir))
    )

ORACLE_E4_TRENDING = """
WITH daily AS (
  SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day, event_type,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2
),
ranked AS (
  SELECT day, event_type, n_events,
         CAST(row_number() OVER (PARTITION BY day
              ORDER BY n_events DESC, event_type) AS BIGINT) AS rnk
  FROM daily
)
SELECT day, event_type, n_events, rnk,
       CAST(lag(rnk) OVER (PARTITION BY event_type ORDER BY day) AS BIGINT)
         AS prev_rnk,
       CAST(lag(rnk) OVER (PARTITION BY event_type ORDER BY day) - rnk
            AS BIGINT) AS rank_delta
FROM ranked
"""

def q_e4_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4: per-user CUSUM change-point detection (Page's two-sided
    cumulative-sum chart, slack 5 / threshold 50 around the user's own
    mean) — the classic drift detector for event-value series; runs as
    a key-partitioned higher-order fold, same plan shape as e4_ewma."""
    return events.cusum_changepoints(
        _events(spark, sf_dir), slack=5.0, threshold=50.0
    )

ORACLE_E4_CUSUM = """
WITH ordered AS (
  SELECT user_id,
         list(value::DOUBLE ORDER BY ts, event_id) AS vals,
         round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
               / CAST(count(*) AS DOUBLE), 6) AS m
  FROM events GROUP BY user_id
),
folded AS (
  SELECT user_id, vals, m,
         list_reduce(
           list_prepend([0.0, 0.0, 0.0], list_transform(vals, v -> [v, 0.0, 0.0])),
           (acc, xe) -> CASE
             WHEN greatest(0.0, acc[1] + (xe[1] - m - 5.0)) > 50.0
                  OR greatest(0.0, acc[2] + (m - xe[1] - 5.0)) > 50.0
             THEN [0.0, 0.0, acc[3] + 1.0]
             ELSE [greatest(0.0, acc[1] + (xe[1] - m - 5.0)),
                   greatest(0.0, acc[2] + (m - xe[1] - 5.0)),
                   acc[3]]
           END
         ) AS st
  FROM ordered
)
SELECT user_id, CAST(len(vals) AS BIGINT) AS n_events, m AS mean,
       CAST(st[3] AS BIGINT) AS n_alarms,
       round(st[1], 6) AS final_sp,
       round(st[2], 6) AS final_sn
FROM folded
"""

def q_e4_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4/ops: Welch's unequal-variance two-sample test comparing the
    value metric between 'click' and 'purchase' events — one
    partial-aggregated moments pass (three exact-decimal numbers per
    side cross the shuffle), then a fixed double expression tree for
    t / Welch-Satterthwaite dof."""
    from ..operators.profile import welch_ab_test

    return welch_ab_test(
        _events(spark, sf_dir), "event_type", "value", "click", "purchase"
    )

ORACLE_E4_AB_TEST = """
WITH m AS (
  SELECT event_type AS g,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS s,
         CAST(sum(CAST(value * value AS DECIMAL(28,10))) AS DOUBLE) AS ss
  FROM events WHERE event_type IN ('click', 'purchase')
  GROUP BY event_type
),
one AS (
  SELECT
    max(CASE WHEN g = 'click' THEN n END) AS n_a,
    max(CASE WHEN g = 'click' THEN s END) AS s_a,
    max(CASE WHEN g = 'click' THEN ss END) AS ss_a,
    max(CASE WHEN g = 'purchase' THEN n END) AS n_b,
    max(CASE WHEN g = 'purchase' THEN s END) AS s_b,
    max(CASE WHEN g = 'purchase' THEN ss END) AS ss_b
  FROM m
),
d AS (
  SELECT n_a, n_b,
         s_a / n_a AS ma, s_b / n_b AS mb,
         (ss_a - s_a * s_a / n_a) / (n_a - 1.0) AS va,
         (ss_b - s_b * s_b / n_b) / (n_b - 1.0) AS vb
  FROM one
),
t AS (
  SELECT n_a, n_b, ma, mb, va, vb,
         CASE WHEN va / n_a + vb / n_b > 0
              THEN (ma - mb) / sqrt(va / n_a + vb / n_b) END AS tt,
         CASE WHEN (va / n_a) * (va / n_a) / (n_a - 1.0)
                   + (vb / n_b) * (vb / n_b) / (n_b - 1.0) > 0
              THEN ((va / n_a + vb / n_b) * (va / n_a + vb / n_b)) /
                   ((va / n_a) * (va / n_a) / (n_a - 1.0)
                    + (vb / n_b) * (vb / n_b) / (n_b - 1.0)) END AS dof
  FROM d
)
SELECT 'click' AS group_a, 'purchase' AS group_b, n_a, n_b,
       round(ma, 6) AS mean_a, round(mb, 6) AS mean_b,
       round(va, 6) AS var_a, round(vb, 6) AS var_b,
       round(tt, 6) AS t_stat, round(dof, 6) AS dof,
       coalesce(abs(tt) > 1.96, false) AS significant
FROM t
"""

def q_e4_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 inter-arrival profile: per-user gap statistics (mean, p50,
    p95, max, coefficient of variation) — the burstiness fingerprint
    that separates bots/scrapers from organic users. Lag window keyed
    per user; events collapse to one row per user before anything
    wide."""
    from ..operators.events import interarrival_stats

    return interarrival_stats(_t(spark, sf_dir, "events"))

ORACLE_E4_INTERARRIVAL = """
WITH g AS (
  SELECT user_id,
         (epoch_us(ts) - lag(epoch_us(ts))
            OVER (PARTITION BY user_id ORDER BY ts, event_id)) / 1e6 AS gap_s
  FROM events
)
SELECT user_id AS user,
       count(*) AS n_events,
       round(avg(gap_s), 4) AS mean_gap_s,
       round(quantile_cont(gap_s, 0.5), 4) AS p50_gap_s,
       round(quantile_cont(gap_s, 0.95), 4) AS p95_gap_s,
       round(max(gap_s), 4) AS max_gap_s,
       round(stddev_samp(gap_s) / nullif(avg(gap_s), 0.0), 4) AS burstiness
FROM g GROUP BY user_id
"""

def q_e4_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 first-order Markov transition matrix over per-user event
    sequences — P(next type | current type), the session-modeling
    staple. One per-user lag window, then type-cardinality-bounded
    aggregates with a broadcast normalizing join."""
    from ..operators.events import transition_matrix

    return transition_matrix(_t(spark, sf_dir, "events"))

ORACLE_E4_MARKOV = """
WITH pairs AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS from_type,
         event_type AS to_type
  FROM events
),
c AS (
  SELECT from_type, to_type, count(*) AS n
  FROM pairs WHERE from_type IS NOT NULL
  GROUP BY 1, 2
)
SELECT from_type, to_type, n,
       round(CAST(n AS DOUBLE)
             / sum(n) OVER (PARTITION BY from_type), 6) AS p
FROM c
"""

def q_e4_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 trend magnitude: closed-form OLS slope/intercept of each
    event type's daily volume over the day index — the "growing, and
    how fast" number next to e4_trending's ordinal ranks. Regression
    moments are exact integer sums over the bounded (day x type)
    aggregate; the only floating point is the final division."""
    from ..operators.events import daily_type_counts, trend_slope

    daily = daily_type_counts(_t(spark, sf_dir, "events"))
    return trend_slope(daily)

ORACLE_E4_TREND_SLOPE = """
WITH daily AS (
  SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day, event_type,
         count(*) AS n
  FROM events GROUP BY 1, 2
),
m AS (
  SELECT event_type,
         count(*) AS n_days,
         sum(datediff('day', DATE '1970-01-01', day::DATE)) AS sx,
         sum(n) AS sy,
         sum(datediff('day', DATE '1970-01-01', day::DATE) * n) AS sxy,
         sum(datediff('day', DATE '1970-01-01', day::DATE)
             * datediff('day', DATE '1970-01-01', day::DATE)) AS sxx
  FROM daily GROUP BY 1
)
SELECT event_type, n_days,
       round((n_days * sxy - sx * sy)
             / nullif(CAST(n_days * sxx - sx * sx AS DOUBLE), 0.0), 6)
         AS slope,
       round((sy - (n_days * sxy - sx * sy)
                   / nullif(CAST(n_days * sxx - sx * sx AS DOUBLE), 0.0)
                   * sx) / n_days, 6) AS intercept
FROM m
"""

def q_e4_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 adaptive forecasting: Holt double-exponential smoothing
    (level + trend state, a=0.5 / b=0.3) folded over each type's daily
    volumes — tracks a CHANGING trend where the OLS line and the
    seasonal-naive forecast cannot. Same key-partitioned higher-order
    fold shape as e4_cusum; oracle replays the fold with list_reduce."""
    from ..operators.events import daily_type_counts, holt_smoothing

    daily = daily_type_counts(_t(spark, sf_dir, "events"))
    return holt_smoothing(daily)

ORACLE_E4_HOLT = """
WITH daily AS (
  SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day, event_type,
         count(*) AS n
  FROM events GROUP BY 1, 2
),
ordered AS (
  SELECT event_type, list(n::DOUBLE ORDER BY day) AS vals
  FROM daily GROUP BY 1
),
folded AS (
  SELECT event_type, vals,
         list_reduce(
           list_prepend([0.0, 0.0, 0.0],
                        list_transform(vals, v -> [v, 0.0, 0.0])),
           (acc, xe) -> CASE WHEN acc[3] = 0.0
             THEN [xe[1], 0.0, 1.0]
             ELSE [0.5 * xe[1] + 0.5 * (acc[1] + acc[2]),
                   0.3 * ((0.5 * xe[1] + 0.5 * (acc[1] + acc[2])) - acc[1])
                     + 0.7 * acc[2],
                   acc[3] + 1.0] END
         ) AS st
  FROM ordered
)
SELECT event_type, CAST(len(vals) AS BIGINT) AS n_days,
       round(st[1], 6) AS level,
       round(st[2], 6) AS trend,
       round(st[1] + st[2], 6) AS forecast_next
FROM folded
"""

def q_e4_type_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 co-occurrence lift between event types within (user, day)
    groups — P(a,b together) / (P(a) P(b)), the session-affinity
    signal behind next-event features and funnel discovery. The event
    table collapses to DISTINCT (user, day, type) rows first, every
    aggregate after that is bounded by the type alphabet (squared for
    pairs), and the marginal/total joins broadcast single-digit-row
    frames; lift divides exact integer counts once."""
    ev = _events(spark, sf_dir)
    ud = (
        ev.select(
            "user_id", F.to_date("ts").alias("day"), "event_type"
        )
        .distinct()
        .localCheckpoint(eager=True)  # feeds total, marginals, AND pairs
    )
    tot = (
        ud.select("user_id", "day")
        .distinct()
        .agg(F.count(F.lit(1)).cast("long").alias("__N"))
    )
    marg = ud.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("__m")
    )
    a = ud.select(
        "user_id", "day", F.col("event_type").alias("type_a")
    )
    b = ud.select(
        "user_id", "day", F.col("event_type").alias("type_b")
    )
    pairs = (
        a.join(b, ["user_id", "day"])
        .where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
    )
    ma = marg.select(F.col("event_type").alias("type_a"), F.col("__m").alias("__ma"))
    mb = marg.select(F.col("event_type").alias("type_b"), F.col("__m").alias("__mb"))
    return (
        pairs.join(F.broadcast(ma), "type_a")
        .join(F.broadcast(mb), "type_b")
        .crossJoin(F.broadcast(tot))
        .select(
            "type_a",
            "type_b",
            "n_ab",
            F.round(
                F.col("n_ab") * F.col("__N") / (F.col("__ma") * F.col("__mb")),
                6,
            ).alias("lift"),
        )
    )

ORACLE_E4_TYPE_AFFINITY = """
WITH ud AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day, event_type FROM events
),
tot AS (SELECT count(*) AS n FROM (SELECT DISTINCT user_id, day FROM ud)),
marg AS (SELECT event_type, count(*) AS m FROM ud GROUP BY 1),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b, count(*) AS n_ab
  FROM ud a JOIN ud b
    ON a.user_id = b.user_id AND a.day = b.day
   AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT type_a, type_b, n_ab,
       round(n_ab::DOUBLE * (SELECT n FROM tot) / (ma.m * mb.m), 6) AS lift
FROM pairs
JOIN marg ma ON ma.event_type = type_a
JOIN marg mb ON mb.event_type = type_b
"""

def q_e4_rate_spikes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 rate-spike audit: each user's PEAK events-per-hour and the
    hour it happened — the rate-limit / scraper-detection readout.
    Two partial-agg levels: (user, hour) counts with map-side
    combine, then a per-user argmax row_number on the bounded
    per-hour frame; users peaking >= 2 events/hour are flagged
    (the fixture's organic rate is ~1/hour). Ties break to the
    earliest hour — an explicit engine-portable tiebreak."""
    from pyspark.sql import Window

    ev = _events(spark, sf_dir)
    per_hour = ev.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    w = Window.partitionBy("user_id").orderBy(F.desc("n"), F.asc("hour"))
    return (
        per_hour.withColumn("__rk", F.row_number().over(w))
        .where((F.col("__rk") == 1) & (F.col("n") >= 2))
        .select(
            "user_id",
            F.date_format("hour", "yyyy-MM-dd HH:mm:ss").alias("peak_hour"),
            F.col("n").alias("peak_per_hour"),
        )
    )

ORACLE_E4_RATE_SPIKES = """
WITH pm AS (
  SELECT user_id, date_trunc('hour', ts) AS hour, count(*) AS n
  FROM events GROUP BY 1, 2
),
rk AS (
  SELECT user_id, hour, n,
         row_number() OVER (PARTITION BY user_id
              ORDER BY n DESC, hour) AS r
  FROM pm
)
SELECT user_id,
       strftime(hour, '%Y-%m-%d %H:%M:%S') AS peak_hour,
       n AS peak_per_hour
FROM rk WHERE r = 1 AND n >= 2
"""

def q_e4_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 engagement: each user's longest consecutive-day activity
    streak (gaps-and-islands rewrite, earliest-start tiebreak) —
    events collapse to distinct (user, day) before any window
    (operators/events.py activity_streaks)."""
    from ..operators.events import activity_streaks

    return activity_streaks(_t(spark, sf_dir, "events"))

ORACLE_E4_STREAKS = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
grp AS (
  SELECT user_id, day,
         CAST(day - DATE '1970-01-01' AS BIGINT)
           - row_number() OVER (PARTITION BY user_id ORDER BY day) AS g
  FROM days
),
streaks AS (
  SELECT user_id, count(*) AS streak_days,
         min(day) AS streak_start, max(day) AS streak_end
  FROM grp GROUP BY user_id, g
),
pick AS (
  SELECT *, row_number() OVER (PARTITION BY user_id
             ORDER BY streak_days DESC, streak_start) AS rk
  FROM streaks
)
SELECT user_id, CAST(streak_days AS BIGINT) AS streak_days,
       strftime(streak_start, '%Y-%m-%d') AS streak_start,
       strftime(streak_end, '%Y-%m-%d') AS streak_end
FROM pick WHERE rk = 1
"""

def q_e4_funnel3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 three-step funnel (view -> click within 1h -> purchase within
    1h of the click): two chained reversed-running-min window passes
    over ONE (user, ts, id) sort — the naive A x B x C double
    range-join is per-user cubic; this is linear per row after one
    shuffle (operators/events.py funnel3)."""
    from ..operators.events import funnel3

    return funnel3(
        _events(spark, sf_dir), "user_id", "ts",
        step_a="view", step_b="click", step_c="purchase",
        gap_ab_seconds=3600, gap_bc_seconds=3600,
    )

ORACLE_E4_FUNNEL3 = """
WITH e AS (
  SELECT user_id, event_id, event_type, ts,
         min(CASE WHEN event_type = 'purchase' THEN ts END) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_c
  FROM events
),
m AS (
  SELECT *,
         min(CASE WHEN event_type = 'click'
                   AND coalesce(next_c <= ts + INTERVAL 3600 SECONDS, false)
                  THEN ts END) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS b_conv_ts
  FROM e
),
a AS (
  SELECT user_id, ts,
         coalesce(b_conv_ts <= ts + INTERVAL 3600 SECONDS, false) AS full_conv
  FROM m WHERE event_type = 'view'
)
SELECT user_id,
       count(*) AS n_a,
       CAST(sum(CASE WHEN full_conv THEN 1 ELSE 0 END) AS BIGINT) AS n_full,
       strftime(min(CASE WHEN full_conv THEN ts END), '%Y-%m-%d %H:%M:%S')
         AS first_full_a_ts
FROM a GROUP BY user_id
"""

def q_e4_dau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 exact DAU/WAU stickiness per day: distinct (user, day) ->
    contribution-explode into the 7 trailing days -> second distinct +
    count — every stage partial-aggregates, no sliding count-distinct
    window anywhere (operators/events.py dau_stickiness; the exact
    companion to the mergeable-HLL e4_rolling_distinct)."""
    from ..operators.events import dau_stickiness

    return dau_stickiness(_events(spark, sf_dir), window_days=7)

ORACLE_E4_DAU_STICKINESS = """
WITH d AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
dau AS (SELECT day, count(*) AS dau FROM d GROUP BY day),
c AS (
  SELECT DISTINCT user_id, CAST(unnest(generate_series(day, day + INTERVAL 6 DAY,
                                      INTERVAL 1 DAY)) AS DATE) AS day
  FROM d
),
wau AS (SELECT day, count(*) AS wau FROM c GROUP BY day)
SELECT strftime(dau.day, '%Y-%m-%d') AS day,
       dau::BIGINT AS dau, wau::BIGINT AS wau,
       round(dau::DOUBLE / wau, 6) AS stickiness
FROM dau JOIN wau USING (day)
"""

def q_e4_ab_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 experiment power readout: minimum detectable effect at the
    observed click/purchase sample sizes and variances (two-sided
    alpha 0.05, 80% power) — the number that separates 'no effect'
    from 'underpowered'. Shares the Welch test's exact-decimal moment
    pass; one fixed double tree (operators/profile.py ab_power)."""
    from ..operators.profile import ab_power

    return ab_power(
        _events(spark, sf_dir), "event_type", "value", "click", "purchase"
    )

ORACLE_E4_AB_POWER = """
WITH m AS (
  SELECT event_type AS g,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS s,
         CAST(sum(CAST(value * value AS DECIMAL(28,10))) AS DOUBLE) AS ss
  FROM events WHERE event_type IN ('click', 'purchase')
  GROUP BY event_type
),
one AS (
  SELECT
    max(CASE WHEN g = 'click' THEN n END) AS n_a,
    max(CASE WHEN g = 'click' THEN s END) AS s_a,
    max(CASE WHEN g = 'click' THEN ss END) AS ss_a,
    max(CASE WHEN g = 'purchase' THEN n END) AS n_b,
    max(CASE WHEN g = 'purchase' THEN s END) AS s_b,
    max(CASE WHEN g = 'purchase' THEN ss END) AS ss_b
  FROM m
),
d AS (
  SELECT n_a, n_b,
         s_a / n_a AS ma,
         (ss_a - s_a * s_a / n_a) / (n_a - 1.0) AS va,
         (ss_b - s_b * s_b / n_b) / (n_b - 1.0) AS vb,
         2.8016 * sqrt((ss_a - s_a * s_a / n_a) / (n_a - 1.0) / n_a
                     + (ss_b - s_b * s_b / n_b) / (n_b - 1.0) / n_b) AS mde
  FROM one
)
SELECT 'click' AS group_a, 'purchase' AS group_b,
       n_a, n_b,
       round(ma, 6) AS mean_a, round(va, 6) AS var_a,
       round(vb, 6) AS var_b, round(mde, 6) AS mde_abs,
       round(CASE WHEN ma <> 0 THEN mde / ma END, 6) AS mde_rel
FROM d
"""

def q_e4_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 time-to-event readout: cohort conversion rate + exact
    interpolated median/p90 hours from first signup to the first
    purchase after it — min-start partial agg joined back on the SAME
    user key (one logical shuffle), one-row rollup
    (operators/events.py time_to_convert)."""
    from ..operators.events import time_to_convert

    return time_to_convert(_events(spark, sf_dir))

ORACLE_E4_TIME_TO_CONVERT = """
WITH s AS (
  SELECT user_id, min(ts) AS st FROM events
  WHERE event_type = 'signup' GROUP BY user_id
),
fe AS (
  SELECT e.user_id, min(e.ts) AS et, min(s.st) AS st
  FROM events e JOIN s ON e.user_id = s.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s.st
  GROUP BY e.user_id
),
d AS (SELECT epoch(et) - epoch(st) AS sec FROM fe)
SELECT (SELECT count(*) FROM s)::BIGINT AS n_started,
       count(*)::BIGINT AS n_converted,
       round(count(*)::DOUBLE / (SELECT count(*) FROM s), 6) AS conversion_rate,
       round(quantile_cont(sec / 3600.0, 0.5), 6) AS median_hours,
       round(quantile_cont(sec / 3600.0, 0.9), 6) AS p90_hours
FROM d
"""

def q_e4_metric_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 daily metric correlation: Pearson r between click volume and
    purchase volume across days — the first sanity number a metrics
    review reads before treating one KPI as a proxy for another. The
    corpus collapses to one (day, n_click, n_purchase) row per day
    (partial-agg conditional counts), and the correlation runs over
    that day-bounded frame with INTEGER sufficient statistics (sums
    and cross-products of counts are exact bigints; the only doubles
    are the final Pearson expression), so the engine and oracle agree
    bit-for-bit."""
    daily = _daily_xy(_events(spark, sf_dir))
    return _pearson_finalize(daily)

ORACLE_E4_METRIC_CORRELATION = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d,
         sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS x,
         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
  FROM events WHERE event_type IN ('click', 'purchase')
  GROUP BY d
),
s AS (
  SELECT count(*)::BIGINT AS n_days,
         sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
         sum(x * x)::BIGINT AS sxx, sum(y * y)::BIGINT AS syy,
         sum(x * y)::BIGINT AS sxy
  FROM daily
)
SELECT n_days, sx, sy,
       round(CASE WHEN sqrt((n_days * sxx - sx * sx)::DOUBLE
                          * (n_days * syy - sy * sy)::DOUBLE) <> 0
                  THEN (n_days * sxy - sx * sy)::DOUBLE
                       / sqrt((n_days * sxx - sx * sx)::DOUBLE
                            * (n_days * syy - sy * sy)::DOUBLE) END, 6)
         AS pearson_r
FROM s
"""

def q_e4_error_pchart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 p-chart error monitor (Shewhart attribute control chart,
    public SPC standard): each day's error share against 3-sigma
    binomial control limits around the overall rate — the SRE readout
    that separates noise from a real regression. Plan: the corpus
    collapses to one (day, n, n_err) row per day (partial-agg
    conditional counts); the overall rate is a one-row broadcast; all
    inputs to the limit expression are exact integer ratios, so the
    flag is engine-exact."""
    return _pchart_finalize(_daily_err(_events(spark, sf_dir)))

ORACLE_E4_ERROR_PCHART = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, count(*)::BIGINT AS n,
         sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT AS n_err
  FROM events GROUP BY d
),
o AS (SELECT sum(n_err)::DOUBLE / sum(n) AS pbar FROM daily)
SELECT strftime(d, '%Y-%m-%d') AS day, n, n_err,
       round(n_err::DOUBLE / n, 6) AS err_rate,
       round(pbar + 3.0 * sqrt(pbar * (1.0 - pbar) / n), 6) AS ucl,
       n_err::DOUBLE / n > pbar + 3.0 * sqrt(pbar * (1.0 - pbar) / n)
         AS out_of_control
FROM daily, o
"""

def q_e4_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 growth accounting: per day, active users split into NEW
    (first-ever activity that day) and RETURNING — the
    acquisition-vs-retention decomposition under every growth chart.
    Plan: events collapse to distinct (user, day); each user's first
    day is a user-keyed partial min; the daily rollup joins on the
    SAME user key (shuffle partitioning reused) and aggregates to a
    day-bounded frame. No window anywhere."""
    ev = _events(spark, sf_dir)
    days = ev.select(
        "user_id", F.to_date("ts").alias("__day")
    ).distinct()
    first = days.groupBy("user_id").agg(F.min("__day").alias("__first"))
    return (
        days.join(first, "user_id")
        .groupBy("__day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_active"),
            F.sum(F.when(F.col("__day") == F.col("__first"), 1).otherwise(0))
            .cast("long")
            .alias("n_new"),
        )
        .select(
            F.date_format("__day", "yyyy-MM-dd").alias("day"),
            "n_active",
            "n_new",
            (F.col("n_active") - F.col("n_new")).cast("long").alias(
                "n_returning"
            ),
            F.round(F.col("n_new") / F.col("n_active"), 6).alias("new_share"),
        )
    )

ORACLE_E4_NEW_VS_RETURNING = """
WITH d AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
f AS (SELECT user_id, min(day) AS first_day FROM d GROUP BY user_id)
SELECT strftime(day, '%Y-%m-%d') AS day,
       count(*)::BIGINT AS n_active,
       sum(CASE WHEN day = first_day THEN 1 ELSE 0 END)::BIGINT AS n_new,
       (count(*) - sum(CASE WHEN day = first_day THEN 1 ELSE 0 END))::BIGINT
         AS n_returning,
       round(sum(CASE WHEN day = first_day THEN 1 ELSE 0 END)::DOUBLE
             / count(*), 6) AS new_share
FROM d JOIN f USING (user_id)
GROUP BY day
"""

def q_e4_session_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 session-depth distribution: one row summarizing the session
    population (count, exact interpolated median/p90 events-per-session
    and duration) — the engagement-depth readout next to the raw
    session list. Reuses the gap-based sessionizer unchanged; the
    rollup runs over the session frame (bounded by session count, far
    below event volume)."""
    sess = events.sessionize(_events(spark, sf_dir), gap_minutes=30)
    return sess.agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.round(F.expr("percentile(n_events, 0.5)"), 6).alias(
            "median_events"
        ),
        F.round(F.expr("percentile(n_events, 0.9)"), 6).alias("p90_events"),
        F.round(F.expr("percentile(duration_s, 0.5)"), 6).alias(
            "median_duration_s"
        ),
        F.round(F.expr("percentile(duration_s, 0.9)"), 6).alias(
            "p90_duration_s"
        ),
    )

def _oracle_session_depth() -> str:
    return f"""
WITH s AS ({ORACLE_E4_SESSIONIZE})
SELECT count(*)::BIGINT AS n_sessions,
       round(quantile_cont(n_events, 0.5), 6) AS median_events,
       round(quantile_cont(n_events, 0.9), 6) AS p90_events,
       round(quantile_cont(duration_s, 0.5), 6) AS median_duration_s,
       round(quantile_cont(duration_s, 0.9), 6) AS p90_duration_s
FROM s
"""

def q_e4_iqr_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 boxplot audit: per event type, exact interpolated quartiles
    of the value metric and how many events fall outside the 1.5*IQR
    Tukey fences — the outlier census a metrics-quality review reads
    before trusting means. Plan: quartiles are one |types|-row
    aggregate broadcast back into a second conditional-count pass —
    two scans, zero windows, fence comparisons against exact shared
    doubles."""
    ev = _events(spark, sf_dir).select("event_type", "value")
    q = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.25)").alias("__q1"),
        F.expr("percentile(value, 0.75)").alias("__q3"),
    )
    lo = F.col("__q1") - 1.5 * (F.col("__q3") - F.col("__q1"))
    hi = F.col("__q3") + 1.5 * (F.col("__q3") - F.col("__q1"))
    return (
        ev.join(F.broadcast(q), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.max("__q1"), 6).alias("q1"),
            F.round(F.max("__q3"), 6).alias("q3"),
            F.sum(
                F.when((F.col("value") < lo) | (F.col("value") > hi), 1)
                .otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
        )
        .select(
            "event_type",
            "n",
            "q1",
            "q3",
            "n_outliers",
            F.round(F.col("n_outliers") / F.col("n"), 6).alias(
                "outlier_rate"
            ),
        )
    )

ORACLE_E4_IQR_OUTLIERS = """
WITH q AS (
  SELECT event_type,
         quantile_cont(value, 0.25) AS q1,
         quantile_cont(value, 0.75) AS q3
  FROM events GROUP BY event_type
),
j AS (
  SELECT e.event_type, e.value, q.q1, q.q3,
         q.q1 - 1.5 * (q.q3 - q.q1) AS lo,
         q.q3 + 1.5 * (q.q3 - q.q1) AS hi
  FROM events e JOIN q USING (event_type)
)
SELECT event_type, count(*)::BIGINT AS n,
       round(max(q1), 6) AS q1, round(max(q3), 6) AS q3,
       sum(CASE WHEN value < lo OR value > hi THEN 1 ELSE 0 END)::BIGINT
         AS n_outliers,
       round(sum(CASE WHEN value < lo OR value > hi THEN 1 ELSE 0 END)::DOUBLE
             / count(*), 6) AS outlier_rate
FROM j GROUP BY event_type
"""

def q_e4_activity_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 inequality audit: per event type, the exact Gini coefficient
    of per-user event counts — "do 1% of users generate 90% of the
    traffic?", the skew readout that decides whether per-user quotas
    or salting are needed before any user-keyed join. Plan: events
    collapse to per-(type, user) counts, then to a count-of-counts
    histogram (key space = distinct activity levels, never corpus
    rows); the Gini pairwise identity turns rank-order cumsums into a
    histogram self-join with exact decimal(38,0) integer sums — no
    global sort, no window, no collect."""
    from ..operators.events import activity_gini

    return activity_gini(
        _events(spark, sf_dir), key_col="user_id", group_col="event_type"
    )

ORACLE_E4_ACTIVITY_GINI = """
WITH pu AS (
  SELECT event_type, user_id, count(*)::BIGINT AS c
  FROM events GROUP BY 1, 2
),
h AS (
  SELECT event_type, c, count(*)::BIGINT AS m FROM pu GROUP BY 1, 2
),
p AS (
  SELECT a.event_type,
         sum(CAST(a.m AS HUGEINT) * b.m * abs(a.c - b.c)) AS num
  FROM h a JOIN h b USING (event_type) GROUP BY 1
),
t AS (
  SELECT event_type, sum(m)::BIGINT AS n_keys,
         sum(m * c)::BIGINT AS n_events
  FROM h GROUP BY 1
)
SELECT t.event_type, t.n_keys, t.n_events,
       round(CAST(p.num AS DOUBLE)
             / (2.0 * CAST(t.n_keys AS DOUBLE)
                    * CAST(t.n_events AS DOUBLE)), 6) AS gini
FROM t JOIN p USING (event_type)
"""

def q_e4_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 changepoint detection: the single best breakpoint in the
    daily event-count series — binary segmentation's first step, the
    "when did the regime change" answer CUSUM (known target) and PSI
    (known reference) can't give. The split maximizing the
    between-group sum of squares  BGSS = s1²/n1 + (S−s1)²/(n−n1) − S²/n
    (equivalently: minimizing within-segment SSE; means drop out).
    Plan: the corpus collapses to a day-bounded count frame FIRST;
    prefix sums come from a day-frame self-join (|days|² pairs, never
    corpus rows — no window, no cumsum over an unbounded input);
    totals are a 1-row broadcast; the argmax is a TakeOrdered over
    |days| candidates with an explicit earliest-day tiebreak. All
    inputs to the double BGSS expression are exact integers, and the
    expression is written in the same operation order as the oracle
    so both engines produce bit-identical doubles."""
    ev = _events(spark, sf_dir)
    daily = ev.groupBy(F.to_date("ts").alias("__day")).agg(
        F.count(F.lit(1)).cast("long").alias("__y")
    )
    return _changepoint_finalize(daily)

ORACLE_E4_CHANGEPOINT = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, count(*)::BIGINT AS y
  FROM events GROUP BY 1
),
pref AS (
  SELECT a.day AS s, count(*)::BIGINT AS n1, sum(b.y)::BIGINT AS s1
  FROM daily a JOIN daily b ON b.day <= a.day
  GROUP BY a.day
),
tot AS (SELECT count(*)::BIGINT AS n, sum(y)::BIGINT AS tot_s FROM daily),
scored AS (
  SELECT pref.s, pref.n1, pref.s1, tot.n, tot.tot_s,
         CAST(pref.s1 AS DOUBLE) * CAST(pref.s1 AS DOUBLE)
           / CAST(pref.n1 AS DOUBLE)
         + CAST(tot.tot_s - pref.s1 AS DOUBLE) * CAST(tot.tot_s - pref.s1 AS DOUBLE)
           / CAST(tot.n - pref.n1 AS DOUBLE)
         - CAST(tot.tot_s AS DOUBLE) * CAST(tot.tot_s AS DOUBLE)
           / CAST(tot.n AS DOUBLE) AS bgss
  FROM pref CROSS JOIN tot
  WHERE pref.n1 < tot.n
)
SELECT strftime(s, '%Y-%m-%d') AS split_day,
       n1 AS n_days_left,
       (n - n1)::BIGINT AS n_days_right,
       round(CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE), 6) AS mean_left,
       round(CAST(tot_s - s1 AS DOUBLE) / CAST(n - n1 AS DOUBLE), 6)
         AS mean_right,
       round(bgss, 6) AS bgss
FROM scored
ORDER BY bgss DESC, s
LIMIT 1
"""

def q_e4_out_of_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 ingestion-order audit: per event type, how many events
    arrived LATE — event-time older than something the same user
    already emitted under a smaller event_id (backfill, retry queues,
    clock skew). Late share decides every watermark: a stream job's
    allowed lateness must cover the p-max lateness seen here, and a
    batch pipeline that assumes id-order == time-order silently
    corrupts as-of joins. Plan: ONE user-keyed window (running max of
    event-time over preceding ids — partitioned by the same key
    sessionization shuffles on, never a global sort), then a
    |types|-row rollup. Lateness seconds are exact integer micros
    divided once at the end."""
    ev = _events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = ev.select(
        "event_type",
        F.unix_micros("ts").alias("__us"),
        F.max(F.unix_micros("ts")).over(w).alias("__prev_max"),
    ).withColumn(
        "__late_us",
        F.when(
            F.col("__prev_max").isNotNull()
            & (F.col("__us") < F.col("__prev_max")),
            F.col("__prev_max") - F.col("__us"),
        ),
    )
    return flagged.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.when(F.col("__late_us").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_late"),
        F.round(
            F.sum(
                F.when(F.col("__late_us").isNotNull(), 1).otherwise(0)
            ).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("late_share"),
        F.round(F.max("__late_us").cast("double") / 1000000.0, 6).alias(
            "max_lateness_s"
        ),
    )

ORACLE_E4_OUT_OF_ORDER = """
WITH f AS (
  SELECT event_type, epoch_us(ts) AS us,
         max(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ) AS prev_max
  FROM events
),
l AS (
  SELECT event_type,
         CASE WHEN prev_max IS NOT NULL AND us < prev_max
              THEN prev_max - us END AS late_us
  FROM f
)
SELECT event_type, count(*)::BIGINT AS n_events,
       sum(CASE WHEN late_us IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
         AS n_late,
       round(sum(CASE WHEN late_us IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE
             / count(*), 6) AS late_share,
       round(CAST(max(late_us) AS DOUBLE) / 1000000.0, 6) AS max_lateness_s
FROM l GROUP BY event_type
"""

def q_e4_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 autocorrelation: Pearson r of the daily event-count series
    against itself at lag 1 (momentum) and lag 7 (weekly seasonality
    STRENGTH — the seasonal decomposition says what the weekly shape
    is; r@7 says how much of the variance that shape explains). Plan:
    the corpus collapses to the day-bounded count frame once; each
    lag is an equi-join on datediff (|days| pairs per lag, never a
    window); sufficient statistics are exact decimal(38,0) integer
    sums, and only the final Pearson expression — written in the
    same operation order as the oracle — runs in doubles."""
    ev = _events(spark, sf_dir)
    daily = ev.groupBy(F.to_date("ts").alias("__day")).agg(
        F.count(F.lit(1)).cast("long").alias("__y")
    )
    lags = spark.createDataFrame([(1,), (7,)], "lag int")
    rhs = daily.select(
        F.col("__day").alias("__d2"), F.col("__y").alias("__y2")
    )
    pairs = daily.crossJoin(F.broadcast(lags)).join(
        rhs, F.expr("datediff(__d2, __day) = lag")
    )
    stats = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum(F.col("__y").cast("decimal(38,0)")).alias("__sx"),
        F.sum(F.col("__y2").cast("decimal(38,0)")).alias("__sy"),
        F.sum(F.expr("CAST(__y AS DECIMAL(38,0)) * __y2")).alias("__sxy"),
        F.sum(F.expr("CAST(__y AS DECIMAL(38,0)) * __y")).alias("__sxx"),
        F.sum(F.expr("CAST(__y2 AS DECIMAL(38,0)) * __y2")).alias("__syy"),
    )
    return stats.select(
        F.col("lag").cast("long").alias("lag"),
        F.col("__n").alias("n_pairs"),
        F.round(
            F.expr(
                "(CAST(__n AS DOUBLE) * CAST(__sxy AS DOUBLE)"
                " - CAST(__sx AS DOUBLE) * CAST(__sy AS DOUBLE))"
                " / nullif(sqrt((CAST(__n AS DOUBLE) * CAST(__sxx AS DOUBLE)"
                " - CAST(__sx AS DOUBLE) * CAST(__sx AS DOUBLE))"
                " * (CAST(__n AS DOUBLE) * CAST(__syy AS DOUBLE)"
                " - CAST(__sy AS DOUBLE) * CAST(__sy AS DOUBLE))), 0.0)"
            ),
            6,
        ).alias("r"),
    )

ORACLE_E4_AUTOCORR = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, count(*)::BIGINT AS y
  FROM events GROUP BY 1
),
lags AS (SELECT unnest([1, 7]) AS lag),
pairs AS (
  SELECT l.lag, a.y AS x, b.y AS y2
  FROM daily a CROSS JOIN lags l
  JOIN daily b ON b.day - a.day = l.lag
),
stats AS (
  SELECT lag, count(*)::BIGINT AS n,
         sum(CAST(x AS HUGEINT)) AS sx,
         sum(CAST(y2 AS HUGEINT)) AS sy,
         sum(CAST(x AS HUGEINT) * y2) AS sxy,
         sum(CAST(x AS HUGEINT) * x) AS sxx,
         sum(CAST(y2 AS HUGEINT) * y2) AS syy
  FROM pairs GROUP BY lag
)
SELECT CAST(lag AS BIGINT) AS lag, n AS n_pairs,
       round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / nullif(sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                           * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                              - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
                      0.0), 6) AS r
FROM stats
"""

def q_e4_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 causal readout: difference-in-differences on event value —
    treatment = deterministic user-hash parity (the A/B assignment
    every experiment here uses), pre/post = the Jan-15 cutoff. The
    2x2 cell means difference out both the group baseline and the
    common time trend; the interaction term is the effect estimate a
    raw post-period A/B comparison overstates whenever the cohorts
    started unequal. Plan: ONE scan into a 4-cell aggregate (exact
    decimal value sums, integer counts); all four means and the DiD
    come from that single broadcastable row — no join, no window.
    Welch machinery lives in e4_ab_test; this is its
    pre-trend-robust companion."""
    ev = _events(spark, sf_dir)
    cells = (
        ev.select(
            F.expr("CAST(user_id % 2 = 0 AS INT)").alias("__treat"),
            F.expr(
                "CAST(ts >= TIMESTAMP '2024-01-15 00:00:00' AS INT)"
            ).alias("__post"),
            F.col("value").cast("decimal(18,6)").alias("__v"),
        )
        .groupBy("__treat", "__post")
        .agg(
            F.count(F.lit(1)).cast("long").alias("__n"),
            F.sum("__v").alias("__s"),
        )
    )
    wide = cells.groupBy().agg(
        F.sum(F.when((F.col("__treat") == 1) & (F.col("__post") == 1), F.col("__n")).otherwise(0)).cast("long").alias("n_t_post"),
        F.sum(F.when((F.col("__treat") == 1) & (F.col("__post") == 0), F.col("__n")).otherwise(0)).cast("long").alias("n_t_pre"),
        F.sum(F.when((F.col("__treat") == 0) & (F.col("__post") == 1), F.col("__n")).otherwise(0)).cast("long").alias("n_c_post"),
        F.sum(F.when((F.col("__treat") == 0) & (F.col("__post") == 0), F.col("__n")).otherwise(0)).cast("long").alias("n_c_pre"),
        F.sum(F.when((F.col("__treat") == 1) & (F.col("__post") == 1), F.col("__s")).otherwise(F.lit(0).cast("decimal(18,6)"))).alias("__s_t_post"),
        F.sum(F.when((F.col("__treat") == 1) & (F.col("__post") == 0), F.col("__s")).otherwise(F.lit(0).cast("decimal(18,6)"))).alias("__s_t_pre"),
        F.sum(F.when((F.col("__treat") == 0) & (F.col("__post") == 1), F.col("__s")).otherwise(F.lit(0).cast("decimal(18,6)"))).alias("__s_c_post"),
        F.sum(F.when((F.col("__treat") == 0) & (F.col("__post") == 0), F.col("__s")).otherwise(F.lit(0).cast("decimal(18,6)"))).alias("__s_c_pre"),
    )
    mean = lambda s, n: F.expr(  # noqa: E731
        f"CAST({s} AS DOUBLE) / CAST({n} AS DOUBLE)"
    )
    return wide.select(
        "n_t_pre",
        "n_t_post",
        "n_c_pre",
        "n_c_post",
        F.round(mean("__s_t_pre", "n_t_pre"), 6).alias("mean_t_pre"),
        F.round(mean("__s_t_post", "n_t_post"), 6).alias("mean_t_post"),
        F.round(mean("__s_c_pre", "n_c_pre"), 6).alias("mean_c_pre"),
        F.round(mean("__s_c_post", "n_c_post"), 6).alias("mean_c_post"),
        F.round(
            (mean("__s_t_post", "n_t_post") - mean("__s_t_pre", "n_t_pre"))
            - (mean("__s_c_post", "n_c_post") - mean("__s_c_pre", "n_c_pre")),
            6,
        ).alias("did"),
    )

ORACLE_E4_DIFF_IN_DIFF = """
WITH cells AS (
  SELECT CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS treat,
         CASE WHEN ts >= TIMESTAMP '2024-01-15 00:00:00' THEN 1 ELSE 0 END
           AS post,
         count(*)::BIGINT AS n,
         sum(CAST(value AS DECIMAL(18,6))) AS s
  FROM events GROUP BY 1, 2
),
wide AS (
  SELECT
    sum(CASE WHEN treat = 1 AND post = 0 THEN n ELSE 0 END)::BIGINT AS n_t_pre,
    sum(CASE WHEN treat = 1 AND post = 1 THEN n ELSE 0 END)::BIGINT AS n_t_post,
    sum(CASE WHEN treat = 0 AND post = 0 THEN n ELSE 0 END)::BIGINT AS n_c_pre,
    sum(CASE WHEN treat = 0 AND post = 1 THEN n ELSE 0 END)::BIGINT AS n_c_post,
    sum(CASE WHEN treat = 1 AND post = 0 THEN s ELSE 0 END) AS s_t_pre,
    sum(CASE WHEN treat = 1 AND post = 1 THEN s ELSE 0 END) AS s_t_post,
    sum(CASE WHEN treat = 0 AND post = 0 THEN s ELSE 0 END) AS s_c_pre,
    sum(CASE WHEN treat = 0 AND post = 1 THEN s ELSE 0 END) AS s_c_post
  FROM cells
)
SELECT n_t_pre, n_t_post, n_c_pre, n_c_post,
       round(CAST(s_t_pre AS DOUBLE) / CAST(n_t_pre AS DOUBLE), 6)
         AS mean_t_pre,
       round(CAST(s_t_post AS DOUBLE) / CAST(n_t_post AS DOUBLE), 6)
         AS mean_t_post,
       round(CAST(s_c_pre AS DOUBLE) / CAST(n_c_pre AS DOUBLE), 6)
         AS mean_c_pre,
       round(CAST(s_c_post AS DOUBLE) / CAST(n_c_post AS DOUBLE), 6)
         AS mean_c_post,
       round((CAST(s_t_post AS DOUBLE) / CAST(n_t_post AS DOUBLE)
              - CAST(s_t_pre AS DOUBLE) / CAST(n_t_pre AS DOUBLE))
             - (CAST(s_c_post AS DOUBLE) / CAST(n_c_post AS DOUBLE)
                - CAST(s_c_pre AS DOUBLE) / CAST(n_c_pre AS DOUBLE)), 6)
         AS did
FROM wide
"""

def q_e4_tenure_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 survival curve: user tenure (weeks between first and last
    activity) as a survival table — for each observed tenure week w,
    how many users lasted exactly w weeks and what share of ALL users
    survived AT LEAST w weeks. The uncensored Kaplan-Meier companion
    to the cohort triangle: retention says who came back each week,
    tenure says how long engagement lasts end-to-end. Plan: events
    collapse to per-user (first, last) day — one user-keyed partial
    agg — then to a tenure-week histogram whose key space is the
    calendar span in weeks; the reverse-cumulative survival count is
    a |weeks|² self-join over that bounded frame (no window), and the
    denominator is a 1-row broadcast."""
    ev = _events(spark, sf_dir)
    per_user = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("__first"),
        F.max(F.to_date("ts")).alias("__last"),
    )
    return _tenure_finalize(per_user)

ORACLE_E4_TENURE_CURVE = """
WITH per_user AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS f, max(CAST(ts AS DATE)) AS l
  FROM events GROUP BY user_id
),
hist AS (
  SELECT date_diff('day', f, l) // 7 AS tenure_weeks,
         count(*)::BIGINT AS n_users
  FROM per_user GROUP BY 1
),
surv AS (
  SELECT a.tenure_weeks, a.n_users, sum(b.n_users)::BIGINT AS n_surviving
  FROM hist a JOIN hist b ON b.tenure_weeks >= a.tenure_weeks
  GROUP BY 1, 2
),
tot AS (SELECT sum(n_users)::BIGINT AS total FROM hist)
SELECT CAST(s.tenure_weeks AS BIGINT) AS tenure_weeks, s.n_users,
       s.n_surviving,
       round(CAST(s.n_surviving AS DOUBLE) / CAST(t.total AS DOUBLE), 6)
         AS survival_share
FROM surv s CROSS JOIN tot t
"""

def q_e4_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 forecast backtest: hold out the last 7 days of each type's
    daily series and score two baselines on it — NAIVE (every holdout
    day = the last training day's count) vs SEASONAL-NAIVE (each
    holdout day = the same weekday one week earlier, all inside
    training at this horizon). The skill score 1 − MAE_s/MAE_n is the
    number that says whether weekly seasonality is worth modeling at
    all — the backtest every forecasting pipeline runs before
    anything fancier (e4_forecast, e4_holt) earns its complexity.
    Plan: the corpus collapses to the day-bounded count frame once;
    the cutoff is a 1-row broadcast; predictions are two bounded
    joins on the day frame (per-type last value broadcast; lag-7
    equi-join on datediff, the e4_autocorr shape); errors stay exact
    integers until the final MAE division."""
    ev = _events(spark, sf_dir)
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("__day")
    ).agg(F.count(F.lit(1)).cast("long").alias("__y"))
    cut = daily.agg(F.date_sub(F.max("__day"), 7).alias("__cut"))
    marked = daily.crossJoin(F.broadcast(cut))
    train = marked.where(F.col("__day") <= F.col("__cut"))
    hold = marked.where(F.col("__day") > F.col("__cut")).select(
        "event_type", "__day", "__y"
    )
    last_day = train.groupBy(F.col("event_type").alias("__lt")).agg(
        F.max("__day").alias("__ld")
    )
    naive = (
        train.join(
            F.broadcast(last_day),
            (train["event_type"] == F.col("__lt"))
            & (train["__day"] == F.col("__ld")),
        )
        .select(F.col("__lt").alias("__nt"), F.col("__y").alias("__naive"))
    )
    lag7 = train.select(
        F.col("event_type").alias("__t7"),
        F.col("__day").alias("__d7"),
        F.col("__y").alias("__s7"),
    )
    scored = (
        hold.join(
            F.broadcast(naive), hold["event_type"] == F.col("__nt")
        )
        .join(
            lag7,
            (hold["event_type"] == F.col("__t7"))
            & (F.expr("datediff(__day, __d7) = 7")),
        )
    )
    return scored.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_scored"),
        F.round(
            F.sum(F.abs(F.col("__y") - F.col("__naive"))).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mae_naive"),
        F.round(
            F.sum(F.abs(F.col("__y") - F.col("__s7"))).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mae_seasonal"),
        F.round(
            F.lit(1.0)
            - (
                F.sum(F.abs(F.col("__y") - F.col("__s7"))).cast("double")
                / F.expr(
                    "nullif(CAST(sum(abs(__y - __naive)) AS DOUBLE), 0.0)"
                )
            ),
            6,
        ).alias("skill"),
    )

ORACLE_E4_FORECAST_BACKTEST = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, count(*)::BIGINT AS y
  FROM events GROUP BY 1, 2
),
cut AS (SELECT max(day) - 7 AS c FROM daily),
train AS (SELECT d.* FROM daily d CROSS JOIN cut WHERE d.day <= cut.c),
hold AS (SELECT d.* FROM daily d CROSS JOIN cut WHERE d.day > cut.c),
last_day AS (
  SELECT event_type, max(day) AS ld FROM train GROUP BY event_type
),
naive AS (
  SELECT t.event_type, t.y AS naive_y
  FROM train t JOIN last_day l
    ON t.event_type = l.event_type AND t.day = l.ld
),
scored AS (
  SELECT h.event_type, h.y, n.naive_y, t7.y AS s7
  FROM hold h
  JOIN naive n ON h.event_type = n.event_type
  JOIN train t7 ON h.event_type = t7.event_type
              AND h.day - t7.day = 7
)
SELECT event_type, count(*)::BIGINT AS n_scored,
       round(CAST(sum(abs(y - naive_y)) AS DOUBLE) / count(*), 6)
         AS mae_naive,
       round(CAST(sum(abs(y - s7)) AS DOUBLE) / count(*), 6)
         AS mae_seasonal,
       round(1.0 - (CAST(sum(abs(y - s7)) AS DOUBLE)
                    / nullif(CAST(sum(abs(y - naive_y)) AS DOUBLE), 0.0)),
             6) AS skill
FROM scored GROUP BY event_type
"""

def q_e4_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 robust outlier days: the Iglewicz-Hoaglin modified z-score
    (0.6745·(y−median)/MAD, flag at |z| > 3.5) over each type's daily
    counts — the mean/stddev pair the rolling z-score and the Tukey
    fences use is itself dragged by the outliers it hunts; median/MAD
    has a 50% breakdown point and survives a day of doubled traffic
    undistorted. Plan: the corpus collapses to the day-bounded count
    frame once; median and MAD are two exact interpolated percentiles
    over |days|-per-type groups, each joined back as a |types|-row
    broadcast; a zero MAD (constant series) NULLs the score rather
    than dividing by it."""
    ev = _events(spark, sf_dir)
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("__day")
    ).agg(F.count(F.lit(1)).cast("long").alias("__y"))
    med = daily.groupBy(F.col("event_type").alias("__tm")).agg(
        F.expr("percentile(__y, 0.5)").alias("__med")
    )
    with_med = daily.join(
        F.broadcast(med), daily["event_type"] == F.col("__tm")
    )
    mad = with_med.groupBy(F.col("event_type").alias("__ta")).agg(
        F.expr("percentile(abs(__y - __med), 0.5)").alias("__mad")
    )
    scored = with_med.join(
        F.broadcast(mad), with_med["event_type"] == F.col("__ta")
    )
    return scored.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.round(F.max("__med"), 6).alias("median_daily"),
        F.round(F.max("__mad"), 6).alias("mad"),
        F.sum(
            F.when(
                F.expr(
                    "abs(0.6745 * (CAST(__y AS DOUBLE) - __med)"
                    " / nullif(__mad, 0.0)) > 3.5"
                ),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_outlier_days"),
    )

ORACLE_E4_MAD_OUTLIERS = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, count(*)::BIGINT AS y
  FROM events GROUP BY 1, 2
),
med AS (
  SELECT event_type, quantile_cont(y, 0.5) AS m FROM daily GROUP BY 1
),
wm AS (SELECT d.*, med.m FROM daily d JOIN med USING (event_type)),
mad AS (
  SELECT event_type, quantile_cont(abs(y - m), 0.5) AS md
  FROM wm GROUP BY 1
),
scored AS (SELECT wm.*, mad.md FROM wm JOIN mad USING (event_type))
SELECT event_type, count(*)::BIGINT AS n_days,
       round(max(m), 6) AS median_daily,
       round(max(md), 6) AS mad,
       sum(CASE WHEN abs(0.6745 * (CAST(y AS DOUBLE) - m)
                         / nullif(md, 0.0)) > 3.5
                THEN 1 ELSE 0 END)::BIGINT AS n_outlier_days
FROM scored GROUP BY event_type
"""

def q_e4_type_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 cross-metric structure: the pairwise Pearson matrix between
    event types' daily volumes — "do errors spike when purchases
    spike" across ALL type pairs at once, where e4_metric_correlation
    tracks one chosen KPI pair. Missing (type, day) cells are real
    zeros, so the day x type grid is densified FIRST (|days| x
    |types|, bounded by calendar x alphabet — never event volume);
    the pair frame is a day-keyed self-join with a canonical a < b
    direction, and sufficient statistics are exact decimal sums with
    doubles only in the final Pearson expression (oracle operation
    order)."""
    ev = _events(spark, sf_dir)
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("__day")
    ).agg(F.count(F.lit(1)).cast("long").alias("__y"))
    days = daily.select("__day").distinct()
    types = daily.select("event_type").distinct()
    dense = (
        days.crossJoin(F.broadcast(types))
        .join(daily, ["event_type", "__day"], "left")
        .withColumn("__y", F.coalesce(F.col("__y"), F.lit(0)).cast("long"))
    )
    rhs = dense.select(
        F.col("event_type").alias("type_b"),
        F.col("__day").alias("__d2"),
        F.col("__y").alias("__y2"),
    )
    pairs = dense.select(
        F.col("event_type").alias("type_a"), "__day", "__y"
    ).join(
        rhs,
        (F.col("__day") == F.col("__d2"))
        & (F.col("type_a") < F.col("type_b")),
    )
    stats = pairs.groupBy("type_a", "type_b").agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum(F.col("__y").cast("decimal(38,0)")).alias("__sx"),
        F.sum(F.col("__y2").cast("decimal(38,0)")).alias("__sy"),
        F.sum(F.expr("CAST(__y AS DECIMAL(38,0)) * __y2")).alias("__sxy"),
        F.sum(F.expr("CAST(__y AS DECIMAL(38,0)) * __y")).alias("__sxx"),
        F.sum(F.expr("CAST(__y2 AS DECIMAL(38,0)) * __y2")).alias("__syy"),
    )
    return stats.select(
        "type_a",
        "type_b",
        F.col("__n").alias("n_days"),
        F.round(
            F.expr(
                "(CAST(__n AS DOUBLE) * CAST(__sxy AS DOUBLE)"
                " - CAST(__sx AS DOUBLE) * CAST(__sy AS DOUBLE))"
                " / nullif(sqrt((CAST(__n AS DOUBLE) * CAST(__sxx AS DOUBLE)"
                " - CAST(__sx AS DOUBLE) * CAST(__sx AS DOUBLE))"
                " * (CAST(__n AS DOUBLE) * CAST(__syy AS DOUBLE)"
                " - CAST(__sy AS DOUBLE) * CAST(__sy AS DOUBLE))), 0.0)"
            ),
            6,
        ).alias("r"),
    )

ORACLE_E4_TYPE_CORRELATION = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, count(*)::BIGINT AS y
  FROM events GROUP BY 1, 2
),
days AS (SELECT DISTINCT day FROM daily),
types AS (SELECT DISTINCT event_type FROM daily),
dense AS (
  SELECT t.event_type, d.day, coalesce(x.y, 0)::BIGINT AS y
  FROM days d CROSS JOIN types t
  LEFT JOIN daily x ON x.event_type = t.event_type AND x.day = d.day
),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         a.y AS x, b.y AS y2
  FROM dense a JOIN dense b
    ON a.day = b.day AND a.event_type < b.event_type
),
stats AS (
  SELECT type_a, type_b, count(*)::BIGINT AS n,
         sum(CAST(x AS HUGEINT)) AS sx,
         sum(CAST(y2 AS HUGEINT)) AS sy,
         sum(CAST(x AS HUGEINT) * y2) AS sxy,
         sum(CAST(x AS HUGEINT) * x) AS sxx,
         sum(CAST(y2 AS HUGEINT) * y2) AS syy
  FROM pairs GROUP BY 1, 2
)
SELECT type_a, type_b, n AS n_days,
       round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / nullif(sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                           * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                              - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
                      0.0), 6) AS r
FROM stats
"""


def q_e4_dow_hour_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 load heatmap: the day-of-week x hour-of-day event matrix with
    each cell's share of corpus traffic — the capacity/trigger-placement
    readout next to the seasonal decomposition (seasonal says the weekly
    SHAPE per type; this is the absolute placement grid ops teams read).
    Plan: one map-only projection to (dow, hour) -> a 168-key bounded
    partial aggregate; the share divides by a broadcast one-row total,
    exact integers until the single final division. dow is ISO
    (1=Monday), matching DuckDB's isodow."""
    ev = _events(spark, sf_dir)
    # pin the 168-row cell table itself — it feeds BOTH the total and
    # the share projection, and checkpointing only the total would
    # re-scan the corpus for the second consumer (r7 review finding)
    cells = (
        ev.groupBy(
            F.expr("CAST(dayofweek(ts) AS BIGINT)").alias("__dow_sun1"),
            F.expr("CAST(hour(ts) AS BIGINT)").alias("hour_of_day"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
        .localCheckpoint(eager=True)
    )
    total = cells.agg(F.sum("n_events").cast("long").alias("__total"))
    return (
        cells.crossJoin(F.broadcast(total))
        .select(
            # Spark dayofweek is 1=Sunday; re-base to ISO 1=Monday
            F.expr(
                "CAST(CASE WHEN __dow_sun1 = 1 THEN 7"
                " ELSE __dow_sun1 - 1 END AS BIGINT)"
            ).alias("iso_dow"),
            "hour_of_day",
            "n_events",
            F.round(
                F.col("n_events")
                / F.expr("nullif(CAST(__total AS DOUBLE), 0.0)"),
                6,
            ).alias("traffic_share"),
        )
    )


ORACLE_E4_DOW_HOUR_HEATMAP = """
SELECT isodow(ts)::BIGINT AS iso_dow,
       hour(ts)::BIGINT AS hour_of_day,
       count(*)::BIGINT AS n_events,
       round(count(*) / nullif(CAST((SELECT count(*) FROM events)
                                    AS DOUBLE), 0.0), 6) AS traffic_share
FROM events GROUP BY 1, 2
"""


def q_e4_incident_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 interval-overlap join: derive per-type "incident" windows
    (hot hours >= 2x the type's average hourly rate, adjacent hours
    merged) and overlap-join them against gap-sessionized user
    sessions — which sessions were open during each incident, and for
    how long. Spark has no native range join; operators/intervals.py
    interval_join equi-joins both sides on an hour-bucket grid with a
    first-common-bucket guard, so the plan is a hash join on the
    bucket, never a nested loop (reference has no interval surface;
    pipeline scope per /root/reference/tfrecorder/beam_pipeline.py)."""
    from ..operators import intervals
    from ..operators.events import sessionize

    ev = _events(spark, sf_dir)

    # localCheckpoint BOTH interval_join inputs: the operator consumes
    # each side in up to three subplans (grid + two outlier theta
    # branches), and un-checkpointed lineage re-executes per consumer —
    # r9 checkpointed only the session side and the corpus-scale
    # groupBy + windows behind hot_hour_incidents ran ~4x (0.85 s ->
    # 3.08 s). Both checkpointed frames are tiny: a 4-column session
    # projection and a calendar-bounded incident list. The two
    # materializations are INDEPENDENT jobs over the same scan, so they
    # are submitted concurrently (Spark's scheduler runs concurrent
    # actions from separate threads; on a cluster they share executors
    # via FAIR/FIFO pools) — sequential eager checkpoints would
    # serialize two passes over the event log.
    def _mk_sess() -> DataFrame:
        return sessionize(ev).select(
            "user_id",
            "session_seq",
            F.unix_timestamp("session_start").alias("s"),
            F.unix_timestamp("session_end").alias("e"),
        ).localCheckpoint()

    def _mk_inc() -> DataFrame:
        return intervals.hot_hour_incidents(ev).localCheckpoint()

    with ThreadPoolExecutor(max_workers=2) as pool:
        f_sess, f_inc = pool.submit(_mk_sess), pool.submit(_mk_inc)
        sess, inc = f_sess.result(), f_inc.result()
    # bucket_seconds=3600, not auto-tune: incidents are hour-aligned
    # by construction, so the hour grid is provably right and the
    # auto_bucket_seconds median pass (an extra eager action over both
    # lineages) buys nothing here. Auto-tune remains the default for
    # unknown-shape callers.
    pairs = intervals.interval_join(
        sess, inc, "s", "e", "inc_start", "inc_end", bucket_seconds=3600
    )
    return pairs.groupBy(
        "event_type",
        F.date_format(
            F.timestamp_seconds(F.col("inc_start")), "yyyy-MM-dd HH:mm:ss"
        ).alias("inc_start"),
        F.date_format(
            F.timestamp_seconds(F.col("inc_end")), "yyyy-MM-dd HH:mm:ss"
        ).alias("inc_end"),
        F.col("n_hot_events").cast("long").alias("n_hot_events"),
    ).agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum("overlap_s").cast("long").alias("total_overlap_s"),
    )


ORACLE_E4_INCIDENT_OVERLAP = """
WITH flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN epoch_us(ts) // 1000000 - lag(epoch_us(ts) // 1000000)
              OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
sid AS (
  SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM flagged
),
sess AS (
  SELECT user_id, session_seq,
         min(epoch_us(ts) // 1000000) AS s,
         max(epoch_us(ts) // 1000000) AS e
  FROM sid GROUP BY user_id, session_seq
),
hourly AS (
  SELECT event_type, epoch_us(ts) // 1000000 // 3600 AS hr, count(*) AS cnt
  FROM events GROUP BY 1, 2
),
hot AS (
  SELECT * FROM (
    SELECT event_type, hr, cnt,
           avg(cnt) OVER (PARTITION BY event_type) AS avg_cnt
    FROM hourly
  ) WHERE cnt >= 2.0 * avg_cnt
),
isl AS (
  SELECT event_type, hr, cnt,
         hr - row_number() OVER (PARTITION BY event_type ORDER BY hr) AS island
  FROM hot
),
inc AS (
  SELECT event_type, min(hr) * 3600 AS inc_start,
         max(hr) * 3600 + 3599 AS inc_end,
         sum(cnt) AS n_hot_events
  FROM isl GROUP BY event_type, island
),
pairs AS (
  SELECT * FROM sess JOIN inc ON s <= inc_end AND inc_start <= e
)
SELECT event_type,
       strftime(make_timestamp(inc_start * 1000000), '%Y-%m-%d %H:%M:%S') AS inc_start,
       strftime(make_timestamp(inc_end * 1000000), '%Y-%m-%d %H:%M:%S') AS inc_end,
       CAST(n_hot_events AS BIGINT) AS n_hot_events,
       count(*) AS n_sessions,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(sum(least(e, inc_end) - greatest(s, inc_start)) AS BIGINT)
         AS total_overlap_s
FROM pairs GROUP BY 1, 2, 3, 4
"""


def q_e4_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4 sweep-line: per-hour maximum number of concurrently-open user
    sessions. The naive sweep line is a GLOBAL running sum (one task at
    scale); operators/intervals.py concurrency_by_hour runs the
    two-level distributed prefix sum instead — within-hour windows
    partitioned by bucket plus an exclusive prefix over the tiny
    per-hour totals frame (one row per active hour)."""
    from ..operators import intervals
    from ..operators.events import sessionize

    ev = _events(spark, sf_dir)
    sess = sessionize(ev).select(
        F.unix_timestamp("session_start").alias("s"),
        F.unix_timestamp("session_end").alias("e"),
    )
    return intervals.concurrency_by_hour(sess, "s", "e")


ORACLE_E4_CONCURRENCY = """
WITH flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN epoch_us(ts) // 1000000 - lag(epoch_us(ts) // 1000000)
              OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
sid AS (
  SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM flagged
),
sess AS (
  SELECT min(epoch_us(ts) // 1000000) AS s,
         max(epoch_us(ts) // 1000000) AS e
  FROM sid GROUP BY user_id, session_seq
),
deltas AS (
  SELECT s AS t, 1 AS d FROM sess
  UNION ALL
  SELECT e + 1 AS t, -1 AS d FROM sess
),
net AS (SELECT t, sum(d) AS net FROM deltas GROUP BY t),
run AS (
  SELECT t, sum(net) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS conc
  FROM net
)
SELECT strftime(make_timestamp((t // 3600) * 3600 * 1000000),
                '%Y-%m-%d %H:%M') AS hour,
       CAST(max(conc) AS BIGINT) AS max_conc,
       count(*) AS n_changes
FROM run GROUP BY 1
"""


def q_e4_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4/warehousing: build a slowly-changing-dimension (SCD type 2)
    history from the raw event log — per user, consecutive runs of the
    same event_type collapse into validity intervals [valid_from,
    valid_to) with a version number and an is_current flag. The
    dimension-table build behind every "state as of time T" join; the
    as-of queries read what this writes. Gaps-and-islands windows are
    all PARTITIONED by user; the run collapse is one groupBy."""
    ev = _events(spark, sf_dir)
    w_u = Window.partitionBy("user_id").orderBy("ts", "event_id")
    runs = ev.withColumn(
        "__chg",
        F.when(
            F.lag("event_type").over(w_u).isNull()
            | (F.lag("event_type").over(w_u) != F.col("event_type")),
            1,
        ).otherwise(0),
    ).withColumn(
        "version",
        F.sum("__chg").over(w_u.rowsBetween(Window.unboundedPreceding, 0)),
    )
    iv = runs.groupBy("user_id", "version").agg(
        F.first("event_type").alias("event_type"),
        F.min("ts").alias("__from"),
        F.count(F.lit(1)).alias("n_events_in_run"),
    )
    w_v = Window.partitionBy("user_id").orderBy("version")
    return iv.withColumn("__to", F.lead("__from").over(w_v)).select(
        "user_id",
        F.col("version").cast("long").alias("version"),
        "event_type",
        F.date_format("__from", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.coalesce(
            F.date_format("__to", "yyyy-MM-dd HH:mm:ss"),
            F.lit("9999-12-31 00:00:00"),
        ).alias("valid_to"),
        F.when(F.col("__to").isNull(), F.lit(1)).otherwise(F.lit(0))
        .cast("long")
        .alias("is_current"),
        F.col("n_events_in_run").cast("long").alias("n_events_in_run"),
    )


ORACLE_E4_SCD2_INTERVALS = """
WITH runs AS (
  SELECT user_id, event_type, ts, event_id,
         CASE WHEN lag(event_type) OVER w IS NULL
                   OR lag(event_type) OVER w <> event_type
              THEN 1 ELSE 0 END AS chg
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
ver AS (
  SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS version
  FROM runs
),
iv AS (
  SELECT user_id, version, min(event_type) AS event_type,
         min(ts) AS vfrom, count(*) AS n_events_in_run
  FROM ver GROUP BY user_id, version
)
SELECT user_id,
       CAST(version AS BIGINT) AS version,
       event_type,
       strftime(vfrom, '%Y-%m-%d %H:%M:%S') AS valid_from,
       coalesce(strftime(lead(vfrom) OVER wv, '%Y-%m-%d %H:%M:%S'),
                '9999-12-31 00:00:00') AS valid_to,
       CAST(CASE WHEN lead(vfrom) OVER wv IS NULL THEN 1 ELSE 0 END AS BIGINT)
         AS is_current,
       CAST(n_events_in_run AS BIGINT) AS n_events_in_run
FROM iv
WINDOW wv AS (PARTITION BY user_id ORDER BY version)
"""
