"""Streaming twins (s1..s35): each batch query re-expressed over Structured Streaming state + shared oracles.

Split from the original single-module registry (r6 verdict item 7);
bodies are unchanged — see git history of queries.py.
"""
from __future__ import annotations
import os
from collections.abc import Callable
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
    _PACK_REC,
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


def q_s1_stream_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The E4 hourly rollup executed AS A STREAM: readStream over the
    events parquet -> watermarked tumbling window agg -> availableNow
    trigger drains the bounded source -> complete-mode memory sink.
    Output is hash-identical to the batch oracle — batch/stream parity
    is the whole point of declaring this one."""
    from ..streaming.windows import streaming_hourly_rollup

    stream = _event_stream(spark, sf_dir)
    # decimal value keeps the multi-row sum exact (order-independent)
    rolled = streaming_hourly_rollup(
        stream.withColumn("value", F.col("value").cast("decimal(18,6)"))
    ).select(
        "hour",
        "event_type",
        "n_events",
        F.col("sum_value").cast("double").alias("sum_value"),
    )
    return _drain_to_memory(rolled, "stream_hourly_rollup_sink", "complete")

ORACLE_S1_STREAM_HOURLY = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
       event_type,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events GROUP BY 1, 2
"""

def q_s2_stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming sessionization via native session_window
    (state-store backed), drained with availableNow into a memory sink.
    A session closes when the watermark passes last event + gap; with
    the bounded source fully drained the session set equals the batch
    lag-gap formulation, so the batch SQL oracle applies — stateful
    batch/stream parity. (Boundary note: a gap of EXACTLY the threshold
    merges in the lag-gap form (`> gap` starts a session) but splits in
    session_window (end-exclusive windows); the microsecond-resolution
    event data makes an exact-1800.000000s gap measure-zero, and the
    sf0.01 hash match confirms none occurs.)"""
    from ..streaming.windows import streaming_sessionize

    stream = _event_stream(spark, sf_dir)
    sess = streaming_sessionize(
        stream.withColumn("value", F.col("value").cast("decimal(18,6)")),
        gap_minutes=30,
    ).select(
        "user_id",
        "session_start",
        "n_events",
        F.col("sum_value").cast("double").alias("sum_value"),
    )
    return _drain_to_files(sess, "stream_sessionize_sink", "complete")

ORACLE_S2_STREAM_SESSIONIZE = """
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
SELECT user_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM sid GROUP BY user_id, session_seq
"""

def _event_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events parquet with the nanos-ts normalization
    shared by every S query."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = _t(spark, sf_dir, "events").schema
    stream = spark.readStream.schema(raw_schema).parquet(f"{sf_dir}/events.parque[t]")
    ts_type = dict(stream.dtypes).get("ts")
    if ts_type == "bigint":
        stream = stream.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    elif ts_type == "timestamp_ntz":
        # parquet TIMESTAMP(MICROS, isAdjustedToUTC=false) infers NTZ,
        # which withWatermark rejects; under the UTC session timezone the
        # LTZ cast is value-identical to the oracle's naive timestamps.
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream

def _drain_to_memory(stream_df: DataFrame, name: str, mode: str) -> DataFrame:
    spark = stream_df.sparkSession
    if any(t.name == name for t in spark.catalog.listTables()):
        spark.catalog.dropTempView(name)
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def _drain_to_files(stream_df: DataFrame, name: str, mode: str) -> DataFrame:
    """Drain a bounded stream to a tmp PARQUET dir and read it back —
    for twins whose drained frame is CORPUS-ROW-SCALE (session sets,
    deduped key sets, joined event pairs) rather than aggregate-scale.
    The memory sink materializes every drained row in the driver; at
    100 TB that is the driver-OOM shape, so row-scale drains go
    executor-side to files instead (r10 verdict item 5) — same rows,
    same oracle, and the read-back frame is cheaply re-scannable when
    a downstream operator multi-consumes it.

    ``foreachBatch`` rather than the direct file sink because the file
    sink supports only append mode, while complete-mode aggregate
    drains are the common twin shape. With trigger=availableNow the
    FINAL batch of a complete-mode query holds the entire result, so
    overwrite-per-batch leaves exactly the final state on disk;
    append-mode batches are disjoint row deltas, so append-per-batch
    accumulates exactly the emitted rows. (Update mode is NOT
    supported here: its per-batch deltas re-state keys, and splicing
    them needs key knowledge this helper doesn't have — update-mode
    twins keep their bounded-aggregate memory sinks.)
    """
    if mode not in ("complete", "append"):
        raise ValueError(f"_drain_to_files does not support mode {mode!r}")
    import shutil
    import tempfile

    spark = stream_df.sparkSession
    # applicationId in the path: two processes draining the same twin
    # (e.g. an external checker next to a bench) never clobber each
    # other's sink dir
    path = os.path.join(
        tempfile.gettempdir(),
        "trs_stream_file_sinks",
        spark.sparkContext.applicationId,
        name,
    )
    shutil.rmtree(path, ignore_errors=True)
    write_mode = "overwrite" if mode == "complete" else "append"

    def _sink(batch_df: DataFrame, _epoch_id: int) -> None:
        batch_df.write.mode(write_mode).parquet(path)

    q = (
        stream_df.writeStream.foreachBatch(_sink)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if not os.path.isdir(path):
        # zero batches fired (empty source): preserve the schema
        return spark.createDataFrame([], stream_df.schema)
    return spark.read.parquet(path)

def q_s3_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup (dropDuplicatesWithinWatermark): first event
    per (user_id, event_type) key; declared output is the surviving KEY
    set, which is deterministic regardless of which physical row arrived
    first."""
    from ..streaming.stateful import streaming_dedup

    deduped = streaming_dedup(
        _event_stream(spark, sf_dir), ["user_id", "event_type"]
    ).select("user_id", "event_type")
    return _drain_to_files(deduped, "stream_dedup_sink", "append")

ORACLE_S3_STREAM_DEDUP = """
SELECT DISTINCT user_id, event_type FROM events
"""

def q_s4_stream_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming aggregation via applyInPandasWithState:
    per-user running (count, min, max) accumulators in the state store.
    Update mode re-emits running totals per micro-batch; the final
    per-user row is recovered with order-independent aggregates (max of
    running count, min/max of running extrema), so the result is
    deterministic however the source batches."""
    from ..streaming.stateful import streaming_user_stats

    stats = streaming_user_stats(_event_stream(spark, sf_dir))
    table = _drain_to_memory(stats, "stream_user_stats_sink", "update")
    return table.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
    )

ORACLE_S4_STREAM_USER_STATS = """
SELECT user_id, count(*) AS n_events,
       min(value) AS min_value, max(value) AS max_value
FROM events GROUP BY user_id
"""

def q_s5_stream_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The e1_contamination detector executed AS A STREAM: eval docs
    (doc_id % 10 == 0) arrive via readStream and stream-static-join the
    static train shingle index; the running (eval, train) shared-shingle
    counts live in the state store, drained with availableNow. Same
    sketch policy as the batch query (mod 4, floor 13, df cap 100), so
    with the bounded source fully drained the report hash-matches the
    batch oracle — stream/batch parity for the contamination path."""
    from ..operators import dedup
    from ..streaming.contamination import streaming_contamination_pairs

    docs = _t(spark, sf_dir, "documents")
    train = docs.where(F.col("doc_id") % 10 != 0)
    ev_stream = spark.readStream.schema(docs.schema).parquet(
        f"{sf_dir}/documents.parque[t]"
    ).where(F.col("doc_id") % 10 == 0)
    pairs = streaming_contamination_pairs(
        ev_stream, train, "text", "doc_id", max_shingle_df=100, shingle_mod=4
    )
    table = _drain_to_memory(pairs, "stream_contamination_sink", "complete")
    rep = dedup.report_from_pairs(
        table.where(F.col("shared") >= 13),
        docs.where(F.col("doc_id") % 10 == 0),
        "text",
        "doc_id",
        shingle_mod=4,
    )
    return rep.select(
        "doc_id",
        "n_train_docs",
        "max_shared",
        F.round("overlap_frac", 6).alias("overlap_frac"),
    )

def q_s6_stream_hll_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming distinct-user HLL: the register sketch maintained as a
    bounded streaming aggregate (state <= 2**b rows regardless of user
    cardinality), drained availableNow, finalized batch-side. Output is
    hash-identical to the batch e4_hll_users — batch/stream sketch
    parity."""
    from ..operators.sketches import hll_estimate
    from ..streaming.windows import streaming_hll_registers

    stream = _event_stream(spark, sf_dir)
    regs = streaming_hll_registers(stream, "user_id", b=10)
    drained = _drain_to_memory(regs, "stream_hll_users_sink", "complete")
    return hll_estimate(drained, b=10)

def q_s7_stream_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CMS heavy hitters: the depth x width cell counts
    maintained as a bounded streaming aggregate, drained availableNow,
    then probed batch-side for users whose estimate reaches the
    threshold. Cell-identical to the batch sketch, so it shares
    e3_heavy_hitters' oracle."""
    from ..streaming.windows import streaming_cms_cells

    stream = _event_stream(spark, sf_dir)
    cells = streaming_cms_cells(stream, "user_id", depth=4, width=512)
    sketch = _drain_to_memory(cells, "stream_cms_sink", "complete")
    keys = _events(spark, sf_dir).select(F.col("user_id").alias("key")).distinct()
    from ..operators.sketches import _bucket_expr

    probes = keys.select(
        "key",
        F.explode(
            F.expr(
                "array("
                + ", ".join(
                    f"struct({d}L as row_id, {_bucket_expr('key', d, 512)} as bucket)"
                    for d in range(4)
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
    return est.where(F.col("est_count") >= 50).select(
        F.col("key").cast("string").alias("key"), "est_count"
    )

def q_s8_stream_bloom_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming Bloom ingest pre-filter: the index corpus's set-bit
    positions maintained as a bounded streaming aggregate (state <=
    m_bits rows), drained availableNow, then the new batch probes them
    batch-side — position-identical to e1_bloom_candidates' batch
    filter, so it shares that oracle."""
    from ..operators.sketches import bloom_probe
    from ..streaming.windows import streaming_bloom_positions

    docs_stream = spark.readStream.schema(
        _t(spark, sf_dir, "documents").schema
    ).parquet(f"{sf_dir}/documents.parque[t]")
    index_stream = docs_stream.where(F.col("doc_id") % 10 != 0)
    positions = streaming_bloom_positions(
        index_stream, "text", m_bits=1 << 16, k_hashes=4
    )
    bloom = _drain_to_memory(positions, "stream_bloom_sink", "complete")
    batch = (
        _t(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 10 == 0)
        .select("doc_id", "text")
    )
    probed = bloom_probe(batch, bloom, "text", m_bits=1 << 16, k_hashes=4)
    return batch.join(probed, batch.text == probed.key).select(
        "doc_id", "maybe_member"
    )

def q_s9_stream_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming rolling distinct users: per-day HLL registers
    maintained as a bounded streaming aggregate, drained availableNow,
    merged into 3-day windows batch-side — register-identical to the
    batch daily sketches, so it shares e4_rolling_distinct's oracle."""
    from ..streaming.windows import streaming_daily_hll_registers

    stream = _event_stream(spark, sf_dir)
    daily = streaming_daily_hll_registers(stream, "user_id", "ts", b=10)
    drained = _drain_to_memory(daily, "stream_daily_hll_sink", "complete")

    window_days = 3
    m = 1 << 10
    alpha = 0.7213 / (1.0 + 1.079 / m)
    active = drained.select("day").distinct().withColumnRenamed("day", "wday")
    contrib = drained.select(
        F.explode(
            F.expr(f"sequence(day, date_add(day, {window_days - 1}))")
        ).alias("wday"),
        "reg",
        "max_rho",
    ).join(F.broadcast(active), "wday")
    merged = contrib.groupBy("wday", "reg").agg(F.max("max_rho").alias("max_rho"))
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

def q_s10_stream_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The e4_anomaly detector executed AS A STREAM: per-user last-20
    deques in the state store (applyInPandasWithState), each event
    scored against its key's prior window and emitted exactly once.
    The stream's decimal-quantized sums replicate the batch operator's
    float discipline, so the single-batch availableNow drain is
    bit-identical to the batch result and shares its oracle."""
    from ..streaming.stateful import streaming_zscore

    scored = streaming_zscore(
        _event_stream(spark, sf_dir), "user_id", "ts", "value", n=20,
        z_threshold=3.0,
    )
    return _drain_to_memory(scored, "stream_anomaly_sink", "update")

def q_s11_stream_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PSI drift monitor AS A STREAM: per-DAY drift of the event
    value distribution vs the static week-1 reference. The stream
    bins each event against broadcast reference edges (stream-static
    join), aggregates (day, type, bin) counts in the state store, and
    the drained counts finalize to daily PSI with the same fold as the
    batch operator — the online drift gate a 100 TB ingest pipeline
    runs continuously."""
    from ..operators.drift import (
        bin_counts,
        psi_from_binned_counts,
        quantile_edges,
    )

    ev = _events(spark, sf_dir)
    ref = ev.where(F.col("ts") < F.lit("2024-01-08").cast("timestamp"))
    edges = quantile_edges(ref, "event_type", "value", 10)
    ref_bins = bin_counts(ref, edges, ["event_type"], "value", "n_ref_bin")

    stream = _event_stream(spark, sf_dir).where(
        F.col("ts") >= F.lit("2024-01-08").cast("timestamp")
    )
    cur = stream.withColumn("day", F.date_format("ts", "yyyy-MM-dd"))
    cur_bins = bin_counts(cur, edges, ["day", "event_type"], "value", "n_cur_bin")
    drained = _drain_to_memory(cur_bins, "stream_psi_sink", "complete")
    return psi_from_binned_counts(ref_bins, drained, ["day", "event_type"])

ORACLE_S11_STREAM_PSI = """
WITH ref AS (
  SELECT event_type, value FROM events WHERE ts < TIMESTAMP '2024-01-08'
),
cur AS (
  SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day, event_type, value
  FROM events WHERE ts >= TIMESTAMP '2024-01-08'
),
edges AS (
  SELECT event_type,
         quantile_cont(value, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9])
           AS es
  FROM ref GROUP BY event_type
),
rc AS (
  SELECT r.event_type, 1 + len(list_filter(e.es, x -> r.value > x)) AS bin,
         count(*) AS nr
  FROM ref r JOIN edges e USING (event_type) GROUP BY 1, 2
),
cc AS (
  SELECT c.day, c.event_type,
         1 + len(list_filter(e.es, x -> c.value > x)) AS bin,
         count(*) AS nc
  FROM cur c JOIN edges e USING (event_type) GROUP BY 1, 2, 3
),
ref_full AS (
  SELECT d.day, r.event_type, r.bin, r.nr
  FROM (SELECT DISTINCT day FROM cur) d CROSS JOIN rc r
),
b AS (
  SELECT coalesce(rf.day, cc.day) AS day,
         coalesce(rf.event_type, cc.event_type) AS event_type,
         coalesce(rf.bin, cc.bin) AS bin,
         coalesce(nr, 0) AS nr, coalesce(nc, 0) AS nc
  FROM ref_full rf FULL OUTER JOIN cc
    ON rf.day = cc.day AND rf.event_type = cc.event_type AND rf.bin = cc.bin
),
tot AS (
  SELECT day, event_type, sum(nr) AS tr, sum(nc) AS tc
  FROM b GROUP BY day, event_type
),
terms AS (
  SELECT b.day, b.event_type, b.bin, t.tr, t.tc,
         (greatest(CAST(nr AS DOUBLE) / tr, 1e-6)
          - greatest(CAST(nc AS DOUBLE) / tc, 1e-6))
         * ln(greatest(CAST(nr AS DOUBLE) / tr, 1e-6)
              / greatest(CAST(nc AS DOUBLE) / tc, 1e-6)) AS term
  FROM b JOIN tot t ON b.day = t.day AND b.event_type = t.event_type
)
SELECT day, event_type,
       CAST(max(tr) AS BIGINT) AS n_ref,
       CAST(max(tc) AS BIGINT) AS n_cur,
       round(list_reduce(list(term ORDER BY bin), (a, x) -> a + x), 6) AS psi
FROM terms GROUP BY day, event_type
"""

def q_s12_stream_daily_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-day quality gate AS A STREAM: the suite's aggregation
    half (avg/min/count — all streaming-legal) runs in the state store
    grouped by day, the drained per-day metric rows finalize through
    the SAME unpivot/predicate path as the batch operator — so a
    single availableNow drain is row-identical to batch and shares its
    oracle. This is the online form: a continuously-running ingest
    gate that flags a bad day while it is still arriving."""
    from ..operators.audit import finalize_expectations, grouped_metrics

    suite = _daily_audit_suite()
    stream = _event_stream(spark, sf_dir).withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    metrics = grouped_metrics(stream, ["day"], suite)
    drained = _drain_to_memory(metrics, "stream_daily_audit_sink", "complete")
    return finalize_expectations(drained, ["day"], suite)

def q_s13_stream_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The attribution join AS A STREAM-STREAM JOIN — the hardest
    Structured Streaming primitive and the one the other twelve stream
    variants don't exercise: two watermarked event streams inner-join
    on the user key with the 1-hour range condition, which lets Spark
    bound the join state to the horizon (clicks expire one hour past
    the watermark). An availableNow drain emits exactly the batch
    pairs and shares the batch oracle."""
    from ..operators.events import attribution_join

    clicks = (
        _event_stream(spark, sf_dir)
        .where(F.col("event_type") == "click")
        .withWatermark("ts", "1 hour")
    )
    purchases = (
        _event_stream(spark, sf_dir)
        .where(F.col("event_type") == "purchase")
        .withWatermark("ts", "1 hour")
    )
    joined = attribution_join(clicks, purchases, horizon_seconds=3600)
    return _drain_to_files(joined, "stream_attribution_sink", "append")

def q_s14_stream_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The histogram-quantile sketch AS A STREAM, at daily grain: the
    state store holds only (day, type, bin) counters — the bounded
    sketch is exactly what makes streaming quantiles possible (exact
    percentile is not a streaming aggregate) — and the drained counts
    finalize through the SAME interpolation as the batch operator."""
    from ..operators.sketches import histogram_quantiles, value_histogram

    stream = _event_stream(spark, sf_dir).withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    counts = value_histogram(
        stream, ["day", "event_type"], "value", 0.0, 500.0, 50
    )
    drained = _drain_to_memory(counts, "stream_value_quantiles_sink", "complete")
    return histogram_quantiles(drained, ["day", "event_type"], 0.0, 500.0, 50)

ORACLE_S14_STREAM_VALUE_QUANTILES = """
WITH b AS (
  SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day, event_type,
         CAST(least(greatest(floor((value - 0.0) / 10.0), 0), 49) AS BIGINT)
           AS bin
  FROM events
),
c AS (SELECT day, event_type, bin, count(*) AS cnt FROM b GROUP BY 1, 2, 3),
cum AS (
  SELECT day, event_type, bin, cnt,
         sum(cnt) OVER (PARTITION BY day, event_type ORDER BY bin) AS cum
  FROM c
),
tot AS (SELECT day, event_type, sum(cnt) AS n FROM c GROUP BY 1, 2),
qs AS (SELECT unnest([0.5, 0.9, 0.99]) AS q),
sel AS (
  SELECT cum.day, cum.event_type, q, n,
         arg_min(bin, bin) AS bin,
         arg_min(cnt, bin) AS cnt,
         arg_min(cum, bin) AS cum
  FROM cum JOIN tot USING (day, event_type) CROSS JOIN qs
  WHERE cum >= q * n
  GROUP BY 1, 2, 3, 4
),
est AS (
  SELECT day, event_type, q, n,
         round(0.0 + 10.0 * (bin + (q * n - (cum - cnt)) / cnt), 6) AS est
  FROM sel
)
SELECT day, event_type,
       CAST(max(n) AS BIGINT) AS n,
       max(CASE WHEN q = 0.5 THEN est END) AS p50_est,
       max(CASE WHEN q = 0.9 THEN est END) AS p90_est,
       max(CASE WHEN q = 0.99 THEN est END) AS p99_est
FROM est GROUP BY 1, 2
"""

def q_s15_stream_dp_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DP count release AS A STREAM: a watermarked daily tumbling
    count per (day, event_type) — state store holds one counter per
    bucket, bounded by watermark horizon times type cardinality — then
    the drained counts finalize through the SAME ``dp_release``
    (Laplace mechanism, clamped integer release) as the batch
    ``e6_dp_counts``. The privacy accounting is defined once; batch and
    stream differ only in how the exact counts were produced, which is
    exactly the property a production DP telemetry release needs (the
    mechanism is auditable independently of the ingestion mode)."""
    from ..operators.privacy import dp_release

    stream = _event_stream(spark, sf_dir)
    counts = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window(F.col("ts"), "1 day").alias("win"), F.col("event_type"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(
            F.date_format("win.start", "yyyy-MM-dd").alias("day"),
            "event_type",
            "n",
        )
    )
    drained = _drain_to_memory(counts, "stream_dp_counts_sink", "complete")
    return dp_release(drained, ["day", "event_type"], "n", epsilon=1.0, seed="dp")

ORACLE_S15_STREAM_DP_COUNTS = """
WITH c AS (
  SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day, event_type,
         count(*) AS n
  FROM events GROUP BY 1, 2
),
h AS (
  SELECT day, event_type, n,
         (('0x' || substr(md5('dp'
             || md5(coalesce('v' || day, 'n'))
             || md5(coalesce('v' || event_type, 'n'))), 1, 12))::BIGINT
          + 0.5) / 281474976710656.0 - 0.5 AS u
  FROM c
),
noised AS (
  SELECT day, event_type,
         round(n + (-1.0) * sign(u) * ln(1 - 2 * abs(u)), 6) AS noisy_count
  FROM h
)
SELECT day, event_type, noisy_count,
       CAST(greatest(round(noisy_count, 0), 0) AS BIGINT) AS released
FROM noised
"""

def q_s16_stream_trending(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day trend detection AS A STREAM: a watermarked daily
    tumbling count per (day, type) — the state store holds one counter
    per bucket — drained and finalized through the SAME
    ``events.trend_ranks`` windows as the batch e4_trending, so
    batch/stream parity holds by construction (the oracle IS the batch
    oracle)."""
    from ..operators.events import trend_ranks

    stream = _event_stream(spark, sf_dir)
    counts = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window(F.col("ts"), "1 day").alias("win"), F.col("event_type"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
        .select(
            F.date_format("win.start", "yyyy-MM-dd").alias("day"),
            "event_type",
            "n_events",
        )
    )
    drained = _drain_to_memory(counts, "stream_trending_sink", "complete")
    return trend_ranks(drained)

def q_s17_stream_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CUSUM control chart AS A STREAM: per-user [S+, S-, alarms]
    state in the state store via applyInPandasWithState, charting
    against the FIXED in-control target 250 (a streaming detector
    cannot know the key's global mean — exactly why the batch operator
    grew the fixed-target form). The availableNow drain feeds the
    single time-ordered source as one batch, so the trajectory equals
    the batch fixed-target fold, which is the oracle of record."""
    from ..streaming.stateful import streaming_cusum

    chart = streaming_cusum(
        _event_stream(spark, sf_dir), target=250.0, slack=5.0, threshold=50.0
    )
    table = _drain_to_memory(chart, "stream_cusum_sink", "update")
    return table.groupBy("user_id").agg(
        F.max("n_events").cast("long").alias("n_events"),
        F.max_by("n_alarms", "n_events").cast("long").alias("n_alarms"),
        F.max_by("final_sp", "n_events").alias("final_sp"),
        F.max_by("final_sn", "n_events").alias("final_sn"),
    )

ORACLE_S17_STREAM_CUSUM = """
WITH ordered AS (
  SELECT user_id, list(value::DOUBLE ORDER BY ts, event_id) AS vals
  FROM events GROUP BY user_id
),
folded AS (
  SELECT user_id, vals,
         list_reduce(
           list_prepend([0.0, 0.0, 0.0], list_transform(vals, v -> [v, 0.0, 0.0])),
           (acc, xe) -> CASE
             WHEN greatest(0.0, acc[1] + (xe[1] - 250.0 - 5.0)) > 50.0
                  OR greatest(0.0, acc[2] + (250.0 - xe[1] - 5.0)) > 50.0
             THEN [0.0, 0.0, acc[3] + 1.0]
             ELSE [greatest(0.0, acc[1] + (xe[1] - 250.0 - 5.0)),
                   greatest(0.0, acc[2] + (250.0 - xe[1] - 5.0)),
                   acc[3]]
           END
         ) AS st
  FROM ordered
)
SELECT user_id, CAST(len(vals) AS BIGINT) AS n_events,
       CAST(st[3] AS BIGINT) AS n_alarms,
       round(st[1], 6) AS final_sp,
       round(st[2], 6) AS final_sn
FROM folded
"""

def q_s18_stream_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Welch A/B test AS A STREAM: the per-group exact moments
    (n, sum, sum-of-squares) run as a complete-mode streaming
    aggregate — state is three numbers per arm, the canonical
    'experiment dashboard' shape — and the drained moments finalize
    through the SAME ``ab_finalize`` expression tree as the batch
    e4_ab_test. Decimal sums are order-independent, so the streamed
    result is hash-identical to batch regardless of micro-batching."""
    from ..operators.profile import ab_finalize, ab_moments

    stream = _event_stream(spark, sf_dir)
    moments = ab_moments(stream, "event_type", "value", ("click", "purchase"))
    drained = _drain_to_memory(moments, "stream_ab_test_sink", "complete")
    return ab_finalize(drained, "click", "purchase")

def q_s19_stream_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The inter-arrival burstiness profile AS A STREAM: per-user
    (last-ts, count, gap moments) state via applyInPandasWithState —
    5 scalars per key, so the bot-detection fingerprint streams with
    bounded state. Percentiles are deliberately absent (they need the
    full gap distribution — unholdable online); the moment-based CV is
    the streamable core, shared with the batch ``e4_interarrival``.
    Final rows recovered at max n_events per key after the
    availableNow drain."""
    from ..streaming.stateful import streaming_interarrival

    stats = streaming_interarrival(_event_stream(spark, sf_dir))
    table = _drain_to_memory(stats, "stream_interarrival_sink", "update")
    return table.groupBy("user_id").agg(
        F.max("n_events").cast("long").alias("n_events"),
        F.max_by("mean_gap_s", "n_events").alias("mean_gap_s"),
        F.max_by("max_gap_s", "n_events").alias("max_gap_s"),
        F.max_by("burstiness", "n_events").alias("burstiness"),
    )

ORACLE_S19_STREAM_INTERARRIVAL = """
WITH g AS (
  SELECT user_id,
         (epoch_us(ts) - lag(epoch_us(ts))
            OVER (PARTITION BY user_id ORDER BY ts, event_id)) / 1e6 AS gap_s
  FROM events
),
m AS (
  SELECT user_id,
         count(*) AS n_events,
         count(gap_s) AS gaps,
         sum(gap_s) AS gsum,
         sum(gap_s * gap_s) AS gsumsq,
         max(gap_s) AS gmax
  FROM g GROUP BY user_id
)
SELECT user_id, n_events,
       round(gsum / nullif(gaps, 0), 4) AS mean_gap_s,
       round(gmax, 4) AS max_gap_s,
       CASE WHEN gaps >= 2 AND gsum <> 0 THEN
         round(sqrt(greatest((gsumsq - gaps * pow(gsum / gaps, 2))
                             / (gaps - 1), 0)) / (gsum / gaps), 4)
       END AS burstiness
FROM m
"""

def q_s20_stream_deletion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deletion blast radius AS A STREAM: tombstone ids (event_id
    mod 500, deduplicated statefully so retried requests never double
    count) arrive via readStream and stream-static-join the pinned
    packed-sequence map; per-bin deleted-doc counters drain with
    availableNow and hash-match the batch per-bin counts — the live
    view an erasure-SLA scheduler batches re-pack jobs from."""
    from ..operators.packing import pack_sequences
    from ..streaming.deletion import streaming_deletion_impact

    docs = _t(spark, sf_dir, "documents")
    packed = pack_sequences(
        docs, "doc_id", "text", capacity=256, nshards=8
    ).localCheckpoint(eager=True)
    ev = _event_stream(spark, sf_dir)
    tomb = ev.select(
        (F.col("event_id") % 500).cast("long").alias("doc_id")
    )
    out = streaming_deletion_impact(tomb, packed)
    return _drain_to_memory(out, "stream_deletion_sink", "complete")

ORACLE_S20_STREAM_DELETION = (
    _PACK_REC
    + """,
tomb AS (SELECT DISTINCT event_id % 500 AS doc_id FROM events)
SELECT r.shard, r.bin_id, count(*) AS n_docs_deleted
FROM rec r JOIN tomb t ON t.doc_id = r.doc_id
GROUP BY 1, 2
"""
)

def q_s21_stream_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Markov transition matrix AS A STREAM: per-user (last type,
    cumulative pair counts) state via applyInPandasWithState — state
    bounded by the event-type alphabet squared per key, never by
    stream length. Final per-key counts recovered at max n after the
    availableNow drain; the global rollup (sum per pair, normalize per
    from_type with a broadcast totals join) is the SAME finalize the
    batch ``e4_markov_transitions`` runs, and the oracle is shared."""
    from ..streaming.stateful import streaming_transitions

    counts = streaming_transitions(_event_stream(spark, sf_dir))
    table = _drain_to_memory(counts, "stream_transitions_sink", "update")
    per_key = table.groupBy("user_id", "from_type", "to_type").agg(
        F.max("n").alias("n")
    )
    pair_counts = (
        per_key.groupBy("from_type", "to_type")
        .agg(F.sum("n").cast("long").alias("n"))
        .localCheckpoint(eager=True)
    )
    totals = pair_counts.groupBy("from_type").agg(F.sum("n").alias("__tot"))
    return pair_counts.join(F.broadcast(totals), "from_type").select(
        "from_type",
        "to_type",
        "n",
        F.round(F.col("n") / F.col("__tot"), 6).alias("p"),
    )

def q_s22_stream_rate_spikes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-user peak-rate audit AS A STREAM: 5 scalars of state per
    key via applyInPandasWithState track (open hour, its count, record
    count, record hour, total events); strict-maximum updates reproduce
    the batch argmax's earliest-hour tiebreak online. Final rows
    recovered at max n_events per key after the availableNow drain,
    same >= 2 events/hour flag as the batch ``e4_rate_spikes``."""
    from ..streaming.stateful import streaming_rate_spikes

    peaks = streaming_rate_spikes(_event_stream(spark, sf_dir))
    table = _drain_to_memory(peaks, "stream_rate_spikes_sink", "update")
    return (
        table.groupBy("user_id")
        .agg(
            F.max_by("peak_per_hour", "n_events").alias("peak_per_hour"),
            F.max_by("peak_hour_us", "n_events").alias("peak_hour_us"),
        )
        .where(F.col("peak_per_hour") >= 2)
        .select(
            "user_id",
            F.date_format(
                F.timestamp_micros(F.col("peak_hour_us")),
                "yyyy-MM-dd HH:mm:ss",
            ).alias("peak_hour"),
            F.col("peak_per_hour").cast("long").alias("peak_per_hour"),
        )
    )

def q_s23_stream_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The activity-streak audit AS A STREAM: 7 scalars of state per
    user via applyInPandasWithState (last day, open run length/start,
    best run length/start/end, distinct-day count), days folding as
    epoch-day ints with strict-maximum updates reproducing the batch
    gaps-and-islands earliest-start tiebreak. Final rows recovered at
    max n_days per key after the availableNow drain; epoch days
    formatted back to dates JVM-side."""
    from ..streaming.stateful import streaming_streaks

    runs = streaming_streaks(_event_stream(spark, sf_dir))
    table = _drain_to_memory(runs, "stream_streaks_sink", "update")
    day = lambda c: F.date_format(  # noqa: E731
        F.timestamp_seconds(F.col(c) * 86400), "yyyy-MM-dd"
    )
    return (
        table.groupBy("user_id")
        .agg(
            F.max_by("streak_days", "n_days").alias("streak_days"),
            F.max_by("streak_start_day", "n_days").alias("streak_start_day"),
            F.max_by("streak_end_day", "n_days").alias("streak_end_day"),
        )
        .select(
            "user_id",
            F.col("streak_days").cast("long").alias("streak_days"),
            day("streak_start_day").alias("streak_start"),
            day("streak_end_day").alias("streak_end"),
        )
    )

def q_s24_stream_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The two-step conversion funnel AS A STREAM: per-user state via
    applyInPandasWithState holds (counters, first-conversion pair, the
    OPEN click list) — bounded by clicks-per-hour, because a purchase
    converts every open click in its window and retires the rest, so
    the open list empties at every purchase. Final rows recovered at
    max n_total per key after the availableNow drain; purchase-only
    users (n_a = 0) are dropped to match the batch operator's
    click-row grouping."""
    from ..streaming.stateful import streaming_funnel

    runs = streaming_funnel(_event_stream(spark, sf_dir))
    table = _drain_to_memory(runs, "stream_funnel_sink", "update")
    fmt = lambda c: F.date_format(  # noqa: E731
        F.timestamp_micros(F.col(c)), "yyyy-MM-dd HH:mm:ss"
    )
    return (
        table.groupBy("user_id")
        .agg(
            F.max_by("n_a", "n_total").alias("n_a"),
            F.max_by("n_converted", "n_total").alias("n_converted"),
            F.max_by("first_conv_a_us", "n_total").alias("first_conv_a_us"),
            F.max_by("first_conv_b_us", "n_total").alias("first_conv_b_us"),
        )
        .where(F.col("n_a") > 0)
        .select(
            "user_id",
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_converted").cast("long").alias("n_converted"),
            fmt("first_conv_a_us").alias("first_conv_a_ts"),
            fmt("first_conv_b_us").alias("first_conv_b_ts"),
        )
    )

def q_s25_stream_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The activation readout AS A STREAM: 3 scalars of state per user
    via applyInPandasWithState (first signup, first qualifying
    purchase, event count); the final one-row rollup (conversion rate
    + exact delay quantiles) runs over the drained per-user rows
    through the SAME arithmetic as the batch operator — epoch-micros
    cast back to the identical double seconds the batch divides."""
    from ..streaming.stateful import streaming_time_to_convert

    rows = streaming_time_to_convert(_event_stream(spark, sf_dir))
    table = _drain_to_memory(rows, "stream_ttc_sink", "update")
    final = table.groupBy("user_id").agg(
        F.max_by("start_us", "n_events").alias("start_us"),
        F.max_by("end_us", "n_events").alias("end_us"),
    )
    started = final.where(F.col("start_us").isNotNull())
    delays = started.where(F.col("end_us").isNotNull()).select(
        (
            (
                F.timestamp_micros(F.col("end_us")).cast("double")
                - F.timestamp_micros(F.col("start_us")).cast("double")
            )
            / F.lit(3600.0)
        ).alias("__h")
    )
    n_started = started.agg(
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

def q_s26_stream_metric_correlation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The KPI correlation AS A STREAM: the per-day conditional counts
    run as a complete-mode streaming aggregate (state = two longs per
    day, the dashboard shape) and the drained day rows finalize through
    the SAME Pearson expression tree as the batch e4_metric_correlation
    — integer sufficient statistics make the streamed result
    hash-identical regardless of micro-batching."""
    daily = _daily_xy(_event_stream(spark, sf_dir))
    drained = _drain_to_memory(daily, "stream_corr_sink", "complete")
    return _pearson_finalize(drained)

def q_s27_stream_error_pchart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The p-chart error monitor AS A STREAM: per-day (n, n_err) counts
    run as a complete-mode streaming aggregate (two longs of state per
    day) and the drained day rows finalize through the SAME
    control-limit expression tree as the batch e4_error_pchart —
    integer counts make the streamed chart hash-identical regardless
    of micro-batching."""
    daily = _daily_err(_event_stream(spark, sf_dir))
    drained = _drain_to_memory(daily, "stream_pchart_sink", "complete")
    return _pchart_finalize(drained)

def q_s28_stream_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth accounting AS A STREAM: calendar-bounded state per user
    (first day + seen-day set) via applyInPandasWithState; each
    (user, day) row is emitted exactly once EVEN when a day arrives in
    a later micro-batch than a newer day (out-of-order across the
    batch boundary — r6 advice), so the day-bounded finalize below is
    the SAME arithmetic as the batch rollup and shares its oracle."""
    from ..streaming.stateful import streaming_new_vs_returning

    rows = streaming_new_vs_returning(_event_stream(spark, sf_dir))
    table = _drain_to_memory(rows, "stream_nvr_sink", "update")
    return (
        table.groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_active"),
            F.sum("is_new").cast("long").alias("n_new"),
        )
        .select(
            "day",
            "n_active",
            "n_new",
            (F.col("n_active") - F.col("n_new")).cast("long").alias(
                "n_returning"
            ),
            F.round(F.col("n_new") / F.col("n_active"), 6).alias("new_share"),
        )
    )

def q_s29_stream_out_of_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The lateness audit AS A STREAM: one scalar of state per user
    (max event-time seen) via applyInPandasWithState; per-event flag
    rows drain into the SAME |types|-row rollup expression tree as
    the batch audit, so the twin shares its oracle."""
    from ..streaming.stateful import streaming_out_of_order

    rows = streaming_out_of_order(_event_stream(spark, sf_dir))
    table = _drain_to_memory(rows, "stream_ooo_sink", "update")
    return table.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.when(F.col("late_us").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_late"),
        F.round(
            F.sum(
                F.when(F.col("late_us").isNotNull(), 1).otherwise(0)
            ).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("late_share"),
        F.round(F.max("late_us").cast("double") / 1000000.0, 6).alias(
            "max_lateness_s"
        ),
    )

def q_s30_stream_activity_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The inequality audit AS A STREAM: per-(type, user) event counts
    run as a complete-mode streaming aggregate (one long of state per
    active key) and the drained count frame finalizes through the
    SAME histogram-self-join Gini as the batch operator
    (gini_from_counts, shared verbatim) — integer counts make the
    streamed coefficient hash-identical regardless of micro-batching."""
    from ..operators.events import gini_from_counts

    stream = _event_stream(spark, sf_dir)
    counts = stream.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).cast("long").alias("__c")
    )
    drained = _drain_to_memory(counts, "stream_gini_sink", "complete")
    return gini_from_counts(drained, "event_type", "__c")

def q_s31_stream_tenure_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tenure survival table AS A STREAM: per-user (first, last)
    day spans run as a complete-mode streaming min/max aggregate (two
    dates of state per user) and the drained span frame finalizes
    through the SAME _tenure_finalize as the batch query — integer
    week arithmetic keeps the streamed table hash-identical."""
    stream = _event_stream(spark, sf_dir)
    spans = stream.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("__first"),
        F.max(F.to_date("ts")).alias("__last"),
    )
    drained = _drain_to_memory(spans, "stream_tenure_sink", "complete")
    return _tenure_finalize(drained)

def q_s32_stream_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DiD estimate AS A STREAM: the experiment monitor holds
    exactly FOUR cells of state (treat x pre/post counts + exact
    decimal value sums, a complete-mode aggregate) and the drained
    cells finalize through the SAME mean/interaction expressions as
    the batch query — the effect estimate updates per micro-batch
    with constant state."""
    stream = _event_stream(spark, sf_dir)
    cells = (
        stream.select(
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
    drained = _drain_to_memory(cells, "stream_did_sink", "complete")
    wide = drained.groupBy().agg(
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

def q_s33_stream_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regime detection AS A STREAM: per-day event counts run as a
    complete-mode streaming aggregate (one long of state per calendar
    day) and the drained day frame flows through the SAME bounded
    prefix-sum-join BGSS argmax as the batch query — the detected
    breakpoint updates as days close, with state bounded by the
    calendar, never event volume."""
    stream = _event_stream(spark, sf_dir)
    daily = stream.groupBy(F.to_date("ts").alias("__day")).agg(
        F.count(F.lit(1)).cast("long").alias("__y")
    )
    drained = _drain_to_memory(daily, "stream_chgpt_sink", "complete")
    return _changepoint_finalize(drained)


def q_s34_stream_session_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The session-depth readout AS A STREAM: sessions form in the
    native session_window state store (same stateful operator as s2,
    now also carrying exact whole-second first/last-event bounds), and
    the drained session set finalizes through the SAME
    count/percentile arithmetic as the batch e4_session_depth — so the
    engagement-depth one-rower shares the batch oracle. State is one
    open window per (user, gap-cluster), closed by the watermark;
    percentiles run batch-side over the drained session frame (bounded
    by session count), since chained streaming aggregations are not
    expressible."""
    from ..streaming.windows import streaming_sessionize

    stream = _event_stream(spark, sf_dir)
    sess = streaming_sessionize(
        stream.withColumn("value", F.col("value").cast("decimal(18,6)")),
        gap_minutes=30,
    ).select("user_id", "session_start", "n_events", "duration_s")
    table = _drain_to_files(sess, "stream_session_depth_sink", "complete")
    return table.agg(
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


def q_s35_stream_dow_hour_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The load heatmap AS A STREAM: a complete-mode streaming
    aggregate over exactly the 168 (day-of-week x hour) cells — state
    is the cell table itself, fixed-size regardless of stream length —
    drained with availableNow; the traffic-share normalization runs
    batch-side over the drained 168 rows (chained streaming aggregates
    are not expressible, and the finalize is a presentation step, not
    state). Shares and ISO re-basing use the SAME expressions as the
    batch query, so it shares the batch oracle."""
    stream = _event_stream(spark, sf_dir)
    cells = stream.groupBy(
        F.expr("CAST(dayofweek(ts) AS BIGINT)").alias("__dow_sun1"),
        F.expr("CAST(hour(ts) AS BIGINT)").alias("hour_of_day"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    table = _drain_to_memory(cells, "stream_dow_hour_sink", "complete")
    total = table.agg(
        F.sum("n_events").cast("long").alias("__total")
    ).localCheckpoint(eager=True)
    return table.crossJoin(F.broadcast(total)).select(
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


def q_s36_stream_cdc_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming chunk-store dedup monitor: documents arrive via
    readStream, are content-defined-chunked in-flight (cdc_chunks is a
    pure projection+generate — stateless on a stream), and the per-
    source unique-chunk count is maintained as an HLL register sketch
    keyed (source, reg) — state is AT MOST sources x 1024 rows no
    matter how many chunks flow past, the reason a streaming dedup
    monitor sketches instead of keeping the seen-hash set. Each
    register row also carries its exact occurrence count, so the total
    chunk count per source is the register sums — one streaming
    aggregate, no second pass. Finalized batch-side (chained streaming
    aggregations are forbidden); with the bounded source fully drained
    the output hash-matches the batch-SQL oracle (register arithmetic
    is exact: every 2^-rho term is a dyadic rational, so the inv_sum
    is order-independent)."""
    from ..operators.chunking import cdc_chunks
    from ..operators.sketches import hll_register_exprs

    docs = _t(spark, sf_dir, "documents")
    stream = spark.readStream.schema(docs.schema).parquet(
        f"{sf_dir}/documents.parque[t]"
    )
    chunks = cdc_chunks(stream, keep=["source"])
    reg, rho = hll_register_exprs("chunk_hash", 10)
    regs = (
        chunks.select(
            "source", F.expr(reg).alias("reg"), F.expr(rho).alias("rho")
        )
        .groupBy("source", "reg")
        .agg(F.max("rho").alias("max_rho"), F.count(F.lit(1)).alias("cnt"))
    )
    drained = _drain_to_memory(regs, "stream_cdc_dedup_sink", "complete")
    m = 1024
    alpha = 0.7213 / (1.0 + 1.079 / m)
    agg = drained.groupBy("source").agg(
        F.sum(F.expr("pow(cast(2 as double), -max_rho)")).alias("inv_sum"),
        F.count(F.lit(1)).alias("n_nonzero"),
        F.sum("cnt").cast("long").alias("n_chunks"),
    )
    return agg.select(
        "source",
        "n_chunks",
        F.expr(
            f"round({alpha} * {m} * {m} / (inv_sum + ({m} - n_nonzero)), 4)"
        ).alias("raw_est"),
        "n_nonzero",
    ).select(
        "source",
        "n_chunks",
        F.expr(
            f"cast(round(CASE WHEN raw_est <= {2.5 * m} AND ({m} - n_nonzero) > 0 "
            f"THEN {m} * ln(cast({m} as double) / ({m} - n_nonzero)) "
            f"ELSE raw_est END) as bigint)"
        ).alias("est_unique_chunks"),
    )


def _oracle_s36() -> str:
    from .e3 import _oracle_cdc_chunks

    return f"""
WITH docs AS (SELECT doc_id, source, text FROM documents),
{_oracle_cdc_chunks("docs")},
h AS (
  SELECT source,
         ('0x' || substr(md5(':' || chunk_hash), 1, 12))::BIGINT AS h48
  FROM chunks
),
parts AS (
  SELECT source, (h48 // 4294967296) % 1024 AS reg,
         h48 % 4294967296 AS tail
  FROM h
),
regs AS (
  SELECT source, reg,
         max(CASE WHEN tail = 0 THEN 33 ELSE 33 - length(bin(tail)) END)
           AS max_rho,
         count(*) AS cnt
  FROM parts GROUP BY 1, 2
),
agg AS (
  SELECT source, sum(power(2.0, -max_rho)) AS inv_sum,
         count(*) AS n_nonzero, sum(cnt) AS n_chunks
  FROM regs GROUP BY source
)
SELECT source,
       CAST(n_chunks AS BIGINT) AS n_chunks,
       CAST(round(CASE WHEN raw_est <= 2560.0 AND (1024 - n_nonzero) > 0
                  THEN 1024 * ln(1024.0 / (1024 - n_nonzero))
                  ELSE raw_est END) AS BIGINT) AS est_unique_chunks
FROM (
  SELECT source, n_chunks,
         round(0.7213 / (1.0 + 1.079 / 1024) * 1024 * 1024
               / (inv_sum + (1024 - n_nonzero)), 4) AS raw_est,
         n_nonzero
  FROM agg
)
"""


ORACLE_S36_STREAM_CDC_DEDUP = _oracle_s36()


def q_s37_stream_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of e4_concurrency (r9): sessions form IN-FLIGHT
    via the native state-store-backed session_window (the stateful
    stage — state is one open session per active user key, closed and
    evicted as the watermark passes last_event + gap), drained with
    availableNow; the two-level distributed sweep-line then runs
    batch-side on the CLOSED session intervals (chained streaming
    aggregations are forbidden; s36 finalizes batch-side the same
    way). Per-hour output state is calendar-bounded by construction.
    With the bounded source fully drained the session set equals the
    batch lag-gap formulation (same measure-zero boundary note as s2 —
    and since r10 the no-exact-1800s-gap + sub-second-timestamp fixture
    invariants the argument rests on are ASSERTED by
    tests/test_round10_fixes.py::test_fixture_has_no_exact_session_gap_boundary,
    so a fixture regen cannot silently flip this oracle), so the
    e4_concurrency oracle applies verbatim — stateful batch/stream
    parity for the sweep-line family."""
    from ..operators.intervals import concurrency_by_hour

    stream = _event_stream(spark, sf_dir)
    sess = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(
            F.session_window(F.col("ts"), "30 minutes").alias("sess"),
            F.col("user_id"),
        )
        .agg(
            F.min(F.col("ts").cast("long")).alias("s"),
            F.max(F.col("ts").cast("long")).alias("e"),
        )
        .select("s", "e")
    )
    drained = _drain_to_files(sess, "stream_concurrency_sink", "complete")
    return concurrency_by_hour(drained, "s", "e")


def _oracle_s37() -> str:
    from .e4 import ORACLE_E4_CONCURRENCY

    return ORACLE_E4_CONCURRENCY


ORACLE_S37_STREAM_CONCURRENCY = _oracle_s37()


def q_s38_stream_incident_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of e4_incident_overlap (r10 — the twin of this
    round's fixed flagship): user sessions form IN-FLIGHT via the
    state-store-backed session_window (state = one open session per
    active user; sessions CLOSE as the watermark passes
    last_event + gap, but under this drain's COMPLETE output mode the
    aggregation state itself is retained, not evicted — boundedness
    here comes from the availableNow drain over a bounded source, and
    on an unbounded source this pattern would need append mode to get
    watermark eviction; r10 advice) and drain with availableNow; the
    interval overlap join against the calendar-bounded hot-hour
    incidents, and the rollup, finalize BATCH-side (chained streaming
    aggregations are forbidden — same split as s36/s37). The incident
    side is a corpus-scale batch aggregation, so it is
    localCheckpoint'ed before interval_join multi-consumes it (the
    exact r9 regression this round fixed in the batch flagship); the
    session side is ROW-SCALE, so it drains executor-side to a tmp
    parquet dir (r10 verdict item 5 — never driver-resident) whose
    read-back is cheaply re-scannable. bucket_seconds=3600
    because incidents are hour-aligned (grid provably right, no eager
    median pass). With the bounded source fully drained the session
    set equals the batch lag-gap formulation (measure-zero boundary,
    ASSERTED against the fixtures by
    tests/test_round10_fixes.py::test_fixture_has_no_exact_session_gap_boundary),
    so the e4_incident_overlap oracle applies verbatim."""
    from ..operators import intervals
    from .e4 import _events

    stream = _event_stream(spark, sf_dir)
    sess = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(
            F.session_window(F.col("ts"), "30 minutes").alias("sess"),
            F.col("user_id"),
        )
        .agg(
            F.min(F.col("ts").cast("long")).alias("s"),
            F.max(F.col("ts").cast("long")).alias("e"),
        )
        .select("user_id", "s", "e")
    )
    drained = _drain_to_files(sess, "stream_incident_overlap_sink", "complete")
    inc = intervals.hot_hour_incidents(_events(spark, sf_dir)).localCheckpoint()
    pairs = intervals.interval_join(
        drained, inc, "s", "e", "inc_start", "inc_end", bucket_seconds=3600
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


def _oracle_s38() -> str:
    from .e4 import ORACLE_E4_INCIDENT_OVERLAP

    return ORACLE_E4_INCIDENT_OVERLAP


ORACLE_S38_STREAM_INCIDENT_OVERLAP = _oracle_s38()
