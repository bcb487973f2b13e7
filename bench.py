"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each declared query is forced through a full materialization (noop sink —
no driver collect, no disk) so the measured time is plan execution, not
result transfer. The convert benchmark runs the actual TFRecord write.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    # convert-pipeline surface
    "a3_vocabulary_apply",
    "a4_zscore",
    # relational
    "rel_pricing_summary",
    "rel_top_orders",
    "rel_region_revenue",
    "rel_topk_per_group",
    "rel_big_orders",
    "rel_running_sum",
    "rel_cube",
    "rel_discount_revenue",
    "rel_nation_volume",
    "rel_returned_revenue",
    "rel_disjunctive_revenue",
    # dedup
    "e1_dedup_exact",
    "e1_minhash_signatures",
    "e1_lsh_pairs",
    "e1_jaccard_pairs",
    "e1_simhash",
    # similarity
    "e2_topk_cosine",
    "e2_ivf_assign",
    "e2_ivf_topk",
    # text
    "e3_token_stats",
    "e3_quality",
    "e3_word_frequencies",
    "e3_bigrams",
    # events
    "e4_hourly_rollup",
    "e4_sessionize",
    "e4_asof_latest",
    "e4_sliding_window",
    # round-2 operators
    "a6_vocabulary_tokens",
    "e2_ivf_topk_nprobe",
    "e1_fuzzy_dedup",
    # round-3 operators
    "e1_contamination",
    "e4_partitioned_rollup",
    "e6_sequence_pack",
    "e6_mixture_sample",
    "e3_lm_score",
    "e3_redact",
    "e6_curate",
    # round-4: track the new heavy dedup operators before they get
    # expensive (r3 verdict item 6)
    "e1_incremental_dedup",
    "e1_keep_best",
    "e4_asof_join_tolerance",
    # round-4 operators with nontrivial sf0.1 cost
    "e2_pq_topk",
    "e3_postings",
    "e3_span_dedup",
    "e3_heavy_hitters",
    # session-4 operators: track the new join/window-heavy shapes
    "e4_gap_fill",
    "e4_anomaly",
    "e1_record_linkage",
    "e6_snapshot_diff",
    "e4_winsorize",
    # session-5 operators: chunk explode and the bucketed-batching window
    "e3_chunk",
    "e6_length_buckets",
    "e6_data_audit",
    "e4_daily_audit",
    "e4_seasonal",
    "e4_attribution",
    # session-6 operators: the new join/sketch/encode shapes
    "rel_market_share",
    "rel_key_skew",
    "e1_normalized_dedup",
    "e4_value_quantiles",
    "e3_bpe_encode",
    # session-7 operators: hybrid retrieval, leakage-safe split (runs
    # the full fuzzy pipeline), Q21-style reformulated double-EXISTS
    "e2_hybrid_rrf",
    "p4_leakage_safe_split",
    "rel_waiting_supplier",
    "e4_trending",
    "e2_mmr_rerank",
    "e2_delta_search",
    "e1_triangle_stats",
    "e4_cusum",
    "e6_curate_v2",
    # round-5: newest flagships (r4 verdict item 7) + the rebuilt
    # curriculum (now a distributed rank — track its real cost)
    "e4_ab_test",
    "e4_forecast",
    "e2_retrieve_diverse",
    "e6_dataset_card",
    "e1_dedup_savings",
    "e3_lang_agreement",
    "e4_weekend_effect",
    "e6_curriculum",
    "e2_range_search",
    "e2_ivf_balance",
    "e4_interarrival",
    "e3_readability",
    "e5_codec_roundtrip",
    "e4_markov_transitions",
    "e1_lsh_recall_audit",
    "e6_deletion_impact",
    "rel_zorder_locality",
    "e3_token_fertility",
    "e2_ivf_rebalance",
    "e4_trend_slope",
    "e4_holt",
    "e6_bpe_pack",
    # round-6: sampled-truth recall audit (tracks the scale path of
    # e1_lsh_recall_audit)
    "e1_lsh_recall_sampled",
    # round-6 session-2: the new join/vote/containment shapes
    "e2_knn_classify",
    "e2_label_purity",
    "e1_containment_pairs",
    "e3_ngram_novelty",
    "rel_local_supplier_volume",
    "rel_large_volume",
    "e5_phash_dedup",
    "e2_nprobe_recall_curve",
    "e6_quality_quota",
    "rel_supplier_variety",
    "e4_type_affinity",
    "e2_dim_truncation_curve",
    "e4_rate_spikes",
    "e6_epoch_allocation",
    "e3_code_detect",
    "e5_aspect_buckets",
    "e5_shot_boundary",
    "e2_sq_recall",
    "e4_streaks",
    "e6_stratified_shards",
    "e5_letterbox",
    "rel_profit_by_nation",
    "rel_late_lines",
    "e6_anneal_schedule",
    "e4_funnel3",
    "e2_filtered_topk",
    "e4_dau_stickiness",
    "e3_filter_venn",
    "e2_ood_outliers",
    "e3_oov_rate",
    "e4_metric_correlation",
    "e1_source_overlap",
    # round-6 session-3: the new audit/pair shapes with nontrivial
    # sf0.1 cost (gini histogram self-join, JSD pair matrix, basket
    # self-join, user-window lateness scan, dup-bias text shuffle)
    "e4_activity_gini",
    "p6_temporal_split",
    "e2_dim_variance",
    "e3_source_divergence",
    "rel_copurchase",
    "e4_out_of_order",
    "e1_dup_length_bias",
    "e4_changepoint",
    "e4_autocorr",
    # heavy: runs the full two-stage fuzzy pipeline once (tracked per
    # the r4 rule: bench new dedup-family ops before they get expensive)
    "e1_threshold_sweep",
    # round-6 session-3b: the remaining batch shapes (causal 4-cell,
    # ESS, log-odds profile, survival, robust outliers, latency
    # buckets, PRF re-rank, correlation matrices, migration, backtest,
    # and the CC-based inflation audit — the heaviest new dedup shape)
    "e4_diff_in_diff",
    "e6_ess_mixture",
    "e3_distinctive_terms",
    "e4_tenure_curve",
    "e4_mad_outliers",
    "rel_ship_latency_buckets",
    "e2_rocchio_prf",
    "e4_type_correlation_matrix",
    "e2_dim_correlation",
    "rel_segment_migration",
    "e4_forecast_backtest",
    "e1_cluster_inflation",
    "e6_quality_threshold_curve",
    "e1_label_inconsistency",
    "e6_shard_stability",
    "e2_nlist_recall_curve",
]


def benched_queries() -> list[str]:
    """The exact list of registry queries the bench times, in slot
    order: the curated flagship list first (stable round-over-round
    comparison), then every remaining registry query auto-appended so
    a new query can never be silently unbenched (r6 verdict item 5).
    Named exclusion: the streaming twins — micro-batch wall-time is
    dominated by trigger/drain latency of the availableNow memory-sink
    harness, not plan cost; their plan cost is the batch twin's, which
    IS benched, and their correctness is covered by check_oracle +
    pytest drains. The exclusion is derived from MODULE MEMBERSHIP
    (the callable lives in queries/streams.py), not a name pattern, so
    a batch query named like a twin cannot be silently unbenched (r7
    advice item 4). Exposed as a function so the regression test pins
    the REAL list, not a re-derivation (r8 review)."""
    from tensorflow_recorder_spark.queries import QUERIES

    def _is_stream(fn) -> bool:
        return getattr(fn, "__module__", "").endswith(".queries.streams")

    auto_appended = [
        name
        for name, fn in QUERIES.items()
        if name not in set(BENCH_QUERIES) and not _is_stream(fn)
    ]
    return BENCH_QUERIES + auto_appended


def bench_convert(spark, sf_dir: str) -> float:
    """Flagship ETL: the full convert pipeline (split routing + vocabulary
    fit/apply + Example encode + sharded gzip TFRecord write) over the
    documents table."""
    from collections import OrderedDict

    from pyspark.sql import functions as F

    import tensorflow_recorder_spark.types as tt
    from tensorflow_recorder_spark.plans.convert import run_convert
    from tensorflow_recorder_spark.schema import Schema

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").withColumn(
        "split",
        F.expr(
            "CASE WHEN doc_id % 10 < 7 THEN 'TRAIN' "
            "WHEN doc_id % 10 < 9 THEN 'VALIDATION' ELSE 'TEST' END"
        ),
    )
    schema = Schema(
        OrderedDict(
            [
                ("split", tt.SplitKey),
                ("doc_id", tt.IntegerInput),
                ("text", tt.StringInput),
                ("lang", tt.StringLabel),
                ("source", tt.StringInput),
                ("n_chars", tt.IntegerInput),
            ]
        )
    )
    out = tempfile.mkdtemp(prefix="bench-convert-")
    t0 = time.time()
    run_convert(spark, docs, schema, out, job_label="bench")
    dt = time.time() - t0
    shutil.rmtree(out, ignore_errors=True)
    return dt


def bench_convert_lineitem(spark, sf_dir: str) -> float:
    """Throughput-scale convert: the full pipeline over lineitem (600k
    rows at sf0.1, 7 columns incl. a vocabulary label) — measures the
    encode+write path at volume, where the documents-table convert is
    dominated by fixed job overhead."""
    from collections import OrderedDict

    from pyspark.sql import functions as F

    import tensorflow_recorder_spark.types as tt
    from tensorflow_recorder_spark.plans.convert import run_convert
    from tensorflow_recorder_spark.schema import Schema

    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .withColumn(
            "split",
            F.expr(
                "CASE WHEN l_orderkey % 10 < 7 THEN 'TRAIN' "
                "WHEN l_orderkey % 10 < 9 THEN 'VALIDATION' ELSE 'TEST' END"
            ),
        )
        .select(
            "split",
            "l_orderkey",
            "l_partkey",
            "l_quantity",
            "l_extendedprice",
            "l_returnflag",
            F.col("l_shipdate").cast("string").alias("l_shipdate"),
        )
    )
    schema = Schema(
        OrderedDict(
            [
                ("split", tt.SplitKey),
                ("l_orderkey", tt.IntegerInput),
                ("l_partkey", tt.IntegerInput),
                ("l_quantity", tt.FloatInput),
                ("l_extendedprice", tt.FloatInput),
                ("l_returnflag", tt.StringLabel),
                ("l_shipdate", tt.StringInput),
            ]
        )
    )
    out = tempfile.mkdtemp(prefix="bench-convert-li-")
    t0 = time.time()
    run_convert(spark, li, schema, out, job_label="bench-li")
    dt = time.time() - t0
    shutil.rmtree(out, ignore_errors=True)
    return dt


def _loadavg() -> list[float]:
    """1/5/15-minute host load averages — recorded before and after the
    sweep so a poisoned session (competing load inflating byte-identical
    queries) is machine-detectable in the committed record, not a
    judgment call (r9 verdict item 7: two poisoned sweeps were caught
    only by eye)."""
    try:
        with open("/proc/loadavg") as f:
            return [float(x) for x in f.read().split()[:3]]
    except (OSError, ValueError):  # non-Linux fallback
        return []


def _cpu_reference() -> float:
    """A fixed single-thread CPU workload (~1-2 s on this class of
    host), timed — the level gauge the r11 adjudication was missing:
    the r11 cold-start bench read a uniform 1.3x vs the r10 committed
    record on byte-identical code, and solo spot-checks confirmed the
    HOST was slower, but nothing in-record could prove it. Comparing
    this field across two records separates machine-level drift
    (reference moves with the totals) from a code regression
    (reference steady, totals move). numpy matmul + pure-Python loop
    + sha256, so JIT-free interpreter speed, BLAS speed, and memory
    bandwidth all contribute."""
    import hashlib

    import numpy as np

    t0 = time.time()
    rng = np.random.RandomState(0)
    a = rng.rand(600, 600)
    for _ in range(12):
        a = a @ a.T / 600.0
    acc = 0
    for i in range(2_000_000):
        acc = (acc * 31 + i) & 0xFFFFFFFF
    hashlib.sha256(bytes(8_000_000)).hexdigest()
    return round(time.time() - t0, 3)


def _mem_reference(cap_s: float = 3.0) -> float:
    """Fixed single-thread memory-bandwidth workload (~0.1-0.3 s on a
    quiet host): two stream multiplies over a cached 256 MB buffer
    (~1.5 GB of bus traffic). The r11 continuation session caught the
    host in windows where this exact pass took 50 s (~200x) while
    ``_cpu_reference`` sat at its QUIET reading and loadavg read 0.1 —
    outside-sandbox memory-bus saturation is invisible to both existing
    gauges but devastates the Arrow/numpy-heavy queries (observed:
    identical e1 fused-dedup runs at 3 s and 46 s minutes apart).
    Recorded before/after the sweep and consulted by the quiesce loop.

    r12 (verdict item 1): the probe itself is now TIME-BOUNDED — the
    same 2x256 MB of traffic runs as 16 chunked multiplies into a
    preallocated output with an early exit once ``cap_s`` is exceeded,
    so a probe taken inside a stall reads ">= cap_s" (still far above
    the 1.0 s quiet threshold, so fully diagnostic) instead of hanging
    the harness for minutes. The quiet-host reading is unchanged
    (same buffer, same traffic), keeping the field comparable with the
    r11 committed records."""
    import numpy as np

    buf = getattr(_mem_reference, "_buf", None)
    if buf is None:
        buf = np.ones(32_000_000)
        _mem_reference._buf = buf
        _mem_reference._out = np.empty_like(buf)
    out = _mem_reference._out
    n = len(buf)
    step = n // 8
    t0 = time.time()
    for _ in range(2):
        for lo in range(0, n, step):
            np.multiply(buf[lo : lo + step], 2.0, out=out[lo : lo + step])
            if time.time() - t0 > cap_s:
                return round(time.time() - t0, 3)
    return round(time.time() - t0, 3)


def _quiesce(threshold: float = 1.5, max_wait_s: float = 240.0,
             poll_s: float = 5.0, mem_threshold_s: float = 1.0) -> float:
    """Pre-flight quiesce loop (r10 verdict item 3): the driver's r10
    bench session started hot (decaying load from a prior Spark run)
    and read 36% high on byte-identical code — and the established
    observation is that a FIXED sleep is not enough, because load
    decays on the host's schedule, not ours. Wait until the 1-minute
    loadavg drops below ``threshold`` (cap the wait at ``max_wait_s``)
    and return how long we waited; the record carries the wait so a
    still-hot start is auditable rather than invisible.

    r11 continuation: ALSO require the memory-bandwidth reference below
    ``mem_threshold_s`` — loadavg cannot see outside-sandbox bus
    saturation (observed loadavg 0.14 during a 50 s stall of the
    256 MB stream probe). During a stall the probe itself runs long,
    which consumes the wait budget exactly as intended; ``max_wait_s``
    still caps the total."""
    t0 = time.time()
    while time.time() - t0 < max_wait_s:
        la = _loadavg()
        if (not la or la[0] < threshold) and (
            mem_threshold_s == float("inf")
            or _mem_reference() < mem_threshold_s
        ):
            break
        time.sleep(poll_s)
    return round(time.time() - t0, 1)


def _rising(runs: list[float]) -> bool:
    """A query whose three TIMED samples rise monotonically by >20%
    total is the poisoned-session signature: steady-state plans get
    FASTER or stay flat across back-to-back reruns (JIT, shuffle-file
    cache); rising means something else is eating the machine."""
    timed = runs[1:]
    return (
        len(timed) == 3
        and timed[0] < timed[1] < timed[2]
        and timed[2] > timed[0] * 1.2
    )


def _dispersed(runs: list[float]) -> bool:
    """High-dispersion samples are the memory-bus-stall signature (r11
    continuation): during an outside-sandbox bandwidth stall the three
    timed samples of one query swing wildly but NOT monotonically
    (observed [11.1, 45.8, 5.2] on a query whose steady state is ~3 s),
    so the rising-only flag misses them and even the median is
    poisoned. Flag when max/min > 2.5x AND the absolute spread exceeds
    0.5 s (so sub-second jitter on cheap queries doesn't trip it);
    flagged rows get the same quiesce + solo re-run splice as rising
    rows."""
    timed = sorted(runs[1:])
    return (
        len(timed) == 3
        and timed[2] - timed[0] > 0.5
        and timed[2] > timed[0] * 2.5
    )


class _Deadline(Exception):
    """Raised by the SIGALRM handler when the hard wall budget expires."""


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ["SPARK_GRAFT_CPUS"] = cpus
    strict = "--strict" in sys.argv
    # r12 (verdict item 1): the r11 driver bench timed out (rc=124, no
    # one-line JSON) because the hygiene machinery — pre-flight quiesce
    # capped at 600 s, an 1800 s stall-guard budget, and an unbounded
    # 256 MB probe before every query — could add ~40 minutes of
    # deliberate waiting on a stall-prone host. ALL hygiene waiting now
    # draws from ONE wall budget (default 180 s; raise with
    # SPARK_GRAFT_BENCH_PATIENT when taking committed records on a
    # known-noisy host), the probe itself is time-bounded (see
    # _mem_reference), and a SIGALRM hard deadline
    # (SPARK_GRAFT_BENCH_WALL_S, default 2850 s) guarantees the
    # one-line JSON prints with rc=0 even if sampling must be cut
    # short — fewer samples beat no output. The TIMED methodology
    # (noop sink, median of 3 after an untimed warm-up) is unchanged.
    hygiene_budget_s = float(os.environ.get("SPARK_GRAFT_BENCH_PATIENT", "180"))
    wall_budget_s = float(os.environ.get("SPARK_GRAFT_BENCH_WALL_S", "2850"))
    hygiene_spent_s = 0.0
    t_wall0 = time.time()

    import signal

    alarm_fired = False

    def _on_alarm(signum, frame):
        # set the flag BEFORE raising: when the alarm interrupts a
        # py4j socket read, py4j consumes the _Deadline and re-raises
        # its own Py4JNetworkError/Py4JError — the sweep loop treats
        # ANY exception after the alarm fired as the deadline (smoke-
        # tested: without the flag the transmuted error escaped and
        # the JSON line never printed).
        nonlocal alarm_fired
        alarm_fired = True
        raise _Deadline()

    try:
        signal.signal(signal.SIGALRM, _on_alarm)
        signal.alarm(max(1, int(wall_budget_s)))
        alarm_armed = True
    except (ValueError, OSError):  # non-main thread / non-POSIX fallback
        alarm_armed = False

    quiesce_wait_s = _quiesce(max_wait_s=hygiene_budget_s)
    hygiene_spent_s += quiesce_wait_s
    load_before = _loadavg()
    cpu_ref_before = _cpu_reference()
    mem_ref_before = _mem_reference()

    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.0

    from tensorflow_recorder_spark.queries import QUERIES
    from tensorflow_recorder_spark.session import get_spark

    spark = get_spark("bench", master=f"local[{cpus}]")

    # Warm the JVM, parquet reader, and Arrow Python-worker pools outside
    # the timed region so per-query numbers measure plan execution, not
    # one-time initialization (first parquet scan + first mapInPandas each
    # cost ~2s of setup regardless of data volume).
    spark.range(1000).select("id").write.format("noop").mode("overwrite").save()
    import pandas as _pd  # noqa: F401

    spark.range(100).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")  # events ts
    for table in ("orders", "customer", "lineitem", "documents", "embeddings", "events"):
        spark.read.parquet(f"{sf_dir}/{table}.parquet").limit(64).write.format(
            "noop"
        ).mode("overwrite").save()

    # The two convert benches run FIRST, immediately after warmup —
    # their wall-time is the flagship ETL number compared round-over-
    # round, and running them at the END of a growing query list let
    # JVM session aging (GC pressure, Python-worker churn) inflate
    # them as the list grew (r6 judge: 4.45s recorded vs 2.7s
    # isolated, code unchanged). Their slot is now fixed regardless
    # of how many queries follow.
    # One UNTIMED warm-up execution, then three timed samples; the
    # reported number is the MEDIAN of the three timed samples (r8
    # verdict item 2: even the median of three carried first-run
    # JIT/cache warm-up — e1_fuzzy_dedup recorded 11.9s from samples
    # [18.9, 11.9, 3.7] whose steady state is ~3.7s, producing a 9%
    # committed-vs-driver gap on byte-identical code. The warm-up run
    # absorbs whole-stage-codegen JIT, shuffle-file cache, and Python-
    # worker pool spin-up so the timed samples measure steady state).
    # The warm-up duration and all three timed samples are persisted in
    # the full record (queries_samples, first element = warm-up) for
    # per-query adjudication.
    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    samples: dict[str, list[float]] = {}

    def _median3(runs: list[float]) -> float:
        return sorted(runs)[1]

    def _run_once(name: str) -> float:
        if name == "convert_tfrecord":
            return round(bench_convert(spark, sf_dir), 3)
        if name == "convert_lineitem":
            return round(bench_convert_lineitem(spark, sf_dir), 3)
        fn = QUERIES[name]
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)

    def _sample4(name: str) -> list[float]:
        """One untimed warm-up + three timed samples."""
        return [_run_once(name) for _ in range(4)]

    # Per-query stall guard (r11 continuation): the host's memory-bus
    # stalls run 1-5 MINUTES — long enough to inflate all three of one
    # query's samples uniformly, which neither the rising nor the
    # dispersion flag can see (a 527 s record was taken that way: it
    # started inside a stall after the pre-flight quiesce hit its cap,
    # mem_reference_s_before 89 s). Probe the bus before each query's
    # sample set and wait an active stall out; the metric is the SUM OF
    # PER-QUERY MEDIANS, so inter-query waits cost the record nothing.
    # Overhead when quiet: one ~0.2 s probe per query (NOT charged to
    # the budget — only stall-time is). r12: the wait draws from the
    # shared hygiene budget; once it is spent, the guard is a no-op so
    # the sweep can never be wall-clocked out by its own hygiene.
    stall_wait_s = 0.0
    stall_events = 0

    def _stall_guard() -> None:
        nonlocal stall_wait_s, stall_events, hygiene_spent_s
        if hygiene_spent_s >= hygiene_budget_s:
            return
        t0 = time.time()
        if _mem_reference() < 1.0:
            return
        stall_events += 1
        _quiesce(
            max_wait_s=max(0.0, hygiene_budget_s - hygiene_spent_s
                           - (time.time() - t0))
        )
        dt = time.time() - t0
        stall_wait_s += dt
        hygiene_spent_s += dt

    # Soft degradation (r12): past 60% of the wall budget, drop to one
    # untimed warm-up + ONE timed sample per remaining query so every
    # query still gets a number before the hard deadline; degraded rows
    # are listed in-record (queries_degraded) so the reduced confidence
    # is auditable. Normal 32-core sweeps finish well under the
    # threshold and take the full median-of-3 everywhere.
    degraded: list[str] = []
    deadline_hit = False

    def _measure(name: str) -> None:
        if time.time() - t_wall0 > 0.6 * wall_budget_s:
            degraded.append(name)
            runs = [_run_once(name) for _ in range(2)]
            samples[name] = runs
            cold[name] = runs[0]
            timings[name] = runs[1]
            return
        _stall_guard()
        runs = _sample4(name)
        samples[name] = runs  # runs[0] is the discarded warm-up
        cold[name] = runs[0]
        timings[name] = _median3(runs[1:])

    flagged: list[str] = []
    flagged_initial: dict[str, list[float]] = {}
    rerun_wait_s = 0.0
    try:
        for name in (
            "convert_tfrecord",
            "convert_lineitem",
            *benched_queries(),
        ):
            _measure(name)

        # Transient-row splice (r10 verdict item 4): the r10 committed
        # record carried e1_threshold_sweep at 15.8 s (solo: 7.6)
        # because the audit FLAGGED its rising samples but nothing
        # re-measured them. When the audit flags rows, quiesce again
        # and re-run just those queries; the committed median is the
        # steady-state re-run, with the flagged transient samples kept
        # in-record (queries_samples_flagged_initial) for adjudication.
        flagged = sorted(
            k for k, v in samples.items() if _rising(v) or _dispersed(v)
        )
        if flagged and time.time() - t_wall0 < 0.6 * wall_budget_s:
            rerun_wait_s = _quiesce(
                max_wait_s=max(0.0, hygiene_budget_s - hygiene_spent_s)
            )
            hygiene_spent_s += rerun_wait_s
            for name in flagged:
                flagged_initial[name] = samples[name]
                runs = _sample4(name)
                samples[name] = runs
                cold[name] = runs[0]
                timings[name] = _median3(runs[1:])
    except BaseException as exc:
        # Hard wall deadline: flush what we have. Partial medians with
        # rc=0 beat a timeout with no JSON line (r11: two rc=124 driver
        # runs left the round with no ground-truth number at all). The
        # alarm can surface as _Deadline OR as a transmuted py4j error
        # (the signal interrupts a blocking socket read inside py4j);
        # anything raised after the alarm fired is the deadline — a
        # real exception before it still propagates normally.
        if not alarm_fired and not isinstance(exc, _Deadline):
            raise
        deadline_hit = True
    if alarm_armed:
        signal.alarm(0)

    total = round(sum(timings.values()), 3)
    # Full record (warm + cold runs) goes to disk. Stdout ordering is
    # load-bearing: the driver keeps only the TAIL of stdout, and the
    # combined one-line dict was truncated to its tail in r4 AND r5
    # (BENCH_r0{4,5}.json "parsed": null — r5 verdict item 1). So the
    # big per-query dict prints FIRST and the LAST line is a short
    # (<200 chars) summary that survives tail-capture intact.
    rising = sorted(k for k, v in samples.items() if _rising(v))
    rising_pct = round(100.0 * len(rising) / max(1, len(samples)), 1)
    dispersed = sorted(k for k, v in samples.items() if _dispersed(v))
    full = {
        "metric": "headline_queries_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_cold_run": cold,
        "queries_samples": samples,
        "aggregation": "median_of_3_after_untimed_warmup",
        "sf": sf,
        # Session-hygiene audit (r9 verdict item 7): host load before/
        # after, plus the queries whose timed samples rose monotonically
        # >20% — the poisoned-session signature. A record with
        # rising_pct > 20 should be re-run solo, not committed.
        "load_avg_before": load_before,
        "load_avg_after": _loadavg(),
        "rising_sample_queries": rising,
        "rising_sample_pct": rising_pct,
        # r10 verdict items 3+4: seconds the pre-flight quiesce loop
        # waited for the 1-min loadavg to decay, the rows whose first
        # pass was flagged transient and re-run (their committed
        # numbers are the re-run medians), and those rows' original
        # transient samples, kept for adjudication.
        "quiesce_wait_s": quiesce_wait_s,
        "rerun_quiesce_wait_s": rerun_wait_s,
        "spliced_queries": flagged,
        "queries_samples_flagged_initial": flagged_initial,
        # r11: fixed single-thread CPU workload timed before/after the
        # sweep — compare across records to separate host-level drift
        # (this moves with the totals) from a code regression (this
        # stays put). The r11 1.31x-vs-r10 level shift needed solo
        # spot-checks to adjudicate; this field does it in-record.
        "cpu_reference_s_before": cpu_ref_before,
        "cpu_reference_s_after": _cpu_reference(),
        # r11 continuation: single-thread 256 MB stream probe timed
        # before/after, plus rows whose timed samples swung > 2.5x
        # non-monotonically — the memory-bus-stall signature neither
        # loadavg nor cpu_reference can see (observed: loadavg 0.14,
        # cpu_reference at its quiet value, stream probe 50 s).
        # Dispersed rows were re-measured through the same splice path
        # as rising rows.
        "mem_reference_s_before": mem_ref_before,
        "mem_reference_s_after": _mem_reference(),
        "dispersed_sample_queries": dispersed,
        # r11 continuation: per-query stall-guard accounting — how many
        # times the pre-sample bus probe found an active stall and how
        # long was spent waiting them out.
        "stall_guard_events": stall_events,
        "stall_guard_wait_s": round(stall_wait_s, 1),
        # r12 (verdict item 1): the single wall budget every hygiene
        # wait draws from, how much of it was used, the hard deadline,
        # and the degradation audit trail — queries measured with one
        # timed sample (past 60% of wall) and whether the SIGALRM
        # deadline cut the sweep short (partial record, still rc=0).
        "hygiene_budget_s": hygiene_budget_s,
        "hygiene_spent_s": round(hygiene_spent_s, 1),
        "wall_budget_s": wall_budget_s,
        "wall_elapsed_s": round(time.time() - t_wall0, 1),
        "queries_degraded": degraded,
        "deadline_hit": deadline_hit,
    }
    # Scaling-curve evidence (r6 verdict item 1): scripts/bench_scale.py
    # measures the top-20 queries at sf0.1 AND the derived 10x dataset;
    # merge its record so the round's bench artifact carries the
    # per-query sf1 ratio.
    scaling_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "SCALING.json"
    )
    if os.path.exists(scaling_path):
        with open(scaling_path) as f:
            full["sf1_scaling"] = json.load(f)
    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL.json"
    )
    with open(out_path, "w") as f:
        json.dump(full, f, indent=1)
        f.write("\n")
    big_line = {"queries": timings}
    summary = {
        "metric": "headline_queries_wall_clock",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "n_queries": len(timings),
    }
    if deadline_hit:
        summary["deadline_hit"] = True
    if degraded:
        summary["n_degraded"] = len(degraded)
    if "sf1_scaling" in full:
        big_line["sf1_scaling"] = full["sf1_scaling"]["queries"]
        ratios = [
            v["ratio"]
            for v in full["sf1_scaling"]["queries"].values()
            if v.get("ratio")
        ]
        if ratios:
            summary["sf1_worst_ratio"] = max(ratios)
    if rising_pct > 20:
        summary["rising_sample_pct"] = rising_pct
        print(
            f"WARNING: {rising_pct}% of queries show monotonically rising "
            f"samples ({len(rising)} of {len(samples)}) — session likely "
            "poisoned by competing load; re-run solo before committing.",
            file=sys.stderr,
        )
    print(json.dumps(big_line))
    sys.stdout.flush()
    print(json.dumps(summary))
    if strict and rising_pct > 20:
        return 3
    return 0


if __name__ == "__main__":
    sys.exit(main())
