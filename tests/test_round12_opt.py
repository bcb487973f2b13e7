"""Round-12 optimization-round regression tests.

Covers the r12 verdict items:
  1. bench.py must be driver-runnable again: every hygiene wait draws
     from ONE bounded budget, the memory probe itself is time-bounded,
     and the one-line JSON is guaranteed even when the hard wall
     deadline cuts sampling short.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


def test_fused_partition_pass_and_block_decomposition_parity(spark):
    """r12 verdict item 3: the fused dedup's per-partition verify pass
    (default) and the giant-bucket block-verify branch (forced via
    defer_rows/defer_block so every bucket defers into tiny blocks)
    must produce exactly the rows of the staged reference pipeline —
    the block decomposition is exact (each i<j pair exists in exactly
    one upper-triangle block pair) and the per-bucket arithmetic is
    unchanged."""
    from tensorflow_recorder_spark.operators.dedup import (
        _lsh_verified_fused,
        lsh_verified_pairs,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for nh, bands, sl, me, th in [
        (8, 4, 5, 0.25, 0.3),
        (8, 4, 5, 0.5, 0.5),
    ]:
        base = _canon(
            _lsh_verified_fused(
                docs, "text", "doc_id", nh, bands, sl, me, th, defer_rows=0
            )
        )
        forced = _canon(
            _lsh_verified_fused(
                docs, "text", "doc_id", nh, bands, sl, me, th,
                defer_rows=4, defer_block=2,
            )
        )
        staged = _canon(
            lsh_verified_pairs(
                docs, "text", "doc_id", nh, bands, sl, me, th,
                strategy="staged",
            )
        )
        assert base == forced == staged
        assert len(base) > 0


def test_incremental_fused_partition_pass_parity(spark):
    """r12: the bipartite fused dedup's partition pass must match the
    staged incremental pipeline row-for-row."""
    from pyspark.sql import functions as F

    from tensorflow_recorder_spark.operators.dedup import (
        incremental_neardup_pairs,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    index = docs.where(F.col("doc_id") % 10 != 0)
    batch = docs.where(F.col("doc_id") % 10 == 0)
    fused = _canon(
        incremental_neardup_pairs(index, batch, "text", "doc_id")
    )
    staged = _canon(
        incremental_neardup_pairs(
            index, batch, "text", "doc_id", strategy="staged"
        )
    )
    assert fused == staged
    assert len(fused) > 0


def test_mem_reference_is_time_bounded():
    """r12 verdict item 1: the 256 MB stream probe ran 1-5 MINUTES
    during host bus stalls and was charged to no budget — it must now
    honor a hard cap (early exit between chunked passes) while keeping
    the quiet-host reading comparable (same buffer, same traffic)."""
    import bench

    # a quiet probe completes fast and returns its real duration
    t0 = time.time()
    r = bench._mem_reference()
    wall = time.time() - t0
    assert r <= wall + 0.05
    # the cap parameter exists and a tiny cap forces an early exit:
    # the probe must return promptly even though the full 2-pass
    # workload would take longer than the cap on any host
    t0 = time.time()
    r = bench._mem_reference(cap_s=0.0)
    wall = time.time() - t0
    # one chunk (1/16 of the traffic) is the exit granularity
    assert wall < 2.0, wall


def test_bench_hygiene_budget_fields_and_deadline_machinery():
    """r12 verdict item 1: the committed record must carry the unified
    hygiene budget, its spend, the hard wall budget, and the
    degradation audit fields; the SIGALRM deadline class must exist so
    a stuck host can never produce rc=124 with no JSON line."""
    import bench

    src = open(bench.__file__).read()
    for field in (
        '"hygiene_budget_s"',
        '"hygiene_spent_s"',
        '"wall_budget_s"',
        '"wall_elapsed_s"',
        '"queries_degraded"',
        '"deadline_hit"',
        "SPARK_GRAFT_BENCH_PATIENT",
        "SPARK_GRAFT_BENCH_WALL_S",
        "signal.alarm",
    ):
        assert field in src, field
    assert issubclass(bench._Deadline, Exception)
