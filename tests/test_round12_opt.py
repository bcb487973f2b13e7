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
