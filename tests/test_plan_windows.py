"""Plan-shape guard: no UNPARTITIONED window over unbounded input.

An unpartitioned window (``Window.orderBy(...)`` with no partition
spec) forces every input row onto ONE task — Spark plans an Exchange
SinglePartition under it and logs "No Partition Defined for Window
operation". Correct at sf0.01, fatal at 100 TB (r4 verdict: the
e6_curriculum ntile was exactly this).

This test sweeps the OPTIMIZED plan of every registry query and fails
if a Window/WindowGroupLimit node with an empty partitionSpec appears
in a query that is not explicitly allowlisted. Allowlisted sites are
bounded BY CONSTRUCTION — the window's input is fitted state or a
top-N-limited candidate set, never the corpus — and each entry records
why.
"""

import pytest

SF_DIR = "/root/testdata/sf0.001"

# query name -> (max unpartitioned windows, why the input is bounded)
BOUNDED_WINDOW_QUERIES = {
    # pq_seed_codebook ranks AFTER limit(k): exactly k rows (fitted
    # codebook state), similarity.py pq_seed_codebook.
    "e2_pq_encode": (1, "pq codebook seed rank after limit(k)"),
    "e2_pq_topk": (2, "pq codebook seed rank + final top-k after bounded candidates"),
    "e2_pq_recall": (2, "two codebook/recall ranks over k-bounded frames"),
    "e2_ivf_pq_topk": (2, "ivf centroid seed + pq codebook seed, both limit(k)-bounded"),
    # zipf ranks AFTER limit(top_n) (text.py rank_frequencies).
    "e3_zipf": (1, "frequency rank after limit(top_n)"),
    # salted top-k phase 2: the global window sees only the per-salt
    # winners (k * num_salts rows), sampling.py salted_topk_per_key.
    "e6_weighted_sample": (1, "salted top-k phase-2 over k*salts winners"),
    # RRF fuses top-N-per-retriever candidate lists; every global rank
    # runs over <= sum of retriever top-Ns (retrieval.py).
    "e2_hybrid_rrf": (2, "rank fusion over top-N-bounded retriever outputs"),
    "e2_retrieve_diverse": (6, "rrf + mmr composition, all candidate-bounded"),
    # two-level distributed prefix sum: the only unpartitioned window
    # runs over the per-hour totals frame — one row per active hour,
    # calendar-bounded (operators/intervals.py concurrency_by_hour).
    "e4_concurrency": (1, "exclusive prefix over per-hour totals (one row/hour)"),
    "s37_stream_concurrency": (
        1,
        "same concurrency_by_hour finalize as e4_concurrency: exclusive "
        "prefix over per-hour totals — one row per active hour, "
        "calendar-bounded (the streaming stage upstream is the "
        "state-store session_window, no window operator)",
    ),
}


def _unpartitioned_windows(df) -> list:
    """Count Window/WindowGroupLimit nodes with an empty partitionSpec
    in the optimized logical plan (py4j traversal — exact, no string
    parsing)."""
    out = []

    def walk(node):
        name = node.getClass().getSimpleName()
        if name in ("Window", "WindowGroupLimit") and node.partitionSpec().isEmpty():
            out.append(name)
        ch = node.children()
        for i in range(ch.length()):
            walk(ch.apply(i))

    walk(df._jdf.queryExecution().optimizedPlan())
    return out


def test_curriculum_has_no_unpartitioned_window(spark):
    """The r4 verdict fix, pinned: curriculum_order must never plan a
    single-partition sort of its input."""
    from tensorflow_recorder_spark.queries import QUERIES

    assert _unpartitioned_windows(QUERIES["e6_curriculum"](spark, SF_DIR)) == []


def test_distributed_global_rank_has_no_unpartitioned_window(spark):
    from pyspark.sql import functions as F

    from tensorflow_recorder_spark.operators.sampling import (
        distributed_global_rank,
    )

    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("score")
    )
    ranked, total = distributed_global_rank(
        df, [F.desc("score"), F.asc("id")], num_partitions=4
    )
    assert total == 100
    assert _unpartitioned_windows(ranked) == []
    # the rank itself is the exact global rank under the total order
    rows = {r["id"]: r["__rank"] for r in ranked.collect()}
    expect = {
        id_: i + 1
        for i, id_ in enumerate(
            sorted(range(100), key=lambda x: (-(x % 7), x))
        )
    }
    assert rows == expect


@pytest.mark.slow
def test_registry_has_no_unbounded_global_window(spark):
    """Sweep EVERY registry query's optimized plan: any unpartitioned
    window outside the bounded-input allowlist is a scale regression."""
    from tensorflow_recorder_spark.queries import QUERIES

    offenders = {}
    for name, fn in QUERIES.items():
        found = _unpartitioned_windows(fn(spark, SF_DIR))
        if not found:
            continue
        cap = BOUNDED_WINDOW_QUERIES.get(name, (0, ""))[0]
        if len(found) > cap:
            offenders[name] = found
    assert not offenders, (
        "unpartitioned window over (potentially) unbounded input — "
        f"repartition the window or allowlist with a bound: {offenders}"
    )
