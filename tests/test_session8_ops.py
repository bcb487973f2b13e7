"""Unit tests for the round-6 session-8 operators: activity streaks,
stratified shards, anneal schedule, scalar dequantize, vision-layout
audits, vocab growth, and the Q21 two-level aggregation."""

import pytest
from pyspark.sql import functions as F


def test_activity_streaks_tiebreak_and_dup_days(spark):
    from tensorflow_recorder_spark.operators.events import activity_streaks

    df = spark.createDataFrame(
        [
            # user 1: two 2-day streaks -> earliest start wins
            (1, "2024-01-01 05:00:00"),
            (1, "2024-01-02 06:00:00"),
            (1, "2024-01-10 07:00:00"),
            (1, "2024-01-11 08:00:00"),
            # user 2: duplicate events in one day must not split the run
            (2, "2024-03-01 01:00:00"),
            (2, "2024-03-01 23:00:00"),
            (2, "2024-03-02 12:00:00"),
            (2, "2024-03-03 12:00:00"),
        ],
        "user_id long, ts string",
    ).select("user_id", F.col("ts").cast("timestamp").alias("ts"))
    got = {r["user_id"]: r for r in activity_streaks(df).collect()}
    assert got[1]["streak_days"] == 2
    assert got[1]["streak_start"] == "2024-01-01"
    assert got[1]["streak_end"] == "2024-01-02"
    assert got[2]["streak_days"] == 3
    assert got[2]["streak_start"] == "2024-03-01"
    assert got[2]["streak_end"] == "2024-03-03"


def test_stratified_shards_balance_within_one(spark):
    from tensorflow_recorder_spark.operators.sampling import stratified_shards

    rows = [(f"s{i % 3}", i) for i in range(100)]
    df = spark.createDataFrame(rows, "source string, doc_id long")
    out = stratified_shards(df, "source", "doc_id", nshards=4).collect()
    assert len(out) == 4
    assert sum(r["n_docs"] for r in out) == 100
    # round-robin within source: every shard sees each source within 1
    # of even, so shard totals differ by at most |sources|
    totals = [r["n_docs"] for r in out]
    assert max(totals) - min(totals) <= 3
    assert all(r["n_sources"] == 3 for r in out)
    with pytest.raises(ValueError):
        stratified_shards(df, "source", "doc_id", nshards=0)


def test_anneal_schedule_budget_split(spark):
    from tensorflow_recorder_spark.operators.sampling import anneal_schedule

    df = spark.createDataFrame(
        [
            # high-quality-ish long doc (length 100+ chars, wordy)
            ("a", ("the cat sat on the mat and it is that " * 4).strip()),
            # junk doc: punctuation soup -> low quality
            ("b", "!!!! #### $$$$ %%%% ^^^^ &&&& **** (((( ))))"),
        ],
        "source string, text string",
    )
    out = {
        r["source"]: r
        for r in anneal_schedule(
            df, "text", "source", budget_tokens=1000, anneal_frac=0.2
        ).collect()
    }
    assert out["a"]["hq_tokens"] == out["a"]["tokens"]
    assert out["b"]["hq_tokens"] == 0
    # phase 1 proportional to raw mass, phase 2 only to the hq source
    assert out["a"]["p1_tokens"] + out["b"]["p1_tokens"] <= 800
    assert out["b"]["p2_tokens"] == 0
    assert out["a"]["p2_tokens"] == 200
    with pytest.raises(ValueError):
        anneal_schedule(df, "text", "source", anneal_frac=1.5)


def test_scalar_dequantize_error_bounded_by_half_step(spark):
    from tensorflow_recorder_spark.operators.similarity import (
        scalar_dequantize,
        scalar_quantize_fit,
    )

    df = spark.createDataFrame(
        [(1, [0.0, 1.0, -2.0]), (2, [0.5, -1.0, 2.0]), (3, [1.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    fitted = scalar_quantize_fit(df)
    recon = {
        r["vec_id"]: r["embedding"]
        for r in scalar_dequantize(df, fitted).collect()
    }
    orig = {r["vec_id"]: r["embedding"] for r in df.collect()}
    for vid, vec in orig.items():
        for i, (a, b) in enumerate(zip(vec, recon[vid])):
            # per-dim range / 254 is the int8 step; error <= half step
            lo = min(v["embedding"][i] for v in df.collect())
            hi = max(v["embedding"][i] for v in df.collect())
            assert abs(a - b) <= (hi - lo) / 254.0 / 2 + 1e-12


def test_letterbox_and_orientation_dims(spark):
    from tensorflow_recorder_spark.operators.multimodal import (
        letterbox_audit,
        orientation_fix_audit,
    )

    df = spark.createDataFrame([(i,) for i in range(40)], "doc_id long")
    lb = letterbox_audit(df, "doc_id", target=64).collect()
    assert sum(r["n"] for r in lb) == 40
    for r in lb:
        assert 0.0 <= r["avg_pad_frac"] < 1.0
        assert 0 <= r["max_pad_px"] < 64 * 64
    of = orientation_fix_audit(df, "doc_id").collect()
    assert sum(r["n"] for r in of) == 40
    # orientations 5-8 transpose, 1-4 do not
    for r in of:
        assert r["transposed"] == (r["orientation"] >= 5)


def test_vocab_growth_monotone(spark):
    from tensorflow_recorder_spark.operators.text import vocab_growth

    df = spark.createDataFrame(
        [(i, f"alpha beta w{i}") for i in range(50)],
        "doc_id long, text string",
    )
    rows = sorted(
        vocab_growth(df, "text", "doc_id").collect(),
        key=lambda r: r["fraction"],
    )
    assert [r["fraction"] for r in rows] == [0.25, 0.5, 1.0]
    # nested hash-prefix subsets: both docs and vocab grow monotonically
    assert rows[0]["n_docs"] <= rows[1]["n_docs"] <= rows[2]["n_docs"]
    assert rows[0]["vocab"] <= rows[1]["vocab"] <= rows[2]["vocab"]
    assert rows[2]["n_docs"] == 50
    assert rows[2]["vocab"] == 52  # alpha, beta, w0..w49


def test_funnel3_single_shuffle_single_sort(spark):
    """The chained 3-step funnel must keep both window passes on ONE
    Exchange + ONE Sort (same window spec -> Catalyst reuses the
    partitioning/ordering)."""
    from tensorflow_recorder_spark.queries import QUERIES

    plan = (
        QUERIES["e4_funnel3"](spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1
    assert plan.count("+- Sort") + plan.count(":- Sort") == 1


def test_waiting_supplier_no_expand(spark):
    """The Q21 rewrite must not compile to an Expand operator (the
    multi-countDistinct plan tripled shuffled rows)."""
    from tensorflow_recorder_spark.queries import QUERIES

    plan = QUERIES["rel_waiting_supplier"](
        spark, "/root/testdata/sf0.001"
    )._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan
