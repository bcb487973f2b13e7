"""Sequence-packing operator: greedy semantics, determinism, and the
narrow-projection contract (text never enters the Python stage)."""

import pytest

from tensorflow_recorder_spark.operators.packing import (
    pack_sequences,
    pack_stats,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_greedy_fill_and_overflow(spark):
    # One shard (nshards=1) makes the greedy order global: ids 0..4 with
    # token counts 3, 3, 3, 3, 3 at capacity 7 -> bins [0,0,1,1,2].
    rows = [(i, "a b c") for i in range(5)]
    out = (
        pack_sequences(_docs(spark, rows), "doc_id", "text", capacity=7, nshards=1)
        .orderBy("doc_id")
        .collect()
    )
    assert [r.bin_id for r in out] == [0, 0, 1, 1, 2]
    assert [r.bin_offset for r in out] == [0, 3, 0, 3, 0]
    assert all(r.n_tokens == 3 for r in out)
    assert all(r.shard == 0 for r in out)


def test_oversized_doc_gets_own_bin(spark):
    # Doc 1 has 9 tokens > capacity 4: it lands alone in its own bin at
    # offset 0 (overflowing it); the next doc starts a fresh bin.
    rows = [(0, "a b"), (1, " ".join("x" * 1 for _ in range(9))), (2, "c d")]
    out = (
        pack_sequences(_docs(spark, rows), "doc_id", "text", capacity=4, nshards=1)
        .orderBy("doc_id")
        .collect()
    )
    assert [r.bin_id for r in out] == [0, 1, 2]
    assert [r.bin_offset for r in out] == [0, 0, 0]
    assert [r.n_tokens for r in out] == [2, 9, 2]


def test_deterministic_across_runs_and_partitionings(spark):
    rows = [(i, "t " * (1 + i % 13)) for i in range(200)]
    df1 = _docs(spark, rows)
    df2 = _docs(spark, rows).repartition(7)
    a = sorted(
        pack_sequences(df1, "doc_id", "text", 32, nshards=4).collect()
    )
    b = sorted(
        pack_sequences(df2, "doc_id", "text", 32, nshards=4).collect()
    )
    assert a == b


def test_bins_never_overflow_except_oversized_docs(spark):
    rows = [(i, "w " * (1 + i % 20)) for i in range(300)]
    out = pack_sequences(_docs(spark, rows), "doc_id", "text", 48, nshards=4)
    per_bin = (
        out.groupBy("shard", "bin_id")
        .sum("n_tokens")
        .withColumnRenamed("sum(n_tokens)", "fill")
        .collect()
    )
    # every doc here is <= 21 tokens < capacity, so no bin may overflow
    assert all(r.fill <= 48 for r in per_bin)


def test_text_column_not_in_python_stage_plan(spark):
    rows = [(i, "a b c") for i in range(10)]
    out = pack_sequences(_docs(spark, rows), "doc_id", "text", 8, nshards=2)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    lines = plan.splitlines()
    # the FlatMapGroupsInPandas node and its input projection must not
    # carry the raw text column — only (shard, id, n_tokens) shuffles
    assert lines[0].startswith("FlatMapGroupsInPandas")
    assert "text#" not in lines[0] and "text#" not in lines[1]


def test_pack_stats_consistency(spark):
    rows = [(i, "q " * (1 + i % 9)) for i in range(120)]
    packed = pack_sequences(_docs(spark, rows), "doc_id", "text", 32, nshards=4)
    stats = {r.shard: r for r in pack_stats(packed, 32).collect()}
    docs = packed.groupBy("shard").count().collect()
    for r in docs:
        s = stats[r.shard]
        assert s.n_docs == r["count"]
        assert 0 < s.fill_ratio <= 1.0


def test_null_text_packs_as_zero_tokens(spark):
    rows = [(0, "a b c"), (1, None), (2, "d e")]
    out = (
        pack_sequences(_docs(spark, rows), "doc_id", "text", 8, nshards=1)
        .orderBy("doc_id")
        .collect()
    )
    # NULL text costs 0 tokens and never crashes the pandas stage
    assert [r.n_tokens for r in out] == [3, 0, 2]
    assert [r.bin_id for r in out] == [0, 0, 0]


def test_validation(spark):
    df = _docs(spark, [(0, "a")])
    with pytest.raises(ValueError):
        pack_sequences(df, "doc_id", "text", 0)
    with pytest.raises(ValueError):
        pack_sequences(df, "doc_id", "text", 8, nshards=0)
