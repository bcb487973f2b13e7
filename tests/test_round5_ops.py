"""Unit tests for the round-5 operators: range search, readability,
inter-arrival profile, and the distributed codec round-trip probe."""

import math

import pytest
from pyspark.sql import functions as F


def test_range_neighbors_threshold_and_no_window(spark):
    from tensorflow_recorder_spark.operators.similarity import range_neighbors
    from test_plan_windows import _unpartitioned_windows

    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [1.0, 0.1]),   # cos ~ 0.995 with 0
            (2, [0.0, 1.0]),   # cos 0 with 0
            (3, [-1.0, 0.0]),  # cos -1 with 0
            (4, [1.0, 1.0]),   # cos ~ 0.7071 with 0
        ],
        "vec_id long, embedding array<double>",
    )
    out = range_neighbors(emb, emb.where(F.col("vec_id") == 0), 0.5)
    assert _unpartitioned_windows(out) == []
    got = {(r["query_id"], r["neighbor_id"]): r["score"] for r in out.collect()}
    assert set(got) == {(0, 1), (0, 4)}
    assert got[(0, 4)] == pytest.approx(round(1 / math.sqrt(2), 4))
    # boundary is inclusive on the ROUNDED score
    out2 = range_neighbors(emb, emb.where(F.col("vec_id") == 0), 0.7071)
    assert (0, 4) in {
        (r["query_id"], r["neighbor_id"]) for r in out2.collect()
    }


def test_readability_scores_known_text(spark):
    from tensorflow_recorder_spark.operators.text import readability_scores

    df = spark.createDataFrame(
        [
            (1, "The cat sat. The dog ran!"),
            (2, ""),  # wordless -> NULL scores
            (3, "no terminal punctuation here"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in readability_scores(df, "text", "doc_id").collect()}
    r1 = rows[1]
    assert (r1["n_words"], r1["n_sentences"], r1["n_syllables"]) == (6, 2, 6)
    wps, spw = 6 / 2, 6 / 6
    assert r1["flesch"] == pytest.approx(round(206.835 - 1.015 * wps - 84.6 * spw, 4))
    assert r1["fk_grade"] == pytest.approx(round(0.39 * wps + 11.8 * spw - 15.59, 4))
    assert rows[2]["flesch"] is None and rows[2]["fk_grade"] is None
    assert rows[3]["n_sentences"] == 1  # floor at one sentence


def test_interarrival_stats_gaps_and_burstiness(spark):
    from tensorflow_recorder_spark.operators.events import interarrival_stats

    rows = [
        # user 1: gaps 10, 20, 30 s
        (1, 1, "2024-01-01 00:00:00"),
        (2, 1, "2024-01-01 00:00:10"),
        (3, 1, "2024-01-01 00:00:30"),
        (4, 1, "2024-01-01 00:01:00"),
        # user 2: single event -> NULL gap stats
        (5, 2, "2024-01-01 00:00:00"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {r["user"]: r for r in interarrival_stats(df).collect()}
    u1 = got[1]
    assert u1["n_events"] == 4
    assert u1["mean_gap_s"] == pytest.approx(20.0)
    assert u1["p50_gap_s"] == pytest.approx(20.0)
    assert u1["max_gap_s"] == pytest.approx(30.0)
    assert u1["burstiness"] == pytest.approx(round(10.0 / 20.0, 4))
    u2 = got[2]
    assert u2["n_events"] == 1 and u2["mean_gap_s"] is None


def test_codec_roundtrip_probe_all_formats_ok(spark):
    from tensorflow_recorder_spark.operators.multimodal import (
        codec_roundtrip_probe,
    )

    # 56 ids = 8 format cycles of 7 (real-VP8 arm added in r8), the
    # TIFF arm sweeping its compression cycle
    df = spark.range(0, 56).select(F.col("id").alias("doc_id"))
    rows = codec_roundtrip_probe(df, "doc_id").collect()
    assert len(rows) == 56
    assert all(r["ok"] for r in rows)
    fmts = {r["doc_id"] % 7: r["fmt"] for r in rows}
    assert fmts == {
        0: "png", 1: "gif", 2: "bmp", 3: "jpeg", 4: "webp", 5: "tiff",
        6: "vp8",
    }
    for r in rows:
        assert r["width"] == 4 + r["doc_id"] % 5
        assert r["height"] == 3 + r["doc_id"] % 4
        assert r["channels"] == 3


def test_transition_matrix_probabilities(spark):
    from tensorflow_recorder_spark.operators.events import transition_matrix

    rows = [
        (1, 1, "a", "2024-01-01 00:00:00"),
        (2, 1, "b", "2024-01-01 00:00:10"),
        (3, 1, "a", "2024-01-01 00:00:20"),
        (4, 1, "b", "2024-01-01 00:00:30"),
        (5, 2, "a", "2024-01-01 00:00:00"),
        (6, 2, "c", "2024-01-01 00:00:10"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {
        (r["from_type"], r["to_type"]): (r["n"], r["p"])
        for r in transition_matrix(df).collect()
    }
    # user 1: a->b, b->a, a->b; user 2: a->c
    assert got[("a", "b")] == (2, pytest.approx(2 / 3, abs=1e-6))
    assert got[("a", "c")] == (1, pytest.approx(1 / 3, abs=1e-6))
    assert got[("b", "a")] == (1, pytest.approx(1.0))
    # rows sum to 1 per from_type
    from collections import defaultdict

    sums = defaultdict(float)
    for (f, _t), (_n, p) in got.items():
        sums[f] += p
    assert all(abs(s - 1.0) < 1e-5 for s in sums.values())


def test_lsh_recall_audit_counts_consistent(spark):
    """On a corpus with exact duplicates the audit must find them all
    (duplicates collide in every band), and the three counts must obey
    hits <= min(truth, candidates)."""
    from tensorflow_recorder_spark.queries import QUERIES

    row = QUERIES["e1_lsh_recall_audit"](spark, "/root/testdata/sf0.001").collect()[0]
    assert 0 <= row["n_hit"] <= min(row["n_true"], row["n_candidates"])
    if row["n_true"]:
        assert row["recall"] == pytest.approx(
            round(row["n_hit"] / row["n_true"], 6)
        )


def test_ivf_balance_reports_empty_and_hot_cells(spark):
    """Empty cells must surface with n_vectors=0 / load 0, and the
    load factors must sum to K (n * K / total)."""
    from tensorflow_recorder_spark.operators.similarity import ivf_balance

    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [0.9, 0.1]),
            (2, [0.8, 0.05]),
            (3, [0.0, 1.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    # centroid 10 = x-axis, 11 = y-axis, 12 = the opposite of everything
    cents = spark.createDataFrame(
        [(10, [1.0, 0.0]), (11, [0.0, 1.0]), (12, [-1.0, -1.0])],
        "centroid_id long, embedding array<double>",
    )
    rows = {r["centroid_id"]: r for r in ivf_balance(emb, cents).collect()}
    assert set(rows) == {10, 11, 12}
    assert rows[10]["n_vectors"] == 3 and rows[11]["n_vectors"] == 1
    assert rows[12]["n_vectors"] == 0 and rows[12]["load_factor"] == 0.0
    assert rows[10]["load_factor"] == pytest.approx(3 * 3 / 4, abs=1e-4)
    total_load = sum(r["load_factor"] for r in rows.values())
    assert total_load == pytest.approx(3.0, abs=1e-3)


def test_deletion_impact_counts_full_bins_and_cells(spark):
    """The re-pack cost must count the WHOLE affected bin's tokens
    (neighbors share the context window), and empty tombstone overlap
    must yield zeros, not NULLs."""
    from tensorflow_recorder_spark.plans.deletion import (
        apply_deletions,
        deletion_impact,
    )

    corpus = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(6)], "doc_id long, text string"
    )
    # two bins: docs 0-2 in (0,0), docs 3-5 in (0,1); 10 tokens each
    packed = spark.createDataFrame(
        [(i, 0, 0 if i < 3 else 1, 10) for i in range(6)],
        "doc_id long, shard int, bin_id long, n_tokens long",
    )
    assign = spark.createDataFrame(
        [(i, i % 2) for i in range(6)], "vec_id long, centroid_id long"
    )
    tomb = spark.createDataFrame([(1,)], "doc_id long")
    row = deletion_impact(corpus, packed, assign, tomb).collect()[0]
    assert row["n_tombstones"] == 1
    assert row["n_docs_removed"] == 1 and row["n_docs_surviving"] == 5
    # bin (0,0) is affected; re-pack cost = all 3 docs' tokens
    assert row["n_seqs_affected"] == 1
    assert row["n_tokens_to_repack"] == 30
    assert row["n_cells_affected"] == 1 and row["n_vecs_removed"] == 1

    survivors = apply_deletions(corpus, tomb)
    assert survivors.count() == 5
    assert {r["doc_id"] for r in survivors.collect()} == {0, 2, 3, 4, 5}

    # no overlap -> all-zero audit, never NULL
    ghost = spark.createDataFrame([(99,)], "doc_id long")
    row0 = deletion_impact(corpus, packed, assign, ghost).collect()[0]
    assert row0["n_docs_removed"] == 0
    assert row0["n_tokens_to_repack"] == 0
    assert row0["n_cells_affected"] == 0


def _py_morton(vals, bits):
    code = 0
    d = len(vals)
    for j in range(bits):
        for k, v in enumerate(vals):
            code |= ((v >> j) & 1) << (j * d + k)
    return code


def test_morton_code_matches_bit_interleave(spark):
    """The floor/mod arithmetic must equal true bit interleaving for
    2-D and 3-D codes, including the clamp edges."""
    from tensorflow_recorder_spark.operators.layout import zorder_code

    rows = [(i, x, y) for i, (x, y) in enumerate(
        [(0, 0), (1, 0), (0, 1), (3, 5), (255, 255), (17, 200), (128, 64)]
    )]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    out = {r["id"]: r["zcode"] for r in
           zorder_code(df, [("x", 1.0), ("y", 1.0)], bits=8).collect()}
    for i, x, y in rows:
        assert out[i] == _py_morton([x, y], 8), (x, y)

    df3 = spark.createDataFrame([(0, 5, 6, 7)], "id long, a long, b long, c long")
    [r] = zorder_code(
        df3, [("a", 1.0), ("b", 1.0), ("c", 1.0)], bits=4
    ).collect()
    assert r["zcode"] == _py_morton([5, 6, 7], 4)

    # clamp: values beyond the grid saturate at 2^bits - 1
    big = spark.createDataFrame([(0, 99999, -5)], "id long, x long, y long")
    [r] = zorder_code(big, [("x", 1.0), ("y", 1.0)], bits=8).collect()
    assert r["zcode"] == _py_morton([255, 0], 8)


def test_zorder_layout_is_range_partitioned(spark):
    """The layout must compile to RangePartitioning on the code (a
    distributed sort), never a single-partition stage."""
    from tensorflow_recorder_spark.operators.layout import zorder_layout

    df = spark.range(0, 1000).select(
        F.col("id").alias("x"), (F.col("id") * 7 % 997).alias("y")
    )
    out = zorder_layout(df, [("x", 4.0), ("y", 4.0)], num_partitions=8, bits=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning(zcode" in plan.lower()
    # and each partition holds one contiguous zcode range
    rows = out.select(
        F.spark_partition_id().alias("pid"), "zcode"
    ).groupBy("pid").agg(
        F.min("zcode").alias("lo"), F.max("zcode").alias("hi")
    ).collect()
    spans = sorted((r["lo"], r["hi"]) for r in rows)
    for (_, hi_prev), (lo_next, _) in zip(spans, spans[1:]):
        assert hi_prev <= lo_next


def test_morton_code_validates_arguments(spark):
    from tensorflow_recorder_spark.operators.layout import morton_code_expr

    with pytest.raises(ValueError, match="2 dimensions"):
        morton_code_expr(["x"], 8)
    with pytest.raises(ValueError, match="exceeds 62"):
        morton_code_expr(["x", "y"], 32)


def test_ivf_rebalance_splits_hot_cell(spark):
    """A 2x-overloaded cell splits into two children seeded at its
    extreme member ids; cold cells pass through; child 1 gets a
    collision-free new id."""
    from tensorflow_recorder_spark.operators.similarity import ivf_rebalance

    # cell 11 (y-axis) attracts 5 of 8 vectors (the (0.6,0.8) group
    # scores higher on (0,1) than (1,0)) -> hot; cell 10 holds 3 -> cold
    rows = [
        (0, [1.0, 0.0]), (1, [0.99, 0.05]), (2, [0.98, 0.1]),
        (3, [0.6, 0.8]), (4, [0.62, 0.78]), (5, [0.64, 0.76]),
        (6, [0.0, 1.0]), (7, [0.05, 1.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = spark.createDataFrame(
        [(10, [1.0, 0.0]), (11, [0.0, 1.0])],
        "centroid_id long, embedding array<double>",
    )
    out = {r["centroid_id"]: r for r in ivf_rebalance(emb, cents, max_load=1.2).collect()}
    # cell 10 cold: unchanged vector, 3 members
    assert out[10]["parent_id"] == 10 and out[10]["n_members"] == 3
    assert out[10]["embedding"] == [1.0, 0.0]
    # cell 11 hot (load 5*2/8=1.25): child0 keeps id 11,
    # child1 = 11 + 11 + 1 = 23
    assert out[11]["parent_id"] == 11 and out[23]["parent_id"] == 11
    # seeds: min id 3 -> (0.6,0.8) group; max id 7 -> y-axis pair
    assert out[11]["n_members"] == 3 and out[23]["n_members"] == 2
    assert out[11]["embedding"][0] == pytest.approx((0.6 + 0.62 + 0.64) / 3)
    assert out[23]["embedding"][0] == pytest.approx((0.0 + 0.05) / 2)


def test_ivf_rebalance_identical_members_drop_empty_child(spark):
    from tensorflow_recorder_spark.operators.similarity import ivf_rebalance

    emb = spark.createDataFrame(
        [(i, [1.0, 0.0]) for i in range(4)] + [(9, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])],
        "centroid_id long, embedding array<double>",
    )
    out = {r["centroid_id"]: r for r in ivf_rebalance(emb, cents, max_load=1.3).collect()}
    # all 4 hot members tie to child 0; child 1 never materializes
    assert set(out) == {0, 1}
    assert out[0]["n_members"] == 4
    assert out[0]["embedding"] == [1.0, 0.0]


def test_trend_slope_recovers_known_line(spark):
    """Counts on an exact line y = 3x + 7 -> slope 3, intercept 7
    (relative to the 1970 epoch day index); a single-day type releases
    NULL slope."""
    from tensorflow_recorder_spark.operators.events import trend_slope

    base = 19000  # days since 1970-01-01
    import datetime

    def day(i):
        return (
            datetime.date(1970, 1, 1) + datetime.timedelta(days=base + i)
        ).strftime("%Y-%m-%d")

    rows = [(day(i), "grow", 3 * (base + i) + 7) for i in range(10)]
    rows += [(day(0), "flat", 42)]
    daily = spark.createDataFrame(
        rows, "day string, event_type string, n_events long"
    )
    out = {r["event_type"]: r for r in trend_slope(daily).collect()}
    assert out["grow"]["n_days"] == 10
    assert out["grow"]["slope"] == pytest.approx(3.0, abs=1e-6)
    assert out["grow"]["intercept"] == pytest.approx(7.0, abs=1e-4)
    assert out["flat"]["slope"] is None


def test_holt_smoothing_known_trajectory(spark):
    """Hand-folded Holt trajectory (a=0.5, b=0.3) over [10, 14, 18]:
    init (10, 0); step x=14 -> l=12, b=0.6; step x=18 -> l=15.3,
    b=1.41; forecast 16.71. Constant series -> zero trend."""
    from tensorflow_recorder_spark.operators.events import holt_smoothing

    rows = [
        ("2024-01-01", "g", 10), ("2024-01-02", "g", 14),
        ("2024-01-03", "g", 18),
        ("2024-01-01", "c", 5), ("2024-01-02", "c", 5),
    ]
    daily = spark.createDataFrame(
        rows, "day string, event_type string, n_events long"
    )
    out = {r["event_type"]: r for r in holt_smoothing(daily).collect()}
    g = out["g"]
    assert g["n_days"] == 3
    assert g["level"] == pytest.approx(15.3, abs=1e-6)
    assert g["trend"] == pytest.approx(1.41, abs=1e-6)
    assert g["forecast_next"] == pytest.approx(16.71, abs=1e-6)
    assert out["c"]["trend"] == pytest.approx(0.0)
    assert out["c"]["forecast_next"] == pytest.approx(5.0)

    with pytest.raises(ValueError, match="alpha/beta"):
        holt_smoothing(daily, alpha=0.0)


def test_pack_sequences_counted_uses_supplied_counts(spark):
    """Packing by a supplied count column must follow THOSE counts —
    the tokenizer-aware form diverges from whitespace packing exactly
    when fertility != 1."""
    from tensorflow_recorder_spark.operators.packing import (
        pack_sequences,
        pack_sequences_counted,
    )

    docs = spark.createDataFrame(
        [(i, "w " * 4) for i in range(8)], "doc_id long, text string"
    )
    # whitespace: 4 tokens/doc; supplied: 100 tokens/doc
    counts = docs.select("doc_id", F.lit(100).cast("long").alias("n_tokens"))
    ws = pack_sequences(docs, "doc_id", "text", capacity=256, nshards=1)
    bpe = pack_sequences_counted(
        counts, "doc_id", "n_tokens", capacity=256, nshards=1
    )
    assert ws.agg(F.max("bin_id")).collect()[0][0] == 0  # 32 tokens: 1 bin
    assert bpe.agg(F.max("bin_id")).collect()[0][0] == 3  # 800 tokens: 4 bins
    assert {r["n_tokens"] for r in bpe.collect()} == {100}
