"""Deterministic sketch operator tests (operators/sketches.py) + BM25.

CMS and HLL are md5-derived so results are reproducible run-to-run and
engine-to-engine (the registry oracles rebuild them in DuckDB); these
unit tests pin the semantic guarantees: CMS one-sided error, HLL
accuracy bands, BM25 ranking.
"""

import math

import pytest

from pyspark.sql import functions as F

from tensorflow_recorder_spark.operators.sketches import (
    cms_build,
    cms_heavy_hitters,
    hll_distinct,
)
from tensorflow_recorder_spark.operators.text import bm25_scores


def test_cms_estimates_are_one_sided(spark):
    # 3 hot keys + 200 singletons; wide sketch -> estimates ~exact
    rows = (
        [("hot_a",)] * 40 + [("hot_b",)] * 25 + [("hot_c",)] * 10
        + [(f"cold_{i}",) for i in range(200)]
    )
    df = spark.createDataFrame(rows, "k string")
    got = {r["key"]: r["est_count"]
           for r in cms_heavy_hitters(df, "k", threshold=10, depth=4, width=4096).collect()}
    # one-sided: estimate >= truth, and with 4x4096 cells collisions are
    # unlikely enough that the hot keys come back exact
    assert got["hot_a"] == 40 and got["hot_b"] == 25 and got["hot_c"] == 10
    assert all(v >= 10 for v in got.values())
    # cold keys (count 1) can only appear via collisions inflating them
    assert set(got) - {"hot_a", "hot_b", "hot_c"} == set()


def test_cms_sketch_is_bounded(spark):
    df = spark.range(0, 5000).select(F.col("id").cast("string").alias("k"))
    sketch = cms_build(df, "k", depth=3, width=64)
    assert sketch.count() <= 3 * 64
    # total mass per hash row equals the input size
    per_row = {r["row_id"]: r["s"] for r in
               sketch.groupBy("row_id").agg(F.sum("cell_count").alias("s")).collect()}
    assert per_row == {0: 5000, 1: 5000, 2: 5000}
    with pytest.raises(ValueError, match="depth/width"):
        cms_build(df, "k", depth=0)


def test_hll_small_range_is_near_exact(spark):
    df = spark.range(0, 300).select(F.col("id").cast("string").alias("k"))
    row = hll_distinct(df, "k", b=10).collect()[0]
    # 300 distinct over 1024 registers sits in the linear-counting
    # branch: well under 1% typical error
    assert abs(row["n_distinct_est"] - 300) <= 15
    assert row["n_registers"] == 1024
    # duplicates must not move the estimate (set semantics)
    dup = df.union(df).union(df)
    assert hll_distinct(dup, "k", b=10).collect()[0]["n_distinct_est"] == row["n_distinct_est"]
    with pytest.raises(ValueError, match="b must be"):
        hll_distinct(df, "k", b=2)


def test_hll_estimate_within_published_error(spark):
    n = 20000
    df = spark.range(0, n).select(F.col("id").cast("string").alias("k"))
    row = hll_distinct(df, "k", b=10).collect()[0]
    # published std error 1.04/sqrt(m) ~ 3.25% at m=1024; allow 4 sigma
    assert abs(row["n_distinct_est"] - n) / n < 4 * 1.04 / math.sqrt(1024)


def test_bm25_ranks_matching_docs(spark):
    docs = spark.createDataFrame(
        [
            (1, "spark spark spark engine"),
            (2, "spark engine"),
            (3, "database engine"),
            (4, "spark spark spark spark spark spark spark spark"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["score"]
           for r in bm25_scores(docs, "text", "doc_id", ["spark"]).collect()}
    assert 3 not in got                      # no query term -> absent
    assert got[1] > got[2]                   # higher tf wins
    # tf saturation: doc4 has 8x the tf of doc2 but nowhere near 8x score
    assert got[4] < 4 * got[2]
    # hand-check doc2: N=4, df=3, dl=2, avgdl=(4+2+2+8)/4=4
    idf = math.log(1.0 + (4 - 3 + 0.5) / (3 + 0.5))
    tfn = (1 * 2.2) / (1 + 1.2 * (1 - 0.75 + 0.75 * 2 / 4.0))
    assert got[2] == pytest.approx(round(round(idf * tfn, 9), 6), abs=1e-6)
    with pytest.raises(ValueError, match="non-empty"):
        bm25_scores(docs, "text", "doc_id", [])


# ---------------------------------------------------------------- PQ


def _pq_corpus(spark):
    """Two tight 4-d clusters around (0,0,10,10) and (10,10,0,0)."""
    rows = []
    for i in range(8):
        eps = (i % 4) * 0.1
        rows.append((i, [0.0 + eps, 0.0, 10.0, 10.0 - eps]))
        rows.append((100 + i, [10.0 - eps, 10.0, 0.0, 0.0 + eps]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_pq_encode_groups_clusters(spark):
    from tensorflow_recorder_spark.operators.similarity import (
        pq_encode,
        pq_fit,
    )

    df = _pq_corpus(spark)
    cb = pq_fit(df, m=2, k=2, iterations=3).select("sub_id", "code_id", "subvec")
    codes = pq_encode(df, cb, m=2).collect()
    # every vector gets one code per subspace
    assert len(codes) == 16 * 2
    by_vec = {}
    for r in codes:
        by_vec.setdefault(r["vec_id"], {})[r["sub_id"]] = r["code_id"]
    # cluster members share the full code word; clusters differ
    low = {tuple(sorted(by_vec[i].items())) for i in range(8)}
    high = {tuple(sorted(by_vec[100 + i].items())) for i in range(8)}
    assert len(low) == 1 and len(high) == 1 and low != high


def test_pq_topk_prefers_same_cluster(spark):
    from tensorflow_recorder_spark.operators.similarity import (
        pq_encode,
        pq_fit,
        pq_topk,
    )

    df = _pq_corpus(spark)
    cb = pq_fit(df, m=2, k=2, iterations=2).select("sub_id", "code_id", "subvec")
    codes = pq_encode(df, cb, m=2)
    queries = df.where(F.col("vec_id") == 0)
    got = pq_topk(queries, codes, cb, k=5, m=2).collect()
    assert len(got) == 5
    assert all(r["neighbor_id"] < 100 for r in got)  # same cluster only
    assert all(r["query_id"] == 0 for r in got)
    ranks = sorted(r["rank"] for r in got)
    assert ranks == [1, 2, 3, 4, 5]


def test_pq_explode_validates_m(spark):
    from tensorflow_recorder_spark.operators.similarity import pq_explode

    df = _pq_corpus(spark)
    with pytest.raises(ValueError, match="m must be"):
        pq_explode(df, 0)
    sub = pq_explode(df, 2).collect()
    assert all(len(r["subvec"]) == 2 for r in sub)


# ------------------------------------------------- text normalization


def test_normalize_text_folds_unicode(spark):
    from tensorflow_recorder_spark.operators.text import normalize_text

    docs = spark.createDataFrame(
        [
            (1, "“Smart” ‘quotes’ — and spaces　here"),
            (2, "already clean"),
            (3, "ctrl\x07chars\x1fgone"),
            (4, "  collapse \t\n whitespace  "),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["clean_text"], r["n_changed"])
           for r in normalize_text(docs, "text", "doc_id").collect()}
    assert got[1] == ('"Smart" \'quotes\' - and spaces here', 1)
    assert got[2] == ("already clean", 0)
    assert got[3] == ("ctrlcharsgone", 1)
    assert got[4] == ("collapse whitespace", 1)


def test_build_postings_caps_and_sorts(spark):
    from tensorflow_recorder_spark.operators.text import build_postings

    docs = spark.createDataFrame(
        [(i, "common " + ("rare " if i == 5 else "")) for i in range(10)],
        "doc_id long, text string",
    )
    out = {r["term"]: r for r in
           build_postings(docs, "text", "doc_id", max_postings=3).collect()}
    # df counts every posting even when the stored list is capped
    assert out["common"]["df"] == 10
    assert [p["doc"] for p in out["common"]["postings"]] == [0, 1, 2]
    assert out["rare"]["df"] == 1
    assert [(p["doc"], p["tf"]) for p in out["rare"]["postings"]] == [(5, 1)]


# -------------------------------------------------------------- Bloom


def test_bloom_no_false_negatives(spark):
    from tensorflow_recorder_spark.operators.sketches import (
        bloom_build,
        bloom_probe,
    )

    index = spark.createDataFrame(
        [(f"member_{i}",) for i in range(500)], "k string"
    )
    batch = spark.createDataFrame(
        [(f"member_{i}",) for i in range(0, 500, 50)]
        + [(f"outsider_{i}",) for i in range(200)],
        "k string",
    )
    bloom = bloom_build(index, "k", m_bits=1 << 14, k_hashes=4)
    got = {r["key"]: r["maybe_member"]
           for r in bloom_probe(batch, bloom, "k", m_bits=1 << 14, k_hashes=4).collect()}
    # every true member MUST be positive (no false negatives)
    assert all(got[f"member_{i}"] for i in range(0, 500, 50))
    # with 500 keys in 16k bits the FP rate is tiny: most outsiders negative
    fp = sum(got[f"outsider_{i}"] for i in range(200))
    assert fp <= 5
    with pytest.raises(ValueError, match="m_bits"):
        bloom_build(index, "k", m_bits=0)


def test_bloom_probe_handles_duplicate_batch_keys(spark):
    from tensorflow_recorder_spark.operators.sketches import (
        bloom_build,
        bloom_probe,
    )

    index = spark.createDataFrame([("present",)], "k string")
    batch = spark.createDataFrame(
        [("present",), ("present",), ("absent",)], "k string"
    )
    bloom = bloom_build(index, "k", m_bits=1 << 12, k_hashes=4)
    got = {r["key"]: r["maybe_member"]
           for r in bloom_probe(batch, bloom, "k", m_bits=1 << 12, k_hashes=4).collect()}
    assert got["present"] is True


# --------------------------------------------------------------- EWMA


def test_ewma_recurrence(spark):
    from tensorflow_recorder_spark.operators.events import ewma_by_key

    df = spark.createDataFrame(
        [
            (1, 1, "2024-01-01 10:00:00", 10.0),
            (2, 1, "2024-01-01 11:00:00", 20.0),
            (3, 1, "2024-01-01 09:00:00", 0.0),   # out-of-order input
            (4, 2, "2024-01-01 10:00:00", 7.5),
        ],
        "event_id long, user_id long, ts string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {r["user_id"]: (r["n_events"], r["ewma"])
           for r in ewma_by_key(df, alpha=0.5).collect()}
    # user 1 in ts order: 0, 10, 20 -> s=0; s=5; s=12.5
    assert got[1] == (3, 12.5)
    assert got[2] == (1, 7.5)  # single event: s_0 = v_0
    with pytest.raises(ValueError, match="alpha"):
        ewma_by_key(df, alpha=0.0).collect()


# ------------------------------------------------------------- profile


def test_profile_table_counts_and_estimates(spark):
    from tensorflow_recorder_spark.operators.profile import profile_table

    df = spark.createDataFrame(
        [(i, None if i % 4 == 0 else f"v{i % 7}", float(i)) for i in range(400)],
        "id long, cat string, x double",
    )
    got = {r["column"]: r for r in profile_table(df).collect()}
    assert got["id"]["n_rows"] == 400 and got["id"]["n_nulls"] == 0
    assert got["cat"]["n_nulls"] == 100
    # 6 distinct non-null cats (v1..v6 — v0 only at i%7==0... i%4!=0)
    true_cats = len({f"v{i % 7}" for i in range(400) if i % 4 != 0})
    assert abs(got["cat"]["n_distinct_est"] - true_cats) <= 1
    assert abs(got["id"]["n_distinct_est"] - 400) <= 20
    assert got["id"]["min_value"] == "0" and got["id"]["max_value"] == "399"
    assert got["x"]["min_value"] == "0.0"
    import pytest as _pytest

    with _pytest.raises(ValueError, match="no columns"):
        profile_table(df, columns=[])


def test_ivf_pq_topk_restricts_to_probed_cells(spark):
    from tensorflow_recorder_spark.operators.similarity import (
        ivf_assign,
        ivf_pq_topk,
        pq_encode,
        pq_seed_codebook,
    )

    df = _pq_corpus(spark)  # two well-separated clusters
    centroids = df.where(F.col("vec_id").isin(0, 100)).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    cb = pq_seed_codebook(df, m=2, k=4)
    codes = pq_encode(df, cb, m=2).join(ivf_assign(df, centroids), "vec_id")
    queries = df.where(F.col("vec_id") == 1)
    # nprobe=1: only the query's own cluster cell is scanned
    got = ivf_pq_topk(queries, codes, cb, centroids, k=4, m=2, nprobe=1).collect()
    assert len(got) == 4
    assert all(r["neighbor_id"] < 100 for r in got)  # same-cluster only
    # nprobe=2 widens to both cells -> cross-cluster ids may appear at
    # the tail, and the same-cell neighbors still rank first
    got2 = ivf_pq_topk(queries, codes, cb, centroids, k=16, m=2, nprobe=2).collect()
    assert {r["neighbor_id"] for r in got2} > {r["neighbor_id"] for r in got}


# ---------------------------------------------------------------- DSIR


def test_dsir_upweights_target_like_documents(spark):
    from tensorflow_recorder_spark.operators.selection import (
        dsir_log_ratios,
        dsir_scores,
    )

    rows = (
        [(i, "medical patient clinical trial dosage", "corpus") for i in range(10)]
        + [(100 + i, "sports match score goal referee", "corpus") for i in range(10)]
        + [(200 + i, "medical clinical dosage outcome", "target") for i in range(5)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string, src string")
    target = docs.where(F.col("src") == "target")
    ratios = dsir_log_ratios(docs, target, "text", buckets=512)
    scored = {r["doc_id"]: r["dsir_score"]
              for r in dsir_scores(docs, ratios, "text", "doc_id", buckets=512).collect()}
    med = sum(scored[i] for i in range(10)) / 10
    sports = sum(scored[100 + i] for i in range(10)) / 10
    assert med > sports  # medical docs score target-like, sports don't
    # empty docs survive with zero features and score 0
    empty = spark.createDataFrame([(999, "", "x")], "doc_id long, text string, src string")
    got = dsir_scores(empty, ratios, "text", "doc_id", buckets=512).collect()[0]
    assert got["n_features"] == 0 and got["dsir_score"] == 0.0
    import pytest as _pytest

    with _pytest.raises(ValueError, match="buckets"):
        dsir_log_ratios(docs, target, "text", buckets=0)


# ------------------------------------------------ weighted sampling


def test_weighted_sample_favors_heavy_rows(spark):
    from tensorflow_recorder_spark.operators.sampling import weighted_sample

    rows = [(i, 1000.0 if i < 20 else 1.0) for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = weighted_sample(df, "w", "doc_id", k=30)
    ids = {r["doc_id"] for r in got.collect()}
    assert len(ids) == 30
    # all 20 heavy rows (1000x weight) should make a top-30 draw
    heavy_in = len([i for i in ids if i < 20])
    assert heavy_in >= 18
    # deterministic: same salt -> identical draw; new salt -> different
    again = {r["doc_id"] for r in weighted_sample(df, "w", "doc_id", k=30).collect()}
    assert again == ids
    other = {r["doc_id"] for r in
             weighted_sample(df, "w", "doc_id", k=30, salt="ws2").collect()}
    assert other != ids
    # zero/NULL weights are excluded
    z = spark.createDataFrame([(1, 0.0), (2, None), (3, 5.0)], "doc_id long, w double")
    assert [r["doc_id"] for r in weighted_sample(z, "w", "doc_id", k=5).collect()] == [3]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="k must be"):
        weighted_sample(df, "w", "doc_id", k=0)


def test_curriculum_order_interleaves_buckets(spark):
    from tensorflow_recorder_spark.operators.sampling import curriculum_order

    df = spark.createDataFrame(
        [(i, float(100 - i)) for i in range(40)], "doc_id long, score double"
    )
    got = sorted(
        (r["curriculum_pos"], r["bucket"], r["doc_id"])
        for r in curriculum_order(df, "score", "doc_id", n_buckets=4).collect()
    )
    # positions are a permutation of 0..39
    assert [p for p, _, _ in got] == list(range(40))
    # the first n_buckets positions draw one row from EACH bucket
    assert [b for _, b, _ in got[:4]] == [1, 2, 3, 4]
    # and the best-scored (lowest id) doc of each bucket leads it
    assert [d for _, _, d in got[:4]] == [0, 10, 20, 30]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="n_buckets"):
        curriculum_order(df, "score", "doc_id", n_buckets=0)


def test_hll_rolling_distinct_merges_daily_sketches(spark):
    from tensorflow_recorder_spark.operators.sketches import (
        hll_distinct,
        hll_rolling_distinct,
    )

    rows = []
    eid = 0
    # day 1: users 0..199; day 2: users 100..299; day 4: users 0..49
    for day, lo, hi in ((1, 0, 200), (2, 100, 300), (4, 0, 50)):
        for u in range(lo, hi):
            rows.append((eid, f"2024-03-0{day} 12:00:00", str(u)))
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, ts string, user_id string")
    df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    got = {r["day"]: r["n_distinct_est"]
           for r in hll_rolling_distinct(df, "user_id", window_days=2, b=10).collect()}
    assert set(got) == {"2024-03-01", "2024-03-02", "2024-03-04"}
    # window ending day2 covers day1+day2 = 300 distinct; day4's window
    # covers only day4 (day3 empty) = 50; estimates near-exact at b=10
    est_d2 = hll_distinct(
        df.where(F.col("ts") < "2024-03-03"), "user_id", b=10
    ).collect()[0]["n_distinct_est"]
    assert got["2024-03-02"] == est_d2          # merge == direct sketch
    assert abs(got["2024-03-01"] - 200) <= 10
    assert abs(got["2024-03-04"] - 50) <= 3
    import pytest as _pytest

    with _pytest.raises(ValueError, match="window_days"):
        hll_rolling_distinct(df, "user_id", window_days=0)


# ---------------------------------------------------------- histograms


def test_value_histogram_bins_and_clamping(spark):
    from tensorflow_recorder_spark.operators.sketches import value_histogram

    df = spark.createDataFrame(
        [("a", -5.0), ("a", 0.0), ("a", 9.99), ("a", 10.0), ("a", 99.0),
         ("a", 100.0), ("b", 55.0)],
        "g string, v double",
    )
    got = {(r["g"], r["bin"]): r["cnt"] for r in
           value_histogram(df, ["g"], "v", 0.0, 100.0, 10).collect()}
    # -5 clamps into bin 0; 100.0 clamps into bin 9
    assert got[("a", 0)] == 3   # -5, 0, 9.99
    assert got[("a", 1)] == 1   # 10.0
    assert got[("a", 9)] == 2   # 99, 100
    assert got[("b", 5)] == 1


def test_histogram_quantiles_interpolation(spark):
    from tensorflow_recorder_spark.operators.sketches import (
        histogram_quantiles,
        value_histogram,
    )

    # 10 values spread evenly in [0, 100): bins 0..9, one per bin.
    df = spark.createDataFrame(
        [("a", float(i * 10 + 5)) for i in range(10)], "g string, v double"
    )
    counts = value_histogram(df, ["g"], "v", 0.0, 100.0, 10)
    [r] = histogram_quantiles(counts, ["g"], 0.0, 100.0, 10).collect()
    assert r["n"] == 10
    # p50: target=5, first bin with cum>=5 is bin 4 (cum 5), est =
    # 10*(4 + (5-4)/1) = 50
    assert r["p50_est"] == 50.0
    assert r["p90_est"] == 90.0
    # p99: target=9.9 -> bin 9, est = 10*(9 + (9.9-9)/1) = 99
    assert r["p99_est"] == 99.0


def test_histogram_merge_equals_full_build(spark):
    """Sketch algebra: the histogram of a union == the summed histograms
    of the parts, so quantiles finalize identically — the property the
    streaming twin relies on."""
    from pyspark.sql import functions as F

    from tensorflow_recorder_spark.operators.sketches import (
        histogram_quantiles,
        value_histogram,
    )

    full = spark.createDataFrame(
        [("a", float(v)) for v in (3, 17, 42, 55, 60, 78, 91, 12, 33, 67)],
        "g string, v double",
    )
    h_full = value_histogram(full, ["g"], "v", 0.0, 100.0, 20)
    part1, part2 = full.limit(4), full.subtract(full.limit(4))
    merged = (
        value_histogram(part1, ["g"], "v", 0.0, 100.0, 20)
        .unionByName(value_histogram(part2, ["g"], "v", 0.0, 100.0, 20))
        .groupBy("g", "bin")
        .agg(F.sum("cnt").alias("cnt"))
    )
    a = histogram_quantiles(h_full, ["g"], 0.0, 100.0, 20).collect()
    b = histogram_quantiles(merged, ["g"], 0.0, 100.0, 20).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_value_histogram_validates_args(spark):
    import pytest

    from tensorflow_recorder_spark.operators.sketches import value_histogram

    df = spark.createDataFrame([("a", 1.0)], "g string, v double")
    with pytest.raises(ValueError):
        value_histogram(df, ["g"], "v", 0.0, 100.0, 0)
    with pytest.raises(ValueError):
        value_histogram(df, ["g"], "v", 100.0, 100.0, 10)
