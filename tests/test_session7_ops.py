"""Session-7 operators: RRF hybrid retrieval and leakage-safe split."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_rrf_fuse_scores_and_ranks(spark):
    from tensorflow_recorder_spark.operators.retrieval import rrf_fuse

    lex = spark.createDataFrame(
        [(10, 1), (20, 2), (30, 3)], "doc_id long, rank long"
    )
    vec = spark.createDataFrame(
        [(20, 1), (40, 2)], "doc_id long, rank long"
    )
    got = {r["doc_id"]: r for r in rrf_fuse(lex, vec, rrf_k=60, top=10).collect()}
    # doc 20 is in both lists: 1/62 + 1/61
    assert got[20]["rrf_score"] == round(1 / 62 + 1 / 61, 9)
    assert got[20]["rank"] == 1
    assert got[20]["lex_rank"] == 2 and got[20]["vec_rank"] == 1
    # single-list docs: reciprocal of their own rank only, NULL other rank
    assert got[10]["rrf_score"] == round(1 / 61, 9)
    assert got[10]["vec_rank"] is None
    assert got[40]["lex_rank"] is None
    # 1/61 (docs 10, 40) ties break on id
    assert got[10]["rank"] < got[40]["rank"]
    assert len(got) == 4


def test_rrf_fuse_top_cut_and_validation(spark):
    from tensorflow_recorder_spark.operators.retrieval import rrf_fuse

    lex = spark.createDataFrame(
        [(i, i + 1) for i in range(5)], "doc_id long, rank long"
    )
    vec = spark.createDataFrame([(99, 1)], "doc_id long, rank long")
    assert rrf_fuse(lex, vec, top=2).count() == 2
    with pytest.raises(ValueError):
        rrf_fuse(lex, vec, rrf_k=0)
    with pytest.raises(ValueError):
        rrf_fuse(lex, vec, top=0)


def test_hybrid_search_end_to_end(spark):
    from tensorflow_recorder_spark.operators.retrieval import hybrid_search

    docs = spark.createDataFrame(
        [
            (0, "spark join hash"),
            (1, "hash hash hash"),
            (2, "nothing relevant here"),
            (3, "join the spark"),
        ],
        "doc_id long, text string",
    )
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [0.9, 0.1]),
            (2, [0.0, 1.0]),
            (3, [0.5, 0.5]),
        ],
        "vec_id long, embedding array<double>",
    )
    out = hybrid_search(
        docs, emb, ["hash", "spark"], query_vec_id=0, depth=3, top=4
    ).collect()
    ids = [r["doc_id"] for r in out]
    # doc 1: top-lexical AND nearest neighbor of vec 0 -> fused first
    assert ids[0] == 1
    # doc 2 matches no query term and is the farthest vector
    assert 2 not in ids or out[-1]["doc_id"] == 2


def test_leakage_safe_split_keeps_clusters_together(spark):
    from tensorflow_recorder_spark.operators.split import leakage_safe_split

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(200)], "doc_id long, text string"
    )
    # three clusters, including one spanning many ids
    clusters = spark.createDataFrame(
        [(1, 1), (50, 1), (199, 1), (7, 7), (8, 7)],
        "id long, cluster_id long",
    )
    out = leakage_safe_split(docs, clusters, "doc_id")
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == 200
    # every cluster member shares the cluster's split
    assert rows[1]["split"] == rows[50]["split"] == rows[199]["split"]
    assert rows[7]["split"] == rows[8]["split"]
    # group_key is the cluster id for members, own id otherwise
    assert rows[50]["group_key"] == 1 and rows[2]["group_key"] == 2
    # unclustered rows follow the derive_split hash exactly
    from tensorflow_recorder_spark.operators.split import derive_split

    base = {
        r["doc_id"]: r["split"]
        for r in derive_split(docs, "doc_id").collect()
    }
    for i in (0, 2, 3, 100):
        assert rows[i]["split"] == base[i]


def test_leakage_safe_split_salt_redeals(spark):
    from tensorflow_recorder_spark.operators.split import leakage_safe_split

    docs = spark.createDataFrame(
        [(i, "x") for i in range(300)], "doc_id long, text string"
    )
    clusters = spark.createDataFrame([], "id long, cluster_id long")
    a = {r["doc_id"]: r["split"] for r in leakage_safe_split(docs, clusters, "doc_id").collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in leakage_safe_split(docs, clusters, "doc_id", salt="v2").collect()
    }
    assert a != b  # re-deal happened
    # deterministic under repetition
    a2 = {r["doc_id"]: r["split"] for r in leakage_safe_split(docs, clusters, "doc_id").collect()}
    assert a == a2


def test_mmr_rerank_defers_near_duplicates(spark):
    from tensorflow_recorder_spark.operators.retrieval import mmr_rerank

    # doc 1 ~ doc 2 (near-identical vectors); doc 3 orthogonal but less
    # relevant. MMR must pick 1, then 3 (diversity), then 2.
    cands = spark.createDataFrame(
        [
            (1, 0.99, [1.0, 0.0]),
            (2, 0.98, [0.999, 0.01]),
            (3, 0.60, [0.0, 1.0]),
        ],
        "doc_id long, score double, embedding array<double>",
    )
    out = [r["doc_id"] for r in mmr_rerank(cands, lam=0.7, k=3).orderBy("step").collect()]
    assert out == [1, 3, 2]


def test_mmr_rerank_bounds_and_validation(spark):
    import pytest

    from tensorflow_recorder_spark.operators.retrieval import mmr_rerank

    one = spark.createDataFrame(
        [(7, 0.5, [1.0, 0.0])],
        "doc_id long, score double, embedding array<double>",
    )
    rows = mmr_rerank(one, k=5).collect()
    assert len(rows) == 1 and rows[0]["doc_id"] == 7 and rows[0]["step"] == 1
    assert rows[0]["mmr_score"] == round(0.7 * 0.5, 6)
    with pytest.raises(ValueError):
        mmr_rerank(one, lam=1.5)
    with pytest.raises(ValueError):
        mmr_rerank(one, k=0)


def test_mmr_rerank_pure_relevance_at_lam_one(spark):
    from tensorflow_recorder_spark.operators.retrieval import mmr_rerank

    cands = spark.createDataFrame(
        [(i, 1.0 - i * 0.1, [float(i), 1.0]) for i in range(5)],
        "doc_id long, score double, embedding array<double>",
    )
    out = [r["doc_id"] for r in mmr_rerank(cands, lam=1.0, k=5).orderBy("step").collect()]
    assert out == [0, 1, 2, 3, 4]  # diversity term disabled -> rel order


def test_delta_topk_fresh_rows_searchable(spark):
    from tensorflow_recorder_spark.operators.similarity import delta_topk

    # main corpus clustered around two centroids; delta holds a brand-new
    # vector that is the true nearest neighbor of the query
    main = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 1.0]), (3, [0.1, 0.9])],
        "vec_id long, embedding array<double>",
    )
    delta = spark.createDataFrame(
        [(100, [0.99, 0.01])], "vec_id long, embedding array<double>"
    )
    centroids = spark.createDataFrame(
        [(0, [1.0, 0.0]), (2, [0.0, 1.0])],
        "centroid_id long, embedding array<double>",
    )
    queries = main.where("vec_id = 0")
    rows = delta_topk(main, delta, centroids, queries, k=3).orderBy("rank").collect()
    assert rows[0]["neighbor_id"] == 100 and rows[0]["src"] == "delta"
    assert rows[0]["rank"] == 1
    # IVF hits come only from the query's own cell (nprobe=1): vector 1
    # shares centroid 0; vectors 2/3 live in the unprobed cell
    assert {r["src"] for r in rows[1:]} == {"main"}
    assert [r["neighbor_id"] for r in rows[1:]] == [1]


def test_triangle_counts_known_graph(spark):
    from tensorflow_recorder_spark.operators.graph import triangle_counts

    # triangle {1,2,3} with pendant 4 on node 1, plus a 4-clique {5,6,7,8}
    edges = [(1, 2), (2, 3), (1, 3), (1, 4)]
    edges += [(a, b) for a in (5, 6, 7, 8) for b in (5, 6, 7, 8) if a < b]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["node"]: r for r in triangle_counts(df).collect()}
    assert got[1]["degree"] == 3 and got[1]["n_triangles"] == 1
    assert got[1]["clustering"] == round(2 * 1 / (3 * 2), 6)
    assert got[2]["n_triangles"] == 1 and got[2]["clustering"] == 1.0
    assert got[4]["degree"] == 1 and got[4]["n_triangles"] == 0
    assert got[4]["clustering"] is None
    for n in (5, 6, 7, 8):  # each clique node: C(3,2)=3 triangles, coeff 1
        assert got[n]["degree"] == 3 and got[n]["n_triangles"] == 3
        assert got[n]["clustering"] == 1.0
    # duplicate + reversed edges do not change anything
    noisy = spark.createDataFrame(
        edges + [(2, 1), (3, 2), (1, 2)], "id_a long, id_b long"
    )
    got2 = {r["node"]: r["n_triangles"] for r in triangle_counts(noisy).collect()}
    assert got2 == {k: v["n_triangles"] for k, v in got.items()}


def test_cusum_detects_regime_shift(spark):
    from tensorflow_recorder_spark.operators.events import cusum_changepoints

    # user a: flat 10s then a jump to 30 -> mean ~ between, S+ builds
    # past threshold exactly once; user b: constant -> zero alarms
    rows = [("a", i, float(10 if i < 20 else 30)) for i in range(40)]
    rows += [("b", i, 10.0) for i in range(40)]
    df = spark.createDataFrame(rows, "user_id string, event_id long, value double")
    df = df.withColumn("ts", F.expr("timestamp_micros(cast(event_id * 1000000 as long))"))
    got = {
        r["user_id"]: r
        for r in cusum_changepoints(df, slack=2.0, threshold=40.0).collect()
    }
    assert got["b"]["n_alarms"] == 0 and got["b"]["final_sp"] == 0.0
    assert got["a"]["n_alarms"] >= 1  # the shift is caught
    assert got["a"]["mean"] == 20.0
    assert got["a"]["n_events"] == 40


def test_cusum_validates_params(spark):
    import pytest

    from tensorflow_recorder_spark.operators.events import cusum_changepoints

    df = spark.createDataFrame(
        [("a", 1, 1.0)], "user_id string, event_id long, value double"
    ).withColumn("ts", F.expr("timestamp_micros(1)"))
    with pytest.raises(ValueError):
        cusum_changepoints(df, slack=-1.0)
    with pytest.raises(ValueError):
        cusum_changepoints(df, threshold=0.0)


def test_welch_ab_test_known_values(spark):
    from tensorflow_recorder_spark.operators.profile import welch_ab_test

    rows = [("a", v) for v in (1.0, 2.0, 3.0, 4.0)] + [
        ("b", v) for v in (10.0, 12.0, 14.0)
    ]
    df = spark.createDataFrame(rows, "grp string, value double")
    [r] = welch_ab_test(df, "grp", "value", "a", "b").collect()
    assert r["n_a"] == 4 and r["n_b"] == 3
    assert r["mean_a"] == 2.5 and r["mean_b"] == 12.0
    # sample variances: a -> 5/3, b -> 4
    assert abs(r["var_a"] - 5 / 3) < 1e-6 and r["var_b"] == 4.0
    import math

    se2 = (5 / 3) / 4 + 4 / 3
    t_exp = (2.5 - 12.0) / math.sqrt(se2)
    assert abs(r["t_stat"] - round(t_exp, 6)) < 1e-9
    assert r["significant"] is True  # |t| >> 1.96
    # identical distributions -> not significant
    same = spark.createDataFrame(
        [("a", 5.0)] * 10 + [("b", 5.0)] * 10, "grp string, value double"
    )
    [s] = welch_ab_test(same, "grp", "value", "a", "b").collect()
    assert s["t_stat"] is None or s["significant"] is False


def test_curate_v2_chain_invariants(spark):
    """End-to-end invariants of the capstone chain on the real sf0.001
    corpus: survivors are a subset of the train slice, contain no
    exact duplicates, and duplicate-family members share a split."""
    from tensorflow_recorder_spark.plans.curate import curate_corpus_v2

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    train = docs.where(F.col("doc_id") % 10 != 0)
    ev = docs.where(F.col("doc_id") % 10 == 0)
    out = curate_corpus_v2(
        train, ev, "text", "doc_id", "n_chars", min_quality=0.5
    ).cache()
    rows = out.select("doc_id", "group_key", "split").collect()
    assert len(rows) > 0
    ids = {r["doc_id"] for r in rows}
    assert all(i % 10 != 0 for i in ids)  # eval slice never leaks in
    # no exact duplicate texts survive (out carries the input columns)
    assert out.select("text").distinct().count() == len(ids)
    # same group_key -> same split, and split values are valid
    by_group = {}
    for r in rows:
        by_group.setdefault(r["group_key"], set()).add(r["split"])
        assert r["split"] in ("TRAIN", "VALIDATION", "TEST")
    assert all(len(s) == 1 for s in by_group.values())
    out.unpersist()


def test_rrf_fuse_grouped_per_query(spark):
    from tensorflow_recorder_spark.operators.retrieval import rrf_fuse

    lex = spark.createDataFrame(
        [(1, 10, 1), (1, 20, 2), (2, 30, 1)],
        "qid long, doc_id long, rank long",
    )
    vec = spark.createDataFrame(
        [(1, 20, 1), (2, 40, 1), (2, 30, 2)],
        "qid long, doc_id long, rank long",
    )
    got = {
        (r["qid"], r["doc_id"]): r
        for r in rrf_fuse(lex, vec, query_col="qid", top=5).collect()
    }
    # per-query fusion: doc 20 fuses only within qid 1
    assert got[(1, 20)]["rrf_score"] == round(1 / 62 + 1 / 61, 9)
    assert got[(1, 20)]["rank"] == 1
    assert got[(2, 30)]["rrf_score"] == round(1 / 61 + 1 / 62, 9)
    assert got[(2, 30)]["rank"] == 1
    assert got[(2, 40)]["rank"] == 2
    # ranks restart per query
    assert {k[0] for k in got} == {1, 2} and len(got) == 4
