"""End-to-end retrieval-index plan: chunk -> hashed embed -> k-means ->
materialized IVF layout -> probe. Smoke + self-retrieval sanity."""

import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def built_index(spark, tmp_path_factory):
    from tensorflow_recorder_spark.plans.rag import build_chunk_index

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .where("doc_id < 60")
    )
    out = str(tmp_path_factory.mktemp("ragidx"))
    stats = build_chunk_index(
        spark, docs, out, chunk_size=16, stride=12, dim=16, k=4
    )
    return out, stats, docs


def test_build_writes_partitioned_cells(built_index, spark):
    out, stats, _ = built_index
    assert stats["n_chunks"] > 0 and stats["k"] >= 1
    idx = spark.read.parquet(stats["cells_dir"])
    assert "centroid_id" in idx.columns
    assert idx.count() == stats["n_chunks"]


def test_query_retrieves_own_chunk_top1(built_index, spark):
    from tensorflow_recorder_spark.plans.rag import query_chunk_index

    out, stats, docs = built_index
    # query with the exact text of a document's first 16 tokens
    probe = docs.select(
        F.col("doc_id").alias("query_id"),
        F.expr(
            "array_join(slice(filter(split(text, '\\\\s+'), t -> t <> ''), 1, 16), ' ')"
        ).alias("query"),
    ).where("query <> '' AND query_id >= 1").limit(5)
    got = query_chunk_index(
        spark, out, probe, dim=16, k=3, nprobe=4
    )
    rows = got.collect()
    assert rows, "no results"
    # for each query, the top hit (max cos) should be that doc's chunk 0
    best = {}
    for r in rows:
        q = r["query_id"]
        if q not in best or r["score"] > best[q][1]:
            best[q] = (r["neighbor_id"], r["score"])
    for q, (neighbor_id, score) in best.items():
        assert neighbor_id // 1_000_000 == q, (q, neighbor_id)
        assert score > 0.99
