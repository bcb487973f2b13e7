"""Retrieval-index build plan (E2/E3 composition): documents ->
overlapping token-window chunks -> deterministic hashed embeddings ->
spherical k-means -> materialized IVF layout, plus the query side that
probes the written index. The end-to-end shape of a RAG / semantic-
search ingest pipeline, composed entirely from the engine's declared
operators (chunking.chunk_documents, similarity.hashed_embedding /
l2_normalize / kmeans_fit / write_ivf_index / ivf_topk_indexed).

Scale story, stage by stage: chunking is a narrow Generate inside the
scan; embedding is map-only JVM expression work; k-means fits on a
deterministic sample cap (fitting never needs the full corpus);
the index write is one partitionBy(centroid_id) pass so a query's I/O
is nprobe/K of the corpus by LAYOUT; probes broadcast into the
partition filter (dynamic pruning — see ivf_topk_indexed). Nothing
driver-side but the tiny centroid frame and the stats row.

The reference has no retrieval surface at all; this plan is the
Spark-first extension story (SURVEY.md §8) exercised end-to-end.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.chunking import chunk_documents
from ..operators.similarity import (
    hashed_embedding,
    ivf_topk_indexed,
    kmeans_fit,
    l2_normalize,
)

# chunk ids pack (doc_id, chunk_id) into one BIGINT vector id so every
# downstream similarity operator keeps its single-column id contract
_CHUNK_STRIDE = 1_000_000


def chunk_vec_id(doc_id_col: str = "doc_id", chunk_id_col: str = "chunk_id"):
    return (
        F.col(doc_id_col) * _CHUNK_STRIDE + F.col(chunk_id_col)
    ).alias("vec_id")


def build_chunk_index(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_size: int = 64,
    stride: int = 48,
    dim: int = 16,
    k: int = 8,
    fit_sample: int = 10_000,
) -> dict:
    """Build the chunk-level retrieval index under ``out_dir``
    (``cells/`` = partitionBy(centroid_id) parquet, ``centroids/`` =
    the fitted centroid frame). Returns a stats dict.

    ``fit_sample`` caps the k-means fit at the lowest-vec_id sample —
    fitting is sublinear in the corpus by design; assignment of the
    full corpus happens in the index write."""
    chunks = chunk_documents(docs, text_col, id_col, chunk_size, stride)
    embedded = l2_normalize(
        hashed_embedding(
            chunks.select(chunk_vec_id(id_col, "chunk_id"), "chunk_text"),
            "chunk_text",
            "vec_id",
            dim=dim,
        ),
        vec_col="embedding",
    ).where(F.expr("aggregate(embedding, 0.0D, (a, x) -> a + abs(x)) > 0"))
    fit_input = embedded.orderBy("vec_id").limit(fit_sample)
    centroids = kmeans_fit(fit_input, k=k, vec_col="embedding", id_col="vec_id")
    from ..operators.similarity import write_ivf_index

    write_ivf_index(
        embedded, centroids.select("centroid_id", "embedding"),
        os.path.join(out_dir, "cells"),
    )
    centroids.write.mode("overwrite").parquet(os.path.join(out_dir, "centroids"))
    n_chunks = embedded.count()
    return {
        "n_chunks": int(n_chunks),
        "k": int(centroids.count()),
        "dim": dim,
        "cells_dir": os.path.join(out_dir, "cells"),
        "centroids_dir": os.path.join(out_dir, "centroids"),
    }


def query_chunk_index(
    spark: SparkSession,
    out_dir: str,
    queries: DataFrame,
    query_text_col: str = "query",
    query_id_col: str = "query_id",
    dim: int = 16,
    k: int = 5,
    nprobe: int = 2,
) -> DataFrame:
    """Probe a :func:`build_chunk_index` layout: queries embed through
    the SAME hashed-embedding recipe (dim must match the build), then
    ``ivf_topk_indexed`` scores only the probed cell directories.
    Output: (query_id, neighbor_id, score, rank) — decode the
    neighbor's doc/chunk with ``neighbor_id div/% 1_000_000``."""
    index = spark.read.parquet(os.path.join(out_dir, "cells"))
    centroids = spark.read.parquet(os.path.join(out_dir, "centroids"))
    q = l2_normalize(
        hashed_embedding(queries, query_text_col, query_id_col, dim=dim),
        vec_col="embedding",
    ).select(F.col(query_id_col).alias("vec_id"), "embedding")
    return ivf_topk_indexed(
        index,
        centroids.select("centroid_id", "embedding"),
        q,
        k=k,
        nprobe=nprobe,
    )
