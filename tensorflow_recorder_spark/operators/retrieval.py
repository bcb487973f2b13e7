"""Hybrid retrieval (E2/E3 fusion): reciprocal-rank fusion of a lexical
(BM25) ranking and a vector (cosine ANN) ranking — the standard hybrid
search primitive in front of every RAG / retrieval-augmented training
pipeline (Cormack, Clarke & Buettcher 2009, "Reciprocal Rank Fusion
outperforms Condorcet and individual Rank Learning Methods" — public).

The reference (TFRecorder) has no retrieval surface at all; this is an
extension-family operator composing two already-scale-proven rankings:
``text.bm25_scores`` (query-term-bounded explode, broadcast stats) and
``similarity.brute_force_topk`` / IVF (corpus never shuffles to score).

Scale shape: each input ranking is already a TOP-N frame (metadata
scale — N per query, not corpus rows), so the fusion join, score
arithmetic, and final rank are driver-free operations over |queries| x N
rows. At 100 TB the cost lives entirely in the upstream rankings; RRF
adds one broadcast-sized full-outer join per fused pair of lists.

Determinism: RRF only consumes integer ranks (1/(k + rank) in a fixed
two-term expression tree), so fused scores are bit-identical across
engines regardless of how the underlying float scores were produced;
ties break on the document id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def rrf_fuse(
    lex: DataFrame,
    vec: DataFrame,
    id_col: str = "doc_id",
    rank_col: str = "rank",
    rrf_k: int = 60,
    top: int = 20,
) -> DataFrame:
    """Fuse two rankings by reciprocal rank: ``score(d) =
    sum_lists 1/(rrf_k + rank_list(d))``, absent-from-list contributing
    0. ``rrf_k`` damps the head of each list (60 is the published
    default); ``top`` bounds the fused output.

    Inputs are (id, rank) frames — rank 1 = best, ranks unique per
    list. Output: (``id_col``, lex_rank, vec_rank BIGINT nullable,
    rrf_score DOUBLE rounded 9, rank BIGINT).

    The fused frame is |lex| + |vec| rows at most — top-N metadata, so
    the single-partition final window is bounded by construction, not
    by data size.
    """
    if rrf_k < 1:
        raise ValueError(f"rrf_k must be >= 1, got {rrf_k}")
    if top < 1:
        raise ValueError(f"top must be >= 1, got {top}")
    l = lex.select(
        F.col(id_col).alias("__id"), F.col(rank_col).cast("long").alias("lex_rank")
    )
    v = vec.select(
        F.col(id_col).alias("__id"), F.col(rank_col).cast("long").alias("vec_rank")
    )
    j = l.join(v, "__id", "full_outer")
    fused = F.round(
        F.coalesce(F.lit(1.0) / (F.lit(rrf_k) + F.col("lex_rank")), F.lit(0.0))
        + F.coalesce(F.lit(1.0) / (F.lit(rrf_k) + F.col("vec_rank")), F.lit(0.0)),
        9,
    )
    out = j.select(
        F.col("__id").alias(id_col),
        "lex_rank",
        "vec_rank",
        fused.alias("rrf_score"),
    )
    w = Window.orderBy(F.desc("rrf_score"), F.asc(id_col))
    return out.withColumn("rank", F.row_number().over(w).cast("long")).where(
        F.col("rank") <= top
    )


def hybrid_search(
    docs: DataFrame,
    embeddings: DataFrame,
    query_terms: list[str],
    query_vec_id: int,
    text_col: str = "text",
    doc_id_col: str = "doc_id",
    vec_col: str = "embedding",
    vec_id_col: str = "vec_id",
    depth: int = 100,
    rrf_k: int = 60,
    top: int = 20,
) -> DataFrame:
    """End-to-end hybrid search: BM25 over ``docs`` for ``query_terms``
    fused with cosine top-``depth`` around the ``query_vec_id`` vector
    (vec ids align with doc ids in the corpus contract). Both lists cut
    at ``depth`` before fusion — RRF operates on bounded lists, which
    is also what bounds the fusion cost at scale.
    """
    from .similarity import brute_force_topk
    from .skew import salted_topk_per_key
    from .text import bm25_scores

    lex = bm25_scores(docs, text_col, doc_id_col, query_terms)
    # global top-depth over the (data-sized) BM25 match set: salted
    # two-phase rank, never a single global window over matching docs
    lex_ranked = salted_topk_per_key(
        lex,
        key_cols=[],
        order_by=[F.desc("score"), F.asc(doc_id_col)],
        k=depth,
        rank_alias="rank",
        salt_on=doc_id_col,
    ).select(doc_id_col, "rank")
    q = embeddings.where(F.col(vec_id_col) == query_vec_id)
    vec_ranked = (
        brute_force_topk(embeddings, q, vec_col, vec_id_col, k=depth)
        .select(F.col("neighbor_id").alias(doc_id_col), "rank")
    )
    return rrf_fuse(
        lex_ranked, vec_ranked, id_col=doc_id_col, rrf_k=rrf_k, top=top
    )
