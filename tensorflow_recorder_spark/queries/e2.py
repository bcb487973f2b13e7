"""E2 similarity/ANN/retrieval queries (brute/IVF/PQ/SQ/LSH, recall curves, BM25/RRF/MMR) + their oracles.

Split from the original single-module registry (r6 verdict item 7);
bodies are unchanged — see git history of queries.py.
"""
from __future__ import annotations
from collections.abc import Callable
from pyspark.sql import DataFrame, SparkSession, Window, functions as F
from ..operators import dedup, events, similarity, text
from ..operators.scale import fit_and_apply_scale
from ..operators.split import normalize_split, split_histogram_df
from ..operators.vocabulary import (
    apply_vocabulary,
    fit_vocabulary,
    fit_vocabulary_large,
)
from ._shared import (
    ORACLE_E3_BM25,
    _t,
)


def q_e2_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 for query vectors vec_id < 5."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    out = similarity.brute_force_topk(emb, queries, k=10)
    return out.select("query_id", "neighbor_id", "score", F.col("rank").cast("long").alias("rank"))

ORACLE_E2_TOPK = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
norms AS (
  SELECT vec_id, e, sqrt(list_aggregate(list_transform(e, x -> x * x), 'sum')) AS nrm
  FROM e
),
scored AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         round(list_aggregate(list_transform(list_zip(a.e, b.e),
               p -> p[1] * p[2]), 'sum') / (a.nrm * b.nrm), 4) AS score
  FROM norms a JOIN norms b ON a.vec_id < 5 AND a.vec_id <> b.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, score,
         CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY score DESC, neighbor_id) AS BIGINT) AS rank
  FROM scored
)
SELECT * FROM ranked WHERE rank <= 10
"""

def q_e2_ivf_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF partitioning: nearest-centroid assignment (centroids =
    vec_id < 8)."""
    emb = _t(spark, sf_dir, "embeddings")
    centroids = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    return similarity.ivf_assign(emb, centroids)

ORACLE_E2_IVF_ASSIGN = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
norms AS (
  SELECT vec_id, e, sqrt(list_aggregate(list_transform(e, x -> x * x), 'sum')) AS nrm
  FROM e
),
scored AS (
  SELECT v.vec_id, c.vec_id AS centroid_id,
         round(list_aggregate(list_transform(list_zip(v.e, c.e),
               p -> p[1] * p[2]), 'sum') / (v.nrm * c.nrm), 6) AS score
  FROM norms v JOIN norms c ON c.vec_id < 8
)
SELECT vec_id, centroid_id FROM (
  SELECT vec_id, centroid_id,
         row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, centroid_id) AS rn
  FROM scored
) WHERE rn = 1
"""

def q_e2_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed approximate top-10 (nprobe=1) for queries vec_id < 5,
    centroids vec_id < 8."""
    emb = _t(spark, sf_dir, "embeddings")
    centroids = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    out = similarity.ivf_topk(emb, centroids, emb.where(F.col("vec_id") < 5), k=10)
    return out.select(
        "query_id", "neighbor_id", "score", F.col("rank").cast("long").alias("rank")
    )

ORACLE_E2_IVF_TOPK = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
norms AS (
  SELECT vec_id, e, sqrt(list_aggregate(list_transform(e, x -> x * x), 'sum')) AS nrm
  FROM e
),
assign_scored AS (
  SELECT v.vec_id, c.vec_id AS centroid_id,
         round(list_aggregate(list_transform(list_zip(v.e, c.e),
               p -> p[1] * p[2]), 'sum') / (v.nrm * c.nrm), 6) AS score
  FROM norms v JOIN norms c ON c.vec_id < 8
),
assign AS (
  SELECT vec_id, centroid_id FROM (
    SELECT vec_id, centroid_id,
           row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, centroid_id) AS rn
    FROM assign_scored
  ) WHERE rn = 1
),
scored AS (
  SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
         round(list_aggregate(list_transform(list_zip(q.e, v.e),
               p -> p[1] * p[2]), 'sum') / (q.nrm * v.nrm), 4) AS score
  FROM norms q
  JOIN assign qa ON qa.vec_id = q.vec_id
  JOIN assign va ON va.centroid_id = qa.centroid_id
  JOIN norms v ON v.vec_id = va.vec_id AND v.vec_id <> q.vec_id
  WHERE q.vec_id < 5
),
ranked AS (
  SELECT query_id, neighbor_id, score,
         CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY score DESC, neighbor_id) AS BIGINT) AS rank
  FROM scored
)
SELECT * FROM ranked WHERE rank <= 10
"""

def q_e2_ivf_topk_nprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe IVF top-k (nprobe=2): each query searches its TWO
    nearest centroids' cells — higher recall than nprobe=1 at 2/K of
    brute-force cost."""
    emb = _t(spark, sf_dir, "embeddings")
    centroids = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    out = similarity.ivf_topk(
        emb, centroids, emb.where(F.col("vec_id") < 5), k=10, nprobe=2
    )
    return out.select(
        "query_id", "neighbor_id", "score", F.col("rank").cast("long").alias("rank")
    )

def q_e2_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar quantization of the embedding corpus: per-dim
    (min, max) fit broadcast as one single-row frame, codes + exact
    decimal-summed reconstruction MSE as a narrow projection."""
    return similarity.scalar_quantize(
        _t(spark, sf_dir, "embeddings"), "embedding", "vec_id"
    )

ORACLE_E2_QUANTIZE = """
WITH stats AS (
  SELECT i, min(CAST(e AS DOUBLE)) AS mn, max(CAST(e AS DOUBLE)) AS mx FROM (
    SELECT unnest(embedding) AS e, generate_subscripts(embedding, 1) AS i
    FROM embeddings
  ) GROUP BY i
), fitted AS (
  SELECT list(mn ORDER BY i) AS mns, list(mx ORDER BY i) AS mxs FROM stats
), coded AS (
  SELECT vec_id, embedding, mns, mxs,
         list_transform(generate_series(1, len(embedding)), i ->
           CASE WHEN mxs[i] = mns[i] THEN 0
           ELSE CAST(floor((CAST(embedding[i] AS DOUBLE) - mns[i])
                / (mxs[i] - mns[i]) * 254.0 + 0.5) AS INT) - 127 END) AS codes
  FROM embeddings CROSS JOIN fitted
)
SELECT vec_id,
       codes[1] AS q_first,
       list_min(codes) AS q_min,
       list_max(codes) AS q_max,
       round(CAST(list_aggregate(list_transform(generate_series(1, len(codes)), i ->
           CAST((CAST(embedding[i] AS DOUBLE)
                 - (mns[i] + (CAST(codes[i] AS DOUBLE) + 127.0) / 254.0
                    * (mxs[i] - mns[i])))
                * (CAST(embedding[i] AS DOUBLE)
                   - (mns[i] + (CAST(codes[i] AS DOUBLE) + 127.0) / 254.0
                      * (mxs[i] - mns[i])))
             AS DECIMAL(28,12))), 'sum') AS DOUBLE)
             / CAST(len(codes) AS DOUBLE), 6) AS mse
FROM coded
"""

def q_e2_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality evaluation: per-query recall@10 of the IVF search
    (nprobe=1, the e2_ivf_topk configuration) against brute-force
    ground truth (the e2_topk_cosine configuration) — the metric that
    tunes K/nprobe before shipping an index."""
    emb = _t(spark, sf_dir, "embeddings")
    centroids = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    queries = emb.where(F.col("vec_id") < 5)
    ivf = similarity.ivf_topk(emb, centroids, queries, k=10)
    exact = similarity.brute_force_topk(emb, queries, k=10)
    return similarity.ann_recall(ivf, exact)

ORACLE_E2_ANN_RECALL = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
norms AS (
  SELECT vec_id, e, sqrt(list_aggregate(list_transform(e, x -> x * x), 'sum')) AS nrm
  FROM e
),
bf_scored AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         round(list_aggregate(list_transform(list_zip(a.e, b.e),
               p -> p[1] * p[2]), 'sum') / (a.nrm * b.nrm), 4) AS score
  FROM norms a JOIN norms b ON a.vec_id < 5 AND a.vec_id <> b.vec_id
),
bf AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
             ORDER BY score DESC, neighbor_id) AS rank
    FROM bf_scored
  ) WHERE rank <= 10
),
assign_scored AS (
  SELECT v.vec_id, c.vec_id AS centroid_id,
         round(list_aggregate(list_transform(list_zip(v.e, c.e),
               p -> p[1] * p[2]), 'sum') / (v.nrm * c.nrm), 6) AS score
  FROM norms v JOIN norms c ON c.vec_id < 8
),
assign AS (
  SELECT vec_id, centroid_id FROM (
    SELECT vec_id, centroid_id,
           row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, centroid_id) AS rn
    FROM assign_scored
  ) WHERE rn = 1
),
ivf_scored AS (
  SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
         round(list_aggregate(list_transform(list_zip(q.e, v.e),
               p -> p[1] * p[2]), 'sum') / (q.nrm * v.nrm), 4) AS score
  FROM norms q
  JOIN assign qa ON qa.vec_id = q.vec_id
  JOIN assign va ON va.centroid_id = qa.centroid_id
  JOIN norms v ON v.vec_id = va.vec_id AND v.vec_id <> q.vec_id
  WHERE q.vec_id < 5
),
ivf AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
             ORDER BY score DESC, neighbor_id) AS rank
    FROM ivf_scored
  ) WHERE rank <= 10
),
truth AS (SELECT query_id, count(*) AS n_true FROM bf GROUP BY query_id),
hits AS (
  SELECT query_id, count(*) AS n_hits
  FROM ivf JOIN bf USING (query_id, neighbor_id) GROUP BY query_id
)
SELECT t.query_id,
       CAST(t.n_true AS BIGINT) AS n_true,
       CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       round(coalesce(h.n_hits, 0)::DOUBLE / t.n_true, 6) AS recall
FROM truth t LEFT JOIN hits h USING (query_id)
"""

def q_e2_kmeans_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two full Lloyd iterations (seed = 8 lowest-id vectors), centroids
    posexploded to scalar rows. Exercises the iterative driver loop with
    checkpointed lineage — the IVF training path."""
    emb = _t(spark, sf_dir, "embeddings")
    fitted = similarity.kmeans_fit(emb, k=8, iterations=2)
    return fitted.select(
        "centroid_id", "n_members", F.posexplode("embedding").alias("dim", "value")
    ).select(
        "centroid_id",
        F.col("dim").cast("long").alias("dim"),
        F.round("value", 6).alias("value"),
        "n_members",
    )

ORACLE_E2_KMEANS_FIT = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
norms AS (
  SELECT vec_id, e, sqrt(list_aggregate(list_transform(e, x -> x * x), 'sum')) AS nrm
  FROM e
),
s1 AS (
  SELECT v.vec_id, c.vec_id AS centroid_id,
         round(list_aggregate(list_transform(list_zip(v.e, c.e),
               p -> p[1] * p[2]), 'sum') / (v.nrm * c.nrm), 6) AS score
  FROM norms v JOIN norms c ON c.vec_id < 8
),
a1 AS (
  SELECT vec_id, centroid_id FROM (
    SELECT vec_id, centroid_id,
           row_number() OVER (PARTITION BY vec_id
                ORDER BY score DESC, centroid_id) AS rn
    FROM s1
  ) WHERE rn = 1
),
d1 AS (
  SELECT a.centroid_id, e.e AS emb,
         unnest(generate_series(1, len(e.e))) AS dim
  FROM e JOIN a1 a ON e.vec_id = a.vec_id
),
m1 AS (SELECT centroid_id, dim, avg(emb[dim]) AS m FROM d1 GROUP BY 1, 2),
c1 AS (
  SELECT centroid_id, list(m ORDER BY dim) AS ce FROM m1 GROUP BY centroid_id
),
c1n AS (
  SELECT centroid_id, ce,
         sqrt(list_aggregate(list_transform(ce, x -> x * x), 'sum')) AS cn
  FROM c1
),
s2 AS (
  SELECT v.vec_id, c.centroid_id,
         round(list_aggregate(list_transform(list_zip(v.e, c.ce),
               p -> p[1] * p[2]), 'sum') / (v.nrm * c.cn), 6) AS score
  FROM norms v CROSS JOIN c1n c
),
a2 AS (
  SELECT vec_id, centroid_id FROM (
    SELECT vec_id, centroid_id,
           row_number() OVER (PARTITION BY vec_id
                ORDER BY score DESC, centroid_id) AS rn
    FROM s2
  ) WHERE rn = 1
),
d2 AS (
  SELECT a.centroid_id, e.e AS emb,
         unnest(generate_series(1, len(e.e))) AS dim
  FROM e JOIN a2 a ON e.vec_id = a.vec_id
),
m2 AS (
  SELECT centroid_id, dim, avg(emb[dim]) AS m, count(*) AS n
  FROM d2 GROUP BY 1, 2
)
SELECT centroid_id, CAST(dim - 1 AS BIGINT) AS dim,
       round(m, 6) AS value, n AS n_members
FROM m2
"""

def q_e2_rp_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH bucketed approximate top-k (queries vec_id < 5, 4
    hyperplanes -> 16 buckets): the stateless ANN scale path."""
    emb = _t(spark, sf_dir, "embeddings")
    out = similarity.rp_lsh_topk(
        emb, emb.where(F.col("vec_id") < 5), dim=64, k=10
    )
    return out.select(
        "query_id", "neighbor_id", "score", F.col("rank").cast("long").alias("rank")
    )

def _oracle_rp_lsh_topk() -> str:
    planes = similarity.rp_hyperplanes(64, 4)
    bucket_terms = []
    for b, p in enumerate(planes):
        lit = "[" + ", ".join(f"{x}::DOUBLE" for x in p) + "]"
        dot = (
            f"list_aggregate(list_transform(list_zip(e, {lit}), "
            f"p -> p[1] * p[2]), 'sum')"
        )
        bucket_terms.append(f"(CASE WHEN ({dot}) >= 0 THEN {1 << b} ELSE 0 END)")
    bucket = " + ".join(bucket_terms)
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
norms AS (
  SELECT vec_id, e, sqrt(list_aggregate(list_transform(e, x -> x * x), 'sum')) AS nrm,
         {bucket} AS bucket
  FROM e
),
scored AS (
  SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
         round(list_aggregate(list_transform(list_zip(q.e, v.e),
               p -> p[1] * p[2]), 'sum') / (q.nrm * v.nrm), 4) AS score
  FROM norms q JOIN norms v
    ON q.vec_id < 5 AND q.bucket = v.bucket AND q.vec_id <> v.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, score,
         CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY score DESC, neighbor_id) AS BIGINT) AS rank
  FROM scored
)
SELECT * FROM ranked WHERE rank <= 10
"""

ORACLE_E2_IVF_TOPK_NPROBE = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
norms AS (
  SELECT vec_id, e, sqrt(list_aggregate(list_transform(e, x -> x * x), 'sum')) AS nrm
  FROM e
),
cell_scored AS (
  SELECT v.vec_id, c.vec_id AS centroid_id,
         round(list_aggregate(list_transform(list_zip(v.e, c.e),
               p -> p[1] * p[2]), 'sum') / (v.nrm * c.nrm), 6) AS score
  FROM norms v JOIN norms c ON c.vec_id < 8
),
cassign AS (
  SELECT vec_id, centroid_id FROM (
    SELECT vec_id, centroid_id,
           row_number() OVER (PARTITION BY vec_id
                ORDER BY score DESC, centroid_id) AS rn
    FROM cell_scored
  ) WHERE rn = 1
),
qprobe AS (
  SELECT vec_id, centroid_id FROM (
    SELECT vec_id, centroid_id,
           row_number() OVER (PARTITION BY vec_id
                ORDER BY score DESC, centroid_id) AS rn
    FROM cell_scored WHERE vec_id < 5
  ) WHERE rn <= 2
),
scored AS (
  SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
         round(list_aggregate(list_transform(list_zip(q.e, v.e),
               p -> p[1] * p[2]), 'sum') / (q.nrm * v.nrm), 4) AS score
  FROM norms q
  JOIN qprobe qp ON qp.vec_id = q.vec_id
  JOIN cassign va ON va.centroid_id = qp.centroid_id
  JOIN norms v ON v.vec_id = va.vec_id AND v.vec_id <> q.vec_id
  WHERE q.vec_id < 5
),
ranked AS (
  SELECT query_id, neighbor_id, score,
         CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY score DESC, neighbor_id) AS BIGINT) AS rank
  FROM scored
)
SELECT * FROM ranked WHERE rank <= 10
"""

def q_e2_l2_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unit-normalize embeddings (cosine becomes plain dot downstream).
    Declared output is posexploded to scalar (vec_id, dim, value) rows —
    the external checker's pandas canonicalizer cannot hash array-typed
    columns (round-1 red row). Elements rounded to 6 digits for
    engine-portable hashing; per-row arithmetic so the values are
    otherwise IEEE-identical. Zero-norm vectors normalize to NULL and
    contribute no rows."""
    out = similarity.l2_normalize(_t(spark, sf_dir, "embeddings"))
    return out.select(
        "vec_id", F.posexplode("embedding").alias("dim", "value")
    ).select(
        "vec_id",
        F.col("dim").cast("long").alias("dim"),
        F.round("value", 6).alias("value"),
    )

ORACLE_E2_L2_NORMALIZE = """
WITH n AS (
  SELECT vec_id, embedding,
         sqrt(list_aggregate(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE),
              'sum')) AS nrm
  FROM embeddings
),
d AS (
  SELECT vec_id, embedding, nrm,
         unnest(generate_series(1, len(embedding))) AS dim
  FROM n WHERE nrm <> 0
)
SELECT vec_id, CAST(dim - 1 AS BIGINT) AS dim,
       round(embedding[dim]::DOUBLE / nrm, 6) AS value
FROM d
"""

def q_e2_kmeans_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One distributed Lloyd iteration: assign to seed centroids
    (vec_id < 8), recompute centroids as member means. Means rounded to
    6 digits (multi-row double accumulation, see module docstring)."""
    emb = _t(spark, sf_dir, "embeddings")
    centroids = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    assign = similarity.ivf_assign(emb, centroids)
    updated = similarity.kmeans_update(emb, assign)
    # Posexplode to scalar (centroid_id, dim, value, n_members) rows —
    # the external checker cannot hash array-typed columns (round-1 red
    # row); same 6-digit rounding (multi-row double accumulation).
    return updated.select(
        "centroid_id", "n_members", F.posexplode("embedding").alias("dim", "value")
    ).select(
        "centroid_id",
        F.col("dim").cast("long").alias("dim"),
        F.round("value", 6).alias("value"),
        "n_members",
    )

def _oracle_kmeans_update() -> str:
    return f"""
WITH assign AS ({ORACLE_E2_IVF_ASSIGN}),
dims AS (
  SELECT a.centroid_id, e.embedding AS emb,
         unnest(generate_series(1, len(e.embedding))) AS dim
  FROM embeddings e JOIN assign a ON e.vec_id = a.vec_id
),
means AS (
  SELECT centroid_id, dim, avg(emb[dim]::DOUBLE) AS m, count(*) AS n
  FROM dims GROUP BY centroid_id, dim
)
SELECT centroid_id, CAST(dim - 1 AS BIGINT) AS dim,
       round(m, 6) AS value, n AS n_members
FROM means
"""

def q_e2_retrieve_diverse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 end-to-end serving pipeline: hybrid RRF retrieval (BM25 x
    cosine, depth 100, top 20) feeding MMR diversity re-ranking down
    to 8 — retrieve-then-diversify, the exact shape in front of a RAG
    context window. MMR's relevance input is the fused RRF score
    (integer-rank arithmetic, engine-exact), so the whole two-stage
    trajectory is oracle-checkable."""
    from ..operators.retrieval import hybrid_search, mmr_rerank

    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    hy = hybrid_search(
        docs, emb,
        query_terms=["hash", "join", "spark"],
        query_vec_id=0, depth=100, rrf_k=60, top=20,
    )
    cands = hy.join(emb, hy["doc_id"] == emb["vec_id"]).select(
        "doc_id", F.col("rrf_score").alias("score"), "embedding"
    )
    return mmr_rerank(cands, lam=0.7, k=8)

def _oracle_retrieve_diverse() -> str:
    return f"""
WITH RECURSIVE hy AS ({ORACLE_E2_HYBRID_RRF}),
cand AS (SELECT doc_id, rrf_score AS rel FROM hy),
e2 AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
n2 AS (
  SELECT vec_id, e, sqrt(list_aggregate(list_transform(e, x -> x * x), 'sum')) AS nrm
  FROM e2
),
mpairs AS (
  SELECT x.doc_id AS a, y.doc_id AS b,
         round(list_aggregate(list_transform(list_zip(nx.e, ny.e),
               p -> p[1] * p[2]), 'sum') / (nx.nrm * ny.nrm), 4) AS sim
  FROM cand x JOIN cand y ON x.doc_id <> y.doc_id
  JOIN n2 nx ON nx.vec_id = x.doc_id
  JOIN n2 ny ON ny.vec_id = y.doc_id
),
sel(step, ids, doc_id, mmr_score) AS (
  SELECT CAST(1 AS BIGINT), [c.doc_id], c.doc_id,
         round(CAST(0.7 AS DOUBLE) * c.rel, 6)
  FROM (SELECT doc_id, rel FROM cand
        ORDER BY round(CAST(0.7 AS DOUBLE) * rel, 6) DESC, doc_id
        LIMIT 1) c
  UNION ALL
  SELECT s.step + 1, list_append(s.ids, p.doc_id), p.doc_id, p.score
  FROM sel s, LATERAL (
    SELECT c.doc_id,
           round(CAST(0.7 AS DOUBLE) * c.rel
                 - CAST(0.3 AS DOUBLE) * coalesce(
                     (SELECT max(pr.sim) FROM mpairs pr
                      WHERE pr.a = c.doc_id AND list_contains(s.ids, pr.b)),
                     0), 6) AS score
    FROM cand c WHERE NOT list_contains(s.ids, c.doc_id)
    ORDER BY score DESC, c.doc_id
    LIMIT 1
  ) p
  WHERE s.step < 8
)
SELECT step, doc_id, mmr_score FROM sel
"""

def q_e2_pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization encode (Jégou et al. 2011): every embedding
    compressed to 4 code ids against the deterministic seed codebook
    (the 16 lowest-id vectors' subvectors; the trained path is
    similarity.pq_fit). 64 floats -> 4 small ints per vector."""
    emb = _t(spark, sf_dir, "embeddings")
    cb = similarity.pq_seed_codebook(emb, m=4, k=16)
    return similarity.pq_encode(emb, cb, m=4)

ORACLE_E2_PQ_ENCODE = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
sub AS (
  SELECT vec_id, s AS sub_id, e[s*16+1 : s*16+16] AS sv
  FROM e, UNNEST([0,1,2,3]) AS t(s)
),
seeds AS (
  SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS code_id, e
  FROM (SELECT * FROM e ORDER BY vec_id LIMIT 16)
),
cb AS (
  SELECT s AS sub_id, code_id, e[s*16+1 : s*16+16] AS cv
  FROM seeds, UNNEST([0,1,2,3]) AS t(s)
),
scored AS (
  SELECT sub.vec_id, sub.sub_id, cb.code_id,
         round(list_aggregate(list_transform(list_zip(sv, cv),
               p -> (p[1] - p[2]) * (p[1] - p[2])), 'sum'), 6) AS d
  FROM sub JOIN cb USING (sub_id)
)
SELECT vec_id, sub_id, CAST(code_id AS BIGINT) AS code_id FROM (
  SELECT vec_id, sub_id, code_id,
         row_number() OVER (PARTITION BY vec_id, sub_id
                            ORDER BY d, code_id) AS rn
  FROM scored
) WHERE rn = 1
"""

def q_e2_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ asymmetric-distance top-5: the 10 lowest-id vectors as
    queries, corpus scored purely through its 4-code compressed form +
    a broadcast lookup table — the memory-bound ANN serving path."""
    emb = _t(spark, sf_dir, "embeddings")
    cb = similarity.pq_seed_codebook(emb, m=4, k=16)
    codes = similarity.pq_encode(emb, cb, m=4)
    queries = emb.orderBy(F.asc("vec_id")).limit(10)
    return similarity.pq_topk(queries, codes, cb, k=5, m=4)

ORACLE_E2_PQ_TOPK = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
sub AS (
  SELECT vec_id, s AS sub_id, e[s*16+1 : s*16+16] AS sv
  FROM e, UNNEST([0,1,2,3]) AS t(s)
),
seeds AS (
  SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS code_id, e
  FROM (SELECT * FROM e ORDER BY vec_id LIMIT 16)
),
cb AS (
  SELECT s AS sub_id, code_id, e[s*16+1 : s*16+16] AS cv
  FROM seeds, UNNEST([0,1,2,3]) AS t(s)
),
scored AS (
  SELECT sub.vec_id, sub.sub_id, cb.code_id,
         round(list_aggregate(list_transform(list_zip(sv, cv),
               p -> (p[1] - p[2]) * (p[1] - p[2])), 'sum'), 6) AS d
  FROM sub JOIN cb USING (sub_id)
),
codes AS (
  SELECT vec_id, sub_id, code_id FROM (
    SELECT vec_id, sub_id, code_id,
           row_number() OVER (PARTITION BY vec_id, sub_id
                              ORDER BY d, code_id) AS rn
    FROM scored
  ) WHERE rn = 1
),
queries AS (SELECT vec_id AS query_id FROM e ORDER BY vec_id LIMIT 10),
lut AS (
  SELECT q.query_id, s.sub_id, c.code_id,
         round(list_aggregate(list_transform(list_zip(s.sv, c.cv),
               p -> (p[1] - p[2]) * (p[1] - p[2])), 'sum'), 6) AS pd
  FROM queries q
  JOIN sub s ON s.vec_id = q.query_id
  JOIN cb c ON c.sub_id = s.sub_id
),
adc AS (
  SELECT l.query_id, k.vec_id AS neighbor_id, round(sum(l.pd), 6) AS adc_dist
  FROM codes k
  JOIN lut l ON l.sub_id = k.sub_id AND l.code_id = k.code_id
  WHERE l.query_id <> k.vec_id
  GROUP BY 1, 2
)
SELECT query_id, neighbor_id, adc_dist, CAST(rn AS BIGINT) AS rank
FROM (
  SELECT query_id, neighbor_id, adc_dist,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY adc_dist, neighbor_id) AS rn
  FROM adc
) WHERE rn <= 5
"""

def q_e2_ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ top-5 (the FAISS IndexIVFPQ composition): queries probe
    their 2 nearest of 8 seed cells; asymmetric-distance scoring runs
    only over the probed cells' 4-code compressed vectors."""
    emb = _t(spark, sf_dir, "embeddings")
    centroids = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    cb = similarity.pq_seed_codebook(emb, m=4, k=16)
    codes = similarity.pq_encode(emb, cb, m=4).join(
        similarity.ivf_assign(emb, centroids), "vec_id"
    )
    queries = emb.orderBy(F.asc("vec_id")).limit(10)
    return similarity.ivf_pq_topk(
        queries, codes, cb, centroids, k=5, m=4, nprobe=2
    )

ORACLE_E2_IVF_PQ_TOPK = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
norms AS (
  SELECT vec_id, e, sqrt(list_aggregate(list_transform(e, x -> x * x), 'sum')) AS nrm
  FROM e
),
cscored AS (
  SELECT v.vec_id, c.vec_id AS centroid_id,
         round(list_aggregate(list_transform(list_zip(v.e, c.e),
               p -> p[1] * p[2]), 'sum') / (v.nrm * c.nrm), 6) AS score
  FROM norms v JOIN norms c ON c.vec_id < 8
),
assign AS (
  SELECT vec_id, centroid_id FROM (
    SELECT vec_id, centroid_id,
           row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, centroid_id) AS rn
    FROM cscored
  ) WHERE rn = 1
),
queries AS (SELECT vec_id AS query_id FROM e ORDER BY vec_id LIMIT 10),
probes AS (
  SELECT query_id, centroid_id FROM (
    SELECT q.query_id, s.centroid_id,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY s.score DESC, s.centroid_id) AS rn
    FROM queries q JOIN cscored s ON s.vec_id = q.query_id
  ) WHERE rn <= 2
),
sub AS (
  SELECT vec_id, s AS sub_id, e[s*16+1 : s*16+16] AS sv
  FROM e, UNNEST([0,1,2,3]) AS t(s)
),
seeds AS (
  SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS code_id, e
  FROM (SELECT * FROM e ORDER BY vec_id LIMIT 16)
),
cb AS (
  SELECT s AS sub_id, code_id, e[s*16+1 : s*16+16] AS cv
  FROM seeds, UNNEST([0,1,2,3]) AS t(s)
),
pqscored AS (
  SELECT sub.vec_id, sub.sub_id, cb.code_id,
         round(list_aggregate(list_transform(list_zip(sv, cv),
               p -> (p[1] - p[2]) * (p[1] - p[2])), 'sum'), 6) AS d
  FROM sub JOIN cb USING (sub_id)
),
codes AS (
  SELECT vec_id, sub_id, code_id FROM (
    SELECT vec_id, sub_id, code_id,
           row_number() OVER (PARTITION BY vec_id, sub_id
                              ORDER BY d, code_id) AS rn
    FROM pqscored
  ) WHERE rn = 1
),
lut AS (
  SELECT q.query_id, s.sub_id, c.code_id,
         round(list_aggregate(list_transform(list_zip(s.sv, c.cv),
               p -> (p[1] - p[2]) * (p[1] - p[2])), 'sum'), 6) AS pd
  FROM queries q
  JOIN sub s ON s.vec_id = q.query_id
  JOIN cb c ON c.sub_id = s.sub_id
),
adc AS (
  SELECT l.query_id, k.vec_id AS neighbor_id, round(sum(l.pd), 6) AS adc_dist
  FROM codes k
  JOIN assign a ON a.vec_id = k.vec_id
  JOIN probes pr ON pr.centroid_id = a.centroid_id
  JOIN lut l ON l.sub_id = k.sub_id AND l.code_id = k.code_id
            AND l.query_id = pr.query_id
  WHERE l.query_id <> k.vec_id
  GROUP BY 1, 2
)
SELECT query_id, neighbor_id, adc_dist, CAST(rn AS BIGINT) AS rank
FROM (
  SELECT query_id, neighbor_id, adc_dist,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY adc_dist, neighbor_id) AS rn
  FROM adc
) WHERE rn <= 5
"""

def q_e2_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ quality evaluation: per-query recall@10 of ADC search (seed
    codebook) against exact squared-L2 ground truth — the metric that
    decides m/k before shipping a compressed index."""
    from ..operators.skew import salted_topk_per_key

    emb = _t(spark, sf_dir, "embeddings")
    cb = similarity.pq_seed_codebook(emb, m=4, k=16)
    codes = similarity.pq_encode(emb, cb, m=4)
    queries = emb.orderBy(F.asc("vec_id")).limit(5)
    # r12 (verdict item 5): the ADC and exact-truth scoring passes read
    # DIFFERENT inputs (codes vs raw vectors) so only the rank chains
    # merge — both scored frames stack with an arm tag into ONE salted
    # top-k (both rank by (dist asc, neighbor asc), unchanged per-arm
    # arithmetic); the tiny top-k frame is eagerly checkpointed for
    # ann_recall's two reads.
    both = (
        similarity.l2_scored(emb, queries)
        .select(
            F.lit(0).cast("int").alias("arm"),
            "query_id",
            "neighbor_id",
            "dist",
        )
        .unionByName(
            similarity.adc_scored(queries, codes, cb, m=4).select(
                F.lit(1).cast("int").alias("arm"),
                "query_id",
                "neighbor_id",
                F.col("adc_dist").alias("dist"),
            )
        )
    )
    topk = salted_topk_per_key(
        both,
        key_cols=["arm", "query_id"],
        order_by=[F.asc("dist"), F.asc("neighbor_id")],
        k=10,
        rank_alias="rank",
        salt_on="neighbor_id",
    ).localCheckpoint(eager=True)
    ann = topk.where(F.col("arm") == 1)
    exact = topk.where(F.col("arm") == 0)
    return similarity.ann_recall(ann, exact)

ORACLE_E2_PQ_RECALL = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
queries AS (SELECT vec_id AS query_id, e AS qe FROM e ORDER BY vec_id LIMIT 5),
exact AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.query_id, c.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY q.query_id ORDER BY
             round(list_aggregate(list_transform(list_zip(q.qe, c.e),
                   p -> (p[1] - p[2]) * (p[1] - p[2])), 'sum'), 6),
             c.vec_id) AS rn
    FROM queries q JOIN e c ON c.vec_id <> q.query_id
  ) WHERE rn <= 10
),
sub AS (
  SELECT vec_id, s AS sub_id, e[s*16+1 : s*16+16] AS sv
  FROM e, UNNEST([0,1,2,3]) AS t(s)
),
seeds AS (
  SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS code_id, e
  FROM (SELECT * FROM e ORDER BY vec_id LIMIT 16)
),
cb AS (
  SELECT s AS sub_id, code_id, e[s*16+1 : s*16+16] AS cv
  FROM seeds, UNNEST([0,1,2,3]) AS t(s)
),
pqscored AS (
  SELECT sub.vec_id, sub.sub_id, cb.code_id,
         round(list_aggregate(list_transform(list_zip(sv, cv),
               p -> (p[1] - p[2]) * (p[1] - p[2])), 'sum'), 6) AS d
  FROM sub JOIN cb USING (sub_id)
),
codes AS (
  SELECT vec_id, sub_id, code_id FROM (
    SELECT vec_id, sub_id, code_id,
           row_number() OVER (PARTITION BY vec_id, sub_id
                              ORDER BY d, code_id) AS rn
    FROM pqscored
  ) WHERE rn = 1
),
lut AS (
  SELECT q.query_id, s.sub_id, c.code_id,
         round(list_aggregate(list_transform(list_zip(s.sv, c.cv),
               p -> (p[1] - p[2]) * (p[1] - p[2])), 'sum'), 6) AS pd
  FROM queries q
  JOIN sub s ON s.vec_id = q.query_id
  JOIN cb c ON c.sub_id = s.sub_id
),
ann AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY adc_dist, neighbor_id) AS rn
    FROM (
      SELECT l.query_id, k.vec_id AS neighbor_id,
             round(sum(l.pd), 6) AS adc_dist
      FROM codes k
      JOIN lut l ON l.sub_id = k.sub_id AND l.code_id = k.code_id
      WHERE l.query_id <> k.vec_id
      GROUP BY 1, 2
    )
  ) WHERE rn <= 10
),
truth AS (SELECT query_id, count(*) AS n_true FROM exact GROUP BY query_id),
hits AS (
  SELECT a.query_id, count(*) AS n_hits
  FROM ann a JOIN exact x
    ON x.query_id = a.query_id AND x.neighbor_id = a.neighbor_id
  GROUP BY a.query_id
)
SELECT t.query_id, CAST(t.n_true AS BIGINT) AS n_true,
       CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       round(coalesce(h.n_hits, 0)::DOUBLE / t.n_true, 6) AS recall
FROM truth t LEFT JOIN hits h ON h.query_id = t.query_id
"""

def q_e2_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2: embedding centroid drift per label — L2 distance between the
    mean embeddings of two deterministic halves of the corpus (vec_id
    parity), the first-line representation-drift monitor."""
    from ..operators.drift import embedding_drift

    emb = _t(spark, sf_dir, "embeddings")
    ref = emb.where(F.expr("vec_id % 2 = 0"))
    cur = emb.where(F.expr("vec_id % 2 = 1"))
    return embedding_drift(ref, cur, "embedding", group_col="label")

ORACLE_E2_DRIFT = """
WITH exploded AS (
  SELECT vec_id, label, u.dim AS dim, u.v AS v FROM (
    SELECT vec_id, label,
           unnest(list_transform(generate_series(1, len(embedding)),
                  i -> struct_pack(dim := i - 1, v := embedding[i]))) AS u
    FROM embeddings
  )
),
r AS (
  SELECT label, dim,
         sum(CAST(CAST(v AS DOUBLE) AS DECIMAL(28,10))) AS sr,
         count(*) AS nr
  FROM exploded WHERE vec_id % 2 = 0 GROUP BY label, dim
),
c AS (
  SELECT label, dim,
         sum(CAST(CAST(v AS DOUBLE) AS DECIMAL(28,10))) AS sc,
         count(*) AS nc
  FROM exploded WHERE vec_id % 2 = 1 GROUP BY label, dim
),
d AS (
  SELECT r.label, r.dim, r.nr, c.nc,
         CAST(sr AS DOUBLE) / CAST(nr AS DOUBLE)
         - CAST(sc AS DOUBLE) / CAST(nc AS DOUBLE) AS dd
  FROM r JOIN c ON r.label = c.label AND r.dim = c.dim
)
SELECT label,
       CAST(max(nr) AS BIGINT) AS n_ref,
       CAST(max(nc) AS BIGINT) AS n_cur,
       round(sqrt(list_reduce(list(dd * dd ORDER BY dim), (a, x) -> a + x)), 6)
         AS drift_l2
FROM d GROUP BY label
"""

def q_e2_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2/E3 hybrid retrieval: BM25 lexical ranking (query 'hash join
    spark') fused with cosine vector ranking (query = the vec_id 0
    embedding) by reciprocal-rank fusion at depth 100, top 20 released
    — the standard hybrid-search primitive in front of RAG pipelines.
    RRF consumes only integer ranks, so the fusion is engine-exact even
    though the two underlying scores live on different float scales."""
    from ..operators.retrieval import hybrid_search

    return hybrid_search(
        _t(spark, sf_dir, "documents"),
        _t(spark, sf_dir, "embeddings"),
        query_terms=["hash", "join", "spark"],
        query_vec_id=0,
        depth=100,
        rrf_k=60,
        top=20,
    )

ORACLE_E2_HYBRID_RRF = r"""
WITH toks AS (
  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\s+'), t -> t <> '') AS t
  FROM documents
),
lengths AS (SELECT doc_id, len(t) AS dl FROM toks),
stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM lengths),
tf AS (
  SELECT doc_id, term, count(*) AS tf
  FROM (SELECT doc_id, unnest(t) AS term FROM toks)
  WHERE term IN ('hash', 'join', 'spark')
  GROUP BY doc_id, term
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
bm AS (
  SELECT doc_id, round(sum(term_score), 6) AS score
  FROM (
    SELECT tf.doc_id,
           round(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) *
                 (tf * (1.2 + 1.0)) /
                 (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)), 9) AS term_score
    FROM tf
    JOIN dfreq USING (term)
    JOIN lengths ON tf.doc_id = lengths.doc_id
    CROSS JOIN stats
  )
  GROUP BY doc_id
),
lexr AS (
  SELECT doc_id,
         CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS lex_rank
  FROM bm QUALIFY lex_rank <= 100
),
e AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
norms AS (
  SELECT vec_id, e, sqrt(list_aggregate(list_transform(e, x -> x * x), 'sum')) AS nrm
  FROM e
),
q AS (SELECT e AS qe, nrm AS qn FROM norms WHERE vec_id = 0),
cos AS (
  SELECT b.vec_id AS doc_id,
         round(list_aggregate(list_transform(list_zip(q.qe, b.e),
               p -> p[1] * p[2]), 'sum') / (q.qn * b.nrm), 4) AS score
  FROM norms b, q WHERE b.vec_id <> 0
),
vecr AS (
  SELECT doc_id,
         CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS vec_rank
  FROM cos QUALIFY vec_rank <= 100
),
fused AS (
  SELECT coalesce(l.doc_id, v.doc_id) AS doc_id, l.lex_rank, v.vec_rank,
         round(coalesce(1.0 / (60 + l.lex_rank), 0)
               + coalesce(1.0 / (60 + v.vec_rank), 0), 9) AS rrf_score
  FROM lexr l FULL OUTER JOIN vecr v ON l.doc_id = v.doc_id
)
SELECT doc_id, lex_rank, vec_rank, rrf_score,
       CAST(row_number() OVER (ORDER BY rrf_score DESC, doc_id) AS BIGINT) AS rank
FROM fused QUALIFY rank <= 20
"""

def q_e2_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2: MMR diversity re-ranking of the vec-0 cosine top-30 down to
    10 (lambda = 0.7) — the greedy runs executor-side over the bounded
    candidate matrix; the DuckDB oracle replays the identical greedy
    as a recursive CTE, so the whole selection trajectory (not just
    the final set) is oracle-checked."""
    from ..operators.retrieval import mmr_rerank

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") == 0)
    cands = (
        similarity.brute_force_topk(emb, q, k=30)
        .join(emb, F.col("neighbor_id") == F.col("vec_id"))
        .select(
            F.col("neighbor_id").alias("doc_id"),
            "score",
            "embedding",
        )
    )
    return mmr_rerank(cands, lam=0.7, k=10)

ORACLE_E2_MMR_RERANK = """
WITH RECURSIVE e AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
norms AS (
  SELECT vec_id, e, sqrt(list_aggregate(list_transform(e, x -> x * x), 'sum')) AS nrm
  FROM e
),
q AS (SELECT e AS qe, nrm AS qn FROM norms WHERE vec_id = 0),
cos AS (
  SELECT b.vec_id AS doc_id,
         round(list_aggregate(list_transform(list_zip(q.qe, b.e),
               p -> p[1] * p[2]), 'sum') / (q.qn * b.nrm), 4) AS rel
  FROM norms b, q WHERE b.vec_id <> 0
),
cand AS (
  SELECT doc_id, rel
  FROM cos QUALIFY row_number() OVER (ORDER BY rel DESC, doc_id) <= 30
),
pairs AS (
  SELECT x.doc_id AS a, y.doc_id AS b,
         round(list_aggregate(list_transform(list_zip(nx.e, ny.e),
               p -> p[1] * p[2]), 'sum') / (nx.nrm * ny.nrm), 4) AS sim
  FROM cand x JOIN cand y ON x.doc_id <> y.doc_id
  JOIN norms nx ON nx.vec_id = x.doc_id
  JOIN norms ny ON ny.vec_id = y.doc_id
),
sel(step, ids, doc_id, mmr_score) AS (
  SELECT CAST(1 AS BIGINT), [c.doc_id], c.doc_id,
         round(CAST(0.7 AS DOUBLE) * c.rel, 6)
  FROM (SELECT doc_id, rel FROM cand
        ORDER BY round(CAST(0.7 AS DOUBLE) * rel, 6) DESC, doc_id
        LIMIT 1) c
  UNION ALL
  SELECT s.step + 1, list_append(s.ids, p.doc_id), p.doc_id, p.score
  FROM sel s, LATERAL (
    SELECT c.doc_id,
           round(CAST(0.7 AS DOUBLE) * c.rel
                 - CAST(0.3 AS DOUBLE) * coalesce(
                     (SELECT max(pr.sim) FROM pairs pr
                      WHERE pr.a = c.doc_id AND list_contains(s.ids, pr.b)),
                     0), 6) AS score
    FROM cand c WHERE NOT list_contains(s.ids, c.doc_id)
    ORDER BY score DESC, c.doc_id
    LIMIT 1
  ) p
  WHERE s.step < 10
)
SELECT step, doc_id, mmr_score FROM sel
"""

def q_e2_delta_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2: freshness-aware ANN serving — IVF (nprobe=1, centroids
    vec_id < 8) over the 'indexed' corpus (vec_id < 450) unioned with
    exact brute force over the fresh delta (vec_id >= 450), re-ranked
    to one top-10 per query (queries vec_id < 5). Completes the index
    lifecycle: fresh rows are searchable before compaction folds them
    into the index."""
    emb = _t(spark, sf_dir, "embeddings")
    main = emb.where(F.col("vec_id") < 450)
    delta = emb.where(F.col("vec_id") >= 450)
    centroids = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    out = similarity.delta_topk(
        main, delta, centroids, emb.where(F.col("vec_id") < 5), k=10
    )
    return out.select(
        "query_id",
        "neighbor_id",
        "score",
        F.col("rank").cast("long").alias("rank"),
        "src",
    )

ORACLE_E2_DELTA_SEARCH = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
norms AS (
  SELECT vec_id, e, sqrt(list_aggregate(list_transform(e, x -> x * x), 'sum')) AS nrm
  FROM e
),
assign_scored AS (
  SELECT v.vec_id, c.vec_id AS centroid_id,
         round(list_aggregate(list_transform(list_zip(v.e, c.e),
               p -> p[1] * p[2]), 'sum') / (v.nrm * c.nrm), 6) AS score
  FROM norms v JOIN norms c ON c.vec_id < 8
  WHERE v.vec_id < 450
),
assign AS (
  SELECT vec_id, centroid_id FROM (
    SELECT vec_id, centroid_id,
           row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, centroid_id) AS rn
    FROM assign_scored
  ) WHERE rn = 1
),
main_scored AS (
  SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
         round(list_aggregate(list_transform(list_zip(q.e, v.e),
               p -> p[1] * p[2]), 'sum') / (q.nrm * v.nrm), 4) AS score
  FROM norms q
  JOIN assign qa ON qa.vec_id = q.vec_id
  JOIN assign va ON va.centroid_id = qa.centroid_id
  JOIN norms v ON v.vec_id = va.vec_id AND v.vec_id <> q.vec_id
  WHERE q.vec_id < 5 AND v.vec_id < 450
),
main_hits AS (
  SELECT query_id, neighbor_id, score, 'main' AS src
  FROM main_scored
  QUALIFY row_number() OVER (PARTITION BY query_id
          ORDER BY score DESC, neighbor_id) <= 10
),
delta_scored AS (
  SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
         round(list_aggregate(list_transform(list_zip(q.e, v.e),
               p -> p[1] * p[2]), 'sum') / (q.nrm * v.nrm), 4) AS score
  FROM norms q JOIN norms v ON v.vec_id >= 450 AND v.vec_id <> q.vec_id
  WHERE q.vec_id < 5
),
delta_hits AS (
  SELECT query_id, neighbor_id, score, 'delta' AS src
  FROM delta_scored
  QUALIFY row_number() OVER (PARTITION BY query_id
          ORDER BY score DESC, neighbor_id) <= 10
),
unioned AS (
  SELECT * FROM main_hits UNION ALL SELECT * FROM delta_hits
)
SELECT query_id, neighbor_id, score,
       CAST(row_number() OVER (PARTITION BY query_id
            ORDER BY score DESC, neighbor_id) AS BIGINT) AS rank,
       src
FROM unioned
QUALIFY rank <= 10
"""

def q_e2_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 radius search: every neighbor with cosine >= 0.2 of the five
    query vectors — the threshold-bounded companion to top-k (near-dup
    mining wants ALL matches above a floor, not a fixed k). No rank
    window anywhere: one broadcast join + filter, a single narrow pass
    over the corpus at any scale."""
    from ..operators.similarity import range_neighbors

    emb = _t(spark, sf_dir, "embeddings")
    return range_neighbors(
        emb, emb.where(F.col("vec_id") < 5), threshold=0.2
    )

ORACLE_E2_RANGE_SEARCH = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
norms AS (
  SELECT vec_id, e, sqrt(list_aggregate(list_transform(e, x -> x * x), 'sum')) AS nrm
  FROM e
)
SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
       round(list_aggregate(list_transform(list_zip(a.e, b.e),
             p -> p[1] * p[2]), 'sum') / nullif(a.nrm * b.nrm, 0), 4) AS score
FROM norms a JOIN norms b ON a.vec_id < 5 AND a.vec_id <> b.vec_id
WHERE round(list_aggregate(list_transform(list_zip(a.e, b.e),
            p -> p[1] * p[2]), 'sum') / nullif(a.nrm * b.nrm, 0), 4) >= 0.2
"""

def q_e2_range_search_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cell-pruned radius search: same threshold contract as
    ``e2_range_search`` but each query scores only its own IVF cell
    (centroids = vec_id < 8) — 1/K of the corpus by layout, the
    serving shape a 100 TB radius query takes against the
    partitionBy(centroid_id) index."""
    from ..operators.similarity import range_neighbors_ivf

    emb = _t(spark, sf_dir, "embeddings")
    centroids = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    return range_neighbors_ivf(
        emb, centroids, emb.where(F.col("vec_id") < 5), threshold=0.2
    )

ORACLE_E2_RANGE_SEARCH_IVF = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
norms AS (
  SELECT vec_id, e, sqrt(list_aggregate(list_transform(e, x -> x * x), 'sum')) AS nrm
  FROM e
),
assign_scored AS (
  SELECT v.vec_id, c.vec_id AS centroid_id,
         round(list_aggregate(list_transform(list_zip(v.e, c.e),
               p -> p[1] * p[2]), 'sum') / nullif(v.nrm * c.nrm, 0), 6) AS score
  FROM norms v JOIN norms c ON c.vec_id < 8
),
assign AS (
  SELECT vec_id, centroid_id FROM (
    SELECT vec_id, centroid_id,
           row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, centroid_id) AS rn
    FROM assign_scored
  ) WHERE rn = 1
)
SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
       round(list_aggregate(list_transform(list_zip(q.e, v.e),
             p -> p[1] * p[2]), 'sum') / nullif(q.nrm * v.nrm, 0), 4) AS score
FROM norms q
JOIN assign qa ON qa.vec_id = q.vec_id
JOIN assign va ON va.centroid_id = qa.centroid_id
JOIN norms v ON v.vec_id = va.vec_id AND v.vec_id <> q.vec_id
WHERE q.vec_id < 5
  AND round(list_aggregate(list_transform(list_zip(q.e, v.e),
        p -> p[1] * p[2]), 'sum') / nullif(q.nrm * v.nrm, 0), 4) >= 0.2
"""

def q_e2_ivf_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 index-health audit: rows per IVF cell (INCLUDING empty
    cells) and each cell's load factor vs the uniform ideal — the
    number an index operator reads before re-fitting centroids or
    splitting hot cells. Completes the lifecycle surface:
    fit -> assign -> probe -> append/compact/swap -> BALANCE."""
    from ..operators.similarity import ivf_balance

    emb = _t(spark, sf_dir, "embeddings")
    centroids = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    return ivf_balance(emb, centroids)

ORACLE_E2_IVF_BALANCE = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
norms AS (
  SELECT vec_id, e,
         sqrt(list_aggregate(list_transform(e, x -> x * x), 'sum')) AS nrm
  FROM e
),
assign_scored AS (
  SELECT v.vec_id, c.vec_id AS centroid_id,
         round(list_aggregate(list_transform(list_zip(v.e, c.e),
               p -> p[1] * p[2]), 'sum') / (v.nrm * c.nrm), 6) AS score
  FROM norms v JOIN norms c ON c.vec_id < 8
),
assign AS (
  SELECT vec_id, centroid_id FROM (
    SELECT vec_id, centroid_id,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY score DESC, centroid_id) AS rn
    FROM assign_scored
  ) WHERE rn = 1
),
counts AS (
  SELECT c.vec_id AS centroid_id,
         count(a.vec_id) AS n_vectors
  FROM (SELECT vec_id FROM embeddings WHERE vec_id < 8) c
  LEFT JOIN assign a ON a.centroid_id = c.vec_id
  GROUP BY 1
)
SELECT centroid_id, n_vectors,
       round(n_vectors * (SELECT count(*) FROM counts)
             / (SELECT sum(n_vectors) FROM counts), 4) AS load_factor
FROM counts
"""

def q_e2_ivf_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 index maintenance ACTION paired with the e2_ivf_balance
    audit: cells whose load factor exceeds 1.05 split into two children
    seeded at their extreme member ids (one Lloyd step scoped to hot
    cells only; cold cells pass through untouched). Output posexplodes
    centroids to scalar rows, kmeans_fit-style."""
    from ..operators.similarity import ivf_rebalance

    emb = _t(spark, sf_dir, "embeddings")
    centroids = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    out = ivf_rebalance(emb, centroids, max_load=1.05)
    return out.select(
        "centroid_id",
        "parent_id",
        "n_members",
        F.posexplode("embedding").alias("dim", "value"),
    ).select(
        "centroid_id",
        "parent_id",
        "n_members",
        F.col("dim").cast("long").alias("dim"),
        F.round("value", 6).alias("value"),
    )

ORACLE_E2_IVF_REBALANCE = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
norms AS (
  SELECT vec_id, e,
         sqrt(list_aggregate(list_transform(e, x -> x * x), 'sum')) AS nrm
  FROM e
),
assign_scored AS (
  SELECT v.vec_id, c.vec_id AS centroid_id,
         round(list_aggregate(list_transform(list_zip(v.e, c.e),
               p -> p[1] * p[2]), 'sum') / (v.nrm * c.nrm), 6) AS score
  FROM norms v JOIN norms c ON c.vec_id < 8
),
assign AS (
  SELECT vec_id, centroid_id FROM (
    SELECT vec_id, centroid_id,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY score DESC, centroid_id) AS rn
    FROM assign_scored
  ) WHERE rn = 1
),
cells AS (
  SELECT c.vec_id AS cid, count(a.vec_id) AS n
  FROM (SELECT vec_id FROM embeddings WHERE vec_id < 8) c
  LEFT JOIN assign a ON a.centroid_id = c.vec_id
  GROUP BY 1
),
tot AS (SELECT sum(n) AS tot, count(*) AS k, max(cid) AS maxid FROM cells),
hot AS (SELECT cid FROM cells, tot WHERE n * k / tot > 1.05),
cold AS (
  SELECT c.cid AS centroid_id, c.cid AS parent_id,
         c.n AS n_members, e.e AS emb
  FROM cells c JOIN e ON e.vec_id = c.cid
  WHERE c.cid NOT IN (SELECT cid FROM hot)
),
members AS (
  SELECT a.vec_id, a.centroid_id AS cid, nv.e, nv.nrm
  FROM assign a
  JOIN norms nv ON nv.vec_id = a.vec_id
  JOIN hot h ON h.cid = a.centroid_id
),
seeds AS (SELECT cid, min(vec_id) AS s0, max(vec_id) AS s1 FROM members GROUP BY 1),
seedv AS (
  SELECT s.cid, n0.e AS v0, n0.nrm AS nrm0, n1.e AS v1, n1.nrm AS nrm1
  FROM seeds s
  JOIN norms n0 ON n0.vec_id = s.s0
  JOIN norms n1 ON n1.vec_id = s.s1
),
childed AS (
  SELECT m.cid, m.vec_id, m.e,
         CASE WHEN round(list_aggregate(list_transform(list_zip(m.e, sv.v1),
                    p -> p[1] * p[2]), 'sum') / nullif(m.nrm * sv.nrm1, 0), 6)
                > round(list_aggregate(list_transform(list_zip(m.e, sv.v0),
                    p -> p[1] * p[2]), 'sum') / nullif(m.nrm * sv.nrm0, 0), 6)
              THEN 1 ELSE 0 END AS child
  FROM members m JOIN seedv sv ON sv.cid = m.cid
),
dims AS (
  SELECT cid, child, unnest(range(len(e))) AS dim, unnest(e) AS val
  FROM childed
),
childc AS (
  SELECT cid, child, dim, avg(val) AS meanv, count(*) AS nm
  FROM dims GROUP BY 1, 2, 3
)
SELECT CASE WHEN child = 0 THEN cid
            ELSE cid + (SELECT maxid FROM tot) + 1 END AS centroid_id,
       cid AS parent_id,
       nm AS n_members,
       CAST(dim AS BIGINT) AS dim,
       round(meanv, 6) AS value
FROM childc
UNION ALL
SELECT centroid_id, parent_id, n_members,
       CAST(u.dim AS BIGINT) AS dim, round(u.val, 6) AS value
FROM (
  SELECT centroid_id, parent_id, n_members,
         unnest(range(len(emb))) AS dim, unnest(emb) AS val
  FROM cold
) u
"""

def _query_budget(emb: DataFrame, salt: str, n: int = 100) -> DataFrame:
    """Fixed ABSOLUTE query budget for the k-NN audit family: the
    ``n`` vectors smallest in deterministic md5 order. Audit precision
    is set by the sample SIZE, not the corpus fraction — a %%-of-corpus
    query side makes every audit O(N^2/const) (measured: 101x wall at
    10x input before this fix, scripts/bench_scale.py r7); a fixed
    budget keeps them O(n x N). TakeOrdered, never a full sort."""
    return emb.orderBy(
        F.expr(f"md5(concat('{salt}:', cast(vec_id as string)))"),
        "vec_id",
    ).limit(n)


def q_e2_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 weak supervision: k-NN majority-vote label prediction for a
    fixed 100-query budget (md5-ordered, salt 'knn') from the 10 nearest
    labeled neighbors — built on the salted exact top-k, so the corpus
    never shuffles to score; the vote aggregate and argmax window are
    bounded at |labels| rows per query."""
    from ..operators.similarity import knn_label_vote

    emb = _t(spark, sf_dir, "embeddings")
    return knn_label_vote(
        emb, _query_budget(emb, "knn"), k=10, use_blas=True
    ).select(
        "query_id",
        F.col("predicted_label").cast("long").alias("predicted_label"),
        "votes",
    )

ORACLE_E2_KNN_CLASSIFY = """
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings),
qknn AS (
  SELECT vec_id FROM e
  ORDER BY md5('knn:' || CAST(vec_id AS VARCHAR)), vec_id LIMIT 100
),
norms AS (
  SELECT vec_id, label, e,
         sqrt(list_aggregate(list_transform(e, x -> x * x), 'sum')) AS nrm
  FROM e
),
scored AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, b.label AS nl,
         round(list_aggregate(list_transform(list_zip(a.e, b.e),
               p -> p[1] * p[2]), 'sum') / nullif(a.nrm * b.nrm, 0), 4) AS score
  FROM norms a JOIN qknn ON qknn.vec_id = a.vec_id
  JOIN norms b ON a.vec_id <> b.vec_id
),
ranked AS (
  SELECT query_id, nl,
         row_number() OVER (PARTITION BY query_id
              ORDER BY score DESC, neighbor_id) AS rank
  FROM scored
),
votes AS (
  SELECT query_id, nl, count(*) AS votes
  FROM ranked WHERE rank <= 10 GROUP BY 1, 2
)
SELECT query_id, CAST(nl AS BIGINT) AS predicted_label, votes
FROM (
  SELECT query_id, nl, votes,
         row_number() OVER (PARTITION BY query_id
              ORDER BY votes DESC, nl) AS vr
  FROM votes
) WHERE vr = 1
"""

def q_e2_label_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 representation audit: per-label purity of the 10-NN
    neighborhoods of a fixed 100-query budget (md5-ordered, salt 'purity') —
    integer match counts with one final division, engine-exact."""
    from ..operators.similarity import neighbor_label_purity

    emb = _t(spark, sf_dir, "embeddings")
    return neighbor_label_purity(
        emb, _query_budget(emb, "purity"), k=10, use_blas=True
    ).select(F.col("label").cast("long").alias("label"), "n_queries", "n_neighbors", "purity")

ORACLE_E2_LABEL_PURITY = """
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings),
qpurity AS (
  SELECT vec_id FROM e
  ORDER BY md5('purity:' || CAST(vec_id AS VARCHAR)), vec_id LIMIT 100
),
norms AS (
  SELECT vec_id, label, e,
         sqrt(list_aggregate(list_transform(e, x -> x * x), 'sum')) AS nrm
  FROM e
),
scored AS (
  SELECT a.vec_id AS query_id, a.label AS ql, b.label AS nl, b.vec_id AS neighbor_id,
         round(list_aggregate(list_transform(list_zip(a.e, b.e),
               p -> p[1] * p[2]), 'sum') / nullif(a.nrm * b.nrm, 0), 4) AS score
  FROM norms a JOIN qpurity ON qpurity.vec_id = a.vec_id
  JOIN norms b ON a.vec_id <> b.vec_id
),
topk AS (
  SELECT query_id, ql, nl FROM (
    SELECT query_id, ql, nl,
           row_number() OVER (PARTITION BY query_id
                ORDER BY score DESC, neighbor_id) AS rank
    FROM scored
  ) WHERE rank <= 10
)
SELECT CAST(ql AS BIGINT) AS label,
       count(DISTINCT query_id) AS n_queries,
       count(*) AS n_neighbors,
       round(sum(CASE WHEN nl = ql THEN 1 ELSE 0 END)::DOUBLE
             / count(*), 6) AS purity
FROM topk GROUP BY ql
"""

def q_e2_nprobe_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 index-tuning curve: micro-averaged recall@10 of IVF search at
    nprobe in (1, 2, 4) against ONE shared brute-force truth — the
    whole knob-sweep a deployment review reads before fixing nprobe,
    as one frame. The truth set is checkpointed once and reused by all
    three evaluations (queries x k rows — trivially small); each IVF
    run is the ordinary cell-pruned probe at nprobe/K of brute cost.
    Recall is integer-summed (sum hits / sum truth) — no FP-order
    hazard from averaging per-query doubles."""
    emb = _t(spark, sf_dir, "embeddings")
    centroids = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    queries = emb.where(F.col("vec_id") < 5)
    exact = (
        similarity.brute_force_topk(emb, queries, k=10)
        .select("query_id", "neighbor_id")
        .localCheckpoint(eager=True)
    )
    # r11: the three arms share one centroid set, so the K x corpus
    # assignment runs ONCE (checkpointed) instead of once per arm.
    assign = similarity.ivf_assign(emb, centroids).localCheckpoint(
        eager=True
    )
    # r11 continuation: the arms' candidate sets are nested (probe_rank
    # cutoffs of one probe set), so ONE scored pass + ONE salted top-k
    # keyed (nprobe, query_id) replaces three ivf_topk chains
    # (ivf_topk_multi, parity-proven bit-identical per arm).
    multi = similarity.ivf_topk_multi(
        emb, centroids, queries, (1, 2, 4), k=10, assign=assign
    )
    hits = (
        multi.join(exact, ["query_id", "neighbor_id"])
        .groupBy("nprobe")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
    )
    n_true = exact.agg(F.count(F.lit(1)).cast("long").alias("n_true"))
    arms = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(x).cast("long") for x in (1, 2, 4)])
        ).alias("nprobe")
    )
    return (
        arms.join(hits, "nprobe", "left")
        .crossJoin(F.broadcast(n_true))
        .select(
            "nprobe",
            "n_true",
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias(
                "n_hits"
            ),
            F.round(
                F.coalesce(F.col("n_hits"), F.lit(0))
                / F.expr("nullif(n_true, 0)"),
                6,
            ).alias("recall"),
        )
    )

def _oracle_nprobe_recall_curve() -> str:
    ivf_ctes = []
    selects = []
    for np_ in (1, 2, 4):
        ivf_ctes.append(f"""qa{np_} AS (
  SELECT vec_id, centroid_id FROM (
    SELECT vec_id, centroid_id,
           row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, centroid_id) AS rn
    FROM assign_scored
  ) WHERE rn <= {np_}
),
ivf{np_} AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY q.vec_id
             ORDER BY round(list_aggregate(list_transform(list_zip(q.e, v.e),
                   p -> p[1] * p[2]), 'sum') / nullif(q.nrm * v.nrm, 0), 4) DESC,
             v.vec_id) AS rank
    FROM norms q
    JOIN qa{np_} qa ON qa.vec_id = q.vec_id
    JOIN assign va ON va.centroid_id = qa.centroid_id
    JOIN norms v ON v.vec_id = va.vec_id AND v.vec_id <> q.vec_id
    WHERE q.vec_id < 5
  ) WHERE rank <= 10
)""")
        selects.append(f"""SELECT {np_}::BIGINT AS nprobe,
       (SELECT count(*) FROM bf) AS n_true,
       (SELECT count(*) FROM ivf{np_} i JOIN bf USING (query_id, neighbor_id)) AS n_hits,
       round((SELECT count(*) FROM ivf{np_} i JOIN bf USING (query_id, neighbor_id))::DOUBLE
             / nullif((SELECT count(*) FROM bf), 0), 6) AS recall""")
    ctes = ",\n".join(ivf_ctes)
    body = "\nUNION ALL\n".join(selects)
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
norms AS (
  SELECT vec_id, e, sqrt(list_aggregate(list_transform(e, x -> x * x), 'sum')) AS nrm
  FROM e
),
bf AS (
  SELECT query_id, neighbor_id FROM (
    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY a.vec_id
             ORDER BY round(list_aggregate(list_transform(list_zip(a.e, b.e),
                   p -> p[1] * p[2]), 'sum') / nullif(a.nrm * b.nrm, 0), 4) DESC,
             b.vec_id) AS rank
    FROM norms a JOIN norms b ON a.vec_id < 5 AND a.vec_id <> b.vec_id
  ) WHERE rank <= 10
),
assign_scored AS (
  SELECT v.vec_id, c.vec_id AS centroid_id,
         round(list_aggregate(list_transform(list_zip(v.e, c.e),
               p -> p[1] * p[2]), 'sum') / nullif(v.nrm * c.nrm, 0), 6) AS score
  FROM norms v JOIN norms c ON c.vec_id < 8
),
assign AS (
  SELECT vec_id, centroid_id FROM (
    SELECT vec_id, centroid_id,
           row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, centroid_id) AS rn
    FROM assign_scored
  ) WHERE rn = 1
),
{ctes}
{body}
"""

def q_e2_dim_truncation_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 embedding-compression audit: recall@10 of cosine search over
    PREFIX-truncated embeddings (first 8 / 16 / 32 dims) against the
    full-dimension truth — the Matryoshka-style curve (Kusupati et al.
    2022, public) that decides how many dims a serving index keeps.

    Plan (r11 optimization): ONE corpus pass scores all four arms (the
    three truncations and the full-dim truth) — per pair the same
    ``round(dot / nullif(norm_a * norm_b, 0), 4)`` SQL expression per
    arm as the previous four separate :func:`brute_force_topk` passes,
    so the values are bit-identical — then the four scores ``stack``
    into (dims, score) rows and ONE salted top-k keyed on
    (dims, query_id) ranks every arm in a single bounded shuffle. The
    ranked frame is 4 x |Q| x k rows, checkpointed once; truth and the
    three recall joins read it. Previously: 4 corpus scans + 4
    independent top-k shuffles."""
    from functools import reduce

    from ..functions.partitioning import spread_to_parallelism
    from ..operators.similarity import dot_expr, norm_expr
    from ..operators.skew import salted_topk_per_key

    emb = _t(spark, sf_dir, "embeddings")
    dims = (8, 16, 32)

    def _arm_cols(prefix: str) -> list:
        cols = []
        for d in (*dims, None):
            sl = "embedding" if d is None else f"slice(embedding, 1, {d})"
            tag = "full" if d is None else str(d)
            cols.append(F.expr(sl).alias(f"__{prefix}v_{tag}"))
            cols.append(F.expr(norm_expr(sl)).alias(f"__{prefix}n_{tag}"))
        return cols

    q = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), *_arm_cols("q")
    )
    corpus = spread_to_parallelism(emb).select(
        F.col("vec_id").alias("neighbor_id"), *_arm_cols("c")
    )
    score_cols = [
        F.round(
            F.expr(
                f"({dot_expr(f'__qv_{tag}', f'__cv_{tag}')})"
                f" / nullif(__qn_{tag} * __cn_{tag}, cast(0 as double))"
            ),
            4,
        ).alias(f"__s_{tag}")
        for tag in (*map(str, dims), "full")
    ]
    stack_args = ", ".join(
        f"cast({64 if tag == 'full' else tag} as bigint), __s_{tag}"
        for tag in (*map(str, dims), "full")
    )
    scored = (
        corpus.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", *score_cols)
        .selectExpr(
            "query_id",
            "neighbor_id",
            f"stack(4, {stack_args}) as (dims, score)",
        )
    )
    ranked = salted_topk_per_key(
        scored,
        key_cols=["dims", "query_id"],
        order_by=[F.desc("score"), F.asc("neighbor_id")],
        k=10,
        rank_alias="rank",
        salt_on="neighbor_id",
    ).localCheckpoint(eager=True)
    exact = ranked.where(F.col("dims") == 64).select(
        "query_id", "neighbor_id"
    )
    frames = []
    for d in dims:
        ann = ranked.where(F.col("dims") == d)
        frames.append(
            similarity.ann_recall(ann, exact)
            .agg(
                F.sum("n_true").cast("long").alias("n_true"),
                F.sum("n_hits").cast("long").alias("n_hits"),
            )
            .select(
                F.lit(d).cast("long").alias("dims"),
                "n_true",
                "n_hits",
                F.round(
                    F.col("n_hits") / F.expr("nullif(n_true, 0)"), 6
                ).alias("recall"),
            )
        )
    return reduce(lambda a, b: a.unionByName(b), frames)

def _oracle_dim_truncation_curve() -> str:
    selects = []
    ctes = []
    for d in (8, 16, 32):
        ctes.append(f"""t{d} AS (
  SELECT query_id, neighbor_id FROM (
    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY a.vec_id
             ORDER BY round(list_aggregate(list_transform(
                   list_zip(a.e[1:{d}], b.e[1:{d}]),
                   p -> p[1] * p[2]), 'sum')
               / nullif(sqrt(list_aggregate(list_transform(a.e[1:{d}], x -> x * x), 'sum'))
                      * sqrt(list_aggregate(list_transform(b.e[1:{d}], x -> x * x), 'sum')), 0), 4) DESC,
             b.vec_id) AS rank
    FROM e a JOIN e b ON a.vec_id < 5 AND a.vec_id <> b.vec_id
  ) WHERE rank <= 10
)""")
        selects.append(f"""SELECT {d}::BIGINT AS dims,
       (SELECT count(*) FROM bf) AS n_true,
       (SELECT count(*) FROM t{d} JOIN bf USING (query_id, neighbor_id)) AS n_hits,
       round((SELECT count(*) FROM t{d} JOIN bf USING (query_id, neighbor_id))::DOUBLE
             / nullif((SELECT count(*) FROM bf), 0), 6) AS recall""")
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
bf AS (
  SELECT query_id, neighbor_id FROM (
    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY a.vec_id
             ORDER BY round(list_aggregate(list_transform(list_zip(a.e, b.e),
                   p -> p[1] * p[2]), 'sum')
               / nullif(sqrt(list_aggregate(list_transform(a.e, x -> x * x), 'sum'))
                      * sqrt(list_aggregate(list_transform(b.e, x -> x * x), 'sum')), 0), 4) DESC,
             b.vec_id) AS rank
    FROM e a JOIN e b ON a.vec_id < 5 AND a.vec_id <> b.vec_id
  ) WHERE rank <= 10
),
{", ".join(ctes)}
{" UNION ALL ".join(selects)}
"""

def q_e2_sq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 quantization-quality audit: micro-averaged recall@10 of
    asymmetric search (full-precision queries against the
    int8-quantized-then-reconstructed corpus — the FAISS SQ8 serving
    setup) vs exact full-precision ground truth. The number that
    decides whether the 4x footprint cut ships. One fitted-range
    broadcast, two salted brute searches, integer-summed recall."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    fitted = similarity.scalar_quantize_fit(emb)
    # r12 (verdict item 5): both searches share every input, so the
    # dual-arm operator scores raw + reconstructed in ONE corpus pass
    # and ranks both arms in ONE salted top-k; the tiny (<= 100-row)
    # top-k frame is eagerly checkpointed because ann_recall consumes
    # it twice (same in-call discipline as the IVF curve queries).
    topk = similarity.sq_dual_topk(
        emb, queries, fitted, k=10
    ).localCheckpoint(eager=True)
    ann = topk.where(F.col("arm") == 1)
    exact = topk.where(F.col("arm") == 0)
    return (
        similarity.ann_recall(ann, exact)
        .agg(
            F.sum("n_true").cast("long").alias("n_true"),
            F.sum("n_hits").cast("long").alias("n_hits"),
        )
        .select(
            "n_true",
            "n_hits",
            F.round(
                F.col("n_hits") / F.expr("nullif(n_true, 0)"), 6
            ).alias("recall"),
        )
    )

ORACLE_E2_SQ_RECALL = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
stats AS (
  SELECT i, min(x) AS mn, max(x) AS mx FROM (
    SELECT unnest(e) AS x, generate_subscripts(e, 1) AS i FROM e
  ) GROUP BY i
),
fitted AS (SELECT list(mn ORDER BY i) AS mns, list(mx ORDER BY i) AS mxs FROM stats),
recon AS (
  SELECT vec_id, list_transform(generate_series(1, len(e)), i ->
    mns[i] + (CAST(CASE WHEN mxs[i] = mns[i] THEN 0
      ELSE CAST(floor((e[i] - mns[i]) / (mxs[i] - mns[i]) * 254.0 + 0.5) AS INT) - 127
      END AS DOUBLE) + 127.0) / 254.0 * (mxs[i] - mns[i])) AS r
  FROM e CROSS JOIN fitted
),
qn AS (
  SELECT vec_id, e, sqrt(list_aggregate(list_transform(e, x -> x * x), 'sum')) AS nrm
  FROM e
),
cn AS (
  SELECT vec_id, r, sqrt(list_aggregate(list_transform(r, x -> x * x), 'sum')) AS nrm
  FROM recon
),
sq AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY q.vec_id
             ORDER BY round(list_aggregate(list_transform(list_zip(q.e, c.r),
                   p -> p[1] * p[2]), 'sum') / nullif(q.nrm * c.nrm, 0), 4) DESC,
               c.vec_id) AS rank
    FROM qn q JOIN cn c ON q.vec_id < 5 AND q.vec_id <> c.vec_id
  ) WHERE rank <= 10
),
bf AS (
  SELECT query_id, neighbor_id FROM (
    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY a.vec_id
             ORDER BY round(list_aggregate(list_transform(list_zip(a.e, b.e),
                   p -> p[1] * p[2]), 'sum') / nullif(a.nrm * b.nrm, 0), 4) DESC,
               b.vec_id) AS rank
    FROM qn a JOIN qn b ON a.vec_id < 5 AND a.vec_id <> b.vec_id
  ) WHERE rank <= 10
)
SELECT (SELECT count(*) FROM bf)::BIGINT AS n_true,
       (SELECT count(*) FROM sq JOIN bf USING (query_id, neighbor_id))::BIGINT AS n_hits,
       round((SELECT count(*) FROM sq JOIN bf USING (query_id, neighbor_id))::DOUBLE
             / nullif((SELECT count(*) FROM bf), 0), 6) AS recall
"""

def q_e2_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 metadata-filtered vector search: top-10 SAME-LABEL cosine
    neighbors for a fixed 100-query budget (md5-ordered, salt 'filtered') —
    the pre-filtering strategy (the label predicate prunes candidates
    in the broadcast-join stage, BEFORE any dot product), ranked by
    the same salted two-phase top-k as the unfiltered baseline
    (operators/similarity.py filtered_topk)."""
    from ..operators.similarity import filtered_topk

    emb = _t(spark, sf_dir, "embeddings")
    return filtered_topk(
        emb, _query_budget(emb, "filtered"), "label", k=10
    ).select("query_id", "neighbor_id", "score", "rank")

ORACLE_E2_FILTERED_TOPK = """
WITH e AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings
),
qfiltered AS (
  SELECT vec_id FROM e
  ORDER BY md5('filtered:' || CAST(vec_id AS VARCHAR)), vec_id LIMIT 100
),
n AS (
  SELECT vec_id, label, e,
         sqrt(list_aggregate(list_transform(e, x -> x * x), 'sum')) AS nrm
  FROM e
)
SELECT query_id, neighbor_id, score, rank FROM (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         round(list_aggregate(list_transform(list_zip(a.e, b.e),
               p -> p[1] * p[2]), 'sum') / nullif(a.nrm * b.nrm, 0), 4) AS score,
         row_number() OVER (PARTITION BY a.vec_id
           ORDER BY round(list_aggregate(list_transform(list_zip(a.e, b.e),
                 p -> p[1] * p[2]), 'sum') / nullif(a.nrm * b.nrm, 0), 4) DESC,
             b.vec_id) AS rank
  FROM n a JOIN qfiltered ON qfiltered.vec_id = a.vec_id
  JOIN n b ON a.label = b.label AND a.vec_id <> b.vec_id
) WHERE rank <= 10
"""

def q_e2_ood_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 embedding-outlier audit: the 10 vectors FARTHEST from every
    centroid (ood = 1 - best cosine over the 8 IVF centroids) — the
    out-of-distribution screen a curation run applies before trusting
    embeddings for semantic dedup/search (far-from-all-centroids rows
    are garbage inputs or domain shift). Plan: 8 centroids broadcast
    into the corpus scan, per-vector best score is a partial-agg max
    (map-side combined), top-10 is a bounded global TakeOrdered —
    nothing unbounded at any scale."""
    emb = _t(spark, sf_dir, "embeddings")
    centroids = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("__cid"), F.col("embedding").alias("__cv")
    )
    from ..operators.similarity import dot_expr, norm_expr

    v = emb.select(
        "vec_id",
        F.col("embedding").alias("__v"),
        F.expr(norm_expr("embedding")).alias("__vn"),
    )
    c = centroids.withColumn("__cn", F.expr(norm_expr("__cv")))
    scored = v.crossJoin(F.broadcast(c)).select(
        "vec_id",
        F.round(
            F.expr(f"({dot_expr('__v', '__cv')}) / nullif(__vn * __cn, cast(0 as double))"),
            6,
        ).alias("__s"),
    )
    return (
        scored.groupBy("vec_id")
        .agg(F.max("__s").alias("best_cosine"))
        .select(
            "vec_id",
            "best_cosine",
            F.round(F.lit(1.0) - F.col("best_cosine"), 6).alias("ood_score"),
        )
        .orderBy(F.desc("ood_score"), F.asc("vec_id"))
        .limit(10)
    )

ORACLE_E2_OOD_OUTLIERS = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
norms AS (
  SELECT vec_id, e, sqrt(list_aggregate(list_transform(e, x -> x * x), 'sum')) AS nrm
  FROM e
),
scored AS (
  SELECT v.vec_id,
         round(list_aggregate(list_transform(list_zip(v.e, c.e),
               p -> p[1] * p[2]), 'sum') / nullif(v.nrm * c.nrm, 0), 6) AS s
  FROM norms v JOIN norms c ON c.vec_id < 8
),
best AS (SELECT vec_id, max(s) AS best_cosine FROM scored GROUP BY vec_id)
SELECT vec_id, best_cosine, round(1.0 - best_cosine, 6) AS ood_score
FROM best
ORDER BY ood_score DESC, vec_id
LIMIT 10
"""

def q_e2_match_confidence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 match-confidence audit (Lowe's ratio test, public): for each
    query in a fixed 100-query budget (md5-ordered, salt 'lowe'), the
    best/second-best cosine and their ratio — matches whose runner-up
    is nearly as close (ratio > 0.95) are ambiguous and should not
    drive an auto-merge in semantic dedup.

    SCALE PATH (r10 verdict item 8 — this was the worst 30x scaler at
    29.2): the BLAS batch top-k
    (operators/similarity.py brute_force_topk_blas — broadcast query
    matrix, one matmul per Arrow batch, only batch-local top-2 rows
    ever shuffle) replaces the generic salted rank that shuffled +
    sorted the full |Q| x |corpus| scored frame. Measured
    54.7 s -> 1.4 s at the 30x decade (ratio 29.2 -> 2.3); score
    values, rounding, and tie-breaks are parity-documented on the
    operator, so the oracle is unchanged."""
    from ..operators.similarity import brute_force_topk_blas

    emb = _t(spark, sf_dir, "embeddings")
    top2 = brute_force_topk_blas(emb, _query_budget(emb, "lowe"), k=2)
    pivoted = top2.groupBy("query_id").agg(
        F.max(F.when(F.col("rank") == 1, F.col("score"))).alias("best"),
        F.max(F.when(F.col("rank") == 2, F.col("score"))).alias("second"),
    )
    ratio = F.round(
        F.when(F.col("best") != 0, F.col("second") / F.col("best")), 6
    )
    return pivoted.select(
        "query_id",
        "best",
        "second",
        ratio.alias("ratio"),
        (F.coalesce(ratio, F.lit(0.0)) > 0.95).alias("ambiguous"),
    )

ORACLE_E2_MATCH_CONFIDENCE = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
qlowe AS (
  SELECT vec_id FROM e
  ORDER BY md5('lowe:' || CAST(vec_id AS VARCHAR)), vec_id LIMIT 100
),
n AS (
  SELECT vec_id, e,
         sqrt(list_aggregate(list_transform(e, x -> x * x), 'sum')) AS nrm
  FROM e
),
r AS (
  SELECT a.vec_id AS query_id,
         round(list_aggregate(list_transform(list_zip(a.e, b.e),
               p -> p[1] * p[2]), 'sum') / nullif(a.nrm * b.nrm, 0), 4) AS score,
         row_number() OVER (PARTITION BY a.vec_id
           ORDER BY round(list_aggregate(list_transform(list_zip(a.e, b.e),
                 p -> p[1] * p[2]), 'sum') / nullif(a.nrm * b.nrm, 0), 4) DESC,
             b.vec_id) AS rank
  FROM n a JOIN qlowe ON qlowe.vec_id = a.vec_id
  JOIN n b ON a.vec_id <> b.vec_id
),
p AS (
  SELECT query_id,
         max(CASE WHEN rank = 1 THEN score END) AS best,
         max(CASE WHEN rank = 2 THEN score END) AS second
  FROM r WHERE rank <= 2 GROUP BY query_id
)
SELECT query_id, best, second,
       round(CASE WHEN best <> 0 THEN second / best END, 6) AS ratio,
       coalesce(round(CASE WHEN best <> 0 THEN second / best END, 6), 0.0) > 0.95
         AS ambiguous
FROM p
"""

def q_e2_cell_label_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 index-quality readout: per-IVF-cell label entropy (bits) —
    near-zero means the coarse quantizer already separates classes
    (good for filtered search), log2(|labels|) means cells are
    label-blind. Reuses the nearest-centroid assignment unchanged;
    entropy derives from exact (cell, label) integer counts in a
    K x |labels|-bounded aggregate, doubles only in the final
    -sum(p log2 p) tree."""
    emb = _t(spark, sf_dir, "embeddings")
    centroids = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    assign = similarity.ivf_assign(emb, centroids)
    cl = assign.join(emb.select("vec_id", "label"), "vec_id")
    counts = cl.groupBy("centroid_id", "label").agg(
        F.count(F.lit(1)).cast("long").alias("__n")
    )
    tot = counts.groupBy("centroid_id").agg(
        F.sum("__n").cast("long").alias("__t")
    )
    p = F.col("__n") / F.col("__t")
    return (
        counts.join(tot, "centroid_id")
        .groupBy("centroid_id")
        .agg(
            F.max("__t").cast("long").alias("n_vectors"),
            F.count(F.lit(1)).cast("long").alias("n_labels"),
            F.round(-F.sum(p * F.log2(p)), 6).alias("label_entropy_bits"),
        )
    )

def _oracle_cell_label_entropy() -> str:
    return f"""
WITH assign AS ({ORACLE_E2_IVF_ASSIGN}),
cl AS (
  SELECT a.centroid_id, e.label
  FROM assign a JOIN embeddings e ON e.vec_id = a.vec_id
),
c AS (
  SELECT centroid_id, label, count(*)::BIGINT AS n
  FROM cl GROUP BY centroid_id, label
),
t AS (SELECT centroid_id, sum(n)::BIGINT AS tt FROM c GROUP BY centroid_id)
SELECT c.centroid_id,
       max(t.tt)::BIGINT AS n_vectors,
       count(*)::BIGINT AS n_labels,
       round(-sum((n::DOUBLE / tt) * log2(n::DOUBLE / tt)), 6)
         AS label_entropy_bits
FROM c JOIN t USING (centroid_id)
GROUP BY c.centroid_id
"""

def q_e2_norm_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 embedding-norm audit: per label, exact interpolated norm
    quantiles and the count of (near-)zero-norm vectors — the
    degenerate-vector screen that runs before any cosine machinery
    (zero norms break cosine; wildly varying norms say the encoder
    was never L2-normalized). One narrow projection computes the norm
    in-scan; the rollup is a |labels|-bounded aggregate."""
    from ..operators.similarity import norm_expr

    emb = _t(spark, sf_dir, "embeddings")
    norms = emb.select(
        "label", F.round(F.expr(norm_expr("embedding")), 6).alias("__n")
    )
    return norms.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors"),
        F.round(F.expr("percentile(__n, 0.5)"), 6).alias("median_norm"),
        F.round(F.expr("percentile(__n, 0.01)"), 6).alias("p01_norm"),
        F.round(F.expr("percentile(__n, 0.99)"), 6).alias("p99_norm"),
        F.sum(F.when(F.col("__n") < 1e-6, 1).otherwise(0))
        .cast("long")
        .alias("n_zero"),
    )

ORACLE_E2_NORM_AUDIT = """
WITH n AS (
  SELECT label,
         round(sqrt(list_aggregate(list_transform(embedding::DOUBLE[],
               x -> x * x), 'sum')), 6) AS nn
  FROM embeddings
)
SELECT label, count(*)::BIGINT AS n_vectors,
       round(quantile_cont(nn, 0.5), 6) AS median_norm,
       round(quantile_cont(nn, 0.01), 6) AS p01_norm,
       round(quantile_cont(nn, 0.99), 6) AS p99_norm,
       sum(CASE WHEN nn < 1e-6 THEN 1 ELSE 0 END)::BIGINT AS n_zero
FROM n GROUP BY label
"""

def q_e2_dup_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 vector-store hygiene: the exact-duplicate embedding census —
    identical stored vectors inflate every top-k with ties and waste
    index space, so ingestion dedups them first. Grouping is on the
    RAW float array (bit-exact equality, no hashing ambiguity);
    the corpus collapses to per-vector-value counts (a partial agg
    whose key space is the distinct-vector count), then one summary
    row."""
    emb = _t(spark, sf_dir, "embeddings")
    groups = emb.groupBy("embedding").agg(
        F.count(F.lit(1)).cast("long").alias("__n")
    )
    return groups.agg(
        F.sum("__n").cast("long").alias("n_vectors"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.sum(F.when(F.col("__n") > 1, 1).otherwise(0))
        .cast("long")
        .alias("n_dup_groups"),
        F.sum(F.when(F.col("__n") > 1, F.col("__n")).otherwise(0))
        .cast("long")
        .alias("n_dup_vectors"),
        F.max("__n").cast("long").alias("max_group"),
    )

ORACLE_E2_DUP_VECTORS = """
WITH g AS (
  SELECT embedding, count(*)::BIGINT AS n FROM embeddings GROUP BY embedding
)
SELECT sum(n)::BIGINT AS n_vectors,
       count(*)::BIGINT AS n_distinct,
       sum(CASE WHEN n > 1 THEN 1 ELSE 0 END)::BIGINT AS n_dup_groups,
       sum(CASE WHEN n > 1 THEN n ELSE 0 END)::BIGINT AS n_dup_vectors,
       max(n)::BIGINT AS max_group
FROM g
"""

def q_e2_dim_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 embedding-dimension audit: per coordinate, the distribution
    summary (exact decimal mean, interpolated p05/p50/p95, zero-share)
    that catches DEAD or collapsed dimensions — a dimension whose p05
    and p95 coincide carries no information, wastes index space, and
    silently degrades every cosine; encoders produce them when a head
    is undertrained or an activation saturates. Plan: one posexplode
    projection (rows = n_vectors x dims, a narrow map-side explode),
    then a d-row aggregate — the only shuffle is keyed by dimension
    index, bounded by the embedding width. Coordinates are rounded to
    6dp in-scan so every downstream stat is engine-exact."""
    emb = _t(spark, sf_dir, "embeddings")
    coords = emb.select(
        F.posexplode("embedding").alias("__p", "__x")
    ).select(
        (F.col("__p") + 1).cast("long").alias("dim"),
        F.round(F.col("__x").cast("double"), 6).alias("__v"),
    )
    return coords.groupBy("dim").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(
            F.sum(F.col("__v").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mean_v"),
        F.round(F.expr("percentile(__v, 0.05)"), 6).alias("p05"),
        F.round(F.expr("percentile(__v, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(__v, 0.95)"), 6).alias("p95"),
        F.sum(F.when(F.abs(F.col("__v")) < 1e-6, 1).otherwise(0))
        .cast("long")
        .alias("n_zero"),
        F.round(
            F.sum(
                F.when(F.abs(F.col("__v")) < 1e-6, 1).otherwise(0)
            ).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("zero_share"),
    )

ORACLE_E2_DIM_VARIANCE = """
WITH raw AS (
  SELECT generate_subscripts(embedding, 1) AS dim,
         unnest(embedding) AS x
  FROM embeddings
),
c AS (
  SELECT CAST(dim AS BIGINT) AS dim, round(CAST(x AS DOUBLE), 6) AS v
  FROM raw
)
SELECT dim, count(*)::BIGINT AS n,
       round(CAST(sum(CAST(v AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6)
         AS mean_v,
       round(quantile_cont(v, 0.05), 6) AS p05,
       round(quantile_cont(v, 0.5), 6) AS p50,
       round(quantile_cont(v, 0.95), 6) AS p95,
       sum(CASE WHEN abs(v) < 1e-6 THEN 1 ELSE 0 END)::BIGINT AS n_zero,
       round(sum(CASE WHEN abs(v) < 1e-6 THEN 1 ELSE 0 END)::DOUBLE
             / count(*), 6) AS zero_share
FROM c GROUP BY dim
"""

def q_e2_rocchio_prf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 pseudo-relevance feedback (Rocchio): BM25 retrieves the
    lexical top-5 for the fixed query, their embedding CENTROID
    becomes the dense query, and the corpus is re-ranked by cosine to
    it — the classic PRF bridge that finds documents sharing the
    topic but not the keywords (pure BM25 can't) without any trained
    query encoder. Plan: BM25's top-5 is a bounded TakeOrdered; the
    centroid is a d-row aggregate over 5 vectors (exact decimal sums
    of 6dp-rounded coords) collected into ONE broadcast array; the
    re-rank is a single narrow projection over the corpus + a bounded
    top-10 — no pair joins anywhere."""
    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    bm = text.bm25_scores(
        docs, "text", "doc_id", query_terms=["hash", "join", "spark"]
    )
    top5 = bm.orderBy(F.desc("score"), F.asc("doc_id")).limit(5).select(
        "doc_id"
    )
    fb = emb.join(F.broadcast(top5), emb["vec_id"] == top5["doc_id"])
    cent = (
        fb.select(F.posexplode("embedding").alias("__p", "__x"))
        .groupBy("__p")
        .agg(
            F.round(
                F.sum(
                    F.round(F.col("__x").cast("double"), 6).cast(
                        "decimal(18,6)"
                    )
                ).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("__m")
        )
    )
    centroid = cent.agg(
        F.expr(
            "transform(array_sort(collect_list(struct(__p, __m))),"
            " s -> s.__m)"
        ).alias("__cv")
    )
    scored = emb.crossJoin(F.broadcast(centroid)).select(
        "vec_id",
        F.round(
            F.expr(
                "aggregate(zip_with(CAST(embedding AS ARRAY<DOUBLE>), __cv,"
                " (a, b) -> a * b), 0.0D, (acc, x) -> acc + x)"
                " / nullif(sqrt(aggregate(transform("
                "CAST(embedding AS ARRAY<DOUBLE>), a -> a * a), 0.0D,"
                " (acc, x) -> acc + x))"
                " * sqrt(aggregate(transform(__cv, b -> b * b), 0.0D,"
                " (acc, x) -> acc + x)), 0.0)"
            ),
            6,
        ).alias("score"),
    )
    return scored.orderBy(F.desc("score"), F.asc("vec_id")).limit(10)

def _oracle_rocchio_prf() -> str:
    return f"""
WITH bm AS ({ORACLE_E3_BM25}),
top5 AS (SELECT doc_id FROM bm ORDER BY score DESC, doc_id LIMIT 5),
fb AS (
  SELECT e.embedding FROM embeddings e JOIN top5 t ON e.vec_id = t.doc_id
),
cent0 AS (
  SELECT dim,
         round(CAST(sum(CAST(round(CAST(x AS DOUBLE), 6) AS DECIMAL(18,6)))
                    AS DOUBLE) / count(*), 6) AS m
  FROM (
    SELECT generate_subscripts(embedding, 1) AS dim, unnest(embedding) AS x
    FROM fb
  ) GROUP BY dim
),
cv AS (SELECT list(m ORDER BY dim) AS c FROM cent0),
scored AS (
  SELECT e.vec_id,
         round(list_aggregate(list_transform(
                 list_zip(e.embedding::DOUBLE[], cv.c),
                 p -> p[1] * p[2]), 'sum')
               / nullif(sqrt(list_aggregate(list_transform(
                   e.embedding::DOUBLE[], a -> a * a), 'sum'))
                 * sqrt(list_aggregate(list_transform(cv.c, b -> b * b),
                   'sum')), 0.0), 6) AS score
  FROM embeddings e CROSS JOIN cv
)
SELECT vec_id, score FROM scored ORDER BY score DESC, vec_id LIMIT 10
"""

def q_e2_dim_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 redundancy audit: pairwise Pearson between the 8
    highest-variance embedding dimensions — strongly correlated
    coordinates carry duplicated signal, the tell that the encoder
    needs whitening (or PCA before PQ, whose codebooks assume
    near-independent subspaces). Restricting to the top-8 by variance
    bounds the pair frame at C(8,2) x n_vectors while still covering
    the dimensions that dominate every distance. Plan: one posexplode
    feeds BOTH the d-row variance stats (exact decimal sums; the
    top-8 is a TakeOrdered broadcast) and the vec-keyed pair join;
    per-pair sufficient statistics stay exact decimals, doubles only
    in the final Pearson expression (oracle operation order)."""
    emb = _t(spark, sf_dir, "embeddings")
    coords = emb.select(
        "vec_id", F.posexplode("embedding").alias("__p", "__x")
    ).select(
        "vec_id",
        (F.col("__p") + 1).cast("long").alias("dim"),
        F.round(F.col("__x").cast("double"), 6)
        .cast("decimal(18,6)")
        .alias("__v"),
    )
    stats = coords.groupBy("dim").agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum("__v").alias("__sx"),
        F.sum(F.expr("__v * __v")).alias("__sxx"),
    )
    sel = (
        stats.withColumn(
            "__var",
            F.expr(
                "CAST(__n AS DOUBLE) * CAST(__sxx AS DOUBLE)"
                " - CAST(__sx AS DOUBLE) * CAST(__sx AS DOUBLE)"
            ),
        )
        .orderBy(F.desc("__var"), F.asc("dim"))
        .limit(8)
        .select("dim")
    )
    sub = coords.join(F.broadcast(sel), "dim")
    rhs = sub.select(
        F.col("dim").alias("dim_b"),
        F.col("vec_id").alias("__vid2"),
        F.col("__v").alias("__v2"),
    )
    pairs = sub.join(
        rhs,
        (F.col("vec_id") == F.col("__vid2")) & (F.col("dim") < F.col("dim_b")),
    )
    pstats = pairs.groupBy(
        F.col("dim").alias("dim_a"), "dim_b"
    ).agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum("__v").alias("__sx"),
        F.sum("__v2").alias("__sy"),
        F.sum(F.expr("__v * __v2")).alias("__sxy"),
        F.sum(F.expr("__v * __v")).alias("__sxx"),
        F.sum(F.expr("__v2 * __v2")).alias("__syy"),
    )
    return pstats.select(
        "dim_a",
        "dim_b",
        F.col("__n").alias("n_vectors"),
        F.round(
            F.expr(
                "(CAST(__n AS DOUBLE) * CAST(__sxy AS DOUBLE)"
                " - CAST(__sx AS DOUBLE) * CAST(__sy AS DOUBLE))"
                " / nullif(sqrt((CAST(__n AS DOUBLE) * CAST(__sxx AS DOUBLE)"
                " - CAST(__sx AS DOUBLE) * CAST(__sx AS DOUBLE))"
                " * (CAST(__n AS DOUBLE) * CAST(__syy AS DOUBLE)"
                " - CAST(__sy AS DOUBLE) * CAST(__sy AS DOUBLE))), 0.0)"
            ),
            6,
        ).alias("r"),
    )

ORACLE_E2_DIM_CORRELATION = """
WITH coords AS (
  SELECT vec_id, CAST(dim AS BIGINT) AS dim,
         CAST(round(CAST(x AS DOUBLE), 6) AS DECIMAL(18,6)) AS v
  FROM (
    SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
           unnest(embedding) AS x
    FROM embeddings
  )
),
stats AS (
  SELECT dim, count(*)::BIGINT AS n, sum(v) AS sx, sum(v * v) AS sxx
  FROM coords GROUP BY dim
),
sel AS (
  SELECT dim FROM (
    SELECT dim,
           CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS var_num
    FROM stats
  ) ORDER BY var_num DESC, dim LIMIT 8
),
sub AS (SELECT c.* FROM coords c JOIN sel USING (dim)),
pairs AS (
  SELECT a.dim AS dim_a, b.dim AS dim_b, a.v AS x, b.v AS y
  FROM sub a JOIN sub b ON a.vec_id = b.vec_id AND a.dim < b.dim
),
pstats AS (
  SELECT dim_a, dim_b, count(*)::BIGINT AS n,
         sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
         sum(x * x) AS sxx, sum(y * y) AS syy
  FROM pairs GROUP BY 1, 2
)
SELECT dim_a, dim_b, n AS n_vectors,
       round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / nullif(sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                           * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                              - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
                      0.0), 6) AS r
FROM pstats
"""

def q_e2_nlist_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 index-tuning curve, the OTHER axis: micro-averaged recall@10
    of IVF at nprobe=1 as the cell count K grows (4, 8, 16 seed
    centroids) — more cells probe less of the corpus per query
    (speed) but split true neighborhoods across cell boundaries
    (recall), and this table is where that trade is read before
    fixing K at corpus scale (the e2_nprobe_recall_curve sweeps the
    compensating knob). One shared brute-force truth, checkpointed
    once; each K is the ordinary cell-pruned probe; recall is
    integer-summed — no FP-order hazard."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    exact = (
        similarity.brute_force_topk(emb, queries, k=10)
        .select("query_id", "neighbor_id")
        .localCheckpoint(eager=True)
    )
    # r11 continuation: the three arms' centroid sets are nested
    # prefixes (vec_id < 4 c < 8 c < 16), so ONE corpus-scoring pass
    # yields every arm's assignment (ivf_assign_nested, parity-proven);
    # the bounded per-vector result is checkpointed for the three
    # probe consumers. 3 corpus scoring passes -> 1.
    full_c = emb.where(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    nested = similarity.ivf_assign_nested(
        emb, full_c, (4, 8, 16)
    ).localCheckpoint(eager=True)
    # r11 continuation: the three per-arm ivf_topk chains fuse into ONE
    # corpus⋈nested pass + ONE salted top-k keyed (nlist, query_id)
    # (ivf_topk_nested_cells, parity-proven bit-identical per arm).
    multi = similarity.ivf_topk_nested_cells(
        emb, nested, queries, (4, 8, 16), k=10
    )
    hits = (
        multi.join(exact, ["query_id", "neighbor_id"])
        .groupBy("nlist")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
    )
    n_true = exact.agg(F.count(F.lit(1)).cast("long").alias("n_true"))
    arms = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(x).cast("long") for x in (4, 8, 16)])
        ).alias("nlist")
    )
    return (
        arms.join(hits, "nlist", "left")
        .crossJoin(F.broadcast(n_true))
        .select(
            "nlist",
            "n_true",
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias(
                "n_hits"
            ),
            F.round(
                F.coalesce(F.col("n_hits"), F.lit(0))
                / F.expr("nullif(n_true, 0)"),
                6,
            ).alias("recall"),
        )
    )

def _oracle_nlist_recall_curve() -> str:
    ctes = []
    selects = []
    for k_cells in (4, 8, 16):
        ctes.append(f"""ascored{k_cells} AS (
  SELECT v.vec_id, c.vec_id AS centroid_id,
         round(list_aggregate(list_transform(list_zip(v.e, c.e),
               p -> p[1] * p[2]), 'sum') / nullif(v.nrm * c.nrm, 0), 6)
           AS score
  FROM norms v JOIN norms c ON c.vec_id < {k_cells}
),
assign{k_cells} AS (
  SELECT vec_id, centroid_id FROM (
    SELECT vec_id, centroid_id,
           row_number() OVER (PARTITION BY vec_id
             ORDER BY score DESC, centroid_id) AS rn
    FROM ascored{k_cells}
  ) WHERE rn = 1
),
ivf{k_cells} AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY q.vec_id
             ORDER BY round(list_aggregate(list_transform(
                 list_zip(qe.e, ve.e), p -> p[1] * p[2]), 'sum')
                 / nullif(qe.nrm * ve.nrm, 0), 4) DESC, v.vec_id) AS rank
    FROM assign{k_cells} q
    JOIN assign{k_cells} v ON v.centroid_id = q.centroid_id
    JOIN norms qe ON qe.vec_id = q.vec_id
    JOIN norms ve ON ve.vec_id = v.vec_id
    WHERE q.vec_id < 5 AND v.vec_id <> q.vec_id
  ) WHERE rank <= 10
)""")
        selects.append(f"""SELECT CAST({k_cells} AS BIGINT) AS nlist,
       (SELECT count(*) FROM bf)::BIGINT AS n_true,
       (SELECT count(*) FROM bf b JOIN ivf{k_cells} i
         ON b.query_id = i.query_id AND b.neighbor_id = i.neighbor_id
       )::BIGINT AS n_hits,
       round((SELECT count(*) FROM bf b JOIN ivf{k_cells} i
               ON b.query_id = i.query_id AND b.neighbor_id = i.neighbor_id)
             / nullif(CAST((SELECT count(*) FROM bf) AS DOUBLE), 0), 6)
         AS recall""")
    joined_ctes = ",\n".join(ctes)
    body = "\nUNION ALL\n".join(selects)
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
norms AS (
  SELECT vec_id, e,
         sqrt(list_aggregate(list_transform(e, x -> x * x), 'sum')) AS nrm
  FROM e
),
bf AS (
  SELECT query_id, neighbor_id FROM (
    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY a.vec_id
             ORDER BY round(list_aggregate(list_transform(list_zip(a.e, b.e),
                   p -> p[1] * p[2]), 'sum') / nullif(a.nrm * b.nrm, 0), 4)
                   DESC, b.vec_id) AS rank
    FROM norms a JOIN norms b ON a.vec_id < 5 AND a.vec_id <> b.vec_id
  ) WHERE rank <= 10
),
{joined_ctes}
{body}
"""


def q_e2_scan_cost_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 recall-vs-cost tuning frontier: the nprobe recall curve
    JOINED with what each arm actually PAYS — candidate vectors
    scanned per probe setting (sum of probed cell sizes minus the
    query's own appearance) and the fraction of brute-force work that
    represents. The nprobe/nlist curves answer "how much recall";
    this is the other coordinate a deployment review needs — recall
    0.9 at 8%% of brute cost vs 0.95 at 40%% is the whole IVF
    trade-off. Plan: the vector->cell assignment runs ONCE
    (checkpointed, reused as cell sizes AND self-cell corrections for
    every arm), the shared brute-force truth runs once; per arm the
    recall side is the ordinary cell-pruned probe and the cost side
    is a |probes|-row broadcast join against the 8-row cell-size
    table — integer sufficient statistics, two final divisions in
    oracle operation order."""
    emb = _t(spark, sf_dir, "embeddings")
    centroids = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    queries = emb.where(F.col("vec_id") < 5)
    exact = (
        similarity.brute_force_topk(emb, queries, k=10)
        .select("query_id", "neighbor_id")
        .localCheckpoint(eager=True)
    )
    assign = similarity.ivf_assign(emb, centroids).localCheckpoint(
        eager=True
    )
    sizes = assign.groupBy("centroid_id").agg(
        F.count(F.lit(1)).cast("long").alias("__sz")
    )
    totals = (
        emb.agg(F.count(F.lit(1)).cast("long").alias("__n"))
        .crossJoin(
            queries.agg(F.count(F.lit(1)).cast("long").alias("__q"))
        )
        .localCheckpoint(eager=True)
    )
    probes4 = similarity.ivf_probes(
        queries, centroids, nprobe=4
    ).localCheckpoint(eager=True)
    qcell = assign.join(
        queries.select("vec_id"), "vec_id"
    ).withColumnRenamed("centroid_id", "__own")
    arm_lits = F.array(*[F.lit(x).cast("long") for x in (1, 2, 4)])
    # cost side, all arms in one aggregate: each probe row belongs to
    # every arm with nprobe >= its probe_rank (the same nesting the
    # recall side exploits), so one explode + groupBy(nprobe) replaces
    # three separate probe aggregations.
    scanned = (
        probes4.join(F.broadcast(sizes), "centroid_id")
        .join(
            F.broadcast(qcell),
            (probes4["vec_id"] == qcell["vec_id"])
            & (F.col("centroid_id") == F.col("__own")),
            "left",
        )
        .select(
            F.explode(
                F.filter(arm_lits, lambda a: a >= F.col("probe_rank"))
            ).alias("nprobe"),
            "__sz",
            "__own",
        )
        .groupBy("nprobe")
        .agg(
            F.sum("__sz").cast("long").alias("__scanned_raw"),
            F.sum(F.when(F.col("__own").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("__self"),
        )
        .select(
            "nprobe",
            (F.col("__scanned_raw") - F.col("__self"))
            .cast("long")
            .alias("n_scanned"),
        )
    )
    # recall side (r11 continuation): ONE scored pass + ONE salted
    # top-k for all three nested arms (ivf_topk_multi), reusing the
    # checkpointed assignment AND probe set.
    multi = similarity.ivf_topk_multi(
        emb,
        centroids,
        queries,
        (1, 2, 4),
        k=10,
        assign=assign,
        probes=probes4,
    )
    hits = (
        multi.join(exact, ["query_id", "neighbor_id"])
        .groupBy("nprobe")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
    )
    n_true = exact.agg(F.count(F.lit(1)).cast("long").alias("n_true"))
    arms = spark.range(1).select(F.explode(arm_lits).alias("nprobe"))
    return (
        arms.join(hits, "nprobe", "left")
        .join(scanned, "nprobe", "left")
        .crossJoin(F.broadcast(n_true))
        .crossJoin(F.broadcast(totals))
        .select(
            "nprobe",
            "n_true",
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias(
                "n_hits"
            ),
            F.round(
                F.coalesce(F.col("n_hits"), F.lit(0))
                / F.expr("nullif(n_true, 0)"),
                6,
            ).alias("recall"),
            "n_scanned",
            F.round(
                F.col("n_scanned")
                / F.expr("nullif(CAST(__q * (__n - 1) AS DOUBLE), 0.0)"),
                6,
            ).alias("scan_fraction"),
        )
    )


def _oracle_scan_cost_frontier() -> str:
    ivf_ctes = []
    selects = []
    for np_ in (1, 2, 4):
        ivf_ctes.append(f"""qa{np_} AS (
  SELECT vec_id, centroid_id FROM (
    SELECT vec_id, centroid_id,
           row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, centroid_id) AS rn
    FROM assign_scored WHERE vec_id < 5
  ) WHERE rn <= {np_}
),
ivf{np_} AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY q.vec_id
             ORDER BY round(list_aggregate(list_transform(list_zip(q.e, v.e),
                   p -> p[1] * p[2]), 'sum') / nullif(q.nrm * v.nrm, 0), 4) DESC,
             v.vec_id) AS rank
    FROM norms q
    JOIN qa{np_} qa ON qa.vec_id = q.vec_id
    JOIN assign va ON va.centroid_id = qa.centroid_id
    JOIN norms v ON v.vec_id = va.vec_id AND v.vec_id <> q.vec_id
    WHERE q.vec_id < 5
  ) WHERE rank <= 10
),
scan{np_} AS (
  SELECT sum(cs.sz)
         - sum(CASE WHEN a.centroid_id IS NOT NULL THEN 1 ELSE 0 END)
           AS n_scanned
  FROM qa{np_} qa
  JOIN cell_sizes cs ON cs.centroid_id = qa.centroid_id
  LEFT JOIN assign a
    ON a.vec_id = qa.vec_id AND a.centroid_id = qa.centroid_id
)""")
        selects.append(f"""SELECT {np_}::BIGINT AS nprobe,
       (SELECT count(*) FROM bf) AS n_true,
       (SELECT count(*) FROM ivf{np_} i JOIN bf USING (query_id, neighbor_id)) AS n_hits,
       round((SELECT count(*) FROM ivf{np_} i JOIN bf USING (query_id, neighbor_id))::DOUBLE
             / nullif((SELECT count(*) FROM bf), 0), 6) AS recall,
       (SELECT n_scanned FROM scan{np_})::BIGINT AS n_scanned,
       round((SELECT n_scanned FROM scan{np_})
             / nullif(CAST((SELECT count(*) FROM e WHERE vec_id < 5)
                      * ((SELECT count(*) FROM e) - 1) AS DOUBLE), 0.0),
             6) AS scan_fraction""")
    ctes = ",\n".join(ivf_ctes)
    body = "\nUNION ALL\n".join(selects)
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
norms AS (
  SELECT vec_id, e, sqrt(list_aggregate(list_transform(e, x -> x * x), 'sum')) AS nrm
  FROM e
),
bf AS (
  SELECT query_id, neighbor_id FROM (
    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY a.vec_id
             ORDER BY round(list_aggregate(list_transform(list_zip(a.e, b.e),
                   p -> p[1] * p[2]), 'sum') / nullif(a.nrm * b.nrm, 0), 4) DESC,
             b.vec_id) AS rank
    FROM norms a JOIN norms b ON a.vec_id < 5 AND a.vec_id <> b.vec_id
  ) WHERE rank <= 10
),
assign_scored AS (
  SELECT v.vec_id, c.vec_id AS centroid_id,
         round(list_aggregate(list_transform(list_zip(v.e, c.e),
               p -> p[1] * p[2]), 'sum') / nullif(v.nrm * c.nrm, 0), 6) AS score
  FROM norms v JOIN norms c ON c.vec_id < 8
),
assign AS (
  SELECT vec_id, centroid_id FROM (
    SELECT vec_id, centroid_id,
           row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, centroid_id) AS rn
    FROM assign_scored
  ) WHERE rn = 1
),
cell_sizes AS (
  SELECT centroid_id, count(*)::BIGINT AS sz FROM assign GROUP BY centroid_id
),
{ctes}
{body}
"""
