"""E1 dedup & graph queries (exact/minhash/LSH/simhash/containment/graph audits) + their oracles.

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
    _oracle_dup_clusters,
    _oracle_lsh_pairs,
    _oracle_lsh_verified,
    _oracle_minhash_sig,
    _t,
)


def q_e1_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on a boilerplate key (first 40 chars): survivors."""
    docs = _t(spark, sf_dir, "documents").withColumn(
        "__key", F.expr("substring(text, 1, 40)")
    )
    return dedup.exact_dedup(docs, "__key", "doc_id").select("doc_id")

ORACLE_E1_EXACT = """
SELECT doc_id FROM (
  SELECT doc_id, row_number() OVER (PARTITION BY substr(text, 1, 40) ORDER BY doc_id) AS rn
  FROM documents
) WHERE rn = 1
"""

def q_e1_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures (8 md5-based hashes over 5-gram shingles)."""
    return dedup.minhash_signatures(_t(spark, sf_dir, "documents"), "text", "doc_id")

def q_e1_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidate pairs (4 bands of 2) with estimated
    Jaccard >= 0.25."""
    sigs = dedup.minhash_signatures(_t(spark, sf_dir, "documents"), "text", "doc_id")
    return dedup.lsh_candidate_pairs(sigs, "doc_id")

def q_e1_neardup_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end fuzzy dedup: MinHash -> LSH pairs (est >= 0.5) ->
    drop the larger-id member of every pair (greedy keep-first).

    The anti-join runs on doc_id only — at scale the duplicate-id side
    is a small fraction of the corpus and broadcastable."""
    docs = _t(spark, sf_dir, "documents")
    sigs = dedup.minhash_signatures(docs, "text", "doc_id")
    pairs = dedup.lsh_candidate_pairs(sigs, "doc_id", min_est_jaccard=0.5)
    dupes = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    return docs.join(dupes, "doc_id", "left_anti").select("doc_id")

def _oracle_neardup_filter() -> str:
    return f"""
WITH pairs AS ({_oracle_lsh_pairs(min_est=0.5)})
SELECT doc_id FROM documents
WHERE doc_id NOT IN (SELECT DISTINCT id_b FROM pairs)
"""

def q_e1_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 5-gram Jaccard pairs within `source` blocks, j >= 0.2.

    Uses the BLAS-matmul verify path (one matrix product per block)
    rather than the per-pair array_intersect formulation — identical
    output, ~6x faster at sf0.1 (see dedup.blocked_jaccard_pairs)."""
    return dedup.blocked_jaccard_pairs(
        _t(spark, sf_dir, "documents"),
        "text",
        "doc_id",
        block_col="source",
        threshold=0.2,
    ).select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))

def _oracle_jaccard_pairs(pred: str | None = None, with_score: bool = True) -> str:
    """ONE recipe for the exact blocked 5-gram-Jaccard truth set —
    shared by e1_jaccard_pairs, the full LSH recall audit, and the
    sampled audit (``pred`` restricts the document universe;
    ``with_score`` drops the score column for pure pair sets), so the
    ground-truth definition cannot drift between audits (r6 review
    finding)."""
    where = f" WHERE {pred}" if pred else ""
    score_col = (
        ",\n       round(len(list_intersect(a.s, b.s))::DOUBLE\n"
        "             / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) AS jaccard"
        if with_score
        else ""
    )
    return f"""
WITH sh AS (
  SELECT doc_id, source,
         list_distinct(list_transform(generate_series(1, greatest(length(text)-4, 1)),
           i -> substr(lower(text), i, 5))) AS s
  FROM documents{where}
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b{score_col}
FROM sh a JOIN sh b ON a.source = b.source AND a.doc_id < b.doc_id
WHERE len(list_intersect(a.s, b.s))::DOUBLE
      / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.2
"""

ORACLE_E1_JACCARD = _oracle_jaccard_pairs()

def q_e1_lsh_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage fuzzy dedup: LSH candidates (est >= 0.25) verified by
    exact hashed-shingle Jaccard (>= 0.3) on candidate pairs only."""
    return dedup.lsh_verified_pairs(
        _t(spark, sf_dir, "documents"), "text", "doc_id"
    ).select("id_a", "id_b", "est_jaccard", F.round("jaccard", 6).alias("jaccard"))

def q_e1_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup of a new batch (doc_id % 10 == 0) against the
    already-ingested corpus (doc_id % 10 != 0): asymmetric LSH band
    join (index never self-joins — ingest cost is linear in batch
    size), then exact-Jaccard verification of candidates only."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.incremental_neardup_pairs(
        docs.where(F.col("doc_id") % 10 != 0),
        docs.where(F.col("doc_id") % 10 == 0),
        "text",
        "doc_id",
    ).select("id_a", "id_b", "est_jaccard", F.round("jaccard", 6).alias("jaccard"))

def _oracle_incremental_dedup(
    min_est: float = 0.25, threshold: float = 0.3
) -> str:
    sig = _oracle_minhash_sig()
    bands = ", ".join(
        f"md5(concat_ws(',', mh_{2 * b}, mh_{2 * b + 1})) AS band_{b}"
        for b in range(4)
    )
    agree = " + ".join(
        f"CASE WHEN a.mh_{k} = b.mh_{k} THEN 1 ELSE 0 END" for k in range(8)
    )
    per_band = "\nUNION\n".join(
        f"SELECT a.doc_id AS id_a, b.doc_id AS id_b, ({agree}) / 8.0 AS est_jaccard "
        f"FROM banded a JOIN banded b ON a.band_{b} = b.band_{b} "
        f"AND a.doc_id % 10 <> 0 AND b.doc_id % 10 = 0"
        for b in range(4)
    )
    return f"""
WITH sigs AS ({sig}), banded AS (SELECT *, {bands} FROM sigs),
pairs AS (
  SELECT id_a, id_b, est_jaccard FROM ({per_band})
  WHERE est_jaccard >= {min_est}
),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(generate_series(1, greatest(length(text)-4, 1)),
           i -> ('0x' || substr(md5(substr(lower(text), i, 5)), 1, 8))::BIGINT)) AS s
  FROM documents
)
SELECT p.id_a, p.id_b, p.est_jaccard,
       round(len(list_intersect(a.s, b.s))::DOUBLE
             / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) AS jaccard
FROM pairs p JOIN sh a ON p.id_a = a.doc_id JOIN sh b ON p.id_b = b.doc_id
WHERE len(list_intersect(a.s, b.s))::DOUBLE
      / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= {threshold}
"""

def q_e1_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive duplicate clusters: connected components (iterative
    min-label propagation) over the LSH-verified pair graph at the
    dedup policy point (est >= 0.5, verified Jaccard >= 0.5 — a
    remove-near-duplicates setting; the looser 0.25/0.3 surface stays
    declared as e1_lsh_verified). cluster_id is the minimum doc_id
    reachable — the canonical member."""
    pairs = dedup.lsh_verified_pairs(
        _t(spark, sf_dir, "documents"), "text", "doc_id",
        min_est_jaccard=0.5, threshold=0.5,
    )
    clusters = dedup.duplicate_clusters(pairs)
    return clusters.select(
        F.col("id").cast("long").alias("doc_id"),
        F.col("cluster_id").cast("long").alias("cluster_id"),
    )

def q_e1_fuzzy_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full fuzzy-dedup pipeline at the dedup policy point (Jaccard >=
    0.5): LSH-verified pairs -> clusters -> keep each cluster's
    canonical (min-id) doc plus all unpaired docs."""
    out = dedup.fuzzy_dedup(
        _t(spark, sf_dir, "documents"), "text", "doc_id",
        min_est_jaccard=0.5, threshold=0.5,
    )
    return out.select("doc_id")

def _oracle_fuzzy_dedup() -> str:
    return f"""
WITH clusters AS ({_oracle_dup_clusters()})
SELECT doc_id FROM documents
WHERE doc_id NOT IN (SELECT doc_id FROM clusters WHERE doc_id <> cluster_id)
"""

def q_e1_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy dedup with a quality retention policy: each duplicate
    cluster keeps its LONGEST member (n_chars desc, id asc) instead of
    the arbitrary min-id one — dedup without degrading the surviving
    corpus."""
    out = dedup.fuzzy_dedup_keep_best(
        _t(spark, sf_dir, "documents"), "text", "doc_id", "n_chars",
        min_est_jaccard=0.5, threshold=0.5,
    )
    return out.select("doc_id")

def q_e1_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval contamination report in SKETCH mode: eval docs
    (doc_id % 10 == 0) sharing >= 13 sketched shingles (1/4
    hash-sampled 5-gram shingles, ~= 50 full shingles) with any train
    doc, after dropping sketched boilerplate shingles present in > 100
    train docs.

    The pair search is an equi-join on the 32-bit shingle hash (only
    documents that actually share a shingle ever meet — the same
    n^2-avoidance as LSH banding); the hash-residue sketch shrinks
    every explode/shuffle/join by ~4x (the 100 TB knob, measured ~3x
    end-to-end at sf0.1), and the document-frequency cut keeps hot
    boilerplate shingles out of the join."""
    docs = _t(spark, sf_dir, "documents")
    train = docs.where(F.col("doc_id") % 10 != 0)
    eval_df = docs.where(F.col("doc_id") % 10 == 0)
    rep = dedup.contamination_report(
        train, eval_df, "text", "doc_id",
        min_shared=13, max_shingle_df=100, shingle_mod=4,
    )
    return rep.select(
        "doc_id",
        "n_train_docs",
        "max_shared",
        F.round("overlap_frac", 6).alias("overlap_frac"),
    )

def _oracle_contamination() -> str:
    sh = (
        "list_filter(list_distinct(list_transform("
        "generate_series(1, greatest(length(text)-4, 1)), "
        "i -> ('0x' || substr(md5(substr(lower(text), i, 5)), 1, 8))::BIGINT)), "
        "g -> g % 4 = 0)"
    )
    return f"""
WITH tr0 AS (
  SELECT doc_id AS train_id, unnest({sh}) AS g
  FROM documents WHERE doc_id % 10 <> 0
), hot AS (
  SELECT g FROM tr0 GROUP BY g HAVING count(*) > 100
), tr AS (
  SELECT train_id, g FROM tr0 WHERE g NOT IN (SELECT g FROM hot)
), ev AS (
  SELECT doc_id AS eval_id, unnest({sh}) AS g
  FROM documents WHERE doc_id % 10 = 0
), pairs AS (
  SELECT eval_id, train_id, count(*) AS shared
  FROM tr JOIN ev USING (g)
  GROUP BY 1, 2 HAVING count(*) >= 13
), per_eval AS (
  SELECT eval_id, count(*) AS n_train_docs, max(shared) AS max_shared
  FROM pairs GROUP BY 1
), sizes AS (
  SELECT doc_id AS eval_id, len({sh}) AS n_sh
  FROM documents WHERE doc_id % 10 = 0
)
SELECT p.eval_id AS doc_id, n_train_docs, max_shared,
       round(max_shared::DOUBLE / n_sh, 6) AS overlap_frac
FROM per_eval p JOIN sizes s ON p.eval_id = s.eval_id
"""

def q_e1_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash fingerprints over distinct tokens."""
    return dedup.simhash(_t(spark, sf_dir, "documents"), "text", "doc_id")

def q_e1_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: banded bit-slice candidates + hamming <= 3
    verify (exact within the ball since bands=4 > max_hamming)."""
    return dedup.simhash_neardup_pairs(
        _t(spark, sf_dir, "documents"), "text", "doc_id"
    )

def _oracle_simhash_pairs() -> str:
    sims = _oracle_simhash()
    per_band = "\nUNION\n".join(
        f"SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
        f"CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming "
        f"FROM sims a JOIN sims b "
        f"ON (a.simhash // {1 << (b * 4)}) % 16 = (b.simhash // {1 << (b * 4)}) % 16 "
        f"AND a.doc_id < b.doc_id"
        for b in range(4)
    )
    return f"""
WITH sims AS ({sims})
SELECT id_a, id_b, hamming FROM ({per_band})
WHERE hamming <= 3
"""

def _oracle_simhash() -> str:
    toks = "list_distinct(regexp_split_to_array(lower(text), '\\s+'))"
    th = "('0x' || substr(md5(t), 1, 8))::BIGINT"
    terms = []
    for j in range(16):
        vote = (
            f"list_aggregate(list_transform({toks}, "
            f"t -> CASE WHEN ({th} // {1 << j}) % 2 = 1 THEN 1 ELSE -1 END), 'sum')"
        )
        terms.append(f"CASE WHEN ({vote}) > 0 THEN {1 << j} ELSE 0 END")
    return f"SELECT doc_id, CAST({' + '.join(terms)} AS BIGINT) AS simhash FROM documents"

_DOT = (
    "list_aggregate(list_transform(list_zip(a.e, b.e), "
    "p -> p[1]::DOUBLE * p[2]::DOUBLE), 'sum')"
)

def _lsh_sign_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embeddings with a (label x hyperplane-sign-LSH cell) block key —
    the scalable SemDeDup partition (r8). Charikar hyperplane LSH
    (public): cell = the sign bits of the vector's dot products with
    ``nbits`` fixed directions (the first ``nbits`` embeddings).
    ``nbits = max(3, ceil(log2(N / 250)))`` grows LOGARITHMICALLY, so

      * assignment costs N x nbits dot products — O(N log N), vs the
        r7 IVF argmax whose cost was N x nlist (fixed nlist=8 kept
        assignment linear but let cells fill ∝ N → within-cell pair
        work ∝ N², measured 44x wall at 30x input by the r8 second
        decade; growing nlist ∝ N fixed pair work but made the flat
        argmax itself quadratic, measured 69x — both shapes fail);
      * cell COUNT 2^nbits grows ∝ N, so expected cell populations
        stay ~250/|labels| and within-cell pair work stays linear.

    Sign of an IEEE dot product is engine-exact (same index order both
    engines), so the DuckDB oracle mirrors the cells bit for bit. The
    one driver action is a columnar count() (bounded scalar)."""
    import math

    emb = _t(spark, sf_dir, "embeddings")
    n = emb.count()
    nbits = max(3, math.ceil(math.log2(max(n, 1) / 250)))
    proj = F.broadcast(
        emb.where(F.col("vec_id") < nbits).select(
            F.col("vec_id").alias("__p"), F.col("embedding").alias("__pe")
        )
    )
    signed = (
        emb.join(proj)
        .withColumn(
            "__dot",
            F.aggregate(
                F.zip_with("embedding", "__pe", lambda a, b: a * b),
                F.lit(0.0).cast("double"),
                lambda acc, x: acc + x,
            ),
        )
        .groupBy("vec_id")
        .agg(
            F.sum(
                F.expr(
                    "CASE WHEN __dot >= 0"
                    " THEN shiftleft(1L, cast(__p AS INT)) ELSE 0L END"
                )
            ).alias("__cell")
        )
    )
    return emb.join(signed, "vec_id").withColumn(
        "__blk", F.concat_ws(":", F.col("label"), F.col("__cell"))
    )


def _sem_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared semantic near-dup pair definition (e1_embedding_neardup +
    the agreement audit): cosine >= 0.3 pairs within
    (label x sign-LSH cell) blocks — see :func:`_lsh_sign_blocked`
    for the scale story (r8: log-growing hyperplane bits replaced the
    IVF cells after the 30x decade measured both fixed and
    N-proportional nlist superlinear)."""
    blocked = _lsh_sign_blocked(spark, sf_dir)
    pairs = dedup.embedding_neardup_pairs(
        blocked, "embedding", "vec_id", block_col="__blk", threshold=-2.0
    )
    return pairs.select(
        "id_a", "id_b", F.round("cosine", 6).alias("cosine")
    ).where(F.col("cosine") >= 0.3)


def q_e1_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs at cos >= 0.3 within
    (label x IVF-cell) blocks — the SemDeDup partition; see
    :func:`_sem_neardup_pairs` for the scale rationale (label-only
    blocking measured ~quadratic on the r7 scaling harness)."""
    return _sem_neardup_pairs(spark, sf_dir)

ORACLE_E1_EMB_NEARDUP = """
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings),
params AS (
  SELECT greatest(3, CAST(ceil(log2((SELECT count(*) FROM embeddings)
         / 250.0)) AS INTEGER)) AS nbits
),
proj AS (
  SELECT vec_id AS p, e AS pe FROM e
  WHERE vec_id < (SELECT nbits FROM params)
),
cells AS (
  SELECT v.vec_id,
         SUM(CASE WHEN list_aggregate(list_transform(list_zip(v.e, proj.pe),
                    q -> q[1] * q[2]), 'sum') >= 0
                  THEN (1::BIGINT << proj.p) ELSE 0 END) AS cell
  FROM e v CROSS JOIN proj
  GROUP BY v.vec_id
),
norms AS (
  SELECT vec_id, label, e,
         sqrt(list_aggregate(list_transform(e, x -> x * x), 'sum')) AS nrm
  FROM e
),
blocked AS (
  SELECT n.vec_id, n.label, n.e, n.nrm, c.cell
  FROM norms n JOIN cells c ON c.vec_id = n.vec_id
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_aggregate(list_transform(list_zip(a.e, b.e),
             p -> p[1] * p[2]), 'sum') / (a.nrm * b.nrm), 6) AS cosine
FROM blocked a JOIN blocked b
  ON a.label = b.label AND a.cell = b.cell
 AND a.vec_id < b.vec_id
WHERE round(list_aggregate(list_transform(list_zip(a.e, b.e),
            p -> p[1] * p[2]), 'sum') / (a.nrm * b.nrm), 6) >= 0.3
"""

def q_e1_dedup_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1 audit: per-source dedup savings — documents and whitespace
    tokens that fuzzy dedup (min-id policy over the 0.5 cluster graph)
    would remove, next to the source's totals. The 'why run dedup'
    report a curation pipeline publishes before committing to the
    expensive pass corpus-wide; the cluster graph is the same bounded
    pair pipeline as e1_dup_clusters, and the savings rollup is one
    |sources|-cardinality aggregate."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.lsh_verified_pairs(
        docs, "text", "doc_id", min_est_jaccard=0.5, threshold=0.5
    )
    clusters = dedup.duplicate_clusters(pairs)
    dropped = clusters.where(F.col("id") != F.col("cluster_id")).select(
        F.col("id").alias("doc_id"), F.lit(1).alias("__drop")
    )
    toks = F.size(
        F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != "")
    ).cast("long")
    marked = docs.join(dropped, "doc_id", "left").select(
        "source",
        toks.alias("__tok"),
        F.coalesce(F.col("__drop"), F.lit(0)).alias("__d"),
    )
    return marked.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("__tok").cast("long").alias("n_tokens"),
        F.sum("__d").cast("long").alias("dropped_docs"),
        F.sum(F.col("__tok") * F.col("__d")).cast("long").alias("dropped_tokens"),
        F.round(
            F.sum(F.col("__tok") * F.col("__d")).cast("double")
            / F.sum("__tok").cast("double"),
            6,
        ).alias("token_savings_frac"),
    )

def _oracle_dedup_savings() -> str:
    return f"""
WITH clusters AS ({_oracle_dup_clusters()}),
dropped AS (SELECT doc_id FROM clusters WHERE doc_id <> cluster_id),
t AS (
  SELECT source,
         CAST(len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                              x -> x <> '')) AS BIGINT) AS tok,
         CASE WHEN doc_id IN (SELECT doc_id FROM dropped) THEN 1 ELSE 0 END AS d
  FROM documents
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(tok) AS BIGINT) AS n_tokens,
       CAST(sum(d) AS BIGINT) AS dropped_docs,
       CAST(sum(tok * d) AS BIGINT) AS dropped_tokens,
       round(sum(tok * d)::DOUBLE / sum(tok), 6) AS token_savings_frac
FROM t GROUP BY source
"""

def q_e1_bloom_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter exact-dup pre-filter for incremental ingest: the
    index corpus (doc_id % 10 != 0) builds a position-table filter over
    text; the new batch (doc_id % 10 == 0) probes it — bloom-positive
    rows are the only ones that continue to verification. No false
    negatives by construction."""
    from ..operators.sketches import bloom_build, bloom_probe

    docs = _t(spark, sf_dir, "documents")
    index = docs.where(F.col("doc_id") % 10 != 0)
    batch = docs.where(F.col("doc_id") % 10 == 0).select(
        F.col("doc_id"), F.col("text")
    )
    bloom = bloom_build(index, "text", m_bits=1 << 16, k_hashes=4)
    probed = bloom_probe(batch, bloom, "text", m_bits=1 << 16, k_hashes=4)
    return (
        batch.join(probed, batch.text == probed.key)
        .select("doc_id", "maybe_member")
    )

ORACLE_E1_BLOOM_CANDIDATES = """
WITH index_ AS (SELECT text FROM documents WHERE doc_id % 10 <> 0),
batch AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0),
bloom AS (
  SELECT DISTINCT
         ('0x' || substr(md5((1000 + d)::VARCHAR || ':' || text), 1, 8))::BIGINT % 65536 AS pos
  FROM index_, UNNEST([0,1,2,3]) AS t(d)
),
probes AS (
  SELECT DISTINCT doc_id,
         ('0x' || substr(md5((1000 + d)::VARCHAR || ':' || text), 1, 8))::BIGINT % 65536 AS pos
  FROM batch, UNNEST([0,1,2,3]) AS t(d)
)
SELECT p.doc_id, count(b.pos) = count(*) AS maybe_member
FROM probes p LEFT JOIN bloom b ON p.pos = b.pos
GROUP BY p.doc_id
"""

def q_e1_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: within-cell cosine pairs at >= 0.3 over hyperplane
    sign-LSH cells (log-growing bit count — :func:`_lsh_sign_blocked`'s
    scale story, r8: both fixed and N-proportional IVF nlist measured
    superlinear at the 30x decade), every vector with a lower-id
    semantic duplicate dropped. Label is NOT part of this block key
    (pure SemDeDup semantics); the cell alone bounds the pair work."""
    blocked = _lsh_sign_blocked(spark, sf_dir).withColumn(
        "__cellblk", F.col("__cell").cast("string")
    )
    pairs = dedup.embedding_neardup_pairs(
        blocked, "embedding", "vec_id", block_col="__cellblk",
        threshold=0.3,
    )
    dropped = pairs.select(F.col("id_b").alias("vec_id")).distinct()
    emb = _t(spark, sf_dir, "embeddings")
    return emb.join(dropped, "vec_id", "left_anti").select("vec_id", "label")

ORACLE_E1_SEMANTIC_DEDUP = """
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings),
params AS (
  SELECT greatest(3, CAST(ceil(log2((SELECT count(*) FROM embeddings)
         / 250.0)) AS INTEGER)) AS nbits
),
proj AS (
  SELECT vec_id AS p, e AS pe FROM e
  WHERE vec_id < (SELECT nbits FROM params)
),
cellmap AS (
  SELECT v.vec_id,
         SUM(CASE WHEN list_aggregate(list_transform(list_zip(v.e, proj.pe),
                    q -> q[1] * q[2]), 'sum') >= 0
                  THEN (1::BIGINT << proj.p) ELSE 0 END) AS cell
  FROM e v CROSS JOIN proj
  GROUP BY v.vec_id
),
norms AS (
  SELECT vec_id, e, sqrt(list_aggregate(list_transform(e, x -> x * x), 'sum')) AS nrm
  FROM e
),
cells AS (SELECT n.vec_id, n.e, n.nrm, c.cell
          FROM norms n JOIN cellmap c USING (vec_id)),
dropped AS (
  SELECT DISTINCT b.vec_id
  FROM cells a JOIN cells b
    ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE list_aggregate(list_transform(list_zip(a.e, b.e),
        p -> p[1] * p[2]), 'sum') / nullif(a.nrm * b.nrm, 0) >= 0.3
)
SELECT vec_id, label FROM e
WHERE vec_id NOT IN (SELECT vec_id FROM dropped)
"""

def q_e1_record_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1: blocked fuzzy record linkage — a deterministically corrupted
    'dirty batch' of document titles (vowel substitution beyond the
    blocking prefix) is matched back to the clean catalog by blocked
    levenshtein best-match (block = 8-char title prefix)."""
    docs = _t(spark, sf_dir, "documents")
    cat = docs.select(
        "doc_id",
        F.expr("substring(text, 1, 40)").alias("title"),
        F.expr("substring(text, 1, 8)").alias("blk"),
    )
    dirty = cat.where(F.expr("doc_id % 5 = 0")).select(
        "doc_id",
        F.concat(
            F.expr("substring(title, 1, 8)"),
            F.translate(F.expr("substring(title, 9, 32)"), "a", "@"),
        ).alias("title"),
        "blk",
    )
    return dedup.blocked_linkage(dirty, cat, "title", "doc_id", "blk", max_distance=6)

ORACLE_E1_RECORD_LINKAGE = """
WITH cat AS (
  SELECT doc_id, substr(text, 1, 40) AS title, substr(text, 1, 8) AS blk
  FROM documents
),
dirty AS (
  SELECT doc_id,
         substr(title, 1, 8) || translate(substr(title, 9, 32), 'a', '@') AS title,
         blk
  FROM cat WHERE doc_id % 5 = 0
),
cand AS (
  SELECT d.doc_id AS did, c.doc_id AS cid,
         levenshtein(d.title, c.title) AS dist
  FROM dirty d JOIN cat c ON d.blk = c.blk
  WHERE levenshtein(d.title, c.title) <= 6
)
SELECT doc_id_left, matched_id, distance FROM (
  SELECT did AS doc_id_left, cid AS matched_id,
         CAST(min(dist) OVER (PARTITION BY did) AS BIGINT) AS distance,
         row_number() OVER (PARTITION BY did ORDER BY dist, cid) AS rn
  FROM cand
) WHERE rn = 1
"""

def q_e1_cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1: dedup impact report — histogram of duplicate-cluster sizes
    at the 0.5/0.5 dedup policy point (how much of the corpus is
    near-duplicated, and in how big families). Two bounded aggregates
    over the cluster frame; the expensive part is the shared LSH
    pipeline."""
    pairs = dedup.lsh_verified_pairs(
        _t(spark, sf_dir, "documents"), "text", "doc_id",
        min_est_jaccard=0.5, threshold=0.5,
    )
    sizes = (
        dedup.duplicate_clusters(pairs)
        .groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("cluster_size"))
    )
    return sizes.groupBy("cluster_size").agg(
        F.count(F.lit(1)).cast("long").alias("n_clusters"),
        F.sum("cluster_size").cast("long").alias("n_docs"),
    ).select(
        F.col("cluster_size").cast("long").alias("cluster_size"),
        "n_clusters",
        "n_docs",
    )

def _oracle_cluster_stats() -> str:
    return f"""
WITH clusters AS ({_oracle_dup_clusters()}),
sz AS (
  SELECT cluster_id, count(*) AS cluster_size
  FROM clusters GROUP BY cluster_id
)
SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
       CAST(count(*) AS BIGINT) AS n_clusters,
       CAST(sum(cluster_size) AS BIGINT) AS n_docs
FROM sz GROUP BY cluster_size
"""

def q_e1_normalized_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1: near-exact dedup on the canonicalized text (case/punct/
    whitespace-insensitive): surviving doc ids."""
    return dedup.normalized_dedup(
        _t(spark, sf_dir, "documents"), "text", "doc_id"
    ).select("doc_id")

ORACLE_E1_NORMALIZED_DEDUP = """
SELECT doc_id FROM (
  SELECT doc_id, row_number() OVER (
    PARTITION BY trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))
    ORDER BY doc_id) AS rn
  FROM documents
) WHERE rn = 1
"""

def q_e1_triangle_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1 graph cohesion audit: per-document triangle count + local
    clustering coefficient over the LSH-verified near-dup pair graph
    (0.5 policy point). Tight duplicate families are near-cliques
    (coefficient ~1); chain-shaped components are threshold
    false-positive paths (coefficient ~0) — the structural signal a
    dedup-threshold audit reads. Spark enumerates via degree-ordered
    compact-forward (sqrt-bounded hot-node wedges); the oracle uses the
    plain id-canonical triple join — same triangle set, checked."""
    from ..operators.graph import triangle_counts

    pairs = dedup.lsh_verified_pairs(
        _t(spark, sf_dir, "documents"), "text", "doc_id",
        min_est_jaccard=0.5, threshold=0.5,
    )
    out = triangle_counts(pairs, "id_a", "id_b")
    return out.select(
        F.col("node").cast("long").alias("doc_id"),
        "degree",
        "n_triangles",
        "clustering",
    )

def _oracle_triangle_stats() -> str:
    return f"""
WITH verified AS ({_oracle_lsh_verified(0.5, 0.5)}),
und AS (
  SELECT DISTINCT least(id_a, id_b) AS u, greatest(id_a, id_b) AS v
  FROM verified WHERE id_a <> id_b
),
b AS (SELECT u, v FROM und UNION ALL SELECT v, u FROM und),
deg AS (SELECT u AS node, CAST(count(*) AS BIGINT) AS degree FROM b GROUP BY u),
tris AS (
  SELECT a.u AS x, a.v AS y, c.v AS z
  FROM und a JOIN und c2 ON c2.u = a.v JOIN und c ON c.u = a.u AND c.v = c2.v
),
members AS (
  SELECT x AS node FROM tris
  UNION ALL SELECT y FROM tris
  UNION ALL SELECT z FROM tris
),
pn AS (SELECT node, CAST(count(*) AS BIGINT) AS n_triangles FROM members GROUP BY node)
SELECT CAST(d.node AS BIGINT) AS doc_id, d.degree,
       coalesce(pn.n_triangles, 0) AS n_triangles,
       CASE WHEN d.degree >= 2 THEN
         round(2.0 * coalesce(pn.n_triangles, 0)
               / (CAST(d.degree AS DOUBLE) * (CAST(d.degree AS DOUBLE) - 1.0)), 6)
       END AS clustering
FROM deg d LEFT JOIN pn ON d.node = pn.node
"""

def q_e1_lsh_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1 tuning audit: recall/precision of the MinHash-LSH candidate
    generator against exact 5-gram-Jaccard ground truth (threshold
    0.2, within source blocks) — the number a dedup-threshold review
    reads before trusting banded LSH at scale. Candidates restrict to
    the same block domain as the truth set so both counts cover the
    SAME pair universe; all three counts are single-row aggregates
    cross-joined into one audit row."""
    from ..operators import dedup as dd

    docs = _t(spark, sf_dir, "documents")
    # truth (shingle hashing + blocked matmul) and cand_block (minhash
    # mapInPandas + LSH self-join) each feed BOTH a count aggregate and
    # the hit join — materialize each once so the expensive subtrees
    # are not evaluated twice (r5 review finding; same shape as the
    # Q17/Q15 localCheckpoint fix).
    truth = (
        dd.blocked_jaccard_pairs(
            docs, "text", "doc_id", block_col="source", threshold=0.2
        )
        .select("id_a", "id_b")
        .localCheckpoint(eager=True)
    )
    sigs = dd.minhash_signatures(docs, "text", "doc_id")
    cand = dd.lsh_candidate_pairs(sigs, "doc_id", min_est_jaccard=0.25).select(
        "id_a", "id_b"
    )
    sa = docs.select(F.col("doc_id").alias("id_a"), F.col("source").alias("__sa"))
    sb = docs.select(F.col("doc_id").alias("id_b"), F.col("source").alias("__sb"))
    cand_block = (
        cand.join(F.broadcast(sa), "id_a")
        .join(F.broadcast(sb), "id_b")
        .where(F.col("__sa") == F.col("__sb"))
        .select("id_a", "id_b")
        .localCheckpoint(eager=True)
    )
    hit = truth.join(cand_block, ["id_a", "id_b"])
    t = truth.agg(F.count(F.lit(1)).cast("long").alias("n_true"))
    c = cand_block.agg(F.count(F.lit(1)).cast("long").alias("n_candidates"))
    h = hit.agg(F.count(F.lit(1)).cast("long").alias("n_hit"))
    return (
        t.crossJoin(c)
        .crossJoin(h)
        .select(
            "n_true",
            "n_candidates",
            "n_hit",
            F.round(F.col("n_hit") / F.expr("nullif(n_true, 0)"), 6).alias(
                "recall"
            ),
            F.round(
                F.col("n_hit") / F.expr("nullif(n_candidates, 0)"), 6
            ).alias("precision"),
        )
    )

def _oracle_lsh_recall_audit() -> str:
    return f"""
WITH truth AS (SELECT id_a, id_b FROM ({ORACLE_E1_JACCARD})),
cand AS ({_oracle_lsh_pairs(min_est=0.25)}),
cand_block AS (
  SELECT c.id_a, c.id_b
  FROM cand c
  JOIN documents a ON a.doc_id = c.id_a
  JOIN documents b ON b.doc_id = c.id_b
  WHERE a.source = b.source
),
hit AS (SELECT id_a, id_b FROM truth INTERSECT SELECT id_a, id_b FROM cand_block)
SELECT (SELECT count(*) FROM truth) AS n_true,
       (SELECT count(*) FROM cand_block) AS n_candidates,
       (SELECT count(*) FROM hit) AS n_hit,
       round((SELECT count(*) FROM hit)::DOUBLE
             / nullif((SELECT count(*) FROM truth), 0), 6) AS recall,
       round((SELECT count(*) FROM hit)::DOUBLE
             / nullif((SELECT count(*) FROM cand_block), 0), 6) AS precision
"""

def q_e1_lsh_recall_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1 tuning audit, corpus-scale variant: LSH recall/precision
    measured on a DETERMINISTIC md5-bucket document sample instead of
    the full corpus (r5 verdict item 5 — the exact audit's full
    blocked-Jaccard truth set is infeasible at 100 TB, and its
    id->source broadcast stops broadcasting at corpus scale). Sampling
    DOCUMENTS (not pairs) keeps the estimator unbiased over the
    sampled pair universe: truth, candidates, and hits all restrict to
    sample x sample, so recall/precision are the standard
    sample-restricted estimates. The sample is ``hash_sample``'s
    md5-bucket membership (operators/sampling.py) — reproducible
    across engines and retries, never ``rand()``. At 100 TB the
    fraction drops to ~1e-3: the truth-side shingle matmul is then
    1/1e6 of the corpus-wide pair work and every docs-derived join
    side (the id->source maps below) is sample-sized, i.e.
    broadcastable again."""
    from ..operators import dedup as dd
    from ..operators.sampling import hash_sample

    docs = _t(spark, sf_dir, "documents")
    # 50% at test SF so the sampled pair universe stays non-trivial;
    # the fraction is the ONLY knob that changes at corpus scale.
    sample = hash_sample(docs, "doc_id", 0.5, salt="recall").localCheckpoint(
        eager=True
    )
    truth = (
        dd.blocked_jaccard_pairs(
            sample, "text", "doc_id", block_col="source", threshold=0.2
        )
        .select("id_a", "id_b")
        .localCheckpoint(eager=True)
    )
    sigs = dd.minhash_signatures(sample, "text", "doc_id")
    cand = dd.lsh_candidate_pairs(sigs, "doc_id", min_est_jaccard=0.25).select(
        "id_a", "id_b"
    )
    sa = sample.select(F.col("doc_id").alias("id_a"), F.col("source").alias("__sa"))
    sb = sample.select(F.col("doc_id").alias("id_b"), F.col("source").alias("__sb"))
    cand_block = (
        cand.join(F.broadcast(sa), "id_a")
        .join(F.broadcast(sb), "id_b")
        .where(F.col("__sa") == F.col("__sb"))
        .select("id_a", "id_b")
        .localCheckpoint(eager=True)
    )
    hit = truth.join(cand_block, ["id_a", "id_b"])
    t = truth.agg(F.count(F.lit(1)).cast("long").alias("n_true"))
    c = cand_block.agg(F.count(F.lit(1)).cast("long").alias("n_candidates"))
    h = hit.agg(F.count(F.lit(1)).cast("long").alias("n_hit"))
    return (
        t.crossJoin(c)
        .crossJoin(h)
        .select(
            "n_true",
            "n_candidates",
            "n_hit",
            F.round(F.col("n_hit") / F.expr("nullif(n_true, 0)"), 6).alias(
                "recall"
            ),
            F.round(
                F.col("n_hit") / F.expr("nullif(n_candidates, 0)"), 6
            ).alias("precision"),
        )
    )

def _oracle_lsh_recall_sampled() -> str:
    # the same md5-bucket membership as hash_sample(fraction=0.5,
    # salt='recall') — the predicate pair already engine-parity-pinned
    # by ORACLE_P2_STRATIFIED_SAMPLE
    pred = (
        "('0x' || substr(md5('recall:' || CAST(doc_id AS VARCHAR)), 1, 8))"
        "::BIGINT % 1000000 < 500000"
    )
    sampled_src = f"(SELECT * FROM documents WHERE {pred}) sdocs"
    truth = _oracle_jaccard_pairs(pred=pred, with_score=False)
    return f"""
WITH truth AS ({truth}),
cand AS ({_oracle_lsh_pairs(min_est=0.25, src=sampled_src)}),
cand_block AS (
  SELECT c.id_a, c.id_b
  FROM cand c
  JOIN documents a ON a.doc_id = c.id_a
  JOIN documents b ON b.doc_id = c.id_b
  WHERE a.source = b.source
),
hit AS (SELECT id_a, id_b FROM truth INTERSECT SELECT id_a, id_b FROM cand_block)
SELECT (SELECT count(*) FROM truth) AS n_true,
       (SELECT count(*) FROM cand_block) AS n_candidates,
       (SELECT count(*) FROM hit) AS n_hit,
       round((SELECT count(*) FROM hit)::DOUBLE
             / nullif((SELECT count(*) FROM truth), 0), 6) AS recall,
       round((SELECT count(*) FROM hit)::DOUBLE
             / nullif((SELECT count(*) FROM cand_block), 0), 6) AS precision
"""

def q_e1_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1 excerpt detection: directed shingle containment
    |A∩B| / |A| >= 0.5 over hashed 5-gram sets, boilerplate shingles
    (document frequency > 20) cut before the pair join — the
    asymmetric measure that catches a short doc embedded in a long one
    where Jaccard stays near zero."""
    from ..operators.dedup import containment_pairs

    return containment_pairs(
        _t(spark, sf_dir, "documents"), "text", "doc_id",
        threshold=0.5, max_shingle_df=20,
    )

ORACLE_E1_CONTAINMENT = """
WITH sh AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
           generate_series(1, greatest(length(text)-4, 1)),
           i -> ('0x' || substr(md5(substr(lower(text), i, 5)), 1, 8))::BIGINT))) AS g
  FROM documents
),
hot AS (SELECT g FROM sh GROUP BY g HAVING count(*) > 20),
kept AS (SELECT sh.doc_id, sh.g FROM sh ANTI JOIN hot USING (g)),
sizes AS (SELECT doc_id, count(*) AS sz FROM kept GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
  FROM kept a JOIN kept b ON a.g = b.g AND a.doc_id <> b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b, n_shared,
       round(n_shared::DOUBLE / s.sz, 6) AS containment
FROM inter JOIN sizes s ON s.doc_id = inter.id_a
WHERE round(n_shared::DOUBLE / s.sz, 6) >= 0.5
"""

def q_e1_band_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1 LSH band-tuning curve (the dedup analog of
    ``e2_nprobe_recall_curve``): candidate recall/precision of MinHash
    banding at bands in (2, 4, 8) over 8 signature slots — rows-per-band
    4/2/1, the knob every LSH dedup deployment sweeps before fixing its
    collision probability curve (Broder's s-curve, public). ONE
    signature pass and ONE sampled exact-Jaccard truth set
    (md5-bucket document sample, the corpus-scale estimator of
    ``e1_lsh_recall_sampled``) are shared across all three settings
    via localCheckpoint; each setting re-bands the SAME signature
    frame, so the sweep costs three band equi-joins, never three
    corpus scans."""
    from functools import reduce

    from ..operators import dedup as dd
    from ..operators.sampling import hash_sample

    docs = _t(spark, sf_dir, "documents")
    sample = hash_sample(docs, "doc_id", 0.5, salt="bands").localCheckpoint(
        eager=True
    )
    truth = (
        dd.blocked_jaccard_pairs(
            sample, "text", "doc_id", block_col="source", threshold=0.2
        )
        .select("id_a", "id_b")
        .localCheckpoint(eager=True)
    )
    sigs = dd.minhash_signatures(sample, "text", "doc_id").localCheckpoint(
        eager=True
    )
    sa = sample.select(F.col("doc_id").alias("id_a"), F.col("source").alias("__sa"))
    sb = sample.select(F.col("doc_id").alias("id_b"), F.col("source").alias("__sb"))
    t = truth.agg(F.count(F.lit(1)).cast("long").alias("n_true"))
    # r12 (profiled, verdict item 7): the per-band loop ran ~31 tiny
    # sequential jobs (3 candidate checkpoints + 3x3 aggregate jobs),
    # all fixed overhead — the sweep's data is kilobytes. The three
    # band settings now UNION into one tagged frame (its single eager
    # checkpoint materializes all three banding pipelines in one
    # parallel job), and the counts/hits collapse to two grouped
    # aggregates; a 3-row literal arm frame keeps zero-candidate arms
    # present with the same null semantics as the per-arm aggregates.
    cands = [
        dd.lsh_candidate_pairs(
            sigs, "doc_id", bands=bands, min_est_jaccard=0.0
        )
        .select("id_a", "id_b")
        .join(F.broadcast(sa), "id_a")
        .join(F.broadcast(sb), "id_b")
        .where(F.col("__sa") == F.col("__sb"))
        .select(F.lit(bands).cast("int").alias("bands"), "id_a", "id_b")
        for bands in (2, 4, 8)
    ]
    cand_all = reduce(lambda a, b: a.unionByName(b), cands).localCheckpoint(
        eager=True
    )
    c_cnt = cand_all.groupBy("bands").agg(
        F.count(F.lit(1)).cast("long").alias("n_candidates")
    )
    h_cnt = (
        truth.join(cand_all, ["id_a", "id_b"])
        .groupBy("bands")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hit"))
    )
    arms = spark.createDataFrame(
        [(2,), (4,), (8,)], "bands int"
    )
    return (
        arms.crossJoin(t)
        .join(c_cnt, "bands", "left")
        .join(h_cnt, "bands", "left")
        .select(
            "bands",
            "n_true",
            F.coalesce(F.col("n_candidates"), F.lit(0).cast("long")).alias(
                "n_candidates"
            ),
            F.coalesce(F.col("n_hit"), F.lit(0).cast("long")).alias("n_hit"),
            F.round(
                F.coalesce(F.col("n_hit"), F.lit(0).cast("long"))
                / F.expr("nullif(n_true, 0)"),
                6,
            ).alias("recall"),
            F.round(
                F.coalesce(F.col("n_hit"), F.lit(0).cast("long"))
                / F.expr("nullif(n_candidates, 0)"),
                6,
            ).alias("precision"),
        )
    )

def _oracle_lsh_pairs_banded(bands: int, src: str = "documents") -> str:
    """Banded LSH candidate pairs at an arbitrary band count over the 8
    md5-minhash slots (generalizes ``_oracle_lsh_pairs``; UNION dedups
    multi-band matches)."""
    rows = 8 // bands
    sig = _oracle_minhash_sig(src)
    band_cols = ", ".join(
        "md5(concat_ws(',', "
        + ", ".join(f"mh_{b * rows + r}" for r in range(rows))
        + f")) AS band_{b}"
        for b in range(bands)
    )
    per_band = "\nUNION\n".join(
        f"SELECT a.doc_id AS id_a, b.doc_id AS id_b "
        f"FROM banded a JOIN banded b ON a.band_{b} = b.band_{b} AND a.doc_id < b.doc_id"
        for b in range(bands)
    )
    return f"WITH sigs AS ({sig}), banded AS (SELECT *, {band_cols} FROM sigs)\n{per_band}"

def _oracle_band_sweep() -> str:
    pred = (
        "('0x' || substr(md5('bands:' || CAST(doc_id AS VARCHAR)), 1, 8))"
        "::BIGINT % 1000000 < 500000"
    )
    sampled_src = f"(SELECT * FROM documents WHERE {pred}) sdocs"
    truth = _oracle_jaccard_pairs(pred=pred, with_score=False)
    arms = []
    for bands in (2, 4, 8):
        cand = _oracle_lsh_pairs_banded(bands, src=sampled_src)
        arms.append(f"""
SELECT {bands} AS bands,
       (SELECT count(*) FROM truth)::BIGINT AS n_true,
       (SELECT count(*) FROM cb{bands})::BIGINT AS n_candidates,
       (SELECT count(*) FROM (SELECT * FROM truth INTERSECT SELECT * FROM cb{bands}))::BIGINT AS n_hit,
       round((SELECT count(*) FROM (SELECT * FROM truth INTERSECT SELECT * FROM cb{bands}))::DOUBLE
             / nullif((SELECT count(*) FROM truth), 0), 6) AS recall,
       round((SELECT count(*) FROM (SELECT * FROM truth INTERSECT SELECT * FROM cb{bands}))::DOUBLE
             / nullif((SELECT count(*) FROM cb{bands}), 0), 6) AS precision
""")
        arms[-1] = arms[-1].strip()
    ctes = ",\n".join(
        f"c{b} AS ({_oracle_lsh_pairs_banded(b, src=sampled_src)}),\n"
        f"cb{b} AS (SELECT c.id_a, c.id_b FROM c{b} c "
        f"JOIN documents a ON a.doc_id = c.id_a "
        f"JOIN documents b ON b.doc_id = c.id_b WHERE a.source = b.source)"
        for b in (2, 4, 8)
    )
    body = "\nUNION ALL\n".join(arms)
    return f"WITH truth AS ({truth}),\n{ctes}\n{body}"

def q_e1_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1 inter-source shingle-overlap matrix: Jaccard similarity of
    each source PAIR's distinct 5-gram shingle sets — the cross-source
    redundancy readout a mixture designer checks before treating
    sources as independent (mirror sites and templated re-posts make
    'diverse' mixtures secretly redundant). Plan: ONE corpus-scale
    shuffle — the shingle explode collapses straight to a per-shingle
    SOURCE SET via collect_set (map-side partials dedupe
    (gram, source) repeats before the exchange; set size bounded by
    |sources|), materialized exactly once for its three consumers
    (r6 judge finding). Everything downstream is map-side work on the
    shingle-count-sized frame: per-source set sizes from one explode,
    pair counts from the ordered double-explode of each set
    (<= |sources|^2 rows per shingle). The previous formulation
    (distinct + two-sided equi-self-join) paid three shuffles of the
    incidence table for the same values (r7, verified identical at
    sf0.1). Top-10 most overlapping pairs (bounded global sort).
    The text is lowered ONCE in a projection before shingling (r11 —
    this was the last pre_lowered=False call site: the default form
    re-evaluates lower() inside the transform lambda per shingle,
    O(len^2) per document, the documented 2x trap on shingle_expr;
    it read 22.6 at the 30x decade)."""
    docs = _t(spark, sf_dir, "documents")
    from ..operators.dedup import hashed_shingle_expr

    # r11: spread before the per-position md5 explode — a one-file scan
    # ran the whole hashing pass in one task (measured 3.4 s single-task
    # at sf0.1; metadata-gated, no-op at scale).
    from ..operators.dedup import _spread

    per_h = (
        _spread(docs).select(F.lower(F.col("text")).alias("__lt"), "source")
        .select(
            F.explode(
                F.expr(hashed_shingle_expr("__lt", 5, pre_lowered=True))
            ).alias("__h"),
            "source",
        )
        .groupBy("__h")
        .agg(F.array_sort(F.collect_set("source")).alias("__ss"))
        .localCheckpoint(eager=True)
    )
    sizes = (
        per_h.select(F.explode("__ss").alias("source"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("long").alias("__sz"))
    )
    inter = (
        per_h.select(F.explode("__ss").alias("source_a"), "__ss")
        .select("source_a", F.explode("__ss").alias("source_b"))
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )
    sa = sizes.select(F.col("source").alias("source_a"), F.col("__sz").alias("__za"))
    sb = sizes.select(F.col("source").alias("source_b"), F.col("__sz").alias("__zb"))
    return (
        inter.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_shared",
            F.round(
                F.col("n_shared")
                / (F.col("__za") + F.col("__zb") - F.col("n_shared")),
                6,
            ).alias("jaccard"),
        )
        .orderBy(F.desc("jaccard"), F.asc("source_a"), F.asc("source_b"))
        .limit(10)
    )

ORACLE_E1_SOURCE_OVERLAP = """
WITH sh AS (
  SELECT DISTINCT source,
         unnest(list_distinct(list_transform(
           generate_series(1, greatest(length(text)-4, 1)),
           i -> ('0x' || substr(md5(substr(lower(text), i, 5)), 1, 8))::BIGINT
         ))) AS h
  FROM documents
),
sizes AS (SELECT source, count(*) AS sz FROM sh GROUP BY source),
inter AS (
  SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_shared
  FROM sh a JOIN sh b ON a.h = b.h AND a.source < b.source
  GROUP BY 1, 2
)
SELECT source_a, source_b, n_shared::BIGINT AS n_shared,
       round(n_shared::DOUBLE / (za.sz + zb.sz - n_shared), 6) AS jaccard
FROM inter
JOIN sizes za ON za.source = inter.source_a
JOIN sizes zb ON zb.source = inter.source_b
ORDER BY jaccard DESC, source_a, source_b
LIMIT 10
"""

def q_e1_dedup_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1 dedup-funnel report: survivor counts of the three dedup
    policies measured independently on the raw corpus — exact
    (40-char boilerplate key), normalized (case/punct/whitespace
    canonical form), fuzzy (LSH-verified Jaccard >= 0.5 clusters,
    canonical kept) — the one-page comparison a curation review reads
    before picking its dedup tier. Each stage is the EXISTING operator
    unchanged (one policy definition per stage, shared with its
    standalone query), reduced to a count; four single-row aggregates
    union into the funnel."""
    from functools import reduce

    docs = _t(spark, sf_dir, "documents")
    raw = docs.select("doc_id")
    exact = dedup.exact_dedup(
        docs.withColumn("__key", F.expr("substring(text, 1, 40)")),
        "__key",
        "doc_id",
    ).select("doc_id")
    norm = dedup.normalized_dedup(docs, "text", "doc_id").select("doc_id")
    fuzzy = dedup.fuzzy_dedup(
        docs, "text", "doc_id", min_est_jaccard=0.5, threshold=0.5
    ).select("doc_id")
    # One-row corpus total is consumed by all four arms — pin it so the
    # count scan runs once, not once per arm (same shape as the
    # e1_source_overlap r6 finding, just a cheaper subtree).
    total = raw.agg(
        F.count(F.lit(1)).cast("long").alias("__total")
    ).localCheckpoint(eager=True)
    stages = [
        ("0_raw", raw),
        ("1_exact", exact),
        ("2_normalized", norm),
        ("3_fuzzy", fuzzy),
    ]
    arms = [
        frame.agg(F.count(F.lit(1)).cast("long").alias("n_kept"))
        .crossJoin(F.broadcast(total))
        .select(
            F.lit(name).alias("stage"),
            "n_kept",
            F.round(F.col("n_kept") / F.col("__total"), 6).alias("pct_kept"),
        )
        for name, frame in stages
    ]
    return reduce(lambda a, b: a.unionByName(b), arms)

def _oracle_dedup_funnel() -> str:
    return f"""
SELECT '0_raw' AS stage, count(*)::BIGINT AS n_kept,
       round(count(*)::DOUBLE / (SELECT count(*) FROM documents), 6) AS pct_kept
FROM documents
UNION ALL
SELECT '1_exact', count(*)::BIGINT,
       round(count(*)::DOUBLE / (SELECT count(*) FROM documents), 6)
FROM ({ORACLE_E1_EXACT})
UNION ALL
SELECT '2_normalized', count(*)::BIGINT,
       round(count(*)::DOUBLE / (SELECT count(*) FROM documents), 6)
FROM ({ORACLE_E1_NORMALIZED_DEDUP})
UNION ALL
SELECT '3_fuzzy', count(*)::BIGINT,
       round(count(*)::DOUBLE / (SELECT count(*) FROM documents), 6)
FROM ({_oracle_fuzzy_dedup()})
"""

def q_e1_minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1 estimator calibration: for LSH-verified pairs, how far the
    8-slot MinHash estimate sits from exact Jaccard, grouped by
    estimate level (est*8 is an exact integer 0..8) — the calibration
    table that justifies (or indicts) the banding thresholds. Reuses
    lsh_verified_pairs unchanged (it already carries BOTH numbers);
    means are exact-decimal sums over integer ratios, divided once."""
    pairs = dedup.lsh_verified_pairs(
        _t(spark, sf_dir, "documents"), "text", "doc_id"
    ).select(
        (F.col("est_jaccard") * 8).cast("long").alias("est_slots"),
        F.round("jaccard", 6).alias("__j"),
    )
    return (
        pairs.groupBy("est_slots")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.round(
                F.sum(F.col("__j").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_exact"),
            F.round(
                F.sum(
                    F.abs(
                        F.col("est_slots") / F.lit(8.0) - F.col("__j")
                    ).cast("decimal(18,6)")
                ).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_abs_err"),
        )
        .select(
            "est_slots",
            F.round(F.col("est_slots") / 8.0, 6).alias("est_jaccard"),
            "n_pairs",
            "mean_exact",
            "mean_abs_err",
        )
    )

def _oracle_minhash_calibration() -> str:
    verified = _oracle_lsh_verified()
    return f"""
WITH v AS ({verified}),
b AS (
  SELECT CAST(est_jaccard * 8 AS BIGINT) AS est_slots, jaccard FROM v
)
SELECT est_slots,
       round(est_slots / 8.0, 6) AS est_jaccard,
       count(*)::BIGINT AS n_pairs,
       round(CAST(sum(CAST(jaccard AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6)
         AS mean_exact,
       round(CAST(sum(CAST(abs(est_slots / 8.0 - jaccard) AS DECIMAL(18,6)))
                  AS DOUBLE) / count(*), 6) AS mean_abs_err
FROM b GROUP BY est_slots
"""

def q_e1_prefix_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1 boilerplate-prefix census: per source, how many 20-char
    document prefixes are shared by >= 3 docs and how much of the
    source they cover — the header/template detector that runs before
    span dedup (shared prefixes are the cheapest boilerplate signal;
    the reference's exact-dup key is the same idea,
    /root/reference/tfrecorder/beam_pipeline.py routes on full-row
    identity). Plan: one scan -> (source, prefix) partial counts
    (key space bounded by distinct prefixes) -> |sources|-row rollup
    of integer counts."""
    docs = _t(spark, sf_dir, "documents")
    counts = (
        docs.select(
            "source", F.expr("substring(text, 1, 20)").alias("__p")
        )
        .groupBy("source", "__p")
        .agg(F.count(F.lit(1)).cast("long").alias("__n"))
    )
    return (
        counts.groupBy("source")
        .agg(
            F.sum("__n").cast("long").alias("n_docs"),
            F.sum(F.when(F.col("__n") >= 3, 1).otherwise(0))
            .cast("long")
            .alias("n_boiler_prefixes"),
            F.sum(F.when(F.col("__n") >= 3, F.col("__n")).otherwise(0))
            .cast("long")
            .alias("n_boiler_docs"),
            F.max("__n").cast("long").alias("max_prefix_group"),
        )
        .select(
            "source",
            "n_docs",
            "n_boiler_prefixes",
            "n_boiler_docs",
            F.round(F.col("n_boiler_docs") / F.col("n_docs"), 6).alias(
                "boiler_share"
            ),
            "max_prefix_group",
        )
    )

ORACLE_E1_PREFIX_BOILERPLATE = """
WITH c AS (
  SELECT source, substr(text, 1, 20) AS p, count(*)::BIGINT AS n
  FROM documents GROUP BY source, p
)
SELECT source, sum(n)::BIGINT AS n_docs,
       sum(CASE WHEN n >= 3 THEN 1 ELSE 0 END)::BIGINT AS n_boiler_prefixes,
       sum(CASE WHEN n >= 3 THEN n ELSE 0 END)::BIGINT AS n_boiler_docs,
       round(sum(CASE WHEN n >= 3 THEN n ELSE 0 END)::DOUBLE / sum(n), 6)
         AS boiler_share,
       max(n)::BIGINT AS max_prefix_group
FROM c GROUP BY source
"""

def q_e1_dup_length_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1xE3 curation cross-check: the point-biserial correlation
    between exact-duplicate membership and document length — IS
    duplication length-biased? If dups skew short (boilerplate,
    templates) a naive keep-one dedup silently shifts the length
    distribution the mixture was tuned on, and length quotas must be
    re-fit AFTER dedup, not before. Plan: one text-keyed group-size
    count joined back on the same key (the exact-dedup shuffle,
    reused as-is), then a single 1-row aggregate of exact
    decimal(38,0) sufficient statistics; the Pearson form of the
    point-biserial runs in doubles only in the final expression,
    written in oracle operation order."""
    docs = _t(spark, sf_dir, "documents").select(
        "text", F.col("n_chars").cast("long").alias("__len")
    )
    sizes = docs.groupBy("text").agg(F.count(F.lit(1)).alias("__gn"))
    marked = (
        docs.join(sizes, "text")
        .withColumn(
            "__d",
            F.when(F.col("__gn") > 1, 1).otherwise(0).cast("long"),
        )
    )
    stats = marked.agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum("__d").cast("long").alias("__nd"),
        F.sum(F.col("__len").cast("decimal(38,0)")).alias("__sy"),
        F.sum(F.expr("CAST(__len AS DECIMAL(38,0)) * __len")).alias("__syy"),
        F.sum(F.expr("CAST(__d AS DECIMAL(38,0)) * __len")).alias("__sxy"),
    )
    return stats.select(
        F.col("__n").alias("n_docs"),
        F.col("__nd").alias("n_dup_docs"),
        F.round(
            F.expr("CAST(__sxy AS DOUBLE) / nullif(CAST(__nd AS DOUBLE), 0.0)"),
            6,
        ).alias("mean_len_dup"),
        F.round(
            F.expr(
                "(CAST(__sy AS DOUBLE) - CAST(__sxy AS DOUBLE))"
                " / nullif(CAST(__n - __nd AS DOUBLE), 0.0)"
            ),
            6,
        ).alias("mean_len_uniq"),
        F.round(
            F.expr(
                "(CAST(__n AS DOUBLE) * CAST(__sxy AS DOUBLE)"
                " - CAST(__nd AS DOUBLE) * CAST(__sy AS DOUBLE))"
                " / nullif(sqrt((CAST(__n AS DOUBLE) * CAST(__nd AS DOUBLE)"
                " - CAST(__nd AS DOUBLE) * CAST(__nd AS DOUBLE))"
                " * (CAST(__n AS DOUBLE) * CAST(__syy AS DOUBLE)"
                " - CAST(__sy AS DOUBLE) * CAST(__sy AS DOUBLE))), 0.0)"
            ),
            6,
        ).alias("r_pb"),
    )

ORACLE_E1_DUP_LENGTH_BIAS = """
WITH sizes AS (
  SELECT text, count(*)::BIGINT AS gn FROM documents GROUP BY text
),
m AS (
  SELECT CASE WHEN s.gn > 1 THEN 1 ELSE 0 END AS d, d0.n_chars AS len
  FROM documents d0 JOIN sizes s USING (text)
),
stats AS (
  SELECT count(*)::BIGINT AS n, sum(d)::BIGINT AS nd,
         sum(CAST(len AS HUGEINT)) AS sy,
         sum(CAST(len AS HUGEINT) * len) AS syy,
         sum(CAST(d AS HUGEINT) * len) AS sxy
  FROM m
)
SELECT n AS n_docs, nd AS n_dup_docs,
       round(CAST(sxy AS DOUBLE) / nullif(CAST(nd AS DOUBLE), 0.0), 6)
         AS mean_len_dup,
       round((CAST(sy AS DOUBLE) - CAST(sxy AS DOUBLE))
             / nullif(CAST(n - nd AS DOUBLE), 0.0), 6) AS mean_len_uniq,
       round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(nd AS DOUBLE) * CAST(sy AS DOUBLE))
             / nullif(sqrt((CAST(n AS DOUBLE) * CAST(nd AS DOUBLE)
                            - CAST(nd AS DOUBLE) * CAST(nd AS DOUBLE))
                           * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                              - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
                      0.0), 6) AS r_pb
FROM stats
"""

def q_e1_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1 dedup tuning curve: for Jaccard thresholds 0.3..0.8, how
    many verified near-dup pairs survive and how many documents the
    greedy keep-smallest-id rule would drop — the aggressiveness
    curve you read BEFORE committing a threshold to a 100 TB dedup
    run (0.1 too aggressive eats paraphrases; 0.1 too lax keeps
    templates). Plan: the expensive two-stage pipeline
    (MinHash+LSH propose, exact-Jaccard verify) runs ONCE; the sweep
    is a 6-row threshold literal theta-joined against the bounded
    verified-pair frame — re-thresholding is free, re-verifying is
    not. Comparison is on the 6dp-rounded jaccard in both engines so
    boundary pairs can't flip."""
    # localCheckpoint: the verified-pair frame is tiny (near-dup pairs,
    # not corpus rows) but its PLAN carries the whole verify join —
    # without pinning it, the 6-way theta-join below re-evaluates the
    # shingle-intersection expressions once per threshold row (measured
    # 33s -> 12s at sf0.1).
    pairs = (
        dedup.lsh_verified_pairs(_t(spark, sf_dir, "documents"), "text", "doc_id")
        .select("id_b", F.round("jaccard", 6).alias("__j"))
        .localCheckpoint()
    )
    th = spark.createDataFrame(
        [(0.3,), (0.4,), (0.5,), (0.6,), (0.7,), (0.8,)], "threshold double"
    )
    # Inner theta-join so the 6-row threshold table is the ACTUAL
    # broadcast build side (a left-outer join cannot broadcast its
    # preserved side — the old hint was silently ignored, r6 advice);
    # thresholds with zero surviving pairs are restored by a 6-row
    # left join at the end.
    counts = (
        pairs.join(
            F.broadcast(th), pairs["__j"] >= th["threshold"], "inner"
        )
        .groupBy("threshold")
        .agg(
            F.count("id_b").cast("long").alias("n_pairs"),
            F.countDistinct("id_b").cast("long").alias("n_docs_dropped"),
        )
    )
    return th.join(F.broadcast(counts), "threshold", "left").select(
        "threshold",
        F.coalesce("n_pairs", F.lit(0)).cast("long").alias("n_pairs"),
        F.coalesce("n_docs_dropped", F.lit(0))
        .cast("long")
        .alias("n_docs_dropped"),
    )

def _oracle_threshold_sweep() -> str:
    return f"""
WITH verified AS ({_oracle_lsh_verified(0.25, 0.3)}),
th AS (SELECT unnest([0.3, 0.4, 0.5, 0.6, 0.7, 0.8]) AS threshold)
SELECT th.threshold, count(v.id_b)::BIGINT AS n_pairs,
       count(DISTINCT v.id_b)::BIGINT AS n_docs_dropped
FROM th LEFT JOIN verified v ON v.jaccard >= th.threshold
GROUP BY th.threshold
"""

def q_e1_lexical_semantic_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1 method-agreement audit: how much do LEXICAL near-dup pairs
    (MinHash+LSH -> exact shingle Jaccard >= 0.3) and SEMANTIC
    near-dup pairs ((label x IVF-cell)-blocked embedding cosine
    >= 0.3, the SemDeDup partition) overlap?
    Lexical dedup catches templates and near-verbatim copies;
    semantic catches paraphrase — low agreement means running only
    one tier leaves the other tier's duplicates in the corpus, and
    the Jaccard-style overlap here is the number that justifies (or
    retires) the second pass. Plan: both pair pipelines are
    sub-quadratic and bounded (LSH bands / label blocks), and each is
    materialized ONCE (checkpointed — each feeds its own count AND
    the intersection join; un-pinned, both expensive pipelines ran
    twice, measured 16.3s -> ~half at sf0.1, r7); the agreement is
    one equi-join of two small canonical (a < b) pair frames plus
    three 1-row counts — no new corpus pass."""
    docs = _t(spark, sf_dir, "documents")

    # r11 continuation: the two pair pipelines are independent — submit
    # both eager checkpoints concurrently (guide §2.6; the
    # e4_incident_overlap pattern) so the semantic pipeline's tasks
    # back-fill the cores the lexical pipeline's straggler tail leaves
    # idle, instead of running strictly after it.
    from concurrent.futures import ThreadPoolExecutor

    def _mk_lex():
        return (
            dedup.lsh_verified_pairs(docs, "text", "doc_id")
            .select("id_a", "id_b")
            .localCheckpoint(eager=True)
        )

    def _mk_sem():
        return (
            _sem_neardup_pairs(spark, sf_dir)
            .select("id_a", "id_b")
            .localCheckpoint(eager=True)
        )

    with ThreadPoolExecutor(max_workers=2) as pool:
        f_lex, f_sem = pool.submit(_mk_lex), pool.submit(_mk_sem)
        lex, sem = f_lex.result(), f_sem.result()
    n_lex = lex.agg(F.count(F.lit(1)).cast("long").alias("n_lexical"))
    n_sem = sem.agg(F.count(F.lit(1)).cast("long").alias("n_semantic"))
    n_both = lex.join(sem, ["id_a", "id_b"]).agg(
        F.count(F.lit(1)).cast("long").alias("n_both")
    )
    return (
        n_lex.crossJoin(F.broadcast(n_sem))
        .crossJoin(F.broadcast(n_both))
        .select(
            "n_lexical",
            "n_semantic",
            "n_both",
            F.round(
                F.expr(
                    "CAST(n_both AS DOUBLE)"
                    " / nullif(CAST(n_lexical + n_semantic - n_both"
                    " AS DOUBLE), 0.0)"
                ),
                6,
            ).alias("agreement"),
        )
    )

def _oracle_lexical_semantic_agreement() -> str:
    return f"""
WITH lex AS (SELECT id_a, id_b FROM ({_oracle_lsh_verified(0.25, 0.3)})),
sem AS (SELECT id_a, id_b FROM ({ORACLE_E1_EMB_NEARDUP})),
b AS (SELECT count(*)::BIGINT AS n_both FROM lex JOIN sem USING (id_a, id_b)),
l AS (SELECT count(*)::BIGINT AS n_lexical FROM lex),
s2 AS (SELECT count(*)::BIGINT AS n_semantic FROM sem)
SELECT n_lexical, n_semantic, n_both,
       round(CAST(n_both AS DOUBLE)
             / nullif(CAST(n_lexical + n_semantic - n_both AS DOUBLE), 0.0),
             6) AS agreement
FROM l CROSS JOIN s2 CROSS JOIN b
"""

def q_e1_cluster_inflation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1 transitivity audit: connected components MERGE by chaining
    (A~B, B~C puts A with C even when A and C were never verified as
    similar), so a cluster of size s claims C(s,2) duplicate pairs
    while only n_verified were actually checked. The inflation ratio
    implied/verified is the over-merge alarm — near 1.0 means tight
    clusters; high means chains are gluing unrelated documents and
    the keep-one policy is deleting originals. Plan: the verified
    pair frame (checkpoint-backed) feeds BOTH the count and the
    existing min-label CC unchanged; sizes and the final ratio are
    cluster-bounded aggregates joined as 1-row broadcasts."""
    # localCheckpoint (r11): the pair frame is consumed TWICE — the
    # n_pairs aggregate and the CC. duplicate_clusters persists its
    # input only for ITS OWN lifetime (it unpersists after the
    # union-find collect), so without a pin the n_pairs consumer
    # re-executes the whole fused LSH+verify pipeline at final-query
    # time (measured: ~2.4 s of the 6.6 s wall re-spent on the second
    # pass at sf0.1). The frame itself is tiny (verified near-dup
    # pairs), so the pin is bounded.
    pairs = dedup.lsh_verified_pairs(
        _t(spark, sf_dir, "documents"), "text", "doc_id",
        min_est_jaccard=0.5, threshold=0.5,
    ).localCheckpoint(eager=True)
    n_pairs = pairs.agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    clusters = dedup.duplicate_clusters(pairs)
    sizes = clusters.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("__sz")
    ).where(F.col("__sz") >= 2)
    agg = sizes.agg(
        F.count(F.lit(1)).cast("long").alias("n_clusters"),
        F.coalesce(F.sum("__sz"), F.lit(0)).cast("long").alias(
            "n_clustered_docs"
        ),
        F.coalesce(F.sum(F.expr("__sz * (__sz - 1) div 2")), F.lit(0))
        .cast("long")
        .alias("n_implied_pairs"),
    )
    return n_pairs.crossJoin(F.broadcast(agg)).select(
        "n_pairs",
        "n_clusters",
        "n_clustered_docs",
        "n_implied_pairs",
        F.round(
            F.expr(
                "CAST(n_implied_pairs AS DOUBLE)"
                " / nullif(CAST(n_pairs AS DOUBLE), 0.0)"
            ),
            6,
        ).alias("inflation"),
    )

def _oracle_cluster_inflation() -> str:
    return f"""
WITH RECURSIVE verified AS ({_oracle_lsh_verified(0.5, 0.5)}),
edges AS (
  SELECT id_a AS a, id_b AS b FROM verified
  UNION
  SELECT id_b, id_a FROM verified
),
reach(id, r) AS (
  SELECT a, a FROM edges
  UNION
  SELECT e.a, reach.r FROM edges e JOIN reach ON reach.id = e.b
),
clusters AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id),
sizes AS (
  SELECT cluster_id, count(*)::BIGINT AS sz FROM clusters GROUP BY cluster_id
),
np AS (SELECT count(*)::BIGINT AS n_pairs FROM verified),
agg AS (
  SELECT count(*)::BIGINT AS n_clusters,
         coalesce(sum(sz), 0)::BIGINT AS n_clustered_docs,
         coalesce(sum(sz * (sz - 1) // 2), 0)::BIGINT AS n_implied_pairs
  FROM sizes WHERE sz >= 2
)
SELECT np.n_pairs, agg.n_clusters, agg.n_clustered_docs,
       agg.n_implied_pairs,
       round(CAST(agg.n_implied_pairs AS DOUBLE)
             / nullif(CAST(np.n_pairs AS DOUBLE), 0.0), 6) AS inflation
FROM np CROSS JOIN agg
"""

def q_e1_fuzzy_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1 fuzzy eval decontamination: how many EVAL documents
    (doc_id % 10 == 0, the incremental-dedup batch convention) have a
    NEAR-duplicate in the training corpus — exact n-gram containment
    (e1_contamination) misses paraphrased or lightly-edited leakage,
    which is exactly what published decontamination pipelines hunt
    with MinHash. Plan: the asymmetric LSH band join (index never
    self-joins, cost linear in eval size) + exact-Jaccard verify from
    incremental_neardup_pairs, reused unchanged; the readout is one
    distinct count over the bounded pair frame plus a 1-row eval
    count."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.incremental_neardup_pairs(
        docs.where(F.col("doc_id") % 10 != 0),
        docs.where(F.col("doc_id") % 10 == 0),
        "text",
        "doc_id",
    )
    n_eval = docs.where(F.col("doc_id") % 10 == 0).agg(
        F.count(F.lit(1)).cast("long").alias("n_eval")
    )
    n_cont = pairs.agg(
        F.countDistinct("id_b").cast("long").alias("n_contaminated")
    )
    return n_eval.crossJoin(F.broadcast(n_cont)).select(
        "n_eval",
        "n_contaminated",
        F.round(
            F.expr(
                "CAST(n_contaminated AS DOUBLE) / CAST(n_eval AS DOUBLE)"
            ),
            6,
        ).alias("contaminated_share"),
    )

def _oracle_fuzzy_contamination() -> str:
    return f"""
WITH pairs AS ({_oracle_incremental_dedup(0.25, 0.3)}),
ev AS (
  SELECT count(*)::BIGINT AS n_eval FROM documents WHERE doc_id % 10 = 0
),
c AS (SELECT count(DISTINCT id_b)::BIGINT AS n_contaminated FROM pairs)
SELECT ev.n_eval, c.n_contaminated,
       round(CAST(c.n_contaminated AS DOUBLE) / CAST(ev.n_eval AS DOUBLE), 6)
         AS contaminated_share
FROM ev CROSS JOIN c
"""

def q_e1_label_inconsistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1 label-consistency audit: byte-identical documents carrying
    DIFFERENT lang labels — impossible if labeling were a function of
    content, so every conflicting group is a measured labeling-error
    floor (and a trainer feeding lang-conditioned mixtures is mixing
    mislabeled rows). Plan: one text-keyed aggregate (the exact-dedup
    shuffle) counting rows and distinct labels per group, then a
    1-row rollup — no joins, no second text pass."""
    docs = _t(spark, sf_dir, "documents")
    groups = docs.groupBy("text").agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.countDistinct("lang").cast("long").alias("__nl"),
    )
    dup_groups = groups.where(F.col("__n") > 1)
    return dup_groups.agg(
        F.count(F.lit(1)).cast("long").alias("n_dup_groups"),
        F.sum(F.when(F.col("__nl") > 1, 1).otherwise(0))
        .cast("long")
        .alias("n_conflicting_groups"),
        F.coalesce(
            F.sum(F.when(F.col("__nl") > 1, F.col("__n"))), F.lit(0)
        )
        .cast("long")
        .alias("n_docs_in_conflict"),
        F.round(
            F.expr(
                "sum(CASE WHEN __nl > 1 THEN 1 ELSE 0 END)"
                " / nullif(CAST(count(1) AS DOUBLE), 0.0)"
            ),
            6,
        ).alias("conflict_share"),
    )

ORACLE_E1_LABEL_INCONSISTENCY = """
WITH g AS (
  SELECT text, count(*)::BIGINT AS n,
         count(DISTINCT lang)::BIGINT AS nl
  FROM documents GROUP BY text
),
d AS (SELECT * FROM g WHERE n > 1)
SELECT count(*)::BIGINT AS n_dup_groups,
       sum(CASE WHEN nl > 1 THEN 1 ELSE 0 END)::BIGINT
         AS n_conflicting_groups,
       coalesce(sum(CASE WHEN nl > 1 THEN n END), 0)::BIGINT
         AS n_docs_in_conflict,
       round(sum(CASE WHEN nl > 1 THEN 1 ELSE 0 END)
             / nullif(CAST(count(*) AS DOUBLE), 0.0), 6) AS conflict_share
FROM d
"""


def q_e1_shingle_size_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1 shingle-granularity calibration: corpus shingle statistics at
    k in (3, 5, 8) — the third LSH tuning axis next to the band sweep
    and the threshold sweep (short shingles saturate and over-merge,
    long ones miss paraphrase edits; this sweep is what picks the k
    those two sweeps then tune around). Per k: distinct-shingle count,
    distinct (doc, shingle) incidences, shingles appearing in > 1 doc,
    their share, and mean distinct shingles per doc. Plan (r10 verdict
    item 8 — this was a 23.4 30x ratio): per arm, the per-doc shingle
    set is deduped IN-ROW (``array_distinct`` over the hashed set —
    the oracle's own ``list_distinct`` form), so the exploded
    (doc, h) incidences are unique BY CONSTRUCTION and the cross-row
    ``.distinct()`` — previously a full extra shuffle+sort of every
    incidence per arm — is gone entirely; ``doc_id`` is not needed
    downstream either (n_incidences is a sum, mean_per_doc divides by
    the broadcast doc count), so the one remaining shuffle per arm
    carries bare 8-byte hashes into a partial-aggregated count. The
    arms shingle one shared lowered-text localCheckpoint instead of
    re-reading parquet and re-lowering the corpus three times (same
    sharing shape as e6_pack_curve's one tokenization across
    capacities); the n_docs one-row frame is checkpointed once and
    broadcast into all three arms; every count is an exact integer and
    only the two share expressions divide, in the same operation order
    as the oracle."""
    from functools import reduce

    from ..operators.dedup import hashed_shingle_expr

    docs = _t(spark, sf_dir, "documents")
    # r11: spread before the checkpoint — the checkpointed frame keeps
    # its partition count, and all three per-arm shingle explodes
    # inherit it; a one-file scan would otherwise serialize every arm
    # through one task (metadata-gated; no-op at scale).
    from ..operators.dedup import _spread

    lowered = _spread(docs).select(
        "doc_id", F.lower(F.col("text")).alias("__lt")
    ).localCheckpoint(eager=True)
    nd = lowered.agg(
        F.count(F.lit(1)).cast("long").alias("__nd")
    ).localCheckpoint(eager=True)
    arms = []
    for k in (3, 5, 8):
        hashed = hashed_shingle_expr("__lt", k, pre_lowered=True)
        per_h = (
            lowered.select(
                F.explode(
                    F.expr(f"array_distinct({hashed})")
                ).alias("__h")
            )
            .groupBy("__h")
            .agg(F.count(F.lit(1)).cast("long").alias("__c"))
        )
        arm = (
            per_h.agg(
                F.count(F.lit(1)).cast("long").alias("n_shingles"),
                F.sum("__c").cast("long").alias("n_incidences"),
                F.sum(F.when(F.col("__c") > 1, 1).otherwise(0))
                .cast("long")
                .alias("n_shared"),
            )
            .crossJoin(F.broadcast(nd))
            .select(
                F.lit(k).cast("long").alias("shingle_k"),
                "n_shingles",
                "n_incidences",
                "n_shared",
                F.round(
                    F.col("n_shared")
                    / F.expr("nullif(CAST(n_shingles AS DOUBLE), 0.0)"),
                    6,
                ).alias("shared_share"),
                F.round(
                    F.col("n_incidences")
                    / F.expr("nullif(CAST(__nd AS DOUBLE), 0.0)"),
                    6,
                ).alias("mean_per_doc"),
            )
        )
        arms.append(arm)
    return reduce(lambda a, b: a.unionByName(b), arms)


def _oracle_shingle_size_sweep() -> str:
    selects = []
    for k in (3, 5, 8):
        selects.append(f"""SELECT {k}::BIGINT AS shingle_k,
       count(*)::BIGINT AS n_shingles,
       sum(c)::BIGINT AS n_incidences,
       sum(CASE WHEN c > 1 THEN 1 ELSE 0 END)::BIGINT AS n_shared,
       round(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END)
             / nullif(CAST(count(*) AS DOUBLE), 0.0), 6) AS shared_share,
       round(sum(c) / nullif(CAST((SELECT count(*) FROM documents) AS DOUBLE),
                             0.0), 6) AS mean_per_doc
FROM (
  SELECT h, count(*)::BIGINT AS c FROM (
    SELECT DISTINCT doc_id,
           unnest(list_distinct(list_transform(
             generate_series(1, greatest(length(text)-{k - 1}, 1)),
             i -> ('0x' || substr(md5(substr(lower(text), i, {k})), 1, 8))::BIGINT
           ))) AS h
    FROM documents
  ) GROUP BY h
)""")
    return "\nUNION ALL\n".join(selects)


def q_e1_soft_dedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1: SOFT dedup — keep every row, weight it by the inverse of its
    normalized-text duplicate-cluster size (operators/dedup.py
    soft_dedup_weights), so repeated boilerplate contributes one
    document's worth of sampling mass instead of being dropped. The
    policy LLM pipelines use when duplicates are legitimate (licenses,
    templates) and the epoch sampler consumes weights. One digest
    groupBy joined back; digests shuffle, documents don't."""
    return dedup.soft_dedup_weights(
        _t(spark, sf_dir, "documents"), "text", "doc_id"
    ).select("doc_id", "cluster_size", "weight", "is_canonical")


ORACLE_E1_SOFT_DEDUP_WEIGHTS = """
WITH n AS (
  SELECT doc_id,
         trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS norm
  FROM documents
),
s AS (SELECT norm, count(*) AS cs, min(doc_id) AS canon FROM n GROUP BY norm)
SELECT doc_id,
       CAST(cs AS BIGINT) AS cluster_size,
       round(CAST(1.0 AS DOUBLE) / cs, 6) AS weight,
       CAST(CASE WHEN doc_id = canon THEN 1 ELSE 0 END AS BIGINT) AS is_canonical
FROM n JOIN s USING (norm)
"""
