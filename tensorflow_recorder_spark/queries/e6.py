"""E6 curation queries (packing, mixtures, quotas, privacy, shards, planners) + their oracles.

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
    ORACLE_E3_BPE_ENCODE,
    ORACLE_E3_QUALITY,
    _PACK_REC,
    _Q_MWL,
    _Q_PUNCT,
    _Q_SCORE,
    _Q_STOPR,
    _oracle_dup_clusters,
    _oracle_keep_best,
    _t,
)


def q_e6_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E6: the one-row dataset-card metrics block every corpus release
    publishes — document/token/char totals, distinct sources and
    languages, the source-distribution entropy (mixture skew at a
    glance), exact-duplicate rate, and mean quality score. ONE
    partial-aggregated pass over the corpus plus two
    metadata-cardinality aggregates (source histogram for the entropy,
    digest groupBy for the dup rate); entropy and means are fixed
    double expressions over exact integer/decimal sums."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.size(
        F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != "")
    ).cast("long")
    base = docs.select(
        toks.alias("__tok"),
        F.col("n_chars"),
        F.col("source"),
        F.col("lang"),
        F.sha2(F.col("text"), 256).alias("__h"),
        F.expr(text.quality_exprs("text")["score"]).alias("__q"),
    )
    totals = base.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("__tok").cast("long").alias("n_tokens"),
        F.sum("n_chars").cast("long").alias("n_chars"),
        F.countDistinct("source").cast("long").alias("n_sources"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        F.countDistinct("__h").cast("long").alias("n_unique_texts"),
        F.round(
            F.sum(F.col("__q").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("mean_quality"),
    )
    src = base.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("__n"))
    tot = src.agg(F.sum("__n").cast("double").alias("__t"))
    p = F.col("__n").cast("double") / F.col("__t")
    ent = src.crossJoin(F.broadcast(tot)).agg(
        F.round(-F.sum(p * F.log2(p)), 6).alias("source_entropy_bits")
    )
    return totals.crossJoin(F.broadcast(ent)).select(
        "n_docs",
        "n_tokens",
        "n_chars",
        "n_sources",
        "n_langs",
        F.round(
            F.lit(1.0)
            - F.col("n_unique_texts").cast("double") / F.col("n_docs").cast("double"),
            6,
        ).alias("exact_dup_rate"),
        "mean_quality",
        "source_entropy_bits",
    )

def _oracle_dataset_card() -> str:
    score = _Q_SCORE.format(punct=_Q_PUNCT, stopr=_Q_STOPR, mwl=_Q_MWL)
    return f"""
WITH base AS (
  SELECT CAST(len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                              x -> x <> '')) AS BIGINT) AS tok,
         n_chars, source, lang, sha256(text) AS h,
         {score} AS q
  FROM documents
),
totals AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(tok) AS BIGINT) AS n_tokens,
         CAST(sum(n_chars) AS BIGINT) AS n_chars,
         CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
         CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
         CAST(count(DISTINCT h) AS BIGINT) AS n_unique,
         round(CAST(sum(CAST(q AS DECIMAL(18,6))) AS DOUBLE)
               / CAST(count(*) AS DOUBLE), 6) AS mean_quality
  FROM base
),
src AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM base GROUP BY 1),
ent AS (
  SELECT round(-sum((n::DOUBLE / t) * log2(n::DOUBLE / t)), 6)
           AS source_entropy_bits
  FROM src, (SELECT sum(n)::DOUBLE AS t FROM src)
)
SELECT n_docs, n_tokens, n_chars, n_sources, n_langs,
       round(1.0 - n_unique::DOUBLE / n_docs, 6) AS exact_dup_rate,
       mean_quality, source_entropy_bits
FROM totals, ent
"""

def q_e6_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (greedy bin-packing of docs into fixed
    token-budget training sequences): deterministic shard-then-pack, the
    text column never enters the Python stage — only (id, shard,
    n_tokens) shuffles. Oracle: a recursive CTE replaying the greedy
    pass per shard."""
    from ..operators.packing import pack_sequences

    docs = _t(spark, sf_dir, "documents")
    return pack_sequences(docs, "doc_id", "text", capacity=256, nshards=8)

def q_e6_pack_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing-efficiency rollup (bins used / fill ratio per shard) —
    the dataset-card view of context-window waste for a packing run."""
    from ..operators.packing import pack_sequences, pack_stats

    docs = _t(spark, sf_dir, "documents")
    packed = pack_sequences(docs, "doc_id", "text", capacity=256, nshards=8)
    return pack_stats(packed, capacity=256)

def q_e6_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted data-mixture draw (50/20/20/10 over four sources, 6k
    token budget): per-source rate = min(1, weight*budget/total_tokens),
    membership a pure md5-bucket function — retry/engine-stable. src0's
    50% share exceeds its corpus, exercising the rate cap."""
    from ..operators.packing import token_count_expr
    from ..operators.sampling import mixture_sample

    docs = _t(spark, sf_dir, "documents")
    out = mixture_sample(
        docs,
        "source",
        "doc_id",
        token_count_expr("text"),
        {"src0": 0.5, "src1": 0.2, "src2": 0.2, "src3": 0.1},
        token_budget=6000.0,
    )
    return out.select(
        "doc_id",
        "source",
        "n_tokens",
        F.round("sample_rate", 6).alias("sample_rate"),
    )

ORACLE_E6_MIXTURE_SAMPLE = """
WITH t AS (
  SELECT doc_id, source,
         CAST(len(regexp_split_to_array(lower(text), '\\s+')) AS BIGINT) AS n_tokens,
         ('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
           % 1000000 AS bucket
  FROM documents
), r AS (
  SELECT source,
         least(1.0,
               (CASE source WHEN 'src0' THEN 0.5 WHEN 'src1' THEN 0.2
                            WHEN 'src2' THEN 0.2 WHEN 'src3' THEN 0.1
                            ELSE 0.0 END * 6000.0) / sum(n_tokens)) AS sample_rate
  FROM t GROUP BY source
)
SELECT t.doc_id, t.source, t.n_tokens, round(r.sample_rate, 6) AS sample_rate
FROM t JOIN r USING (source)
WHERE t.bucket < CAST(floor(r.sample_rate * 1000000.0) AS BIGINT)
"""

def q_e6_curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed curation plan (plans/curate.py): quality floor 0.75
    -> exact dedup -> 800-token source quota over 2 shards -> epoch
    shuffle key. Cheap narrow filters run first so each shuffle moves
    an already-shrunk corpus; the whole chain is a pure function of row
    content, oracle-checked end-to-end."""
    from ..operators.packing import token_count_expr
    from ..plans.curate import curate_corpus

    docs = _t(spark, sf_dir, "documents")
    out = curate_corpus(
        docs, "text", "doc_id", "source",
        token_count=token_count_expr("text"),
        min_quality=0.75, dedup=True, quota_tokens=800, quota_shards=2,
    )
    return out.select("doc_id", "source", "n_tokens", "shuffle_key")

def _oracle_curate() -> str:
    score = _Q_SCORE.format(punct=_Q_PUNCT, stopr=_Q_STOPR, mwl=_Q_MWL)
    return f"""
WITH q AS (
  SELECT doc_id, source, text FROM documents
  WHERE round({score}, 6) >= 0.75
), d AS (
  SELECT q.doc_id, q.source, q.text FROM q
  JOIN (SELECT text, min(doc_id) AS doc_id FROM q GROUP BY text) k
    ON q.text = k.text AND q.doc_id = k.doc_id
), t AS (
  SELECT doc_id, source,
         CAST(len(regexp_split_to_array(lower(text), '\\s+')) AS BIGINT) AS n_tokens,
         ('0x' || substr(md5('quota:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
           % 1000000 AS b
  FROM d
), c AS (
  SELECT *, coalesce(sum(n_tokens) OVER (
           PARTITION BY source, b % 2 ORDER BY b, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
  FROM t
)
SELECT doc_id, source, n_tokens,
       md5('epoch0:' || CAST(doc_id AS VARCHAR)) AS shuffle_key
FROM c WHERE cum + n_tokens <= 400
"""

def q_e6_shuffle_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch shuffle: every doc gets its md5 shuffle key
    (sorting by it is the training order). Pure narrow projection —
    at scale the materialization is a range-partitioned sort on the
    uniform key, never orderBy(rand())."""
    from ..operators.sampling import with_shuffle_key

    docs = _t(spark, sf_dir, "documents")
    return with_shuffle_key(docs, "doc_id").select("doc_id", "shuffle_key")

ORACLE_E6_SHUFFLE_ORDER = """
SELECT doc_id, md5('shuffle:' || CAST(doc_id AS VARCHAR)) AS shuffle_key
FROM documents
"""

def q_e6_source_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token quota (anti-domination curation): each source
    contributes at most 800 tokens, filled in deterministic hash order
    across 2 shards (400 each) — the window sort is bounded by a shard,
    not a whole source."""
    from ..operators.packing import token_count_expr
    from ..operators.sampling import source_token_quota

    docs = _t(spark, sf_dir, "documents")
    out = source_token_quota(
        docs, "source", "doc_id", token_count_expr("text"),
        quota_tokens=800, nshards=2,
    )
    return out.select("doc_id", "source", "n_tokens")

ORACLE_E6_SOURCE_QUOTA = """
WITH t AS (
  SELECT doc_id, source,
         CAST(len(regexp_split_to_array(lower(text), '\\s+')) AS BIGINT) AS n_tokens,
         ('0x' || substr(md5('quota:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
           % 1000000 AS b
  FROM documents
), c AS (
  SELECT *, coalesce(sum(n_tokens) OVER (
           PARTITION BY source, b % 2 ORDER BY b, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
  FROM t
)
SELECT doc_id, source, n_tokens FROM c WHERE cum + n_tokens <= 400
"""

ORACLE_E6_SEQUENCE_PACK = (
    _PACK_REC
    + "SELECT doc_id, shard, bin_id, bin_offset, n_tokens FROM rec"
)

ORACLE_E6_PACK_STATS = (
    _PACK_REC
    + """
SELECT shard,
       max(bin_id) + 1 AS n_bins,
       count(*) AS n_docs,
       sum(n_tokens) AS total_tokens,
       round(sum(n_tokens)::DOUBLE / ((max(bin_id) + 1) * 256.0), 6) AS fill_ratio
FROM rec GROUP BY shard
"""
)

def q_e6_dsir_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance scores: every document scored by how src0-like
    its hashed unigram+bigram profile is (target = source 'src0' docs,
    source distribution = whole corpus) — the classifier-free data
    selection weight for pretraining mixtures."""
    from ..operators.selection import dsir_log_ratios, dsir_scores

    docs = _t(spark, sf_dir, "documents")
    target = docs.where(F.col("source") == "src0")
    ratios = dsir_log_ratios(docs, target, "text", buckets=1024)
    return dsir_scores(docs, ratios, "text", "doc_id", buckets=1024)

ORACLE_E6_DSIR = r"""
WITH toks AS (
  SELECT doc_id, source,
         list_filter(regexp_split_to_array(lower(text), '\s+'), t -> t <> '') AS t
  FROM documents
),
feats AS (
  SELECT doc_id, source,
         ('0x' || substr(md5('f:' || g), 1, 8))::BIGINT % 1024 AS bucket
  FROM (
    SELECT doc_id, source, unnest(t) AS g FROM toks
    UNION ALL
    SELECT doc_id, source, t[i.i] || ' ' || t[i.i + 1] AS g
    FROM toks, UNNEST(range(1, len(t))) AS i(i)
  )
),
tc AS (SELECT bucket, count(*) AS tn FROM feats WHERE source = 'src0' GROUP BY bucket),
sc AS (SELECT bucket, count(*) AS sn FROM feats GROUP BY bucket),
tt AS (SELECT count(*) + 1024 AS t_total FROM feats WHERE source = 'src0'),
st AS (SELECT count(*) + 1024 AS s_total FROM feats),
ratios AS (
  SELECT sc.bucket,
         round(ln((coalesce(tc.tn, 0) + 1.0) / t_total)
               - ln((sc.sn + 1.0) / s_total), 9) AS log_ratio
  FROM sc LEFT JOIN tc USING (bucket) CROSS JOIN tt CROSS JOIN st
),
scored AS (
  SELECT f.doc_id, count(*) AS n_features,
         round(avg(coalesce(r.log_ratio, 0.0)), 6) AS dsir_score
  FROM feats f LEFT JOIN ratios r USING (bucket)
  GROUP BY f.doc_id
)
SELECT d.doc_id,
       CAST(coalesce(s.n_features, 0) AS BIGINT) AS n_features,
       coalesce(s.dsir_score, 0.0) AS dsir_score
FROM documents d LEFT JOIN scored s USING (doc_id)
"""

def q_e6_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted reservoir sample (Efraimidis-Spirakis):
    75 documents drawn without replacement with probability ~ n_chars —
    the sampling half of importance resampling."""
    from ..operators.sampling import weighted_sample

    out = weighted_sample(
        _t(spark, sf_dir, "documents"), "n_chars", "doc_id", k=75
    )
    return out.select("doc_id", "priority")

ORACLE_E6_WEIGHTED_SAMPLE = """
WITH pri AS (
  SELECT doc_id,
         round(pow((('0x' || substr(md5('ws:' || doc_id::VARCHAR), 1, 8))::BIGINT
                    + 1.0) / 4294967296.0,
                   1.0 / n_chars::DOUBLE), 9) AS priority
  FROM documents
  WHERE n_chars IS NOT NULL AND n_chars > 0
)
SELECT doc_id, priority FROM (
  SELECT doc_id, priority,
         row_number() OVER (ORDER BY priority DESC, doc_id) AS rn
  FROM pri
) WHERE rn <= 75
"""

def q_e6_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum ordering of the documents corpus by length score:
    10 percentile buckets emitted interleaved, so every training-order
    prefix mixes difficulties while staying deterministic."""
    from ..operators.sampling import curriculum_order

    return curriculum_order(
        _t(spark, sf_dir, "documents"), "n_chars", "doc_id", n_buckets=10
    )

ORACLE_E6_CURRICULUM = """
WITH b AS (
  SELECT doc_id, n_chars,
         ntile(10) OVER (ORDER BY n_chars DESC, doc_id) AS bucket
  FROM documents
),
r AS (
  SELECT doc_id, bucket,
         row_number() OVER (PARTITION BY bucket
                            ORDER BY n_chars DESC, doc_id) AS rn
  FROM b
)
SELECT doc_id, CAST(bucket AS BIGINT) AS bucket,
       CAST((rn - 1) * 10 + bucket - 1 AS BIGINT) AS curriculum_pos
FROM r
"""

def q_e6_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E6: dataset snapshot diff — classify keys across two corpus
    snapshots as added/removed/changed via fingerprint compare on a
    full-outer key join. The 'new' snapshot is derived deterministically
    from documents (%17=3 removed, %17=5 edited, %17=7 duplicated under
    a shifted id)."""
    from ..operators.snapshot import snapshot_diff

    old = _t(spark, sf_dir, "documents")
    kept = old.where(F.expr("doc_id % 17 != 3")).withColumn(
        "text",
        F.when(
            F.expr("doc_id % 17 = 5"), F.concat(F.col("text"), F.lit(" (rev2)"))
        ).otherwise(F.col("text")),
    )
    added = old.where(F.expr("doc_id % 17 = 7")).withColumn(
        "doc_id", F.expr("doc_id + 100000")
    )
    new = kept.unionByName(added)
    return snapshot_diff(old, new, "doc_id", ["text", "lang", "source"])

ORACLE_E6_SNAPSHOT_DIFF = """
SELECT doc_id, 'removed' AS change FROM documents WHERE doc_id % 17 = 3
UNION ALL
SELECT doc_id, 'changed' AS change FROM documents WHERE doc_id % 17 = 5
UNION ALL
SELECT doc_id + 100000 AS doc_id, 'added' AS change
FROM documents WHERE doc_id % 17 = 7
"""

def q_e6_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E6: deterministic k-fold assignment (k=5) over documents via the
    shared md5-bucket recipe — folds reproducible across engines/runs
    with no persisted assignment table."""
    from ..operators.sampling import kfold_assign

    return kfold_assign(_t(spark, sf_dir, "documents"), "doc_id", k=5).select(
        "doc_id", "fold"
    )

ORACLE_E6_KFOLD = """
SELECT doc_id,
       ('0x' || substr(md5('kfold:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
         % 5 AS fold
FROM documents
"""

def q_e6_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E6: temperature-based mixture weighting (alpha=0.5) — per-source
    sampling weights n^alpha / sum(n^alpha) over token counts, plus the
    sample rate for a 20k-token budget; the multilingual/multi-source
    rebalancing rule."""
    from ..operators.packing import token_count_expr
    from ..operators.sampling import temperature_weights

    return temperature_weights(
        _t(spark, sf_dir, "documents"),
        "source",
        token_count_expr("text"),
        alpha=0.5,
        token_budget=20000.0,
    )

ORACLE_E6_TEMPERATURE_MIX = """
WITH t AS (
  SELECT source,
         CAST(len(regexp_split_to_array(lower(text), '\\s+')) AS BIGINT) AS tok
  FROM documents
),
tot AS (SELECT source, sum(tok) AS n_tokens FROM t GROUP BY source),
p AS (
  SELECT source, n_tokens,
         CAST(pow(CAST(n_tokens AS DOUBLE), 0.5) AS DECIMAL(28,10)) AS pw
  FROM tot
),
d AS (SELECT sum(pw) AS denom FROM p)
SELECT p.source, CAST(p.n_tokens AS BIGINT) AS n_tokens,
       round(CAST(p.pw AS DOUBLE) / CAST(d.denom AS DOUBLE), 6) AS weight,
       round(least(1.0,
                   CAST(p.pw AS DOUBLE) / CAST(d.denom AS DOUBLE)
                   * 20000.0 / CAST(p.n_tokens AS DOUBLE)), 6) AS sample_rate
FROM p, d
"""

def q_e6_data_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E6: Deequ-style data-quality expectation suite over orders —
    five constraints (completeness, uniqueness, bounds, value domain,
    volume) evaluated in ONE aggregation pass + in-plan unpivot."""
    from ..operators.audit import (
        accepted_values,
        check_expectations,
        min_value,
        not_null,
        row_count_at_least,
        unique,
    )

    return check_expectations(
        _t(spark, sf_dir, "orders"),
        [
            not_null("o_custkey"),
            unique("o_orderkey"),
            min_value("o_totalprice", 0.0),
            accepted_values("o_orderstatus", ["F", "O", "P"]),
            row_count_at_least(1),
        ],
    )

ORACLE_E6_DATA_AUDIT = """
WITH m AS (
  SELECT
    round(avg(CASE WHEN o_custkey IS NOT NULL THEN 1.0 ELSE 0.0 END), 6) AS m0,
    round(CAST(count(DISTINCT o_orderkey) AS DOUBLE)
          / count(o_orderkey), 6) AS m1,
    round(CAST(min(o_totalprice) AS DOUBLE), 6) AS m2,
    round(avg(CASE WHEN o_orderstatus IN ('F', 'O', 'P')
              THEN 1.0 ELSE 0.0 END), 6) AS m3,
    round(CAST(count(*) AS DOUBLE), 6) AS m4
  FROM orders
)
SELECT 'not_null(o_custkey)' AS check_name, m0 AS value, m0 >= 1.0 AS passed FROM m
UNION ALL SELECT 'unique(o_orderkey)', m1, m1 >= 1.0 FROM m
UNION ALL SELECT 'min(o_totalprice)>=0.0', m2, m2 >= 0.0 FROM m
UNION ALL SELECT 'accepted_values(o_orderstatus)', m3, m3 >= 1.0 FROM m
UNION ALL SELECT 'row_count>=1', m4, m4 >= 1.0 FROM m
"""

def q_e6_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E6 privacy audit: k-anonymity group sizes over the
    (nation, market segment) quasi-identifier pair of customer, k=50 —
    groups smaller than k are re-identification risks. One
    QI-cardinality groupBy."""
    from ..operators.privacy import k_anonymity_groups

    return k_anonymity_groups(
        _t(spark, sf_dir, "customer"),
        ["c_nationkey", "c_mktsegment"],
        k=50,
    )

ORACLE_E6_K_ANONYMITY = """
SELECT c_nationkey, c_mktsegment,
       CAST(count(*) AS BIGINT) AS n,
       count(*) < 50 AS at_risk
FROM customer
GROUP BY c_nationkey, c_mktsegment
"""

def q_e6_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E6: length-bucketed dynamic batching — 16-token-wide buckets,
    256-token batches, deterministic md5 intake order. Padding waste is
    bounded by the bucket width; batching is retry/engine-stable."""
    from ..operators.sampling import bucket_by_length

    docs = _t(spark, sf_dir, "documents")
    return bucket_by_length(
        docs,
        "doc_id",
        F.expr("size(filter(split(text, '\\\\s+'), t -> t <> ''))"),
        bucket_width=16,
        batch_tokens=256,
    )

ORACLE_E6_LENGTH_BUCKETS = """
WITH tok AS (
  SELECT doc_id,
         CAST(len(list_filter(regexp_split_to_array(text, '\\s+'),
                              t -> t <> '')) AS BIGINT) AS n_tokens
  FROM documents
),
b AS (
  SELECT doc_id, n_tokens,
         CAST(CASE WHEN n_tokens <= 0 THEN 0
              ELSE (n_tokens - 1) // 16 END AS BIGINT) AS bucket,
         ('0x' || substr(md5('lenbatch:' || CAST(doc_id AS VARCHAR)), 1, 8))
           ::BIGINT % 1000000 AS h
  FROM tok
)
SELECT doc_id, n_tokens, bucket,
       CAST((row_number() OVER (PARTITION BY bucket ORDER BY h, doc_id) - 1)
            // greatest(1, 256 // ((bucket + 1) * 16)) AS BIGINT)
         AS batch_in_bucket,
       CAST(greatest(1, 256 // ((bucket + 1) * 16)) AS BIGINT)
         AS rows_per_batch
FROM b
"""

def q_e6_class_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E6: inverse-frequency class weights (sklearn "balanced" rule)
    over the documents language label — the loss-reweighting table for
    an imbalanced label, one tiny groupBy + broadcast scalar."""
    from ..operators.sampling import class_weights

    return class_weights(_t(spark, sf_dir, "documents"), "lang")

ORACLE_E6_CLASS_WEIGHTS = """
WITH c AS (
  SELECT lang AS label, CAST(count(*) AS BIGINT) AS n
  FROM documents WHERE lang IS NOT NULL GROUP BY lang
),
t AS (SELECT sum(n) AS total, count(*) AS k FROM c)
SELECT c.label, c.n,
       round(CAST(t.total AS DOUBLE) / (t.k * c.n), 6) AS weight
FROM c, t
"""

def q_e6_dp_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E6: differentially-private (source, lang) histogram release of
    the corpus — Laplace(1/eps) mechanism with md5-derived
    deterministic noise (replayable/oracle-checkable; a production
    release swaps the public seed for a secret nonce)."""
    from ..operators.privacy import dp_noisy_counts

    return dp_noisy_counts(
        _t(spark, sf_dir, "documents"), ["source", "lang"], epsilon=1.0
    )

ORACLE_E6_DP_COUNTS = """
WITH c AS (
  SELECT source, lang, count(*) AS n FROM documents GROUP BY 1, 2
),
h AS (
  SELECT source, lang, n,
         (('0x' || substr(md5('dp'
             || md5(coalesce('v' || source, 'n'))
             || md5(coalesce('v' || lang, 'n'))), 1, 12))::BIGINT
          + 0.5) / 281474976710656.0 - 0.5 AS u
  FROM c
),
noised AS (
  SELECT source, lang,
         round(n + (-1.0) * sign(u) * ln(1 - 2 * abs(u)), 6) AS noisy_count
  FROM h
)
SELECT source, lang, noisy_count,
       CAST(greatest(round(noisy_count, 0), 0) AS BIGINT) AS released
FROM noised
"""

def q_e6_curate_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-4 capstone curation chain (plans/curate.py
    curate_corpus_v2): quality floor -> exact dedup -> fuzzy KEEP-BEST
    dedup (LSH pair graph -> components -> keep longest) ->
    decontamination vs the eval slice (sketched-shingle join) ->
    leakage-safe split hashed on the SAME cluster ids. Train corpus =
    doc_id % 10 != 0; benchmark = % 10 == 0. One pair graph, built
    once, reused by both dedup policy and split assignment."""
    from ..plans.curate import curate_corpus_v2

    docs = _t(spark, sf_dir, "documents")
    out = curate_corpus_v2(
        docs.where(F.col("doc_id") % 10 != 0),
        docs.where(F.col("doc_id") % 10 == 0),
        "text",
        "doc_id",
        "n_chars",
        min_quality=0.5,
    )
    return out.select("doc_id", "group_key", "split")

def _oracle_curate_v2() -> str:
    score = _Q_SCORE.format(punct=_Q_PUNCT, stopr=_Q_STOPR, mwl=_Q_MWL)
    sh = (
        "list_filter(list_distinct(list_transform("
        "generate_series(1, greatest(length(text)-4, 1)), "
        "i -> ('0x' || substr(md5(substr(lower(text), i, 5)), 1, 8))::BIGINT)), "
        "g -> g % 4 = 0)"
    )
    return f"""
WITH s1 AS (
  SELECT * FROM documents
  WHERE doc_id % 10 <> 0 AND round({score}, 6) >= 0.5
),
s2 AS (
  SELECT s1.* FROM s1
  JOIN (SELECT text, min(doc_id) AS doc_id FROM s1 GROUP BY text) k
    ON s1.text = k.text AND s1.doc_id = k.doc_id
),
s3ids AS ({_oracle_keep_best(src='s2')}),
s3 AS (SELECT s2.* FROM s2 JOIN s3ids USING (doc_id)),
tr0 AS (SELECT doc_id AS train_id, unnest({sh}) AS g FROM s3),
hot AS (SELECT g FROM tr0 GROUP BY g HAVING count(*) > 100),
tr AS (SELECT train_id, g FROM tr0 WHERE g NOT IN (SELECT g FROM hot)),
ev AS (
  SELECT doc_id AS eval_id, unnest({sh}) AS g
  FROM documents WHERE doc_id % 10 = 0
),
cont AS (
  SELECT DISTINCT train_id FROM (
    SELECT train_id, eval_id FROM tr JOIN ev USING (g)
    GROUP BY 1, 2 HAVING count(*) >= 13
  )
),
s4 AS (
  SELECT * FROM s3 WHERE doc_id NOT IN (SELECT train_id FROM cont)
),
clusters AS ({_oracle_dup_clusters(src='s2')}),
g AS (
  SELECT s4.doc_id,
         CAST(coalesce(c.cluster_id, s4.doc_id) AS BIGINT) AS group_key
  FROM s4 LEFT JOIN clusters c ON s4.doc_id = c.doc_id
)
SELECT doc_id, group_key,
       CASE WHEN b < 80 THEN 'TRAIN'
            WHEN b < 90 THEN 'VALIDATION'
            ELSE 'TEST' END AS split
FROM (
  SELECT doc_id, group_key,
         ('0x' || substr(md5(concat(':', group_key::VARCHAR)), 1, 8))::BIGINT % 100 AS b
  FROM g
)
"""

def q_e6_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E6: token-budget mixture plan — per-source sampling rates to hit
    a 10k-token target at equal source weights (the planning pass whose
    execution side is e6_mixture_sample / e6_source_quota)."""
    from ..operators.sampling import token_budget_plan

    return token_budget_plan(
        _t(spark, sf_dir, "documents"), "text", "source", budget_tokens=10000
    )

ORACLE_E6_TOKEN_BUDGET = r"""
WITH st AS (
  SELECT source,
         count(*) AS n_docs,
         sum(len(list_filter(regexp_split_to_array(lower(text), '\s+'),
                             t -> t <> ''))) AS n_tokens
  FROM documents GROUP BY source
),
k AS (SELECT count(*) AS ns FROM st)
SELECT source,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       round(1.0 / ns, 6) AS weight,
       least(1.0, round(10000.0 * (1.0 / ns) / n_tokens, 6)) AS sample_rate,
       CAST(round(n_tokens * least(1.0, round(10000.0 * (1.0 / ns) / n_tokens, 6)), 0)
            AS BIGINT) AS expected_tokens
FROM st, k
"""

def q_e6_deletion_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E6 privacy lifecycle: right-to-be-forgotten blast-radius audit.
    Tombstones (doc_id % 97 == 0) propagate to every derived asset —
    the corpus (anti-join survivors), the packed training sequences
    (any bin holding a deleted doc must re-pack, and the cost is the
    WHOLE bin's tokens), and the IVF index (cells holding deleted
    vectors need a partition rewrite; ids align doc_id == vec_id).
    Tombstones broadcast into semi/anti probes, so no asset ever
    shuffles. Oracle composes the packing recursive CTE with the IVF
    assignment CTE."""
    from ..operators.packing import pack_sequences
    from ..operators.similarity import ivf_assign
    from ..plans.deletion import deletion_impact

    docs = _t(spark, sf_dir, "documents")
    # the packed frame feeds two probes (affected bins, re-pack sum);
    # pin the greedy packing pass once
    packed = pack_sequences(
        docs, "doc_id", "text", capacity=256, nshards=8
    ).localCheckpoint(eager=True)
    emb = _t(spark, sf_dir, "embeddings")
    centroids = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    assign = ivf_assign(emb, centroids)
    tomb = docs.where(F.col("doc_id") % 97 == 0).select("doc_id")
    return deletion_impact(docs, packed, assign, tomb)

ORACLE_E6_DELETION_IMPACT = (
    _PACK_REC
    + """,
tomb AS (SELECT doc_id FROM documents WHERE doc_id % 97 = 0),
e AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
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
affected AS (
  SELECT DISTINCT r.shard, r.bin_id
  FROM rec r JOIN tomb t ON t.doc_id = r.doc_id
),
repack AS (
  SELECT coalesce(sum(r.n_tokens), 0) AS toks
  FROM rec r JOIN affected a
    ON a.shard = r.shard AND a.bin_id = r.bin_id
),
hit AS (
  SELECT a.vec_id, a.centroid_id
  FROM assign a JOIN tomb t ON t.doc_id = a.vec_id
)
SELECT (SELECT count(*) FROM tomb) AS n_tombstones,
       (SELECT count(*) FROM documents d JOIN tomb t ON t.doc_id = d.doc_id)
         AS n_docs_removed,
       (SELECT count(*) FROM documents d
        WHERE d.doc_id NOT IN (SELECT doc_id FROM tomb))
         AS n_docs_surviving,
       (SELECT count(*) FROM affected) AS n_seqs_affected,
       (SELECT CAST(toks AS BIGINT) FROM repack) AS n_tokens_to_repack,
       (SELECT count(DISTINCT centroid_id) FROM hit) AS n_cells_affected,
       (SELECT count(*) FROM hit) AS n_vecs_removed
"""
)

def q_e6_bpe_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E6 tokenizer-aware packing: the greedy bin packer driven by
    REAL BPE subword counts instead of whitespace words — the budget
    the model actually pays (whitespace counts under-fill bins exactly
    where fertility > 1). Composes the dictionary-trick encode with
    ``pack_sequences_counted``; the oracle chains the BPE recursive
    CTE into the greedy-packing recursive CTE."""
    from ..operators.bpe import (
        _with_symbols,
        bpe_encode_dict,
        pair_counts,
        word_counts,
    )
    from ..operators.packing import pack_sequences_counted

    docs = _t(spark, sf_dir, "documents")
    top = (
        pair_counts(_with_symbols(word_counts(docs, "text")))
        .orderBy(F.desc("cnt"), F.asc("left"), F.asc("right"))
        .limit(8)
        .collect()
    )
    merges = [(i, r["left"], r["right"]) for i, r in enumerate(top)]
    enc = bpe_encode_dict(docs, "text", "doc_id", merges).select(
        "doc_id", F.col("n_subwords").alias("n_tokens")
    )
    return pack_sequences_counted(
        enc, "doc_id", "n_tokens", capacity=256, nshards=8
    )

def _oracle_bpe_pack() -> str:
    return f"""
WITH RECURSIVE enc AS ({ORACLE_E3_BPE_ENCODE}),
pre AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5('pack:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
              % 8 AS INTEGER) AS shard,
         n_subwords AS n_tokens
  FROM enc
), base AS (
  SELECT *, row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn FROM pre
), rec AS (
  SELECT doc_id, shard, n_tokens, rn,
         CAST(0 AS BIGINT) AS bin_id, CAST(0 AS BIGINT) AS bin_offset,
         n_tokens AS fill
  FROM base WHERE rn = 1
  UNION ALL
  SELECT b.doc_id, b.shard, b.n_tokens, b.rn,
         CASE WHEN r.fill > 0 AND r.fill + b.n_tokens > 256
              THEN r.bin_id + 1 ELSE r.bin_id END,
         CASE WHEN r.fill > 0 AND r.fill + b.n_tokens > 256
              THEN 0 ELSE r.fill END,
         CASE WHEN r.fill > 0 AND r.fill + b.n_tokens > 256
              THEN b.n_tokens ELSE r.fill + b.n_tokens END
  FROM rec r JOIN base b ON b.shard = r.shard AND b.rn = r.rn + 1
)
SELECT doc_id, shard, bin_id, bin_offset, n_tokens FROM rec
"""

def q_e6_quality_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E6 quality-weighted token budget: each source spends its 800
    tokens on its HIGHEST-quality documents (score desc, id tiebreak)
    across 2 hash shards — the curation refinement of
    ``e6_source_quota``'s unbiased hash-order fill; score rounds to 6
    before ordering so the prefix is engine-portable."""
    from ..operators.packing import token_count_expr
    from ..operators.sampling import quality_token_quota
    from ..operators.text import quality_exprs

    docs = _t(spark, sf_dir, "documents")
    score = quality_exprs("text")["score"]
    out = quality_token_quota(
        docs.withColumn("__score", F.expr(score)),
        "source",
        "doc_id",
        token_count_expr("text"),
        "__score",
        quota_tokens=800,
        nshards=2,
    )
    return out.select("doc_id", "source", "n_tokens")

def _oracle_quality_quota() -> str:
    score = _Q_SCORE.format(punct=_Q_PUNCT, stopr=_Q_STOPR, mwl=_Q_MWL)
    return f"""
WITH t AS (
  SELECT doc_id, source,
         CAST(len(regexp_split_to_array(lower(text), '\\s+')) AS BIGINT) AS n_tokens,
         ('0x' || substr(md5('qquota:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
           % 1000000 AS b,
         round({score}, 6) AS q
  FROM documents
), c AS (
  SELECT *, coalesce(sum(n_tokens) OVER (
           PARTITION BY source, b % 2 ORDER BY q DESC, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
  FROM t
)
SELECT doc_id, source, n_tokens FROM c WHERE cum + n_tokens <= 400
"""

def q_e6_epoch_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E6 data-constrained epoch planner (Muennighoff et al. 2022,
    public): per-source repeat epochs under a 120k-token budget with a
    4-epoch cap — which sources run out of unique tokens and how much
    budget the mixture must reallocate. One corpus pass + catalog-sized
    arithmetic (operators/sampling.py epoch_allocation)."""
    from ..operators.sampling import epoch_allocation

    return epoch_allocation(
        _t(spark, sf_dir, "documents"),
        "text",
        "source",
        budget_tokens=120_000,
        max_epochs=4.0,
    )

ORACLE_E6_EPOCH_ALLOCATION = r"""
WITH st AS (
  SELECT source,
         sum(len(list_filter(regexp_split_to_array(lower(text), '\s+'),
                             t -> t <> ''))) AS unique_tokens
  FROM documents GROUP BY source
),
k AS (SELECT count(*) AS ns FROM st),
p AS (
  SELECT source, unique_tokens,
         round(120000.0 / ns, 6) AS target_tokens,
         round(round(120000.0 / ns, 6) / unique_tokens, 6) AS epochs_needed
  FROM st, k
),
e AS (
  SELECT *, least(epochs_needed, 4.0) AS epochs,
         CAST(round(unique_tokens * least(epochs_needed, 4.0), 0) AS BIGINT)
           AS effective_tokens
  FROM p
)
SELECT source,
       CAST(unique_tokens AS BIGINT) AS unique_tokens,
       target_tokens,
       epochs_needed,
       round(epochs, 6) AS epochs,
       epochs_needed > 4.0 AS capped,
       effective_tokens,
       greatest(CAST(round(target_tokens - effective_tokens, 0) AS BIGINT),
                0) AS shortfall
FROM e
"""

def q_e6_stratified_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E6 training-shard layout audit: source-stratified round-robin
    assignment into 8 shards (md5-bucket visit order) and the
    per-shard balance rollup (operators/sampling.py
    stratified_shards)."""
    from ..operators.sampling import stratified_shards

    return stratified_shards(
        _t(spark, sf_dir, "documents"), "source", "doc_id", nshards=8
    )

ORACLE_E6_STRATIFIED_SHARDS = """
WITH b AS (
  SELECT source,
         ('0x' || substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
           % 1000000 AS bkt,
         doc_id
  FROM documents
),
a AS (
  SELECT source,
         CAST((row_number() OVER (PARTITION BY source ORDER BY bkt, doc_id) - 1)
              % 8 AS BIGINT) AS shard
  FROM b
),
p AS (SELECT shard, source, count(*) AS n FROM a GROUP BY 1, 2)
SELECT shard,
       CAST(sum(n) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_sources,
       CAST(max(n) AS BIGINT) AS max_source_docs
FROM p GROUP BY shard
"""

def q_e6_anneal_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E6 two-phase anneal planner (MiniCPM / Llama-3 style mid-training
    schedule, public): phase 1 spends 80% of a 100k-token budget
    proportional to raw token mass, the anneal phase spends 20%
    proportional to HIGH-QUALITY token mass (quality >= 0.5), with the
    implied repeat epochs per source. One corpus scan ->
    |sources|-row arithmetic (operators/sampling.py anneal_schedule)."""
    from ..operators.sampling import anneal_schedule

    return anneal_schedule(
        _t(spark, sf_dir, "documents"),
        "text",
        "source",
        budget_tokens=100_000,
        anneal_frac=0.2,
        quality_floor=0.5,
    )

def _oracle_anneal_schedule() -> str:
    score = _Q_SCORE.format(punct=_Q_PUNCT, stopr=_Q_STOPR, mwl=_Q_MWL)
    return rf"""
WITH t AS (
  SELECT source,
         CAST(len(list_filter(regexp_split_to_array(lower(text), '\s+'),
                              t -> t <> '')) AS BIGINT) AS n_tok,
         round({score}, 6) AS q
  FROM documents
),
s AS (
  SELECT source, sum(n_tok) AS tokens,
         sum(CASE WHEN q >= 0.5 THEN n_tok ELSE 0 END) AS hq_tokens
  FROM t GROUP BY source
),
tot AS (SELECT sum(tokens) AS tt, sum(hq_tokens) AS hh FROM s)
SELECT source,
       CAST(tokens AS BIGINT) AS tokens,
       CAST(hq_tokens AS BIGINT) AS hq_tokens,
       CAST(floor(80000.0 * tokens / tt) AS BIGINT) AS p1_tokens,
       CAST(coalesce(floor(20000.0 * hq_tokens / nullif(hh, 0)), 0) AS BIGINT)
         AS p2_tokens,
       round(coalesce(floor(20000.0 * hq_tokens / nullif(hh, 0)), 0)
             / nullif(hq_tokens, 0), 6) AS p2_epochs
FROM s, tot
"""

def q_e6_pack_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E6 context-length tuning curve: packing efficiency (bins, fill
    ratio) at capacity 128 / 256 / 512 — the knob sweep a training run
    reads before fixing its context window (short contexts waste bins
    on fragmentation, long ones on tail padding). Token counts are
    computed ONCE and localCheckpointed; each capacity re-packs the
    same |corpus|-row (id, count) frame (operators/packing.py
    pack_sequences_counted), so the sweep never re-reads text."""
    from functools import reduce

    from ..operators.packing import (
        pack_sequences_counted,
        pack_stats,
        token_count_expr,
    )

    docs = _t(spark, sf_dir, "documents")
    counts = docs.select(
        F.col("doc_id"),
        F.coalesce(token_count_expr("text").cast("long"), F.lit(0)).alias(
            "n_tokens"
        ),
    ).localCheckpoint(eager=True)
    arms = []
    for cap in (128, 256, 512):
        packed = pack_sequences_counted(
            counts, "doc_id", "n_tokens", capacity=cap, nshards=8
        )
        arms.append(
            pack_stats(packed, capacity=cap)
            .agg(
                F.sum("n_bins").cast("long").alias("n_bins"),
                F.sum("total_tokens").cast("long").alias("total_tokens"),
            )
            .select(
                F.lit(cap).cast("int").alias("capacity"),
                "n_bins",
                "total_tokens",
                F.round(
                    F.col("total_tokens")
                    / (F.col("n_bins") * F.lit(float(cap))),
                    6,
                ).alias("fill_ratio"),
            )
        )
    return reduce(lambda a, b: a.unionByName(b), arms)

def _pack_rec(capacity: int) -> str:
    """The greedy-packing recursive CTE at an arbitrary capacity
    (generalizes ``_PACK_REC``; one recipe so the curve and the
    fixed-capacity oracles cannot drift)."""
    return _PACK_REC.replace("> 256", f"> {int(capacity)}")

def _oracle_pack_curve() -> str:
    arms = []
    for cap in (128, 256, 512):
        arms.append(
            f"SELECT {cap} AS capacity, n_bins, total_tokens,\n"
            f"       round(total_tokens::DOUBLE / (n_bins * {cap}.0), 6) AS fill_ratio\n"
            f"FROM (SELECT sum(b)::BIGINT AS n_bins, sum(t)::BIGINT AS total_tokens\n"
            f"      FROM (SELECT max(bin_id) + 1 AS b, sum(n_tokens) AS t\n"
            f"            FROM ({_pack_rec(cap)} SELECT * FROM rec) GROUP BY shard))"
        )
    return "\nUNION ALL\n".join(arms)

def q_e6_dataset_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E6 dataset fingerprint: an ORDER-INDEPENDENT corpus digest —
    per-row md5-slice integers summed (exact bigint, commutative) per
    source and overall — the reproducibility stamp a dataset card
    carries so two pipelines can assert they trained on byte-identical
    data without comparing rows. Plan: one scan, per-row hash in the
    same projection, |sources|+1 partial-agg sums; commutativity makes
    the digest independent of partitioning, task order, and engine."""
    docs = _t(spark, sf_dir, "documents")
    h = F.expr(
        "cast(conv(substring(md5(concat(cast(doc_id as string), ':', text)), 1, 15),"
        " 16, 10) as bigint)"
    )
    per_source = (
        docs.select("source", h.cast("decimal(38,0)").alias("__h"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            # decimal(38,0) sum: 10^12 rows x 2^60 per-row hashes stays
            # ~10^30 << 10^38 — overflow-free at any plausible corpus
            F.sum("__h").cast("decimal(38,0)").alias("__fp"),
        )
    )
    total = per_source.agg(
        F.lit("__ALL__").alias("source"),
        F.sum("n_rows").cast("long").alias("n_rows"),
        F.sum("__fp").cast("decimal(38,0)").alias("__fp"),
    )
    return per_source.unionByName(total).select(
        "source", "n_rows", F.col("__fp").cast("string").alias("fingerprint")
    )

ORACLE_E6_DATASET_FINGERPRINT = """
WITH h AS (
  SELECT source,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || text), 1, 15))::BIGINT
           AS hv
  FROM documents
),
per AS (
  SELECT source, count(*)::BIGINT AS n_rows,
         sum(hv::DECIMAL(38,0)) AS fp
  FROM h GROUP BY source
)
SELECT source, n_rows, CAST(CAST(fp AS DECIMAL(38,0)) AS VARCHAR) AS fingerprint
FROM per
UNION ALL
SELECT '__ALL__', sum(n_rows)::BIGINT,
       CAST(CAST(sum(fp) AS DECIMAL(38,0)) AS VARCHAR)
FROM per
"""

def q_e6_quota_spill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E6 quota-spill attribution: per source, token demand vs what the
    quality quota actually granted — the 'who lost how much' table a
    curation review reads when sources complain about their budget.
    The granted side reuses the quality-quota operator UNCHANGED; the
    demand side is one corpus token-count agg; both collapse to
    |sources|-row frames before the left join, so the report costs two
    scans and a dimension-sized join."""
    from ..operators.packing import token_count_expr
    from ..operators.sampling import quality_token_quota
    from ..operators.text import quality_exprs

    docs = _t(spark, sf_dir, "documents")
    score = quality_exprs("text")["score"]
    granted = (
        quality_token_quota(
            docs.withColumn("__score", F.expr(score)),
            "source",
            "doc_id",
            token_count_expr("text"),
            "__score",
            quota_tokens=800,
            nshards=2,
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_kept"),
            F.sum("n_tokens").cast("long").alias("granted_tokens"),
        )
    )
    demand = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(token_count_expr("text").cast("long"))
        .cast("long")
        .alias("demand_tokens"),
    )
    return (
        demand.join(granted, "source", "left")
        .select(
            "source",
            "n_docs",
            "demand_tokens",
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            F.coalesce("granted_tokens", F.lit(0))
            .cast("long")
            .alias("granted_tokens"),
            (
                F.col("demand_tokens")
                - F.coalesce("granted_tokens", F.lit(0))
            )
            .cast("long")
            .alias("spilled_tokens"),
            F.round(
                F.coalesce("granted_tokens", F.lit(0))
                / F.col("demand_tokens"),
                6,
            ).alias("fill_rate"),
        )
    )

def _oracle_quota_spill() -> str:
    quota = _oracle_quality_quota()
    return rf"""
WITH kept AS ({quota}),
granted AS (
  SELECT source, count(*)::BIGINT AS n_kept,
         sum(n_tokens)::BIGINT AS granted_tokens
  FROM kept GROUP BY source
),
demand AS (
  SELECT source, count(*)::BIGINT AS n_docs,
         sum(CAST(len(regexp_split_to_array(lower(text), '\s+')) AS BIGINT))::BIGINT
           AS demand_tokens
  FROM documents GROUP BY source
)
SELECT d.source, d.n_docs, d.demand_tokens,
       coalesce(g.n_kept, 0)::BIGINT AS n_kept,
       coalesce(g.granted_tokens, 0)::BIGINT AS granted_tokens,
       (d.demand_tokens - coalesce(g.granted_tokens, 0))::BIGINT
         AS spilled_tokens,
       round(coalesce(g.granted_tokens, 0)::DOUBLE / d.demand_tokens, 6)
         AS fill_rate
FROM demand d LEFT JOIN granted g ON g.source = d.source
"""

def q_e6_ess_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E6 mixture-design companion: the EFFECTIVE SAMPLE SIZE of
    temperature sampling at alpha in {1.0, 0.7, 0.5} — flattening a
    skewed source mix (alpha < 1) up-weights small sources, and
    Kish's ESS = 1 / sum_s(p_s²/n_s) quantifies exactly how much
    statistical mass that costs (alpha=1 gives ESS = N; more
    flattening, lower ESS). The readout that turns "temperature 0.7
    feels right" into "temperature 0.7 costs 18% of the corpus".
    Plan: one |sources|-row count frame crossed with a 3-row alpha
    literal; pow results and per-source terms are quantized to DECIMAL
    before each sum (the temperature_weights discipline,
    operators/sampling.py:499) so both engines sum exactly in any
    order; doubles appear only in fixed per-row expressions."""
    docs = _t(spark, sf_dir, "documents")
    per_source = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("__n")
    )
    alphas = spark.createDataFrame([(1.0,), (0.7,), (0.5,)], "alpha double")
    pw = per_source.crossJoin(F.broadcast(alphas)).withColumn(
        "__pw",
        F.pow(F.col("__n").cast("double"), F.col("alpha")).cast(
            "decimal(28,10)"
        ),
    )
    den = pw.groupBy("alpha").agg(
        F.sum("__pw").alias("__denom"),
        F.sum("__n").cast("long").alias("n_docs"),
    )
    terms = pw.join(den.select("alpha", "__denom"), "alpha").withColumn(
        "__t",
        F.expr(
            "CAST((CAST(__pw AS DOUBLE) / CAST(__denom AS DOUBLE))"
            " * (CAST(__pw AS DOUBLE) / CAST(__denom AS DOUBLE))"
            " / CAST(__n AS DOUBLE) AS DECIMAL(38,28))"
        ),
    )
    summed = terms.groupBy("alpha").agg(F.sum("__t").alias("__ts"))
    return (
        summed.join(den.select("alpha", "n_docs"), "alpha")
        .select(
            "alpha",
            "n_docs",
            F.round(F.expr("1.0 / CAST(__ts AS DOUBLE)"), 4).alias("ess"),
            F.round(
                F.expr(
                    "(1.0 / CAST(__ts AS DOUBLE)) / CAST(n_docs AS DOUBLE)"
                ),
                6,
            ).alias("ess_ratio"),
        )
    )

ORACLE_E6_ESS_MIXTURE = """
WITH per_source AS (
  SELECT source, count(*)::BIGINT AS n FROM documents GROUP BY source
),
alphas AS (SELECT unnest([1.0, 0.7, 0.5]) AS alpha),
pw AS (
  SELECT alpha, source, n,
         CAST(pow(CAST(n AS DOUBLE), alpha) AS DECIMAL(28,10)) AS pwv
  FROM per_source CROSS JOIN alphas
),
den AS (
  SELECT alpha, sum(pwv) AS denom, sum(n)::BIGINT AS n_docs
  FROM pw GROUP BY alpha
),
terms AS (
  SELECT p.alpha,
         CAST((CAST(p.pwv AS DOUBLE) / CAST(d.denom AS DOUBLE))
              * (CAST(p.pwv AS DOUBLE) / CAST(d.denom AS DOUBLE))
              / CAST(p.n AS DOUBLE) AS DECIMAL(38,28)) AS term
  FROM pw p JOIN den d USING (alpha)
),
summed AS (SELECT alpha, sum(term) AS ts FROM terms GROUP BY alpha)
SELECT d.alpha, d.n_docs,
       round(1.0 / CAST(s2.ts AS DOUBLE), 4) AS ess,
       round((1.0 / CAST(s2.ts AS DOUBLE)) / CAST(d.n_docs AS DOUBLE), 6)
         AS ess_ratio
FROM summed s2 JOIN den d USING (alpha)
"""

def q_e6_flag_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E6 governance gap: dedup keeps one representative per cluster —
    but if a DROPPED member carried a sensitive-content flag (PII,
    license taint) and the KEPT one looks clean, auditing only kept
    documents under-counts the obligation (near-dups of flagged text
    are almost surely the same text). This query counts 'leaky'
    clusters: kept member clean, some dropped member flagged — the
    number that says flags must propagate THROUGH dup clusters, not
    ride on surviving rows. Plan: the unchanged CC output joins the
    map-only flag projection on doc_id; per-cluster flags collapse in
    one cluster-keyed aggregate and the readout is a single row."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.lsh_verified_pairs(
        docs, "text", "doc_id", min_est_jaccard=0.5, threshold=0.5
    )
    clusters = dedup.duplicate_clusters(pairs)
    flags = docs.select(
        F.col("doc_id").alias("__fid"),
        F.expr(
            r"CAST(text RLIKE '\\b(spark|hash|merge)\\b' AS INT)"
        ).alias("__flag"),
    )
    j = clusters.join(flags, clusters["id"] == F.col("__fid"))
    per_cluster = j.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("__sz"),
        F.max("__flag").alias("__any_flag"),
        F.max(
            F.when(F.col("id") == F.col("cluster_id"), F.col("__flag"))
        ).alias("__kept_flag"),
        F.sum("__flag").cast("long").alias("__n_flagged"),
    )
    return per_cluster.agg(
        F.count(F.lit(1)).cast("long").alias("n_clusters"),
        F.sum("__sz").cast("long").alias("n_clustered_docs"),
        F.sum("__n_flagged").cast("long").alias("n_flagged_members"),
        F.sum(F.col("__any_flag").cast("long"))
        .cast("long")
        .alias("n_clusters_flagged"),
        F.sum(
            F.when(
                (F.col("__any_flag") == 1) & (F.col("__kept_flag") == 0), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_leaky_clusters"),
    )

def _oracle_flag_propagation() -> str:
    return f"""
WITH clusters AS ({_oracle_dup_clusters()}),
f AS (
  SELECT doc_id,
         CASE WHEN regexp_matches(text, '\\b(spark|hash|merge)\\b')
              THEN 1 ELSE 0 END AS flag
  FROM documents
),
j AS (
  SELECT c.doc_id, c.cluster_id, f.flag
  FROM clusters c JOIN f ON c.doc_id = f.doc_id
),
pc AS (
  SELECT cluster_id, count(*)::BIGINT AS sz, max(flag) AS any_flag,
         max(CASE WHEN doc_id = cluster_id THEN flag END) AS kept_flag,
         sum(flag)::BIGINT AS n_flagged
  FROM j GROUP BY cluster_id
)
SELECT count(*)::BIGINT AS n_clusters,
       sum(sz)::BIGINT AS n_clustered_docs,
       sum(n_flagged)::BIGINT AS n_flagged_members,
       sum(any_flag)::BIGINT AS n_clusters_flagged,
       sum(CASE WHEN any_flag = 1 AND kept_flag = 0 THEN 1 ELSE 0 END)::BIGINT
         AS n_leaky_clusters
FROM pc
"""

def q_e6_quality_threshold_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E6 quota-tuning curve: documents and characters KEPT at quality
    floors 0.4..0.8 — the dedup threshold sweep's twin for the quality
    gate (a floor of 0.7 that silently drops 60% of tokens is a
    mixture decision, not a cleanup). ONE corpus pass: scores collapse
    into a 6-bucket frame (floor-banded on the 6dp-rounded score), and
    the five thresholds read it via a bounded reverse-cumulative
    theta-join — tuning never rescans text. Character volume stays an
    exact decimal sum; shares divide two broadcast totals."""
    docs = _t(spark, sf_dir, "documents")
    qs = text.quality_score(docs, "text", "doc_id").select(
        F.col("quality_score").alias("__s"), "n_chars"
    )
    bucket = (
        "CASE WHEN __s >= 0.8 THEN 0.8 WHEN __s >= 0.7 THEN 0.7"
        " WHEN __s >= 0.6 THEN 0.6 WHEN __s >= 0.5 THEN 0.5"
        " WHEN __s >= 0.4 THEN 0.4 ELSE 0.0 END"
    )
    b = (
        qs.select(F.expr(bucket).alias("__b"), "n_chars")
        .groupBy("__b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("__n"),
            F.sum(F.col("n_chars").cast("decimal(38,0)")).alias("__ch"),
        )
    )
    th = spark.createDataFrame(
        [(0.4,), (0.5,), (0.6,), (0.7,), (0.8,)], "threshold double"
    )
    tot = b.agg(
        F.sum("__n").cast("long").alias("__tn"),
        F.sum("__ch").alias("__tch"),
    )
    joined = th.join(b, F.col("__b") >= F.col("threshold"), "left").crossJoin(
        F.broadcast(tot)
    )
    return (
        joined.groupBy("threshold", "__tn", "__tch")
        .agg(
            F.coalesce(F.sum("__n"), F.lit(0)).cast("long").alias(
                "n_docs_kept"
            ),
            F.coalesce(F.sum("__ch"), F.lit(0).cast("decimal(38,0)")).alias(
                "__kch"
            ),
        )
        .select(
            "threshold",
            "n_docs_kept",
            F.col("__kch").cast("long").alias("n_chars_kept"),
            F.round(
                F.expr(
                    "CAST(n_docs_kept AS DOUBLE) / CAST(__tn AS DOUBLE)"
                ),
                6,
            ).alias("doc_share"),
            F.round(
                F.expr("CAST(__kch AS DOUBLE) / CAST(__tch AS DOUBLE)"), 6
            ).alias("char_share"),
        )
    )

def _oracle_quality_threshold_curve() -> str:
    return f"""
WITH q AS ({ORACLE_E3_QUALITY}),
b AS (
  SELECT CASE WHEN quality_score >= 0.8 THEN 0.8
              WHEN quality_score >= 0.7 THEN 0.7
              WHEN quality_score >= 0.6 THEN 0.6
              WHEN quality_score >= 0.5 THEN 0.5
              WHEN quality_score >= 0.4 THEN 0.4
              ELSE 0.0 END AS bkt,
         count(*)::BIGINT AS n, sum(CAST(n_chars AS HUGEINT)) AS ch
  FROM q GROUP BY 1
),
th AS (SELECT unnest([0.4, 0.5, 0.6, 0.7, 0.8]) AS threshold),
tot AS (SELECT sum(n)::BIGINT AS tn, sum(ch) AS tch FROM b)
SELECT th.threshold,
       coalesce(sum(b.n), 0)::BIGINT AS n_docs_kept,
       coalesce(sum(b.ch), 0)::BIGINT AS n_chars_kept,
       round(coalesce(sum(b.n), 0)::DOUBLE / CAST(tot.tn AS DOUBLE), 6)
         AS doc_share,
       round(CAST(coalesce(sum(b.ch), 0) AS DOUBLE)
             / CAST(tot.tch AS DOUBLE), 6) AS char_share
FROM th LEFT JOIN b ON b.bkt >= th.threshold CROSS JOIN tot
GROUP BY th.threshold, tot.tn, tot.tch
"""

def q_e6_shard_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E6 layout-stability audit: when a 16-shard dataset grows to 20
    shards, how many documents MOVE under mod-N hashing vs a
    consistent-hash ring — mod-N relocates ~(1 − 1/N... in practice
    ~95%) of the corpus (every resize is a full rewrite), the ring
    relocates only the arc claimed by the 4 new nodes (~20%). The
    number that decides whether shard-addressed artifacts (caches,
    dedup indexes, ANN cells) survive a resize. Ring assignment is
    successor-of-hash with wraparound; both schemes use the same
    deterministic md5 hash space so the comparison is apples-to-
    apples. Plan: docs are pre-aggregated to (position, ndocs) so the
    theta-join against the 20-row broadcast node table fans out over
    DISTINCT positions only (not docs x nodes); ring assignment keeps
    two min aggregates (successor, wraparound floor); the readout is
    one row of exact integer counts."""
    docs = (
        _t(spark, sf_dir, "documents")
        .select(
            F.expr(
                "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 8),"
                " 16, 10) AS BIGINT)"
            ).alias("__dpos")
        )
        .groupBy("__dpos")
        .agg(F.count(F.lit(1)).cast("long").alias("__ndocs"))
    )
    nodes = spark.range(20).select(
        F.col("id").alias("__node"),
        F.expr(
            "CAST(conv(substring(md5(concat('node-', CAST(id AS STRING))),"
            " 1, 8), 16, 10) AS BIGINT)"
        ).alias("__npos"),
    )
    ringed = (
        docs.crossJoin(F.broadcast(nodes))
        .groupBy("__dpos", "__ndocs")
        .agg(
            F.min(
                F.when(
                    (F.col("__node") < 16) & (F.col("__npos") >= F.col("__dpos")),
                    F.col("__npos"),
                )
            ).alias("__succ16"),
            F.min(F.when(F.col("__node") < 16, F.col("__npos"))).alias(
                "__first16"
            ),
            F.min(
                F.when(F.col("__npos") >= F.col("__dpos"), F.col("__npos"))
            ).alias("__succ20"),
            F.min("__npos").alias("__first20"),
        )
        .select(
            "__dpos",
            "__ndocs",
            F.coalesce(F.col("__succ16"), F.col("__first16")).alias("__r16"),
            F.coalesce(F.col("__succ20"), F.col("__first20")).alias("__r20"),
        )
    )
    return ringed.agg(
        F.sum("__ndocs").cast("long").alias("n_docs"),
        F.sum(
            F.when(
                F.expr("pmod(__dpos, 16) <> pmod(__dpos, 20)"),
                F.col("__ndocs"),
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_moved_mod"),
        F.sum(
            F.when(F.col("__r16") != F.col("__r20"), F.col("__ndocs")).otherwise(0)
        )
        .cast("long")
        .alias("n_moved_ring"),
    ).select(
        "n_docs",
        "n_moved_mod",
        F.round(
            F.expr("CAST(n_moved_mod AS DOUBLE) / CAST(n_docs AS DOUBLE)"), 6
        ).alias("mod_moved_share"),
        "n_moved_ring",
        F.round(
            F.expr("CAST(n_moved_ring AS DOUBLE) / CAST(n_docs AS DOUBLE)"),
            6,
        ).alias("ring_moved_share"),
    )

ORACLE_E6_SHARD_STABILITY = """
WITH d AS (
  SELECT dpos, count(*)::BIGINT AS ndocs
  FROM (
    SELECT ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
             AS dpos
    FROM documents
  )
  GROUP BY dpos
),
nodes AS (
  SELECT i AS node,
         ('0x' || substr(md5('node-' || CAST(i AS VARCHAR)), 1, 8))::BIGINT
           AS npos
  FROM generate_series(0, 19) AS t(i)
),
ringed AS (
  SELECT d.dpos, d.ndocs,
         coalesce(min(CASE WHEN n.node < 16 AND n.npos >= d.dpos
                           THEN n.npos END),
                  min(CASE WHEN n.node < 16 THEN n.npos END)) AS r16,
         coalesce(min(CASE WHEN n.npos >= d.dpos THEN n.npos END),
                  min(n.npos)) AS r20
  FROM d CROSS JOIN nodes n
  GROUP BY d.dpos, d.ndocs
)
SELECT sum(ndocs)::BIGINT AS n_docs,
       sum(CASE WHEN dpos % 16 <> dpos % 20 THEN ndocs ELSE 0 END)::BIGINT
         AS n_moved_mod,
       round(CAST(sum(CASE WHEN dpos % 16 <> dpos % 20 THEN ndocs
                           ELSE 0 END) AS DOUBLE)
             / CAST(sum(ndocs) AS DOUBLE), 6) AS mod_moved_share,
       sum(CASE WHEN r16 <> r20 THEN ndocs ELSE 0 END)::BIGINT
         AS n_moved_ring,
       round(CAST(sum(CASE WHEN r16 <> r20 THEN ndocs ELSE 0 END) AS DOUBLE)
             / CAST(sum(ndocs) AS DOUBLE), 6) AS ring_moved_share
FROM ringed
"""


def q_e6_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E6/storage: small-file compaction planner — greedily pack each
    source's documents (ordered by doc_id) into ~16 KiB output bins by
    running-sum bucketing: a doc's bin is its cumulative START offset
    div the target, so the plan is a pure function of the ordered
    sizes (stable under replay/retries — no bin depends on task
    scheduling). A document LARGER than the target is still one
    unsplittable file, so its bin's ``fill`` exceeds 1 and the next
    doc's start offset skips intermediate bin ids — per source, bin
    ids are strictly increasing with ``next <= prev + 1 +
    floor(prev_bin_chars / target)``, contiguous exactly when no bin
    overflows (pinned by test_round8_ops; r8 advice asked the
    oversized-doc behavior be documented rather than silently relying
    on fixtures without oversized docs).
    The 100 TB maintenance op behind OPTIMIZE/compact:
    at scale the window partitions by (source, date-partition), which
    is exactly the unit a table-maintenance job compacts. Output: one
    row per planned output file with its fill factor."""
    docs = _t(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    target = 16384
    binned = docs.withColumn("__cum", F.sum("n_chars").over(w)).withColumn(
        "bin_id", F.expr(f"CAST((__cum - n_chars) div {target} AS BIGINT)")
    )
    return binned.groupBy("source", "bin_id").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("n_chars").cast("long").alias("bin_chars"),
        F.round(
            F.sum("n_chars").cast("double") / F.lit(float(target)), 6
        ).alias("fill"),
    )


ORACLE_E6_COMPACTION_PLAN = """
WITH c AS (
  SELECT source, doc_id, n_chars,
         sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id
                            ROWS UNBOUNDED PRECEDING) AS cum
  FROM documents
)
SELECT source,
       CAST((cum - n_chars) // 16384 AS BIGINT) AS bin_id,
       count(*) AS n_files,
       CAST(sum(n_chars) AS BIGINT) AS bin_chars,
       round(CAST(sum(n_chars) AS DOUBLE) / 16384.0, 6) AS fill
FROM c GROUP BY 1, 2
"""


def q_e6_soft_dedup_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E6 composition: mixture shares computed on DEDUP-ADJUSTED mass —
    each source's sampling mass is the sum of its docs' soft-dedup
    weights (1/cluster-size, operators/dedup.py soft_dedup_weights), so
    a source padded with duplicated boilerplate no longer buys epoch
    share with it. Linear shares and sqrt-temperature shares (the
    up-weight-the-tail move) side by side.

    Every cross-row sum here is over exact INTEGER micro-units
    (round(weight*1e6) / round(sqrt(mass)*1e6) as bigint), never raw
    doubles (r8 advice): Spark's partition-order-dependent double
    summation can differ from DuckDB's in the last ulp, and a mass
    landing within ~1e-10 of a 6-decimal rounding boundary would flip
    the rounded value nondeterministically. Integer sums are exact and
    associative, so the final doubles are a deterministic function of
    the data on both engines (sqrt, not pow(x, 0.5), because IEEE sqrt
    is correctly rounded everywhere)."""
    from ..operators.dedup import soft_dedup_weights

    w = soft_dedup_weights(
        _t(spark, sf_dir, "documents"), "text", "doc_id"
    ).select("source", "weight")
    per = w.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.round(F.col("weight") * 1e6).cast("long")).alias("__mu"),
    )
    sq_u = F.round(F.sqrt(F.col("__mu") / F.lit(1e6)) * 1e6).cast("long")
    per = per.withColumn("__squ", sq_u)
    tot = per.agg(
        F.sum("__mu").alias("__tmu"),
        F.sum("__squ").alias("__tsu"),
    )
    return per.crossJoin(F.broadcast(tot)).select(
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.round(F.col("__mu") / F.lit(1e6), 6).alias("mass"),
        F.round(F.col("__mu") / F.col("__tmu"), 6).alias("share_linear"),
        F.round(F.col("__squ") / F.col("__tsu"), 6).alias("share_sqrt"),
    )


ORACLE_E6_SOFT_DEDUP_MIXTURE = """
WITH n AS (
  SELECT doc_id, source,
         trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS norm
  FROM documents
),
s AS (SELECT norm, count(*) AS cs FROM n GROUP BY norm),
w AS (
  SELECT source,
         CAST(round(round(CAST(1.0 AS DOUBLE) / cs, 6) * 1000000.0) AS BIGINT)
           AS mu
  FROM n JOIN s USING (norm)
),
per AS (
  SELECT source, count(*) AS n_docs, sum(mu) AS mu
  FROM w GROUP BY source
),
sq AS (
  SELECT source, n_docs, mu,
         CAST(round(sqrt(mu / 1000000.0) * 1000000.0) AS BIGINT) AS squ
  FROM per
),
tot AS (SELECT sum(mu) AS tmu, sum(squ) AS tsu FROM sq)
SELECT source,
       CAST(n_docs AS BIGINT) AS n_docs,
       round(mu / 1000000.0, 6) AS mass,
       round(CAST(mu AS DOUBLE) / tmu, 6) AS share_linear,
       round(CAST(squ AS DOUBLE) / tsu, 6) AS share_sqrt
FROM sq, tot
"""
