"""E3 text-analysis queries (token stats, quality, langid, BPE, TF-IDF, novelty, routing) + their oracles.

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
    _Q_MWL,
    _Q_PUNCT,
    _Q_SCORE,
    _Q_STOPR,
    _events,
    _t,
)


def q_e3_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = text.token_stats(_t(spark, sf_dir, "documents"), "text", "doc_id")
    return df.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        F.col("n_subword").cast("long").alias("n_subword"),
    )

ORACLE_E3_TOKEN_STATS = """
SELECT doc_id,
       CAST(len(regexp_split_to_array(lower(text), '\\s+')) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(regexp_split_to_array(lower(text), '\\s+'))) AS BIGINT) AS n_distinct,
       CAST(list_aggregate(list_transform(
            list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), w -> w <> ''),
            w -> CAST(ceil(length(w) / 4.0) AS BIGINT)), 'sum') AS BIGINT) AS n_subword
FROM documents
"""

def q_e3_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.quality_score(_t(spark, sf_dir, "documents"), "text", "doc_id")

def q_e3_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style within-document repetition metrics (duplicate
    sentences, duplicate-token fraction, top-token fraction) — in-row
    higher-order-function arithmetic, one scan, no shuffle."""
    return text.repetition_scores(_t(spark, sf_dir, "documents"), "text", "doc_id")

ORACLE_E3_REPETITION = """
WITH prep AS (
  SELECT doc_id,
         regexp_split_to_array(lower(text), '\\s+') AS toks,
         list_filter(list_transform(string_split(lower(text), '.'),
                                    s -> trim(s)), s -> s <> '') AS sents
  FROM documents
), dup AS (
  SELECT doc_id, toks, sents,
         list_filter(sents, s -> len(list_filter(sents, x -> x = s)) > 1)
           AS dup_sents
  FROM prep
)
SELECT doc_id,
       CAST(len(sents) AS BIGINT) AS n_sentences,
       round(len(dup_sents)::DOUBLE / greatest(len(sents), 1), 6)
         AS dup_sentence_frac,
       round(coalesce(list_sum(list_transform(dup_sents, s -> length(s))), 0)::DOUBLE
             / greatest(coalesce(list_sum(list_transform(sents, s -> length(s))), 0), 1), 6)
         AS dup_sentence_char_frac,
       round(CASE WHEN len(toks) = 0 THEN 0.0
             ELSE 1.0 - len(list_distinct(toks))::DOUBLE / len(toks) END, 6)
         AS dup_word_frac,
       round(coalesce(list_max(list_transform(list_distinct(toks),
                                t -> len(list_filter(toks, x -> x = t)))), 0)::DOUBLE
             / greatest(len(toks), 1), 6)
         AS max_token_frac
FROM dup
"""

def q_e3_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus statistics (doc counts, char/token volume, mean
    quality) — one partial-aggregated groupBy, map-combining every
    statistic."""
    return text.corpus_stats(_t(spark, sf_dir, "documents"), "text", "source")

def _oracle_corpus_stats() -> str:
    score = _Q_SCORE.format(punct=_Q_PUNCT, stopr=_Q_STOPR, mwl=_Q_MWL)
    toks = "regexp_split_to_array(lower(text), '\\s+')"
    return f"""
SELECT source,
       count(*) AS n_docs,
       CAST(sum(length(text)) AS BIGINT) AS total_chars,
       CAST(min(length(text)) AS BIGINT) AS min_chars,
       CAST(max(length(text)) AS BIGINT) AS max_chars,
       CAST(sum(len({toks})) AS BIGINT) AS total_tokens,
       CAST(sum(CAST(({score}) AS DECIMAL(28,6))) AS DOUBLE) / count(*) AS mean_quality,
       CAST(sum(CAST(({_Q_STOPR}) AS DECIMAL(28,6))) AS DOUBLE) / count(*) AS mean_stop_ratio
FROM documents GROUP BY source
"""

def q_e3_token_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-count distribution per source (p10/p50/p90/p99, exact
    interpolated percentiles) — the length-distribution slice of a
    dataset card. The per-doc token count inlines into the scan; the
    percentile aggregate shuffles one partial state per (task, source).
    At 100 TB swap `percentile` for `percentile_approx` (mergeable
    sketch, same plan shape) — exact here so DuckDB's quantile_cont
    verifies bit-for-bit."""
    docs = _t(spark, sf_dir, "documents")
    n_tok = F.expr("size(split(lower(text), '\\\\s+'))")
    return docs.select(F.col("source"), n_tok.alias("__n")).groupBy("source").agg(
        F.round(F.expr("percentile(__n, 0.1)"), 6).alias("p10_tokens"),
        F.round(F.expr("percentile(__n, 0.5)"), 6).alias("p50_tokens"),
        F.round(F.expr("percentile(__n, 0.9)"), 6).alias("p90_tokens"),
        F.round(F.expr("percentile(__n, 0.99)"), 6).alias("p99_tokens"),
    )

ORACLE_E3_TOKEN_QUANTILES = """
WITH n AS (
  SELECT source, len(regexp_split_to_array(lower(text), '\\s+')) AS nt
  FROM documents
)
SELECT source,
       round(quantile_cont(nt, 0.1), 6) AS p10_tokens,
       round(quantile_cont(nt, 0.5), 6) AS p50_tokens,
       round(quantile_cont(nt, 0.9), 6) AS p90_tokens,
       round(quantile_cont(nt, 0.99), 6) AS p99_tokens
FROM n GROUP BY source
"""

def q_e3_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.language_id(_t(spark, sf_dir, "documents"), "text", "doc_id")

def _oracle_language_id() -> str:
    toks = "list_distinct(regexp_split_to_array(lower(text), '\\s+'))"
    hit_cols = []
    for lang, markers in sorted(text.LANG_MARKERS.items()):
        arr = "[" + ", ".join(f"'{m}'" for m in markers) + "]"
        hit_cols.append(f"len(list_intersect({toks}, {arr})) AS h_{lang}")
    langs_desc = sorted(text.LANG_MARKERS, reverse=True)
    mx = "greatest(" + ", ".join(f"h_{l}" for l in sorted(text.LANG_MARKERS)) + ")"
    case = " ".join(f"WHEN h_{l} = {mx} THEN '{l}'" for l in langs_desc)
    return f"""
WITH hits AS (SELECT doc_id, {', '.join(hit_cols)} FROM documents)
SELECT doc_id, CASE WHEN {mx} = 0 THEN 'und' {case} END AS lang_pred FROM hits
"""

def q_e3_lang_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3 metadata-QA audit: confusion matrix of the DECLARED lang
    column vs the n-gram language-ID prediction — per (declared,
    predicted) cell count plus an agreement flag. The standard check
    that a corpus's self-reported metadata can be trusted before
    using it for mixture weights; one projection + one low-cardinality
    groupBy (|langs|^2 cells), nothing corpus-wide shuffles."""
    docs = _t(spark, sf_dir, "documents")
    pred = text.language_id(docs, "text", "doc_id")
    j = docs.select("doc_id", "lang").join(pred, "doc_id")
    return (
        j.groupBy("lang", "lang_pred")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .withColumn("agree", F.col("lang") == F.col("lang_pred"))
    )

def _oracle_lang_agreement() -> str:
    return f"""
WITH pred AS ({_oracle_language_id()})
SELECT d.lang, p.lang_pred, CAST(count(*) AS BIGINT) AS n_docs,
       d.lang = p.lang_pred AS agree
FROM documents d JOIN pred p USING (doc_id)
GROUP BY 1, 2, 4
"""

def q_e3_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.fingerprint(_t(spark, sf_dir, "documents"), "text", "doc_id")

ORACLE_E3_FINGERPRINT = """
SELECT doc_id,
       md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
           ' +', ' ', 'g'))) AS fingerprint
FROM documents
"""

def q_e3_corpus_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style corpus cleaning (E1+E3 composed): quality >= 0.5 AND
    predicted language agrees with the declared one AND lowest-id
    fingerprint survivor — one projection + one digest-keyed shuffle."""
    return text.corpus_filter(
        _t(spark, sf_dir, "documents"),
        "text",
        "doc_id",
        declared_lang_col="lang",
        min_quality=0.5,
    )

def _oracle_corpus_filter() -> str:
    toks = "list_distinct(regexp_split_to_array(lower(text), '\\s+'))"
    hit_cols = []
    for lang, markers in sorted(text.LANG_MARKERS.items()):
        arr = "[" + ", ".join(f"'{m}'" for m in markers) + "]"
        hit_cols.append(f"len(list_intersect({toks}, {arr})) AS h_{lang}")
    langs_desc = sorted(text.LANG_MARKERS, reverse=True)
    mx = "greatest(" + ", ".join(f"h_{l}" for l in sorted(text.LANG_MARKERS)) + ")"
    case = " ".join(f"WHEN h_{l} = {mx} THEN '{l}'" for l in langs_desc)
    score = (
        f"round(0.25 * CASE WHEN length(text) BETWEEN 100 AND 100000 THEN 1.0 ELSE 0.0 END"
        f" + 0.25 * (1.0 - ({_Q_PUNCT}))"
        f" + 0.25 * least(({_Q_STOPR}) * 5.0, 1.0)"
        f" + 0.25 * CASE WHEN ({_Q_MWL}) BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.0 END, 6)"
    )
    return f"""
WITH scored AS (
  SELECT doc_id, lang,
         md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
             ' +', ' ', 'g'))) AS fingerprint,
         {score} AS quality_score,
         (SELECT CASE WHEN {mx} = 0 THEN 'und' {case} END
          FROM (SELECT {', '.join(hit_cols)})) AS lang_pred
  FROM documents
),
kept AS (
  SELECT *, row_number() OVER (PARTITION BY fingerprint ORDER BY doc_id) AS rn
  FROM scored WHERE quality_score >= 0.5 AND lang_pred = lang
)
SELECT doc_id, fingerprint, quality_score, lang_pred FROM kept WHERE rn = 1
"""

def q_e3_word_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.word_frequencies(_t(spark, sf_dir, "documents"), "text", top_n=50)

ORACLE_E3_WORD_FREQ = """
SELECT word, count(*) AS n
FROM (SELECT unnest(regexp_split_to_array(lower(text), '\\s+')) AS word FROM documents)
WHERE word <> ''
GROUP BY word ORDER BY n DESC, word ASC LIMIT 50
"""

def q_e3_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 word bigrams over the corpus (phrase mining)."""
    return text.ngram_frequencies(
        _t(spark, sf_dir, "documents"), "text", n=2, top_n=50
    )

ORACLE_E3_BIGRAMS = """
WITH toks AS (
  SELECT list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t <> '') AS t
  FROM documents
)
SELECT gram, count(*) AS n
FROM (
  SELECT unnest(CASE WHEN len(t) < 2 THEN []
                ELSE list_transform(generate_series(1, len(t) - 1),
                                    i -> t[i] || ' ' || t[i + 1]) END) AS gram
  FROM toks
)
GROUP BY gram ORDER BY n DESC, gram ASC LIMIT 50
"""

def q_e3_bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PMI collocations over corpus bigrams (count >= 5, top 50 by PMI)."""
    return text.bigram_pmi(_t(spark, sf_dir, "documents"), "text")

ORACLE_E3_BIGRAM_PMI = """
WITH toks AS (
  SELECT list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t <> '') AS t
  FROM documents
),
words AS (SELECT unnest(t) AS w FROM toks),
uni AS (SELECT w, count(*) AS c FROM words GROUP BY w),
n1 AS (SELECT count(*) AS n1 FROM words),
bg AS (
  SELECT unnest(CASE WHEN len(t) < 2 THEN []
                ELSE list_transform(generate_series(1, len(t) - 1),
                                    i -> struct_pack(w1 := t[i], w2 := t[i + 1])) END) AS g
  FROM toks
),
bigrams AS (SELECT g.w1 AS w1, g.w2 AS w2, count(*) AS c_ab FROM bg GROUP BY 1, 2),
n2 AS (SELECT sum(greatest(len(t) - 1, 0)) AS n2 FROM toks)
SELECT w1 || ' ' || w2 AS gram, CAST(c_ab AS BIGINT) AS n,
       round(log2((c_ab::DOUBLE * n1.n1 * n1.n1)
             / (n2.n2::DOUBLE * a.c * b.c)), 6) AS pmi
FROM bigrams
JOIN uni a ON bigrams.w1 = a.w
JOIN uni b ON bigrams.w2 = b.w
CROSS JOIN n1 CROSS JOIN n2
WHERE c_ab >= 5
ORDER BY pmi DESC, gram ASC LIMIT 50
"""

def q_e3_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-entropy quality signal (bits/char), computed in-row
    with higher-order functions — no shuffle."""
    out = text.char_entropy(_t(spark, sf_dir, "documents"), "text", "doc_id")
    return out.select("doc_id", F.round("char_entropy", 6).alias("char_entropy"))

ORACLE_E3_CHAR_ENTROPY = """
WITH chars AS (
  SELECT doc_id, unnest(regexp_split_to_array(text, '')) AS c,
         length(text) AS n
  FROM documents WHERE length(text) > 0
),
freq AS (SELECT doc_id, c, n, count(*) AS cnt FROM chars GROUP BY doc_id, c, n)
SELECT doc_id,
       round(sum(-(cnt::DOUBLE / n) * log2(cnt::DOUBLE / n)), 6) AS char_entropy
FROM freq GROUP BY doc_id
UNION ALL
SELECT doc_id, 0.0 AS char_entropy FROM documents WHERE length(text) = 0
"""

def q_e3_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sensitive-term redaction over the corpus (the PII-scrubbing
    machinery — operators.text.PII_PATTERNS — demonstrated on a term
    set that actually occurs in the synthetic docs): every match is
    replaced by [TERM] and counted. Map-only, JVM-side regex."""
    docs = _t(spark, sf_dir, "documents")
    out = text.redact(
        docs, "text", {"term": r"\b(spark|hash|merge)\b"}, out_col="redacted"
    )
    return out.select("doc_id", "redacted", "n_term")

ORACLE_E3_REDACT = """
SELECT doc_id,
       regexp_replace(text, '\\b(spark|hash|merge)\\b', '[TERM]', 'g') AS redacted,
       CAST(len(regexp_extract_all(text, '\\b(spark|hash|merge)\\b')) AS BIGINT)
         AS n_term
FROM documents
"""

def q_e3_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM cross-entropy per document (perplexity filtering): fit
    add-one-smoothed bigram probabilities on the src0-src4 slice, score
    every doc as mean -log2 P(w2|w1). Decimal-exact accumulation makes
    the score partitioning-independent."""
    docs = _t(spark, sf_dir, "documents")
    train = docs.where(
        F.col("source").isin("src0", "src1", "src2", "src3", "src4")
    )
    return text.bigram_lm_score(docs, train, "text", "doc_id")

ORACLE_E3_LM_SCORE = """
WITH train AS (
  SELECT list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t <> '') AS t
  FROM documents WHERE source IN ('src0', 'src1', 'src2', 'src3', 'src4')
),
words AS (SELECT unnest(t) AS w FROM train),
uni AS (SELECT w, count(*) AS c1 FROM words GROUP BY w),
v AS (SELECT count(*) AS v FROM uni),
tb AS (
  SELECT unnest(CASE WHEN len(t) < 2 THEN []
                ELSE list_transform(generate_series(1, len(t) - 1),
                                    i -> struct_pack(w1 := t[i], w2 := t[i + 1])) END) AS g
  FROM train
),
bi AS (SELECT g.w1 AS w1, g.w2 AS w2, count(*) AS c12 FROM tb GROUP BY 1, 2),
docs AS (
  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t <> '') AS t
  FROM documents
),
dg AS (
  SELECT doc_id, unnest(CASE WHEN len(t) < 2 THEN []
                ELSE list_transform(generate_series(1, len(t) - 1),
                                    i -> struct_pack(w1 := t[i], w2 := t[i + 1])) END) AS g
  FROM docs
),
scored AS (
  SELECT doc_id,
         coalesce(bi.c12, 0) AS c12,
         CAST(-log2((coalesce(bi.c12, 0) + 1)::DOUBLE
                    / (coalesce(uni.c1, 0) + v.v)::DOUBLE) AS DECIMAL(28,12)) AS nll
  FROM dg
  LEFT JOIN bi ON dg.g.w1 = bi.w1 AND dg.g.w2 = bi.w2
  LEFT JOIN uni ON dg.g.w1 = uni.w
  CROSS JOIN v
),
per AS (
  SELECT doc_id, count(*) AS n_bigrams,
         sum(CASE WHEN c12 = 0 THEN 1 ELSE 0 END) AS n_unseen,
         round(sum(nll)::DOUBLE / count(*), 6) AS cross_entropy
  FROM scored GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(coalesce(per.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       CAST(coalesce(per.n_unseen, 0) AS BIGINT) AS n_unseen,
       coalesce(per.cross_entropy, 0.0) AS cross_entropy
FROM (SELECT DISTINCT doc_id FROM documents) d LEFT JOIN per USING (doc_id)
"""

def q_e3_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 terms by smoothed TF-IDF (keyword extraction /
    relevance scoring): one doc-term aggregate reused for both tf and
    df, broadcast scalar doc count, per-document window top-k. Ranking
    uses the rounded score with a term-asc tie-break so an ulp
    disagreement in ln() between engines cannot flip ranks."""
    return text.tfidf_top_terms(
        _t(spark, sf_dir, "documents"), "text", "doc_id", k=3
    )

ORACLE_E3_TFIDF = """
WITH tf AS (
  SELECT doc_id, term, count(*) AS tf FROM (
    SELECT doc_id,
           unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                              t -> t <> '')) AS term
    FROM documents
  ) GROUP BY doc_id, term
), dfreq AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
), nd AS (
  SELECT count(*) AS n_docs FROM documents
), scored AS (
  SELECT tf.doc_id, tf.term, CAST(tf.tf AS BIGINT) AS tf,
         round(tf.tf::DOUBLE * (ln((nd.n_docs::DOUBLE + 1.0)
                                   / (dfreq.df::DOUBLE + 1.0)) + 1.0), 6)
           AS tfidf
  FROM tf JOIN dfreq USING (term) CROSS JOIN nd
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY tfidf DESC, term ASC) AS rk
  FROM scored
)
SELECT doc_id, term, tf, tfidf, CAST(rk AS BIGINT) AS rk
FROM ranked WHERE rk <= 3
"""

def q_e3_dup_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicated-3-gram coverage per document (the
    MassiveText boilerplate filter): fraction of each doc's 3-gram
    occurrences whose gram appears in >= 2 distinct documents. Both
    aggregates are bounded by n-gram vocabulary, not token count."""
    return text.dup_ngram_coverage(
        _t(spark, sf_dir, "documents"), "text", "doc_id", n=3, min_docs=2
    )

ORACLE_E3_DUP_NGRAMS = """
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\\s+'),
                     t -> t <> '') AS t
  FROM documents
), occ AS (
  SELECT doc_id, unnest(
           CASE WHEN len(t) < 3 THEN []
           ELSE list_transform(generate_series(1, len(t) - 2),
                i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]) END
         ) AS gram
  FROM toks
), gram_df AS (
  SELECT gram, count(*) AS gdf
  FROM (SELECT DISTINCT doc_id, gram FROM occ) GROUP BY gram
), per_doc AS (
  SELECT occ.doc_id, count(*) AS n_ngrams,
         sum(CASE WHEN gram_df.gdf >= 2 THEN 1 ELSE 0 END) AS n_dup
  FROM occ JOIN gram_df USING (gram) GROUP BY occ.doc_id
)
SELECT d.doc_id,
       CAST(coalesce(p.n_ngrams, 0) AS BIGINT) AS n_ngrams,
       CAST(coalesce(p.n_dup, 0) AS BIGINT) AS n_dup,
       round(coalesce(p.n_dup, 0)::DOUBLE
             / greatest(coalesce(p.n_ngrams, 0), 1), 6) AS dup_frac
FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
"""

def q_e3_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the corpus word distribution (dataset-card
    statistic): ln(freq)-on-ln(rank) least squares over the top 1000
    words, with exact decimal sums so the fit is accumulation-order
    independent."""
    return text.zipf_fit(_t(spark, sf_dir, "documents"), "text", top_n=1000)

ORACLE_E3_ZIPF = """
WITH counts AS (
  SELECT w, count(*) AS c FROM (
    SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                              t -> t <> '')) AS w
    FROM documents
  ) GROUP BY w
), ranked AS (
  SELECT c, row_number() OVER (ORDER BY c DESC, w ASC) AS rk
  FROM counts ORDER BY c DESC, w ASC LIMIT 1000
), terms AS (
  SELECT CAST(ln(rk) AS DECIMAL(28,12)) AS x,
         CAST(ln(c) AS DECIMAL(28,12)) AS y,
         CAST(CAST(ln(rk) AS DECIMAL(28,12)) * CAST(ln(c) AS DECIMAL(28,12))
              AS DECIMAL(28,12)) AS xy,
         CAST(CAST(ln(rk) AS DECIMAL(28,12)) * CAST(ln(rk) AS DECIMAL(28,12))
              AS DECIMAL(28,12)) AS xx,
         CAST(CAST(ln(c) AS DECIMAL(28,12)) * CAST(ln(c) AS DECIMAL(28,12))
              AS DECIMAL(28,12)) AS yy
  FROM ranked
), sums AS (
  SELECT count(*)::DOUBLE AS n, sum(x)::DOUBLE AS sx, sum(y)::DOUBLE AS sy,
         sum(xy)::DOUBLE AS sxy, sum(xx)::DOUBLE AS sxx, sum(yy)::DOUBLE AS syy
  FROM terms
)
SELECT CAST(n AS BIGINT) AS n_words,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS zipf_slope,
       round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 6)
         AS zipf_intercept,
       round((n * sxy - sx * sy) * (n * sxy - sx * sy)
             / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
FROM sums
"""

def q_e3_span_occurrences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-first occurrences of duplicated 5-token spans across the
    corpus (the relational form of Lee et al. 2022 exact-substring
    dedup; suffix arrays don't distribute, gram groupBys do)."""
    return dedup.duplicated_span_occurrences(
        _t(spark, sf_dir, "documents"), "text", "doc_id", k=5
    )

ORACLE_E3_SPAN_OCCURRENCES = r"""
WITH toks AS (
  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS t
  FROM documents
),
grams AS (
  SELECT toks.doc_id, u.pos,
         md5(lower(array_to_string(t[u.pos+1 : u.pos+5], ' '))) AS gh
  FROM toks, UNNEST(range(0, greatest(len(t)-5+1, 0))) AS u(pos)
),
ranked AS (
  SELECT doc_id, pos,
         row_number() OVER (PARTITION BY gh ORDER BY doc_id, pos) AS rn
  FROM grams
)
SELECT doc_id, CAST(pos AS BIGINT) AS pos FROM ranked WHERE rn > 1
"""

def q_e3_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy duplicated-span removal over the documents table: rebuild
    each doc's text with every non-first 5-token duplicate span dropped
    (original casing preserved; see operators/dedup.py span_dedup for
    the overlap approximation contract)."""
    return dedup.span_dedup(
        _t(spark, sf_dir, "documents"), "text", "doc_id", k=5
    )

ORACLE_E3_SPAN_DEDUP = r"""
WITH toks AS (
  SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS t
  FROM documents
),
grams AS (
  SELECT toks.doc_id, u.pos,
         md5(lower(array_to_string(t[u.pos+1 : u.pos+5], ' '))) AS gh
  FROM toks, UNNEST(range(0, greatest(len(t)-5+1, 0))) AS u(pos)
),
ranked AS (
  SELECT doc_id, pos,
         row_number() OVER (PARTITION BY gh ORDER BY doc_id, pos) AS rn
  FROM grams
),
dups AS (
  SELECT doc_id, list(pos) AS dp FROM ranked WHERE rn > 1 GROUP BY doc_id
),
rebuilt AS (
  SELECT toks.doc_id, t,
         list_filter(range(0, len(t)),
                     x -> len(list_filter(coalesce(dp, []),
                                          p -> p <= x AND x < p + 5)) = 0) AS kept
  FROM toks LEFT JOIN dups USING (doc_id)
)
SELECT doc_id,
       coalesce(array_to_string(list_transform(kept, x -> t[x+1]), ' '), '') AS clean_text,
       CAST(len(t) AS BIGINT) AS n_tokens,
       CAST(len(kept) AS BIGINT) AS n_kept,
       CAST(len(t) - len(kept) AS BIGINT) AS n_dropped
FROM rebuilt
"""

def q_e3_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 retrieval scores for a fixed query over the documents
    corpus (Lucene-style non-negative idf)."""
    return text.bm25_scores(
        _t(spark, sf_dir, "documents"),
        "text",
        "doc_id",
        query_terms=["hash", "join", "spark"],
    )

def q_e3_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch heavy hitters over events.user_id: users whose
    ESTIMATED event count (min over 4 md5-derived hash rows x 512
    buckets) reaches the threshold. Sketch state is 4*512 cells no
    matter how many users exist — the bounded-memory hot-key detector."""
    from ..operators.sketches import cms_heavy_hitters

    return cms_heavy_hitters(
        _events(spark, sf_dir), "user_id", threshold=50, depth=4, width=512
    ).select(F.col("key").cast("string").alias("key"), "est_count")

ORACLE_E3_HEAVY_HITTERS = """
WITH rows_ AS (
  SELECT d AS row_id,
         ('0x' || substr(md5(d::VARCHAR || ':' || user_id::VARCHAR), 1, 8))::BIGINT % 512 AS bucket,
         1 AS w
  FROM events, UNNEST([0,1,2,3]) AS t(d)
),
sketch AS (SELECT row_id, bucket, sum(w) AS cell FROM rows_ GROUP BY 1, 2),
keys AS (SELECT DISTINCT user_id::VARCHAR AS key FROM events),
probes AS (
  SELECT key, d AS row_id,
         ('0x' || substr(md5(d::VARCHAR || ':' || key), 1, 8))::BIGINT % 512 AS bucket
  FROM keys, UNNEST([0,1,2,3]) AS t(d)
)
SELECT key, CAST(min(cell) AS BIGINT) AS est_count
FROM probes JOIN sketch USING (row_id, bucket)
GROUP BY key HAVING min(cell) >= 50
"""

def q_e3_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-tokenization text normalization over the documents corpus
    (control strip, unicode quote/dash/space folding, whitespace
    collapse) — narrow projection, byte-reproducible cross-engine."""
    return text.normalize_text(_t(spark, sf_dir, "documents"), "text", "doc_id")

ORACLE_E3_NORMALIZE = """
WITH step AS (
  SELECT doc_id,
    trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
         regexp_replace(regexp_replace(text,
         '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]', '', 'g'),
         '[  -​  　]', ' ', 'g'),
         '[‘’‚‛]', '''', 'g'),
         '[“”„‟]', '"', 'g'),
         '[‒–—―]', '-', 'g'),
         '[ \\t\\r\\n]+', ' ', 'g')) AS clean_text,
    text AS orig
  FROM documents
)
SELECT doc_id, clean_text,
       CAST(CASE WHEN clean_text = orig THEN 0 ELSE 1 END AS BIGINT) AS n_changed
FROM step
"""

def q_e3_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index over the documents corpus: term -> capped sorted
    posting list + document frequency (the retrieval companion of
    e3_bm25). Postings rendered as a string for engine-portable
    comparison."""
    out = text.build_postings(
        _t(spark, sf_dir, "documents"), "text", "doc_id", max_postings=20
    )
    return out.select(
        "term",
        "df",
        F.expr(
            "concat_ws(';', transform(postings, p -> concat(p.doc, ':', p.tf)))"
        ).alias("postings"),
    )

ORACLE_E3_POSTINGS = r"""
WITH tf AS (
  SELECT doc_id AS doc, term, count(*) AS tf
  FROM (
    SELECT doc_id, unnest(list_filter(
        regexp_split_to_array(lower(text), '\s+'), t -> t <> '')) AS term
    FROM documents
  )
  GROUP BY doc, term
)
SELECT term, CAST(count(*) AS BIGINT) AS df,
       array_to_string(
         list_transform(
           list_slice(list_sort(list((doc, tf))), 1, 20),
           p -> p[1]::VARCHAR || ':' || p[2]::VARCHAR
         ), ';') AS postings
FROM tf GROUP BY term
"""

def q_e3_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE training statistics: top-20 adjacent-symbol pairs (initial
    character symbols + end-of-word mark) weighted by word frequency —
    the argmax stream the merge loop consumes (operators/bpe.py
    implements the full iterative fit + greedy encode)."""
    from ..operators.bpe import pair_counts, word_counts, _with_symbols

    pc = pair_counts(_with_symbols(word_counts(_t(spark, sf_dir, "documents"), "text")))
    return (
        pc.orderBy(F.desc("cnt"), F.asc("left"), F.asc("right"))
        .limit(20)
        .select("left", "right", "cnt")
    )

ORACLE_E3_BPE_PAIRS = r"""
WITH words AS (
  SELECT word, count(*) AS n FROM (
    SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
                              t -> t <> '')) AS word
    FROM documents
  ) GROUP BY word
),
syms AS (
  SELECT word, n,
         list_append(list_filter(regexp_split_to_array(word, ''), c -> c <> ''),
                     '</w>') AS s
  FROM words
),
pairs AS (
  SELECT s[i.i] AS "left", s[i.i + 1] AS "right", sum(n) AS cnt
  FROM syms, UNNEST(range(1, len(s))) AS i(i)
  GROUP BY 1, 2
)
SELECT "left", "right", CAST(cnt AS BIGINT) AS cnt
FROM (
  SELECT "left", "right", cnt,
         row_number() OVER (ORDER BY cnt DESC, "left", "right") AS rn
  FROM pairs
) WHERE rn <= 20
"""

def q_e3_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3: distinct-2 lexical diversity per source (Li et al. 2016) —
    low ratios mark template spam / looped generations for mixture
    downweighting."""
    return text.distinct_ngram_ratio(
        _t(spark, sf_dir, "documents"), "text", "source", n=2
    )

ORACLE_E3_DIVERSITY = """
WITH toks AS (
  SELECT source,
         list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t <> '') AS t
  FROM documents
),
grams AS (
  SELECT source,
         unnest(CASE WHEN len(t) < 2 THEN []
                ELSE list_transform(generate_series(1, len(t) - 1),
                                    i -> t[i] || ' ' || t[i + 1]) END) AS gram
  FROM toks
)
SELECT s.source,
       CAST(count(g.gram) AS BIGINT) AS n_grams,
       CAST(count(DISTINCT g.gram) AS BIGINT) AS n_distinct,
       round(CASE WHEN count(g.gram) > 0
                  THEN CAST(count(DISTINCT g.gram) AS DOUBLE)
                       / CAST(count(g.gram) AS DOUBLE) END, 6) AS distinct_ratio
FROM (SELECT DISTINCT source FROM documents) s
LEFT JOIN grams g ON s.source = g.source
GROUP BY s.source
"""

def q_e3_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3/E6: context-window chunking — explode documents into 32-token
    windows with stride 24 (8-token overlap), the pre-tokenization step
    for window-bounded training and chunk-level retrieval indexing.
    Map-only JVM expressions; no shuffle."""
    from ..operators.chunking import chunk_documents

    return chunk_documents(
        _t(spark, sf_dir, "documents"), "text", "doc_id",
        chunk_size=32, stride=24,
    )

ORACLE_E3_CHUNK = """
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\\s+'), t -> t <> '') AS t
  FROM documents
),
starts AS (
  SELECT doc_id, t, unnest(generate_series(1, len(t), 24)) AS s
  FROM toks WHERE len(t) > 0
)
SELECT doc_id,
       CAST((s - 1) // 24 AS BIGINT) AS chunk_id,
       array_to_string(t[s : least(s + 31, len(t))], ' ') AS chunk_text,
       CAST(least(s + 31, len(t)) - s + 1 AS BIGINT) AS chunk_tokens
FROM starts
"""

def q_e3_chunk_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3/E6: chunking report card WITHOUT materializing chunk text —
    per-document chunk counts and boundary sizes as a pure arithmetic
    projection, for sizing the chunk table before producing it."""
    from ..operators.chunking import chunk_stats

    return chunk_stats(
        _t(spark, sf_dir, "documents"), "text", "doc_id",
        chunk_size=32, stride=24,
    )

ORACLE_E3_CHUNK_STATS = """
WITH toks AS (
  SELECT doc_id,
         len(list_filter(regexp_split_to_array(text, '\\s+'), t -> t <> ''))
           AS n
  FROM documents
)
SELECT doc_id,
       CAST(n AS BIGINT) AS n_tokens,
       CAST(CASE WHEN n <= 0 THEN 0 ELSE (n - 1) // 24 + 1 END AS BIGINT)
         AS n_chunks,
       CAST(CASE WHEN n <= 0 THEN 0
                 ELSE least(32, n - ((n - 1) // 24) * 24) END AS BIGINT)
         AS last_chunk_tokens
FROM toks
"""

def q_e3_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3: BPE subword encoding of the corpus via the dictionary trick —
    each DISTINCT word is encoded once, then joined back onto the
    ordered token stream (`bpe.bpe_encode_dict`; the Python encode loop
    is vocabulary-bounded, not corpus-bounded). The merge table here is
    the deterministic single-round top-8 pair table (ranks = the
    (cnt desc, left, right) order), so the DuckDB oracle can rebuild
    the identical tokenizer and replay the greedy lowest-rank
    application as a recursive CTE. The oracle's merge step is a
    separator-wrapped string replace (chr(31) never occurs in the
    corpus), which reproduces left-to-right non-overlapping merge
    semantics exactly."""
    from ..operators.bpe import (
        _with_symbols,
        bpe_encode_dict,
        pair_counts,
        word_counts,
    )

    docs = _t(spark, sf_dir, "documents")
    top = (
        pair_counts(_with_symbols(word_counts(docs, "text")))
        .orderBy(F.desc("cnt"), F.asc("left"), F.asc("right"))
        .limit(8)
        .collect()
    )
    merges = [(i, r["left"], r["right"]) for i, r in enumerate(top)]
    out = bpe_encode_dict(docs, "text", "doc_id", merges)
    return out.select(
        "doc_id",
        "n_tokens",
        "n_subwords",
        F.concat_ws(" ", "subwords").alias("subwords_preview"),
    )

def q_e3_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3 readability: Flesch reading ease + Flesch-Kincaid grade per
    document from regex-countable proxies (words, sentence marks, vowel
    groups) — single-scan quality columns, zero shuffle."""
    from ..operators.text import readability_scores

    return readability_scores(_t(spark, sf_dir, "documents"), "text", "doc_id")

ORACLE_E3_READABILITY = """
WITH c AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS n_words,
         greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS n_sentences,
         len(regexp_extract_all(lower(text), '[aeiouy]+')) AS n_syllables
  FROM documents
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(n_words AS BIGINT) AS n_words,
       CAST(n_sentences AS BIGINT) AS n_sentences,
       CAST(n_syllables AS BIGINT) AS n_syllables,
       round(206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
             - 84.6 * (CAST(n_syllables AS DOUBLE) / nullif(n_words, 0)), 4)
         AS flesch,
       round(0.39 * (CAST(n_words AS DOUBLE) / n_sentences)
             + 11.8 * (CAST(n_syllables AS DOUBLE) / nullif(n_words, 0))
             - 15.59, 4) AS fk_grade
FROM c
"""

def q_e3_token_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-quality audit: subword FERTILITY (BPE subwords per
    whitespace word) per predicted language — the multilingual metric
    that flags a tokenizer under-serving a language (fertility >> 1
    means that language pays more sequence budget per word). Composes
    the dictionary-trick BPE encode (vocabulary-bounded Python, corpus
    never enters the loop) with the JVM-side n-gram language id; the
    rollup is language-cardinality bounded. Oracle nests the BPE
    recursive CTE and the langid CASE inside one aggregation."""
    from ..operators import text
    from ..operators.bpe import (
        _with_symbols,
        bpe_encode_dict,
        pair_counts,
        word_counts,
    )

    docs = _t(spark, sf_dir, "documents")
    top = (
        pair_counts(_with_symbols(word_counts(docs, "text")))
        .orderBy(F.desc("cnt"), F.asc("left"), F.asc("right"))
        .limit(8)
        .collect()
    )
    merges = [(i, r["left"], r["right"]) for i, r in enumerate(top)]
    enc = bpe_encode_dict(docs, "text", "doc_id", merges)
    lang = text.language_id(docs, "text", "doc_id")
    return (
        enc.join(lang, "doc_id")
        .groupBy(F.col("lang_pred").alias("lang"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_words"),
            F.sum("n_subwords").cast("long").alias("total_subwords"),
            F.round(
                F.sum("n_subwords").cast("double")
                / F.expr("nullif(cast(sum(n_tokens) as double), 0.0)"),
                6,
            ).alias("fertility"),
        )
    )

def _oracle_token_fertility() -> str:
    return f"""
WITH enc AS ({ORACLE_E3_BPE_ENCODE}),
lang AS ({_oracle_language_id()})
SELECT l.lang_pred AS lang,
       count(*) AS n_docs,
       CAST(sum(e.n_tokens) AS BIGINT) AS total_words,
       CAST(sum(e.n_subwords) AS BIGINT) AS total_subwords,
       round(sum(e.n_subwords)::DOUBLE
             / nullif(CAST(sum(e.n_tokens) AS DOUBLE), 0.0), 6) AS fertility
FROM enc e JOIN lang l USING (doc_id)
GROUP BY 1
"""

def q_e3_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3 originality signal: share of each doc's distinct hashed
    5-grams first introduced by it (owner = min doc_id over docs
    containing the gram) — down-weights recombined/templated text that
    pair-based dedup misses."""
    from ..operators.text import ngram_novelty

    return ngram_novelty(_t(spark, sf_dir, "documents"), "text", "doc_id")

ORACLE_E3_NGRAM_NOVELTY = """
WITH sh AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
           generate_series(1, greatest(length(text)-4, 1)),
           i -> ('0x' || substr(md5(substr(lower(text), i, 5)), 1, 8))::BIGINT))) AS g
  FROM documents
),
own AS (SELECT g, min(doc_id) AS owner FROM sh GROUP BY g)
SELECT sh.doc_id,
       count(*) AS n_grams,
       sum(CASE WHEN sh.doc_id = own.owner THEN 1 ELSE 0 END) AS n_novel,
       round(sum(CASE WHEN sh.doc_id = own.owner THEN 1 ELSE 0 END)::DOUBLE
             / count(*), 6) AS novelty
FROM sh JOIN own USING (g)
GROUP BY sh.doc_id
"""

def q_e3_code_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3 corpus routing: code-vs-prose detection signals per document
    (keyword density, symbol ratio, indent fraction -> composite score
    + flag), the regex router that decides which tokenizer/mixture a
    document feeds. Zero-shuffle single scan
    (operators/text.py code_prose_signals)."""
    from ..operators.text import code_prose_signals

    return code_prose_signals(_t(spark, sf_dir, "documents"), "text", "doc_id")

ORACLE_E3_CODE_DETECT = r"""
WITH c AS (
  SELECT doc_id,
         len(list_filter(regexp_split_to_array(lower(text), '\s+'),
                         t -> t <> '')) AS n_words,
         len(regexp_extract_all(lower(text),
             '\b(select|join|filter|group|order|sort|merge|hash|scan|query|def|class|import|return)\b'))
           AS kw_hits,
         len(regexp_extract_all(text, '[{}()\[\];=<>|&#]')) AS n_syms,
         len(text) AS n_chars,
         len(string_split(text, chr(10))) AS n_lines,
         len(list_filter(string_split(text, chr(10)),
                         l -> regexp_matches(l, '^    '))) AS n_ind
  FROM documents
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(n_words AS BIGINT) AS n_words,
       CAST(kw_hits AS BIGINT) AS kw_hits,
       round(CAST(kw_hits AS DOUBLE) / nullif(n_words, 0), 6) AS kw_density,
       round(CAST(n_syms AS DOUBLE) / nullif(n_chars, 0), 6) AS symbol_ratio,
       round(CAST(n_ind AS DOUBLE) / n_lines, 6) AS indent_frac,
       round(0.6 * (CAST(kw_hits AS DOUBLE) / nullif(n_words, 0))
             + 3 * (CAST(n_syms AS DOUBLE) / nullif(n_chars, 0))
             + 0.4 * (CAST(n_ind AS DOUBLE) / n_lines), 6) AS code_score,
       round(0.6 * (CAST(kw_hits AS DOUBLE) / nullif(n_words, 0))
             + 3 * (CAST(n_syms AS DOUBLE) / nullif(n_chars, 0))
             + 0.4 * (CAST(n_ind AS DOUBLE) / n_lines), 6) >= 0.18 AS is_code
FROM c
"""

def q_e3_heaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3 Heaps'-law vocabulary-growth curve: distinct-word vocabulary
    at nested hash-prefix corpus fractions (md5 bucket < f*1e6 — no
    global doc ordering, so no corpus-wide sort at any scale); one
    token explode collapses to per-word MIN bucket, then the whole
    curve is |fractions| conditional counts
    (operators/text.py vocab_growth)."""
    from ..operators.text import vocab_growth

    return vocab_growth(
        _t(spark, sf_dir, "documents"), "text", "doc_id",
        fractions=(0.25, 0.5, 1.0),
    )

ORACLE_E3_HEAPS = r"""
WITH b AS (
  SELECT ('0x' || substr(md5('heaps:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
           % 1000000 AS bkt,
         text
  FROM documents
),
w AS (
  SELECT min(bkt) AS fb FROM (
    SELECT bkt, unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
                                   t -> t <> '')) AS word
    FROM b
  ) GROUP BY word
),
f AS (SELECT unnest([0.25, 0.5, 1.0]::DOUBLE[]) AS fraction)
SELECT f.fraction,
       (SELECT count(*) FROM b WHERE bkt < f.fraction * 1000000)::BIGINT AS n_docs,
       (SELECT count(*) FROM w WHERE fb < f.fraction * 1000000)::BIGINT AS vocab
FROM f
"""

def q_e3_filter_venn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3 composed-filter attribution (the 'which rule fires' Venn
    every curation pipeline reviews before tuning thresholds): each doc
    is classified by the three independent keep-rules — length in
    [150, 450], stopword ratio >= 0.02, lang = 'en' — and the corpus
    rolls up per rule-combination with the kept flag (all three pass).
    ONE scan, all three signals in the same projection, an 8-key
    partial agg; at 100 TB this is the cheapest possible shape (no
    rule is evaluated in its own pass)."""
    docs = _t(spark, sf_dir, "documents")
    toks = "split(lower(text), '\\\\s+')"
    stop = (
        "array('the', 'and', 'of', 'to', 'is', 'in', 'that', 'it')"
    )
    stopr = (
        f"cast(size(filter({toks}, t -> array_contains({stop}, t))) as double)"
        f" / greatest(size({toks}), 1)"
    )
    len_ok = (F.length("text") >= 150) & (F.length("text") <= 450)
    stop_ok = F.expr(stopr) >= 0.02
    lang_ok = F.col("lang") == "en"
    return (
        docs.select(
            len_ok.alias("len_ok"),
            stop_ok.alias("stop_ok"),
            lang_ok.alias("lang_ok"),
        )
        .groupBy("len_ok", "stop_ok", "lang_ok")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .select(
            "len_ok",
            "stop_ok",
            "lang_ok",
            "n_docs",
            (F.col("len_ok") & F.col("stop_ok") & F.col("lang_ok")).alias(
                "kept"
            ),
        )
    )

ORACLE_E3_FILTER_VENN = r"""
WITH t AS (
  SELECT length(text) BETWEEN 150 AND 450 AS len_ok,
         len(list_filter(regexp_split_to_array(lower(text), '\s+'),
             t -> list_contains(['the','and','of','to','is','in','that','it'], t)))::DOUBLE
           / greatest(len(regexp_split_to_array(lower(text), '\s+')), 1) >= 0.02
           AS stop_ok,
         lang = 'en' AS lang_ok
  FROM documents
)
SELECT len_ok, stop_ok, lang_ok, count(*)::BIGINT AS n_docs,
       len_ok AND stop_ok AND lang_ok AS kept
FROM t GROUP BY len_ok, stop_ok, lang_ok
"""

def q_e3_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3 out-of-vocabulary garbage audit: per source, the fraction of
    token OCCURRENCES outside the corpus top-100 vocabulary and how
    many docs are majority-OOV — the OCR-mojibake / encoding-garbage
    screen that runs before any tokenizer training (garbage inflates
    the subword vocabulary with junk merges). Plan: the head
    vocabulary is a vocabulary-bounded partial agg + bounded global
    top-100 (TakeOrdered) broadcast back into ONE token explode; all
    shares are ratios of per-source INTEGER totals (never means of
    per-doc doubles, which would be accumulation-order dependent)."""
    docs = _t(spark, sf_dir, "documents")
    toks = "filter(split(lower(text), '\\\\s+'), t -> t <> '')"
    words = docs.select(
        "doc_id", "source", F.explode(F.expr(toks)).alias("__w")
    )
    vocab = (
        words.groupBy("__w")
        .agg(F.count(F.lit(1)).alias("__n"))
        .orderBy(F.desc("__n"), F.asc("__w"))
        .limit(100)
        .select("__w", F.lit(1).alias("__in"))
    )
    marked = words.join(F.broadcast(vocab), "__w", "left")
    per_doc = marked.groupBy("doc_id", "source").agg(
        F.count(F.lit(1)).cast("long").alias("__t"),
        F.sum(F.when(F.col("__in").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("__o"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("__t").cast("long").alias("n_tokens"),
            F.sum("__o").cast("long").alias("n_oov"),
            F.sum(F.when(2 * F.col("__o") > F.col("__t"), 1).otherwise(0))
            .cast("long")
            .alias("n_majority_oov"),
        )
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "n_oov",
            F.round(F.col("n_oov") / F.col("n_tokens"), 6).alias("oov_rate"),
            "n_majority_oov",
        )
    )

ORACLE_E3_OOV_RATE = r"""
WITH w AS (
  SELECT doc_id, source,
         unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
                            t -> t <> '')) AS word
  FROM documents
),
v AS (
  SELECT word FROM (
    SELECT word, count(*) AS n FROM w GROUP BY word
    ORDER BY n DESC, word ASC LIMIT 100
  )
),
d AS (
  SELECT doc_id, source, count(*) AS t,
         sum(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) AS o
  FROM w LEFT JOIN v ON w.word = v.word
  GROUP BY doc_id, source
)
SELECT source, count(*)::BIGINT AS n_docs,
       sum(t)::BIGINT AS n_tokens, sum(o)::BIGINT AS n_oov,
       round(sum(o)::DOUBLE / sum(t), 6) AS oov_rate,
       sum(CASE WHEN 2 * o > t THEN 1 ELSE 0 END)::BIGINT AS n_majority_oov
FROM d GROUP BY source
"""

def q_e3_term_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3 term burstiness (Church & Gale's cf/df statistic, public):
    for the top-50 collection-frequency terms, how concentrated each
    term's occurrences are (cf/df = mean occurrences per containing
    doc — content words burst, function words spread). Plan: ONE token
    explode feeds both stats via a TWO-LEVEL agg — (term, doc) partial
    counts first (the same Expand-free shape as the distinct-n
    rewrite), then per-term sums — and the top-50 is a bounded global
    TakeOrdered."""
    docs = _t(spark, sf_dir, "documents")
    toks = "filter(split(lower(text), '\\\\s+'), t -> t <> '')"
    words = docs.select(
        "doc_id", F.explode(F.expr(toks)).alias("__w")
    )
    per_doc = words.groupBy("__w", "doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("__c")
    )
    return (
        per_doc.groupBy("__w")
        .agg(
            F.sum("__c").cast("long").alias("cf"),
            F.count(F.lit(1)).cast("long").alias("df"),
        )
        .select(
            F.col("__w").alias("term"),
            "cf",
            "df",
            F.round(F.col("cf") / F.col("df"), 6).alias("burstiness"),
        )
        .orderBy(F.desc("cf"), F.asc("term"))
        .limit(50)
    )

ORACLE_E3_TERM_BURSTINESS = r"""
WITH w AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
                            t -> t <> '')) AS term
  FROM documents
),
pd AS (SELECT term, doc_id, count(*) AS c FROM w GROUP BY term, doc_id),
t AS (
  SELECT term, sum(c)::BIGINT AS cf, count(*)::BIGINT AS df FROM pd
  GROUP BY term
)
SELECT term, cf, df, round(cf::DOUBLE / df, 6) AS burstiness
FROM t ORDER BY cf DESC, term ASC LIMIT 50
"""

def q_e3_hapax_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3 lexical richness: per source, the hapax-legomena share (the
    fraction of the source's vocabulary occurring exactly once — the
    Heaps/Zipf companion that separates generative text from template
    spam, whose vocabularies saturate). ONE token explode collapses to
    (source, word) counts (vocabulary-bounded partial agg), then a
    |sources|-row rollup of exact integer counts."""
    docs = _t(spark, sf_dir, "documents")
    toks = "filter(split(lower(text), '\\\\s+'), t -> t <> '')"
    counts = (
        docs.select("source", F.explode(F.expr(toks)).alias("__w"))
        .groupBy("source", "__w")
        .agg(F.count(F.lit(1)).cast("long").alias("__c"))
    )
    return (
        counts.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("vocab"),
            F.sum(F.when(F.col("__c") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_hapax"),
            F.sum("__c").cast("long").alias("n_tokens"),
        )
        .select(
            "source",
            "vocab",
            "n_hapax",
            "n_tokens",
            F.round(F.col("n_hapax") / F.col("vocab"), 6).alias(
                "hapax_share"
            ),
        )
    )

ORACLE_E3_HAPAX_RATE = r"""
WITH w AS (
  SELECT source,
         unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
                            t -> t <> '')) AS word
  FROM documents
),
c AS (SELECT source, word, count(*) AS n FROM w GROUP BY source, word)
SELECT source, count(*)::BIGINT AS vocab,
       sum(CASE WHEN n = 1 THEN 1 ELSE 0 END)::BIGINT AS n_hapax,
       sum(n)::BIGINT AS n_tokens,
       round(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END)::DOUBLE / count(*), 6)
         AS hapax_share
FROM c GROUP BY source
"""

def q_e3_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3 mixture design: pairwise Jensen-Shannon divergence between
    per-source unigram distributions, restricted to the global top-100
    vocabulary — the "how different are my sources actually" readout
    that decides whether two sources deserve separate mixture weights
    or are near-clones. Restricting to the shared head vocabulary
    bounds everything: the dense (source x top-word) matrix is
    |sources| x 100, the pair join |sources|^2 x 100 — never corpus
    rows. JSD is symmetric and bounded (<= ln 2), with 0*ln(0) := 0
    handled by CASE arms. Per-pair sums fold doubles in explicit word
    order (array_sort + ordered aggregate == DuckDB list ORDER BY) so
    both engines add in the same sequence."""
    docs = _t(spark, sf_dir, "documents")
    w = docs.select(
        "source", F.explode(F.split(F.lower("text"), r"\s+")).alias("word")
    ).where(F.col("word") != "")
    top = text.word_frequencies(docs, "text", top_n=100).select("word")
    sw = (
        w.join(F.broadcast(top), "word")
        .groupBy("source", "word")
        .agg(F.count(F.lit(1)).cast("long").alias("__c"))
    )
    tot = sw.groupBy("source").agg(F.sum("__c").cast("long").alias("__t"))
    dense = (
        sw.select("source")
        .distinct()
        .crossJoin(F.broadcast(top))
        .join(sw, ["source", "word"], "left")
        .withColumn("__c", F.coalesce(F.col("__c"), F.lit(0)).cast("long"))
        .join(tot, "source")
    )
    rhs = dense.select(
        F.col("source").alias("source_b"),
        F.col("word").alias("__wb"),
        F.col("__c").alias("__cb"),
        F.col("__t").alias("__tb"),
    )
    pairs = (
        dense.select(
            F.col("source").alias("source_a"),
            "word",
            F.col("__c").alias("__ca"),
            F.col("__t").alias("__ta"),
        )
        .join(
            rhs,
            (F.col("word") == F.col("__wb"))
            & (F.col("source_a") < F.col("source_b")),
        )
        .withColumn("__p", F.expr("CAST(__ca AS DOUBLE) / CAST(__ta AS DOUBLE)"))
        .withColumn("__q", F.expr("CAST(__cb AS DOUBLE) / CAST(__tb AS DOUBLE)"))
        .withColumn(
            "__term",
            F.expr(
                "CASE WHEN __p > 0 THEN 0.5 * __p * ln(2.0 * __p / (__p + __q))"
                " ELSE 0.0 END"
                " + CASE WHEN __q > 0 THEN 0.5 * __q * ln(2.0 * __q / (__p + __q))"
                " ELSE 0.0 END"
            ),
        )
    )
    return pairs.groupBy("source_a", "source_b").agg(
        F.sum(
            F.when((F.col("__ca") > 0) & (F.col("__cb") > 0), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_shared"),
        F.expr(
            "round(aggregate(array_sort(collect_list(struct(word, __term))),"
            " 0.0D, (acc, x) -> acc + x.__term), 6)"
        ).alias("jsd"),
    )

ORACLE_E3_SOURCE_DIVERGENCE = """
WITH w AS (
  SELECT source, word FROM (
    SELECT source, unnest(regexp_split_to_array(lower(text), '\\s+')) AS word
    FROM documents
  ) WHERE word <> ''
),
top AS (
  SELECT word FROM (
    SELECT word, count(*) AS n FROM w GROUP BY word
    ORDER BY n DESC, word ASC LIMIT 100
  )
),
sw AS (
  SELECT source, w.word, count(*)::BIGINT AS c
  FROM w JOIN top USING (word) GROUP BY 1, 2
),
tot AS (SELECT source, sum(c)::BIGINT AS t FROM sw GROUP BY source),
dense AS (
  SELECT s.source, tw.word, coalesce(sw.c, 0)::BIGINT AS c, t.t
  FROM (SELECT DISTINCT source FROM sw) s
  CROSS JOIN top tw
  LEFT JOIN sw ON sw.source = s.source AND sw.word = tw.word
  JOIN tot t ON t.source = s.source
),
pairs AS (
  SELECT a.source AS source_a, b.source AS source_b, a.word,
         a.c AS ca, b.c AS cb,
         CAST(a.c AS DOUBLE) / CAST(a.t AS DOUBLE) AS p,
         CAST(b.c AS DOUBLE) / CAST(b.t AS DOUBLE) AS q
  FROM dense a JOIN dense b
    ON a.word = b.word AND a.source < b.source
),
terms AS (
  SELECT source_a, source_b, word, ca, cb,
         CASE WHEN p > 0 THEN 0.5 * p * ln(2.0 * p / (p + q))
              ELSE 0.0 END
         + CASE WHEN q > 0 THEN 0.5 * q * ln(2.0 * q / (p + q))
                ELSE 0.0 END AS term
  FROM pairs
)
SELECT source_a, source_b,
       sum(CASE WHEN ca > 0 AND cb > 0 THEN 1 ELSE 0 END)::BIGINT
         AS n_shared,
       round(list_reduce(list(term ORDER BY word), (acc, x) -> acc + x), 6)
         AS jsd
FROM terms GROUP BY 1, 2
"""

def q_e3_distinctive_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3 source profiling: the top-5 DISTINCTIVE words per source by
    smoothed log-odds ratio (source vs rest-of-corpus, +0.5
    Haldane-Anscombe smoothing) — "what does this source talk about
    that others don't", the readout that catches a crawl slice gone
    topical (SEO spam, single-domain dumps) before it skews the mix.
    Raw frequency ranks common words; log-odds ranks words
    OVER-represented relative to everywhere else. Plan: counts are
    restricted to the global top-200 vocabulary (TakeOrdered
    broadcast), so the scored frame is |sources| x 200 and the
    per-source rank window runs over <= 200 rows per partition —
    keyed, bounded, never corpus-sized."""
    docs = _t(spark, sf_dir, "documents")
    w = docs.select(
        "source", F.explode(F.split(F.lower("text"), r"\s+")).alias("word")
    ).where(F.col("word") != "")
    top = text.word_frequencies(docs, "text", top_n=200).select("word")
    sw = (
        w.join(F.broadcast(top), "word")
        .groupBy("source", "word")
        .agg(F.count(F.lit(1)).cast("long").alias("__c"))
    )
    tot = sw.groupBy("source").agg(F.sum("__c").cast("long").alias("__t"))
    gw = sw.groupBy("word").agg(F.sum("__c").cast("long").alias("__g"))
    grand = gw.agg(F.sum("__g").cast("long").alias("__gg"))
    scored = (
        sw.join(tot, "source")
        .join(F.broadcast(gw), "word")
        .crossJoin(F.broadcast(grand))
        .withColumn(
            "score",
            F.round(
                F.expr(
                    "ln((CAST(__c AS DOUBLE) + 0.5)"
                    " / (CAST(__t - __c AS DOUBLE) + 0.5))"
                    " - ln((CAST(__g - __c AS DOUBLE) + 0.5)"
                    " / (CAST(__gg - __t - __g + __c AS DOUBLE) + 0.5))"
                ),
                6,
            ),
        )
    )
    ranked = scored.withColumn(
        "rank",
        F.row_number()
        .over(
            Window.partitionBy("source").orderBy(
                F.desc("score"), F.asc("word")
            )
        )
        .cast("long"),
    )
    return ranked.where(F.col("rank") <= 5).select(
        "source", "rank", "word", "score"
    )

ORACLE_E3_DISTINCTIVE_TERMS = """
WITH w AS (
  SELECT source, word FROM (
    SELECT source, unnest(regexp_split_to_array(lower(text), '\\s+')) AS word
    FROM documents
  ) WHERE word <> ''
),
top AS (
  SELECT word FROM (
    SELECT word, count(*) AS n FROM w GROUP BY word
    ORDER BY n DESC, word ASC LIMIT 200
  )
),
sw AS (
  SELECT source, w.word, count(*)::BIGINT AS c
  FROM w JOIN top USING (word) GROUP BY 1, 2
),
tot AS (SELECT source, sum(c)::BIGINT AS t FROM sw GROUP BY source),
gw AS (SELECT word, sum(c)::BIGINT AS g FROM sw GROUP BY word),
grand AS (SELECT sum(g)::BIGINT AS gg FROM gw),
scored AS (
  SELECT sw.source, sw.word,
         round(ln((CAST(sw.c AS DOUBLE) + 0.5)
                  / (CAST(tot.t - sw.c AS DOUBLE) + 0.5))
               - ln((CAST(gw.g - sw.c AS DOUBLE) + 0.5)
                    / (CAST(grand.gg - tot.t - gw.g + sw.c AS DOUBLE)
                       + 0.5)), 6) AS score
  FROM sw JOIN tot USING (source) JOIN gw USING (word) CROSS JOIN grand
),
ranked AS (
  SELECT source, word, score,
         row_number() OVER (
           PARTITION BY source ORDER BY score DESC, word ASC
         )::BIGINT AS rank
  FROM scored
)
SELECT source, rank, word, score FROM ranked WHERE rank <= 5
"""


def _oracle_cdc_chunks(docs_cte: str, sfx: str = "") -> str:
    """Chunk CTE pipeline shared by the CDC oracles: content-defined
    cuts (trailing-8-char BUZHASH % 64 == 0, final cut at length) over
    the ``docs_cte`` relation (must expose doc_id, source, text).
    ``sfx`` suffixes every intermediate CTE name so two pipelines can
    coexist in one WITH clause; the output relation is ``chunks{sfx}``.
    The rotated lookup tables are rendered from the SAME Python
    constants the Spark expression uses (operators/chunking.py
    buzhash_tables), so the engines reproduce identical cut sets."""
    from ..operators.chunking import buzhash_tables

    tables = buzhash_tables(8)
    lookup = None
    for k in range(8):
        t = "[" + ",".join(str(v) for v in tables[k]) + "]"
        term = f"({t})[cs[p - {k}] + 1]"
        lookup = term if lookup is None else f"xor({term}, {lookup})"
    return f"""
cs{sfx} AS (
  SELECT *, list_transform(string_split(lower(text), ''),
                           ch -> ord(ch) % 256) AS cs
  FROM {docs_cte}
),
cut0{sfx} AS (
  SELECT *, list_filter(generate_series(8, length(text)),
      p -> {lookup} % 64 = 0) AS c0
  FROM cs{sfx}
),
cut{sfx} AS (
  SELECT *, CASE WHEN length(text) = 0 THEN []
                 WHEN len(c0) > 0 AND c0[-1] = length(text) THEN c0
                 ELSE c0 || [length(text)] END AS cuts
  FROM cut0{sfx}
),
sp{sfx} AS (
  SELECT *, list_transform(generate_series(1, len(cuts)),
           i -> struct_pack(s := CASE WHEN i = 1 THEN 1 ELSE cuts[i-1] + 1 END,
                            e := cuts[i])) AS spans
  FROM cut{sfx}
),
chunks{sfx} AS (
  SELECT doc_id, source,
         u.e - u.s + 1 AS chunk_len,
         md5(substr(text, u.s::INT, (u.e - u.s + 1)::INT)) AS chunk_hash
  FROM sp{sfx}, UNNEST(spans) AS x(u)
)"""


def q_e3_cdc_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3/storage: content-defined-chunk dedup ratio per source — the
    rsync/FastCDC primitive (operators/chunking.py cdc_chunks): cut
    where the trailing-8-char hash is 0 mod 64 so boundaries survive
    insertions, then count duplicate chunk hashes per source. The
    dedup_ratio is the fraction of chunk chars that are unique — what
    a content-addressed store would actually hold. One map-only
    chunking pass, one (source, hash) shuffle, one rollup. Reference
    has no storage layer (beam_pipeline.py writes rows 1:1); this is
    the 100 TB storage-dedup extension."""
    from ..operators.chunking import cdc_chunks

    docs = _t(spark, sf_dir, "documents")
    # xxhash64 (8-byte long), not md5 (32-char hex): the output is a
    # hash-free aggregate, so only distinct-equality of the chunk hash
    # matters — the narrower key cuts the (source, hash) shuffle ~40%
    # and the digest ~3x (r9 verdict item 6; the oracle keeps md5 and
    # matches because the per-source counts are hash-agnostic).
    ch = cdc_chunks(docs, keep=["source"], hash_algo="xxhash64")
    per = ch.groupBy("source", "chunk_hash").agg(
        F.count(F.lit(1)).alias("cnt"), F.max("chunk_len").alias("clen")
    )
    return per.groupBy("source").agg(
        F.sum("cnt").cast("long").alias("n_chunks"),
        F.count(F.lit(1)).alias("n_unique_chunks"),
        F.sum(F.col("cnt") * F.col("clen")).cast("long").alias("total_chars"),
        F.sum("clen").cast("long").alias("unique_chars"),
        F.round(
            F.sum("clen") / F.sum(F.col("cnt") * F.col("clen")).cast("double"), 6
        ).alias("dedup_ratio"),
    )


ORACLE_E3_CDC_DEDUP = f"""
WITH docs AS (SELECT doc_id, source, text FROM documents),
{_oracle_cdc_chunks("docs")},
per AS (
  SELECT source, chunk_hash, count(*) AS cnt, max(chunk_len) AS clen
  FROM chunks GROUP BY 1, 2
)
SELECT source,
       CAST(sum(cnt) AS BIGINT) AS n_chunks,
       count(*) AS n_unique_chunks,
       CAST(sum(cnt * clen) AS BIGINT) AS total_chars,
       CAST(sum(clen) AS BIGINT) AS unique_chars,
       round(sum(clen) / CAST(sum(cnt * clen) AS DOUBLE), 6) AS dedup_ratio
FROM per GROUP BY source
"""


def q_e3_cdc_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3/storage: the property that makes CDC worth its hash cost —
    boundary stability under edits. Re-chunk every document with a
    13-char prefix injected and measure what fraction of the shifted
    document's distinct chunk hashes survive from the original
    (fixed-size chunking scores ~1/n_chunks here; CDC scores near 1
    because only the chunks up to the first boundary change). Two
    map-only chunk passes, per-doc set intersection via one equi-join
    on (doc, hash) — no text comparison, hashes only."""
    from ..operators.chunking import cdc_chunks

    docs = _t(spark, sf_dir, "documents")
    # xxhash64 chunk hashes (see q_e3_cdc_dedup): the stability output
    # is hash-free, and both the distinct and the (doc, hash) join key
    # shrink from a 32-char string to a long.
    # r11: the original and prefix-shifted chunkings are ONE union-
    # tagged pass — one scan, one spread exchange, one distinct, one
    # checkpoint — instead of two separate scan+exchange+chunk
    # pipelines (the two passes could never share an exchange: their
    # subtrees differ by the concat projection). Identical chunk sets:
    # the tag rides along as a grouping column, so the per-side
    # distinct (side, doc, source, hash) rows are exactly the rows the
    # two separate distincts produced. The checkpoint pins BOTH sides
    # (pref feeds two consumers; orig is join-probed once).
    tagged = docs.select(
        F.lit(0).alias("__side"), "doc_id", "source", "text"
    ).unionByName(
        docs.select(
            F.lit(1).alias("__side"),
            "doc_id",
            "source",
            F.concat(F.lit("PREFIX_SHIFT "), F.col("text")).alias("text"),
        )
    )
    ch = (
        cdc_chunks(tagged, keep=["__side", "source"], hash_algo="xxhash64")
        .select("__side", "doc_id", "source", "chunk_hash")
        .distinct()
        .localCheckpoint(eager=True)
    )
    orig = ch.where(F.col("__side") == 0).drop("__side")
    pref = ch.where(F.col("__side") == 1).drop("__side")
    p_cnt = pref.groupBy("doc_id", "source").agg(
        F.count(F.lit(1)).alias("n_pref")
    )
    shared = (
        pref.join(orig.select("doc_id", "chunk_hash"), ["doc_id", "chunk_hash"])
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    per_doc = p_cnt.join(shared, "doc_id", "left").select(
        "source",
        (
            F.coalesce(F.col("n_shared"), F.lit(0))
            / F.col("n_pref").cast("double")
        ).alias("stability"),
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("stability"), 6).alias("avg_stability"),
    )


ORACLE_E3_CDC_STABILITY = f"""
WITH docs AS (SELECT doc_id, source, text FROM documents),
{_oracle_cdc_chunks("docs")},
docsb AS (SELECT doc_id, source, 'PREFIX_SHIFT ' || text AS text FROM documents),
{_oracle_cdc_chunks("docsb", "b")},
orig AS (SELECT DISTINCT doc_id, source, chunk_hash FROM chunks),
pref AS (SELECT DISTINCT doc_id, source, chunk_hash FROM chunksb),
p_cnt AS (SELECT doc_id, source, count(*) AS n_pref FROM pref GROUP BY 1, 2),
shared AS (
  SELECT p.doc_id, count(*) AS n_shared
  FROM pref p JOIN orig o ON p.doc_id = o.doc_id AND p.chunk_hash = o.chunk_hash
  GROUP BY 1
)
SELECT source, count(*) AS n_docs,
       round(avg(coalesce(n_shared, 0) / CAST(n_pref AS DOUBLE)), 6)
         AS avg_stability
FROM p_cnt LEFT JOIN shared USING (doc_id)
GROUP BY source
"""


def q_e3_cdc_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3/storage CDC calibration (r9): the chunk-length distribution
    the buzhash cut predicate actually produces — mean length should
    track the divisor (64) and the histogram should decay roughly
    geometrically (each position is an independent 1/64 cut trial);
    a biased substitution table or a broken rolling window shows up
    here before it silently degrades dedup ratios. Lengths bucket at
    32-char granularity, capped at bucket 8 (256+ chars — forced cuts
    at document end pool in the tail). One map-only chunking pass ->
    9-key partial agg; no per-chunk text materialized (lengths only)."""
    from ..operators.chunking import cdc_chunks

    ch = cdc_chunks(_t(spark, sf_dir, "documents"))
    b = F.least(F.floor(F.col("chunk_len") / F.lit(32)), F.lit(8)).cast("int")
    counted = ch.groupBy(b.alias("len_bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n_chunks"),
        F.round(F.avg("chunk_len"), 6).alias("avg_len"),
    )
    total = counted.agg(F.sum("n_chunks").alias("__total"))
    return counted.crossJoin(F.broadcast(total)).select(
        "len_bucket",
        "n_chunks",
        "avg_len",
        F.round(F.col("n_chunks") / F.col("__total"), 6).alias("share"),
    )


ORACLE_E3_CDC_LENGTH_HISTOGRAM = f"""
WITH docs AS (SELECT doc_id, source, text FROM documents),
{_oracle_cdc_chunks("docs")},
b AS (
  SELECT CAST(least(chunk_len // 32, 8) AS INTEGER) AS len_bucket, chunk_len
  FROM chunks
),
g AS (
  SELECT len_bucket, count(*)::BIGINT AS n_chunks,
         round(avg(chunk_len), 6) AS avg_len
  FROM b GROUP BY 1
),
t AS (SELECT sum(n_chunks) AS total FROM g)
SELECT len_bucket, n_chunks, avg_len,
       round(CAST(n_chunks AS DOUBLE) / total, 6) AS share
FROM g, t
"""
