"""Text analysis operators (E3, SURVEY.md §2.9): language ID heuristic,
quality scoring, token counting, document fingerprinting, corpus word
frequencies.

Everything here is built-in-function column arithmetic (regexp, split,
higher-order array functions) — whole-stage codegen, no UDFs, and every
operator is a narrow projection except the corpus-level word frequency
(one explode + one partial-aggregated groupBy). That is what makes these
viable at 100 TB: per-document scoring costs one scan, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# Tiny per-language function-word marker lists for the n-gram/stopword
# language-ID heuristic. Public knowledge (standard stopword lists).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "in", "that", "it"),
    "es": ("el", "la", "de", "que", "los", "una", "por", "con"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "ein", "mit"),
    "fr": ("le", "la", "les", "des", "est", "une", "dans", "pour"),
    "zh": ("的", "是", "了", "在", "我", "有", "和", "不"),
}

STOPWORDS = LANG_MARKERS["en"]

_TOKENS = "split(lower({col}), '\\\\s+')"


def token_stats(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Whitespace + BPE-ish token counting (E3).

    ``n_tokens``: whitespace tokens; ``n_distinct``: distinct tokens;
    ``n_subword``: BPE-ish count — word-piece segments obtained by
    splitting on non-alphanumerics and counting ceil(len/4) pieces per
    word (a public rule-of-thumb proxy for byte-pair token counts).
    """
    toks = _TOKENS.format(col=text_col)
    words = f"filter(split(lower({text_col}), '[^a-z0-9]+'), w -> w <> '')"
    return df.select(
        F.col(id_col),
        F.expr(f"size({toks})").alias("n_tokens"),
        F.expr(f"size(array_distinct({toks}))").alias("n_distinct"),
        F.expr(
            f"aggregate({words}, 0L, (acc, w) -> acc + cast(ceil(length(w) / 4.0) as long))"
        ).alias("n_subword"),
    )


def quality_exprs(text_col: str) -> dict[str, str]:
    """The quality-heuristic subexpressions over ``text_col`` as SQL
    strings — shared by :func:`quality_score` and :func:`corpus_filter`
    so composed pipelines inline them into one projection."""
    toks = _TOKENS.format(col=text_col)
    stop_arr = "array(" + ", ".join(f"'{w}'" for w in STOPWORDS) + ")"
    n_chars = f"length({text_col})"
    punct_ratio = (
        f"cast(length(regexp_replace({text_col}, '[a-zA-Z0-9\\\\s]', '')) as double)"
        f" / greatest({n_chars}, 1)"
    )
    stop_ratio = (
        f"cast(size(filter({toks}, t -> array_contains({stop_arr}, t))) as double)"
        f" / greatest(size({toks}), 1)"
    )
    mean_wordlen = (
        f"cast(aggregate({toks}, 0L, (acc, t) -> acc + length(t)) as double)"
        f" / greatest(size({toks}), 1)"
    )
    score = (
        f"0.25 * CASE WHEN {n_chars} BETWEEN 100 AND 100000 THEN 1.0 ELSE 0.0 END"
        f" + 0.25 * (1.0 - ({punct_ratio}))"
        f" + 0.25 * least(({stop_ratio}) * 5.0, 1.0)"
        f" + 0.25 * CASE WHEN ({mean_wordlen}) BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.0 END"
    )
    return {
        "n_chars": n_chars,
        "punct_ratio": punct_ratio,
        "stop_ratio": stop_ratio,
        "mean_wordlen": mean_wordlen,
        "score": score,
    }


def quality_score(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Heuristic document quality score (E3): length, punctuation ratio,
    stopword ratio, mean word length — the standard cheap pre-filters a
    training-data pipeline runs before anything expensive.

    score = 0.25*len_ok + 0.25*(1 - punct_ratio) + 0.25*stopword_signal
            + 0.25*wordlen_ok, all deterministic column arithmetic.
    """
    ex = quality_exprs(text_col)
    n_chars, punct_ratio = ex["n_chars"], ex["punct_ratio"]
    stop_ratio, mean_wordlen = ex["stop_ratio"], ex["mean_wordlen"]
    return df.select(
        F.col(id_col),
        F.expr(n_chars).alias("n_chars"),
        F.round(F.expr(punct_ratio), 6).alias("punct_ratio"),
        F.round(F.expr(stop_ratio), 6).alias("stopword_ratio"),
        F.round(F.expr(mean_wordlen), 6).alias("mean_word_len"),
        F.round(F.expr(ex["score"]), 6).alias("quality_score"),
    )


def readability_scores(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Flesch reading-ease + Flesch-Kincaid grade (public formulas,
    Flesch 1948 / Kincaid 1975) from regex-countable proxies: words =
    alphanumeric runs, sentences = terminal-punctuation runs (min 1),
    syllables = vowel-group runs ([aeiouy]+, the standard cheap
    estimator). Another single-scan, zero-shuffle quality column; the
    counts use ``regexp_extract_all`` lengths so the DuckDB oracle is
    the byte-same expression.

    Output: (id, n_words, n_sentences, n_syllables, flesch DOUBLE,
    fk_grade DOUBLE) — NULL scores for wordless documents.
    """
    words = f"size(regexp_extract_all({text_col}, '[A-Za-z0-9]+', 0))"
    sents = f"greatest(size(regexp_extract_all({text_col}, '[.!?]+', 0)), 1)"
    sylls = f"size(regexp_extract_all(lower({text_col}), '[aeiouy]+', 0))"
    wps = f"(cast({words} as double) / {sents})"
    spw = f"(cast({sylls} as double) / nullif({words}, 0))"
    return df.select(
        F.col(id_col),
        F.expr(words).cast("long").alias("n_words"),
        F.expr(sents).cast("long").alias("n_sentences"),
        F.expr(sylls).cast("long").alias("n_syllables"),
        F.round(
            F.expr(f"206.835 - 1.015 * {wps} - 84.6 * {spw}"), 4
        ).alias("flesch"),
        F.round(
            F.expr(f"0.39 * {wps} + 11.8 * {spw} - 15.59"), 4
        ).alias("fk_grade"),
    )


CODE_KEYWORDS = (
    "select|join|filter|group|order|sort|merge|hash|scan|query"
    "|def|class|import|return"
)


def code_prose_signals(
    df: DataFrame,
    text_col: str,
    id_col: str,
    score_threshold: float = 0.18,
) -> DataFrame:
    """Code-vs-prose detection signals (the StarCoder/The-Stack-style
    corpus-routing heuristic, public): documents that are code or query
    text get routed to a different tokenizer/mixture than prose, and
    the router is a cheap regex scorer, not a model. Three families of
    evidence, all single-scan regex counts:

    * ``kw_density`` — code/query keyword hits per word (keyword list
      covers both programming and SQL-ish tokens, matched on the
      lowercased text);
    * ``symbol_ratio`` — code punctuation (braces, brackets,
      semicolons, operators) per character;
    * ``indent_frac`` — fraction of lines starting with a 4-space
      indent block.

    ``code_score = 0.6*kw_density + 3*symbol_ratio + 0.4*indent_frac``
    (weights chosen so any one strong family crosses the threshold);
    ``is_code = score >= threshold``. Zero-shuffle projection — the
    100 TB shape is one codegen pass over the scan, like every other
    E3 quality column. Oracle parity: every count is a
    ``regexp_extract_all`` length with a RE2-safe pattern.
    """
    words = f"size(filter(split(lower({text_col}), '\\\\s+'), t -> t <> ''))"
    kws = (
        f"size(regexp_extract_all(lower({text_col}),"
        f" '\\\\b({CODE_KEYWORDS})\\\\b', 0))"
    )
    syms = f"size(regexp_extract_all({text_col}, '[{{}}()\\\\[\\\\];=<>|&#]', 0))"
    lines = f"size(split({text_col}, '\\\\n'))"
    indented = (
        f"size(filter(split({text_col}, '\\\\n'), l -> l rlike '^    '))"
    )
    kd = f"(cast({kws} as double) / nullif({words}, 0))"
    sr = f"(cast({syms} as double) / nullif(length({text_col}), 0))"
    ifr = f"(cast({indented} as double) / {lines})"
    score = f"round(0.6 * {kd} + 3 * {sr} + 0.4 * {ifr}, 6)"
    return df.select(
        F.col(id_col),
        F.expr(words).cast("long").alias("n_words"),
        F.expr(kws).cast("long").alias("kw_hits"),
        F.round(F.expr(kd), 6).alias("kw_density"),
        F.round(F.expr(sr), 6).alias("symbol_ratio"),
        F.round(F.expr(ifr), 6).alias("indent_frac"),
        F.expr(score).alias("code_score"),
        (F.expr(score) >= F.lit(score_threshold)).alias("is_code"),
    )


def repetition_scores(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Within-document repetition metrics (E3) — the Gopher/C4-style
    quality rules that catch boilerplate-looped and degenerate docs
    (Rae et al. 2021 §A1.1 "repetition" filters, public):

    * ``dup_sentence_frac``: fraction of sentences occurring more than
      once in the document (all occurrences counted, Gopher's
      duplicate-line rule applied to '.'-split sentences).
    * ``dup_sentence_char_frac``: fraction of sentence characters inside
      those duplicated sentences (chars-weighted variant).
    * ``dup_word_frac``: 1 - distinct/total whitespace tokens.
    * ``max_token_frac``: occurrence fraction of the most frequent
      token (Gopher's top-n-gram rule at n=1).

    All metrics are IN-ROW higher-order-function arithmetic — one
    narrow codegen projection, no explode, no shuffle; per-row cost is
    O(sentences^2 + distinct_tokens * tokens) on in-memory arrays,
    bounded by document length. That is the 100 TB shape: quality
    filtering costs exactly one scan.
    """
    # Materialize the token/sentence arrays ONCE in a projection before
    # the metric lambdas: Catalyst does not common-subexpression-
    # eliminate across higher-order functions, and the duplicate-
    # sentence filter nests the sentence array inside its own lambda
    # (measured 2x on comparable shapes — SCALE.md).
    prepared = df.select(
        F.col(id_col),
        F.expr(_TOKENS.format(col=text_col)).alias("__toks"),
        F.expr(
            f"filter(transform(split(lower({text_col}), '\\\\.'),"
            f" s -> trim(s)), s -> s <> '')"
        ).alias("__sents"),
    )
    toks, sents = "__toks", "__sents"
    dup_sents = f"filter({sents}, s -> size(filter({sents}, x -> x = s)) > 1)"
    sent_chars = "aggregate({arr}, 0L, (a, s) -> a + length(s))"
    max_tok_count = (
        f"array_max(transform(array_distinct({toks}),"
        f" t -> size(filter({toks}, x -> x = t))))"
    )
    return prepared.select(
        F.col(id_col),
        F.expr(f"size({sents})").alias("n_sentences"),
        F.round(
            F.expr(
                f"cast(size({dup_sents}) as double) / greatest(size({sents}), 1)"
            ),
            6,
        ).alias("dup_sentence_frac"),
        F.round(
            F.expr(
                f"cast({sent_chars.format(arr=dup_sents)} as double)"
                f" / greatest({sent_chars.format(arr=sents)}, 1)"
            ),
            6,
        ).alias("dup_sentence_char_frac"),
        F.round(
            F.expr(
                f"CASE WHEN size({toks}) = 0 THEN 0.0 ELSE "
                f"1.0 - cast(size(array_distinct({toks})) as double)"
                f" / size({toks}) END"
            ),
            6,
        ).alias("dup_word_frac"),
        F.round(
            F.expr(
                f"cast(coalesce({max_tok_count}, 0) as double)"
                f" / greatest(size({toks}), 1)"
            ),
            6,
        ).alias("max_token_frac"),
    )


def langpred_expr(text_col: str) -> str:
    """SQL expression predicting the language of ``text_col`` (argmax of
    marker-word hit counts; ties -> largest lang code; zero hits ->
    'und'). Shared by :func:`language_id` and :func:`corpus_filter`."""
    toks = f"array_distinct({_TOKENS.format(col=text_col)})"
    score_cols = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        arr = "array(" + ", ".join(f"'{m}'" for m in markers) + ")"
        score_cols.append(
            f"struct(size(array_intersect({toks}, {arr})) as hits, '{lang}' as lang)"
        )
    # array_max on (hits, lang) structs picks max hits; equal hits ->
    # largest lang string wins (stable, engine-portable).
    best = f"array_max(array({', '.join(score_cols)}))"
    return f"CASE WHEN {best}.hits > 0 THEN {best}.lang ELSE 'und' END"


def language_id(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Marker-word language-ID heuristic (E3): score each candidate
    language by its function-word hit count over the token set; argmax
    wins, ties break alphabetically, zero hits -> 'und'."""
    return df.select(
        F.col(id_col),
        F.expr(langpred_expr(text_col)).alias("lang_pred"),
    )


def fingerprint(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Document fingerprint (E3): md5 of the normalized text (lowercase,
    punctuation stripped, whitespace collapsed) — the canonical-form
    digest used for near-exact dedup across formatting variants."""
    normalized = (
        f"trim(regexp_replace(regexp_replace(lower({text_col}), '[^a-z0-9 ]', ''),"
        f" ' +', ' '))"
    )
    return df.select(F.col(id_col), F.expr(f"md5({normalized})").alias("fingerprint"))


def word_frequencies(
    df: DataFrame, text_col: str, top_n: int = 50
) -> DataFrame:
    """Corpus-level word frequencies, top-N by (count desc, word asc).

    One explode + one groupBy: the shuffle moves (word, partial count)
    pairs thanks to map-side combine — at 100 TB the shuffled bytes are
    bounded by vocabulary size x partitions, not corpus size.
    """
    words = df.select(
        F.explode(F.expr(_TOKENS.format(col=text_col))).alias("word")
    ).where(F.col("word") != "")
    counts = words.groupBy("word").agg(F.count(F.lit(1)).alias("n"))
    return (
        counts.orderBy(F.desc("n"), F.asc("word"))
        .limit(top_n)
    )


def ngram_frequencies(
    df: DataFrame, text_col: str, n: int = 2, top_n: int = 50
) -> DataFrame:
    """Corpus-level word n-gram frequencies, top-N by (count desc, gram
    asc) — the phrase-mining primitive (E3).

    Same shuffle shape as :func:`word_frequencies`: explode + one
    partial-aggregated groupBy, shuffled bytes bounded by n-gram
    vocabulary, not corpus size. The n-gram build guards ``size < n``
    explicitly because Spark's ``sequence(1, 0)`` counts DOWN (yielding
    [1, 0]), not empty.
    """
    toks = f"filter(split(lower({text_col}), '\\\\s+'), t -> t <> '')"
    joined = " , ' ', ".join(f"element_at(__t, i + {j})" for j in range(n))
    grams = (
        f"CASE WHEN size(__t) < {n} THEN array() "
        f"ELSE transform(sequence(1, size(__t) - {n - 1}), "
        f"i -> concat({joined})) END"
    )
    exploded = (
        df.select(F.expr(toks).alias("__t"))
        .select(F.explode(F.expr(grams)).alias("gram"))
    )
    counts = exploded.groupBy("gram").agg(F.count(F.lit(1)).alias("n"))
    return counts.orderBy(F.desc("n"), F.asc("gram")).limit(top_n)


def distinct_ngram_ratio(
    df: DataFrame, text_col: str, group_col: str, n: int = 2
) -> DataFrame:
    """Distinct-n diversity per group: the fraction of n-gram
    occurrences that are unique within the group (Li et al. 2016's
    "distinct-n" metric, the standard lexical-diversity gauge for
    generated/scraped text — a low ratio means the source is template
    spam or model loops and should be downweighted in the mixture).

    One explode + a TWO-LEVEL aggregation: the gram stream collapses
    first to (group, gram, count) — a partial agg with map-side
    combine whose shuffle is bounded by per-group n-gram vocabulary —
    then plain per-group sums/counts. The one-level form
    (``count`` + ``countDistinct`` in a single agg) compiles to an
    Expand that doubles every exploded gram row into the shuffle on a
    high-cardinality group key where map-side dedup cannot collapse;
    the two-level form shuffles each distinct (group, gram) once. No
    window, no second pass over the text.

    Output: (group, n_grams, n_distinct, distinct_ratio double rounded
    6; groups whose documents are all shorter than ``n`` tokens report
    0 grams and NULL ratio).
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    toks = f"filter(split(lower({text_col}), '\\\\s+'), t -> t <> '')"
    joined = " , ' ', ".join(f"element_at(__t, i + {j})" for j in range(n))
    grams = (
        f"CASE WHEN size(__t) < {n} THEN array() "
        f"ELSE transform(sequence(1, size(__t) - {n - 1}), "
        f"i -> concat({joined})) END"
    )
    exploded = df.select(
        F.col(group_col), F.expr(toks).alias("__t")
    ).select(
        F.col(group_col),
        F.explode_outer(F.expr(grams)).alias("gram"),
    )
    per_gram = exploded.groupBy(group_col, "gram").agg(
        F.count("gram").alias("__c")
    )
    return per_gram.groupBy(group_col).agg(
        F.sum("__c").alias("n_grams"),
        F.sum(F.when(F.col("gram").isNotNull(), 1).otherwise(0)).alias(
            "n_distinct"
        ),
        F.round(
            F.when(
                F.sum("__c") > 0,
                F.sum(F.when(F.col("gram").isNotNull(), 1).otherwise(0)).cast(
                    "double"
                )
                / F.sum("__c").cast("double"),
            ),
            6,
        ).alias("distinct_ratio"),
    )


def corpus_filter(
    df: DataFrame,
    text_col: str,
    id_col: str,
    declared_lang_col: str | None = None,
    min_quality: float = 0.5,
) -> DataFrame:
    """C4-style corpus cleaning in one pass (E1+E3 composition): keep
    documents that (a) score >= ``min_quality``, (b) whose predicted
    language agrees with ``declared_lang_col`` (when given), and (c) are
    the lowest-id survivor of their normalized-text fingerprint group.

    Physical shape — the reason this is one operator and not three
    chained joins: every per-document signal (quality subexpressions,
    language argmax, fingerprint digest) is inlined into a SINGLE
    projection over the scan, the cheap predicates (a)/(b) drop rows
    BEFORE the only shuffle, and that shuffle carries the 32-char
    fingerprint digest + id, not documents. Output: (id, fingerprint,
    quality_score, lang_pred) for surviving rows.
    """
    from pyspark.sql import Window

    ex = quality_exprs(text_col)
    normalized = (
        f"trim(regexp_replace(regexp_replace(lower({text_col}), '[^a-z0-9 ]', ''),"
        f" ' +', ' '))"
    )
    scored = df.select(
        F.col(id_col),
        *([F.col(declared_lang_col)] if declared_lang_col else []),
        F.expr(f"md5({normalized})").alias("fingerprint"),
        F.round(F.expr(ex["score"]), 6).alias("quality_score"),
        F.expr(langpred_expr(text_col)).alias("lang_pred"),
    ).where(F.col("quality_score") >= min_quality)
    if declared_lang_col:
        scored = scored.where(F.col("lang_pred") == F.col(declared_lang_col))
    w = Window.partitionBy("fingerprint").orderBy(F.col(id_col))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(id_col, "fingerprint", "quality_score", "lang_pred")
    )


def corpus_stats(
    df: DataFrame,
    text_col: str,
    group_col: str = "source",
) -> DataFrame:
    """Per-source corpus statistics rollup (E3) — the "dataset card"
    aggregation over a training corpus: document counts, size
    distribution, token volume, and mean quality per ``group_col``.

    One partial-aggregated groupBy over per-row projections (the
    quality/token expressions inline into the same scan); group
    cardinality is sources/domains — low, so the shuffle moves one
    partial row per (task, source). At 100 TB this is the cheapest
    possible shape: every statistic map-combines.
    """
    ex = quality_exprs(text_col)
    toks = _TOKENS.format(col=text_col)
    dec = lambda e: F.expr(e).cast("decimal(28,6)")  # noqa: E731 — order-stable sums
    return (
        df.groupBy(F.col(group_col).alias("source"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.expr(f"length({text_col})")).alias("total_chars"),
            F.min(F.expr(f"length({text_col})")).alias("min_chars"),
            F.max(F.expr(f"length({text_col})")).alias("max_chars"),
            F.sum(F.expr(f"size({toks})")).alias("total_tokens"),
            # sum in decimal (order-independent), then ONE double
            # division — the same IEEE op the SQL oracle performs
            (F.sum(dec(ex["score"])).cast("double") / F.count(F.lit(1)))
            .alias("mean_quality"),
            (F.sum(dec(ex["stop_ratio"])).cast("double") / F.count(F.lit(1)))
            .alias("mean_stop_ratio"),
        )
    )


def char_entropy(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Shannon entropy (bits/char) of each document's character
    distribution (E3) — the cheap gibberish/boilerplate detector:
    natural text sits ~4-4.5 bits, runs of one character near 0,
    uniform noise near log2(alphabet).

    Computed entirely in-row with higher-order functions: per DISTINCT
    character, its count is one compare-only filter pass over the char
    array, and the -p*log2(p) terms sum over the distinct set. No
    explode, no shuffle — a narrow projection whatever the corpus
    size. (The original formulation folded the chars through a
    rebuilt-per-character count MAP — map_filter + map_concat
    allocate O(alphabet) per character, and the query measured 7.7s
    at sf0.1; the distinct x filter form is the same O(len x
    alphabet) compares with no allocation, ~5x faster.)

    The char array is BOUND ONCE per row via the lambda-binding idiom
    (``transform(array(split(...)), cs -> ...)[0]``): Catalyst's
    projection collapse re-inlines ``split`` into every downstream
    reference, so the previous form re-split the text once per
    DISTINCT character — O(len x alphabet) split allocations per row,
    the r10 30x-decade top-of-band cost (ratio 21.6). Binding makes it
    one split + compare-only passes; identical counts, identical
    aggregation order, so every oracle value is unchanged.
    """
    n = f"cast(length({text_col}) as double)"
    entropy = (
        f"transform(array(split({text_col}, '')), cs -> "
        f"aggregate(transform(array_distinct(cs), "
        f"d -> size(filter(cs, x -> x = d))), "
        f"cast(0 as double), "
        f"(acc, v) -> acc - (v / {n}) * log2(v / {n})))[0]"
    )
    # r11: the O(len x alphabet) compare passes are compute-heavy while
    # the frame's bytes are small — a one-file scan ran the whole pass
    # in one task (measured 1.2 s single-task at sf0.1). Metadata-gated
    # spread; no-op at scale.
    from ..functions.partitioning import spread_to_parallelism

    df = spread_to_parallelism(df)
    return df.select(
        F.col(id_col),
        F.when(F.length(text_col) > 0, F.expr(entropy))
        .otherwise(F.lit(0.0))
        .alias("char_entropy"),
    )


def bigram_pmi(
    df: DataFrame, text_col: str, min_count: int = 5, top_n: int = 50
) -> DataFrame:
    """Pointwise mutual information of corpus bigrams — the classic
    collocation/phrase-detection signal: PMI(a,b) = log2(p(ab) /
    (p(a)p(b))) with unigram probs over token count N1 and bigram probs
    over bigram count N2.

    Plan shape: two partial-aggregated counts (unigrams, bigrams — both
    shuffles bounded by vocabulary, not corpus), the two scalar totals
    ride along as broadcast single-row frames, and the bigram->unigram
    joins hash on words. PMI is computed as log2 of ONE integer-derived
    ratio (c_ab*N1*N1 / (N2*c_a*c_b)) so the double result is a single
    division + log — engine-portable at 6-digit rounding. Output:
    (gram, n, pmi), top-N by (pmi desc, gram asc) among bigrams with
    n >= min_count.
    """
    toks = f"filter(split(lower({text_col}), '\\\\s+'), t -> t <> '')"
    tokens = df.select(F.explode(F.expr(toks)).alias("w"))
    uni = tokens.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    n1 = tokens.agg(F.count(F.lit(1)).alias("n1"))
    grams = (
        f"CASE WHEN size(__t) < 2 THEN array() "
        f"ELSE transform(sequence(1, size(__t) - 1), "
        f"i -> struct(element_at(__t, i) as w1, element_at(__t, i + 1) as w2)) END"
    )
    bigrams = (
        df.select(F.expr(toks).alias("__t"))
        .select(F.explode(F.expr(grams)).alias("g"))
        .select("g.w1", "g.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_ab"))
    )
    n2 = (
        df.select(F.expr(f"greatest(size({toks}) - 1, 0)").alias("k"))
        .agg(F.sum("k").alias("n2"))
    )
    a = uni.select(F.col("w").alias("w1"), F.col("c").alias("c_a"))
    b = uni.select(F.col("w").alias("w2"), F.col("c").alias("c_b"))
    joined = (
        bigrams.join(a, "w1")
        .join(b, "w2")
        .crossJoin(F.broadcast(n1))
        .crossJoin(F.broadcast(n2))
    )
    return (
        joined.where(F.col("c_ab") >= min_count)
        .select(
            F.concat_ws(" ", "w1", "w2").alias("gram"),
            F.col("c_ab").cast("long").alias("n"),
            # cast-first products: integer c_ab*N1^2 overflows int64 at
            # trillion-token corpora; identical double op order on the
            # oracle side keeps 6-digit rounding stable
            F.round(
                F.log2(
                    (F.col("c_ab").cast("double") * F.col("n1") * F.col("n1"))
                    / (F.col("n2").cast("double") * F.col("c_a") * F.col("c_b"))
                ),
                6,
            ).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), F.asc("gram"))
        .limit(top_n)
    )


PII_PATTERNS: dict[str, str] = {
    # pragmatic (not RFC-exact) detectors, the usual pre-training
    # scrubbing set; all three compile identically under Java regex
    # (Spark) and RE2 (DuckDB) — no lookbehind, no backrefs
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\+?\b\d[\d\s().-]{7,}\d\b",
}


def redact(
    df: DataFrame,
    text_col: str,
    patterns: dict[str, str] | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """PII / sensitive-term redaction: replace every match of each
    pattern with ``[LABEL]`` and report a per-pattern match count.

    Counts are computed on the ORIGINAL text (so they are independent
    of pattern application order); replacements are applied
    sequentially in sorted-label order (deterministic when patterns
    overlap). Everything is JVM-side ``regexp_replace`` /
    ``regexp_extract_all`` — a narrow per-row projection, no shuffle,
    no Python. At 100 TB this is a map-only pass that fuses into
    whatever scan or filter precedes it.
    """
    pats = PII_PATTERNS if patterns is None else patterns
    if not pats:
        raise ValueError("patterns must be non-empty")
    out_col = out_col or text_col
    counts = [
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0)))
        .cast("long")
        .alias(f"n_{label}")
        for label, pat in sorted(pats.items())
    ]
    redacted = F.col(text_col)
    for label, pat in sorted(pats.items()):
        # Matcher.quoteReplacement semantics: $ and \ are group-reference
        # metacharacters in the replacement string
        repl = f"[{label.upper()}]".replace("\\", "\\\\").replace("$", "\\$")
        redacted = F.regexp_replace(redacted, pat, repl)
    return df.select("*", *counts).withColumn(out_col, redacted)


def bigram_lm_score(
    df: DataFrame,
    train_df: DataFrame,
    text_col: str,
    id_col: str,
) -> DataFrame:
    """Bigram language-model cross-entropy per document — the classic
    cheap "perplexity filter" for pre-training corpora (docs that score
    far above the corpus norm are gibberish; far below are boilerplate).

    Fits an add-one-smoothed bigram LM on ``train_df``:
    ``P(w2|w1) = (c(w1 w2) + 1) / (c(w1) + V)`` with ``V`` = distinct
    training unigrams, then scores every doc in ``df`` as the mean
    ``-log2 P`` over its bigrams (docs with < 2 tokens score 0).

    Plan shape: two vocabulary-bounded training aggregates; scored-doc
    bigrams hash-join the bigram table on (w1, w2) and the unigram
    table on w1 (both vocabulary-sized — broadcast when small, plain
    hash join when not); V rides along as a broadcast scalar. Per-term
    ``-log2 P`` is cast to DECIMAL(28,12) before the per-doc sum so the
    result is independent of accumulation order (engine- and
    partitioning-portable at 6-digit rounding).

    Output: ``(id_col, n_bigrams, n_unseen, cross_entropy)`` where
    ``n_unseen`` counts bigrams never seen in training.
    """
    toks = f"filter(split(lower({text_col}), '\\\\s+'), t -> t <> '')"
    grams = (
        "CASE WHEN size(__t) < 2 THEN array() "
        "ELSE transform(sequence(1, size(__t) - 1), "
        "i -> struct(element_at(__t, i) as w1, element_at(__t, i + 1) as w2)) END"
    )

    train_tokens = train_df.select(F.explode(F.expr(toks)).alias("w"))
    uni = train_tokens.groupBy("w").agg(F.count(F.lit(1)).alias("c1"))
    vocab = uni.agg(F.count(F.lit(1)).alias("v"))
    bi = (
        train_df.select(F.expr(toks).alias("__t"))
        .select(F.explode(F.expr(grams)).alias("g"))
        .groupBy(F.col("g.w1").alias("w1"), F.col("g.w2").alias("w2"))
        .agg(F.count(F.lit(1)).alias("c12"))
    )

    doc_grams = (
        df.select(F.col(id_col), F.expr(toks).alias("__t"))
        .select(F.col(id_col), F.explode(F.expr(grams)).alias("g"))
        .select(F.col(id_col), F.col("g.w1").alias("w1"), F.col("g.w2").alias("w2"))
    )
    scored = (
        doc_grams.join(bi, ["w1", "w2"], "left")
        .join(uni.withColumnRenamed("w", "w1"), "w1", "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            F.col(id_col),
            F.coalesce(F.col("c12"), F.lit(0)).alias("c12"),
            (
                -F.log2(
                    (F.coalesce(F.col("c12"), F.lit(0)) + F.lit(1)).cast("double")
                    / (F.coalesce(F.col("c1"), F.lit(0)) + F.col("v")).cast("double")
                )
            ).cast("decimal(28,12)").alias("nll"),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum((F.col("c12") == 0).cast("long")).alias("n_unseen"),
        # exact decimal accumulation, then ONE double division — the
        # result is independent of partitioning/accumulation order
        F.round(
            F.sum("nll").cast("double") / F.count(F.lit(1)), 6
        ).alias("cross_entropy"),
    )
    # docs with < 2 tokens have no bigrams: left-join them back at 0
    ids = df.select(F.col(id_col)).distinct()
    return ids.join(per_doc, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
        F.coalesce(F.col("n_unseen"), F.lit(0)).alias("n_unseen"),
        F.coalesce(F.col("cross_entropy"), F.lit(0.0)).alias("cross_entropy"),
    )


def vocab_growth(
    df: DataFrame,
    text_col: str,
    id_col: str,
    fractions: tuple[float, ...] = (0.25, 0.5, 1.0),
    salt: str = "heaps",
) -> DataFrame:
    """Heaps'-law vocabulary-growth curve (the dataset-card companion
    to :func:`zipf_fit`): distinct-word vocabulary size at nested
    corpus fractions, measured against deterministic HASH-PREFIX
    subsets (a doc is in fraction ``f`` iff its md5 bucket <
    ``f * 1e6`` — the same retry-stable predicate family as
    ``hash_sample``), so the curve needs NO global document ordering:
    a rank-based prefix would put the whole corpus through one sort at
    100 TB, while bucket membership is a row-local predicate and the
    nesting (f1 < f2 => subset) comes free from ``<`` on the same
    bucket value.

    Plan shape: ONE explode of the token stream -> per-word MIN bucket
    (vocabulary-bounded partial agg — the corpus collapses to its
    vocabulary before any curve logic) -> |fractions| conditional
    counts in a single-row aggregate, joined with the per-fraction doc
    counts (another single partial agg). Output: (fraction, n_docs,
    vocab) sorted curve.
    """
    toks = _TOKENS.format(col=text_col)
    bucket = F.expr(
        f"cast(conv(substring(md5(concat('{salt}:', cast({id_col} as string))), 1, 8),"
        " 16, 10) as bigint) % 1000000"
    )
    words = df.select(
        bucket.alias("__b"),
        F.explode(F.expr(f"filter({toks}, t -> t <> '')")).alias("__w"),
    )
    first_seen = words.groupBy("__w").agg(F.min("__b").alias("__fb"))
    vocab_row = first_seen.agg(
        *[
            F.sum(
                F.when(F.col("__fb") < int(f * 1_000_000), 1).otherwise(0)
            )
            .cast("long")
            .alias(f"__v{i}")
            for i, f in enumerate(fractions)
        ]
    )
    docs_row = df.select(bucket.alias("__b")).agg(
        *[
            F.sum(
                F.when(F.col("__b") < int(f * 1_000_000), 1).otherwise(0)
            )
            .cast("long")
            .alias(f"__d{i}")
            for i, f in enumerate(fractions)
        ]
    )
    # The one-row curve frame carries the whole explode + min-bucket
    # subtree and feeds one select PER fraction — pin it so the corpus
    # explode runs once, not |fractions| times (r6 judge sweep).
    curve = vocab_row.crossJoin(docs_row).localCheckpoint(eager=True)
    points = [
        curve.select(
            F.lit(f).cast("double").alias("fraction"),
            F.col(f"__d{i}").alias("n_docs"),
            F.col(f"__v{i}").alias("vocab"),
        )
        for i, f in enumerate(fractions)
    ]
    out = points[0]
    for p in points[1:]:
        out = out.unionByName(p)
    return out


def zipf_fit(df: DataFrame, text_col: str, top_n: int = 1000) -> DataFrame:
    """Zipf's-law fit over the corpus word distribution: least-squares
    slope/intercept/r2 of ln(freq) on ln(rank) for the ``top_n`` most
    frequent words (natural text slopes toward -1; a flat or cliffy
    curve flags synthetic/templated corpora on a dataset card).

    Plan shape: word counts are a vocabulary-bounded partial-aggregated
    groupBy; ranking is a global top-N (TakeOrdered — no full sort);
    the regression runs on <= ``top_n`` rows. The rank tie-break is
    (freq desc, word asc), deterministic across engines. Each ln() term
    is cast to DECIMAL(28,12) before summing, so every regression sum
    is EXACT and the fit is independent of accumulation order; the
    final slope/intercept/r2 are each ONE double expression over those
    exact sums.
    """
    toks = f"filter(split(lower({text_col}), '\\\\s+'), t -> t <> '')"
    counts = (
        df.select(F.explode(F.expr(toks)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    ranked = (
        counts.orderBy(F.desc("c"), F.asc("w"))
        .limit(top_n)
        .withColumn(
            "rk",
            F.row_number().over(
                Window.orderBy(F.desc("c"), F.asc("w"))
            ),
        )
    )
    dec = "decimal(28,12)"
    terms = ranked.select(
        F.expr(f"cast(ln(rk) as {dec})").alias("x"),
        F.expr(f"cast(ln(c) as {dec})").alias("y"),
        F.expr(f"cast(cast(ln(rk) as {dec}) * cast(ln(c) as {dec}) as {dec})").alias("xy"),
        F.expr(f"cast(cast(ln(rk) as {dec}) * cast(ln(rk) as {dec}) as {dec})").alias("xx"),
        F.expr(f"cast(cast(ln(c) as {dec}) * cast(ln(c) as {dec}) as {dec})").alias("yy"),
    )
    sums = terms.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum("xy").cast("double").alias("sxy"),
        F.sum("xx").cast("double").alias("sxx"),
        F.sum("yy").cast("double").alias("syy"),
    )
    return sums.select(
        F.col("n").cast("long").alias("n_words"),
        F.round(
            F.expr("(n * sxy - sx * sy) / (n * sxx - sx * sx)"), 6
        ).alias("zipf_slope"),
        F.round(
            F.expr("(sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n"),
            6,
        ).alias("zipf_intercept"),
        F.round(
            F.expr(
                "(n * sxy - sx * sy) * (n * sxy - sx * sy)"
                " / ((n * sxx - sx * sx) * (n * syy - sy * sy))"
            ),
            6,
        ).alias("r2"),
    )


def tfidf_top_terms(
    df: DataFrame, text_col: str, id_col: str, k: int = 3
) -> DataFrame:
    """Per-document top-``k`` terms by smoothed TF-IDF — the standard
    keyword-extraction / relevance signal over a corpus:
    ``tfidf = tf * (ln((N + 1) / (df + 1)) + 1)`` (add-one-smoothed
    idf, so terms present in every document still score > 0).

    Plan shape, sized for 100 TB: term frequencies are ONE explode +
    partial-aggregated groupBy on (doc, term) — the shuffle carries
    (doc, term, partial count), bounded by distinct doc-term pairs, not
    token occurrences; document frequencies reuse that frame (a second
    vocabulary-bounded agg, no re-scan of the corpus); the corpus doc
    count rides along as a broadcast single-row frame; and the final
    per-doc top-k is a window partitioned BY DOCUMENT, so every
    partition is bounded by one document's vocabulary — nothing here is
    a global sort. The tf->df join hashes on term; AQE may broadcast
    the df side when the vocabulary is small.

    Cross-engine determinism: tf/df/N are exact integers; idf is one
    double division + ln per row (identical op order in the oracle);
    ranking uses the ROUNDED tfidf with a term-asc tie-break, so an
    ulp disagreement in ``ln`` between engines cannot flip ranks.
    """
    toks = f"filter(split(lower({text_col}), '\\\\s+'), t -> t <> '')"
    tf = (
        df.select(F.col(id_col), F.explode(F.expr(toks)).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    ndocs = df.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(ndocs))
        .select(
            F.col(id_col),
            F.col("term"),
            F.col("tf").cast("long").alias("tf"),
            F.round(
                F.col("tf").cast("double")
                * (
                    F.log(
                        (F.col("n_docs").cast("double") + 1.0)
                        / (F.col("df").cast("double") + 1.0)
                    )
                    + 1.0
                ),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select(id_col, "term", "tf", "tfidf", F.col("rk").cast("long").alias("rk"))
    )


def dup_ngram_coverage(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    min_docs: int = 2,
) -> DataFrame:
    """Per-document duplicated-n-gram coverage (the Gopher/MassiveText
    cross-document repetition filter): the fraction of a document's
    word ``n``-gram occurrences whose n-gram also appears in at least
    ``min_docs`` distinct documents. High coverage flags boilerplate /
    templated pages that per-document repetition metrics miss because
    the repetition lives ACROSS documents.

    Plan shape, sized for 100 TB: one explode to (doc, gram)
    occurrences; the gram document-frequency aggregate first collapses
    to DISTINCT (doc, gram) map-side before counting, so both shuffles
    are bounded by distinct doc-gram pairs / n-gram vocabulary, not by
    token occurrences; the coverage join hashes occurrences against the
    df table on gram; the final per-doc agg is a partial-aggregated
    groupBy. Documents shorter than ``n`` tokens surface with
    ``n_ngrams = 0`` and coverage 0 (left join back to the corpus), so
    the operator is total over the input.
    """
    toks = f"filter(split(lower({text_col}), '\\\\s+'), t -> t <> '')"
    joined = " , ' ', ".join(f"element_at(__t, i + {j})" for j in range(n))
    grams = (
        f"CASE WHEN size(__t) < {n} THEN array() "
        f"ELSE transform(sequence(1, size(__t) - {n - 1}), "
        f"i -> concat({joined})) END"
    )
    # r11: occ feeds TWO consumers (the doc-frequency aggregate and the
    # coverage join) and its lineage is the tokenize + n-gram-concat
    # explode — the most expensive projection in the operator, measured
    # as two separate full 13 s-runTime passes at sf0.1. Spread the
    # under-parallel scan first (metadata-gated), then materialize the
    # exploded occurrences ONCE.
    from ..functions.partitioning import spread_to_parallelism

    occ = (
        spread_to_parallelism(df)
        .select(F.col(id_col), F.expr(toks).alias("__t"))
        .select(F.col(id_col), F.explode(F.expr(grams)).alias("gram"))
        .localCheckpoint(eager=True)
    )
    gram_df = (
        occ.select(id_col, "gram")
        .distinct()
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("gdf"))
    )
    per_doc = (
        occ.join(gram_df, "gram")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.sum(
                F.when(F.col("gdf") >= min_docs, F.lit(1)).otherwise(F.lit(0))
            ).alias("n_dup"),
        )
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_ngrams"), F.lit(0)).cast("long").alias("n_ngrams"),
            F.coalesce(F.col("n_dup"), F.lit(0)).cast("long").alias("n_dup"),
            F.round(
                F.coalesce(F.col("n_dup"), F.lit(0)).cast("double")
                / F.greatest(F.coalesce(F.col("n_ngrams"), F.lit(0)), F.lit(1)),
                6,
            ).alias("dup_frac"),
        )
    )


def bm25_scores(
    df: DataFrame,
    text_col: str,
    id_col: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 relevance of every document against a fixed query —
    the standard lexical retrieval scorer (Robertson & Walker 1994; the
    public Okapi formulation with the Lucene-style non-negative idf
    ``ln(1 + (N - df + 0.5)/(df + 0.5))``). Output: (id, score) for
    documents matching at least one query term, score rounded to 6
    decimals.

    Plan shape at 100 TB: term frequencies for THE QUERY TERMS ONLY —
    the explode is filtered to |query| terms before the (doc, term)
    groupBy, so the shuffle is bounded by matching docs x query size,
    not the corpus vocabulary. Document frequencies and (N, avgdl) are
    tiny aggregates the per-doc score joins via broadcast; the corpus
    is scanned twice (once for lengths, once for matches), never
    re-shuffled on a data-sized key.

    Determinism: tf/df/dl/N are exact integers; the float pipeline is
    fixed-order (idf * tf_norm summed over <= |query| terms after a
    per-term round) so both engines agree to the rounded digit.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    toks = _TOKENS.format(col=text_col)
    terms_lit = "array(" + ", ".join(f"'{t.lower()}'" for t in query_terms) + ")"
    lengths = df.select(
        F.col(id_col),
        F.expr(f"size(filter({toks}, t -> t <> ''))").alias("dl"),
    )
    stats = lengths.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    tf = (
        df.select(F.col(id_col), F.explode(F.expr(toks)).alias("term"))
        .where(F.expr(f"array_contains({terms_lit}, term)"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(lengths, id_col)
        .crossJoin(F.broadcast(stats))
        .select(
            F.col(id_col),
            F.round(
                F.expr(
                    f"ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) * "
                    f"(tf * ({k1} + 1.0)) / "
                    f"(tf + {k1} * (1.0 - {b} + {b} * dl / avgdl))"
                ),
                9,
            ).alias("term_score"),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(F.round(F.sum("term_score"), 6).alias("score"))
    )


def normalize_text(
    df: DataFrame,
    text_col: str,
    id_col: str,
) -> DataFrame:
    """Deterministic text cleanup — the standard pre-tokenization
    normalization pass of a corpus pipeline: control characters stripped,
    curly quotes / long dashes / unicode spaces folded to ASCII,
    whitespace collapsed to single spaces, trimmed. Output:
    (id, clean_text, n_changed — 0/1 flag for rows the pass modified).

    All regexp_replace chains over explicit codepoint classes (hex
    escapes + literal char lists only — no \\p{...} classes, whose
    definitions differ between regex engines), so the SQL oracle
    reproduces it byte-for-byte. Narrow projection: zero shuffle.
    """
    # literal codepoints (not \\u escapes: Java regex and RE2 spell
    # those differently; a literal UTF-8 char means the same in both)
    quotes_single = "[‘’‚‛]"
    quotes_double = "[“”„‟]"
    dashes = "[‒–—―]"
    spaces = "[  -​  　]"
    cntrl = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]"
    cleaned = F.col(text_col)
    for pat, rep in (
        (cntrl, ""),
        (spaces, " "),
        (quotes_single, "'"),
        (quotes_double, '"'),
        (dashes, "-"),
        ("[ \\t\\r\\n]+", " "),
    ):
        cleaned = F.regexp_replace(cleaned, pat, rep)
    cleaned = F.trim(cleaned)
    return df.select(
        F.col(id_col),
        cleaned.alias("clean_text"),
        F.when(cleaned == F.col(text_col), F.lit(0))
        .otherwise(F.lit(1))
        .cast("long")
        .alias("n_changed"),
    )


def build_postings(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_df: int = 1,
    max_postings: int = 1000,
) -> DataFrame:
    """Inverted index: term -> sorted posting list of (doc, tf) structs,
    capped at ``max_postings`` entries (hot/stopword terms keep their
    document-frequency count but truncate the stored list — the
    impact-ordered-index compromise). Output:
    (term, df, postings array<struct<doc,tf>>).

    Plan shape at 100 TB: ONE explode + partial-aggregated (doc, term)
    count (shuffle bounded by distinct doc-term pairs), then one groupBy
    term whose per-group state is the capped posting list —
    ``slice(array_sort(...))`` after collect_list bounds memory per
    term at max_postings structs. Skewed stopword terms are exactly the
    AQE-skew-split case; the cap keeps their reduce-side state bounded
    too.
    """
    toks = _TOKENS.format(col=text_col)
    tf = (
        df.select(F.col(id_col).alias("doc"), F.explode(F.expr(toks)).alias("term"))
        .where(F.col("term") != "")
        .groupBy("doc", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return (
        tf.groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("long").alias("df"),
            F.expr(
                f"slice(array_sort(collect_list(struct(doc, tf))), 1, {int(max_postings)})"
            ).alias("postings"),
        )
        .where(F.col("df") >= min_df)
    )


def ngram_novelty(
    df: "DataFrame",
    text_col: str,
    id_col: str,
    shingle_len: int = 5,
) -> "DataFrame":
    """Per-document n-gram novelty: the share of a document's distinct
    hashed ``shingle_len``-grams whose FIRST occurrence (minimum id
    over all documents containing the gram) is this document — the
    corpus-order originality signal used to down-weight recombined /
    templated text in pretraining curation (a doc assembled from
    already-seen fragments scores ~0 even when no single near-dup
    pair exists, which is exactly what pair-based dedup misses).

    Physical shape: one shingle explode (the shared
    ``dedup.exploded_shingles`` projection) feeding two PARTIAL-AGG
    aggregates — per-doc gram totals, and per-gram ``min(id)`` owners
    rolled up to per-owner novel counts — joined at DOC granularity.
    The gram-level frame is never joined against itself (the naive
    join-back on the gram hash re-shuffles the full exploded corpus; a
    first cut measured it at ~2x this plan at sf0.1), and nothing is
    materialized: both consumers are narrow re-scans of the explode,
    which at 100 TB is far cheaper than checkpointing a
    corpus-times-grams intermediate. Counts are exact integers; the
    ratio divides once at the end.

    Output: (``id_col``, n_grams BIGINT, n_novel BIGINT,
    novelty DOUBLE).
    """
    from .dedup import exploded_shingles

    sh = exploded_shingles(df, text_col, id_col, "__id", shingle_len)
    totals = sh.groupBy(F.col("__id").alias(id_col)).agg(
        F.count(F.lit(1)).cast("long").alias("n_grams")
    )
    novel = (
        sh.groupBy("__g")
        .agg(F.min("__id").alias("__owner"))
        .groupBy(F.col("__owner").alias(id_col))
        .agg(F.count(F.lit(1)).cast("long").alias("__nn"))
    )
    return totals.join(novel, id_col, "left").select(
        id_col,
        "n_grams",
        F.coalesce(F.col("__nn"), F.lit(0)).cast("long").alias("n_novel"),
        F.round(
            F.coalesce(F.col("__nn"), F.lit(0)) / F.col("n_grams"), 6
        ).alias("novelty"),
    )
