"""Byte-pair-encoding tokenizer training (E3 extension): the standard
subword-vocabulary fit (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units" — public) re-expressed
for Spark.

Why it distributes: BPE statistics are WORD-SHAPED, not corpus-shaped —
the corpus collapses to (word, count) once (one explode + one groupBy),
and every merge iteration then runs over the distinct-word table:
pair counting is a partial-aggregated explode over it, the argmax merge
choice is a 1-row driver action, and the merge application is a per-word
higher-order fold. At 100 TB the distinct-word table is vocabulary-
bounded (tens of millions of rows, kilobytes per row), so the loop's
per-iteration cost is independent of corpus size after the first pass.

Encoding uses the fitted merge ranks greedily (lowest-rank adjacent
pair first — the published application order) in an Arrow-batched
``mapInPandas``: applying N merges as N nested SQL folds would build an
expression tree of depth N; the Python loop is per-word-bounded and
map-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

END_MARK = "</w>"  # end-of-word sentinel, per the published algorithm


def _sql_quote(s: str) -> str:
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def word_counts(df: DataFrame, text_col: str) -> DataFrame:
    """(word, n) over lowercased whitespace tokens — the corpus
    statistic every BPE iteration reuses; ONE corpus pass."""
    toks = f"filter(split(lower({text_col}), '\\\\s+'), t -> t <> '')"
    return (
        df.select(F.explode(F.expr(toks)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _with_symbols(words: DataFrame) -> DataFrame:
    """Attach the initial symbol sequence: characters + end-of-word mark
    (split('') yields chars; the trailing empty string becomes the
    sentinel slot)."""
    return words.select(
        "word",
        "n",
        F.expr(
            f"concat(filter(split(word, ''), c -> c <> ''), array({_sql_quote(END_MARK)}))"
        ).alias("syms"),
    )


def pair_counts(symbols: DataFrame) -> DataFrame:
    """Adjacent-symbol pair frequencies weighted by word count:
    (left, right, cnt). The explode runs over the vocabulary-bounded
    word table; the groupBy key space is the pair vocabulary."""
    pairs = symbols.select(
        "n",
        F.explode(
            F.expr(
                "CASE WHEN size(syms) < 2 THEN array() "
                "ELSE zip_with(slice(syms, 1, size(syms) - 1), "
                "slice(syms, 2, size(syms) - 1), "
                "(l, r) -> struct(l AS left, r AS right)) END"
            )
        ).alias("p"),
    )
    return (
        pairs.groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right"))
        .agg(F.sum("n").cast("long").alias("cnt"))
    )


def _merge_expr(left: str, right: str) -> str:
    """Greedy left-to-right merge of one (left, right) pair inside the
    symbol array, as a higher-order fold (the merged symbol cannot
    re-participate as the LEFT of another merge in the same pass —
    matching the reference implementation's re-scan semantics)."""
    lq, rq, mq = _sql_quote(left), _sql_quote(right), _sql_quote(left + right)
    return (
        f"aggregate(syms, struct(cast(array() as array<string>) AS acc, false AS just), "
        f"(s, x) -> CASE WHEN NOT s.just AND size(s.acc) > 0 "
        f"AND element_at(s.acc, -1) = {lq} AND x = {rq} "
        f"THEN struct(concat(slice(s.acc, 1, size(s.acc) - 1), array({mq})), true) "
        f"ELSE struct(concat(s.acc, array(x)), false) END, "
        f"s -> s.acc)"
    )


def bpe_fit(
    df: DataFrame,
    text_col: str,
    num_merges: int = 10,
) -> list[tuple[int, str, str]]:
    """Train ``num_merges`` BPE merges over the corpus. Returns the
    ordered merge table [(rank, left, right)] — the tokenizer model
    (broadcastable fitted state, like a vocabulary).

    Per iteration: pair counting over the word table (bounded), a
    single-row argmax collect (count desc, then (left, right) asc for a
    deterministic tie-break), and the fold-merge projection;
    ``localCheckpoint`` truncates the per-iteration lineage exactly as
    in ``similarity.kmeans_fit``. Stops early when no pair repeats.
    """
    if num_merges < 1:
        raise ValueError(f"num_merges must be >= 1, got {num_merges}")
    symbols = _with_symbols(word_counts(df, text_col)).localCheckpoint(eager=True)
    merges: list[tuple[int, str, str]] = []
    for rank in range(num_merges):
        top = (
            pair_counts(symbols)
            .orderBy(F.desc("cnt"), F.asc("left"), F.asc("right"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["cnt"] < 2:
            break
        left, right = top[0]["left"], top[0]["right"]
        merges.append((rank, left, right))
        symbols = symbols.select(
            "word", "n", F.expr(_merge_expr(left, right)).alias("syms")
        ).localCheckpoint(eager=True)
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy BPE application to ONE word: repeatedly merge all
    left-to-right non-overlapping occurrences of the LOWEST-RANK
    adjacent pair (the published application order) until no pair in
    the rank table remains."""
    syms = list(word) + [END_MARK]
    while len(syms) > 1:
        best = None
        best_rank = None
        for i in range(len(syms) - 1):
            rk = ranks.get((syms[i], syms[i + 1]))
            if rk is not None and (best_rank is None or rk < best_rank):
                best, best_rank = i, rk
        if best is None:
            break
        pair = (syms[best], syms[best + 1])
        out = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and (syms[i], syms[i + 1]) == pair:
                out.append(syms[i] + syms[i + 1])
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_encode(
    df: DataFrame,
    text_col: str,
    id_col: str,
    merges: list[tuple[int, str, str]],
) -> DataFrame:
    """Encode documents with a fitted merge table: per word, repeatedly
    merge the LOWEST-RANK adjacent pair (the published greedy order).
    Output: (id, n_tokens, n_subwords, subwords array<string> of the
    first 50 subwords — bounded payload).

    Arrow-batched map-only stage; the merge table broadcasts via task
    closure (it is tokenizer-sized, kilobytes)."""
    import pandas as pd
    from pyspark.sql import types as T

    ranks = {(l, r): k for k, l, r in merges}

    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("n_tokens", T.LongType()),
            T.StructField("n_subwords", T.LongType()),
            T.StructField("subwords", T.ArrayType(T.StringType())),
        ]
    )

    def run(batches):
        for pdf in batches:
            ids, n_toks, n_subs, subs = [], [], [], []
            for rid, text in zip(pdf[id_col], pdf[text_col]):
                words = [w for w in (text or "").lower().split() if w]
                pieces: list[str] = []
                for w in words:
                    pieces.extend(encode_word(w, ranks))
                ids.append(rid)
                n_toks.append(len(words))
                n_subs.append(len(pieces))
                subs.append(pieces[:50])
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "n_tokens": n_toks,
                    "n_subwords": n_subs,
                    "subwords": subs,
                }
            )

    return df.select(id_col, text_col).mapInPandas(run, schema=out_schema)


def bpe_encode_dict(
    df: DataFrame,
    text_col: str,
    id_col: str,
    merges: list[tuple[int, str, str]],
    preview: int = 50,
) -> DataFrame:
    """Dictionary-trick encode — the at-scale form of :func:`bpe_encode`:
    each DISTINCT word is encoded exactly once (the encode loop runs
    over the vocabulary-bounded word table, not the corpus), then the
    per-word subword lists join back onto the (id, position, word)
    token stream and reassemble in order. Identical output to
    ``bpe_encode`` (unit-tested); at 100 TB the Python encode cost
    drops from corpus tokens to distinct words — the same
    corpus-collapses-to-vocabulary argument as :func:`bpe_fit`.

    Plan shape: one explode, one distinct over words, an Arrow-batched
    map over the word table, one equi-join on the word key (skewed
    stopwords are AQE-splittable), one groupBy(id) whose per-doc state
    is the bounded (position, subwords) list. Empty documents survive
    via the final left join.
    """
    import pandas as pd
    from pyspark.sql import types as T

    ranks = {(l, r): k for k, l, r in merges}
    toks = f"filter(split(lower({text_col}), '\\\\s+'), t -> t <> '')"
    tokens = df.select(F.col(id_col), F.expr(toks).alias("__w"))
    distinct_words = (
        tokens.select(F.explode("__w").alias("word")).distinct()
    )

    word_schema = T.StructType(
        [
            T.StructField("word", T.StringType()),
            T.StructField("subs", T.ArrayType(T.StringType())),
        ]
    )

    def enc(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "word": pdf["word"],
                    "subs": [encode_word(w, ranks) for w in pdf["word"]],
                }
            )

    encoded = distinct_words.mapInPandas(enc, schema=word_schema)
    stream = tokens.select(
        id_col, F.posexplode("__w").alias("pos", "word")
    )
    per_doc = (
        stream.join(encoded, "word")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum(F.size("subs")).cast("long").alias("n_subwords"),
            F.expr(
                f"slice(flatten(transform(array_sort(collect_list("
                f"struct(pos, subs))), s -> s.subs)), 1, {int(preview)})"
            ).alias("subwords"),
        )
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("n_subwords", F.lit(0)).cast("long").alias("n_subwords"),
            F.coalesce(
                "subwords", F.expr("cast(array() as array<string>)")
            ).alias("subwords"),
        )
    )
