"""BPE tokenizer trainer tests (operators/bpe.py): the Sennrich et al.
2016 algorithm — merge order on the classic corpus, greedy rank-ordered
encoding, determinism, and end-of-word handling."""

import pytest

from tensorflow_recorder_spark.operators.bpe import (
    END_MARK,
    bpe_encode,
    bpe_fit,
    pair_counts,
    word_counts,
    _with_symbols,
)


def _classic(spark):
    # 5x low, 2x lower, 6x newest, 3x widest — the textbook BPE corpus
    text = " ".join(
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    )
    return spark.createDataFrame([(1, text)], "doc_id long, text string")


def test_bpe_fit_classic_merge_order(spark):
    merges = bpe_fit(_classic(spark), "text", num_merges=5)
    # 'es' appears in newest(6) + widest(3) = 9 — the first merge;
    # then 'es'+'t' (9), 'est'+'</w>' (9), then 'l'+'o' (7), 'lo'+'w' (7)
    assert [(l, r) for _, l, r in merges] == [
        ("e", "s"), ("es", "t"), ("est", END_MARK), ("l", "o"), ("lo", "w"),
    ]
    assert [k for k, _, _ in merges] == [0, 1, 2, 3, 4]


def test_bpe_fit_deterministic_and_early_stop(spark):
    df = _classic(spark)
    assert bpe_fit(df, "text", num_merges=4) == bpe_fit(df, "text", num_merges=4)
    # a corpus of all-unique characters has no pair with count >= 2
    tiny = spark.createDataFrame([(1, "ab cd")], "doc_id long, text string")
    assert bpe_fit(tiny, "text", num_merges=5) == []
    with pytest.raises(ValueError, match="num_merges"):
        bpe_fit(df, "text", num_merges=0)


def test_bpe_encode_applies_rank_order(spark):
    df = _classic(spark)
    merges = bpe_fit(df, "text", num_merges=8)
    out = {r["doc_id"]: r for r in bpe_encode(df, "text", "doc_id", merges).collect()}
    row = out[1]
    assert row["n_tokens"] == 16
    # fully-merged frequent words appear as single subwords
    assert "newest</w>" in row["subwords"]
    assert row["n_subwords"] < 16 * 4  # far fewer pieces than chars
    # no merges -> pure characters + sentinel
    raw = bpe_encode(df, "text", "doc_id", []).collect()[0]
    assert raw["n_subwords"] == sum(len(w) + 1 for w in
                                    ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)


def test_pair_counts_weighted_by_word_frequency(spark):
    df = _classic(spark)
    pc = {(r["left"], r["right"]): r["cnt"]
          for r in pair_counts(_with_symbols(word_counts(df, "text"))).collect()}
    assert pc[("e", "s")] == 9      # newest x6 + widest x3
    assert pc[("l", "o")] == 7      # low x5 + lower x2
    assert pc[("t", END_MARK)] == 9


def test_bpe_encode_dict_matches_rowwise_encode(spark):
    """The dictionary-trick encode (distinct words once + join-back)
    must be value-identical to the per-row encode on every column."""
    from tensorflow_recorder_spark.operators.bpe import bpe_encode_dict

    df = spark.createDataFrame(
        [
            (1, "low lower newest the the widest"),
            (2, "newest newest LOW"),
            (3, ""),
            (4, "   "),
            (5, "unseen zzz"),
        ],
        "doc_id long, text string",
    )
    merges = bpe_fit(_classic(spark), "text", num_merges=8)
    a = {r["doc_id"]: (r["n_tokens"], r["n_subwords"], tuple(r["subwords"]))
         for r in bpe_encode(df, "text", "doc_id", merges).collect()}
    b = {r["doc_id"]: (r["n_tokens"], r["n_subwords"], tuple(r["subwords"]))
         for r in bpe_encode_dict(df, "text", "doc_id", merges).collect()}
    assert a == b
    # empty/whitespace-only docs survive with zero counts
    assert b[3] == (0, 0, ())
    assert b[4] == (0, 0, ())


def test_bpe_encode_dict_preview_truncation(spark):
    from tensorflow_recorder_spark.operators.bpe import bpe_encode_dict

    df = spark.createDataFrame(
        [(1, " ".join(["xy"] * 10))], "doc_id long, text string"
    )
    [r] = bpe_encode_dict(df, "text", "doc_id", [], preview=5).collect()
    # 10 words x 3 symbols each = 30 subwords, preview capped at 5
    assert r["n_subwords"] == 30
    assert len(r["subwords"]) == 5
    assert r["subwords"] == ["x", "y", END_MARK, "x", "y"]
