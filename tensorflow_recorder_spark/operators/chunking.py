"""Document chunking (E3/E6 extension): split long documents into
fixed-size token windows with configurable overlap — the standard
pre-tokenization step for context-window-bounded training and for
retrieval indexing (one embedding per chunk, not per document).

The reference has no notion of chunking (its rows are already
training-example-sized, /root/reference/tfrecorder/beam_pipeline.py);
at 100 TB the corpus is web documents whose length distribution is
heavy-tailed, and chunking is what bounds downstream per-row cost.

Scale shape: pure JVM-side expressions (split / sequence / slice /
posexplode) — map-only, no shuffle, no Python. Output size is
``ceil(n_tokens / stride)`` rows per document; there is no per-document
state, so the operator is embarrassingly parallel and survives any
scale-up. Skew note: a single pathological document produces
``n/stride`` chunks but they are generated inside one task without
materializing the token array more than once per row; pair with
``text.corpus_filter`` length caps upstream if single-row blowup is a
concern.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _tokens_expr(text_col: str) -> str:
    # Shared token discipline with operators/text.py: lowercase-free
    # whitespace split, empties dropped (chunking must preserve case).
    return f"filter(split({text_col}, '\\\\s+'), t -> t <> '')"


def chunk_documents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    chunk_size: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Explode each document into token-window chunks.

    Pinned semantics (deterministic, engine-reproducible):

    * tokens = whitespace-split, empty tokens dropped, case preserved;
    * chunk start positions are ``1, 1+stride, 1+2*stride, ...`` while
      ``start <= n_tokens`` — so consecutive chunks overlap by
      ``chunk_size - stride`` tokens and the final chunk may be shorter
      than ``chunk_size`` (it is never empty);
    * a document with zero tokens produces zero chunks.

    Output: (id, chunk_id 0-based, chunk_text, chunk_tokens) — one row
    per chunk. ``chunk_text`` re-joins the window with single spaces
    (original inter-token whitespace is normalized; document it
    downstream if byte-exact reconstruction matters).
    """
    if chunk_size < 1:
        raise ValueError(f"chunk_size must be >= 1, got {chunk_size}")
    if stride < 1:
        raise ValueError(f"stride must be >= 1, got {stride}")
    toks = _tokens_expr(text_col)
    starts = (
        f"CASE WHEN size({toks}) = 0 THEN array() "
        f"ELSE sequence(1, size({toks}), {stride}) END"
    )
    chunks = (
        f"transform({starts}, s -> "
        f"slice({toks}, s, {chunk_size}))"
    )
    out = df.select(
        F.col(id_col),
        F.posexplode(F.expr(chunks)).alias("chunk_id", "__chunk"),
    )
    return out.select(
        id_col,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.array_join("__chunk", " ").alias("chunk_text"),
        F.size("__chunk").cast("long").alias("chunk_tokens"),
    )


def chunk_stats(
    df: DataFrame,
    text_col: str,
    id_col: str,
    chunk_size: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Corpus-level chunking report without materializing chunk text:
    per document, the number of chunks and total/boundary token counts —
    an arithmetic projection (no explode), so planners can size the
    downstream chunk table before producing it.

    Output: (id, n_tokens, n_chunks, last_chunk_tokens).
    """
    if chunk_size < 1:
        raise ValueError(f"chunk_size must be >= 1, got {chunk_size}")
    if stride < 1:
        raise ValueError(f"stride must be >= 1, got {stride}")
    toks = _tokens_expr(text_col)
    n = F.expr(f"size({toks})").cast("long")

    def n_chunks(nc: Column) -> Column:
        # starts while start <= n, start = 1 + i*stride  =>  i <= (n-1)/stride
        return F.when(nc <= 0, F.lit(0)).otherwise(
            F.floor((nc - 1) / F.lit(stride)) + 1
        ).cast("long")

    nc = n_chunks(n)
    last_start = (nc - 1) * F.lit(stride) + 1
    last_len = F.when(nc <= 0, F.lit(0)).otherwise(
        F.least(F.lit(chunk_size), n - last_start + 1)
    ).cast("long")
    return df.select(
        F.col(id_col),
        n.alias("n_tokens"),
        nc.alias("n_chunks"),
        last_len.alias("last_chunk_tokens"),
    )
