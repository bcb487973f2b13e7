"""Sequence packing — greedy bin-packing of documents into fixed
token-budget training sequences.

LLM pre-training consumes fixed-length sequences (2048/4096/8192
tokens); feeding one short document per sequence wastes most of the
context window as padding. The standard fix is to *pack* consecutive
documents into each sequence until the token budget is exhausted
(GPT/T5-style "example packing"). The reference engine has no analog —
this is part of the training-data extension surface (SURVEY.md §2 E*).

Packing is inherently sequential (bin state carries across rows), so a
single global greedy pass cannot be distributed. The scalable shape
used here:

- **Shard first, pack within shards.** Each doc is assigned a shard by
  a deterministic md5 bucket of its id (the same pure-function trick as
  ``operators.sampling`` — retry/engine-stable, no ``rand()``). Greedy
  packing then runs independently per shard, ordered by id. Parallelism
  = ``nshards``; choose it so one shard's (id, n_tokens) pairs fit one
  task (~16 B/doc — at 1B docs and 65k shards a shard is ~250 KB).
- **Only (id, shard, n_tokens) enters the Python stage.** The text
  column is dropped before the shuffle, so the grouped
  ``applyInPandas`` moves a few bytes per document, never the corpus.
  Joining ``bin_id`` back onto full rows afterward is a plain equi-join
  on the id.
- The per-shard greedy loop is a tiny Python loop over an Arrow batch —
  O(rows in shard), no quadratic behavior.

Semantics (deterministic, oracle-checkable by a recursive CTE):
within a shard, docs are visited in ascending id order; a doc opens a
new bin iff the current bin is non-empty and would overflow
``capacity``. A doc longer than ``capacity`` is placed alone in its own
bin (overflowing it — truncation is the downstream tokenizer's call).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import IntegerType, LongType, StructField, StructType

def token_count_expr(text_col: str) -> F.Column:
    """Whitespace token count, matching operators.text's convention."""
    return F.expr(f"size(split(lower({text_col}), '\\\\s+'))")


def pack_sequences(
    df: DataFrame,
    id_col: str,
    text_col: str,
    capacity: int,
    nshards: int = 64,
    salt: str = "pack",
) -> DataFrame:
    """Assign every row a ``(shard, bin_id, bin_offset)`` packing slot.

    Returns ``id_col, shard, bin_id, bin_offset, n_tokens`` where
    ``bin_id`` is the 0-based greedy bin index within the shard and
    ``bin_offset`` the token position at which this doc starts in its
    bin. Deterministic: a re-run (or task retry) produces byte-identical
    assignments.
    """
    if capacity <= 0:
        raise ValueError(f"capacity must be positive, got {capacity}")
    if nshards <= 0:
        raise ValueError(f"nshards must be positive, got {nshards}")

    counts = df.select(
        F.col(id_col),
        # NULL text -> 0 tokens (a NaN would crash int() in the pandas
        # stage; every sibling curation operator tolerates dirty rows)
        F.coalesce(token_count_expr(text_col).cast("long"), F.lit(0)).alias(
            "n_tokens"
        ),
    )
    return pack_sequences_counted(
        counts, id_col, "n_tokens", capacity, nshards, salt
    )


def pack_sequences_counted(
    counts: DataFrame,
    id_col: str,
    count_col: str,
    capacity: int,
    nshards: int = 64,
    salt: str = "pack",
) -> DataFrame:
    """The packing core over a PRECOMPUTED (id, token-count) frame —
    what :func:`pack_sequences` delegates to after counting whitespace
    tokens. Passing real tokenizer counts (e.g. BPE subwords from
    ``bpe.bpe_encode_dict``) packs by the budget the model actually
    pays, which is the production form: whitespace counts under-fill
    bins exactly where fertility > 1. Same determinism and
    shard-then-pack plan shape; only ``(id, shard, n_tokens)`` ever
    enters the Python stage."""
    if capacity <= 0:
        raise ValueError(f"capacity must be positive, got {capacity}")
    if nshards <= 0:
        raise ValueError(f"nshards must be positive, got {nshards}")

    # the md5-slice bucket shared with operators.sampling — one recipe,
    # one engine-parity contract
    from .sampling import _bucket_expr

    df = counts
    id_field = df.schema[id_col]
    narrow = df.select(
        F.col(id_col),
        F.expr(_bucket_expr(id_col, salt, denom=nshards))
        .cast("int")
        .alias("shard"),
        F.coalesce(F.col(count_col).cast("long"), F.lit(0)).alias(
            "n_tokens"
        ),
    )

    out_schema = StructType(
        [
            StructField(id_col, id_field.dataType),
            StructField("shard", IntegerType()),
            StructField("bin_id", LongType()),
            StructField("bin_offset", LongType()),
            StructField("n_tokens", LongType()),
        ]
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        bin_ids, offsets = [], []
        bin_id, fill = 0, 0
        for nt in pdf["n_tokens"]:
            nt = int(nt)
            if fill > 0 and fill + nt > capacity:
                bin_id += 1
                fill = 0
            bin_ids.append(bin_id)
            offsets.append(fill)
            fill += nt
        pdf["bin_id"] = pd.Series(bin_ids, dtype="int64")
        pdf["bin_offset"] = pd.Series(offsets, dtype="int64")
        return pdf[[id_col, "shard", "bin_id", "bin_offset", "n_tokens"]]

    return narrow.groupBy("shard").applyInPandas(_pack, schema=out_schema)


def pack_stats(packed: DataFrame, capacity: int) -> DataFrame:
    """Packing-efficiency rollup per shard: bins used, docs, tokens,
    and fill ratio (tokens / (bins * capacity)). One partial-aggregated
    groupBy over the packed assignment — the dataset-card view of how
    much context window a packing run wastes."""
    return (
        packed.groupBy("shard")
        .agg(
            (F.max("bin_id") + F.lit(1)).alias("n_bins"),
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
        .select(
            "shard",
            "n_bins",
            "n_docs",
            "total_tokens",
            F.round(
                F.col("total_tokens")
                / (F.col("n_bins") * F.lit(float(capacity))),
                6,
            ).alias("fill_ratio"),
        )
    )
