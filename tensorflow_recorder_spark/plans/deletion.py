"""Right-to-be-forgotten deletion propagation (E6 privacy lifecycle).

A deletion request (a tombstone id set) must reach every derived
asset, not just the corpus: any packed training sequence containing a
deleted document must be rebuilt (its neighbors share a context
window with the deleted text), and every ANN index cell holding a
deleted vector needs a partition rewrite. This plan computes that
blast radius in one narrow pass per asset and returns a single audit
row — the number an erasure-SLA review reads before scheduling the
re-pack / cell-rewrite jobs.

Scale shape: the tombstone set is the SMALL side everywhere. It
broadcasts into left-semi / left-anti probes against each asset, so
no asset ever shuffles; the affected-bin list is bounded by
|tombstones| and broadcasts back for the re-pack token sum. At 100 TB
the whole audit is three narrow scans plus constant-size aggregates.

The reference engine has no deletion story (TFRecord shards are
immutable artifacts); this is an extension the 100 TB curation
lifecycle needs (GDPR/CCPA erasure).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def deletion_impact(
    corpus: DataFrame,
    packed: DataFrame,
    assign: DataFrame,
    tombstones: DataFrame,
    id_col: str = "doc_id",
    assign_id_col: str = "vec_id",
    seq_cols: tuple[str, str] = ("shard", "bin_id"),
    token_col: str = "n_tokens",
    cell_col: str = "centroid_id",
) -> DataFrame:
    """One-row deletion blast-radius audit.

    ``corpus`` is the document table, ``packed`` a
    :func:`~..operators.packing.pack_sequences` result (doc -> bin
    membership + token counts), ``assign`` an
    :func:`~..operators.similarity.ivf_assign` result (vector -> index
    cell), ``tombstones`` the ids to erase (matched on ``id_col``;
    vectors match on ``assign_id_col``).

    Output columns (all BIGINT):
    ``n_tombstones`` distinct requested ids; ``n_docs_removed`` /
    ``n_docs_surviving`` corpus split; ``n_seqs_affected`` packed bins
    that must rebuild; ``n_tokens_to_repack`` total tokens in those
    bins (the re-pack work, NOT just the deleted tokens);
    ``n_cells_affected`` index cells needing a rewrite;
    ``n_vecs_removed`` vectors leaving the index.
    """
    tomb = (
        tombstones.select(F.col(id_col)).distinct().localCheckpoint(eager=True)
    )
    n_tomb = tomb.agg(
        F.count(F.lit(1)).cast("long").alias("n_tombstones")
    )
    removed = corpus.join(F.broadcast(tomb), id_col, "left_semi").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs_removed")
    )
    surviving = corpus.join(F.broadcast(tomb), id_col, "left_anti").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs_surviving")
    )
    # bins touching a tombstone: bounded by |tombstones|, reused by the
    # count and the re-pack cost probe — cut once.
    affected = (
        packed.join(F.broadcast(tomb), id_col, "left_semi")
        .select(*seq_cols)
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_seqs = affected.agg(
        F.count(F.lit(1)).cast("long").alias("n_seqs_affected")
    )
    repack = packed.join(
        F.broadcast(affected), list(seq_cols), "left_semi"
    ).agg(
        F.coalesce(F.sum(token_col), F.lit(0))
        .cast("long")
        .alias("n_tokens_to_repack")
    )
    vec_hits = assign.join(
        F.broadcast(tomb.select(F.col(id_col).alias(assign_id_col))),
        assign_id_col,
        "left_semi",
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs_removed"),
        F.countDistinct(cell_col).cast("long").alias("n_cells_affected"),
    )
    return (
        n_tomb.crossJoin(removed)
        .crossJoin(surviving)
        .crossJoin(n_seqs)
        .crossJoin(repack)
        .crossJoin(vec_hits)
        .select(
            "n_tombstones",
            "n_docs_removed",
            "n_docs_surviving",
            "n_seqs_affected",
            "n_tokens_to_repack",
            "n_cells_affected",
            "n_vecs_removed",
        )
    )


def apply_deletions(
    corpus: DataFrame, tombstones: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """The corpus after erasure — one broadcast anti-join, the narrow
    half of the propagation (derived assets rebuild from this)."""
    tomb = tombstones.select(F.col(id_col)).distinct()
    return corpus.join(F.broadcast(tomb), id_col, "left_anti")
