"""Streaming twin (s20) of the deletion blast radius
(`plans/deletion.py`): tombstone ids ARRIVE as a stream and the
affected-bin counters update live — the view an erasure-SLA scheduler
watches to batch re-pack jobs instead of re-running the batch audit
per request.

Plan shape: the packed-sequence map is the STATIC side of a
stream-static equi-join (pinned once by the caller — bucketed parquet
in production, an eager localCheckpoint in tests, the same note as
``streaming/contamination.py``); each micro-batch of tombstones probes
it narrowly. State = one counter per AFFECTED bin plus the tombstone
dedup set. The dedup keeps a row per distinct tombstone id — bounded
by the erasure-request volume, which is tiny next to the corpus; a
production deployment with unbounded request streams adds
``withWatermark`` + ``dropDuplicatesWithinWatermark`` at the cost of
exactly-once only within the watermark horizon.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def streaming_deletion_impact(
    tombstones: DataFrame,
    packed: DataFrame,
    id_col: str = "doc_id",
    seq_cols: tuple[str, str] = ("shard", "bin_id"),
) -> DataFrame:
    """Per-bin deleted-doc counters over a tombstone stream.

    ``tombstones`` is a streaming frame of ids; ``packed`` the static
    doc -> (shard, bin) map. Duplicate requests for the same id are
    deduplicated statefully so a retried erasure request never double
    counts. Output: (*seq_cols, n_docs_deleted) — the final rows after
    an availableNow drain equal the batch audit's per-bin counts.
    """
    distinct = tombstones.select(F.col(id_col)).dropDuplicates([id_col])
    hits = distinct.join(packed.select(id_col, *seq_cols), id_col)
    return hits.groupBy(*seq_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs_deleted")
    )
