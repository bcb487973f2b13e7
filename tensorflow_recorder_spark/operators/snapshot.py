"""Dataset snapshot diff (E6 curation/versioning support).

Training-data pipelines are incremental: each refresh produces a new
snapshot of the corpus, and the pipeline needs to know exactly what
changed — which documents were added, which disappeared, which were
edited — both for incremental recompute (only re-embed / re-dedup the
changed slice) and for dataset lineage auditing. The reference
(TFRecorder) converts one frame at a time and has no versioning story;
this is the standard lakehouse "table diff" expressed Spark-first.

Scale shape: one full-outer equi-join on the snapshot key — both sides
hash-partition on the same key, so this is a single co-partitioned
shuffle each; the change classification is a row-local expression on
the joined row (fingerprint compare), fully codegen'd. Fingerprints are
md5 over a canonical '|'-joined rendering of the compared columns, so
"changed" detection never re-shuffles wide text columns anywhere — the
join carries two 32-byte hashes, not the payloads, when
``project_fingerprint_only=True`` styling is applied by the caller
(select id + fingerprint before calling).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F


def fingerprint_rows(
    df: DataFrame, id_col: str, compare_cols: Sequence[str]
) -> DataFrame:
    """Project each row to (id, __fp): md5 over the canonical rendering
    of ``compare_cols`` (NULL -> literal 'NULL', '|' separator). This is
    the narrow projection snapshot_diff joins on — at 100 TB the diff
    join moves 40 bytes/row instead of the document payload."""
    canon = F.concat_ws(
        "|", *[F.coalesce(F.col(c).cast("string"), F.lit("NULL")) for c in compare_cols]
    )
    return df.select(F.col(id_col), F.md5(canon).alias("__fp"))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str,
    compare_cols: Sequence[str],
) -> DataFrame:
    """Classify every key across two snapshots as ``added`` (only in
    new), ``removed`` (only in old), or ``changed`` (in both, but the
    fingerprint over ``compare_cols`` differs). Unchanged rows are NOT
    emitted — at scale the diff output is proportional to the churn,
    not the corpus.

    Output: (<id_col>, change string), one row per non-identical key.
    """
    if not compare_cols:
        raise ValueError("compare_cols must be non-empty")
    o = fingerprint_rows(old, id_col, compare_cols).withColumnRenamed("__fp", "__fp_old")
    n = fingerprint_rows(new, id_col, compare_cols).withColumnRenamed("__fp", "__fp_new")
    joined = o.join(n, id_col, "full_outer")
    change = (
        F.when(F.col("__fp_old").isNull(), F.lit("added"))
        .when(F.col("__fp_new").isNull(), F.lit("removed"))
        .when(F.col("__fp_old") != F.col("__fp_new"), F.lit("changed"))
    )
    return (
        joined.withColumn("change", change)
        .where(F.col("change").isNotNull())
        .select(id_col, "change")
    )
