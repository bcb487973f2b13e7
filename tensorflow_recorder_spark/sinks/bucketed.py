"""Bucketed table layout (K-extension): hash-bucketed, optionally
sorted parquet tables registered in the session catalog — Spark's
storage-level co-location primitive. Writing both sides of a hot join
bucketed by the join key (same bucket count) lets every later join or
aggregation on that key run WITHOUT a shuffle: the exchange happens
once at write time instead of once per query.

This is the 100 TB answer to repeated fact-fact joins (events x users,
corpus x dedup-ids): at that scale one avoided shuffle per query
dominates everything else an operator does. The reference has no
storage layout story (it writes flat TFRecord shards —
/root/reference/tfrecorder/beam_pipeline.py:187-192); this module is
deliberately Spark-first, pairing with `write_ivf_index`'s
partitionBy(centroid) layout (operators/similarity.py) which solves
the same problem for ANN reads via partition pruning.

Scale notes: bucket count is fixed at write time — size it to
data / target-file-size (128-256 MB); both join sides must use the
SAME count (or a divisor, with ``spark.sql.bucketing.coalesceBucketsInJoin``)
for the shuffle to be elided. ``sortBy`` additionally pre-sorts bucket
files so SortMergeJoin skips its sort. Bucket pruning applies equality
filters on the bucket column to skip whole files.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int,
    sort_cols: Sequence[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (and optionally per-bucket sorted)
    parquet table named ``table`` in the session catalog.

    ``path`` makes it an external table at that location (tests /
    pipelines that own their directories); otherwise it is a managed
    table under the warehouse dir. Joins and aggregations keyed on
    ``bucket_cols`` between tables written with the same
    ``num_buckets`` elide their Exchange (pinned by plan test).
    """
    if num_buckets < 1:
        raise ValueError(f"num_buckets must be >= 1, got {num_buckets}")
    if not bucket_cols:
        raise ValueError("bucket_cols must be non-empty")
    w = (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(num_buckets, bucket_cols[0], *bucket_cols[1:])
    )
    if sort_cols:
        w = w.sortBy(sort_cols[0], *sort_cols[1:])
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_table(spark, table: str) -> DataFrame:
    """Catalog read of a bucketed table — the bucket spec rides along in
    the catalog entry, which is what lets the planner elide exchanges
    (a plain ``spark.read.parquet(path)`` of the same files would NOT
    know the layout)."""
    return spark.table(table)
