"""Parallelism spreading decided from scan METADATA only.

Per-row Python stages (mapInPandas codecs, shingle hashing, Example
encoding) inherit the input's partition count, so a small/single-file
scan would serialize the whole stage through one worker. The r3/r4
probe asked the plan's RDD for its exact partition count — exact, but
converting the DataFrame to an RDD forces a second plan evaluation at
every hot entry point (r4 verdict item 2). This helper decides from
``df.inputFiles()`` alone:

- scan already has >= parallelism files → unchanged. At 100 TB the scan
  has thousands of files, so no corpus-wide shuffle is ever added;
- fewer files (including in-memory frames, where ``inputFiles()`` is
  empty) → one unconditional bounded ``repartition``. The shuffled
  volume is bounded by what fits in fewer-than-#cores files — trivial
  next to the per-row Python stage it feeds;
- frames with no file lineage that also cannot answer ``inputFiles()``
  (streaming sources) → unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_to_parallelism(
    df: DataFrame, parallelism: int | None = None
) -> DataFrame:
    par = parallelism or df.sparkSession.sparkContext.defaultParallelism
    try:
        if len(df.inputFiles()) >= par:
            return df
    except Exception:
        return df
    return df.repartition(par)
