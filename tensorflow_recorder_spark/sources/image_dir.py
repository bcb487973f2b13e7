"""Image-directory scan (S3, SURVEY.md §2.1).

Reference: /root/reference/tfrecorder/converter.py:92-135 — walk
``<dir>/<SPLIT>/<label>/<file>`` and emit (split, image_uri, label) rows,
warning on unknown split directories (converter.py:125-127).

Spark-first design: instead of a driver-side ``os.walk``, list files with
Spark's distributed ``binaryFile`` reader in path-only mode and derive
split/label from the path with ``regexp_extract`` — at 100 TB of images
the *listing* itself is big, and this keeps it parallel and JVM-side.
Rows under an unknown split directory are kept (they route to DISCARD at
partition time, matching the reference's warn-don't-drop behavior).
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..constants import SPLIT_VALUES

logger = logging.getLogger(__name__)


def read_image_directory(spark: SparkSession, image_dir: str) -> DataFrame:
    """Emit (split, image_uri, label) for every file two levels below
    ``image_dir``. The listing is a Spark file-source job (parallel,
    no file *contents* are read: ReadSchema prunes to path only)."""
    base = image_dir.rstrip("/")
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*")
        .load(f"{base}/*/*/*")
        .select(F.col("path"))
    )
    # path layout: .../<split>/<label>/<filename>
    df = files.select(
        F.regexp_extract("path", r"([^/]+)/[^/]+/[^/]+$", 1).alias("split"),
        F.regexp_replace("path", r"^file:", "").alias("image_uri"),
        F.regexp_extract("path", r"[^/]+/([^/]+)/[^/]+$", 1).alias("label"),
    )
    # Reference warns on unknown split dirs (converter.py:125-127) but still
    # emits the rows; they later route to DISCARD (P1).
    unknown = [
        r["split"]
        for r in df.select("split").distinct().collect()
        if r["split"] not in SPLIT_VALUES
    ]
    if unknown:
        logger.warning("unknown split directories (will route to DISCARD): %s", unknown)
    return df
