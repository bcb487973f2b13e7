"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` is the smoke check; ``queries()`` /``oracle_sql()``
are the DuckDB-checked operator surface (SURVEY.md §2). Implementation
lives in ``tensorflow_recorder_spark.queries``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the convert-pipeline
    transform (P1 split routing + A2/A3 fit-on-TRAIN vocabulary applied
    to all splits) over the documents table."""
    from tensorflow_recorder_spark.operators.split import normalize_split
    from tensorflow_recorder_spark.operators.vocabulary import (
        apply_vocabulary,
        fit_vocabulary,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    split = (
        "CASE WHEN doc_id % 10 < 7 THEN 'TRAIN' "
        "WHEN doc_id % 10 < 9 THEN 'VALIDATION' ELSE 'TEST' END"
    )
    df = normalize_split(docs.withColumn("split", F.expr(split)))
    vocab = fit_vocabulary(df.where(F.col("split") == "TRAIN"), "lang")
    out = apply_vocabulary(df.withColumnRenamed("lang", "lang_idx"), "lang_idx", vocab)
    return out.select("doc_id", "split", F.col("lang_idx").cast("long").alias("lang_idx"), "source", "n_chars")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from tensorflow_recorder_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from tensorflow_recorder_spark.queries import ORACLES

    return dict(ORACLES)
