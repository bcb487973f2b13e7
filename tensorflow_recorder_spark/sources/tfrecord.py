"""TFRecord scan (S5, SURVEY.md §2.1): TFRecord files -> Spark DataFrames
per split.

Reference: /root/reference/tfrecorder/dataset_loader.py:82-129 —
``load()`` validates the job dir, globs ``train*/validation*/test*``
per split (DISCARD excluded), infers compression from the extension, and
parses records with the persisted feature spec.

Spark-first design: files are scanned with the distributed ``binaryFile``
source (one task per file; TFRecord files are the write-side shards, so
file-level parallelism equals write-side shard parallelism) and parsed in
``mapInPandas`` with the pure-Python Example decoder. Schema comes from
the persisted transformed StructType (replacing TFTransformOutput).
"""

from __future__ import annotations

import glob as globlib
import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, types as T

from ..constants import OUTPUT_SPLITS
from ..functions import fs
from ..functions.example_proto import decode_example
from ..functions.tfrecord_io import read_file_records
from ..sinks.artifacts import read_schema_metadata, validate_job_dir


def _scalar(kind_values, target: T.DataType):
    kind, values = kind_values
    if not values:
        return None
    v = values[0]
    if isinstance(target, T.StringType):
        return v.decode("utf-8") if isinstance(v, (bytes, bytearray)) else str(v)
    if isinstance(target, T.BinaryType):
        return bytes(v)
    if isinstance(target, (T.LongType, T.IntegerType)):
        return int(v)
    if isinstance(target, (T.DoubleType, T.FloatType)):
        return float(v)
    if isinstance(target, T.ArrayType):
        elem = target.elementType
        return [_scalar((kind, [x]), elem) for x in values]
    return v


def read_tfrecords(
    spark: SparkSession, paths: list[str], struct: T.StructType
) -> DataFrame:
    """Parse TFRecord files into rows of ``struct``."""
    fields = [(f.name, f.dataType) for f in struct.fields]

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {name: [] for name, _ in fields}
            for blob in pdf["content"]:
                for record in read_file_records(bytes(blob)):
                    feats = decode_example(record)
                    for name, dtype in fields:
                        value = _scalar(feats[name], dtype) if name in feats else None
                        rows[name].append(value)
            yield pd.DataFrame(rows)

    files = spark.read.format("binaryFile").load(paths).select("content")
    return files.mapInPandas(parse, schema=struct)


def split_files(job_dir: str, split: str) -> list[str]:
    """Glob one split's shard files (reference dataset_loader.py:52-69).

    ``file:``/``file://`` URIs are globbed on their local form — glob on
    the raw URI string would silently match nothing."""
    if fs.is_local(job_dir):
        job_dir = fs.to_local(job_dir)
    return sorted(globlib.glob(os.path.join(job_dir, f"{split.lower()}-*")))


def load(spark: SparkSession, tfrecord_dir: str) -> dict[str, DataFrame]:
    """TFRecords -> {split: DataFrame} (C5/S5).

    Mirrors ``tfrecorder.load``: validates layout, excludes DISCARD,
    returns only splits that have files."""
    validate_job_dir(tfrecord_dir)
    _, struct = read_schema_metadata(tfrecord_dir)
    out: dict[str, DataFrame] = {}
    for split in OUTPUT_SPLITS:
        files = split_files(tfrecord_dir, split)
        if files:
            out[split] = read_tfrecords(spark, files, struct)
    return out
