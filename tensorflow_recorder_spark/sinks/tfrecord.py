"""TFRecord sink (K1/K2, SURVEY.md §2.5).

Reference behavior (/root/reference/tfrecorder/beam_pipeline.py:90-117,
187-192): per split, encode each row dict as a ``tf.train.Example`` and
write sharded, optionally gzip-compressed files named
``<split>-SSSSS-of-NNNNN.tfrecord[.gz]``; ``num_shards=0`` lets the
runner pick sharding (converter.py:290-291).

Spark-first design:
  * Row -> Example encoding happens in ``mapInPandas`` (Arrow-batched;
    the per-row proto build is unavoidable — it IS the output format —
    but framing/IO are amortized per partition, not per row).
  * One encode pass is shared by all splits (the encoded frame is cached
    by the caller); each split's write is a partition-parallel job with
    zero driver materialization.
  * ``num_shards=0`` keeps the encode partitioning (AQE-coalesced), so
    shard count tracks data size; an explicit ``num_shards`` becomes a
    ``repartition`` (round-robin) before the write.
  * Executors write files directly (shared filesystem). A task retry can
    leave a partial file that the retry overwrites — same-name
    idempotent writes, acceptable for a direct local/DFS sink; a
    cluster deployment would route this through a commit protocol
    (note: this is the one place local-mode and cluster semantics
    differ).
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from ..constants import GZIP_SUFFIX, TFRECORD_SUFFIX
from ..functions.example_proto import encode_example
from ..functions.tfrecord_io import open_maybe_gzip, write_record

# Spark simpleString -> Example feature kind
_KIND_BY_TYPE = {
    "string": "bytes",
    "binary": "bytes",
    "tinyint": "int64",
    "smallint": "int64",
    "int": "int64",
    "bigint": "int64",
    "boolean": "int64",
    "float": "float",
    "double": "float",
    "array<float>": "float",
    "array<double>": "float",
    "array<int>": "int64",
    "array<bigint>": "int64",
    "array<string>": "bytes",
    "array<binary>": "bytes",
}


def feature_kinds(df: DataFrame, exclude: tuple[str, ...] = ()) -> dict[str, str]:
    """Derive the Example feature kind for every column from the Spark
    schema (scalars and flat arrays; the reference model is all-scalar)."""
    kinds: dict[str, str] = {}
    for field in df.schema.fields:
        if field.name in exclude:
            continue
        simple = field.dataType.simpleString()
        kind = _KIND_BY_TYPE.get(simple)
        if kind is None:
            raise ValueError(
                f"column {field.name!r}: no Example mapping for type {simple}"
            )
        kinds[field.name] = kind
    return kinds


def _to_values(kind: str, value) -> list:
    # pd.NA / NaN / None all mean "missing" -> empty feature (the proto
    # has no null; an absent/empty list is the conventional encoding).
    if value is None or (isinstance(value, float) and value != value) or value is pd.NA:
        return []
    if isinstance(value, (list, tuple)) or type(value).__name__ == "ndarray":
        vals = [v for v in value if v is not None]
    else:
        vals = [value]
    if kind == "bytes":
        return [v.encode("utf-8") if isinstance(v, str) else bytes(v) for v in vals]
    if kind == "int64":
        return [int(v) for v in vals]
    return [float(v) for v in vals]


def encode_examples(
    df: DataFrame, split_key: str = "split", keep_split: bool = True
) -> DataFrame:
    """Encode every row into a serialized Example (K1).

    Output schema: (split string, example binary). The split column rides
    along for write routing but — matching the reference, whose Examples
    include the split feature (it is part of the schema) — it is also
    encoded into the proto.
    """
    kinds = feature_kinds(df)
    columns = list(kinds)
    if not keep_split:
        kinds = {k: v for k, v in kinds.items() if k != split_key}

    def encode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            examples = []
            rows = (pdf[c] for c in columns)
            for tup in zip(*rows):
                features = {
                    c: (kinds[c], _to_values(kinds[c], v))
                    for c, v in zip(columns, tup)
                    if c in kinds
                }
                examples.append(encode_example(features))
            yield pd.DataFrame({"split": pdf[split_key], "example": examples})

    out_schema = T.StructType(
        [
            T.StructField("split", T.StringType()),
            T.StructField("example", T.BinaryType()),
        ]
    )
    return df.mapInPandas(encode_batches, schema=out_schema)


def _write_partition_factory(job_dir: str, prefix: str, num_shards: int, suffix: str):
    def write_partition(index: int, rows) -> Iterator[tuple[str, int]]:
        path = os.path.join(
            job_dir, f"{prefix}-{index:05d}-of-{num_shards:05d}{suffix}"
        )
        count = 0
        tmp = path + ".inprogress"
        with open_maybe_gzip(tmp, "wb") as fh:
            for row in rows:
                write_record(fh, bytes(row["example"]))
                count += 1
        os.replace(tmp, path)  # atomic publish per shard
        yield path, count

    return write_partition


def write_split_tfrecords(
    encoded: DataFrame,
    job_dir: str,
    prefix: str,
    split_value: str,
    compression: str | None = "gzip",
    num_shards: int = 0,
    skip_empty: bool = False,
) -> dict[str, int]:
    """Write one split's Examples as sharded TFRecord files (K2).

    Returns {file_path: record_count}. Empty splits produce one empty
    shard file — the reference's empty-but-present output parity (V8,
    beam_pipeline.py:269-273) — unless ``skip_empty`` (streaming
    appends, where per-batch empty shards would accumulate).
    """
    suffix = GZIP_SUFFIX if compression == "gzip" else TFRECORD_SUFFIX
    split_df = encoded.where(F.col("split") == split_value).select("example")
    if num_shards > 0:
        split_df = split_df.repartition(num_shards)
    rdd = split_df.rdd
    n = max(rdd.getNumPartitions(), 1)
    os.makedirs(job_dir, exist_ok=True)
    results = rdd.mapPartitionsWithIndex(
        _write_partition_factory(job_dir, prefix, n, suffix)
    ).collect()
    if skip_empty and results and all(count == 0 for _, count in results):
        for path, _ in results:
            os.remove(path)
        return {}
    if not results:  # zero partitions: still touch one empty shard (V8)
        if skip_empty:
            return {}
        path = os.path.join(job_dir, f"{prefix}-00000-of-00001{suffix}")
        with open_maybe_gzip(path, "wb"):
            pass
        results = [(path, 0)]
    return dict(results)
