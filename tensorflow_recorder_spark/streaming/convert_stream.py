"""The convert pipeline as a streaming sink (E4 extension; SURVEY.md
§2.8).

Fit-on-train / apply-to-all becomes fit-offline / apply-online: the
vocabulary (and scale stats) are fitted ONCE from a bounded TRAIN
DataFrame, then every micro-batch is transformed with the broadcast
fitted state and appended as TFRecord shards via ``foreachBatch``.
Never re-fit inside the stream — that would make output semantics
depend on micro-batch boundaries.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming import StreamingQuery

from ..constants import DISCARD, TRAIN
from ..functions import fs
from ..operators.split import normalize_split
from ..operators.vocabulary import apply_vocabulary, fit_vocabulary
from ..schema import Schema
from ..sinks.artifacts import write_schema_metadata, write_vocabulary_assets
from ..sinks.tfrecord import encode_examples, write_split_tfrecords


def convert_stream(
    stream: DataFrame,
    train_df: DataFrame,
    schema: Schema,
    job_dir: str,
    compression: str | None = "gzip",
    checkpoint_dir: str | None = None,
    trigger: dict[str, Any] | None = None,
) -> StreamingQuery:
    """Incrementally convert ``stream`` to TFRecords under ``job_dir``.

    ``train_df`` (bounded) supplies the fitted vocabulary state up
    front; each micro-batch is split-routed, transformed, and written as
    one shard per split per batch (shard name carries the batch id so
    appends never collide; exactly-once comes from foreachBatch +
    idempotent same-name writes).
    """
    split_key = schema.split_key
    vocab_cols = schema.vocabulary_columns()
    vocabs = {c: fit_vocabulary(train_df, c) for c in vocab_cols}

    fs.makedirs(job_dir)
    write_vocabulary_assets(job_dir, vocabs)
    write_schema_metadata(job_dir, schema, schema.transformed_struct())
    # Materialize fitted state once; micro-batches join against these
    # small cached frames (broadcast on apply).
    cached_vocabs = {c: v.cache() for c, v in vocabs.items()}

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        work = normalize_split(batch_df, split_key)
        for c, vocab in cached_vocabs.items():
            work = apply_vocabulary(work, c, vocab)
        encoded = encode_examples(work, split_key)
        for split in (TRAIN, "VALIDATION", "TEST"):
            write_split_tfrecords(
                encoded,
                job_dir,
                f"{split.lower()}-batch{batch_id:06d}",
                split,
                compression=compression,
                num_shards=1,
                skip_empty=True,
            )

    writer = stream.writeStream.foreachBatch(process_batch).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()
