"""Pandas DataFrame accessor (C2, SURVEY.md §2.6).

Reference: /root/reference/tfrecorder/accessor.py:33-101 — registers a
``tensorflow`` namespace on pandas DataFrames so ``df.tensorflow.to_tfr(
output_dir, schema, ...)`` runs the convert pipeline. Same surface here,
backed by the Spark engine (the pandas frame ingests via Arrow, S1).
"""

from __future__ import annotations

import pandas as pd

from . import api
from .constants import AUTO_SHARDS
from .schema import IMAGE_CSV_SCHEMA, Schema


@pd.api.extensions.register_dataframe_accessor("tensorflow")
class TensorFlowAccessor:
    def __init__(self, pandas_obj: pd.DataFrame):
        self._df = pandas_obj

    def to_tfr(
        self,
        output_dir: str,
        schema: Schema = IMAGE_CSV_SCHEMA,
        compression: str | None = "gzip",
        num_shards: int = AUTO_SHARDS,
        **kwargs,
    ) -> dict:
        """Convert this pandas DataFrame to split TFRecords
        (accessor.py:43-101)."""
        return api.convert(
            self._df,
            output_dir=output_dir,
            schema=schema,
            compression=compression,
            num_shards=num_shards,
            **kwargs,
        )
