"""Input schema: an ordered {column -> SupportedType} map with role
detection, Spark StructType derivation, and the image-column rewrite.

Spark-first equivalent of /root/reference/tfrecorder/input_schema.py:30-102.
Instead of TFT DatasetMetadata, the derived artifacts are Spark
``StructType``s (pre-transform and post-image-extraction) plus a JSON
serialization persisted next to job outputs (replacing schema.pbtxt).
"""

from __future__ import annotations

import json
from collections import OrderedDict

from pyspark.sql import types as T

from . import types as ttypes
from .types import SupportedType, type_from_name

# Generated image columns replacing an ImageUri column.
# Reference: input_schema.py:51-58 (image_name, image, height/width/channels).
IMAGE_GENERATED_COLUMNS = OrderedDict(
    [
        ("image_name", ttypes.ImageSupportString),
        ("image", ttypes.ImageSupportString),
        ("image_height", ttypes.ImageDim),
        ("image_width", ttypes.ImageDim),
        ("image_channels", ttypes.ImageDim),
    ]
)


class Schema:
    """Ordered column->type schema with split/image/label role memoization.

    Reference: input_schema.py:30-63. Requires a split key (V4,
    input_schema.py:62-63).
    """

    def __init__(self, schema_map: dict[str, SupportedType | type]):
        self.input_schema_map: OrderedDict[str, SupportedType] = OrderedDict()
        self.split_key: str | None = None
        self.image_uri_key: str | None = None
        self.label_key: str | None = None

        for name, type_ in schema_map.items():
            inst = type_() if isinstance(type_, type) else type_
            if not isinstance(inst, SupportedType):
                raise ValueError(f"column {name!r}: not a SupportedType: {inst!r}")
            self.input_schema_map[name] = inst
            if inst.is_split:
                self.split_key = name
            if inst.is_image_uri:
                self.image_uri_key = name
            if inst.is_label:
                self.label_key = name

        if self.split_key is None:
            # Same failure mode as the reference (input_schema.py:62-63).
            raise AttributeError("Schema must contain a split key (SplitKey type)")

        # Pre-transform schema: the input schema with any ImageUri column
        # replaced by the generated image columns (input_schema.py:51-58).
        self.pre_transform_schema_map: OrderedDict[str, SupportedType] = OrderedDict()
        for name, inst in self.input_schema_map.items():
            if inst.is_image_uri:
                for gen_name, gen_type in IMAGE_GENERATED_COLUMNS.items():
                    self.pre_transform_schema_map[gen_name] = gen_type()
            else:
                self.pre_transform_schema_map[name] = inst

    # -- derived Spark schemas -------------------------------------------

    @staticmethod
    def _to_struct(schema_map: OrderedDict[str, SupportedType]) -> T.StructType:
        return T.StructType(
            [T.StructField(name, inst.spark_type, True) for name, inst in schema_map.items()]
        )

    def input_struct(self) -> T.StructType:
        """StructType of the raw input (feature-spec analog,
        input_schema.py:65-70)."""
        return self._to_struct(self.input_schema_map)

    def pre_transform_struct(self) -> T.StructType:
        """StructType after image extraction (get_pre_tft_metadata analog,
        input_schema.py:80-83)."""
        return self._to_struct(self.pre_transform_schema_map)

    def transformed_struct(self) -> T.StructType:
        """StructType after the fitted transform: vocabulary columns become
        LongType indices (schema.pbtxt int_domain analog)."""
        fields = []
        for name, inst in self.pre_transform_schema_map.items():
            typ = T.LongType() if inst.needs_vocabulary else inst.spark_type
            fields.append(T.StructField(name, typ, True))
        return T.StructType(fields)

    # -- role queries -----------------------------------------------------

    def vocabulary_columns(self) -> list[str]:
        """Columns whose values are integerized via a TRAIN-fitted
        vocabulary (StringLabel). Reference: beam_pipeline.py:120-127."""
        return [n for n, t in self.pre_transform_schema_map.items() if t.needs_vocabulary]

    def scalable_columns(self) -> list[str]:
        """Numeric columns eligible for z-score scaling (A4 — documented in
        the reference README.md:304-312 but unimplemented there; we gate it
        behind an option)."""
        return [n for n, t in self.pre_transform_schema_map.items() if t.scalable]

    # -- validation (V1) ---------------------------------------------------

    def validate_columns(self, df_columns: list[str]) -> None:
        """Every schema column must exist in the DataFrame.
        Reference: converter.py:40-49."""
        missing = [c for c in self.input_schema_map if c not in df_columns]
        if missing:
            raise AttributeError(
                f"schema columns missing from input data: {missing}; "
                f"data has {list(df_columns)}"
            )

    # -- persistence (replaces schema.pbtxt / TFTransformOutput) -----------

    def to_json(self) -> str:
        return json.dumps(
            {name: inst.name for name, inst in self.input_schema_map.items()}, indent=2
        )

    @classmethod
    def from_json(cls, payload: str) -> "Schema":
        raw = json.loads(payload)
        return cls(OrderedDict((k, type_from_name(v)) for k, v in raw.items()))

    def __repr__(self) -> str:  # pragma: no cover
        cols = ", ".join(f"{n}:{t.name}" for n, t in self.input_schema_map.items())
        return f"Schema({cols})"


# Default schema: AutoML-Vision style "image CSV".
# Reference: input_schema.py:96-102.
IMAGE_CSV_SCHEMA = Schema(
    OrderedDict(
        [
            ("split", ttypes.SplitKey),
            ("image_uri", ttypes.ImageUri),
            ("label", ttypes.StringLabel),
        ]
    )
)
