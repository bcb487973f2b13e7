"""Schema/type-system tests (reference input_schema_test.py analog)."""

from collections import OrderedDict

import pytest
from pyspark.sql import types as T

from tensorflow_recorder_spark import types as tt
from tensorflow_recorder_spark.schema import IMAGE_CSV_SCHEMA, Schema


def structured_schema() -> Schema:
    return Schema(
        OrderedDict(
            [
                ("split", tt.SplitKey),
                ("x", tt.FloatInput),
                ("y", tt.IntegerInput),
                ("name", tt.StringInput),
                ("category", tt.StringLabel),
                ("label", tt.IntegerLabel),
            ]
        )
    )


def test_role_detection():
    s = IMAGE_CSV_SCHEMA
    assert s.split_key == "split"
    assert s.image_uri_key == "image_uri"
    assert s.label_key == "label"


def test_missing_split_key_raises():
    # Reference: input_schema.py:62-63 (AttributeError).
    with pytest.raises(AttributeError):
        Schema({"label": tt.StringLabel()})


def test_image_rewrite_generates_five_columns():
    pre = list(IMAGE_CSV_SCHEMA.pre_transform_schema_map)
    assert pre == [
        "split",
        "image_name",
        "image",
        "image_height",
        "image_width",
        "image_channels",
        "label",
    ]


def test_struct_types():
    s = structured_schema()
    st = s.input_struct()
    assert st["x"].dataType == T.DoubleType()
    assert st["y"].dataType == T.LongType()
    # vocabulary column becomes long after transform
    assert s.transformed_struct()["category"].dataType == T.LongType()
    assert s.vocabulary_columns() == ["category"]
    assert s.scalable_columns() == ["x", "y"]


def test_validate_columns():
    s = structured_schema()
    s.validate_columns(["split", "x", "y", "name", "category", "label", "extra"])
    with pytest.raises(AttributeError):
        s.validate_columns(["split", "x"])


def test_json_roundtrip():
    s = structured_schema()
    s2 = Schema.from_json(s.to_json())
    assert list(s2.input_schema_map) == list(s.input_schema_map)
    assert s2.split_key == "split"
    assert s2.vocabulary_columns() == ["category"]
