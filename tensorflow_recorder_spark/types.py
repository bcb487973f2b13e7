"""Column type system for the engine schema.

Spark-first re-expression of the reference's type registry
(/root/reference/tfrecorder/types.py:31-91): each supported type carries
its Spark physical type plus role flags (split key / image uri / label /
generated). There are no nested types in the reference model — every
feature is a scalar — but the engine itself runs on full Spark SQL types,
so extension operators (embeddings etc.) are not constrained by this
registry.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T

from .constants import SPLIT_VALUES


@dataclass(frozen=True)
class SupportedType:
    """Base supported type. Reference: types.py:31-35."""

    name: str = "supported_type"
    spark_type: T.DataType = field(default_factory=T.StringType)
    allowed_values: tuple = ()
    # role flags
    is_split: bool = False
    is_image_uri: bool = False
    is_label: bool = False
    # whether a fitted vocabulary integerizes this column (StringLabel)
    needs_vocabulary: bool = False
    # whether z-score scaling applies when enabled (IntegerInput/FloatInput)
    scalable: bool = False


class SplitKey(SupportedType):
    """Dataset-split routing column. Reference: types.py:45-49."""

    def __init__(self):
        super().__init__(
            name="split_key",
            spark_type=T.StringType(),
            allowed_values=SPLIT_VALUES,
            is_split=True,
        )


class ImageUri(SupportedType):
    """Path to an image file; triggers image ingestion. types.py:38-42."""

    def __init__(self):
        super().__init__(name="image_uri", spark_type=T.StringType(), is_image_uri=True)


class IntegerInput(SupportedType):
    """Numeric int feature. Reference: types.py:52-56."""

    def __init__(self):
        super().__init__(name="integer_input", spark_type=T.LongType(), scalable=True)


class FloatInput(SupportedType):
    """Numeric float feature. Reference: types.py:59-63."""

    def __init__(self):
        super().__init__(name="float_input", spark_type=T.DoubleType(), scalable=True)


class StringInput(SupportedType):
    """Free-string feature, pass-through. Reference: types.py:67-71."""

    def __init__(self):
        super().__init__(name="string_input", spark_type=T.StringType())


class IntegerLabel(SupportedType):
    """Integer target, pass-through. Reference: types.py:74-76."""

    def __init__(self):
        super().__init__(name="integer_label", spark_type=T.LongType(), is_label=True)


class StringLabel(SupportedType):
    """String target: vocabulary fitted on TRAIN, integerized everywhere,
    OOV -> -1. Reference: types.py:79-81 + beam_pipeline.py:120-127."""

    def __init__(self):
        super().__init__(
            name="string_label",
            spark_type=T.StringType(),
            is_label=True,
            needs_vocabulary=True,
        )


class ImageSupportString(SupportedType):
    """Generated image-support column (name / base64 bytes). types.py:84-86."""

    def __init__(self):
        super().__init__(name="image_support_string", spark_type=T.StringType())


class ImageDim(SupportedType):
    """Generated image dimension column. Reference: types.py:89-91."""

    def __init__(self):
        super().__init__(name="image_dim", spark_type=T.LongType())


_REGISTRY = {
    "split_key": SplitKey,
    "image_uri": ImageUri,
    "integer_input": IntegerInput,
    "float_input": FloatInput,
    "string_input": StringInput,
    "integer_label": IntegerLabel,
    "string_label": StringLabel,
    "image_support_string": ImageSupportString,
    "image_dim": ImageDim,
}


def type_from_name(name: str) -> SupportedType:
    """Instantiate a supported type by registry name (for schema JSON)."""
    try:
        return _REGISTRY[name]()
    except KeyError:
        raise ValueError(f"unknown supported type: {name!r}") from None
