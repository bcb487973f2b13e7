"""tensorflow_recorder_spark — a PySpark-native engine with the data-
processing capabilities of google/tensorflow-recorder (TFRecorder),
re-architected for Spark's execution model and extended with
large-scale training-data-pipeline operators (dedup, similarity search,
text analysis, event-time ops, multimodal columns).

Public surface mirrors the reference's __init__
(/root/reference/tfrecorder/__init__.py:19-23): convert, load, inspect,
convert_and_load, the schema/type system, and the pandas accessor.
"""

from . import accessor  # noqa: F401  (registers df.tensorflow)
from .api import convert, convert_and_load, inspect, load  # noqa: F401
from .schema import IMAGE_CSV_SCHEMA, Schema  # noqa: F401
from .session import get_spark  # noqa: F401
from .types import (  # noqa: F401
    FloatInput,
    ImageUri,
    IntegerInput,
    IntegerLabel,
    SplitKey,
    StringInput,
    StringLabel,
)

__version__ = "0.1.0"
