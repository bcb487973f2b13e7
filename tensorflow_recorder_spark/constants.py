"""Engine-wide constants.

Parity notes cite the reference implementation at /root/reference
(google/tensorflow-recorder); see SURVEY.md for the full mapping.
"""

# Split routing values, in partition order. Unknown values route to the
# last slot (DISCARD). Reference: tfrecorder/types.py:49 and
# tfrecorder/beam_pipeline.py:73-88.
SPLIT_VALUES = ("TRAIN", "VALIDATION", "TEST", "DISCARD")
DISCARD = "DISCARD"
TRAIN = "TRAIN"

# Non-discard splits, i.e. the splits that produce TFRecord outputs.
# Reference: tfrecorder/dataset_loader.py:60 (allowed_values[:-1]).
OUTPUT_SPLITS = SPLIT_VALUES[:-1]

# Out-of-vocabulary index used when applying a fitted vocabulary.
# Reference: transformed_metadata/schema.pbtxt int_domain {min: -1}.
OOV_INDEX = -1

# Job naming. Reference: tfrecorder/converter.py:146-162.
JOB_NAME_PREFIX = "tfrecorder"

# Default output sharding: 0 = let the engine decide (AQE / current
# partitioning). Reference: tfrecorder/converter.py:290-291.
AUTO_SHARDS = 0

# TFRecord file suffixes. Reference: tfrecorder/beam_pipeline.py:105-110.
TFRECORD_SUFFIX = ".tfrecord"
GZIP_SUFFIX = ".tfrecord.gz"
# TF ZLIB option; reference infers it from the extension
# (dataset_loader.py:32-35).
ZLIB_SUFFIX = ".tfrecord.zlib"

# Job log file (K6 parity; reference constants.py:21 logs to
# /tmp/tfrecorder-beam.log and copies it next to the output).
LOG_FILE = "/tmp/tfrecorder-spark.log"
