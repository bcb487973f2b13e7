"""Format-fidelity gate: parse the REFERENCE's own golden TFRecords
(artifacts this engine did not write) with the pure-Python codec and the
Spark S5 scan.

Mirrors /root/reference/tfrecorder/dataset_loader_test.py:73-84 (3
splits load) and beam_image semantics (base64 altchars ``-_`` over raw
pixel bytes, so decoded length == width x height x channels).
"""

import base64
import os

import pytest
from pyspark.sql import types as T

from tensorflow_recorder_spark.functions.example_proto import decode_example
from tensorflow_recorder_spark.functions.tfrecord_io import (
    open_maybe_gzip,
    read_records,
)
from tensorflow_recorder_spark.sources.tfrecord import read_tfrecords

GOLDEN = "/root/reference/tfrecorder/test_data/sample_tfrecords"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(GOLDEN), reason="reference golden data not present"
)

SPLIT_FILES = {
    "TRAIN": "train-00000-of-00001.tfrecord.gz",
    "VALIDATION": "validation-00000-of-00001.tfrecord.gz",
    "TEST": "test-00000-of-00001.tfrecord.gz",
}


def _records(split):
    with open_maybe_gzip(os.path.join(GOLDEN, SPLIT_FILES[split])) as fh:
        # verify=True checks both masked CRC-32Cs per record
        return list(read_records(fh.read(), verify=True))


def test_golden_vocab_asset():
    path = os.path.join(
        GOLDEN, "transform_fn", "assets",
        "vocab_compute_and_apply_vocabulary_vocabulary",
    )
    assert open(path).read().splitlines() == ["goat", "cat"]


@pytest.mark.parametrize("split", sorted(SPLIT_FILES))
def test_golden_records_decode(split):
    recs = _records(split)
    assert len(recs) == 2  # one cat + one goat per split (data.csv)
    labels = set()
    for rec in recs:
        feats = decode_example(rec)
        assert set(feats) == {
            "image", "image_channels", "image_height", "image_name",
            "image_width", "label", "split",
        }
        assert feats["split"][1][0].decode() == split
        name = feats["image_name"][1][0].decode()
        width = feats["image_width"][1][0]
        height = feats["image_height"][1][0]
        channels = feats["image_channels"][1][0]
        assert name.endswith(".jpg") and channels == 3
        # image payload is base64 (altchars -_) of raw pixels
        pixels = base64.b64decode(feats["image"][1][0], altchars=b"-_")
        assert len(pixels) == width * height * channels
        label = feats["label"][1][0]
        labels.add((name.split("-")[0], label))
    # vocabulary order goat\ncat -> goat=0, cat=1
    assert labels == {("cat", 1), ("goat", 0)}


def test_golden_spark_scan(spark):
    struct = T.StructType([
        T.StructField("split", T.StringType()),
        T.StructField("image_name", T.StringType()),
        T.StructField("image", T.BinaryType()),
        T.StructField("image_width", T.LongType()),
        T.StructField("image_height", T.LongType()),
        T.StructField("image_channels", T.LongType()),
        T.StructField("label", T.LongType()),
    ])
    paths = [os.path.join(GOLDEN, f) for f in SPLIT_FILES.values()]
    df = read_tfrecords(spark, paths, struct)
    rows = df.collect()
    assert len(rows) == 6
    by_split = {}
    for r in rows:
        by_split.setdefault(r["split"], []).append(r)
    assert set(by_split) == set(SPLIT_FILES)
    for split_rows in by_split.values():
        assert sorted(r["label"] for r in split_rows) == [0, 1]
