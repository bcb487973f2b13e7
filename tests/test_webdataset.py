"""WebDataset tar-shard sink/source: round-trip, determinism, empty
input, and NULL-binary handling."""

import json
import tarfile

import pytest
from pyspark.sql import functions as F


@pytest.fixture
def sample_df(spark):
    return spark.createDataFrame(
        [
            (0, "hello world", 3, bytearray(b"\x00\x01\x02")),
            (1, "second doc", 7, bytearray(b"\xff\xfe")),
            (2, "third", 1, None),  # NULL binary -> member absent
        ],
        "doc_id long, text string, n int, image binary",
    )


def test_webdataset_roundtrip(spark, sample_df, tmp_path):
    from tensorflow_recorder_spark.sinks.webdataset import (
        read_webdataset,
        webdataset_samples,
        write_webdataset,
    )

    out = str(tmp_path / "wds")
    manifest = write_webdataset(sample_df, out, "doc_id", num_shards=1)
    assert sum(manifest.values()) == 3
    [path] = manifest
    assert path.endswith("shard-00000-of-00001.tar")

    triples = read_webdataset(spark, out)
    rows = {(r["key"], r["member"]): bytes(r["payload"]) for r in triples.collect()}
    assert rows[("0", "image")] == b"\x00\x01\x02"
    meta = json.loads(rows[("1", "json")])
    assert meta == {"doc_id": 1, "n": 7, "text": "second doc"}
    # NULL binary: no image member for key 2, but json still present
    assert ("2", "image") not in rows and ("2", "json") in rows

    samples = webdataset_samples(triples).collect()
    by_key = {r["key"]: r for r in samples}
    assert by_key["0"]["binary_members"] == ["image"]
    assert by_key["2"]["binary_members"] == []
    assert json.loads(by_key["2"]["meta"])["text"] == "third"


def test_webdataset_deterministic_bytes(spark, sample_df, tmp_path):
    """Same input -> byte-identical shard (pinned tar metadata)."""
    from tensorflow_recorder_spark.sinks.webdataset import write_webdataset

    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    [pa] = write_webdataset(sample_df.orderBy("doc_id"), a, "doc_id", num_shards=1)
    [pb] = write_webdataset(sample_df.orderBy("doc_id"), b, "doc_id", num_shards=1)
    assert open(pa, "rb").read() == open(pb, "rb").read()
    # tar metadata is pinned
    with tarfile.open(pa) as tar:
        for info in tar:
            assert info.mtime == 0 and info.uid == 0 and info.mode == 0o644


def test_webdataset_empty_input_writes_valid_shard(spark, tmp_path):
    from tensorflow_recorder_spark.sinks.webdataset import (
        read_webdataset,
        write_webdataset,
    )

    empty = spark.createDataFrame([], "doc_id long, text string")
    out = str(tmp_path / "empty")
    manifest = write_webdataset(empty, out, "doc_id")
    assert list(manifest.values()) == [0]
    assert read_webdataset(spark, out).count() == 0


def test_webdataset_multi_shard_partitioning(spark, tmp_path):
    from tensorflow_recorder_spark.sinks.webdataset import (
        read_webdataset,
        write_webdataset,
    )

    df = spark.range(0, 100).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc "), F.col("id")).alias("text"),
    )
    out = str(tmp_path / "multi")
    manifest = write_webdataset(df, out, "doc_id", num_shards=4)
    assert len(manifest) == 4 and sum(manifest.values()) == 100
    back = read_webdataset(spark, out)
    assert back.where(F.col("member") == "json").count() == 100


def test_webdataset_rejects_missing_key(spark, sample_df, tmp_path):
    from tensorflow_recorder_spark.sinks.webdataset import write_webdataset

    with pytest.raises(ValueError, match="key column"):
        write_webdataset(sample_df, str(tmp_path / "x"), "nope")


def test_webdataset_split_layout(spark, tmp_path):
    """Per-split directories, unknown split dropped, empty split still
    produces one valid shard (same contract as the TFRecord sink)."""
    from tensorflow_recorder_spark.sinks.webdataset import (
        read_webdataset,
        write_webdataset_splits,
    )

    df = spark.createDataFrame(
        [
            (0, "TRAIN", "a"), (1, "TRAIN", "b"),
            (2, "VALIDATION", "c"), (3, "FOO", "dropped"),
        ],
        "doc_id long, split string, text string",
    )
    out = str(tmp_path / "wds")
    res = write_webdataset_splits(df, out, "doc_id")
    assert sum(res["TRAIN"].values()) == 2
    assert sum(res["VALIDATION"].values()) == 1
    assert sum(res["TEST"].values()) == 0  # empty-but-present
    assert all("/test/" in p for p in res["TEST"])
    train = read_webdataset(spark, f"{out}/train")
    keys = {r["key"] for r in train.collect()}
    assert keys == {"0", "1"}
    # the split column itself is not serialized; FOO row nowhere
    import json as _json

    metas = [
        _json.loads(bytes(r["payload"]))
        for r in train.where(F.col("member") == "json").collect()
    ]
    assert all("split" not in m for m in metas)
