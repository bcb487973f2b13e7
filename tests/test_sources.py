"""Source tests (reference converter_test.py CSV/dispatch/image-dir
coverage)."""

import os

import pandas as pd
import pytest

from tensorflow_recorder_spark.sources.dispatch import read_csv, to_dataframe
from tensorflow_recorder_spark.sources.image_dir import read_image_directory


@pytest.fixture()
def csv_file(tmp_path):
    p = tmp_path / "data.csv"
    p.write_text("split,image_uri,label\nTRAIN,/a.png,cat\nTEST,/b.png,goat\n")
    return str(p)


def test_read_csv_header_infer(spark, csv_file):
    df = read_csv(spark, csv_file)
    assert df.columns == ["split", "image_uri", "label"]
    assert df.count() == 2


def test_read_csv_names_override(spark, csv_file):
    df = read_csv(spark, csv_file, names=["s", "u", "l"])
    assert df.columns == ["s", "u", "l"]


def test_read_csv_headerless_autonames(spark, tmp_path):
    p = tmp_path / "raw.csv"
    p.write_text("TRAIN,/a.png,cat\n")
    df = read_csv(spark, str(p), header=None)
    assert df.columns == ["c0", "c1", "c2"]


def test_read_csv_names_length_mismatch(spark, csv_file):
    with pytest.raises(ValueError):
        read_csv(spark, csv_file, names=["only", "two"])


def test_to_dataframe_dispatch(spark, csv_file):
    # pandas -> spark
    pdf = pd.DataFrame({"split": ["TRAIN"], "x": [1]})
    assert to_dataframe(spark, pdf).count() == 1
    # spark passthrough with projection
    sdf = to_dataframe(spark, pdf)
    assert to_dataframe(spark, sdf, names=["split"]).columns == ["split"]
    # csv path
    assert to_dataframe(spark, csv_file).count() == 2
    # unsupported
    with pytest.raises(ValueError):
        to_dataframe(spark, 42)


def test_image_directory_scan(spark, tmp_path):
    # Reference converter_test.py:219-258 directory walk round-trip.
    for split, label, name in [
        ("TRAIN", "cat", "a.png"),
        ("TRAIN", "goat", "b.png"),
        ("TEST", "cat", "c.png"),
        ("FOO", "cat", "d.png"),  # unknown split dir: kept, warns
    ]:
        d = tmp_path / split / label
        d.mkdir(parents=True, exist_ok=True)
        (d / name).write_bytes(b"fake")
    df = read_image_directory(spark, str(tmp_path))
    rows = {(r["split"], r["label"], os.path.basename(r["image_uri"])) for r in df.collect()}
    assert rows == {
        ("TRAIN", "cat", "a.png"),
        ("TRAIN", "goat", "b.png"),
        ("TEST", "cat", "c.png"),
        ("FOO", "cat", "d.png"),
    }


def test_to_dataframe_jsonl(spark, tmp_path):
    from tensorflow_recorder_spark.sources.dispatch import to_dataframe

    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"split": "TRAIN", "label": "cat", "x": 1}\n'
        '{"split": "TEST", "label": "goat", "x": 2}\n'
    )
    df = to_dataframe(spark, str(p))
    assert set(df.columns) == {"split", "label", "x"}
    assert df.count() == 2
    # names projects/reorders
    df2 = to_dataframe(spark, str(p), names=["label", "split"])
    assert df2.columns == ["label", "split"]


def test_to_dataframe_parquet(spark, tmp_path):
    from tensorflow_recorder_spark.sources.dispatch import to_dataframe

    src = str(tmp_path / "t.parquet")
    spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string").write.parquet(src)
    df = to_dataframe(spark, src)
    assert df.count() == 2 and set(df.columns) == {"id", "v"}


def test_to_dataframe_orc(spark, tmp_path):
    from tensorflow_recorder_spark.sources.dispatch import to_dataframe

    src = str(tmp_path / "t.orc")
    spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string").write.orc(src)
    df = to_dataframe(spark, src, names=["v"])
    assert df.columns == ["v"] and df.count() == 2


def test_to_dataframe_rejects_unknown(spark):
    import pytest as _pytest

    from tensorflow_recorder_spark.sources.dispatch import to_dataframe

    with _pytest.raises(ValueError):
        to_dataframe(spark, "/no/such/thing.xyz")


def test_to_dataframe_plain_json_multiline(spark, tmp_path):
    """Pretty-printed .json must parse as whole documents (multiLine),
    not yield _corrupt_record rows from the line-delimited reader."""
    p = tmp_path / "docs.json"
    p.write_text('[\n  {"a": 1, "b": "x"},\n  {"a": 2, "b": "y"}\n]\n')
    df = to_dataframe(spark, str(p))
    assert "_corrupt_record" not in df.columns
    assert sorted((r["a"], r["b"]) for r in df.collect()) == [(1, "x"), (2, "y")]
