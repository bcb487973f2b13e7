"""CLI tests (C3): argparse surface incl. --schema passthrough
(reference cli.py exposes convert/inspect via fire; fire's arbitrary
kwargs let users pass schema=..., so the argparse fallback must too)."""

import json

from tensorflow_recorder_spark import cli
from tensorflow_recorder_spark.schema import Schema


def test_cli_convert_with_schema_json(spark, tmp_path, capsys):
    csv = tmp_path / "in.csv"
    csv.write_text(
        "split,label,weight\n"
        "TRAIN,cat,1.5\nTRAIN,goat,2.5\nTEST,cat,0.5\n"
    )
    schema_json = tmp_path / "schema.json"
    schema_json.write_text(
        json.dumps(
            {"split": "split_key", "label": "string_label", "weight": "float_input"}
        )
    )
    # round-trips through Schema.from_json
    Schema.from_json(schema_json.read_text())
    rc = cli.main(
        [
            "convert",
            f"--input_data={csv}",
            f"--output_dir={tmp_path / 'out'}",
            f"--schema={schema_json}",
        ]
    )
    assert rc == 0
    result = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert result["metrics"]["rows"] == 3
    assert result["tfrecord_dir"]


def test_cli_convert_default_schema_requires_image_uri(spark, tmp_path, capsys):
    csv = tmp_path / "in.csv"
    csv.write_text("split,label\nTRAIN,cat\n")
    try:
        cli.main(["convert", f"--input_data={csv}", f"--output_dir={tmp_path/'o'}"])
    except AttributeError as e:
        assert "image_uri" in str(e)
    else:  # pragma: no cover
        raise AssertionError("default schema should require image_uri")


def test_cli_convert_headerless_with_names(spark, tmp_path, capsys):
    csv = tmp_path / "raw.csv"
    csv.write_text("TRAIN,cat,1.5\nTEST,goat,0.5\n")
    schema_json = tmp_path / "s.json"
    schema_json.write_text(
        json.dumps(
            {"split": "split_key", "label": "string_label", "w": "float_input"}
        )
    )
    rc = cli.main(
        [
            "convert",
            f"--input_data={csv}",
            f"--output_dir={tmp_path / 'out'}",
            f"--schema={schema_json}",
            "--header=none",
            "--names=split,label,w",
            "--job_label=clitest",
        ]
    )
    assert rc == 0
    result = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert result["metrics"]["rows"] == 2
    assert "clitest" in result["tfrecord_dir"]
