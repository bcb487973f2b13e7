"""CLI (C3, SURVEY.md §2.6).

Reference: /root/reference/tfrecorder/cli.py:25-31 exposes ``convert``
and ``inspect`` through python-fire. Fire is not in this runtime, so the
same two commands are exposed via argparse with a fire fallback."""

from __future__ import annotations

import argparse
import json
import sys

from . import api


def main(argv: list[str] | None = None) -> int:
    try:  # pragma: no cover - fire not present in this runtime
        import fire

        fire.Fire({"convert": api.convert, "inspect": api.inspect})
        return 0
    except ImportError:
        pass

    parser = argparse.ArgumentParser(prog="tfrecorder-spark")
    sub = parser.add_subparsers(dest="command", required=True)

    p_convert = sub.add_parser("convert", help="convert CSV/dir to TFRecords")
    p_convert.add_argument("--input_data", required=True)
    p_convert.add_argument("--output_dir", default="./tfrecords")
    p_convert.add_argument("--compression", default="gzip")
    p_convert.add_argument("--num_shards", type=int, default=0)
    p_convert.add_argument(
        "--schema",
        default=None,
        help="path to a schema JSON file ({column: type_name}, the format "
        "Schema.to_json writes); defaults to the image-CSV schema",
    )
    p_convert.add_argument(
        "--header",
        default="infer",
        help="CSV header handling: 'infer' (default), 0, or 'none'",
    )
    p_convert.add_argument(
        "--names",
        default=None,
        help="comma-separated column names overriding/assigning the header",
    )
    p_convert.add_argument("--job_label", default="convert")
    p_convert.add_argument(
        "--scale_numeric",
        action="store_true",
        help="z-score numeric input columns with TRAIN-fitted stats",
    )

    p_inspect = sub.add_parser("inspect", help="dump rows from TFRecords")
    p_inspect.add_argument("--tfrecord_dir", required=True)
    p_inspect.add_argument("--split", default="TRAIN")
    p_inspect.add_argument("--num_records", type=int, default=1)
    p_inspect.add_argument("--output_dir", default="/tmp")

    args = parser.parse_args(argv)
    if args.command == "convert":
        kwargs = {}
        if args.schema:
            from .schema import Schema

            with open(args.schema) as fh:
                kwargs["schema"] = Schema.from_json(fh.read())
        if args.names:
            kwargs["names"] = [n.strip() for n in args.names.split(",")]
        header = args.header
        if header in ("none", ""):
            header = None
        elif header != "infer":
            header = int(header)
        result = api.convert(
            args.input_data,
            output_dir=args.output_dir,
            compression=None if args.compression in ("", "none") else args.compression,
            num_shards=args.num_shards,
            header=header,
            job_label=args.job_label,
            scale_numeric=args.scale_numeric,
            **kwargs,
        )
        print(json.dumps(result))
    else:
        out = api.inspect(
            args.tfrecord_dir,
            split=args.split,
            num_records=args.num_records,
            output_dir=args.output_dir,
        )
        print(out)
    return 0


if __name__ == "__main__":  # pragma: no cover
    sys.exit(main())
