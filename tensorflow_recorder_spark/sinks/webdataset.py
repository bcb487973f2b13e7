"""WebDataset tar-shard sink/source (K-extension, multimodal E5).

WebDataset (the webdataset.github.io convention used by large-scale
image/audio training loaders) stores samples as groups of tar members
sharing a basename key: ``{key}.json`` carries the scalar metadata,
and each binary column becomes its own raw ``{key}.{col}`` member.
Shards are plain POSIX tars named ``shard-SSSSS-of-NNNNN.tar`` so any
tar-reading loader streams them sequentially — the property that makes
the format work at 100 TB (no random access, no index; a reader maps
shards to workers and streams).

The reference engine has no tar story (TFRecord only); this sink
widens the K-surface the same way ``sinks/bucketed.py`` does, using
only stdlib ``tarfile``.

Spark-first design mirrors ``sinks/tfrecord.py``:
  * one Arrow-batched ``mapInPandas`` pass writes per-partition temp
    tars; only a rename manifest crosses to the driver, which renames
    to contiguous shard names — zero data materialization;
  * tar members are written with pinned metadata (mtime=0, uid/gid=0,
    mode 0644) so identical input produces byte-identical shards
    (retry/engine-stable, same rationale as the md5 split);
  * the reader is the inverse contract: shard paths parallelize, each
    task streams its tars and yields (key, member, payload) triples —
    schema reconstruction is a cheap pivot the caller owns.
"""

from __future__ import annotations

import io
import json
import tarfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from ..functions import fs
from ..functions.partitioning import spread_to_parallelism


def _json_meta(v):
    """Canonical JSON for non-native metadata values: datetimes/dates
    as ISO strings, Decimals as exact strings, numpy scalars as their
    Python number — never a silent repr()."""
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if hasattr(v, "item"):  # numpy scalar
        return v.item()
    import decimal

    if isinstance(v, decimal.Decimal):
        return str(v)
    return str(v)


def _tar_add(tar: tarfile.TarFile, name: str, payload: bytes) -> None:
    info = tarfile.TarInfo(name=name)
    info.size = len(payload)
    info.mtime = 0
    info.uid = info.gid = 0
    info.uname = info.gname = ""
    info.mode = 0o644
    tar.addfile(info, io.BytesIO(payload))


def write_webdataset(
    df: DataFrame,
    out_dir: str,
    key_col: str,
    num_shards: int = 0,
) -> dict[str, int]:
    """Write ``df`` as WebDataset tar shards under ``out_dir``.

    Every row becomes one sample keyed by ``str(row[key_col])``:
    binary columns are raw ``{key}.{col}`` members; all remaining
    columns (including the key) go into one ``{key}.json`` member with
    sorted keys and compact separators, so the metadata bytes are
    deterministic. ``num_shards=0`` keeps the input partitioning
    (one shard per non-empty partition); an explicit count
    repartitions round-robin first. Returns {shard_path: n_samples}.
    """
    if key_col not in df.columns:
        raise ValueError(f"key column {key_col!r} not in {df.columns}")
    fs.makedirs(out_dir)
    if num_shards > 0:
        df = df.repartition(num_shards)
    else:
        df = spread_to_parallelism(df)
    binary_cols = [
        f.name for f in df.schema.fields if f.dataType.simpleString() == "binary"
    ]
    # Member names are '{key}.{col}' and readers split on the LAST dot
    # (WebDataset basename convention), so a dot inside a binary column
    # name would corrupt the key/member split on round-trip, and a key
    # value ending '.json' (or '.{col}') would collide with the
    # metadata member. Reject the ambiguity at write time (r5 advice).
    for c in binary_cols:
        if "." in c:
            raise ValueError(
                f"binary column name {c!r} contains '.', which is "
                "ambiguous in WebDataset member names ('{key}.{column}' "
                "splits on the last dot); rename the column"
            )
        if c == "json":
            raise ValueError(
                "binary column name 'json' collides with the sample's "
                "'{key}.json' metadata member; rename the column"
            )
    reserved = tuple("." + m for m in ["json", *binary_cols])
    meta_cols = [c for c in df.columns if c not in binary_cols]
    part = df.withColumn("__pid", F.spark_partition_id())

    out_schema = T.StructType(
        [
            T.StructField("path", T.StringType()),
            T.StructField("n", T.LongType()),
        ]
    )

    def write_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tar = None
        raw = None  # tarfile does NOT close an external fileobj
        path = None
        n = 0
        for pdf in batches:
            if pdf.empty:
                continue
            if tar is None:
                pid = int(pdf["__pid"].iloc[0])
                path = fs.join(out_dir, f".shard-pid{pid:05d}.tar.inprogress")
                raw = fs.open_output(path)
                tar = tarfile.open(fileobj=raw, mode="w")
            cols = list(pdf.columns)
            # positional tuples: itertuples' named form renames any
            # column that is not a Python identifier ('doc-id' -> '_0')
            for row in pdf.itertuples(index=False, name=None):
                d = dict(zip(cols, row))
                key = str(d[key_col])
                if key.endswith(reserved):
                    raise ValueError(
                        f"sample key {key!r} ends with a reserved member "
                        f"suffix {reserved}; it would collide with "
                        "another sample's member on read"
                    )
                meta = {c: d[c] for c in meta_cols if c != "__pid"}
                _tar_add(
                    tar,
                    f"{key}.json",
                    json.dumps(
                        meta,
                        sort_keys=True,
                        separators=(",", ":"),
                        default=_json_meta,
                    ).encode(),
                )
                for c in binary_cols:
                    payload = d[c]
                    if payload is None:
                        continue
                    _tar_add(tar, f"{key}.{c}", bytes(payload))
                n += 1
        if tar is None:
            yield pd.DataFrame({"path": [], "n": []})
            return
        tar.close()
        raw.close()
        yield pd.DataFrame({"path": [path], "n": [n]})

    manifest = [
        (r["path"], int(r["n"]))
        for r in part.mapInPandas(write_partition, schema=out_schema).collect()
        if r["path"] is not None
    ]
    shards = sorted(manifest)
    k = max(len(shards), 1)
    results: dict[str, int] = {}
    if not shards:  # empty input still yields one valid (empty) shard
        path = fs.join(out_dir, "shard-00000-of-00001.tar")
        raw = fs.open_output(path)
        tarfile.open(fileobj=raw, mode="w").close()
        raw.close()
        return {path: 0}
    for i, (tmp, n) in enumerate(shards):
        final = fs.join(out_dir, f"shard-{i:05d}-of-{k:05d}.tar")
        fs.replace(tmp, final)
        results[final] = n
    return results


def read_webdataset(spark: SparkSession, path: str) -> DataFrame:
    """Read WebDataset shards back as raw (key, member, payload)
    triples — ``member`` is the extension part after the sample key
    (``json`` or a binary column name). Shard paths parallelize one
    per task and each task STREAMS its tars (bounded memory per
    member, no random access) — the same access pattern a training
    loader uses. Pivot to columns with ``webdataset_samples``."""
    import glob as globlib
    import os

    # same listing contract as sources/tfrecord.py: local/file:// dirs
    # glob on their local form (remote schemes route via a catalog or
    # an explicit shard list in production).
    paths = sorted(
        globlib.glob(os.path.join(fs.to_local(path), "shard-*.tar"))
    )
    out_schema = T.StructType(
        [
            T.StructField("key", T.StringType()),
            T.StructField("member", T.StringType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    if not paths:
        return spark.createDataFrame([], out_schema)
    pdf = spark.createDataFrame([(p,) for p in paths], "shard string")

    # flush per bounded batch so a task never holds a whole shard's
    # payload bytes (conventional WebDataset shards are GB-sized)
    flush_bytes = 64 << 20
    flush_members = 4096

    def read_shards(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            for shard in b["shard"]:
                keys, members, payloads = [], [], []
                pending = 0
                raw = fs.open_input(shard)
                try:
                    with tarfile.open(fileobj=raw) as tar:
                        for info in tar:
                            if not info.isfile():
                                continue
                            key, _, member = info.name.rpartition(".")
                            fh = tar.extractfile(info)
                            payload = fh.read() if fh else b""
                            payloads.append(payload)
                            keys.append(key)
                            members.append(member)
                            pending += len(payload)
                            if (
                                pending >= flush_bytes
                                or len(keys) >= flush_members
                            ):
                                yield pd.DataFrame(
                                    {
                                        "key": keys,
                                        "member": members,
                                        "payload": payloads,
                                    }
                                )
                                keys, members, payloads = [], [], []
                                pending = 0
                finally:
                    raw.close()
                if keys:
                    yield pd.DataFrame(
                        {"key": keys, "member": members, "payload": payloads}
                    )

    return pdf.mapInPandas(read_shards, schema=out_schema)


def webdataset_samples(triples: DataFrame) -> DataFrame:
    """Pivot raw member triples back to one row per sample:
    (key, meta string, binary member names array) — the JSON decodes
    driver-free via ``get_json_object``/``from_json`` downstream."""
    return (
        triples.groupBy("key")
        .agg(
            F.max(
                F.when(
                    F.col("member") == "json",
                    F.col("payload").cast("string"),
                )
            ).alias("meta"),
            F.sort_array(
                F.collect_list(
                    F.when(F.col("member") != "json", F.col("member"))
                )
            ).alias("binary_members"),
        )
    )


def write_webdataset_splits(
    df: DataFrame,
    out_dir: str,
    key_col: str,
    split_col: str = "split",
    splits: tuple[str, ...] = ("TRAIN", "VALIDATION", "TEST"),
    num_shards: int = 0,
) -> dict[str, dict[str, int]]:
    """Per-split WebDataset layout — the tar-shard twin of the TFRecord
    sink's split contract: each split writes its own ``<split_lower>/``
    shard directory, unknown split values are dropped (the DISCARD
    route), and an empty-but-present split still gets one valid empty
    shard (V8 parity). One filtered write job per split over a cached
    frame (splits are few; the per-split filter pushes into the scan
    on re-read). Returns {split: {shard_path: n_samples}}."""
    results: dict[str, dict[str, int]] = {}
    work = df.where(F.col(split_col).isin(*splits)).cache()
    try:
        for split_value in splits:
            sub = work.where(F.col(split_col) == split_value).drop(split_col)
            results[split_value] = write_webdataset(
                sub,
                fs.join(out_dir, split_value.lower()),
                key_col,
                num_shards=num_shards,
            )
    finally:
        work.unpersist()
    return results
