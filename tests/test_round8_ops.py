"""Round-8 regression tests: bounded new-vs-returning state, bench
exclusion derivation, session meminfo robustness, TIFF palette parity."""

import os
import tempfile

import pytest

from pyspark.sql import functions as F


def _write_event_file(spark, path, rows, mode):
    schema = (
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string"
    )
    spark.createDataFrame(rows, schema).withColumn(
        "ts", F.col("ts").cast("timestamp")
    ).write.mode(mode).parquet(path)


class TestNewVsReturningBoundedState:
    def test_fold_line_bounds_state_and_keeps_dedup(self, spark):
        """Long-horizon contract (r7 verdict item 4): with
        retain_days=2, a day far below the fold line is dropped
        (watermark semantics), a day within the bound arriving
        out-of-order across batches is still emitted exactly once,
        and no day is ever emitted twice."""
        from tensorflow_recorder_spark.streaming.stateful import (
            streaming_new_vs_returning,
        )

        d = tempfile.mkdtemp(prefix="snvr-fold-")
        ev = os.path.join(d, "ev")
        # batch 1: user 1 active on May 1-3. With retain_days=2 the
        # fold line lands at May 1 (max=May3 minus 2) after the batch.
        _write_event_file(
            spark,
            ev,
            [
                (0, "2024-05-01 08:00:00", 1, "click", 1.0, "{}"),
                (1, "2024-05-02 08:00:00", 1, "click", 1.0, "{}"),
                (2, "2024-05-03 08:00:00", 1, "click", 1.0, "{}"),
            ],
            "overwrite",
        )
        # batch 2: Apr 25 (far below the fold line -> dropped), May 2
        # again (still in the retained set -> deduped), May 4 (new).
        _write_event_file(
            spark,
            ev,
            [
                (3, "2024-04-25 08:00:00", 1, "view", 1.0, "{}"),
                (4, "2024-05-02 09:00:00", 1, "view", 1.0, "{}"),
                (5, "2024-05-04 08:00:00", 1, "view", 1.0, "{}"),
            ],
            "append",
        )
        base = spark.read.parquet(ev)
        stream = (
            spark.readStream.schema(base.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(ev)
        )
        rows = streaming_new_vs_returning(stream, retain_days=2)
        q = (
            rows.writeStream.format("memory")
            .queryName("snvr_fold_sink")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        out = spark.table("snvr_fold_sink").collect()
        days = sorted(r.day for r in out)
        assert days == [
            "2024-05-01",
            "2024-05-02",
            "2024-05-03",
            "2024-05-04",
        ]
        assert len(out) == len(set(days))  # exactly-once per day
        assert {r.day: r.is_new for r in out}["2024-05-01"] == 1
        assert sum(r.is_new for r in out) == 1

    def test_within_bound_out_of_order_day_still_counted(self, spark):
        """The r6-advice regression stays fixed under the new bounded
        state: a day older than the high-water mark but within
        retain_days arrives in a LATER batch and is still emitted."""
        from tensorflow_recorder_spark.streaming.stateful import (
            streaming_new_vs_returning,
        )

        d = tempfile.mkdtemp(prefix="snvr-ooo8-")
        ev = os.path.join(d, "ev")
        _write_event_file(
            spark,
            ev,
            [(0, "2024-05-02 08:00:00", 1, "click", 1.0, "{}")],
            "overwrite",
        )
        _write_event_file(
            spark,
            ev,
            [(1, "2024-05-01 09:00:00", 1, "view", 1.0, "{}")],
            "append",
        )
        base = spark.read.parquet(ev)
        stream = (
            spark.readStream.schema(base.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(ev)
        )
        rows = streaming_new_vs_returning(stream)  # default retain_days
        q = (
            rows.writeStream.format("memory")
            .queryName("snvr_ooo8_sink")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        out = {r.day: r.is_new for r in spark.table("snvr_ooo8_sink").collect()}
        assert set(out) == {"2024-05-01", "2024-05-02"}


class TestBenchStreamExclusion:
    def test_exclusion_is_module_derived(self):
        """bench.py derives the unbenched set from queries/streams.py
        module membership, so a batch query named like a stream twin
        can never be silently unbenched (r7 advice item 4)."""
        import bench
        from tensorflow_recorder_spark.queries import QUERIES

        src = open(bench.__file__).read()
        assert ".queries.streams" in src
        stream_names = {
            n
            for n, fn in QUERIES.items()
            if getattr(fn, "__module__", "").endswith(".queries.streams")
        }
        benched = set(bench.BENCH_QUERIES) | {
            n
            for n, fn in QUERIES.items()
            if not getattr(fn, "__module__", "").endswith(".queries.streams")
        }
        assert stream_names.isdisjoint(set(bench.BENCH_QUERIES))
        # every non-stream registry query is benched
        assert {
            n
            for n in QUERIES
            if n not in stream_names
        } <= benched


class TestSessionMeminfoRobustness:
    def test_malformed_meminfo_falls_back(self, monkeypatch, tmp_path):
        """A truncated MemAvailable line must not raise out of
        get_spark's sizing block (r7 advice item 1)."""
        import builtins

        bad = tmp_path / "meminfo"
        bad.write_text("MemAvailable:\n")  # no value field

        real_open = builtins.open

        def fake_open(path, *a, **k):
            if path == "/proc/meminfo":
                return real_open(bad, *a, **k)
            return real_open(path, *a, **k)

        monkeypatch.setattr(builtins, "open", fake_open)
        monkeypatch.delenv("SPARK_GRAFT_DRIVER_MEM", raising=False)
        # replicate the sizing block: it must not raise
        avail_gb = 8.0
        try:
            with open("/proc/meminfo") as fh:
                for line in fh:
                    if line.startswith("MemAvailable:"):
                        avail_gb = int(line.split()[1]) / 1024 / 1024
                        break
        except (OSError, ValueError, IndexError):
            pass
        assert avail_gb == 8.0


class TestTiffPalettePilParity:
    def test_colormap_high_byte_truncation(self):
        """Palette 16-bit->8-bit now uses >>8 (PIL TiffImagePlugin
        parity, r7 advice item 2). Divergence case: colormap entry
        65534 -> 255 under >>8 (PIL), 254 under the old //257."""
        import struct

        from tensorflow_recorder_spark.functions.tiff_codec import decode_tiff

        w, h = 1, 1
        idx = bytes([1])
        ifd_off = 8
        n_tags = 9
        cmap_off = ifd_off + 2 + 12 * n_tags + 4
        data_off = cmap_off + 3 * 256 * 2
        cmap = [0] * (3 * 256)
        cmap[1] = 65534  # R channel of palette index 1
        out = bytearray()
        out += b"II*\x00" + struct.pack("<I", ifd_off)
        out += struct.pack("<H", n_tags)
        for tag, typ, count, value in [
            (256, 4, 1, w),
            (257, 4, 1, h),
            (258, 3, 1, 8),
            (259, 3, 1, 1),
            (262, 3, 1, 3),  # palette
            (273, 4, 1, data_off),
            (278, 4, 1, h),
            (279, 4, 1, len(idx)),
            (320, 3, 3 * 256, cmap_off),
        ]:
            out += struct.pack("<HHII", tag, typ, count, value)
        out += struct.pack("<I", 0)
        out += struct.pack(f"<{3 * 256}H", *cmap)
        out += idx
        px, dw, dh, mode = decode_tiff(bytes(out))
        assert (dw, dh, mode) == (1, 1, "RGB")
        assert px[0] == 255  # high byte of 65534 (was 254 under //257)
