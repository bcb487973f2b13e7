"""Restored round-8 regression tests (r8 advice, medium): these guards
for previously-fixed bugs were overwritten when tests/test_round8_ops.py
was repurposed for the interval/CDC operators — a silent revert of any
of the fixes (bounded new-vs-returning state, benched_queries registry
exactness, meminfo fallback, TIFF palette >>8 vs //257 divergence at
65534, EXIF orientation audit, channel stats, subtitle alignment) would
have passed CI. They live in their own file now so future repurposing
can't drop them again."""

import os
import tempfile

import pytest

from pyspark.sql import functions as F


def _write_event_file(spark, path, rows, mode):
    schema = (
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string"
    )
    # one part-file per call so maxFilesPerTrigger=1 maps each call to
    # exactly one micro-batch
    spark.createDataFrame(rows, schema).withColumn(
        "ts", F.col("ts").cast("timestamp")
    ).coalesce(1).write.mode(mode).parquet(path)


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
    def test_benched_list_is_exactly_the_batch_registry(self):
        """bench.benched_queries() — the REAL list main() iterates — is
        exactly the non-stream registry (every batch query benched, no
        stream twin benched, no duplicates). Module-derived exclusion,
        r7 advice item 4; pinned against the actual function rather
        than a re-derivation, r8 review."""
        import bench
        from tensorflow_recorder_spark.queries import QUERIES

        benched = bench.benched_queries()
        stream_names = {
            n
            for n, fn in QUERIES.items()
            if getattr(fn, "__module__", "").endswith(".queries.streams")
        }
        assert len(benched) == len(set(benched))  # no duplicates
        assert set(benched) == set(QUERIES) - stream_names
        # main() iterates this exact callable's output (since r11 via
        # the shared _sample4 runner that the transient-row splice
        # also uses)
        src = open(bench.__file__).read()
        assert "*benched_queries()," in src


class TestSessionMeminfoRobustness:
    def test_malformed_meminfo_falls_back(self, tmp_path):
        """A truncated MemAvailable line must not raise out of the
        driver-heap sizing (r7 advice item 1) — exercised through the
        REAL session._default_driver_mem, not a copied snippet (r8
        review)."""
        from tensorflow_recorder_spark.session import _default_driver_mem

        truncated = tmp_path / "meminfo"
        truncated.write_text("MemAvailable:\n")  # no value field
        assert _default_driver_mem(str(truncated)) == "3g"  # 8.0 * 0.4

        garbage = tmp_path / "garbage"
        garbage.write_text("MemAvailable: lots kB\n")  # non-numeric
        assert _default_driver_mem(str(garbage)) == "3g"

        assert _default_driver_mem(str(tmp_path / "absent")) == "3g"

        real = tmp_path / "real"
        real.write_text("MemAvailable: 20971520 kB\n")  # 20 GiB
        assert _default_driver_mem(str(real)) == "8g"  # 40% of 20

        huge = tmp_path / "huge"
        huge.write_text("MemAvailable: 209715200 kB\n")  # 200 GiB
        assert _default_driver_mem(str(huge)) == "12g"  # cap


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


class TestExifTiffOrientation:
    def test_real_tag_roundtrip_drives_audit(self, spark):
        from tensorflow_recorder_spark.operators.multimodal import (
            exif_tiff_orientation_audit,
        )

        df = spark.createDataFrame([(i,) for i in range(16)], "doc_id long")
        rows = {
            (r.orientation, r.transposed): r
            for r in exif_tiff_orientation_audit(df).collect()
        }
        # ids 0..15 -> orientations 1..8 twice each
        assert set(rows) == {(o, o >= 5) for o in range(1, 9)}
        assert all(r.n == 2 for r in rows.values())
        assert abs(sum(r.share for r in rows.values()) - 1.0) < 1e-6
        # transposed rows report swapped dims: orientation 5 covers
        # ids 4 and 12 -> (w,h) = (8+44%53, 8+20%37) and (8+(132)%53...)
        r5 = rows[(5, True)]
        w4, h4 = 8 + (4 * 11) % 53, 8 + (4 * 5) % 37
        w12, h12 = 8 + (12 * 11) % 53, 8 + (12 * 5) % 37
        assert r5.avg_out_w == round((h4 + h12) / 2, 6)
        assert r5.avg_out_h == round((w4 + w12) / 2, 6)

    def test_orientation_tag_survives_compression_modes(self):
        from tensorflow_recorder_spark.functions.tiff_codec import (
            decode_tiff,
            encode_tiff,
            read_tiff_orientation,
        )

        px = bytes(range(48))  # 8x6 grayscale
        for comp in ("none", "packbits", "lzw", "deflate"):
            for o in (1, 3, 6, 8):
                t = encode_tiff(px, 8, 6, "L", compression=comp, orientation=o)
                assert read_tiff_orientation(t) == o
                dec, w, h, mode = decode_tiff(t)
                assert (dec, w, h, mode) == (px, 8, 6, "L")


class TestChannelStats:
    def test_exact_integer_sums_from_decoded_pixels(self, spark):
        from tensorflow_recorder_spark.operators.multimodal import (
            channel_stats_audit,
        )

        df = spark.createDataFrame([(3,), (10,)], "doc_id long")
        out = {r.doc_id: r for r in channel_stats_audit(df).collect()}
        for i in (3, 10):
            w, h = 4 + i % 5, 3 + i % 4
            c = (i * 29) % 256
            r = out[i]
            assert r.n_px == w * h
            assert r.r_sum == c * w * h
            assert r.g_sum == ((c * 5) % 256) * w * h
            assert r.b_sum == ((c * 11) % 256) * w * h


class TestSubtitleAlignment:
    def test_first_cue_miss_and_drift_arithmetic(self, spark, tmp_path):
        """A doc whose mux offset exceeds its subtitle offset misses on
        the first cue; later cues match the same-index segment."""
        import os

        from tensorflow_recorder_spark.queries import QUERIES

        # doc_id 50: off_c = 350%500=350, off_s = 650%300=50 -> all match,
        #            drift 300
        # doc_id 100: off_c = 700%500=200, off_s = 1300%300=100 -> match,
        #            drift 100 (within 150)
        d = str(tmp_path)
        spark.createDataFrame(
            [(50, "x", "en", "sA", 10), (100, "y", "en", "sA", 10)],
            "doc_id long, text string, lang string, source string,"
            " n_chars long",
        ).write.parquet(os.path.join(d, "documents.parquet"), mode="overwrite")
        rows = {r.source: r for r in
                QUERIES["e5_subtitle_alignment"](spark, d).collect()}
        r = rows["sA"]
        # doc 50: 4 + 50%5 = 4 cues; doc 100: 4 cues -> 8 cues total
        assert r.n_cues == 8
        assert r.n_matched == 8
        assert r.max_drift_ms == 300
        assert r.within_150ms_share == 0.5
