"""Multimodal operator tests (E5): binary attach, decode plumbing,
resize batch shape, frame sampling — all against the deterministic stub
codecs (no PIL/ffmpeg in this runtime)."""

from pyspark.sql import Row, functions as F

from tensorflow_recorder_spark.operators import multimodal


def _media_df(spark, tmp_path, n=3):
    paths = []
    for i in range(n):
        p = tmp_path / f"m{i}.bin"
        p.write_bytes(bytes([i]) * 64)
        paths.append(str(p))
    rows = [Row(media_id=i, uri=paths[i]) for i in range(n)]
    return spark.createDataFrame(rows)


def test_attach_binary_joins_content(spark, tmp_path):
    df = _media_df(spark, tmp_path)
    out = multimodal.attach_binary(spark, df, "uri", str(tmp_path))
    rows = {r["media_id"]: r for r in out.collect()}
    assert bytes(rows[0]["media_bytes"]) == bytes([0]) * 64
    assert rows[1]["media_length"] == 64


def test_attach_binary_missing_file_gets_null(spark, tmp_path):
    df = _media_df(spark, tmp_path).withColumn(
        "uri",
        F.when(F.col("media_id") == 1, F.lit("/nonexistent/nope.bin")).otherwise(
            F.col("uri")
        ),
    )
    out = {r["media_id"]: r for r in
           multimodal.attach_binary(spark, df, "uri", str(tmp_path)).collect()}
    assert out[1]["media_bytes"] is None
    assert bytes(out[0]["media_bytes"]) == bytes([0]) * 64


def test_attach_binary_glob_filter(spark, tmp_path):
    (tmp_path / "skip.txt").write_bytes(b"x")
    df = _media_df(spark, tmp_path)
    out = multimodal.attach_binary(spark, df, "uri", str(tmp_path), path_glob="*.bin")
    assert out.where(F.col("media_bytes").isNotNull()).count() == 3


def test_decode_image_features_and_failure(spark, tmp_path):
    df = multimodal.attach_binary(spark, _media_df(spark, tmp_path), "uri", str(tmp_path))
    # null out one row's bytes to exercise the failure route
    df = df.withColumn(
        "media_bytes", F.when(F.col("media_id") == 2, None).otherwise(F.col("media_bytes"))
    )
    out = {r["media_id"]: r for r in multimodal.decode_image_features(df).collect()}
    assert out[0]["image_ok"] is True
    assert (out[0]["image_width"], out[0]["image_height"], out[0]["image_channels"]) == (8, 8, 3)
    assert out[2]["image_ok"] is False
    assert out[2]["image_width"] is None


def test_resize_emits_requested_shape(spark, tmp_path):
    df = multimodal.attach_binary(spark, _media_df(spark, tmp_path), "uri", str(tmp_path))
    out = multimodal.resize_images(df, width=4, height=4).collect()
    assert all(len(bytes(r["resized_pixels"])) == 4 * 4 * 3 for r in out)
    # deterministic: same input bytes -> same pixels
    again = multimodal.resize_images(df, width=4, height=4).collect()
    assert {bytes(r["resized_pixels"]) for r in out} == {
        bytes(r["resized_pixels"]) for r in again
    }


def test_sample_video_frames_explodes(spark, tmp_path):
    df = multimodal.attach_binary(spark, _media_df(spark, tmp_path), "uri", str(tmp_path))
    out = multimodal.sample_video_frames(df, every_n=10).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["media_id"], []).append(r["frame_idx"])
    # stub: 64 + digest%64 frames, sampled every 10 -> 7..13 frames each
    for frames in by_id.values():
        assert frames == sorted(frames)
        assert frames[0] == 0
        assert 6 <= len(frames) <= 13
    # binary column dropped from exploded output
    assert "media_bytes" not in out[0].asDict()


def test_register_decoder_overrides_stub(spark, tmp_path):
    called = {}

    def fake_decoder(data: bytes) -> dict:
        called["yes"] = True
        return {"width": 2, "height": 2, "channels": 1, "pixels": b"\x00" * 4}

    multimodal.register_decoder("image", fake_decoder)
    try:
        df = multimodal.attach_binary(spark, _media_df(spark, tmp_path), "uri", str(tmp_path))
        out = multimodal.decode_image_features(df).collect()
        assert all(r["image_width"] == 2 for r in out)
    finally:
        multimodal._decoders.pop("image", None)


def test_audio_window_sampling_geometry(spark):
    from pyspark.sql import functions as F
    from tensorflow_recorder_spark.operators.multimodal import (
        _stub_audio_decode,
        sample_audio_windows,
    )

    docs = spark.createDataFrame(
        [(1, b"payload-a"), (2, b"payload-b"), (3, None)],
        "doc_id long, media_bytes binary",
    )
    out = sample_audio_windows(docs, window_samples=16000, hop_samples=8000)
    rows = sorted(out.collect(), key=lambda r: (r.doc_id, r.window_start))
    # NULL payload contributes no windows
    assert {r.doc_id for r in rows} == {1, 2}
    for doc_id, payload in [(1, b"payload-a"), (2, b"payload-b")]:
        n = _stub_audio_decode(payload)["n_samples"]
        mine = [r for r in rows if r.doc_id == doc_id]
        # hop grid covers the whole clip, last window may be partial
        assert [r.window_start for r in mine] == list(range(0, n, 8000))
        assert all(r.window_len == min(16000, n - r.window_start) for r in mine)
        assert mine[-1].window_start + mine[-1].window_len == n

    import pytest

    with pytest.raises(ValueError):
        sample_audio_windows(docs, window_samples=0)


def test_resize_real_png_nearest_neighbor(spark):
    """A real PNG through the built-in codec path: 2x2 quadrant image
    resized to 4x4 must replicate each quadrant color exactly."""
    from tensorflow_recorder_spark.functions.png_codec import encode_png
    from tensorflow_recorder_spark.operators import multimodal

    quad = bytes(
        [255, 0, 0, 0, 255, 0,   # row 0: red, green
         0, 0, 255, 255, 255, 0]  # row 1: blue, yellow
    )
    png = encode_png(quad, 2, 2)
    df = spark.createDataFrame([(1, bytearray(png))], "id long, media_bytes binary")
    meta = multimodal.decode_image_features(df).collect()[0]
    assert (meta["image_width"], meta["image_height"], meta["image_channels"]) == (2, 2, 3)
    out = multimodal.resize_images(df, width=4, height=4).collect()[0]
    px = bytes(out["resized_pixels"])
    assert len(px) == 4 * 4 * 3
    # top-left 2x2 block of the 4x4 output is all red
    assert px[0:3] == px[3:6] == b"\xff\x00\x00"
    # bottom-right block all yellow
    assert px[-3:] == b"\xff\xff\x00"


def test_png_gamma_srgb_chunks_roundtrip():
    """r9: gAMA/sRGB ancillary chunks survive the writer -> reader wire
    (correct framing, CRC, before-IDAT placement), and their absence
    reads back as None."""
    from tensorflow_recorder_spark.functions.png_codec import (
        decode_png,
        encode_png,
        read_png_metadata,
    )

    px = bytes(range(48))  # 4x4 RGB
    plain = encode_png(px, 4, 4, "RGB")
    assert read_png_metadata(plain) == (None, None)
    tagged = encode_png(px, 4, 4, "RGB", gamma=45455, srgb_intent=2)
    assert read_png_metadata(tagged) == (45455, 2)
    dec, w, h, mode = decode_png(tagged)  # decoder skips the new chunks
    assert (dec, w, h, mode) == (px, 4, 4, "RGB")
    only_gamma = encode_png(px, 4, 4, "RGB", gamma=100000)
    assert read_png_metadata(only_gamma) == (100000, None)


def test_png_colorspace_audit_classes_and_wire_checks(spark):
    from tensorflow_recorder_spark.operators.multimodal import (
        png_colorspace_audit,
    )

    df = spark.createDataFrame([(i,) for i in range(30)], "doc_id long")
    rows = {r.doc_id: r for r in png_colorspace_audit(df).collect()}
    assert len(rows) == 30
    for i in range(30):
        r = rows[i]
        want_gamma = 45455 if i % 5 == 0 else 40000 + (i % 5) * 2500
        assert r.gamma_ppm == want_gamma, i
        if i % 3 == 0:
            assert r.srgb_intent == i % 4 and r.color_class == "srgb"
        else:
            assert r.srgb_intent is None
            assert r.color_class == (
                "g22" if abs(want_gamma - 45455) <= 500 else "other"
            )
