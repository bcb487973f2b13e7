"""Baseline JPEG codec tests (T3: real image decode without PIL).

Reference behavior matched: raw decoded pixels, PIL tobytes() layout
(/root/reference/tfrecorder/beam_image.py:44-51, 62-73). The encoder is
the fixture builder (no PIL in this runtime), so every decode test runs
against bytes produced by the repo's own T.81-conformant writer; the
entropy layer is additionally pinned by a marker-level structure test.
"""

import struct

import numpy as np
import pytest

from tensorflow_recorder_spark.functions.jpeg_codec import (
    decode_jpeg,
    encode_jpeg,
    is_jpeg,
)


def _gradient_rgb(width: int, height: int) -> np.ndarray:
    yy, xx = np.mgrid[0:height, 0:width]
    return np.stack(
        [
            xx * 255 // max(width - 1, 1),
            yy * 255 // max(height - 1, 1),
            (xx + yy) * 255 // max(width + height - 2, 1),
        ],
        axis=-1,
    ).astype(np.uint8)


def test_is_jpeg():
    assert is_jpeg(b"\xff\xd8\xff\xe0rest")
    assert not is_jpeg(b"\x89PNG")
    assert not is_jpeg(b"\xff")


def test_flat_color_round_trip_near_exact():
    w, h = 16, 8
    flat = bytes([128, 64, 200] * (w * h))
    px, dw, dh, mode = decode_jpeg(encode_jpeg(flat, w, h, "RGB"))
    assert (dw, dh, mode) == (w, h, "RGB")
    err = np.abs(
        np.frombuffer(flat, np.uint8).astype(int)
        - np.frombuffer(px, np.uint8).astype(int)
    )
    assert err.max() <= 2


@pytest.mark.parametrize("subsample", ["4:4:4", "4:2:2", "4:2:0"])
@pytest.mark.parametrize("restart_interval", [0, 3])
def test_rgb_gradient_round_trip(subsample, restart_interval):
    """Smooth gradients survive quality-50 quantization within a small
    tolerance across every subsampling mode, odd dimensions included,
    with and without restart markers."""
    w, h = 53, 37  # not multiples of 8 or 16
    img = _gradient_rgb(w, h)
    jpg = encode_jpeg(
        img.tobytes(), w, h, "RGB",
        subsample=subsample, restart_interval=restart_interval,
    )
    px, dw, dh, mode = decode_jpeg(jpg)
    assert (dw, dh, mode) == (w, h, "RGB")
    got = np.frombuffer(px, np.uint8).astype(int).reshape(h, w, 3)
    err = np.abs(img.astype(int) - got)
    assert err.mean() < 5 and err.max() < 32, (subsample, err.mean(), err.max())


def test_grayscale_round_trip():
    h, w = 64, 8  # vertical multi-block: catches transposed layouts
    img = np.tile((np.arange(h, dtype=np.uint8) * 4)[:, None], (1, w))
    px, dw, dh, mode = decode_jpeg(encode_jpeg(img.tobytes(), w, h, "L"))
    assert (dw, dh, mode) == (w, h, "L")
    got = np.frombuffer(px, np.uint8).astype(int).reshape(h, w)
    assert np.abs(img.astype(int) - got).max() <= 4


def test_marker_structure():
    """The writer emits a well-formed baseline stream: SOI, JFIF APP0,
    DQT, SOF0 with correct dims, DHT, SOS, EOI."""
    w, h = 9, 7
    jpg = encode_jpeg(_gradient_rgb(w, h).tobytes(), w, h, "RGB")
    assert jpg[:2] == b"\xff\xd8" and jpg[-2:] == b"\xff\xd9"
    markers = []
    pos = 2
    while pos < len(jpg) - 2:
        assert jpg[pos] == 0xFF
        m = jpg[pos + 1]
        markers.append(m)
        (seglen,) = struct.unpack(">H", jpg[pos + 2 : pos + 4])
        if m == 0xC0:  # SOF0: precision 8, height, width, 3 components
            assert jpg[pos + 4] == 8
            fh, fw = struct.unpack(">HH", jpg[pos + 5 : pos + 9])
            assert (fw, fh) == (w, h) and jpg[pos + 9] == 3
        if m == 0xDA:
            break
        pos += 2 + seglen
    assert 0xE0 in markers and 0xDB in markers and 0xC4 in markers
    assert markers[-1] == 0xDA


def test_progressive_rejected():
    """SOF2 (progressive) must raise — the loader routes it to DISCARD
    rather than decoding garbage."""
    w, h = 9, 7
    jpg = bytearray(encode_jpeg(_gradient_rgb(w, h).tobytes(), w, h, "RGB"))
    idx = bytes(jpg).find(b"\xff\xc0")
    jpg[idx + 1] = 0xC2
    with pytest.raises(ValueError, match="SOF2"):
        decode_jpeg(bytes(jpg))


def test_corrupt_jpegs_raise():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"not a jpeg")
    w, h = 9, 7
    jpg = encode_jpeg(_gradient_rgb(w, h).tobytes(), w, h, "RGB")
    with pytest.raises(ValueError):
        decode_jpeg(jpg[:40])  # truncated before SOS


def test_extract_images_decodes_real_jpeg(spark, tmp_path):
    """T3 through Spark: a real JPEG on disk yields its true dimensions
    (not the 4x4 synthetic fallback), a corrupt one routes to DISCARD."""
    import pandas as pd

    import tensorflow_recorder_spark as trs

    w, h = 24, 10
    good = tmp_path / "real.jpg"
    good.write_bytes(encode_jpeg(_gradient_rgb(w, h).tobytes(), w, h, "RGB"))
    bad = tmp_path / "broken.jpg"
    bad.write_bytes(b"\xff\xd8\xff\xdb truncated garbage")
    pdf = pd.DataFrame(
        {
            "split": ["TRAIN", "TRAIN"],
            "image_uri": [str(good), str(bad)],
            "label": ["a", "b"],
        }
    )
    res = trs.convert(pdf, output_dir=str(tmp_path / "out"), spark=spark)
    assert res["metrics"] == {"rows": 2, "good_images": 1, "bad_images": 1}
    splits = trs.load(res["tfrecord_dir"], spark=spark)
    row = splits["TRAIN"].collect()[0]
    assert (row["image_width"], row["image_height"], row["image_channels"]) == (
        w, h, 3,
    )


def test_jpeg_property_roundtrip_smooth_images():
    """Property test: random smooth images (low-frequency ramps with
    random endpoints/sizes) round-trip within JPEG quality-50 tolerance
    for every subsampling mode; dims and mode always exact."""
    import numpy as np

    rng = np.random.RandomState(1234)
    for _ in range(12):
        # >= 8 px per side: sub-MCU images are one edge-padded block
        # where a steep ramp is ALL high-frequency content and quality-50
        # quantization legitimately smears it (PIL behaves the same)
        w = int(rng.randint(8, 70))
        h = int(rng.randint(8, 70))
        c0 = rng.randint(0, 256, 3)
        c1 = rng.randint(0, 256, 3)
        yy, xx = np.mgrid[0:h, 0:w]
        t = (xx + yy) / max(w + h - 2, 1)
        img = (c0[None, None, :] * (1 - t[..., None]) + c1[None, None, :] * t[..., None]).astype(np.uint8)
        ss = ["4:4:4", "4:2:2", "4:2:0"][int(rng.randint(3))]
        ri = int(rng.randint(0, 3))
        jpg = encode_jpeg(img.tobytes(), w, h, "RGB", subsample=ss, restart_interval=ri)
        px, dw, dh, mode = decode_jpeg(jpg)
        assert (dw, dh, mode) == (w, h, "RGB")
        got = np.frombuffer(px, np.uint8).astype(int).reshape(h, w, 3)
        err = np.abs(img.astype(int) - got)
        assert err.mean() < 6, (w, h, ss, ri, err.mean())


def test_jpeg_decode_deterministic():
    jpg = encode_jpeg(_gradient_rgb(19, 11).tobytes(), 19, 11, "RGB")
    assert decode_jpeg(jpg) == decode_jpeg(jpg)
