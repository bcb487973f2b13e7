"""Pure-stdlib PNG decoder tests (T3: real image decode without PIL).

Reference behavior matched: raw decoded pixels, PIL tobytes() layout
(/root/reference/tfrecorder/beam_image.py:44-51, 62-73).
"""

import struct
import zlib

import pytest

from tensorflow_recorder_spark.functions.png_codec import (
    PNG_SIGNATURE,
    decode_png,
    encode_png,
    is_png,
)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
    return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)


def _png_from_filtered(width, height, color_type, samples, filtered_rows, extra=b""):
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    raw = b"".join(filtered_rows)
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + extra
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def _forward_filter(pixels, width, height, samples, ftype):
    """Apply a PNG filter (encoder side, straight from RFC 2083 §6) to
    produce the on-wire filtered rows for known pixels — independent of
    the decoder under test."""

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        if pb <= pc:
            return b
        return c

    stride = width * samples
    rows = []
    for y in range(height):
        row = pixels[y * stride : (y + 1) * stride]
        prev = pixels[(y - 1) * stride : y * stride] if y > 0 else bytes(stride)
        out = bytearray([ftype])
        for x in range(stride):
            left = row[x - samples] if x >= samples else 0
            up = prev[x]
            ul = prev[x - samples] if x >= samples else 0
            if ftype == 0:
                v = row[x]
            elif ftype == 1:
                v = row[x] - left
            elif ftype == 2:
                v = row[x] - up
            elif ftype == 3:
                v = row[x] - ((left + up) >> 1)
            else:
                v = row[x] - paeth(left, up, ul)
            out.append(v & 0xFF)
        rows.append(bytes(out))
    return rows


@pytest.mark.parametrize("mode,samples", [("L", 1), ("LA", 2), ("RGB", 3), ("RGBA", 4)])
def test_round_trip_all_modes(mode, samples):
    width, height = 5, 3
    pixels = bytes(range(width * height * samples))
    data = encode_png(pixels, width, height, mode)
    assert is_png(data)
    out, w, h, m = decode_png(data)
    assert (out, w, h, m) == (pixels, width, height, mode)


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_all_filter_types_decode_to_known_pixels(ftype):
    width, height, samples = 4, 4, 3
    # non-trivial pixel pattern so every filter produces distinct bytes
    pixels = bytes((x * 37 + 11) % 256 for x in range(width * height * samples))
    rows = _forward_filter(pixels, width, height, samples, ftype)
    data = _png_from_filtered(width, height, 2, samples, rows)
    out, w, h, m = decode_png(data)
    assert (w, h, m) == (width, height, "RGB")
    assert out == pixels


def test_mixed_filters_per_row():
    width, height, samples = 3, 5, 1
    pixels = bytes((x * 53 + 7) % 256 for x in range(width * height))
    rows = []
    for y, ftype in enumerate([0, 1, 2, 3, 4]):
        rows.append(
            _forward_filter(pixels, width, height, samples, ftype)[y]
        )
    data = _png_from_filtered(width, height, 0, samples, rows)
    out, w, h, m = decode_png(data)
    assert (w, h, m) == (width, height, "L")
    assert out == pixels


def test_palette_expands_to_rgb():
    width, height = 2, 2
    palette = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # red, green, blue
    indices = bytes([0, 1, 2, 0])
    rows = [b"\x00" + indices[0:2], b"\x00" + indices[2:4]]
    data = _png_from_filtered(width, height, 3, 1, rows, extra=_chunk(b"PLTE", palette))
    out, w, h, m = decode_png(data)
    assert m == "RGB"
    assert out == bytes(
        [255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 0, 0]
    )


@pytest.mark.parametrize(
    "mutate,err",
    [
        (lambda d: b"JUNK" + d[4:], "signature"),
        (lambda d: d[:20], "IHDR|truncated"),
        (lambda d: d.replace(b"IDAT", b"IDXT"), "IDAT"),
    ],
)
def test_corrupt_pngs_raise(mutate, err):
    data = encode_png(bytes(12), 2, 2, "RGB")
    with pytest.raises(ValueError, match=err):
        decode_png(mutate(data))


@pytest.mark.parametrize("mode,samples", [("L", 1), ("RGB", 3), ("RGBA", 4)])
@pytest.mark.parametrize(
    "width,height",
    [(1, 1), (3, 2), (7, 5), (8, 8), (9, 9), (16, 11)],
)
def test_adam7_round_trip(mode, samples, width, height):
    # sizes below 8 exercise empty/partial passes; 8x8 the full grid
    pixels = bytes((i * 37 + 11) % 256 for i in range(width * height * samples))
    data = encode_png(pixels, width, height, mode, interlace=True)
    out, w, h, m = decode_png(data)
    assert (w, h, m) == (width, height, mode)
    assert out == pixels
    # and the interlaced file decodes to the same pixels as the
    # non-interlaced encoding of the same image
    plain, _, _, _ = decode_png(encode_png(pixels, width, height, mode))
    assert out == plain


@pytest.mark.parametrize("ftype", [1, 2, 3, 4])
def test_adam7_filters_within_passes(ftype):
    # filters apply WITHIN each reduced pass (never across passes):
    # forward-filter every pass as its own little image, then check the
    # decoder reassembles the original grid
    from tensorflow_recorder_spark.functions.png_codec import _adam7_passes

    width, height, samples = 10, 9, 3
    stride = width * samples
    pixels = bytes((i * 29 + 5) % 256 for i in range(width * height * samples))
    parts = []
    for x0, y0, dx, dy, pw, ph in _adam7_passes(width, height):
        sub = bytearray()
        for py in range(ph):
            srow = (y0 + py * dy) * stride
            for px in range(pw):
                s = srow + (x0 + px * dx) * samples
                sub += pixels[s : s + samples]
        parts += _forward_filter(bytes(sub), pw, ph, samples, ftype)
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 1)
    data = (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"".join(parts)))
        + _chunk(b"IEND", b"")
    )
    out, w, h, m = decode_png(data)
    assert (w, h, m) == (width, height, "RGB")
    assert out == pixels


def test_bad_interlace_method_rejected():
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 7)  # bogus method
    data = (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(20)))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="interlace"):
        decode_png(data)


def test_adam7_truncated_data_raises():
    data = encode_png(bytes(81), 9, 9, "L", interlace=True)
    # chop the IDAT: decoder must raise, not return garbage
    idat_at = data.find(b"IDAT")
    body_len = struct.unpack(">I", data[idat_at - 4 : idat_at])[0]
    shortened = zlib.compress(
        zlib.decompress(data[idat_at + 4 : idat_at + 4 + body_len])[:-30]
    )
    rebuilt = (
        data[: idat_at - 4]
        + _chunk(b"IDAT", shortened)
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="shorter"):
        decode_png(rebuilt)


def test_extract_images_decodes_real_png(spark, tmp_path):
    """e2e: the default (no-PIL) loader decodes a real PNG to its exact
    pixels through extract_images, and a corrupt PNG routes to DISCARD."""
    from tensorflow_recorder_spark.functions.image_codec import decode_pixels
    from tensorflow_recorder_spark.operators import image as image_op

    width, height = 3, 2
    pixels = bytes([10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120,
                    130, 140, 150, 160, 170, 180])
    good = tmp_path / "good.png"
    good.write_bytes(encode_png(pixels, width, height, "RGB"))
    bad = tmp_path / "bad.png"
    bad.write_bytes(PNG_SIGNATURE + b"garbage-after-signature")

    df = spark.createDataFrame(
        [("TRAIN", str(good)), ("TRAIN", str(bad))], "split string, image_uri string"
    )
    rows = {r["image_name"]: r for r in
            image_op.extract_images(df, "image_uri").collect()}
    ok = rows["good.png"]
    assert (ok["image_width"], ok["image_height"], ok["image_channels"]) == (3, 2, 3)
    assert decode_pixels(ok["image"]) == pixels
    assert ok["split"] == "TRAIN" and ok["__image_ok"]
    bad_row = [r for r in rows.values() if r["image_name"] is None][0]
    assert bad_row["split"] == "DISCARD" and not bad_row["__image_ok"]


def test_encode_png_gamma_out_of_range_raises_valueerror():
    """r9 advice: gAMA is a u32 (RFC 2083 4.2.1) — a negative or
    >= 2**32 gamma must raise a clear ValueError, not an opaque
    struct.error from the pack call."""
    import pytest

    px = bytes(range(4 * 3 * 3))
    for bad in (-1, 2**32, 2**40):
        with pytest.raises(ValueError, match="gAMA"):
            encode_png(px, 4, 3, "RGB", gamma=bad)
    # boundary values still encode
    for ok in (0, 2**32 - 1):
        assert encode_png(px, 4, 3, "RGB", gamma=ok)
