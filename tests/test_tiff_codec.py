"""TIFF codec tests (T3 no-PIL format envelope, round 7 — closes the
r6 verdict's last tractable format gap).

The repo's encoder is the fixture builder (no PIL in this runtime):
uncompressed, PackBits, and TIFF-LZW strips, single- and multi-strip,
gray and RGB, plus hand-built fixtures for the paths the encoder does
not emit (big-endian, WhiteIsZero, palette, bilevel, predictor 2) so
the decoder is exercised beyond its own writer's dialect.
"""

import struct

import numpy as np
import pytest

from tensorflow_recorder_spark.functions.tiff_codec import (
    _lzw_decode,
    _lzw_encode,
    _packbits,
    _unpackbits,
    decode_tiff,
    encode_tiff,
    is_tiff,
)


def test_is_tiff_magic():
    assert is_tiff(b"II*\x00" + b"\x00" * 8)
    assert is_tiff(b"MM\x00*" + b"\x00" * 8)
    assert not is_tiff(b"BM\x00\x00")
    assert not is_tiff(b"II")


@pytest.mark.parametrize("compression", ["none", "packbits", "lzw", "deflate"])
@pytest.mark.parametrize("mode,spp", [("L", 1), ("RGB", 3)])
def test_round_trip_single_strip(compression, mode, spp):
    rng = np.random.RandomState(7)
    for w, h in [(1, 1), (7, 5), (16, 16), (33, 9)]:
        img = rng.randint(0, 256, h * w * spp).astype(np.uint8).tobytes()
        data = encode_tiff(img, w, h, mode, compression)
        px, dw, dh, dmode = decode_tiff(data)
        assert (dw, dh, dmode) == (w, h, mode)
        assert px == img


@pytest.mark.parametrize("compression", ["none", "packbits", "lzw", "deflate"])
def test_round_trip_multi_strip(compression):
    rng = np.random.RandomState(11)
    w, h = 13, 22
    img = rng.randint(0, 256, h * w * 3).astype(np.uint8).tobytes()
    data = encode_tiff(img, w, h, "RGB", compression, rows_per_strip=5)
    px, dw, dh, mode = decode_tiff(data)
    assert (dw, dh, mode) == (w, h, "RGB")
    assert px == img


def test_lzw_round_trip_torture():
    """Runs, cScSc patterns, and enough symbols to force width bumps
    past 9/10/11 bits and a table reset."""
    rng = np.random.RandomState(3)
    cases = [
        b"",
        b"\x00" * 5000,
        bytes(range(256)) * 30,
        rng.randint(0, 4, 20000).astype(np.uint8).tobytes(),  # runs
        rng.randint(0, 256, 20000).astype(np.uint8).tobytes(),  # noise
        (b"ab" * 3 + b"a") * 500,  # cScSc
    ]
    for src in cases:
        assert _lzw_decode(_lzw_encode(src), len(src)) == src


def test_packbits_round_trip_and_spec_example():
    rng = np.random.RandomState(5)
    for src in [
        b"",
        b"\xaa" * 300,
        bytes(range(200)),
        rng.randint(0, 3, 1000).astype(np.uint8).tobytes(),
    ]:
        assert _unpackbits(_packbits(src), len(src)) == src
    # hand-checked wire case: FE (=3x repeat) AA, then 3-byte literal
    assert (
        _unpackbits(b"\xfe\xaa\x02\x80\x00\x2a", 6) == b"\xaa\xaa\xaa\x80\x00\x2a"
    )
    # 128 is a no-op byte
    assert _unpackbits(b"\x80\x00\x41", 1) == b"\x41"


def test_big_endian_and_white_is_zero():
    """Hand-built big-endian (MM) grayscale TIFF with photometric 0
    (WhiteIsZero) — values must invert."""
    w, h = 4, 2
    img = bytes(range(8))
    ifd_off = 8
    n_tags = 8
    data_off = ifd_off + 2 + 12 * n_tags + 4
    out = bytearray()
    out += b"MM\x00*" + struct.pack(">I", ifd_off)
    out += struct.pack(">H", n_tags)
    for tag, typ, count, value in [
        (256, 4, 1, w),
        (257, 4, 1, h),
        (258, 3, 1, 8 << 16),  # SHORT packs into the HIGH bytes on MM
        (259, 3, 1, 1 << 16),
        (262, 3, 1, 0),  # WhiteIsZero
        (273, 4, 1, data_off),
        (278, 4, 1, h),
        (279, 4, 1, len(img)),
    ]:
        out += struct.pack(">HHII", tag, typ, count, value)
    out += struct.pack(">I", 0)
    out += img
    px, dw, dh, mode = decode_tiff(bytes(out))
    assert (dw, dh, mode) == (w, h, "L")
    assert px == bytes(255 - v for v in img)


def test_palette_tiff_expands_to_rgb():
    w, h = 3, 2
    idx = bytes([0, 1, 2, 2, 1, 0])
    ifd_off = 8
    n_tags = 9
    cmap_off = ifd_off + 2 + 12 * n_tags + 4
    data_off = cmap_off + 3 * 256 * 2
    cmap = [0] * (3 * 256)
    # entries are 16-bit; decoder divides by 257
    for i, (r, g, b) in enumerate([(255, 0, 0), (0, 255, 0), (0, 0, 255)]):
        cmap[i] = r * 257
        cmap[256 + i] = g * 257
        cmap[512 + i] = b * 257
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
    assert (dw, dh, mode) == (w, h, "RGB")
    assert px == bytes(
        [255, 0, 0, 0, 255, 0, 0, 0, 255, 0, 0, 255, 0, 255, 0, 255, 0, 0]
    )


def test_bilevel_tiff():
    """1-bit bilevel, BlackIsZero: packed rows -> 0/255 bytes."""
    w, h = 10, 2
    # row 0: 1010101010..., row 1: all ones
    rows = np.zeros((h, w), np.uint8)
    rows[0, ::2] = 1
    rows[1, :] = 1
    packed = np.packbits(rows, axis=1).tobytes()
    ifd_off = 8
    n_tags = 8
    data_off = ifd_off + 2 + 12 * n_tags + 4
    out = bytearray()
    out += b"II*\x00" + struct.pack("<I", ifd_off)
    out += struct.pack("<H", n_tags)
    for tag, typ, count, value in [
        (256, 4, 1, w),
        (257, 4, 1, h),
        (258, 3, 1, 1),
        (259, 3, 1, 1),
        (262, 3, 1, 1),  # BlackIsZero
        (273, 4, 1, data_off),
        (278, 4, 1, h),
        (279, 4, 1, len(packed)),
    ]:
        out += struct.pack("<HHII", tag, typ, count, value)
    out += struct.pack("<I", 0)
    out += packed
    px, dw, dh, mode = decode_tiff(bytes(out))
    assert (dw, dh, mode) == (w, h, "L")
    assert px == (rows * 255).tobytes()


def test_lzw_predictor2():
    """LZW + horizontal differencing (predictor 2): encode the deltas
    by hand, tag predictor=2, expect the original back."""
    w, h, spp = 6, 3, 3
    rng = np.random.RandomState(9)
    img = rng.randint(0, 256, (h, w, spp)).astype(np.uint8)
    deltas = img.copy()
    deltas[:, 1:, :] = img[:, 1:, :] - img[:, :-1, :]
    comp = _lzw_encode(deltas.tobytes())
    ifd_off = 8
    n_tags = 10
    bits_off = ifd_off + 2 + 12 * n_tags + 4
    data_off = bits_off + 6
    out = bytearray()
    out += b"II*\x00" + struct.pack("<I", ifd_off)
    out += struct.pack("<H", n_tags)
    for tag, typ, count, value in [
        (256, 4, 1, w),
        (257, 4, 1, h),
        (258, 3, 3, bits_off),
        (259, 3, 1, 5),  # LZW
        (262, 3, 1, 2),  # RGB
        (273, 4, 1, data_off),
        (277, 3, 1, 3),
        (278, 4, 1, h),
        (279, 4, 1, len(comp)),
        (317, 3, 1, 2),  # predictor 2
    ]:
        out += struct.pack("<HHII", tag, typ, count, value)
    out += struct.pack("<I", 0)
    out += struct.pack("<HHH", 8, 8, 8)
    out += comp
    px, dw, dh, mode = decode_tiff(bytes(out))
    assert (dw, dh, mode) == (w, h, "RGB")
    assert px == img.tobytes()


def test_metadata_tags_are_skipped_not_fatal():
    """Real-world TIFFs carry ASCII (Software) and RATIONAL
    (XResolution) tags; the decoder must skip them, not DISCARD the
    image (r7 review finding)."""
    img = bytes(range(12))
    w, h = 2, 2
    ifd_off = 8
    n_tags = 10
    sw_off = ifd_off + 2 + 12 * n_tags + 4
    res_off = sw_off + 8
    data_off = res_off + 8
    out = bytearray()
    out += b"II*\x00" + struct.pack("<I", ifd_off)
    out += struct.pack("<H", n_tags)
    for tag, typ, count, value in [
        (256, 4, 1, w),
        (257, 4, 1, h),
        (258, 3, 1, 8),
        (259, 3, 1, 1),
        (262, 3, 1, 2),
        (273, 4, 1, data_off),
        (277, 3, 1, 3),
        (279, 4, 1, len(img)),
        (282, 5, 1, res_off),  # XResolution, RATIONAL
        (305, 2, 8, sw_off),  # Software, ASCII
    ]:
        out += struct.pack("<HHII", tag, typ, count, value)
    out += struct.pack("<I", 0)
    out += b"spark!!\x00"  # software string
    out += struct.pack("<II", 72, 1)  # 72/1 dpi rational
    out += img
    px, dw, dh, mode = decode_tiff(bytes(out))
    assert (dw, dh, mode) == (w, h, "RGB")
    assert px == img


def test_corrupt_and_unsupported_raise():
    img = bytes(range(12))
    good = encode_tiff(img, 2, 2, "RGB", "none")
    with pytest.raises(ValueError):
        decode_tiff(good[:10])  # truncated IFD
    with pytest.raises(ValueError):
        decode_tiff(b"II*\x00" + struct.pack("<I", 99999))  # IFD beyond EOF
    # strip beyond EOF
    with pytest.raises(ValueError):
        decode_tiff(good[:-4])
    # unsupported compression (JPEG-in-TIFF = 7)
    bad = bytearray(good)
    pos = 8 + 2
    for t in range(9):
        tag = struct.unpack_from("<H", bad, pos + 12 * t)[0]
        if tag == 259:
            struct.pack_into("<I", bad, pos + 12 * t + 8, 7)
    with pytest.raises(ValueError):
        decode_tiff(bytes(bad))
    # tiled layout rejected
    tiled = bytearray(good)
    struct.pack_into("<H", tiled, pos, 322)  # overwrite a tag id
    # (tag 322 present -> tiled)
    with pytest.raises(ValueError):
        decode_tiff(bytes(tiled))


def test_loader_dispatches_tiff(tmp_path):
    """The no-PIL image loader real-decodes .tif files end to end."""
    from tensorflow_recorder_spark.operators import image as image_op

    if image_op.HAVE_PIL:  # pragma: no cover
        pytest.skip("PIL present: PIL loader handles TIFF")
    img = np.arange(48, dtype=np.uint8).tobytes()
    p = tmp_path / "x.tif"
    p.write_bytes(encode_tiff(img, 4, 4, "RGB", "lzw"))
    pixels, w, h, mode = image_op.DEFAULT_LOADER(str(p))
    assert (w, h, mode) == (4, 4, "RGB")
    assert pixels == img
