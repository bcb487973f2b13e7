"""VP8L (lossless WebP) codec: round-trips across the encoder's
surface (simple/full prefix codes, subtract-green, color cache, LZ77),
hand-built bitstreams for decoder-only paths (palette packing,
predictor modes), and container/corruption handling."""

import struct

import numpy as np
import pytest

from tensorflow_recorder_spark.functions.vp8l_codec import (
    BitWriter,
    _CODE_TO_PLANE,
    _PLANE_TO_CODE,
    decode_webp,
    encode_vp8l,
    is_webp,
)


def rng_pixels(seed, w, h, nch=3):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, (h, w, nch)).astype(np.uint8).tobytes()


# ------------------------------------------------------------------
# encoder round-trips
# ------------------------------------------------------------------


@pytest.mark.parametrize("seed,w,h", [(0, 5, 4), (1, 16, 9), (2, 1, 1), (3, 31, 2)])
def test_roundtrip_full_codes(seed, w, h):
    px = rng_pixels(seed, w, h)
    data = encode_vp8l(px, w, h)
    assert is_webp(data)
    out, dw, dh, mode = decode_webp(data)
    assert (dw, dh, mode) == (w, h, "RGB")
    assert out == px


def test_roundtrip_two_value_image_uses_simple_codes():
    # every channel has <= 2 distinct values -> simple prefix codes
    px = bytes([10, 200, 30, 90, 200, 30] * 8)  # 16 px of 2 colors
    data = encode_vp8l(px, 4, 4)
    out, w, h, mode = decode_webp(data)
    assert (w, h, mode) == (4, 4, "RGB") and out == px


def test_roundtrip_single_color_image():
    px = bytes([7, 7, 7]) * 12
    data = encode_vp8l(px, 4, 3)
    out, *_ = decode_webp(data)
    assert out == px


@pytest.mark.parametrize("seed", [4, 5])
def test_roundtrip_subtract_green(seed):
    px = rng_pixels(seed, 9, 7)
    data = encode_vp8l(px, 9, 7, subtract_green=True)
    out, w, h, _ = decode_webp(data)
    assert (w, h) == (9, 7) and out == px


def test_roundtrip_color_cache():
    # few distinct colors repeated non-consecutively -> cache hits
    colors = [(1, 2, 3), (200, 100, 50), (9, 9, 9)]
    seq = [colors[i % 3] for i in range(30)]
    px = bytes(v for c in seq for v in c)
    data = encode_vp8l(px, 6, 5, cache_bits=4)
    out, *_ = decode_webp(data)
    assert out == px


def test_roundtrip_lz77_runs():
    # long constant runs -> backward references (direct distance)
    row = [(50, 60, 70)] * 12 + [(1, 2, 3)] * 4
    px = bytes(v for c in row * 3 for v in c)
    data = encode_vp8l(px, 16, 3, lz77=True)
    out, *_ = decode_webp(data)
    assert out == px
    # LZ77 + cache + subtract-green together
    data2 = encode_vp8l(px, 16, 3, lz77=True, cache_bits=3, subtract_green=True)
    out2, *_ = decode_webp(data2)
    assert out2 == px


def test_roundtrip_rgba_alpha():
    rng = np.random.RandomState(9)
    px = rng.randint(0, 256, (4, 6, 4)).astype(np.uint8)
    px[..., 3] = np.where(px[..., 3] > 128, 255, 17)  # real alpha variety
    data = encode_vp8l(px.tobytes(), 6, 4, mode="RGBA")
    out, w, h, mode = decode_webp(data)
    assert (w, h, mode) == (6, 4, "RGBA")
    assert out == px.tobytes()


def test_opaque_rgba_decodes_as_rgb():
    px = np.full((3, 3, 4), 77, np.uint8)
    px[..., 3] = 255
    data = encode_vp8l(px.tobytes(), 3, 3, mode="RGBA")
    out, w, h, mode = decode_webp(data)
    assert mode == "RGB"
    assert out == px[..., :3].tobytes()


# ------------------------------------------------------------------
# decoder-only paths via hand-built streams
# ------------------------------------------------------------------


def _wrap_riff(body: bytes) -> bytes:
    chunk = b"VP8L" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def _header(bwr, w, h):
    bwr.write(0x2F, 8)
    bwr.write(w - 1, 14)
    bwr.write(h - 1, 14)
    bwr.write(0, 1)  # alpha hint
    bwr.write(0, 3)  # version


def _simple_code(bwr, symbols):
    """Emit a simple prefix code for 1 or 2 symbols."""
    bwr.write(1, 1)
    bwr.write(len(symbols) - 1, 1)
    s0 = symbols[0]
    if s0 < 2:
        bwr.write(0, 1)
        bwr.write(s0, 1)
    else:
        bwr.write(1, 1)
        bwr.write(s0, 8)
    if len(symbols) == 2:
        bwr.write(symbols[1], 8)


def _literal_codes(bwr, green_syms, red, blue, alpha):
    _simple_code(bwr, green_syms)
    _simple_code(bwr, [red] if isinstance(red, int) else red)
    _simple_code(bwr, [blue] if isinstance(blue, int) else blue)
    _simple_code(bwr, [alpha] if isinstance(alpha, int) else alpha)
    _simple_code(bwr, [0])  # distance unused


def test_decoder_color_indexing_packs_subbyte_pixels():
    """2-entry palette -> 8 packed 1-bit indices per coded pixel."""
    w, h = 10, 2
    bwr = BitWriter()
    _header(bwr, w, h)
    bwr.write(1, 1)  # transform present
    bwr.write(3, 2)  # color indexing
    bwr.write(1, 8)  # palette size - 1 = 1 -> 2 entries
    # palette image: 2 pixels, delta-coded. First (255,10,20,30),
    # second delta (0,90,80,70) -> absolute (255,100,100,100).
    bwr.write(0, 1)  # palette img: no color cache
    # greens: two symbols 20 and 80; red 10/90; blue 30/70; alpha 255/0
    _simple_code(bwr, [20, 80])
    _simple_code(bwr, [10, 90])
    _simple_code(bwr, [30, 70])
    _simple_code(bwr, [255, 0])
    _simple_code(bwr, [0])
    # two literal pixels: per channel a 2-symbol code with CANONICAL
    # assignment (code 0 -> smaller symbol VALUE, not first-written)
    for bit in (0, 0, 0, 1):  # entry0 (g=20,r=10,b=30,a=255): 255>0 -> 1
        bwr.write(bit, 1)
    for bit in (1, 1, 1, 0):  # entry1 deltas (g=80,r=90,b=70,a=0)
        bwr.write(bit, 1)
    bwr.write(0, 1)  # no more transforms
    # main image: coded width = ceil(10/8) = 2, h = 2 -> 4 packed px
    bwr.write(0, 1)  # no color cache
    bwr.write(0, 1)  # no meta codes
    # greens carry packed indices: rows alternate 0b0101.. / 0b1111..
    _literal_codes(bwr, [0b01010101, 0b11111111], 0, 0, 255)
    # 4 coded pixels: row0: (01010101, xxxx) row1: (11111111, ...)
    for g_bit in (0, 0, 1, 1):
        bwr.write(g_bit, 1)  # green choice
        # red/blue/alpha are single-symbol codes: zero bits
    data = _wrap_riff(bwr.getvalue())
    out, dw, dh, mode = decode_webp(data)
    assert (dw, dh, mode) == (10, 2, "RGB")
    px = np.frombuffer(out, np.uint8).reshape(2, 10, 3)
    c0, c1 = (10, 20, 30), (100, 100, 100)  # entry1 = entry0 + delta
    # row 0: indices 1,0,1,0,1,0,1,0,(1,0 from second packed byte)
    want0 = [c1 if i % 2 == 0 else c0 for i in range(8)] + [c1, c0]
    assert [tuple(p) for p in px[0]] == want0
    assert all(tuple(p) == c1 for p in px[1])


def test_decoder_predictor_left_mode():
    """Predictor transform, all blocks mode 1 (Left): residuals
    accumulate along each row."""
    w, h = 4, 2
    bwr = BitWriter()
    _header(bwr, w, h)
    bwr.write(1, 1)  # transform
    bwr.write(0, 2)  # predictor
    bwr.write(2, 3)  # size_bits = 4 -> one 16x16 block
    # predictor sub-image: 1 pixel, mode in GREEN channel
    bwr.write(0, 1)  # no cache
    _literal_codes(bwr, [1], 0, 0, 255)  # mode 1 = Left
    # one literal pixel, all codes single-symbol -> zero bits
    bwr.write(0, 1)  # no more transforms
    # main image: 8 residual pixels
    bwr.write(0, 1)  # no cache
    bwr.write(0, 1)  # no meta
    # residuals: first pixel (a=+255? NOTE (0,0) predicts opaque black)
    # choose residuals so the output is easy: greens from {10, 3},
    # red/blue 0, alpha 0 (alpha accumulates from 0xff black / left)
    _literal_codes(bwr, [10, 3], 0, 0, 0)
    # canonical 2-symbol code: 0 -> green 3, 1 -> green 10
    for g_bit in (1, 0, 0, 0, 1, 0, 0, 0):
        bwr.write(g_bit, 1)
    data = _wrap_riff(bwr.getvalue())
    out, dw, dh, mode = decode_webp(data)
    assert (dw, dh, mode) == (4, 2, "RGB")
    px = np.frombuffer(out, np.uint8).reshape(2, 4, 3)
    # row0: greens 10, 13, 16, 19 (left-accumulating)
    assert [int(p[1]) for p in px[0]] == [10, 13, 16, 19]
    # row1: x=0 predicts Top (green 10) + residual 10 = 20, then Left
    assert [int(p[1]) for p in px[1]] == [20, 23, 26, 29]


# ------------------------------------------------------------------
# container + robustness
# ------------------------------------------------------------------


def test_distance_map_tables_consistent():
    codes = [c for c in _PLANE_TO_CODE if c != 255]
    assert sorted(codes) == list(range(120))
    # canonical first entries: code1 = directly above, code2 = left
    assert _CODE_TO_PLANE[0] == 24  # (dx=0, dy=1)
    assert _CODE_TO_PLANE[1] == 7  # (dx=1, dy=0)


def test_lossy_webp_decodes_for_real():
    """r8: the lossy VP8 arm is a real decoder now — a valid key frame
    decodes with true dims, and a GARBAGE 'VP8 ' chunk is corruption
    (ValueError -> DISCARD), no longer a capability gap."""
    from tensorflow_recorder_spark.functions.vp8_codec import encode_webp_vp8

    px = rng_pixels(3, 6, 4)
    out, w, h, mode = decode_webp(encode_webp_vp8(px, 6, 4, qi=4))
    assert (w, h, mode) == (6, 4, "RGB") and len(out) == 72

    body = b"\x00" * 10
    chunk = b"VP8 " + struct.pack("<I", len(body)) + body
    riff = b"WEBP" + chunk
    data = b"RIFF" + struct.pack("<I", len(riff)) + riff
    with pytest.raises(ValueError):
        decode_webp(data)


def test_lossy_dispatch_is_typed_not_message_keyed():
    """r8 verdict item 5: the VP8L->VP8 route must key on the exception
    CLASS (LossyWebPError), not a message substring — a plain
    NotImplementedError whose message happens to contain 'lossy' must
    still propagate (it is a genuine capability gap, not a dispatch)."""
    from tensorflow_recorder_spark.functions.vp8l_codec import (
        LossyWebPError,
        _find_vp8l_chunk,
    )

    body = b"\x00" * 10
    chunk = b"VP8 " + struct.pack("<I", len(body)) + body
    riff = b"WEBP" + chunk
    data = b"RIFF" + struct.pack("<I", len(riff)) + riff
    with pytest.raises(LossyWebPError):
        _find_vp8l_chunk(data)
    assert issubclass(LossyWebPError, NotImplementedError)

    # an animated/extended container raises the BASE class -> no VP8
    # dispatch, stays a capability signal for the loader's fallback
    vp8x = b"VP8X" + struct.pack("<I", 10) + b"\x00" * 10
    riff2 = b"WEBP" + vp8x
    data2 = b"RIFF" + struct.pack("<I", len(riff2)) + riff2
    with pytest.raises(NotImplementedError) as ei:
        _find_vp8l_chunk(data2)
    assert not isinstance(ei.value, LossyWebPError)


def test_corrupt_webp_raises_value_error():
    with pytest.raises(ValueError):
        decode_webp(b"RIFF\x00\x00\x00\x00WEBPnope")
    px = rng_pixels(7, 4, 4)
    data = bytearray(encode_vp8l(px, 4, 4))
    with pytest.raises(ValueError):
        decode_webp(bytes(data[:24]))  # truncated bitstream
    assert not is_webp(b"not a webp at all")


def test_vp8x_container_with_vp8l_chunk():
    """Extended container: VP8X chunk first, VP8L after."""
    px = rng_pixels(8, 3, 3)
    plain = encode_vp8l(px, 3, 3)
    vp8l_chunk = plain[12:]  # VP8L chunk incl. header
    vp8x = b"VP8X" + struct.pack("<I", 10) + b"\x00" * 10
    riff = b"WEBP" + vp8x + vp8l_chunk
    data = b"RIFF" + struct.pack("<I", len(riff)) + riff
    out, w, h, _ = decode_webp(data)
    assert (w, h) == (3, 3) and out == px


def test_stdlib_loader_decodes_lossless_webp(tmp_path):
    from tensorflow_recorder_spark.operators import image as image_op

    if image_op.HAVE_PIL:
        pytest.skip("PIL present; stdlib loader inactive")
    px = rng_pixels(11, 7, 5)
    p = tmp_path / "x.webp"
    p.write_bytes(encode_vp8l(px, 7, 5, subtract_green=True, cache_bits=3))
    out, w, h, mode = image_op.DEFAULT_LOADER(str(p))
    assert (w, h, mode) == (7, 5, "RGB") and out == px

    # lossy VP8 decodes for REAL (r8): true dims, not the synthetic 4x4
    from tensorflow_recorder_spark.functions.vp8_codec import encode_webp_vp8

    lossy = tmp_path / "lossy.webp"
    lossy.write_bytes(encode_webp_vp8(px, 7, 5, qi=4))
    out, w, h, mode = image_op.DEFAULT_LOADER(str(lossy))
    assert (w, h, mode) == (7, 5, "RGB") and len(out) == 105

    # garbage lossy chunk is corruption -> ValueError (DISCARD route)
    body = b"\x00" * 10
    chunk = b"VP8 " + struct.pack("<I", len(body)) + body
    riff = b"WEBP" + chunk
    bad_lossy = tmp_path / "bad_lossy.webp"
    bad_lossy.write_bytes(b"RIFF" + struct.pack("<I", len(riff)) + riff)
    with pytest.raises(ValueError):
        image_op.DEFAULT_LOADER(str(bad_lossy))

    # corrupt lossless -> ValueError (DISCARD route)
    bad = tmp_path / "bad.webp"
    bad.write_bytes(p.read_bytes()[:24])
    with pytest.raises(ValueError):
        image_op.DEFAULT_LOADER(str(bad))


def test_imageless_container_falls_back_not_discarded(tmp_path):
    """r9 revision of the r5 contract: animated/extended containers now
    DECODE their first image stream, so the capability-gap route
    (NotImplementedError -> synthetic fallback) applies only to a
    well-formed container with NO image chunk anywhere; an ANMF frame
    that carries no image stream is CORRUPT (ValueError -> DISCARD)."""
    from tensorflow_recorder_spark.operators import image as image_op

    chunks = b"VP8X" + struct.pack("<I", 10) + b"\x00" * 10
    riff = b"WEBP" + chunks
    data = b"RIFF" + struct.pack("<I", len(riff)) + riff
    with pytest.raises(NotImplementedError):
        decode_webp(data)
    if not image_op.HAVE_PIL:
        p = tmp_path / "noimg.webp"
        p.write_bytes(data)
        out, w, h, mode = image_op.DEFAULT_LOADER(str(p))
        assert (w, h, mode) == (4, 4, "RGB")  # synthetic fallback

    # an ANMF with only its 16-byte descriptor (no image sub-chunk)
    # is corruption under the r9 walk
    anmf_body = b"\x00" * 16
    chunks2 = (
        b"VP8X" + struct.pack("<I", 10) + b"\x00" * 10
        + b"ANMF" + struct.pack("<I", len(anmf_body)) + anmf_body
    )
    riff2 = b"WEBP" + chunks2
    with pytest.raises(ValueError):
        decode_webp(b"RIFF" + struct.pack("<I", len(riff2)) + riff2)

    # malformed container (chunk past EOF) stays corrupt -> ValueError
    bad = b"RIFF" + struct.pack("<I", 20) + b"WEBP" + b"VP8X" + struct.pack("<I", 999) + b"\x00"
    with pytest.raises(ValueError):
        decode_webp(bad)


def test_encoder_rejects_oversized_dimensions():
    with pytest.raises(ValueError, match="16384"):
        encode_vp8l(b"\x00" * (20000 * 3), 20000, 1)


def _chunk_of(container: bytes, want: bytes) -> bytes:
    """Extract a chunk body from a full WebP container."""
    pos = 12
    while pos + 8 <= len(container):
        tag = container[pos : pos + 4]
        (size,) = struct.unpack_from("<I", container, pos + 4)
        if tag == want:
            return container[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)
    raise AssertionError(f"no {want!r} chunk in fixture")


def _riff(chunks: list[tuple[bytes, bytes]]) -> bytes:
    body = b"WEBP"
    for tag, payload in chunks:
        body += tag + struct.pack("<I", len(payload)) + payload
        if len(payload) & 1:
            body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _vp8x(w: int, h: int, animated: bool) -> tuple[bytes, bytes]:
    flags = 0x02 if animated else 0x00
    return (
        b"VP8X",
        bytes([flags, 0, 0, 0])
        + struct.pack("<I", w - 1)[:3]
        + struct.pack("<I", h - 1)[:3],
    )


def _anmf(frame_chunks: list[tuple[bytes, bytes]], w: int, h: int) -> bytes:
    hdr = (
        b"\x00\x00\x00"  # x
        b"\x00\x00\x00"  # y
        + struct.pack("<I", w - 1)[:3]
        + struct.pack("<I", h - 1)[:3]
        + b"\x64\x00\x00"  # duration 100ms
        + b"\x00"  # flags
    )
    body = hdr
    for tag, payload in frame_chunks:
        body += tag + struct.pack("<I", len(payload)) + payload
        if len(payload) & 1:
            body += b"\x00"
    return body


def test_vp8x_extended_still_decodes_first_stream():
    """r9: a VP8X container whose image stream sits behind metadata
    chunks decodes for real (previously NotImplementedError ->
    synthetic)."""
    px = rng_pixels(21, 6, 5)
    body = _chunk_of(encode_vp8l(px, 6, 5), b"VP8L")
    data = _riff([_vp8x(6, 5, False), (b"EXIF", b"\x00" * 7), (b"VP8L", body)])
    out, w, h, mode = decode_webp(data)
    assert (w, h, mode) == (6, 5, "RGB") and out == px


def test_animated_webp_decodes_first_frame_lossless():
    px1 = rng_pixels(22, 8, 4)
    px2 = rng_pixels(23, 8, 4)
    b1 = _chunk_of(encode_vp8l(px1, 8, 4), b"VP8L")
    b2 = _chunk_of(encode_vp8l(px2, 8, 4), b"VP8L")
    data = _riff(
        [
            _vp8x(8, 4, True),
            (b"ANIM", b"\x00" * 6),
            (b"ANMF", _anmf([(b"VP8L", b1)], 8, 4)),
            (b"ANMF", _anmf([(b"VP8L", b2)], 8, 4)),
        ]
    )
    out, w, h, mode = decode_webp(data)
    assert (w, h) == (8, 4) and out == px1  # FIRST frame, not second


def test_animated_webp_decodes_first_frame_lossy_nested():
    """The first frame's stream may be lossy VP8 nested inside ANMF —
    the walk must find it and route to the VP8 decoder. A raw
    unfiltered ALPH plane preceding it is APPLIED (r10 — previously
    silently dropped): mode flips to RGBA with the plane's exact
    bytes interleaved."""
    from tensorflow_recorder_spark.functions.vp8_codec import (
        decode_webp_vp8 as _,
        encode_webp_vp8,
    )

    px = rng_pixels(24, 16, 16)
    full = encode_webp_vp8(px, 16, 16, qi=4)
    body = _chunk_of(full, b"VP8 ")
    plane = bytes((i * 7) % 256 for i in range(16 * 16))
    data = _riff(
        [
            _vp8x(16, 16, True),
            (b"ANIM", b"\x00" * 6),
            (
                b"ANMF",
                _anmf([(b"ALPH", b"\x00" + plane), (b"VP8 ", body)], 16, 16),
            ),
        ]
    )
    out, w, h, mode = decode_webp(data)
    want, _, _, _ = decode_webp(full)
    assert (w, h, mode) == (16, 16, "RGBA")
    assert out[3::4] == plane  # alpha channel = the ALPH plane verbatim
    assert bytes(b for i, b in enumerate(out) if i % 4 != 3) == want


def test_lossy_alph_unsupported_variants_drop_alpha_documented():
    """Filtered (F!=0) or VP8L-compressed (C!=0) ALPH is a documented
    capability gap: the frame decodes as RGB with transparency
    discarded, never a crash or fabricated plane."""
    from tensorflow_recorder_spark.functions.vp8_codec import encode_webp_vp8

    px = rng_pixels(25, 16, 16)
    full = encode_webp_vp8(px, 16, 16, qi=4)
    body = _chunk_of(full, b"VP8 ")
    plane = bytes(256)
    for head in (0x01, 0x04):  # C=1 (compressed) / F=1 (filtered)
        data = _riff(
            [
                _vp8x(16, 16, False),
                (b"ALPH", bytes([head]) + plane),
                (b"VP8 ", body),
            ]
        )
        out, w, h, mode = decode_webp(data)
        assert (w, h, mode) == (16, 16, "RGB")


def test_lossy_alph_shorter_than_frame_is_corrupt():
    """A raw unfiltered ALPH that declares fewer plane bytes than the
    frame has pixels is CORRUPTION -> ValueError (DISCARD route)."""
    from tensorflow_recorder_spark.functions.vp8_codec import encode_webp_vp8

    px = rng_pixels(26, 16, 16)
    body = _chunk_of(encode_webp_vp8(px, 16, 16, qi=4), b"VP8 ")
    data = _riff(
        [
            _vp8x(16, 16, False),
            (b"ALPH", b"\x00\x01\x02"),  # 2 plane bytes for 256 pixels
            (b"VP8 ", body),
        ]
    )
    with pytest.raises(ValueError, match="ALPH"):
        decode_webp(data)


def test_vp8x_without_image_chunk_stays_capability_gap():
    data = _riff([_vp8x(4, 4, False), (b"EXIF", b"\x00" * 3)])
    with pytest.raises(NotImplementedError):
        decode_webp(data)
    # and an ANMF with no image stream inside is CORRUPT, not a gap
    bad = _riff(
        [
            _vp8x(4, 4, True),
            (b"ANIM", b"\x00" * 6),
            (b"ANMF", _anmf([(b"ALPH", b"\x00")], 4, 4)),
        ]
    )
    with pytest.raises(ValueError):
        decode_webp(bad)


def test_default_loader_decodes_animated_webp_first_frame(tmp_path):
    from tensorflow_recorder_spark.operators import image as image_op

    px = rng_pixels(25, 5, 7)
    body = _chunk_of(encode_vp8l(px, 5, 7), b"VP8L")
    data = _riff(
        [
            _vp8x(5, 7, True),
            (b"ANIM", b"\x00" * 6),
            (b"ANMF", _anmf([(b"VP8L", body)], 5, 7)),
        ]
    )
    p = tmp_path / "anim.webp"
    p.write_bytes(data)
    out, w, h, mode = image_op.DEFAULT_LOADER(str(p))
    assert (w, h, mode) == (5, 7, "RGB") and out == px
