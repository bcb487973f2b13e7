"""BMP + GIF codec tests (T3 no-PIL format envelope, round 5).

The repo's writers are the fixture builders (no PIL in this runtime);
the GIF decoder is additionally exercised against a REAL compressing
LZW encoder written here, so dictionary growth, the code==next-entry
edge (cScSc pattern), and width bumps are all pinned — the repo's own
fixture writer emits only literal codes.
"""

import struct

import numpy as np
import pytest

from tensorflow_recorder_spark.functions.bmp_codec import (
    decode_bmp,
    encode_bmp,
    is_bmp,
)
from tensorflow_recorder_spark.functions.gif_codec import (
    decode_gif,
    encode_gif,
    is_gif,
)


# ------------------------------------------------------------------------- BMP


def test_bmp_rgb_round_trip():
    rng = np.random.RandomState(1)
    for w, h in [(7, 5), (16, 16), (33, 9), (1, 1)]:
        img = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
        px, dw, dh, mode = decode_bmp(encode_bmp(img.tobytes(), w, h))
        assert (dw, dh, mode) == (w, h, "RGB")
        assert px == img.tobytes()


def test_bmp_grayscale_input_expands():
    img = np.arange(35, dtype=np.uint8).reshape(5, 7)
    px, *_ = decode_bmp(encode_bmp(img.tobytes(), 7, 5, "L"))
    assert px == np.repeat(img[..., None], 3, 2).tobytes()


def test_bmp_palettized_8bpp():
    """Hand-built 8 bpp palettized BMP (bottom-up): palette lookup and
    BGRx->RGB order."""
    pal = [(i, 255 - i, (i * 7) % 256) for i in range(4)]
    idx = np.array([[0, 1, 2], [3, 2, 1]], np.uint8)  # 3x2
    h, w = idx.shape
    stride = ((w + 3) // 4) * 4
    rows = np.zeros((h, stride), np.uint8)
    rows[:, :w] = idx
    body = rows[::-1].tobytes()
    pix_off = 14 + 40 + 4 * 4
    hdr = b"BM" + struct.pack("<IHHI", pix_off + len(body), 0, 0, pix_off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0, len(body), 0, 0, 4, 0)
    paldata = b"".join(bytes([b, g, r, 0]) for r, g, b in pal)
    px, dw, dh, mode = decode_bmp(hdr + dib + paldata + body)
    assert (dw, dh, mode) == (w, h, "RGB")
    want = np.array(pal, np.uint8)[idx]
    assert px == want.tobytes()


def test_bmp_top_down_and_32bpp():
    """Negative height = top-down; 32 bpp BGRA drops alpha."""
    img = np.arange(2 * 2 * 4, dtype=np.uint8).reshape(2, 2, 4)
    body = img[:, :, :].copy()
    pix_off = 14 + 40
    hdr = b"BM" + struct.pack("<IHHI", pix_off + body.size, 0, 0, pix_off)
    dib = struct.pack("<IiiHHIIiiII", 40, 2, -2, 1, 32, 0, body.size, 0, 0, 0, 0)
    px, dw, dh, mode = decode_bmp(hdr + dib + body.tobytes())
    want = img[:, :, [2, 1, 0]]  # BGRA -> RGB, rows in file order
    assert px == np.ascontiguousarray(want).tobytes()


def test_bmp_rejects_rle_and_garbage():
    img = np.zeros((4, 4, 3), np.uint8)
    bmp = bytearray(encode_bmp(img.tobytes(), 4, 4))
    struct.pack_into("<I", bmp, 30, 1)  # BI_RLE8
    with pytest.raises(ValueError, match="compression"):
        decode_bmp(bytes(bmp))
    with pytest.raises(ValueError):
        decode_bmp(b"BM" + b"\x00" * 10)
    assert not is_bmp(b"PNG")


# ------------------------------------------------------------------------- GIF


def test_gif_round_trip_palettes_and_interlace():
    rng = np.random.RandomState(2)
    for w, h in [(7, 5), (33, 9), (64, 48), (1, 1)]:
        for npal in (2, 16, 256):
            for inter in (False, True):
                pal = [tuple(int(x) for x in rng.randint(0, 256, 3)) for _ in range(npal)]
                idx = rng.randint(0, npal, (h, w)).astype(np.uint8)
                gif = encode_gif(idx.tobytes(), pal, w, h, interlace=inter)
                assert is_gif(gif)
                px, dw, dh, mode = decode_gif(gif)
                assert (dw, dh, mode) == (w, h, "RGB")
                assert px == np.array(pal, np.uint8)[idx].tobytes()


def _lzw_compress(indices: bytes, min_code: int) -> bytes:
    """A REAL GIF LZW compressor (dictionary growth + width bumps),
    used only to build adversarial fixtures for the decoder."""
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    out = bytearray()
    acc = nacc = 0
    width = min_code + 1

    def put(code):
        nonlocal acc, nacc
        acc |= code << nacc
        nacc += width
        while nacc >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    put(clear)
    prefix = b""
    for b in indices:
        cand = prefix + bytes([b])
        if cand in table:
            prefix = cand
            continue
        put(table[prefix])
        table[cand] = next_code
        next_code += 1
        if next_code - 1 >= (1 << width) and width < 12:
            width += 1
        if next_code == 4096:
            put(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code + 1
        prefix = bytes([b])
    if prefix:
        put(table[prefix])
    put(eoi)
    if nacc:
        out.append(acc & 0xFF)
    return bytes(out)


def _wrap_gif(lzw: bytes, pal, idx, w, h, min_code) -> bytes:
    n = max(1, (len(pal) - 1).bit_length())
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | (n - 1), 0, 0])
    for i in range(1 << n):
        out += bytes(pal[i] if i < len(pal) else (0, 0, 0))
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
    out += bytes([min_code])
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    return bytes(out + b"\x00\x3b")


def test_gif_decodes_really_compressed_lzw():
    """Repetitive data drives the dictionary deep (multi-symbol entries,
    width bumps, the KwKwK self-reference edge)."""
    rng = np.random.RandomState(3)
    pal = [(i, i, 255 - i) for i in range(8)]
    w, h = 60, 40
    base = np.tile(np.arange(6, dtype=np.uint8), w * h // 6 + 1)[: w * h]
    noisy = base.copy()
    noisy[rng.randint(0, w * h, 100)] = rng.randint(0, 8, 100).astype(np.uint8)
    for idx in (base, noisy, np.zeros(w * h, np.uint8)):
        lzw = _lzw_compress(idx.tobytes(), 3)
        gif = _wrap_gif(lzw, pal, idx, w, h, 3)
        px, dw, dh, mode = decode_gif(gif)
        assert (dw, dh, mode) == (w, h, "RGB")
        assert px == np.array(pal, np.uint8)[idx.reshape(h, w)].tobytes()


def test_gif_frame_offset_composites_on_background():
    """A frame smaller than the logical screen lands at its offset over
    the background color."""
    pal = [(10, 20, 30), (200, 100, 50)]
    inner = np.ones((2, 3), np.uint8)
    gif = bytearray(encode_gif(inner.tobytes(), pal, 3, 2))
    # widen logical screen to 5x4, move frame to (1, 1)
    struct.pack_into("<HH", gif, 6, 5, 4)
    pos = bytes(gif).find(b"\x2c")
    struct.pack_into("<HHHH", gif, pos + 1, 1, 1, 3, 2)
    px, dw, dh, _ = decode_gif(bytes(gif))
    got = np.frombuffer(px, np.uint8).reshape(4, 5, 3)
    want = np.zeros((4, 5, 3), np.uint8)
    want[:, :] = pal[0]  # background index 0
    want[1:3, 1:4] = pal[1]
    assert (got == want).all()


def test_gif_extension_blocks_skipped():
    """Graphic-control / comment extensions before the frame are walked
    over."""
    pal = [(0, 0, 0), (255, 255, 255)]
    idx = np.array([[1, 0], [0, 1]], np.uint8)
    gif = bytearray(encode_gif(idx.tobytes(), pal, 2, 2))
    pos = bytes(gif).find(b"\x2c")
    ext = b"\x21\xf9\x04\x00\x00\x00\x00\x00" + b"\x21\xfe\x05hello\x00"
    gif2 = bytes(gif[:pos]) + ext + bytes(gif[pos:])
    px, *_ = decode_gif(gif2)
    assert px == np.array(pal, np.uint8)[idx].tobytes()


def test_gif_corrupt_raises():
    with pytest.raises(ValueError, match="magic"):
        decode_gif(b"not a gif")
    pal = [(0, 0, 0), (1, 1, 1)]
    gif = bytearray(encode_gif(bytes(4), pal, 2, 2))
    with pytest.raises(ValueError):
        decode_gif(bytes(gif[:20]))  # truncated mid-frame


def test_stdlib_loader_decodes_gif_and_bmp(tmp_path):
    """The no-PIL loader real-decodes .gif/.bmp files end to end."""
    from tensorflow_recorder_spark.operators import image as image_op

    if image_op.HAVE_PIL:
        pytest.skip("PIL present; stdlib loader inactive")
    rng = np.random.RandomState(4)
    img = rng.randint(0, 256, (6, 9, 3)).astype(np.uint8)
    bmp_path = tmp_path / "x.bmp"
    bmp_path.write_bytes(encode_bmp(img.tobytes(), 9, 6))
    px, w, h, mode = image_op.DEFAULT_LOADER(str(bmp_path))
    assert (w, h, mode) == (9, 6, "RGB") and px == img.tobytes()

    pal = [(i * 16, 0, 255 - i * 16) for i in range(16)]
    idx = rng.randint(0, 16, (5, 8)).astype(np.uint8)
    gif_path = tmp_path / "x.gif"
    gif_path.write_bytes(encode_gif(idx.tobytes(), pal, 8, 5))
    px, w, h, mode = image_op.DEFAULT_LOADER(str(gif_path))
    assert (w, h, mode) == (8, 5, "RGB")
    assert px == np.array(pal, np.uint8)[idx].tobytes()


def test_gif_background_from_global_table_with_local_frame_palette():
    """Background pixels take bg_index from the GLOBAL color table even
    when the frame carries its own smaller local table — a spec-valid
    bg_index >= len(LCT) must neither raise nor be colored from the
    LCT (r5 review finding: the index-canvas compositing rejected this
    file as corrupt)."""
    gpal = [(9, 9, 9), (1, 1, 1), (2, 2, 2), (111, 222, 33)]
    lpal = [(200, 10, 30), (40, 250, 60)]
    idx = np.ones((2, 3), np.uint8)
    gif = bytearray(encode_gif(idx.tobytes(), gpal, 3, 2))
    gif[11] = 3  # bg_index: valid in the 4-entry GCT, out of LCT range
    struct.pack_into("<HH", gif, 6, 5, 4)  # widen screen to 5x4
    pos = bytes(gif).find(b"\x2c")
    struct.pack_into("<HHHH", gif, pos + 1, 1, 1, 3, 2)  # frame at (1,1)
    assert gif[pos + 9] == 0x00
    gif[pos + 9] = 0x80  # LCT flag, size bits 0 -> 2 entries
    lct = b"".join(bytes(c) for c in lpal)
    gif2 = bytes(gif[: pos + 10]) + lct + bytes(gif[pos + 10 :])
    px, dw, dh, mode = decode_gif(gif2)
    assert (dw, dh, mode) == (5, 4, "RGB")
    got = np.frombuffer(px, np.uint8).reshape(4, 5, 3)
    want = np.zeros((4, 5, 3), np.uint8)
    want[:, :] = gpal[3]
    want[1:3, 1:4] = lpal[1]
    assert (got == want).all()


def test_gif_local_color_table_overrides_global():
    """A frame with its own local color table must decode through the
    LCT, not the global one."""
    wrong = [(1, 2, 3), (4, 5, 6)]
    right = [(200, 10, 30), (40, 250, 60)]
    idx = np.array([[0, 1], [1, 0]], np.uint8)
    gif = bytearray(encode_gif(idx.tobytes(), wrong, 2, 2))
    pos = bytes(gif).find(b"\x2c")
    # set the local-color-table flag (size bits 0 -> 2 entries) on the
    # image descriptor and splice the LCT right after it
    assert gif[pos + 9] == 0x00
    gif[pos + 9] = 0x80  # LCT flag, size 0 -> 2 entries
    lct = b"".join(bytes(c) for c in right)
    gif2 = bytes(gif[: pos + 10]) + lct + bytes(gif[pos + 10 :])
    px, w, h, mode = decode_gif(gif2)
    assert (w, h, mode) == (2, 2, "RGB")
    assert px == np.array(right, np.uint8)[idx].tobytes()
