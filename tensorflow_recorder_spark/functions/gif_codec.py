"""GIF (87a/89a) decoder + fixture encoder — pure stdlib, no PIL.

Part of the no-PIL T3 format envelope (the reference's PIL loader opens
GIFs, /root/reference/tfrecorder/beam_image.py:62-73). Decodes the
FIRST image frame: LZW with variable code width (LSB-first packing,
clear/EOI codes, 12-bit cap), optional local color table, and Adam-less
GIF 4-pass row interlacing; the frame is composited onto the logical
screen (background-color fill) and expanded to 8-bit RGB. Animated
GIFs therefore yield their first frame — the same thing
``PIL.Image.open(...).tobytes()`` gives without ``seek()``.

The encoder is the fixture builder: single frame, optional interlace,
literal LZW codes with periodic CLEARs (valid, uncompressed-style
output — compression is pointless for test fixtures).
"""

from __future__ import annotations

import struct

from .codec_limits import check_dimensions

import numpy as np


def is_gif(data: bytes) -> bool:
    return len(data) >= 6 and data[:6] in (b"GIF87a", b"GIF89a")


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))  # (start row, step)


def _lzw_decode(min_code_size: int, data: bytes, expect: int) -> bytearray:
    """GIF LZW: LSB-first variable-width codes; returns ``expect``
    palette indices (extra codes past the pixel count are ignored, per
    the many real-world writers that pad)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    # bit reader state
    bitpos = 0
    total_bits = len(data) * 8

    def read_code(width: int) -> int:
        nonlocal bitpos
        if bitpos + width > total_bits:
            return eoi
        byte = bitpos >> 3
        shift = bitpos & 7
        chunk = int.from_bytes(data[byte : byte + 3], "little")
        bitpos += width
        return (chunk >> shift) & ((1 << width) - 1)

    table: list[bytes] = []

    def reset_table():
        nonlocal table, width
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = min_code_size + 1

    width = min_code_size + 1
    reset_table()
    prev: bytes | None = None
    while len(out) < expect:
        code = read_code(width)
        if code == clear:
            reset_table()
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError("corrupt GIF: invalid LZW code")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
        prev = entry
        if len(table) >= (1 << width) and width < 12:
            width += 1
    if len(out) < expect:
        raise ValueError("corrupt GIF: LZW stream ended early")
    return out[:expect]


def decode_gif(data: bytes) -> tuple[bytes, int, int, str]:
    """Decode the first frame -> (pixels, width, height, 'RGB') at the
    LOGICAL SCREEN size (frame composited at its left/top offset over
    the background color)."""
    if not is_gif(data):
        raise ValueError("not a GIF (missing magic)")
    try:
        return _decode_gif_inner(data)
    except (struct.error, IndexError) as exc:
        raise ValueError(f"corrupt GIF: truncated ({exc})") from exc


def _decode_gif_inner(data: bytes) -> tuple[bytes, int, int, str]:
    sw, sh = struct.unpack_from("<HH", data, 6)
    check_dimensions(sw or 1, sh or 1, "GIF")
    flags = data[10]
    bg_index = data[11]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(data, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    if sw == 0 or sh == 0:
        raise ValueError("corrupt GIF: zero logical screen")

    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            pos += 1
            while pos < len(data) and data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"corrupt GIF: unknown block 0x{block:02x}")
        left, top, fw, fh = struct.unpack_from("<HHHH", data, pos)
        check_dimensions(fw or 1, fh or 1, "GIF")
        iflags = data[pos + 8]
        pos += 9
        lct = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            lct = np.frombuffer(data, np.uint8, n * 3, pos).reshape(n, 3)
            pos += n * 3
        if lct is None:
            raise ValueError("corrupt GIF: no color table")
        if fw == 0 or fh == 0 or left + fw > sw or top + fh > sh:
            raise ValueError("corrupt GIF: frame outside logical screen")
        min_code_size = data[pos]
        pos += 1
        chunks = []
        while pos < len(data) and data[pos] != 0:
            n = data[pos]
            chunks.append(data[pos + 1 : pos + 1 + n])
            pos += 1 + n
        pos += 1
        indices = _lzw_decode(min_code_size, b"".join(chunks), fw * fh)
        frame = np.frombuffer(bytes(indices), np.uint8).reshape(fh, fw)
        if iflags & 0x40:  # interlaced: rows arrive in 4 passes
            out_rows = np.empty_like(frame)
            src = 0
            for start, step in _INTERLACE_PASSES:
                for r in range(start, fh, step):
                    out_rows[r] = frame[src]
                    src += 1
            frame = out_rows
        if int(frame.max(initial=0)) >= len(lct):
            raise ValueError("corrupt GIF: palette index out of range")
        # Background color is an index into the GLOBAL table (GIF89a
        # §18 — the field is meaningless without a GCT or when it
        # exceeds it: black then); the frame region maps through its
        # own local-or-global table. Compositing in RGB keeps the two
        # palettes from cross-contaminating.
        rgb = np.zeros((sh, sw, 3), np.uint8)
        if gct is not None and bg_index < len(gct):
            rgb[:, :] = gct[bg_index]
        rgb[top : top + fh, left : left + fw] = lct[frame]
        return np.ascontiguousarray(rgb).tobytes(), sw, sh, "RGB"
    raise ValueError("corrupt GIF: no image frame")


def encode_gif(
    indices: bytes,
    palette: list[tuple[int, int, int]],
    width: int,
    height: int,
    interlace: bool = False,
) -> bytes:
    """Single-frame GIF89a writer over explicit palette indices — the
    test-side inverse of :func:`decode_gif`. LZW is emitted as literal
    codes with a CLEAR before each group of ``2^min - 1`` pixels, which
    keeps every code at ``min_code_size + 1`` bits (valid, merely
    uncompressed)."""
    npal = len(palette)
    if not 2 <= npal <= 256:
        raise ValueError("palette must have 2..256 entries")
    if len(indices) != width * height:
        raise ValueError("index buffer does not match dimensions")
    if max(indices) >= npal:
        raise ValueError("palette index out of range")
    # color table size = 2^(n+1) >= npal
    n = max(1, (npal - 1).bit_length())
    table_size = 1 << n
    min_code = max(2, n)
    clear = 1 << min_code
    eoi = clear + 1
    cwidth = min_code + 1

    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", width, height)
    out += bytes([0x80 | (n - 1), 0, 0])  # GCT flag+size, bg=0, no aspect
    for i in range(table_size):
        r, g, b = palette[i] if i < npal else (0, 0, 0)
        out += bytes([r, g, b])
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, width, height)
    out += bytes([0x40 if interlace else 0x00])
    out += bytes([min_code])

    rows = np.frombuffer(indices, np.uint8).reshape(height, width)
    if interlace:
        order = []
        for start, step in _INTERLACE_PASSES:
            order.extend(range(start, height, step))
        rows = rows[order]
    flat = rows.reshape(-1)

    bits = bytearray()
    acc = 0
    nacc = 0

    def put(code: int):
        nonlocal acc, nacc
        acc |= code << nacc
        nacc += cwidth
        while nacc >= 8:
            bits.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8

    # After a CLEAR the decoder's table holds 2^min + 2 entries and each
    # literal (past the first) adds one; its code width bumps once the
    # table reaches 2^(min+1). CLEAR again after 2^min - 2 literals so
    # every code stays at min+1 bits.
    group = clear - 2
    put(clear)
    for i, v in enumerate(flat):
        if i and i % group == 0:
            put(clear)
        put(int(v))
    put(eoi)
    if nacc:
        bits.append(acc & 0xFF)
    for i in range(0, len(bits), 255):
        chunk = bits[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)
