"""Pure-stdlib PNG decoder (T3 support) — makes image extraction decode
REAL bytes in runtimes without PIL.

The reference decodes images with PIL and stores base64 of the raw
decoded pixels (/root/reference/tfrecorder/beam_image.py:62-73 load,
:44-51 encode). This runtime has no PIL, so the most common fixture
format (PNG) is decoded here from first principles: chunk walk + zlib
inflate + per-row unfilter (the five filters of RFC 2083 §6). Output
matches ``PIL.Image.open(...).tobytes()`` / ``.mode`` for the supported
subset:

* bit depth 8; color types 0 (grayscale -> 'L'), 2 (RGB), 3 (palette,
  expanded -> 'RGB'; PIL would report mode 'P' with palette-index bytes
  — expansion is the useful behavior for a pixel pipeline and is
  documented as the one deviation), 4 (gray+alpha -> 'LA'),
  6 (RGBA).
* no interlacing (Adam7 raises -> the caller's DISCARD route).

Decoding is per-file Python, which is the right cost model: it runs
inside the Arrow-batched ``mapInPandas`` of ``operators/image.py``, so
each task decodes its own files and the work scales with executors, not
the driver.
"""

from __future__ import annotations

import struct
import zlib

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# color type -> (samples per pixel, mode for 8-bit depth)
_COLOR_TYPES = {0: (1, "L"), 2: (3, "RGB"), 3: (1, "P"), 4: (2, "LA"), 6: (4, "RGBA")}


def is_png(data: bytes) -> bool:
    return data[:8] == PNG_SIGNATURE


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(data: bytes) -> tuple[bytes, int, int, str]:
    """Decode a PNG byte string -> (pixels, width, height, mode).

    ``pixels`` are raw interleaved samples, row-major — the same layout
    ``PIL.Image.tobytes()`` yields for the same mode.
    """
    if not is_png(data):
        raise ValueError("not a PNG: bad signature")
    pos = 8
    width = height = None
    bit_depth = color_type = interlace = None
    palette: bytes | None = None
    idat = bytearray()
    while pos + 8 <= len(data):
        length, ctype = struct.unpack(">I4s", data[pos : pos + 8])
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated PNG chunk")
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
        elif ctype == b"PLTE":
            palette = bytes(body)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + body + crc
    if width is None:
        raise ValueError("PNG missing IHDR")
    if not idat:
        raise ValueError("PNG missing IDAT")
    if color_type not in _COLOR_TYPES:
        raise ValueError(f"unsupported PNG color type {color_type}")
    if bit_depth != 8:
        raise ValueError(f"unsupported PNG bit depth {bit_depth} (only 8)")
    if interlace != 0:
        raise ValueError("interlaced (Adam7) PNG not supported")

    samples, mode = _COLOR_TYPES[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * samples  # bytes per unfiltered row (bpp = samples at depth 8)
    expected = (stride + 1) * height
    if len(raw) < expected:
        raise ValueError("PNG pixel data shorter than declared dimensions")

    out = bytearray(stride * height)
    prev_start = -stride  # row above; first row's "above" reads as zeros
    for y in range(height):
        fpos = y * (stride + 1)
        ftype = raw[fpos]
        row = raw[fpos + 1 : fpos + 1 + stride]
        ostart = y * stride
        if ftype == 0:  # None
            out[ostart : ostart + stride] = row
        elif ftype == 1:  # Sub
            for x in range(stride):
                left = out[ostart + x - samples] if x >= samples else 0
                out[ostart + x] = (row[x] + left) & 0xFF
        elif ftype == 2:  # Up
            if y == 0:
                out[ostart : ostart + stride] = row
            else:
                for x in range(stride):
                    out[ostart + x] = (row[x] + out[ostart + prev_start + x]) & 0xFF
        elif ftype == 3:  # Average
            for x in range(stride):
                left = out[ostart + x - samples] if x >= samples else 0
                up = out[ostart + prev_start + x] if y > 0 else 0
                out[ostart + x] = (row[x] + ((left + up) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                left = out[ostart + x - samples] if x >= samples else 0
                up = out[ostart + prev_start + x] if y > 0 else 0
                ul = out[ostart + prev_start + x - samples] if (y > 0 and x >= samples) else 0
                out[ostart + x] = (row[x] + _paeth(left, up, ul)) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")

    if color_type == 3:  # palette -> RGB expansion (documented deviation)
        if palette is None:
            raise ValueError("palette PNG missing PLTE chunk")
        rgb = bytearray(width * height * 3)
        for i, idx in enumerate(out):
            off = idx * 3
            if off + 3 > len(palette):
                raise ValueError(f"palette index {idx} out of range")
            rgb[i * 3 : i * 3 + 3] = palette[off : off + 3]
        return bytes(rgb), width, height, "RGB"
    return bytes(out), width, height, mode


def encode_png(
    pixels: bytes, width: int, height: int, mode: str = "RGB"
) -> bytes:
    """Minimal PNG writer (filter 0 rows, one zlib IDAT) — the test-side
    inverse of :func:`decode_png`, also used to build fixtures without
    PIL. Supports modes L/LA/RGB/RGBA at depth 8."""
    ct = {"L": 0, "RGB": 2, "LA": 4, "RGBA": 6}[mode]
    samples = {"L": 1, "RGB": 3, "LA": 2, "RGBA": 4}[mode]
    if len(pixels) != width * height * samples:
        raise ValueError("pixel buffer does not match dimensions")
    stride = width * samples
    raw = b"".join(
        b"\x00" + pixels[y * stride : (y + 1) * stride] for y in range(height)
    )

    def chunk(ctype: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", width, height, 8, ct, 0, 0, 0)
    return (
        PNG_SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )
