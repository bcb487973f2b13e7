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
* both interlace methods: none and Adam7 (each of the seven reduced
  passes is unfiltered independently, then scattered onto the full
  grid per RFC 2083 §2 — filters never cross pass boundaries).

Decoding is per-file Python, which is the right cost model: it runs
inside the Arrow-batched ``mapInPandas`` of ``operators/image.py``, so
each task decodes its own files and the work scales with executors, not
the driver.
"""

from __future__ import annotations

import struct
import zlib

from .codec_limits import check_dimensions

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# color type -> (samples per pixel, mode for 8-bit depth)
_COLOR_TYPES = {0: (1, "L"), 2: (3, "RGB"), 3: (1, "P"), 4: (2, "LA"), 6: (4, "RGBA")}

# Adam7 pass grid: (x_origin, y_origin, x_step, y_step), RFC 2083 §2
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


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


def _unfilter(
    raw: bytes, offset: int, stride: int, height: int, samples: int
) -> tuple[bytearray, int]:
    """Undo the five RFC 2083 row filters for one scanline sequence
    (a whole non-interlaced image, or one Adam7 pass). Returns the
    unfiltered pixels and the offset just past the consumed bytes."""
    need = offset + (stride + 1) * height
    if len(raw) < need:
        raise ValueError("PNG pixel data shorter than declared dimensions")
    out = bytearray(stride * height)
    for y in range(height):
        fpos = offset + y * (stride + 1)
        ftype = raw[fpos]
        row = raw[fpos + 1 : fpos + 1 + stride]
        ostart = y * stride
        pstart = ostart - stride  # row above; y == 0 reads as zeros
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
                    out[ostart + x] = (row[x] + out[pstart + x]) & 0xFF
        elif ftype == 3:  # Average
            for x in range(stride):
                left = out[ostart + x - samples] if x >= samples else 0
                up = out[pstart + x] if y > 0 else 0
                out[ostart + x] = (row[x] + ((left + up) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                left = out[ostart + x - samples] if x >= samples else 0
                up = out[pstart + x] if y > 0 else 0
                ul = out[pstart + x - samples] if (y > 0 and x >= samples) else 0
                out[ostart + x] = (row[x] + _paeth(left, up, ul)) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
    return out, need


def _adam7_passes(width: int, height: int):
    """Non-empty Adam7 passes as (x0, y0, dx, dy, pass_w, pass_h)."""
    for x0, y0, dx, dy in _ADAM7:
        pw = (width - x0 + dx - 1) // dx
        ph = (height - y0 + dy - 1) // dy
        if pw > 0 and ph > 0:
            yield x0, y0, dx, dy, pw, ph


def decode_png(data: bytes) -> tuple[bytes, int, int, str]:
    """Decode a PNG byte string -> (pixels, width, height, mode).

    ``pixels`` are raw interleaved samples, row-major — the same layout
    ``PIL.Image.tobytes()`` yields for the same mode. Raises ONLY
    ValueError on corrupt input: stray low-level exceptions from a
    byte-flipped stream (short IHDR unpack, truncated chunk headers)
    are converted here — the same totality contract as
    ``jpeg_codec.decode_jpeg`` / ``gif_codec.decode_gif`` (r10
    extended-fuzz finding, pinned by tests/test_codec_property.py).
    """
    if not is_png(data):
        raise ValueError("not a PNG: bad signature")
    try:
        return _decode_png_inner(data)
    except (struct.error, IndexError, KeyError, ZeroDivisionError) as exc:
        raise ValueError(f"corrupt PNG: {exc!r}") from exc


def _decode_png_inner(data: bytes) -> tuple[bytes, int, int, str]:
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
    if interlace not in (0, 1):
        raise ValueError(f"bad PNG interlace method {interlace}")
    check_dimensions(width, height, "PNG")

    samples, mode = _COLOR_TYPES[color_type]
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        # corrupt IDAT (bad adler/deflate stream) is CORRUPTION, not an
        # undeclared zlib.error leaking through the totality contract
        # (same guard class as the TIFF deflate strips; found by the
        # r10 extended fuzz — the e2e loader shielded it via its broad
        # except, but the codec's own declared-ValueError contract is
        # what substitutes for PIL's robustness)
        raise ValueError(f"corrupt PNG: bad IDAT stream ({e})") from e
    stride = width * samples  # bytes per unfiltered row (bpp = samples at depth 8)

    if interlace == 0:
        out, _ = _unfilter(raw, 0, stride, height, samples)
    else:  # Adam7: unfilter each reduced pass, scatter onto the grid
        out = bytearray(stride * height)
        offset = 0
        for x0, y0, dx, dy, pw, ph in _adam7_passes(width, height):
            sub, offset = _unfilter(raw, offset, pw * samples, ph, samples)
            for py in range(ph):
                srow = py * pw * samples
                drow = (y0 + py * dy) * stride
                for px in range(pw):
                    src = srow + px * samples
                    dst = drow + (x0 + px * dx) * samples
                    out[dst : dst + samples] = sub[src : src + samples]

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


def read_png_metadata(data: bytes) -> tuple[int | None, int | None]:
    """Read color-management metadata from a PNG's ancillary chunks ->
    (gamma in 1e-5 units from gAMA, rendering intent from sRGB) — None
    where the chunk is absent. Walks the real chunk stream (stops at
    IEND/IDAT-exhaustion like :func:`decode_png`); corrupt framing
    raises ValueError."""
    if not is_png(data):
        raise ValueError("not a PNG: bad signature")
    gamma = srgb = None
    pos = 8
    while pos + 8 <= len(data):
        length, ctype = struct.unpack(">I4s", data[pos : pos + 8])
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated PNG chunk")
        if ctype == b"gAMA" and length == 4:
            (gamma,) = struct.unpack(">I", body)
        elif ctype == b"sRGB" and length == 1:
            srgb = body[0]
        elif ctype == b"IEND":
            break
        pos += 12 + length
    return gamma, srgb


def encode_png(
    pixels: bytes,
    width: int,
    height: int,
    mode: str = "RGB",
    interlace: bool = False,
    gamma: int | None = None,
    srgb_intent: int | None = None,
) -> bytes:
    """Minimal PNG writer (filter 0 rows, one zlib IDAT) — the test-side
    inverse of :func:`decode_png`, also used to build fixtures without
    PIL. Supports modes L/LA/RGB/RGBA at depth 8, optionally Adam7
    interlaced. ``gamma`` (1e-5 units, e.g. 45455 for 1/2.2) writes a
    gAMA chunk and ``srgb_intent`` (0-3) an sRGB chunk — both before
    IDAT per the spec's ordering rules (r9, for the e5 color-management
    audit)."""
    ct = {"L": 0, "RGB": 2, "LA": 4, "RGBA": 6}[mode]
    samples = {"L": 1, "RGB": 3, "LA": 2, "RGBA": 4}[mode]
    if len(pixels) != width * height * samples:
        raise ValueError("pixel buffer does not match dimensions")
    stride = width * samples
    if not interlace:
        raw = b"".join(
            b"\x00" + pixels[y * stride : (y + 1) * stride] for y in range(height)
        )
    else:
        parts = []
        for x0, y0, dx, dy, pw, ph in _adam7_passes(width, height):
            for py in range(ph):
                row = bytearray()
                srow = (y0 + py * dy) * stride
                for px in range(pw):
                    s = srow + (x0 + px * dx) * samples
                    row += pixels[s : s + samples]
                parts.append(b"\x00" + bytes(row))
        raw = b"".join(parts)

    def chunk(ctype: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", width, height, 8, ct, 0, 0, 1 if interlace else 0)
    meta = b""
    if srgb_intent is not None:
        meta += chunk(b"sRGB", bytes([srgb_intent & 3]))
    if gamma is not None:
        gamma = int(gamma)
        # validate before struct.pack: a negative or >= 2**32 value
        # raises an opaque struct.error; gAMA is a u32 (RFC 2083 4.2.1).
        if not 0 <= gamma < 2**32:
            raise ValueError(
                f"gAMA gamma must be a u32 (0 <= g < 2**32), got {gamma}"
            )
        meta += chunk(b"gAMA", struct.pack(">I", gamma))
    return (
        PNG_SIGNATURE
        + chunk(b"IHDR", ihdr)
        + meta
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )
