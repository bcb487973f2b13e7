"""BMP (Windows bitmap) codec — pure stdlib, no PIL.

Part of the no-PIL T3 format envelope (the reference's PIL loader opens
BMPs, /root/reference/tfrecorder/beam_image.py:62-73). Uncompressed
BI_RGB bitmaps at 1/4/8 bpp (palettized), 24 and 32 bpp, bottom-up or
top-down, BITMAPINFOHEADER or larger DIB headers. RLE compression and
bitfield masks raise ValueError — the loader's DISCARD route, same as a
corrupt file. Output is always expanded 8-bit RGB (palette entries are
BGRx on the wire).

The encoder writes 24 bpp BI_RGB (the fixture builder — tests need real
BMPs and PIL is absent).
"""

from __future__ import annotations

import struct

from .codec_limits import check_dimensions

import numpy as np


def is_bmp(data: bytes) -> bool:
    return len(data) >= 2 and data[:2] == b"BM"


def decode_bmp(data: bytes) -> tuple[bytes, int, int, str]:
    """Decode a BMP -> (pixels, width, height, 'RGB'), PIL tobytes()
    layout (row-major, top row first)."""
    if not is_bmp(data):
        raise ValueError("not a BMP (missing BM magic)")
    if len(data) < 54:
        raise ValueError("corrupt BMP: truncated header")
    (pix_offset,) = struct.unpack_from("<I", data, 10)
    (dib_size,) = struct.unpack_from("<I", data, 14)
    if dib_size < 40:
        raise ValueError(f"unsupported BMP: DIB header size {dib_size}")
    width, height = struct.unpack_from("<ii", data, 18)
    (bpp,) = struct.unpack_from("<H", data, 28)
    (compression,) = struct.unpack_from("<I", data, 30)
    if compression != 0:
        raise ValueError(f"unsupported BMP compression {compression}")
    if bpp not in (1, 4, 8, 24, 32):
        raise ValueError(f"unsupported BMP bit depth {bpp}")
    top_down = height < 0
    height = abs(height)
    check_dimensions(width, height, "BMP")
    if width <= 0 or height == 0:
        raise ValueError("corrupt BMP: bad dimensions")

    palette = None
    if bpp <= 8:
        (ncolors,) = struct.unpack_from("<I", data, 46)
        if ncolors == 0:
            ncolors = 1 << bpp
        pal_off = 14 + dib_size
        raw = np.frombuffer(
            data, dtype=np.uint8, count=ncolors * 4, offset=pal_off
        ).reshape(ncolors, 4)
        palette = raw[:, [2, 1, 0]]  # BGRx -> RGB

    stride = ((width * bpp + 31) // 32) * 4
    need = stride * height
    if pix_offset + need > len(data):
        raise ValueError("corrupt BMP: truncated pixel data")
    rows = np.frombuffer(
        data, dtype=np.uint8, count=need, offset=pix_offset
    ).reshape(height, stride)
    if not top_down:
        rows = rows[::-1]

    if bpp == 24:
        rgb = rows[:, : width * 3].reshape(height, width, 3)[:, :, ::-1]
    elif bpp == 32:
        rgb = rows[:, : width * 4].reshape(height, width, 4)[:, :, [2, 1, 0]]
    else:
        if bpp == 8:
            idx = rows[:, :width]
        elif bpp == 4:
            pairs = rows[:, : (width + 1) // 2]
            hi = pairs >> 4
            lo = pairs & 0xF
            idx = np.empty((height, ((width + 1) // 2) * 2), dtype=np.uint8)
            idx[:, 0::2] = hi
            idx[:, 1::2] = lo
            idx = idx[:, :width]
        else:  # 1 bpp
            bits = np.unpackbits(rows, axis=1)
            idx = bits[:, :width]
        if palette is None or idx.max(initial=0) >= len(palette):
            raise ValueError("corrupt BMP: palette index out of range")
        rgb = palette[idx]
    return np.ascontiguousarray(rgb).astype(np.uint8).tobytes(), width, height, "RGB"


def encode_bmp(pixels: bytes, width: int, height: int, mode: str = "RGB") -> bytes:
    """Minimal 24 bpp BI_RGB writer (bottom-up) — the test-side inverse
    of :func:`decode_bmp`. Mode 'L' input is expanded to gray RGB."""
    if mode not in ("L", "RGB"):
        raise ValueError(f"unsupported mode {mode!r}")
    nch = 1 if mode == "L" else 3
    arr = np.frombuffer(pixels, dtype=np.uint8)
    if len(arr) != width * height * nch:
        raise ValueError("pixel buffer does not match dimensions")
    img = arr.reshape(height, width, nch)
    if nch == 1:
        img = np.repeat(img, 3, axis=2)
    stride = ((width * 3 + 3) // 4) * 4
    rows = np.zeros((height, stride), dtype=np.uint8)
    rows[:, : width * 3] = img[:, :, ::-1].reshape(height, width * 3)
    body = rows[::-1].tobytes()  # bottom-up
    pix_offset = 14 + 40
    header = b"BM" + struct.pack(
        "<IHHI", pix_offset + len(body), 0, 0, pix_offset
    )
    dib = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return header + dib + body
