"""Shared decompression-bomb guard for the pure-Python codecs.

A corrupt (or hostile) header can declare absurd dimensions — the r10
fuzz found a single flipped IHDR byte turning a 9x7 PNG into a
1.1-billion-pixel one, which made the Adam7 path try to allocate a
~23 GB output buffer BEFORE any pixel-data length check could reject
it. On an executor that is a task-killing allocation, not a clean
DISCARD. Every decoder therefore validates declared dimensions at
header-parse time, before any dimension-derived allocation.

The cap matches PIL's ERROR threshold, not its warning threshold: PIL
emits ``DecompressionBombWarning`` at ``Image.MAX_IMAGE_PIXELS``
(89,478,485 — the public, widely deployed default) but only raises
``DecompressionBombError`` at TWICE that, so a PIL-based loader (the
reference's, beam_image.py:62-73) still decodes 89M-179M-pixel images.
Rejecting at 1x would silently DISCARD valid large images the
reference accepts (r10 advice); this guard therefore rejects strictly
above ``2 * MAX_IMAGE_PIXELS``, byte-for-byte the set PIL errors on.
Real fixtures in this engine are orders of magnitude smaller.
"""

from __future__ import annotations

MAX_IMAGE_PIXELS = 89_478_485


def check_dimensions(width: int, height: int, fmt: str) -> None:
    """ValueError (the codecs' declared corruption signal) for
    non-positive or bomb-sized declared dimensions."""
    if width <= 0 or height <= 0:
        raise ValueError(f"corrupt {fmt}: bad dimensions {width}x{height}")
    if width * height > 2 * MAX_IMAGE_PIXELS:
        raise ValueError(
            f"corrupt {fmt}: declared {width}x{height} exceeds the "
            f"{2 * MAX_IMAGE_PIXELS}-pixel decompression-bomb guard"
        )
