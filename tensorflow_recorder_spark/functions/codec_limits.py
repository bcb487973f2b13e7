"""Shared decompression-bomb guard for the pure-Python codecs.

A corrupt (or hostile) header can declare absurd dimensions — the r10
fuzz found a single flipped IHDR byte turning a 9x7 PNG into a
1.1-billion-pixel one, which made the Adam7 path try to allocate a
~23 GB output buffer BEFORE any pixel-data length check could reject
it. On an executor that is a task-killing allocation, not a clean
DISCARD. Every decoder therefore validates declared dimensions at
header-parse time, before any dimension-derived allocation.

The cap is PIL's default ``Image.MAX_IMAGE_PIXELS`` (89,478,485 — a
public, widely deployed decompression-bomb threshold; the reference
loads images through PIL, beam_image.py:62-73, so it inherits the same
guard). Real fixtures in this engine are orders of magnitude smaller.
"""

from __future__ import annotations

MAX_IMAGE_PIXELS = 89_478_485


def check_dimensions(width: int, height: int, fmt: str) -> None:
    """ValueError (the codecs' declared corruption signal) for
    non-positive or bomb-sized declared dimensions."""
    if width <= 0 or height <= 0:
        raise ValueError(f"corrupt {fmt}: bad dimensions {width}x{height}")
    if width * height > MAX_IMAGE_PIXELS:
        raise ValueError(
            f"corrupt {fmt}: declared {width}x{height} exceeds the "
            f"{MAX_IMAGE_PIXELS}-pixel decompression-bomb guard"
        )
