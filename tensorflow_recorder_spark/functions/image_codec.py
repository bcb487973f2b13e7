"""Pure image byte helpers (T3 support).

Reference: /root/reference/tfrecorder/beam_image.py:29-59 — images are
stored as base64 of the RAW PIXEL BYTES (``image.tobytes()``, NOT the
compressed file) using URL-safe altchars ``-_``; channel count maps from
PIL mode ('L' -> 1, else 3) and back ('1' -> 'L', '3' -> 'RGB').
"""

from __future__ import annotations

import base64

_ALTCHARS = b"-_"

# PIL mode <-> channel count (reference beam_image.py:32-41).
_MODE_TO_CHANNEL = {"L": 1, "RGB": 3}
_CHANNEL_TO_MODE = {1: "L", 3: "RGB"}


def encode_pixels(pixels: bytes) -> str:
    """base64(raw pixel bytes) with altchars '-_' (beam_image.py:44-51)."""
    return base64.b64encode(pixels, altchars=_ALTCHARS).decode("ascii")


def decode_pixels(encoded: str | bytes) -> bytes:
    """Inverse of :func:`encode_pixels` (beam_image.py:54-59)."""
    if isinstance(encoded, str):
        encoded = encoded.encode("ascii")
    return base64.b64decode(encoded, altchars=_ALTCHARS)


def mode_to_channel(mode: str) -> int:
    try:
        return _MODE_TO_CHANNEL[mode]
    except KeyError:
        raise ValueError(f"unsupported image mode {mode!r}") from None


def channel_to_mode(channels: int) -> str:
    try:
        return _CHANNEL_TO_MODE[channels]
    except KeyError:
        raise ValueError(f"unsupported channel count {channels}") from None
