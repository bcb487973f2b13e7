"""Pure image byte helpers (T3 support).

Reference: /root/reference/tfrecorder/beam_image.py:29-59 — images are
stored as base64 of the RAW PIXEL BYTES (``image.tobytes()``, NOT the
compressed file) using URL-safe altchars ``-_``; channel count maps from
PIL mode ('L' -> 1, else 3) and back ('1' -> 'L', '3' -> 'RGB').
"""

from __future__ import annotations

import base64

_ALTCHARS = b"-_"

# PIL mode <-> channel count. The reference is LENIENT: any mode NOT
# containing 'L' maps to 3 channels and any non-1 count maps back to
# 'RGB' (beam_image.py:32-41) — matched exactly since round 3
# (previously unknown modes raised and routed to DISCARD, a documented
# parity deviation).


def encode_pixels(pixels: bytes) -> str:
    """base64(raw pixel bytes) with altchars '-_' (beam_image.py:44-51)."""
    return base64.b64encode(pixels, altchars=_ALTCHARS).decode("ascii")


def decode_pixels(encoded: str | bytes) -> bytes:
    """Inverse of :func:`encode_pixels` (beam_image.py:54-59)."""
    if isinstance(encoded, str):
        encoded = encoded.encode("ascii")
    return base64.b64decode(encoded, altchars=_ALTCHARS)


def mode_to_channel(mode: str) -> int:
    # substring test, not equality: the reference counts any L-bearing
    # mode ('L', 'LA') as single-channel (beam_image.py:36).
    return 1 if "L" in mode else 3


def channel_to_mode(channels: int) -> str:
    return "L" if channels == 1 else "RGB"
