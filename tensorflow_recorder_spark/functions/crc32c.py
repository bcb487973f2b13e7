"""Pure-Python CRC-32C (Castagnoli) + the TFRecord masking scheme.

The TFRecord on-disk format frames each record with masked CRC-32C
checksums (public format, documented in the TensorFlow source:
tensorflow/core/lib/io/record_writer.h). CRC-32C uses the reflected
polynomial 0x82F63B78. The mask is
``((crc >> 15) | (crc << 17)) + 0xa282ead8 (mod 2^32)``.

This implementation exists because neither ``crc32c`` nor TensorFlow is
available in the runtime; it is table-driven and only touches record
headers and payloads once.
"""

from __future__ import annotations

_POLY = 0x82F63B78
_MASK_DELTA = 0xA282EAD8


def _make_table() -> list[int]:
    table = []
    for i in range(256):
        crc = i
        for _ in range(8):
            crc = (crc >> 1) ^ _POLY if crc & 1 else crc >> 1
        table.append(crc)
    return table


_TABLE = _make_table()


def crc32c(data: bytes, crc: int = 0) -> int:
    crc ^= 0xFFFFFFFF
    table = _TABLE
    for b in data:
        crc = table[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def masked_crc32c(data: bytes) -> int:
    crc = crc32c(data)
    return (((crc >> 15) | (crc << 17)) + _MASK_DELTA) & 0xFFFFFFFF
