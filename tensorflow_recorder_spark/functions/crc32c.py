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


# ------------------------------------------------- vectorized batch path
#
# CRC is sequential in the byte dimension but embarrassingly parallel in
# the RECORD dimension: the write path checksums hundreds of thousands
# of ~fixed-size Examples per partition, so stepping all records'
# state machines in lockstep with one table-gather per byte position
# turns ~len(record) Python iterations PER RECORD into ~len(record)
# numpy ops PER BATCH (measured ~50x on the convert write path).

import numpy as _np

_TABLE_NP = _np.array(_TABLE, dtype=_np.uint32)


def _crc32c_block(arr: "_np.ndarray", lengths: "_np.ndarray") -> "_np.ndarray":
    """CRC-32C over the rows of a (n, maxlen) uint8 array; rows are
    length-sorted DESCENDING so at byte j the first k rows are active."""
    n = arr.shape[0]
    crc = _np.full(n, 0xFFFFFFFF, dtype=_np.uint32)
    tab = _TABLE_NP
    k = n
    for j in range(arr.shape[1]):
        while k and lengths[k - 1] <= j:
            k -= 1
        if not k:
            break
        c = crc[:k]
        crc[:k] = tab[(c ^ arr[:k, j]) & _np.uint32(0xFF)] ^ (c >> _np.uint32(8))
    return crc ^ _np.uint32(0xFFFFFFFF)


def crc32c_many(records: list[bytes], block_bytes: int = 1 << 26) -> "_np.ndarray":
    """CRC-32C of many byte strings at once (uint32 array, input order).

    Records are length-sorted and processed in blocks whose padded
    (rows x maxlen) matrix stays under ``block_bytes``, so one huge
    record among many small ones cannot blow up padding memory.
    """
    n = len(records)
    out = _np.empty(n, dtype=_np.uint32)
    if not n:
        return out
    lengths = _np.fromiter((len(r) for r in records), dtype=_np.int64, count=n)
    order = _np.argsort(-lengths, kind="stable")
    start = 0
    while start < n:
        maxlen = int(lengths[order[start]])
        rows = max(1, block_bytes // max(maxlen, 1))
        block = order[start : start + rows]
        blens = lengths[block]
        arr = _np.zeros((len(block), maxlen), dtype=_np.uint8)
        for i, idx in enumerate(block):
            r = records[idx]
            arr[i, : len(r)] = _np.frombuffer(r, dtype=_np.uint8)
        out[block] = _crc32c_block(arr, blens)
        start += rows
    return out


def masked_crc32c_many(records: list[bytes]) -> "_np.ndarray":
    crc = crc32c_many(records)
    return ((crc >> _np.uint32(15)) | (crc << _np.uint32(17))) + _np.uint32(_MASK_DELTA)
