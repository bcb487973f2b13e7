"""Baseline JPEG (JFIF) codec — pure stdlib + numpy, no PIL.

Closes the last T3 format gap: the reference's PIL loader opens any
format (/root/reference/tfrecorder/beam_image.py:62-73); this runtime
has no PIL, so PNG decodes via ``png_codec.py`` and JPEG decodes here.
Only what a training-data pipeline actually meets is implemented:

* decode: baseline sequential DCT (SOF0/SOF1) AND progressive DCT
  (SOF2, round 5 — spectral selection + successive approximation per
  T.81 Annex G, coefficients accumulated across scans), 8-bit,
  grayscale or YCbCr, 4:4:4 / 4:2:2 / 4:2:0 chroma subsampling,
  restart markers (DRI/RSTn). Lossless/hierarchical, arithmetic
  coding, and 12-bit raise ValueError — the caller's failure path
  (split -> DISCARD) handles them, exactly like a truly corrupt file.
* encode: baseline (Annex K tables) and progressive
  (``encode_jpeg_progressive``) — the fixture-builder twins of
  ``png_codec.encode_png`` (tests need real JPEGs and PIL is not
  available to make them). Both quantize identically, so the two
  encodings of the same pixels decode byte-identically — the
  progressive decoder's correctness oracle.

Everything here follows the public ITU T.81 spec; the hot loops are
numpy-vectorized per 8x8 block (the IDCT/DCT is one einsum over the
whole block array), with only the Huffman bitstream walked in Python —
this code runs inside the Arrow-batched image loader, not per-row UDFs.
"""

from __future__ import annotations

import struct

import numpy as np

from .codec_limits import check_dimensions

# --------------------------------------------------------------------
# Markers
# --------------------------------------------------------------------

SOI = 0xD8
EOI = 0xD9
SOS = 0xDA
DQT = 0xDB
DNL = 0xDC
DRI = 0xDD
SOF0 = 0xC0  # baseline
SOF1 = 0xC1  # extended sequential (same entropy coding; accepted)
SOF2 = 0xC2  # progressive DCT (multi-scan; round-5 addition)
DHT = 0xC4
_SOF_UNSUPPORTED = {0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}


def is_jpeg(data: bytes) -> bool:
    """SOI magic check (any JPEG flavor — decode may still reject)."""
    return len(data) >= 2 and data[0] == 0xFF and data[1] == SOI


# Zig-zag order: index i of the scan -> (row, col) flat index.
_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Orthonormal 8-point DCT-II basis; IDCT is C.T @ block @ C.
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos(np.pi * _k * (2 * _n + 1) / 16) * (
            np.sqrt(0.125) if _k == 0 else 0.5
        )


# --------------------------------------------------------------------
# Huffman table -> flat decode LUTs
# --------------------------------------------------------------------


class _HuffTable:
    """Canonical JPEG Huffman table with a (length, code) -> symbol map.

    Decoding peeks 16 bits and walks lengths 1..16; JPEG codes are
    canonical so at each length the in-range check is two compares.
    """

    __slots__ = ("mincode", "maxcode", "valptr", "values")

    def __init__(self, counts: list[int], values: bytes):
        self.values = values
        code = 0
        k = 0
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        for length in range(1, 17):
            n = counts[length - 1]
            self.valptr[length] = k
            self.mincode[length] = code
            code += n
            k += n
            self.maxcode[length] = code - 1 if n else -1
            code <<= 1


class _BitReader:
    """Entropy-coded segment reader: handles 0xFF00 stuffing, stops at
    markers (leaving them for the caller)."""

    __slots__ = ("data", "pos", "bits", "nbits")

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bits = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits <= 24:
            if self.pos >= len(self.data):
                self.bits = (self.bits << 8) | 0xFF  # pad past EOF
                self.nbits += 8
                continue
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else EOI
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:
                    break  # restart marker: caller consumes via sync()
                else:
                    break  # real marker (EOI/DNL): stop, pad with 1s
                self.bits = (self.bits << 8) | 0xFF
                self.nbits += 8
                continue
            self.pos += 1
            self.bits = (self.bits << 8) | b
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
            if self.nbits == 0:
                self.bits = 0xFF
                self.nbits = 8
        self.nbits -= 1
        return (self.bits >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode(self, table: _HuffTable) -> int:
        code = self.read_bit()
        for length in range(1, 17):
            if table.maxcode[length] >= code >= table.mincode[length]:
                return table.values[
                    table.valptr[length] + code - table.mincode[length]
                ]
            code = (code << 1) | self.read_bit()
        raise ValueError("corrupt JPEG: invalid Huffman code")

    def sync_restart(self, n: int) -> None:
        """Discard padding bits and consume the RSTn marker."""
        self.bits = 0
        self.nbits = 0
        while self.pos + 1 < len(self.data):
            if self.data[self.pos] == 0xFF and self.data[self.pos + 1] == 0xD0 + n:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("corrupt JPEG: missing restart marker")


def _extend(v: int, n: int) -> int:
    """T.81 F.2.2.1 sign extension of an n-bit magnitude."""
    if n == 0:
        return 0
    return v if v >= (1 << (n - 1)) else v - (1 << n) + 1


# --------------------------------------------------------------------
# Decode
# --------------------------------------------------------------------


def decode_jpeg(data: bytes) -> tuple[bytes, int, int, str]:
    """Decode a baseline (SOF0/SOF1) or progressive (SOF2) JPEG ->
    (pixels, width, height, mode) with mode 'L' (1 component) or 'RGB'
    (3, YCbCr->RGB per JFIF), the same contract as
    ``png_codec.decode_png``. Progressive streams accumulate DCT
    coefficients across every SOS scan (spectral selection + successive
    approximation per T.81 Annex G) and dequantize/IDCT once at EOI.
    Raises ValueError for lossless/arithmetic/12-bit flavors and
    corrupt data — ONLY ValueError: any stray low-level exception from
    a byte-flipped stream (short DHT counts, truncated SOF, bad table
    ids) is converted here, same totality contract as
    ``gif_codec.decode_gif``, so an executor batch DISCARDs the row
    instead of crashing the stage (pinned by
    tests/test_codec_property.py)."""
    if not is_jpeg(data):
        raise ValueError("not a JPEG (missing SOI)")
    try:
        return _decode_jpeg_inner(data)
    except (struct.error, IndexError, KeyError, ZeroDivisionError) as exc:
        raise ValueError(f"corrupt JPEG: {exc!r}") from exc


def _decode_jpeg_inner(data: bytes) -> tuple[bytes, int, int, str]:
    qtables: dict[int, np.ndarray] = {}
    dc_tables: dict[int, _HuffTable] = {}
    ac_tables: dict[int, _HuffTable] = {}
    restart_interval = 0
    frame = None  # (width, height, [(cid, h, v, tq)])
    progressive = False
    coeff_store: dict[int, np.ndarray] = {}  # cid -> (nblocks, 64) int32
    pos = 2
    n = len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            raise ValueError("corrupt JPEG: expected marker")
        # T.81 B.1.1.2: optional 0xFF fill bytes before the marker id
        while pos + 1 < n and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        pos += 2
        if marker == EOI:
            break
        if 0xD0 <= marker <= 0xD8 or marker == 0x01:
            continue  # parameterless (TEM, RSTn, redundant SOI)
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        seg = data[pos + 2 : pos + seglen]
        if marker in _SOF_UNSUPPORTED:
            raise ValueError(
                f"unsupported JPEG (SOF{marker - 0xC0}): only baseline "
                "and progressive DCT are implemented"
            )
        if marker == DQT:
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if pq:  # 16-bit table
                    q = np.frombuffer(seg[p : p + 128], dtype=">u2").astype(np.int32)
                    p += 128
                else:
                    q = np.frombuffer(seg[p : p + 64], dtype=np.uint8).astype(np.int32)
                    p += 64
                zz = np.zeros(64, dtype=np.int32)
                zz[_ZIGZAG] = q
                qtables[tq] = zz.reshape(8, 8)
        elif marker == DHT:
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                counts = list(seg[p + 1 : p + 17])
                nv = sum(counts)
                values = seg[p + 17 : p + 17 + nv]
                table = _HuffTable(counts, values)
                (ac_tables if tc else dc_tables)[th] = table
                p += 17 + nv
        elif marker in (SOF0, SOF1, SOF2):
            precision = seg[0]
            if precision != 8:
                raise ValueError(f"unsupported JPEG precision {precision}")
            progressive = marker == SOF2
            height, width = struct.unpack(">HH", seg[1:5])
            check_dimensions(width or 1, height or 1, "JPEG")
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            frame = (width, height, comps)
        elif marker == DRI:
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == SOS:
            if frame is None:
                raise ValueError("corrupt JPEG: SOS before SOF")
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                scan.append((cs, tt >> 4, tt & 0xF))
            if not progressive:
                return _decode_scan(
                    data,
                    pos + seglen,
                    frame,
                    scan,
                    qtables,
                    dc_tables,
                    ac_tables,
                    restart_interval,
                )
            ss, se, a = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            pos = _decode_progressive_scan(
                data,
                pos + seglen,
                frame,
                scan,
                (ss, se, a >> 4, a & 0xF),
                coeff_store,
                dc_tables,
                ac_tables,
                restart_interval,
            )
            continue
        pos += seglen
    if progressive:
        if not coeff_store:
            raise ValueError("corrupt JPEG: progressive frame with no scans")
        width, height, comps = frame
        hmax = max(h for _, h, _, _ in comps)
        vmax = max(v for _, _, v, _ in comps)
        mcux = -(-width // (8 * hmax))
        mcuy = -(-height // (8 * vmax))
        planes = []
        for cid, h, v, tq in comps:
            if tq not in qtables:
                raise ValueError(
                    "corrupt JPEG: frame references undefined quantization table"
                )
            blocks = coeff_store.get(cid)
            if blocks is None:
                blocks = np.zeros((mcux * h * mcuy * v, 64), dtype=np.int32)
            planes.append((h, v, qtables[tq], blocks))
        return _assemble(planes, width, height, hmax, vmax, mcux, mcuy)
    raise ValueError("corrupt JPEG: no SOS marker")


def _decode_progressive_scan(
    data,
    pos,
    frame,
    scan,
    spec,
    store,
    dc_tables,
    ac_tables,
    restart_interval,
):
    """One progressive SOS: accumulate this scan's spectral band /
    approximation bits into the per-component coefficient store
    (T.81 Annex G). Returns the absolute offset of the next marker."""
    width, height, comps = frame
    ss, se, ah, al = spec
    hmax = max(h for _, h, _, _ in comps)
    vmax = max(v for _, _, v, _ in comps)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    by_id = {cid: (h, v, tq) for cid, h, v, tq in comps}
    # T.81 B.2.3: every scan-header table reference must resolve to a
    # table defined by a preceding DHT; a corrupt stream may reference an
    # undefined slot, which must surface as the declared ValueError (not
    # an AttributeError/KeyError deep inside the entropy decoder).
    for cs, td, ta in scan:
        if cs not in by_id:
            raise ValueError("corrupt JPEG: scan references undefined component")
        if ss == 0 and ah == 0 and td not in dc_tables:
            raise ValueError("corrupt JPEG: scan references undefined DC Huffman table")
        if ss != 0 and ta not in ac_tables:
            raise ValueError("corrupt JPEG: scan references undefined AC Huffman table")
    for cid, h, v, _tq in comps:
        if cid not in store:
            store[cid] = np.zeros((mcux * h * mcuy * v, 64), dtype=np.int32)

    reader = _BitReader(data, pos)
    rst = 0
    if ss == 0:
        if se != 0:
            raise ValueError("corrupt JPEG: DC scan with Se != 0")
        preds = [0] * len(scan)
        if len(scan) == 1:
            # non-interleaved DC scan over the component's own block grid
            cs, td, _ta = scan[0]
            h, v, _tq = by_id[cs]
            blocks = store[cs]
            stride = mcux * h
            wb, hb = _component_block_grid(width, height, h, v, hmax, vmax)
            dct = dc_tables.get(td) if ah == 0 else None
            unit = 0
            for row in range(hb):
                for col in range(wb):
                    if restart_interval and unit and unit % restart_interval == 0:
                        reader.sync_restart(rst)
                        rst = (rst + 1) & 7
                        preds = [0]
                    coeffs = blocks[row * stride + col]
                    _dc_unit(reader, dct, coeffs, preds, 0, ah, al)
                    unit += 1
        else:
            unit = 0
            for my in range(mcuy):
                for mx in range(mcux):
                    if restart_interval and unit and unit % restart_interval == 0:
                        reader.sync_restart(rst)
                        rst = (rst + 1) & 7
                        preds = [0] * len(scan)
                    for ci, (cs, td, _ta) in enumerate(scan):
                        h, v, _tq = by_id[cs]
                        blocks = store[cs]
                        dct = dc_tables.get(td) if ah == 0 else None
                        for bv in range(v):
                            for bh in range(h):
                                coeffs = blocks[
                                    ((my * v + bv) * mcux * h) + mx * h + bh
                                ]
                                _dc_unit(reader, dct, coeffs, preds, ci, ah, al)
                    unit += 1
    else:
        if len(scan) != 1:
            raise ValueError("corrupt JPEG: interleaved AC scan")
        cs, _td, ta = scan[0]
        h, v, _tq = by_id[cs]
        blocks = store[cs]
        stride = mcux * h
        wb, hb = _component_block_grid(width, height, h, v, hmax, vmax)
        act = ac_tables[ta]
        eobrun = 0
        unit = 0
        for row in range(hb):
            for col in range(wb):
                if restart_interval and unit and unit % restart_interval == 0:
                    reader.sync_restart(rst)
                    rst = (rst + 1) & 7
                    eobrun = 0
                coeffs = blocks[row * stride + col]
                if ah == 0:
                    eobrun = _first_ac(reader, act, coeffs, ss, se, al, eobrun)
                else:
                    eobrun = _refine_ac(reader, act, coeffs, ss, se, al, eobrun)
                unit += 1

    # advance to the next marker (skip any trailing restart markers)
    p = reader.pos
    n = len(data)
    while p + 1 < n:
        if (
            data[p] == 0xFF
            and data[p + 1] != 0x00
            and not (0xD0 <= data[p + 1] <= 0xD7)
        ):
            break
        p += 1
    return p


def _component_block_grid(width, height, h, v, hmax, vmax):
    """(cols, rows) of a component's OWN block grid — the traversal for
    non-interleaved progressive scans (T.81 A.2.2): ceil over the
    component's downsampled dimensions, NOT the MCU-padded grid."""
    comp_w = -(-(width * h) // hmax)
    comp_h = -(-(height * v) // vmax)
    return -(-comp_w // 8), -(-comp_h // 8)


def _dc_unit(reader, dct, coeffs, preds, ci, ah, al):
    """DC coefficient of one block: first scan decodes a shifted DIFF
    chain; refinement scans append one magnitude bit."""
    if ah == 0:
        t = reader.decode(dct)
        if t > 15:
            # T.81 F.1.2.1.1: DC categories are 0..15; a corrupt Huffman
            # table can hand back any byte, and an unchecked one makes
            # receive(t) read hundreds of bits and the predictor
            # overflow the int64 coefficient store (hypothesis-found)
            raise ValueError(f"corrupt JPEG: DC category {t}")
        diff = _extend(reader.receive(t), t)
        preds[ci] += diff
        coeffs[0] = preds[ci] << al
    else:
        if reader.read_bit():
            coeffs[0] |= 1 << al


def _first_ac(reader, act, coeffs, ss, se, al, eobrun):
    """AC band, first (Ah=0) scan: baseline run/size coding restricted
    to [Ss, Se], values shifted << Al, plus the EOBn run count."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = reader.decode(act)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r < 15:
                eobrun = (1 << r) - 1
                if r:
                    eobrun += reader.receive(r)
                break
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise ValueError("corrupt JPEG: AC band overflow")
        coeffs[_ZIGZAG[k]] = _extend(reader.receive(s), s) << al
        k += 1
    return eobrun


def _refine_ac(reader, act, coeffs, ss, se, al, eobrun):
    """AC band refinement (Ah>0) scan, T.81 G.1.2.3: one correction bit
    per already-nonzero coefficient read IN PASSING; runs count only
    zero-history positions; newly-nonzero coefficients arrive as
    ±(1<<Al)."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = reader.decode(act)
            r, s = rs >> 4, rs & 0xF
            val = 0
            if s == 0:
                if r < 15:
                    # NOTE: unlike the first-scan EOBn (which is -1
                    # because the current block is done), the refinement
                    # EOB run INCLUDES the current block — its remaining
                    # nonzero coefficients still receive correction bits
                    # in the tail below, which then decrements the run.
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.receive(r)
                    break
                # ZRL: pass 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("corrupt JPEG: bad AC refinement size")
                val = p1 if reader.read_bit() else m1
            while k <= se:
                idx = _ZIGZAG[k]
                if coeffs[idx] != 0:
                    c = coeffs[idx]
                    if reader.read_bit() and (c & p1) == 0:
                        coeffs[idx] = c + (p1 if c > 0 else m1)
                else:
                    if r == 0:
                        if val:
                            coeffs[idx] = val
                        k += 1
                        break
                    r -= 1
                k += 1
    if eobrun > 0:
        while k <= se:
            idx = _ZIGZAG[k]
            c = coeffs[idx]
            if c != 0 and reader.read_bit() and (c & p1) == 0:
                coeffs[idx] = c + (p1 if c > 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _decode_scan(
    data, pos, frame, scan, qtables, dc_tables, ac_tables, restart_interval
):
    width, height, comps = frame
    if width == 0 or height == 0:
        raise ValueError("corrupt JPEG: zero dimension")
    hmax = max(h for _, h, _, _ in comps)
    vmax = max(v for _, _, v, _ in comps)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    by_id = {cid: (h, v, tq) for cid, h, v, tq in comps}

    # Per scan component: huffman tables, block store sized to MCU grid.
    planes = []  # (h, v, qt, dc_table, ac_table, coeff array)
    for cs, td, ta in scan:
        if cs not in by_id:
            raise ValueError("corrupt JPEG: scan references undefined component")
        h, v, tq = by_id[cs]
        if tq not in qtables:
            raise ValueError("corrupt JPEG: scan references undefined quantization table")
        if td not in dc_tables or ta not in ac_tables:
            raise ValueError("corrupt JPEG: scan references undefined Huffman table")
        nblocks = mcux * h * mcuy * v
        planes.append(
            [
                h,
                v,
                qtables[tq],
                dc_tables[td],
                ac_tables[ta],
                np.zeros((nblocks, 64), dtype=np.int32),
            ]
        )

    reader = _BitReader(data, pos)
    preds = [0] * len(planes)
    rst = 0
    mcu_index = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                reader.sync_restart(rst)
                rst = (rst + 1) & 7
                preds = [0] * len(planes)
            for ci, plane in enumerate(planes):
                h, v, _qt, dct, act, blocks = plane
                for bv in range(v):
                    for bh in range(h):
                        coeffs = blocks[((my * v + bv) * mcux * h) + mx * h + bh]
                        t = reader.decode(dct)
                        if t > 15:
                            raise ValueError(
                                f"corrupt JPEG: DC category {t}"
                            )
                        diff = _extend(reader.receive(t), t)
                        preds[ci] += diff
                        coeffs[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = reader.decode(act)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("corrupt JPEG: AC overflow")
                            coeffs[_ZIGZAG[k]] = _extend(reader.receive(s), s)
                            k += 1
            mcu_index += 1

    return _assemble(
        [(h, v, qt, blocks) for h, v, qt, _dct, _act, blocks in planes],
        width,
        height,
        hmax,
        vmax,
        mcux,
        mcuy,
    )


def _assemble(planes, width, height, hmax, vmax, mcux, mcuy):
    """Dequantize + IDCT every block of every plane (one einsum each),
    reassemble/upsample/crop, and color-convert — shared by the
    baseline single-scan path and the progressive finalize."""
    out_planes = []
    for h, v, qt, blocks in planes:
        spatial = blocks.reshape(-1, 8, 8) * qt[None, :, :]
        pix = np.einsum("ij,njk,kl->nil", _C.T, spatial.astype(np.float64), _C)
        pix = np.clip(np.round(pix) + 128, 0, 255).astype(np.uint8)
        # blocks are stored row-major over the component's block grid
        bw, bh_ = mcux * h, mcuy * v
        plane = (
            pix.reshape(bh_, bw, 8, 8).transpose(0, 2, 1, 3).reshape(bh_ * 8, bw * 8)
        )
        # upsample to full MCU-grid resolution, then crop
        if h != hmax or v != vmax:
            plane = np.repeat(np.repeat(plane, vmax // v, axis=0), hmax // h, axis=1)
        out_planes.append(plane[:height, :width])

    if len(out_planes) == 1:
        return out_planes[0].tobytes(), width, height, "L"
    if len(out_planes) != 3:
        raise ValueError(f"unsupported JPEG component count {len(out_planes)}")
    y = out_planes[0].astype(np.float64)
    cb = out_planes[1].astype(np.float64) - 128.0
    cr = out_planes[2].astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack(
        [np.clip(np.round(c), 0, 255).astype(np.uint8) for c in (r, g, b)], axis=-1
    )
    return rgb.tobytes(), width, height, "RGB"


# --------------------------------------------------------------------
# Encode (fixture builder; T.81 Annex K tables)
# --------------------------------------------------------------------

# Annex K.1/K.2 quantization tables (quality 50), zig-zag order applied
# at write time.
_Q_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int32,
)
_Q_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int32,
)

# Annex K.3 typical Huffman tables: (counts[16], values).
_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    bytes(range(12)),
)
_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    bytes(range(12)),
)
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    bytes(
        [
            0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
            0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
            0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
            0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
            0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
            0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
            0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
            0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
            0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
            0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
            0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
            0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
            0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
            0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
            0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
        ]
    ),
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    bytes(
        [
            0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
            0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
            0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
            0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
            0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
            0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
            0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
            0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
            0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
            0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
            0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
            0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
            0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
            0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
            0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
        ]
    ),
)


def _build_encode_map(counts, values):
    code = 0
    k = 0
    table = {}
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


class _BitWriter:
    __slots__ = ("out", "bits", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.bits = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.bits = (self.bits << length) | code
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.bits >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def restart(self, n: int) -> None:
        """Byte-align and emit an RSTn marker (markers are not stuffed)."""
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)
        self.out += bytes([0xFF, 0xD0 + n])

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)
        return bytes(self.out)


def _encode_block(row: np.ndarray, dc_map, ac_map, w: _BitWriter, pred: int) -> int:
    """Entropy-code one already-quantized zig-zag block. Returns the
    updated DC predictor."""
    diff = int(row[0]) - pred
    pred = int(row[0])
    nbits_ = abs(diff).bit_length()
    code, length = dc_map[nbits_]
    w.put(code, length)
    if nbits_:
        w.put(diff if diff > 0 else diff + (1 << nbits_) - 1, nbits_)
    run = 0
    nz = np.nonzero(row[1:])[0]
    last = nz[-1] + 1 if len(nz) else 0
    for k in range(1, last + 1):
        v = int(row[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_map[0xF0]
            w.put(code, length)
            run -= 16
        nbits_ = abs(v).bit_length()
        code, length = ac_map[(run << 4) | nbits_]
        w.put(code, length)
        w.put(v if v > 0 else v + (1 << nbits_) - 1, nbits_)
        run = 0
    if last < 63:
        code, length = ac_map[0x00]
        w.put(code, length)
    return pred


def _quantize_plane(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Forward-DCT + quantize all 8x8 blocks of a plane; returns zig-zag
    rows, one per block, row-major over the block grid."""
    h, w = plane.shape
    blocks = (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )
    dct = np.einsum("ij,njk,kl->nil", _C, blocks.astype(np.float64) - 128.0, _C.T)
    quant = np.round(dct / q[None, :, :]).astype(np.int32).reshape(-1, 64)
    return quant[:, _ZIGZAG]


def encode_jpeg(
    pixels: bytes,
    width: int,
    height: int,
    mode: str = "RGB",
    subsample: str = "4:4:4",
    restart_interval: int = 0,
) -> bytes:
    """Minimal baseline JPEG writer (Annex K tables) — the test-side
    inverse of :func:`decode_jpeg`, for building fixtures without PIL.
    Supports modes L and RGB at 8-bit depth; RGB optionally chroma
    subsampled ('4:4:4', '4:2:2', or '4:2:0' — box-filter downsample);
    ``restart_interval`` emits DRI + RSTn markers every N MCUs."""
    if mode not in ("L", "RGB"):
        raise ValueError(f"unsupported mode {mode!r}")
    factors = {"4:4:4": (1, 1), "4:2:2": (2, 1), "4:2:0": (2, 2)}
    if subsample not in factors:
        raise ValueError(f"unsupported subsampling {subsample!r}")
    sh, sv = factors[subsample] if mode == "RGB" else (1, 1)
    nchan = 1 if mode == "L" else 3
    arr = np.frombuffer(pixels, dtype=np.uint8)
    if len(arr) != width * height * nchan:
        raise ValueError("pixel buffer does not match dimensions")

    if mode == "RGB":
        rgb = arr.reshape(height, width, 3).astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if (sh, sv) != (1, 1):
            cb = _downsample(cb, sh, sv)
            cr = _downsample(cr, sh, sv)
        planes = [np.clip(np.round(p), 0, 255) for p in (y, cb, cr)]
        # (h, v) sampling factors per component: luma gets the max
        comps = [(sh, sv, 0), (1, 1, 1), (1, 1, 1)]
    else:
        planes = [arr.reshape(height, width).astype(np.float64)]
        comps = [(1, 1, 0)]

    hmax = max(h for h, _, _ in comps)
    vmax = max(v for _, v, _ in comps)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))

    out = bytearray()
    out += b"\xff" + bytes([SOI])
    # JFIF APP0
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + struct.pack(
        ">HH", 1, 1
    ) + b"\x00\x00"
    # DQT (zig-zag order on the wire)
    used_q = sorted({tq for _, _, tq in comps})
    for tq in used_q:
        q = _Q_LUMA if tq == 0 else _Q_CHROMA
        # wire order is the zig-zag SCAN of the natural-order table
        zz = q.reshape(64)[_ZIGZAG]
        out += b"\xff" + bytes([DQT]) + struct.pack(">H", 67) + bytes([tq]) + bytes(
            int(x) for x in zz
        )
    # SOF0
    ncomp = nchan
    out += (
        b"\xff"
        + bytes([SOF0])
        + struct.pack(">H", 8 + 3 * ncomp)
        + bytes([8])
        + struct.pack(">HH", height, width)
        + bytes([ncomp])
    )
    for c, (h, v, tq) in enumerate(comps):
        out += bytes([c + 1, (h << 4) | v, tq])
    # DHT
    tables = [(0x00, _DC_LUMA), (0x10, _AC_LUMA)]
    if mode == "RGB":
        tables += [(0x01, _DC_CHROMA), (0x11, _AC_CHROMA)]
    for tclass, (counts, values) in tables:
        out += (
            b"\xff"
            + bytes([DHT])
            + struct.pack(">H", 19 + len(values))
            + bytes([tclass])
            + bytes(counts)
            + values
        )
    # DRI
    if restart_interval:
        out += b"\xff" + bytes([DRI]) + struct.pack(">HH", 4, restart_interval)
    # SOS
    out += b"\xff" + bytes([SOS]) + struct.pack(">H", 6 + 2 * ncomp) + bytes([ncomp])
    for c in range(ncomp):
        out += bytes([c + 1, 0x00 if c == 0 else 0x11])
    out += bytes([0, 63, 0])

    dc_l = _build_encode_map(*_DC_LUMA)
    ac_l = _build_encode_map(*_AC_LUMA)
    dc_c = _build_encode_map(*_DC_CHROMA)
    ac_c = _build_encode_map(*_AC_CHROMA)

    # Quantize every component padded to its MCU-grid size; blocks are
    # row-major over the component's block grid (bh_ = mcuy*v rows,
    # bw = mcux*h cols) — the same layout the decoder reassembles.
    zigzags = []
    for (h, v, tq), plane in zip(comps, planes):
        ph, pw = mcuy * v * 8, mcux * h * 8
        padded = np.pad(
            plane,
            ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])),
            mode="edge",
        )
        zigzags.append(_quantize_plane(padded, (_Q_LUMA if tq == 0 else _Q_CHROMA).reshape(8, 8)))

    w = _BitWriter()
    preds = [0] * ncomp
    rst = 0
    mcu_index = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if (
                restart_interval
                and mcu_index
                and mcu_index % restart_interval == 0
            ):
                w.restart(rst)
                rst = (rst + 1) & 7
                preds = [0] * ncomp
            mcu_index += 1
            for c, (h, v, _tq) in enumerate(comps):
                bw = mcux * h
                for bv in range(v):
                    for bh in range(h):
                        bi = (my * v + bv) * bw + mx * h + bh
                        preds[c] = _encode_block(
                            zigzags[c][bi],
                            dc_l if c == 0 else dc_c,
                            ac_l if c == 0 else ac_c,
                            w,
                            preds[c],
                        )
    out += w.flush()
    out += b"\xff" + bytes([EOI])
    return bytes(out)


def _downsample(plane: np.ndarray, sh: int, sv: int) -> np.ndarray:
    """Box-filter downsample by (sh, sv), edge-padding odd dimensions."""
    h, w = plane.shape
    ph, pw = -(-h // sv) * sv, -(-w // sh) * sh
    padded = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    return padded.reshape(ph // sv, sv, pw // sh, sh).mean(axis=(1, 3))


# --------------------------------------------------------------------
# Progressive encode (fixture builder for the SOF2 decode path)
# --------------------------------------------------------------------

# Near-uniform AC table covering ALL 256 symbols: progressive AC scans
# emit EOBn symbols ((n << 4) | 0) that the Annex K tables do not
# contain. 128 codes of length 8 + 128 of length 9 are canonical,
# prefix-free (Kraft sum 0.75), fit the one-byte DHT count fields, and
# never assign an all-ones code — a legal, if uncompressed, table that
# keeps the fixture writer tiny.
_AC_UNIFORM = ([0, 0, 0, 0, 0, 0, 0, 128, 128, 0, 0, 0, 0, 0, 0, 0], bytes(range(256)))


class _ProgressiveACState:
    """Per-scan AC encoder state: the EOB run counter and the buffered
    correction bits that must follow the next emitted symbol (T.81
    G.1.2.2/G.1.2.3 encoder side)."""

    __slots__ = ("writer", "ac_map", "eob_run", "pending")

    def __init__(self, writer: _BitWriter, ac_map):
        self.writer = writer
        self.ac_map = ac_map
        self.eob_run = 0
        self.pending: list[int] = []

    def emit_symbol(self, sym: int) -> None:
        code, length = self.ac_map[sym]
        self.writer.put(code, length)

    def flush_pending(self) -> None:
        for bit in self.pending:
            self.writer.put(bit, 1)
        self.pending = []

    def flush_eobrun(self) -> None:
        if self.eob_run == 0:
            return
        nbits = self.eob_run.bit_length() - 1
        self.emit_symbol(nbits << 4)
        if nbits:
            self.writer.put(self.eob_run - (1 << nbits), nbits)
        self.eob_run = 0
        self.flush_pending()


def _encode_ac_first_block(state, zz, ss, se, al):
    """AC band of one block, first scan (Ah=0): run/size over the
    point-transformed magnitudes, EOB folded into the scan's EOB run."""
    w = state.writer
    r = 0
    for k in range(ss, se + 1):
        v = int(zz[k])
        temp = (abs(v)) >> al
        if temp == 0:
            r += 1
            continue
        state.flush_eobrun()
        while r > 15:
            state.emit_symbol(0xF0)
            r -= 16
        nbits = temp.bit_length()
        state.emit_symbol((r << 4) | nbits)
        # magnitude bits: value if positive, one's-complement if negative
        w.put(temp if v > 0 else (temp ^ ((1 << nbits) - 1)), nbits)
        r = 0
    if r > 0:
        state.eob_run += 1
        if state.eob_run == 0x7FFF:
            state.flush_eobrun()


def _encode_ac_refine_block(state, zz, ss, se, al):
    """AC band of one block, refinement scan (Ah=Al+1): correction bits
    for history-nonzero coefficients, newly-nonzero placements, EOB run
    with buffered bits — the encoder mirror of ``_refine_ac``.

    Two bit buffers, exactly the T.81/libjpeg BE-vs-BR split:
    ``state.pending`` holds correction bits of blocks ALREADY committed
    to the EOB run (the decoder replays them while draining the run);
    the local ``br`` holds THIS block's bits, which must follow this
    block's own next symbol — or join ``pending`` only if the whole
    block folds into the EOB run."""
    w = state.writer
    absvals = [0] * (se + 1)
    eob = ss - 1
    for k in range(ss, se + 1):
        t = abs(int(zz[k])) >> al
        absvals[k] = t
        if t == 1:
            eob = k
    r = 0
    br: list[int] = []
    for k in range(ss, se + 1):
        temp = absvals[k]
        if temp == 0:
            r += 1
            continue
        while r > 15 and k <= eob:
            state.flush_eobrun()
            state.emit_symbol(0xF0)
            r -= 16
            for bit in br:
                w.put(bit, 1)
            br = []
        if temp > 1:
            # history-nonzero: buffer its correction bit
            br.append(temp & 1)
            continue
        # newly nonzero at this precision: place ±(1 << Al)
        state.flush_eobrun()
        state.emit_symbol((r << 4) | 1)
        w.put(1 if int(zz[k]) > 0 else 0, 1)
        for bit in br:
            w.put(bit, 1)
        br = []
        r = 0
    if r > 0 or br:
        state.eob_run += 1
        state.pending.extend(br)
        if state.eob_run == 0x7FFF:
            state.flush_eobrun()


def encode_jpeg_progressive(
    pixels: bytes,
    width: int,
    height: int,
    mode: str = "RGB",
    subsample: str = "4:4:4",
    ac_bands: tuple = ((1, 5), (6, 63)),
) -> bytes:
    """Minimal progressive (SOF2) JPEG writer — the fixture-building
    twin of :func:`decode_jpeg`'s progressive path. Scan script covers
    every decoder branch: interleaved DC first (Al=1), per-component
    spectral-selection AC first scans (Al=1, with EOB runs), a DC
    refinement scan, and per-component AC refinement scans (Al=0, with
    buffered correction bits). Coefficients are quantized identically
    to :func:`encode_jpeg`, so the progressive and baseline encodings
    of the same pixels decode to byte-identical output."""
    if mode not in ("L", "RGB"):
        raise ValueError(f"unsupported mode {mode!r}")
    factors = {"4:4:4": (1, 1), "4:2:2": (2, 1), "4:2:0": (2, 2)}
    if subsample not in factors:
        raise ValueError(f"unsupported subsampling {subsample!r}")
    sh, sv = factors[subsample] if mode == "RGB" else (1, 1)
    nchan = 1 if mode == "L" else 3
    arr = np.frombuffer(pixels, dtype=np.uint8)
    if len(arr) != width * height * nchan:
        raise ValueError("pixel buffer does not match dimensions")

    if mode == "RGB":
        rgb = arr.reshape(height, width, 3).astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if (sh, sv) != (1, 1):
            cb = _downsample(cb, sh, sv)
            cr = _downsample(cr, sh, sv)
        planes = [np.clip(np.round(p), 0, 255) for p in (y, cb, cr)]
        comps = [(sh, sv, 0), (1, 1, 1), (1, 1, 1)]
    else:
        planes = [arr.reshape(height, width).astype(np.float64)]
        comps = [(1, 1, 0)]

    hmax = max(h for h, _, _ in comps)
    vmax = max(v for _, v, _ in comps)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))

    zigzags = []
    for (h, v, tq), plane in zip(comps, planes):
        ph, pw = mcuy * v * 8, mcux * h * 8
        padded = np.pad(
            plane,
            ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])),
            mode="edge",
        )
        zigzags.append(
            _quantize_plane(
                padded, (_Q_LUMA if tq == 0 else _Q_CHROMA).reshape(8, 8)
            )
        )

    out = bytearray()
    out += b"\xff" + bytes([SOI])
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + struct.pack(
        ">HH", 1, 1
    ) + b"\x00\x00"
    for tq in sorted({tq for _, _, tq in comps}):
        q = _Q_LUMA if tq == 0 else _Q_CHROMA
        zz = q.reshape(64)[_ZIGZAG]
        out += b"\xff" + bytes([DQT]) + struct.pack(">H", 67) + bytes([tq]) + bytes(
            int(x) for x in zz
        )
    ncomp = nchan
    out += (
        b"\xff"
        + bytes([SOF2])
        + struct.pack(">H", 8 + 3 * ncomp)
        + bytes([8])
        + struct.pack(">HH", height, width)
        + bytes([ncomp])
    )
    for c, (h, v, tq) in enumerate(comps):
        out += bytes([c + 1, (h << 4) | v, tq])
    tables = [(0x00, _DC_LUMA), (0x10, _AC_UNIFORM)]
    if mode == "RGB":
        tables += [(0x01, _DC_CHROMA)]
    for tclass, (counts, values) in tables:
        out += (
            b"\xff"
            + bytes([DHT])
            + struct.pack(">H", 19 + len(values))
            + bytes([tclass])
            + bytes(counts)
            + values
        )

    dc_maps = [
        _build_encode_map(*(_DC_LUMA if c == 0 else _DC_CHROMA))
        for c in range(ncomp)
    ]
    ac_map = _build_encode_map(*_AC_UNIFORM)

    def sos_header(comp_specs, ss, se, ah, al):
        hdr = bytearray()
        hdr += b"\xff" + bytes([SOS]) + struct.pack(">H", 6 + 2 * len(comp_specs))
        hdr += bytes([len(comp_specs)])
        for c, td, ta in comp_specs:
            hdr += bytes([c + 1, (td << 4) | ta])
        hdr += bytes([ss, se, (ah << 4) | al])
        return bytes(hdr)

    def dc_scan(ah, al):
        specs = [(c, (0 if c == 0 else 1), 0) for c in range(ncomp)]
        body = bytearray(sos_header(specs, 0, 0, ah, al))
        w = _BitWriter()
        preds = [0] * ncomp
        for my in range(mcuy):
            for mx in range(mcux):
                for c, (h, v, _tq) in enumerate(comps):
                    bw = mcux * h
                    for bv in range(v):
                        for bh in range(h):
                            bi = (my * v + bv) * bw + mx * h + bh
                            dc = int(zigzags[c][bi][0]) >> al  # arithmetic
                            if ah == 0:
                                diff = dc - preds[c]
                                preds[c] = dc
                                nbits = abs(diff).bit_length()
                                code, length = dc_maps[c][nbits]
                                w.put(code, length)
                                if nbits:
                                    w.put(
                                        diff
                                        if diff > 0
                                        else diff + (1 << nbits) - 1,
                                        nbits,
                                    )
                            else:
                                w.put(dc & 1, 1)
        body += w.flush()
        return bytes(body)

    def ac_scan(c, ss, se, ah, al):
        h, v, _tq = comps[c]
        body = bytearray(sos_header([(c, 0, 0)], ss, se, ah, al))
        w = _BitWriter()
        state = _ProgressiveACState(w, ac_map)
        wb, hb = _component_block_grid(width, height, h, v, hmax, vmax)
        stride = mcux * h
        for row in range(hb):
            for col in range(wb):
                zz = zigzags[c][row * stride + col]
                if ah == 0:
                    _encode_ac_first_block(state, zz, ss, se, al)
                else:
                    _encode_ac_refine_block(state, zz, ss, se, al)
        state.flush_eobrun()
        body += w.flush()
        return bytes(body)

    out += dc_scan(0, 1)  # DC first, Al=1
    for c in range(ncomp):  # AC first scans per spectral band, Al=1
        for ss, se in ac_bands:
            out += ac_scan(c, ss, se, 0, 1)
    out += dc_scan(1, 0)  # DC refinement
    for c in range(ncomp):  # AC refinement scans, Al=0
        for ss, se in ac_bands:
            out += ac_scan(c, ss, se, 1, 0)
    out += b"\xff" + bytes([EOI])
    return bytes(out)


def jpeg_marker_census(data: bytes) -> dict:
    """Wire-level marker census WITHOUT entropy decoding — the
    structural audit an ingest runs to measure corruption-resilience
    budgets: restart markers bound the blast radius of a bit flip to
    one restart interval, so ``n_rst_markers`` is the number of resync
    points a decoder gets. Returns ``{width, height, progressive,
    restart_interval, n_scans, n_rst_markers}``. Walks segments like
    the decoder (T.81 B.1.1.2: stuffed 0xFF00 bytes in entropy data
    are literals, 0xFFD0-D7 are restart markers, anything else ends
    the scan); malformed structure raises ValueError."""
    if len(data) < 2 or data[0] != 0xFF or data[1] != SOI:
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    width = height = None
    progressive = False
    restart_interval = 0
    n_scans = 0
    n_rst = 0
    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("corrupt JPEG: expected marker")
        # T.81 B.1.1.2: any marker may be preceded by extra 0xFF fill
        # bytes — skip them before reading the marker id (r10 advice:
        # valid third-party JPEGs were mis-walked here).
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        if pos + 2 > len(data):
            break
        marker = data[pos + 1]
        if marker == EOI:
            break
        # standalone markers carry NO length segment: TEM (0x01),
        # RSTn (0xD0-0xD7, legal though stray outside entropy data),
        # and a redundant SOI (0xD8) — treating their following bytes
        # as a length mis-walks valid streams (r10 advice).
        if marker == 0x01 or 0xD0 <= marker <= 0xD8:
            pos += 2
            continue
        if pos + 4 > len(data):
            raise ValueError("corrupt JPEG: truncated segment")
        seglen = (data[pos + 2] << 8) | data[pos + 3]
        if seglen < 2 or pos + 2 + seglen > len(data):
            raise ValueError("corrupt JPEG: truncated segment")
        seg = data[pos + 4 : pos + 2 + seglen]
        if marker in (SOF0, SOF1, SOF2):
            progressive = marker == SOF2
            height, width = struct.unpack(">HH", seg[1:5])
        elif marker == DRI:
            (restart_interval,) = struct.unpack(">H", seg[:2])
        pos += 2 + seglen
        if marker == SOS:
            n_scans += 1
            while pos + 1 < len(data):
                if data[pos] == 0xFF:
                    nxt = data[pos + 1]
                    if nxt == 0x00:
                        pos += 2
                        continue
                    if 0xD0 <= nxt <= 0xD7:
                        n_rst += 1
                        pos += 2
                        continue
                    break
                pos += 1
    if width is None:
        raise ValueError("corrupt JPEG: no frame header")
    return {
        "width": int(width),
        "height": int(height),
        "progressive": progressive,
        "restart_interval": int(restart_interval),
        "n_scans": n_scans,
        "n_rst_markers": n_rst,
    }
