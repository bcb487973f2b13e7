"""Property and conformance tests for the pure-Python lossy-VP8 codec
(functions/vp8_codec.py, r8 — closes the T3 envelope's last synthetic
fallback). The encoder reconstructs exactly like the decoder, so
decode(encode(x)) is deterministic and pinned; quality properties use
PSNR bounds."""

import math
import random

import pytest

from tensorflow_recorder_spark.functions import vp8_codec as v8


def psnr(a: bytes, b: bytes) -> float:
    mse = sum((x - y) ** 2 for x, y in zip(a, b)) / len(a)
    return 10 * math.log10(255 * 255 / max(mse, 1e-9))


def gradient(w, h):
    out = bytearray()
    for y in range(h):
        for x in range(w):
            out += bytes((min(255, 8 * x), min(255, 8 * y), 128))
    return bytes(out)


class TestBoolCoder:
    def test_random_bool_stream_roundtrip(self):
        rng = random.Random(11)
        bits = [(rng.randint(0, 1), rng.randint(1, 254)) for _ in range(20000)]
        enc = v8.BoolEncoder()
        for b, p in bits:
            enc.put_bool(b, p)
        dec = v8.BoolDecoder(enc.flush())
        assert all(dec.get_bool(p) == b for b, p in bits)

    def test_literals_and_trees(self):
        rng = random.Random(5)
        enc = v8.BoolEncoder()
        lits = [rng.randint(0, 127) for _ in range(300)]
        toks = [rng.randint(0, 11) for _ in range(300)]
        for x in lits:
            enc.put_literal(x, 7)
        for t in toks:
            enc.put_tree(v8.COEFF_TREE, (180,) * 11, t)
        dec = v8.BoolDecoder(enc.flush())
        assert [dec.get_literal(7) for _ in lits] == lits
        assert [dec.get_tree(v8.COEFF_TREE, (180,) * 11) for _ in toks] == toks

    def test_extreme_probabilities(self):
        enc = v8.BoolEncoder()
        seq = [(0, 1), (1, 1), (0, 254), (1, 254)] * 500
        for b, p in seq:
            enc.put_bool(b, p)
        dec = v8.BoolDecoder(enc.flush())
        assert all(dec.get_bool(p) == b for b, p in seq)


class TestTransforms:
    def test_idct_fdct_near_identity(self):
        rng = random.Random(3)
        for _ in range(300):
            blk = [rng.randint(-255, 255) for _ in range(16)]
            out = v8.idct4x4(v8.fdct4x4(blk))
            assert max(abs(a - b) for a, b in zip(out, blk)) <= 2

    def test_wht_near_identity(self):
        rng = random.Random(4)
        for _ in range(300):
            blk = [rng.randint(-1000, 1000) for _ in range(16)]
            out = v8.iwht4x4(v8.fwht4x4(blk))
            assert max(abs(a - b) for a, b in zip(out, blk)) <= 2

    def test_dc_only_idct_is_flat(self):
        out = v8.idct4x4([80] + [0] * 15)
        assert len(set(out)) == 1
        assert out[0] == (80 + 4) >> 3  # DC gain: (dc + 4) >> 3

    def test_dequant_factors_spec_rules(self):
        dq = v8.dequant_factors(0)
        assert dq["y1"] == (4, 4)
        assert dq["y2"][0] == 8  # dc * 2
        assert dq["y2"][1] == 8  # ac floor
        dq = v8.dequant_factors(127)
        assert dq["uv"][0] == 132  # uv dc clamp
        assert dq["y1"] == (157, 284)


class TestTokenLayer:
    @pytest.mark.parametrize("plane,first", [(0, 1), (1, 0), (2, 0), (3, 0)])
    def test_block_token_roundtrip(self, plane, first):
        rng = random.Random(plane)
        probs = [
            [[list(c) for c in band] for band in pl]
            for pl in v8.DEFAULT_COEF_PROBS
        ]
        cases = []
        for _ in range(200):
            zz = [0] * 16
            for i in range(first, 16):
                r = rng.random()
                if r < 0.5:
                    zz[i] = 0
                elif r < 0.8:
                    zz[i] = rng.randint(-4, 4)
                elif r < 0.95:
                    zz[i] = rng.randint(-66, 66)
                else:
                    zz[i] = rng.choice([-1, 1]) * rng.randint(67, 2114)
            cases.append(zz)
        enc = v8.BoolEncoder()
        ctx = 0
        nzs = []
        for zz in cases:
            nzs.append(v8._encode_coeffs(enc, probs, plane, ctx, first, zz))
            ctx = (ctx + 1) % 3
        dec = v8.BoolDecoder(enc.flush())
        ctx = 0
        for zz, nz in zip(cases, nzs):
            coeffs, got_nz = v8._decode_coeffs(dec, probs, plane, ctx, first)
            want = [0] * 16
            for i in range(16):
                want[v8.ZIGZAG[i]] = zz[i]
            # tokens carry raw (pre-dequant) values here: compare raw
            assert coeffs == want
            assert got_nz == nz
            ctx = (ctx + 1) % 3


class TestFrameRoundTrip:
    def test_smooth_image_high_psnr(self):
        px = gradient(48, 32)
        data = v8.encode_webp_vp8(px, 48, 32, qi=0)
        rgb, w, h, mode = v8.decode_webp_vp8(data)
        assert (w, h, mode) == (48, 32, "RGB")
        assert psnr(rgb, px) > 38

    def test_grayscale_near_lossless_at_q0(self):
        rng = random.Random(9)
        g = [rng.randint(0, 255) for _ in range(32 * 32)]
        px = b"".join(bytes((c, c, c)) for c in g)
        data = v8.encode_webp_vp8(px, 32, 32, qi=0)
        rgb, _, _, _ = v8.decode_webp_vp8(data)
        assert psnr(rgb, px) > 44

    def test_quality_monotone_in_qi(self):
        px = gradient(32, 32)
        scores = []
        for qi in (0, 30, 90):
            rgb, *_ = v8.decode_webp_vp8(v8.encode_webp_vp8(px, 32, 32, qi=qi))
            scores.append(psnr(rgb, px))
        assert scores[0] > scores[1] > scores[2]

    def test_bpred_arm_roundtrips(self):
        rng = random.Random(2)
        g = [rng.randint(0, 255) for _ in range(16 * 16)]
        px = b"".join(bytes((c, c, c)) for c in g)
        data = v8.encode_webp_vp8(px, 16, 16, qi=0, force_bpred=True)
        rgb, w, h, _ = v8.decode_webp_vp8(data)
        assert (w, h) == (16, 16)
        assert psnr(rgb, px) > 42

    def test_non_multiple_of_16_dims(self):
        for w, h in [(1, 1), (5, 3), (17, 21), (33, 18)]:
            px = gradient(w, h)
            rgb, dw, dh, _ = v8.decode_webp_vp8(
                v8.encode_webp_vp8(px, w, h, qi=10)
            )
            assert (dw, dh) == (w, h)
            assert len(rgb) == w * h * 3

    def test_deterministic_bytes(self):
        px = gradient(20, 12)
        a = v8.encode_webp_vp8(px, 20, 12, qi=15)
        b = v8.encode_webp_vp8(px, 20, 12, qi=15)
        assert a == b

    def test_grayscale_mode_input(self):
        g = bytes(range(0, 192, 2)) * 4  # 96 values * 4 = 16*24
        rgb, w, h, _ = v8.decode_webp_vp8(
            v8.encode_webp_vp8(g, 24, 16, mode="L", qi=0)
        )
        assert (w, h) == (24, 16)

    def test_skip_macroblocks_constant_image(self):
        # constant color -> after the first MB most coefficients are
        # zero; the stream must stay small and decode exactly
        px = bytes((120, 64, 200)) * (64 * 48)
        data = v8.encode_webp_vp8(px, 64, 48, qi=20)
        assert len(data) < 600
        rgb, w, h, _ = v8.decode_webp_vp8(data)
        assert (w, h) == (64, 48)
        assert psnr(rgb, px) > 35


class TestContainerAndErrors:
    def test_riff_layout(self):
        import struct

        px = gradient(8, 8)
        data = v8.encode_webp_vp8(px, 8, 8)
        assert data[:4] == b"RIFF" and data[8:12] == b"WEBP"
        (riff_size,) = struct.unpack_from("<I", data, 4)
        assert riff_size == len(data) - 8
        assert data[12:16] == b"VP8 "

    def test_truncated_raises_value_error(self):
        px = gradient(16, 16)
        data = v8.encode_webp_vp8(px, 16, 16)
        with pytest.raises(ValueError):
            v8.decode_webp_vp8(data[:20])

    def test_bad_start_code_raises(self):
        px = gradient(16, 16)
        data = bytearray(v8.encode_webp_vp8(px, 16, 16))
        data[23] ^= 0xFF  # inside the VP8 start code region
        with pytest.raises(ValueError):
            v8.decode_webp_vp8(bytes(data))

    def test_loader_dispatch_lossy_and_lossless(self, tmp_path):
        from tensorflow_recorder_spark.functions.vp8l_codec import (
            decode_webp,
            encode_vp8l,
        )

        px = gradient(12, 10)
        lossy = v8.encode_webp_vp8(px, 12, 10, qi=4)
        out, w, h, mode = decode_webp(lossy)
        assert (w, h, mode) == (12, 10, "RGB")
        lossless = encode_vp8l(px, 12, 10)
        out2, w2, h2, _ = decode_webp(lossless)
        assert (w2, h2) == (12, 10)
        assert out2 == px  # VP8L stays byte-exact


class TestBpredSpecTables:
    """Pin the directional sub-predictors to the RFC 6386 section 12.3
    tables (r8 review: B_VR was shifted one edge position and B_HD
    crashed with IndexError on row 0)."""

    A = [10, 20, 30, 40, 50, 60, 70, 80]
    L = [1, 2, 3, 4]
    AL = 5

    @staticmethod
    def avg2(x, y):
        return (x + y + 1) >> 1

    @staticmethod
    def avg3(x, y, z):
        return (x + 2 * y + z + 2) >> 2

    def test_b_vr_matches_spec(self):
        p = v8.predict_b(v8.B_VR, self.A, self.L, self.AL)
        a, al, L = self.A, self.AL, self.L
        # row 0: avg2 over (X,A0), (A0,A1), (A1,A2), (A2,A3)
        assert p[0] == [
            self.avg2(al, a[0]),
            self.avg2(a[0], a[1]),
            self.avg2(a[1], a[2]),
            self.avg2(a[2], a[3]),
        ]
        # row 1: avg3 over (L0,X,A0), (X,A0,A1), (A0,A1,A2), (A1,A2,A3)
        assert p[1] == [
            self.avg3(L[0], al, a[0]),
            self.avg3(al, a[0], a[1]),
            self.avg3(a[0], a[1], a[2]),
            self.avg3(a[1], a[2], a[3]),
        ]
        # rows 2/3 shift rows 0/1 right with the left-edge fills
        assert p[2] == [self.avg3(L[1], L[0], al), p[0][0], p[0][1], p[0][2]]
        assert p[3] == [self.avg3(L[2], L[1], L[0]), p[1][0], p[1][1], p[1][2]]

    def test_b_hd_matches_spec_and_does_not_crash(self):
        p = v8.predict_b(v8.B_HD, self.A, self.L, self.AL)
        a, al, L = self.A, self.AL, self.L
        assert p[0] == [
            self.avg2(L[0], al),
            self.avg3(L[0], al, a[0]),
            self.avg3(al, a[0], a[1]),
            self.avg3(a[0], a[1], a[2]),
        ]
        assert p[3] == [
            self.avg2(L[3], L[2]),
            self.avg3(L[3], L[2], L[1]),
            self.avg2(L[2], L[1]),
            self.avg3(L[2], L[1], L[0]),
        ]
        assert p[1][2] == p[0][0] and p[2][0] == p[3][2]

    def test_all_ten_submodes_run_on_any_edges(self):
        import random

        rng = random.Random(31)
        for _ in range(50):
            a = [rng.randint(0, 255) for _ in range(8)]
            left = [rng.randint(0, 255) for _ in range(4)]
            al = rng.randint(0, 255)
            for m in range(10):
                p = v8.predict_b(m, a, left, al)
                assert len(p) == 4 and all(len(r) == 4 for r in p)
                assert all(0 <= x <= 255 for r in p for x in r)


class TestCorruptMultiPartition:
    def test_truncated_partition_table_is_value_error(self):
        """r8 review: a header declaring multiple token partitions with
        a truncated body must surface as the declared ValueError
        (DISCARD route), never a raw IndexError."""
        import struct

        px = gradient(16, 16)
        good = v8.encode_webp_vp8(px, 16, 16, qi=10)
        # rebuild the frame with n_parts=4 declared but no size table:
        # flip the 2-bit partition-count literal in the header by
        # re-encoding a minimal header is fragile; instead truncate the
        # payload right after the first partition so ANY multi-byte
        # read past it must be guarded
        frame = good[20:]  # inside VP8 chunk
        tag = frame[0] | (frame[1] << 8) | (frame[2] << 16)
        part1 = tag >> 5
        cut = frame[: 10 + part1 + 1]  # 1 byte of token partition
        chunk = b"VP8 " + struct.pack("<I", len(cut)) + cut
        riff = b"WEBP" + chunk
        data = b"RIFF" + struct.pack("<I", len(riff)) + riff
        try:
            v8.decode_webp_vp8(data)  # 1-partition: may decode garbage
        except ValueError:
            pass  # also acceptable — but never IndexError

    def test_declared_multipartition_truncation(self):
        """Hand-build a first partition declaring 4 token partitions,
        then truncate: must raise ValueError."""
        import struct

        be = v8.BoolEncoder()
        be.put_bool(0, 128)  # color space
        be.put_bool(0, 128)  # clamping
        be.put_bool(0, 128)  # segmentation off
        be.put_bool(0, 128)  # filter type
        be.put_literal(0, 6)
        be.put_literal(0, 3)
        be.put_bool(0, 128)  # no lf deltas
        be.put_literal(2, 2)  # FOUR token partitions
        be.put_literal(10, 7)  # qi
        for _ in range(5):
            be.put_bool(0, 128)
        be.put_bool(0, 128)  # refresh entropy
        for pl in range(4):
            for band in range(8):
                for ctx in range(3):
                    for t in range(11):
                        be.put_bool(
                            0, v8.COEF_UPDATE_PROBS[pl][band][ctx][t]
                        )
        be.put_bool(0, 128)  # mb_no_coeff_skip off
        part1 = be.flush()
        frame = bytearray()
        tag = (len(part1) << 5) | (1 << 4)
        frame += bytes((tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF))
        frame += b"\x9d\x01\x2a"
        frame += struct.pack("<HH", 16, 16)
        frame += part1
        frame += b"\x00"  # 1 byte where a 9-byte size table must be
        with pytest.raises(ValueError):
            v8.decode_vp8_frame(bytes(frame))


class TestLoopFilter:
    """r9: RFC 6386 section 15 in-loop deblocking. The vectorized
    kernels are pinned against an independent SCALAR transcription of
    the spec pseudocode (int8 clamps, arithmetic shifts), and filtered
    streams exercise the full decode path."""

    @staticmethod
    def _c(v):
        return max(-128, min(127, v))

    def _common_adjust(self, use_outer, pix):
        c = self._c
        p1, p0, q0, q1 = pix[2] - 128, pix[3] - 128, pix[4] - 128, pix[5] - 128
        a = c((c(p1 - q1) if use_outer else 0) + 3 * (q0 - p0))
        f = c(a + 4) >> 3
        e = c(a + 3) >> 3
        pix[4] = c(q0 - f) + 128
        pix[3] = c(p0 + e) + 128
        return f

    @staticmethod
    def _mask(pix, edge, interior):
        p3, p2, p1, p0, q0, q1, q2, q3 = pix
        return (
            abs(p0 - q0) * 2 + abs(p1 - q1) // 2 <= edge
            and abs(p3 - p2) <= interior
            and abs(p2 - p1) <= interior
            and abs(p1 - p0) <= interior
            and abs(q1 - q0) <= interior
            and abs(q2 - q1) <= interior
            and abs(q3 - q2) <= interior
        )

    def _scalar_simple(self, pix, edge):
        if abs(pix[3] - pix[4]) * 2 + abs(pix[2] - pix[5]) // 2 <= edge:
            self._common_adjust(1, pix)

    def _scalar_sub(self, pix, edge, interior, hev_t):
        if not self._mask(pix, edge, interior):
            return
        hev = abs(pix[2] - pix[3]) > hev_t or abs(pix[5] - pix[4]) > hev_t
        sp1, sq1 = pix[2] - 128, pix[5] - 128
        f = self._common_adjust(1 if hev else 0, pix)
        a = (f + 1) >> 1
        if not hev:
            pix[5] = self._c(sq1 - a) + 128
            pix[2] = self._c(sp1 + a) + 128

    def _scalar_mb(self, pix, edge, interior, hev_t):
        c = self._c
        if not self._mask(pix, edge, interior):
            return
        hev = abs(pix[2] - pix[3]) > hev_t or abs(pix[5] - pix[4]) > hev_t
        if hev:
            self._common_adjust(1, pix)
            return
        p2, p1, p0 = pix[1] - 128, pix[2] - 128, pix[3] - 128
        q0, q1, q2 = pix[4] - 128, pix[5] - 128, pix[6] - 128
        w = c(c(p1 - q1) + 3 * (q0 - p0))
        a = c((27 * w + 63) >> 7)
        pix[4] = c(q0 - a) + 128
        pix[3] = c(p0 + a) + 128
        a = c((18 * w + 63) >> 7)
        pix[5] = c(q1 - a) + 128
        pix[2] = c(p1 + a) + 128
        a = c((9 * w + 63) >> 7)
        pix[6] = c(q2 - a) + 128
        pix[1] = c(p2 + a) + 128

    def test_kernels_match_scalar_reference(self):
        import numpy as np
        import random

        rng = random.Random(96)
        changed = 0  # guard against a vacuous pass (no mask ever firing)
        for trial in range(40):
            n = rng.randrange(1, 24)
            seg = [[rng.randrange(256) for _ in range(n)] for _ in range(8)]
            # bias some trials toward smooth edges so masks actually pass
            if trial % 2:
                base = rng.randrange(40, 200)
                seg = [
                    [max(0, min(255, base + rng.randrange(-6, 7))) for _ in range(n)]
                    for _ in range(8)
                ]
            lvl = rng.randrange(1, 64)
            sharp = rng.randrange(0, 8)
            mbe, sbe, interior, hev_t = v8.loop_filter_limits(lvl, sharp)
            for kernel, scalar, args in (
                (v8._lf_simple, self._scalar_simple, (mbe,)),
                (v8._lf_normal_sub, self._scalar_sub, (sbe, interior, hev_t)),
                (v8._lf_normal_mb, self._scalar_mb, (mbe, interior, hev_t)),
            ):
                arr = np.array(seg, dtype=np.int32)
                kernel([arr[i] for i in range(8)], *args)
                want = [list(col) for col in zip(*seg)]  # per-position pix
                for pix in want:
                    scalar(pix, *args)
                want_arr = np.array(want, dtype=np.int32).T
                assert (arr == want_arr).all(), (trial, args)
                changed += int((arr != np.array(seg, dtype=np.int32)).any())
        assert changed >= 30  # the kernels were genuinely exercised

    def test_limits_match_spec_rules(self):
        # sharpness 0: interior == level (floored at 1); high sharpness caps
        assert v8.loop_filter_limits(30, 0) == (64 + 30, 60 + 30, 30, 1)
        mbe, sbe, interior, hev = v8.loop_filter_limits(30, 5)
        assert interior == min(30 >> 2, 9 - 5) and hev == 1
        assert v8.loop_filter_limits(63, 0)[3] == 2
        assert v8.loop_filter_limits(14, 0)[3] == 0
        assert v8.loop_filter_limits(1, 7)[2] == 1  # floor at 1

    def test_filtered_stream_decodes_and_differs(self):
        px = gradient(48, 32)
        plain = v8.decode_vp8_frame(
            v8.encode_vp8_frame(px, 48, 32, qi=40)
        )[0]
        for kw in (
            dict(filter_level=40),
            dict(filter_level=63, sharpness=3),
            dict(filter_level=24, filter_simple=True),
        ):
            enc = v8.encode_vp8_frame(px, 48, 32, qi=40, **kw)
            out1, w, h = v8.decode_vp8_frame(enc)
            out2, _, _ = v8.decode_vp8_frame(enc)
            assert (w, h) == (48, 32)
            assert out1 == out2  # deterministic
            assert out1 != plain  # the filter actually fired
            # smoothing, not destruction: stays close to the unfiltered
            assert psnr(out1, plain) > 25.0, kw

    def test_zero_level_is_bit_identical_to_prefilter_decode(self):
        px = gradient(33, 17)
        a = v8.decode_vp8_frame(v8.encode_vp8_frame(px, 33, 17, qi=8))[0]
        b = v8.decode_vp8_frame(
            v8.encode_vp8_frame(px, 33, 17, qi=8, filter_level=0)
        )[0]
        assert a == b
