"""Round-11 verdict/advice regression pins.

r10 advice items: JPEG fill-byte / standalone-marker walking, the
2x decompression-bomb threshold (pinned in test_codec_property.py),
the ANMF-local ALPH scoping in the WebP chunk walk; r10 verdict item
1's walker totality fix is pinned in test_codec_property.py.
"""

import pytest


def test_jpeg_walk_tolerates_fill_bytes_and_standalone_markers():
    """T.81 B.1.1.2: any marker may be preceded by 0xFF fill bytes,
    and TEM (0x01) / RSTn / redundant SOI carry no length segment.
    Valid third-party JPEGs use both; the census (and decoder) must
    walk them instead of misreading the next bytes as a length
    (r10 advice item 3)."""
    from tensorflow_recorder_spark.functions.jpeg_codec import (
        decode_jpeg,
        encode_jpeg,
        jpeg_marker_census,
    )

    px = bytes((p * 7) % 256 for p in range(18 * 10 * 3))
    j = encode_jpeg(px, 18, 10, "RGB", restart_interval=2)
    base_census = jpeg_marker_census(j)
    base_pixels = decode_jpeg(j)

    # splice right after SOI: a TEM standalone marker, a stray RST1
    # (legal though parameterless outside entropy data), and a run of
    # 0xFF fill bytes before the first real segment
    spliced = j[:2] + b"\xff\x01" + b"\xff\xd1" + b"\xff\xff" + j[2:]
    c = jpeg_marker_census(spliced)
    assert c == base_census  # stray RST outside a scan is not a resync
    assert decode_jpeg(spliced) == base_pixels

    # fill byte immediately before an ordinary tabled segment
    dqt = j.index(b"\xff\xdb")
    filled = j[:dqt] + b"\xff" + j[dqt:]
    assert jpeg_marker_census(filled) == base_census
    assert decode_jpeg(filled) == base_pixels


def test_bench_quiesce_and_splice_fields():
    """r10 verdict items 3+4: bench.py must carry a pre-flight quiesce
    (a fixed sleep is provably not enough) and a transient-row splice
    (flagged rising-sample rows re-run solo, committed medians =
    steady state, transient samples kept in-record)."""
    import time

    import bench

    # quiesce returns immediately when BOTH bars (loadavg and the
    # r11-continuation memory-bandwidth probe) are already met; the
    # mem bar is disabled here so the assertion doesn't depend on live
    # host bus conditions
    t0 = time.time()
    waited = bench._quiesce(
        threshold=1e9, max_wait_s=30, mem_threshold_s=float("inf")
    )
    assert time.time() - t0 < 1.0 and waited < 1.0
    # and caps the wait rather than spinning forever under load
    t0 = time.time()
    waited = bench._quiesce(
        threshold=-1.0, max_wait_s=0.2, poll_s=0.05,
        mem_threshold_s=float("inf"),
    )
    assert waited >= 0.2 and time.time() - t0 < 5.0

    # the dispersion flag catches the non-monotonic bus-stall swing the
    # rising flag misses, but not steady samples or sub-second jitter
    assert bench._dispersed([1.0, 11.1, 45.8, 5.2])
    assert not bench._dispersed([9.9, 3.0, 3.1, 2.9])
    assert not bench._dispersed([0.1, 0.05, 0.15, 0.04])
    assert bench._rising([1.0, 3.0, 4.0, 5.0])

    src = open(bench.__file__).read()
    for field in (
        '"quiesce_wait_s"',
        '"rerun_quiesce_wait_s"',
        '"spliced_queries"',
        '"queries_samples_flagged_initial"',
        '"mem_reference_s_before"',
        '"mem_reference_s_after"',
        '"dispersed_sample_queries"',
        '"stall_guard_events"',
        '"stall_guard_wait_s"',
    ):
        assert field in src


def test_tfrecord_load_path_totality():
    """r11: the TFRecord load path (S5/C5) carries the same declared-
    ValueError totality contract as the image codecs — corrupt shards
    are a loud declared failure (tf.data's DataLossError analog),
    never an undeclared executor crash. Pre-fix leaks: truncated
    record -> struct.error from _U32.unpack(b''); bit-flipped gzip ->
    BadGzipFile; corrupt proto -> IndexError (truncated varint),
    TypeError/AttributeError (wire-type flips), struct.error (short
    fixed32)."""
    import numpy as np

    from tensorflow_recorder_spark.functions.example_proto import (
        decode_example,
        encode_example,
    )
    from tensorflow_recorder_spark.functions.tfrecord_io import (
        read_file_records,
        records_to_bytes,
    )

    ex = encode_example(
        {
            "a": ("bytes", [b"hello", b"world"]),
            "b": ("int64", [1, -2, 3]),
            "c": ("float", [0.5, -1.25]),
        }
    )
    rng = np.random.RandomState(0)
    for comp in (False, True):
        blob = records_to_bytes([ex, ex], compress=comp)
        # exhaustive single-byte XOR + every truncation point
        mutants = [
            bytes(
                blob[:pos] + bytes([blob[pos] ^ 0xFF]) + blob[pos + 1:]
            )
            for pos in range(len(blob))
        ] + [blob[:cut] for cut in range(len(blob))]
        # plus seeded multi-flips
        for _ in range(2000):
            m = bytearray(blob)
            for _ in range(rng.randint(1, 4)):
                m[rng.randint(len(m))] = rng.randint(256)
            mutants.append(bytes(m))
        for m in mutants:
            try:
                for record in read_file_records(m):
                    decode_example(record)
            except ValueError:
                pass  # the declared route — anything else fails the test


def test_blas_topk_matches_generic_and_tolerates_nulls(spark):
    """r11: brute_force_topk_blas must return the exact rows of the
    generic salted operator on a small corpus (same scores at digit-4,
    same (score desc, id asc) tie-break), and must DROP null vectors
    instead of crashing the Arrow batch (the generic path scores them
    NULL, ranking last — the documented narrowing)."""
    from pyspark.sql import functions as F, types as T

    from tensorflow_recorder_spark.operators.similarity import (
        brute_force_topk,
        brute_force_topk_blas,
    )

    rows = [
        (i, [float((i * 7 + j * 3) % 11) - 5.0 for j in range(8)])
        for i in range(30)
    ] + [(30, None)]
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ]
    )
    df = spark.createDataFrame(rows, schema)
    queries = df.where(F.col("vec_id") < 3)
    a = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["score"])
        for r in brute_force_topk(df, queries, k=5).collect()
    }
    b = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["score"])
        for r in brute_force_topk_blas(df, queries, k=5).collect()
    }
    assert a == b


def test_decode_tiff_pages_roundtrip_and_totality():
    """r11: decode_tiff_pages extracts EVERY page of the IFD chain
    (page 1 equals decode_tiff) and keeps the declared-ValueError
    totality contract on the r10 judge corruption shape (required tag
    present with an EMPTY value list)."""
    import struct

    import numpy as np

    from tensorflow_recorder_spark.functions.tiff_codec import (
        decode_tiff,
        decode_tiff_pages,
        encode_tiff_multipage,
    )

    def _rgb(seed, w, h):
        return (
            np.random.RandomState(seed)
            .randint(0, 256, (h, w, 3))
            .astype("uint8")
            .tobytes()
        )

    pages = [
        (_rgb(0, 4, 3), 4, 3, "RGB", "packbits"),
        (_rgb(1, 5, 4), 5, 4, "RGB", "deflate"),
        (_rgb(2, 6, 5), 6, 5, "RGB", "lzw"),
    ]
    data = encode_tiff_multipage(pages)
    decoded = decode_tiff_pages(data)
    assert len(decoded) == 3
    for (px, w, h, mode), p in zip(decoded, pages):
        assert (w, h, mode) == (p[1], p[2], "RGB") and px == p[0]
    assert decoded[0] == decode_tiff(data)

    # zero page 2's ImageLength count field -> present-but-empty tag
    d = bytearray(data)
    (n1,) = struct.unpack_from("<H", d, 8)
    (pos2,) = struct.unpack_from("<I", d, 8 + 2 + 12 * n1)
    (n2,) = struct.unpack_from("<H", d, pos2)
    for t in range(n2):
        off = pos2 + 2 + 12 * t
        (tag,) = struct.unpack_from("<H", d, off)
        if tag == 257:
            struct.pack_into("<I", d, off + 4, 0)
            break
    with pytest.raises(ValueError):
        decode_tiff_pages(bytes(d))


def test_anmf_frame_does_not_inherit_top_level_alph():
    """A stray top-level ALPH before an ANMF frame must NOT be applied
    to the frame's pixels — alpha is frame-local per the WebP container
    spec (ANMF's own sub-chunks); carrying the stale top-level plane in
    silently alpha-tinted lossy animated frames (r10 advice item 4).
    Uses a lossy VP8 frame because that is the path where ALPH planes
    are applied (VP8L carries native alpha)."""
    from tensorflow_recorder_spark.functions.vp8_codec import (
        encode_vp8_frame,
    )
    from tensorflow_recorder_spark.functions.vp8l_codec import (
        _find_image_chunk,
        build_anmf,
        build_anim,
        build_vp8x,
        build_webp,
        decode_webp,
    )

    w, h = 8, 8
    px = bytes((p * 3) % 256 for p in range(w * h * 3))
    body = encode_vp8_frame(px, w, h)

    # top-level raw (method-0, unfiltered) ALPH plane of constant 0x55
    # that no frame owns
    alph = b"\x00" + bytes([0x55]) * (w * h)
    anim = build_webp(
        [
            build_vp8x(w, h, animated=True, has_alpha=True),
            build_anim(0),
            (b"ALPH", alph),
            build_anmf([(b"VP8 ", body)], w, h, duration_ms=40),
        ]
    )
    kind, _body, frame_alph = _find_image_chunk(anim)
    assert kind == "vp8"
    assert frame_alph is None  # frame has no ALPH of its own

    out, dw, dh, mode = decode_webp(anim)
    assert (dw, dh) == (w, h)
    # never the stale 0x55 plane: fully opaque output
    if mode == "RGBA":
        assert all(out[i] == 255 for i in range(3, len(out), 4))
    else:
        assert mode == "RGB"

    # and a frame that DOES own an ALPH still gets it applied
    anim2 = build_webp(
        [
            build_vp8x(w, h, animated=True, has_alpha=True),
            build_anim(0),
            build_anmf(
                [(b"ALPH", alph), (b"VP8 ", body)], w, h, duration_ms=40
            ),
        ]
    )
    kind2, _b2, frame_alph2 = _find_image_chunk(anim2)
    assert kind2 == "vp8" and frame_alph2 == alph
    out2, _w2, _h2, mode2 = decode_webp(anim2)
    assert mode2 == "RGBA"
    assert all(out2[i] == 0x55 for i in range(3, len(out2), 4))
