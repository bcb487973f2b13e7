"""Round-10 regression pins.

r9 verdict item 2: q_e4_incident_overlap regressed 3.6x because the
incident side (a corpus-scale groupBy + windows) was fed into
interval_join un-checkpointed while the operator consumes each input in
up to four subplans (auto-bucket median pass + grid + two outlier theta
branches). The fix checkpoints BOTH sides and passes the provably-right
hour grid explicitly. These tests pin the plan shape so the regression
cannot silently return.
"""

SF = "/root/testdata/sf0.001"


def test_incident_overlap_reads_only_checkpointed_lineage(spark):
    """Both interval_join inputs must be localCheckpointed: the
    optimized plan then reads ONLY LogicalRDD leaves — the events
    parquet scan (and the sessionize/hot-hour shuffles above it) must
    appear ZERO times, because any appearance means Spark would
    re-execute that corpus-scale lineage once per consuming subplan
    (r9: 0.85 s -> 3.08 s from exactly this)."""
    from tensorflow_recorder_spark.queries.e4 import q_e4_incident_overlap

    df = q_e4_incident_overlap(spark, SF)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "LogicalRDD" in plan
    assert "parquet" not in plan.lower(), (
        "corpus scan leaked into the join plan — an interval_join input "
        "lost its localCheckpoint and will re-execute per consumer"
    )


def test_incident_overlap_skips_auto_bucket_median_pass(spark, monkeypatch):
    """Hour-aligned incidents make bucket=3600 provably right, so the
    query must pass it explicitly and never trigger the eager
    auto_bucket_seconds action (an extra full pass over both lineages
    at plan-construction time)."""
    from tensorflow_recorder_spark.operators import intervals
    from tensorflow_recorder_spark.queries.e4 import q_e4_incident_overlap

    def _boom(*a, **k):  # pragma: no cover - failure path
        raise AssertionError(
            "auto_bucket_seconds was invoked: q_e4_incident_overlap must "
            "pass bucket_seconds=3600 explicitly"
        )

    monkeypatch.setattr(intervals, "auto_bucket_seconds", _boom)
    df = q_e4_incident_overlap(spark, SF)
    assert df.columns  # plan built without the eager median pass


def test_jpeg_undefined_table_routes_to_discard(spark, tmp_path):
    """End-to-end guard for the r9 pytest-RED fix: a progressive JPEG
    whose scan header references an undefined Huffman table must route
    to DISCARD through the image loader's declared-ValueError contract
    (operators/image.py), not crash the Arrow batch."""
    import pandas as pd

    from tensorflow_recorder_spark.api import convert
    from tensorflow_recorder_spark.functions.jpeg_codec import (
        encode_jpeg_progressive,
    )

    px = bytes((i * 7) % 256 for i in range(10 * 9 * 3))
    good = encode_jpeg_progressive(px, 10, 9, "RGB")
    bad = bytearray(good)
    pos = 2
    while pos + 4 <= len(bad):
        if bad[pos] != 0xFF:
            break
        if bad[pos + 1] == 0xDA:  # SOS: point every Td/Ta at slot 15
            ns = bad[pos + 4]
            for c in range(ns):
                bad[pos + 6 + 2 * c] = 0xFF
            break
        pos += 2 + ((bad[pos + 2] << 8) | bad[pos + 3])
    good_p = tmp_path / "good.jpg"
    bad_p = tmp_path / "bad.jpg"
    good_p.write_bytes(good)
    bad_p.write_bytes(bytes(bad))
    pdf = pd.DataFrame(
        [
            {"split": "TRAIN", "image_uri": str(good_p), "label": "a"},
            {"split": "TRAIN", "image_uri": str(bad_p), "label": "b"},
        ]
    )
    result = convert(pdf, output_dir=str(tmp_path / "out"), spark=spark)
    assert result["metrics"]["good_images"] == 1
    assert result["metrics"]["bad_images"] == 1


def test_fixture_has_no_exact_session_gap_boundary():
    """r9 advice: session_window('30 minutes') is end-exclusive (an
    event exactly 1800s after the previous one starts a NEW session)
    while batch sessionize uses strict 'gap > 1800' (same session) —
    the stream/batch oracle equivalence for s2/s37 therefore relies on
    no user ever having an EXACT 1800.000000s inter-event gap. That is
    measure-zero only because the fixture timestamps carry sub-second
    precision; this test pins BOTH facts so a future fixture regen with
    integer-second timestamps fails loudly here instead of flipping a
    streaming oracle."""
    import duckdb

    for sf in ("0.001", "0.01"):
        con = duckdb.connect()
        exact, subsec, n = con.execute(
            f"""
            WITH g AS (
              SELECT epoch(ts) - epoch(lag(ts) OVER (
                       PARTITION BY user_id ORDER BY ts)) AS gap,
                     epoch_ns(ts) % 1000000000 AS subsec
              FROM '/root/testdata/sf{sf}/events.parquet')
            SELECT count(*) FILTER (gap = 1800),
                   count(*) FILTER (subsec != 0),
                   count(*) FROM g
            """
        ).fetchone()
        assert exact == 0, (
            f"sf{sf}: {exact} exact-30-minute gaps — stream (end-exclusive "
            "session_window) and batch (gap > 1800) would disagree"
        )
        assert subsec == n, (
            f"sf{sf}: integer-second timestamps — the measure-zero "
            "boundary argument no longer holds"
        )


def test_cdc_chunks_hash_algo_variants(spark):
    """hash_algo='xxhash64' must produce the SAME cut geometry as md5
    (the cut predicate is buzhash either way) with a LONG hash whose
    distinct structure matches the md5 hex's — the property the
    hash-free CDC aggregates rely on. Bad algo names are rejected."""
    import pytest

    from tensorflow_recorder_spark.operators.chunking import cdc_chunks

    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog " * 20),
         (2, "the quick brown fox jumps over the lazy dog " * 20),
         (3, "an entirely different document body with other words " * 15)],
        "doc_id long, text string",
    )
    md = cdc_chunks(df, hash_algo="md5").collect()
    xx = cdc_chunks(df, hash_algo="xxhash64").collect()
    assert [(r["doc_id"], r["chunk_idx"], r["chunk_len"]) for r in md] == [
        (r["doc_id"], r["chunk_idx"], r["chunk_len"]) for r in xx
    ]
    assert all(isinstance(r["chunk_hash"], int) for r in xx)
    assert all(isinstance(r["chunk_hash"], str) for r in md)
    # identical docs 1/2 share every hash; distinct partitioning agrees
    md_map = {}
    xx_map = {}
    for r_md, r_xx in zip(md, xx):
        md_map.setdefault(r_md["chunk_hash"], set()).add(r_xx["chunk_hash"])
        xx_map.setdefault(r_xx["chunk_hash"], set()).add(r_md["chunk_hash"])
    assert all(len(v) == 1 for v in md_map.values())
    assert all(len(v) == 1 for v in xx_map.values())
    with pytest.raises(ValueError, match="hash_algo"):
        cdc_chunks(df, hash_algo="sha1")


def test_webp_animation_meta_roundtrip():
    """build_* fixtures -> webp_animation_meta walk: frame count,
    durations, disposal flags, loop count, canvas all survive the
    wire; a still reports animated=False with one pseudo-frame."""
    from tensorflow_recorder_spark.functions.vp8l_codec import (
        build_anim,
        build_anmf,
        build_vp8x,
        build_webp,
        encode_vp8l,
        webp_animation_meta,
    )
    import struct

    px = bytes((p * 3) % 256 for p in range(4 * 3 * 3))
    full = encode_vp8l(px, 4, 3)
    pos = 12
    while full[pos : pos + 4] != b"VP8L":
        (size,) = struct.unpack_from("<I", full, pos + 4)
        pos += 8 + size + (size & 1)
    (size,) = struct.unpack_from("<I", full, pos + 4)
    body = full[pos + 8 : pos + 8 + size]

    anim = build_webp(
        [
            build_vp8x(4, 3, animated=True),
            build_anim(7),
            build_anmf([(b"VP8L", body)], 4, 3, duration_ms=40, dispose_bg=True),
            build_anmf([(b"VP8L", body)], 4, 3, duration_ms=70, no_blend=True),
        ]
    )
    meta = webp_animation_meta(anim)
    assert meta["animated"] and (meta["canvas_w"], meta["canvas_h"]) == (4, 3)
    assert meta["loop_count"] == 7
    assert [f["duration_ms"] for f in meta["frames"]] == [40, 70]
    assert [f["dispose_bg"] for f in meta["frames"]] == [True, False]
    assert [f["no_blend"] for f in meta["frames"]] == [False, True]

    still = webp_animation_meta(full)
    assert not still["animated"] and len(still["frames"]) == 1
    assert still["frames"][0]["kind"] == "vp8l"


def test_tiff_ifd_chain_cycle_is_corrupt():
    """A self-referencing next-IFD pointer must raise ValueError, not
    spin (tiff_ifd_chain cycle guard)."""
    import struct

    import pytest

    from tensorflow_recorder_spark.functions.tiff_codec import (
        encode_tiff,
        tiff_ifd_chain,
    )

    px = bytes(range(4 * 3 * 3))
    data = bytearray(encode_tiff(px, 4, 3, "RGB"))
    (n_tags,) = struct.unpack_from("<H", data, 8)
    next_ptr_off = 8 + 2 + 12 * n_tags
    struct.pack_into("<I", data, next_ptr_off, 8)  # point back at itself
    with pytest.raises(ValueError, match="cyclic"):
        tiff_ifd_chain(bytes(data))


def test_jpeg_marker_census_progressive_and_truncation():
    from tensorflow_recorder_spark.functions.jpeg_codec import (
        encode_jpeg_progressive,
        jpeg_marker_census,
    )
    import pytest

    px = bytes((p * 5) % 256 for p in range(10 * 9 * 3))
    j = encode_jpeg_progressive(px, 10, 9, "RGB")
    c = jpeg_marker_census(j)
    assert c["progressive"] and c["n_scans"] > 1
    assert (c["width"], c["height"]) == (10, 9)
    with pytest.raises(ValueError):
        jpeg_marker_census(j[:20])


def test_bench_hygiene_helpers():
    """r9 verdict item 7: the poisoned-session audit must flag exactly
    the monotonically-rising->20% pattern and read host load without
    raising — these fields gate whether a bench record is committable."""
    import sys

    sys.path.insert(0, "/root/repo")
    import bench

    # warm-up sample (index 0) is ignored; pattern is over the 3 timed
    assert bench._rising([9.0, 1.0, 1.3, 1.7]) is True
    assert bench._rising([9.0, 1.0, 1.1, 1.15]) is False  # <20% total rise
    assert bench._rising([9.0, 2.0, 1.5, 1.2]) is False  # falling = healthy
    assert bench._rising([9.0, 1.0, 3.0, 2.0]) is False  # spike, not monotone
    assert bench._rising([9.0, 1.0]) is False  # short sample list
    load = bench._loadavg()
    assert isinstance(load, list)
    assert all(isinstance(x, float) for x in load)
