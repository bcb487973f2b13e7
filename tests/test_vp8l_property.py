"""Property tests (hypothesis): VP8L round-trip for arbitrary
geometries / encoder feature combinations, and the Morton interleave
against an independent bit-twiddling reference."""

from hypothesis import given, settings, strategies as st

from tensorflow_recorder_spark.functions.vp8l_codec import (
    decode_webp,
    encode_vp8l,
)


@settings(max_examples=40, deadline=None)
@given(
    width=st.integers(min_value=1, max_value=18),
    height=st.integers(min_value=1, max_value=18),
    mode=st.sampled_from(["RGB", "RGBA"]),
    subtract_green=st.booleans(),
    cache_bits=st.sampled_from([0, 2, 5]),
    lz77=st.booleans(),
    seed=st.integers(min_value=0, max_value=255),
    palette=st.integers(min_value=2, max_value=256),
)
def test_vp8l_round_trip_any_geometry(
    width, height, mode, subtract_green, cache_bits, lz77, seed, palette
):
    """Every encoder feature combination must decode to the exact
    input — including low-entropy inputs (small `palette` of distinct
    values forces simple codes / cache hits / LZ77 runs)."""
    nch = 4 if mode == "RGBA" else 3
    n = width * height * nch
    pixels = bytes((seed + (i * 131) % palette) % 256 for i in range(n))
    data = encode_vp8l(
        pixels,
        width,
        height,
        mode=mode,
        subtract_green=subtract_green,
        cache_bits=cache_bits,
        lz77=lz77,
    )
    out, w, h, m = decode_webp(data)
    assert (w, h) == (width, height)
    if mode == "RGB":
        assert m == "RGB" and out == pixels
    elif m == "RGBA":
        assert out == pixels
    else:  # fully-opaque RGBA collapses to RGB, dropping alpha bytes
        assert all(pixels[i] == 255 for i in range(3, n, 4))
        dropped = bytes(
            b for i, b in enumerate(pixels) if i % 4 != 3
        )
        assert out == dropped


@settings(max_examples=60, deadline=None)
@given(
    vals=st.lists(
        st.integers(min_value=0, max_value=(1 << 10) - 1),
        min_size=2,
        max_size=4,
    ),
    bits=st.integers(min_value=1, max_value=10),
)
def test_morton_expr_matches_bit_interleave(spark, vals, bits):
    from tensorflow_recorder_spark.operators.layout import morton_code_expr

    mask = (1 << bits) - 1
    clamped = [v & mask for v in vals]
    d = len(clamped)
    want = 0
    for j in range(bits):
        for k, v in enumerate(clamped):
            want |= ((v >> j) & 1) << (j * d + k)
    cols = [f"c{k}" for k in range(d)]
    row = spark.createDataFrame(
        [tuple(clamped)], ", ".join(f"{c} long" for c in cols)
    )
    from pyspark.sql import functions as F

    [r] = row.select(F.expr(morton_code_expr(cols, bits)).alias("z")).collect()
    assert r["z"] == want


@settings(max_examples=120, deadline=None)
@given(
    seed=st.integers(min_value=0, max_value=50),
    pos=st.integers(min_value=12, max_value=200),
    newbyte=st.integers(min_value=0, max_value=255),
    truncate=st.booleans(),
)
def test_vp8l_decoder_total_on_corrupt_input(seed, pos, newbyte, truncate):
    """Byte-flipped / truncated streams must raise the two DECLARED
    exception types (ValueError -> DISCARD, NotImplementedError ->
    synthetic fallback) — never IndexError/KeyError/etc., which would
    crash the whole Arrow batch instead of routing one row."""
    import numpy as np

    rng = np.random.RandomState(seed)
    px = rng.randint(0, 256, (5, 6, 3)).astype("uint8").tobytes()
    data = bytearray(
        encode_vp8l(px, 6, 5, subtract_green=bool(seed % 2), lz77=True)
    )
    if truncate:
        data = data[: max(13, pos % len(data))]
    elif pos < len(data):
        data[pos] = newbyte
    try:
        out, w, h, mode = decode_webp(bytes(data))
        # a mutation the decoder survives must still be well-formed
        assert w >= 1 and h >= 1 and len(out) in (w * h * 3, w * h * 4)
    except (ValueError, NotImplementedError):
        pass
