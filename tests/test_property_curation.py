"""Property tests (hypothesis): PNG codec round-trip for arbitrary
geometries/modes/interlacing, and the pure-Python greedy packing
recurrence invariants (mirrors the logic run inside the Arrow stage —
the Spark-side plumbing is covered by tests/test_packing.py)."""

from hypothesis import given, settings, strategies as st

from tensorflow_recorder_spark.functions.png_codec import (
    decode_png,
    encode_png,
)

_MODES = {"L": 1, "LA": 2, "RGB": 3, "RGBA": 4}


@settings(max_examples=40, deadline=None)
@given(
    width=st.integers(min_value=1, max_value=20),
    height=st.integers(min_value=1, max_value=20),
    mode=st.sampled_from(sorted(_MODES)),
    interlace=st.booleans(),
    seed=st.integers(min_value=0, max_value=255),
)
def test_png_round_trip_any_geometry(width, height, mode, interlace, seed):
    n = width * height * _MODES[mode]
    pixels = bytes((seed + i * 131) % 256 for i in range(n))
    data = encode_png(pixels, width, height, mode, interlace=interlace)
    out, w, h, m = decode_png(data)
    assert (w, h, m) == (width, height, mode)
    assert out == pixels


def _greedy(token_counts, capacity):
    """The exact recurrence pack_sequences runs per shard."""
    bins, offsets = [], []
    bin_id, fill = 0, 0
    for nt in token_counts:
        if fill > 0 and fill + nt > capacity:
            bin_id += 1
            fill = 0
        bins.append(bin_id)
        offsets.append(fill)
        fill += nt
    return bins, offsets


@settings(max_examples=100, deadline=None)
@given(
    counts=st.lists(st.integers(min_value=0, max_value=50), max_size=200),
    capacity=st.integers(min_value=1, max_value=64),
)
def test_packing_invariants(counts, capacity):
    bins, offsets = _greedy(counts, capacity)
    assert len(bins) == len(counts)
    # bin ids are non-decreasing and dense (no empty bins skipped)
    for a, b in zip(bins, bins[1:]):
        assert b in (a, a + 1)
    # per-bin fill never exceeds capacity unless a single oversized doc
    # occupies the bin alone
    fill: dict[int, list[int]] = {}
    for nt, b in zip(counts, bins):
        fill.setdefault(b, []).append(nt)
    for b, members in fill.items():
        if sum(members) > capacity:
            # exactly one oversized doc, possibly sharing with
            # zero-token docs (which occupy no space)
            big = [m for m in members if m > 0]
            assert len(big) == 1 and big[0] > capacity
    # offsets are the running fill within the bin
    seen: dict[int, int] = {}
    for nt, b, off in zip(counts, bins, offsets):
        assert off == seen.get(b, 0)
        seen[b] = off + nt
    # a doc never straddles bins: offset + its tokens stays in capacity
    # whenever the doc itself fits
    for nt, off in zip(counts, offsets):
        if nt <= capacity:
            assert off + nt <= capacity
