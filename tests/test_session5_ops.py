"""Session-5 operator tests: chunking, data-quality audit, k-anonymity,
length-bucketed batching, class weights — small deterministic inputs
with hand-checked outputs."""

import pytest

from pyspark.sql import functions as F

from tensorflow_recorder_spark.operators import audit, chunking, privacy, sampling


# ------------------------------------------------------------ chunking


def test_chunk_documents_windows_and_overlap(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "x"), (3, ""), (4, "  ")],
        "id long, txt string",
    )
    rows = chunking.chunk_documents(df, "txt", "id", chunk_size=4, stride=3).collect()
    got = {(r["id"], r["chunk_id"]): (r["chunk_text"], r["chunk_tokens"]) for r in rows}
    # doc 1: starts 1,4,7 -> [a b c d], [d e f g], [g]
    assert got[(1, 0)] == ("a b c d", 4)
    assert got[(1, 1)] == ("d e f g", 4)
    assert got[(1, 2)] == ("g", 1)
    assert got[(2, 0)] == ("x", 1)
    # empty / whitespace-only docs produce no chunks
    assert not any(k[0] in (3, 4) for k in got)
    assert len(got) == 4


def test_chunk_documents_preserves_case(spark):
    df = spark.createDataFrame([(1, "The Quick Brown")], "id long, txt string")
    [r] = chunking.chunk_documents(df, "txt", "id", chunk_size=8, stride=8).collect()
    assert r["chunk_text"] == "The Quick Brown"


def test_chunk_documents_validates_args(spark):
    df = spark.createDataFrame([(1, "a")], "id long, txt string")
    with pytest.raises(ValueError):
        chunking.chunk_documents(df, "txt", "id", chunk_size=0)
    with pytest.raises(ValueError):
        chunking.chunk_documents(df, "txt", "id", stride=0)


def test_chunk_stats_matches_chunk_documents(spark):
    df = spark.createDataFrame(
        [(i, " ".join(["t"] * n)) for i, n in enumerate([0, 1, 3, 4, 7, 12])],
        "id long, txt string",
    )
    chunks = (
        chunking.chunk_documents(df, "txt", "id", chunk_size=4, stride=3)
        .groupBy("id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.min(F.col("chunk_tokens")).alias("min_tokens"),
        )
        .collect()
    )
    stats = {
        r["id"]: r
        for r in chunking.chunk_stats(df, "txt", "id", chunk_size=4, stride=3).collect()
    }
    for r in chunks:
        s = stats[r["id"]]
        assert s["n_chunks"] == r["n_chunks"]
        assert s["last_chunk_tokens"] == r["min_tokens"] or s["n_chunks"] == 1
    assert stats[0]["n_chunks"] == 0 and stats[0]["last_chunk_tokens"] == 0
    assert stats[5]["n_tokens"] == 12 and stats[5]["n_chunks"] == 4
    # starts 1,4,7,10 over 12 tokens: last chunk = tokens 10..12 -> 3
    assert stats[5]["last_chunk_tokens"] == 3


# --------------------------------------------------------------- audit


def test_check_expectations_single_pass_results(spark):
    df = spark.createDataFrame(
        [(1, "A", 5.0), (2, "B", 7.0), (3, "A", -1.0), (3, None, 2.0)],
        "k long, status string, v double",
    )
    out = {
        r["check_name"]: r
        for r in audit.check_expectations(
            df,
            [
                audit.not_null("status"),
                audit.unique("k"),
                audit.min_value("v", 0.0),
                audit.accepted_values("status", ["A", "B"]),
                audit.row_count_at_least(10),
            ],
        ).collect()
    }
    assert out["not_null(status)"]["value"] == 0.75
    assert not out["not_null(status)"]["passed"]
    assert out["unique(k)"]["value"] == 0.75  # 3 distinct / 4
    assert not out["unique(k)"]["passed"]
    assert out["min(v)>=0.0"]["value"] == -1.0
    assert not out["min(v)>=0.0"]["passed"]
    assert not out["accepted_values(status)"]["passed"]  # NULL counts against
    assert out["row_count>=10"]["value"] == 4.0
    assert not out["row_count>=10"]["passed"]


def test_check_expectations_all_green(spark):
    df = spark.createDataFrame([(1, "A"), (2, "B")], "k long, status string")
    rows = audit.check_expectations(
        df,
        [audit.not_null("k"), audit.unique("k"), audit.row_count_at_least(2)],
    ).collect()
    assert all(r["passed"] for r in rows)


def test_check_expectations_validates(spark):
    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError):
        audit.check_expectations(df, [])
    with pytest.raises(ValueError):
        audit.check_expectations(df, [audit.not_null("k"), audit.not_null("k")])


def test_check_expectations_is_one_aggregate(spark):
    """The whole suite must cost one scan: no join/union of per-check
    subplans in the physical plan."""
    df = spark.createDataFrame([(1, "A")], "k long, status string")
    plan = (
        audit.check_expectations(
            df, [audit.not_null("k"), audit.min_value("k", 0), audit.row_count_at_least(1)]
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Union" not in plan and "Join" not in plan


# ------------------------------------------------------------- privacy


def test_k_anonymity_groups_flags_small_groups(spark):
    df = spark.createDataFrame(
        [(1, "US", "A"), (2, "US", "A"), (3, "US", "A"), (4, "DE", "A"), (5, "DE", "B")],
        "id long, nation string, seg string",
    )
    got = {
        (r["nation"], r["seg"]): (r["n"], r["at_risk"])
        for r in privacy.k_anonymity_groups(df, ["nation", "seg"], k=2).collect()
    }
    assert got[("US", "A")] == (3, False)
    assert got[("DE", "A")] == (1, True)
    assert got[("DE", "B")] == (1, True)


def test_k_anonymity_summary_with_l_diversity(spark):
    df = spark.createDataFrame(
        [(1, "US", "x"), (2, "US", "x"), (3, "DE", "y"), (4, "DE", "z")],
        "id long, nation string, diag string",
    )
    [r] = privacy.k_anonymity_summary(
        df, ["nation"], k=3, sensitive_col="diag"
    ).collect()
    assert r["n_groups"] == 2 and r["n_rows"] == 4
    assert r["rows_at_risk"] == 4  # both groups have n=2 < 3
    assert r["min_group_size"] == 2
    assert r["min_l_diversity"] == 1  # US group has a single diagnosis


def test_k_anonymity_validates(spark):
    df = spark.createDataFrame([(1, "a")], "id long, q string")
    with pytest.raises(ValueError):
        privacy.k_anonymity_groups(df, [], k=2)
    with pytest.raises(ValueError):
        privacy.k_anonymity_groups(df, ["q"], k=0)


# ------------------------------------------------- batching / weights


def test_bucket_by_length_caps_batch_tokens(spark):
    df = spark.createDataFrame(
        [(i, " ".join(["w"] * n)) for i, n in enumerate([3, 5, 9, 10, 17, 0])],
        "id long, txt string",
    )
    rows = sampling.bucket_by_length(
        df,
        "id",
        F.expr("size(filter(split(txt, '\\\\s+'), t -> t <> ''))"),
        bucket_width=8,
        batch_tokens=16,
    ).collect()
    by_id = {r["id"]: r for r in rows}
    # n=3,5 -> bucket 0 (cap 8, 2 rows/batch); n=9,10 -> bucket 1 (cap 16,
    # 1 row/batch); n=17 -> bucket 2 (cap 24 > 16 -> 1 row/batch); n=0 -> bucket 0
    assert by_id[0]["bucket"] == 0 and by_id[0]["rows_per_batch"] == 2
    assert by_id[2]["bucket"] == 1 and by_id[2]["rows_per_batch"] == 1
    assert by_id[4]["bucket"] == 2 and by_id[4]["rows_per_batch"] == 1
    assert by_id[5]["bucket"] == 0
    # every batch respects its row cap
    from collections import Counter

    sizes = Counter((r["bucket"], r["batch_in_bucket"]) for r in rows)
    for (bucket, _), n in sizes.items():
        cap = max(1, 16 // ((bucket + 1) * 8))
        assert n <= cap


def test_bucket_by_length_deterministic(spark):
    df = spark.createDataFrame(
        [(i, " ".join(["w"] * (i % 7 + 1))) for i in range(40)],
        "id long, txt string",
    )
    tok = F.expr("size(filter(split(txt, '\\\\s+'), t -> t <> ''))")
    a = sorted(map(tuple, sampling.bucket_by_length(df, "id", tok).collect()))
    b = sorted(map(tuple, sampling.bucket_by_length(df, "id", tok).collect()))
    assert a == b


def test_class_weights_balanced_rule(spark):
    df = spark.createDataFrame(
        [(1, "en"), (2, "en"), (3, "en"), (4, "de"), (5, None)],
        "id long, lang string",
    )
    got = {r["label"]: r for r in sampling.class_weights(df, "lang").collect()}
    assert set(got) == {"en", "de"}
    # total=4 (nulls excluded), k=2: en -> 4/(2*3), de -> 4/(2*1)
    assert abs(got["en"]["weight"] - 4 / 6) < 1e-6
    assert got["de"]["weight"] == 2.0


def test_check_expectations_grouped_per_group_rows(spark):
    df = spark.createDataFrame(
        [("d1", 1.0, "A"), ("d1", 2.0, "A"), ("d2", -1.0, None)],
        "day string, v double, status string",
    )
    suite = [audit.not_null("status"), audit.min_value("v", 0.0),
             audit.row_count_at_least(2)]
    got = {
        (r["day"], r["check_name"]): (r["value"], r["passed"])
        for r in audit.check_expectations_grouped(df, ["day"], suite).collect()
    }
    assert got[("d1", "not_null(status)")] == (1.0, True)
    assert got[("d1", "min(v)>=0.0")] == (1.0, True)
    assert got[("d1", "row_count>=2")] == (2.0, True)
    assert got[("d2", "not_null(status)")] == (0.0, False)
    assert got[("d2", "min(v)>=0.0")] == (-1.0, False)
    assert got[("d2", "row_count>=2")] == (1.0, False)
    with pytest.raises(ValueError):
        audit.check_expectations_grouped(df, [], suite)


def test_grouped_metrics_finalize_roundtrip_matches_direct(spark):
    df = spark.createDataFrame(
        [("d1", 5.0), ("d2", 7.0)], "day string, v double"
    )
    suite = [audit.min_value("v", 6.0)]
    direct = audit.check_expectations_grouped(df, ["day"], suite).collect()
    split = audit.finalize_expectations(
        audit.grouped_metrics(df, ["day"], suite), ["day"], suite
    ).collect()
    assert sorted(map(tuple, direct)) == sorted(map(tuple, split))


# ------------------------------------------------------- decomposition


def test_seasonal_decompose_constant_series(spark):
    from datetime import datetime

    from tensorflow_recorder_spark.operators.events import (
        seasonal_decompose_daily,
    )

    rows = [
        ("a", datetime(2024, 1, d, 12, 0, 0), 5.0) for d in range(1, 15)
    ]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
    got = {r["day"]: r for r in seasonal_decompose_daily(df).collect()}
    assert len(got) == 14
    # interior days (full 7-day window): trend == value, seasonal/resid 0
    for d in range(4, 12):
        r = got[f"2024-01-{d:02d}"]
        assert r["daily_value"] == 5.0
        assert r["trend"] == 5.0
        assert r["seasonal"] == 0.0
        assert r["residual"] == 0.0
    # edge days: no full window -> all components NULL
    for d in (1, 2, 3, 12, 13, 14):
        r = got[f"2024-01-{d:02d}"]
        assert r["trend"] is None and r["seasonal"] is None and r["residual"] is None


def test_seasonal_decompose_additivity_and_dow(spark):
    from datetime import datetime

    from tensorflow_recorder_spark.operators.events import (
        seasonal_decompose_daily,
    )

    # value = linear trend + dow bump
    rows = []
    for d in range(1, 22):
        ts = datetime(2024, 1, d, 3, 0, 0)
        bump = 10.0 if ts.isoweekday() == 7 else 0.0  # Sundays
        rows.append(("a", ts, float(d) + bump))
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
    out = seasonal_decompose_daily(df).collect()
    # 2024-01-07 is a Sunday -> dow 0
    by_day = {r["day"]: r for r in out}
    assert by_day["2024-01-07"]["dow"] == 0
    for r in out:
        if r["trend"] is not None:
            assert abs(
                r["daily_value"] - (r["trend"] + r["seasonal"] + r["residual"])
            ) < 1e-5
    with pytest.raises(ValueError):
        seasonal_decompose_daily(df, period=1)


def test_chunk_documents_randomized_against_python_reference(spark):
    """Differential test: 120 random docs x 3 (chunk_size, stride)
    settings vs a direct Python implementation of the pinned semantics."""
    import random

    rng = random.Random(42)
    docs = []
    for i in range(120):
        n = rng.randrange(0, 40)
        toks = [
            "".join(rng.choice("abcXYZ09") for _ in range(rng.randrange(1, 5)))
            for _ in range(n)
        ]
        # random extra whitespace, including leading/trailing
        sep = lambda: rng.choice([" ", "  ", "\t", " \n "])
        text = sep().join(toks)
        if rng.random() < 0.3:
            text = " " + text + "  "
        docs.append((i, text, toks))
    df = spark.createDataFrame([(i, t) for i, t, _ in docs], "id long, txt string")

    for cs, st in [(4, 3), (8, 8), (5, 2)]:
        got = {
            (r["id"], r["chunk_id"]): (r["chunk_text"], r["chunk_tokens"])
            for r in chunking.chunk_documents(
                df, "txt", "id", chunk_size=cs, stride=st
            ).collect()
        }
        want = {}
        for i, _, toks in docs:
            for ci, s in enumerate(range(0, len(toks), st)):
                w = toks[s : s + cs]
                want[(i, ci)] = (" ".join(w), len(w))
        assert got == want, (cs, st)

        stats = {
            r["id"]: (r["n_tokens"], r["n_chunks"], r["last_chunk_tokens"])
            for r in chunking.chunk_stats(
                df, "txt", "id", chunk_size=cs, stride=st
            ).collect()
        }
        for i, _, toks in docs:
            n = len(toks)
            starts = list(range(0, n, st))
            want_stats = (
                n,
                len(starts),
                min(cs, n - starts[-1]) if starts else 0,
            )
            assert stats[i] == want_stats, (i, cs, st)


def test_attribution_join_window_semantics(spark):
    from datetime import datetime

    from tensorflow_recorder_spark.operators.events import attribution_join

    def ev(eid, uid, t, typ):
        return (eid, uid, datetime(2024, 1, 1, *t), typ)

    rows = [
        ev(1, 7, (10, 0, 0), "click"),
        ev(2, 7, (10, 30, 0), "purchase"),   # in window of click 1
        ev(3, 7, (11, 0, 0), "purchase"),    # exactly at horizon -> included
        ev(4, 7, (11, 0, 1), "purchase"),    # 1s past horizon -> excluded
        ev(5, 8, (10, 15, 0), "purchase"),   # other user -> excluded
        ev(6, 7, (9, 59, 59), "purchase"),   # before the click -> excluded
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    got = {
        (r["src_id"], r["dst_id"]): r["lag_us"]
        for r in attribution_join(
            df.where("event_type = 'click'"),
            df.where("event_type = 'purchase'"),
            horizon_seconds=3600,
        ).collect()
    }
    assert got == {(1, 2): 1800 * 1_000_000, (1, 3): 3600 * 1_000_000}
    with pytest.raises(ValueError):
        attribution_join(df, df, horizon_seconds=0)
