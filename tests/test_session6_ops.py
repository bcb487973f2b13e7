"""Session-6 operator tests: join-key skew profiling and normalized
(case/punct/whitespace-insensitive) dedup — small deterministic inputs
with hand-checked outputs."""

from pyspark.sql import functions as F

from tensorflow_recorder_spark.operators import dedup
from tensorflow_recorder_spark.operators.skew import key_skew_profile


# ------------------------------------------------------- skew profile


def test_key_skew_profile_math(spark):
    # key 1 appears 8x, keys 2..5 once each: n=12, k=5, avg=2.4,
    # p50=1, max=8, skew=8/2.4, top_share=8/12, salt=ceil(8/1)=8
    df = spark.createDataFrame(
        [(1,)] * 8 + [(2,), (3,), (4,), (5,)], "k long"
    )
    [r] = key_skew_profile([("t.k", df, "k")]).collect()
    assert r["key"] == "t.k"
    assert r["n_rows"] == 12 and r["n_keys"] == 5
    assert r["avg_freq"] == 2.4
    assert r["p50_freq"] == 1.0
    assert r["max_freq"] == 8
    assert r["skew_ratio"] == round(8 / 2.4, 6)
    assert r["top_share"] == round(8 / 12, 6)
    assert r["suggested_salt"] == 8


def test_key_skew_profile_even_distribution(spark):
    df = spark.createDataFrame([(i % 4,) for i in range(12)], "k long")
    [r] = key_skew_profile([("even", df, "k")]).collect()
    assert r["skew_ratio"] == 1.0
    assert r["suggested_salt"] == 1


def test_key_skew_profile_multiple_frames(spark):
    a = spark.createDataFrame([(1,), (1,)], "k long")
    b = spark.createDataFrame([(9,)], "j long")
    rows = {r["key"]: r for r in key_skew_profile(
        [("a.k", a, "k"), ("b.j", b, "j")]
    ).collect()}
    assert rows["a.k"]["n_rows"] == 2 and rows["a.k"]["n_keys"] == 1
    assert rows["b.j"]["n_rows"] == 1 and rows["b.j"]["n_keys"] == 1


# --------------------------------------------------- normalized dedup


def test_normalized_dedup_collapses_formatting_variants(spark):
    df = spark.createDataFrame(
        [
            (1, "Hello, World!"),
            (2, "hello   world"),
            (3, "HELLO-WORLD"),
            (4, "a different doc"),
        ],
        "doc_id long, text string",
    )
    out = dedup.normalized_dedup(df, "text", "doc_id").collect()
    ids = sorted(r["doc_id"] for r in out)
    assert ids == [1, 4]
    # survivors keep their ORIGINAL text
    assert {r["text"] for r in out} == {"Hello, World!", "a different doc"}


def test_normalized_dedup_distinct_content_survives(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha beta gamma")],
        "doc_id long, text string",
    )
    assert dedup.normalized_dedup(df, "text", "doc_id").count() == 2


def test_normalized_dedup_digit_boundaries_not_conflated(spark):
    # "doc 12" vs "doc 1 2": different normalized token streams
    df = spark.createDataFrame(
        [(1, "doc 12"), (2, "doc 1 2")], "doc_id long, text string"
    )
    assert dedup.normalized_dedup(df, "text", "doc_id").count() == 2


# ------------------------------------------------------------ dp noise


def test_dp_noisy_counts_deterministic_and_scaled(spark):
    from tensorflow_recorder_spark.operators.privacy import dp_noisy_counts

    df = spark.createDataFrame(
        [("a",)] * 10 + [("b",)] * 3, "g string"
    )
    r1 = {r["g"]: r for r in dp_noisy_counts(df, ["g"], epsilon=1.0).collect()}
    r2 = {r["g"]: r for r in dp_noisy_counts(df, ["g"], epsilon=1.0).collect()}
    assert {k: v["noisy_count"] for k, v in r1.items()} == {
        k: v["noisy_count"] for k, v in r2.items()
    }
    # Laplace scale is exactly 1/eps for the SAME md5-derived uniform:
    # noise at eps=0.5 is exactly 2x the noise at eps=1.0
    half = {r["g"]: r for r in dp_noisy_counts(df, ["g"], epsilon=0.5).collect()}
    for g, n_true in (("a", 10), ("b", 3)):
        n1 = r1[g]["noisy_count"] - n_true
        n05 = half[g]["noisy_count"] - n_true
        assert abs(n05 - 2 * n1) < 2e-5
        assert n1 != 0.0  # noise actually applied
    # release is a clamped integer
    assert all(v["released"] >= 0 for v in r1.values())


def test_dp_noisy_counts_seed_changes_noise(spark):
    from tensorflow_recorder_spark.operators.privacy import dp_noisy_counts

    df = spark.createDataFrame([("a",)] * 7, "g string")
    [x] = dp_noisy_counts(df, ["g"], epsilon=1.0, seed="dp").collect()
    [y] = dp_noisy_counts(df, ["g"], epsilon=1.0, seed="other").collect()
    assert x["noisy_count"] != y["noisy_count"]


def test_dp_noisy_counts_validates_epsilon(spark):
    import pytest

    from tensorflow_recorder_spark.operators.privacy import dp_noisy_counts

    df = spark.createDataFrame([("a",)], "g string")
    with pytest.raises(ValueError):
        dp_noisy_counts(df, ["g"], epsilon=0.0)


# ------------------------------------------------------- token budget


def test_token_budget_plan_rates_and_caps(spark):
    from tensorflow_recorder_spark.operators.sampling import token_budget_plan

    df = spark.createDataFrame(
        [("a", "one two three four"), ("a", "five six"),
         ("b", "uno dos")],
        "src string, text string",
    )
    # 2 sources, budget 4 -> 2 tokens per source; a has 6, b has 2
    rows = {r["source"]: r for r in
            token_budget_plan(df, "text", "src", budget_tokens=4).collect()}
    assert rows["a"]["n_docs"] == 2 and rows["a"]["n_tokens"] == 6
    assert rows["a"]["weight"] == 0.5
    assert rows["a"]["sample_rate"] == round(4 * 0.5 / 6, 6)
    assert rows["a"]["expected_tokens"] == 2
    # b exactly meets its share -> rate caps at 1.0
    assert rows["b"]["sample_rate"] == 1.0
    assert rows["b"]["expected_tokens"] == 2


def test_token_budget_plan_validates_budget(spark):
    import pytest

    from tensorflow_recorder_spark.operators.sampling import token_budget_plan

    df = spark.createDataFrame([("a", "x")], "src string, text string")
    with pytest.raises(ValueError):
        token_budget_plan(df, "text", "src", budget_tokens=0)


def test_dp_release_matches_dp_noisy_counts(spark):
    """The split finalize stage must release identical numbers to the
    fused operator when fed the exact counts it would have computed —
    the invariant that makes the streaming twin (s15) share the batch
    privacy accounting."""
    from pyspark.sql import functions as F

    from tensorflow_recorder_spark.operators.privacy import (
        dp_noisy_counts,
        dp_release,
    )

    df = spark.createDataFrame(
        [("a", "x")] * 5 + [("a", "y")] * 2 + [("b", "x")] * 9,
        "g string, h string",
    )
    fused = {
        (r["g"], r["h"]): (r["noisy_count"], r["released"])
        for r in dp_noisy_counts(df, ["g", "h"], epsilon=1.0).collect()
    }
    counts = df.groupBy("g", "h").agg(F.count(F.lit(1)).alias("n"))
    split = {
        (r["g"], r["h"]): (r["noisy_count"], r["released"])
        for r in dp_release(counts, ["g", "h"], "n", epsilon=1.0).collect()
    }
    assert fused == split


def test_dp_release_validates_epsilon(spark):
    import pytest

    from tensorflow_recorder_spark.operators.privacy import dp_release

    df = spark.createDataFrame([("a", 1)], "g string, n long")
    with pytest.raises(ValueError):
        dp_release(df, ["g"], "n", epsilon=0.0)
