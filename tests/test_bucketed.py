"""Bucketed table layout: writes register the bucket spec in the
catalog, and keyed joins/aggregations between co-bucketed tables elide
their Exchange — the storage-level co-location contract pinned here."""

import contextlib
import io

import pytest

from tensorflow_recorder_spark.sinks.bucketed import read_table, write_bucketed


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture()
def bucketed_pair(spark, tmp_path):
    a = spark.range(0, 5000).selectExpr("id AS k", "id * 2 AS va")
    b = spark.range(0, 5000).selectExpr("id AS k", "id * 3 AS vb")
    write_bucketed(a, "t_bucket_a", ["k"], 4, sort_cols=["k"], path=str(tmp_path / "a"))
    write_bucketed(b, "t_bucket_b", ["k"], 4, sort_cols=["k"], path=str(tmp_path / "b"))
    yield "t_bucket_a", "t_bucket_b"
    spark.sql("DROP TABLE IF EXISTS t_bucket_a")
    spark.sql("DROP TABLE IF EXISTS t_bucket_b")


def test_cobucketed_join_has_no_exchange(spark, bucketed_pair):
    ta, tb = bucketed_pair
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = read_table(spark, ta).join(read_table(spark, tb), "k")
        plan = _plan(j)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # the whole point of the layout
        assert j.count() == 5000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_aggregation_has_no_exchange(spark, bucketed_pair):
    ta, _ = bucketed_pair
    agg = read_table(spark, ta).groupBy("k").count()
    plan = _plan(agg)
    assert "Exchange" not in plan
    assert agg.count() == 5000


def test_plain_path_read_does_not_know_the_layout(spark, bucketed_pair, tmp_path):
    """Control: reading the same files by path (no catalog entry) must
    NOT elide the exchange — the bucket spec lives in the catalog."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.read.parquet(str(tmp_path / "a"))
        b = spark.read.parquet(str(tmp_path / "b"))
        assert "Exchange" in _plan(a.join(b, "k"))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_write_bucketed_validates(spark):
    df = spark.range(1).selectExpr("id AS k")
    with pytest.raises(ValueError):
        write_bucketed(df, "t_x", [], 4)
    with pytest.raises(ValueError):
        write_bucketed(df, "t_x", ["k"], 0)
