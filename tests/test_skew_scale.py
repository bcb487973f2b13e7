"""Plan + exactness assertions for the r8 skew arm (r7 verdict item 5):
skew_split_pairs must equal the naive within-group pair join, route hot
groups through the salted (group, salt) join, and keep the copurchase
plan free of unbounded nested-loop shapes."""

import pytest

from pyspark.sql import functions as F


def _naive_pairs(df, group_col, item_col):
    rhs = df.select(
        F.col(group_col).alias("__g"), F.col(item_col).alias("__b")
    )
    return (
        df.join(
            rhs,
            (F.col(group_col) == F.col("__g"))
            & (F.col(item_col) < F.col("__b")),
        )
        .select(
            group_col,
            F.col(item_col).alias("item_a"),
            F.col("__b").alias("item_b"),
        )
    )


@pytest.fixture()
def basket_fixture(spark):
    """3 cold baskets (≤4 items) + 1 hot basket (40 items)."""
    rows = []
    for g, items in [(1, [3, 1, 7]), (2, [5]), (3, [9, 2, 4, 8])]:
        rows += [(g, i) for i in items]
    rows += [(99, i * 11 + 1) for i in range(40)]  # hot
    return spark.createDataFrame(rows, "g long, item long")


class TestSkewSplitPairs:
    def test_identical_to_naive_join(self, spark, basket_fixture):
        from tensorflow_recorder_spark.operators.skew import skew_split_pairs

        got = sorted(
            tuple(r)
            for r in skew_split_pairs(
                basket_fixture, "g", "item", hot_threshold=10, salt_buckets=4
            ).collect()
        )
        want = sorted(
            tuple(r) for r in _naive_pairs(basket_fixture, "g", "item").collect()
        )
        assert got == want
        # the hot basket contributes C(40,2) pairs, cold ones C(3,2)+C(4,2)
        assert len(got) == 780 + 3 + 6

    def test_hot_group_at_threshold_boundary(self, spark):
        """A group with exactly hot_threshold items stays on the cold
        path; threshold+1 goes hot — both must be exact."""
        from tensorflow_recorder_spark.operators.skew import skew_split_pairs

        rows = [(1, i) for i in range(8)] + [(2, i) for i in range(9)]
        df = spark.createDataFrame(rows, "g long, item long")
        got = sorted(
            tuple(r)
            for r in skew_split_pairs(
                df, "g", "item", hot_threshold=8, salt_buckets=3
            ).collect()
        )
        want = sorted(tuple(r) for r in _naive_pairs(df, "g", "item").collect())
        assert got == want
        assert len(got) == 28 + 36

    def test_hot_path_joins_on_salt(self, spark, basket_fixture):
        """Plan assertion: the salted arm's join keys include the salt
        column, so a hot group's pair work is split across buckets
        instead of pinned to one hash partition."""
        from tensorflow_recorder_spark.operators.skew import skew_split_pairs

        out = skew_split_pairs(
            basket_fixture, "g", "item", hot_threshold=10, salt_buckets=4
        )
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        assert "__salt" in plan
        # the hot-key detector must be a broadcast, never a shuffle join
        phys = out._jdf.queryExecution().executedPlan().toString()
        assert "Broadcast" in phys

    def test_no_unbounded_nested_loop(self, spark, basket_fixture):
        """Neither arm may degrade to a cartesian / unbounded
        nested-loop join (the salted arm's explode is a bounded
        replication, not a crossJoin)."""
        from tensorflow_recorder_spark.operators.skew import skew_split_pairs

        out = skew_split_pairs(
            basket_fixture, "g", "item", hot_threshold=10, salt_buckets=4
        )
        phys = out._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in phys


class TestCopurchaseSkewShape:
    def test_registry_copurchase_uses_skew_operator(self, spark):
        """rel_copurchase routes through skew_split_pairs (r8) and its
        plan carries the salt column for the hot arm."""
        from tensorflow_recorder_spark.queries import QUERIES

        out = QUERIES["rel_copurchase"](spark, "/root/testdata/sf0.001")
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        assert "__salt" in plan

    def test_copurchase_exact_on_synthetic_hot_basket(self, spark, tmp_path):
        """End-to-end on a lineitem fixture with one 100-line celebrity
        basket: the shipped query equals the naive top-20."""
        import os

        from tensorflow_recorder_spark.queries import QUERIES

        rows = []
        # 50 normal orders with 3 parts each (parts overlap pairwise)
        for o in range(50):
            for p in (o % 7, o % 7 + 1, o % 7 + 2):
                rows.append((o, p))
        # celebrity basket: order 999 holds 100 distinct parts
        rows += [(999, 100 + i) for i in range(100)]
        li = spark.createDataFrame(
            rows, "l_orderkey long, l_partkey long"
        ).withColumns(
            {
                "l_suppkey": F.lit(1).cast("long"),
                "l_linenumber": F.lit(1).cast("long"),
                "l_quantity": F.lit(1.0),
                "l_extendedprice": F.lit(1.0),
                "l_discount": F.lit(0.0),
                "l_tax": F.lit(0.0),
                "l_returnflag": F.lit("N"),
                "l_linestatus": F.lit("O"),
                "l_shipdate": F.current_date(),
            }
        )
        d = str(tmp_path / "sf")
        os.makedirs(d, exist_ok=True)
        li.write.parquet(f"{d}/lineitem.parquet", mode="overwrite")

        got = [tuple(r) for r in QUERIES["rel_copurchase"](spark, d).collect()]
        li2 = spark.read.parquet(f"{d}/lineitem.parquet").select(
            "l_orderkey", "l_partkey"
        ).distinct()
        rhs = li2.select(
            F.col("l_orderkey").alias("__ok"), F.col("l_partkey").alias("__pb")
        )
        want = [
            tuple(r)
            for r in li2.join(
                rhs,
                (F.col("l_orderkey") == F.col("__ok"))
                & (F.col("l_partkey") < F.col("__pb")),
            )
            .groupBy(
                F.col("l_partkey").alias("part_a"),
                F.col("__pb").alias("part_b"),
            )
            .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
            .orderBy(F.desc("n_orders"), F.asc("part_a"), F.asc("part_b"))
            .limit(20)
            .collect()
        ]
        assert got == want
