"""Round-6 session-3 operators: activity Gini, temporal split,
embedding dimension audit, changepoint, source divergence — exact
semantics pinned on hand-computed fixtures."""

from pyspark.sql import functions as F


class TestActivityGini:
    def test_hand_computed_gini(self, spark):
        from tensorflow_recorder_spark.operators.events import activity_gini

        # one group, per-user counts x = [1, 1, 4]:
        #   sum_ij |x_i - x_j| = 2*(|1-4| + |1-4|) = 12
        #   G = 12 / (2 * 3 * 6) = 1/3
        rows = []
        for u, n in ((1, 1), (2, 1), (3, 4)):
            rows += [(u, "click")] * n
        df = spark.createDataFrame(rows, "user_id long, event_type string")
        [r] = activity_gini(df).collect()
        assert r.n_keys == 3 and r.n_events == 6
        assert r.gini == round(1 / 3, 6)

    def test_perfect_equality_is_zero(self, spark):
        from tensorflow_recorder_spark.operators.events import activity_gini

        rows = [(u, "view") for u in range(5) for _ in range(3)]
        df = spark.createDataFrame(rows, "user_id long, event_type string")
        [r] = activity_gini(df).collect()
        assert r.gini == 0.0

    def test_groups_are_independent(self, spark):
        from tensorflow_recorder_spark.operators.events import activity_gini

        rows = [(1, "a"), (2, "a"), (2, "a"), (1, "b")]
        df = spark.createDataFrame(rows, "user_id long, event_type string")
        out = {r.event_type: r for r in activity_gini(df).collect()}
        # group a: x = [1, 2] -> sum|.| = 2 -> G = 2/(2*2*3) = 1/6
        assert out["a"].gini == round(1 / 6, 6)
        # group b: single user -> G = 0
        assert out["b"].gini == 0.0
        assert out["b"].n_keys == 1 and out["b"].n_events == 1

    def test_no_unpartitioned_window(self, spark):
        from tensorflow_recorder_spark.queries import QUERIES
        from tests.test_plan_windows import _unpartitioned_windows

        df = QUERIES["e4_activity_gini"](spark, "/root/testdata/sf0.001")
        assert _unpartitioned_windows(df) == []


class TestTemporalSplit:
    def test_routing_boundaries_and_cold_start(self, spark):
        from tensorflow_recorder_spark.queries import QUERIES
        import os, tempfile

        # 10 events at t = 0..9s from epoch day: cutoffs at lo+0.7*span
        # = 6.3s (TRAIN: t<=6) and lo+0.9*span = 8.1s (VALIDATION: 7,8;
        # TEST: 9). user 1 spans TRAIN+TEST (seen), user 99 only TEST.
        rows = [
            (i, f"2024-01-01 00:00:0{i}", 1 if i != 9 else 99, "click", 1.0, "{}")
            for i in range(10)
        ]
        d = tempfile.mkdtemp(prefix="tsplit-")
        spark.createDataFrame(
            rows,
            "event_id long, ts string, user_id long, event_type string,"
            " value double, props string",
        ).withColumn("ts", F.col("ts").cast("timestamp")).write.mode(
            "overwrite"
        ).parquet(os.path.join(d, "events.parquet"))
        out = {
            r.split: r
            for r in QUERIES["p6_temporal_split"](spark, d).collect()
        }
        assert out["TRAIN"].n_events == 7
        assert out["VALIDATION"].n_events == 2
        assert out["TEST"].n_events == 1
        # TEST's single event is user 99, never seen in TRAIN
        assert out["TEST"].n_users == 1
        assert out["TEST"].n_seen_in_train == 0
        assert out["VALIDATION"].n_seen_in_train == 1
        assert out["TRAIN"].seen_share == 1.0


class TestDimVariance:
    def test_dead_dimension_detected(self, spark):
        from tensorflow_recorder_spark.queries import QUERIES
        import os, tempfile

        # dim 1 varies, dim 2 is constant zero (dead), dim 3 constant 0.5
        rows = [
            (1, [1.0, 0.0, 0.5], 0),
            (2, [2.0, 0.0, 0.5], 0),
            (3, [3.0, 0.0, 0.5], 1),
        ]
        d = tempfile.mkdtemp(prefix="dimvar-")
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        ).write.mode("overwrite").parquet(
            os.path.join(d, "embeddings.parquet")
        )
        out = {
            r.dim: r for r in QUERIES["e2_dim_variance"](spark, d).collect()
        }
        assert out[1].mean_v == 2.0 and out[1].p50 == 2.0
        assert out[1].p05 == round(0.1 * 1.0 + 0.9 * 1.0, 6) or out[1].p05 >= 1.0
        assert out[2].n_zero == 3 and out[2].zero_share == 1.0
        assert out[2].p05 == out[2].p95 == 0.0
        assert out[3].n_zero == 0
        assert out[3].p05 == out[3].p95 == 0.5  # collapsed but nonzero


class TestChangepoint:
    def test_step_series_split_found(self, spark):
        from tensorflow_recorder_spark.queries import QUERIES
        import os, tempfile

        # daily counts [1, 1, 1, 5, 5] -> best split after day 3:
        # BGSS = 9/3 + 100/2 - 169/5 = 19.2, means 1.0 | 5.0
        rows = []
        eid = 0
        for day, n in ((1, 1), (2, 1), (3, 1), (4, 5), (5, 5)):
            for _ in range(n):
                rows.append(
                    (eid, f"2024-03-0{day} 12:00:00", 1, "click", 1.0, "{}")
                )
                eid += 1
        d = tempfile.mkdtemp(prefix="chgpt-")
        spark.createDataFrame(
            rows,
            "event_id long, ts string, user_id long, event_type string,"
            " value double, props string",
        ).withColumn("ts", F.col("ts").cast("timestamp")).write.mode(
            "overwrite"
        ).parquet(os.path.join(d, "events.parquet"))
        [r] = QUERIES["e4_changepoint"](spark, d).collect()
        assert r.split_day == "2024-03-03"
        assert r.n_days_left == 3 and r.n_days_right == 2
        assert r.mean_left == 1.0 and r.mean_right == 5.0
        assert r.bgss == 19.2

    def test_no_unpartitioned_window(self, spark):
        from tensorflow_recorder_spark.queries import QUERIES
        from tests.test_plan_windows import _unpartitioned_windows

        df = QUERIES["e4_changepoint"](spark, "/root/testdata/sf0.001")
        assert _unpartitioned_windows(df) == []


class TestSourceDivergence:
    def test_identical_sources_zero_clone_vs_disjoint(self, spark):
        from tensorflow_recorder_spark.queries import QUERIES
        import math, os, tempfile

        # a and b share one distribution; c is disjoint vocabulary ->
        # JSD(a,b) = 0, JSD(a,c) = ln(2) (maximal, no shared words)
        rows = [
            (1, "x x y", "en", "a", 5),
            (2, "x x y", "en", "b", 5),
            (3, "z z w", "en", "c", 5),
        ]
        d = tempfile.mkdtemp(prefix="srcdiv-")
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string,"
            " n_chars long"
        ).write.mode("overwrite").parquet(
            os.path.join(d, "documents.parquet")
        )
        out = {
            (r.source_a, r.source_b): r
            for r in QUERIES["e3_source_divergence"](spark, d).collect()
        }
        assert out[("a", "b")].jsd == 0.0
        assert out[("a", "b")].n_shared == 2
        assert out[("a", "c")].jsd == round(math.log(2.0), 6)
        assert out[("a", "c")].n_shared == 0


class TestStreamNewVsReturning:
    def test_cross_batch_day_regression_still_counted(self, spark):
        """A (user, day) arriving in a LATER micro-batch than a newer
        day of the same user must still count toward n_active (r6
        advice: the old two-scalar high-water-mark state silently
        dropped it)."""
        from tensorflow_recorder_spark.streaming.stateful import (
            streaming_new_vs_returning,
        )
        import os, tempfile

        from pyspark.sql import functions as F

        d = tempfile.mkdtemp(prefix="snvr-ooo-")
        schema = (
            "event_id long, ts string, user_id long, event_type string,"
            " value double, props string"
        )
        # batch 1 (file 0): user 1 on day 2. batch 2 (file 1): user 1
        # on day 1 — OLDER than the already-advanced day 2.
        spark.createDataFrame(
            [(0, "2024-05-02 08:00:00", 1, "click", 1.0, "{}")], schema
        ).withColumn("ts", F.col("ts").cast("timestamp")).write.parquet(
            os.path.join(d, "ev"), mode="overwrite"
        )
        spark.createDataFrame(
            [(1, "2024-05-01 09:00:00", 1, "view", 1.0, "{}")], schema
        ).withColumn("ts", F.col("ts").cast("timestamp")).write.mode(
            "append"
        ).parquet(os.path.join(d, "ev"))
        files = sorted(
            f
            for f in os.listdir(os.path.join(d, "ev"))
            if f.endswith(".parquet")
        )
        assert len(files) >= 2
        base = spark.read.parquet(os.path.join(d, "ev"))
        stream = (
            spark.readStream.schema(base.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(d, "ev"))
        )
        rows = streaming_new_vs_returning(stream)
        q = (
            rows.writeStream.format("memory")
            .queryName("snvr_ooo_sink")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        out = {
            r.day: r.is_new
            for r in spark.table("snvr_ooo_sink").collect()
        }
        # BOTH days present exactly once; the multi-batch drain used
        # several triggers (maxFilesPerTrigger=1 over >=2 files)
        assert set(out) == {"2024-05-01", "2024-05-02"}
        assert spark.table("snvr_ooo_sink").count() == 2

    def test_two_scalar_state_matches_batch_semantics(self, spark):
        from tensorflow_recorder_spark.queries import QUERIES
        import os, tempfile

        # user 1 active days 1,1,2; user 2 active day 2 only ->
        # day1: active=1 new=1; day2: active=2 new=1 (user 2)
        rows = [
            (0, "2024-05-01 08:00:00", 1, "click", 1.0, "{}"),
            (1, "2024-05-01 09:00:00", 1, "view", 1.0, "{}"),
            (2, "2024-05-02 08:00:00", 1, "click", 1.0, "{}"),
            (3, "2024-05-02 10:00:00", 2, "click", 1.0, "{}"),
        ]
        d = tempfile.mkdtemp(prefix="snvr-")
        spark.createDataFrame(
            rows,
            "event_id long, ts string, user_id long, event_type string,"
            " value double, props string",
        ).withColumn("ts", F.col("ts").cast("timestamp")).write.mode(
            "overwrite"
        ).parquet(os.path.join(d, "events.parquet"))
        out = {
            r.day: r
            for r in QUERIES["s28_stream_new_vs_returning"](
                spark, d
            ).collect()
        }
        assert out["2024-05-01"].n_active == 1
        assert out["2024-05-01"].n_new == 1
        assert out["2024-05-02"].n_active == 2
        assert out["2024-05-02"].n_new == 1
        assert out["2024-05-02"].n_returning == 1
        assert out["2024-05-02"].new_share == 0.5


class TestOutOfOrder:
    def test_backfilled_event_flagged_with_exact_lateness(self, spark):
        from tensorflow_recorder_spark.queries import QUERIES
        import os, tempfile

        # user 1: id 0 @ t=100s, id 1 @ t=50s (late by 50s), id 2 @ 200s
        # user 2: in-order
        rows = [
            (0, "2024-05-01 00:01:40", 1, "click", 1.0, "{}"),
            (1, "2024-05-01 00:00:50", 1, "click", 1.0, "{}"),
            (2, "2024-05-01 00:03:20", 1, "click", 1.0, "{}"),
            (3, "2024-05-01 00:00:00", 2, "view", 1.0, "{}"),
            (4, "2024-05-01 00:01:00", 2, "view", 1.0, "{}"),
        ]
        d = tempfile.mkdtemp(prefix="ooo-")
        spark.createDataFrame(
            rows,
            "event_id long, ts string, user_id long, event_type string,"
            " value double, props string",
        ).withColumn("ts", F.col("ts").cast("timestamp")).write.mode(
            "overwrite"
        ).parquet(os.path.join(d, "events.parquet"))
        out = {
            r.event_type: r
            for r in QUERIES["e4_out_of_order"](spark, d).collect()
        }
        assert out["click"].n_events == 3 and out["click"].n_late == 1
        assert out["click"].max_lateness_s == 50.0
        assert out["click"].late_share == round(1 / 3, 6)
        assert out["view"].n_late == 0
        assert out["view"].max_lateness_s is None


class TestCopurchase:
    def test_pair_counts_and_ordering(self, spark):
        from tensorflow_recorder_spark.queries import QUERIES
        import os, tempfile

        rows = []
        for ok, parts in ((1, [10, 20, 30]), (2, [10, 20]), (3, [20, 10]),
                          (4, [10, 10, 40])):
            for i, pk in enumerate(parts):
                rows.append((ok, pk, 1, i, 1.0, 10.0, 0.0, 0.0, "N", "O",
                             "2024-01-01 00:00:00"))
        d = tempfile.mkdtemp(prefix="copur-")
        spark.createDataFrame(
            rows,
            "l_orderkey long, l_partkey long, l_suppkey long,"
            " l_linenumber int, l_quantity double, l_extendedprice double,"
            " l_discount double, l_tax double, l_returnflag string,"
            " l_linestatus string, l_shipdate string",
        ).withColumn(
            "l_shipdate", F.col("l_shipdate").cast("timestamp")
        ).write.mode("overwrite").parquet(
            os.path.join(d, "lineitem.parquet")
        )
        out = QUERIES["rel_copurchase"](spark, d).collect()
        as_map = {(r.part_a, r.part_b): r.n_orders for r in out}
        # (10,20) in orders 1,2,3; duplicate part 10 in order 4 collapses
        # so (10,40) counts once; no self-pair (10,10)
        assert as_map[(10, 20)] == 3
        assert as_map[(10, 30)] == 1 and as_map[(20, 30)] == 1
        assert as_map[(10, 40)] == 1
        assert (10, 10) not in as_map
        assert out[0].part_a == 10 and out[0].part_b == 20  # top by count


class TestAutocorr:
    def test_alternating_series_lag1_negative(self, spark):
        from tensorflow_recorder_spark.queries import QUERIES
        import os, tempfile

        # daily counts alternate 1,3,1,3,... -> lag-1 r = -1, lag-7
        # (odd lag on period-2 series) also -1
        rows = []
        eid = 0
        for day in range(1, 15):
            n = 1 if day % 2 else 3
            for _ in range(n):
                rows.append(
                    (eid, f"2024-06-{day:02d} 12:00:00", 1, "click", 1.0, "{}")
                )
                eid += 1
        d = tempfile.mkdtemp(prefix="acf-")
        spark.createDataFrame(
            rows,
            "event_id long, ts string, user_id long, event_type string,"
            " value double, props string",
        ).withColumn("ts", F.col("ts").cast("timestamp")).write.mode(
            "overwrite"
        ).parquet(os.path.join(d, "events.parquet"))
        out = {r.lag: r for r in QUERIES["e4_autocorr"](spark, d).collect()}
        assert out[1].n_pairs == 13 and out[1].r == -1.0
        assert out[7].n_pairs == 7 and out[7].r == -1.0

    def test_constant_series_null_r(self, spark):
        from tensorflow_recorder_spark.queries import QUERIES
        import os, tempfile

        rows = [
            (i, f"2024-06-{d:02d} 12:00:00", 1, "click", 1.0, "{}")
            for i, d in enumerate(range(1, 10))
        ]
        d = tempfile.mkdtemp(prefix="acf0-")
        spark.createDataFrame(
            rows,
            "event_id long, ts string, user_id long, event_type string,"
            " value double, props string",
        ).withColumn("ts", F.col("ts").cast("timestamp")).write.mode(
            "overwrite"
        ).parquet(os.path.join(d, "events.parquet"))
        out = {r.lag: r for r in QUERIES["e4_autocorr"](spark, d).collect()}
        assert out[1].r is None  # zero variance -> undefined, not crash


class TestDupLengthBias:
    def test_short_dups_give_negative_r(self, spark):
        from tensorflow_recorder_spark.queries import QUERIES
        import os, tempfile

        rows = [
            (1, "a", "en", "s1", 5),
            (2, "a", "en", "s1", 7),
            (3, "b", "en", "s1", 100),
        ]
        d = tempfile.mkdtemp(prefix="dlb-")
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string,"
            " n_chars long"
        ).write.mode("overwrite").parquet(
            os.path.join(d, "documents.parquet")
        )
        [r] = QUERIES["e1_dup_length_bias"](spark, d).collect()
        assert r.n_docs == 3 and r.n_dup_docs == 2
        assert r.mean_len_dup == 6.0 and r.mean_len_uniq == 100.0
        assert r.r_pb < -0.99  # dups are short -> strong negative bias

    def test_no_dups_yields_null_r(self, spark):
        from tensorflow_recorder_spark.queries import QUERIES
        import os, tempfile

        rows = [(1, "a", "en", "s1", 5), (2, "b", "en", "s1", 9)]
        d = tempfile.mkdtemp(prefix="dlb0-")
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string,"
            " n_chars long"
        ).write.mode("overwrite").parquet(
            os.path.join(d, "documents.parquet")
        )
        [r] = QUERIES["e1_dup_length_bias"](spark, d).collect()
        assert r.n_dup_docs == 0
        assert r.mean_len_dup is None and r.r_pb is None


class TestDiffInDiff:
    def test_common_trend_differenced_out(self, spark):
        from tensorflow_recorder_spark.queries import QUERIES
        import os, tempfile

        # control (user 1, odd): pre mean 10, post mean 14 (trend +4)
        # treated (user 2, even): pre mean 12, post mean 20 (+8)
        # DiD = (20-12) - (14-10) = 4
        rows = [
            (0, "2024-01-10 00:00:00", 1, "click", 10.0, "{}"),
            (1, "2024-01-20 00:00:00", 1, "click", 14.0, "{}"),
            (2, "2024-01-10 00:00:00", 2, "click", 12.0, "{}"),
            (3, "2024-01-20 00:00:00", 2, "click", 20.0, "{}"),
        ]
        d = tempfile.mkdtemp(prefix="did-")
        spark.createDataFrame(
            rows,
            "event_id long, ts string, user_id long, event_type string,"
            " value double, props string",
        ).withColumn("ts", F.col("ts").cast("timestamp")).write.mode(
            "overwrite"
        ).parquet(os.path.join(d, "events.parquet"))
        [r] = QUERIES["e4_diff_in_diff"](spark, d).collect()
        assert (r.n_t_pre, r.n_t_post, r.n_c_pre, r.n_c_post) == (1, 1, 1, 1)
        assert r.mean_t_post == 20.0 and r.mean_c_pre == 10.0
        assert r.did == 4.0


class TestStreamOutOfOrder:
    def test_one_scalar_state_matches_batch(self, spark):
        from tensorflow_recorder_spark.queries import QUERIES
        import os, tempfile

        rows = [
            (0, "2024-05-01 00:01:40", 1, "click", 1.0, "{}"),
            (1, "2024-05-01 00:00:50", 1, "click", 1.0, "{}"),
            (2, "2024-05-01 00:03:20", 1, "click", 1.0, "{}"),
            (3, "2024-05-01 00:00:00", 2, "view", 1.0, "{}"),
        ]
        d = tempfile.mkdtemp(prefix="sooo-")
        spark.createDataFrame(
            rows,
            "event_id long, ts string, user_id long, event_type string,"
            " value double, props string",
        ).withColumn("ts", F.col("ts").cast("timestamp")).write.mode(
            "overwrite"
        ).parquet(os.path.join(d, "events.parquet"))
        stream = {
            r.event_type: r
            for r in QUERIES["s29_stream_out_of_order"](spark, d).collect()
        }
        batch = {
            r.event_type: r
            for r in QUERIES["e4_out_of_order"](spark, d).collect()
        }
        for t in ("click", "view"):
            assert stream[t].n_late == batch[t].n_late
            assert stream[t].max_lateness_s == batch[t].max_lateness_s
        assert stream["click"].n_late == 1
        assert stream["click"].max_lateness_s == 50.0


class TestEssMixture:
    def test_alpha_one_is_corpus_size_and_flattening_costs(self, spark):
        from tensorflow_recorder_spark.queries import QUERIES
        import os, tempfile

        # sources: a=8 docs, b=2 docs (N=10). alpha=1 -> ESS = N.
        # alpha=0.5: p_a = sqrt8/(sqrt8+sqrt2), p_b = sqrt2/(...) ->
        # p=(2/3, 1/3); ESS = 1/((4/9)/8 + (1/9)/2) = 9.
        rows = [(i, f"t{i}", "en", "a" if i < 8 else "b", 5)
                for i in range(10)]
        d = tempfile.mkdtemp(prefix="ess-")
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string,"
            " n_chars long"
        ).write.mode("overwrite").parquet(
            os.path.join(d, "documents.parquet")
        )
        out = {r.alpha: r for r in QUERIES["e6_ess_mixture"](spark, d).collect()}
        assert out[1.0].n_docs == 10
        assert abs(out[1.0].ess - 10.0) < 1e-3
        assert abs(out[1.0].ess_ratio - 1.0) < 1e-4
        assert abs(out[0.5].ess - 9.0) < 1e-3
        # flattening strictly reduces ESS on a skewed mix
        assert out[0.5].ess < out[0.7].ess < out[1.0].ess


class TestDistinctiveTerms:
    def test_overrepresented_word_wins(self, spark):
        from tensorflow_recorder_spark.queries import QUERIES
        import os, tempfile

        # 'zebra' dominates source a but is rare elsewhere; common
        # filler 'the' appears evenly -> zebra must outrank the in a
        rows = [
            (1, "zebra zebra zebra the", "en", "a", 20),
            (2, "zebra the filler words", "en", "a", 20),
            (3, "the filler words here", "en", "b", 20),
            (4, "the filler words here", "en", "b", 20),
        ]
        d = tempfile.mkdtemp(prefix="dterm-")
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string,"
            " n_chars long"
        ).write.mode("overwrite").parquet(
            os.path.join(d, "documents.parquet")
        )
        out = QUERIES["e3_distinctive_terms"](spark, d).collect()
        a_top = [r.word for r in out if r.source == "a" and r.rank == 1]
        assert a_top == ["zebra"]
        ranks = {(r.source, r.rank) for r in out}
        assert all(rk <= 5 for _, rk in ranks)


class TestTenureCurve:
    def test_survival_table_exact(self, spark):
        from tensorflow_recorder_spark.queries import QUERIES
        import os, tempfile

        # user 1: one day (tenure 0w); user 2: 10-day span (1w);
        # user 3: 15-day span (2w)
        rows = [
            (0, "2024-01-01 00:00:00", 1, "click", 1.0, "{}"),
            (1, "2024-01-01 00:00:00", 2, "click", 1.0, "{}"),
            (2, "2024-01-11 00:00:00", 2, "click", 1.0, "{}"),
            (3, "2024-01-01 00:00:00", 3, "click", 1.0, "{}"),
            (4, "2024-01-16 00:00:00", 3, "click", 1.0, "{}"),
        ]
        d = tempfile.mkdtemp(prefix="tenure-")
        spark.createDataFrame(
            rows,
            "event_id long, ts string, user_id long, event_type string,"
            " value double, props string",
        ).withColumn("ts", F.col("ts").cast("timestamp")).write.mode(
            "overwrite"
        ).parquet(os.path.join(d, "events.parquet"))
        out = {
            r.tenure_weeks: r
            for r in QUERIES["e4_tenure_curve"](spark, d).collect()
        }
        assert out[0].n_users == 1 and out[0].n_surviving == 3
        assert out[0].survival_share == 1.0
        assert out[1].n_users == 1 and out[1].n_surviving == 2
        assert out[2].n_users == 1 and out[2].n_surviving == 1
        assert out[2].survival_share == round(1 / 3, 6)


class TestThresholdSweep:
    def test_monotone_and_zero_tail(self, spark):
        from tensorflow_recorder_spark.queries import QUERIES

        out = {
            r.threshold: r
            for r in QUERIES["e1_threshold_sweep"](
                spark, "/root/testdata/sf0.001"
            ).collect()
        }
        assert set(out) == {0.3, 0.4, 0.5, 0.6, 0.7, 0.8}
        # raising the threshold never keeps more pairs or drops more docs
        ts = sorted(out)
        for lo, hi in zip(ts, ts[1:]):
            assert out[lo].n_pairs >= out[hi].n_pairs
            assert out[lo].n_docs_dropped >= out[hi].n_docs_dropped
        assert out[0.3].n_pairs > 0  # fixture has near-dups


class TestLexicalSemanticAgreement:
    def test_counts_and_jaccard_overlap_on_fixture(self, spark):
        from tensorflow_recorder_spark.queries import QUERIES

        [r] = QUERIES["e1_lexical_semantic_agreement"](
            spark, "/root/testdata/sf0.001"
        ).collect()
        assert r.n_lexical >= 0 and r.n_semantic >= 0
        assert r.n_both <= min(r.n_lexical, r.n_semantic)
        if r.n_lexical + r.n_semantic > 0:
            union = r.n_lexical + r.n_semantic - r.n_both
            assert r.agreement == round(r.n_both / union, 6)
        else:
            assert r.agreement is None


class TestStreamActivityGini:
    def test_stream_matches_batch_gini(self, spark):
        from tensorflow_recorder_spark.queries import QUERIES

        sf = "/root/testdata/sf0.001"
        batch = {
            r.event_type: r
            for r in QUERIES["e4_activity_gini"](spark, sf).collect()
        }
        stream = {
            r.event_type: r
            for r in QUERIES["s30_stream_activity_gini"](spark, sf).collect()
        }
        assert set(batch) == set(stream)
        for t in batch:
            assert stream[t].gini == batch[t].gini
            assert stream[t].n_keys == batch[t].n_keys
            assert stream[t].n_events == batch[t].n_events


class TestClusterInflation:
    def test_chain_inflates_implied_pairs(self, spark):
        from tensorflow_recorder_spark.queries import QUERIES

        [r] = QUERIES["e1_cluster_inflation"](
            spark, "/root/testdata/sf0.001"
        ).collect()
        # implied pairs always >= verified pairs (CC only merges)
        assert r.n_implied_pairs >= r.n_pairs
        if r.n_pairs:
            assert r.inflation >= 1.0
        # every clustered doc sits in a cluster of size >= 2
        assert r.n_clustered_docs >= 2 * r.n_clusters


class TestForecastBacktest:
    def test_seasonal_series_gives_positive_skill(self, spark):
        from tensorflow_recorder_spark.queries import QUERIES
        import os, tempfile

        # 28 days, weekly pattern: weekday counts cycle 1..7 repeating.
        # seasonal-naive is perfect (MAE 0); naive errs -> skill = 1.
        rows = []
        eid = 0
        for day in range(28):
            n = (day % 7) + 1
            date = f"2024-03-{day + 1:02d}"
            for _ in range(n):
                rows.append((eid, f"{date} 12:00:00", 1, "click", 1.0, "{}"))
                eid += 1
        d = tempfile.mkdtemp(prefix="fbt-")
        spark.createDataFrame(
            rows,
            "event_id long, ts string, user_id long, event_type string,"
            " value double, props string",
        ).withColumn("ts", F.col("ts").cast("timestamp")).write.mode(
            "overwrite"
        ).parquet(os.path.join(d, "events.parquet"))
        [r] = QUERIES["e4_forecast_backtest"](spark, d).collect()
        assert r.n_scored == 7
        assert r.mae_seasonal == 0.0
        assert r.mae_naive > 0.0
        assert r.skill == 1.0


class TestFuzzyContamination:
    def test_counts_consistent_with_incremental_pairs(self, spark):
        from tensorflow_recorder_spark.queries import QUERIES

        sf = "/root/testdata/sf0.001"
        [r] = QUERIES["e1_fuzzy_contamination"](spark, sf).collect()
        pairs = QUERIES["e1_incremental_dedup"](spark, sf).collect()
        assert r.n_contaminated == len({p.id_b for p in pairs})
        assert 0 <= r.n_contaminated <= r.n_eval
        assert r.contaminated_share == round(r.n_contaminated / r.n_eval, 6)


class TestMadOutliers:
    def test_spike_day_flagged_mean_would_be_dragged(self, spark):
        from tensorflow_recorder_spark.queries import QUERIES
        import os, tempfile

        # 14 quiet days alternating 9/11 events + one 100-event spike:
        # sorted counts put the median at 11, MAD at 2; only the spike
        # crosses the 3.5 modified-z fence (z = 0.6745*89/2 ~ 30).
        rows = []
        eid = 0
        counts = [9, 11] * 7 + [100]
        for day, n in enumerate(counts, start=1):
            for _ in range(n):
                rows.append(
                    (eid, f"2024-03-{day:02d} 12:00:00", 1, "click", 1.0, "{}")
                )
                eid += 1
        d = tempfile.mkdtemp(prefix="mad-")
        spark.createDataFrame(
            rows,
            "event_id long, ts string, user_id long, event_type string,"
            " value double, props string",
        ).withColumn("ts", F.col("ts").cast("timestamp")).write.mode(
            "overwrite"
        ).parquet(os.path.join(d, "events.parquet"))
        [r] = QUERIES["e4_mad_outliers"](spark, d).collect()
        assert r.n_days == 15
        assert r.median_daily == 11.0 and r.mad == 2.0
        assert r.n_outlier_days == 1  # only the spike crosses 3.5

    def test_constant_series_no_outliers(self, spark):
        from tensorflow_recorder_spark.queries import QUERIES
        import os, tempfile

        rows = [
            (i, f"2024-03-{d:02d} 12:00:00", 1, "click", 1.0, "{}")
            for i, d in enumerate([1, 2, 3, 4, 5])
        ]
        d = tempfile.mkdtemp(prefix="mad0-")
        spark.createDataFrame(
            rows,
            "event_id long, ts string, user_id long, event_type string,"
            " value double, props string",
        ).withColumn("ts", F.col("ts").cast("timestamp")).write.mode(
            "overwrite"
        ).parquet(os.path.join(d, "events.parquet"))
        [r] = QUERIES["e4_mad_outliers"](spark, d).collect()
        assert r.mad == 0.0 and r.n_outlier_days == 0  # NULL z, not div0


class TestShipLatencyBuckets:
    def test_bucket_boundaries_and_shares(self, spark):
        from tensorflow_recorder_spark.queries import QUERIES
        import os, tempfile

        d = tempfile.mkdtemp(prefix="shiplat-")
        orders = [(1, 1, "O", 10.0, "2024-01-01 00:00:00", "1-URGENT")]
        lines = [
            # latencies 30 (boundary -> 00-30), 31 (-> 31-60), 91 (-> 90+)
            (1, 1, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", "2024-01-31 00:00:00"),
            (1, 2, 1, 2, 1.0, 10.0, 0.0, 0.0, "N", "O", "2024-02-01 00:00:00"),
            (1, 3, 1, 3, 1.0, 10.0, 0.0, 0.0, "N", "O", "2024-04-01 00:00:00"),
        ]
        spark.createDataFrame(
            orders,
            "o_orderkey long, o_custkey long, o_orderstatus string,"
            " o_totalprice double, o_orderdate string, o_orderpriority string",
        ).withColumn(
            "o_orderdate", F.col("o_orderdate").cast("timestamp")
        ).write.mode("overwrite").parquet(os.path.join(d, "orders.parquet"))
        spark.createDataFrame(
            lines,
            "l_orderkey long, l_partkey long, l_suppkey long,"
            " l_linenumber int, l_quantity double, l_extendedprice double,"
            " l_discount double, l_tax double, l_returnflag string,"
            " l_linestatus string, l_shipdate string",
        ).withColumn(
            "l_shipdate", F.col("l_shipdate").cast("timestamp")
        ).write.mode("overwrite").parquet(os.path.join(d, "lineitem.parquet"))
        out = {
            r.latency_bucket: r
            for r in QUERIES["rel_ship_latency_buckets"](spark, d).collect()
        }
        assert out["00-30"].n_lines == 1
        assert out["31-60"].n_lines == 1
        assert out["90+"].n_lines == 1
        assert out["00-30"].share == round(1 / 3, 6)


class TestRocchioPrf:
    def test_prf_finds_topical_doc_without_keywords(self, spark):
        from tensorflow_recorder_spark.queries import QUERIES
        import os, tempfile

        # docs 1-2 contain the query words; doc 3 shares NO keywords.
        # embeddings: 1,2,3 point the same way; 4 is orthogonal ->
        # PRF centroid (from BM25 top docs 1,2) must rank 3 above 4.
        docs = [
            (1, "hash join spark", "en", "a", 15),
            (2, "hash join spark again", "en", "a", 20),
            (3, "totally different words", "en", "a", 23),
            (4, "unrelated filler text", "en", "a", 21),
        ]
        embs = [
            (1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.95, 0.05]),
            (4, [0.0, 1.0]),
        ]
        d = tempfile.mkdtemp(prefix="prf-")
        spark.createDataFrame(
            docs, "doc_id long, text string, lang string, source string,"
            " n_chars long"
        ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
        spark.createDataFrame(
            [(i, v, 0) for i, v in embs],
            "vec_id long, embedding array<float>, label int",
        ).write.mode("overwrite").parquet(
            os.path.join(d, "embeddings.parquet")
        )
        out = QUERIES["e2_rocchio_prf"](spark, d).collect()
        scores = {r.vec_id: r.score for r in out}
        assert scores[3] > scores[4]  # topical neighbor beats orthogonal
        assert out[0].vec_id in (1, 2, 3)


class TestTypeCorrelationMatrix:
    def test_perfect_anti_and_missing_day_zero_fill(self, spark):
        from tensorflow_recorder_spark.queries import QUERIES
        import os, tempfile

        # a: [1,2,3]; b: [3,2,1] -> r(a,b) = -1.
        # c appears only on day 1 (days 2,3 are REAL zeros): c=[5,0,0]
        rows = []
        eid = 0
        for day, counts in ((1, {"a": 1, "b": 3, "c": 5}),
                            (2, {"a": 2, "b": 2}),
                            (3, {"a": 3, "b": 1})):
            for t, n in counts.items():
                for _ in range(n):
                    rows.append(
                        (eid, f"2024-03-0{day} 12:00:00", 1, t, 1.0, "{}")
                    )
                    eid += 1
        d = tempfile.mkdtemp(prefix="tcm-")
        spark.createDataFrame(
            rows,
            "event_id long, ts string, user_id long, event_type string,"
            " value double, props string",
        ).withColumn("ts", F.col("ts").cast("timestamp")).write.mode(
            "overwrite"
        ).parquet(os.path.join(d, "events.parquet"))
        out = {
            (r.type_a, r.type_b): r
            for r in QUERIES["e4_type_correlation_matrix"](spark, d).collect()
        }
        assert len(out) == 3  # C(3,2) canonical pairs
        assert out[("a", "b")].r == -1.0
        assert out[("a", "b")].n_days == 3
        # c's zero-filled days: r(b,c) with b=[3,2,1], c=[5,0,0] > 0
        assert out[("b", "c")].r > 0.8


class TestFlagPropagation:
    def test_leaky_cluster_detected(self, spark):
        from tensorflow_recorder_spark.queries import QUERIES
        import os, tempfile

        # docs 1/2 near-identical (one cluster, kept = min id 1);
        # only the DROPPED member (2) carries the flag term 'spark'.
        base = "the quick brown fox jumps over the lazy dog " * 4
        rows = [
            (1, base + "tail one", "en", "a", 100),
            (2, base + "spark two", "en", "a", 100),
            (3, "completely unrelated text here", "en", "a", 30),
        ]
        d = tempfile.mkdtemp(prefix="flagprop-")
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string,"
            " n_chars long"
        ).write.mode("overwrite").parquet(
            os.path.join(d, "documents.parquet")
        )
        [r] = QUERIES["e6_flag_propagation"](spark, d).collect()
        assert r.n_clusters == 1 and r.n_clustered_docs == 2
        assert r.n_flagged_members == 1
        assert r.n_clusters_flagged == 1
        assert r.n_leaky_clusters == 1  # kept doc 1 is clean


class TestStreamTenureCurve:
    def test_stream_matches_batch_table(self, spark):
        from tensorflow_recorder_spark.queries import QUERIES

        sf = "/root/testdata/sf0.001"
        batch = sorted(
            [tuple(r) for r in QUERIES["e4_tenure_curve"](spark, sf).collect()]
        )
        stream = sorted(
            [
                tuple(r)
                for r in QUERIES["s31_stream_tenure_curve"](
                    spark, sf
                ).collect()
            ]
        )
        assert stream == batch


class TestDimCorrelation:
    def test_duplicated_dimension_has_r_one(self, spark):
        from tensorflow_recorder_spark.queries import QUERIES
        import os, tempfile

        # dims 1 and 2 identical (r=1); dim 3 = -dim1 (r=-1);
        # dim 4 constant (zero variance, excluded from any pair r as
        # NULL if selected; with only 4 dims all are in top-8)
        rows = [
            (i, [float(i), float(i), float(-i), 1.0], 0) for i in range(1, 6)
        ]
        d = tempfile.mkdtemp(prefix="dimcor-")
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        ).write.mode("overwrite").parquet(
            os.path.join(d, "embeddings.parquet")
        )
        out = {
            (r.dim_a, r.dim_b): r
            for r in QUERIES["e2_dim_correlation"](spark, d).collect()
        }
        assert out[(1, 2)].r == 1.0
        assert out[(1, 3)].r == -1.0
        assert out[(1, 4)].r is None  # constant dim -> undefined
        assert out[(1, 2)].n_vectors == 5


class TestSegmentMigration:
    def test_upgrade_churn_and_new_cells(self, spark):
        from tensorflow_recorder_spark.queries import QUERIES
        import os, tempfile

        # range Jan 1 .. Jan 10 (midpoint Jan 5.5). customer 1: LOW in
        # h1, HIGH in h2 (upgrade). customer 2: only h1 (churn ->
        # NONE). customer 3: only h2 (new).
        orders = [
            (1, 1, "O", 50000.0, "2024-01-01 00:00:00", "1-URGENT"),
            (2, 1, "O", 400000.0, "2024-01-10 00:00:00", "1-URGENT"),
            (3, 2, "O", 150000.0, "2024-01-02 00:00:00", "1-URGENT"),
            (4, 3, "O", 350000.0, "2024-01-09 00:00:00", "1-URGENT"),
        ]
        d = tempfile.mkdtemp(prefix="segmig-")
        spark.createDataFrame(
            orders,
            "o_orderkey long, o_custkey long, o_orderstatus string,"
            " o_totalprice double, o_orderdate string, o_orderpriority string",
        ).withColumn(
            "o_orderdate", F.col("o_orderdate").cast("timestamp")
        ).write.mode("overwrite").parquet(os.path.join(d, "orders.parquet"))
        out = {
            (r.from_tier, r.to_tier): r.n_customers
            for r in QUERIES["rel_segment_migration"](spark, d).collect()
        }
        assert out[("LOW", "HIGH")] == 1
        assert out[("MID", "NONE")] == 1
        assert out[("NONE", "HIGH")] == 1
        assert sum(out.values()) == 3


class TestQualityThresholdCurve:
    def test_monotone_and_exact_shares(self, spark):
        from tensorflow_recorder_spark.queries import QUERIES

        out = {
            r.threshold: r
            for r in QUERIES["e6_quality_threshold_curve"](
                spark, "/root/testdata/sf0.001"
            ).collect()
        }
        assert set(out) == {0.4, 0.5, 0.6, 0.7, 0.8}
        ts = sorted(out)
        for lo, hi in zip(ts, ts[1:]):
            assert out[lo].n_docs_kept >= out[hi].n_docs_kept
            assert out[lo].n_chars_kept >= out[hi].n_chars_kept
        assert 0.0 <= out[0.8].doc_share <= out[0.4].doc_share <= 1.0


class TestLabelInconsistency:
    def test_conflicting_group_counted(self, spark):
        from tensorflow_recorder_spark.queries import QUERIES
        import os, tempfile

        rows = [
            (1, "same text", "en", "a", 9),
            (2, "same text", "fr", "a", 9),   # conflict
            (3, "other text", "en", "a", 10),
            (4, "other text", "en", "a", 10),  # dup, consistent
            (5, "unique", "de", "a", 6),
        ]
        d = tempfile.mkdtemp(prefix="labinc-")
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string,"
            " n_chars long"
        ).write.mode("overwrite").parquet(
            os.path.join(d, "documents.parquet")
        )
        [r] = QUERIES["e1_label_inconsistency"](spark, d).collect()
        assert r.n_dup_groups == 2
        assert r.n_conflicting_groups == 1
        assert r.n_docs_in_conflict == 2
        assert r.conflict_share == 0.5


class TestShardStability:
    def test_ring_moves_far_fewer_docs_than_mod(self, spark):
        from tensorflow_recorder_spark.queries import QUERIES

        [r] = QUERIES["e6_shard_stability"](
            spark, "/root/testdata/sf0.001"
        ).collect()
        # n_docs must be the ACTUAL document count, not inflated by the
        # 20-row node cross join (r6 advice: docs are pre-aggregated to
        # (position, ndocs) before the theta-join)
        true_docs = (
            spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .count()
        )
        assert r.n_docs == true_docs
        # mod-N resize reshuffles most of the corpus; the ring only the
        # arc claimed by the 4 new nodes (4/20 expected)
        assert r.mod_moved_share > 0.7
        assert r.ring_moved_share < 0.5
        assert r.ring_moved_share < r.mod_moved_share
        assert r.n_moved_ring <= r.n_docs and r.n_moved_mod <= r.n_docs


class TestStreamDiffInDiffAndChangepoint:
    def test_stream_twins_match_batch(self, spark):
        from tensorflow_recorder_spark.queries import QUERIES

        sf = "/root/testdata/sf0.001"
        [bd] = QUERIES["e4_diff_in_diff"](spark, sf).collect()
        [sd] = QUERIES["s32_stream_diff_in_diff"](spark, sf).collect()
        assert tuple(sd) == tuple(bd)
        [bc] = QUERIES["e4_changepoint"](spark, sf).collect()
        [sc] = QUERIES["s33_stream_changepoint"](spark, sf).collect()
        assert tuple(sc) == tuple(bc)


class TestNlistRecallCurve:
    def test_more_cells_never_raise_nprobe1_recall(self, spark):
        from tensorflow_recorder_spark.queries import QUERIES

        out = {
            r.nlist: r
            for r in QUERIES["e2_nlist_recall_curve"](
                spark, "/root/testdata/sf0.001"
            ).collect()
        }
        assert set(out) == {4, 8, 16}
        for k in out:
            assert 0.0 <= out[k].recall <= 1.0
            assert out[k].n_true == 50  # 5 queries x 10 truth rows
        # finer partitions probe a smaller fraction at nprobe=1: recall
        # must not improve as K grows on the same corpus
        assert out[4].recall >= out[16].recall
