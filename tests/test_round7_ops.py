"""Round-7 operator behavior tests: shingle-size sweep, IVF scan-cost
frontier, dow x hour heatmap, keyframe budget, and the session-depth
streaming twin (batch/stream parity + cross-operator consistency)."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF), reason="driver testdata not present"
)


class TestShingleSizeSweep:
    def test_identical_docs_share_everything(self, spark):
        from tensorflow_recorder_spark.queries import QUERIES

        rows = [
            (0, "the quick brown fox jumps", "en", "a", 25),
            (1, "the quick brown fox jumps", "en", "b", 25),
            (2, "zzzzzzzzzzzz", "en", "a", 12),
        ]
        d = tempfile.mkdtemp(prefix="shsw-")
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string,"
            " n_chars long"
        ).write.mode("overwrite").parquet(
            os.path.join(d, "documents.parquet")
        )
        out = {
            r.shingle_k: r
            for r in QUERIES["e1_shingle_size_sweep"](spark, d).collect()
        }
        assert set(out) == {3, 5, 8}
        for k, r in out.items():
            # docs 0 and 1 are identical: every one of their shingles is
            # shared; doc 2 is one repeated char = exactly ONE distinct
            # shingle, unshared
            assert r.n_shared == r.n_shingles - 1
            # incidences: docs 0/1 contribute 2x their shingle set, doc 2
            # contributes 1
            assert r.n_incidences == 2 * (r.n_shingles - 1) + 1
        # one k-gram set per distinct text: doc2 contributes exactly 1
        assert all(r.n_shingles >= 2 for r in out.values())


class TestScanCostFrontier:
    def test_monotone_recall_and_cost(self, spark):
        from tensorflow_recorder_spark.queries import QUERIES

        rows = {
            r.nprobe: r
            for r in QUERIES["e2_scan_cost_frontier"](spark, SF).collect()
        }
        assert set(rows) == {1, 2, 4}
        # more probes never scan fewer candidates, never lose recall
        assert rows[1].n_scanned <= rows[2].n_scanned <= rows[4].n_scanned
        assert rows[1].n_hits <= rows[2].n_hits <= rows[4].n_hits
        for r in rows.values():
            assert 0 <= r.scan_fraction <= 1.0
            assert r.n_scanned > 0
        # probing half the cells (4 of 8) must cost well below brute force
        assert rows[4].scan_fraction < 0.95


class TestDowHourHeatmap:
    def test_cells_partition_the_corpus(self, spark):
        from tensorflow_recorder_spark.queries import QUERIES
        from tensorflow_recorder_spark.queries._shared import _events

        rows = QUERIES["e4_dow_hour_heatmap"](spark, SF).collect()
        total = _events(spark, SF).count()
        assert sum(r.n_events for r in rows) == total
        assert abs(sum(r.traffic_share for r in rows) - 1.0) < 1e-3
        for r in rows:
            assert 1 <= r.iso_dow <= 7
            assert 0 <= r.hour_of_day <= 23


class TestVideoKeyframeBudget:
    def test_stride_policy_matches_frame_sample_explode(self, spark):
        """Cross-operator consistency: the stride-10 budget must equal
        the actual row count of the e5_frame_sample explode (same stub
        metadata, same stride)."""
        from tensorflow_recorder_spark.queries import QUERIES

        budget = {
            r.policy: r
            for r in QUERIES["e5_video_keyframe_budget"](spark, SF).collect()
        }
        exploded = QUERIES["e5_frame_sample"](spark, SF).count()
        assert budget["2_stride_10"].n_sampled == exploded
        n_docs = QUERIES["e5_frame_sample"](spark, SF).select(
            "doc_id"
        ).distinct().count()
        for r in budget.values():
            assert r.n_videos == n_docs
            assert 0 < r.n_sampled <= r.n_source_frames
            assert 0 < r.sample_share <= 1.0
        # 1 fps on 24/30 fps video keeps fewer frames than every-10th
        assert (
            budget["1_uniform_1fps"].n_sampled
            < budget["2_stride_10"].n_sampled
        )


class TestQueryBudget:
    def test_fixed_size_and_deterministic(self, spark):
        """The k-NN audit family's query side must be a fixed ABSOLUTE
        budget (the r7 scaling harness measured the old %-of-corpus
        sampling at 101x wall for 10x input)."""
        from tensorflow_recorder_spark.queries._shared import _t
        from tensorflow_recorder_spark.queries.e2 import _query_budget

        emb = _t(spark, SF, "embeddings")
        n = emb.count()
        b1 = [r.vec_id for r in _query_budget(emb, "knn").select("vec_id").collect()]
        b2 = [r.vec_id for r in _query_budget(emb, "knn").select("vec_id").collect()]
        assert len(b1) == min(100, n)
        assert b1 == b2  # deterministic across evaluations
        other = [
            r.vec_id
            for r in _query_budget(emb, "purity").select("vec_id").collect()
        ]
        assert set(other) != set(b1)  # salts pick different samples


class TestStreamSessionDepth:
    def test_stream_twin_matches_batch(self, spark):
        from tensorflow_recorder_spark.queries import QUERIES

        [b] = QUERIES["e4_session_depth"](spark, SF).collect()
        [s] = QUERIES["s34_stream_session_depth"](spark, SF).collect()
        assert tuple(s) == tuple(b)

    def test_streaming_sessionize_durations_match_batch(self, spark):
        from tensorflow_recorder_spark.operators.events import sessionize
        from tensorflow_recorder_spark.queries._shared import _events
        from tensorflow_recorder_spark.queries.streams import (
            _drain_to_memory,
            _event_stream,
        )
        from tensorflow_recorder_spark.streaming.windows import (
            streaming_sessionize,
        )

        batch = {
            (r.user_id, r.session_start): r.duration_s
            for r in sessionize(_events(spark, SF), gap_minutes=30).collect()
        }
        sess = streaming_sessionize(
            _event_stream(spark, SF).withColumn(
                "value", F.col("value").cast("decimal(18,6)")
            ),
            gap_minutes=30,
        ).select("user_id", "session_start", "duration_s")
        table = _drain_to_memory(sess, "r7_sess_dur_sink", "complete")
        stream = {
            (r.user_id, r.session_start): r.duration_s
            for r in table.collect()
        }
        assert stream == batch
