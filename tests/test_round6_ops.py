"""Round-6 session-2 operators: kNN label vote / purity, directed
containment, n-gram novelty — edge-case semantics the sf fixtures
don't pin."""

from pyspark.sql import functions as F


def _emb(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )


class TestKnnLabelVote:
    def test_majority_and_tiebreak(self, spark):
        from tensorflow_recorder_spark.operators.similarity import (
            knn_label_vote,
        )

        # query 0 at origin-ish; neighbors: two label-1, two label-2 ->
        # 2-2 tie must break to the SMALLER label
        rows = [
            (0, [1.0, 0.0], 9),
            (1, [0.9, 0.1], 1),
            (2, [0.9, -0.1], 1),
            (3, [0.8, 0.1], 2),
            (4, [0.8, -0.1], 2),
        ]
        df = _emb(spark, rows)
        out = knn_label_vote(
            df, df.where("vec_id = 0"), k=4
        ).collect()
        assert len(out) == 1
        assert out[0].predicted_label == 1 and out[0].votes == 2

    def test_k_larger_than_corpus(self, spark):
        from tensorflow_recorder_spark.operators.similarity import (
            knn_label_vote,
        )

        rows = [(0, [1.0, 0.0], 5), (1, [0.9, 0.1], 7)]
        df = _emb(spark, rows)
        [r] = knn_label_vote(df, df.where("vec_id = 0"), k=10).collect()
        assert r.predicted_label == 7 and r.votes == 1


class TestNeighborLabelPurity:
    def test_integer_exact_purity(self, spark):
        from tensorflow_recorder_spark.operators.similarity import (
            neighbor_label_purity,
        )

        rows = [
            (0, [1.0, 0.0], 1),
            (1, [0.95, 0.1], 1),
            (2, [0.9, -0.1], 1),
            (3, [0.85, 0.05], 2),
        ]
        df = _emb(spark, rows)
        [r] = neighbor_label_purity(
            df, df.where("vec_id = 0"), k=3
        ).collect()
        # neighbors of 0: {1, 2, 3} -> two of three share label 1
        assert r.label == 1
        assert r.n_queries == 1 and r.n_neighbors == 3
        assert r.purity == round(2 / 3, 6)


class TestContainmentPairs:
    def test_excerpt_detected_where_jaccard_low(self, spark):
        from tensorflow_recorder_spark.operators.dedup import (
            containment_pairs,
            ngram_jaccard_pairs,
        )

        short = "the quick brown fox jumps"
        long = short + " over the lazy dog " + "x" * 200
        df = spark.createDataFrame(
            [(1, short), (2, long)], "doc_id long, text string"
        )
        out = containment_pairs(
            df, "text", "doc_id", threshold=0.9, max_shingle_df=10
        ).collect()
        directed = {(r.id_a, r.id_b): r.containment for r in out}
        assert directed.get((1, 2)) == 1.0  # short fully inside long
        assert (2, 1) not in directed  # long is NOT contained in short

    def test_boilerplate_cut(self, spark):
        from tensorflow_recorder_spark.operators.dedup import (
            containment_pairs,
        )

        # every doc shares one boilerplate sentence; with df-cut at 2
        # the shared grams vanish and no pair survives
        docs = [
            (i, f"unique text number {i} aaaa" + " COMMON FOOTER HERE")
            for i in range(5)
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        out = containment_pairs(
            df, "text", "doc_id", threshold=0.5, max_shingle_df=2
        ).collect()
        assert out == []


class TestNgramNovelty:
    def test_first_doc_fully_novel_exact_dup_zero(self, spark):
        from tensorflow_recorder_spark.operators.text import ngram_novelty

        t = "completely original content here"
        df = spark.createDataFrame(
            [(1, t), (2, t), (3, "different material entirely")],
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in ngram_novelty(df, "text", "doc_id").collect()}
        assert out[1].novelty == 1.0  # min-id owner of all its grams
        assert out[2].novelty == 0.0  # exact dup of an earlier doc
        assert out[3].novelty == 1.0
        assert out[1].n_grams == out[2].n_grams

    def test_counts_are_distinct_grams(self, spark):
        from tensorflow_recorder_spark.operators.text import ngram_novelty

        # repeated substring: distinct gram set, not positional count
        df = spark.createDataFrame(
            [(1, "ababababab")], "doc_id long, text string"
        )
        [r] = ngram_novelty(df, "text", "doc_id").collect()
        assert r.n_grams == 2  # 'ababa' and 'babab'
        assert r.novelty == 1.0


class TestPhashDedupProbe:
    def test_jitter_invariance_and_groups(self, spark):
        from tensorflow_recorder_spark.operators.multimodal import (
            phash_dedup_probe,
        )

        # ids 0..15 share base 0 (different jitter id % 3) -> ONE hash
        # group of 16; ids 16..31 share base 1 -> another
        df = spark.createDataFrame(
            [(i,) for i in range(32)], "doc_id long"
        )
        out = phash_dedup_probe(df, "doc_id").collect()
        by_id = {r.doc_id: r for r in out}
        assert len({by_id[i].phash for i in range(16)}) == 1
        assert by_id[0].phash != by_id[16].phash
        assert all(by_id[i].group_size == 16 for i in range(32))

    def test_hash_matches_arithmetic_prediction(self, spark):
        from tensorflow_recorder_spark.operators.multimodal import (
            phash_dedup_probe,
        )

        ids = [0, 17, 160, 4097]
        df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
        got = {
            r.doc_id: r.phash
            for r in phash_dedup_probe(df, "doc_id").collect()
        }
        for i in ids:
            base = i // 16
            want = 0
            for y in range(8):
                for x in range(7):
                    if ((base + y) >> x) & 1:
                        want |= 1 << (y * 7 + x)
            assert got[i] == want, i


class TestQualityTokenQuota:
    def test_best_first_prefix(self, spark):
        from tensorflow_recorder_spark.operators.sampling import (
            quality_token_quota,
        )

        # budget 10: doc 3 (q=.9, 6 tok) then doc 1 (q=.8, 4 tok) fit;
        # doc 2 (q=.7) would overflow despite being cheap
        df = spark.createDataFrame(
            [(1, "s", 4, 0.8), (2, "s", 3, 0.7), (3, "s", 6, 0.9)],
            "doc_id long, source string, toks long, q double",
        )
        kept = {
            r.doc_id
            for r in quality_token_quota(
                df, "source", "doc_id", F.col("toks"), "q", quota_tokens=10
            ).collect()
        }
        assert kept == {3, 1}

    def test_tie_breaks_on_id(self, spark):
        from tensorflow_recorder_spark.operators.sampling import (
            quality_token_quota,
        )

        df = spark.createDataFrame(
            [(2, "s", 5, 0.5), (1, "s", 5, 0.5), (3, "s", 5, 0.5)],
            "doc_id long, source string, toks long, q double",
        )
        kept = {
            r.doc_id
            for r in quality_token_quota(
                df, "source", "doc_id", F.col("toks"), "q", quota_tokens=10
            ).collect()
        }
        assert kept == {1, 2}


class TestRound6Properties:
    def test_novelty_conservation(self, spark):
        """Invariant: sum over docs of n_novel == number of globally
        distinct grams (every gram has exactly one min-id owner), and
        novelty is in [0, 1] — for ANY corpus."""
        import random

        from tensorflow_recorder_spark.operators.text import ngram_novelty

        rng = random.Random(7)
        words = ["alpha", "beta", "gamma", "delta", "epsilon"]
        for trial in range(3):
            docs = [
                (i, " ".join(rng.choice(words) for _ in range(rng.randint(3, 12))))
                for i in range(12)
            ]
            df = spark.createDataFrame(docs, "doc_id long, text string")
            rows = ngram_novelty(df, "text", "doc_id").collect()
            k = 5
            all_grams = set()
            for _, t in docs:
                t = t.lower()
                m = max(len(t) - k + 1, 1)
                all_grams |= {t[i : i + k] for i in range(m)}
            assert sum(r.n_novel for r in rows) == len(all_grams), trial
            assert all(0.0 <= r.novelty <= 1.0 for r in rows)

    def test_containment_bounds_and_self_dup(self, spark):
        """containment is in (0, 1]; an exact duplicate pair has
        containment 1.0 in BOTH directions."""
        from tensorflow_recorder_spark.operators.dedup import containment_pairs

        t = "a very specific duplicated passage of text"
        df = spark.createDataFrame(
            [(1, t), (2, t), (3, "something else entirely unique")],
            "doc_id long, text string",
        )
        rows = containment_pairs(
            df, "text", "doc_id", threshold=0.0, max_shingle_df=10
        ).collect()
        vals = {(r.id_a, r.id_b): r.containment for r in rows}
        assert vals[(1, 2)] == 1.0 and vals[(2, 1)] == 1.0
        assert all(0.0 < c <= 1.0 for c in vals.values())
