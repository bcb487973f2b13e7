"""Deduplication operators (E1, SURVEY.md §2.9) — exact, MinHash+LSH,
SimHash, n-gram Jaccard.

Not in the reference (its only row-elimination is split routing,
beam_pipeline.py:73-88); these are the training-data-pipeline operators
the north star requires, designed Spark-first for 100 TB:

  * Exact dedup: hash-partition on a digest of the text, keep the first
    id per group — one shuffle keyed by digest (never by the full text:
    shuffle keys stay 32 bytes), no driver state.
  * MinHash: per-row signature computation is a narrow projection (no
    shuffle at all); hashes are md5-prefix based so the whole operator
    is expressible in ANSI SQL for the correctness oracle.
  * LSH banding: signature -> (band, band_key) pairs; candidate pairs
    come from a self-equi-join on the band key. At scale this is THE
    join-reduction trick: instead of O(n^2) pairs, only rows sharing a
    band bucket meet, and the join is an ordinary shuffled equi-join
    that AQE can skew-split (hot buckets = near-identical boilerplate
    docs are real at 100 TB).
  * n-gram Jaccard: exact verification within a blocking key via
    shingle-set intersection — the "verify" stage after LSH
    candidates, or standalone within small blocks.
  * SimHash: bit-majority over token hashes, one narrow projection +
    one aggregation keyed by doc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# ---------------------------------------------------------------- exact


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep the lowest-id row per distinct ``text_col`` value (E1 exact).

    The shuffle key is ``sha2(text)`` (fixed 64 hex chars), not the text
    itself — at 100 TB the shuffle moves digests, not documents. The
    window sort within each digest group is bounded by the duplicate
    count.
    """
    w = Window.partitionBy(F.sha2(F.col(text_col), 256)).orderBy(F.col(id_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


# ------------------------------------------------------------- shingles


def shingle_expr(text_col: str, k: int = 5) -> str:
    """SQL expression producing the distinct set of character ``k``-grams
    of a (lowercased) text column. Pure Spark SQL — stays in codegen."""
    return (
        f"array_distinct(transform("
        f"sequence(1, greatest(length({text_col}) - {k - 1}, 1)), "
        f"i -> substring(lower({text_col}), i, {k})))"
    )


def _minhash_expr(shingles: str, seed: int) -> str:
    """min over shingles of a 32-bit md5-prefix hash salted by ``seed``.

    md5-based so the DuckDB oracle can compute the identical value; the
    per-row cost is seeds x shingles hashes, all inside codegen.
    """
    return (
        f"array_min(transform({shingles}, "
        f"s -> cast(conv(substring(md5(concat('{seed}:', s)), 1, 8), 16, 10) as bigint)))"
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 8,
    shingle_len: int = 5,
) -> DataFrame:
    """Per-document MinHash signature (E1 fuzzy, fit stage).

    Output: (id_col, mh_0..mh_{n-1}).

    Shape: explode distinct shingles to rows, then groupBy(id) with one
    ``min(hash_k)`` per seed. Two reasons this beats the all-array
    formulation (``array_min(transform(...))`` per seed):
      * higher-order functions don't participate in Spark's common-
        subexpression elimination, so the per-seed array version
        re-evaluates the shingling ``num_hashes`` times (measured 3x
        slower at sf0.1);
      * per-shingle rows keep task memory flat for huge documents, and
        map-side combine collapses each partition to |docs| x num_hashes
        before the shuffle — shuffled bytes are signature-sized, not
        shingle-sized.
    """
    shingles = df.select(
        F.col(id_col),
        F.explode(F.expr(shingle_expr(text_col, shingle_len))).alias("__s"),
    )
    # One md5 yields four independent 32-bit slices, so num_hashes hash
    # functions cost ceil(num_hashes/4) digests per shingle:
    #   h_k(s) = int(md5(concat(k div 4, ':', s))[8*(k%4) .. +8], 16)
    hash_expr = (
        "cast(conv(substring(md5(concat('{salt}:', __s)), {start}, 8), 16, 10) as bigint)"
    )
    aggs = [
        F.min(
            F.expr(hash_expr.format(salt=k // 4, start=8 * (k % 4) + 1))
        ).alias(f"mh_{k}")
        for k in range(num_hashes)
    ]
    return shingles.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str,
    num_hashes: int = 8,
    bands: int = 4,
    min_est_jaccard: float = 0.25,
) -> DataFrame:
    """LSH banding over MinHash signatures -> candidate pairs with
    estimated Jaccard (fraction of agreeing signature slots).

    Pairs meet only if some band of ``num_hashes/bands`` consecutive
    slots agrees exactly, turning all-pairs comparison into an
    equi-join on (band_idx, band_key). Output: (id_a, id_b, est_jaccard)
    with id_a < id_b.
    """
    rows_per_band = num_hashes // bands
    band_structs = []
    for b in range(bands):
        slots = [f"mh_{b * rows_per_band + r}" for r in range(rows_per_band)]
        key = "md5(concat_ws(',', " + ", ".join(slots) + "))"
        band_structs.append(f"struct({b} as band_idx, {key} as band_key)")
    banded = signatures.select(
        F.col(id_col),
        *[F.col(f"mh_{k}") for k in range(num_hashes)],
        F.explode(F.expr("array(" + ", ".join(band_structs) + ")")).alias("band"),
    ).select(id_col, *[f"mh_{k}" for k in range(num_hashes)], "band.band_idx", "band.band_key")

    left = banded.select(
        F.col(id_col).alias("id_a"),
        *[F.col(f"mh_{k}").alias(f"a_{k}") for k in range(num_hashes)],
        "band_idx",
        "band_key",
    )
    right = banded.select(
        F.col(id_col).alias("id_b"),
        *[F.col(f"mh_{k}").alias(f"b_{k}") for k in range(num_hashes)],
        "band_idx",
        "band_key",
    )
    agree = sum(
        F.when(F.col(f"a_{k}") == F.col(f"b_{k}"), 1).otherwise(0)
        for k in range(num_hashes)
    )
    pairs = (
        left.join(right, ["band_idx", "band_key"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", (agree / F.lit(float(num_hashes))).alias("est_jaccard"))
        .distinct()
    )
    return pairs.where(F.col("est_jaccard") >= min_est_jaccard)


def hashed_shingle_expr(text_col: str, k: int = 5) -> str:
    """Distinct 32-bit-hashed character k-grams (md5-slice ints).

    Jaccard over hashed shingle sets equals Jaccard over the string sets
    up to md5 collisions (~n^2/2^32); comparing/intersecting longs is
    several times cheaper than strings at pair-join time.
    """
    return (
        f"array_distinct(transform("
        f"sequence(1, greatest(length({text_col}) - {k - 1}, 1)), "
        f"i -> cast(conv(substring(md5(substring(lower({text_col}), i, {k})), 1, 8),"
        f" 16, 10) as bigint)))"
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    block_col: str | None = None,
    shingle_len: int = 5,
    threshold: float = 0.25,
) -> DataFrame:
    """n-gram Jaccard similarity pairs over hashed shingle sets (E1
    verify stage).

    With ``block_col`` the self-join is an equi-join within blocks (the
    scalable form: dedup within source/domain partitions); without it,
    this is the small-data verifier applied to LSH candidates.
    Output: (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold.

    The hashed shingle frame is cached: it feeds both sides of the
    self-join and its lineage has no exchange Spark could auto-reuse.
    At cluster scale, persist it as a table instead.
    """
    sh = df.select(
        F.col(id_col),
        *([F.col(block_col)] if block_col else []),
        F.expr(hashed_shingle_expr(text_col, shingle_len)).alias("__sh"),
    ).cache()
    a = sh.select(
        *([F.col(block_col)] if block_col else []),
        F.col(id_col).alias("id_a"),
        F.col("__sh").alias("sh_a"),
    )
    b = sh.select(
        *([F.col(block_col)] if block_col else []),
        F.col(id_col).alias("id_b"),
        F.col("__sh").alias("sh_b"),
    )
    joined = a.join(b, [block_col] if block_col else None) if block_col else a.crossJoin(b)
    # Size-ratio prune BEFORE the expensive intersection: |A∩B| <= min and
    # |A∪B| >= max, so j <= min/max — pairs failing the ratio test cannot
    # reach the threshold. Semantics-preserving, cuts intersect work on
    # skew-sized pairs.
    ratio_ok = (
        F.least(F.size("sh_a"), F.size("sh_b")).cast("double")
        / F.greatest(F.size("sh_a"), F.size("sh_b")).cast("double")
        >= F.lit(threshold)
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        joined.where((F.col("id_a") < F.col("id_b")) & ratio_ok)
        .select(
            "id_a",
            "id_b",
            (inter.cast("double") / union.cast("double")).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def simhash(
    df: DataFrame, text_col: str, id_col: str, bits: int = 16
) -> DataFrame:
    """SimHash fingerprint over whitespace tokens (E1).

    Each distinct token votes +-1 per bit position of its md5-prefix
    hash; the fingerprint sets bits with positive vote sums. Narrow
    projection (token set + bit arithmetic inside one expression), no
    shuffle. Output: (id_col, simhash bigint).
    """
    tokens = f"array_distinct(split(lower({text_col}), '\\\\s+'))"
    th = f"cast(conv(substring(md5(t), 1, 8), 16, 10) as bigint)"
    bit_terms = []
    for j in range(bits):
        # sum over tokens of (bit_j ? 1 : -1), then bit_j(out) = sum > 0
        vote = (
            f"aggregate({tokens}, 0L, (acc, t) -> acc + "
            f"CASE WHEN ({th} div {1 << j}) % 2 = 1 THEN 1 ELSE -1 END)"
        )
        bit_terms.append(f"CASE WHEN ({vote}) > 0 THEN {1 << j}L ELSE 0L END")
    expr = " + ".join(bit_terms)
    return df.select(F.col(id_col), F.expr(expr).alias("simhash"))


def embedding_neardup_pairs(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    block_col: str | None = None,
    threshold: float = 0.95,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (E1), blocked by
    ``block_col`` (e.g. a cluster/label/LSH-bucket column) so the
    self-join is an equi-join, not a cross product.
    Output: (id_a, id_b, cosine)."""
    from .similarity import cosine_expr

    a = df.select(
        *([F.col(block_col)] if block_col else []),
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
    )
    b = df.select(
        *([F.col(block_col)] if block_col else []),
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
    )
    joined = a.join(b, [block_col] if block_col else None) if block_col else a.crossJoin(b)
    return (
        joined.where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.expr(cosine_expr("va", "vb")).alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )
