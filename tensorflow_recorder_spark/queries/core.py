"""Convert-pipeline surface queries (p*/a*/t*: split routing, vocabulary, scaling, serialization) + their oracles.

Split from the original single-module registry (r6 verdict item 7);
bodies are unchanged — see git history of queries.py.
"""
from __future__ import annotations
from collections.abc import Callable
from pyspark.sql import DataFrame, SparkSession, Window, functions as F
from ..operators import dedup, events, similarity, text
from ..operators.scale import fit_and_apply_scale
from ..operators.split import normalize_split, split_histogram_df
from ..operators.vocabulary import (
    apply_vocabulary,
    fit_vocabulary,
    fit_vocabulary_large,
)
from ._shared import (
    _events,
    _oracle_dup_clusters,
    _t,
)


ORDERS_SPLIT = (
    "CASE WHEN o_orderkey % 10 < 7 THEN 'TRAIN' "
    "WHEN o_orderkey % 10 < 9 THEN 'VALIDATION' "
    "WHEN o_orderkey % 100 = 99 THEN 'FOO' ELSE 'TEST' END"
)

CUSTOMER_SPLIT = (
    "CASE WHEN c_custkey % 10 < 7 THEN 'TRAIN' "
    "WHEN c_custkey % 10 < 9 THEN 'VALIDATION' ELSE 'TEST' END"
)

SPLIT_IN = "('TRAIN', 'VALIDATION', 'TEST', 'DISCARD')"

def q_p1_split_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1: derive split, route unknown values to DISCARD."""
    df = _t(spark, sf_dir, "orders").withColumn("split", F.expr(ORDERS_SPLIT))
    return normalize_split(df).select("o_orderkey", "split")

def q_p0_derive_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P0 (upstream of the reference): deterministic hash-based split
    derivation from a stable key — reproducible, append-stable, salted
    re-deals."""
    from ..operators.split import derive_split

    return derive_split(_t(spark, sf_dir, "documents"), "doc_id").select(
        "doc_id", "split"
    )

ORACLE_P0_DERIVE_SPLIT = """
SELECT doc_id,
       CASE WHEN b < 80 THEN 'TRAIN'
            WHEN b < 90 THEN 'VALIDATION'
            ELSE 'TEST' END AS split
FROM (
  SELECT doc_id,
         ('0x' || substr(md5(concat(':', doc_id::VARCHAR)), 1, 8))::BIGINT % 100 AS b
  FROM documents
)
"""

def q_a1_split_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: split histogram after normalization."""
    df = _t(spark, sf_dir, "orders").withColumn("split", F.expr(ORDERS_SPLIT))
    return split_histogram_df(df)

def q_a2_vocabulary_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 fit: frequency-descending vocabulary over the TRAIN split."""
    df = _t(spark, sf_dir, "orders").withColumn("split", F.expr(ORDERS_SPLIT))
    train = df.where(F.col("split") == "TRAIN")
    return fit_vocabulary(train, "o_orderpriority")

def q_a3_vocabulary_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: fit on TRAIN, integerize ALL rows (OOV -> -1)."""
    df = _t(spark, sf_dir, "orders").withColumn("split", F.expr(ORDERS_SPLIT))
    vocab = fit_vocabulary(df.where(F.col("split") == "TRAIN"), "o_orderpriority")
    applied = apply_vocabulary(
        df.withColumnRenamed("o_orderpriority", "label_idx"), "label_idx", vocab
    )
    return applied.select("o_orderkey", F.col("label_idx").cast("long").alias("label_idx"))

def q_a5_vocabulary_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 with top_k truncation (TFT's top_k knob): only the 3 most
    frequent TRAIN values stay in-vocabulary, the rest integerize to
    OOV -1 on apply. Routed through the two-phase token-scale fit
    (range-partition + zipWithIndex) so the driver row also certifies
    fit_vocabulary_large's output equivalence."""
    df = _t(spark, sf_dir, "orders").withColumn("split", F.expr(ORDERS_SPLIT))
    vocab = fit_vocabulary_large(
        df.where(F.col("split") == "TRAIN"), "o_orderpriority", top_k=3
    )
    applied = apply_vocabulary(
        df.withColumnRenamed("o_orderpriority", "label_idx"), "label_idx", vocab
    )
    return applied.select(
        "o_orderkey", F.col("label_idx").cast("long").alias("label_idx")
    )

ORACLE_A5 = f"""
WITH vocab AS (
  SELECT o_orderpriority AS value,
         CAST(row_number() OVER (ORDER BY count(*) DESC, o_orderpriority) - 1 AS BIGINT) AS index
  FROM orders WHERE ({ORDERS_SPLIT}) = 'TRAIN' GROUP BY o_orderpriority
)
SELECT o.o_orderkey, CAST(COALESCE(v.index, -1) AS BIGINT) AS label_idx
FROM orders o LEFT JOIN (SELECT * FROM vocab WHERE index < 3) v
  ON o.o_orderpriority = v.value
"""

def q_a6_vocabulary_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-scale vocabulary: whitespace tokens of the TRAIN-subset
    documents ranked by the two-phase fit (A2 at token cardinality —
    the plan has NO single-partition sort; see fit_vocabulary_large)."""
    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") % 10 < 7)
    toks = docs.select(
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("tok")
    ).where(F.col("tok") != "")
    vocab = fit_vocabulary_large(toks, "tok", top_k=200)
    return vocab.select(F.col("value"), F.col("index").cast("long").alias("index"))

ORACLE_A6_VOCAB_TOKENS = """
WITH toks AS (
  SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                t -> t <> '')) AS tok
  FROM documents WHERE doc_id % 10 < 7
),
counts AS (SELECT tok AS value, count(*) AS c FROM toks GROUP BY tok),
ranked AS (
  SELECT value,
         CAST(row_number() OVER (ORDER BY c DESC, value) - 1 AS BIGINT) AS index
  FROM counts
)
SELECT value, index FROM ranked WHERE index < 200
"""

def q_a4_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: z-score c_acctbal with TRAIN-fitted mean/stddev_pop."""
    df = _t(spark, sf_dir, "customer").withColumn("split", F.expr(CUSTOMER_SPLIT))
    scaled, _ = fit_and_apply_scale(df, ["c_acctbal"])
    return scaled.select("c_custkey", F.round("c_acctbal", 4).alias("acctbal_z"))

def q_t1_csv_serialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1: row -> CSV-string serialization (the reference's ToCSVRows)."""
    return _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("long").alias("n_nationkey"),
        F.concat_ws(",", "n_nationkey", "n_name", "n_regionkey").alias("csv_line"),
    )

def q_t2_typed_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2: schema-applied typed projection (CsvCoder-decode analog)."""
    return _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").cast("long").alias("l_orderkey"),
        F.col("l_linenumber").cast("long").alias("l_linenumber"),
        F.col("l_quantity").cast("double").alias("l_quantity"),
        F.col("l_returnflag").cast("string").alias("l_returnflag"),
    )

ORACLE_P1 = f"""
SELECT o_orderkey,
       CASE WHEN ({ORDERS_SPLIT}) IN {SPLIT_IN} THEN ({ORDERS_SPLIT})
            ELSE 'DISCARD' END AS split
FROM orders
"""

ORACLE_A1 = f"""
SELECT CASE WHEN ({ORDERS_SPLIT}) IN {SPLIT_IN} THEN ({ORDERS_SPLIT})
            ELSE 'DISCARD' END AS split,
       count(*) AS n_rows
FROM orders GROUP BY 1
"""

ORACLE_A2 = f"""
SELECT o_orderpriority AS value,
       CAST(row_number() OVER (ORDER BY count(*) DESC, o_orderpriority) - 1 AS BIGINT) AS index
FROM orders WHERE ({ORDERS_SPLIT}) = 'TRAIN'
GROUP BY o_orderpriority
"""

ORACLE_A3 = f"""
WITH vocab AS (
  SELECT o_orderpriority AS value,
         CAST(row_number() OVER (ORDER BY count(*) DESC, o_orderpriority) - 1 AS BIGINT) AS index
  FROM orders WHERE ({ORDERS_SPLIT}) = 'TRAIN' GROUP BY o_orderpriority
)
SELECT o.o_orderkey, CAST(COALESCE(v.index, -1) AS BIGINT) AS label_idx
FROM orders o LEFT JOIN vocab v ON o.o_orderpriority = v.value
"""

ORACLE_A4 = f"""
WITH stats AS (
  SELECT avg(c_acctbal) AS m, stddev_pop(c_acctbal) AS s
  FROM customer WHERE ({CUSTOMER_SPLIT}) = 'TRAIN'
)
SELECT c.c_custkey, round((c.c_acctbal - stats.m) / stats.s, 4) AS acctbal_z
FROM customer c, stats
"""

ORACLE_T1 = """
SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey,
       concat_ws(',', n_nationkey, n_name, n_regionkey) AS csv_line
FROM nation
"""

ORACLE_T2 = """
SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
       CAST(l_linenumber AS BIGINT) AS l_linenumber,
       CAST(l_quantity AS DOUBLE) AS l_quantity,
       CAST(l_returnflag AS VARCHAR) AS l_returnflag
FROM lineitem
"""

def q_p2_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-stratum sampling of documents by language
    (class rebalancing): membership is a pure function of doc_id, so
    the sample is identical across retries/engines."""
    from ..operators.sampling import stratified_sample

    docs = _t(spark, sf_dir, "documents")
    out = stratified_sample(
        docs, "lang", "doc_id", {"en": 0.5, "de": 0.25}, default_fraction=0.1
    )
    return out.select("doc_id", "lang")

ORACLE_P2_STRATIFIED_SAMPLE = """
WITH b AS (
  SELECT doc_id, lang,
         ('0x' || substr(md5('sample:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
           % 1000000 AS bucket
  FROM documents
)
SELECT doc_id, lang FROM b
WHERE bucket < CASE lang WHEN 'en' THEN 500000 WHEN 'de' THEN 250000
               ELSE 100000 END
"""

def q_p3_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-leakage validation (V-family extension): documents
    appearing VERBATIM in both the derived TRAIN and TEST splits —
    digest equi-join, 32-byte shuffle keys, never the text."""
    from ..operators.dedup import cross_split_exact_overlap

    docs = _t(spark, sf_dir, "documents").withColumn(
        "split",
        F.expr(
            "CASE WHEN doc_id % 10 < 7 THEN 'TRAIN' "
            "WHEN doc_id % 10 < 9 THEN 'VALIDATION' ELSE 'TEST' END"
        ),
    )
    pairs = cross_split_exact_overlap(
        docs.where(F.col("split") == "TRAIN"),
        docs.where(F.col("split") == "TEST"),
        "text",
        "doc_id",
    )
    return pairs.select(
        F.col("id_a").alias("train_doc_id"), F.col("id_b").alias("test_doc_id")
    )

ORACLE_P3_SPLIT_LEAKAGE = """
WITH s AS (
  SELECT doc_id, text,
         CASE WHEN doc_id % 10 < 7 THEN 'TRAIN'
              WHEN doc_id % 10 < 9 THEN 'VALIDATION' ELSE 'TEST' END AS split
  FROM documents
)
SELECT a.doc_id AS train_doc_id, b.doc_id AS test_doc_id
FROM s a JOIN s b ON a.text = b.text
WHERE a.split = 'TRAIN' AND b.split = 'TEST'
"""

def q_p4_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4: leakage-safe split assignment — TRAIN/VALIDATION/TEST hashed
    on the near-dup CLUSTER id (LSH-verified pairs at the 0.5 dedup
    policy point -> connected components; unclustered docs hash on
    their own id), so a duplicate family can never straddle splits.
    The prevention counterpart of the p3_split_leakage detector."""
    from ..operators.split import leakage_safe_split

    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.lsh_verified_pairs(
        docs, "text", "doc_id", min_est_jaccard=0.5, threshold=0.5
    )
    clusters = dedup.duplicate_clusters(pairs)
    out = leakage_safe_split(docs, clusters, "doc_id")
    return out.select("doc_id", "group_key", "split")

def _oracle_leakage_safe_split() -> str:
    return f"""
WITH clusters AS ({_oracle_dup_clusters()}),
g AS (
  SELECT d.doc_id,
         CAST(coalesce(c.cluster_id, d.doc_id) AS BIGINT) AS group_key
  FROM documents d LEFT JOIN clusters c ON d.doc_id = c.doc_id
)
SELECT doc_id, group_key,
       CASE WHEN b < 80 THEN 'TRAIN'
            WHEN b < 90 THEN 'VALIDATION'
            ELSE 'TEST' END AS split
FROM (
  SELECT doc_id, group_key,
         ('0x' || substr(md5(concat(':', group_key::VARCHAR)), 1, 8))::BIGINT % 100 AS b
  FROM g
)
"""

def q_p5_split_balance_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P/V split-balance audit: PSI of the document-length distribution
    between a derived md5 TRAIN split and its TEST complement — the
    check that a hash split didn't accidentally skew a feature (a PSI
    above ~0.1 on any input feature means the split leaks structure).
    Fixed-width bins (n_chars // 100, engine-exact integers) so every
    share is a ratio of integer counts; doubles only in the final
    ln-based PSI terms. Plan: one scan -> (split, bin) partial agg ->
    bin-bounded join of the two share vectors."""
    docs = _t(spark, sf_dir, "documents")
    split = F.when(
        F.expr(
            "cast(conv(substring(md5(concat('p5:', cast(doc_id as string))), 1, 8),"
            " 16, 10) as bigint) % 10 < 8"
        ),
        "TRAIN",
    ).otherwise("TEST")
    binned = docs.select(
        split.alias("__s"), (F.col("n_chars") / 100).cast("long").alias("bin")
    )
    counts = binned.groupBy("__s", "bin").agg(
        F.count(F.lit(1)).cast("long").alias("__n")
    )
    tot = counts.groupBy("__s").agg(F.sum("__n").cast("long").alias("__t"))
    shares = counts.join(tot, "__s").select(
        "__s", "bin", (F.col("__n") / F.col("__t")).alias("__p")
    )
    tr = shares.where(F.col("__s") == "TRAIN").select(
        "bin", F.col("__p").alias("train_share")
    )
    te = shares.where(F.col("__s") == "TEST").select(
        "bin", F.col("__p").alias("test_share")
    )
    # full outer + epsilon floor: a bin present in one split only still
    # contributes a finite PSI term (the standard 1e-6 floor)
    eps = F.lit(1e-6)
    j = tr.join(te, "bin", "full").select(
        "bin",
        F.coalesce("train_share", F.lit(0.0)).alias("train_share"),
        F.coalesce("test_share", F.lit(0.0)).alias("test_share"),
    )
    a = F.greatest(F.col("train_share"), eps)
    b = F.greatest(F.col("test_share"), eps)
    return j.select(
        "bin",
        F.round("train_share", 6).alias("train_share"),
        F.round("test_share", 6).alias("test_share"),
        F.round((a - b) * F.log(a / b), 6).alias("psi_term"),
    )

ORACLE_P5_SPLIT_BALANCE_PSI = """
WITH s AS (
  SELECT CASE WHEN ('0x' || substr(md5('p5:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                   % 10 < 8 THEN 'TRAIN' ELSE 'TEST' END AS sp,
         CAST(n_chars // 100 AS BIGINT) AS bin
  FROM documents
),
c AS (SELECT sp, bin, count(*)::BIGINT AS n FROM s GROUP BY sp, bin),
t AS (SELECT sp, sum(n)::BIGINT AS tt FROM c GROUP BY sp),
sh AS (SELECT c.sp, c.bin, c.n::DOUBLE / t.tt AS p FROM c JOIN t USING (sp)),
j AS (
  SELECT coalesce(a.bin, b.bin) AS bin,
         coalesce(a.p, 0.0) AS train_share,
         coalesce(b.p, 0.0) AS test_share
  FROM (SELECT bin, p FROM sh WHERE sp = 'TRAIN') a
  FULL JOIN (SELECT bin, p FROM sh WHERE sp = 'TEST') b USING (bin)
)
SELECT bin, round(train_share, 6) AS train_share,
       round(test_share, 6) AS test_share,
       round((greatest(train_share, 1e-6) - greatest(test_share, 1e-6))
             * ln(greatest(train_share, 1e-6) / greatest(test_share, 1e-6)), 6)
         AS psi_term
FROM j
"""

def q_p6_temporal_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6 temporal split: route events into TRAIN/VALIDATION/TEST by
    TIME (first 70% of the observed range trains, next 20% validates,
    last 10% tests) — the split discipline for any forecasting or
    next-event model, where a random split leaks the future. Cutoffs
    are integer epoch-microsecond arithmetic (diff-first so the *7
    never overflows a long; `div` truncation == DuckDB `//` on
    positives). The audit row per split reports volume, user counts,
    the day range, and the COLD-START exposure: how many of the
    split's users were already seen in TRAIN (an eval row for an
    unseen user tests cold-start, not the model). Plan: one min/max
    agg broadcast as two scalars; routing is a stateless projection;
    user rollups reuse one (split, user) distinct + a user-keyed join
    against TRAIN's user set — no window, no collect."""
    ev = _events(spark, sf_dir).select(
        "user_id", "ts", F.unix_micros("ts").alias("__us")
    )
    bounds = ev.agg(
        F.min("__us").alias("__lo"), F.max("__us").alias("__hi")
    )
    routed = ev.crossJoin(F.broadcast(bounds)).withColumn(
        "split",
        F.expr(
            "CASE WHEN __us < __lo + ((__hi - __lo) * 7) div 10 THEN 'TRAIN' "
            "WHEN __us < __lo + ((__hi - __lo) * 9) div 10 THEN 'VALIDATION' "
            "ELSE 'TEST' END"
        ),
    )
    volume = routed.groupBy("split").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.date_format(F.min("ts"), "yyyy-MM-dd").alias("min_day"),
        F.date_format(F.max("ts"), "yyyy-MM-dd").alias("max_day"),
    )
    users = routed.select("split", "user_id").distinct()
    train_users = (
        users.where(F.col("split") == "TRAIN")
        .select(F.col("user_id").alias("__tu"))
    )
    seen = (
        users.join(train_users, users.user_id == train_users.__tu, "left")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.sum(F.when(F.col("__tu").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_seen_in_train"),
        )
    )
    return volume.join(seen, "split").select(
        "split",
        "n_events",
        "n_users",
        "n_seen_in_train",
        F.round(F.col("n_seen_in_train") / F.col("n_users"), 6).alias(
            "seen_share"
        ),
        "min_day",
        "max_day",
    )

ORACLE_P6_TEMPORAL_SPLIT = """
WITH b AS (
  SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi FROM events
),
r AS (
  SELECT e.user_id, e.ts,
         CASE WHEN epoch_us(e.ts) < b.lo + ((b.hi - b.lo) * 7) // 10
                THEN 'TRAIN'
              WHEN epoch_us(e.ts) < b.lo + ((b.hi - b.lo) * 9) // 10
                THEN 'VALIDATION'
              ELSE 'TEST' END AS split
  FROM events e CROSS JOIN b
),
v AS (
  SELECT split, count(*)::BIGINT AS n_events,
         strftime(min(ts), '%Y-%m-%d') AS min_day,
         strftime(max(ts), '%Y-%m-%d') AS max_day
  FROM r GROUP BY split
),
u AS (SELECT DISTINCT split, user_id FROM r),
tu AS (SELECT user_id FROM u WHERE split = 'TRAIN'),
s AS (
  SELECT u.split, count(*)::BIGINT AS n_users,
         sum(CASE WHEN tu.user_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
           AS n_seen_in_train
  FROM u LEFT JOIN tu ON u.user_id = tu.user_id
  GROUP BY u.split
)
SELECT v.split, v.n_events, s.n_users, s.n_seen_in_train,
       round(CAST(s.n_seen_in_train AS DOUBLE) / s.n_users, 6)
         AS seen_share,
       v.min_day, v.max_day
FROM v JOIN s USING (split)
"""
