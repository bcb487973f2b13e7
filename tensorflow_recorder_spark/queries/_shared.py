"""Helpers shared across query families (table loaders, token/shingle SQL fragments, cross-family oracle builders).

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


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")

def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet stores ts as TIMESTAMP(NANOS), which Spark's parquet
    reader rejects; read nanos as long (legacy conf) and truncate to
    microseconds — exactly what DuckDB's nanos->micros read does, so both
    engines see identical timestamps."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = _t(spark, sf_dir, "events")
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    elif ts_type == "timestamp_ntz":
        # parquet TIMESTAMP(MICROS, isAdjustedToUTC=false) infers NTZ;
        # under the UTC session timezone the LTZ cast is value-identical
        # to the oracle's naive timestamps (same branch as _event_stream).
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df

def _oracle_minhash_sig(src: str = "documents") -> str:
    sh = (
        "list_distinct(list_transform(generate_series(1, greatest(length(text)-4, 1)), "
        "i -> substr(lower(text), i, 5)))"
    )
    cols = ", ".join(
        f"list_min(list_transform({sh}, "
        f"s -> ('0x' || substr(md5(concat('{k // 4}:', s)), {8 * (k % 4) + 1}, 8))::BIGINT)) AS mh_{k}"
        for k in range(8)
    )
    return f"SELECT doc_id, {cols} FROM {src}"

def _oracle_lsh_pairs(min_est: float = 0.25, src: str = "documents") -> str:
    # One hash-joinable equi-join per band UNIONed (DuckDB would nested-
    # loop an OR-of-bands join condition), then UNION dedups pairs that
    # match in several bands — same set as the banded self-join.
    sig = _oracle_minhash_sig(src)
    bands = ", ".join(
        f"md5(concat_ws(',', mh_{2 * b}, mh_{2 * b + 1})) AS band_{b}" for b in range(4)
    )
    agree = " + ".join(
        f"CASE WHEN a.mh_{k} = b.mh_{k} THEN 1 ELSE 0 END" for k in range(8)
    )
    per_band = "\nUNION\n".join(
        f"SELECT a.doc_id AS id_a, b.doc_id AS id_b, ({agree}) / 8.0 AS est_jaccard "
        f"FROM banded a JOIN banded b ON a.band_{b} = b.band_{b} AND a.doc_id < b.doc_id"
        for b in range(4)
    )
    return f"""
WITH sigs AS ({sig}), banded AS (SELECT *, {bands} FROM sigs)
SELECT id_a, id_b, est_jaccard FROM ({per_band})
WHERE est_jaccard >= {min_est}
"""

def _oracle_dup_clusters(src: str = "documents") -> str:
    return f"""
WITH RECURSIVE verified AS ({_oracle_lsh_verified(0.5, 0.5, src)}),
edges AS (
  SELECT id_a AS a, id_b AS b FROM verified
  UNION
  SELECT id_b, id_a FROM verified
),
reach(id, r) AS (
  SELECT a, a FROM edges
  UNION
  SELECT e.a, reach.r FROM edges e JOIN reach ON reach.id = e.b
)
SELECT CAST(id AS BIGINT) AS doc_id, CAST(min(r) AS BIGINT) AS cluster_id
FROM reach GROUP BY id
"""

def _oracle_keep_best(src: str = "documents") -> str:
    return f"""
WITH clusters AS ({_oracle_dup_clusters(src)}),
ranked AS (
  SELECT c.doc_id, c.cluster_id,
         row_number() OVER (PARTITION BY c.cluster_id
                            ORDER BY d.n_chars DESC, c.doc_id ASC) AS rk
  FROM clusters c JOIN {src} d USING (doc_id)
)
SELECT doc_id FROM {src}
WHERE doc_id NOT IN (SELECT doc_id FROM ranked WHERE rk > 1)
"""

def _oracle_lsh_verified(min_est: float = 0.25, threshold: float = 0.3, src: str = "documents") -> str:
    return f"""
WITH pairs AS ({_oracle_lsh_pairs(min_est, src)}),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(generate_series(1, greatest(length(text)-4, 1)),
           i -> ('0x' || substr(md5(substr(lower(text), i, 5)), 1, 8))::BIGINT)) AS s
  FROM {src}
)
SELECT p.id_a, p.id_b, p.est_jaccard,
       round(len(list_intersect(a.s, b.s))::DOUBLE
             / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) AS jaccard
FROM pairs p JOIN sh a ON p.id_a = a.doc_id JOIN sh b ON p.id_b = b.doc_id
WHERE len(list_intersect(a.s, b.s))::DOUBLE
      / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= {threshold}
"""

_Q_TOKS = "regexp_split_to_array(lower(text), '\\s+')"

_Q_STOP = "['the', 'and', 'of', 'to', 'is', 'in', 'that', 'it']"

_Q_PUNCT = (
    "length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g'))::DOUBLE"
    " / greatest(length(text), 1)"
)

_Q_STOPR = (
    f"len(list_filter({_Q_TOKS}, t -> list_contains({_Q_STOP}, t)))::DOUBLE"
    f" / greatest(len({_Q_TOKS}), 1)"
)

_Q_MWL = (
    f"list_aggregate(list_transform({_Q_TOKS}, t -> length(t)), 'sum')::DOUBLE"
    f" / greatest(len({_Q_TOKS}), 1)"
)

ORACLE_E3_QUALITY = f"""
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars,
       round({_Q_PUNCT}, 6) AS punct_ratio,
       round({_Q_STOPR}, 6) AS stopword_ratio,
       round({_Q_MWL}, 6) AS mean_word_len,
       round(0.25 * CASE WHEN length(text) BETWEEN 100 AND 100000 THEN 1.0 ELSE 0.0 END
           + 0.25 * (1.0 - ({_Q_PUNCT}))
           + 0.25 * least(({_Q_STOPR}) * 5.0, 1.0)
           + 0.25 * CASE WHEN ({_Q_MWL}) BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.0 END, 6)
           AS quality_score
FROM documents
"""

_Q_SCORE = (
    "0.25 * CASE WHEN length(text) BETWEEN 100 AND 100000 THEN 1.0 ELSE 0.0 END"
    " + 0.25 * (1.0 - ({punct}))"
    " + 0.25 * least(({stopr}) * 5.0, 1.0)"
    " + 0.25 * CASE WHEN ({mwl}) BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.0 END"
)

_PACK_REC = """
WITH RECURSIVE pre AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5('pack:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
              % 8 AS INTEGER) AS shard,
         CAST(len(regexp_split_to_array(lower(text), '\\s+')) AS BIGINT) AS n_tokens
  FROM documents
), base AS (
  SELECT *, row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn FROM pre
), rec AS (
  SELECT doc_id, shard, n_tokens, rn,
         CAST(0 AS BIGINT) AS bin_id, CAST(0 AS BIGINT) AS bin_offset,
         n_tokens AS fill
  FROM base WHERE rn = 1
  UNION ALL
  SELECT b.doc_id, b.shard, b.n_tokens, b.rn,
         CASE WHEN r.fill > 0 AND r.fill + b.n_tokens > 256
              THEN r.bin_id + 1 ELSE r.bin_id END,
         CASE WHEN r.fill > 0 AND r.fill + b.n_tokens > 256
              THEN 0 ELSE r.fill END,
         CASE WHEN r.fill > 0 AND r.fill + b.n_tokens > 256
              THEN b.n_tokens ELSE r.fill + b.n_tokens END
  FROM rec r JOIN base b ON b.shard = r.shard AND b.rn = r.rn + 1
)
"""

ORACLE_E3_BM25 = r"""
WITH toks AS (
  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\s+'), t -> t <> '') AS t
  FROM documents
),
lengths AS (SELECT doc_id, len(t) AS dl FROM toks),
stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM lengths),
tf AS (
  SELECT doc_id, term, count(*) AS tf
  FROM (SELECT doc_id, unnest(t) AS term FROM toks)
  WHERE term IN ('hash', 'join', 'spark')
  GROUP BY doc_id, term
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term)
SELECT doc_id, round(sum(term_score), 6) AS score
FROM (
  SELECT tf.doc_id,
         round(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) *
               (tf * (1.2 + 1.0)) /
               (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)), 9) AS term_score
  FROM tf
  JOIN dfreq USING (term)
  JOIN lengths ON tf.doc_id = lengths.doc_id
  CROSS JOIN stats
)
GROUP BY doc_id
"""

_PROFILE_COLS = ("o_orderstatus", "o_custkey", "o_orderdate", "o_orderpriority")

_DAILY_AUDIT_TYPES = ["click", "error", "purchase", "signup", "view"]

def _daily_audit_suite():
    from ..operators.audit import (
        accepted_values,
        min_value,
        not_null,
        row_count_at_least,
    )

    return [
        not_null("props"),
        min_value("value", 0.0),
        accepted_values("event_type", _DAILY_AUDIT_TYPES),
        row_count_at_least(300),
    ]

ORACLE_E3_BPE_ENCODE = r"""
WITH RECURSIVE
wcnt AS (
  SELECT word, count(*) AS n FROM (
    SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
                              t -> t <> '')) AS word
    FROM documents
  ) GROUP BY word
),
csyms AS (
  SELECT word, n,
         list_append(list_filter(regexp_split_to_array(word, ''), c -> c <> ''),
                     '</w>') AS s
  FROM wcnt
),
cpairs AS (
  SELECT s[i.i] AS l, s[i.i + 1] AS r, sum(n) AS cnt
  FROM csyms, UNNEST(range(1, len(s))) AS i(i)
  GROUP BY 1, 2
),
mtab AS (
  SELECT l, r, rn - 1 AS rk FROM (
    SELECT l, r, row_number() OVER (ORDER BY cnt DESC, l, r) AS rn
    FROM cpairs
  ) WHERE rn <= 8
),
rl AS (SELECT list(struct_pack(l := l, r := r, rk := rk) ORDER BY rk) AS ms
       FROM mtab),
init AS (
  SELECT word,
         chr(31) || array_to_string(s, chr(31) || chr(31)) || chr(31) AS s
  FROM csyms
),
enc AS (
  SELECT word, s, 0 AS it FROM init
  UNION ALL
  SELECT word,
         replace(s, chr(31) || b.l || chr(31) || chr(31) || b.r || chr(31),
                 chr(31) || b.l || b.r || chr(31)) AS s,
         it + 1
  FROM (
    SELECT e.word, e.s, e.it,
           (list_filter(rl.ms,
             m -> contains(e.s,
                  chr(31) || m.l || chr(31) || chr(31) || m.r || chr(31))))[1]
             AS b
    FROM enc e CROSS JOIN rl
  ) WHERE b IS NOT NULL
),
final AS (SELECT word, arg_max(s, it) AS s FROM enc GROUP BY word),
fsyms AS (
  SELECT word, list_filter(string_split(s, chr(31)), x -> x <> '') AS subs
  FROM final
),
docw AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\s+'), t -> t <> '')
           AS w
  FROM documents
),
pos AS (
  SELECT doc_id, t.i AS i, w[t.i] AS word
  FROM docw, UNNEST(range(1, len(w) + 1)) AS t(i)
),
agg AS (
  SELECT p.doc_id,
         count(*) AS n_tokens,
         sum(len(f.subs)) AS n_subwords,
         flatten(list(f.subs ORDER BY p.i))[1:50] AS subsall
  FROM pos p JOIN fsyms f USING (word)
  GROUP BY p.doc_id
)
SELECT d.doc_id,
       CAST(coalesce(a.n_tokens, 0) AS BIGINT) AS n_tokens,
       CAST(coalesce(a.n_subwords, 0) AS BIGINT) AS n_subwords,
       coalesce(array_to_string(a.subsall, ' '), '') AS subwords_preview
FROM documents d LEFT JOIN agg a USING (doc_id)
"""

def _daily_xy(ev: DataFrame) -> DataFrame:
    """Per-day conditional click/purchase counts — the aggregation half
    of the KPI correlation, shared verbatim by the batch query and the
    s26 complete-mode streaming twin (state = two longs per day)."""
    return (
        ev.where(F.col("event_type").isin("click", "purchase"))
        .groupBy(F.to_date("ts").alias("__d"))
        .agg(
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
            .cast("long")
            .alias("x"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("long")
            .alias("y"),
        )
    )

def _pearson_finalize(daily: DataFrame) -> DataFrame:
    """The one-row Pearson finalize over (day, x, y) rows — integer
    sufficient statistics, one fixed double tree; a single arithmetic
    definition so batch and stream cannot drift."""
    s = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    num = (
        F.col("n_days") * F.col("sxy") - F.col("sx") * F.col("sy")
    ).cast("double")
    den = F.sqrt(
        (F.col("n_days") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
            "double"
        )
        * (F.col("n_days") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
            "double"
        )
    )
    return s.select(
        "n_days",
        "sx",
        "sy",
        F.round(F.when(den != 0, num / den), 6).alias("pearson_r"),
    )

def _daily_err(ev: DataFrame) -> DataFrame:
    """Per-day (n, n_err) counts — the aggregation half of the p-chart,
    shared verbatim by the batch query and the s27 complete-mode
    streaming twin (state = two longs per day)."""
    return ev.groupBy(F.to_date("ts").alias("__d")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("long")
        .alias("n_err"),
    )

def _pchart_finalize(daily: DataFrame) -> DataFrame:
    """The control-limit finalize over (day, n, n_err) rows — one
    arithmetic definition so batch and stream cannot drift."""
    overall = daily.agg(
        (F.sum("n_err") / F.sum("n")).alias("__pbar")
    )
    lim = F.lit(3.0) * F.sqrt(
        F.col("__pbar") * (F.lit(1.0) - F.col("__pbar")) / F.col("n")
    )
    rate = F.col("n_err") / F.col("n")
    return daily.crossJoin(F.broadcast(overall)).select(
        F.date_format("__d", "yyyy-MM-dd").alias("day"),
        "n",
        "n_err",
        F.round(rate, 6).alias("err_rate"),
        F.round(F.col("__pbar") + lim, 6).alias("ucl"),
        (rate > F.col("__pbar") + lim).alias("out_of_control"),
    )

def _changepoint_finalize(daily: DataFrame) -> DataFrame:
    """BGSS argmax over a (day, count) frame — shared verbatim by the
    batch query and the complete-mode streaming twin (whose state IS
    the day frame)."""
    daily = daily.select(
        "__day", F.col("__y").cast("long").alias("__y")
    )
    rhs = daily.select(
        F.col("__day").alias("__d2"), F.col("__y").alias("__y2")
    )
    pref = (
        daily.select(F.col("__day").alias("__s"))
        .join(rhs, F.col("__d2") <= F.col("__s"))
        .groupBy("__s")
        .agg(
            F.count(F.lit(1)).cast("long").alias("__n1"),
            F.sum("__y2").cast("long").alias("__s1"),
        )
    )
    tot = daily.agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum("__y").cast("long").alias("__tot"),
    )
    scored = (
        pref.crossJoin(F.broadcast(tot))
        .where(F.col("__n1") < F.col("__n"))
        .withColumn(
            "__bgss",
            F.expr(
                "CAST(__s1 AS DOUBLE) * CAST(__s1 AS DOUBLE)"
                " / CAST(__n1 AS DOUBLE)"
                " + CAST(__tot - __s1 AS DOUBLE) * CAST(__tot - __s1 AS DOUBLE)"
                " / CAST(__n - __n1 AS DOUBLE)"
                " - CAST(__tot AS DOUBLE) * CAST(__tot AS DOUBLE)"
                " / CAST(__n AS DOUBLE)"
            ),
        )
    )
    return (
        scored.orderBy(F.desc("__bgss"), F.asc("__s"))
        .limit(1)
        .select(
            F.date_format("__s", "yyyy-MM-dd").alias("split_day"),
            F.col("__n1").alias("n_days_left"),
            (F.col("__n") - F.col("__n1")).cast("long").alias("n_days_right"),
            F.round(
                F.col("__s1").cast("double") / F.col("__n1").cast("double"), 6
            ).alias("mean_left"),
            F.round(
                (F.col("__tot") - F.col("__s1")).cast("double")
                / (F.col("__n") - F.col("__n1")).cast("double"),
                6,
            ).alias("mean_right"),
            F.round("__bgss", 6).alias("bgss"),
        )
    )

def _tenure_finalize(per_user: DataFrame) -> DataFrame:
    """Survival-table finalize over per-user (first, last) day spans —
    shared verbatim by the batch query and the complete-mode
    streaming twin (whose state IS the span frame)."""
    hist = per_user.select(
        F.expr("datediff(__last, __first) div 7").cast("long").alias(
            "tenure_weeks"
        )
    ).groupBy("tenure_weeks").agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    )
    rhs = hist.select(
        F.col("tenure_weeks").alias("__tw2"), F.col("n_users").alias("__m2")
    )
    surv = (
        hist.join(rhs, F.col("__tw2") >= F.col("tenure_weeks"))
        .groupBy("tenure_weeks", "n_users")
        .agg(F.sum("__m2").cast("long").alias("n_surviving"))
    )
    total = hist.agg(F.sum("n_users").cast("long").alias("__total"))
    return surv.crossJoin(F.broadcast(total)).select(
        "tenure_weeks",
        "n_users",
        "n_surviving",
        F.round(
            F.expr(
                "CAST(n_surviving AS DOUBLE) / CAST(__total AS DOUBLE)"
            ),
            6,
        ).alias("survival_share"),
    )
