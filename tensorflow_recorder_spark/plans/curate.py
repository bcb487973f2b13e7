"""End-to-end corpus curation plan — the LLM-pipeline counterpart of
``plans/convert.py``: one declarative chain from raw documents to a
training-ready corpus.

Stage order follows the standard curation recipe (cheap narrow filters
first, shuffles last, so every shuffle moves an already-shrunk corpus):

1. **Quality floor** (``operators.text.quality_exprs``): narrow
   projection + filter, fuses into the scan.
2. **Exact dedup** (``operators.dedup.exact_dedup``, skew-resistant
   ``agg`` form): digest-keyed shuffle of the survivors only.
3. **Per-source token quota** (``operators.sampling.source_token_quota``):
   anti-domination window over (source, shard).
4. **Epoch shuffle key** (``operators.sampling.with_shuffle_key``):
   narrow projection; sorting by it is the training order.

Every stage is a pure function of row content and ids — the curated
corpus is bit-identical across retries, partitionings, and engines
(each stage already carries its own DuckDB oracle; the composed plan is
oracle-checked end-to-end as ``e6_curate``).

``curate_report`` counts survivors per stage. It triggers one job per
boundary; the stage frames share the scan, and Spark's whole-stage
codegen makes the repeated narrow prefix cheap. At 100 TB run the
report on a hash-sample slice, or accept four passes for an exact
audit — the report is a diagnostics artifact, not part of the
production plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..operators.dedup import exact_dedup
from ..operators.sampling import source_token_quota, with_shuffle_key
from ..operators.text import quality_exprs


def _stages(
    df: DataFrame,
    text_col: str,
    id_col: str,
    source_col: str,
    min_quality: float | None,
    dedup: bool,
    quota_tokens: int | None,
    quota_shards: int,
    token_count: Column,
    shuffle_salt: str,
) -> list[tuple[str, DataFrame]]:
    stages: list[tuple[str, DataFrame]] = [("input", df)]
    cur = df
    if min_quality is not None:
        score = quality_exprs(text_col)["score"]
        # round-6 before the threshold: the score is engine-portable at
        # 6 digits (e3_quality's oracle contract), so membership at the
        # boundary never depends on last-bit float differences
        cur = cur.where(F.round(F.expr(score), 6) >= F.lit(float(min_quality)))
        stages.append(("quality", cur))
    if dedup:
        cur = exact_dedup(cur, text_col, id_col, method="agg")
        stages.append(("dedup", cur))
    if quota_tokens is not None:
        cur = source_token_quota(
            cur, source_col, id_col, token_count, quota_tokens,
            nshards=quota_shards,
        )
        stages.append(("quota", cur))
    cur = with_shuffle_key(cur, id_col, salt=shuffle_salt)
    stages.append(("shuffled", cur))
    return stages


def curate_corpus(
    df: DataFrame,
    text_col: str,
    id_col: str,
    source_col: str,
    token_count: Column,
    min_quality: float | None = 0.5,
    dedup: bool = True,
    quota_tokens: int | None = None,
    quota_shards: int = 1,
    shuffle_salt: str = "epoch0",
) -> DataFrame:
    """The curated corpus: input rows that survive every enabled stage,
    with ``n_tokens`` (when a quota ran) and ``shuffle_key`` attached."""
    return _stages(
        df, text_col, id_col, source_col, min_quality, dedup,
        quota_tokens, quota_shards, token_count, shuffle_salt,
    )[-1][1]


def curate_report(
    df: DataFrame,
    text_col: str,
    id_col: str,
    source_col: str,
    token_count: Column,
    min_quality: float | None = 0.5,
    dedup: bool = True,
    quota_tokens: int | None = None,
    quota_shards: int = 1,
    shuffle_salt: str = "epoch0",
) -> dict[str, int]:
    """Per-stage survivor counts (diagnostics): ``{stage: rows}`` in
    pipeline order."""
    return {
        name: frame.count()
        for name, frame in _stages(
            df, text_col, id_col, source_col, min_quality, dedup,
            quota_tokens, quota_shards, token_count, shuffle_salt,
        )
    }


def curate_corpus_v2(
    docs: DataFrame,
    eval_df: DataFrame,
    text_col: str,
    id_col: str,
    quality_col: str,
    min_quality: float = 0.5,
    min_est_jaccard: float = 0.5,
    jaccard_threshold: float = 0.5,
    contamination_min_shared: int = 13,
    contamination_max_df: int = 100,
    contamination_mod: int = 4,
    train_pct: int = 80,
    validation_pct: int = 10,
    salt: str = "",
) -> DataFrame:
    """The round-4 capstone curation chain — every stage a round-4
    operator, composed into the full prepare-a-training-corpus recipe:

    1. **Quality floor** (round-6 portable score).
    2. **Exact dedup** (min-id per digest, agg form).
    3. **Fuzzy keep-best dedup**: LSH-verified pair graph -> connected
       components -> each cluster keeps its highest-``quality_col``
       member (ties: lowest id).
    4. **Decontamination**: drop survivors sharing >=
       ``contamination_min_shared`` sketched shingles with any
       ``eval_df`` document (benchmark leakage removal).
    5. **Leakage-safe split**: TRAIN/VALIDATION/TEST hashed on the
       SAME near-dup cluster id as stage 3, so surviving members of a
       duplicate family can never straddle splits.

    Stage order keeps the standard discipline: narrow filters first,
    the expensive pair graph built once over the already-shrunk corpus
    and REUSED by both the keep-best choice and the split assignment,
    every anti-join keyed on a small id set. Output: input columns +
    ``group_key`` + ``split``.
    """
    from concurrent.futures import ThreadPoolExecutor

    from ..operators.dedup import (
        contamination_pairs,
        duplicate_clusters,
        exploded_shingles,
        lsh_verified_pairs,
    )
    from ..operators.split import leakage_safe_split
    from pyspark.sql import Window

    from ..operators.dedup import _spread

    score = quality_exprs(text_col)["score"]
    # r11 continuation (guide §2.6 overlap independent jobs): the
    # contamination EVAL side depends on nothing upstream — kick its
    # explode+checkpoint off on a driver thread now, so its tasks
    # back-fill cores while the main thread runs the quality/dedup
    # checkpoint and the pair-graph materialization.
    pool = ThreadPoolExecutor(max_workers=1)
    ev_future = pool.submit(
        lambda: exploded_shingles(
            _spread(eval_df), text_col, id_col, "eval_id",
            shingle_mod=contamination_mod,
        ).localCheckpoint(eager=True)
    )
    # a small parquet scan is often ONE partition — spread before the
    # regex-heavy quality projection so it runs at session parallelism
    # (no-op at scale where the scan is already parallel)
    s1 = _spread(docs).where(
        F.round(F.expr(score), 6) >= F.lit(float(min_quality))
    )
    # s2 feeds the pair graph, the keep-best rank join, the survivor
    # anti-join, and (transitively) contamination + split — materialize
    # it once (localCheckpoint, the same no-handle-leak choice as
    # lsh_verified_pairs' internals) instead of re-running the
    # scan+filter+dedup chain per consumer
    s2 = exact_dedup(s1, text_col, id_col, method="agg").localCheckpoint(
        eager=True
    )
    pairs = lsh_verified_pairs(
        s2, text_col, id_col,
        min_est_jaccard=min_est_jaccard, threshold=jaccard_threshold,
    )
    clusters = duplicate_clusters(pairs)
    ranked = clusters.join(
        s2.select(F.col(id_col).alias("id"), F.col(quality_col).alias("__q")),
        "id",
    ).withColumn(
        "__rk",
        F.row_number().over(
            Window.partitionBy("cluster_id").orderBy(F.desc("__q"), F.asc("id"))
        ),
    )
    dupes = ranked.where(F.col("__rk") > 1).select(F.col("id").alias(id_col))
    s3 = s2.join(dupes, id_col, "left_anti")
    try:
        ev = ev_future.result()
    finally:
        pool.shutdown(wait=False)
    cont = contamination_pairs(
        s3, eval_df, text_col, id_col,
        min_shared=contamination_min_shared,
        max_shingle_df=contamination_max_df,
        shingle_mod=contamination_mod,
        eval_exploded=ev,
    )
    cont_ids = cont.select(F.col("train_id").alias(id_col)).distinct()
    s4 = s3.join(cont_ids, id_col, "left_anti")
    return leakage_safe_split(
        s4, clusters, id_col,
        train_pct=train_pct, validation_pct=validation_pct, salt=salt,
    )
