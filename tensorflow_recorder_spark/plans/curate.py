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
