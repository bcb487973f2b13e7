"""Streaming train/eval contamination — eval documents arrive as a
stream and are checked against a static train shingle index.

The batch detector (``operators.dedup.contamination_pairs``) assumes
both corpora are at rest; in practice new eval/benchmark sets show up
continuously and must be vetted against the (huge, slow-moving) train
corpus without re-running a full batch join. Structured Streaming's
stream-static join is exactly that shape:

- **Static side** = the exploded ``(shingle_hash, train_id)`` index,
  optionally document-frequency-cut (boilerplate shingles are not
  contamination evidence and are also the join's hot keys). At 100 TB
  of train data this side is computed ONCE and materialized (here
  an eager ``localCheckpoint``; in production a bucketed parquet/Delta
  index keyed by shingle hash) — Spark re-evaluates the static plan
  every micro-batch, so an unmaterialized explode of the train corpus
  would re-hash 100 TB per batch.
- **Stream side** = a stateless narrow explode of each arriving eval
  doc into its (sketched) shingle hashes — reuses the exact expression
  the batch path uses, so stream and batch agree bit-for-bit.
- The equi-join on the 32-bit hash is the same n^2-avoidance as LSH
  banding: only (train, eval) docs that actually share a shingle meet.
- ``groupBy(eval_id, train_id).count()`` runs in the state store;
  because each side's per-doc shingle sets are distinct, the count IS
  the shared-shingle count. The ``min_shared`` floor is applied by the
  consumer after draining (the running count is monotone, so filtering
  inside the stream would emit-then-grow in update mode).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators.dedup import exploded_shingles


def streaming_contamination_pairs(
    eval_stream: DataFrame,
    train: DataFrame,
    text_col: str,
    id_col: str,
    shingle_len: int = 5,
    max_shingle_df: int | None = None,
    shingle_mod: int | None = None,
) -> DataFrame:
    """Running (eval_id, train_id, shared) contamination edges for a
    stream of eval docs against a static train corpus. Complete/update
    output mode; fold with ``operators.dedup.report_from_pairs`` after
    draining."""
    if not eval_stream.isStreaming:
        raise ValueError("eval_stream must be a streaming DataFrame")
    from ..operators.dedup import _spread

    tr = exploded_shingles(
        _spread(train), text_col, id_col, "train_id", shingle_len, shingle_mod
    )
    if max_shingle_df is not None:
        # two consumers (df-cut aggregate + join side): materialize the
        # expensive per-position hash projection once. EAGER, like the
        # batch detector: a lazy checkpoint would materialize inside the
        # first micro-batch and truncate lineage mid-flight (transient
        # missing-broadcast failures)
        tr = tr.localCheckpoint(eager=True)
        hot = (
            tr.groupBy("__g")
            .agg(F.count(F.lit(1)).alias("__df"))
            .where(F.col("__df") > max_shingle_df)
            .select("__g")
        )
        tr = tr.join(hot, "__g", "left_anti")
    ev = exploded_shingles(
        eval_stream, text_col, id_col, "eval_id", shingle_len, shingle_mod
    )
    return (
        ev.join(tr, "__g")
        .groupBy("eval_id", "train_id")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
