"""Scaling-curve evidence for the 100 TB design claims (r6 verdict
item 1): run the most expensive batch queries at sf0.1 AND at the
derived 10x dataset (scripts/gen_scale_data.py -> .scale/sf1) in ONE
session, and record the per-query wall-time ratio.

SCALE.md argues big-O; this measures the actual sf0.1 -> sf1 exponent.
The gate: ratio <= ~10x input growth for linear-designed queries (in
practice far below 10 at these sizes, since local[32] wall-time still
carries per-query constants — JIT, stage scheduling — that amortize
with scale; a ratio NEAR or ABOVE 10 flags a super-linear term, e.g.
the r6 e1_source_overlap triple evaluation would have shown up here
as ~3x its entitlement).

Named exclusion: e1_lsh_recall_audit — its exact-Jaccard truth is
documented fixture-scale-only (quadratic by construction); its scale
path e1_lsh_recall_sampled IS measured.

Writes SCALING.json {query: {sf01, sf1, ratio}}; bench.py merges it
into BENCH_LOCAL.json as "sf1_scaling" when present.

Usage: python scripts/bench_scale.py [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

SF01 = "/root/testdata/sf0.1"
SF1 = "/root/repo/.scale/sf1"

# the 20 most expensive batch queries by the r6 warm record, plus both
# convert benches (the flagship ETL path)
DEFAULT_QUERIES = [
    "e1_threshold_sweep",
    "e6_curate_v2",
    "e1_source_overlap",
    "e1_cluster_inflation",
    "e1_triangle_stats",
    "e1_dedup_savings",
    "e1_fuzzy_dedup",
    "p4_leakage_safe_split",
    "e1_incremental_dedup",
    "e1_keep_best",
    "e2_nlist_recall_curve",
    "e2_nprobe_recall_curve",
    "e2_label_purity",
    "e2_knn_classify",
    # the other two members of the fixed-query-budget audit family
    # (all four were O(N^2/20) via %-of-corpus query sides until the
    # r7 budget fix; kept here so a regression reappears as a ratio)
    "e2_filtered_topk",
    "e2_match_confidence",
    "e1_lsh_pairs",
    "e2_dim_truncation_curve",
    "rel_waiting_supplier",
    "e1_lsh_recall_sampled",
    "e3_bpe_encode",
    "e4_sessionize",
    # r7: the expensive tail surfaced by benching every registry query
    # (auto-append) plus the new r7 flagships
    "e1_lexical_semantic_agreement",
    "rel_pagerank",
    "e1_lsh_verified",
    "e1_minhash_calibration",
    "e1_shingle_size_sweep",
    "e1_dedup_funnel",
    "e2_scan_cost_frontier",
    "e3_char_entropy",
    "e1_embedding_neardup",
]


def main() -> int:
    if not os.path.isdir(SF1):
        print(f"missing {SF1}: run scripts/gen_scale_data.py first")
        return 1
    names = sys.argv[1:] or DEFAULT_QUERIES

    from tensorflow_recorder_spark.queries import QUERIES
    from tensorflow_recorder_spark.session import get_spark

    import bench as bench_mod

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("bench_scale", master=f"local[{cpus}]")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    # warm both datasets' parquet footers + the Arrow worker pool
    spark.range(100).mapInPandas(lambda it: it, schema="id long").write.format(
        "noop"
    ).mode("overwrite").save()
    for d in (SF01, SF1):
        for t in ("lineitem", "documents", "embeddings", "events"):
            spark.read.parquet(f"{d}/{t}.parquet").limit(64).write.format(
                "noop"
            ).mode("overwrite").save()

    def run(fn, sf_dir: str) -> float:
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        first = time.time() - t0
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return round(min(first, time.time() - t0), 3)

    out: dict[str, dict] = {}
    for name in names:
        fn = QUERIES[name]
        t01 = run(fn, SF01)
        t1 = run(fn, SF1)
        out[name] = {
            "sf01": t01,
            "sf1": t1,
            "ratio": round(t1 / t01, 2) if t01 > 0 else None,
        }
        print(f"{name}: sf0.1={t01}s sf1={t1}s ratio={out[name]['ratio']}")

    # flagship converts, measured through the same run_convert path
    for label, bfn in (
        ("convert_tfrecord", bench_mod.bench_convert),
        ("convert_lineitem", bench_mod.bench_convert_lineitem),
    ):
        t01 = round(min(bfn(spark, SF01), bfn(spark, SF01)), 3)
        t1 = round(min(bfn(spark, SF1), bfn(spark, SF1)), 3)
        out[label] = {
            "sf01": t01,
            "sf1": t1,
            "ratio": round(t1 / t01, 2) if t01 > 0 else None,
        }
        print(f"{label}: sf0.1={t01}s sf1={t1}s ratio={out[label]['ratio']}")

    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "SCALING.json"
    )
    if sys.argv[1:] and os.path.exists(path):
        # targeted re-measure (e.g. after a plan rewrite): merge into
        # the existing record instead of discarding the other queries
        with open(path) as f:
            prev = json.load(f).get("queries", {})
        prev.update(out)
        out = prev
    with open(path, "w") as f:
        json.dump(
            {"input_growth": 10.0, "excluded": {
                "e1_lsh_recall_audit": "exact-Jaccard truth is documented"
                " fixture-scale-only (quadratic); scale path"
                " e1_lsh_recall_sampled is measured",
            }, "queries": out},
            f,
            indent=1,
        )
        f.write("\n")
    worst = max((v["ratio"] or 0) for v in out.values())
    print(json.dumps({"metric": "sf01_to_sf1_worst_ratio", "value": worst,
                      "n_queries": len(out)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
