"""Per-query profiling harness for the optimization rounds.

Runs named registry queries with bench.py's methodology (untimed warm-up
+ timed samples against the noop sink) in a session with the UI status
store enabled, then prints each query's wall time AND the per-job /
per-stage breakdown from the Spark status API — job description, stage
name, task count, and stage duration — so the expensive stage is
identified by measurement, not guesswork (guide §1.1/§7.1).

Usage:
  python scripts/profile_query.py [--plan] [--samples N] query [query ...]

--plan additionally writes .explain("formatted") to
plans/r12/<query>_profile.txt.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--plan", action="store_true")
    ap.add_argument("--samples", type=int, default=3)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--jobs", action="store_true", help="print per-job breakdown of the LAST sample")
    args = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ["SPARK_GRAFT_CPUS"] = cpus
    os.environ["SPARK_GRAFT_PROFILE_UI"] = "1"

    from pyspark.sql import SparkSession

    from tensorflow_recorder_spark.queries import QUERIES

    spark = (
        SparkSession.builder.appName("profile")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    ui = spark.sparkContext.uiWebUrl
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    # warm pools (mirrors bench.py)
    spark.range(1000).select("id").write.format("noop").mode("overwrite").save()
    spark.range(100).mapInPandas(lambda it: it, schema="id long").write.format(
        "noop"
    ).mode("overwrite").save()

    def api(path: str):
        with urllib.request.urlopen(f"{ui}/api/v1/{path}") as r:
            return json.load(r)

    app_id = spark.sparkContext.applicationId

    for name in args.queries:
        fn = QUERIES[name]
        if args.plan:
            os.makedirs("plans/r12", exist_ok=True)
            df = fn(spark, args.sf_dir)
            with open(f"plans/r12/{name}_profile.txt", "w") as f:
                f.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
        times = []
        first_job = None
        for i in range(args.samples + 1):
            if i == args.samples:  # last sample: record job-id window
                jobs_before = {j["jobId"] for j in api(f"applications/{app_id}/jobs")}
            spark.sparkContext.setJobDescription(f"{name} sample {i}")
            t0 = time.time()
            fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        print(f"\n=== {name}: warmup {times[0]}  timed {times[1:]}  median {sorted(times[1:])[len(times[1:])//2]}")
        if args.jobs:
            jobs = [j for j in api(f"applications/{app_id}/jobs") if j["jobId"] not in jobs_before]
            jobs.sort(key=lambda j: j["jobId"])
            for j in jobs:
                dur = None
                if j.get("completionTime") and j.get("submissionTime"):
                    from datetime import datetime
                    fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
                    try:
                        dur = (datetime.strptime(j["completionTime"][:23], "%Y-%m-%dT%H:%M:%S.%f")
                               - datetime.strptime(j["submissionTime"][:23], "%Y-%m-%dT%H:%M:%S.%f")).total_seconds()
                    except ValueError:
                        pass
                print(f"  job {j['jobId']:>4} {dur if dur is not None else '?':>7}s tasks={j['numTasks']:>4} {j.get('description','')[:80]}")
                for sid in sorted(j.get("stageIds", [])):
                    try:
                        st_list = api(f"applications/{app_id}/stages/{sid}")
                    except Exception:
                        continue
                    for st in st_list:
                        if st["status"] == "COMPLETE":
                            ms = st.get("executorRunTime", 0)
                            print(f"      stage {sid:>4} runTime={ms/1000.0:7.2f}s tasks={st['numCompleteTasks']:>4} {st['name'][:70]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
