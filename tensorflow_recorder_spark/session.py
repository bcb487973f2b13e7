"""SparkSession factory tuned for the engine.

Local-mode defaults follow the public Spark tuning guidance: shuffle
partitions ~ cores (not 200), AQE on for runtime re-planning and skew
handling, Arrow on for the pandas-UDF multimodal path, UTC session TZ so
results compare bit-for-bit against UTC-naive oracle engines.

On a real cluster these builder calls are no-ops against an existing
session (``getOrCreate``) — the engine never assumes local mode.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _default_driver_mem(meminfo_path: str = "/proc/meminfo") -> str:
    """Driver-heap default: ~40% of MemAvailable, clamped to [1g, 12g],
    8 GB assumed when /proc is absent or malformed (a truncated
    MemAvailable line must fall back, not raise — r7 advice item 1;
    extracted as a function so the regression test exercises THIS code,
    not a copy — r8 review)."""
    avail_gb = 8.0  # conservative fallback when /proc is absent
    try:
        with open(meminfo_path) as fh:
            for line in fh:
                if line.startswith("MemAvailable:"):
                    avail_gb = int(line.split()[1]) / 1024 / 1024
                    break
    except (OSError, ValueError, IndexError):
        # A missing /proc, or a malformed/truncated MemAvailable
        # line (int()/split() raising), both mean "unknown host
        # memory" — keep the conservative 8 GB fallback rather
        # than crashing session creation.
        pass
    return f"{max(1, min(12, int(avail_gb * 0.4)))}g"


def get_spark(app_name: str = "tensorflow_recorder_spark", master: str | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4))
    # In local mode the driver JVM IS the executor; the stock 1g heap
    # makes every localCheckpoint/persist spill long before the host's
    # memory is used (observed: 10x-scale runs degraded to disk-backed
    # block persistence and one hard SparkOutOfMemoryError). The
    # default is capped at ~40% of MemAvailable so small hosts keep
    # headroom for the OS + Python workers instead of inviting the
    # kernel OOM killer (a fixed 12g on an 8 GB box trades graceful
    # spill for a hard kill). Only effective before the JVM launches —
    # getOrCreate against a live session leaves it untouched, and on a
    # real cluster executor sizing comes from the cluster config.
    mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM") or _default_driver_mem()
    # r12 (verdict item 2): pin BLAS/OpenMP to one thread per PYTHON
    # WORKER. Every worker runs numpy kernels inside its own task slot;
    # an unpinned OpenBLAS spawns a thread per core PER WORKER, so at
    # local[8] the fused dedup's sgemm panels ran 8 workers x 8+ BLAS
    # threads on 8 cores — the oversubscription suspected in the r11
    # local[8] worker crashes, and wasted context switching everywhere
    # else. Set BEFORE the JVM launches so the worker daemon inherits
    # it (the driver's own numpy is typically already imported by then
    # and keeps its thread pool; executorEnv covers cluster mode).
    # Parallelism across data stays with Spark's task slots — the
    # guide's division of labor (§4.2).
    for var in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS"):
        os.environ.setdefault(var, "1")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.executorEnv.OPENBLAS_NUM_THREADS", os.environ["OPENBLAS_NUM_THREADS"])
        .config("spark.executorEnv.OMP_NUM_THREADS", os.environ["OMP_NUM_THREADS"])
        .config("spark.driver.memory", mem)
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE coalesce floor, defense-in-depth: with parallelismFirst
        # (default) AQE never coalesces below defaultParallelism
        # (measured on Spark 4.1), but a cluster config that sets
        # parallelismFirst=false falls back to advisory-size targeting
        # where the stock 1 MiB minPartitionSize can shrink a small
        # shuffle to a handful of partitions — serializing downstream
        # per-row Python stages. 64k keeps small shuffles parallel in
        # that config; at 100 TB partition sizes >> 64k so the floor
        # never binds and AQE behaves exactly as stock.
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    if master:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{cpus}]")
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
