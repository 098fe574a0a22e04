"""SparkSession factory with engine defaults.

The engine runs under two session regimes:

1. Sessions we create (tests, bench, pipeline jobs) — built here with
   UTC timestamps, AQE, and right-sized shuffle partitions.
2. Sessions handed to us (the driver's verify harness) — we cannot
   rebuild those, so every entry point calls
   :func:`doin_fine_ance__spark.compat.ensure_compat` which applies the
   same semantics via runtime-settable confs.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from .compat import ensure_compat


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(
    app_name: str = "doin-fine-ance-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    Local mode uses ``local[cpus]``; shuffle partitions default to the
    core count (the 200 default over-parallelizes local runs and
    under-parallelizes large clusters — on a real cluster AQE coalesces
    upward from this anyway).
    """
    cpus = cpus or default_parallelism()
    shuffle = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.appName(app_name)
        .master(os.environ.get("SPARK_MASTER", f"local[{cpus}]"))
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Local mode = driver IS the executor: its block manager holds
        # every localCheckpoint (the dedup pipelines materialize band
        # keys / token stores / CC labels there). At 8g those blocks
        # drive stop-the-world full GCs that stall unrelated queries
        # for tens of seconds; size the single-JVM heap like the
        # executor it stands in for.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        # Shuffle files + spilled checkpoint blocks go to spark.local.dir;
        # on this box the root disk is burst-throttled block storage and
        # shuffle-heavy pipelines stall seconds in D-state once credits
        # run out, while RAM sits idle. Prefer tmpfs when it exists —
        # exactly what a tuned cluster does with NVMe/ramdisk scratch.
        .config(
            "spark.local.dir",
            os.environ.get(
                "SPARK_LOCAL_DIRS",
                "/dev/shm/spark-scratch" if os.path.isdir("/dev/shm") else "/tmp",
            ),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # The ContextCleaner deletes a query's shuffle files only after
        # the JVM garbage-collects their RDD references, and the stock
        # periodic-GC interval is 30 MINUTES — a session that runs
        # hundreds of queries back-to-back (the bench, a sweep, a real
        # multi-query pipeline) accumulates every dead query's shuffle
        # files on spark.local.dir until then. With tmpfs scratch that
        # is RAM: measured 97 GB of dead shuffle files during the sf10
        # bench before the kernel OOM-killed the JVM. A tight periodic
        # GC keeps scratch bounded by the WORKING set, not the session
        # history; the minor-GC cost is noise next to any real query.
        .config(
            "spark.cleaner.periodicGC.interval",
            os.environ.get("SPARK_GRAFT_PERIODIC_GC", "2min"),
        )
        # One BLAS thread per Python worker (see package __init__ —
        # each worker is one task slot; self-threading BLAS pools
        # oversubscribe and spin). executorEnv carries the pin to
        # cluster-mode executors; local mode inherits the driver env.
        .config("spark.executorEnv.OPENBLAS_NUM_THREADS",
                os.environ.get("OPENBLAS_NUM_THREADS", "1"))
        .config("spark.executorEnv.OMP_NUM_THREADS",
                os.environ.get("OMP_NUM_THREADS", "1"))
        .config("spark.executorEnv.MKL_NUM_THREADS",
                os.environ.get("MKL_NUM_THREADS", "1"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    ensure_compat(spark)
    return spark
