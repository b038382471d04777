"""SparkSession factory tuned for this engine.

Local mode is the test harness; the config choices (AQE on, shuffle
partitions sized to cores, UTC session timezone, Arrow enabled) are the
same ones that matter on a real cluster — only master/memory change.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _default_driver_memory() -> str:
    """min(20g, ~50% of physical RAM), floored at 2g — a tuning default
    must never turn into a JVM-won't-launch failure on small hosts."""
    try:
        page = os.sysconf("SC_PAGE_SIZE")
        pages = os.sysconf("SC_PHYS_PAGES")
        total_gib = (page * pages) / (1024**3)
    except (ValueError, OSError, AttributeError):
        return "8g"
    return f"{max(2, min(20, int(total_gib * 0.5)))}g"


def get_spark(
    app_name: str = "etl-aladia-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    ``cpus`` defaults to $SPARK_GRAFT_CPUS (driver contract) or all cores.
    ``shuffle_partitions`` defaults to the core count — at local scale a
    shuffle fan-out of 200 only adds scheduling overhead; on a cluster this
    would be sized to ~2-3x total cores (AQE coalesces down at runtime).
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # inject runtime bloom filters on selective shuffle joins (Spark 3.3+):
        # the probe side drops non-matching rows before the shuffle — the
        # engine-level twin of functions/sketches.bloom_prune_probe
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        # local mode: the driver JVM IS the executor — size the heap for
        # all worker threads (8g/32 threads = 250MB per task is spill
        # territory on wide aggregations), but cap at ~half of physical
        # RAM so the default still launches on a 16 GiB dev host; the
        # harness exports SPARK_DRIVER_MEMORY to override
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_DRIVER_MEMORY", _default_driver_memory()),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
