"""SparkSession factory.

Replaces the reference's ``py_spark/spark.py:18-107`` (``start_spark`` builder +
side-file config discovery) and ``py_spark/logging.py:10-52`` (Log4j wrapper)
with a plain builder plus stdlib logging. Defaults are tuned for the
local[N] test harness but are cluster-safe: AQE on (runtime re-plan, skew
join splitting), Arrow on (vectorized pandas-UDF transport), and a shuffle
partition count sized to the parallelism actually available instead of the
200 default.
"""

from __future__ import annotations

import logging
import os

from pyspark.sql import SparkSession

log = logging.getLogger("python_darima_spark")


def _default_parallelism() -> int:
    env = os.environ.get("SPARK_GRAFT_CPUS")
    if env:
        return max(1, int(env))
    return max(1, os.cpu_count() or 4)


def _default_driver_memory() -> str:
    """Size the local-mode JVM heap from what the host actually has:
    ~60 % of MemAvailable, clamped to [2g, 20g]. local[N] runs all N task
    threads in the driver JVM, so this heap is the whole executor heap —
    but a fixed 20g fails to start (or swaps) on smaller hosts.
    ``SPARK_DRIVER_MEMORY`` overrides."""
    env = os.environ.get("SPARK_DRIVER_MEMORY")
    if env:
        return env
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemAvailable:"):
                    avail_gb = int(line.split()[1]) / 1024 / 1024
                    return f"{max(2, min(20, int(avail_gb * 0.6)))}g"
    except OSError:
        pass
    return "8g"


def get_spark(
    app_name: str = "python-darima-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    On a real cluster, pass ``master=None`` and let spark-submit supply the
    master; locally we default to ``local[N]`` with N = available CPUs.
    """
    cpus = _default_parallelism()
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    elif "SPARK_MASTER" not in os.environ:
        builder = builder.master(f"local[{cpus}]")

    conf: dict[str, str] = {
        # Runtime re-planning: coalesce small shuffle partitions, split skewed
        # ones, and switch sort-merge to broadcast when a side turns out small.
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        # Arrow batches for every pandas UDF / toPandas crossing.
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.shuffle.partitions": str(shuffle_partitions or cpus),
        "spark.sql.session.timeZone": "UTC",
        # Parquet scans: vectorized reader + aggregate pushdown where legal.
        "spark.sql.parquet.aggregatePushdown": "true",
        # The testdata's events table stores TIMESTAMP(NANOS); Spark has no
        # nanos type, so read as long and convert in the loader.
        "spark.sql.legacy.parquet.nanosAsLong": "true",
        # local[N] runs all N task threads inside the driver JVM, so the
        # "driver" heap is really the whole executor heap: 8g for 32
        # concurrent tasks GC-thrashes once a few queries' caches pile up,
        # but a fixed large value fails on small hosts — derive from
        # MemAvailable (SPARK_DRIVER_MEMORY overrides).
        "spark.driver.memory": _default_driver_memory(),
    }
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)

    spark = builder.getOrCreate()
    log.info("SparkSession up: %s", spark.sparkContext.applicationId)
    return spark
