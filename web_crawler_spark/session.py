"""SparkSession factory tuned for this engine.

Local-mode testing runs on ``local[N]`` (single JVM); the configs below are
chosen so the same code is cluster-ready: AQE on (runtime skew-join +
partition coalescing), Arrow on (all Python UDFs are pandas/Arrow
vectorized), shuffle partitions sized to cores rather than the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "web_crawler_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    cores: parallelism for local mode; defaults to $SPARK_GRAFT_CPUS or '*'.
    """
    if cores is None:
        env = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{env}]" if env else "local[*]"
    else:
        master = f"local[{cores}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # image payloads ride in binary columns; bound Arrow batch size so a
        # batch of bytes rows fits executor memory at 100TB scale
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        # 16g, not bigger: oversized heaps measurably GC-anti-scale at high
        # local thread counts (see BENCH.md); real clusters size per-core
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        # The generated-class cache defaults to 100 entries — smaller than
        # the number of codegen units in ONE multi-strategy composite query
        # (AQE re-plans per stage, each stage compiles), so a single
        # execution can evict its own classes and re-pay multi-second
        # Janino compiles on every run. 2000 entries keeps every plan this
        # engine produces compiled-once per JVM; the cached classes are
        # small (metaspace, not heap).
        .config("spark.sql.codegen.cache.maxEntries", "2000")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    if os.path.isdir("/dev/shm"):
        # tmpfs shuffle: local-mode stand-in for cluster NVMe/shuffle service
        builder = builder.config("spark.local.dir", "/dev/shm/wcs-shuffle")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
