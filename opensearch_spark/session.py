"""SparkSession factory with scale-appropriate defaults.

Local mode is a stand-in for a multi-executor cluster: everything here
(AQE, skew-join splitting, shuffle partition sizing, Arrow) is what we
would set on a 1000-executor cluster reading 100 TB; only the memory and
partition-count numbers change.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "opensearch_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER", "local[{}]".format(
        os.environ.get("SPARK_GRAFT_CPUS", "32")))
    # local[N] → N tasks; shuffle partitions ≈ cores locally (cluster: 2-3× cores)
    if shuffle_partitions is None:
        n = master.split("[")[-1].rstrip("]") if "[" in master else "32"
        shuffle_partitions = 32 if n == "*" else max(8, int(n))
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # local mode: the driver JVM is also the executor. 8g measured
        # FASTER than 48g on the big builds (48g: rare-but-huge GCs + 16
        # threads scanning on-heap columnar cache = 2.4M-doc 16-core build
        # 78s→117s; 8g's partial spill to page cache is cheaper) — keep the
        # heap generational-friendly and let the OS cache the spill
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
