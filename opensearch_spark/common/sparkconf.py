"""Small Spark-conf helpers shared across modules."""

from __future__ import annotations

from pyspark.sql import SparkSession


def shuffle_partitions(spark: SparkSession) -> int:
    """``spark.sql.shuffle.partitions`` as an int, tolerating platforms
    that set it to a non-numeric value (e.g. ``auto`` under managed AQE):
    falls back to the session's default parallelism instead of crashing
    every positions-based query with a ValueError (round-4 review). One
    authoring site — was copy-pasted at four call sites."""
    raw = spark.conf.get("spark.sql.shuffle.partitions", None)
    try:
        return int(raw)
    except (TypeError, ValueError):
        return int(spark.sparkContext.defaultParallelism)
