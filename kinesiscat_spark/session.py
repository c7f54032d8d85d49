"""SparkSession factory tuned for this engine.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default all cores); the
same conf block is what we would ship on a real cluster — AQE on (runtime
re-planning, skew-join splitting, partition coalescing), Arrow for any
pandas-UDF exchange, and a shuffle-partition count sized for the local box
(on a 1000-executor cluster this would be set to ~2-3x total cores instead).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "kinesiscat-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    if shuffle_partitions is None:
        shuffle_partitions = max(32, cpus)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # AQE: runtime partition coalescing, skew-join handling, plan re-opt.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow transfer for pandas UDFs (the JMESPath fallback path).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Deterministic timestamp behavior for oracle comparison.
        .config("spark.sql.session.timeZone", "UTC")
        # The driver's events.parquet stores ts as TIMESTAMP(NANOS); Spark
        # has no nanos timestamp — read as long, converted in load_table.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Broadcast threshold: dims like region/nation/supplier always fit.
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        # JMESPath merge() on map-typed payloads is right-wins (map_concat
        # needs LAST_WIN; the default EXCEPTION policy throws on dup keys).
        .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    return builder.getOrCreate()
