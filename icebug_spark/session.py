"""SparkSession factory + defensive per-session configuration.

The driver may hand us an already-built SparkSession; ``prepare(spark)``
applies only runtime-settable, correctness-critical conf (UTC session time
zone so date extraction matches the DuckDB oracle on naive parquet
timestamps; AQE on for skew handling at scale).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def prepare(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable conf needed for deterministic results."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        # events.parquet stores TIMESTAMP(NANOS) which Spark's vectorized
        # reader rejects; read as raw nanos and convert in the catalog.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    except Exception:
        pass  # non-fatal: AQE is a performance knob, not a correctness one
    return spark


def get_spark(app_name: str = "icebug-spark") -> SparkSession:
    """Build (or reuse) a SparkSession tuned for local[N] testing.

    On a real cluster the same code runs unchanged; shuffle partitions are
    sized by env (default 32 to match local[32] cores — at 100 TB you would
    set this to ~2-3x total cores or rely on AQE coalescing).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    shuffle = os.environ.get("SPARK_SHUFFLE_PARTITIONS", cpus)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
    )
    return prepare(builder.getOrCreate())
