"""Structured Streaming analytics over the events table.

The reference has no windowed streaming (its model is ordered event-batch
replay, ``dynamics/``); Spark adds real watermarks/windows. These are the
streaming twins of the batch queries Q16/Q17 — same logic, readStream in
place of read (SURVEY §2.15).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def streaming_events(spark: SparkSession, path_glob: str, schema) -> DataFrame:
    """File-based streaming source over event parquet/json drops."""
    return spark.readStream.schema(schema).parquet(path_glob)


def tumbling_counts(stream: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Streaming twin of Q16: per-window, per-type counts with late-data
    watermarking. Append-mode safe (watermark closes windows)."""
    # Watermarks require TIMESTAMP (with zone); testdata may carry ts as
    # TIMESTAMP_NTZ. Session tz is UTC so the cast is wall-clock identity.
    return (
        stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def run_batch_equivalent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Execute the streaming pipeline over the static events table with
    trigger=availableNow semantics (batch-exec of the same plan) — used by
    tests to prove stream/batch parity of the window logic."""
    from icebug_spark.catalog import table

    e = table(spark, sf_dir, "events").withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        e.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
