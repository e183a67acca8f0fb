"""Distributed dense indexing (zipWithIndex) for DataFrames.

The naive dense relabel — ``dense_rank`` / ``row_number`` over
``Window.orderBy(col)`` with no partitionBy — plans an Exchange
SinglePartition: ONE task receives and sorts every row, the classic
global-rank bottleneck at 1e9 keys. The scale shape is the two-pass
zipWithIndex: range-partition by the key, count each partition (a tiny
P-row collect), then rank WITHIN each range partition in parallel and
add the cumulative offset of the partitions before it. The result is
the identical deterministic dense rank by ascending key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dense_index(
    values: DataFrame,
    cols: list[str],
    out: str = "dense",
    assume_distinct: bool = False,
) -> DataFrame:
    """Mapping (cols..., out): dense 0..k-1 over the DISTINCT ``cols``
    tuples in ascending order — two-pass zipWithIndex, no
    single-partition Exchange. ``assume_distinct=True`` skips the
    dedup shuffle when the caller guarantees unique tuples."""
    v = values.select(*cols)
    if not assume_distinct:
        v = v.distinct()
    v = (
        v.repartitionByRange(*[F.col(c) for c in cols])
        # materialize so spark_partition_id is stable across the count
        # pass and the rank pass (range boundaries come from a sample)
        .localCheckpoint(eager=True)
        .withColumn("__pid", F.spark_partition_id())
    )
    spark = v.sparkSession
    counts = sorted(
        (r["__pid"], r["cnt"])
        for r in v.groupBy("__pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    )
    offsets, acc = [], 0
    for pid, cnt in counts:
        offsets.append((pid, acc))
        acc += cnt
    off = F.broadcast(
        spark.createDataFrame(offsets or [(0, 0)], "__pid INT, __off BIGINT")
    )
    w = Window.partitionBy("__pid").orderBy(*cols)
    return (
        v.join(off, "__pid")
        .withColumn(out, (F.row_number().over(w) - 1 + F.col("__off")).cast("long"))
        .drop("__pid", "__off")
    )
