"""Bucketed edge tables: shuffle-free iterative joins on clusters.

The iterative kernels (BFS/CC/PageRank/SSSP) join node-keyed loop state
against the loop-invariant edge table every round. `plans.iterate.mirror`
broadcasts the state while it fits; past the broadcast cap the join
becomes a shuffle-hash join — and then the EDGE side (the big one) gets
re-exchanged every round unless its partitioning already matches the
join key. Hive-style bucketing is Spark's mechanism for that: write the
edge table once, bucketed by the join key, and every subsequent
equi-join on that key reads the buckets in place — the physical plan
shows no Exchange on the edge side, round after round.

This is the cluster-mode setup the mirror() docstring refers to:

    write_bucketed_edges(edges, "edges_by_src", buckets=1024)
    eu = read_bucketed_edges(spark, "edges_by_src")
    bfs_distances(eu, source)      # per-round shuffle = state side only

Bucket count rule of thumb at 100 TB: total edge bytes / ~256 MB,
rounded to a power of two, and set spark.sql.shuffle.partitions to the
same figure so the state side's exchange aligns with the bucket layout.
Do NOT oversize: a join against a bucketed table pins its partition
count to the bucket count and AQE cannot coalesce it, so every loop
round schedules ``buckets`` tasks regardless of how little data the
round carries — measured at sf0.1, a 20-round BFS against a ~20 MB
edge table runs 2.8 s at 8 buckets but 5.1 s at 128 (pure scheduling
floor), while the same table UNbucketed lets AQE shrink each round to
1-2 tasks. Size buckets to the data, never above the parallelism one
round's work can actually use (``tools/bench_bucketed.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_edges(
    edges: DataFrame,
    table_name: str,
    buckets: int = 64,
    key: str = "src",
    sorted_within: bool = True,
) -> None:
    """Persist ``edges`` as a bucketed (and optionally sorted) managed
    table keyed for iterative joins. Overwrites an existing table."""
    spark = edges.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    w = edges.write.mode("overwrite").bucketBy(buckets, key)
    if sorted_within:
        w = w.sortBy(key)
    w.saveAsTable(table_name)


def read_bucketed_edges(spark: SparkSession, table_name: str) -> DataFrame:
    """Read a bucketed edge table. Joins on the bucket key avoid the
    edge-side Exchange (verify with ``assert_no_edge_exchange``)."""
    return spark.table(table_name)


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def count_exchanges(df: DataFrame) -> int:
    """Number of Exchange (shuffle) operators in the physical plan. The
    bucketing smoke check: the same equi-join against the bucketed edge
    table must plan one Exchange FEWER than against the plain table, and
    its scan must show ``Bucketed: true``."""
    return count_exchange_lines(physical_plan(df))


def count_exchange_lines(plan: str) -> int:
    """Exchange operators in a plan STRING (for plans captured via
    ``plans.iterate.PLAN_CAPTURE``, where the DataFrame is gone)."""
    return sum(1 for ln in plan.splitlines() if "Exchange" in ln)


def is_bucketed_scan(df: DataFrame) -> bool:
    return "Bucketed: true" in physical_plan(df)
