"""k-core decomposition by iterative peeling.

Parity target: reference ``centrality/CoreDecomposition.hpp:26,49``.

Bulk-synchronous peeling: repeatedly delete all nodes with degree < k (for
core membership) or peel minimum-degree layers (for core numbers). Each
round = degree groupBy + semi-join filter; lineage truncated per round.
At scale the peeling rounds for full core numbers can be many; the
k-core *membership* variant (fixed k) used by the t2 query converges in
few rounds and each round shrinks the edge set monotonically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_core(edges_undirected: DataFrame, k: int, max_iter: int = 50) -> DataFrame:
    """Node set of the k-core → (id). Input must be symmetrized."""
    eu = edges_undirected.select("src", "dst").localCheckpoint(eager=True)
    for _ in range(max_iter):
        deg = eu.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
        keep = deg.where(F.col("deg") >= k).select("src")
        filtered = (
            eu.join(keep, "src", "leftsemi")
            .join(keep.withColumnRenamed("src", "dst"), "dst", "leftsemi")
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
        if filtered.count() == eu.count():
            eu = filtered
            break
        eu = filtered
    return eu.select(F.col("src").alias("id")).distinct()


def core_numbers(edges_undirected: DataFrame, max_k: int = 100) -> DataFrame:
    """(id, core) full core decomposition by increasing-k peeling."""
    eu = edges_undirected.select("src", "dst").localCheckpoint(eager=True)
    spark = edges_undirected.sparkSession
    result = None
    k = 1
    remaining = eu.select(F.col("src").alias("id")).distinct()
    while k <= max_k:
        core_k = k_core(eu, k)
        dropped = remaining.join(core_k, "id", "left_anti").withColumn(
            "core", F.lit(k - 1).cast("long")
        )
        result = dropped if result is None else result.union(dropped)
        if core_k.limit(1).count() == 0:
            break
        remaining = core_k
        eu = (
            eu.join(core_k.withColumnRenamed("id", "src"), "src", "leftsemi")
            .join(core_k.withColumnRenamed("id", "dst"), "dst", "leftsemi")
            .localCheckpoint(eager=True)
        )
        k += 1
    return result if result is not None else spark.createDataFrame([], "id long, core long")
