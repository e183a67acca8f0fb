"""Max-flow: Edmonds-Karp over a residual-capacity edge DataFrame.

Parity target: reference ``flow/EdmondsKarp.hpp:23`` with result API
getMaxFlow:38 / getSourceSet / getFlow / getFlowVector (:38-87).

Spark shape (SURVEY §2.9): the augmenting-path loop is inherently
sequential (each augmentation changes the residual graph), so the driver
loop runs one BFS per augmentation — each BFS is a distributed frontier
expansion over the residual edges. Fine for moderate graphs; the loop
count is bounded by O(VE) in theory but by maxflow/bottleneck in
practice. The residual table is localCheckpoint'ed per round to keep
lineage flat. For bulk all-pairs flow needs, prefer the Gomory-Hu-style
sampling the reference also lacks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bfs_path(residual: DataFrame, source: int, sink: int, max_hops: int = 64):
    """Shortest augmenting path in the residual graph (capacity > 0).
    Returns list of (u, v) arcs, or None. The frontier carries the full
    path as an array column; paths to sink are extracted on the driver
    (one row)."""
    spark = residual.sparkSession
    arcs = residual.where(F.col("cap") > 1e-12).select("src", "dst")
    frontier = spark.createDataFrame([(source,)], "node BIGINT").select(
        "node", F.array(F.col("node")).alias("path")
    )
    visited = frontier.select("node")
    for _ in range(max_hops):
        step = (
            frontier.join(arcs, frontier.node == arcs.src)
            .select(F.col("dst").alias("node"), F.concat("path", F.array("dst")).alias("path"))
            .join(visited, "node", "left_anti")
        )
        # one path per node suffices (BFS tree): pick lexicographically
        # smallest for determinism
        step = step.groupBy("node").agg(F.min("path").alias("path")).localCheckpoint(
            eager=True
        )
        # one action per hop: frontier size + the sink's path together
        # (the driver loop is job-submission-bound, not data-bound)
        agg = step.agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min(F.when(F.col("node") == sink, F.col("path"))).alias("hit"),
        ).collect()[0]
        if agg["cnt"] == 0:
            return None
        if agg["hit"] is not None:
            p = agg["hit"]
            return list(zip(p[:-1], p[1:]))
        # steps are pairwise disjoint (anti-joined against visited), so a
        # plain union needs no distinct; each step is checkpointed, so the
        # visited lineage stays flat without its own checkpoint.
        visited = visited.union(step.select("node"))
        frontier = step
    return None


def edmonds_karp(
    edges_capacity: DataFrame,
    source: int,
    sink: int,
    max_augmentations: int = 200,
) -> dict:
    """Max flow from source to sink on (src, dst, capacity) directed edges.

    Returns {"max_flow": float, "flow": DataFrame (src, dst, flow),
    "source_set": DataFrame (id)} — the reference's getMaxFlow /
    getFlowVector / getSourceSet surface."""
    spark = edges_capacity.sparkSession
    fwd = edges_capacity.select("src", "dst", F.col("capacity").cast("double").alias("cap"))
    bwd = edges_capacity.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"), F.lit(0.0).alias("cap")
    )
    residual = (
        fwd.unionByName(bwd)
        .groupBy("src", "dst")
        .agg(F.sum("cap").alias("cap"))
        .localCheckpoint(eager=True)
    )
    max_flow = 0.0
    for _ in range(max_augmentations):
        path = _bfs_path(residual, source, sink)
        if path is None:
            break
        path_df = spark.createDataFrame(path, "src BIGINT, dst BIGINT")
        bottleneck = (
            residual.join(path_df, ["src", "dst"], "leftsemi")
            .agg(F.min("cap"))
            .collect()[0][0]
        )
        max_flow += bottleneck
        deltas = path_df.select("src", "dst", F.lit(-bottleneck).alias("d")).union(
            path_df.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), F.lit(bottleneck).alias("d")
            )
        )
        residual = (
            residual.join(deltas, ["src", "dst"], "left")
            .select(
                "src", "dst", (F.col("cap") + F.coalesce("d", F.lit(0.0))).alias("cap")
            )
            .localCheckpoint(eager=True)
        )
    # flow on original arcs = capacity - residual capacity (positive part)
    flow = (
        fwd.select("src", "dst", F.col("cap").alias("capacity"))
        .join(residual, ["src", "dst"], "left")
        .select(
            "src",
            "dst",
            F.greatest(
                F.col("capacity") - F.coalesce("cap", F.lit(0.0)), F.lit(0.0)
            ).alias("flow"),
        )
    )
    # source set: nodes reachable from source in final residual graph
    arcs = residual.where(F.col("cap") > 1e-12).select("src", "dst").localCheckpoint(
        eager=True
    )
    frontier = spark.createDataFrame([(source,)], "id BIGINT")
    reach = frontier
    for _ in range(64):
        frontier = (
            frontier.join(arcs, frontier.id == arcs.src)
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(reach, "id", "left_anti")
            .localCheckpoint(eager=True)
        )
        # frontiers are disjoint and individually checkpointed: plain
        # union keeps lineage flat with zero extra jobs per hop.
        if frontier.isEmpty():
            break
        reach = reach.union(frontier)
    return {"max_flow": max_flow, "flow": flow, "source_set": reach}
