"""Graph layout: PivotMDS.

Parity target: reference ``viz/PivotMDS.hpp:23`` (Brandes & Pich — MDS on
a pivot-sampled distance matrix). The reference's viz module is otherwise
out of analytics scope (SURVEY §2.17); PivotMDS is included because its
computation is pure graph analytics: k pivot BFS distances + a
k×k eigendecomposition.

Spark shape: the distance matrix columns come from ONE batched
multi-source BFS (distributed, the dominant cost); the double-centered
covariance is k×k (pivot-count-sized, independent of n), so its
eigendecomposition runs driver-side with numpy — the standard split for
Nyström-style methods. Final coordinates are a distributed matrix-vector
product: one join + groupBy per output dimension, evaluated together.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from icebug_spark.operators.traversal import multi_source_bfs


def pivot_mds(
    edges_undirected: DataFrame,
    dim: int = 2,
    num_pivots: int = 16,
    max_hops: int = 30,
    unreached: float | None = None,
) -> DataFrame:
    """→ (id, coords ARRAY<DOUBLE>[dim]).

    Pivots = top-degree nodes (deterministic stand-in for the reference's
    random picks; same O(k) pivot regime). d(pivot, v) from batched BFS;
    unreached pairs get ``unreached`` (default: max observed distance + 1,
    the usual finite surrogate). C = -1/2 · J d² J is built k×n
    distributed, the k×k Gram matrix collected, eigenvectors computed in
    numpy, and coordinates projected back distributedly."""
    eu = edges_undirected.select("src", "dst").localCheckpoint(eager=True)
    deg = eu.groupBy(F.col("src").alias("id")).agg(F.count(F.lit(1)).alias("deg"))
    pivots = [
        int(r["id"])
        for r in deg.orderBy(F.desc("deg"), "id").limit(num_pivots).collect()
    ]
    k = len(pivots)
    d = multi_source_bfs(eu, pivots, max_hops).localCheckpoint(eager=True)

    nodes = eu.select(F.col("src").alias("id")).distinct()
    dmax = d.agg(F.max("dist")).collect()[0][0] or 1
    fill = float(unreached if unreached is not None else dmax + 1)
    # dense (source, id, d2) with unreached fill
    grid = (
        nodes.crossJoin(
            d.sparkSession.createDataFrame([(p,) for p in pivots], "source BIGINT")
        )
        .join(d, ["source", "id"], "left")
        .select(
            "source", "id",
            F.pow(F.coalesce(F.col("dist").cast("double"), F.lit(fill)), 2).alias("d2"),
        )
    ).localCheckpoint(eager=True)

    # double centering: c(p, v) = -1/2 (d2 - rowmean_p - colmean_v + total)
    rowm = grid.groupBy("source").agg(F.avg("d2").alias("rm"))
    colm = grid.groupBy("id").agg(F.avg("d2").alias("cm"))
    total = grid.agg(F.avg("d2")).collect()[0][0]
    c = (
        grid.join(F.broadcast(rowm), "source")
        .join(colm, "id")
        .select(
            "source", "id",
            (-0.5 * (F.col("d2") - F.col("rm") - F.col("cm") + F.lit(total))).alias("c"),
        )
    ).localCheckpoint(eager=True)

    # k×k Gram matrix B = C Cᵀ (pivot-by-pivot, collected — k² scalars)
    a = c.select(F.col("source").alias("p"), "id", F.col("c").alias("ca"))
    b = c.select(F.col("source").alias("q"), "id", F.col("c").alias("cb"))
    gram_rows = (
        a.join(b, "id")
        .groupBy("p", "q")
        .agg(F.sum(F.col("ca") * F.col("cb")).alias("g"))
        .collect()
    )
    idx = {p: i for i, p in enumerate(pivots)}
    B = np.zeros((k, k))
    for r in gram_rows:
        B[idx[r["p"]], idx[r["q"]]] = r["g"]
    vals, vecs = np.linalg.eigh(B)
    order = np.argsort(vals)[::-1][:dim]
    # coordinates: x_j = Cᵀ u_j / sqrt(lambda_j)  (Nyström projection)
    weights = []
    for rank, j in enumerate(order):
        lam = max(vals[j], 1e-12)
        for p in pivots:
            weights.append((int(p), int(rank), float(vecs[idx[p], j] / np.sqrt(lam))))
    wdf = d.sparkSession.createDataFrame(weights, "source BIGINT, comp INT, w DOUBLE")
    coords = (
        c.join(F.broadcast(wdf), "source")
        .groupBy("id", "comp")
        .agg(F.sum(F.col("c") * F.col("w")).alias("x"))
        .groupBy("id")
        .agg(F.array_sort(F.collect_list(F.struct("comp", "x"))).alias("s"))
        .select(
            "id",
            F.transform(F.col("s"), lambda t: F.round(t["x"], 6)).alias("coords"),
        )
    )
    return coords
