"""Graph layout: PivotMDS + approximate MaxentStress.

Parity targets: reference ``viz/PivotMDS.hpp:23`` (Brandes & Pich — MDS
on a pivot-sampled distance matrix) and ``viz/MaxentStress.hpp:39``
(Gansner–Hu–North maxent-stress model). The reference's viz module is
otherwise out of analytics scope (SURVEY §2.17); these two are included
because their computation is pure graph analytics: BFS distances, sparse
stress iterations, eigendecomposition.

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

def maxent_stress(
    edges_undirected: DataFrame,
    dim: int = 2,
    iterations: int = 12,
    alpha: float = 0.1,
    alpha_decay: float = 0.7,
    sample_size: int = 48,
    seed: int = 11,
    init: DataFrame | None = None,
) -> DataFrame:
    """Approximate maxent-stress layout → (id, coords ARRAY<DOUBLE>[dim]).

    Reference ``viz/MaxentStress.hpp:39`` (Gansner–Hu–North): minimize
    stress over NEIGHBOR pairs only (w_ij = 1/d_ij², d_ij = 1 here) while
    spreading non-neighbors by a maximum-entropy repulsion term. Local
    iteration (paper eq. 4, q = 0):

        x_i ← (1/ρ_i)·Σ_{j∼i} w_ij·(x_j + d_ij·(x_i−x_j)/‖x_i−x_j‖)
              + (α/ρ_i)·(n/|S|)·Σ_{j∈S} (x_i−x_j)/‖x_i−x_j‖

    with α annealed by ``alpha_decay`` per round. The reference
    approximates the repulsion sum with a well-separated pair
    decomposition (inherently pointer-chasing); the distributed surrogate
    is a DETERMINISTIC hash-sampled global node set S, broadcast each
    round — n·|S| repulsion rows, linear in n, shuffle-free. Neighbor
    attraction is one m-row join + element-wise aggregation, all in
    whole-stage codegen (zip_with / aggregate higher-order functions).
    Initialized from :func:`pivot_mds` (the reference seeds from a cheap
    base layout the same way) unless ``init`` (id, coords) is given.
    """
    from icebug_spark.plans.iterate import checkpoint

    eu = edges_undirected.select("src", "dst")
    eu = (
        eu.union(eu.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    x = init if init is not None else pivot_mds(eu, dim=dim)
    x = x.select("id", F.col("coords").cast("array<double>").alias("coords"))
    x = checkpoint(x)
    n = x.count()
    deg = eu.groupBy(F.col("src").alias("id")).agg(F.count(F.lit(1)).alias("rho"))

    def _norm(a, b):
        return F.sqrt(
            F.greatest(
                F.aggregate(
                    F.zip_with(a, b, lambda p, q: (p - q) * (p - q)),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                ),
                F.lit(1e-18),
            )
        )

    a = alpha
    for it in range(iterations):
        xs = x.select(F.col("id").alias("src"), F.col("coords").alias("xi"))
        xd = x.select(F.col("id").alias("dst"), F.col("coords").alias("xj"))
        # attraction: per-edge target-distance-1 spring toward each neighbor
        att = (
            eu.join(xs, "src")
            .join(xd, "dst")
            .withColumn("nrm", _norm(F.col("xi"), F.col("xj")))
            .select(
                F.col("src").alias("id"),
                F.posexplode(
                    F.zip_with(
                        F.col("xi"),
                        F.col("xj"),
                        lambda p, q: q + (p - q) / F.col("nrm"),
                    )
                ).alias("comp", "contrib"),
            )
            .groupBy("id", "comp")
            .agg(F.sum("contrib").alias("att"), F.count(F.lit(1)).alias("rho"))
        )
        # repulsion: deterministic hash sample S, broadcast to every node
        samp = (
            x.withColumn("h", F.xxhash64(F.lit(seed + it), "id"))
            .orderBy("h", "id")
            .limit(sample_size)
            .select(F.col("id").alias("sid"), F.col("coords").alias("xj"))
        )
        rep = (
            x.crossJoin(F.broadcast(samp))
            .where(F.col("id") != F.col("sid"))
            .withColumn("nrm", _norm(F.col("coords"), F.col("xj")))
            .select(
                "id",
                F.posexplode(
                    F.zip_with(
                        F.col("coords"),
                        F.col("xj"),
                        lambda p, q: (p - q) / F.col("nrm"),
                    )
                ).alias("comp", "rc"),
            )
            .groupBy("id", "comp")
            .agg(F.sum("rc").alias("rep"), F.count(F.lit(1)).alias("cnt"))
        )
        upd = (
            att.join(rep, ["id", "comp"], "left")
            .select(
                "id",
                "comp",
                (
                    F.col("att") / F.col("rho")
                    + F.lit(a)
                    / F.col("rho")
                    * (F.lit(float(n)) / F.greatest("cnt", F.lit(1)))
                    * F.coalesce("rep", F.lit(0.0))
                ).alias("xc"),
            )
            .groupBy("id")
            .agg(
                F.array_sort(F.collect_list(F.struct("comp", "xc"))).alias("s")
            )
            .select("id", F.transform("s", lambda t: t["xc"]).alias("coords"))
        )
        # isolated nodes (no incident edges) keep their coordinates
        x = checkpoint(
            upd.unionByName(x.join(deg, "id", "left_anti"))
        )
        a *= alpha_decay
    return x.select("id", F.transform("coords", lambda v: F.round(v, 6)).alias("coords"))


def layout_stress(edges_undirected: DataFrame, coords: DataFrame) -> float:
    """Σ_{(i,j)∈E} (‖x_i−x_j‖ − 1)² — the neighbor-stress objective
    MaxentStress minimizes (evaluation helper for tests/benchmarks)."""
    eu = edges_undirected.select("src", "dst")
    eu = eu.union(eu.select(F.col("dst").alias("src"), F.col("src").alias("dst"))).distinct()
    xs = coords.select(F.col("id").alias("src"), F.col("coords").alias("xi"))
    xd = coords.select(F.col("id").alias("dst"), F.col("coords").alias("xj"))
    d = (
        eu.join(xs, "src")
        .join(xd, "dst")
        .select(
            F.sqrt(
                F.aggregate(
                    F.zip_with("xi", "xj", lambda p, q: (p - q) * (p - q)),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                )
            ).alias("nrm")
        )
    )
    row = d.agg(F.sum(F.pow(F.col("nrm") - 1.0, 2)).alias("s")).collect()[0]
    return float(row["s"] or 0.0) / 2.0  # both directions present
