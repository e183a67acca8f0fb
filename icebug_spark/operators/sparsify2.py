"""Sparsification part 2 — the remaining reference scores and the packaged
``Sparsifiers`` pipelines, as window-rank plans over the canonical edge list.

Parity targets:
- ``sparsification/LocalSimilarityScore.cpp`` run(): per endpoint i, rank
  incident edges by similarity ``tri/(deg(i)+deg(j)-tri)`` desc (ties by
  neighbor id asc — AttributizedEdge::operator<), e = 1-ln(rank)/ln(deg)
  (1.0 when deg==1); per-edge score = max over endpoints.
- ``sparsification/LocalFilterScore.hpp:26`` run(): same shape over an
  arbitrary edge attribute, but ties SHARE a rank (the reference's
  rank+=numSame bookkeeping ≡ SQL ``rank()``), with a logarithmic
  (1-log(rank)/log(d)) and a linear (1-(rank-1)/(d-1)) variant.
- ``sparsification/RandomNodeEdgeScore.cpp`` run(): sequential random edge
  removal mixing uniform picks with node-then-incident-edge picks; the
  score is the normalized removal time. Re-expressed declaratively as an
  exponential race (see docstring — documented approximation).
- ``sparsification/Sparsifiers.cpp`` — six score→GlobalThresholdFilter
  compositions (SimmelianNonParametric / SimmelianParametric / Multiscale /
  LocalSimilarity / SimmelianMultiscale / Random).

Scale notes: every score is a per-endpoint window over the adjacency —
one shuffle on the endpoint key, hub skew absorbed by AQE; triangle
counts reuse the degree-ordered enumeration from ``triangles.py`` (bounded
by m^1.5, no cartesian). Nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from icebug_spark.operators.edgescores import (
    _degrees,
    edge_triangle_count,
    global_threshold_filter,
    multiscale_score,
    prefix_jaccard_score,
    random_edge_score,
    simmelian_overlap_score,
)
from icebug_spark.operators.triangles import canonical_edges


def local_similarity_score(edges_undirected: DataFrame) -> DataFrame:
    """LocalSimilarityScore: minimum sparsification exponent per edge.

    Per edge (u,v): sim = tri(u,v) / (deg(u)+deg(v)-tri(u,v)). Per endpoint
    i, neighbors are ordered by (sim desc, neighbor id asc) — a strict
    total order, so ``row_number`` (the reference ranks ties apart, unlike
    LocalFilterScore). e = 1 - ln(rank)/ln(deg(i)) for deg>1, else 1.0;
    the edge keeps the max of its two endpoint exponents.
    Output: (u, v, ls_score) rounded 6dp.
    """
    te = edge_triangle_count(edges_undirected).localCheckpoint(eager=True)
    deg = _degrees(te)
    sim = (
        te.join(deg.select(F.col("id").alias("u"), F.col("deg").alias("du")), "u")
        .join(deg.select(F.col("id").alias("v"), F.col("deg").alias("dv")), "v")
        .select(
            "u",
            "v",
            "du",
            "dv",
            (
                F.col("n_tri").cast("double")
                / (F.col("du") + F.col("dv") - F.col("n_tri")).cast("double")
            ).alias("sim"),
        )
    )
    adj = sim.select(
        F.col("u").alias("node"), F.col("v").alias("nbr"), F.col("du").alias("d"), "sim"
    ).union(
        sim.select(
            F.col("v").alias("node"), F.col("u").alias("nbr"), F.col("dv").alias("d"), "sim"
        )
    )
    w = Window.partitionBy("node").orderBy(F.col("sim").desc(), F.col("nbr"))
    scored = adj.withColumn("rank", F.row_number().over(w)).select(
        "node",
        "nbr",
        F.when(
            F.col("d") > 1,
            1.0 - F.log(F.col("rank").cast("double")) / F.log(F.col("d").cast("double")),
        )
        .otherwise(F.lit(1.0))
        .alias("e"),
    )
    return (
        scored.select(
            F.least("node", "nbr").alias("u"), F.greatest("node", "nbr").alias("v"), "e"
        )
        .groupBy("u", "v")
        .agg(F.round(F.max("e"), 6).alias("ls_score"))
    )


def local_filter_score(
    edges_scored: DataFrame, score_col: str = "score", logarithmic: bool = True
) -> DataFrame:
    """LocalFilterScore<InType>: local rank filter over any edge attribute.

    Input: canonical (u, v, <score_col>). Per endpoint, edges are ranked by
    attribute desc with ties SHARING the minimum rank (reference
    rank+=numSame ≡ SQL ``rank()``); exponent e = 1-log(rank)/log(d)
    (logarithmic) or 1-(rank-1)/(d-1) (linear), 1.0 when d==1; per-edge
    score = max over both endpoints. Output (u, v, lf_score) rounded 6dp.
    """
    e = edges_scored.select("u", "v", F.col(score_col).alias("s"))
    adj = e.select(F.col("u").alias("node"), F.col("v").alias("nbr"), "s").union(
        e.select(F.col("v").alias("node"), F.col("u").alias("nbr"), "s")
    )
    wd = Window.partitionBy("node")
    w = wd.orderBy(F.col("s").desc())
    ranked = adj.select(
        "node", "nbr", F.rank().over(w).alias("rank"), F.count(F.lit(1)).over(wd).alias("d")
    )
    if logarithmic:
        expo = 1.0 - F.log(F.col("rank").cast("double")) / F.log(F.col("d").cast("double"))
    else:
        expo = 1.0 - (F.col("rank") - 1).cast("double") / (F.col("d") - 1).cast("double")
    scored = ranked.select(
        "node", "nbr", F.when(F.col("d") > 1, expo).otherwise(F.lit(1.0)).alias("e")
    )
    return (
        scored.select(
            F.least("node", "nbr").alias("u"), F.greatest("node", "nbr").alias("v"), "e"
        )
        .groupBy("u", "v")
        .agg(F.round(F.max("e"), 6).alias("lf_score"))
    )


def random_node_edge_score(
    edges_undirected: DataFrame, rne_ratio: float = 0.5, seed: int = 42
) -> DataFrame:
    """RandomNodeEdgeScore, re-expressed as a static exponential race.

    The reference removes edges one at a time — with probability
    (1-rneRatio) a uniformly random surviving edge, else a random node's
    random incident edge — and scores each edge by its normalized removal
    time. That loop is inherently sequential (each step depends on the
    surviving graph), so the Spark plan uses the standard static
    equivalent: each edge's per-step removal hazard under the mixture is
    proportional to ``(1-r)/m + (r/n)*(1/deg(u)+1/deg(v))``; drawing
    t_e = -ln(U_e)/hazard_e and ranking by t ascending reproduces the
    removal order in distribution for the memoryless approximation
    (documented divergence: the true process renormalizes over survivors,
    which perturbs late-order statistics only). Score = (rank-1)/m in
    [0,1), matching the reference's numRemoved/m encoding.
    """
    c = canonical_edges(edges_undirected).localCheckpoint(eager=True)
    deg = _degrees(c)
    counts = c.agg(
        F.count(F.lit(1)).alias("m"),
    ).crossJoin(deg.agg(F.count(F.lit(1)).alias("n")))
    u01 = (
        (F.pmod(F.xxhash64("u", "v", F.lit(seed)), F.lit(1_000_000_007)) + 1).cast("double")
        / 1_000_000_008.0
    )
    hazard = (
        F.lit(1.0 - rne_ratio) / F.col("m")
        + F.lit(rne_ratio) / F.col("n") * (1.0 / F.col("du") + 1.0 / F.col("dv"))
    )
    timed = (
        c.join(deg.select(F.col("id").alias("u"), F.col("deg").alias("du")), "u")
        .join(deg.select(F.col("id").alias("v"), F.col("deg").alias("dv")), "v")
        .crossJoin(F.broadcast(counts))
        .select("u", "v", "m", (-F.log(u01) / hazard).alias("t"))
    )
    # normalized global rank of the exponential arrival times — two-pass
    # zipWithIndex instead of an all-edges single-partition window ((t,u,v)
    # is unique: t is a continuous hash draw, (u,v) canonical)
    from icebug_spark.plans.zipindex import dense_index

    ranked = dense_index(timed, ["t", "u", "v", "m"], out="rn", assume_distinct=True)
    return ranked.select(
        "u",
        "v",
        F.round(F.col("rn").cast("double") / F.col("m"), 9).alias("rne_score"),
    )


# --- packaged Sparsifiers (Sparsifiers.cpp) -------------------------------
# Each returns the KEPT canonical edge subset (u, v [, score]).


def simmelian_sparsifier_non_parametric(
    edges_undirected: DataFrame, threshold: float = 0.5, k: int = 10
) -> DataFrame:
    """SimmelianSparsifierNonParametric: triangle counts → prefix-Jaccard
    score → keep score >= threshold."""
    te = edge_triangle_count(edges_undirected)
    pj = prefix_jaccard_score(te, score_col="n_tri", k=k)
    return global_threshold_filter(pj, "pj_score", threshold, above=True)


def simmelian_sparsifier_parametric(
    edges_undirected: DataFrame, max_rank: int = 10, min_overlap: int = 5
) -> DataFrame:
    """SimmelianSparsifierParametric: triangle-ranked overlap → keep
    overlap >= minOverlap."""
    ov = simmelian_overlap_score(edges_undirected, max_rank=max_rank)
    return global_threshold_filter(ov, "overlap", float(min_overlap), above=True)


def multiscale_sparsifier(
    edges_weighted_undirected: DataFrame, alpha: float = 0.5
) -> DataFrame:
    """MultiscaleSparsifier: disparity-filter probability on edge weights,
    keep prob >= alpha."""
    ms = multiscale_score(edges_weighted_undirected)
    return global_threshold_filter(ms, "ms_score", alpha, above=True)


def local_similarity_sparsifier(
    edges_undirected: DataFrame, e: float = 0.5
) -> DataFrame:
    """LocalSimilaritySparsifier: keep edges whose minimum sparsification
    exponent >= e."""
    ls = local_similarity_score(edges_undirected)
    return global_threshold_filter(ls, "ls_score", e, above=True)


def simmelian_multiscale_sparsifier(
    edges_undirected: DataFrame, alpha: float = 0.5
) -> DataFrame:
    """SimmelianMultiscaleSparsifier: disparity filter applied to per-edge
    triangle counts (as weights), keep prob >= alpha."""
    te = edge_triangle_count(edges_undirected)
    ms = multiscale_score(
        te.select(
            F.col("u").alias("src"),
            F.col("v").alias("dst"),
            F.col("n_tri").cast("double").alias("weight"),
        )
    )
    return global_threshold_filter(ms, "ms_score", alpha, above=True)


def random_sparsifier(
    edges_undirected: DataFrame, ratio: float = 0.5, seed: int = 42
) -> DataFrame:
    """RandomSparsifier: uniform random score, keep score >= ratio."""
    rs = random_edge_score(edges_undirected, seed=seed)
    return global_threshold_filter(rs, "rand_score", ratio, above=True)
