"""Centrality operators: degree, PageRank, eigenvector/Katz-style loops.

Parity targets: reference ``centrality/DegreeCentrality.hpp:20``,
``centrality/PageRank.hpp:38-90`` (damping, tolerance, L1/L2 norm,
DISTRIBUTE_SINKS handling), ``centrality/EigenvectorCentrality.hpp:20``,
``centrality/KatzCentrality.hpp:29``, ``centrality/HarmonicCloseness.hpp:18``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from icebug_spark.plans.iterate import iterate, mirror


def degree_centrality(edges: DataFrame, direction: str = "out") -> DataFrame:
    """(id, degree). One groupBy — map-side combine, single shuffle."""
    key = "src" if direction == "out" else "dst"
    return edges.groupBy(F.col(key).alias("id")).agg(
        F.count(F.lit(1)).alias("degree")
    )


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    max_iter: int = 15,
    distribute_sinks: bool = True,
    tol: float = 0.0,
    norm: str = "l1",
) -> DataFrame:
    """PageRank over a directed edge DataFrame → ``(id, pagerank)``.

    Semantics follow reference ``centrality/PageRank.hpp:49``
    SinkHandling::DISTRIBUTE_SINKS: each iteration the aggregate rank held
    by out-degree-0 nodes is spread uniformly, so total rank stays 1.
    ``tol`` > 0 enables the reference's early stop (PageRank.hpp:38-90
    tolerance + norm): iteration ends once ‖rank − rank_prev‖ ≤ tol under
    ``norm`` ∈ {"l1", "l2", "max"}. The default ``tol=0`` runs exactly
    ``max_iter`` rounds (fixed rounds keep the DuckDB oracle expressible).

    Scale notes: per-iteration cost is one join (ranks ⋈ edges, both
    pre-partitioned on the join key by the shuffle of the previous round)
    + one groupBy(dst) with partial aggregation. The edges side is loop
    invariant — on a cluster, persist it partitioned by ``src`` so only the
    (small) rank vector reshuffles each round. Sink sum is folded into the
    update plan (broadcast 1-row cross join); the tolerance check runs only
    at checkpoint boundaries where BOTH rank vectors are already
    materialized, so it costs one n-row scan-and-sum — never a recompute
    of the update and never an extra job on the non-checkpoint rounds.
    """
    e = edges.select("src", "dst")
    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    nodes = nodes.localCheckpoint(eager=True)
    n = nodes.count()
    outdeg = e.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("outdeg")
    )
    # loop-invariant: node → outdeg (null ⇒ sink)
    base = nodes.join(outdeg, "id", "left").localCheckpoint(eager=True)

    ranks = base.withColumn("rank", F.lit(1.0 / n)).withColumn(
        "prev", F.lit(0.0)
    )

    def step(r: DataFrame, _i: int) -> DataFrame:
        msgs = (
            # rank vector is node-bounded (exactly n rows): mirror() keeps
            # the edge table in place while n fits the broadcast cap and
            # degrades to shuffle-hash at 1e9+ nodes (bucket edges by src
            # on a cluster to elide that exchange too).
            e.join(mirror(r.select("id", "rank", "outdeg"), n), e.src == F.col("id"))
            .select(
                F.col("dst").alias("id"),
                (F.col("rank") / F.col("outdeg")).alias("c"),
                F.lit(None).cast("long").alias("outdeg"),
                F.lit(None).cast("double").alias("prev"),
            )
        )
        # Ride the state through the SAME aggregation as the messages (a
        # zero-contribution carrier row per node) instead of joining
        # contribs back onto it: one union feeding the groupBy replaces a
        # per-round n-row state re-shuffle + sort-merge join (3 Exchange +
        # 2 Sort per round → 1 Exchange + 1 broadcast). max(outdeg)/
        # max(prev) recover the carrier's values (message rows are null);
        # nodes with no in-messages sum to the carrier's exact 0.0.
        carrier = r.select(
            "id", F.lit(0.0).alias("c"), "outdeg", F.col("rank").alias("prev")
        )
        out = (
            carrier.unionByName(msgs)
            .groupBy("id")
            .agg(
                F.sum("c").alias("contrib"),
                F.max("outdeg").alias("outdeg"),
                F.max("prev").alias("prev"),
            )
        )
        if distribute_sinks:
            # Fold the sink aggregate into the plan (broadcast 1-row cross
            # join) instead of collect()ing it — one Spark action per
            # checkpoint instead of two per round; at cluster scale each
            # avoided action is a full job submission.
            sink = r.where(F.col("outdeg").isNull()).agg(
                F.coalesce(F.sum("rank"), F.lit(0.0)).alias("sink_sum")
            )
            out = out.crossJoin(F.broadcast(sink))
            sink_term = F.col("sink_sum") / n
        else:
            sink_term = F.lit(0.0)
        return out.select(
            "id",
            "outdeg",
            (
                F.lit((1.0 - damping) / n)
                + F.lit(damping) * (F.col("contrib") + sink_term)
            ).alias("rank"),
            "prev",
        )

    observe = observed_converged = None
    if tol > 0.0:
        if norm not in ("l1", "l2", "max"):
            raise ValueError("norm must be one of l1, l2, max")

        def observe():
            # the delta norm rides each checkpoint's materializing action
            # as an observed metric (iterate only evaluates it at
            # checkpoint boundaries, where (rank, prev) materializes
            # anyway) — zero extra jobs, zero recompute of the lazy
            # in-between rounds
            diff = F.col("rank") - F.col("prev")
            agg = {
                "l1": F.sum(F.abs(diff)),
                "l2": F.sqrt(F.sum(diff * diff)),
                "max": F.max(F.abs(diff)),
            }[norm]
            return [agg.alias("d")]

        def observed_converged(m: dict) -> bool:
            val = m["d"]
            return val is not None and float(val) <= tol

    final = iterate(
        ranks,
        step,
        max_iter,
        checkpoint_every=2,
        observe=observe,
        observed_converged=observed_converged,
    )
    return final.select("id", F.col("rank").alias("pagerank"))


def harmonic_closeness_sampled(
    edges_undirected: DataFrame, sources: list[int], max_hops: int = 10
) -> DataFrame:
    """Harmonic closeness restricted to a source sample
    (reference ``centrality/HarmonicCloseness.hpp:18`` /
    ``ApproxCloseness.hpp:22``): sum(1/dist) from multi-source BFS."""
    from icebug_spark.operators.traversal import multi_source_bfs

    dists = multi_source_bfs(edges_undirected, sources, max_hops)
    return (
        dists.where(F.col("dist") > 0)
        .groupBy(F.col("source").alias("id"))
        .agg(F.sum(F.lit(1.0) / F.col("dist")).alias("harmonic"))
    )
