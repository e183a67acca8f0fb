"""Minimum/maximum spanning forest via distributed Borůvka rounds.

Parity targets: reference ``graph/KruskalMSF.hpp:21``, ``PrimMSF.hpp:25``,
``RandomMaximumSpanningForest.hpp:18``, ``UnionMaximumSpanningForest.hpp:15``,
``graph/SpanningForest.hpp:20``. Kruskal/Prim are sequential-PQ shaped;
the bulk-synchronous equivalent is Borůvka: every component picks its
minimum outgoing edge, picked edges merge components, repeat — O(log n)
rounds, each one join + one groupBy + a CC-style relabel. This is the
standard scale-out MSF algorithm.

Determinism: ties broken by (weight, src, dst) lexicographic order, so
the forest is unique even with duplicate weights.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def boruvka_msf(
    edges_weighted: DataFrame, maximum: bool = False, max_rounds: int = 40
) -> DataFrame:
    """Minimum (or maximum) spanning forest of an undirected weighted
    graph. Input: one row per undirected edge (either orientation).
    Returns forest edges (src, dst, weight) canonicalized src < dst."""
    sign = -1.0 if maximum else 1.0
    # canonical undirected edges, dedup keeping min weight per pair
    e = (
        edges_weighted.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
            (F.col("weight") * sign).alias("w"),
        )
        .groupBy("u", "v")
        .agg(F.min("w").alias("w"))
        .localCheckpoint(eager=True)
    )
    comp = (
        e.select(F.col("u").alias("id"))
        .union(e.select(F.col("v").alias("id")))
        .distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint(eager=True)
    )
    forest = None
    for _ in range(max_rounds):
        labeled = (
            e.join(comp.select(F.col("id").alias("u"), F.col("comp").alias("cu")), "u")
            .join(comp.select(F.col("id").alias("v"), F.col("comp").alias("cv")), "v")
            .where(F.col("cu") != F.col("cv"))
        ).localCheckpoint(eager=True)
        if labeled.limit(1).count() == 0:
            break
        # min outgoing edge per component (both directions), deterministic
        # tie-break by (w, u, v)
        cand = labeled.select(
            F.col("cu").alias("comp"), "u", "v", "w", "cu", "cv"
        ).union(
            labeled.select(F.col("cv").alias("comp"), "u", "v", "w", "cu", "cv")
        )
        picked = (
            cand.groupBy("comp")
            .agg(F.min(F.struct("w", "u", "v", "cu", "cv")).alias("s"))
            .select(
                F.col("s.u").alias("u"),
                F.col("s.v").alias("v"),
                F.col("s.w").alias("w"),
                F.col("s.cu").alias("cu"),
                F.col("s.cv").alias("cv"),
            )
            .distinct()
            .localCheckpoint(eager=True)
        )
        forest = picked.select("u", "v", "w") if forest is None else forest.union(
            picked.select("u", "v", "w")
        ).distinct()
        # merge components: union-find relabel via min-label propagation on
        # the picked component-merge graph (small: <= #components edges)
        merge = picked.select(F.col("cu").alias("a"), F.col("cv").alias("b"))
        merge = merge.union(merge.select(F.col("b").alias("a"), F.col("a").alias("b")))
        lbl = (
            merge.select(F.col("a").alias("id")).distinct().withColumn("lbl", F.col("id"))
        )
        for _i in range(20):
            msgs = merge.join(lbl.withColumnRenamed("id", "a"), "a").select(
                F.col("b").alias("id"), "lbl"
            )
            new = (
                lbl.select("id", "lbl")
                .union(msgs)
                .groupBy("id")
                .agg(F.min("lbl").alias("lbl"))
                .localCheckpoint(eager=True)
            )
            s_old = lbl.agg(F.sum("lbl")).collect()[0][0]
            s_new = new.agg(F.sum("lbl")).collect()[0][0]
            lbl = new
            if s_old == s_new:
                break
        comp = (
            comp.join(lbl.withColumnRenamed("id", "comp"), "comp", "left")
            .select("id", F.coalesce("lbl", F.col("comp")).alias("comp"))
            .localCheckpoint(eager=True)
        )
    if forest is None:
        return edges_weighted.sparkSession.createDataFrame(
            [], "src long, dst long, weight double"
        )
    return forest.select(
        F.col("u").alias("src"),
        F.col("v").alias("dst"),
        (F.col("w") * sign).alias("weight"),
    )
