"""Triangle counting and clustering coefficients.

Parity targets: reference ``centrality/LocalClusteringCoefficient.hpp:18``,
``global/ClusteringCoefficient.hpp:18``, triangle edge scores
(``edgescores/TriangleEdgeScore.hpp:28``).

Strategy (scale-first): canonicalize the undirected edge set to u < v,
enumerate wedges by joining on the middle node, close with a semi-join
against the canonical edge set. With degree-ordered orientation the wedge
join is O(sum deg^{3/2}) — the standard distributed triangle algorithm.
For the t2 oracle queries we keep id-ordered orientation (u<v<w) so the
SQL twin is textually obvious; degree-ordered orientation is a drop-in
(order by (degree, id)) when hub skew demands it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def canonical_edges(edges_undirected: DataFrame) -> DataFrame:
    """Undirected edge set as u < v rows (self-loops dropped)."""
    e = edges_undirected.select("src", "dst")
    return (
        e.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
        )
        .distinct()
    )


def triangles(edges_undirected: DataFrame) -> DataFrame:
    """All triangles as (a, b, c) with a < b < c."""
    c = canonical_edges(edges_undirected)
    e1 = c.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = c.select(F.col("u").alias("b"), F.col("v").alias("c"))
    wedges = e1.join(e2, "b").select("a", "b", "c")
    closing = c.select(F.col("u").alias("a"), F.col("v").alias("c"))
    return wedges.join(closing, ["a", "c"], "leftsemi").select("a", "b", "c")


def triangle_count(edges_undirected: DataFrame) -> DataFrame:
    """Single row (n_triangles BIGINT)."""
    return triangles(edges_undirected).agg(
        F.count(F.lit(1)).alias("n_triangles")
    )


def node_triangle_counts(edges_undirected: DataFrame) -> DataFrame:
    """(id, n_tri): triangles incident to each node."""
    t = triangles(edges_undirected)
    nodes = (
        t.select(F.col("a").alias("id"))
        .union(t.select(F.col("b").alias("id")))
        .union(t.select(F.col("c").alias("id")))
    )
    return nodes.groupBy("id").agg(F.count(F.lit(1)).alias("n_tri"))


def local_clustering_coefficient(edges_undirected: DataFrame) -> DataFrame:
    """(id, lcc) for nodes with degree >= 2, lcc = 2*tri / (deg*(deg-1)).

    Degree = distinct-neighbor count on the symmetrized view (matches the
    reference's simple-graph assumption)."""
    deg = (
        canonical_edges(edges_undirected)
        .select(F.col("u").alias("id"))
        .union(canonical_edges(edges_undirected).select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    tri = node_triangle_counts(edges_undirected)
    return (
        deg.where(F.col("deg") >= 2)
        .join(tri, "id", "left")
        .select(
            "id",
            F.round(
                F.lit(2.0)
                * F.coalesce(F.col("n_tri"), F.lit(0)).cast("double")
                / (F.col("deg") * (F.col("deg") - 1)).cast("double"),
                6,
            ).alias("lcc"),
        )
    )
