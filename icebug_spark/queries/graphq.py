"""Declared graph query set Q18-Q28 + iterative-algorithm queries
(SURVEY.md §2.18) on the derived customer→supplier graph
E := DISTINCT (o_custkey, l_suppkey), EU := E ∪ reverse(E).

Each query exercises a real operator from the engine's graph modules and
has a DuckDB SQL twin (recursive CTEs for the iterative ones). Reference
parity pointers are in the operator modules' docstrings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from icebug_spark.catalog import (
    derived_edges_undirected,
    E_SQL,
    EU_SQL,
    EW_SQL,
    derived_edges,
    derived_weighted_edges,
    symmetrize,
)
from icebug_spark.operators import centrality, components, kcore, linkpred, traversal, triangles


def _adj_from_E(e: DataFrame) -> DataFrame:
    """Customer-side adjacency (node=customer, nbr=supplier)."""
    return e.select(F.col("src").alias("node"), F.col("dst").alias("nbr"))


# Q18 — out/in/total degree per node (DegreeCentrality parity).
def q18(spark: SparkSession, sf: str) -> DataFrame:
    # first E consumer in the headline set: materialize the artifact so
    # q21/q24/q27/... scan it instead of re-running orders⋈lineitem
    e = derived_edges(spark, sf, materialize=True)
    out = centrality.degree_centrality(e, "out").withColumnRenamed("degree", "out_degree")
    inn = centrality.degree_centrality(e, "in").withColumnRenamed("degree", "in_degree")
    return (
        out.join(inn, "id", "full")
        .select(
            F.col("id").alias("node"),
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
            (
                F.coalesce("out_degree", F.lit(0)) + F.coalesce("in_degree", F.lit(0))
            ).alias("degree"),
        )
    )


Q18_SQL = f"""
WITH e AS ({E_SQL}),
o AS (SELECT src AS node, COUNT(*) AS out_degree FROM e GROUP BY src),
i AS (SELECT dst AS node, COUNT(*) AS in_degree FROM e GROUP BY dst)
SELECT COALESCE(o.node, i.node) AS node,
       COALESCE(out_degree, 0) AS out_degree,
       COALESCE(in_degree, 0) AS in_degree,
       COALESCE(out_degree, 0) + COALESCE(in_degree, 0) AS degree
FROM o FULL JOIN i ON o.node = i.node
"""


# Q19 — weighted degree (edge multiplicity as weight; weightedDegree parity).
def q19(spark: SparkSession, sf: str) -> DataFrame:
    ew = derived_weighted_edges(spark, sf)
    out = ew.groupBy(F.col("src").alias("node")).agg(
        F.sum("weight").alias("w_out_degree")
    )
    inn = ew.groupBy(F.col("dst").alias("node")).agg(
        F.sum("weight").alias("w_in_degree")
    )
    return (
        out.join(inn, "node", "full")
        .select(
            "node",
            F.coalesce("w_out_degree", F.lit(0.0)).alias("w_out_degree"),
            F.coalesce("w_in_degree", F.lit(0.0)).alias("w_in_degree"),
        )
    )


Q19_SQL = f"""
WITH ew AS ({EW_SQL}),
o AS (SELECT src AS node, SUM(weight) AS w_out_degree FROM ew GROUP BY src),
i AS (SELECT dst AS node, SUM(weight) AS w_in_degree FROM ew GROUP BY dst)
SELECT COALESCE(o.node, i.node) AS node,
       COALESCE(w_out_degree, 0.0) AS w_out_degree,
       COALESCE(w_in_degree, 0.0) AS w_in_degree
FROM o FULL JOIN i ON o.node = i.node
"""


_PAIR_CAP = 200  # deterministic candidate subset for pairwise queries


def _pair_filter(col):
    return col < _PAIR_CAP


# Q20 — common-neighbor counts (CommonNeighborsIndex parity).
def q20(spark: SparkSession, sf: str) -> DataFrame:
    adj = _adj_from_E(derived_edges(spark, sf))
    return linkpred.common_neighbors(adj, _pair_filter)


Q20_SQL = f"""
WITH e AS ({E_SQL})
SELECT a.src AS u, b.src AS v, COUNT(*) AS common_neighbors
FROM e a JOIN e b ON a.dst = b.dst AND a.src < b.src
WHERE a.src < {_PAIR_CAP} AND b.src < {_PAIR_CAP}
GROUP BY a.src, b.src
"""


# Q21 — Jaccard index (JaccardIndex / JaccardDistance parity).
def q21(spark: SparkSession, sf: str) -> DataFrame:
    adj = _adj_from_E(derived_edges(spark, sf, materialize=True))
    return linkpred.jaccard_index(adj, _pair_filter)


Q21_SQL = f"""
WITH e AS ({E_SQL}),
deg AS (SELECT src AS node, COUNT(*) AS deg FROM e GROUP BY src),
cn AS (
  SELECT a.src AS u, b.src AS v, COUNT(*) AS c
  FROM e a JOIN e b ON a.dst = b.dst AND a.src < b.src
  WHERE a.src < {_PAIR_CAP} AND b.src < {_PAIR_CAP}
  GROUP BY a.src, b.src
)
SELECT u, v, ROUND(CAST(c AS DOUBLE) / CAST(du.deg + dv.deg - c AS DOUBLE), 6) AS jaccard
FROM cn JOIN deg du ON du.node = cn.u JOIN deg dv ON dv.node = cn.v
"""


# Q22 — Adamic-Adar (AdamicAdarIndex parity; commons with deg >= 2).
def q22(spark: SparkSession, sf: str) -> DataFrame:
    adj = _adj_from_E(derived_edges(spark, sf))
    return linkpred.adamic_adar(adj, _pair_filter)


Q22_SQL = f"""
WITH e AS ({E_SQL}),
indeg AS (SELECT dst AS n, COUNT(*) AS dn FROM e GROUP BY dst)
SELECT u, v, ROUND(SUM(1.0 / LN(CAST(dn AS DOUBLE))), 6) AS adamic_adar
FROM (
  SELECT a.src AS u, b.src AS v, a.dst AS n
  FROM e a JOIN e b ON a.dst = b.dst AND a.src < b.src
  WHERE a.src < {_PAIR_CAP} AND b.src < {_PAIR_CAP}
) p JOIN indeg USING (n)
WHERE dn >= 2
GROUP BY u, v
"""


# Q23 — preferential attachment (PreferentialAttachmentIndex parity).
def q23(spark: SparkSession, sf: str) -> DataFrame:
    adj = _adj_from_E(derived_edges(spark, sf))
    return linkpred.preferential_attachment(adj, _pair_filter)


Q23_SQL = f"""
WITH e AS ({E_SQL}),
deg AS (SELECT src AS node, COUNT(*) AS deg FROM e
        WHERE src < {_PAIR_CAP} GROUP BY src)
SELECT a.node AS u, b.node AS v, a.deg * b.deg AS pref_attach
FROM deg a JOIN deg b ON a.node < b.node
"""


# Q24 — triangle count on EU (ClusteringCoefficient/TriangleEdgeScore parity).
def q24(spark: SparkSession, sf: str) -> DataFrame:
    # canonical_edges(E) ≡ canonical_edges(EU): least/greatest collapses
    # both orientations, so the symmetrize union+distinct is skipped.
    # The canonical set AND the oriented-adjacency kernel are the
    # session-memoized C / kernel artifacts — q24/q25 (and a cluster's
    # whole triangle family) share one build of each.
    from icebug_spark.catalog import derived_canonical_edges, derived_triangle_kernel

    e = derived_edges(spark, sf, materialize=True)
    return triangles.triangle_count(
        e,
        canon=derived_canonical_edges(spark, sf),
        kernel=derived_triangle_kernel(spark, sf),
    )


Q24_SQL = f"""
WITH eu AS ({EU_SQL}),
c AS (SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
      FROM eu WHERE src <> dst)
SELECT COUNT(*) AS n_triangles
FROM c e1 JOIN c e2 ON e1.v = e2.u JOIN c e3 ON e3.u = e1.u AND e3.v = e2.v
"""


# Q25 — local clustering coefficient (LocalClusteringCoefficient parity).
def q25(spark: SparkSession, sf: str) -> DataFrame:
    from icebug_spark.catalog import derived_canonical_edges, derived_triangle_kernel

    e = derived_edges(spark, sf, materialize=True)
    return triangles.local_clustering_coefficient(
        e,
        canon=derived_canonical_edges(spark, sf),
        kernel=derived_triangle_kernel(spark, sf),
    )


Q25_SQL = f"""
WITH eu AS ({EU_SQL}),
c AS (SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
      FROM eu WHERE src <> dst),
deg AS (
  SELECT id, COUNT(*) AS deg FROM (
    SELECT u AS id FROM c UNION ALL SELECT v AS id FROM c
  ) GROUP BY id
),
tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM c e1 JOIN c e2 ON e1.v = e2.u JOIN c e3 ON e3.u = e1.u AND e3.v = e2.v
),
ntri AS (
  SELECT id, COUNT(*) AS n_tri FROM (
    SELECT a AS id FROM tri UNION ALL SELECT b AS id FROM tri
    UNION ALL SELECT c AS id FROM tri
  ) GROUP BY id
)
SELECT deg.id AS id,
       ROUND(2.0 * CAST(COALESCE(n_tri, 0) AS DOUBLE)
             / CAST(deg * (deg - 1) AS DOUBLE), 6) AS lcc
FROM deg LEFT JOIN ntri ON deg.id = ntri.id
WHERE deg >= 2
"""


# Q26 — 2-hop reachable-set sizes (Volume / neighborhood function parity).
def q26(spark: SparkSession, sf: str) -> DataFrame:
    eu = derived_edges_undirected(spark, sf)
    return traversal.k_hop_neighborhood_sizes(eu, 2, node_filter=lambda c: c < 100)


Q26_SQL = f"""
WITH eu AS ({EU_SQL}),
hop1 AS (SELECT src AS u, dst AS w FROM eu WHERE src < 100),
hop2 AS (SELECT h.u, e.dst AS w FROM hop1 h JOIN eu e ON e.src = h.w)
SELECT u AS id, COUNT(DISTINCT w) AS reach
FROM (SELECT u, w FROM hop1 UNION SELECT u, w FROM hop2)
WHERE w <> u
GROUP BY u
"""


# Q27 — degree assortativity (Assortativity parity; exact integer sums).
def q27(spark: SparkSession, sf: str) -> DataFrame:
    eu = derived_edges_undirected(spark, sf)
    return linkpred.degree_assortativity(eu)


Q27_SQL = f"""
WITH eu AS ({EU_SQL}),
deg AS (SELECT src AS id, COUNT(*) AS deg FROM eu GROUP BY src),
p AS (
  SELECT dx.deg AS dx, dy.deg AS dy
  FROM eu JOIN deg dx ON dx.id = eu.src JOIN deg dy ON dy.id = eu.dst
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(dx) AS BIGINT) AS sx,
         CAST(SUM(dy) AS BIGINT) AS sy, CAST(SUM(dx * dy) AS BIGINT) AS sxy,
         CAST(SUM(dx * dx) AS BIGINT) AS sxx, CAST(SUM(dy * dy) AS BIGINT) AS syy
  FROM p
)
SELECT ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
             / (SQRT(CAST(n * sxx - sx * sx AS DOUBLE))
                * SQRT(CAST(n * syy - sy * sy AS DOUBLE))), 6) AS assortativity
FROM s
"""


# Q28 — connected components of EU (ConnectedComponents parity; oracle is
# a recursive min-label propagation, engine is the iterative operator).
def q28(spark: SparkSession, sf: str) -> DataFrame:
    eu = derived_edges_undirected(spark, sf)
    comp = components.connected_components(eu)
    return components.component_sizes(comp).select(
        F.col("component").alias("component_min_id"), F.col("size")
    )


Q28_SQL = f"""
WITH RECURSIVE eu AS ({EU_SQL}),
reach(node, label) AS (
  SELECT src, src FROM eu
  UNION
  SELECT eu.dst, r.label FROM reach r JOIN eu ON eu.src = r.node
  WHERE r.label < eu.dst
)
SELECT component_min_id, COUNT(*) AS size
FROM (SELECT node, MIN(label) AS component_min_id FROM reach GROUP BY node)
GROUP BY component_min_id
"""


# q29 — PageRank, 15 iterations, damping 0.85, NO_SINK_HANDLING
# (reference centrality/PageRank.hpp:49 SinkHandling; oracle = recursive
# CTE mirroring the same fixed-point iteration).
_PR_ITER = 15
_PR_DAMP = 0.85


def q29(spark: SparkSession, sf: str) -> DataFrame:
    e = derived_edges(spark, sf, materialize=True)
    pr = centrality.pagerank(e, damping=_PR_DAMP, max_iter=_PR_ITER, distribute_sinks=False)
    return pr.select("id", F.round("pagerank", 6).alias("pagerank"))


Q29_SQL = f"""
WITH RECURSIVE e AS ({E_SQL}),
nodes AS (SELECT DISTINCT id FROM
          (SELECT src AS id FROM e UNION ALL SELECT dst AS id FROM e)),
nd AS (
  SELECT n.id, d.outdeg
  FROM nodes n LEFT JOIN (
    SELECT src AS id, CAST(COUNT(*) AS DOUBLE) AS outdeg FROM e GROUP BY src
  ) d USING (id)
),
nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
pr(iter, id, rank) AS (
  SELECT 0, id, 1.0 / (SELECT n FROM nn) FROM nd
  UNION ALL
  SELECT it.iter + 1, nd.id,
         (1 - {_PR_DAMP}) / (SELECT n FROM nn)
         + {_PR_DAMP} * COALESCE(c.contrib, 0.0)
  FROM (SELECT DISTINCT iter FROM pr WHERE iter < {_PR_ITER}) it
  CROSS JOIN nd
  LEFT JOIN (
    SELECT e.dst AS id, SUM(p.rank / nd2.outdeg) AS contrib
    FROM pr p JOIN nd nd2 ON nd2.id = p.id AND nd2.outdeg IS NOT NULL
              JOIN e ON e.src = p.id
    WHERE p.iter < {_PR_ITER}
    GROUP BY e.dst
  ) c ON c.id = nd.id
)
SELECT id, ROUND(rank, 6) AS pagerank FROM pr WHERE iter = {_PR_ITER}
"""


# q30 — BFS hop distances from node 0 on EU (distance/BFS.hpp parity;
# oracle = recursive CTE min-over-paths).
def q30(spark: SparkSession, sf: str) -> DataFrame:
    eu = derived_edges_undirected(spark, sf)
    d = traversal.bfs_distances(eu, source=0, max_hops=20)
    return d.select("id", F.col("dist").cast("long").alias("dist"))


Q30_SQL = f"""
WITH RECURSIVE eu AS ({EU_SQL}),
b(id, dist) AS (
  SELECT CAST(0 AS BIGINT), 0
  UNION
  SELECT eu.dst, b.dist + 1 FROM b JOIN eu ON eu.src = b.id WHERE b.dist < 20
)
SELECT id, CAST(MIN(dist) AS BIGINT) AS dist FROM b GROUP BY id
"""


# q31 — k-core membership, k=5 (CoreDecomposition parity,
# centrality/CoreDecomposition.hpp:26). The k-core is the UNIQUE maximal
# subgraph with min degree ≥ k, so peeling is oracle-expressible: deletes
# aren't monotone-recursive, but a fixed unroll of "drop nodes with
# degree < k within the survivor subgraph" converges (each round shrinks;
# _KCORE_ROUNDS is far past fixpoint for these graphs — the last rounds
# are no-ops once converged, verified by the round-(R-1) == round-R test).
_KCORE_K = 5
_KCORE_ROUNDS = 15


def _kcore_peel_sql(k: int, rounds: int) -> str:
    parts = ["c0 AS MATERIALIZED (SELECT src, dst FROM eu)"]
    for i in range(1, rounds + 1):
        parts.append(
            f"k{i} AS MATERIALIZED (SELECT src FROM c{i-1} GROUP BY src HAVING COUNT(*) >= {k})"
        )
        parts.append(
            f"c{i} AS MATERIALIZED (SELECT c.src, c.dst FROM c{i-1} c "
            f"JOIN k{i} a ON a.src = c.src JOIN k{i} b ON b.src = c.dst)"
        )
    return ",\n".join(parts)


def q31(spark: SparkSession, sf: str) -> DataFrame:
    eu = derived_edges_undirected(spark, sf)
    return kcore.k_core(eu, k=_KCORE_K).orderBy("id")


Q31_SQL = f"""
WITH eu AS MATERIALIZED ({EU_SQL}),
{_kcore_peel_sql(_KCORE_K, _KCORE_ROUNDS)}
SELECT DISTINCT src AS id FROM c{_KCORE_ROUNDS}
"""


GRAPH = {
    "q18_degrees": (q18, Q18_SQL),
    "q19_weighted_degrees": (q19, Q19_SQL),
    "q20_common_neighbors": (q20, Q20_SQL),
    "q21_jaccard": (q21, Q21_SQL),
    "q22_adamic_adar": (q22, Q22_SQL),
    "q23_pref_attachment": (q23, Q23_SQL),
    "q24_triangle_count": (q24, Q24_SQL),
    "q25_local_clustering": (q25, Q25_SQL),
    "q26_two_hop_reach": (q26, Q26_SQL),
    "q27_assortativity": (q27, Q27_SQL),
    "q28_connected_components": (q28, Q28_SQL),
    "q29_pagerank": (q29, Q29_SQL),
    "q30_bfs_from_0": (q30, Q30_SQL),
    "q31_kcore_k5": (q31, Q31_SQL),
}
