"""Edge-score / sparsification / link-pred-2 query entries (q52-q61).

All run on the derived graph (catalog E / EU / EW); every SQL twin
reproduces the formula verbatim so the DuckDB oracle hash-matches.
Pairwise indices reuse the q20 pattern: a deterministic candidate cap
(node id < _PAIR_CAP) keeps the oracle-side join bounded at sf0.01 while
the Spark side is the same operator that scales unbounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from icebug_spark.catalog import (
    derived_edges_undirected,
    EU_SQL,
    EW_SQL,
    derived_edges,
    derived_weighted_edges,
    symmetrize,
)
from icebug_spark.operators import edgescores, linkpred2

_PAIR_CAP = 200


def _pair_filter(col):
    return col < _PAIR_CAP


def _eu(spark: SparkSession, sf: str) -> DataFrame:
    return derived_edges_undirected(spark, sf)


def _adj(spark: SparkSession, sf: str) -> DataFrame:
    """Symmetrized (node, nbr) adjacency of the undirected derived graph."""
    eu = _eu(spark, sf)
    return eu.select(F.col("src").alias("node"), F.col("dst").alias("nbr"))


# canonical undirected adjacency for SQL twins (node, nbr), symmetric
_ADJ_SQL = f"SELECT src AS node, dst AS nbr FROM ({EU_SQL})"
# self-loop-free variant: the canonical-edge scorers (q52/q53/q58) mirror
# canonical_edges(), which drops loops before computing degrees/triangles
_ADJN_SQL = f"SELECT src AS node, dst AS nbr FROM ({EU_SQL}) WHERE src <> dst"
# canonical edges u < v
_CE_SQL = f"SELECT src AS u, dst AS v FROM ({EU_SQL}) WHERE src < dst"
# per-edge triangle count over canonical edges
_TRI_SQL = f"""
ce AS ({_CE_SQL}),
adj AS ({_ADJN_SQL}),
tri AS (
  SELECT ce.u, ce.v, COUNT(a2.nbr) AS n_tri
  FROM ce
  JOIN adj a1 ON a1.node = ce.u
  LEFT JOIN adj a2 ON a2.node = ce.v AND a2.nbr = a1.nbr
  GROUP BY ce.u, ce.v
)"""


# q52 — SCAN structural similarity per edge (SCANStructuralSimilarityScore).
def q52(spark: SparkSession, sf: str) -> DataFrame:
    return edgescores.scan_similarity(_eu(spark, sf))


# NB: Spark's round(double, 6) rounds the SHORTEST-REPR decimal of the
# double (BigDecimal.valueOf), DuckDB's ROUND the exact binary value —
# a quotient whose shortest repr lands exactly on a 7th-digit 5 (e.g.
# 41/640 → "0.0640625", binary value just below the tie) rounds UP in
# Spark and DOWN in DuckDB (observed once in 586k edges at sf0.1). The
# VARCHAR→DECIMAL hop reproduces Spark's semantics exactly; the final
# CAST back to DOUBLE keeps the compared dtype unchanged.
Q52_SQL = f"""
WITH {_TRI_SQL},
deg AS (SELECT node, COUNT(*) AS deg FROM adj GROUP BY node)
SELECT t.u, t.v,
       CAST(ROUND(CAST(CAST(
             CAST(t.n_tri + 1 AS DOUBLE)
             / SQRT(CAST((du.deg + 1) * (dv.deg + 1) AS DOUBLE))
           AS VARCHAR) AS DECIMAL(38,25)), 6) AS DOUBLE) AS scan_sim
FROM tri t JOIN deg du ON du.node = t.u JOIN deg dv ON dv.node = t.v
"""


# q53 — local degree score (LocalDegreeScore sparsification).
def q53(spark: SparkSession, sf: str) -> DataFrame:
    return edgescores.local_degree_score(_eu(spark, sf))


Q53_SQL = f"""
WITH adj AS ({_ADJN_SQL}),
deg AS (SELECT node, COUNT(*) AS deg FROM adj GROUP BY node),
ranked AS (
  SELECT a.node, a.nbr, dn.deg AS dn, d.deg AS d,
         RANK() OVER (PARTITION BY a.node ORDER BY dn.deg DESC) AS rnk
  FROM adj a JOIN deg d ON d.node = a.node JOIN deg dn ON dn.node = a.nbr
),
scored AS (
  SELECT LEAST(node, nbr) AS u, GREATEST(node, nbr) AS v,
         CASE WHEN d > 1 THEN 1.0 - LN(CAST(rnk AS DOUBLE)) / LN(CAST(d AS DOUBLE))
              ELSE 1.0 END AS e
  FROM ranked
)
SELECT u, v, ROUND(MAX(e), 6) AS ld_score FROM scored GROUP BY u, v
"""


# q54 — resource allocation index (ResourceAllocationIndex).
def q54(spark: SparkSession, sf: str) -> DataFrame:
    return linkpred2.resource_allocation(_adj(spark, sf), _pair_filter)


Q54_SQL = f"""
WITH adj AS ({_ADJ_SQL}),
deg AS (SELECT node, COUNT(*) AS dn FROM adj GROUP BY node)
SELECT a.node AS u, b.node AS v,
       ROUND(SUM(1.0 / CAST(deg.dn AS DOUBLE)), 6) AS resource_alloc
FROM adj a
JOIN adj b ON a.nbr = b.nbr AND a.node < b.node
JOIN deg ON deg.node = a.nbr
WHERE a.node < {_PAIR_CAP} AND b.node < {_PAIR_CAP}
GROUP BY a.node, b.node
"""


# q55 — total neighbors + neighborhood distance (TotalNeighborsIndex,
# NeighborhoodDistanceIndex) in one frame.
def q55(spark: SparkSession, sf: str) -> DataFrame:
    adj = _adj(spark, sf)
    tn = linkpred2.total_neighbors(adj, _pair_filter)
    nd = linkpred2.neighborhood_distance(adj, _pair_filter)
    return tn.join(nd, ["u", "v"])


Q55_SQL = f"""
WITH adj AS ({_ADJ_SQL}),
deg AS (SELECT node, COUNT(*) AS deg FROM adj GROUP BY node),
cn AS (
  SELECT a.node AS u, b.node AS v, COUNT(*) AS c
  FROM adj a JOIN adj b ON a.nbr = b.nbr AND a.node < b.node
  WHERE a.node < {_PAIR_CAP} AND b.node < {_PAIR_CAP}
  GROUP BY a.node, b.node
)
SELECT u, v, du.deg + dv.deg - c AS total_neighbors,
       ROUND(CAST(c AS DOUBLE) / SQRT(CAST(du.deg * dv.deg AS DOUBLE)), 6) AS nd_index
FROM cn JOIN deg du ON du.node = cn.u JOIN deg dv ON dv.node = cn.v
"""


# q56 — friends measure (NeighborsMeasureIndex). Tighter cap than the other
# pairwise queries: the cross-neighborhood count fans out Σ deg(x)·deg(y)
# restricted to capped endpoints, i.e. ~cap² work. The adj/cadj CTEs are
# MATERIALIZED and the endpoint filter pre-applied — without that DuckDB
# re-derives adj per reference and joins before filtering (~200 s at
# sf0.01 vs ~3 s materialized).
_FM_CAP = 60


def q56(spark: SparkSession, sf: str) -> DataFrame:
    return linkpred2.neighbors_measure(_adj(spark, sf), lambda c: c < _FM_CAP)


Q56_SQL = f"""
WITH adj AS MATERIALIZED ({_ADJ_SQL}),
cadj AS MATERIALIZED (SELECT node, nbr FROM adj WHERE node < {_FM_CAP}),
cn AS (
  SELECT a.node AS u, b.node AS v, COUNT(*) AS s
  FROM cadj a JOIN cadj b ON a.nbr = b.nbr AND a.node < b.node
  GROUP BY a.node, b.node
),
cross_edges AS (
  SELECT nu.node AS u, nv.node AS v, COUNT(*) AS s
  FROM cadj nu
  JOIN adj arc ON arc.node = nu.nbr
  JOIN cadj nv ON nv.nbr = arc.nbr
  WHERE nu.node < nv.node
  GROUP BY nu.node, nv.node
)
SELECT u, v, CAST(SUM(s) AS BIGINT) AS neighbors_measure
FROM (SELECT * FROM cn UNION ALL SELECT * FROM cross_edges)
GROUP BY u, v
"""


# q57 — adjusted Rand index over neighborhoods (AdjustedRandIndex, published
# formula — see linkpred2 docstring for the reference-implementation note).
def q57(spark: SparkSession, sf: str) -> DataFrame:
    return linkpred2.adjusted_rand_index(_adj(spark, sf), _pair_filter)


Q57_SQL = f"""
WITH adj AS ({_ADJ_SQL}),
deg AS (SELECT node, COUNT(*) AS deg FROM adj GROUP BY node),
n_nodes AS (SELECT COUNT(*) AS n FROM deg),
cn AS (
  SELECT a.node AS u, b.node AS v, COUNT(*) AS c
  FROM adj a JOIN adj b ON a.nbr = b.nbr AND a.node < b.node
  WHERE a.node < {_PAIR_CAP} AND b.node < {_PAIR_CAP}
  GROUP BY a.node, b.node
)
SELECT u, v,
  ROUND(CASE WHEN (a*b + a*c + 2*a*d + b*b + b*d + c*c + c*d) = 0 THEN 0.0
        ELSE 2 * (a*d - b*c) / (a*b + a*c + 2*a*d + b*b + b*d + c*c + c*d) END, 6)
    AS ari_index
FROM (
  SELECT cn.u, cn.v,
         CAST(cn.c AS DOUBLE) AS a,
         CAST(du.deg - cn.c AS DOUBLE) AS b,
         CAST(dv.deg - cn.c AS DOUBLE) AS c,
         CAST(nn.n - (du.deg + dv.deg - cn.c) AS DOUBLE) AS d
  FROM cn
  JOIN deg du ON du.node = cn.u
  JOIN deg dv ON dv.node = cn.v
  CROSS JOIN n_nodes nn
)
"""


# q58 — chance-corrected triangle score (ChanceCorrectedTriangleScore).
def q58(spark: SparkSession, sf: str) -> DataFrame:
    return edgescores.chance_corrected_triangle(_eu(spark, sf))


Q58_SQL = f"""
WITH {_TRI_SQL},
deg AS (SELECT node, COUNT(*) AS deg FROM adj GROUP BY node),
n_nodes AS (SELECT COUNT(*) AS n FROM deg)
SELECT t.u, t.v,
  ROUND(CASE
    WHEN t.n_tri > 0 THEN CAST(t.n_tri * (nn.n - 2) AS DOUBLE)
                          / CAST((du.deg - 1) * (dv.deg - 1) AS DOUBLE)
    WHEN du.deg = 1 OR dv.deg = 1 THEN 1.0
    ELSE 0.0 END, 6) AS cct_score
FROM tri t
JOIN deg du ON du.node = t.u
JOIN deg dv ON dv.node = t.v
CROSS JOIN n_nodes nn
"""


# q59 — multiscale / disparity-filter score on the weighted graph.
def q59(spark: SparkSession, sf: str) -> DataFrame:
    ew = derived_weighted_edges(spark, sf)
    eu = symmetrize(ew.select("src", "dst"))
    w = (
        ew.select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
            "weight",
        )
        .groupBy("u", "v")
        .agg(F.max("weight").alias("weight"))
    )
    weighted = (
        eu.where(F.col("src") < F.col("dst"))
        .select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .join(w, ["u", "v"])
        .select(F.col("u").alias("src"), F.col("v").alias("dst"), "weight")
    )
    return edgescores.multiscale_score(weighted)


Q59_SQL = f"""
WITH ew AS ({EW_SQL}),
canon AS (
  SELECT LEAST(src, dst) AS u, GREATEST(src, dst) AS v, MAX(weight) AS weight
  FROM ew WHERE src <> dst GROUP BY 1, 2
),
adj AS (
  SELECT u AS node, v AS nbr, weight FROM canon
  UNION ALL
  SELECT v AS node, u AS nbr, weight FROM canon
),
sides AS (
  SELECT node, nbr,
         weight / SUM(weight) OVER (PARTITION BY node) AS p,
         COUNT(*) OVER (PARTITION BY node) AS k
  FROM adj
),
probs AS (
  SELECT LEAST(node, nbr) AS u, GREATEST(node, nbr) AS v,
         CASE WHEN k > 1 THEN 1.0 - POWER(1.0 - p, CAST(k - 1 AS DOUBLE))
              ELSE 1.0 END AS prob
  FROM sides
)
SELECT u, v, ROUND(MAX(prob), 6) AS ms_score FROM probs GROUP BY u, v
"""


# q60 — Katz index from a source set (KatzIndex: damped walk-count sums).
_KATZ_SOURCES = list(range(20))
_KATZ_L = 4
_KATZ_BETA = 0.01


def q60(spark: SparkSession, sf: str) -> DataFrame:
    return linkpred2.katz_index_from(
        _adj(spark, sf), _KATZ_SOURCES, max_path_length=_KATZ_L, beta=_KATZ_BETA
    )


Q60_SQL = f"""
WITH adj AS ({_ADJ_SQL}),
w1 AS (
  SELECT node AS src, nbr AS node, CAST(1 AS BIGINT) AS paths
  FROM adj WHERE node < {len(_KATZ_SOURCES)}
),
w2 AS (
  SELECT w1.src, adj.nbr AS node, SUM(w1.paths) AS paths
  FROM w1 JOIN adj ON adj.node = w1.node GROUP BY w1.src, adj.nbr
),
w3 AS (
  SELECT w2.src, adj.nbr AS node, SUM(w2.paths) AS paths
  FROM w2 JOIN adj ON adj.node = w2.node GROUP BY w2.src, adj.nbr
),
w4 AS (
  SELECT w3.src, adj.nbr AS node, SUM(w3.paths) AS paths
  FROM w3 JOIN adj ON adj.node = w3.node GROUP BY w3.src, adj.nbr
),
allw AS (
  SELECT src, node, 1 AS l, paths FROM w1
  UNION ALL SELECT src, node, 2, paths FROM w2
  UNION ALL SELECT src, node, 3, paths FROM w3
  UNION ALL SELECT src, node, 4, paths FROM w4
),
piv AS (
  SELECT src AS u, node AS v,
         SUM(CASE WHEN l = 1 THEN paths END) AS p1,
         SUM(CASE WHEN l = 2 THEN paths END) AS p2,
         SUM(CASE WHEN l = 3 THEN paths END) AS p3,
         SUM(CASE WHEN l = 4 THEN paths END) AS p4
  FROM allw GROUP BY src, node
)
SELECT u, v,
  ROUND({_KATZ_BETA} * CAST(COALESCE(p1, 0) AS DOUBLE)
      + {_KATZ_BETA**2} * CAST(COALESCE(p2, 0) AS DOUBLE)
      + {_KATZ_BETA**3} * CAST(COALESCE(p3, 0) AS DOUBLE)
      + {_KATZ_BETA**4} * CAST(COALESCE(p4, 0) AS DOUBLE), 8) AS katz_score
FROM piv WHERE u <> v
"""


# q61 — missing links (MissingLinksFinder: distance-2 candidate pairs).
def q61(spark: SparkSession, sf: str) -> DataFrame:
    adj = _adj(spark, sf)
    pairs = linkpred2.missing_links(adj)
    return pairs.where(
        (F.col("u") < _PAIR_CAP) & (F.col("v") < _PAIR_CAP)
    )


Q61_SQL = f"""
WITH adj AS ({_ADJ_SQL}),
two_hop AS (
  SELECT DISTINCT a.node AS u, b.node AS v
  FROM adj a JOIN adj b ON a.nbr = b.nbr AND a.node < b.node
),
direct AS (
  SELECT LEAST(node, nbr) AS u, GREATEST(node, nbr) AS v FROM adj
)
SELECT t.u, t.v FROM two_hop t
LEFT JOIN direct d ON d.u = t.u AND d.v = t.v
WHERE d.u IS NULL AND t.u < {_PAIR_CAP} AND t.v < {_PAIR_CAP}
"""


EDGESCORE = {
    "q52_scan_similarity": (q52, Q52_SQL),
    "q53_local_degree_score": (q53, Q53_SQL),
    "q54_resource_allocation": (q54, Q54_SQL),
    "q55_total_nd_neighbors": (q55, Q55_SQL),
    "q56_neighbors_measure": (q56, Q56_SQL),
    "q57_adjusted_rand_index": (q57, Q57_SQL),
    "q58_chance_corrected_tri": (q58, Q58_SQL),
    "q59_multiscale_score": (q59, Q59_SQL),
    "q60_katz_index": (q60, Q60_SQL),
    "q61_missing_links": (q61, Q61_SQL),
}
