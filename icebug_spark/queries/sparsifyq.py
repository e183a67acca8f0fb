"""Sparsification part-2 query entries (q106-q109): local similarity /
local filter scores with full DuckDB value oracles, the local-similarity
sparsifier (threshold on the same closed form), and RandomNodeEdgeScore
with an exact property oracle (the score set of the exponential race is
fully determined: {0/m, 1/m, ..., (m-1)/m}).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from icebug_spark.operators import sparsify2
from icebug_spark.operators.edgescores import edge_triangle_count
from icebug_spark.queries.edgescoreq import _CE_SQL, _TRI_SQL, _eu

_LS_CORE = f"""
WITH {_TRI_SQL},
deg AS (SELECT node, COUNT(*) AS deg FROM adj GROUP BY node),
sim AS (
  SELECT t.u, t.v, du.deg AS du, dv.deg AS dv,
         CAST(t.n_tri AS DOUBLE) / CAST(du.deg + dv.deg - t.n_tri AS DOUBLE) AS sim
  FROM tri t JOIN deg du ON du.node = t.u JOIN deg dv ON dv.node = t.v
),
adj2 AS (
  SELECT u AS node, v AS nbr, du AS d, sim FROM sim
  UNION ALL
  SELECT v AS node, u AS nbr, dv AS d, sim FROM sim
),
ranked AS (
  SELECT node, nbr, d,
         ROW_NUMBER() OVER (PARTITION BY node ORDER BY sim DESC, nbr) AS rnk
  FROM adj2
),
scored AS (
  SELECT LEAST(node, nbr) AS u, GREATEST(node, nbr) AS v,
         CASE WHEN d > 1 THEN 1.0 - LN(CAST(rnk AS DOUBLE)) / LN(CAST(d AS DOUBLE))
              ELSE 1.0 END AS e
  FROM ranked
)
SELECT u, v, ROUND(MAX(e), 6) AS ls_score FROM scored GROUP BY u, v"""


# q106 — LocalSimilarityScore (minimum sparsification exponent).
def q106(spark: SparkSession, sf: str) -> DataFrame:
    return sparsify2.local_similarity_score(_eu(spark, sf))


Q106_SQL = _LS_CORE


# q107 — LocalFilterScore (logarithmic) over per-edge triangle counts.
def q107(spark: SparkSession, sf: str) -> DataFrame:
    from icebug_spark.catalog import derived_canonical_edges, derived_triangle_kernel

    te = edge_triangle_count(
        _eu(spark, sf),
        canon=derived_canonical_edges(spark, sf),
        kernel=derived_triangle_kernel(spark, sf),
    ).withColumn("score", F.col("n_tri").cast("double"))
    return sparsify2.local_filter_score(te, score_col="score", logarithmic=True)


Q107_SQL = f"""
WITH {_TRI_SQL},
adj2 AS (
  SELECT u AS node, v AS nbr, n_tri FROM tri
  UNION ALL
  SELECT v AS node, u AS nbr, n_tri FROM tri
),
ranked AS (
  SELECT node, nbr,
         RANK() OVER (PARTITION BY node ORDER BY n_tri DESC) AS rnk,
         COUNT(*) OVER (PARTITION BY node) AS d
  FROM adj2
),
scored AS (
  SELECT LEAST(node, nbr) AS u, GREATEST(node, nbr) AS v,
         CASE WHEN d > 1 THEN 1.0 - LN(CAST(rnk AS DOUBLE)) / LN(CAST(d AS DOUBLE))
              ELSE 1.0 END AS e
  FROM ranked
)
SELECT u, v, ROUND(MAX(e), 6) AS lf_score FROM scored GROUP BY u, v
"""


# q108 — LocalSimilaritySparsifier: keep exponent >= 0.6.
def q108(spark: SparkSession, sf: str) -> DataFrame:
    return sparsify2.local_similarity_sparsifier(_eu(spark, sf), e=0.6)


Q108_SQL = f"""
SELECT * FROM ({_LS_CORE}) WHERE ls_score >= 0.6
"""


# q109 — RandomNodeEdgeScore property check: the race assigns each of the m
# canonical edges a distinct normalized removal rank, so the score multiset
# is exactly {{0/m, ..., (m-1)/m}} — count, distinct-count, min, max and sum
# are closed-form in m.
def q109(spark: SparkSession, sf: str) -> DataFrame:
    s = sparsify2.random_node_edge_score(_eu(spark, sf), rne_ratio=0.5)
    return s.agg(
        F.count(F.lit(1)).alias("n_edges"),
        F.countDistinct("rne_score").alias("n_scores"),
        F.round(F.min("rne_score"), 9).alias("min_score"),
        F.round(F.max("rne_score"), 9).alias("max_score"),
    )


Q109_SQL = f"""
WITH ce AS ({_CE_SQL}), m AS (SELECT COUNT(*) AS m FROM ce)
SELECT m AS n_edges, m AS n_scores, 0.0 AS min_score,
       ROUND((m - 1.0) / m, 9) AS max_score
FROM m
"""

SPARSIFY2 = {
    "q106_local_similarity": (q106, Q106_SQL),
    "q107_local_filter": (q107, Q107_SQL),
    "q108_local_similarity_sparsifier": (q108, Q108_SQL),
    "q109_random_node_edge": (q109, Q109_SQL),
}
