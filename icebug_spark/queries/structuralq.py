"""Structural-operator query entries: SCC, MSF, MIS, matching,
topological layering on the derived graph.

SCC carries a DuckDB oracle (mutual-reachability closure — fine at
sf0.01, while the engine's coloring algorithm is the 100 TB path).
MSF/MIS/matching are iterative with engine tie-breaks → rows-only, with
exactness covered by unit tests on golden fixtures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from icebug_spark.catalog import E_SQL, derived_edges, derived_weighted_edges, symmetrize
from icebug_spark.operators.independent import luby_mis
from icebug_spark.operators.matching import local_max_matching
from icebug_spark.operators.msf import boruvka_msf
from icebug_spark.operators.scc import strongly_connected_components


def q38(spark: SparkSession, sf: str) -> DataFrame:
    e = derived_edges(spark, sf, materialize=True)
    return strongly_connected_components(e).select("id", "component")


Q38_SQL = f"""
WITH RECURSIVE e AS (
  SELECT src, dst FROM ({E_SQL}) WHERE src <> dst
),
reach(a, b) AS (
  SELECT src, dst FROM e
  UNION
  SELECT r.a, e.dst FROM reach r JOIN e ON e.src = r.b
),
nodes AS (SELECT DISTINCT id FROM
          (SELECT src AS id FROM e UNION ALL SELECT dst AS id FROM e)),
mutual AS (
  SELECT r1.a AS u, r1.b AS v
  FROM reach r1 JOIN reach r2 ON r1.a = r2.b AND r1.b = r2.a
)
SELECT n.id, GREATEST(n.id, COALESCE(MAX(m.v), n.id)) AS component
FROM nodes n LEFT JOIN mutual m ON m.u = n.id
GROUP BY n.id
"""


def q39(spark: SparkSession, sf: str) -> DataFrame:
    """Minimum spanning forest of the weighted derived graph — rows-only
    entry returning the forest summary (n_edges, total_weight); exactness
    is unit-tested on golden fixtures."""
    ew = derived_weighted_edges(spark, sf)
    msf = boruvka_msf(ew)
    return msf.agg(
        F.count(F.lit(1)).alias("n_edges"),
        F.round(F.sum("weight"), 2).alias("total_weight"),
    )


def q40(spark: SparkSession, sf: str) -> DataFrame:
    """Luby maximal independent set size on EU — rows-only (hash-seeded)."""
    eu = symmetrize(derived_edges(spark, sf, materialize=True))
    mis = luby_mis(eu)
    return mis.agg(F.count(F.lit(1)).alias("mis_size"))


def q41(spark: SparkSession, sf: str) -> DataFrame:
    """Local-max weighted matching on the derived weighted graph —
    rows-only summary (n_matched_pairs, total_weight)."""
    ew = derived_weighted_edges(spark, sf)
    m = local_max_matching(ew)
    return m.agg(
        F.count(F.lit(1)).alias("n_matched_pairs"),
        F.round(F.sum("weight"), 2).alias("total_weight"),
    )


STRUCTURAL = {
    "q38_scc": (q38, Q38_SQL),
    "q39_msf_summary": (q39, None),
    "q40_luby_mis_size": (q40, None),
    "q41_matching_summary": (q41, None),
}
