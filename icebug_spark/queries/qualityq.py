"""Quality-measure + epidemic query entries (q71-q79).

Partition for the oracle-checked measures: subset = id % 8 — deterministic
and SQL-expressible, so the DuckDB twin evaluates the same measure on the
same clustering (the engine's own Louvain/PLP partitions are covered by
rows-only q36/q37)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from icebug_spark.catalog import EU_SQL, derived_edges, derived_edges_undirected
from icebug_spark.operators import quality
from icebug_spark.operators.epidemic import seir_simulation

_K = 8

_ADJ_SQL = f"SELECT src AS node, dst AS nbr FROM ({EU_SQL})"
_PART_SQL = (
    f"SELECT DISTINCT node AS id, node % {_K} AS subset FROM ({_ADJ_SQL})"
)
_LAB_SQL = f"""
adj AS ({_ADJ_SQL}),
part AS ({_PART_SQL}),
lab AS (
  SELECT a.node AS src, a.nbr AS dst, ps.subset AS cs, pd.subset AS cd
  FROM adj a JOIN part ps ON ps.id = a.node JOIN part pd ON pd.id = a.nbr
)"""


def _eu(spark: SparkSession, sf: str) -> DataFrame:
    return derived_edges_undirected(spark, sf)


def _part(eu: DataFrame) -> DataFrame:
    return (
        eu.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("subset", F.pmod("id", F.lit(_K)))
    )


def q71(spark: SparkSession, sf: str) -> DataFrame:
    eu = _eu(spark, sf)
    return quality.hub_dominance(eu, _part(eu))


Q71_SQL = f"""
WITH {_LAB_SQL},
sizes AS (SELECT subset, COUNT(*) AS sz FROM part GROUP BY subset),
ideg AS (
  SELECT cs AS subset, src AS id, COUNT(*) AS d
  FROM lab WHERE cs = cd GROUP BY cs, src
),
mx AS (SELECT subset, MAX(d) AS max_ideg FROM ideg GROUP BY subset)
SELECT s.subset,
       ROUND(CASE WHEN s.sz > 1
             THEN CAST(COALESCE(m.max_ideg, 0) AS DOUBLE) / (s.sz - 1)
             ELSE 0.0 END, 6) AS hub_dominance
FROM sizes s LEFT JOIN mx m ON m.subset = s.subset
"""


def q72(spark: SparkSession, sf: str) -> DataFrame:
    eu = _eu(spark, sf)
    return quality.intrapartition_density(eu, _part(eu))


Q72_SQL = f"""
WITH {_LAB_SQL},
sizes AS (SELECT subset, COUNT(*) AS sz FROM part GROUP BY subset),
m_in AS (
  SELECT cs AS subset, COUNT(*) AS m
  FROM lab WHERE cs = cd AND src < dst GROUP BY cs
)
SELECT s.subset,
       ROUND(CASE WHEN s.sz > 1
             THEN CAST(COALESCE(i.m, 0) AS DOUBLE) / (s.sz * (s.sz - 1) / 2)
             ELSE 0.0 END, 6) AS density
FROM sizes s LEFT JOIN m_in i ON i.subset = s.subset
"""


def q73(spark: SparkSession, sf: str) -> DataFrame:
    eu = _eu(spark, sf)
    return quality.isolated_interpartition_conductance(eu, _part(eu))


Q73_SQL = f"""
WITH {_LAB_SQL},
per AS (
  SELECT cs AS subset, COUNT(*) AS vol,
         SUM(CASE WHEN cs <> cd THEN 1 ELSE 0 END) AS cut
  FROM lab GROUP BY cs
),
sizes AS (SELECT subset, COUNT(*) AS sz FROM part GROUP BY subset),
tot AS (SELECT SUM(vol) AS vol_g FROM per),
nn AS (SELECT COUNT(*) AS n FROM part)
SELECT p.subset,
  ROUND(CAST(p.cut AS DOUBLE) / GREATEST(LEAST(p.vol, t.vol_g - p.vol), 1), 6)
    AS conductance,
  ROUND(CAST(p.cut AS DOUBLE) / GREATEST(LEAST(s.sz, nn.n - s.sz), 1), 6)
    AS expansion
FROM per p JOIN sizes s ON s.subset = p.subset CROSS JOIN tot t CROSS JOIN nn
"""


def q74(spark: SparkSession, sf: str) -> DataFrame:
    eu = _eu(spark, sf)
    return quality.stable_partition_nodes(eu, _part(eu))


Q74_SQL = f"""
WITH {_LAB_SQL},
per_node AS (
  SELECT src,
         SUM(CASE WHEN cs = cd THEN 1 ELSE 0 END) AS intra,
         SUM(CASE WHEN cs <> cd THEN 1 ELSE 0 END) AS inter
  FROM lab GROUP BY src
)
SELECT ROUND(AVG(CASE WHEN intra > inter THEN 1.0 ELSE 0.0 END), 6)
  AS stable_fraction
FROM per_node
"""


def q75(spark: SparkSession, sf: str) -> DataFrame:
    eu = _eu(spark, sf)
    return quality.local_partition_coverage(eu, _part(eu))


Q75_SQL = f"""
WITH {_LAB_SQL}
SELECT src AS id,
       ROUND(AVG(CASE WHEN cs = cd THEN 1.0 ELSE 0.0 END), 6) AS coverage
FROM lab GROUP BY src
"""


def q76(spark: SparkSession, sf: str) -> DataFrame:
    eu = _eu(spark, sf)
    return quality.permanence(eu, _part(eu))


Q76_SQL = f"""
WITH {_LAB_SQL},
per_node AS (
  SELECT src AS id, COUNT(*) AS deg,
         SUM(CASE WHEN cs = cd THEN 1 ELSE 0 END) AS internal
  FROM lab GROUP BY src
),
emax AS (
  SELECT id, MAX(k) AS emax FROM (
    SELECT src AS id, cd, COUNT(*) AS k
    FROM lab WHERE cs <> cd GROUP BY src, cd
  ) GROUP BY id
),
intra_adj AS (SELECT src AS v, dst AS n FROM lab WHERE cs = cd),
canon AS (
  SELECT LEAST(node, nbr) AS a, GREATEST(node, nbr) AS b FROM adj GROUP BY 1, 2
),
tri_int AS (
  SELECT w.v AS id, COUNT(*) AS t FROM (
    SELECT p1.v, p1.n AS a, p2.n AS b
    FROM intra_adj p1 JOIN intra_adj p2 ON p1.v = p2.v AND p1.n < p2.n
  ) w JOIN canon c ON c.a = w.a AND c.b = w.b
  GROUP BY w.v
)
SELECT pn.id,
  ROUND(CAST(pn.internal AS DOUBLE)
          / (GREATEST(COALESCE(e.emax, 0), 1) * pn.deg)
        - (1.0 - CASE WHEN pn.internal >= 2
                 THEN 2.0 * COALESCE(t.t, 0) / (pn.internal * (pn.internal - 1))
                 ELSE 0.0 END), 6) AS permanence
FROM per_node pn
LEFT JOIN emax e ON e.id = pn.id
LEFT JOIN tri_int t ON t.id = pn.id
"""


def q77(spark: SparkSession, sf: str) -> DataFrame:
    """Partition fragmentation over the hash-K partition — FULL value
    oracle: the DuckDB twin recomputes intra-cluster connected components
    with a recursive CTE (same min-label semantics as the engine loop)
    and the same 1 − max_piece/size formula."""
    eu = _eu(spark, sf)
    return quality.partition_fragmentation(eu, _part(eu)).orderBy("subset")


Q77_SQL = f"""
WITH RECURSIVE adj AS ({_ADJ_SQL}),
part AS ({_PART_SQL}),
intra AS (
  SELECT ps.subset, a.node AS src, a.nbr AS dst
  FROM adj a JOIN part ps ON ps.id = a.node JOIN part pd ON pd.id = a.nbr
  WHERE ps.subset = pd.subset
),
reach(subset, node, label) AS (
  SELECT subset, id, id FROM part
  UNION
  SELECT i.subset, i.dst, r.label
  FROM reach r JOIN intra i ON i.subset = r.subset AND i.src = r.node
  WHERE r.label < i.dst
),
comp AS (
  SELECT subset, node, MIN(label) AS comp FROM reach GROUP BY subset, node
),
piece AS (SELECT subset, comp, COUNT(*) AS psz FROM comp GROUP BY subset, comp),
largest AS (SELECT subset, MAX(psz) AS mx FROM piece GROUP BY subset),
sz AS (SELECT subset, COUNT(*) AS n FROM part GROUP BY subset)
SELECT s.subset, ROUND(1.0 - l.mx * 1.0 / s.n, 6) AS fragmentation
FROM sz s JOIN largest l ON l.subset = s.subset
ORDER BY s.subset
"""


def q78(spark: SparkSession, sf: str) -> DataFrame:
    eu = _eu(spark, sf)
    nodes = eu.select(F.col("src").alias("id")).distinct()
    cover = nodes.withColumn("subset", F.pmod("id", F.lit(_K)))
    ref = nodes.withColumn("subset", F.pmod("id", F.lit(5)))
    return quality.cover_f1_similarity(cover, ref)


Q78_SQL = f"""
WITH adj AS ({_ADJ_SQL}),
nodes AS (SELECT DISTINCT node AS id FROM adj),
cover AS (SELECT id, id % {_K} AS a FROM nodes),
ref AS (SELECT id, id % 5 AS b FROM nodes),
inter AS (
  SELECT c.a, r.b, COUNT(*) AS i
  FROM cover c JOIN ref r ON r.id = c.id GROUP BY c.a, r.b
),
sa AS (SELECT a, COUNT(*) AS na FROM cover GROUP BY a),
sb AS (SELECT b, COUNT(*) AS nb FROM ref GROUP BY b),
best AS (
  SELECT i.a, MAX(2.0 * i.i / (sa.na + sb.nb)) AS best
  FROM inter i JOIN sa ON sa.a = i.a JOIN sb ON sb.b = i.b
  GROUP BY i.a
)
SELECT sa.a AS subset, ROUND(COALESCE(best.best, 0.0), 6) AS f1
FROM sa LEFT JOIN best ON best.a = sa.a
"""


_SEIR_STEPS = 12


def q79(spark: SparkSession, sf: str) -> DataFrame:
    """SEIR census invariants (hash-seeded transmissions are not SQL-
    expressible; the checkable claims are the model's conservation laws):
    every step conserves population, S is monotone non-increasing, R is
    monotone non-decreasing, and the census covers all 12 steps. A broken
    compartment update flips a boolean; the oracle expects constants."""
    eu = _eu(spark, sf)
    zero = eu.agg(F.min("src")).collect()[0][0]
    census = seir_simulation(eu, zero=int(zero), steps=_SEIR_STEPS, seed=42)
    n = eu.select(F.col("src").alias("id")).distinct().count()
    total = (
        F.col("n_susceptible") + F.col("n_exposed")
        + F.col("n_infectious") + F.col("n_recovered")
    )
    # step−1 self-join instead of an unpartitioned lag window: same
    # monotonicity flags, step-bounded rows, no WindowExec warnings
    prev = census.select(
        (F.col("step") + 1).alias("step"),
        F.col("n_susceptible").alias("ps"),
        F.col("n_recovered").alias("pr"),
    )
    flags = census.join(prev, "step", "left").select(
        "step",
        (total == n).alias("conserved"),
        (F.col("n_susceptible") <= F.coalesce("ps", F.col("n_susceptible"))).alias("s_dec"),
        (F.col("n_recovered") >= F.coalesce("pr", F.col("n_recovered"))).alias("r_inc"),
    )
    return flags.agg(
        F.count(F.lit(1)).alias("n_steps"),
        F.min("conserved").alias("population_conserved"),
        F.min("s_dec").alias("susceptible_monotone"),
        F.min("r_inc").alias("recovered_monotone"),
    )


Q79_SQL = f"""
SELECT {_SEIR_STEPS} AS n_steps, TRUE AS population_conserved,
       TRUE AS susceptible_monotone, TRUE AS recovered_monotone
"""


QUALITY = {
    "q71_hub_dominance": (q71, Q71_SQL),
    "q72_intrapartition_density": (q72, Q72_SQL),
    "q73_interpartition_cond": (q73, Q73_SQL),
    "q74_stable_nodes": (q74, Q74_SQL),
    "q75_local_partition_coverage": (q75, Q75_SQL),
    "q76_permanence": (q76, Q76_SQL),
    "q77_fragmentation": (q77, Q77_SQL),
    "q78_cover_f1": (q78, Q78_SQL),
    "q79_seir_census": (q79, Q79_SQL),
}
