"""SCD + embedding query entries (rows-only: iterative PPR push and
seeded-walk pipelines have no closed-form SQL twin; exactness is covered
by unit goldens in tests/test_scd_embedding.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from icebug_spark.catalog import derived_edges, symmetrize
from icebug_spark.operators.embedding import random_walks
from icebug_spark.operators.scd import pagerank_nibble, set_conductance

_SEEDS = [1, 2, 3, 4, 5]


def q62(spark: SparkSession, sf: str) -> DataFrame:
    """PageRankNibble communities around fixed seeds: (seed, size,
    conductance) — ApproximatePageRank + sweep cut parity."""
    eu = symmetrize(derived_edges(spark, sf, materialize=True)).localCheckpoint(
        eager=True
    )
    members = pagerank_nibble(eu, _SEEDS, alpha=0.15, eps=1e-4)
    sizes = members.groupBy("seed").agg(F.count(F.lit(1)).alias("size"))
    cond = set_conductance(eu, members)
    return sizes.join(cond, "seed").orderBy("seed")


def q63(spark: SparkSession, sf: str) -> DataFrame:
    """node2vec walk statistics (deterministic, seeded): walks over the
    derived graph restricted to low-id nodes; (n_walks, n_full_length,
    distinct_nodes_visited)."""
    eu = symmetrize(derived_edges(spark, sf, materialize=True))
    small = eu.where((F.col("src") < 500) & (F.col("dst") < 500))
    walks = random_walks(small, walk_length=8, walks_per_node=1, seed=42)
    return walks.agg(
        F.count(F.lit(1)).alias("n_walks"),
        F.sum(F.when(F.size("walk") == 8, 1).otherwise(0)).alias("n_full_length"),
        F.size(F.array_distinct(F.flatten(F.collect_list("walk")))).alias(
            "distinct_nodes_visited"
        ),
    )


SCD = {
    "q62_pagerank_nibble": (q62, None),
    "q63_node2vec_walks": (q63, None),
}
