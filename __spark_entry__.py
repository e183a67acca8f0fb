"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)    — flagship query (PageRank on the derived customer→supplier
                  graph at sf0.001).
queries()       — name → (spark, sf_dir) -> DataFrame, one per implemented
                  operator (SURVEY.md §2).
oracle_sql()    — name → DuckDB-compatible ANSI SQL twin (omitted for
                  sketch/hash-based ops → driver records rows-only check).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from icebug_spark.queries import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: PageRank (15 iter, d=0.85) on E(custkey→suppkey) @ sf0.001."""
    from icebug_spark.queries.graphq import q29

    return q29(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()
