"""icebug_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query/data-processing capabilities of
the reference graph-analytics library (a NetworKit fork with an
Arrow-backed read-only CSR graph) as idiomatic Spark DataFrame programs:

- graph data model = ``Graph(vertices_df, edges_df)`` over columnar Parquet
  (the reference's CSR-on-Arrow ``GraphR``, reference
  ``include/networkit/graph/GraphR.hpp:25``, maps to an edges DataFrame
  sorted/partitioned by src — Parquet/Tungsten already give columnar layout)
- algorithms = DataFrame joins/aggregations driven by a shared iterative
  runner with checkpointing (``icebug_spark.plans.iterate``)
- relational/t2 surface = declared query set (SURVEY.md §2.18)
- LLM-data-pipeline extensions: dedup, text stats, embedding similarity

Everything is designed for a multi-executor cluster at 100 TB scale
(broadcast small dims, partial aggregation, AQE, no driver-side loops over
data) even though tests run on local[*].
"""

from icebug_spark.session import get_spark
from icebug_spark.graph.core import Graph

__all__ = ["get_spark", "Graph"]
__version__ = "0.1.0"
