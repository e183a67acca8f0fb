from icebug_spark.graph.core import Graph

__all__ = ["Graph"]
