"""Graph value object: two DataFrames (vertices, edges) + flags.

Re-expresses the reference's graph model (read-only CSR ``GraphR``,
reference ``include/networkit/graph/GraphR.hpp:25,39-65``; mutable
``GraphW``, ``graph/GraphW.hpp:18``) as immutable DataFrames:

- ``edges(src BIGINT, dst BIGINT [, weight DOUBLE])`` — directed arcs; an
  undirected graph stores each edge once with ``src <= dst`` and
  ``symmetrized()`` materializes both directions for neighborhood ops.
- ``vertices(id BIGINT, ...attrs)`` — optional; defaults to the distinct
  endpoint set. Node/edge attributes (reference
  ``graph/Attributes.hpp:43-561``) are plain extra columns.

The CSR layout's locality (indptr/indices sorted by source) corresponds to
``edges.repartition("src").sortWithinPartitions("src", "dst")`` — at
cluster scale you would persist the edges bucketed by ``src`` so every
per-source neighborhood op is shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class Graph:
    """Immutable graph over DataFrames (GraphFrames-style, self-contained)."""

    def __init__(
        self,
        edges: DataFrame,
        vertices: DataFrame | None = None,
        directed: bool = True,
        weighted: bool = False,
    ):
        cols = ["src", "dst"] + (["weight"] if weighted else [])
        missing = [c for c in cols if c not in edges.columns]
        if missing:
            raise ValueError(f"edges missing columns {missing}")
        self.edges = edges
        self._vertices = vertices
        self.directed = directed
        self.weighted = weighted

    # -- construction ------------------------------------------------------
    @classmethod
    def from_edge_list(cls, spark, rows, directed=True, weighted=False) -> "Graph":
        """Build from python tuples (src, dst[, weight]) — test convenience.

        (Parity with the reference's GraphW addEdge / GraphFromCoo paths,
        ``networkit/graph.pyx:1394,2266``.)
        """
        cols = ["src", "dst"] + (["weight"] if weighted else [])
        df = spark.createDataFrame(rows, cols)
        casts = [F.col("src").cast("long"), F.col("dst").cast("long")]
        if weighted:
            casts.append(F.col("weight").cast("double"))
        return cls(df.select(*casts), directed=directed, weighted=weighted)

    @classmethod
    def from_coo(
        cls, spark, input_data, n: int = 0, weighted: bool = False,
        directed: bool = False,
    ) -> "Graph":
        """GraphFromCoo (reference ``networkit/graph.pyx:2266``): build
        from triplet/ijv data — ``(data, (i, j))`` or ``(i, j)`` array
        tuples (the reference also takes a scipy coo_matrix; scipy is
        absent here, so pass its ``(mat.data, (mat.row, mat.col))``).
        Pairs without data get weight 1.0 even when ``weighted`` (the
        reference note); ``n`` pre-declares the vertex set like the
        reference's Graph(n). Undirected graphs store canonical
        (min, max) arcs — the engine's single-storage convention for the
        reference's double insertion.

        Duplicate-entry rule (documented divergence): the reference's
        GraphFromCoo (addEdges, checkMultiEdge=False) inserts every
        duplicate as a parallel edge; this engine's simple-graph storage
        collapses duplicate undirected (min, max) pairs by SUMMING their
        weights — the scipy ``coo_matrix`` duplicate convention — so the
        weighted adjacency matrix matches what scipy would materialize
        from the same triplets. Unweighted duplicates collapse to one
        edge; directed input is stored as given."""
        import numpy as np
        import pandas as pd

        if len(input_data) == 2 and not isinstance(input_data[1], tuple):
            i, j = input_data
            data = None
        else:
            data, (i, j) = input_data
        i = np.asarray(i, dtype="int64")
        j = np.asarray(j, dtype="int64")
        if not directed:
            i, j = np.minimum(i, j), np.maximum(i, j)
        cols = {"src": i, "dst": j}
        if weighted:
            cols["weight"] = (
                np.ones(len(i)) if data is None
                else np.asarray(data, dtype="float64")
            )
        pdf = pd.DataFrame(cols)
        if not directed:
            agg = {"weight": "sum"} if weighted else None
            pdf = (
                pdf.groupby(["src", "dst"], as_index=False).agg(agg)
                if agg
                else pdf.drop_duplicates()
            )
        schema = "src long, dst long" + (", weight double" if weighted else "")
        edges = (
            spark.createDataFrame(pdf)
            if len(pdf)
            else spark.createDataFrame([], schema)
        )
        vertices = (
            spark.range(max(int(n), int(i.max() + 1 if len(i) else 0),
                            int(j.max() + 1 if len(j) else 0))).select("id")
            if (n or len(i))
            else None
        )
        return cls(edges, vertices=vertices, directed=directed, weighted=weighted)

    @classmethod
    def from_csr(cls, spark, indptr, indices, weights=None, directed=True) -> "Graph":
        """Zero-copy-ish CSR ingest (parity with ``Graph.fromCSR``,
        reference ``networkit/graph.pyx:83-232``): CSR → (src, dst) pairs
        via a deterministic explode, Arrow-accelerated createDataFrame."""
        import pandas as pd
        import numpy as np

        indptr = np.asarray(indptr, dtype="int64")
        indices = np.asarray(indices, dtype="int64")
        src = np.repeat(np.arange(len(indptr) - 1, dtype="int64"), np.diff(indptr))
        data = {"src": src, "dst": indices}
        weighted = weights is not None
        if weighted:
            data["weight"] = np.asarray(weights, dtype="float64")
        pdf = pd.DataFrame(data)
        return cls(spark.createDataFrame(pdf), directed=directed, weighted=weighted)

    # -- core views --------------------------------------------------------
    @property
    def vertices(self) -> DataFrame:
        if self._vertices is not None:
            return self._vertices
        e = self.edges
        return (
            e.select(F.col("src").alias("id"))
            .union(e.select(F.col("dst").alias("id")))
            .distinct()
        )

    def symmetrized(self) -> DataFrame:
        """Both arc directions, distinct. For an undirected graph this is the
        neighborhood view every traversal/centrality op consumes."""
        e = self.edges.select("src", "dst")
        return e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))).distinct()

    def transpose(self) -> "Graph":
        """Reference GraphTools::transpose (``graph/GraphTools.hpp:330``)."""
        cols = [F.col("dst").alias("src"), F.col("src").alias("dst")] + (
            [F.col("weight")] if self.weighted else []
        )
        return Graph(self.edges.select(*cols), self._vertices, self.directed, self.weighted)

    def to_undirected(self) -> "Graph":
        """Reference GraphTools::toUndirected (``graph/GraphTools.hpp:303``)
        — preserves edge weights (reference addEdge(u,v,w)); parallel arcs
        from symmetrization keep the max weight per direction pair."""
        if not self.weighted:
            return Graph(
                self.symmetrized(), self._vertices, directed=False, weighted=False
            )
        e = self.edges.select("src", "dst", "weight")
        both = e.union(
            e.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), F.col("weight")
            )
        )
        sym = both.groupBy("src", "dst").agg(F.max("weight").alias("weight"))
        return Graph(sym, self._vertices, directed=False, weighted=True)

    # -- degrees (reference DegreeCentrality.hpp:20, graph.pyx:335-446) ----
    def out_degrees(self) -> DataFrame:
        return self.edges.groupBy(F.col("src").alias("id")).agg(
            F.count(F.lit(1)).alias("degree")
        )

    def in_degrees(self) -> DataFrame:
        return self.edges.groupBy(F.col("dst").alias("id")).agg(
            F.count(F.lit(1)).alias("degree")
        )

    def degrees(self) -> DataFrame:
        """Total degree on the symmetrized view (distinct neighbors)."""
        return self.symmetrized().groupBy(F.col("src").alias("id")).agg(
            F.count(F.lit(1)).alias("degree")
        )

    def weighted_out_degrees(self) -> DataFrame:
        w = F.col("weight") if self.weighted else F.lit(1.0)
        return self.edges.groupBy(F.col("src").alias("id")).agg(
            F.sum(w).alias("wdegree")
        )

    # -- size / density (GraphTools.hpp:132-149) ---------------------------
    def number_of_nodes(self) -> int:
        return self.vertices.count()

    def number_of_edges(self) -> int:
        return self.edges.count()

    def density(self) -> float:
        n = self.number_of_nodes()
        m = self.number_of_edges()
        if n <= 1:
            return 0.0
        return m / (n * (n - 1)) if self.directed else 2.0 * m / (n * (n - 1))

    # -- subgraph (GraphTools.hpp:208-292) ---------------------------------
    def subgraph(self, node_ids: DataFrame) -> "Graph":
        """Induced subgraph: semi-join edges against a node-id DataFrame
        (column ``id``). Distributed equivalent of subgraphFromNodes."""
        ids = node_ids.select("id")
        e = (
            self.edges.join(ids.withColumnRenamed("id", "src"), "src", "leftsemi")
            .join(ids.withColumnRenamed("id", "dst"), "dst", "leftsemi")
            .select(self.edges.columns)
        )
        return Graph(e, None, self.directed, self.weighted)
