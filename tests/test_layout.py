"""PivotMDS: 1-D structures embed in order; output shape invariants."""

from icebug_spark.graph.core import Graph
from icebug_spark.operators.layout import pivot_mds


def test_pivot_mds_orders_path(spark):
    path = [(i, i + 1) for i in range(9)]
    g = Graph.from_edge_list(spark, path, directed=False)
    out = pivot_mds(g.symmetrized(), dim=2, num_pivots=5)
    rows = sorted((r["id"], r["coords"]) for r in out.collect())
    assert len(rows) == 10 and all(len(c) == 2 for _, c in rows)
    xs = [c[0] for _, c in rows]
    # dominant MDS axis recovers the path order (up to sign)
    assert all(xs[i] < xs[i + 1] for i in range(9)) or all(
        xs[i] > xs[i + 1] for i in range(9)
    )


def test_pivot_mds_symmetric_star(spark):
    star = [(0, i) for i in range(1, 7)]
    g = Graph.from_edge_list(spark, star, directed=False)
    out = pivot_mds(g.symmetrized(), dim=2, num_pivots=4)
    coords = {r["id"]: r["coords"] for r in out.collect()}
    assert len(coords) == 7
    # center sits nearest the embedding origin
    def norm2(c):
        return sum(x * x for x in c)

    assert all(norm2(coords[0]) <= norm2(coords[i]) + 1e-9 for i in range(1, 7))
