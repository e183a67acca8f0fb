"""Graph core + operator unit tests on hand-checkable fixtures
(role of the reference's pytest corpus, SURVEY.md §5)."""

import pytest
from pyspark.sql import functions as F

from icebug_spark.graph.core import Graph

# g_tiny (FIXTURES.md): path 0-1-2-0 triangle, chain 3-4, isolated-ish 5-6
TINY = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (5, 6)]


@pytest.fixture(scope="module")
def g(spark):
    return Graph.from_edge_list(spark, TINY, directed=False)


def test_degrees(g):
    deg = {r["id"]: r["degree"] for r in g.degrees().collect()}
    assert deg == {0: 2, 1: 2, 2: 3, 3: 2, 4: 1, 5: 1, 6: 1}


def test_transpose_roundtrip(g):
    t2 = g.transpose().transpose()
    assert sorted(map(tuple, t2.edges.collect())) == sorted(TINY)


def test_from_csr(spark):
    # 0→{1,2}, 1→{2}, 2→{}
    g = Graph.from_csr(spark, indptr=[0, 2, 3, 3], indices=[1, 2, 2])
    assert sorted(map(tuple, g.edges.collect())) == [(0, 1), (0, 2), (1, 2)]


def test_subgraph(g, spark):
    ids = spark.createDataFrame([(0,), (1,), (2,)], ["id"])
    sub = g.subgraph(ids)
    assert sub.number_of_edges() == 3


def test_connected_components(g):
    from icebug_spark.operators.components import connected_components

    comp = {r["id"]: r["component"] for r in connected_components(g.symmetrized()).collect()}
    assert comp == {0: 0, 1: 0, 2: 0, 3: 0, 4: 0, 5: 5, 6: 5}


def test_largest_cc(g):
    from icebug_spark.operators.components import largest_connected_component

    ids = sorted(r["id"] for r in largest_connected_component(g.symmetrized()).collect())
    assert ids == [0, 1, 2, 3, 4]


def test_triangle_count(g):
    from icebug_spark.operators.triangles import triangle_count, local_clustering_coefficient

    assert triangle_count(g.symmetrized()).collect()[0]["n_triangles"] == 1
    lcc = {r["id"]: r["lcc"] for r in local_clustering_coefficient(g.symmetrized()).collect()}
    assert lcc[0] == 1.0  # 0's neighbors {1,2} fully connected
    assert lcc[2] == pytest.approx(1 / 3)  # {0,1,3}: 1 of 3 pairs


def test_bfs(g):
    from icebug_spark.operators.traversal import bfs_distances

    d = {r["id"]: r["dist"] for r in bfs_distances(g.symmetrized(), 0).collect()}
    assert d == {0: 0, 1: 1, 2: 1, 3: 2, 4: 3}


def test_sssp_weighted(spark):
    from icebug_spark.operators.traversal import sssp_weighted

    g = Graph.from_edge_list(
        spark,
        [(0, 1, 1.0), (1, 2, 1.0), (0, 2, 5.0)],
        directed=True,
        weighted=True,
    )
    d = {r["id"]: r["dist"] for r in sssp_weighted(g.edges, 0).collect()}
    assert d == {0: 0.0, 1: 1.0, 2: 2.0}


def test_pagerank_sums_to_one(g):
    from icebug_spark.operators.centrality import pagerank

    pr = pagerank(g.symmetrized(), max_iter=20, distribute_sinks=True)
    total = pr.agg(F.sum("pagerank")).collect()[0][0]
    assert total == pytest.approx(1.0, abs=1e-6)


def test_pagerank_tol_early_stop_matches_converged_fixed_run(g):
    from icebug_spark.operators.centrality import pagerank

    eu = g.symmetrized()
    # tol path: stops once the L1 delta between consecutive rank vectors
    # is tiny; must agree with a long fixed run to well past that tol
    fixed = {r["id"]: r["pagerank"] for r in pagerank(eu, max_iter=60).collect()}
    early = {
        r["id"]: r["pagerank"]
        for r in pagerank(eu, max_iter=60, tol=1e-10, norm="l1").collect()
    }
    assert early.keys() == fixed.keys()
    for k in fixed:
        assert early[k] == pytest.approx(fixed[k], abs=1e-8)
    with pytest.raises(ValueError):
        pagerank(eu, tol=1e-6, norm="bogus")


def test_kcore(g):
    from icebug_spark.operators.kcore import k_core

    ids = sorted(r["id"] for r in k_core(g.symmetrized(), 2).collect())
    assert ids == [0, 1, 2]  # only the triangle survives 2-core peeling


def test_jaccard(spark):
    from icebug_spark.operators.linkpred import jaccard_index

    # nodes 0,1 share nbr 10; 0 also has 11 → J(0,1) = 1/2... adj explicit
    adj = spark.createDataFrame(
        [(0, 10), (0, 11), (1, 10)], ["node", "nbr"]
    )
    rows = jaccard_index(adj).collect()
    assert len(rows) == 1
    assert rows[0]["jaccard"] == 0.5


def test_edge_lookups(spark):
    from icebug_spark.graph import tools
    from icebug_spark.graph.core import Graph

    g = Graph.from_edge_list(
        spark, [(0, 1, 2.5), (1, 2, 1.0)], directed=False, weighted=True
    )
    assert tools.has_edge(g, 0, 1) and tools.has_edge(g, 1, 0)
    assert not tools.has_edge(g, 0, 2)
    assert tools.edge_weight(g, 1, 0) == 2.5
    assert tools.edge_weight(g, 0, 2) is None
    ids = {r["edge_id"] for r in tools.edge_ids(g).collect()}
    assert ids == {0, 1}
    gd = Graph.from_edge_list(spark, [(0, 1)], directed=True)
    assert tools.has_edge(gd, 0, 1) and not tools.has_edge(gd, 1, 0)
    assert tools.edge_weight(gd, 0, 1) == 1.0


def test_from_coo_variants(spark):
    """GraphFromCoo parity (graph.pyx:2266): (i,j) pairs weight-1.0 even
    when weighted; (data,(i,j)) triplets; n pre-declares vertices;
    undirected pairs collapse to canonical storage."""
    import numpy as np

    i, j = np.array([0, 2, 1]), np.array([1, 0, 2])
    g = Graph.from_coo(spark, (i, j), n=5, weighted=True)
    rows = sorted(tuple(r) for r in g.edges.collect())
    assert rows == [(0, 1, 1.0), (0, 2, 1.0), (1, 2, 1.0)]
    assert g.vertices.count() == 5 and not g.directed and g.weighted

    d = np.array([2.5, 0.5, 1.5])
    gd = Graph.from_coo(spark, (d, (i, j)), weighted=True, directed=True)
    rows = sorted(tuple(r) for r in gd.edges.collect())
    assert rows == [(0, 1, 2.5), (1, 2, 1.5), (2, 0, 0.5)]
    assert gd.vertices.count() == 3


def test_from_coo_duplicate_undirected_entries_sum(spark):
    """Duplicate undirected coo entries collapse by SUMMING weights (the
    scipy coo_matrix duplicate convention, documented divergence from
    the reference's parallel-edge insert)."""
    import numpy as np

    i = np.array([0, 1, 0])
    j = np.array([1, 0, 1])
    d = np.array([1.5, 2.0, 0.5])
    g = Graph.from_coo(spark, (d, (i, j)), weighted=True)
    rows = sorted(tuple(r) for r in g.edges.collect())
    assert rows == [(0, 1, 4.0)]


def test_multi_source_bfs_narrowed_state_edge_cases(spark):
    """The round-11 narrowing (dist dropped from loop state, output
    assembled from per-level checkpoint slices) must preserve the exact
    output contract: de-duplicated repeated sources, BIGINT dist, exact
    hop distances, and the max_hops cutoff dropping unreached nodes."""
    from pyspark.sql import functions as F

    from icebug_spark.operators.traversal import multi_source_bfs

    # path 0-1-2-3-4 plus an isolated edge 10-11
    edges = [(i, i + 1) for i in range(4)] + [(10, 11)]
    e = spark.createDataFrame(edges, "src BIGINT, dst BIGINT")
    eu = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))

    # duplicate sources collapse to one row set (the old grouped shape
    # deduped them in its first aggregation)
    d = multi_source_bfs(eu, [0, 0, 2], max_hops=10)
    assert dict(d.dtypes)["dist"] == "bigint"
    rows = [(r["source"], r["id"], r["dist"]) for r in d.collect()]
    assert len(rows) == len(set(rows))
    got = {(s, i): dist for s, i, dist in rows}
    expect = {(0, j): j for j in range(5)}
    expect.update({(2, j): abs(j - 2) for j in range(5)})
    assert got == expect

    # max_hops cutoff: nodes beyond the horizon are absent
    d2 = {
        (r["source"], r["id"]): r["dist"]
        for r in multi_source_bfs(eu, [0], max_hops=2).collect()
    }
    assert d2 == {(0, 0): 0, (0, 1): 1, (0, 2): 2}
