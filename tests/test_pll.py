"""Exact pruned landmark labeling: query exactness vs plain BFS, label
minimality sanity, dynamic insert parity with rebuild."""

from collections import deque

import pytest
from pyspark.sql import functions as F

from icebug_spark.catalog import derived_edges_undirected
from icebug_spark.operators import pll


def _py_bfs(adj, s):
    dist = {s: 0}
    dq = deque([s])
    while dq:
        u = dq.popleft()
        for v in adj[u]:
            if v not in dist:
                dist[v] = dist[u] + 1
                dq.append(v)
    return dist


@pytest.fixture(scope="module")
def eu(spark, sf_dir):
    return derived_edges_undirected(spark, sf_dir)


def test_pll_exact_distances(spark, eu):
    p = pll.build_exact_pll(eu)
    adj = p.adj
    ids = sorted(adj)[:40]
    for s in ids[:5]:
        truth = _py_bfs(adj, s)
        for t in ids:
            got = p._query_py(s, t)
            exp = truth.get(t, float("inf"))
            assert got == exp, (s, t, got, exp)


def test_pll_distance_dataframe(spark, eu):
    labels = pll.pll_label_table(eu)
    adj = pll.build_exact_pll(eu).adj
    ids = sorted(adj)[:8]
    pairs = spark.createDataFrame(
        [(u, v) for u in ids[:3] for v in ids if u != v], "u BIGINT, v BIGINT"
    )
    got = {(r["u"], r["v"]): r["dist"] for r in pll.pll_distance(labels, pairs).collect()}
    for u in ids[:3]:
        truth = _py_bfs(adj, u)
        for v in ids:
            if u == v:
                continue
            if v in truth:
                assert got[(u, v)] == truth[v]
            else:
                assert (u, v) not in got


def test_pll_labels_smaller_than_full(spark, eu):
    """Pruning must beat the trivial all-pairs labeling by a wide margin."""
    p = pll.build_exact_pll(eu)
    n = len(p.labels)
    total = sum(len(l) for l in p.labels.values())
    assert total < n * n / 4


def test_pll_insert_edge_matches_rebuild(spark):
    from icebug_spark.graph.core import Graph

    base = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (0, 6), (6, 7)]
    g = Graph.from_edge_list(spark, base, directed=False)
    p = pll.build_exact_pll(g.symmetrized())
    # insert a shortcut and a new node
    p.insert_edge(0, 5)
    p.insert_edge(7, 8)
    g2 = Graph.from_edge_list(spark, base + [(0, 5), (7, 8)], directed=False)
    p2 = pll.build_exact_pll(g2.symmetrized())
    nodes = sorted(p2.labels)
    for u in nodes:
        for v in nodes:
            assert p._query_py(u, v) == p2._query_py(u, v), (u, v)


def test_pll_size_guard(spark, eu):
    with pytest.raises(ValueError):
        pll.build_exact_pll(eu, max_edges=10)
