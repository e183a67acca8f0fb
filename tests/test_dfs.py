"""DFS orderings: hand-computed pre/postorder, tree-edge stream, guards."""

import pytest
from pyspark.sql import functions as F

from icebug_spark.graph.core import Graph
from icebug_spark.operators import dfs


def test_dfs_ordering_path(spark):
    g = Graph.from_edge_list(spark, [(0, 1), (1, 2), (2, 3)], directed=False)
    rows = {r["id"]: r for r in dfs.dfs_ordering(g.symmetrized(), 0).collect()}
    assert [rows[i]["preorder"] for i in range(4)] == [0, 1, 2, 3]
    assert [rows[i]["postorder"] for i in range(4)] == [3, 2, 1, 0]
    assert rows[0]["parent"] is None and rows[3]["parent"] == 2


def test_dfs_ordering_branching(spark):
    # 0 -> {1, 4}; 1 -> {2, 3}: ascending-id visit order fixes the result
    edges = [(0, 1), (0, 4), (1, 2), (1, 3)]
    g = Graph.from_edge_list(spark, edges, directed=False)
    rows = {r["id"]: r for r in dfs.dfs_ordering(g.symmetrized(), 0).collect()}
    assert rows[1]["preorder"] == 1
    assert rows[2]["preorder"] == 2
    assert rows[3]["preorder"] == 3
    assert rows[4]["preorder"] == 4
    # postorder: 2, 3 finish before 1; 4 before 0
    assert rows[2]["postorder"] < rows[1]["postorder"]
    assert rows[3]["postorder"] < rows[1]["postorder"]
    assert rows[0]["postorder"] == 4


def test_dfs_unreachable_omitted_directed(spark):
    g = Graph.from_edge_list(spark, [(0, 1), (2, 0)], directed=True)
    ids = {r["id"] for r in dfs.dfs_ordering(g.edges, 0, directed=True).collect()}
    assert ids == {0, 1}


def test_dfs_edges_stream(spark):
    g = Graph.from_edge_list(spark, [(0, 1), (1, 2)], directed=False)
    rows = dfs.dfs_edges(g.symmetrized(), 0).collect()
    assert [(r["step"], r["src"], r["dst"]) for r in rows] == [(0, 0, 1), (1, 1, 2)]


def test_dfs_size_guard(spark):
    g = Graph.from_edge_list(spark, [(0, 1), (1, 2), (2, 3)], directed=False)
    with pytest.raises(ValueError):
        dfs.dfs_ordering(g.symmetrized(), 0, max_edges=1)
