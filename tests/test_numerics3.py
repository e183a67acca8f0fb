"""LAMG-style multilevel Laplacian solver vs numpy pseudo-inverse."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from icebug_spark.graph.core import Graph
from icebug_spark.operators.numerics3 import lamg_hierarchy, lamg_solve


def _laplacian(n, edges):
    L = np.zeros((n, n))
    for u, v, w in edges:
        L[u, u] += w
        L[v, v] += w
        L[u, v] -= w
        L[v, u] -= w
    return L


def test_lamg_path_matches_pinv(spark):
    # n=24/coarsest=10 keeps the SAME failure modes as the original
    # n=40/14 instance (≥1 real aggregation level, V-cycle + coarse CG,
    # the round-4 stats-OOM loop shape) at roughly half the Spark jobs —
    # the suite-tail trim the round-5 verdict asked for.
    n = 24
    edges = [(i, i + 1, 1.0) for i in range(n - 1)]
    g = Graph.from_edge_list(spark, edges, directed=False, weighted=True)
    b = spark.createDataFrame(
        [(0, 1.0), (n - 1, -1.0)] + [(i, 0.0) for i in range(1, n - 1)],
        "id BIGINT, x DOUBLE",
    )
    hier = lamg_hierarchy(g.edges, coarsest=10, max_levels=2, elim_stages=0)
    assert len(hier["levels"]) >= 1  # actually multilevel, not a driver solve
    x = {
        r["id"]: r["x"]
        for r in lamg_solve(
            g.edges, b, tol=1e-8, max_cycles=20, hierarchy=hier
        ).collect()
    }
    exp = np.linalg.pinv(_laplacian(n, edges)) @ np.array(
        [1.0] + [0.0] * (n - 2) + [-1.0]
    )
    exp -= exp.mean()
    for i in range(n):
        assert x[i] == pytest.approx(exp[i], abs=1e-5)
    # effective resistance across a unit path = its length
    assert x[0] - x[n - 1] == pytest.approx(n - 1, abs=1e-4)


def test_lamg_weighted_grid_and_hierarchy_reuse(spark):
    # 4x4 grid with varied weights; solve two right-hand sides on one
    # hierarchy (the reference's setup/solve split). Same failure modes
    # as the original 5x5 (2D topology, mixed weights, hierarchy reuse
    # across RHS) at ~60% of the Spark jobs.
    n = 4
    edges = []
    nid = lambda r, c: r * n + c
    for r in range(n):
        for c in range(n):
            if c + 1 < n:
                edges.append((nid(r, c), nid(r, c + 1), 1.0 + ((r + c) % 3)))
            if r + 1 < n:
                edges.append((nid(r, c), nid(r + 1, c), 1.0 + ((r * c) % 2)))
    g = Graph.from_edge_list(spark, edges, directed=False, weighted=True)
    hier = lamg_hierarchy(g.edges, coarsest=8, max_levels=2, elim_stages=0)
    assert len(hier["levels"]) >= 1
    L = _laplacian(n * n, edges)
    P = np.linalg.pinv(L)
    for s, t in [(0, 15), (5, 10)]:
        vec = np.zeros(n * n)
        vec[s], vec[t] = 1.0, -1.0
        b = spark.createDataFrame(
            [(i, float(vec[i])) for i in range(n * n)], "id BIGINT, x DOUBLE"
        )
        x = {
            r["id"]: r["x"]
            for r in lamg_solve(
                g.edges, b, tol=1e-8, max_cycles=20, hierarchy=hier
            ).collect()
        }
        exp = P @ vec
        exp -= exp.mean()
        for i in range(n * n):
            assert x[i] == pytest.approx(exp[i], abs=1e-4)


def test_lamg_elimination_path_matches_pinv(spark):
    """A unit path is solved by the elimination phase ALONE (every
    interior node is degree-2): hierarchy has elim stages, zero
    aggregation levels, and the exact star-mesh elimination +
    back-substitution must reproduce the pseudo-inverse solution."""
    n = 40
    edges = [(i, i + 1, 1.0) for i in range(n - 1)]
    g = Graph.from_edge_list(spark, edges, directed=False, weighted=True)
    hier = lamg_hierarchy(g.edges, coarsest=14, max_levels=2)
    assert hier["elim"], "low-degree elimination must engage on a path"
    b = spark.createDataFrame(
        [(0, 1.0), (n - 1, -1.0)] + [(i, 0.0) for i in range(1, n - 1)],
        "id BIGINT, x DOUBLE",
    )
    x = {
        r["id"]: r["x"]
        for r in lamg_solve(
            g.edges, b, tol=1e-8, max_cycles=20, hierarchy=hier
        ).collect()
    }
    exp = np.linalg.pinv(_laplacian(n, edges)) @ np.array(
        [1.0] + [0.0] * (n - 2) + [-1.0]
    )
    exp -= exp.mean()
    assert len(x) == n
    for i in range(n):
        assert x[i] == pytest.approx(exp[i], abs=1e-5)
    assert x[0] - x[n - 1] == pytest.approx(n - 1, abs=1e-4)


def test_lamg_elimination_plus_aggregation_matches_pinv(spark):
    """Hub clique + leaf fringe: elimination strips the degree-1 leaves
    exactly, aggregation then coarsens the remaining clique — BOTH
    hierarchy mechanisms engage and the solve matches pinv."""
    hubs = list(range(8))
    edges = [(u, v, 1.0) for u in hubs for v in hubs if u < v]
    leaf = 8
    for h in hubs:
        for _ in range(4):
            edges.append((h, leaf, 1.0))
            leaf += 1
    n = leaf
    g = Graph.from_edge_list(spark, edges, directed=False, weighted=True)
    hier = lamg_hierarchy(g.edges, coarsest=4, max_levels=3)
    assert hier["elim"], "leaves must be eliminated"
    assert hier["levels"], "the hub clique must still need aggregation"
    rng = np.random.RandomState(11)
    vec = rng.rand(n)
    vec -= vec.mean()
    b = spark.createDataFrame(
        [(i, float(vec[i])) for i in range(n)], "id BIGINT, x DOUBLE"
    )
    x = {
        r["id"]: r["x"]
        for r in lamg_solve(
            g.edges, b, tol=1e-9, max_cycles=30, hierarchy=hier
        ).collect()
    }
    exp = np.linalg.pinv(_laplacian(n, edges)) @ vec
    exp -= exp.mean()
    assert len(x) == n
    for i in range(n):
        assert x[i] == pytest.approx(exp[i], abs=1e-5)


def test_lamg_star_stall_guard_matches_pinv(spark):
    """A star stalls matching-based coarsening (one matched pair per
    level). With elimination disabled, the stall guard must stop
    aggregating after the <10%-reduction level instead of grinding
    max_levels, and the size-guarded direct coarse solve still yields
    the exact pseudo-inverse solution."""
    n = 41  # hub 0 + 40 leaves
    edges = [(0, i, 1.0) for i in range(1, n)]
    g = Graph.from_edge_list(spark, edges, directed=False, weighted=True)
    hier = lamg_hierarchy(g.edges, coarsest=4, max_levels=12, elim_stages=0)
    assert len(hier["levels"]) <= 2, "stall guard must stop early on a star"
    b = spark.createDataFrame(
        [(0, 1.0), (n - 1, -1.0)] + [(i, 0.0) for i in range(1, n - 1)],
        "id BIGINT, x DOUBLE",
    )
    x = {
        r["id"]: r["x"]
        for r in lamg_solve(
            g.edges, b, tol=1e-9, max_cycles=20, hierarchy=hier
        ).collect()
    }
    exp = np.linalg.pinv(_laplacian(n, edges)) @ np.array(
        [1.0] + [0.0] * (n - 2) + [-1.0]
    )
    exp -= exp.mean()
    assert len(x) == n
    for i in range(n):
        assert x[i] == pytest.approx(exp[i], abs=1e-6)
