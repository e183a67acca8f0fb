"""Forest centrality vs exact numpy forest matrix, chromatic Gauss-Seidel
vs numpy solve, greedy coloring properness, overlapper/projector,
global curveball invariants, LR planarity known cases."""

import itertools

import numpy as np
import pytest
from pyspark.sql import functions as F

from icebug_spark.graph.core import Graph
from icebug_spark.operators import numerics2, overlap, planarity


def _g(spark, edges):
    return Graph.from_edge_list(spark, edges, directed=False).symmetrized()


PATH = [(0, 1), (1, 2), (2, 3), (3, 4)]
STAR = [(0, i) for i in range(1, 6)]


def _exact_forest_closeness(edges, n):
    L = np.zeros((n, n))
    for u, v in edges:
        L[u, u] += 1
        L[v, v] += 1
        L[u, v] -= 1
        L[v, u] -= 1
    omega = np.linalg.inv(np.eye(n) + L)
    f = {}
    for v in range(n):
        far = sum(
            omega[v, v] + omega[u, u] - 2 * omega[v, u] for u in range(n)
        )
        f[v] = (n - 1) / far
    return f


@pytest.mark.parametrize("edges,n", [(PATH, 5), (STAR, 6)])
def test_forest_centrality_matches_exact(spark, edges, n):
    got = {
        r["id"]: r["forest_closeness"]
        for r in numerics2.forest_centrality(
            _g(spark, edges), nodes=list(range(n)), max_iter=60, exact_trace=True
        ).collect()
    }
    exp = _exact_forest_closeness(edges, n)
    for v in range(n):
        # CG + exact trace: only CG tolerance noise remains
        assert got[v] == pytest.approx(exp[v], rel=1e-4), (v, got[v], exp[v])


def test_forest_centrality_ranks_center_higher(spark):
    got = {
        r["id"]: r["forest_closeness"]
        for r in numerics2.forest_centrality(
            _g(spark, PATH), nodes=[0, 2], max_iter=60, exact_trace=True
        ).collect()
    }
    assert got[2] > got[0]


def test_greedy_coloring_proper(spark):
    edges = [(i, j) for i, j in itertools.combinations(range(6), 2) if (i + j) % 3]
    g = _g(spark, edges)
    col = {r["id"]: r["color"] for r in numerics2.greedy_coloring(g).collect()}
    for u, v in edges:
        assert col[u] != col[v]


def test_gauss_seidel_solves_sdd(spark):
    # (L + I) x = b on the path graph — strictly diagonally dominant-ish,
    # GS converges; compare against numpy
    n = 5
    g = _g(spark, PATH)
    deg = {i: 0 for i in range(n)}
    for u, v in PATH:
        deg[u] += 1
        deg[v] += 1
    diag = spark.createDataFrame([(i, float(deg[i] + 1)) for i in range(n)], "id LONG, diag DOUBLE")
    b = spark.createDataFrame([(i, float(i + 1)) for i in range(n)], "id LONG, x DOUBLE")
    x = {
        r["id"]: r["x"]
        # 25 sweeps: measured error 2.9e-10 on this system — 30x inside
        # the 1e-8 assert (60 was 35 pure-overhead color-class jobs extra)
        for r in numerics2.gauss_seidel_relaxation(g, diag, b, sweeps=25).collect()
    }
    L = np.zeros((n, n))
    for u, v in PATH:
        L[u, u] += 1; L[v, v] += 1; L[u, v] -= 1; L[v, u] -= 1
    exp = np.linalg.solve(L + np.eye(n), np.arange(1.0, n + 1))
    for i in range(n):
        assert x[i] == pytest.approx(exp[i], abs=1e-8)


def test_gauss_seidel_isolated_node(spark):
    """A node in b/diag with no incident edges is outside every greedy
    color class; it must still be swept to b_i/diag_i (regression:
    uncolored nodes silently kept x = x0 = 0)."""
    g = _g(spark, [(0, 1)])
    diag = spark.createDataFrame(
        [(0, 2.0), (1, 2.0), (5, 2.0)], "id LONG, diag DOUBLE"
    )
    b = spark.createDataFrame(
        [(0, 1.0), (1, 1.0), (5, 4.0)], "id LONG, x DOUBLE"
    )
    x = {
        r["id"]: r["x"]
        # 20 sweeps: pair-system GS error ~3e-11, well inside 1e-8
        for r in numerics2.gauss_seidel_relaxation(g, diag, b, sweeps=20).collect()
    }
    # isolated node: A restricted to it is just the diagonal → x = b/diag
    assert x[5] == pytest.approx(2.0, abs=1e-12)
    # connected pair: (L+I)x=b with L for single edge → x = [1, 1] / ... solve
    L = np.array([[1.0, -1.0], [-1.0, 1.0]])
    exp = np.linalg.solve(L + np.eye(2), np.array([1.0, 1.0]))
    assert x[0] == pytest.approx(exp[0], abs=1e-8)
    assert x[1] == pytest.approx(exp[1], abs=1e-8)


def test_hashing_overlapper_core_clusters(spark):
    p1 = spark.createDataFrame([(0, 0), (1, 0), (2, 1), (3, 1)], "id LONG, cluster LONG")
    p2 = spark.createDataFrame([(0, 5), (1, 6), (2, 7), (3, 7)], "id LONG, cluster LONG")
    core = {r["id"]: r["cluster"] for r in overlap.hashing_overlapper([p1, p2]).collect()}
    # only 2,3 agree in both partitions
    assert core[2] == core[3]
    assert len({core[0], core[1], core[2]}) == 3


def test_project_back(spark):
    f2c = spark.createDataFrame([(0, 10), (1, 10), (2, 11)], "id LONG, super LONG")
    zc = spark.createDataFrame([(10, 0), (11, 1)], "id LONG, cluster LONG")
    got = {r["id"]: r["cluster"] for r in overlap.project_back(f2c, zc).collect()}
    assert got == {0: 0, 1: 0, 2: 1}


def test_global_curveball_preserves_degrees(spark):
    from icebug_spark.operators.randomization import global_curveball

    edges = [(i, (i + k) % 12) for i in range(12) for k in (1, 2)]
    eu = _g(spark, edges)
    before = {r["src"]: r["n"] for r in eu.groupBy("src").agg(F.count(F.lit(1)).alias("n")).collect()}
    shuffled = global_curveball(eu, global_trades=3, seed=9)
    after = {r["src"]: r["n"] for r in shuffled.groupBy("src").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert before == after
    # symmetric + loop-free
    sym = shuffled.select("src", "dst").exceptAll(
        shuffled.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    assert sym.count() == 0
    assert shuffled.where(F.col("src") == F.col("dst")).count() == 0


PLANAR_CASES = [
    ([(0, 1), (1, 2), (2, 0)], True),                      # triangle
    (list(itertools.combinations(range(4), 2)), True),     # K4
    (list(itertools.combinations(range(5), 2)), False),    # K5
    ([(a, b + 3) for a in range(3) for b in range(3)], False),  # K33
]


@pytest.mark.parametrize("edges,expected", PLANAR_CASES)
def test_planarity_known(spark, edges, expected):
    assert planarity.is_planar(_g(spark, edges)) is expected


def test_planarity_subdivisions(spark):
    K33 = [(a, b + 3) for a in range(3) for b in range(3)]
    sub, nid = [], 6
    for u, v in K33:
        sub += [(u, nid), (nid, v)]
        nid += 1
    assert planarity.is_planar(_g(spark, sub)) is False
    petersen = (
        [(i, (i + 1) % 5) for i in range(5)]
        + [(i, i + 5) for i in range(5)]
        + [(5 + i, 5 + (i + 2) % 5) for i in range(5)]
    )
    assert planarity.is_planar(_g(spark, petersen)) is False
    grid = [(i * 4 + j, i * 4 + j + 1) for i in range(4) for j in range(3)] + [
        (i * 4 + j, (i + 1) * 4 + j) for i in range(3) for j in range(4)
    ]
    assert planarity.is_planar(_g(spark, grid)) is True
