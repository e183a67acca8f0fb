"""Community detection tests: invariants + planted-partition recovery
(the reference's PLP/PLM are thread-order nondeterministic, so tests
assert quality/validity, not exact labels — SURVEY.md §7)."""

import pytest
from pyspark.sql import functions as F

from icebug_spark.graph.core import Graph

# two 4-cliques joined by one bridge edge
CLIQUE_A = [(a, b) for a in range(4) for b in range(a + 1, 4)]
CLIQUE_B = [(a, b) for a in range(4, 8) for b in range(a + 1, 8)]
BRIDGE = [(3, 4)]
TWO_CLIQUES = CLIQUE_A + CLIQUE_B + BRIDGE


@pytest.fixture(scope="module")
def g(spark):
    return Graph.from_edge_list(spark, TWO_CLIQUES, directed=False)


def _communities(part_rows):
    comm = {}
    for r in part_rows:
        comm.setdefault(r["subset"], set()).add(r["id"])
    return sorted(comm.values(), key=min)


def test_plp_recovers_cliques(g):
    from icebug_spark.operators.community import label_propagation

    part = label_propagation(g.symmetrized(), max_iter=10).collect()
    comms = _communities(part)
    assert {0, 1, 2, 3} in comms or any({0, 1, 2, 3} <= c for c in comms)


def test_louvain_recovers_cliques(g):
    from icebug_spark.operators.community import louvain

    part = louvain(g.symmetrized(), levels=1).collect()
    comms = _communities(part)
    assert comms == [{0, 1, 2, 3}, {4, 5, 6, 7}]


def test_louvain_modularity_positive(g):
    from icebug_spark.operators.community import louvain, modularity

    part = louvain(g.symmetrized(), levels=1)
    q = modularity(g.symmetrized(), part).collect()[0]["modularity"]
    # planted two-clique modularity ≈ 0.423
    assert q > 0.35


def test_modularity_singleton_vs_one(g, spark):
    from icebug_spark.operators.community import (
        modularity,
        one_clustering,
        singleton_clustering,
    )

    nodes = g.vertices
    q_one = modularity(g.symmetrized(), one_clustering(nodes)).collect()[0][0]
    assert q_one == 0.0  # all-in-one: Q = 1 - 1 = 0 for gamma=1
    q_single = modularity(g.symmetrized(), singleton_clustering(nodes)).collect()[0][0]
    assert q_single < 0  # singletons: no intra edges


def test_coverage_and_edge_cut(g, spark):
    from icebug_spark.operators.community import coverage, edge_cut, hash_clustering

    part = spark.createDataFrame(
        [(i, 0 if i < 4 else 1) for i in range(8)], ["id", "subset"]
    )
    cov = coverage(g.symmetrized(), part).collect()[0]["coverage"]
    assert cov == pytest.approx(12 / 13, abs=1e-6)  # 1 of 13 edges crosses
    cut = edge_cut(g.symmetrized(), part).collect()[0]["edge_cut"]
    assert cut == 1


def test_conductance(g, spark):
    from icebug_spark.operators.community import conductance_per_subset

    part = spark.createDataFrame(
        [(i, 0 if i < 4 else 1) for i in range(8)], ["id", "subset"]
    )
    rows = {r["subset"]: r["conductance"] for r in conductance_per_subset(g.symmetrized(), part).collect()}
    # each side: cut=1, vol=13 arcs → 1/13
    assert rows[0] == pytest.approx(1 / 13, abs=1e-6)


def test_nmi_ari_identical_partitions(g, spark):
    from icebug_spark.operators.community import adjusted_rand, nmi, rand_index

    part = spark.createDataFrame(
        [(i, 0 if i < 4 else 1) for i in range(8)], ["id", "subset"]
    )
    assert nmi(part, part).collect()[0]["nmi"] == 1.0
    assert adjusted_rand(part, part).collect()[0]["ari"] == 1.0
    assert rand_index(part, part).collect()[0]["rand"] == 1.0


def test_nmi_independent_partitions(spark):
    from icebug_spark.operators.community import nmi

    pa = spark.createDataFrame([(i, i % 2) for i in range(8)], ["id", "subset"])
    pb = spark.createDataFrame([(i, i // 4) for i in range(8)], ["id", "subset"])
    # orthogonal partitions → MI = 0
    assert nmi(pa, pb).collect()[0]["nmi"] == 0.0


def test_partition_intersection(spark):
    from icebug_spark.operators.community import partition_intersection

    pa = spark.createDataFrame([(i, i % 2) for i in range(4)], ["id", "subset"])
    pb = spark.createDataFrame([(i, i // 2) for i in range(4)], ["id", "subset"])
    inter = {r["id"]: r["subset"] for r in partition_intersection(pa, pb).collect()}
    # cells: (0,0)->0 {0}, (1,0)->{1}, (0,1)->{2}, (1,1)->{3}
    assert len(set(inter.values())) == 4


def test_coarsen(g, spark):
    from icebug_spark.operators.community import coarsen

    part = spark.createDataFrame(
        [(i, 0 if i < 4 else 1) for i in range(8)], ["id", "subset"]
    )
    e = g.symmetrized().withColumn("weight", F.lit(1.0))
    c = coarsen(e, part).collect()
    w = {(r["src"], r["dst"]): r["weight"] for r in c}
    assert w[(0, 0)] == 12.0  # 6 intra edges × 2 directions
    assert w[(0, 1)] == 1.0 and w[(1, 0)] == 1.0
