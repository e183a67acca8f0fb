"""Plot-surface data sides + dependency gating (icebug_spark.plot vs
reference networkit/plot.py)."""

import pytest

from icebug_spark import plot
from icebug_spark.graph.core import Graph
from icebug_spark.support import MissingDependencyError

# triangle 0-1-2 plus a pendant 3 and an isolated 4
EDGES = [(0, 1), (0, 2), (1, 2), (2, 3)]


def _toy(spark):
    return Graph(
        Graph.from_edge_list(spark, EDGES, directed=False).edges,
        vertices=spark.range(5).selectExpr("id"),
        directed=False,
    )


def test_degree_distribution_dense(spark):
    data = plot.degree_distribution(_toy(spark))
    # degrees: 0:2, 1:2, 2:3, 3:1, 4:0 → counts by degree 0..3
    assert data["degree"].tolist() == [0, 1, 2, 3]
    assert data["count"].tolist() == [1, 1, 2, 1]
    assert data["count"].sum() == 5


def test_connected_components_sizes_sorted(spark):
    data = plot.connected_components_sizes(_toy(spark))
    assert data["size"].tolist() == [4]  # isolated node 4 has no edges
    assert data["fraction"].tolist() == [1.0]
    no_frac = plot.connected_components_sizes(_toy(spark), relative_sizes=False)
    assert "fraction" not in no_frac.columns


def test_core_decomposition_sequence(spark):
    data = plot.core_decomposition_sequence(_toy(spark))
    # 3 is in the 1-shell; 0,1,2 are the 2-core
    assert dict(zip(data["k"], data["shell_size"])) == {1: 1, 2: 3}


def test_clustering_per_degree(spark):
    data = plot.clustering_per_degree(_toy(spark))
    got = dict(zip(data["deg"], data["cc"]))
    # deg-2 nodes (0,1) have cc=1.0; node 3 (deg 1) 0; node 4 (deg 0) 0;
    # node 2 has deg 3 and cc = 2*1/(3*2) = 1/3
    assert got[2] == pytest.approx(1.0)
    assert got[3] == pytest.approx(1.0 / 3.0, abs=1e-6)
    assert got[1] == pytest.approx(0.0)


def test_node_attribute_distribution(spark):
    g = _toy(spark)
    g2 = Graph(
        g.edges,
        vertices=g.vertices.selectExpr("id", "id % 2 AS parity"),
        directed=False,
    )
    data = plot.node_attribute_distribution(g2, "parity")
    assert dict(zip(data["value"], data["count"])) == {0: 3, 1: 2}
    with pytest.raises(ValueError, match="no vertex attribute"):
        plot.node_attribute_distribution(g2, "nope")


def test_render_gate_matches_reference(spark):
    """Reference behavior without matplotlib: MissingDependencyError
    (plot.py:39). In an env WITH matplotlib the render path is live."""
    if plot.have_plt:
        pytest.skip("matplotlib present; gate not exercisable")
    with pytest.raises(MissingDependencyError, match="matplotlib"):
        plot.plot_degree_distribution(_toy(spark))


def test_overview_report(spark, capsys):
    """nk.overview parity (networkit/__init__.py:135): line set, number
    formats, SCC-for-directed component rule."""
    from icebug_spark.operators.profiling import overview

    g = _toy(spark)
    report = overview(g)
    lines = report.splitlines()
    assert lines[0] == "Network Properties:"
    assert "nodes, edges\t\t\t5, 4" in report
    assert "directed?\t\t\tFalse" in report
    assert "isolated nodes\t\t\t1" in report
    assert "self-loops\t\t\t0" in report
    assert "density\t\t\t\t0.400000" in report  # 2*4/(5*4)
    assert "clustering coefficient" in report
    assert "min/max/avg degree\t\t0, 3, 1.600000" in report
    assert "number of connected components\t2" in report
    assert "size of largest component\t4 (80.00 %)" in report
    # directed graphs use SCC and skip the clustering line
    gd = Graph(
        Graph.from_edge_list(spark, [(0, 1), (1, 0), (1, 2)], directed=True).edges,
        vertices=spark.range(3).selectExpr("id"),
        directed=True,
    )
    rd = overview(gd)
    assert "clustering coefficient" not in rd
    assert "number of connected components\t2" in rd  # {0,1}, {2}


def test_nxadapter_gate(spark):
    """nxadapter mirrors the reference's have_nx gate: without networkx
    both directions raise MissingDependencyError; with it they convert."""
    from icebug_spark import nxadapter

    g = _toy(spark)
    if not nxadapter.have_nx:
        with pytest.raises(MissingDependencyError, match="networkx"):
            nxadapter.to_networkx(g)
        with pytest.raises(MissingDependencyError, match="networkx"):
            nxadapter.from_networkx(spark, object())
    else:
        nxg = nxadapter.to_networkx(g)
        assert nxg.number_of_nodes() == 5 and nxg.number_of_edges() == 4
        g2 = nxadapter.from_networkx(spark, nxg)
        assert sorted(
            (r["src"], r["dst"]) for r in g2.edges.collect()
        ) == sorted(EDGES)


def test_overview_counts_self_loop_only_node_as_component(spark):
    """A directed node whose only arc is a self-loop is dropped by the
    SCC kernel and is not isolated (deg>0), yet the reference's
    Partition counts it as its own singleton SCC."""
    from icebug_spark.graph.core import Graph
    from icebug_spark.operators.profiling import overview

    gd = Graph(
        Graph.from_edge_list(
            spark, [(0, 1), (1, 0), (2, 2)], directed=True
        ).edges,
        vertices=spark.range(3).selectExpr("id"),
        directed=True,
    )
    rd = overview(gd)
    assert "self-loops\t\t\t1" in rd
    assert "number of connected components\t2" in rd  # {0,1} and {2}
