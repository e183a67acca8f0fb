"""I/O readers/writers + generator property tests."""

import os

import pytest
from pyspark.sql import functions as F

from icebug_spark.graph.core import Graph


def test_edge_list_roundtrip(spark, tmp_path):
    from icebug_spark.sources.readers import read_edge_list, write_edge_list

    g = Graph.from_edge_list(spark, [(0, 1), (1, 2), (2, 3)], directed=False)
    path = str(tmp_path / "el")
    write_edge_list(g, path)
    g2 = read_edge_list(spark, path)
    assert sorted(map(tuple, g2.edges.collect())) == [(0, 1), (1, 2), (2, 3)]


def test_edge_list_weighted_and_one_based(spark, tmp_path):
    from icebug_spark.sources.readers import read_edge_list

    p = tmp_path / "w.txt"
    p.write_text("# comment\n1 2 0.5\n2 3 1.5\n")
    g = read_edge_list(spark, str(p), first_node=1)
    rows = sorted(map(tuple, g.edges.collect()))
    assert rows == [(0, 1, 0.5), (1, 2, 1.5)]
    assert g.weighted


def test_metis_roundtrip(spark, tmp_path):
    from icebug_spark.sources.readers import read_metis, write_metis

    g = Graph.from_edge_list(spark, [(0, 1), (1, 2), (0, 2)], directed=False)
    path = str(tmp_path / "g.metis")
    write_metis(g, path)
    g2 = read_metis(spark, path)
    assert sorted(map(tuple, g2.edges.collect())) == [(0, 1), (0, 2), (1, 2)]


def test_gml_reader(spark, tmp_path):
    from icebug_spark.sources.readers import read_gml

    p = tmp_path / "g.gml"
    p.write_text(
        "graph [\n node [ id 0 ]\n node [ id 1 ]\n"
        " edge [ source 0 target 1 ]\n edge [ source 1 target 2 ]\n]\n"
    )
    g = read_gml(spark, str(p))
    assert sorted(map(tuple, g.edges.collect())) == [(0, 1), (1, 2)]


def test_dgs_events(spark, tmp_path):
    from icebug_spark.sources.readers import read_dgs_events

    p = tmp_path / "g.dgs"
    p.write_text("an 0\nan 1\nae e0 0 1 2.5\nst 1\nde e0 0 1\n")
    ev = read_dgs_events(spark, str(p)).orderBy("seq").collect()
    types = [r["type"] for r in ev]
    assert types == [
        "NODE_ADDITION",
        "NODE_ADDITION",
        "EDGE_ADDITION",
        "TIME_STEP",
        "EDGE_REMOVAL",
    ]
    assert ev[2]["u"] == 0 and ev[2]["v"] == 1 and ev[2]["w"] == 2.5


def test_erdos_renyi_deterministic_and_plausible(spark):
    from icebug_spark.sources.generators import erdos_renyi

    g1 = erdos_renyi(spark, 100, 0.1, seed=7)
    g2 = erdos_renyi(spark, 100, 0.1, seed=7)
    m1 = g1.number_of_edges()
    assert m1 == g2.number_of_edges()
    expected = 0.1 * 100 * 99 / 2
    assert 0.6 * expected < m1 < 1.4 * expected


def test_rmat_shape(spark):
    from icebug_spark.sources.generators import rmat

    g = rmat(spark, scale=6, edge_factor=4)
    n_max = g.vertices.agg(F.max("id")).collect()[0][0]
    assert n_max < 64
    assert g.number_of_edges() > 100
    # skew: top-degree node should dominate the mean (power-ish law)
    degs = [r["degree"] for r in g.out_degrees().collect()]
    assert max(degs) > 3 * (sum(degs) / len(degs))


def test_watts_strogatz(spark):
    from icebug_spark.sources.generators import watts_strogatz

    g = watts_strogatz(spark, 50, 2, beta=0.1, seed=3)
    m = g.number_of_edges()
    assert 80 <= m <= 100  # 50*2 ring edges minus rewire collisions


def test_sbm_block_density(spark):
    from icebug_spark.sources.generators import stochastic_block_model

    g = stochastic_block_model(spark, [30, 30], p_in=0.5, p_out=0.02, seed=5)
    e = g.edges.collect()
    intra = sum(1 for r in e if (r["src"] < 30) == (r["dst"] < 30))
    inter = len(e) - intra
    assert intra > 5 * max(inter, 1)


def test_chung_lu_degree_bias(spark):
    from icebug_spark.sources.generators import chung_lu

    w = [20.0] * 5 + [1.0] * 45
    g = chung_lu(spark, w, seed=11)
    deg = {r["id"]: r["degree"] for r in g.degrees().collect()}
    heavy = sum(deg.get(i, 0) for i in range(5)) / 5
    light = sum(deg.get(i, 0) for i in range(5, 50)) / 45
    assert heavy > 3 * light


def test_barabasi_albert(spark):
    from icebug_spark.sources.generators import barabasi_albert_batched

    g = barabasi_albert_batched(spark, 120, 2, seed=13)
    n = g.number_of_nodes()
    assert n >= 110
    degs = sorted((r["degree"] for r in g.degrees().collect()), reverse=True)
    assert degs[0] > 3 * degs[len(degs) // 2]  # heavy tail
