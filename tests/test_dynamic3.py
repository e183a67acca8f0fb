"""Dynamic betweenness / top-harmonic / b-suitor: incremental updates must
match from-scratch recomputation (the reference's own test strategy for
the Dyn* family)."""

import pytest
from pyspark.sql import functions as F

from icebug_spark.graph.core import Graph
from icebug_spark.operators.centrality2 import betweenness_sampled
from icebug_spark.streaming.dynamic3 import (
    DynamicBSuitorMatcher,
    DynBetweenness,
    DynTopHarmonicCloseness,
)

BASE = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (0, 7), (7, 8), (8, 9)]
NODES = list(range(10))


def _eu(spark, extra=()):
    return Graph.from_edge_list(spark, BASE + list(extra), directed=False).symmetrized()


def _scores(df, key):
    return {r["id"]: r[key] for r in df.collect()}


def test_dyn_betweenness_matches_recompute(spark):
    dyn = DynBetweenness(_eu(spark), NODES)
    # long-range shortcut: most sources affected
    n1 = dyn.insert_edge(0, 5)
    assert n1 > 0
    exp = _scores(betweenness_sampled(_eu(spark, [(0, 5)]), NODES), "betweenness")
    assert _scores(dyn.scores(), "betweenness") == exp
    # gap-1 edge (σ-only change) must still be tracked
    n2 = dyn.insert_edge(1, 7)  # d(0,1)=1, d(0,7)=1 … check via global recompute
    exp2 = _scores(
        betweenness_sampled(_eu(spark, [(0, 5), (1, 7)]), NODES), "betweenness"
    )
    assert _scores(dyn.scores(), "betweenness") == exp2


def test_dyn_betweenness_one_node_matches_brandes(spark):
    """bc(x) from the pairwise σ-dependency formula must equal static
    Brandes after every event batch (reference DynBetweennessOneNode.hpp:31
    semantics: betweenness of one tracked node under insertions)."""
    from icebug_spark.streaming.dynamic3 import DynBetweennessOneNode

    x = 1
    dyn = DynBetweennessOneNode(_eu(spark), x, NODES)

    def exact(extra):
        s = _scores(betweenness_sampled(_eu(spark, extra), NODES), "betweenness")
        return s.get(x, 0.0)

    assert dyn.score() == pytest.approx(exact([]), abs=1e-6)
    assert dyn.insert_edge(0, 5) > 0
    assert dyn.score() == pytest.approx(exact([(0, 5)]), abs=1e-6)
    # σ-only change (gap 1) must also be tracked
    dyn.insert_edge(1, 7)
    assert dyn.score() == pytest.approx(exact([(0, 5), (1, 7)]), abs=1e-6)
    # edge far from x still shifts pair dependencies through x's branch
    dyn.insert_edge(6, 9)
    assert dyn.score() == pytest.approx(
        exact([(0, 5), (1, 7), (6, 9)]), abs=1e-6
    )


def test_dyn_betweenness_gap_zero_is_noop(spark):
    # 4-cycle: nodes 1 and 3 are both at distance 1 from 0 and 2 — an edge
    # between them has gap 0 from EVERY source on the cycle
    cyc = Graph.from_edge_list(
        spark, [(0, 1), (1, 2), (2, 3), (3, 0)], directed=False
    ).symmetrized()
    dyn = DynBetweenness(cyc, [0, 1, 2, 3])
    assert dyn.insert_edge(1, 3) == 2  # sources 1 and 3 see gap 2 (0 vs 2)
    exp = _scores(
        betweenness_sampled(
            Graph.from_edge_list(
                spark, [(0, 1), (1, 2), (2, 3), (3, 0), (1, 3)], directed=False
            ).symmetrized(),
            [0, 1, 2, 3],
        ),
        "betweenness",
    )
    assert _scores(dyn.scores(), "betweenness") == exp


def test_dyn_top_harmonic_matches_recompute(spark):
    dyn = DynTopHarmonicCloseness(_eu(spark), NODES, k=5)
    dyn.insert_edge(2, 9)
    from icebug_spark.operators.traversal import multi_source_bfs

    d = multi_source_bfs(_eu(spark, [(2, 9)]), NODES)
    exp = (
        d.where(F.col("dist") > 0)
        .groupBy(F.col("source").alias("id"))
        .agg(F.round(F.sum(1.0 / F.col("dist")), 6).alias("harmonic"))
    )
    exp_top = [(r["id"], r["harmonic"]) for r in exp.orderBy(F.desc("harmonic"), "id").limit(5).collect()]
    got_top = [(r["id"], r["harmonic"]) for r in dyn.top_k().collect()]
    assert got_top == exp_top


def _assert_valid_matching(matcher, b):
    m = matcher.matching.collect()
    edges = {
        (min(r["src"], r["dst"]), max(r["src"], r["dst"])): r["weight"]
        for r in matcher.edges.collect()
    }
    degree = {}
    for r in m:
        assert (r["u"], r["v"]) in edges
        degree[r["u"]] = degree.get(r["u"], 0) + 1
        degree[r["v"]] = degree.get(r["v"], 0) + 1
    assert all(c <= b for c in degree.values())
    return m


def test_dynamic_bsuitor_insert_dominating_edge(spark):
    e = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 2.0), (2, 3, 1.0)], "src BIGINT, dst BIGINT, weight DOUBLE"
    )
    dyn = DynamicBSuitorMatcher(e, b=1)
    base = _assert_valid_matching(dyn, 1)
    assert (1, 2) in {(r["u"], r["v"]) for r in base}
    # a 10.0 edge between the matched pair's endpoints' neighbors must win
    dyn.insert_edge(0, 3, 10.0)
    m = _assert_valid_matching(dyn, 1)
    pairs = {(r["u"], r["v"]) for r in m}
    assert (0, 3) in pairs
    assert (1, 2) in pairs  # still the best for 1-2


def test_dynamic_bsuitor_remove_repairs(spark):
    e = spark.createDataFrame(
        [(0, 1, 5.0), (1, 2, 2.0), (0, 2, 1.0)], "src BIGINT, dst BIGINT, weight DOUBLE"
    )
    dyn = DynamicBSuitorMatcher(e, b=1)
    assert {(r["u"], r["v"]) for r in dyn.matching.collect()} == {(0, 1)}
    dyn.remove_edge(0, 1)
    m = _assert_valid_matching(dyn, 1)
    assert {(r["u"], r["v"]) for r in m} == {(1, 2)}


def test_dynamic_bsuitor_b2(spark):
    e = spark.createDataFrame(
        [(0, 1, 3.0), (0, 2, 2.0), (0, 3, 1.0), (2, 3, 5.0)],
        "src BIGINT, dst BIGINT, weight DOUBLE",
    )
    dyn = DynamicBSuitorMatcher(e, b=2)
    _assert_valid_matching(dyn, 2)
    dyn.insert_edge(1, 2, 9.0)
    m = _assert_valid_matching(dyn, 2)
    assert (1, 2) in {(r["u"], r["v"]) for r in m}


def test_dyn_sssp_update_insert_and_remove(spark):
    from icebug_spark.operators.traversal import sssp_weighted
    from icebug_spark.streaming.dynamic3 import dyn_sssp_update

    base = [(0, 1, 1.0), (1, 2, 2.0), (2, 3, 1.0), (0, 4, 10.0)]
    e0 = spark.createDataFrame(base, "src BIGINT, dst BIGINT, weight DOUBLE")
    sym0 = e0.union(e0.selectExpr("dst as src", "src as dst", "weight"))
    d0 = sssp_weighted(sym0, 0)
    # insert shortcut 3-4 (0.5): distance to 4 drops via 0-1-2-3-4 = 4.5
    e1 = spark.createDataFrame(
        base + [(3, 4, 0.5)], "src BIGINT, dst BIGINT, weight DOUBLE"
    )
    batch = spark.createDataFrame(
        [(0, "EDGE_ADDITION", 3, 4, 0.5)], "seq LONG, type STRING, u LONG, v LONG, w DOUBLE"
    )
    got = {r["id"]: r["dist"] for r in dyn_sssp_update(d0, e1, batch).collect()}
    sym1 = e1.union(e1.selectExpr("dst as src", "src as dst", "weight"))
    exp = {r["id"]: r["dist"] for r in sssp_weighted(sym1, 0).collect()}
    assert got == exp
    # removal: drop 0-1, paths reroute via 0-4-3-2-1
    e2 = spark.createDataFrame(
        [(1, 2, 2.0), (2, 3, 1.0), (0, 4, 10.0), (3, 4, 0.5)],
        "src BIGINT, dst BIGINT, weight DOUBLE",
    )
    batch2 = spark.createDataFrame(
        [(1, "EDGE_REMOVAL", 0, 1, None)], "seq LONG, type STRING, u LONG, v LONG, w DOUBLE"
    )
    d1 = spark.createDataFrame(
        [(k, v) for k, v in exp.items()], "id BIGINT, dist DOUBLE"
    )
    got2 = {r["id"]: r["dist"] for r in dyn_sssp_update(d1, e2, batch2).collect()}
    sym2 = e2.union(e2.selectExpr("dst as src", "src as dst", "weight"))
    exp2 = {r["id"]: r["dist"] for r in sssp_weighted(sym2, 0).collect()}
    assert got2 == exp2


def test_dyn_apsp_matches_recompute(spark):
    from icebug_spark.operators.traversal import multi_source_bfs
    from icebug_spark.streaming.dynamic3 import DynAPSP

    eu = _eu(spark)
    dyn = DynAPSP(eu, NODES)
    n = dyn.insert_edge(0, 5)
    assert n > 0
    exp = {
        (r["source"], r["id"]): r["dist"]
        for r in multi_source_bfs(_eu(spark, [(0, 5)]), NODES).collect()
    }
    got = {
        (r["source"], r["id"]): r["dist"] for r in dyn.distances().collect()
    }
    assert got == exp


def test_dgs_writer_roundtrip(spark, tmp_path):
    from icebug_spark.sources.readers import read_dgs_events, write_dgs_events

    events = spark.createDataFrame(
        [
            (0, "NODE_ADDITION", 0, None, None),
            (1, "NODE_ADDITION", 1, None, None),
            (2, "EDGE_ADDITION", 0, 1, 2.5),
            (3, "TIME_STEP", 1, None, None),
            (4, "EDGE_REMOVAL", 0, 1, None),
        ],
        "seq LONG, type STRING, u LONG, v LONG, w DOUBLE",
    )
    p = str(tmp_path / "ev.dgs")
    write_dgs_events(events, p)
    back = read_dgs_events(spark, p).orderBy("seq").collect()
    types = [r["type"] for r in back]
    assert types == [
        "NODE_ADDITION", "NODE_ADDITION", "EDGE_ADDITION", "TIME_STEP", "EDGE_REMOVAL",
    ]
    ae = [r for r in back if r["type"] == "EDGE_ADDITION"][0]
    assert (ae["u"], ae["v"], ae["w"]) == (0, 1, 2.5)
