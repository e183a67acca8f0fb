"""Goldens for operators/components2.py (Tarjan biconnectivity) and
sources/generators2.py + operators/profiling.py — modules that had no
direct test coverage (their SURVEY rows were credited to other files).

Biconnectivity reference: components/BiconnectedComponents.hpp;
generators reference: generators/{HavelHakimi,DorogovtsevMendes,
PowerlawDegreeSequence,ConfigurationModel,LFR}*.hpp.
"""

from __future__ import annotations

from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from icebug_spark.operators.components2 import (
    articulation_points,
    biconnected_components,
    bridges,
)


def _edges(spark, pairs):
    return spark.createDataFrame(sorted(set(pairs)), "src LONG, dst LONG")


def _brute_articulation(pairs):
    """Brute force: v is an articulation point iff removing it increases
    the number of connected components among the remaining nodes."""
    adj = defaultdict(set)
    for u, v in pairs:
        adj[u].add(v)
        adj[v].add(u)
    nodes = set(adj)

    def n_comps(exclude):
        seen, cnt = set(), 0
        for s in nodes:
            if s == exclude or s in seen:
                continue
            cnt += 1
            stack = [s]
            while stack:
                x = stack.pop()
                if x in seen or x == exclude:
                    continue
                seen.add(x)
                stack.extend(adj[x] - seen - {exclude})
        return cnt

    base = n_comps(None)
    return sorted(
        v for v in nodes if n_comps(v) > base - (0 if len(adj[v]) else 1)
    )


def test_tarjan_two_triangles_bridge(spark):
    pairs = [(0, 1), (1, 2), (2, 0), (10, 11), (11, 12), (12, 10), (2, 10)]
    e = _edges(spark, pairs)
    assert sorted(map(tuple, bridges(e).collect())) == [(2, 10)]
    assert sorted(r["id"] for r in articulation_points(e).collect()) == [2, 10]
    bcc = biconnected_components(e)
    # three biconnected components: each triangle + the bridge edge
    assert bcc.select("bcc").distinct().count() == 3
    by_edge = {(r["u"], r["v"]): r["bcc"] for r in bcc.collect()}
    assert by_edge[(0, 1)] == by_edge[(1, 2)] == by_edge[(0, 2)]
    assert by_edge[(10, 11)] == by_edge[(11, 12)] == by_edge[(10, 12)]
    assert by_edge[(2, 10)] not in (by_edge[(0, 1)], by_edge[(10, 11)])


def test_articulation_matches_bruteforce(spark):
    # lollipop + dangling path + separate 4-cycle with a chord
    pairs = [
        (0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 5),
        (20, 21), (21, 22), (22, 23), (23, 20), (20, 22),
    ]
    e = _edges(spark, pairs)
    got = sorted(r["id"] for r in articulation_points(e).collect())
    assert got == _brute_articulation(pairs)


def test_havel_hakimi_realizes_sequence(spark):
    from icebug_spark.sources.generators2 import havel_hakimi

    degrees = [3, 2, 2, 2, 1]
    e = havel_hakimi(spark, degrees)
    sym = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    got = {r["src"]: r["cnt"] for r in sym.groupBy("src").agg(
        F.count(F.lit(1)).alias("cnt")).collect()}
    assert got == {i: d for i, d in enumerate(degrees)}


def test_havel_hakimi_rejects_nongraphical(spark):
    from icebug_spark.sources.generators2 import havel_hakimi

    with pytest.raises(ValueError, match="graphical"):
        havel_hakimi(spark, [3, 1])


def test_configuration_model_degree_bound(spark):
    from icebug_spark.sources.generators2 import configuration_model

    degs = spark.createDataFrame([(i, 4) for i in range(30)], "id LONG, deg INT")
    e = configuration_model(degs, seed=7)
    sym = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    got = sym.groupBy("src").agg(F.count(F.lit(1)).alias("cnt"))
    # self-loops/multi-edges are dropped, so realized degree <= requested
    assert got.where(F.col("cnt") > 4).count() == 0
    assert e.count() > 0
    # deterministic under seed
    e2 = configuration_model(degs, seed=7)
    assert sorted(map(tuple, e.collect())) == sorted(map(tuple, e2.collect()))


def test_powerlaw_degree_sequence_bounds(spark):
    from icebug_spark.sources.generators2 import powerlaw_degree_sequence

    d = powerlaw_degree_sequence(spark, 500, gamma=2.5, min_deg=2, max_deg=40)
    stats = d.agg(
        F.min("deg").alias("lo"), F.max("deg").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    assert stats["n"] == 500 and stats["lo"] >= 2 and stats["hi"] <= 40
    # heavier mass at low degrees
    low = d.where(F.col("deg") <= 4).count()
    assert low > 250


def test_dorogovtsev_mendes_counts(spark):
    from icebug_spark.sources.generators2 import dorogovtsev_mendes

    n = 50
    e = dorogovtsev_mendes(spark, n, seed=4)
    assert e.count() == 3 + 2 * (n - 3)
    nodes = e.select(F.col("src").alias("id")).union(
        e.select(F.col("dst").alias("id"))).distinct()
    assert nodes.count() == n


def test_lfr_ground_truth_covers_nodes(spark):
    from icebug_spark.sources.generators2 import lfr_graph

    edges, truth = lfr_graph(spark, 120, avg_deg=8, mu=0.2, seed=5)
    n_truth = truth.select("id").distinct().count()
    assert n_truth == 120
    # mixing: intra-community edges dominate at mu=0.2
    t = truth.select("id", "subset")
    lab = (
        edges.join(t.withColumnRenamed("id", "src")
                    .withColumnRenamed("subset", "cs"), "src")
        .join(t.withColumnRenamed("id", "dst")
               .withColumnRenamed("subset", "cd"), "dst")
    )
    intra = lab.where(F.col("cs") == F.col("cd")).count()
    assert intra > lab.count() * 0.5


def test_hyperbolic_graph_deterministic(spark):
    from icebug_spark.sources.generators2 import hyperbolic_graph

    a = hyperbolic_graph(spark, 200, avg_degree=6.0, seed=2)
    b = hyperbolic_graph(spark, 200, avg_degree=6.0, seed=2)
    ra = sorted(map(tuple, a.collect()))
    assert ra == sorted(map(tuple, b.collect()))
    assert len(ra) > 0


def test_profile_report_known_graph(spark):
    from icebug_spark.operators.profiling import profile

    # path 0-1-2-3: n=4, m=3, diameter 3, no triangles
    e = _edges(spark, [(0, 1), (1, 2), (2, 3)])
    rep = {r["metric"]: r["value"] for r in profile(e).collect()}
    assert rep["num_nodes"] == 4.0
    assert rep["num_edges"] == 3.0
    assert rep["num_components"] == 1.0
    assert rep["largest_component"] == 4.0
    assert rep["diameter_lower_bound"] == 3.0
    assert rep["global_clustering"] == 0.0
    assert rep["max_degree"] == 2.0 and rep["min_degree"] == 1.0
