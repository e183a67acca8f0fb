"""Leiden, map-equation Louvain, LFM cover, structural Rand, cover hub
dominance, communication graph, b-suitor matching. Invariant-style tests
(quality, validity, capacity) per SURVEY §7 determinism policy."""

import pytest
from pyspark.sql import functions as F

from icebug_spark.operators import community, community2, matching


@pytest.fixture(scope="module")
def two_cliques(spark):
    """Two 5-cliques joined by one bridge edge — unambiguous communities."""
    edges = []
    for base in (0, 5):
        for i in range(5):
            for j in range(i + 1, 5):
                edges.append((base + i, base + j))
    edges.append((0, 5))
    return spark.createDataFrame(edges, ["src", "dst"]).cache()


def test_leiden_two_cliques(spark, two_cliques):
    part = community2.leiden(two_cliques, levels=2, move_rounds=3, refine_rounds=2)
    rows = {r["id"]: r["subset"] for r in part.collect()}
    assert len(rows) == 10
    a = {rows[i] for i in range(5)}
    b = {rows[i] for i in range(5, 10)}
    assert len(a) == 1 and len(b) == 1 and a != b
    # compact labels
    assert set(rows.values()) == {0, 1}


def test_leiden_refinement_respects_boundaries(spark, two_cliques):
    # refinement of the perfect partition must not merge across it
    part = spark.createDataFrame(
        [(i, 0 if i < 5 else 1) for i in range(10)], ["id", "subset"]
    )
    e = two_cliques.select("src", "dst", F.lit(1.0).alias("weight"))
    refined = community2._refine(e, part, gamma=1.0, rounds=3)
    j = (
        refined.withColumnRenamed("subset", "rsub")
        .join(part, "id")
        .groupBy("rsub")
        .agg(F.countDistinct("subset").alias("n_comms"))
    )
    assert j.where(F.col("n_comms") > 1).count() == 0


def test_map_equation_quality_ordering(spark, two_cliques):
    nodes = spark.range(10).withColumnRenamed("id", "id")
    good = spark.createDataFrame(
        [(i, 0 if i < 5 else 1) for i in range(10)], ["id", "subset"]
    )
    bad = spark.createDataFrame([(i, i % 2) for i in range(10)], ["id", "subset"])
    L_good = community2.map_equation(two_cliques, good).collect()[0][0]
    L_bad = community2.map_equation(two_cliques, bad).collect()[0][0]
    # lower description length = better partition
    assert L_good < L_bad


def test_louvain_map_equation_finds_cliques(spark, two_cliques):
    part = community2.louvain_map_equation(two_cliques, move_rounds=3, levels=1)
    rows = {r["id"]: r["subset"] for r in part.collect()}
    a = {rows[i] for i in range(5)}
    b = {rows[i] for i in range(5, 10)}
    assert len(a) == 1 and len(b) == 1 and a != b
    # its description length beats singletons
    L = community2.map_equation(
        two_cliques, spark.createDataFrame([(i, s) for i, s in rows.items()], ["id", "subset"])
    ).collect()[0][0]
    singles = spark.createDataFrame([(i, i) for i in range(10)], ["id", "subset"])
    L_single = community2.map_equation(two_cliques, singles).collect()[0][0]
    assert L < L_single


def test_lfm_cover_two_cliques(spark, two_cliques):
    cover = community2.lfm_cover(two_cliques, seeds=[1, 6], alpha=1.0)
    by_seed = {
        s: {r["id"] for r in cover.where(F.col("subset") == s).collect()}
        for s in (0, 1)
    }
    assert {1, 2, 3, 4}.issubset(by_seed[0]) and by_seed[0].issubset({0, 1, 2, 3, 4, 5})
    assert {6, 7, 8, 9}.issubset(by_seed[1])


def test_graph_structural_rand(spark, two_cliques):
    pa = spark.createDataFrame([(i, 0 if i < 5 else 1) for i in range(10)], ["id", "subset"])
    same = community2.graph_structural_rand(two_cliques, pa, pa).collect()[0][0]
    assert same == 1.0
    pb = spark.createDataFrame([(i, i) for i in range(10)], ["id", "subset"])
    # singletons disagree on every intra-clique edge, agree on the bridge
    r = community2.graph_structural_rand(two_cliques, pa, pb).collect()[0][0]
    assert r == pytest.approx(1 / 21, abs=1e-6)


def test_cover_hub_dominance(spark, two_cliques):
    cover = spark.createDataFrame(
        [(i, 0) for i in range(5)] + [(i, 1) for i in range(5, 10)], ["id", "subset"]
    )
    rows = {r["subset"]: r["hub_dominance"] for r in
            community2.cover_hub_dominance(two_cliques, cover).collect()}
    # clique: every member has internal degree n-1 → dominance 1.0
    assert rows == {0: 1.0, 1: 1.0}


def test_communication_graph(spark, two_cliques):
    part = spark.createDataFrame([(i, 0 if i < 5 else 1) for i in range(10)], ["id", "subset"])
    cg = community2.communication_graph(two_cliques, part).collect()
    # single bridge edge 0-5 → one inter-community edge of weight 1
    assert len(cg) == 1 and cg[0]["weight"] == 1.0


def test_weighted_degree_with_cluster(spark, two_cliques):
    part = spark.createDataFrame([(i, 0 if i < 5 else 1) for i in range(10)], ["id", "subset"])
    rows = {r["id"]: (r["w_in"], r["w_total"]) for r in
            community2.weighted_degree_with_cluster(two_cliques, part).collect()}
    assert rows[1] == (4.0, 4.0)      # interior clique node
    assert rows[0] == (4.0, 5.0)      # bridge endpoint


def test_b_suitor_capacity_and_weight(spark):
    # star: center 0 with 5 leaves, weights 5..1 → b=2 keeps the top-2
    edges = [(0, i, float(6 - i)) for i in range(1, 6)]
    e = spark.createDataFrame(edges, ["src", "dst", "weight"])
    m = matching.b_suitor_matching(e, b=2)
    rows = sorted((r["u"], r["v"]) for r in m.collect())
    assert rows == [(0, 1), (0, 2)]


def test_b_suitor_is_valid_b_matching(spark, sf_dir):
    # derived graph at sf0.001
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    E = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .select(
            F.col("o_custkey").alias("src"), (F.col("l_suppkey") + 100000).alias("dst")
        )
        .distinct()
        .limit(300)
    )
    m = matching.b_suitor_matching(E, b=3, max_rounds=5)
    deg = (
        m.select(F.col("u").alias("id")).union(m.select(F.col("v").alias("id")))
        .groupBy("id").agg(F.count(F.lit(1)).alias("k"))
    )
    assert deg.where(F.col("k") > 3).count() == 0
    assert m.count() > 0
    # no duplicate pairs
    assert m.select("u", "v").distinct().count() == m.count()
