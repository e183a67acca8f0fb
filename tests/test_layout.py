"""PivotMDS: 1-D structures embed in order; output shape invariants."""

from icebug_spark.graph.core import Graph
from icebug_spark.operators.layout import pivot_mds


def test_pivot_mds_orders_path(spark):
    path = [(i, i + 1) for i in range(9)]
    g = Graph.from_edge_list(spark, path, directed=False)
    out = pivot_mds(g.symmetrized(), dim=2, num_pivots=5)
    rows = sorted((r["id"], r["coords"]) for r in out.collect())
    assert len(rows) == 10 and all(len(c) == 2 for _, c in rows)
    xs = [c[0] for _, c in rows]
    # dominant MDS axis recovers the path order (up to sign)
    assert all(xs[i] < xs[i + 1] for i in range(9)) or all(
        xs[i] > xs[i + 1] for i in range(9)
    )


def test_pivot_mds_symmetric_star(spark):
    star = [(0, i) for i in range(1, 7)]
    g = Graph.from_edge_list(spark, star, directed=False)
    out = pivot_mds(g.symmetrized(), dim=2, num_pivots=4)
    coords = {r["id"]: r["coords"] for r in out.collect()}
    assert len(coords) == 7
    # center sits nearest the embedding origin
    def norm2(c):
        return sum(x * x for x in c)

    assert all(norm2(coords[0]) <= norm2(coords[i]) + 1e-9 for i in range(1, 7))


def test_maxent_stress_separates_cliques(spark):
    """Two 4-cliques joined by one bridge: after maxent iterations the
    mean intra-clique distance must be below the mean cross-clique
    distance, and the neighbor-stress must not blow up vs the PivotMDS
    init (the iteration is a local minimizer of exactly that objective)."""
    import itertools

    from icebug_spark.operators.layout import layout_stress, maxent_stress, pivot_mds

    a = list(itertools.combinations(range(4), 2))
    b = list(itertools.combinations(range(4, 8), 2))
    g = Graph.from_edge_list(spark, a + b + [(0, 4)], directed=False)
    eu = g.symmetrized()
    init = pivot_mds(eu, dim=2, num_pivots=6)
    out = maxent_stress(eu, dim=2, iterations=8, init=init)
    coords = {r["id"]: r["coords"] for r in out.collect()}
    assert len(coords) == 8 and all(len(c) == 2 for c in coords.values())
    assert all(all(abs(v) < 1e9 for v in c) for c in coords.values())

    def dist(i, j):
        return sum((p - q) ** 2 for p, q in zip(coords[i], coords[j])) ** 0.5

    intra = [dist(i, j) for i, j in a + b]
    inter = [dist(i, j) for i in range(4) for j in range(4, 8)]
    assert sum(intra) / len(intra) < sum(inter) / len(inter)
    s_init = layout_stress(eu, init)
    s_out = layout_stress(eu, out)
    assert s_out <= s_init * 1.5 + 1e-6


def test_maxent_stress_spreads_star(spark):
    """On a star the pure-stress fixpoint collapses leaves onto a circle
    of radius 1; the repulsion term must keep distinct leaves from
    coinciding (pairwise distances strictly positive)."""
    from icebug_spark.operators.layout import maxent_stress

    star = [(0, i) for i in range(1, 7)]
    g = Graph.from_edge_list(spark, star, directed=False)
    out = maxent_stress(g.symmetrized(), dim=2, iterations=8, sample_size=7)
    coords = {r["id"]: r["coords"] for r in out.collect()}
    assert len(coords) == 7
    leaves = [coords[i] for i in range(1, 7)]
    for i in range(len(leaves)):
        for j in range(i + 1, len(leaves)):
            d = sum((p - q) ** 2 for p, q in zip(leaves[i], leaves[j])) ** 0.5
            assert d > 1e-4


def test_write_postscript(spark, tmp_path):
    """PostscriptWriter parity (viz/PostscriptWriter.cpp:37-167): header
    variant by torus flag, macro block, scaled edge/node draw commands,
    cluster palette for same-cluster edges, grey for cross-cluster."""
    from icebug_spark.operators.layout import write_postscript

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (0, 2)], "src long, dst long"
    )
    layout = spark.createDataFrame(
        [(0, 0.0, 0.0), (1, 1.0, 0.0), (2, 0.0, 1.0)], "id long, x double, y double"
    )
    p = str(tmp_path / "g.eps")
    write_postscript(edges, layout, p)
    txt = open(p).read()
    assert txt.startswith("%!PS-Adobe-1.0\n")
    assert "%%BoundingBox: 0.000 0.000 1020.000 1020.000" in txt
    assert "/a {arc closepath fill} bind def" in txt
    assert txt.count(" l s") == 3  # one stroked line per edge
    assert txt.count("360.00 a s") == 3  # one dot per node
    assert "p 0.000 0.000 m 1020.000 0.000 l s" in txt

    clustering = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 1)], "id long, cluster long"
    )
    p2 = str(tmp_path / "gc.eps")
    write_postscript(edges, layout, p2, clustering=clustering)
    txt2 = open(p2).read()
    assert "1.000 0.000 0.000 c p" in txt2  # cluster-0 edge colored red
    assert txt2.count("0.80 0.80 0.80 c") == 2  # two cross-cluster edges

    p3 = str(tmp_path / "gt.eps")
    write_postscript(edges, layout, p3, torus=True)
    assert open(p3).read().startswith("%!PS-Adobe-3.0 EPSF-3.0\n")


def test_num_edge_crossings(spark):
    """Two diagonals of a square cross once; the square's sides (which
    share endpoints) never count; parallel segments never count."""
    from icebug_spark.operators.layout import num_edge_crossings

    layout = spark.createDataFrame(
        [(0, 0.0, 0.0), (1, 1.0, 0.0), (2, 1.0, 1.0), (3, 0.0, 1.0)],
        "id long, x double, y double",
    )
    sides = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 0)], "src long, dst long"
    )
    assert num_edge_crossings(sides, layout) == 0
    with_diags = sides.union(
        spark.createDataFrame([(0, 2), (1, 3)], "src long, dst long")
    )
    assert num_edge_crossings(with_diags, layout) == 1


def test_write_layout_gml_and_kinemage(spark, tmp_path):
    from icebug_spark.operators.layout import write_kinemage, write_layout_gml

    edges = spark.createDataFrame([(0, 1)], "src long, dst long")
    l2 = spark.createDataFrame(
        [(0, 1.0, 2.0), (1, 3.0, 4.0)], "id long, x double, y double"
    )
    p = str(tmp_path / "g.gml")
    write_layout_gml(edges, l2, p)
    txt = open(p).read()
    assert "graphics" in txt and "[ x 50.0" in txt and "y 200.0" in txt

    l3 = spark.createDataFrame(
        [(0, 1.0, 2.0, 3.0), (1, 4.0, 5.0, 6.0)],
        "id long, x double, y double, z double",
    )
    k = str(tmp_path / "g.kin")
    write_kinemage(edges, l3, k)
    kt = open(k).read()
    assert kt.startswith("@whitebackground\n")
    assert "{a}1.0 2.0 3.0" in kt and "P 1.0 2.0 3.0" in kt

    import pytest as _pt

    with _pt.raises(ValueError, match="3-D"):
        write_kinemage(edges, l2, k)


def test_num_edge_crossings_symmetrized_input_not_double_counted(spark):
    """A symmetrized (both-directions) edge table canonicalizes to one
    row per drawn segment, so the diagonals still cross exactly once
    (the pre-fix behavior counted the pair 4x)."""
    from pyspark.sql import functions as F

    from icebug_spark.operators.layout import num_edge_crossings

    layout = spark.createDataFrame(
        [(0, 0.0, 0.0), (1, 1.0, 0.0), (2, 1.0, 1.0), (3, 0.0, 1.0)],
        "id long, x double, y double",
    )
    diags = spark.createDataFrame([(0, 2), (1, 3)], "src long, dst long")
    sym = diags.union(
        diags.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    assert num_edge_crossings(sym, layout) == 1


def test_write_layout_gml_emits_z_for_3d(spark, tmp_path):
    """writeGraphToGML emits 'z 50*coord' when dim==3
    (GraphLayoutAlgorithm.hpp:95); a 3-D layout round-tripped through
    GML must keep its third dimension."""
    from icebug_spark.operators.layout import write_layout_gml

    edges = spark.createDataFrame([(0, 1)], "src long, dst long")
    l3 = spark.createDataFrame(
        [(0, 1.0, 2.0, 3.0), (1, 4.0, 5.0, 6.0)],
        "id long, x double, y double, z double",
    )
    p = str(tmp_path / "g3.gml")
    write_layout_gml(edges, l3, p)
    txt = open(p).read()
    assert "z 150.0" in txt and "z 300.0" in txt
    # 2-D layouts still omit the z line
    l2 = l3.select("id", "x", "y")
    p2 = str(tmp_path / "g2.gml")
    write_layout_gml(edges, l2, p2)
    assert "z " not in open(p2).read()
