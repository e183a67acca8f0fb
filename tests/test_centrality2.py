"""Centrality part-2 tests with hand-computed goldens."""

import pytest

from icebug_spark.graph.core import Graph


def test_betweenness_path(spark):
    from icebug_spark.operators.centrality2 import betweenness_sampled

    g = Graph.from_edge_list(spark, [(0, 1), (1, 2), (2, 3)], directed=False)
    b = {r["id"]: r["betweenness"] for r in betweenness_sampled(g.symmetrized(), [0, 1, 2, 3]).collect()}
    # interior nodes lie on 2 unordered pairs each → 4 ordered (s,t) pairs
    assert b[1] == 4.0 and b[2] == 4.0
    assert b.get(0, 0.0) == 0.0 and b.get(3, 0.0) == 0.0


def test_betweenness_diamond_splits_paths(spark):
    from icebug_spark.operators.centrality2 import betweenness_sampled

    g = Graph.from_edge_list(spark, [(0, 1), (0, 2), (1, 3), (2, 3)], directed=False)
    b = {r["id"]: r["betweenness"] for r in betweenness_sampled(g.symmetrized(), [0, 1, 2, 3]).collect()}
    # two shortest 0-3 paths split the dependency: 0.5 per direction each
    assert b[1] == pytest.approx(1.0)
    assert b[2] == pytest.approx(1.0)


def test_katz_star(spark):
    from icebug_spark.operators.centrality2 import katz_centrality

    # star: leaves point at center 0
    g = Graph.from_edge_list(spark, [(i, 0) for i in range(1, 5)], directed=True)
    k = {r["id"]: r["katz"] for r in katz_centrality(g.edges, alpha=0.1, max_iter=10).collect()}
    assert k[0] == pytest.approx(1.4, abs=1e-6)  # 1 + α·4 (leaves stay at 1)
    assert k[1] == 1.0


def test_eigenvector_star(spark):
    from icebug_spark.operators.centrality2 import eigenvector_centrality

    g = Graph.from_edge_list(spark, [(0, i) for i in range(1, 5)], directed=False)
    v = {r["id"]: r["eigen"] for r in eigenvector_centrality(g.symmetrized(), 30).collect()}
    # star eigenvector: center 1/sqrt(2), leaves 1/(2*sqrt(2))
    assert v[0] == pytest.approx(0.707107, abs=1e-4)
    assert v[1] == pytest.approx(0.353553, abs=1e-4)


def test_sfigality(spark):
    from icebug_spark.operators.centrality2 import sfigality

    g = Graph.from_edge_list(spark, [(0, 1), (0, 2), (1, 2), (2, 3)], directed=False)
    s = {r["id"]: r["sfigality"] for r in sfigality(g.symmetrized()).collect()}
    # degrees: 0:2, 1:2, 2:3, 3:1 → node 3: 1/1 neighbors higher; node 2: 0
    assert s[3] == 1.0
    assert s[2] == 0.0
    assert s[0] == 0.5  # neighbors 1 (eq), 2 (higher)


def test_laplacian_centrality(spark):
    from icebug_spark.operators.centrality2 import laplacian_centrality

    g = Graph.from_edge_list(spark, [(0, 1), (1, 2)], directed=False)
    lap = {r["id"]: r["lap"] for r in laplacian_centrality(g.symmetrized()).collect()}
    # center: d=2 → 4+2+2*(1+1)=10; leaf: 1+1+2*2=6
    assert lap[1] == 10
    assert lap[0] == 6


def test_closeness_path(spark):
    from icebug_spark.operators.centrality2 import closeness_sampled

    g = Graph.from_edge_list(spark, [(0, 1), (1, 2), (2, 3)], directed=False)
    c = {r["id"]: r["closeness"] for r in closeness_sampled(g.symmetrized(), [0, 1]).collect()}
    assert c[0] == pytest.approx(3 / 6, abs=1e-6)  # dists 1,2,3
    assert c[1] == pytest.approx(3 / 4, abs=1e-6)  # dists 1,1,2


def test_diameter_double_sweep(spark):
    from icebug_spark.operators.distances import diameter_double_sweep

    g = Graph.from_edge_list(spark, [(0, 1), (1, 2), (2, 3), (3, 4)], directed=False)
    assert diameter_double_sweep(g.symmetrized(), 2).collect()[0]["diameter_lb"] == 4


def test_eccentricity(spark):
    from icebug_spark.operators.distances import eccentricity

    g = Graph.from_edge_list(spark, [(0, 1), (1, 2), (2, 3)], directed=False)
    e = {r["id"]: r["eccentricity"] for r in eccentricity(g.symmetrized(), [0, 1]).collect()}
    assert e[0] == 3 and e[1] == 2


def test_effective_diameter(spark):
    from icebug_spark.operators.distances import effective_diameter

    g = Graph.from_edge_list(spark, [(0, 1), (1, 2), (2, 3)], directed=False)
    ed = effective_diameter(g.symmetrized(), [0, 1, 2, 3], ratio=0.9, max_h=5).collect()[0]
    assert ed["effective_diameter"] == 3  # 0.9 of 12 pairs needs h=3


def test_algebraic_distance_bridge_is_far(spark):
    from icebug_spark.operators.distances import algebraic_distance

    # two triangles + bridge: bridge endpoints should be algebraically
    # farther apart than intra-triangle pairs on average
    edges = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    g = Graph.from_edge_list(spark, edges, directed=False)
    d = {(r["src"], r["dst"]): r["alg_dist"] for r in algebraic_distance(g.symmetrized(), rounds=8).collect()}
    intra = (d[(0, 1)] + d[(0, 2)] + d[(1, 2)]) / 3
    assert d[(2, 3)] > intra


def test_kadabra_betweenness_bounds_and_accuracy(spark):
    """KADABRA estimate converges to the pair-sampling probability
    Pr[v interior of SP(s,t)] = brandes_bc(v)/(n(n-1)); err bounds are
    monotone sane and the center of a path graph outranks its leaves."""
    from icebug_spark.operators.centrality2 import betweenness_sampled
    from icebug_spark.operators.centrality4 import kadabra_betweenness

    g = Graph.from_edge_list(
        spark, [(0, 1), (1, 2), (2, 3), (3, 4)], directed=False
    )
    eu = g.symmetrized()
    got = {
        r["id"]: (r["kadabra_bc"], r["err_lower"], r["err_upper"])
        for r in kadabra_betweenness(eu, err=0.2, delta=0.1, max_rounds=6).collect()
    }
    exact = {
        r["id"]: r["betweenness"] / 20.0  # n(n-1) ordered pairs
        for r in betweenness_sampled(eu, [0, 1, 2, 3, 4]).collect()
    }
    # exact: node 2 → 8/20 = 0.4; nodes 1,3 → 6/20 = 0.3; leaves 0
    assert exact[2] == pytest.approx(0.4)
    for v in range(5):
        bc, el, eu_ = got[v]
        assert 0.0 <= bc <= 1.0 and el >= 0.0 and eu_ >= 0.0
        # estimate within the (loose, small-sample) error bound of exact
        assert abs(bc - exact.get(v, 0.0)) <= max(el, eu_) + 0.25
    assert got[2][0] >= got[0][0]
    assert got[2][0] > 0.0


def test_kadabra_star_center_dominates(spark):
    from icebug_spark.operators.centrality4 import kadabra_betweenness

    star = [(0, i) for i in range(1, 7)]
    g = Graph.from_edge_list(spark, star, directed=False)
    got = {
        r["id"]: r["kadabra_bc"]
        for r in kadabra_betweenness(g.symmetrized(), err=0.2, max_rounds=4).collect()
    }
    assert got[0] == max(got.values())
    assert all(got[i] <= got[0] for i in range(1, 7))


def test_group_closeness_grow_shrink_improves(spark):
    from icebug_spark.graph.core import Graph
    from icebug_spark.operators.centrality3 import group_closeness_grow_shrink

    # two stars joined by a bridge: the optimum 2-group is the two hubs
    star_a = [(0, i) for i in range(1, 6)]
    star_b = [(10, i) for i in range(11, 16)]
    bridge = [(0, 10)]
    g = Graph.from_edge_list(spark, star_a + star_b + bridge, directed=False)
    eu = g.symmetrized()
    # start from a deliberately bad group: two leaves of star A
    out = group_closeness_grow_shrink(eu, [1, 2], rounds=6, candidate_factor=8)
    members = sorted(r["id"] for r in out.collect())
    assert members == [0, 10], members

    # objective on the final group must dominate the initial group's
    from icebug_spark.operators.traversal import multi_source_bfs
    from pyspark.sql import functions as F

    def h(group):
        d = multi_source_bfs(eu, group)
        best = d.groupBy("id").agg(F.min("dist").alias("db"))
        return best.where(F.col("db") > 0).agg(F.sum(1.0 / F.col("db"))).collect()[0][0]

    assert out.limit(1).collect()[0]["harmonic"] == round(h([0, 10]), 6)
    assert h([0, 10]) > h([1, 2])


def test_approx_group_betweenness_bridge_first(spark):
    """Two cliques joined through a single cut vertex: every inter-clique
    sampled path crosses it, so greedy max-coverage must pick it first;
    marginal gains are non-increasing (submodularity)."""
    from icebug_spark.graph.core import Graph
    from icebug_spark.operators.centrality4 import approx_group_betweenness
    import itertools

    a = list(itertools.combinations(range(5), 2))
    b = list(itertools.combinations(range(6, 11), 2))
    bridge = [(0, 5), (5, 6)]
    g = Graph.from_edge_list(spark, a + b + bridge, directed=False)
    eu = g.symmetrized()
    out = approx_group_betweenness(eu, k=3, max_samples=40).collect()
    rows = sorted(out, key=lambda r: r["round"])
    assert 1 <= len(rows) <= 3
    # interior nodes of ANY shortest path in this barbell are a subset of
    # {0, 5, 6} — greedy can only ever choose from them, whatever the
    # pair sample; which of them comes first depends on sampled endpoints
    assert {r["id"] for r in rows} <= {0, 5, 6}, rows
    gains = [r["covered_paths"] for r in rows]
    assert gains == sorted(gains, reverse=True)
    assert gains[0] >= 1


def test_group_closeness_grow_shrink_disconnected(spark):
    """Swap objectives on a DISCONNECTED graph: nodes reached only by the
    kept members must still contribute 1/dk to every candidate's
    objective (regression for the dc⋈dkept full-join NULL-cand drop)."""
    from icebug_spark.graph.core import Graph
    from icebug_spark.operators.centrality3 import group_closeness_grow_shrink
    from icebug_spark.operators.traversal import multi_source_bfs
    from pyspark.sql import functions as F

    star = [(0, i) for i in range(1, 6)]
    path = [(10, 11), (11, 12)]
    g = Graph.from_edge_list(spark, star + path, directed=False)
    eu = g.symmetrized()

    def h(group):
        d = multi_source_bfs(eu, group)
        best = d.groupBy("id").agg(F.min("dist").alias("db"))
        return float(
            best.where(F.col("db") > 0)
            .agg(F.sum(1.0 / F.col("db")))
            .collect()[0][0]
        )

    out = group_closeness_grow_shrink(eu, [1, 10], rounds=4, candidate_factor=4)
    rows = out.collect()
    members = sorted(r["id"] for r in rows)
    # the reported objective must be the EXACT harmonic of the returned
    # group — if the kept-only component's contribution was dropped the
    # reported value undercounts it.
    assert rows[0]["harmonic"] == round(h(members), 6), (members, rows[0]["harmonic"])
    assert h(members) >= h([1, 10])


def test_kadabra_pinned_trajectory(spark):
    """Full-value pin of the KADABRA trajectory on a fixed graph
    (24-cycle + 3 chords, err=0.15, seed=13): the round-10 stopping rule
    ran a standalone nodes⟗counts scalar job per round; round 11 observes
    the bound aggregate during the counts checkpoint and computes the
    zero-count-node bound driver-side with the identical IEEE double
    operations. Any float-path drift in the stopping decision (an extra
    or missing sampling round) shifts n_pairs and breaks every value
    below — golden generated from the pre-fusion implementation."""
    from pyspark.sql import functions as F

    from icebug_spark.operators.centrality4 import kadabra_betweenness

    edges = [(i, (i + 1) % 24) for i in range(24)] + [(0, 12), (3, 17), (8, 20)]
    df = spark.createDataFrame(edges, "src BIGINT, dst BIGINT")
    eu = df.union(df.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    got = sorted(
        (r["id"], r["kadabra_bc"], r["err_lower"], r["err_upper"])
        for r in kadabra_betweenness(
            eu, err=0.15, delta=0.1, max_rounds=5, seed=13
        ).collect()
    )
    golden = [
        (0, 0.225, 0.120356, 0.230074),
        (1, 0.133333, 0.087004, 0.199447),
        (2, 0.116667, 0.07988, 0.193083),
        (3, 0.183333, 0.106195, 0.216928),
        (4, 0.091667, 0.068253, 0.182888),
        (5, 0.083333, 0.064066, 0.179284),
        (6, 0.058333, 0.050241, 0.167706),
        (7, 0.05, 0.045086, 0.163539),
        (8, 0.133333, 0.087004, 0.199447),
        (9, 0.116667, 0.07988, 0.193083),
        (10, 0.116667, 0.07988, 0.193083),
        (11, 0.141667, 0.090411, 0.202516),
        (12, 0.25, 0.128254, 0.237476),
        (13, 0.1, 0.072272, 0.186383),
        (14, 0.066667, 0.055093, 0.171707),
        (15, 0.058333, 0.050241, 0.167706),
        (16, 0.075, 0.059689, 0.175561),
        (17, 0.158333, 0.096956, 0.208457),
        (18, 0.075, 0.059689, 0.175561),
        (19, 0.075, 0.059689, 0.175561),
        (20, 0.141667, 0.090411, 0.202516),
        (21, 0.091667, 0.068253, 0.182888),
        (22, 0.075, 0.059689, 0.175561),
        (23, 0.075, 0.059689, 0.175561),
    ]
    assert got == golden
