"""Round-9 tail operators: JaccardMeasure, EdgeScoreAsWeight,
LinkThresholder/PredictionsSorter, AlgebraicDistanceIndex,
NeighborhoodFunctionHeuristic, ChungLuGeneratorAlamEtAl,
GroupClosenessLocalSearch/LocalSwaps, ApproxCloseness, TopCloseness,
ApproxSpanningEdge, DynApproxBetweenness."""

import itertools

import pytest
from pyspark.sql import functions as F


def _sym(spark, pairs):
    both = sorted(set(pairs) | {(b, a) for a, b in pairs})
    return spark.createDataFrame(both, "src LONG, dst LONG")


# ---------------------------------------------------------------- community


def test_jaccard_measure_matches_pair_count_loop(spark):
    """Brute-force transcription of JaccardMeasure.cpp:14 over all node
    pairs must agree; identical partitions give distance 0."""
    from icebug_spark.operators.community3 import jaccard_measure

    za = [(0, 0), (1, 0), (2, 1), (3, 1), (4, 2), (5, 2)]
    zb = [(0, 0), (1, 1), (2, 1), (3, 1), (4, 2), (5, 0)]
    pa = spark.createDataFrame(za, "id LONG, subset LONG")
    pb = spark.createDataFrame(zb, "id LONG, subset LONG")
    got = jaccard_measure(pa, pb).collect()[0]["jaccard_distance"]

    da, db = dict(za), dict(zb)
    n = len(da)
    s11 = s00 = 0
    for u, v in itertools.combinations(da, 2):
        same_a, same_b = da[u] == da[v], db[u] == db[v]
        if same_a and same_b:
            s11 += 1
        if not same_a and not same_b:
            s00 += 1
    divisor = n * (n - 1) - 2.0 * s00
    exp = 1.0 - 2.0 * s11 / divisor if divisor > 0 else 0.0
    assert got == pytest.approx(exp, abs=1e-6)

    same = jaccard_measure(pa, pa).collect()[0]["jaccard_distance"]
    assert same == pytest.approx(0.0, abs=1e-9)


# ---------------------------------------------------------------- edgescores


def test_edge_score_as_weight(spark):
    from icebug_spark.operators.edgescores import edge_score_as_weight

    s = spark.createDataFrame(
        [(0, 1, 2.0), (1, 2, 3.0)], "u LONG, v LONG, score DOUBLE"
    )
    w = {(r["src"], r["dst"]): r["weight"] for r in edge_score_as_weight(s).collect()}
    assert w == {(0, 1): 3.0, (1, 2): 4.0}  # offset 1 + 1*score
    w2 = {
        (r["src"], r["dst"]): r["weight"]
        for r in edge_score_as_weight(s, squared=True, offset=0.0, factor=2.0).collect()
    }
    assert w2 == {(0, 1): 8.0, (1, 2): 18.0}


# ---------------------------------------------------------------- linkpred


def _preds(spark):
    rows = [(0, 1, 0.9), (0, 2, 0.5), (1, 2, 0.9), (2, 3, 0.1), (1, 3, 0.5)]
    return spark.createDataFrame(rows, "u LONG, v LONG, score DOUBLE")


def test_predictions_sorter(spark):
    from icebug_spark.operators.linkpred2 import (
        sort_predictions_by_node_pair,
        sort_predictions_by_score,
    )

    p = _preds(spark)
    by_score = [(r["u"], r["v"]) for r in sort_predictions_by_score(p).collect()]
    # desc score, ties ascending pair: 0.9 ties -> (0,1) before (1,2)
    assert by_score == [(0, 1), (1, 2), (0, 2), (1, 3), (2, 3)]
    by_pair = [(r["u"], r["v"]) for r in sort_predictions_by_node_pair(p).collect()]
    assert by_pair == sorted(by_pair)


def test_link_thresholder(spark):
    from icebug_spark.operators.linkpred2 import (
        threshold_by_count,
        threshold_by_percentage,
        threshold_by_score,
    )

    p = _preds(spark)
    by_score = [(r["u"], r["v"]) for r in threshold_by_score(p, 0.5).collect()]
    assert by_score == [(0, 1), (0, 2), (1, 2), (1, 3)]  # sorted ascending
    by_count = [(r["u"], r["v"]) for r in threshold_by_count(p, 2).collect()]
    assert by_count == [(0, 1), (1, 2)]  # the two 0.9s, pair-sorted
    by_pct = [(r["u"], r["v"]) for r in threshold_by_percentage(p, 0.4).collect()]
    assert by_pct == by_count  # floor(0.4*5) = 2
    with pytest.raises(ValueError):
        threshold_by_count(p, 6)
    with pytest.raises(ValueError):
        threshold_by_percentage(p, 1.5)


def test_algebraic_distance_index_matches_edge_operator(spark):
    """With norm=1 and the same (systems, rounds, omega, seed), the index
    on edge pairs must equal algebraic_distance's per-edge output (both
    ride the shared algebraic_loads iteration)."""
    from icebug_spark.operators.distances import algebraic_distance
    from icebug_spark.operators.linkpred2 import algebraic_distance_index

    eu = _sym(spark, [(0, 1), (1, 2), (2, 3), (3, 0), (1, 3)])
    per_edge = {
        (r["src"], r["dst"]): r["alg_dist"]
        for r in algebraic_distance(eu).collect()
    }
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3)], "u LONG, v LONG"
    )
    idx = {
        (r["u"], r["v"]): r["alg_score"]
        for r in algebraic_distance_index(eu, pairs, norm=1).collect()
    }
    for k, v in idx.items():
        assert v == pytest.approx(per_edge[k], abs=1e-6)
    # max-norm <= L1-norm, self-pair scores 0
    idx_max = {
        (r["u"], r["v"]): r["alg_score"]
        for r in algebraic_distance_index(eu, pairs, norm=0).collect()
    }
    for k in idx_max:
        assert idx_max[k] <= idx[k] + 1e-9
    self_pair = spark.createDataFrame([(2, 2)], "u LONG, v LONG")
    assert (
        algebraic_distance_index(eu, self_pair).collect()[0]["alg_score"] == 0.0
    )


# ---------------------------------------------------------------- distance


def test_neighborhood_function_heuristic_exact_when_fully_sampled(spark):
    """P5 with every node sampled: interior estimates collapse to the
    exact neighborhood function; endpoints are exact by construction."""
    from icebug_spark.operators.distances2 import neighborhood_function_heuristic

    eu = _sym(spark, [(0, 1), (1, 2), (2, 3), (3, 4)])
    nf = {
        r["h"]: r["n_pairs"]
        for r in neighborhood_function_heuristic(eu, n_samples=5).collect()
    }
    assert nf == {1: 8, 2: 14, 3: 18, 4: 20}
    # random strategy, subsampled: monotone, endpoints exact
    nf2 = {
        r["h"]: r["n_pairs"]
        for r in neighborhood_function_heuristic(
            eu, n_samples=3, strategy="random"
        ).collect()
    }
    assert nf2[1] == 8 and nf2[max(nf2)] == 20
    vals = [nf2[h] for h in sorted(nf2)]
    assert all(a <= b for a, b in zip(vals, vals[1:]))
    with pytest.raises(ValueError):
        neighborhood_function_heuristic(eu, n_samples=2, strategy="bogus")


# ---------------------------------------------------------------- generator


def test_chung_lu_alam_et_al(spark):
    from icebug_spark.sources.generators3 import chung_lu_alam_et_al

    seq = [4] * 30 + [8] * 10
    g = chung_lu_alam_et_al(spark, seq, seed=3)
    assert g.vertices.count() == 40 and not g.directed
    e = g.edges.collect()
    assert all(r["src"] < r["dst"] for r in e)
    m = len(e)
    expected = sum(seq) / 2.0
    assert 0.4 * expected <= m <= 1.8 * expected
    # deterministic under the same seed
    e2 = chung_lu_alam_et_al(spark, seq, seed=3).edges.collect()
    assert sorted(map(tuple, e)) == sorted(map(tuple, e2))
    # degree grouping: ids 0..29 are the degree-4 group (ascending order)
    assert chung_lu_alam_et_al(spark, [0, 0, 0], seed=1).edges.count() == 0


# ------------------------------------------------------- group closeness


def test_group_closeness_local_search_improves_path_group(spark):
    from icebug_spark.operators.centrality5 import (
        group_closeness_local_search,
        group_closeness_local_swaps,
    )

    eu = _sym(spark, [(i, i + 1) for i in range(5)])  # P6
    rows = group_closeness_local_search(eu, [0]).collect()
    assert len(rows) == 1
    assert rows[0]["farness"] == pytest.approx(9.0)  # center node
    assert rows[0]["id"] in (2, 3) and rows[0]["n_swaps"] >= 1

    swaps = group_closeness_local_swaps(eu, [0], max_swaps=1).collect()
    assert len(swaps) == 1 and swaps[0]["n_swaps"] == 1

    # an already locally-optimal group takes no swap
    opt = group_closeness_local_search(eu, [2]).collect()
    assert opt[0]["id"] == 2 and opt[0]["n_swaps"] == 0


# ------------------------------------------------------- approx closeness


def _exact_closeness(edges, normalized, n):
    import collections

    adj = collections.defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    out = {}
    for s in adj:
        dist = {s: 0}
        q = [s]
        while q:
            nq = []
            for x in q:
                for y in adj[x]:
                    if y not in dist:
                        dist[y] = dist[x] + 1
                        nq.append(y)
            q = nq
        far = sum(dist.values())
        out[s] = (n - 1) / far if normalized else 1.0 / far
    return out


def test_approx_closeness_exact_when_all_sampled(spark):
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 0), (1, 4), (2, 5)]
    eu = _sym(spark, edges)
    from icebug_spark.operators.centrality5 import approx_closeness

    got = {
        r["id"]: (r["approx_closeness"], r["sq_err"])
        for r in approx_closeness(eu, n_samples=6, epsilon=0.0).collect()
    }
    exact = _exact_closeness(edges, False, 6)
    assert set(got) == set(exact)
    for v, (c, err) in got.items():
        assert c == pytest.approx(exact[v], abs=1e-6)
        assert err == 0.0


def test_approx_closeness_pivot_estimates_close(spark):
    """8-node connected graph, half the nodes sampled: sampled nodes are
    exact, estimates land within a loose factor of truth and the error
    estimates are finite."""
    edges = [
        (0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (6, 7),
        (0, 3), (2, 5), (1, 6),
    ]
    eu = _sym(spark, edges)
    from icebug_spark.operators.centrality5 import approx_closeness

    rows = approx_closeness(eu, n_samples=4, epsilon=0.5, normalized=True).collect()
    exact = _exact_closeness(edges, True, 8)
    got = {r["id"]: r["approx_closeness"] for r in rows}
    assert set(got) == set(exact)
    for v, c in got.items():
        assert c == pytest.approx(exact[v], rel=0.75), (v, c, exact[v])


# ------------------------------------------------------- top closeness


def test_top_closeness_exact_certified(spark):
    """Certified top-k equals the brute-force plain-closeness ranking —
    including when the initial degree pool must expand (lollipop: the
    high-degree clique is NOT where all top-closeness nodes sit)."""
    clique = list(itertools.combinations(range(5), 2))
    tail = [(4, 5), (5, 6), (6, 7), (7, 8)]
    edges = clique + tail
    eu = _sym(spark, edges)
    from icebug_spark.operators.centrality5 import top_closeness

    exact = _exact_closeness(edges, True, 9)
    want = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    got = [
        (r["id"], r["closeness"])
        for r in top_closeness(eu, k=3, candidate_factor=1).collect()
    ]
    assert [g[0] for g in got] == [w[0] for w in want]
    for (gi, gc), (_wi, wc) in zip(got, want):
        assert gc == pytest.approx(wc, abs=1e-6)


# ------------------------------------------------------- approx spanning edge


def test_approx_spanning_edge_bridges_and_cycle(spark):
    from icebug_spark.operators.centrality5 import approx_spanning_edge

    # every edge of a tree is in every spanning tree
    path = _sym(spark, [(0, 1), (1, 2), (2, 3)])
    scores = approx_spanning_edge(path, eps=0.3).collect()
    assert all(r["ust_score"] == 1.0 for r in scores)

    # C4: each edge appears in 3 of the 4 spanning trees
    c4 = _sym(spark, [(0, 1), (1, 2), (2, 3), (3, 0)])
    sc = approx_spanning_edge(c4, eps=0.15).collect()
    assert len(sc) == 4
    for r in sc:
        assert r["ust_score"] == pytest.approx(0.75, abs=0.2)
    # a sampled tree has n-1 edges -> scores sum to n-1 exactly
    assert sum(r["ust_score"] for r in sc) == pytest.approx(3.0, abs=1e-6)


# ------------------------------------------------------- dyn approx betweenness


def test_dyn_approx_betweenness_paths_stay_shortest(spark):
    """After insertions, every stored sampled path must still be a
    shortest path in the CURRENT graph: interior-count + 1 == d(s,t)."""
    from icebug_spark.operators.traversal import multi_source_bfs
    from icebug_spark.streaming.dynamic3 import DynApproxBetweenness

    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (0, 6), (2, 6)]
    eu = _sym(spark, edges)
    dyn = DynApproxBetweenness(eu, eps=0.35, max_samples=12)
    s0 = {r["id"]: r["approx_bc"] for r in dyn.scores().collect()}
    assert all(0.0 <= v <= 1.0 for v in s0.values())

    n_aff = dyn.insert_edge(1, 5)
    assert n_aff >= 0

    pairs = dyn.pairs.collect()
    sources = sorted({int(r["s"]) for r in pairs})
    d = {
        (int(r["source"]), int(r["id"])): int(r["dist"])
        for r in multi_source_bfs(dyn.eu, sources, max_hops=12).collect()
    }
    interior = {}
    for r in dyn.members.collect():
        interior[int(r["pair"])] = interior.get(int(r["pair"]), 0) + 1
    for r in pairs:
        p, s, t = int(r["pair"]), int(r["s"]), int(r["t"])
        assert interior.get(p, 0) + 1 == d[(s, t)], (p, s, t)
    s1 = {r["id"]: r["approx_bc"] for r in dyn.scores().collect()}
    assert all(0.0 <= v <= 1.0 for v in s1.values())
