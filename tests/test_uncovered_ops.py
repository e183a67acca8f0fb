"""Goldens for operator/source functions with no prior direct test or
query coverage (function-level audit, round 5): approx betweenness,
k-path, GedWalk group, square clustering, complex paths, core_numbers,
COO adjacency, geometric-mean score, reachable estimate, dyn-Katz,
event-stream adapter, PGM codec roundtrip, GraphTools leftovers.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from icebug_spark.graph.core import Graph


def _sym(spark, pairs):
    both = pairs + [(b, a) for a, b in pairs]
    return spark.createDataFrame(sorted(set(both)), "src LONG, dst LONG")


def test_approx_betweenness_tracks_exact(spark):
    from icebug_spark.operators.centrality2 import betweenness_sampled
    from icebug_spark.operators.centrality4 import approx_betweenness

    # barbell: two K4s joined by a path — the path interior dominates
    k4a = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    k4b = [(a + 10, b + 10) for a, b in k4a]
    pairs = k4a + k4b + [(3, 6), (6, 7), (7, 10)]
    eu = _sym(spark, pairs)
    all_nodes = sorted({u for p in pairs for u in p})
    exact = {
        r["id"]: r["betweenness"]
        for r in betweenness_sampled(eu, all_nodes).collect()
    }
    approx = {
        r["id"]: r["approx_bc"]
        for r in approx_betweenness(eu, eps=0.2, delta=0.1, max_samples=150).collect()
    }
    # normalized exact: fraction of pairs routed through v — the bridge
    # nodes must dominate in BOTH rankings
    top_exact = {k for k, _ in sorted(exact.items(), key=lambda x: -x[1])[:2]}
    top_approx = {k for k, _ in sorted(approx.items(), key=lambda x: -x[1])[:2]}
    assert top_exact == {6, 7}
    assert top_approx == {6, 7}


def test_k_path_centrality_interior_dominates(spark):
    from icebug_spark.operators.centrality4 import k_path_centrality

    # star with long spokes: the hub is interior to most walks
    pairs = [(0, i) for i in range(1, 7)] + [(i, i + 10) for i in range(1, 7)]
    eu = _sym(spark, pairs)
    kp = {r["id"]: r["kpath"] for r in k_path_centrality(eu, k=3, walks_per_node=4).collect()}
    leaves = [kp.get(i + 10, 0.0) for i in range(1, 7)]
    assert kp[0] > max(leaves)


def test_k_path_counts_endpoint_arrivals(spark):
    """Reference rule (KPathCentrality.cpp:88): counter[v]++ on EVERY
    arrival, endpoints included — on a single edge, each node is the
    forced first hop of the other's walks, so both score > 0 (the old
    interior-only rule scored a 2-node path all-zero)."""
    from icebug_spark.operators.centrality4 import k_path_centrality

    eu = _sym(spark, [(0, 1)])
    kp = {r["id"]: r["kpath"] for r in k_path_centrality(eu, k=3, walks_per_node=2).collect()}
    assert kp[0] > 0.0 and kp[1] > 0.0


def test_gedwalk_group_picks_hub_first(spark):
    from icebug_spark.operators.centrality4 import gedwalk_group

    pairs = [(0, i) for i in range(1, 8)] + [(1, 2)]
    eu = _sym(spark, pairs)
    sel = gedwalk_group(eu, k=2, alpha=0.5, depth=2).orderBy("rank").collect()
    assert sel[0]["id"] == 0  # the hub has maximal marginal gain
    assert len(sel) == 2 and sel[1]["id"] != 0


def test_gedwalk_touch_objective_diverges_from_proxy(spark):
    """Reference-objective check (GedWalk.hpp:19): adjacent twin hubs
    0,1 share all six leaves; a separate 8-leaf star at 8. The linear
    ending-in-group proxy scores 0 and 1 equally highest → picks {0,1};
    the TOUCH objective's marginal gain for 1 collapses after 0 is
    chosen (their touched walks overlap) → picks {0,8}. Degree order
    alone would pick 8 first, so the gains are doing real work. Exact
    gains verified against the avoid-set arithmetic: M_ℓ(X) drops all
    walks through X; gain(0)=27, gain(8|{0})=26 at α=.5, depth 2."""
    from icebug_spark.operators.centrality4 import (
        gedwalk_group,
        gedwalk_linear_proxy,
    )

    pairs = (
        [(0, 1)]
        + [(0, i) for i in range(2, 8)]
        + [(1, i) for i in range(2, 8)]
        + [(8, i) for i in range(9, 17)]
    )
    eu = _sym(spark, pairs)
    touch = gedwalk_group(eu, k=2, alpha=0.5, depth=2).orderBy("rank").collect()
    assert [(r["id"], r["gain"]) for r in touch] == [(0, 27.0), (8, 26.0)]
    proxy = gedwalk_linear_proxy(eu, k=2, alpha=0.5, depth=2).orderBy("rank").collect()
    assert sorted(r["id"] for r in proxy) == [0, 1]  # proxy misses the star


def test_square_clustering_c4_is_one(spark):
    from icebug_spark.operators.centrality4 import square_clustering

    c4 = _sym(spark, [(0, 1), (1, 2), (2, 3), (3, 0)])
    got = {r["id"]: r["square_cc"] for r in square_clustering(c4).collect()}
    assert got == {0: 1.0, 1: 1.0, 2: 1.0, 3: 1.0}
    # path graph: no squares
    p = _sym(spark, [(0, 1), (1, 2), (2, 3)])
    got_p = {r["id"]: r["square_cc"] for r in square_clustering(p).collect()}
    assert all(v == 0.0 for v in got_p.values())
    # C4 + pendant off node 1: the SUM potential (reference
    # LocalSquareClusteringCoefficient.cpp:37-40) gives node 0
    # potential = deg(1)+deg(3)−q_all−1 = 3+2−2−1 = 2 → cc = 1/2;
    # the (wrong) product form would give 1.0.
    c4p = _sym(spark, [(0, 1), (1, 2), (2, 3), (3, 0), (1, 4)])
    got_c = {r["id"]: r["square_cc"] for r in square_clustering(c4p).collect()}
    assert got_c[0] == 0.5 and got_c[2] == 0.5
    assert got_c[3] == 1.0  # both neighbors (0,2) fully used by the square


def test_complex_paths_threshold_spread(spark):
    from icebug_spark.operators.centrality4 import complex_paths

    # source 0's neighborhood seeds; node 3 needs >= 2 active neighbors
    pairs = [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4), (1, 4)]
    eu = _sym(spark, pairs)
    rounds = {r["id"]: r["round"] for r in complex_paths(eu, source=0, threshold=2).collect()}
    assert rounds[1] == 0 and rounds[2] == 0  # seeded neighborhood
    assert rounds[3] == 1  # two active neighbors (1, 2)
    assert rounds[4] == 2  # needs 1 AND 3 active


def test_core_numbers_matches_kcore_peeling(spark):
    from icebug_spark.operators.kcore import core_numbers, k_core

    # K4 (core 3) with a pendant path (core 1)
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    pairs = k4 + [(3, 4), (4, 5)]
    eu = _sym(spark, pairs)
    got = {r["id"]: r["core"] for r in core_numbers(eu).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3, 4: 1, 5: 1}
    in3 = sorted(r["id"] for r in k_core(eu, 3).collect())
    assert in3 == [0, 1, 2, 3]


def test_adjacency_coo(spark):
    from icebug_spark.operators.algebraic import adjacency_coo

    e = spark.createDataFrame([(0, 1, 2.5), (1, 2, 4.0)], "src LONG, dst LONG, weight DOUBLE")
    coo = sorted(map(tuple, adjacency_coo(e, weighted=True).collect()))
    assert coo == [(0, 1, 2.5), (1, 2, 4.0)]
    unw = sorted(map(tuple, adjacency_coo(e).collect()))
    assert unw == [(0, 1, 1.0), (1, 2, 1.0)]


def test_geometric_mean_score_formula(spark):
    from icebug_spark.operators.edgescores import geometric_mean_score

    e = spark.createDataFrame(
        [(0, 1, 4.0), (1, 2, 1.0)], "u LONG, v LONG, score DOUBLE"
    )
    # nodeSum: 0 -> 4, 1 -> 5, 2 -> 1
    got = {(r["u"], r["v"]): r["gm_score"] for r in geometric_mean_score(e).collect()}
    assert got[(0, 1)] == pytest.approx(4.0 / (4.0 * 5.0) ** 0.5, abs=1e-6)
    assert got[(1, 2)] == pytest.approx(1.0 / (5.0 * 1.0) ** 0.5, abs=1e-6)


def test_reachable_nodes_estimate_exact_on_sample(spark):
    from icebug_spark.operators.reachability import reachable_nodes_estimate

    # two components: sizes 3 and 2 (directed cycles => full reachability)
    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (10, 11), (11, 10)], "src LONG, dst LONG"
    )
    got = {r["source"]: r["n_reachable"] for r in
           reachable_nodes_estimate(e, n_samples=64).collect()}
    for s, n in got.items():
        assert n == (3 if s < 10 else 2)


def test_dyn_katz_matches_static(spark):
    from icebug_spark.operators.centrality2 import katz_centrality
    from icebug_spark.streaming.dynamic2 import dyn_katz_update

    pairs = [(0, 1), (1, 2), (2, 3), (3, 0), (1, 3)]
    eu = _sym(spark, pairs)
    dyn = {r["id"]: r["katz"] for r in dyn_katz_update(eu, alpha=0.05, iters=8).collect()}
    # same truncated series semantics as the static operator's shape:
    # x = sum_k alpha^k A^k 1 — recompute directly for the golden
    import numpy as np

    nodes = sorted({u for p in pairs for u in p})
    idx = {v: i for i, v in enumerate(nodes)}
    A = np.zeros((len(nodes), len(nodes)))
    for a, b in pairs:
        A[idx[a], idx[b]] = 1
        A[idx[b], idx[a]] = 1
    x = np.ones(len(nodes))
    term = np.ones(len(nodes))
    for _ in range(8):
        term = 0.05 * (A @ term)
        x = x + term
    for v in nodes:
        assert dyn[v] == pytest.approx(x[idx[v]], abs=1e-5)


def test_dynamic_events_adapter_replays_to_original(spark):
    from icebug_spark.sources.generators2 import dynamic_events_from_generator
    from icebug_spark.streaming.dynamic import replay_by_timestep

    e = spark.createDataFrame(
        [(i, (i + 1) % 12) for i in range(12)], "src LONG, dst LONG"
    )
    ev = dynamic_events_from_generator(e, batches=3, seed=1)
    assert ev.where(F.col("type") == "TIME_STEP").count() == 3
    empty = spark.createDataFrame([], "src LONG, dst LONG, weight DOUBLE")
    states = replay_by_timestep(empty, ev)
    final = states[-1]
    assert sorted(map(tuple, final.select("src", "dst").collect())) == sorted(
        map(tuple, e.collect())
    )
    # batches accumulate monotonically for an addition-only stream
    assert states[0].count() <= states[1].count() <= final.count()


def test_pgm_codec_roundtrip():
    from icebug_spark.llm.codecs import decode_image, encode_pgm

    px = (np.arange(12, dtype=np.uint8) * 7 % 256).reshape(3, 4).astype(np.uint8)
    buf = encode_pgm(px)
    back = decode_image(buf)
    assert back.shape in ((3, 4), (3, 4, 1))
    assert np.array_equal(back.reshape(3, 4), px)


def test_graphtools_leftovers(spark):
    from icebug_spark.graph import tools

    g = Graph.from_edge_list(spark, [(0, 1), (1, 2), (2, 3)], directed=False)
    # random_edges: deterministic under seed, k rows, real edges
    a = sorted(map(tuple, tools.random_edges(g, 2, seed=3).collect()))
    b = sorted(map(tuple, tools.random_edges(g, 2, seed=3).collect()))
    assert a == b and len(a) == 2
    assert set(a) <= {(0, 1), (1, 2), (2, 3)}
    # to_weighted / to_unweighted roundtrip
    gw = tools.to_weighted(g, default=2.0)
    assert gw.weighted and gw.edges.agg(F.sum("weight")).collect()[0][0] == 6.0
    assert not tools.to_unweighted(gw).weighted
    # randomize_weights: [0,1), deterministic, structure preserved
    gr = tools.randomize_weights(gw, seed=5)
    rows = gr.edges.collect()
    assert all(0.0 <= r["weight"] < 1.0 for r in rows)
    assert sorted((r["src"], r["dst"]) for r in rows) == [(0, 1), (1, 2), (2, 3)]
    gr2 = tools.randomize_weights(gw, seed=5)
    assert sorted(map(tuple, gr.edges.collect())) == sorted(map(tuple, gr2.edges.collect()))


def test_load_all_tables(spark, sf_dir):
    from icebug_spark.catalog import TABLES, load_all

    dfs = load_all(spark, sf_dir)
    assert set(dfs) == set(TABLES)
    assert dfs["nation"].count() == 25


def test_graph_to_undirected_and_in_degrees(spark):
    # weighted: symmetrization keeps max weight per direction pair
    gw = Graph.from_edge_list(
        spark, [(0, 1, 3.0), (1, 0, 5.0), (1, 2, 1.0)], directed=True, weighted=True
    )
    und = gw.to_undirected()
    assert und.directed is False
    rows = {(r["src"], r["dst"]): r["weight"] for r in und.edges.collect()}
    assert rows[(0, 1)] == 5.0 and rows[(1, 0)] == 5.0
    assert rows[(1, 2)] == 1.0 and rows[(2, 1)] == 1.0
    # in_degrees counts incoming arcs on the directed view
    g = Graph.from_edge_list(spark, [(0, 2), (1, 2), (2, 0)], directed=True)
    ind = {r["id"]: r["degree"] for r in g.in_degrees().collect()}
    assert ind == {2: 2, 0: 1}


def test_gedwalk_auto_alpha_matches_reference_default(spark):
    """alpha=None ⇒ 1/(1 + max degree) (GedWalk.cpp:122, GEOMETRIC bound
    strategy): identical selection and gains to passing the value
    explicitly."""
    from icebug_spark.operators.centrality4 import gedwalk_group

    pairs = [(0, i) for i in range(1, 8)] + [(1, 2)]
    eu = _sym(spark, pairs)
    auto = gedwalk_group(eu, k=2, alpha=None, depth=2).orderBy("rank").collect()
    explicit = (
        gedwalk_group(eu, k=2, alpha=1.0 / 8.0, depth=2).orderBy("rank").collect()
    )
    assert [tuple(r) for r in auto] == [tuple(r) for r in explicit]


def test_gedwalk_bound_pruning_finds_argmax_outside_old_pool(spark):
    """ADVERSARIAL golden for the conservative bound pruning (r08,
    GedWalk.cpp estimateGains): two disjoint 13-cliques, B = ids 0..12
    and A = ids 100..112 — every node has degree 12 and identical
    linear walk mass, so the pre-r08 heuristic pool (top-12 by degree
    UNION top-12 by proxy, ties id ASC) was exactly {0..11}: ALL of A
    was pruned. True greedy at k=2: round 1 ties everywhere -> id 0;
    round 2's argmax is ANY A node (an intact 13-clique strictly beats
    B's 12-clique remnant), i.e. id 100 — a node the old pool could
    never see by degree OR proxy. The lazy bound expansion must find
    it; gains are dyadic-exact at alpha=.5, depth 2."""
    from icebug_spark.operators.centrality4 import gedwalk_group

    pairs = [(u, v) for u in range(13) for v in range(u + 1, 13)] + [
        (100 + u, 100 + v) for u in range(13) for v in range(u + 1, 13)
    ]
    eu = _sym(spark, pairs)
    sel = gedwalk_group(eu, k=2, alpha=0.5, depth=2).orderBy("rank").collect()
    assert sel[0]["id"] == 0
    assert sel[1]["id"] == 100, (
        f"round-2 argmax must escape the old degree/proxy pool: {sel}"
    )
    # the intact-clique pick strictly beats what any B remnant node
    # could have offered: its gain equals round 1's (isomorphic cliques)
    assert sel[1]["gain"] == sel[0]["gain"]
