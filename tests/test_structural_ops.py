"""MSF / SCC / MIS / matching / GraphTools tests on exact fixtures."""

import pytest
from pyspark.sql import functions as F

from icebug_spark.graph.core import Graph


def test_boruvka_msf_simple(spark):
    from icebug_spark.operators.msf import boruvka_msf

    # square 0-1-2-3-0 with diagonal; MST = three cheapest edges
    edges = [
        (0, 1, 1.0),
        (1, 2, 2.0),
        (2, 3, 1.0),
        (0, 3, 4.0),
        (0, 2, 5.0),
    ]
    g = Graph.from_edge_list(spark, edges, directed=False, weighted=True)
    msf = sorted(map(tuple, boruvka_msf(g.edges).collect()))
    assert msf == [(0, 1, 1.0), (1, 2, 2.0), (2, 3, 1.0)]
    total = sum(w for _, _, w in msf)
    assert total == 4.0


def test_boruvka_msf_disconnected(spark):
    from icebug_spark.operators.msf import boruvka_msf

    edges = [(0, 1, 1.0), (2, 3, 2.0)]
    g = Graph.from_edge_list(spark, edges, directed=False, weighted=True)
    msf = sorted(map(tuple, boruvka_msf(g.edges).collect()))
    assert msf == [(0, 1, 1.0), (2, 3, 2.0)]


def test_maximum_spanning_forest(spark):
    from icebug_spark.operators.msf import boruvka_msf

    edges = [(0, 1, 1.0), (1, 2, 2.0), (0, 2, 5.0)]
    g = Graph.from_edge_list(spark, edges, directed=False, weighted=True)
    msf = sorted(map(tuple, boruvka_msf(g.edges, maximum=True).collect()))
    assert msf == [(0, 2, 5.0), (1, 2, 2.0)]


def test_scc(spark):
    from icebug_spark.operators.scc import strongly_connected_components

    # cycle 0→1→2→0, chain 2→3→4, cycle 3→4→3? make: 3⇄4, isolated arc 5→0
    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 3), (5, 0)]
    g = Graph.from_edge_list(spark, edges, directed=True)
    comp = {r["id"]: r["component"] for r in strongly_connected_components(g.edges).collect()}
    assert comp[0] == comp[1] == comp[2]
    assert comp[3] == comp[4]
    assert comp[0] != comp[3]
    assert comp[5] not in (comp[0], comp[3])


def test_scc_trim_chains(spark):
    """FW-BW-Trim path: a long acyclic chain hanging off a cycle must be
    peeled by the trim loop (each chain node is its own SCC), and deep
    chains must not exhaust the coloring iterations."""
    from icebug_spark.operators.scc import strongly_connected_components

    # chain 10→11→…→29 feeding cycle 0→1→2→0, plus tail 2→30→31
    edges = (
        [(i, i + 1) for i in range(10, 29)]
        + [(29, 0), (0, 1), (1, 2), (2, 0), (2, 30), (30, 31)]
    )
    g = Graph.from_edge_list(spark, edges, directed=True)
    comp = {r["id"]: r["component"] for r in strongly_connected_components(g.edges).collect()}
    assert comp[0] == comp[1] == comp[2] == 2
    singles = [i for i in range(10, 30)] + [30, 31]
    for i in singles:
        assert comp[i] == i  # trimmed → own SCC
    assert len(comp) == 25


def test_luby_mis(spark):
    from icebug_spark.operators.independent import luby_mis

    # path 0-1-2-3-4
    edges = [(i, i + 1) for i in range(4)]
    g = Graph.from_edge_list(spark, edges, directed=False)
    mis = sorted(r["id"] for r in luby_mis(g.symmetrized()).collect())
    # independence
    s = set(mis)
    for u, v in edges:
        assert not (u in s and v in s)
    # maximality: every non-member has a member neighbor
    for v in range(5):
        if v not in s:
            assert any(
                (u in s) for u in [v - 1, v + 1] if 0 <= u <= 4
            )


def test_local_max_matching(spark):
    from icebug_spark.operators.matching import local_max_matching

    # path with weights: 0-1 (3), 1-2 (1), 2-3 (3) → matches {0-1, 2-3}
    edges = [(0, 1, 3.0), (1, 2, 1.0), (2, 3, 3.0)]
    g = Graph.from_edge_list(spark, edges, directed=False, weighted=True)
    m = sorted((r["u"], r["v"]) for r in local_max_matching(g.edges).collect())
    assert m == [(0, 1), (2, 3)]


def test_matching_is_valid(spark):
    from icebug_spark.operators.matching import local_max_matching

    edges = [(a, b, float((a * 7 + b) % 5 + 1)) for a in range(10) for b in range(a + 1, 10) if (a + b) % 3 == 0]
    g = Graph.from_edge_list(spark, edges, directed=False, weighted=True)
    m = local_max_matching(g.edges).collect()
    seen = set()
    for r in m:
        assert r["u"] not in seen and r["v"] not in seen
        seen.add(r["u"])
        seen.add(r["v"])


def test_path_growing_matcher(spark):
    from icebug_spark.operators.matching import path_growing_matcher

    # path with weights: heaviest-first growth from 0 takes 0-1(3) into
    # M0, 1-2(1) into M1, 2-3(3) into M0 → M0={0-1,2-3} weight 6 wins
    edges = [(0, 1, 3.0), (1, 2, 1.0), (2, 3, 3.0)]
    g = Graph.from_edge_list(spark, edges, directed=False, weighted=True)
    m = sorted((r["u"], r["v"], r["weight"]) for r in path_growing_matcher(g.edges).collect())
    assert m == [(0, 1, 3.0), (2, 3, 3.0)]


def test_path_growing_valid_and_half_approx(spark):
    """Validity (node-disjoint) + the ½-approximation guarantee vs the
    brute-force optimum, and weight parity vs local-max on the same
    fixture (both are ½-approx; neither may be catastrophically worse)."""
    import itertools

    from icebug_spark.operators.matching import (
        local_max_matching,
        path_growing_matcher,
    )

    edges = [
        (a, b, float((a * 7 + b) % 5 + 1))
        for a in range(8)
        for b in range(a + 1, 8)
        if (a + b) % 3 == 0
    ]
    g = Graph.from_edge_list(spark, edges, directed=False, weighted=True)
    rows = path_growing_matcher(g.edges).collect()
    seen = set()
    for r in rows:
        assert r["u"] not in seen and r["v"] not in seen
        seen.add(r["u"])
        seen.add(r["v"])
    wt = {(u, v): w for u, v, w in edges}
    assert all(wt[(r["u"], r["v"])] == r["weight"] for r in rows)

    # brute-force optimal matching weight
    def best(rem, used):
        out = 0.0
        for i, (a, b, w) in enumerate(rem):
            if a in used or b in used:
                continue
            out = max(out, w + best(rem[i + 1:], used | {a, b}))
        return out

    opt = best(edges, set())
    pg_w = sum(r["weight"] for r in rows)
    lm_w = sum(r["weight"] for r in local_max_matching(g.edges).collect())
    assert pg_w >= 0.5 * opt - 1e-9
    assert lm_w >= 0.5 * opt - 1e-9


def test_path_growing_guard(spark):
    import pytest

    from icebug_spark.operators.matching import path_growing_matcher

    edges = [(0, 1, 1.0), (1, 2, 2.0)]
    g = Graph.from_edge_list(spark, edges, directed=False, weighted=True)
    with pytest.raises(ValueError, match="local_max_matching"):
        path_growing_matcher(g.edges, max_edges=1)


def test_matching_coarsening(spark):
    from icebug_spark.operators.matching import local_max_matching, matching_coarsening

    edges = [(0, 1, 3.0), (1, 2, 1.0), (2, 3, 3.0)]
    g = Graph.from_edge_list(spark, edges, directed=False, weighted=True)
    m = local_max_matching(g.edges)
    c = {(r["src"], r["dst"]): r["weight"] for r in matching_coarsening(g.edges, m).collect()}
    # super-nodes 0 (={0,1}) and 2 (={2,3}); edge 1-2 becomes 0→2 weight 1
    assert c == {(0, 2): 1.0}


def test_topological_sort(spark):
    from icebug_spark.graph.tools import topological_sort

    edges = [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4)]
    g = Graph.from_edge_list(spark, edges, directed=True)
    layers = {r["id"]: r["layer"] for r in topological_sort(g).collect()}
    for u, v in edges:
        assert layers[u] < layers[v]


def test_topological_sort_cycle_raises(spark):
    from icebug_spark.graph.tools import topological_sort

    g = Graph.from_edge_list(spark, [(0, 1), (1, 0)], directed=True)
    with pytest.raises(ValueError, match="cycle"):
        topological_sort(g)


def test_is_bipartite(spark):
    from icebug_spark.graph.tools import is_bipartite

    even_cycle = Graph.from_edge_list(spark, [(0, 1), (1, 2), (2, 3), (3, 0)], directed=False)
    assert is_bipartite(even_cycle) is True
    odd_cycle = Graph.from_edge_list(spark, [(0, 1), (1, 2), (2, 0)], directed=False)
    assert is_bipartite(odd_cycle) is False


def test_compact_and_restore(spark):
    from icebug_spark.graph.tools import compact_node_ids, restore_graph

    g = Graph.from_edge_list(spark, [(10, 20), (20, 30)], directed=True)
    gc, mapping = compact_node_ids(g)
    assert sorted(map(tuple, gc.edges.collect())) == [(0, 1), (1, 2)]
    gr = restore_graph(gc, mapping)
    assert sorted(map(tuple, gr.edges.collect())) == [(10, 20), (20, 30)]


def test_compact_is_dense_rank_and_parallel(spark):
    # mapping semantics: dense 0..n-1 by ascending old id, on a vertex
    # set big enough to span many range partitions — and the plan must
    # NOT funnel the vertex set through a single-partition Exchange
    # (the global-row_number shape this replaced).
    from icebug_spark.graph.tools import compact_node_ids

    ids = [i * 7 + 3 for i in range(5000)]
    g = Graph.from_edge_list(
        spark, [(ids[i], ids[i + 1]) for i in range(0, 4998, 2)], directed=True
    )
    gc, mapping = compact_node_ids(g)
    got = {r["old_id"]: r["new_id"] for r in mapping.collect()}
    present = sorted({u for i in range(0, 4998, 2) for u in (ids[i], ids[i + 1])})
    assert got == {old: new for new, old in enumerate(present)}
    plan = mapping._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan


def test_append_graphs(spark):
    from icebug_spark.graph.tools import append_graph

    a = Graph.from_edge_list(spark, [(0, 1)], directed=False)
    b = Graph.from_edge_list(spark, [(0, 1)], directed=False)
    ab = append_graph(a, b)
    assert sorted(map(tuple, ab.edges.collect())) == [(0, 1), (2, 3)]


def test_random_nodes_deterministic(spark):
    from icebug_spark.graph.tools import random_nodes

    g = Graph.from_edge_list(spark, [(i, i + 1) for i in range(20)], directed=False)
    a = sorted(r["id"] for r in random_nodes(g, 5, seed=1).collect())
    b = sorted(r["id"] for r in random_nodes(g, 5, seed=1).collect())
    assert a == b and len(a) == 5


def test_spanning_forest_variants(spark):
    from icebug_spark.graph.core import Graph
    from icebug_spark.operators.msf import (
        random_spanning_forest,
        spanning_forest,
        union_maximum_spanning_forest,
    )

    # two components: a 4-cycle and a 3-path
    edges = [(0, 1), (1, 2), (2, 3), (3, 0), (10, 11), (11, 12)]
    g = Graph.from_edge_list(spark, edges, directed=False)
    eu = g.symmetrized()

    sf = spanning_forest(eu)
    assert sf.count() == 5  # (4-1) + (3-1)

    rsf = random_spanning_forest(eu, seed=7)
    rows = [(r["src"], r["dst"]) for r in rsf.collect()]
    assert len(rows) == 5
    edge_set = {(min(u, v), max(u, v)) for u, v in edges}
    assert all(p in edge_set for p in rows)
    # determinism
    rows2 = [(r["src"], r["dst"]) for r in random_spanning_forest(eu, seed=7).collect()]
    assert sorted(rows) == sorted(rows2)


def test_union_maximum_spanning_forest(spark):
    from icebug_spark.operators.msf import union_maximum_spanning_forest

    # triangle with one heavy edge + a pendant: heavy edge always in MSF;
    # the two weight-1 edges tie — each is in SOME max forest; pendant always
    e = spark.createDataFrame(
        [(0, 1, 5.0), (1, 2, 1.0), (2, 0, 1.0), (2, 3, 2.0)],
        "src BIGINT, dst BIGINT, weight DOUBLE",
    )
    got = sorted(
        (r["src"], r["dst"]) for r in union_maximum_spanning_forest(e).collect()
    )
    assert got == [(0, 1), (0, 2), (1, 2), (2, 3)]

    # make one of the light edges heavier: the other is in NO max forest
    e2 = spark.createDataFrame(
        [(0, 1, 5.0), (1, 2, 3.0), (2, 0, 1.0), (2, 3, 2.0)],
        "src BIGINT, dst BIGINT, weight DOUBLE",
    )
    got2 = sorted(
        (r["src"], r["dst"]) for r in union_maximum_spanning_forest(e2).collect()
    )
    assert got2 == [(0, 1), (1, 2), (2, 3)]


def test_running_sums_matches_naive_window_and_parallel(spark):
    # parity vs the naive global cumulative window on a multi-partition
    # input, descending order, two sum columns — and no single-partition
    # Exchange in the plan (the global-window shape this replaced).
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from icebug_spark.plans.zipindex import running_sums

    rows = [(i * 3 % 971, i % 5, (i * 7) % 11) for i in range(2000)]
    df = spark.createDataFrame(rows, "s LONG, a LONG, b LONG").groupBy("s").agg(
        F.sum("a").alias("a"), F.sum("b").alias("b")
    )
    got = {
        r["s"]: (r["a"], r["b"])
        for r in running_sums(df, ["s"], ["a", "b"], descending=True).collect()
    }
    w = (
        Window.orderBy(F.col("s").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = {
        r["s"]: (r["a"], r["b"])
        for r in df.select(
            "s", F.sum("a").over(w).alias("a"), F.sum("b").over(w).alias("b")
        ).collect()
    }
    assert got == want
    out = running_sums(df, ["s"], ["a", "b"], descending=True)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan
