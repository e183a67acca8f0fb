"""Golden tests for the point-to-point distance family
(bidirectional BFS/Dijkstra, A*, multi-target, Floyd-Warshall, ReverseBFS).
Reference behaviors: networkit/test/test_distance.py."""

import math

import pytest
from pyspark.sql import functions as F

from icebug_spark.operators import pointtopoint as pp
from icebug_spark.operators.traversal import bfs_distances, sssp_weighted


def _edges(spark, pairs, weighted=False):
    if weighted:
        return spark.createDataFrame(
            [(a, b, float(w)) for a, b, w in pairs],
            "src BIGINT, dst BIGINT, weight DOUBLE",
        )
    return spark.createDataFrame(
        [(a, b) for a, b in pairs], "src BIGINT, dst BIGINT"
    )


def _sym(pairs):
    return [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]


def _symw(pairs):
    return [(a, b, w) for a, b, w in pairs] + [(b, a, w) for a, b, w in pairs]


# path 0-1-2-3-4-5 plus shortcut 0-9-5
PATH = _sym([(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (0, 9), (9, 5)])


def test_bidirectional_bfs_matches_bfs(spark):
    e = _edges(spark, PATH)
    full = {r["id"]: r["dist"] for r in bfs_distances(e, 0).collect()}
    for t in (5, 3, 9):
        got = pp.bidirectional_bfs(e, 0, t).collect()
        assert len(got) == 1 and got[0]["dist"] == full[t]


def test_bidirectional_bfs_self_and_unreachable(spark):
    e = _edges(spark, _sym([(0, 1), (2, 3)]))
    assert pp.bidirectional_bfs(e, 0, 0).collect()[0]["dist"] == 0
    assert pp.bidirectional_bfs(e, 0, 3).count() == 0


def test_bidirectional_bfs_directed(spark):
    e = _edges(spark, [(0, 1), (1, 2), (2, 0)])  # directed 3-cycle
    assert pp.bidirectional_bfs(e, 0, 2).collect()[0]["dist"] == 2
    assert pp.bidirectional_bfs(e, 2, 1).collect()[0]["dist"] == 2


WEIGHTED = _symw(
    [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0), (0, 4, 10.0), (4, 3, 1.0)]
)


def test_bidirectional_dijkstra_matches_sssp(spark):
    e = _edges(spark, WEIGHTED, weighted=True)
    full = {r["id"]: r["dist"] for r in sssp_weighted(e, 0).collect()}
    for t in (3, 4, 2):
        got = pp.bidirectional_dijkstra(e, 0, t).collect()
        assert len(got) == 1
        assert got[0]["dist"] == pytest.approx(full[t])


def test_bidirectional_dijkstra_unreachable(spark):
    e = _edges(spark, [(0, 1, 1.0), (2, 3, 1.0)], weighted=True)
    assert pp.bidirectional_dijkstra(e, 0, 3).count() == 0


def test_astar_zero_heuristic_is_dijkstra(spark):
    e = _edges(spark, WEIGHTED, weighted=True)
    got = pp.astar(e, 0, 3).collect()
    assert got[0]["dist"] == pytest.approx(3.0)


def test_astar_admissible_heuristic_same_answer(spark):
    e = _edges(spark, WEIGHTED, weighted=True)
    # h = hop-distance to target 3 times min edge weight (1.0) — admissible
    hops = {3: 0, 2: 1, 4: 1, 1: 2, 0: 3}
    h = spark.createDataFrame(
        [(k, float(v)) for k, v in hops.items()], "id BIGINT, h DOUBLE"
    )
    got = pp.astar(e, 0, 3, heuristic=h).collect()
    assert got[0]["dist"] == pytest.approx(3.0)


def test_multi_target_bfs(spark):
    e = _edges(spark, PATH)
    got = {r["id"]: r["dist"] for r in pp.multi_target_bfs(e, 0, [2, 5, 9]).collect()}
    assert got == {2: 2, 5: 2, 9: 1}


def test_multi_target_bfs_unreachable_target_omitted(spark):
    e = _edges(spark, _sym([(0, 1), (5, 6)]))
    got = {r["id"]: r["dist"] for r in pp.multi_target_bfs(e, 0, [1, 6]).collect()}
    assert got == {1: 1}


def test_multi_target_dijkstra(spark):
    e = _edges(spark, WEIGHTED, weighted=True)
    got = {r["id"]: r["dist"] for r in pp.multi_target_dijkstra(e, 0, [3, 4]).collect()}
    assert got[3] == pytest.approx(3.0)
    assert got[4] == pytest.approx(4.0)  # 0-1-2-3-4 beats the 10.0 edge


def test_floyd_warshall_matches_sssp(spark):
    e = _edges(spark, WEIGHTED, weighted=True)
    d = pp.floyd_warshall(e)
    got = {
        (r["src"], r["dst"]): r["dist"]
        for r in d.collect()
    }
    full = {r["id"]: r["dist"] for r in sssp_weighted(e, 0).collect()}
    for t, expect in full.items():
        assert got[(0, t)] == pytest.approx(expect)
    assert got[(2, 2)] == 0.0


def test_floyd_warshall_negative_edge_and_cycle(spark):
    # directed: 0→1 (5), 1→2 (-3), 0→2 (4) — negative edge, no cycle
    e = _edges(spark, [(0, 1, 5.0), (1, 2, -3.0), (0, 2, 4.0)], weighted=True)
    d = {(r["src"], r["dst"]): r for r in pp.floyd_warshall(e).collect()}
    assert d[(0, 2)]["dist"] == pytest.approx(2.0)
    assert not d[(0, 2)]["in_negative_cycle"]
    # add a negative cycle 3→4→3
    e2 = _edges(
        spark,
        [(0, 1, 5.0), (3, 4, 1.0), (4, 3, -2.0)],
        weighted=True,
    )
    d2 = pp.floyd_warshall(e2)
    neg = {r["src"] for r in d2.where(F.col("in_negative_cycle")).collect()}
    assert {3, 4} <= neg
    assert 0 not in neg


def test_floyd_warshall_size_guard(spark):
    e = _edges(spark, [(i, i + 1, 1.0) for i in range(30)], weighted=True)
    with pytest.raises(ValueError):
        pp.floyd_warshall(e, max_nodes=10)


def test_apsp_small(spark):
    e = _edges(spark, _sym([(0, 1), (1, 2)]))
    got = {
        (r["source"], r["id"]): r["dist"] for r in pp.apsp(e).collect()
    }
    assert got[(0, 2)] == 2 and got[(2, 0)] == 2 and got[(1, 1)] == 0


def test_reverse_bfs(spark):
    e = _edges(spark, [(0, 1), (1, 2)])  # directed chain
    got = {r["id"]: r["dist"] for r in pp.reverse_bfs(e, 2).collect()}
    assert got == {2: 0, 1: 1, 0: 2}
