"""Sparsification part 2 tests: local similarity / local filter / RNE /
packaged sparsifiers, on hand-computed graphs."""

import math

import pytest
from pyspark.sql import functions as F


def _edges(spark, pairs):
    return spark.createDataFrame([(u, v) for u, v in pairs], "src BIGINT, dst BIGINT")


# K4 minus edge (2,3): edges 0-1,0-2,0-3,1-2,1-3 — a diamond.
DIAMOND = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3)]


def test_local_similarity_diamond(spark):
    from icebug_spark.operators.sparsify2 import local_similarity_score

    out = {
        (r["u"], r["v"]): r["ls_score"]
        for r in local_similarity_score(_edges(spark, DIAMOND)).collect()
    }
    # tri: (0,1)=2 others=1. deg: 0->3, 1->3, 2->2, 3->2.
    # sim(0,1)=2/(3+3-2)=0.5; sim(0,2)=1/(3+2-1)=0.25; sim(0,3)=0.25;
    # sim(1,2)=0.25; sim(1,3)=0.25.
    # node0 (d=3) ranks: (0,1) r1 e=1; (0,2) r2 e=1-ln2/ln3; (0,3) r3 e=0.
    # node2 (d=2) ranks: (0,2) r1 e=1; (1,2) r2 e=1-ln2/ln2=0.
    # edge (0,2): max(1-ln2/ln3, 1) = 1.
    assert out[(0, 1)] == pytest.approx(1.0, abs=1e-6)
    assert out[(0, 2)] == pytest.approx(1.0, abs=1e-6)  # rank-1 at node 2
    # edge (1,3): node1 view rank3 (nbr asc ties: 2 then 3) -> e=0;
    # node3 view rank2 (tie with 0, nbr asc puts 0 first) -> e=1-ln2/ln2=0.
    assert out[(1, 3)] == pytest.approx(0.0, abs=1e-6)
    # edge (0,3): node0 rank3 -> 0; node3 (d=2) rank1 -> 1.
    assert out[(0, 3)] == pytest.approx(1.0, abs=1e-6)
    # edge (1,2): node1 rank2 -> 1-ln2/ln3; node2 rank2 -> 0.
    assert out[(1, 2)] == pytest.approx(1 - math.log(2) / math.log(3), abs=1e-6)


def test_local_filter_log_and_linear(spark):
    from icebug_spark.operators.sparsify2 import local_filter_score

    # star 0-{1,2,3} with attribute = 3,2,2 (tie on rank 2).
    attr = spark.createDataFrame(
        [(0, 1, 3.0), (0, 2, 2.0), (0, 3, 2.0)], "u BIGINT, v BIGINT, score DOUBLE"
    )
    logv = {
        (r["u"], r["v"]): r["lf_score"] for r in local_filter_score(attr).collect()
    }
    # node0 d=3: ranks 1,2,2 (rank() ties share) -> e = 1, 1-ln2/ln3, same.
    # leaves d=1 -> e=1 -> max always 1.0.
    assert logv == {(0, 1): 1.0, (0, 2): 1.0, (0, 3): 1.0}
    # path graph 0-1, 1-2: node1 sees both with distinct attrs.
    attr2 = spark.createDataFrame(
        [(0, 1, 5.0), (1, 2, 1.0)], "u BIGINT, v BIGINT, score DOUBLE"
    )
    lin = {
        (r["u"], r["v"]): r["lf_score"]
        for r in local_filter_score(attr2, logarithmic=False).collect()
    }
    # node1 d=2: (0,1) rank1 e=1; (1,2) rank2 e=1-(2-1)/(2-1)=0.
    # endpoints d=1 -> 1.0. max: both 1.0.
    assert lin == {(0, 1): 1.0, (1, 2): 1.0}
    # triangle + pendant so interior max isn't always 1: 0-1,0-2,1-2,0-3
    # with attrs favoring (0,1).
    attr3 = spark.createDataFrame(
        [(0, 1, 9.0), (0, 2, 5.0), (1, 2, 4.0), (0, 3, 1.0)],
        "u BIGINT, v BIGINT, score DOUBLE",
    )
    lin3 = {
        (r["u"], r["v"]): r["lf_score"]
        for r in local_filter_score(attr3, logarithmic=False).collect()
    }
    # (1,2): node1 d=2 rank2 -> 0; node2 d=2 rank2 -> 0 => 0.0
    assert lin3[(1, 2)] == pytest.approx(0.0, abs=1e-6)
    # (0,2): node0 d=3 rank2 -> 1-1/2=0.5; node2 rank1 -> 1 => 1.0
    assert lin3[(0, 2)] == pytest.approx(1.0, abs=1e-6)
    # (0,3): node0 rank3 -> 0; node3 d=1 -> 1 => 1.0
    assert lin3[(0, 3)] == pytest.approx(1.0, abs=1e-6)


def test_random_node_edge_score_properties(spark):
    from icebug_spark.operators.sparsify2 import random_node_edge_score

    out = random_node_edge_score(_edges(spark, DIAMOND), rne_ratio=0.5).collect()
    m = len(DIAMOND)
    scores = sorted(r["rne_score"] for r in out)
    assert len(out) == m
    assert scores == [pytest.approx(i / m, abs=1e-6) for i in range(m)]
    # deterministic under the same seed
    again = sorted(
        (r["u"], r["v"], r["rne_score"])
        for r in random_node_edge_score(_edges(spark, DIAMOND), rne_ratio=0.5).collect()
    )
    assert again == sorted((r["u"], r["v"], r["rne_score"]) for r in out)


def test_packaged_sparsifiers_subset_semantics(spark):
    from icebug_spark.operators.sparsify2 import (
        local_similarity_sparsifier,
        multiscale_sparsifier,
        random_sparsifier,
        simmelian_multiscale_sparsifier,
        simmelian_sparsifier_non_parametric,
        simmelian_sparsifier_parametric,
    )

    e = _edges(spark, DIAMOND)
    ew = spark.createDataFrame(
        [(u, v, 1.0 + u + v) for u, v in DIAMOND], "src BIGINT, dst BIGINT, weight DOUBLE"
    )
    all_edges = set(DIAMOND)
    for kept in [
        simmelian_sparsifier_non_parametric(e, threshold=0.3),
        simmelian_sparsifier_parametric(e, max_rank=5, min_overlap=1),
        multiscale_sparsifier(ew, alpha=0.3),
        local_similarity_sparsifier(e, e=0.5),
        simmelian_multiscale_sparsifier(e, alpha=0.3),
        random_sparsifier(e, ratio=0.4),
    ]:
        rows = {(r["u"], r["v"]) for r in kept.select("u", "v").collect()}
        assert rows <= all_edges
    # parametric with min_overlap=1: a diamond edge's top-rank neighborhoods
    # always share at least one common triangle partner except none -> check
    # the strongest edge (0,1) survives (overlap 2).
    kept01 = {
        (r["u"], r["v"])
        for r in simmelian_sparsifier_parametric(e, max_rank=5, min_overlap=2)
        .select("u", "v")
        .collect()
    }
    assert (0, 1) in kept01 and len(kept01) == 1
