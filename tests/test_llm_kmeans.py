"""Deterministic integer k-means + SemDeDup tests."""

import pytest


def _emb(spark, vecs):
    return spark.createDataFrame(
        [(i, v, 0) for i, v in enumerate(vecs)],
        "vec_id LONG, embedding ARRAY<FLOAT>, label INT",
    )


def test_kmeans_two_obvious_clusters(spark):
    from icebug_spark.llm.similarity import kmeans_assign

    # two tight groups far apart; init = first k vec_ids (one from each)
    vecs = [
        [1.0, 0.0], [10.0, 10.0],
        [1.1, 0.1], [10.1, 9.9],
        [0.9, -0.1], [9.9, 10.1],
    ]
    out = {r["vec_id"]: r["cell"] for r in kmeans_assign(_emb(spark, vecs), k=2, iters=2).collect()}
    assert out[0] == out[2] == out[4]
    assert out[1] == out[3] == out[5]
    assert out[0] != out[1]


def test_kmeans_iter0_is_nearest_init(spark):
    from icebug_spark.llm.similarity import kmeans_assign

    vecs = [[0.0, 0.0], [4.0, 0.0], [1.0, 0.0], [3.0, 0.0]]
    # iters=0: assign to nearest of init centroids (vec 0 at x=0, vec 1
    # at x=4); tie impossible here
    out = {r["vec_id"]: r["cell"] for r in kmeans_assign(_emb(spark, vecs), k=2, iters=0).collect()}
    assert out == {0: 0, 1: 1, 2: 0, 3: 1}


def test_kmeans_guards(spark):
    from icebug_spark.llm.similarity import kmeans_assign

    with pytest.raises(ValueError):
        kmeans_assign(_emb(spark, [[0.0]]), k=0)
    with pytest.raises(ValueError):
        kmeans_assign(_emb(spark, [[0.0]]), iters=-1)


def test_semdedup_exact_threshold(spark):
    from icebug_spark.llm.similarity import semdedup_pairs

    # vec 0 and 2 are parallel (cos=1); vec 1 orthogonal to both; use
    # k=1 so everything shares a cell and only cosine decides
    vecs = [[1.0, 0.0], [0.0, 1.0], [2.0, 0.0]]
    got = {
        (r["vec_a"], r["vec_b"])
        for r in semdedup_pairs(
            _emb(spark, vecs), k=1, iters=1, threshold_num=19, threshold_den=20
        ).collect()
    }
    assert got == {(0, 2)}


def test_kmeans_sql_twin_matches(spark):
    import duckdb

    from icebug_spark.llm.similarity import (
        kmeans_assign,
        kmeans_assign_sql,
        semdedup_pairs,
        semdedup_pairs_sql,
    )

    vecs = [
        [float((7 * i + d) % 5) - 2.0 for d in range(4)] for i in range(30)
    ]
    emb = _emb(spark, vecs)
    con = duckdb.connect()
    con.register("embeddings", emb.toPandas())
    a = sorted(map(tuple, kmeans_assign(emb, 4, 2).collect()))
    b = sorted(map(tuple, con.sql(kmeans_assign_sql(4, 2)).fetchall()))
    assert a == b
    pa = sorted(map(tuple, semdedup_pairs(emb, 4, 2, 1000, 3, 5).collect()))
    pb = sorted(map(tuple, con.sql(semdedup_pairs_sql(4, 2, 1000, 3, 5)).fetchall()))
    assert pa == pb


def test_kcenter_farthest_first(spark):
    from icebug_spark.llm.similarity import kcenter_select

    # seed = vec 0 at origin; farthest is vec 2 at (10,0); then vec 1 at
    # (0,4) whose min-dist to {0, 2} is 16 (to origin)
    vecs = [[0.0, 0.0], [0.0, 4.0], [10.0, 0.0], [1.0, 0.0]]
    out = sorted(
        map(tuple, kcenter_select(_emb(spark, vecs), k=3, scale=1).collect())
    )
    assert out == [(0, 0, 0), (1, 2, 100), (2, 1, 16)]


def test_kcenter_radius_nonincreasing(spark):
    from icebug_spark.llm.similarity import kcenter_select

    vecs = [
        [float((13 * i + d * 5) % 17) for d in range(4)] for i in range(25)
    ]
    out = sorted(
        map(tuple, kcenter_select(_emb(spark, vecs), k=6).collect())
    )
    d2s = [d2 for _, _, d2 in out[1:]]
    # the classic greedy-k-center certificate: selection radii never grow
    assert all(a >= b for a, b in zip(d2s, d2s[1:]))
    # ranks contiguous, vec_ids distinct
    assert [r for r, _, _ in out] == list(range(6))
    assert len({v for _, v, _ in out}) == 6


def test_kcenter_guard(spark):
    import pytest as _pytest

    from icebug_spark.llm.similarity import kcenter_select, kcenter_select_sql

    with _pytest.raises(ValueError):
        kcenter_select(_emb(spark, [[0.0]]), k=0)
    with _pytest.raises(ValueError):
        kcenter_select_sql(0)
