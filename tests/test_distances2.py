"""ANF sketches, landmark oracle, SPSP, top-k/group centrality tests."""

import pytest
from pyspark.sql import functions as F


def _eu(spark, pairs):
    rows = sorted({(u, v) for u, v in pairs} | {(v, u) for u, v in pairs})
    return spark.createDataFrame(rows, "src BIGINT, dst BIGINT")


PATH5 = [(i, i + 1) for i in range(5)]  # path 0-1-2-3-4-5


def test_anf_monotone_and_saturates(spark):
    from icebug_spark.operators.distances2 import anf_sketch_iteration

    nf = {r["h"]: r["n_pairs_est"] for r in anf_sketch_iteration(_eu(spark, PATH5), k=32, max_h=6).collect()}
    assert nf[0] == 6.0
    vals = [nf[h] for h in sorted(nf)]
    assert all(b >= a - 1e-9 for a, b in zip(vals, vals[1:]))
    # saturated estimate approximates n^2 = 36 within sketch error
    assert vals[-1] == pytest.approx(36.0, rel=0.5)


def test_anf_effective_diameter_path(spark):
    from icebug_spark.operators.distances2 import anf_effective_diameter

    out = anf_effective_diameter(_eu(spark, PATH5), max_h=6).collect()[0]
    assert 2 <= out["effective_diameter_est"] <= 5


def test_hop_plot_fractions(spark):
    from icebug_spark.operators.distances2 import hop_plot

    hp = {r["h"]: r["fraction"] for r in hop_plot(_eu(spark, PATH5), max_h=6).collect()}
    assert hp[max(hp)] == pytest.approx(1.0)
    assert all(0 <= v <= 1.0 for v in hp.values())


def test_landmark_oracle_exact_on_tree(spark):
    from icebug_spark.operators.distances2 import landmark_distance, landmark_labels

    # star-of-paths: center 0 with arms; landmarks include hub 0 → exact
    eu = _eu(spark, [(0, 1), (1, 2), (0, 3), (3, 4), (0, 5)])
    labels = landmark_labels(eu, n_landmarks=2)
    pairs = spark.createDataFrame([(2, 4), (1, 5), (2, 5)], "u BIGINT, v BIGINT")
    out = {(r["u"], r["v"]): r["dist_ub"] for r in landmark_distance(labels, pairs).collect()}
    assert out[(2, 4)] == 4  # 2-1-0-3-4
    assert out[(1, 5)] == 2
    assert out[(2, 5)] == 3


def test_spsp_grid(spark):
    from icebug_spark.operators.distances2 import spsp

    out = {
        (r["source"], r["target"]): r["dist"]
        for r in spsp(_eu(spark, PATH5), [0, 1], [3, 5]).collect()
    }
    assert out == {(0, 3): 3, (0, 5): 5, (1, 3): 2, (1, 5): 4}


def test_top_harmonic_closeness_star(spark):
    from icebug_spark.operators.centrality3 import top_harmonic_closeness

    # star: center 0 has max harmonic closeness
    eu = _eu(spark, [(0, i) for i in range(1, 8)])
    top = top_harmonic_closeness(eu, k=3).collect()
    assert top[0]["id"] == 0
    assert top[0]["harmonic"] == pytest.approx(7.0)
    # leaves: 1 + 6*(1/2) = 4.0
    assert top[1]["harmonic"] == pytest.approx(4.0)


def test_group_degree_greedy_two_stars(spark):
    from icebug_spark.operators.centrality3 import group_degree_greedy

    # two stars with hubs 0 (7 leaves) and 100 (5 leaves)
    eu = _eu(spark, [(0, i) for i in range(1, 8)] + [(100, 100 + i) for i in range(1, 6)])
    got = group_degree_greedy(eu, k=2).collect()
    assert [r["id"] for r in got] == [0, 100]
    assert got[0]["marginal_gain"] == 7 and got[1]["marginal_gain"] == 5


def test_group_harmonic_greedy_covers_both_clusters(spark):
    from icebug_spark.operators.centrality3 import group_harmonic_greedy

    eu = _eu(spark, [(0, i) for i in range(1, 8)] + [(100, 100 + i) for i in range(1, 6)])
    got = group_harmonic_greedy(eu, k=2)
    ids = [r["id"] for r in got.collect()]
    assert ids == [0, 100]
