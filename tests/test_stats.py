"""gini / Schank-Wagner approx clustering / SpectralColoring
(operators/stats.py; reference stats.pyx:16, globals.pyx:109,
coloring.py:6)."""

import pytest
from pyspark.sql import functions as F

from icebug_spark.operators import stats


def _sym(spark, pairs):
    both = pairs + [(b, a) for a, b in pairs]
    return spark.createDataFrame(sorted(set(both)), "src LONG, dst LONG")


def _ref_gini(values):
    """The reference's literal prefix-area loop (stats.pyx:16)."""
    s = sorted(values)
    height, area = 0.0, 0.0
    for v in s:
        height += v
        area += height - v / 2.0
    fair_area = height * len(s) / 2.0
    return (fair_area - area) / fair_area


def test_gini_matches_reference_loop(spark):
    vals = [1.0, 1.0, 2.0, 5.0, 11.0, 3.0, 0.5]
    df = spark.createDataFrame([(v,) for v in vals], "x DOUBLE")
    got = stats.gini(df, "x").collect()[0]["gini"]
    assert got == pytest.approx(_ref_gini(vals), abs=1e-12)
    # uniform distribution → gini ~ 0; fully concentrated → → 1 - 1/n
    same = spark.createDataFrame([(3.0,)] * 6, "x DOUBLE")
    assert stats.gini(same, "x").collect()[0]["gini"] == pytest.approx(0.0, abs=1e-12)


def test_approx_clustering_converges_to_exact(spark):
    """K6 plus a 6-path tail: exact avg local CC over deg>=2 nodes is
    known; the sampler must land within sampling noise. Deterministic
    (hash-seeded) trials, so the assertion is stable."""
    k6 = [(a, b) for a in range(6) for b in range(a + 1, 6)]
    tail = [(5, 10), (10, 11), (11, 12), (12, 13)]
    eu = _sym(spark, k6 + tail)
    from icebug_spark.operators.triangles import local_clustering_coefficient

    exact = (
        local_clustering_coefficient(eu).agg(F.avg("lcc")).collect()[0][0]
    )
    got = stats.approx_avg_local_clustering(eu, trials=3000).collect()[0]["avg_cc"]
    assert got == pytest.approx(exact, abs=0.06)


def test_clustering_exact_path_small_graph(spark):
    """n < 100 → the exact avgLocal path (globals.pyx:126)."""
    tri = _sym(spark, [(0, 1), (1, 2), (2, 0), (2, 3)])
    got = stats.clustering(tri).collect()[0]["avg_cc"]
    # lcc: 0,1 -> 1.0; 2 -> 1/3; 3 deg-1 excluded → avg = 7/9
    assert got == pytest.approx(7.0 / 9.0, abs=1e-6)


def test_spectral_coloring_valid_on_bipartite_and_odd_cycle(spark):
    # C4 (bipartite): valid 2-coloring expected from the sign split
    c4 = _sym(spark, [(0, 1), (1, 2), (2, 3), (3, 0)])
    col = {r["id"]: r["color"] for r in stats.spectral_coloring(c4).collect()}
    for u, v in [(0, 1), (1, 2), (2, 3), (3, 0)]:
        assert col[u] != col[v]
    assert len(set(col.values())) == 2
    # C5 (odd cycle): needs >= 3 colors, still must be valid
    c5 = _sym(spark, [(0, 1), (1, 2), (2, 3), (3, 4), (4, 0)])
    col5 = {r["id"]: r["color"] for r in stats.spectral_coloring(c5).collect()}
    for u, v in [(0, 1), (1, 2), (2, 3), (3, 4), (4, 0)]:
        assert col5[u] != col5[v]
    assert len(set(col5.values())) >= 3


def test_spectral_coloring_guard(spark):
    eu = _sym(spark, [(i, i + 1) for i in range(20)])
    with pytest.raises(ValueError, match="greedy_coloring"):
        stats.spectral_coloring(eu, max_nodes=5)


def _ref_ranked(sample):
    """The reference's literal average-rank loop (helpers.pyx:21)."""
    helper = sorted((v, i) for i, v in enumerate(sample))
    result = [0.0] * len(sample)
    value, summ, length = helper[0][0], 0.0, 0
    for i in range(len(sample)):
        if value == helper[i][0]:
            summ += i + 1
            length += 1
        else:
            summ /= length
            for j in range(length):
                result[helper[i - j - 1][1]] = summ
            value, summ, length = helper[i][0], i + 1.0, 1
    summ /= length
    for j in range(length):
        result[helper[len(sample) - j - 1][1]] = summ
    return result


def test_ranked_matches_reference_loop(spark):
    vals = [3.0, 1.0, 2.0, 3.0, 1.0, 1.0, 7.0]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "i LONG, x DOUBLE"
    )
    got = {
        r["i"]: r["rank"]
        for r in stats.ranked(df, "x").collect()
    }
    exp = _ref_ranked(vals)
    for i, e in enumerate(exp):
        assert got[i] == pytest.approx(e, abs=1e-12)


def test_measure_correlations_goldens(spark):
    """Perfectly monotone but non-linear pair: Spearman exactly 1,
    Pearson < 1, Fechner 1 (profiling/stat.py:418 semantics; Fechner
    counts zero deviation products as +1 per copysign)."""
    a = [1.0, 2.0, 3.0, 4.0, 5.0]
    b = [x**3 for x in a]
    df = spark.createDataFrame(list(zip(a, b)), "a DOUBLE, b DOUBLE")
    row = stats.measure_correlations(df, "a", "b").collect()[0]
    assert row["spearman"] == pytest.approx(1.0, abs=1e-9)
    assert row["fechner"] == pytest.approx(1.0, abs=1e-12)
    assert 0.9 < row["pearson"] < 1.0
    # numpy cross-check of the population formulas
    import numpy as np

    aa, bb = np.array(a), np.array(b)
    pearson = ((aa - aa.mean()) * (bb - bb.mean())).mean() / (
        aa.std() * bb.std()
    )
    assert row["pearson"] == pytest.approx(pearson, abs=1e-6)
    assert row["covariance"] == pytest.approx(
        ((aa - aa.mean()) * (bb - bb.mean())).mean(), abs=1e-6
    )


def test_global_rank_operators_have_no_single_partition_stage(spark):
    """The round-8 verdict's last perf item: gini / ranked /
    linearize_score must rank via the two-pass zipindex pattern, never
    an Exchange SinglePartition (the un-partitioned global window that
    serializes the whole input into one task at scale)."""
    from icebug_spark.operators.edgescores import linearize_score

    def check(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        lines = plan.splitlines()
        for i, line in enumerate(lines):
            # the sole legitimate SinglePartition is the final scalar
            # aggregate's partial->final exchange (P partial rows)
            if "Exchange SinglePartition" in line:
                assert "partial_" in lines[i + 1], plan
            # every Window must be partitioned: partitioned windows render
            # as "Window [exprs], [partition], [order]" (three groups)
            if line.strip().lstrip("+-: ").startswith("Window "):
                assert line.count("], [") >= 2, plan

    vals = spark.createDataFrame(
        [(float(i % 7),) for i in range(50)], "x DOUBLE"
    )
    check(stats.gini(vals, "x"))
    check(stats.ranked(vals, "x"))

    scored = spark.createDataFrame(
        [(i, i + 1, float(i % 5)) for i in range(40)],
        "u LONG, v LONG, score DOUBLE",
    )
    for inverse in (False, True):
        check(linearize_score(scored, "score", inverse=inverse))
