"""SCD expander family tests (scd2.py): GCE, TCE, LTE, LocalT,
TwoPhaseL, CliqueDetect, CombinedSCD, ground-truth comparison.

Fixture: two 4-cliques joined by a single bridge (3-4). Every seeded
expander started inside a clique should recover (a superset-free subset
of) that clique and never leak across the bridge into the far clique's
interior beyond the bridge endpoint.
"""

import pytest
from pyspark.sql import functions as F


def _eu(spark, pairs):
    rows = [(u, v) for u, v in pairs] + [(v, u) for u, v in pairs]
    return spark.createDataFrame(sorted(set(rows)), "src BIGINT, dst BIGINT")


TWO_CLIQUES = (
    [(a, b) for a in range(4) for b in range(4) if a < b]
    + [(a, b) for a in range(4, 8) for b in range(4, 8) if a < b]
    + [(3, 4)]
)


def _members(df):
    by_seed = {}
    for r in df.collect():
        by_seed.setdefault(r["seed"], set()).add(r["id"])
    return by_seed


@pytest.mark.parametrize("algo", ["gce_m", "gce_l", "tce", "lte", "local_t", "lfm_local"])
def test_expander_recovers_clique(spark, algo):
    from icebug_spark.operators.scd2 import expand_communities

    eu = _eu(spark, TWO_CLIQUES)
    got = _members(expand_communities(eu, [0], algo=algo))
    C = got[0]
    assert 0 in C
    assert {0, 1, 2} <= C  # the seed's clique core
    # never absorbs the far clique's interior (5,6,7 have no tie to C
    # except through the bridge)
    assert not ({5, 6, 7} & C)


def test_two_phase_l_keeps_seed(spark):
    from icebug_spark.operators.scd2 import expand_communities

    eu = _eu(spark, TWO_CLIQUES)
    got = _members(expand_communities(eu, [0], algo="two_phase_l"))
    C = got.get(0, set())
    # TwoPhaseL may return empty if the seed is removed; on a clean
    # clique it must keep the seed and stay on the seed's side.
    if C:
        assert 0 in C
        assert not ({5, 6, 7} & C)


def test_clique_detect_finds_seed_clique(spark):
    from icebug_spark.operators.scd2 import expand_communities

    eu = _eu(spark, TWO_CLIQUES)
    got = _members(expand_communities(eu, [1], algo="clique"))
    # max clique in N(1) is {0,2,3}; plus the seed
    assert got[1] == {0, 1, 2, 3}


def test_batched_seeds_one_pass(spark):
    from icebug_spark.operators.scd2 import expand_communities

    eu = _eu(spark, TWO_CLIQUES)
    got = _members(expand_communities(eu, [0, 7], algo="gce_m"))
    assert {0, 1, 2} <= got[0] and not ({5, 6, 7} & got[0])
    assert {5, 6, 7} <= got[7] and not ({0, 1, 2} & got[7])


def test_combined_scd(spark):
    from icebug_spark.operators.scd2 import combined_scd

    eu = _eu(spark, TWO_CLIQUES)
    got = _members(combined_scd(eu, [1], first="clique", second="gce_m"))
    assert {0, 1, 2, 3} <= got[1]
    assert not ({5, 6, 7} & got[1])


def test_ground_truth_comparison_exact_match(spark):
    from icebug_spark.operators.scd2 import ground_truth_comparison

    det = spark.createDataFrame(
        [(0, i) for i in range(4)], "seed BIGINT, id BIGINT"
    )
    gt = spark.createDataFrame(
        [(i, 10) for i in range(4)] + [(i, 20) for i in range(4, 8)],
        "id BIGINT, subset BIGINT",
    )
    row = ground_truth_comparison(det, gt).collect()[0]
    assert row["subset"] == 10
    assert row["tp"] == 4 and row["precision"] == 1.0 and row["recall"] == 1.0
    assert row["f1"] == 1.0 and row["jaccard"] == 1.0


def test_ground_truth_comparison_partial(spark):
    from icebug_spark.operators.scd2 import ground_truth_comparison

    # detected {0,1,2,4}: 3 of 4 truth members + 1 outsider
    det = spark.createDataFrame(
        [(0, 0), (0, 1), (0, 2), (0, 4)], "seed BIGINT, id BIGINT"
    )
    gt = spark.createDataFrame(
        [(i, 10) for i in range(4)] + [(i, 20) for i in range(4, 8)],
        "id BIGINT, subset BIGINT",
    )
    row = ground_truth_comparison(det, gt).collect()[0]
    assert row["tp"] == 3
    assert row["precision"] == pytest.approx(0.75)
    assert row["recall"] == pytest.approx(0.75)
    assert row["jaccard"] == pytest.approx(3 / 5)
