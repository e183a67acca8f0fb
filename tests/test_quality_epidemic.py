"""Quality measures part 2 + permanence + SEIR tests."""

import pytest
from pyspark.sql import functions as F


def _eu(spark, pairs):
    rows = sorted({(u, v) for u, v in pairs} | {(v, u) for u, v in pairs})
    return spark.createDataFrame(rows, "src BIGINT, dst BIGINT")


def _part(spark, mapping):
    return spark.createDataFrame(list(mapping.items()), "id BIGINT, subset BIGINT")


# two triangles {0,1,2} {3,4,5} joined by bridge 2-3
TWO_TRI = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
PART = {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 1}


def test_hub_dominance(spark):
    from icebug_spark.operators.quality import hub_dominance

    out = {
        r["subset"]: r["hub_dominance"]
        for r in hub_dominance(_eu(spark, TWO_TRI), _part(spark, PART)).collect()
    }
    # each triangle cluster: max internal degree 2 / (3-1) = 1.0
    assert out == {0: 1.0, 1: 1.0}


def test_intrapartition_density(spark):
    from icebug_spark.operators.quality import intrapartition_density

    out = {
        r["subset"]: r["density"]
        for r in intrapartition_density(_eu(spark, TWO_TRI), _part(spark, PART)).collect()
    }
    assert out == {0: 1.0, 1: 1.0}


def test_isolated_interpartition(spark):
    from icebug_spark.operators.quality import isolated_interpartition_conductance

    out = {
        r["subset"]: (r["conductance"], r["expansion"])
        for r in isolated_interpartition_conductance(
            _eu(spark, TWO_TRI), _part(spark, PART)
        ).collect()
    }
    # each cluster: cut=1, vol=7, vol_g=14 -> cond=1/7; expansion=1/3
    assert out[0][0] == pytest.approx(1 / 7, abs=1e-6)
    assert out[0][1] == pytest.approx(1 / 3, abs=1e-6)


def test_stable_partition_nodes(spark):
    from icebug_spark.operators.quality import stable_partition_nodes

    out = stable_partition_nodes(_eu(spark, TWO_TRI), _part(spark, PART)).collect()[0]
    # all 6 nodes have intra>inter (2>1 for bridge endpoints, 2>0 others)
    assert out["stable_fraction"] == pytest.approx(1.0)


def test_local_partition_coverage(spark):
    from icebug_spark.operators.quality import local_partition_coverage

    out = {
        r["id"]: r["coverage"]
        for r in local_partition_coverage(_eu(spark, TWO_TRI), _part(spark, PART)).collect()
    }
    assert out[0] == pytest.approx(1.0)
    assert out[2] == pytest.approx(2 / 3, abs=1e-6)  # nbrs 0,1 intra; 3 inter


def test_partition_fragmentation(spark):
    from icebug_spark.operators.quality import partition_fragmentation

    # cluster 0 = {0,1,2} connected; cluster 1 = {3,4,5} but drop edges to 5
    eu = _eu(spark, [(0, 1), (1, 2), (0, 2), (3, 4)])
    part = _part(spark, {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 1})
    out = {
        r["subset"]: r["fragmentation"]
        for r in partition_fragmentation(eu, part).collect()
    }
    assert out[0] == pytest.approx(0.0)
    assert out[1] == pytest.approx(1 - 2 / 3, abs=1e-6)  # pieces {3,4},{5}


def test_cover_f1(spark):
    from icebug_spark.operators.quality import cover_f1_similarity

    cover = spark.createDataFrame(
        [(0, 10), (1, 10), (2, 10), (3, 20), (4, 20)], "id BIGINT, subset BIGINT"
    )
    ref = spark.createDataFrame(
        [(0, 7), (1, 7), (2, 7), (3, 7), (4, 8)], "id BIGINT, subset BIGINT"
    )
    out = {r["subset"]: r["f1"] for r in cover_f1_similarity(cover, ref).collect()}
    # subset 10 vs ref 7: i=3, na=3, nb=4 -> 6/7
    assert out[10] == pytest.approx(6 / 7, abs=1e-6)
    # subset 20: vs 7 -> 2*1/6; vs 8 -> 2*1/3 -> best 2/3
    assert out[20] == pytest.approx(2 / 3, abs=1e-6)


def test_permanence_internal_node(spark):
    from icebug_spark.operators.quality import permanence

    out = {
        r["id"]: r["permanence"]
        for r in permanence(_eu(spark, TWO_TRI), _part(spark, PART)).collect()
    }
    # node 0: internal=2, emax=0->1, deg=2, cc_int=1 -> 2/(1*2) - 0 = 1.0
    assert out[0] == pytest.approx(1.0, abs=1e-6)
    # node 2: internal=2, emax=1, deg=3, cc_int=1 -> 2/3 - 0
    assert out[2] == pytest.approx(2 / 3, abs=1e-6)


def test_seir_full_infection_deterministic(spark):
    from icebug_spark.operators.epidemic import seir_simulation

    # path graph, transP=1 -> wave marches down the path
    eu = _eu(spark, [(0, 1), (1, 2), (2, 3)])
    out = seir_simulation(eu, zero=0, t_inc=1, t_inf=2, trans_p=1.0, steps=15, seed=1)
    rows = {r["step"]: r for r in out.collect()}
    assert rows[0]["n_infectious"] == 1 and rows[0]["n_susceptible"] == 3
    last = rows[max(rows)]
    # eventually everyone recovered
    assert last["n_recovered"] + last["n_infectious"] + last["n_exposed"] >= 3


def test_seir_zero_transmission(spark):
    from icebug_spark.operators.epidemic import seir_simulation

    eu = _eu(spark, [(0, 1), (1, 2)])
    out = seir_simulation(eu, zero=0, t_inc=1, t_inf=2, trans_p=0.0, steps=10, seed=1)
    last = sorted(out.collect(), key=lambda r: r["step"])[-1]
    assert last["n_recovered"] == 1 and last["n_susceptible"] == 2
