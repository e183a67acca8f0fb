"""CutClustering, ParallelAgglomerative, LPDegreeOrdered, OverlappingNMI,
sampled Rand, DynamicNMI tests with hand-built fixtures."""

import pytest
from pyspark.sql import functions as F


def _sym(spark, pairs, weights=None):
    rows = []
    for i, (u, v) in enumerate(pairs):
        w = 1.0 if weights is None else float(weights[i])
        rows.append((u, v, w))
        rows.append((v, u, w))
    return spark.createDataFrame(rows, "src BIGINT, dst BIGINT, weight DOUBLE")


# two triangles joined by one weak bridge (2-3)
TRI = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
TRI_W = [1, 1, 1, 1, 1, 1, 0.1]


def test_modularity_scoring_bridge_scores_lowest(spark):
    from icebug_spark.operators.community3 import modularity_scoring

    e = _sym(spark, TRI, TRI_W)
    sc = {
        (r["src"], r["dst"]): r["score"]
        for r in modularity_scoring(e).collect()
    }
    assert sc[(2, 3)] < sc[(0, 1)]
    assert sc[(2, 3)] < sc[(3, 4)]
    assert sc[(0, 1)] == pytest.approx(sc[(1, 0)])


def test_cut_clustering_two_triangles(spark):
    from icebug_spark.operators.community3 import cut_clustering

    e = _sym(spark, TRI, TRI_W)
    part = {r["id"]: r["subset"] for r in cut_clustering(e, alpha=0.3).collect()}
    assert len(part) == 6
    assert part[0] == part[1] == part[2]
    assert part[3] == part[4] == part[5]
    assert part[0] != part[3]


def test_cut_clustering_size_guard(spark):
    from icebug_spark.operators.community3 import cut_clustering

    e = _sym(spark, [(i, i + 1) for i in range(30)])
    with pytest.raises(ValueError, match="size-guarded"):
        cut_clustering(e, alpha=0.5, max_nodes=10)


def test_parallel_agglomerative_two_triangles(spark):
    from icebug_spark.operators.community3 import parallel_agglomerative

    e = _sym(spark, TRI, TRI_W)
    part = {r["id"]: r["subset"] for r in parallel_agglomerative(e).collect()}
    assert len(part) == 6
    assert part[0] == part[1] == part[2]
    assert part[3] == part[4] == part[5]
    assert part[0] != part[3]


def test_lp_degree_ordered_two_triangles(spark):
    from icebug_spark.operators.community3 import lp_degree_ordered

    e = _sym(spark, TRI, TRI_W)
    part = {r["id"]: r["subset"] for r in lp_degree_ordered(e).collect()}
    assert len(part) == 6
    assert part[0] == part[1] == part[2]
    assert part[3] == part[4] == part[5]


def test_overlapping_nmi_identical_is_zero(spark):
    from icebug_spark.operators.community3 import overlapping_nmi_distance

    x = spark.createDataFrame(
        [(0, 10), (1, 10), (2, 20), (3, 20)], "id BIGINT, subset BIGINT"
    )
    d = overlapping_nmi_distance(x, x, n=4).collect()[0][0]
    assert d == pytest.approx(0.0, abs=1e-9)


def test_overlapping_nmi_vs_singletons(spark):
    from icebug_spark.operators.community3 import overlapping_nmi_distance

    x = spark.createDataFrame(
        [(0, 10), (1, 10), (2, 20), (3, 20)], "id BIGINT, subset BIGINT"
    )
    y = spark.createDataFrame(
        [(i, i) for i in range(4)], "id BIGINT, subset BIGINT"
    )
    d = overlapping_nmi_distance(x, y, n=4).collect()[0][0]
    assert 0.0 < d < 1.0
    # symmetric
    d2 = overlapping_nmi_distance(y, x, n=4).collect()[0][0]
    assert d == pytest.approx(d2, abs=1e-6)


def test_overlapping_nmi_true_overlap(spark):
    from icebug_spark.operators.community3 import overlapping_nmi_distance

    # node 2 in both clusters of X — a genuine cover
    x = spark.createDataFrame(
        [(0, 10), (1, 10), (2, 10), (2, 20), (3, 20), (4, 20)],
        "id BIGINT, subset BIGINT",
    )
    y = spark.createDataFrame(
        [(0, 1), (1, 1), (2, 1), (3, 2), (4, 2)], "id BIGINT, subset BIGINT"
    )
    d = overlapping_nmi_distance(x, y, n=5).collect()[0][0]
    assert 0.0 <= d < 0.5  # near-agreement


def test_sampled_rand_measures(spark):
    from icebug_spark.operators.community3 import (
        graph_structural_rand_sampled,
        node_structural_rand_sampled,
    )

    pa = spark.createDataFrame(
        [(i, i // 3) for i in range(6)], "id BIGINT, subset BIGINT"
    )
    d_same = node_structural_rand_sampled(pa, pa).collect()[0][0]
    assert d_same == pytest.approx(0.0)
    e = _sym(spark, TRI, TRI_W)
    d_g = graph_structural_rand_sampled(e, pa, pa).collect()[0][0]
    assert d_g == pytest.approx(0.0)
    pb = spark.createDataFrame(
        [(i, i) for i in range(6)], "id BIGINT, subset BIGINT"
    )
    assert node_structural_rand_sampled(pa, pb).collect()[0][0] > 0.0


def test_dynamic_nmi_common_nodes_only(spark):
    from icebug_spark.operators.community3 import dynamic_nmi

    pa = spark.createDataFrame(
        [(0, 1), (1, 1), (2, 2), (3, 2)], "id BIGINT, subset BIGINT"
    )
    # pb adds node 9 (ignored) and matches pa exactly on common nodes
    pb = spark.createDataFrame(
        [(0, 5), (1, 5), (2, 7), (3, 7), (9, 8)], "id BIGINT, subset BIGINT"
    )
    d = dynamic_nmi(pa, pb).collect()[0][0]
    assert d == pytest.approx(0.0, abs=1e-9)


def test_cut_clustering_guard_fires_before_collect(spark):
    # the size guard must run as a distributed count BEFORE the edge list
    # is collected: poison the weight column with an erroring UDF — the
    # guard's count only touches src/dst (weight is pruned), so an
    # implementation that collects first surfaces the UDF error instead
    # of the documented ValueError.
    from pyspark.sql.functions import udf
    from pyspark.sql.types import DoubleType
    from icebug_spark.operators.community3 import cut_clustering

    def boom(_x):
        raise RuntimeError("edge list materialized before the size guard")

    ed = spark.range(400).select(
        F.col("id").alias("src"), ((F.col("id") + 1) % 400).alias("dst")
    )
    e = ed.union(ed.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    e = e.withColumn("weight", udf(boom, DoubleType())(F.col("src")))
    with pytest.raises(ValueError, match="size-guarded"):
        cut_clustering(e, alpha=0.5, max_nodes=300)
