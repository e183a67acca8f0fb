"""Size-adaptive vertex-mirror + reliable-checkpoint plumbing
(`plans/iterate.py`): the non-broadcast (shuffle-hash) path and the
reliable `checkpoint()` path must produce identical results to the
defaults — they are plan-shape choices, not semantics."""

import tempfile

import pytest
from pyspark.sql import functions as F

# path: 0-1-2-3, plus isolated pair 4-5 (both directions)
EDGES = [(0, 1), (1, 0), (1, 2), (2, 1), (2, 3), (3, 2), (4, 5), (5, 4)]


@pytest.fixture()
def eu(spark):
    return spark.createDataFrame(EDGES, ["src", "dst"])


def _bfs_dists(eu, source=0):
    from icebug_spark.operators.traversal import bfs_distances

    return {r["id"]: r["dist"] for r in bfs_distances(eu, source).collect()}


def _cc(eu):
    from icebug_spark.operators.components import connected_components

    return {r["id"]: r["component"] for r in connected_components(eu).collect()}


EXPECT_BFS = {0: 0, 1: 1, 2: 2, 3: 3}
EXPECT_CC = {0: 0, 1: 0, 2: 0, 3: 0, 4: 4, 5: 4}


def test_mirror_broadcast_path(eu, spark):
    assert _bfs_dists(eu) == EXPECT_BFS
    assert _cc(eu) == EXPECT_CC


def test_mirror_shuffle_hash_path(eu, spark):
    """Force the past-the-cap branch: every mirror() call degrades to a
    shuffle-hash join; results must be unchanged."""
    spark.conf.set("spark.icebug.vertexBroadcastRows", "0")
    try:
        assert _bfs_dists(eu) == EXPECT_BFS
        assert _cc(eu) == EXPECT_CC
        from icebug_spark.operators.centrality import pagerank
        from icebug_spark.operators.traversal import sssp_weighted

        pr = {r["id"]: r["pagerank"] for r in pagerank(eu, max_iter=5).collect()}
        assert abs(sum(pr.values()) - 1.0) < 1e-6
        ew = eu.withColumn("weight", F.lit(1.0))
        d = {r["id"]: r["dist"] for r in sssp_weighted(ew, 0).collect()}
        assert d == {0: 0.0, 1: 1.0, 2: 2.0, 3: 3.0}
    finally:
        spark.conf.unset("spark.icebug.vertexBroadcastRows")


def test_mirror_plan_shapes(eu, spark):
    """The hint actually lands in the physical plan: broadcast under the
    cap, shuffled hash join over it (never a sort-merge of the edge
    side)."""
    from icebug_spark.plans.iterate import mirror

    state = spark.createDataFrame([(0, 0)], ["id", "dist"]).localCheckpoint()
    below = eu.join(mirror(state, 1), eu.src == state.id)
    assert "BroadcastHashJoin" in below._jdf.queryExecution().executedPlan().toString()
    spark.conf.set("spark.icebug.vertexBroadcastRows", "0")
    try:
        above = eu.join(mirror(state, 1), eu.src == state.id)
        plan = above._jdf.queryExecution().executedPlan().toString()
        assert "ShuffledHashJoin" in plan
        assert "SortMergeJoin" not in plan
    finally:
        spark.conf.unset("spark.icebug.vertexBroadcastRows")


def test_reliable_checkpoint(eu, spark):
    """`spark.icebug.reliableCheckpoint=true` routes lineage truncation
    through `DataFrame.checkpoint` into the configured checkpoint dir —
    the cluster fault-tolerance mode (SURVEY §7)."""
    with tempfile.TemporaryDirectory() as d:
        spark.sparkContext.setCheckpointDir(d)
        spark.conf.set("spark.icebug.reliableCheckpoint", "true")
        try:
            assert _cc(eu) == EXPECT_CC
            assert _bfs_dists(eu) == EXPECT_BFS
        finally:
            spark.conf.unset("spark.icebug.reliableCheckpoint")
