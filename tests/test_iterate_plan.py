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


class _NoInternalCreate:
    """JVM-session proxy whose internalCreateDataFrame always raises —
    forces pin() onto its public createDataFrame(JavaRDD) fallback."""

    def __init__(self, real):
        object.__setattr__(self, "_real", real)

    def internalCreateDataFrame(self, *a, **k):
        raise RuntimeError("forced: simulate a Spark version without the private API")

    def __getattr__(self, name):
        return getattr(object.__getattribute__(self, "_real"), name)


def test_pin_public_api_fallback(eu, spark):
    """The docstring admits the primary path leans on a private[sql]
    Spark API (`internalCreateDataFrame`); this exercises the public
    createDataFrame(JavaRDD) fallback explicitly — a Spark upgrade that
    breaks the primary path must silently land here and stay CORRECT:
    values round-trip, stats reset to leaf defaults, and a pin-per-round
    solver loop (the CG shape that OOM'd in round 4) still converges."""
    from icebug_spark.plans.iterate import pin

    real = spark._jsparkSession
    spark._jsparkSession = _NoInternalCreate(real)
    try:
        df = eu.join(
            eu.withColumnRenamed("dst", "mid").withColumnRenamed("src", "dst"),
            "dst",
        ).select("src", "mid")
        pinned = pin(df)
        assert sorted(map(tuple, pinned.collect())) == sorted(
            map(tuple, df.collect())
        )
        assert pinned.schema == df.schema
        # stats reset: repeated pin-join-pin rounds keep sizeInBytes at the
        # leaf default instead of compounding the join product
        x = pin(eu)
        for _ in range(4):
            x = pin(x.join(x.withColumnRenamed("dst", "d2"), "src").select("src", "dst"))
        stats = int(
            str(x._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        )
        default = int(spark.conf.get("spark.sql.defaultSizeInBytes", str(2**63 - 1)))
        assert stats <= default
        # a real solver loop through the fallback: CG on a tiny Laplacian.
        # Path 0-1-2-3: R_eff(0,3)=3, vol=2*(#edges)=8 → commute time 24.
        from icebug_spark.operators.numerics import commute_time_distances

        out = commute_time_distances(
            eu.withColumn("weight", F.lit(1.0)), [(0, 3)]
        )
        d = out.collect()[0]
        assert abs(d["commute_time"] - 24.0) < 1e-3
    finally:
        spark._jsparkSession = real


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
