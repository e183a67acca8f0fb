"""Bucketed edge tables must elide the edge-side Exchange in the
iterative-join shape (state ⋈ edges on the bucket key)."""

import pytest
from pyspark.sql import functions as F

from icebug_spark.plans.bucketing import (
    count_exchanges,
    is_bucketed_scan,
    physical_plan,
    read_bucketed_edges,
    write_bucketed_edges,
)


@pytest.fixture()
def edges(spark):
    return spark.range(2000).select(
        (F.col("id") % 500).alias("src"),
        ((F.col("id") * 7 + 3) % 500).alias("dst"),
    )


def _state_join(spark, e):
    """The per-round loop join: node-keyed state vs edges on src, with
    broadcast disabled so the shuffle strategy is visible."""
    state = spark.range(500).select(F.col("id"), F.lit(0).alias("dist"))
    return state.hint("shuffle_hash").join(e, state.id == e.src)


def test_bucketed_join_elides_edge_exchange(spark, edges):
    # warehouse.dir is static — the managed table lands in the default
    # warehouse and is dropped (with its files) in the finally block
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        write_bucketed_edges(edges, "bkt_edges", buckets=8, key="src")
        bucketed = read_bucketed_edges(spark, "bkt_edges")
        assert sorted(r[0] for r in bucketed.groupBy().count().collect()) == [2000]

        plain_join = _state_join(spark, edges)
        bucketed_join = _state_join(spark, bucketed)
        assert is_bucketed_scan(bucketed_join), physical_plan(bucketed_join)
        # the edge-side Exchange disappears; the state side still shuffles
        assert count_exchanges(bucketed_join) == count_exchanges(plain_join) - 1, (
            physical_plan(bucketed_join)
        )
        # same rows either way
        assert bucketed_join.count() == plain_join.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS bkt_edges")


def test_bfs_loop_elides_edge_exchange_per_round(spark, edges):
    """The past-the-cap claim, proven inside the REAL algorithm loop:
    with the vertex-broadcast cap at 0 (pure shuffle-hash mode), every
    per-round plan of bfs_distances over a src-bucketed edge table must
    scan the buckets in place and plan exactly one Exchange fewer than
    the same round over the identical unbucketed table — and produce the
    same distances."""
    from icebug_spark.operators.traversal import bfs_distances
    from icebug_spark.plans import iterate
    from icebug_spark.plans.bucketing import count_exchange_lines

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.icebug.vertexBroadcastRows", "0")
    try:
        # same rows twice: once plain, once bucketed, both parquet tables
        spark.sql("DROP TABLE IF EXISTS plain_edges_bfs")
        edges.write.mode("overwrite").saveAsTable("plain_edges_bfs")
        write_bucketed_edges(edges, "bkt_edges_bfs", buckets=8, key="src")

        iterate.PLAN_CAPTURE = []
        plain = bfs_distances(spark.table("plain_edges_bfs"), 0, max_hops=6)
        plain_rows = sorted((r["id"], r["dist"]) for r in plain.collect())
        plans_plain = iterate.PLAN_CAPTURE

        iterate.PLAN_CAPTURE = []
        bkt = bfs_distances(read_bucketed_edges(spark, "bkt_edges_bfs"), 0, max_hops=6)
        bkt_rows = sorted((r["id"], r["dist"]) for r in bkt.collect())
        plans_bkt = iterate.PLAN_CAPTURE

        assert bkt_rows == plain_rows and len(plain_rows) > 0
        assert len(plans_bkt) == len(plans_plain)
        # the first capture is the sources-only init state (no join);
        # every later one is a full round plan containing the edge join
        round_pairs = [
            (p, b)
            for p, b in zip(plans_plain, plans_bkt)
            if "Join" in p or "Join" in b
        ]
        assert len(round_pairs) >= 3  # non-vacuous: several real rounds
        for p, b in round_pairs:
            assert "Bucketed: true" in b, b
            assert count_exchange_lines(b) == count_exchange_lines(p) - 1, (
                f"plain:\n{p}\nbucketed:\n{b}"
            )
    finally:
        iterate.PLAN_CAPTURE = None
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.icebug.vertexBroadcastRows")
        spark.sql("DROP TABLE IF EXISTS plain_edges_bfs")
        spark.sql("DROP TABLE IF EXISTS bkt_edges_bfs")
