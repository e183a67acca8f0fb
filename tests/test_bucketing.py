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
