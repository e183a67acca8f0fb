"""Named Dynamic* generators: per-timestep replay checks (the q132
pattern — replay the event stream batch-by-batch and compare structure
against an independent recompute)."""

import pytest
from pyspark.sql import functions as F

from icebug_spark.sources import dynamic_generators as dg
from icebug_spark.streaming.dynamic import replay_by_timestep


def _empty_edges(spark):
    return spark.createDataFrame([], "src LONG, dst LONG, weight DOUBLE")


def _canon(df):
    return sorted(
        (min(r["src"], r["dst"]), max(r["src"], r["dst"])) for r in df.collect()
    )


def test_dynamic_path_replay(spark):
    ev = dg.dynamic_path_events(spark, 4)
    # the stream ends with a TIME_STEP, so replay_by_timestep appends one
    # trailing empty batch — drop it
    states = replay_by_timestep(_empty_edges(spark), ev)[:4]
    for i, st in enumerate(states):
        assert _canon(st) == [(j, j + 1) for j in range(i + 1)]


def test_dynamic_dm_replay(spark):
    """Triangle seed; after each step the new node is connected to both
    endpoints of one PRE-EXISTING edge."""
    ev = dg.dynamic_dorogovtsev_mendes_events(spark, 5, seed=3)
    states = replay_by_timestep(_empty_edges(spark), ev)[:6]
    prev = None
    for i, st in enumerate(states):
        edges = _canon(st)
        n_nodes = 3 + i
        assert len(edges) == 3 + 2 * i
        if prev is not None:
            new_node = n_nodes - 1
            added = [e for e in edges if e not in prev]
            assert len(added) == 2
            assert all(new_node in e for e in added)
            # the two attachment points form a pre-existing edge
            s, t = sorted(x for e in added for x in e if x != new_node)
            assert (s, t) in prev
        prev = edges


def test_dynamic_ba_replay(spark):
    """k-path seed; each step adds exactly k distinct edges from the new
    node; replay degree sum = 2m."""
    k = 2
    ev = dg.dynamic_barabasi_albert_events(spark, 6, k=k, seed=5)
    states = replay_by_timestep(_empty_edges(spark), ev)[:7]
    assert _canon(states[0]) == [(0, 1)]  # the k-node path seed
    prev = _canon(states[0])
    for i, st in enumerate(states[1:], start=1):
        edges = _canon(st)
        new_node = k - 1 + i
        added = [e for e in edges if e not in prev]
        assert len(added) == k and all(new_node in e for e in added)
        assert len(set(added)) == k  # distinct targets
        prev = edges


def test_dynamic_forest_fire_replay(spark):
    ff = dg.DynamicForestFire(p=0.4, seed=11)
    ev = ff.generate(6, spark)
    states = replay_by_timestep(_empty_edges(spark), ev)[:6]
    # step 0: a single node, no edges
    assert _canon(states[0]) == []
    prev_nodes = 1
    prev = []
    for st in states[1:]:
        edges = _canon(st)
        new_node = prev_nodes
        added = [e for e in edges if e not in prev]
        # every new edge is incident to the new node; at least the
        # ambassador is always burned
        assert len(added) >= 1 and all(new_node in e for e in added)
        prev_nodes += 1
        prev = edges
    # directed variant also runs and emits backward burns without error
    ffd = dg.DynamicForestFire(p=0.3, directed=True, r=0.5, seed=7)
    evd = ffd.generate(4, spark)
    assert evd.where(F.col("type") == "TIME_STEP").count() == 4


def test_dynamic_hyperbolic_replay_matches_static_recompute(spark):
    """The q132 pattern end-to-end: replaying the diffed event stream
    reproduces EXACTLY the threshold graph recomputed from the moved
    point table at every timestep; movement must produce at least one
    EDGE_REMOVAL across the run (the reference's distinguishing event)."""
    gen = dg.DynamicHyperbolic(
        spark, n=60, avg_degree=4.0, move_each_step=0.6, move_distance=0.35, seed=13
    )
    initial = gen.initial_edges().select(
        "src", "dst", F.lit(1.0).alias("weight")
    )
    ev = gen.generate(3)
    assert ev.where(F.col("type") == "EDGE_REMOVAL").count() >= 1
    states = replay_by_timestep(initial, ev)
    # after all steps, the replayed edge set equals the recomputed
    # threshold edges of the final point table
    final_expected = sorted(
        (r["u"], r["v"]) for r in gen.edges.collect()
    )
    assert _canon(states[-1]) == final_expected
    assert ev.where(F.col("type") == "TIME_STEP").count() == 3
