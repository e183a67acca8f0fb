"""Mocnik / PubWeb / ClusteredRandomGraph generators: brute-force exactness
of the grid-join candidate generation, plus model-property goldens."""

import math

import pytest
from pyspark.sql import functions as F

from icebug_spark.sources import generators3 as g3


def test_clustered_random_graph_properties(spark):
    g, part = g3.clustered_random_graph(spark, 300, 4, p_intra=0.2, p_inter=0.01, seed=11)
    clusters = {r["id"]: r["cluster"] for r in part.collect()}
    assert set(clusters.values()) <= set(range(4))
    assert len({v for v in clusters.values()}) == 4  # all clusters populated
    edges = [(r["src"], r["dst"]) for r in g.edges.collect()]
    intra = sum(1 for u, v in edges if clusters[u] == clusters[v])
    inter = len(edges) - intra
    # expected intra ≈ 0.2 · Σ C(size,2) ≈ 0.2 · 4 · C(75,2) ≈ 2220,
    # inter ≈ 0.01 · cross-pairs ≈ 337: intra must dominate heavily
    assert intra > 4 * inter
    # determinism
    g2, _ = g3.clustered_random_graph(spark, 300, 4, p_intra=0.2, p_inter=0.01, seed=11)
    assert sorted(edges) == sorted((r["src"], r["dst"]) for r in g2.edges.collect())


def test_mocnik_matches_bruteforce(spark):
    """The grid join + straggler broadcast must reproduce the exact model:
    directed edge u→v iff dist(u,v) <= k·dMin(u)."""
    n, dim, k = 200, 2, 2.0
    g = g3.mocnik_graph(spark, dim, n, k=k, weighted=True, seed=17)
    # rebuild positions exactly as the generator does (same hash exprs)
    pts = (
        spark.range(n)
        .select(
            "id",
            *[
                g3._u01(F.lit(17), F.col("id"), F.lit(d)).alias(f"x{d}")
                for d in range(dim)
            ],
        )
        .collect()
    )
    P = {r["id"]: (r["x0"], r["x1"]) for r in pts}
    ids = sorted(P)
    expected = set()
    for u in ids:
        dmin = min(
            math.dist(P[u], P[v]) for v in ids if v != u
        )
        for v in ids:
            if v != u and math.dist(P[u], P[v]) <= k * dmin:
                expected.add((u, v))
    got = {(r["src"], r["dst"]) for r in g.edges.collect()}
    assert got == expected
    # weights are real distances
    for r in g.edges.limit(20).collect():
        assert abs(r["weight"] - math.dist(P[r["src"]], P[r["dst"]])) < 1e-9


def test_mocnik_unweighted_schema_and_density(spark):
    g = g3.mocnik_graph(spark, 2, 150, k=1.5, weighted=False)
    assert g.edges.columns == ["src", "dst"]
    m = g.edges.count()
    # every node has >= 1 out-edge (its nearest neighbor qualifies at any k>=1)
    assert g.edges.select("src").distinct().count() == 150
    assert m >= 150


def _torus_d2(p, q):
    dx = abs(p[0] - q[0])
    dy = abs(p[1] - q[1])
    dx = min(dx, 1 - dx)
    dy = min(dy, 1 - dy)
    return dx * dx + dy * dy


def test_pubweb_matches_bruteforce(spark):
    """Mutual-kNN-within-radius semantics (self occupies rank 1, matching
    the reference's eligible-then-insert scan)."""
    n, rad, mx = 250, 0.125, 6
    g = g3.pubweb_graph(spark, n, num_dense_areas=4, neigh_rad=rad, max_neigh=mx, seed=23)
    # read back the generated positions by re-running the position pipeline
    # through the public API: collect from the graph's own candidate base —
    # simplest faithful source is recomputing via the same seeded exprs is
    # internal, so instead verify the mutual-kNN property directly from a
    # position sample reconstructed by brute force below.
    edges = {(r["src"], r["dst"]) for r in g.edges.collect()}
    # rebuild positions exactly (same seeded construction, same driver RNG)
    import random

    rng = random.Random(23)
    radii = []
    for _ in range(4):
        f = rng.random() * g3._MIN_MAX_DENSE_AREA_FACTOR + 1.0
        radii.append(g3._MAX_DENSE_AREA_RADIUS * f * f / g3._MIN_MAX_DENSE_AREA_FACTOR**2)
    norm = sum(r**1.5 for r in radii) or 1.0
    frac = 4 / (4 + 2.0)
    per_area = [round(n * frac * r**1.5 / norm) for r in radii]
    centers = [(rng.random(), rng.random()) for _ in range(4)]
    rows = (
        spark.range(n)
        .select(
            "id",
            g3._u01(F.lit(23), F.col("id"), F.lit(1)).alias("u1"),
            g3._u01(F.lit(23), F.col("id"), F.lit(2)).alias("u2"),
        )
        .collect()
    )
    P = {}
    bounds = []
    acc = 0
    for (cx, cy), r, m in zip(centers, radii, per_area):
        if acc + m > n:
            m = n - acc
        bounds.append((acc, acc + m, cx, cy, r))
        acc += m
        if acc >= n:
            break
    for row in rows:
        i, u1, u2 = row["id"], row["u1"], row["u2"]
        x, y = u1, u2
        for lo, hi, cx, cy, r in bounds:
            if lo <= i < hi:
                ang = 2 * math.pi * u1
                x = (cx + math.cos(ang) * u2 * r) % 1.0
                y = (cy + math.sin(ang) * u2 * r) % 1.0
        P[i] = (x, y)
    # brute-force mutual kNN
    keep = {}
    for u in P:
        cands = sorted(
            (( _torus_d2(P[u], P[v]), v) for v in P if _torus_d2(P[u], P[v]) <= rad * rad),
            key=lambda t: (t[0], t[1]),
        )[:mx]
        keep[u] = {v for _, v in cands if v != u}
    expected = {
        (min(u, v), max(u, v))
        for u in P
        for v in keep[u]
        if u in keep[v]
    }
    assert edges == expected
    # weights = BASE_WEIGHT / sq
    for r in g.edges.limit(10).collect():
        sq = _torus_d2(P[r["src"]], P[r["dst"]])
        assert abs(r["weight"] - g3._BASE_WEIGHT / sq) < 1e-6


def _edge_set(df, round_w=6):
    return {
        (r["src"], r["dst"], round(r["weight"], round_w))
        for r in df.select("src", "dst", "weight").collect()
    }


def test_dynamic_pubweb_emits_removals_and_replays(spark):
    """DynamicPubWebGenerator (DynamicPubWebGenerator.hpp:22): the event
    stream must carry REAL removals (node churn-out + structural edge
    drops), and replaying it through apply_events from empty must land
    exactly on the generator's own final graph — weights included."""
    from icebug_spark.streaming.dynamic import apply_events

    gen = g3.DynamicPubWebGenerator(
        spark, n=80, num_dense_areas=3, neigh_rad=0.25, max_neigh=6, seed=7
    )
    ev = gen.generate(3).localCheckpoint(eager=True)
    types = {r["type"] for r in ev.select("type").distinct().collect()}
    assert "EDGE_REMOVAL" in types and "NODE_REMOVAL" in types
    assert "EDGE_ADDITION" in types and "NODE_ADDITION" in types
    n_steps = ev.where(F.col("type") == "TIME_STEP").count()
    assert n_steps == 4  # initial-graph marker + 3 generated steps

    empty = spark.createDataFrame([], "src LONG, dst LONG, weight DOUBLE")
    replayed = apply_events(empty, ev)
    assert _edge_set(replayed) == _edge_set(gen.edges)
    # churned-out nodes really left the point set
    removed = {
        r["u"] for r in ev.where(F.col("type") == "NODE_REMOVAL").collect()
    }
    assert removed
    alive = {r["id"] for r in gen.points.select("id").collect()}
    assert removed.isdisjoint(alive)


def test_dynamic_pubweb_dyncc_consumer_tracks_static(spark):
    """End-to-end Dyn* consumer over the generated removal-bearing
    stream: replay per timestep, maintain DynCC incrementally across the
    batches, and per step compare against a static min-label recompute
    on that step's edge table — the reference's
    DynAlgorithm.updateBatch contract under real removals."""
    from icebug_spark.catalog import symmetrize
    from icebug_spark.operators.components import connected_components
    from icebug_spark.streaming.dynamic import replay_by_timestep
    from icebug_spark.streaming.dynamic2 import dyn_cc_update

    gen = g3.DynamicPubWebGenerator(
        spark, n=60, num_dense_areas=2, neigh_rad=0.3, max_neigh=5, seed=11,
        write_initial_graph_to_stream=False,
    )
    e0 = gen.edges.localCheckpoint(eager=True)
    ev = gen.generate(2).localCheckpoint(eager=True)
    states = replay_by_timestep(e0, ev)

    marks = [
        r["seq"]
        for r in ev.where(F.col("type") == "TIME_STEP").orderBy("seq").collect()
    ]
    bounds = [-1] + marks + [float("inf")]
    # connected_components consumes the SYMMETRIZED view (q28 convention)
    comp = connected_components(symmetrize(e0)).localCheckpoint(eager=True)
    for (lo, hi), edges_after in zip(zip(bounds[:-1], bounds[1:]), states):
        batch = ev.where(
            (F.col("seq") > lo) & (F.col("seq") < hi)
        ).select("type", "u", "v", "w")
        if batch.where(
            F.col("type").isin("EDGE_ADDITION", "EDGE_REMOVAL")
        ).limit(1).count() == 0:
            continue
        comp = dyn_cc_update(
            comp, edges_after.select("src", "dst"), batch
        ).localCheckpoint(eager=True)
        static = connected_components(symmetrize(edges_after))
        got = {(r["id"], r["component"]) for r in comp.collect()}
        want = {(r["id"], r["component"]) for r in static.collect()}
        assert got == want
