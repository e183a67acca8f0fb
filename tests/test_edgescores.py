"""Edge-score / sparsification / link-pred-2 tests on hand-computed graphs."""

import math

import pytest
from pyspark.sql import functions as F


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(u, v) for u, v in pairs], "src BIGINT, dst BIGINT"
    )


def _adj(spark, pairs):
    """Symmetrized (node, nbr) adjacency from undirected pair list."""
    rows = [(u, v) for u, v in pairs] + [(v, u) for u, v in pairs]
    return spark.createDataFrame(rows, "node BIGINT, nbr BIGINT")


# K4 minus edge (2,3): edges 0-1,0-2,0-3,1-2,1-3 — a diamond.
DIAMOND = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3)]


def test_edge_triangle_count_diamond(spark):
    from icebug_spark.operators.edgescores import edge_triangle_count

    out = {(r["u"], r["v"]): r["n_tri"] for r in edge_triangle_count(_edges(spark, DIAMOND)).collect()}
    # triangles: (0,1,2) and (0,1,3); edge (0,1) in both
    assert out == {(0, 1): 2, (0, 2): 1, (0, 3): 1, (1, 2): 1, (1, 3): 1}


def test_edge_quadrangle_count_c4(spark):
    from icebug_spark.operators.edgescores import edge_quadrangle_count

    c4 = [(0, 1), (1, 2), (2, 3), (3, 0)]
    out = {(r["u"], r["v"]): r["n_quad"] for r in edge_quadrangle_count(_edges(spark, c4)).collect()}
    assert out == {(0, 1): 1, (1, 2): 1, (2, 3): 1, (0, 3): 1}


def test_scan_similarity_diamond(spark):
    from icebug_spark.operators.edgescores import scan_similarity

    out = {(r["u"], r["v"]): r["scan_sim"] for r in scan_similarity(_edges(spark, DIAMOND)).collect()}
    # edge (0,1): tri=2, du=dv=3 -> 3/4
    assert out[(0, 1)] == pytest.approx(0.75, abs=1e-6)
    # edge (0,2): tri=1, du=3 dv=2 -> 2/sqrt(12)
    assert out[(0, 2)] == pytest.approx(2 / math.sqrt(12), abs=1e-6)


def test_chance_corrected_triangle(spark):
    from icebug_spark.operators.edgescores import chance_corrected_triangle

    # path a-b, pendant edges score 1
    out = {(r["u"], r["v"]): r["cct_score"] for r in chance_corrected_triangle(_edges(spark, [(0, 1), (1, 2)])).collect()}
    assert out == {(0, 1): 1.0, (1, 2): 1.0}
    # diamond edge (0,1): tri=2, n=4 -> 2*2/(2*2)=1
    out2 = {(r["u"], r["v"]): r["cct_score"] for r in chance_corrected_triangle(_edges(spark, DIAMOND)).collect()}
    assert out2[(0, 1)] == pytest.approx(1.0, abs=1e-6)


def test_local_degree_score_star_plus_path(spark):
    from icebug_spark.operators.edgescores import local_degree_score

    # star 0-{1,2,3}: deg(0)=3, leaves deg 1 -> leaf side e=1.0 for all
    out = {(r["u"], r["v"]): r["ld_score"] for r in local_degree_score(_edges(spark, [(0, 1), (0, 2), (0, 3)])).collect()}
    assert out == {(0, 1): 1.0, (0, 2): 1.0, (0, 3): 1.0}


def test_multiscale_score_uniform_triangle(spark):
    from icebug_spark.operators.edgescores import multiscale_score

    tri = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0), (0, 2, 1.0)], "src BIGINT, dst BIGINT, weight DOUBLE"
    )
    out = {(r["u"], r["v"]): r["ms_score"] for r in multiscale_score(tri).collect()}
    # every endpoint: k=2, p=1/2 -> 1-(1/2)^1 = 0.5
    assert all(v == pytest.approx(0.5, abs=1e-6) for v in out.values())


def test_normalize_and_blend(spark):
    from icebug_spark.operators.edgescores import blend_scores, normalize_score

    s = spark.createDataFrame(
        [(0, 1, 2.0), (1, 2, 4.0), (2, 3, 6.0)], "u BIGINT, v BIGINT, score DOUBLE"
    )
    out = {(r["u"], r["v"]): r["norm_score"] for r in normalize_score(s, "score").collect()}
    assert out == {(0, 1): 0.0, (1, 2): 0.5, (2, 3): 1.0}
    inv = {(r["u"], r["v"]): r["norm_score"] for r in normalize_score(s, "score", invert=True).collect()}
    assert inv == {(0, 1): 1.0, (1, 2): 0.5, (2, 3): 0.0}
    b = blend_scores(
        normalize_score(s, "score"), normalize_score(s, "score", invert=True), 0.5, "norm_score", "norm_score"
    )
    assert all(r["blend_score"] == pytest.approx(0.5) for r in b.collect())


def test_linearize_score(spark):
    from icebug_spark.operators.edgescores import linearize_score

    s = spark.createDataFrame(
        [(0, 1, 10.0), (1, 2, 5.0), (2, 3, 7.0)], "u BIGINT, v BIGINT, score DOUBLE"
    )
    out = {(r["u"], r["v"]): r["lin_score"] for r in linearize_score(s, "score").collect()}
    assert out == {(1, 2): 0.0, (2, 3): 0.5, (0, 1): 1.0}


def test_random_edge_score_deterministic(spark):
    from icebug_spark.operators.edgescores import random_edge_score

    e = _edges(spark, DIAMOND)
    a = {(r["u"], r["v"]): r["rand_score"] for r in random_edge_score(e, seed=7).collect()}
    b = {(r["u"], r["v"]): r["rand_score"] for r in random_edge_score(e, seed=7).collect()}
    assert a == b and all(0.0 <= s < 1.0 for s in a.values())


def test_prefix_jaccard_full_prefix_equals_jaccard_of_neighborhoods(spark):
    from icebug_spark.operators.edgescores import prefix_jaccard_score

    s = spark.createDataFrame(
        [(u, v, 1.0) for u, v in DIAMOND], "u BIGINT, v BIGINT, score DOUBLE"
    )
    out = {(r["u"], r["v"]): r["pj_score"] for r in prefix_jaccard_score(s, "score", k=10).collect()}
    # Endpoint-excluded prefixes (reference semantics): edge (0,1):
    # N(0)\{1}={2,3}, N(1)\{0}={2,3} -> 1.0; edge (0,2): N(0)\{2}={1,3},
    # N(2)\{0}={1,3} -> 1.0 (DIAMOND is 0-1,0-2,0-3,1-2,1-3,2-3 minus one).
    assert out[(0, 1)] == pytest.approx(1.0, abs=1e-6)


def test_simmelian_overlap(spark):
    from icebug_spark.operators.edgescores import simmelian_overlap_score

    out = {(r["u"], r["v"]): r["overlap"] for r in simmelian_overlap_score(_edges(spark, DIAMOND), max_rank=10).collect()}
    # edge (0,1): top neighbors of 0 = {1,2,3}, of 1 = {0,2,3} -> overlap {2,3} = 2
    assert out[(0, 1)] == 2


def test_global_threshold_and_sparsify(spark):
    from icebug_spark.operators.edgescores import (
        global_threshold_filter,
        local_degree_score,
        sparsify_local_degree,
    )

    e = _edges(spark, DIAMOND)
    s = local_degree_score(e)
    kept = global_threshold_filter(s, "ld_score", 1.0).count()
    assert 0 < kept <= 5
    sp = sparsify_local_degree(e, 1.0)
    assert sp.count() == 5


def test_forest_fire_score_runs(spark):
    from icebug_spark.operators.edgescores import forest_fire_score

    out = forest_fire_score(_edges(spark, DIAMOND), rounds=3, seed=1).collect()
    assert len(out) == 5 and all(0.0 <= r["ff_score"] <= 1.0 for r in out)


# ---- linkpred2 ----


def test_resource_allocation_and_friends(spark):
    from icebug_spark.operators.linkpred2 import neighbors_measure, resource_allocation

    adj = _adj(spark, DIAMOND)
    ra = {(r["u"], r["v"]): r["resource_alloc"] for r in resource_allocation(adj).collect()}
    # pair (2,3): CN {0,1}, deg0=3 deg1=3 -> 1/3+1/3
    assert ra[(2, 3)] == pytest.approx(2 / 3, abs=1e-6)
    fm = {(r["u"], r["v"]): r["neighbors_measure"] for r in neighbors_measure(adj).collect()}
    # pair (2,3): x∈{0,1}, y∈{0,1}: (0,0),(1,1) common + (0,1),(1,0) edges = 4
    assert fm[(2, 3)] == 4


def test_total_neighbors_and_nd_index(spark):
    from icebug_spark.operators.linkpred2 import neighborhood_distance, total_neighbors

    adj = _adj(spark, DIAMOND)
    tn = {(r["u"], r["v"]): r["total_neighbors"] for r in total_neighbors(adj).collect()}
    assert tn[(2, 3)] == 2  # N(2)={0,1}, N(3)={0,1}
    nd = {(r["u"], r["v"]): r["nd_index"] for r in neighborhood_distance(adj).collect()}
    assert nd[(2, 3)] == pytest.approx(1.0, abs=1e-6)  # 2/sqrt(2*2)


def test_adjusted_rand_index_bounds(spark):
    from icebug_spark.operators.linkpred2 import adjusted_rand_index

    adj = _adj(spark, DIAMOND)
    out = {(r["u"], r["v"]): r["ari_index"] for r in adjusted_rand_index(adj).collect()}
    # pair (2,3): a=2,b=0,c=0,d=2 -> 2*(4-0)/(0+0+8+0+0+0+0)=1.0
    assert out[(2, 3)] == pytest.approx(1.0, abs=1e-6)


def test_same_community_and_degrees(spark):
    from icebug_spark.operators.linkpred2 import endpoint_degrees, same_community

    adj = _adj(spark, DIAMOND)
    pairs = spark.createDataFrame([(0, 1), (2, 3)], "u BIGINT, v BIGINT")
    part = spark.createDataFrame([(0, 0), (1, 0), (2, 1), (3, 2)], "id BIGINT, subset BIGINT")
    sc = {(r["u"], r["v"]): r["same_community"] for r in same_community(pairs, part).collect()}
    assert sc == {(0, 1): 1, (2, 3): 0}
    ed = {(r["u"], r["v"]): (r["u_degree"], r["v_degree"]) for r in endpoint_degrees(adj, pairs).collect()}
    assert ed[(0, 1)] == (3, 3) and ed[(2, 3)] == (2, 2)


def test_katz_index_path(spark):
    from icebug_spark.operators.linkpred2 import katz_index_from

    adj = _adj(spark, [(0, 1), (1, 2)])
    out = {(r["u"], r["v"]): r["katz_score"] for r in katz_index_from(adj, [0], max_path_length=3, beta=0.1).collect()}
    # walks 0->1: len1 (1), len3: 0-1-0-1, 0-1-2-1 (2) => 0.1 + 2*0.001 = 0.102
    assert out[(0, 1)] == pytest.approx(0.102, abs=1e-9)
    # walks 0->2: len2 (1) => 0.01
    assert out[(0, 2)] == pytest.approx(0.01, abs=1e-9)


def test_missing_links_diamond(spark):
    from icebug_spark.operators.linkpred2 import missing_links

    adj = _adj(spark, DIAMOND)
    out = {(r["u"], r["v"]) for r in missing_links(adj).collect()}
    assert out == {(2, 3)}


def test_random_link_split_partitions_edges(spark):
    from icebug_spark.operators.linkpred2 import random_link_split

    e = _edges(spark, DIAMOND)
    train, test = random_link_split(e, 0.4, seed=3)
    nt, ns = train.count(), test.count()
    assert nt + ns == 5 and train.join(test, ["u", "v"], "leftsemi").count() == 0


def test_roc_auc_perfect_ranking(spark):
    from icebug_spark.operators.linkpred2 import auc, precision_recall_points

    preds = spark.createDataFrame(
        [(0, 1, 0.9), (0, 2, 0.8), (0, 3, 0.2), (0, 4, 0.1)],
        "u BIGINT, v BIGINT, score DOUBLE",
    )
    truth = spark.createDataFrame([(0, 1), (0, 2)], "u BIGINT, v BIGINT")
    assert auc(preds, truth, "score") == pytest.approx(1.0, abs=1e-6)
    pr = {r["recall"]: r["precision"] for r in precision_recall_points(preds, truth, "score").collect()}
    assert pr[1.0] == pytest.approx(1.0, abs=1e-6) or pr[1.0] == pytest.approx(0.5, abs=1e-6)
