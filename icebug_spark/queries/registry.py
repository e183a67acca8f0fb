"""Assembled query registry: name → (spark_fn, oracle_sql | None)."""

from __future__ import annotations

from icebug_spark.queries.algebraicq import ALGEBRAIC
from icebug_spark.queries.centralq import CENTRAL
from icebug_spark.queries.communityq import COMMUNITY
from icebug_spark.queries.communityq3 import COMMUNITY3
from icebug_spark.queries.coverq import COVER
from icebug_spark.queries.distanceq import DISTANCE2
from icebug_spark.queries.dynq import DYN
from icebug_spark.queries.edgescoreq import EDGESCORE
from icebug_spark.queries.graphq import GRAPH
from icebug_spark.queries.llmq import LLM
from icebug_spark.queries.pointq import POINT
from icebug_spark.queries.qualityq import QUALITY
from icebug_spark.queries.relational import RELATIONAL
from icebug_spark.queries.scdq import SCD
from icebug_spark.queries.sparsifyq import SPARSIFY2
from icebug_spark.queries.structuralq import STRUCTURAL

# Ordering is deliberate: a prefix-taking correctness gate naturally
# rotates. The r05 gate verified the then-leading COVER+CENTRAL+LLM
# block; the 54 keys that have NEVER had a driver-side CORRECTNESS row
# across r01-r05 (union of CORRECTNESS_r0*.json) now lead, highest-value
# first (q114 LAMG, q110 PLL, the SCD block). The full registry is still
# swept locally every round (tools/check_oracle.py →
# CORRECTNESS_LOCAL.json).
_MERGED = {**DYN, **COVER, **CENTRAL, **LLM, **EDGESCORE, **SCD, **ALGEBRAIC, **QUALITY, **DISTANCE2, **POINT, **SPARSIFY2, **STRUCTURAL, **RELATIONAL, **GRAPH, **COMMUNITY, **COMMUNITY3}

_NEVER_DRIVER_CHECKED_PRE_R06 = [
    "q114_commute_time_lamg", "q110_pll_exact_distances",
    "llm_contamination", "llm_repetition_filter",
    "q92_gce_expansion", "q93_tce_lte_expansion", "q94_local_t_two_phase",
    "q95_clique_detect", "q96_scd_ground_truth",
    "q113_maxent_layout",
    "q52_scan_similarity", "q53_local_degree_score",
    "q54_resource_allocation", "q55_total_nd_neighbors",
    "q56_neighbors_measure", "q57_adjusted_rand_index",
    "q58_chance_corrected_tri", "q59_multiscale_score",
    "q60_katz_index", "q61_missing_links",
    "q62_pagerank_nibble", "q63_node2vec_walks",
    "q64_clustering_coefficients", "q65_algebraic_triangles",
    "q66_reachable_nodes", "q67_four_cliques",
    "q68_edge_switch_degrees", "q69_max_flow_hubs",
    "q70_maximal_cliques",
    "q71_hub_dominance", "q72_intrapartition_density",
    "q73_interpartition_cond", "q74_stable_nodes",
    "q75_local_partition_coverage", "q76_permanence",
    "q77_fragmentation", "q78_cover_f1", "q79_seir_census",
    "q80_spsp_grid", "q81_landmark_labels", "q82_anf_curve",
    "q83_hop_plot", "q84_top_harmonic", "q85_group_centrality",
    "q86_st_bfs_distance", "q87_multi_target_bfs", "q88_bidir_dijkstra",
    "q89_astar", "q90_floyd_warshall", "q91_reverse_bfs",
    "q106_local_similarity", "q107_local_filter",
    "q108_local_similarity_sparsifier", "q109_random_node_edge",
]

ALL = {k: _MERGED[k] for k in _NEVER_DRIVER_CHECKED_PRE_R06 if k in _MERGED}
ALL.update(_MERGED)


def queries():
    return {name: fn for name, (fn, _sql) in ALL.items()}


def oracle_sql():
    return {name: sql for name, (_fn, sql) in ALL.items() if sql is not None}
