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
from icebug_spark.queries.ioq import IO
from icebug_spark.queries.llmq import LLM
from icebug_spark.queries.pointq import POINT
from icebug_spark.queries.qualityq import QUALITY
from icebug_spark.queries.relational import RELATIONAL
from icebug_spark.queries.round9q import ROUND9
from icebug_spark.queries.round10q import ROUND10
from icebug_spark.queries.scdq import SCD
from icebug_spark.queries.sparsifyq import SPARSIFY2
from icebug_spark.queries.structuralq import STRUCTURAL

# Ordering is deliberate: a prefix-taking correctness gate naturally
# rotates (proven in r06/r07: the gate took exactly the then-leading
# prefix). Round-11 policy (the round-10 verdict's ordering contract for
# optimization rounds): TOUCHED-THIS-ROUND FIRST — the prefix is the ~50
# queries whose operators were rewritten in optimization rounds 10/11
# (PageRank single-reference loop, narrowed multi-source-BFS carrier,
# fused PLM modularity evaluation, KADABRA observed stopping rule,
# n-gram/MinHash/SimHash kernels, the round-control observe batch), so
# the driver's gate re-verifies every optimization at HEAD — then the
# stalest-checked remainder. The full registry is still swept locally
# every round (tools/check_oracle.py → CORRECTNESS_LOCAL.json).
_MERGED = {**DYN, **IO, **COVER, **CENTRAL, **LLM, **EDGESCORE, **SCD, **ALGEBRAIC, **QUALITY, **DISTANCE2, **POINT, **SPARSIFY2, **STRUCTURAL, **RELATIONAL, **GRAPH, **COMMUNITY, **COMMUNITY3, **ROUND9, **ROUND10}

_TOUCHED_R10_R11 = [
    # hot paths rewritten in round 10 that sat past round 10's gate prefix
    "q29_pagerank", "q30_bfs_from_0",
    "q28_connected_components", "llm_minhash_lsh_dups",
    "llm_ngram_jaccard_pairs", "llm_simhash",
    "q31_kcore_k5", "q38_scc",
    "q39_msf_summary", "q40_luby_mis_size",
    "q41_matching_summary", "q85_group_centrality",
    "q97_kadabra_betweenness", "q114_commute_time_lamg",
    "q139_kpath_certificate", "q148_spectral_coloring",
    # round-11 rewrites: PLM fused modularity eval, narrowed BFS carrier
    # (every multi_source_bfs/_distance_table consumer), KADABRA observe
    "q37_louvain_quality", "q129_leiden_quality",
    "q36_plp_community_sizes", "q154_top_closeness",
    "q161_nf_heuristic", "q156_approx_closeness",
    "q155_group_closeness_swaps", "q84_top_harmonic",
    "q45_eccentricity_sample", "q46_closeness_sample",
    "q47_diameter_double_sweep", "q80_spsp_grid",
    "q81_landmark_labels", "q86_st_bfs_distance",
    "q87_multi_target_bfs", "q88_bidir_dijkstra",
    "q89_astar", "q91_reverse_bfs",
    "q92_gce_expansion", "q119_harmonic_sampled",
    "q123_neighborhood_function", "q112_approx_group_betweenness",
    "q158_dyn_approx_betweenness", "q82_anf_curve",
    "q83_hop_plot", "q50_effective_diameter",
    # round-10 rewrites already driver-gated at r10 HEAD (re-verify on
    # top of the round-11 kernel changes they sit next to)
    "q79_seir_census", "q153_jaccard_measure",
    "llm_bpe_merges", "llm_kmeans_assign",
    "llm_kcenter_select", "llm_semdedup_pairs",
    "q164_spectral_partition", "q150_laplacian_eigs",
]

_STALEST_DRIVER_CHECKED = [
    # the stalest remainder (never re-gated since r06), after the touched
    # prefix above
    "llm_substring_dedup", "llm_substring_removal",
    "llm_stratified_sample", "llm_curriculum_stages",
    "llm_bpe_token_counts",
    "llm_lm_perplexity", "llm_chunk_overlap",
    "llm_dsir_weights",
    "llm_mixture_weights", "llm_mixture_sample",
    "llm_pack_sequences", "llm_boilerplate_removal",
    "llm_train_test_split", "llm_corpus_assembly",
    "q152_nkbg_roundtrip", "llm_ngram_jaccard_uncapped",
    "q151_measure_correlations",
    "q157_approx_spanning_edge",
    "q159_link_thresholder", "q160_edge_score_as_weight",
    "q162_binary_partition_roundtrip",
    "q163_dynamic_hyperbolic_dyncc",
    "q165_sparsify_to_size", "q68_edge_switch_degrees",
    "q69_max_flow_hubs", "q70_maximal_cliques",
    "q71_hub_dominance", "q72_intrapartition_density",
    "q73_interpartition_cond", "q74_stable_nodes",
    "q75_local_partition_coverage", "q76_permanence",
    "q77_fragmentation", "q78_cover_f1",
    "q90_floyd_warshall",
    "q93_tce_lte_expansion", "q94_local_t_two_phase",
    "q95_clique_detect", "q96_scd_ground_truth",
    "q106_local_similarity", "q107_local_filter",
    "q108_local_similarity_sparsifier", "q109_random_node_edge",
]

_PREFIX = _TOUCHED_R10_R11 + _STALEST_DRIVER_CHECKED
_missing = [k for k in _PREFIX if k not in _MERGED]
assert not _missing, (
    f"priority-prefix keys missing from the registry (renamed?): {_missing}"
)
assert len(set(_PREFIX)) == len(_PREFIX), "duplicate prefix entry"
ALL = {k: _MERGED[k] for k in _PREFIX}
ALL.update(_MERGED)


def queries():
    return {name: fn for name, (fn, _sql) in ALL.items()}


def oracle_sql():
    return {name: sql for name, (_fn, sql) in ALL.items() if sql is not None}
