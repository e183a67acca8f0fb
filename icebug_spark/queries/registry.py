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
from icebug_spark.queries.scdq import SCD
from icebug_spark.queries.sparsifyq import SPARSIFY2
from icebug_spark.queries.structuralq import STRUCTURAL

# Ordering is deliberate: a prefix-taking correctness gate naturally
# rotates (proven in r06: the gate took exactly the then-leading
# never-checked prefix). The keys that have NEVER had a driver-side
# CORRECTNESS row across r01-r06 (union of CORRECTNESS_r0*.json) lead:
# the r06-new q134-q142 block, the r07-new I/O certificates q143-q146,
# and the sparsification block q106-q109. The full registry is still
# swept locally every round (tools/check_oracle.py →
# CORRECTNESS_LOCAL.json).
_MERGED = {**DYN, **IO, **COVER, **CENTRAL, **LLM, **EDGESCORE, **SCD, **ALGEBRAIC, **QUALITY, **DISTANCE2, **POINT, **SPARSIFY2, **STRUCTURAL, **RELATIONAL, **GRAPH, **COMMUNITY, **COMMUNITY3}

_NEVER_DRIVER_CHECKED = [
    "q134_dynkatz_events", "q135_dynsssp_mixed", "q136_dynapsp_insert",
    "q137_dyntopharmonic_insert", "q138_dynbsuitor_certificate",
    "q139_kpath_certificate", "q140_gedwalk_greedy",
    "q141_square_clustering", "q142_dynbetweenness_insert",
    "q143_graphml_roundtrip", "q144_gexf_dynamic_replay",
    "q145_mat_roundtrip", "q146_rb_roundtrip",
    "q147_gini_degrees", "q148_spectral_coloring",
    "q149_approx_clustering",
    "q106_local_similarity", "q107_local_filter",
    "q108_local_similarity_sparsifier", "q109_random_node_edge",
]

_missing = [k for k in _NEVER_DRIVER_CHECKED if k not in _MERGED]
assert not _missing, (
    f"priority-prefix keys missing from the registry (renamed?): {_missing}"
)
ALL = {k: _MERGED[k] for k in _NEVER_DRIVER_CHECKED}
ALL.update(_MERGED)


def queries():
    return {name: fn for name, (fn, _sql) in ALL.items()}


def oracle_sql():
    return {name: sql for name, (_fn, sql) in ALL.items() if sql is not None}
