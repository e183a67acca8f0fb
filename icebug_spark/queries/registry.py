"""Assembled query registry: name → (spark_fn, oracle_sql | None)."""

from __future__ import annotations

from icebug_spark.queries.algebraicq import ALGEBRAIC
from icebug_spark.queries.centralq import CENTRAL
from icebug_spark.queries.communityq import COMMUNITY
from icebug_spark.queries.communityq3 import COMMUNITY3
from icebug_spark.queries.distanceq import DISTANCE2
from icebug_spark.queries.edgescoreq import EDGESCORE
from icebug_spark.queries.graphq import GRAPH
from icebug_spark.queries.llmq import LLM
from icebug_spark.queries.pointq import POINT
from icebug_spark.queries.qualityq import QUALITY
from icebug_spark.queries.relational import RELATIONAL
from icebug_spark.queries.scdq import SCD
from icebug_spark.queries.sparsifyq import SPARSIFY2
from icebug_spark.queries.structuralq import STRUCTURAL

ALL = {**RELATIONAL, **GRAPH, **COMMUNITY, **COMMUNITY3, **STRUCTURAL, **CENTRAL, **LLM, **EDGESCORE, **SCD, **ALGEBRAIC, **QUALITY, **DISTANCE2, **POINT, **SPARSIFY2}


def queries():
    return {name: fn for name, (fn, _sql) in ALL.items()}


def oracle_sql():
    return {name: sql for name, (_fn, sql) in ALL.items() if sql is not None}
