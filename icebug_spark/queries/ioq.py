"""I/O-format certificate queries q143-q146: full-value write→read
round-trip checks for the reference's Python-surface formats that SURVEY
§2.14's C++-derived inventory missed (GraphML, GEXF incl. dynamic
events, MAT) plus Rutherford-Boeing (``io/RBGraphReader.hpp:23``).

Each query derives a small deterministic graph from the ``nation``
table, writes it through the format under test, reads it back, and
returns the resulting edge table — the DuckDB oracle recomputes the
expected edges directly from the parquet, so any divergence in the
writer, the parser, the id mapping, or (q144) the event replay flips
the value hash. The file walk is driver-side by design (convert-once
ingest formats, see sources/readers4-5 docstrings); the graphs here are
dimension-table sized, which is exactly the scale these formats serve.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from icebug_spark.catalog import table
from icebug_spark.graph.core import Graph


def _nation_edges(spark: SparkSession, sf: str, dst_base: int) -> DataFrame:
    return table(spark, sf, "nation").select(
        F.col("n_nationkey").cast("long").alias("src"),
        (F.col("n_regionkey") + dst_base).cast("long").alias("dst"),
    )


# q143 — GraphML round-trip (GraphMLReader graphio.pyx:2295 / Writer
# :2326): directed weighted nation→region graph through XML. GraphML
# node ids are strings mapped POSITIONALLY on read (:2222), so the
# region nodes written as 100..104 come back as 25..29 — the oracle
# encodes that compaction arithmetic; a wrong weight-key declaration,
# data-element parse, or id order flips values.
def q143(spark: SparkSession, sf: str) -> DataFrame:
    from icebug_spark.sources.readers4 import read_graphml, write_graphml

    e = _nation_edges(spark, sf, 100).withColumn(
        "weight", (F.col("src") + 1).cast("double")
    )
    g = Graph(e, directed=True, weighted=True)
    d = tempfile.mkdtemp(prefix="icebug_q143_")
    try:
        write_graphml(g, f"{d}/g.graphml")
        g2 = read_graphml(spark, f"{d}/g.graphml")
        # reader parses driver-side into pandas — safe to drop the file
        return g2.edges.select("src", "dst", "weight").orderBy("src")
    finally:
        shutil.rmtree(d, ignore_errors=True)


Q143_SQL = """
SELECT CAST(n_nationkey AS BIGINT) AS src,
       CAST(25 + n_regionkey AS BIGINT) AS dst,
       CAST(n_nationkey + 1 AS DOUBLE) AS weight
FROM nation ORDER BY src
"""


# q144 — dynamic GEXF → event replay (GEXFReader graphio.pyx:1708 /
# Writer :2018): initial graph = even-nation edges (all 30 node ids
# present so the positional initial-node mapping is the identity),
# events add the odd-nation edges at t=1 and remove the %5==0 edges at
# t=2; written as spells, read back, replayed through apply_events.
# The oracle states the surviving-edge set directly.
def q144(spark: SparkSession, sf: str) -> DataFrame:
    from icebug_spark.sources.readers4 import EVENT_SCHEMA, read_gexf, write_gexf
    from icebug_spark.streaming.dynamic import apply_events

    e = _nation_edges(spark, sf, 25)
    init = e.where(F.col("src") % 2 == 0)
    vertices = spark.range(30).select(F.col("id"))
    g0 = Graph(init, vertices=vertices, directed=True)

    rows = [tuple(r) for r in e.orderBy("src").collect()]
    ev = []
    for u, v in rows:
        if u % 2 == 1:
            ev.append(("EDGE_ADDITION", u, v, 1.0))
    ev.append(("TIME_STEP", 0, 0, 0.0))
    for u, v in rows:
        if u % 5 == 0:
            ev.append(("EDGE_REMOVAL", u, v, 1.0))
    events = spark.createDataFrame(
        [(i, *r) for i, r in enumerate(ev)], EVENT_SCHEMA
    )

    d = tempfile.mkdtemp(prefix="icebug_q144_")
    try:
        write_gexf(g0, f"{d}/g.gexf", events=events)
        g1, ev1 = read_gexf(spark, f"{d}/g.gexf")
        base = g1.edges.select(
            "src", "dst", F.lit(1.0).alias("weight")
        )
        final = apply_events(base, ev1)
        return final.select("src", "dst").orderBy("src")
    finally:
        shutil.rmtree(d, ignore_errors=True)


Q144_SQL = """
SELECT CAST(n_nationkey AS BIGINT) AS src,
       CAST(25 + n_regionkey AS BIGINT) AS dst
FROM nation WHERE n_nationkey % 5 <> 0 ORDER BY src
"""


# q145 — MAT round-trip (readMat graphio.pyx:1423 / MatWriter :1454):
# undirected nation adjacency through a dense MAT-5 matrix; matrix
# indices preserve ids (no compaction), every nonzero becomes one
# canonical undirected edge.
def q145(spark: SparkSession, sf: str) -> DataFrame:
    from icebug_spark.sources.readers5 import read_mat, write_mat

    e = _nation_edges(spark, sf, 100)
    g = Graph(e, directed=False)
    d = tempfile.mkdtemp(prefix="icebug_q145_")
    try:
        write_mat(g, f"{d}/g.mat", key="G")
        g2 = read_mat(spark, f"{d}/g.mat", key="G")
        return g2.edges.select("src", "dst").orderBy("src", "dst")
    finally:
        shutil.rmtree(d, ignore_errors=True)


Q145_SQL = """
SELECT CAST(n_nationkey AS BIGINT) AS src,
       CAST(100 + n_regionkey AS BIGINT) AS dst
FROM nation ORDER BY src, dst
"""


# q146 — Rutherford-Boeing round-trip (RBGraphReader
# io/RBGraphReader.hpp:23, parse RBMatrixReader.cpp:35-133): weighted
# symmetric (rsa) CSC through the 1-indexed text format; weights are
# quarter-integers, exact in the E-format round-trip.
def q146(spark: SparkSession, sf: str) -> DataFrame:
    from icebug_spark.sources.readers5 import read_rb, write_rb

    e = _nation_edges(spark, sf, 100).withColumn(
        "weight", ((F.col("src") + 1) * 0.25).cast("double")
    )
    g = Graph(e, directed=False, weighted=True)
    d = tempfile.mkdtemp(prefix="icebug_q146_")
    try:
        write_rb(g, f"{d}/g.rb")
        g2 = read_rb(spark, f"{d}/g.rb")
        return g2.edges.select("src", "dst", "weight").orderBy("src")
    finally:
        shutil.rmtree(d, ignore_errors=True)


Q146_SQL = """
SELECT CAST(n_nationkey AS BIGINT) AS src,
       CAST(100 + n_regionkey AS BIGINT) AS dst,
       CAST((n_nationkey + 1) * 0.25 AS DOUBLE) AS weight
FROM nation ORDER BY src
"""


# q152 — NetworkitBinary round-trip (NetworkitBinaryWriter.cpp:40 /
# NetworkitBinaryReader.cpp:37, spec io/NetworkitBinaryGraph.md):
# directed weighted nation graph through the nkbg003 container with
# edge indices; weights src+0.1 force the DOUBLE weight format, ids
# follow canonical (src, dst) order (= src here since src is unique).
# A wrong varint, chunk offset, feature bit, or id stream flips values.
def q152(spark: SparkSession, sf: str) -> DataFrame:
    from icebug_spark.sources.readers6 import (
        read_networkit_binary, write_networkit_binary,
    )

    e = _nation_edges(spark, sf, 100).withColumn(
        "weight", (F.col("src") + F.lit(0.1)).cast("double")
    )
    g = Graph(e, directed=True, weighted=True)
    d = tempfile.mkdtemp(prefix="icebug_q152_")
    try:
        write_networkit_binary(g, f"{d}/g.nkb", chunks=4, edge_ids=True)
        g2 = read_networkit_binary(spark, f"{d}/g.nkb")
        return g2.edges.select("src", "dst", "weight", "edge_id").orderBy("src")
    finally:
        shutil.rmtree(d, ignore_errors=True)


Q152_SQL = """
SELECT CAST(n_nationkey AS BIGINT) AS src,
       CAST(100 + n_regionkey AS BIGINT) AS dst,
       CAST(n_nationkey AS DOUBLE) + 0.1 AS weight,
       CAST(n_nationkey AS BIGINT) AS edge_id
FROM nation ORDER BY src
"""


IO = {
    "q143_graphml_roundtrip": (q143, Q143_SQL),
    "q144_gexf_dynamic_replay": (q144, Q144_SQL),
    "q145_mat_roundtrip": (q145, Q145_SQL),
    "q146_rb_roundtrip": (q146, Q146_SQL),
    "q152_nkbg_roundtrip": (q152, Q152_SQL),
}
