"""Gephi graph-streaming bridge (batch form of the live client).

Parity target: reference ``networkit/gephi/streaming.py`` —
GephiStreamingClient pushes the graph and per-node/per-edge attributes to
Gephi's Streaming-plugin REST endpoint using the public graph-streaming
JSON protocol (one JSON object per event: ``{"an": {...}}`` add-node,
``{"ae": {...}}`` add-edge, ``{"cn"/"ce": {...}}`` change attributes,
``{"dn"/"de": {...}}`` delete). The live socket is environment-bound
(needs a running Gephi), so the distributed analog is the event FILE:
the same protocol lines, produced as a DataFrame and written as text —
pipe it to the plugin's ``updateGraph`` endpoint (curl --data-binary) or
drip-feed it to replay the stream. Round-trips through
:func:`read_gephi_stream`.

Event construction is pure column work (`to_json` over structs), so the
export scans the edge table once, distributed; no driver materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def gephi_events(
    edges: DataFrame,
    directed: bool = False,
    node_attrs: DataFrame | None = None,
) -> DataFrame:
    """→ one-column DataFrame ``event`` of protocol JSON lines, node
    events (``an``) ordered before edge events (``ae``) via a sort key
    the writer preserves. ``node_attrs``: optional (id, <attr cols…>)
    exported as add-node attribute payloads. Edge ids are the canonical
    "u-v" strings the reference client uses."""
    e = edges.select("src", "dst", *(["weight"] if "weight" in edges.columns else []))
    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    if node_attrs is not None:
        nodes = nodes.join(node_attrs, "id", "left")
    attr_cols = [c for c in nodes.columns if c != "id"]
    an = nodes.select(
        F.lit(0).alias("ord"),
        F.to_json(
            F.create_map(
                F.lit("an"),
                F.create_map(
                    F.col("id").cast("string"),
                    F.struct(
                        F.col("id").cast("string").alias("label"), *attr_cols
                    ),
                ),
            )
        ).alias("event"),
    )
    w = F.col("weight").cast("double") if "weight" in e.columns else F.lit(1.0)
    ae = e.select(
        F.lit(1).alias("ord"),
        F.to_json(
            F.create_map(
                F.lit("ae"),
                F.create_map(
                    F.concat_ws("-", F.col("src"), F.col("dst")),
                    F.struct(
                        F.col("src").cast("string").alias("source"),
                        F.col("dst").cast("string").alias("target"),
                        F.lit(directed).alias("directed"),
                        w.alias("weight"),
                    ),
                ),
            )
        ).alias("event"),
    )
    return an.unionByName(ae).orderBy("ord").select("event")


def write_gephi_stream(
    edges: DataFrame,
    path: str,
    directed: bool = False,
    node_attrs: DataFrame | None = None,
) -> None:
    """Write the event stream as a text dataset (directory of part
    files; nodes-before-edges ordering holds within the stream because
    the sort key precedes the write)."""
    gephi_events(edges, directed, node_attrs).write.mode("overwrite").text(path)


def read_gephi_stream(spark: SparkSession, path: str) -> DataFrame:
    """Parse a graph-streaming event file back to (src, dst, weight)
    edges with SET semantics: an edge id is present iff it has at least
    one ``ae`` event and no ``de`` event; duplicate ``ae`` events for
    one id collapse to a single row (max weight, deterministic).

    A distributed text read has no global line order, so true
    replay-order semantics (re-add after delete) are out of scope for
    the batch reader — that case needs the ordered live protocol; the
    limitation is intentional and documented here. Node-only events
    contribute no edges."""
    raw = spark.read.text(path)
    ae = raw.select(
        F.from_json(
            "value",
            "ae MAP<STRING, STRUCT<source STRING, target STRING, "
            "directed BOOLEAN, weight DOUBLE>>",
        ).alias("j")
    ).where(F.col("j.ae").isNotNull())
    edges = (
        ae.select(F.explode("j.ae").alias("eid", "e"))
        .select(
            F.col("eid"),
            F.col("e.source").cast("bigint").alias("src"),
            F.col("e.target").cast("bigint").alias("dst"),
            F.col("e.weight").alias("weight"),
        )
        .groupBy("eid", "src", "dst")
        .agg(F.max("weight").alias("weight"))
    )
    de = raw.select(
        F.from_json("value", "de MAP<STRING, STRING>").alias("j")
    ).where(F.col("j.de").isNotNull()).select(
        F.explode(F.map_keys("j.de")).alias("eid")
    )
    return edges.join(de, "eid", "left_anti").drop("eid")
