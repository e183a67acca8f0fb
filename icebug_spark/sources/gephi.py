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


def gephi_value_events(
    values: DataFrame, attribute_name: str, kind: str = "node"
) -> DataFrame:
    """Attribute-update events (``cn``/``ce``) as a one-column ``event``
    DataFrame — the distributed twin of the reference's
    ``exportNodeValues`` / ``exportEdgeValues``
    (``networkit/gephi/streaming.py:180,232``). ``values``: (id, value)
    for nodes, or (src, dst, value) for edges (edge ids use the same
    canonical "src-dst" string as :func:`gephi_events`). Pure column
    work (`to_json`), one scan, no driver materialization."""
    if kind == "node":
        key = F.col("id").cast("string")
        tag = "cn"
    elif kind == "edge":
        key = F.concat_ws("-", F.col("src"), F.col("dst"))
        tag = "ce"
    else:
        raise ValueError(f"kind must be 'node' or 'edge', got {kind!r}")
    return values.select(
        F.to_json(
            F.create_map(
                F.lit(tag),
                F.create_map(key, F.struct(F.col("value").alias(attribute_name))),
            )
        ).alias("event")
    )


class GephiLiveClient:
    """Live REST twin of the batch bridge above — pushes protocol events
    to a running Gephi Streaming-plugin master endpoint
    (``?operation=updateGraph`` POSTs, exactly the wire format of
    reference ``networkit/gephi/pyclient.py:122`` /
    ``streaming.py:GephiStreamingClient``).

    Scale shape: event construction is distributed (`gephi_events` /
    `gephi_value_events` — column-only plans); the DRAIN is driver-side
    by nature — one HTTP socket exists, so the driver iterates
    ``toLocalIterator()`` (one partition in memory at a time, backpressure
    from the socket) and POSTs ``batch_lines``-line chunks. For graphs
    too big for one socket, write the same events with
    :func:`write_gephi_stream` and fan the part files at the endpoint
    out-of-band.

    ``http_post`` is injectable for tests/offline use; default is a
    stdlib ``urllib.request`` POST (no extra deps)."""

    def __init__(
        self,
        url: str = "http://localhost:8080/workspace0",
        batch_lines: int = 5000,
        timeout: float = 10.0,
        http_post=None,
    ):
        self.url = url
        self.batch_lines = max(1, int(batch_lines))
        self.timeout = timeout
        self._post_impl = http_post

    # -- transport -----------------------------------------------------
    def _post(self, data: str) -> None:
        if self._post_impl is not None:
            self._post_impl(self.url + "?operation=updateGraph", data)
            return
        import urllib.request

        urllib.request.urlopen(
            self.url + "?operation=updateGraph",
            data.encode("utf-8"),
            timeout=self.timeout,
        ).read()

    def _drain(self, events: DataFrame) -> int:
        """Stream an ``event`` DataFrame to the endpoint in
        ``batch_lines``-line POSTs; returns the number of events sent."""
        buf: list[str] = []
        sent = 0
        for row in events.toLocalIterator():
            buf.append(row["event"])
            if len(buf) >= self.batch_lines:
                self._post("\r\n".join(buf) + "\r\n")
                sent += len(buf)
                buf = []
        if buf:
            self._post("\r\n".join(buf) + "\r\n")
            sent += len(buf)
        return sent

    # -- protocol ------------------------------------------------------
    def clean(self) -> None:
        """Delete the workspace graph (``{"dn":{"filter":"ALL"}}`` —
        pyclient.py:217)."""
        import json

        self._post(json.dumps({"dn": {"filter": "ALL"}}) + "\r\n")

    def export_graph(
        self,
        edges: DataFrame,
        directed: bool = False,
        node_attrs: DataFrame | None = None,
        clean_first: bool = True,
    ) -> int:
        """Push the whole graph (nodes first, then edges — the
        ``orderBy`` in `gephi_events` guarantees it). Returns events
        sent."""
        if clean_first:
            self.clean()
        return self._drain(gephi_events(edges, directed, node_attrs))

    def export_node_values(self, values: DataFrame, attribute_name: str) -> int:
        return self._drain(gephi_value_events(values, attribute_name, "node"))

    def export_edge_values(self, values: DataFrame, attribute_name: str) -> int:
        return self._drain(gephi_value_events(values, attribute_name, "edge"))

    def export_additional_edge(self, u: int, v: int, directed: bool = False) -> None:
        """streaming.py:93 exportAdditionalEdge."""
        import json

        eid = f"{u}->{v}" if directed else f"{min(u, v)}-{max(u, v)}"
        self._post(
            json.dumps(
                {"ae": {eid: {"source": str(u), "target": str(v), "directed": directed}}}
            )
            + "\r\n"
        )

    def remove_exported_edge(self, u: int, v: int, directed: bool = False) -> None:
        """streaming.py:116 removeExportedEdge."""
        import json

        eid = f"{u}->{v}" if directed else f"{min(u, v)}-{max(u, v)}"
        self._post(json.dumps({"de": {eid: {}}}) + "\r\n")
