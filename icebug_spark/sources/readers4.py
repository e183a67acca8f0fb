"""Graph file I/O part 4: XML interchange formats — GraphML and GEXF
(including dynamic GEXF → GraphEvent streams).

Parity targets (reference *Python* surface, ``networkit/graphio.pyx`` —
these formats live outside the C++ ``io/`` module, which is why SURVEY
§2.14's C++-derived inventory missed them):

- GraphMLReader ``graphio.pyx:2295`` (SAX parser ``:2179``) /
  GraphMLWriter ``graphio.pyx:2326``. Reader parity: ``directed`` from
  ``graph@edgedefault``, ``weighted`` iff a ``<key for="edge"
  attr.name="weight" attr.type="double">`` is declared, node string ids
  mapped to 0..n-1 in document order. Extension beyond the reference
  (whose SAX reader keeps only the weight): other declared node/edge
  attribute keys are parsed into typed DataFrame columns.
- GEXFReader ``graphio.pyx:1708`` / GEXFWriter ``graphio.pyx:2018``.
  ``read_gexf`` returns ``(initial Graph, events DataFrame)`` in the
  engine's event schema (``streaming/dynamic.py``: seq, type, u, v, w,
  with TIME_STEP markers between distinct timestamps — the reference's
  eventStream shape). Spell / inline start-end / dynamic-weight
  semantics follow ``graphio.pyx`` ``parseDynamics`` (:1840-1905).
  Documented divergence: the reference's ``mapDynamicNodes``
  (``graphio.pyx:1998``) rewrites any event whose ``u`` matches a
  remapped node — including edge events, whose ``v``/``w`` it ZEROES.
  When node ids parse as ints covering 0..n-1 (the shape Gephi emits)
  we use them directly — identical to the reference exactly when its
  remap is the identity (initial nodes in id order AND dynamic nodes
  first-added in increasing id order; the pinning test
  ``test_gexf_out_of_order_ids_divergence`` documents the reference's
  zeroed output on the out-of-order case). Other id universes get a
  clean dense remap (doc order, then first-addition order).

Like readers3, these are convert-once ingest formats: the XML walk is
driver-side, the edge array lands in Spark via Arrow, and a 100 TB
deployment converts to the parquet container once
(``readers3.write_graph_parquet``) and scans columnar splits after.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from icebug_spark.graph.core import Graph

EVENT_SCHEMA = "seq LONG, type STRING, u LONG, v LONG, w DOUBLE"


def _tag(el) -> str:
    """Local tag name with any XML namespace stripped."""
    return el.tag.rpartition("}")[2]


def _children(el, name):
    return [c for c in el.iter() if _tag(c) == name]


def _direct(el, name):
    return [c for c in list(el) if _tag(c) == name]


# ---------------------------------------------------------------------------
# GraphML
# ---------------------------------------------------------------------------

_GML_TYPES = {
    "int": ("long", int),
    "long": ("long", int),
    "float": ("double", float),
    "double": ("double", float),
    "boolean": ("boolean", lambda s: s.strip().lower() == "true"),
    "string": ("string", str),
}

# declared GraphML type → pandas NULLABLE dtype, so elements missing a
# declared attribute keep the declared type (a plain list with Nones
# would silently become float64/object, and an all-None column fails
# Spark schema inference)
_PD_DTYPES = {
    "long": "Int64",
    "double": "Float64",
    "boolean": "boolean",
    "string": "string",
}


def read_graphml(spark: SparkSession, path: str) -> Graph:
    """GraphMLReader (``graphio.pyx:2295``; SAX semantics ``:2179``):
    ``directed`` from ``graph@edgedefault``; weighted iff the weight key
    (for=edge, attr.name=weight, attr.type=double) is declared; node ids
    mapped 0..n-1 in document order. Declared non-weight attribute keys
    are additionally parsed into typed vertex/edge columns."""
    root = ET.parse(path).getroot()
    # keys: id -> (for, name, sqltype, cast)
    keys: dict[str, tuple[str, str, str, object]] = {}
    weight_id = None
    for k in _children(root, "key"):
        kid = k.get("id", "")
        kfor = k.get("for", "")
        name = k.get("attr.name", "")
        typ = k.get("attr.type", "string")
        if kfor == "edge" and name == "weight" and typ == "double":
            weight_id = kid
        elif typ in _GML_TYPES:
            keys[kid] = (kfor, name, *_GML_TYPES[typ])
    graphs = _children(root, "graph")
    if not graphs:
        raise ValueError(f"{path}: no <graph> element")
    graph = graphs[0]
    directed = graph.get("edgedefault") == "directed"

    mapping: dict[str, int] = {}
    node_attrs: dict[str, list] = {name: [] for kid, (kf, name, _, _) in keys.items() if kf == "node"}
    edge_attrs: dict[str, list] = {name: [] for kid, (kf, name, _, _) in keys.items() if kf == "edge"}
    attr_sqltype = {
        (kf, name): sqlt for kid, (kf, name, sqlt, _) in keys.items()
    }
    src, dst, wts = [], [], []
    for el in graph.iter():
        t = _tag(el)
        if t == "node":
            mapping[el.get("id")] = len(mapping)
            vals = _data_values(el, keys, "node")
            for name in node_attrs:
                node_attrs[name].append(vals.get(name))
        elif t == "edge":
            src.append(mapping[el.get("source")])
            dst.append(mapping[el.get("target")])
            if weight_id is not None:
                w = 0.0
                for d in _direct(el, "data"):
                    if d.get("key") == weight_id:
                        w = float(d.text or 0.0)
                wts.append(w)
            vals = _data_values(el, keys, "edge")
            for name in edge_attrs:
                edge_attrs[name].append(vals.get(name))

    weighted = weight_id is not None
    edata = {"src": np.asarray(src, dtype=np.int64), "dst": np.asarray(dst, dtype=np.int64)}
    if weighted:
        edata["weight"] = np.asarray(wts, dtype=np.float64)
    for name, vals in edge_attrs.items():
        edata[name] = pd.array(vals, dtype=_PD_DTYPES[attr_sqltype[("edge", name)]])
    eschema = "src BIGINT, dst BIGINT" + (", weight DOUBLE" if weighted else "")
    edges = (
        spark.createDataFrame([], eschema)
        if not src
        else spark.createDataFrame(pd.DataFrame(edata))
    )
    vertices = None
    if mapping:
        vdata = {"id": np.arange(len(mapping), dtype=np.int64)}
        for name, vals in node_attrs.items():
            vdata[name] = pd.array(vals, dtype=_PD_DTYPES[attr_sqltype[("node", name)]])
        vertices = spark.createDataFrame(pd.DataFrame(vdata))
    return Graph(edges, vertices=vertices, directed=directed, weighted=weighted)


def _data_values(el, keys, kfor) -> dict:
    out = {}
    for d in _direct(el, "data"):
        spec = keys.get(d.get("key"))
        if spec is not None and spec[0] == kfor:
            out[spec[1]] = spec[3](d.text or "")
    return out


def write_graphml(
    g: Graph,
    path: str,
    node_attributes: dict[str, list] | None = None,
    edge_attributes: dict[str, list] | None = None,
) -> None:
    """GraphMLWriter (``graphio.pyx:2326``): weight key d1, attribute
    keys d2.. typed from their first value; nodes by id; edges carry a
    ``directed`` flag and ``e{i}`` ids. Attribute lists index by node id
    / by edge position in canonical (src, dst) sort order (the order
    this writer emits and ``read_graphml`` preserves)."""
    node_attributes = node_attributes or {}
    edge_attributes = edge_attributes or {}
    root = ET.Element("graphml")
    root.set("xmlns", "http://graphml.graphdrawing.org/xmlns")

    next_key = 1
    if g.weighted:
        k = ET.SubElement(root, "key")
        k.set("for", "edge")
        k.set("id", "d1")
        k.set("attr.name", "weight")
        k.set("attr.type", "double")
        next_key += 1
    attr_keys: dict[tuple[str, str], str] = {}
    for kfor, attrs in (("node", node_attributes), ("edge", edge_attributes)):
        for name, vals in attrs.items():
            k = ET.SubElement(root, "key")
            kid = f"d{next_key}"
            next_key += 1
            k.set("for", kfor)
            k.set("id", kid)
            k.set("attr.name", name)
            k.set("attr.type", _attr_type(vals))
            attr_keys[(kfor, name)] = kid

    ge = ET.SubElement(root, "graph")
    ge.set("edgedefault", "directed" if g.directed else "undirected")
    dir_str = "true" if g.directed else "false"

    nodes = sorted(r["id"] for r in g.vertices.select("id").collect())
    ecols = ["src", "dst"] + (["weight"] if g.weighted else [])
    edges = sorted(tuple(r) for r in g.edges.select(*ecols).collect())
    for u in nodes:
        ne = ET.SubElement(ge, "node")
        ne.set("id", str(u))
        for name in node_attributes:
            d = ET.SubElement(ne, "data")
            d.set("key", attr_keys[("node", name)])
            d.text = _attr_str(node_attributes[name][u])
    for i, e in enumerate(edges):
        ee = ET.SubElement(ge, "edge")
        ee.set("directed", dir_str)
        ee.set("source", str(e[0]))
        ee.set("target", str(e[1]))
        ee.set("id", f"e{i}")
        if g.weighted:
            d = ET.SubElement(ee, "data")
            d.set("key", "d1")
            d.text = repr(float(e[2]))
        for name in edge_attributes:
            d = ET.SubElement(ee, "data")
            d.set("key", attr_keys[("edge", name)])
            d.text = _attr_str(edge_attributes[name][i])
    ET.ElementTree(root).write(path, encoding="utf-8", xml_declaration=True)


def _attr_type(vals: list) -> str:
    if not vals:
        return "int"
    v = vals[0]
    if isinstance(v, bool):
        return "boolean"
    if isinstance(v, (int, np.integer)):
        return "long"
    if isinstance(v, (float, np.floating)):
        return "double"
    return "string"


def _attr_str(v) -> str:
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        return repr(v)
    return str(v)


# ---------------------------------------------------------------------------
# GEXF
# ---------------------------------------------------------------------------


def read_gexf(spark: SparkSession, path: str) -> tuple[Graph, DataFrame]:
    """GEXFReader (``graphio.pyx:1708``): returns ``(initial graph,
    events)``. Static files give an empty event table. Dynamic files
    (``graph@mode="dynamic"``) parse spells / inline start-end into
    NODE/EDGE ADDITION/REMOVAL/RESTORATION + EDGE_WEIGHT_UPDATE events,
    sorted by time with a TIME_STEP marker between distinct timestamps
    (``graphio.pyx:1826-1833``). Dynamic node ids must be ints or
    ``n``-prefixed ints (reference restriction, ``graphio.pyx:1768``).
    Elements whose first spell has no start time belong to the initial
    graph (``parseDynamics`` rule 4)."""
    root = ET.parse(path).getroot()
    graphs = _children(root, "graph")
    if not graphs:
        raise ValueError(f"{path}: no <graph> element")
    graph = graphs[0]
    directed = graph.get("defaultedgetype") == "directed"
    dynamic = graph.get("mode") == "dynamic"
    time_format = graph.get("timeformat", "") if dynamic else ""
    weighted = False
    has_dyn_weights = False
    for att in _children(graph, "attribute"):
        if att.get("id") == "weight":
            has_dyn_weights = True
            weighted = True

    # raw events as (time, code, u_str, v_str, w_str); initial elements
    raw: list[tuple] = []
    init_nodes: list[str] = []
    init_edges: list[tuple[str, str, str]] = []

    def parse_time(s):
        if s == "" or time_format == "date":
            return s
        try:
            return float(s)
        except ValueError:
            return s

    def parse_dynamics(el, etype, ctl, u, v="0", w="0"):
        # exact rule transcription of graphio.pyx:1840-1905
        start = el.get("start") or el.get("startopen") or ""
        end = el.get("end") or el.get("endopen") or ""
        start, end = parse_time(start), parse_time(end)
        if start != "" and end != "":
            if start < end and not ctl["deleted"]:
                raw.append((start, "a" + etype, u, v, w))
                ctl["added"] = True
            else:
                raw.append((start, "r" + etype, u, v, w))
            raw.append((end, "d" + etype, u, v, w))
            ctl["deleted"] = True
        if start != "" and end == "":
            if ctl["deleted"]:
                raw.append((start, "r" + etype, u, v, w))
            else:
                raw.append((start, "a" + etype, u, v, w))
                ctl["added"] = True
        if etype == "e" and has_dyn_weights:
            attvalues = _children(el, "attvalue")
            if not attvalues and el_parent_map.get(el) is not None:
                # inside a spell: attvalues are siblings two levels up
                gp = el_parent_map.get(el_parent_map[el])
                if gp is not None:
                    attvalues = _children(gp, "attvalue")
            for att in attvalues:
                if att.get("for") == "weight":
                    wv = att.get("value", "0")
                    st = att.get("start") or att.get("startopen") or ""
                    st = parse_time(st)
                    if not ctl["added"]:
                        raw.append((st, "ae", u, v, wv))
                        ctl["added"] = True
                    else:
                        raw.append((st, "ce", u, v, wv))
        if start == "":
            if not ctl["added"]:
                if etype == "n":
                    init_nodes.append(u)
                else:
                    init_edges.append((u, v, w))
                ctl["added"] = True
            if end != "":
                raw.append((end, "d" + etype, u, v, w))
                ctl["deleted"] = True

    el_parent_map = {c: p for p in root.iter() for c in p}

    for n in _children(graph, "node"):
        u = n.get("id")
        if dynamic:
            ctl = {"added": False, "deleted": False}
            spells = _children(n, "spell")
            for s in spells or [n]:
                parse_dynamics(s, "n", ctl, u)
        else:
            init_nodes.append(u)
    for e in _children(graph, "edge"):
        u, v = e.get("source"), e.get("target")
        w = e.get("weight", "1.0")
        if e.get("weight") is not None:
            weighted = True
        if dynamic:
            ctl = {"added": False, "deleted": False}
            spells = _children(e, "spell")
            for s in spells or [e]:
                parse_dynamics(s, "e", ctl, u, v, w)
        else:
            init_edges.append((u, v, w))

    # node id mapping (reference: 2-way map + mapDynamicNodes rewrite,
    # graphio.pyx:1781,1998). Two modes:
    # 1. every declared node id parses under the reference restriction
    #    (int or 'n'-prefixed int, graphio.pyx:1768) and the parsed ids
    #    are exactly 0..n_total-1 → use the ids DIRECTLY. This equals
    #    the reference's output whenever its remap is the identity
    #    (initial nodes in id order, dynamic nodes first-added in
    #    increasing id order); when additions are out of id order the
    #    reference instead rewrites node events to addition-order ids
    #    and ZEROES v/w of edge events whose u matches a remapped node
    #    (graphio.pyx:1995) — a lossy quirk we do not reproduce
    #    (pinned: test_readers45.test_gexf_out_of_order_ids_divergence).
    # 2. otherwise → clean dense remap: initial nodes in document
    #    order, dynamic nodes by first-addition time, never-declared
    #    edge endpoints by first appearance (the reference KeyErrors on
    #    those).
    raw.sort(key=lambda r: r[0])

    def _try_int(s):
        try:
            return int(s)
        except (ValueError, TypeError):
            try:
                return int(s[1:])
            except (ValueError, TypeError, IndexError):
                return None

    declared: dict[str, None] = dict.fromkeys(init_nodes)
    for r in raw:
        if r[1][1] == "n":
            declared.setdefault(r[2])
    ints = [_try_int(s) for s in declared]
    id_mapped = bool(declared) and all(i is not None for i in ints) and sorted(
        ints
    ) == list(range(len(declared)))
    if id_mapped:
        mapping: dict[str, int] = dict(zip(declared, ints))
    else:
        mapping = {u: i for i, u in enumerate(init_nodes)}
        for r in raw:
            if r[1] == "an" and r[2] not in mapping:
                mapping[r[2]] = len(mapping)

    def mid(s: str) -> int:
        if s not in mapping:
            # endpoint never declared as a <node> (the reference
            # KeyErrors): id-mapped files keep the reference int
            # restriction, dense-remapped files get a fresh dense id —
            # never a mix of the two schemes
            i = _try_int(s) if id_mapped else None
            mapping[s] = (
                i
                if i is not None and i not in set(mapping.values())
                else max(mapping.values(), default=-1) + 1
            )
        return mapping[s]

    _CODES = {
        "an": "NODE_ADDITION",
        "dn": "NODE_REMOVAL",
        "rn": "NODE_RESTORATION",
        "ae": "EDGE_ADDITION",
        "re": "EDGE_ADDITION",  # edge restoration re-adds (graphio.pyx:1979)
        "de": "EDGE_REMOVAL",
        "ce": "EDGE_WEIGHT_UPDATE",
    }
    events: list[tuple] = []
    last_t = None
    for t, code, u, v, w in raw:
        if last_t is not None and t != last_t:
            events.append(("TIME_STEP", 0, 0, 0.0))
        last_t = t
        if code[1] == "n":
            events.append((_CODES[code], mid(u), 0, 0.0))
        else:
            events.append((_CODES[code], mid(u), mid(v), float(w)))
    ev_rows = [(i, *e) for i, e in enumerate(events)]
    ev_df = spark.createDataFrame(ev_rows, EVENT_SCHEMA) if ev_rows else spark.createDataFrame([], EVENT_SCHEMA)

    esrc = [mid(u) for u, v, w in init_edges]
    edst = [mid(v) for u, v, w in init_edges]
    edata = {"src": np.asarray(esrc, dtype=np.int64), "dst": np.asarray(edst, dtype=np.int64)}
    if weighted:
        edata["weight"] = np.asarray([float(w) for _, _, w in init_edges], dtype=np.float64)
    eschema = "src BIGINT, dst BIGINT" + (", weight DOUBLE" if weighted else "")
    edges = (
        spark.createDataFrame([], eschema)
        if not init_edges
        else spark.createDataFrame(pd.DataFrame(edata))
    )
    vertices = spark.createDataFrame(
        pd.DataFrame({"id": np.arange(len(init_nodes), dtype=np.int64)})
    ) if init_nodes else None
    g = Graph(edges, vertices=vertices, directed=directed, weighted=weighted)
    return g, ev_df


def write_gexf(g: Graph, path: str, events: DataFrame | None = None) -> None:
    """GEXFWriter (``graphio.pyx:2018``). Static: plain nodes/edges (with
    a ``weight`` attribute when the graph is weighted). Dynamic (an
    ``events`` table given): ``g`` is the INITIAL graph — the natural
    inverse of ``read_gexf`` — and each element's lifetime becomes
    ``<spells>``: event time = number of TIME_STEP markers before it,
    ADDITION/RESTORATION opens a spell, REMOVAL closes it, initial
    elements keep an open-start first spell; EDGE_WEIGHT_UPDATE becomes a
    dynamic-weight ``attvalue`` (``graphio.pyx:2149-2177`` spell shape)."""
    root = ET.Element("gexf")
    root.set("version", "1.2")
    ge = ET.SubElement(root, "graph")
    ge.set("defaultedgetype", "directed" if g.directed else "undirected")

    nodes = sorted(r["id"] for r in g.vertices.select("id").collect())
    ecols = ["src", "dst"] + (["weight"] if g.weighted else [])
    init_edges = {
        (int(r[0]), int(r[1])): (float(r[2]) if g.weighted else 1.0)
        for r in (tuple(x) for x in g.edges.select(*ecols).collect())
    }

    if events is None or not events.head(1):
        _write_gexf_static(ge, g, nodes, init_edges)
    else:
        _write_gexf_dynamic(ge, g, nodes, init_edges, events)
    ET.ElementTree(root).write(path, encoding="utf-8", xml_declaration=True)


def _write_gexf_static(ge, g, nodes, init_edges):
    ns = ET.SubElement(ge, "nodes")
    for u in nodes:
        ne = ET.SubElement(ns, "node")
        ne.set("id", str(u))
    es = ET.SubElement(ge, "edges")
    for i, ((u, v), w) in enumerate(sorted(init_edges.items())):
        ee = ET.SubElement(es, "edge")
        ee.set("id", str(i))
        ee.set("source", str(u))
        ee.set("target", str(v))
        if g.weighted:
            ee.set("weight", repr(w))


def _write_gexf_dynamic(ge, g, nodes, init_edges, events):
    ge.set("mode", "dynamic")
    ge.set("timeformat", "double")
    rows = [tuple(r) for r in events.orderBy("seq").collect()]
    # event time = #TIME_STEP markers before it
    t = 0.0
    node_ev: dict[int, list] = {}
    edge_ev: dict[tuple[int, int], list] = {}
    weighted_updates = False
    for _seq, typ, u, v, w in rows:
        if typ == "TIME_STEP":
            t += 1.0
        elif typ.startswith("NODE"):
            node_ev.setdefault(int(u), []).append((t, typ, 0.0))
        else:
            edge_ev.setdefault((int(u), int(v)), []).append((t, typ, float(w)))
            if typ == "EDGE_WEIGHT_UPDATE":
                weighted_updates = True
    if weighted_updates or g.weighted:
        atts = ET.SubElement(ge, "attributes")
        atts.set("class", "edge")
        atts.set("mode", "dynamic")
        att = ET.SubElement(atts, "attribute")
        att.set("id", "weight")
        att.set("title", "Weight")
        att.set("type", "float")

    all_nodes = sorted(set(nodes) | set(node_ev))
    ns = ET.SubElement(ge, "nodes")
    for u in all_nodes:
        ne = ET.SubElement(ns, "node")
        ne.set("id", str(u))
        _write_spells(ne, u in set(nodes), node_ev.get(u, []),
                      add={"NODE_ADDITION", "NODE_RESTORATION"},
                      rem={"NODE_REMOVAL"})
    all_edges = sorted(set(init_edges) | set(edge_ev))
    es = ET.SubElement(ge, "edges")
    for i, (u, v) in enumerate(all_edges):
        ee = ET.SubElement(es, "edge")
        ee.set("id", str(i))
        ee.set("source", str(u))
        ee.set("target", str(v))
        evs = edge_ev.get((u, v), [])
        adds = [e for e in evs if e[1] == "EDGE_ADDITION"]
        w = adds[0][2] if adds else init_edges.get((u, v), 1.0)
        if g.weighted or adds:
            ee.set("weight", repr(w))
        _write_spells(ee, (u, v) in init_edges, evs,
                      add={"EDGE_ADDITION"}, rem={"EDGE_REMOVAL"})
        updates = [e for e in evs if e[1] == "EDGE_WEIGHT_UPDATE"]
        if updates:
            avs = ET.SubElement(ee, "attvalues")
            for (tt, _typ, wv) in updates:
                av = ET.SubElement(avs, "attvalue")
                av.set("for", "weight")
                av.set("value", repr(wv))
                av.set("start", repr(tt))


def _write_spells(el, initial: bool, evs: list, add: set, rem: set) -> None:
    """Lifetime → spells: initial membership opens an open-start spell;
    additions open, removals close. No spells element for a plain
    initial element with no lifecycle events."""
    evs = sorted((e for e in evs if e[1] in add | rem), key=lambda e: e[0])
    spells: list[tuple] = []
    open_start: tuple | None = ("",) if initial else None
    for tt, typ, _w in evs:
        if typ in add and open_start is None:
            open_start = (tt,)
        elif typ in rem and open_start is not None:
            spells.append((open_start[0], tt))
            open_start = None
    if open_start is not None and (open_start != ("",) or spells):
        spells.append((open_start[0], ""))
    if not spells:
        return
    se = ET.SubElement(el, "spells")
    for s, e in spells:
        sp = ET.SubElement(se, "spell")
        if s != "":
            sp.set("start", repr(s))
        if e != "":
            sp.set("end", repr(e))


__all__ = [
    "read_graphml",
    "write_graphml",
    "read_gexf",
    "write_gexf",
]
