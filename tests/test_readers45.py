"""GraphML / GEXF / MAT / RB round-trips (sources.readers4, readers5).

Parity notes per test docstrings; reference: networkit/graphio.pyx
(GraphML :2295/:2326, GEXF :1708/:2018, MAT :1390/:1423) and
io/RBGraphReader.hpp:23.
"""

import textwrap

from icebug_spark.graph.core import Graph
from icebug_spark.sources import readers4, readers5
from icebug_spark.streaming.dynamic import apply_events


EDGES_U = [(0, 1), (0, 2), (1, 2), (2, 4)]
EDGES_W = [(0, 1, 2.5), (1, 2, 0.5), (2, 3, 1.0)]


def _pairs(g):
    return sorted((r["src"], r["dst"]) for r in g.edges.select("src", "dst").collect())


def _wpairs(g):
    return sorted(
        (r["src"], r["dst"], r["weight"])
        for r in g.edges.select("src", "dst", "weight").collect()
    )


# -- GraphML ----------------------------------------------------------------


def test_graphml_roundtrip_unweighted(spark, tmp_path):
    g = Graph.from_edge_list(spark, EDGES_U, directed=False)
    p = str(tmp_path / "g.graphml")
    readers4.write_graphml(g, p)
    g2 = readers4.read_graphml(spark, p)
    assert not g2.directed and not g2.weighted
    # reference parity: GraphML node ids are strings mapped POSITIONALLY
    # (graphio.pyx:2222 mapping[val]=addNode()), so the id gap at 3
    # compacts — the written {0,1,2,4} reads back as {0,1,2,3}
    assert _pairs(g2) == [(0, 1), (0, 2), (1, 2), (2, 3)]


def test_graphml_roundtrip_weighted_directed(spark, tmp_path):
    g = Graph.from_edge_list(spark, EDGES_W, directed=True, weighted=True)
    p = str(tmp_path / "w.graphml")
    readers4.write_graphml(g, p)
    g2 = readers4.read_graphml(spark, p)
    assert g2.directed and g2.weighted
    assert _wpairs(g2) == EDGES_W


def test_graphml_attributes_roundtrip(spark, tmp_path):
    g = Graph.from_edge_list(spark, EDGES_U, directed=False)
    p = str(tmp_path / "a.graphml")
    # node attrs indexed by id (0..4), edge attrs by canonical sort order
    readers4.write_graphml(
        g,
        p,
        node_attributes={"score": [0.5, 1.5, 2.5, 0.0, 4.5], "tag": ["a", "b", "c", "d", "e"]},
        edge_attributes={"cap": [1, 2, 3, 4]},
    )
    g2 = readers4.read_graphml(spark, p)
    vrows = {r["id"]: (r["score"], r["tag"]) for r in g2.vertices.collect()}
    assert vrows[2] == (2.5, "c")
    erows = sorted(
        (r["src"], r["dst"], r["cap"]) for r in g2.edges.collect()
    )
    assert erows == [(0, 1, 1), (0, 2, 2), (1, 2, 3), (2, 3, 4)]


def test_graphml_reader_external_fixture(spark, tmp_path):
    """Namespaced file not produced by our writer (yEd/Gephi shape):
    weight key detection per graphio.pyx:2231-2235, string node ids
    mapped in document order."""
    xml = textwrap.dedent("""\
        <?xml version="1.0" encoding="UTF-8"?>
        <graphml xmlns="http://graphml.graphdrawing.org/xmlns">
          <key for="edge" id="w" attr.name="weight" attr.type="double"/>
          <graph id="G" edgedefault="directed">
            <node id="alpha"/><node id="beta"/><node id="gamma"/>
            <edge source="alpha" target="beta"><data key="w">2.0</data></edge>
            <edge source="beta" target="gamma"><data key="w">3.5</data></edge>
          </graph>
        </graphml>
    """)
    p = tmp_path / "ext.graphml"
    p.write_text(xml)
    g = readers4.read_graphml(spark, str(p))
    assert g.directed and g.weighted
    assert _wpairs(g) == [(0, 1, 2.0), (1, 2, 3.5)]


# -- GEXF -------------------------------------------------------------------


def test_gexf_static_roundtrip(spark, tmp_path):
    g = Graph.from_edge_list(spark, EDGES_W, directed=False, weighted=True)
    p = str(tmp_path / "s.gexf")
    readers4.write_gexf(g, p)
    g2, ev = readers4.read_gexf(spark, p)
    assert not g2.directed and g2.weighted
    assert _wpairs(g2) == EDGES_W
    assert ev.count() == 0


def test_gexf_dynamic_fixture_events(spark, tmp_path):
    """Hand-written dynamic GEXF (graphio.pyx parseDynamics rules):
    node 2 added at t=1; edge (0,1) initial (no start) and removed at
    t=2; edge (1,2) spell [1,2]; TIME_STEP markers between distinct
    times."""
    xml = textwrap.dedent("""\
        <?xml version="1.0" encoding="UTF-8"?>
        <gexf version="1.2">
          <graph defaultedgetype="undirected" mode="dynamic" timeformat="double">
            <nodes>
              <node id="0"/>
              <node id="1"/>
              <node id="2"><spells><spell start="1.0"/></spells></node>
            </nodes>
            <edges>
              <edge id="0" source="0" target="1"><spells><spell end="2.0"/></spells></edge>
              <edge id="1" source="1" target="2"><spells><spell start="1.0" end="2.0"/></spells></edge>
            </edges>
          </graph>
        </gexf>
    """)
    p = tmp_path / "d.gexf"
    p.write_text(xml)
    g, ev = readers4.read_gexf(spark, str(p))
    # initial graph: nodes {0,1}, edge (0,1)
    assert sorted(r["id"] for r in g.vertices.collect()) == [0, 1]
    assert _pairs(g) == [(0, 1)]
    rows = [tuple(r)[1:] for r in ev.orderBy("seq").collect()]
    assert rows == [
        ("NODE_ADDITION", 2, 0, 0.0),
        ("EDGE_ADDITION", 1, 2, 1.0),
        ("TIME_STEP", 0, 0, 0.0),
        ("EDGE_REMOVAL", 0, 1, 1.0),
        ("EDGE_REMOVAL", 1, 2, 1.0),
    ]


def test_gexf_dynamic_roundtrip_replay(spark, tmp_path):
    """write_gexf(initial, events) → read_gexf → identical initial graph
    and a replay-equivalent event stream (same final edge table through
    apply_events)."""
    g0 = Graph.from_edge_list(spark, [(0, 1), (1, 2)], directed=False)
    events = spark.createDataFrame(
        [
            (0, "EDGE_ADDITION", 2, 3, 1.0),
            (1, "TIME_STEP", 0, 0, 0.0),
            (2, "EDGE_REMOVAL", 0, 1, 1.0),
            (3, "EDGE_ADDITION", 3, 4, 1.0),
        ],
        readers4.EVENT_SCHEMA,
    )
    p = str(tmp_path / "rt.gexf")
    readers4.write_gexf(g0, p, events=events)
    g1, ev1 = readers4.read_gexf(spark, str(p))
    assert _pairs(g1) == [(0, 1), (1, 2)]

    def final(g, ev):
        base = g.edges.selectExpr("src", "dst", "CAST(1.0 AS DOUBLE) AS weight")
        return sorted(
            (r["src"], r["dst"]) for r in apply_events(base, ev).collect()
        )

    assert final(g0, events) == final(g1, ev1) == [(1, 2), (2, 3), (3, 4)]


def test_gexf_restore_cycle(spark, tmp_path):
    """Initial edge removed at t=1 and restored at t=2 → spells
    [("",1),(2,"")]; reader re-adds it (re ⇒ EDGE_ADDITION,
    graphio.pyx:1979)."""
    g0 = Graph.from_edge_list(spark, [(0, 1)], directed=False)
    events = spark.createDataFrame(
        [
            (0, "TIME_STEP", 0, 0, 0.0),
            (1, "EDGE_REMOVAL", 0, 1, 1.0),
            (2, "TIME_STEP", 0, 0, 0.0),
            (3, "EDGE_ADDITION", 0, 1, 1.0),
        ],
        readers4.EVENT_SCHEMA,
    )
    p = str(tmp_path / "rc.gexf")
    readers4.write_gexf(g0, p, events=events)
    g1, ev1 = readers4.read_gexf(spark, str(p))
    assert _pairs(g1) == [(0, 1)]
    types = [r["type"] for r in ev1.orderBy("seq").collect()]
    assert types == ["EDGE_REMOVAL", "TIME_STEP", "EDGE_ADDITION"]


# -- MAT --------------------------------------------------------------------


def test_mat_roundtrip(spark, tmp_path):
    g = Graph.from_edge_list(spark, EDGES_U, directed=False)
    p = str(tmp_path / "g.mat")
    readers5.write_mat(g, p, key="G")
    g2 = readers5.read_mat(spark, p, key="G")
    assert not g2.directed and not g2.weighted
    assert _pairs(g2) == sorted(EDGES_U)
    # Graph(n) parity: all nodes up to max id exist, incl. isolated 3
    assert sorted(r["id"] for r in g2.vertices.collect()) == [0, 1, 2, 3, 4]


def test_mat_wrong_key_raises(spark, tmp_path):
    g = Graph.from_edge_list(spark, EDGES_U, directed=False)
    p = str(tmp_path / "k.mat")
    readers5.write_mat(g, p, key="G")
    try:
        readers5.read_mat(spark, p, key="H")
        assert False, "expected KeyError"
    except KeyError:
        pass


def test_mat_compressed_and_sparse(spark, tmp_path):
    """Reader handles miCOMPRESSED wrapping and sparse-CSC payloads
    (what scipy.io.savemat emits by default — the reference's actual
    on-disk shape)."""
    import struct
    import zlib
    import numpy as np
    from icebug_spark.sources.readers5 import (
        _MI_COMPRESSED, _MI_INT8, _MI_INT32, _MI_MATRIX, _MI_UINT32,
        _MI_DOUBLE, _mat_element,
    )

    # sparse CSC for edges (0,1),(1,2) symmetric on n=3
    ir = np.array([1, 0, 2, 1], dtype=np.int32)      # rows per column
    jc = np.array([0, 1, 3, 4], dtype=np.int32)      # col pointers
    pr = np.ones(4, dtype=np.float64)
    body = (
        _mat_element(_MI_UINT32, struct.pack("<II", 5, 4))  # mxSPARSE, nzmax
        + _mat_element(_MI_INT32, struct.pack("<ii", 3, 3))
        + _mat_element(_MI_INT8, b"G")
        + _mat_element(_MI_INT32, ir.tobytes())
        + _mat_element(_MI_INT32, jc.tobytes())
        + _mat_element(_MI_DOUBLE, pr.tobytes())
    )
    element = _mat_element(_MI_MATRIX, body)
    compressed = zlib.compress(element)
    p = tmp_path / "c.mat"
    with open(p, "wb") as f:
        f.write(b"MATLAB 5.0".ljust(116) + b"\x00" * 8 + b"\x00\x01" + b"IM")
        f.write(struct.pack("<II", _MI_COMPRESSED, len(compressed)) + compressed)
    g = readers5.read_mat(spark, str(p), key="G")
    assert _pairs(g) == [(0, 1), (1, 2)]


# -- RB ---------------------------------------------------------------------


def test_rb_roundtrip_symmetric_weighted(spark, tmp_path):
    g = Graph.from_edge_list(spark, EDGES_W, directed=False, weighted=True)
    p = str(tmp_path / "g.rb")
    readers5.write_rb(g, p)
    g2 = readers5.read_rb(spark, p)
    assert not g2.directed and g2.weighted
    assert _wpairs(g2) == EDGES_W


def test_rb_roundtrip_directed_pattern(spark, tmp_path):
    g = Graph.from_edge_list(spark, [(0, 1), (1, 0), (2, 1)], directed=True)
    p = str(tmp_path / "d.rb")
    readers5.write_rb(g, p)
    g2 = readers5.read_rb(spark, p)
    assert g2.directed and not g2.weighted
    assert _pairs(g2) == [(0, 1), (1, 0), (2, 1)]


def test_rb_reader_external_fixture(spark, tmp_path):
    """Hand-written psa file (pattern, symmetric): triangle 0-1-2 stored
    as lower triangle, 1-indexed (RBMatrixReader.cpp:97-124 parse)."""
    txt = textwrap.dedent("""\
        tiny triangle
        3 1 1 0
        psa 3 3 3 0
        (8I10) (8I10)
        1 3 4 4
        2 3 3
    """)
    p = tmp_path / "t.rb"
    p.write_text(txt)
    g = readers5.read_rb(spark, str(p))
    assert not g.directed and not g.weighted
    assert _pairs(g) == [(0, 1), (0, 2), (1, 2)]


# -- round-8 pinning tests (ADVICE r07) ---------------------------------------


def test_graphml_missing_typed_attrs_keep_declared_types(spark, tmp_path):
    """Elements missing a declared int/boolean attribute must keep the
    DECLARED Spark type via pandas nullable dtypes (a plain None in a
    list would become float64/object); an all-absent column still
    infers (graphio.pyx:2295 reader, typed-attribute extension)."""
    xml = textwrap.dedent("""\
        <?xml version="1.0" encoding="UTF-8"?>
        <graphml xmlns="http://graphml.graphdrawing.org/xmlns">
          <key id="d2" for="node" attr.name="rank" attr.type="int"/>
          <key id="d3" for="edge" attr.name="flag" attr.type="boolean"/>
          <key id="d4" for="node" attr.name="label" attr.type="string"/>
          <graph edgedefault="undirected">
            <node id="a"><data key="d2">7</data></node>
            <node id="b"/>
            <node id="c"><data key="d2">9</data></node>
            <edge source="a" target="b"><data key="d3">true</data></edge>
            <edge source="b" target="c"/>
          </graph>
        </graphml>
    """)
    p = tmp_path / "m.graphml"
    p.write_text(xml)
    g = readers4.read_graphml(spark, str(p))
    vtypes = dict(g.vertices.dtypes)
    assert vtypes["rank"] == "bigint"
    assert vtypes["label"] == "string"  # all-absent column still typed
    assert dict(g.edges.dtypes)["flag"] == "boolean"
    ranks = {r["id"]: r["rank"] for r in g.vertices.collect()}
    assert ranks == {0: 7, 1: None, 2: 9}
    flags = sorted(
        (r["src"], r["dst"], r["flag"]) for r in g.edges.collect()
    )
    assert flags == [(0, 1, True), (1, 2, None)]


def test_gexf_noncontiguous_ids_clean_remap(spark, tmp_path):
    """Non-0..n-1 GEXF ids → the clean dense remap: initial nodes in
    document order, dynamic nodes by first-addition time. The reference
    can't represent this file faithfully at all (its int(u) 2-way map +
    mapDynamicNodes rewrite assume 0..n-1)."""
    xml = textwrap.dedent("""\
        <?xml version="1.0" encoding="UTF-8"?>
        <gexf version="1.2">
          <graph defaultedgetype="undirected" mode="dynamic" timeformat="double">
            <nodes>
              <node id="20"/>
              <node id="10"/>
              <node id="30"><spells><spell start="1.0"/></spells></node>
            </nodes>
            <edges>
              <edge id="0" source="20" target="10"/>
              <edge id="1" source="10" target="30"><spells><spell start="1.0"/></spells></edge>
            </edges>
          </graph>
        </gexf>
    """)
    p = tmp_path / "nc.gexf"
    p.write_text(xml)
    g, ev = readers4.read_gexf(spark, str(p))
    # doc order: 20->0, 10->1; dynamic 30->2
    assert sorted(r["id"] for r in g.vertices.collect()) == [0, 1]
    assert _pairs(g) == [(0, 1)]
    rows = [tuple(r)[1:] for r in ev.orderBy("seq").collect()]
    assert rows == [
        ("NODE_ADDITION", 2, 0, 0.0),
        ("EDGE_ADDITION", 1, 2, 1.0),
    ]


def test_gexf_out_of_order_ids_divergence(spark, tmp_path):
    """DOCUMENTED DIVERGENCE PIN (graphio.pyx:1995): ids are 0..3 so we
    map them directly, but node 3 is added BEFORE node 2. The
    reference's mapDynamicNodes would relabel by addition order
    (3->2, 2->3) and rewrite every later event with a matching u to
    GraphEvent(type, newid, 0, 0) — ZEROING v/w of the (3,1) edge
    addition into (2, 0, 0.0). We keep the declared ids and the intact
    edge event instead."""
    xml = textwrap.dedent("""\
        <?xml version="1.0" encoding="UTF-8"?>
        <gexf version="1.2">
          <graph defaultedgetype="undirected" mode="dynamic" timeformat="double">
            <nodes>
              <node id="0"/>
              <node id="1"/>
              <node id="2"><spells><spell start="2.0"/></spells></node>
              <node id="3"><spells><spell start="1.0"/></spells></node>
            </nodes>
            <edges>
              <edge id="0" source="0" target="1"/>
              <edge id="1" source="3" target="1"><spells><spell start="2.0"/></spells></edge>
            </edges>
          </graph>
        </gexf>
    """)
    p = tmp_path / "oo.gexf"
    p.write_text(xml)
    g, ev = readers4.read_gexf(spark, str(p))
    assert _pairs(g) == [(0, 1)]
    rows = [tuple(r)[1:] for r in ev.orderBy("seq").collect()]
    assert rows == [
        ("NODE_ADDITION", 3, 0, 0.0),          # reference: u rewritten to 2
        ("TIME_STEP", 0, 0, 0.0),
        ("NODE_ADDITION", 2, 0, 0.0),          # reference: u rewritten to 3
        ("EDGE_ADDITION", 3, 1, 1.0),          # reference: (2, 0, 0.0) — zeroed
    ]
