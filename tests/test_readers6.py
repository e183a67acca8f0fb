"""NetworkitBinary (nkbg) round-trips (sources.readers6).

Parity: io/NetworkitBinaryWriter.cpp:40, io/NetworkitBinaryReader.cpp:37,
format spec io/NetworkitBinaryGraph.md, varint/zigzag helpers
include/networkit/io/NetworkitBinaryGraph.hpp:74-143.
"""

import struct

import pytest

from icebug_spark.graph.core import Graph
from icebug_spark.sources.readers6 import (
    read_networkit_binary,
    varint_decode,
    varint_encode,
    write_networkit_binary,
    zigzag_decode,
    zigzag_encode,
)


def _pairs(g):
    return sorted((r["src"], r["dst"]) for r in g.edges.select("src", "dst").collect())


def _wpairs(g):
    return sorted(
        (r["src"], r["dst"], r["weight"])
        for r in g.edges.select("src", "dst", "weight").collect()
    )


# -- codec ---------------------------------------------------------------


@pytest.mark.parametrize(
    "value",
    [0, 1, 2, 63, 64, 127, 128, 255, 256, 16383, 16384,
     (1 << 56) - 1, 1 << 56, (1 << 64) - 1],
)
def test_varint_roundtrip(value):
    buf = bytearray()
    n = varint_encode(value, buf)
    assert n == len(buf)
    decoded, pos = varint_decode(bytes(buf), 0)
    assert decoded == value and pos == n


def test_varint_spec_examples():
    """The doc's worked examples (NetworkitBinaryGraph.hpp:60-72):
    a 7-bit value fits the header byte; an 8-bit value takes one data
    byte with the two top bits spilled."""
    buf = bytearray()
    assert varint_encode(0b1111111, buf) == 1
    assert buf[0] == 0b11111111
    buf = bytearray()
    assert varint_encode(0b11111111, buf) == 2
    assert buf[0] == 0b11111110 and buf[1] == 0b00000011


def test_varint_property_roundtrip_and_stream():
    """Property check over the full uint64 domain plus adversarial
    near-boundary values: every value round-trips AND a concatenated
    stream decodes back element-wise (self-delimiting codes)."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=300, deadline=None)
    @given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=20))
    def check(values):
        buf = bytearray()
        sizes = [varint_encode(v, buf) for v in values]
        assert len(buf) == sum(sizes)
        pos, out = 0, []
        for _ in values:
            v, pos = varint_decode(bytes(buf), pos)
            out.append(v)
        assert out == values and pos == len(buf)

    check()


@pytest.mark.parametrize("value", [0, 1, -1, 2, -2, 2**62, -(2**62)])
def test_zigzag(value):
    assert zigzag_decode(zigzag_encode(value)) == value
    # sign bit lives in the LSB (NetworkitBinaryGraph.hpp:133)
    assert (zigzag_encode(value) & 1) == (1 if value < 0 else 0)


# -- round-trips -----------------------------------------------------------

EDGES_U = [(0, 1), (0, 2), (1, 2), (2, 4), (3, 3)]  # incl. a self-loop


def test_roundtrip_undirected_unweighted(spark, tmp_path):
    g = Graph.from_edge_list(spark, EDGES_U, directed=False)
    p = str(tmp_path / "g.nkb")
    write_networkit_binary(g, p)
    g2 = read_networkit_binary(spark, p)
    assert not g2.directed and not g2.weighted
    assert _pairs(g2) == sorted(EDGES_U)
    assert sorted(r["id"] for r in g2.vertices.collect()) == [0, 1, 2, 3, 4]


def test_roundtrip_directed(spark, tmp_path):
    edges = [(0, 1), (1, 0), (2, 0), (2, 2)]
    g = Graph.from_edge_list(spark, edges, directed=True)
    p = str(tmp_path / "d.nkb")
    write_networkit_binary(g, p)
    g2 = read_networkit_binary(spark, p)
    assert g2.directed
    assert _pairs(g2) == sorted(edges)


def test_roundtrip_weights_unsigned_varint(spark, tmp_path):
    edges = [(0, 1, 3.0), (1, 2, 0.0), (0, 2, 1000000.0)]
    g = Graph.from_edge_list(spark, edges, directed=False, weighted=True)
    p = str(tmp_path / "w.nkb")
    write_networkit_binary(g, p)
    # AUTO_DETECT → unsigned varint (features bits 1-3 == 1)
    with open(p, "rb") as f:
        features = struct.unpack_from("<Q", f.read(24), 16)[0]
    assert (features >> 1) & 0x7 == 1
    g2 = read_networkit_binary(spark, p)
    assert g2.weighted and _wpairs(g2) == sorted(edges)


def test_roundtrip_weights_signed_varint(spark, tmp_path):
    edges = [(0, 1, -3.0), (1, 2, 7.0)]
    g = Graph.from_edge_list(spark, edges, directed=False, weighted=True)
    p = str(tmp_path / "s.nkb")
    write_networkit_binary(g, p)
    with open(p, "rb") as f:
        features = struct.unpack_from("<Q", f.read(24), 16)[0]
    assert (features >> 1) & 0x7 == 2
    assert _wpairs(read_networkit_binary(spark, p)) == sorted(edges)


def test_roundtrip_weights_float_and_double(spark, tmp_path):
    # 0.5 is lossless in float32 → FLOAT; 0.1 is not → DOUBLE
    for w, fmt in [(0.5, 4), (0.1, 3)]:
        edges = [(0, 1, w), (1, 2, 2.0)]
        g = Graph.from_edge_list(spark, edges, directed=False, weighted=True)
        p = str(tmp_path / f"f{fmt}.nkb")
        write_networkit_binary(g, p)
        with open(p, "rb") as f:
            features = struct.unpack_from("<Q", f.read(24), 16)[0]
        assert (features >> 1) & 0x7 == fmt
        assert _wpairs(read_networkit_binary(spark, p)) == sorted(edges)


def test_roundtrip_edge_ids(spark, tmp_path):
    edges = [(0, 1), (0, 2), (1, 2)]
    g = Graph.from_edge_list(spark, edges, directed=False)
    p = str(tmp_path / "i.nkb")
    write_networkit_binary(g, p, edge_ids=True)
    g2 = read_networkit_binary(spark, p)
    got = sorted(
        (r["src"], r["dst"], r["edge_id"])
        for r in g2.edges.select("src", "dst", "edge_id").collect()
    )
    # canonical ids follow (src, dst) order (graph/tools.py edge_ids)
    assert got == [(0, 1, 0), (0, 2, 1), (1, 2, 2)]


def test_roundtrip_deleted_node(spark, tmp_path):
    # vertex 3 absent from the vertex set → written with flag 0,
    # removed on read (NetworkitBinaryReader.cpp:106-110)
    edges = [(0, 1), (1, 2), (2, 4)]
    g = Graph(
        Graph.from_edge_list(spark, edges, directed=False).edges,
        vertices=spark.range(5).filter("id <> 3").selectExpr("id"),
        directed=False,
    )
    p = str(tmp_path / "del.nkb")
    write_networkit_binary(g, p)
    g2 = read_networkit_binary(spark, p)
    assert sorted(r["id"] for r in g2.vertices.collect()) == [0, 1, 2, 4]
    assert _pairs(g2) == sorted(edges)


def test_roundtrip_multichunk_matches_singlechunk(spark, tmp_path):
    edges = [(u, v) for u in range(12) for v in range(u + 1, 12) if (u + v) % 3]
    g = Graph.from_edge_list(spark, edges, directed=False)
    p1, p4 = str(tmp_path / "c1.nkb"), str(tmp_path / "c4.nkb")
    write_networkit_binary(g, p1, chunks=1)
    write_networkit_binary(g, p4, chunks=4)
    assert _pairs(read_networkit_binary(spark, p1)) == sorted(edges)
    assert _pairs(read_networkit_binary(spark, p4)) == sorted(edges)


def test_roundtrip_empty_graph(spark, tmp_path):
    g = Graph(
        spark.createDataFrame([], "src BIGINT, dst BIGINT"),
        vertices=spark.range(3).selectExpr("id"),
        directed=False,
    )
    p = str(tmp_path / "e.nkb")
    write_networkit_binary(g, p)
    g2 = read_networkit_binary(spark, p)
    assert g2.edges.count() == 0
    assert sorted(r["id"] for r in g2.vertices.collect()) == [0, 1, 2]


def test_bad_magic_rejected(spark, tmp_path):
    p = str(tmp_path / "bad.nkb")
    with open(p, "wb") as f:
        f.write(b"nkbg999\x00" + b"\x00" * 88)
    with pytest.raises(ValueError, match="magic"):
        read_networkit_binary(spark, p)


# -- dispatch ---------------------------------------------------------------


def test_dispatch_guess_and_read(spark, tmp_path):
    from icebug_spark.sources.dispatch import (
        guess_file_format, read_graph, write_graph,
    )

    g = Graph.from_edge_list(spark, EDGES_U, directed=False)
    p = str(tmp_path / "g.nkb")
    write_graph(g, p)  # extension-dispatched
    assert guess_file_format(p) == "NetworkitBinary"
    g2 = read_graph(spark, p)  # magic-dispatched
    assert _pairs(g2) == sorted(EDGES_U)


def test_detect_weight_format_nan_inf_huge():
    """NaN/inf/|w|>=2^63 must fall to DOUBLE without attempting the
    (undefined, warning-raising) int64 cast."""
    import warnings

    import numpy as np

    from icebug_spark.sources.readers6 import (
        W_DOUBLE,
        W_FLOAT,
        W_VARINT,
        _detect_weight_format,
    )

    with warnings.catch_warnings():
        warnings.simplefilter("error")
        assert _detect_weight_format([1.0, float("nan")]) == W_DOUBLE
        # inf is losslessly float32-representable; the point is the
        # int64 probe is skipped (no invalid-cast warning under -W error)
        assert _detect_weight_format([float("inf")]) == W_FLOAT
        assert _detect_weight_format([2.0**63]) == W_FLOAT
        assert _detect_weight_format([2.0**63 + 4097.0]) == W_DOUBLE
        assert _detect_weight_format([1.0, 2.0]) == W_VARINT
