"""Binary I/O round-trips: graph-tool gt, Thrill, DibaP, Raster, GML writer."""

import struct

import numpy as np

from icebug_spark.graph.core import Graph
from icebug_spark.sources import readers3
from icebug_spark.sources.readers import read_gml


EDGES_U = [(0, 1), (0, 2), (1, 2), (2, 4)]  # undirected, node 3 isolated
EDGES_D = [(0, 1), (1, 0), (1, 2), (4, 0)]  # directed


def test_graphtool_roundtrip_undirected(spark, tmp_path):
    g = Graph.from_edge_list(spark, EDGES_U, directed=False)
    p = str(tmp_path / "g.gt")
    readers3.write_graphtool_binary(g, p, comment="t")
    g2 = readers3.read_graphtool_binary(spark, p)
    assert not g2.directed
    got = sorted((r["src"], r["dst"]) for r in g2.edges.collect())
    assert got == sorted(EDGES_U)


def test_graphtool_roundtrip_directed(spark, tmp_path):
    g = Graph.from_edge_list(spark, EDGES_D, directed=True)
    p = str(tmp_path / "d.gt")
    readers3.write_graphtool_binary(g, p)
    g2 = readers3.read_graphtool_binary(spark, p)
    assert g2.directed
    got = sorted((r["src"], r["dst"]) for r in g2.edges.collect())
    assert got == sorted(EDGES_D)


def test_graphtool_width_boundary(spark, tmp_path):
    # n > 255 forces 2-byte adjacency ids
    edges = [(i, i + 1) for i in range(300)]
    g = Graph.from_edge_list(spark, edges, directed=False)
    p = str(tmp_path / "w.gt")
    readers3.write_graphtool_binary(g, p)
    g2 = readers3.read_graphtool_binary(spark, p)
    assert sorted((r["src"], r["dst"]) for r in g2.edges.collect()) == edges


def test_thrill_roundtrip(spark, tmp_path):
    g = Graph.from_edge_list(spark, EDGES_U, directed=False)
    p = str(tmp_path / "g.thrill")
    readers3.write_thrill_binary(g, p)
    g2 = readers3.read_thrill_binary(spark, p)
    got = sorted((r["src"], r["dst"]) for r in g2.edges.collect())
    assert got == sorted(EDGES_U)


def test_thrill_varint_large_degree(spark, tmp_path):
    # degree 200 > 127 exercises multi-byte varint
    edges = [(0, v) for v in range(1, 201)]
    g = Graph.from_edge_list(spark, edges, directed=False)
    p = str(tmp_path / "big.thrill")
    readers3.write_thrill_binary(g, p)
    g2 = readers3.read_thrill_binary(spark, p)
    assert g2.edges.count() == 200


def _write_dibap(path, V, offsets, to, weights=None, dvw=0, dxy=0, dew=1):
    with open(path, "wb") as f:
        f.write(struct.pack(">H", (ord("G") << 8) | ord("I")))
        f.write(struct.pack(">i", V))
        f.write(struct.pack(">i", dvw))
        f.write(np.asarray(offsets, dtype=">i4").tobytes())
        f.write(np.asarray(to, dtype=">i4").tobytes())
        f.write(struct.pack(">i", dew if weights is not None else 0))
        if weights is not None:
            f.write(np.asarray(weights, dtype=">i4").tobytes())
        f.write(struct.pack(">i", dxy))


def test_dibap_reader(spark, tmp_path):
    # triangle 0-1-2 plus 2-3, symmetric CSR
    offsets = [0, 2, 4, 7, 8]
    to = [1, 2, 0, 2, 0, 1, 3, 2]
    p = str(tmp_path / "g.dibap")
    _write_dibap(p, 4, offsets, to)
    g = readers3.read_dibap(spark, p)
    got = sorted((r["src"], r["dst"]) for r in g.edges.collect())
    assert got == [(0, 1), (0, 2), (1, 2), (2, 3)]
    assert not g.weighted


def test_dibap_weighted(spark, tmp_path):
    offsets = [0, 1, 2]
    to = [1, 0]
    p = str(tmp_path / "w.dibap")
    _write_dibap(p, 2, offsets, to, weights=[7, 7])
    g = readers3.read_dibap(spark, p)
    rows = g.edges.collect()
    assert len(rows) == 1 and rows[0]["weight"] == 7.0


def test_dibap_weighted_multidim(spark, tmp_path):
    """dew > 1: weights are edge-major (dew scalars per edge); the weight
    column must be dim 0 of each edge, not the first m2 raw scalars."""
    # path 0-1-2, symmetric CSR: arcs (0,1)(1,0)(1,2)(2,1)
    offsets = [0, 1, 3, 4]
    to = [1, 0, 2, 1]
    # per-arc weight pairs (dim0, dim1)
    weights = [7, 100, 7, 100, 9, 200, 9, 200]
    p = str(tmp_path / "w2.dibap")
    _write_dibap(p, 3, offsets, to, weights=weights, dew=2)
    g = readers3.read_dibap(spark, p)
    got = sorted((r["src"], r["dst"], r["weight"]) for r in g.edges.collect())
    assert got == [(0, 1, 7.0), (1, 2, 9.0)]


def test_raster_reader(spark, tmp_path):
    asc = (
        "ncols         3\n"
        "nrows         2\n"
        "xllcorner     0\n"
        "yllcorner     0\n"
        "cellsize      1\n"
        "NODATA_value  -9999\n"
        "2 0 1\n"
        "0 3 0\n"
    )
    p = tmp_path / "pop.asc"
    p.write_text(asc)
    pts = readers3.read_raster(spark, str(p), normalization_factor=1.0)
    rows = pts.collect()
    assert len(rows) == 6  # 2+1+3 points
    # cell (row 0, col 0) points lie in x∈[0,1), y∈[1,2) (row-flipped)
    in_c00 = [r for r in rows if 0 <= r["x"] < 1 and 1 <= r["y"] < 2]
    assert len(in_c00) == 2


def test_gml_writer_roundtrip(spark, tmp_path):
    g = Graph.from_edge_list(spark, EDGES_U, directed=False)
    p = str(tmp_path / "g.gml")
    readers3.write_gml(g, p)
    g2 = read_gml(spark, p)
    got = sorted((r["src"], r["dst"]) for r in g2.edges.collect())
    assert got == sorted(EDGES_U)
    gd = Graph.from_edge_list(spark, EDGES_D, directed=True)
    pd_ = str(tmp_path / "d.gml")
    readers3.write_gml(gd, pd_)
    assert read_gml(spark, pd_).directed


def test_graph_parquet_roundtrip(spark, tmp_path):
    g = Graph.from_edge_list(
        spark, [(0, 1, 2.5), (1, 2, 0.5)], directed=True, weighted=True
    )
    p = str(tmp_path / "gp")
    readers3.write_graph_parquet(g, p)
    g2 = readers3.read_graph_parquet(spark, p)
    assert g2.directed and g2.weighted
    assert sorted(map(tuple, g2.edges.select("src", "dst", "weight").collect())) == [
        (0, 1, 2.5), (1, 2, 0.5),
    ]
    gu = Graph.from_edge_list(spark, [(3, 4)], directed=False)
    pu = str(tmp_path / "gu")
    readers3.write_graph_parquet(gu, pu)
    g3 = readers3.read_graph_parquet(spark, pu)
    assert not g3.directed and not g3.weighted
