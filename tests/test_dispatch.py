"""readGraph / writeGraph dispatch + guessFileFormat heuristics
(sources/dispatch.py; reference graphio.pyx:1045-1310,1548)."""

import pytest

from icebug_spark.graph.core import Graph
from icebug_spark.sources import dispatch

EDGES = [(0, 1), (0, 2), (1, 2), (2, 3)]


def _pairs(g):
    return sorted((r["src"], r["dst"]) for r in g.edges.select("src", "dst").collect())


@pytest.mark.parametrize(
    "fmt,fname",
    [
        ("GraphML", "g.graphml"),
        ("GEXF", "g.gexf"),
        ("MAT", "g.mat"),
        ("RB", "g.rb"),
        ("GraphToolBinary", "g.gt"),
        ("MatrixMarket", "g.mtx"),
        ("METIS", "g.metis"),
        ("GML", "g.gml"),
    ],
)
def test_write_guess_read_roundtrip(spark, tmp_path, fmt, fname):
    """write_graph by extension → guess_file_format recovers the format
    → read_graph(auto) round-trips the structure."""
    g = Graph.from_edge_list(spark, EDGES, directed=False)
    p = str(tmp_path / fname)
    dispatch.write_graph(g, p)
    assert dispatch.guess_file_format(p) == fmt
    out = dispatch.read_graph(spark, p)
    g2 = out[0] if isinstance(out, tuple) else out  # GEXF → (graph, events)
    assert _pairs(g2) == EDGES


def test_guess_edge_list_variants(spark, tmp_path):
    p = tmp_path / "el.txt"
    p.write_text("# comment\n1 2\n2 3\n")
    assert dispatch.guess_file_format(str(p)) == "EdgeListSpaceOne"
    p2 = tmp_path / "el0.txt"
    p2.write_text("# c\n0\t1\n1\t2\n")
    assert dispatch.guess_file_format(str(p2)) == "EdgeListTabZero"
    g = dispatch.read_graph(spark, str(p2))
    assert _pairs(g) == [(0, 1), (1, 2)]


def test_guess_snap(spark, tmp_path):
    p = tmp_path / "s.txt"
    p.write_text("0 1\n1 2\n\n2 3\n")
    assert dispatch.guess_file_format(str(p)) == "SNAP"


def test_guess_parquet_container(spark, tmp_path):
    from icebug_spark.sources.readers3 import write_graph_parquet

    g = Graph.from_edge_list(spark, EDGES, directed=False)
    p = str(tmp_path / "gp")
    write_graph_parquet(g, p)
    assert dispatch.guess_file_format(p) == "Parquet"
    assert _pairs(dispatch.read_graph(spark, p)) == EDGES


def test_unknown_format_raises(spark, tmp_path):
    p = tmp_path / "junk.bin"
    p.write_bytes(bytes([0xFF, 0xFE, 0x00, 0x01] * 8))
    with pytest.raises(IOError):
        dispatch.guess_file_format(str(p))
    with pytest.raises(ValueError):
        dispatch.read_graph(spark, str(p), fmt="NoSuch")


def test_guess_metis_trailing_blank_line(spark, tmp_path):
    """graphio.pyx:1252: one trailing blank line after the n node lines
    is skipped, so detection still sees n+1 noncomment lines."""
    p = tmp_path / "t.metis"
    p.write_text("3 2\n2 3\n1\n1\n\n")
    assert dispatch.guess_file_format(str(p)) == "METIS"


def test_read_graphs_directory_batch(spark, tmp_path):
    """readGraphs parity (graphio.pyx:1349): fnmatch pattern + exclude +
    some cap over a directory walk, sequential integer keys."""
    from icebug_spark.graph.core import Graph
    from icebug_spark.sources.dispatch import read_graphs, write_graph

    for i in range(3):
        g = Graph.from_edge_list(spark, [(0, i + 1)], directed=False)
        write_graph(g, str(tmp_path / f"g{i}.nkb"))
    write_graph(
        Graph.from_edge_list(spark, [(0, 9)], directed=False),
        str(tmp_path / "skip.nkb"),
    )
    got = read_graphs(spark, str(tmp_path), "*.nkb", exclude="skip*")
    assert sorted(got) == [0, 1, 2]
    all_edges = sorted(
        tuple(r) for k in got for r in got[k].edges.select("src", "dst").collect()
    )
    assert all_edges == [(0, 1), (0, 2), (0, 3)]
    capped = read_graphs(spark, str(tmp_path), "*.nkb", some=2)
    assert len(capped) == 2
