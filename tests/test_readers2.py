"""I/O part 2: MTX, SNAP, KONECT, DOT, partition/cover files — write then
read back (round-trip) plus hand-written fixture parses."""

import os

import pytest
from pyspark.sql import functions as F

from icebug_spark.graph.core import Graph
from icebug_spark.sources import readers2


@pytest.fixture()
def tmpd(tmp_path):
    return str(tmp_path)


def _edges(spark, weighted=False):
    rows = [(0, 1, 2.0), (0, 2, 1.5), (1, 2, 3.0), (2, 3, 0.5)]
    if weighted:
        return spark.createDataFrame(rows, ["src", "dst", "weight"])
    return spark.createDataFrame([(a, b) for a, b, _ in rows], ["src", "dst"])


def test_mtx_roundtrip(spark, tmpd):
    g = Graph(_edges(spark, weighted=True), directed=False, weighted=True)
    p = os.path.join(tmpd, "g.mtx")
    readers2.write_mtx(g, p)
    g2 = readers2.read_mtx(spark, p)
    assert not g2.directed and g2.weighted
    got = sorted((r["src"], r["dst"], r["weight"]) for r in g2.edges.collect())
    assert got == [(0, 1, 2.0), (0, 2, 1.5), (1, 2, 3.0), (2, 3, 0.5)]


def test_mtx_pattern_fixture(spark, tmpd):
    p = os.path.join(tmpd, "pat.mtx")
    with open(p, "w") as f:
        f.write(
            "%%MatrixMarket matrix coordinate pattern symmetric\n"
            "% comment\n3 3 2\n1 2\n2 3\n"
        )
    g = readers2.read_mtx(spark, p)
    assert not g.weighted and not g.directed
    got = sorted((r["src"], r["dst"]) for r in g.edges.collect())
    assert got == [(0, 1), (1, 2)]


def test_snap_roundtrip_and_remap(spark, tmpd):
    p = os.path.join(tmpd, "snap.txt")
    with open(p, "w") as f:
        f.write("# Undirected graph\n# FromNodeId\tToNodeId\n10\t30\n30\t77\n10\t77\n")
    g = readers2.read_snap(spark, p)
    # ids remapped densely by sorted order: 10→0, 30→1, 77→2
    got = sorted((r["src"], r["dst"]) for r in g.edges.collect())
    assert got == [(0, 1), (0, 2), (1, 2)]
    out = os.path.join(tmpd, "snap_out")
    readers2.write_snap(g, out)
    g2 = readers2.read_snap(spark, out)
    assert sorted((r["src"], r["dst"]) for r in g2.edges.collect()) == got


def test_konect_weighted_fixture(spark, tmpd):
    p = os.path.join(tmpd, "k.konect")
    with open(p, "w") as f:
        f.write("% asym positive\n1 2 2.5\n2 3 1.0\n")
    g = readers2.read_konect(spark, p)
    assert g.directed and g.weighted
    got = sorted((r["src"], r["dst"], r["weight"]) for r in g.edges.collect())
    assert got == [(0, 1, 2.5), (1, 2, 1.0)]


def test_dot_writer(spark, tmpd):
    g = Graph(_edges(spark), directed=True, weighted=False)
    p = os.path.join(tmpd, "g.dot")
    readers2.write_dot(g, p)
    text = spark.read.text(p).collect()
    lines = {r["value"] for r in text}
    assert "digraph G {" in lines and "}" in lines
    assert "0 -> 1;" in lines and "2 -> 3;" in lines


def test_partition_roundtrip(spark, tmpd):
    part = spark.createDataFrame([(0, 5), (1, 5), (2, 7), (3, 7)], ["id", "subset"])
    p = os.path.join(tmpd, "part")
    readers2.write_partition(part, p)
    back = readers2.read_partition(spark, p)
    assert sorted((r["id"], r["subset"]) for r in back.collect()) == [
        (0, 5), (1, 5), (2, 7), (3, 7),
    ]


def test_edge_list_partition_reader(spark, tmpd):
    p = os.path.join(tmpd, "elp.txt")
    with open(p, "w") as f:
        f.write("# node subset\n1 0\n2 0\n3 1\n")
    df = readers2.read_edge_list_partition(spark, p, first_node=1)
    assert sorted((r["id"], r["subset"]) for r in df.collect()) == [
        (0, 0), (1, 0), (2, 1),
    ]


def test_cover_roundtrip(spark, tmpd):
    cover = spark.createDataFrame(
        [(0, 0), (1, 0), (1, 1), (2, 1)], ["id", "subset"]
    )
    p = os.path.join(tmpd, "cover")
    readers2.write_cover(cover, p)
    back = readers2.read_cover(spark, p)
    assert sorted((r["id"], r["subset"]) for r in back.collect()) == [
        (0, 0), (1, 0), (1, 1), (2, 1),
    ]
