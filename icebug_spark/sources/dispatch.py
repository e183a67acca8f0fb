"""readGraph / writeGraph dispatch + file-format auto-detection.

Parity target: the reference's user-facing I/O entry points —
``Format`` enum (``networkit/graphio.pyx:1045-1090``), ``getReader``
dispatch table (``:1145-1168``), ``guessFileFormat`` heuristics
(``:1148-1308``: magic bytes for binaries, first-line probes for the
structured text formats, then the METIS/SNAP/edge-list scan), and
``readGraph(path, fileformat=None)`` / ``writeGraph``
(``:1310,1548``). A user of the reference calls ``nk.readGraph(path)``
and gets the right parser picked; this module is that call.

Formats are plain strings (the enum names); ``read_graph`` routes to
the sources/readers* modules. GEXF returns ``(Graph, events)`` exactly
like the reference's GEXFReader; every other format returns a Graph.
Extensions beyond the reference's guesser: MAT-5 files are detected by
their text header, and the engine's native parquet container by its
``_graph_meta.json`` sidecar.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import SparkSession

from icebug_spark.graph.core import Graph
from icebug_spark.sources import (
    readers, readers2, readers3, readers4, readers5, readers6,
)

#: supported format names (Format enum parity, graphio.pyx:1045)
FORMATS = [
    "SNAP", "EdgeListSpaceZero", "EdgeListSpaceOne", "EdgeListTabZero",
    "EdgeListTabOne", "EdgeListCommaOne", "EdgeList", "LFR", "METIS",
    "GraphML", "GEXF", "GML", "GraphViz", "DOT", "KONECT",
    "GraphToolBinary", "MAT", "ThrillBinary", "MatrixMarket", "RB",
    "NetworkitBinary", "Parquet",
]

_GT_MAGIC = bytes([0xE2, 0x9B, 0xBE, 0x20, 0x67, 0x74])


def guess_file_format(path: str) -> str:
    """guessFileFormat (``graphio.pyx:1148``): magic bytes first
    (graph-tool; MAT-5's text header as an extension; the parquet
    container by sidecar), then first-line probes for XML (GEXF /
    GraphML), GraphViz, GML, KONECT, MatrixMarket, the RB line-4
    Fortran-format shape, and finally the linear METIS / SNAP /
    edge-list scan with the reference's comment-prefix + separator +
    minId heuristics (incl. the METIS-vs-edge-list ambiguity error)."""
    if os.path.isdir(path):
        if os.path.exists(os.path.join(path, "_graph_meta.json")):
            return "Parquet"
        # Spark text-sink output (write_mtx / write_edge_list emit a
        # directory of part files): probe the first part lexically —
        # the single-partition header union puts it in part-00000
        parts = sorted(
            p for p in os.listdir(path) if p.startswith("part-")
        )
        if not parts:
            raise IOError(
                "Format guessing failed: directory without _graph_meta.json"
            )
        path = os.path.join(path, parts[0])
    with open(path, "rb") as f:
        head = f.read(128)
    if head[:6] == _GT_MAGIC:
        return "GraphToolBinary"
    if head[:7] in (b"nkbg002", b"nkbg003"):  # graphio.pyx:1167-1171
        return "NetworkitBinary"
    if head[:6] == b"MATLAB" and len(head) >= 128 and head[126:128] in (b"IM", b"MI"):
        return "MAT"

    try:
        text_head = head.decode("utf-8", errors="strict")
    except UnicodeDecodeError:
        raise IOError("Format guessing failed: unrecognized binary file")
    with open(path, "r") as f:
        lines = [f.readline() for _ in range(4)]
    first, second = lines[0], lines[1]
    del text_head
    if first.startswith("<?xml"):
        if second.lstrip().startswith("<gexf"):
            return "GEXF"
        if second.lstrip().startswith("<graphml"):
            return "GraphML"
    if re.match(r"^(strict)?\s?(di)?graph(\s.)*\s?{", first.lower()):
        return "GraphViz"
    if re.match(r"^graph\s*\[\s*$", first.lower()):
        return "GML"
    if re.match(
        r"^%\s((asym)|(sym)|(bip))\s((unweighted)|(positive)|(posweighted)|(signed)"
        r"|(multisigned)|(weighted)|(multiweighted)|(dynamic)|(multiposweighted))",
        first.lower(),
    ):
        return "KONECT"
    if re.match(r"%+MatrixMarket", first):
        return "MatrixMarket"
    if len(lines) >= 4 and re.match(
        r"^\(\d+[A-Z]\d+\)\s+\(\d+[A-Z]\d+\)", lines[3] or ""
    ):
        return "RB"
    return _guess_line_format(path)


def _guess_line_format(path: str) -> str:
    """The reference's linear METIS / SNAP / edge-list scan
    (``graphio.pyx:1213-1305``)."""
    with open(path) as f:
        all_lines = f.readlines()
    if not all_lines:
        raise IOError("Format guessing failed: empty file")
    comment = all_lines[0][0] if all_lines[0] else None
    if comment is None or comment.isnumeric():
        comment = None
    separator = None
    for line in all_lines:
        if comment and line.startswith(comment):
            continue
        m = re.search(r"^\d+(.)\d+", line)
        if m:
            separator = m.group(1)
    min_id = float("inf")
    snap = comment is None and separator in (" ", "\t")
    n = m_hdr = fmt = None
    noncomment = 0
    vals = 0
    for line in all_lines:
        if snap and not re.match(r"(^\d+\s\d+\s*$)|(^\s*$)", line):
            snap = False
        if comment and line.startswith(comment):
            continue
        # the reference skips a trailing blank line once all n node lines
        # are counted (graphio.pyx:1252) — without this a METIS file
        # ending in "\n" counts n+2 noncomment lines and fails detection
        if line == "\n" and n is not None and noncomment == n + 1:
            continue
        mm = re.search(r"^(\d+)\s(\d+)", line)
        if mm:
            min_id = min(min_id, int(mm.group(1)), int(mm.group(2)))
        if noncomment == 0:
            mm = re.match(r"\s*(\d+)\s+(\d+)(?:\s+(\d+))?(?:\s+(\d+))?", line)
            if mm:
                n, m_hdr = int(mm.group(1)), int(mm.group(2))
                if mm.group(3):
                    fmt = int(mm.group(3))
            else:
                break
        else:
            vals += len(re.findall(r"\d+(\.\d+)?", line))
        noncomment += 1
    metis = (
        n is not None
        and n == noncomment - 1
        and comment in ("%", None)
        and (
            (fmt in (None, 0) and m_hdr == vals / 2)
            or (fmt == 1 and m_hdr == vals / 4)
            or fmt in (10, 11)
        )
    )
    guess = None
    if comment == "#":
        if min_id == 0:
            guess = {"\t": "EdgeListTabZero", " ": "EdgeListSpaceZero"}.get(separator)
        else:
            guess = {
                "\t": "EdgeListTabOne",
                " ": "EdgeListSpaceOne",
                ",": "EdgeListCommaOne",
            }.get(separator)
    if snap:
        guess = "SNAP"
    if metis and guess:
        raise IOError("Format guessing failed: file could be METIS or edge list!")
    if guess:
        return guess
    if metis:
        return "METIS"
    raise IOError("Format guessing failed: no type found")


def read_graph(spark: SparkSession, path: str, fmt: str | None = None, **kwargs):
    """readGraph (``graphio.pyx:1310``): auto-detect when ``fmt`` is
    None, then dispatch. GEXF → (Graph, events DataFrame); every other
    format → Graph."""
    fmt = fmt or guess_file_format(path)
    el = lambda sep, first: readers.read_edge_list(  # noqa: E731
        spark, path, separator=sep, first_node=first, **kwargs
    )
    dispatch = {
        "METIS": lambda: readers.read_metis(spark, path),
        "GML": lambda: readers.read_gml(spark, path),
        "GraphML": lambda: readers4.read_graphml(spark, path),
        "GEXF": lambda: readers4.read_gexf(spark, path),
        "SNAP": lambda: readers2.read_snap(spark, path, **kwargs),
        "KONECT": lambda: readers2.read_konect(spark, path),
        "MatrixMarket": lambda: readers2.read_mtx(spark, path),
        "MAT": lambda: readers5.read_mat(spark, path, **kwargs),
        "RB": lambda: readers5.read_rb(spark, path),
        "GraphToolBinary": lambda: readers3.read_graphtool_binary(spark, path),
        "NetworkitBinary": lambda: readers6.read_networkit_binary(spark, path),
        "ThrillBinary": lambda: readers3.read_thrill_binary(spark, path),
        "Parquet": lambda: readers3.read_graph_parquet(spark, path),
        "EdgeList": lambda: readers.read_edge_list(spark, path, **kwargs),
        "EdgeListSpaceZero": lambda: el(" ", 0),
        "EdgeListSpaceOne": lambda: el(" ", 1),
        "EdgeListTabZero": lambda: el("\t", 0),
        "EdgeListTabOne": lambda: el("\t", 1),
        "EdgeListCommaOne": lambda: el(",", 1),
        "LFR": lambda: el("\t", 1),
    }
    if fmt not in dispatch:
        raise ValueError(f"unrecognized format/format not supported as input: {fmt}")
    return dispatch[fmt]()


def read_graphs(
    spark: SparkSession,
    dir_path: str,
    pattern: str,
    fmt: str | None = None,
    some: int | None = None,
    exclude: str | None = None,
    **kwargs,
) -> dict:
    """readGraphs (``graphio.pyx:1349``): walk ``dir_path``, read every
    file whose name fnmatches ``pattern`` (minus ``exclude``) with
    ``read_graph``; stop after ``some`` graphs. Returns {sequential id →
    Graph} like the reference (its graph_id counter)."""
    import fnmatch

    graphs: dict = {}
    graph_id = 0
    for root, _dirs, files in os.walk(dir_path):
        for file in sorted(files):  # deterministic across filesystems
            if not fnmatch.fnmatch(file, pattern):
                continue
            if exclude is not None and fnmatch.fnmatch(file, exclude):
                continue
            graphs[graph_id] = read_graph(
                spark, os.path.join(root, file), fmt, **kwargs
            )
            graph_id += 1
            if some and len(graphs) == some:
                return graphs
    return graphs


_EXT_TO_FMT = {
    ".graphml": "GraphML",
    ".gexf": "GEXF",
    ".gml": "GML",
    ".mtx": "MatrixMarket",
    ".mat": "MAT",
    ".rb": "RB",
    ".gt": "GraphToolBinary",
    ".nkb": "NetworkitBinary",
    ".nkbg": "NetworkitBinary",
    ".thrill": "ThrillBinary",
    ".metis": "METIS",
    ".graph": "METIS",
    ".dot": "DOT",
    ".gv": "DOT",
    ".snap": "SNAP",
    ".edgelist": "EdgeList",
    ".parquet": "Parquet",
}


def write_graph(g: Graph, path: str, fmt: str | None = None, **kwargs) -> None:
    """writeGraph (``graphio.pyx:1548``): dispatch a writer by format
    (or by extension when ``fmt`` is None — extension convenience the
    reference exposes through per-writer classes)."""
    if fmt is None:
        fmt = _EXT_TO_FMT.get(os.path.splitext(path)[1].lower())
        if fmt is None:
            raise ValueError(f"cannot infer format from extension: {path}")
    dispatch = {
        "METIS": lambda: readers.write_metis(g, path),
        "GML": lambda: readers3.write_gml(g, path),
        "GraphML": lambda: readers4.write_graphml(g, path, **kwargs),
        "GEXF": lambda: readers4.write_gexf(g, path, **kwargs),
        "SNAP": lambda: readers2.write_snap(g, path),
        "MatrixMarket": lambda: readers2.write_mtx(g, path),
        "MAT": lambda: readers5.write_mat(g, path, **kwargs),
        "RB": lambda: readers5.write_rb(g, path),
        "GraphToolBinary": lambda: readers3.write_graphtool_binary(g, path),
        "NetworkitBinary": lambda: readers6.write_networkit_binary(g, path, **kwargs),
        "ThrillBinary": lambda: readers3.write_thrill_binary(g, path),
        "Parquet": lambda: readers3.write_graph_parquet(g, path),
        "DOT": lambda: readers2.write_dot(g, path),
        "GraphViz": lambda: readers2.write_dot(g, path),
        "EdgeList": lambda: readers.write_edge_list(g, path, **kwargs),
        "EdgeListSpaceZero": lambda: readers.write_edge_list(g, path, " ", 0),
        "EdgeListSpaceOne": lambda: readers.write_edge_list(g, path, " ", 1),
        "EdgeListTabZero": lambda: readers.write_edge_list(g, path, "\t", 0),
        "EdgeListTabOne": lambda: readers.write_edge_list(g, path, "\t", 1),
        "EdgeListCommaOne": lambda: readers.write_edge_list(g, path, ",", 1),
    }
    if fmt not in dispatch:
        raise ValueError(f"unrecognized format/format not supported as output: {fmt}")
    dispatch[fmt]()
