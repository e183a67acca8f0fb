"""Graph file I/O part 3: binary formats + GML writer.

Parity targets (reference io/):
- GraphToolBinaryReader/Writer ``io/GraphToolBinaryReader.hpp:22`` /
  ``GraphToolBinaryWriter.hpp:24`` — graph-tool ``gt`` container
  (adjacency subset; property maps after the adjacency block are ignored,
  exactly like the reference).
- ThrillGraphBinaryReader/Writer ``io/ThrillGraphBinaryReader.hpp:20`` /
  ``ThrillGraphBinaryWriter.hpp:19`` — varint out-degree + uint32-LE
  neighbor stream.
- DibapGraphReader ``io/DibapGraphReader.hpp:24`` — big-endian 'GI' CSR.
- RasterReader ``io/RasterReader.hpp:21`` — ESRI ASCII grid → point set.
- GMLGraphWriter ``io/GMLGraphWriter.hpp:17``.

These binary containers are inherently single-stream (varint/CSR records
have sequential byte dependencies), so the byte walk happens driver-side
with numpy-vectorized slicing where possible and the resulting edge array
is handed to Spark via Arrow. At 100 TB you would not serve these formats
directly — the ingest story is "convert once to Parquet" (this module is
that converter); every downstream operator then scans columnar splits.
"""

from __future__ import annotations

import os
import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from icebug_spark.graph.core import Graph

_GT_MAGIC = bytes([0xE2, 0x9B, 0xBE, 0x20, 0x67, 0x74])  # "⛾ gt"


def _adjacency_width(n: int) -> int:
    if n < 1 << 8:
        return 1
    if n < 1 << 16:
        return 2
    if n < 1 << 32:
        return 4
    return 8


def _edges_df(spark: SparkSession, src: list[int], dst: list[int]) -> DataFrame:
    pdf = pd.DataFrame({"src": np.asarray(src, dtype=np.int64),
                        "dst": np.asarray(dst, dtype=np.int64)})
    if len(pdf) == 0:
        return spark.createDataFrame([], "src BIGINT, dst BIGINT")
    return spark.createDataFrame(pdf)


# ---------------------------------------------------------------------------
# graph-tool binary (gt)
# ---------------------------------------------------------------------------


def read_graphtool_binary(spark: SparkSession, path: str) -> Graph:
    """graph-tool binary container (``io/GraphToolBinaryReader.hpp:22``):
    magic ⟨e2 9b be 20 67 74⟩, version 0x01, endianness byte, 8-byte
    comment length + comment, directed byte, 8-byte n, then per node an
    8-byte out-degree and width(n)-byte neighbor ids. Property maps after
    the adjacency block are ignored (reference behavior)."""
    with open(path, "rb") as f:
        buf = f.read()
    if buf[:6] != _GT_MAGIC or buf[6] != 0x01:
        raise ValueError("broken graph-tool header")
    if buf[7] not in (0x00, 0x01):
        raise ValueError("bad endianness byte")
    bo = "<" if buf[7] == 0x00 else ">"
    pos = 8
    (clen,) = struct.unpack_from(f"{bo}Q", buf, pos)
    pos += 8 + clen
    directed = buf[pos] == 0x01
    pos += 1
    (n,) = struct.unpack_from(f"{bo}Q", buf, pos)
    pos += 8
    width = _adjacency_width(n)
    wfmt = {1: "B", 2: "H", 4: "I", 8: "Q"}[width]
    src: list[int] = []
    dst: list[int] = []
    for u in range(n):
        (deg,) = struct.unpack_from(f"{bo}Q", buf, pos)
        pos += 8
        if deg:
            nbrs = np.frombuffer(buf, dtype=f"{bo}{wfmt}", count=deg, offset=pos)
            pos += deg * width
            src.extend([u] * deg)
            dst.extend(int(v) for v in nbrs)
    vertices = spark.range(n).select(F.col("id"))
    return Graph(_edges_df(spark, src, dst), vertices=vertices, directed=directed)


def write_graphtool_binary(g: Graph, path: str, comment: str = "") -> None:
    """Writer twin (``io/GraphToolBinaryWriter.hpp:24``), little-endian.
    Undirected graphs store each edge once on the lower endpoint's list
    (the reference writes u's list with neighbors v >= u)."""
    edges = [(r["src"], r["dst"]) for r in g.edges.select("src", "dst").collect()]
    n = max((max(u, v) for u, v in edges), default=-1) + 1
    adj: list[list[int]] = [[] for _ in range(n)]
    if g.directed:
        for u, v in edges:
            adj[u].append(v)
    else:
        for u, v in edges:
            a, b = (u, v) if u <= v else (v, u)
            adj[a].append(b)
    width = _adjacency_width(n)
    wfmt = {1: "B", 2: "H", 4: "I", 8: "Q"}[width]
    cb = comment.encode()
    with open(path, "wb") as f:
        f.write(_GT_MAGIC + bytes([0x01, 0x00]))
        f.write(struct.pack("<Q", len(cb)) + cb)
        f.write(bytes([0x01 if g.directed else 0x00]))
        f.write(struct.pack("<Q", n))
        for u in range(n):
            f.write(struct.pack("<Q", len(adj[u])))
            for v in adj[u]:
                f.write(struct.pack(f"<{wfmt}", v))


# ---------------------------------------------------------------------------
# Thrill binary
# ---------------------------------------------------------------------------


def _varint_encode(x: int) -> bytes:
    out = bytearray()
    while True:
        b = x & 0x7F
        x >>= 7
        if x:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def read_thrill_binary(spark: SparkSession, path: str) -> Graph:
    """Thrill binary (``io/ThrillGraphBinaryReader.hpp:20``): for node
    u = 0,1,2,… a varint out-degree followed by that many uint32-LE
    neighbor ids; undirected half-edges (u listed with v in u's record
    when u <= v, per the writer)."""
    with open(path, "rb") as f:
        buf = f.read()
    pos, u = 0, 0
    src: list[int] = []
    dst: list[int] = []
    end = len(buf)
    while pos < end:
        deg = 0
        shift = 0
        while True:
            byte = buf[pos]
            pos += 1
            deg |= (byte & 0x7F) << shift
            if not byte & 0x80:
                break
            shift += 7
        if deg:
            nbrs = np.frombuffer(buf, dtype="<u4", count=deg, offset=pos)
            pos += 4 * deg
            src.extend([u] * deg)
            dst.extend(int(v) for v in nbrs)
        u += 1
    return Graph(_edges_df(spark, src, dst), directed=False)


def write_thrill_binary(g: Graph, path: str) -> None:
    """Writer twin (``io/ThrillGraphBinaryWriter.hpp:19``): half-edges on
    the lower endpoint, uint32-LE ids, varint degrees. Every node up to
    max id gets a record (possibly degree 0)."""
    edges = [(r["src"], r["dst"]) for r in g.edges.select("src", "dst").collect()]
    n = max((max(u, v) for u, v in edges), default=-1) + 1
    adj: list[list[int]] = [[] for _ in range(n)]
    for u, v in edges:
        a, b = (u, v) if u <= v else (v, u)
        adj[a].append(b)
    with open(path, "wb") as f:
        for u in range(n):
            f.write(_varint_encode(len(adj[u])))
            for v in adj[u]:
                f.write(struct.pack("<I", v))


# ---------------------------------------------------------------------------
# DibaP
# ---------------------------------------------------------------------------


def read_dibap(spark: SparkSession, path: str) -> Graph:
    """DibaP 'GI' container (``io/DibapGraphReader.hpp:24``): big-endian
    int32 CSR — V, dvw, vw[V·dvw], offsets[V+1], to[m2], dew,
    ew[m2·dew], dxy, float32 coords[V·dxy]. Undirected: an arc (v, to)
    is materialized once for v <= to, weighted when dew > 0."""
    with open(path, "rb") as f:
        buf = f.read()
    (magic,) = struct.unpack_from(">H", buf, 0)
    if magic != (ord("G") << 8 | ord("I")):
        raise ValueError("not a DibaP GI file")
    pos = 2
    (V,) = struct.unpack_from(">i", buf, pos)
    pos += 4
    (dvw,) = struct.unpack_from(">i", buf, pos)
    pos += 4
    pos += 4 * V * dvw  # vertex weights (unused, like the reference)
    of = np.frombuffer(buf, dtype=">i4", count=V + 1, offset=pos).astype(np.int64)
    pos += 4 * (V + 1)
    m2 = int(of[V])
    to = np.frombuffer(buf, dtype=">i4", count=m2, offset=pos).astype(np.int64)
    pos += 4 * m2
    (dew,) = struct.unpack_from(">i", buf, pos)
    pos += 4
    ew = None
    if dew > 0:
        ew = np.frombuffer(buf, dtype=">i4", count=m2 * dew, offset=pos).astype(np.float64)
        pos += 4 * m2 * dew
    # vectorized CSR expand
    deg = np.diff(of)
    src = np.repeat(np.arange(V, dtype=np.int64), deg)
    keep = src <= to
    pdf = pd.DataFrame({"src": src[keep], "dst": to[keep]})
    if ew is not None:
        # dew scalars per edge, edge-major: take dim 0 of each edge.
        # INTENTIONAL DIVERGENCE from the reference for dew > 1: the
        # reference indexes ew[e] FLAT (DibapGraphReader.cpp addEdge
        # loop), which under an edge-major file layout reads dim
        # (e % dew) of edge (e / dew) — i.e. it mispairs weights whenever
        # dew > 1. We read dim 0 of edge e instead; for dew == 1 (every
        # graph the reference's own tests ship) the two are identical.
        pdf["weight"] = ew.reshape(m2, dew)[:, 0][keep]
    if len(pdf) == 0:
        schema = "src BIGINT, dst BIGINT" + (", weight DOUBLE" if ew is not None else "")
        df = spark.createDataFrame([], schema)
    else:
        df = spark.createDataFrame(pdf)
    return Graph(df, directed=False, weighted=ew is not None)


# ---------------------------------------------------------------------------
# Raster (ESRI ASCII grid → point set)
# ---------------------------------------------------------------------------


def read_raster(
    spark: SparkSession, path: str, normalization_factor: float = 1.0, seed: int = 5
) -> DataFrame:
    """RasterReader (``io/RasterReader.hpp:21``): ESRI ASCII population
    grid; each cell spawns round(value · normalizationFactor) points
    uniformly inside the cell square. Returns (x, y) points — feed into a
    geometric generator. Header parse is driver-side; the cell → points
    fan-out is a distributed explode over a seeded spark.range (the grid
    itself ships as a broadcast-sized literal DataFrame)."""
    with open(path) as f:
        lines = f.read().splitlines()
    ncols = int(float(lines[0][14:].strip() or lines[0].split()[-1]))
    nrows = int(float(lines[1][14:].strip() or lines[1].split()[-1]))
    grid_rows = []
    for r, line in enumerate(lines[6 : 6 + nrows]):
        vals = line.split()
        for c, v in enumerate(vals[:ncols]):
            k = int(round(float(v) * normalization_factor))
            if k > 0:
                grid_rows.append((r, c, k))
    if not grid_rows:
        return spark.createDataFrame([], "x DOUBLE, y DOUBLE")
    cells = spark.createDataFrame(grid_rows, ["row", "col", "k"])
    pts = cells.select(
        "row", "col", F.explode(F.sequence(F.lit(1), F.col("k"))).alias("i")
    )
    # reference maps row r to the y-band [1-(r+1)·δ, 1-r·δ] with δ=1 (unit
    # cells): keep the same row-flip orientation at unit cell size
    ux = F.pmod(F.xxhash64("row", "col", "i", F.lit(seed)), F.lit(1_000_000_007)).cast(
        "double"
    ) / 1_000_000_007.0
    uy = F.pmod(
        F.xxhash64("row", "col", "i", F.lit(seed + 1)), F.lit(1_000_000_007)
    ).cast("double") / 1_000_000_007.0
    return pts.select(
        (F.col("col") + ux).alias("x"),
        (F.lit(float(nrows)) - F.col("row") - 1 + uy).alias("y"),
    )


# ---------------------------------------------------------------------------
# GML writer
# ---------------------------------------------------------------------------


def write_gml(g: Graph, path: str) -> None:
    """GMLGraphWriter (``io/GMLGraphWriter.hpp:17``): graph [ directed D
    node [ id N ] … edge [ source U target V ] … ]. Round-trips with
    readers.read_gml."""
    edges = sorted(
        (r["src"], r["dst"]) for r in g.edges.select("src", "dst").collect()
    )
    nodes = sorted({u for e in edges for u in e})
    with open(path, "w") as f:
        f.write("graph [\n")
        if g.directed:
            f.write("  directed 1\n")
        for u in nodes:
            f.write(f"  node [ id {u} ]\n")
        for u, v in edges:
            f.write(f"  edge [ source {u} target {v} ]\n")
        f.write("]\n")


# ---------------------------------------------------------------------------
# Native graph container (parquet) — the NetworkitBinary role
# ---------------------------------------------------------------------------


def write_graph_parquet(g: Graph, path: str, mode: str = "overwrite") -> None:
    """The engine's NATIVE graph format (the role NetworkitBinary plays in
    the reference, ``io/NetworkitBinaryWriter.hpp`` — SURVEY §2.14 maps it
    to Parquet): edges as a partitioned-by-src parquet dataset (so reads
    co-locate per-source adjacency and scans prune on src), plus a
    ``_graph_meta.json`` sidecar carrying the directed/weighted flags.
    This is the artifact a 100 TB deployment persists once and every
    analysis scans."""
    import json

    cols = ["src", "dst"] + (["weight"] if g.weighted else [])
    (
        g.edges.select(*cols)
        .repartition("src")
        .sortWithinPartitions("src", "dst")
        .write.mode(mode)
        .parquet(path)
    )
    with open(os.path.join(path, "_graph_meta.json"), "w") as f:
        json.dump({"directed": g.directed, "weighted": g.weighted, "version": 1}, f)


def read_graph_parquet(spark: SparkSession, path: str) -> Graph:
    """Reader twin: restores flags from the sidecar; columnar scan with
    predicate pushdown on src comes free from the parquet layout."""
    import json

    with open(os.path.join(path, "_graph_meta.json")) as f:
        meta = json.load(f)
    df = spark.read.parquet(path)
    return Graph(df, directed=meta["directed"], weighted=meta["weighted"])
