"""Graph file I/O part 5: Matlab MAT (Level 5) adjacency and
Rutherford-Boeing sparse-matrix files.

Parity targets:
- MatReader / readMat / MatWriter (reference Python surface,
  ``networkit/graphio.pyx:1390,1423,1454`` — ``Format.MAT`` dispatch at
  ``:1124``): the matrix under ``key`` (default ``'G'``) is an adjacency
  matrix; must be square; every nonzero (u, v) becomes an undirected,
  unweighted edge added once (``readMat``'s hasEdge guard ≡ canonical
  distinct). The reference shells the byte work to ``scipy.io`` — scipy
  is not in this container, so the MAT-5 container walk (header, tagged
  data elements, miMATRIX with dense or sparse-CSC payload, zlib
  miCOMPRESSED) is implemented directly; layout per the public
  "MAT-File Format" specification.
- RBGraphReader (``io/RBGraphReader.hpp:23``, parse loop
  ``io/RBMatrixReader.cpp:35-133``): 4-line header, whitespace-separated
  1-indexed CSC arrays; real/integer/pattern, assembled only; symmetric
  ⇒ undirected (triangular storage), else directed arcs (row → col);
  weighted unless pattern-only. ``write_rb`` is the convenience twin
  (the reference ships no RB writer).

Like readers3/4: convert-once ingest formats — byte/text walk
driver-side, edges to Spark via Arrow, persist as parquet for scale.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from icebug_spark.graph.core import Graph

# MAT-5 data types
_MI_INT8, _MI_UINT8, _MI_INT16, _MI_UINT16 = 1, 2, 3, 4
_MI_INT32, _MI_UINT32, _MI_SINGLE, _MI_DOUBLE = 5, 6, 7, 9
_MI_INT64, _MI_UINT64, _MI_MATRIX, _MI_COMPRESSED = 12, 13, 14, 15
_MI_DTYPES = {
    _MI_INT8: "i1", _MI_UINT8: "u1", _MI_INT16: "i2", _MI_UINT16: "u2",
    _MI_INT32: "i4", _MI_UINT32: "u4", _MI_SINGLE: "f4", _MI_DOUBLE: "f8",
    _MI_INT64: "i8", _MI_UINT64: "u8",
}
_MX_SPARSE = 5  # mxSPARSE_CLASS; numeric classes are 6..15


def _iter_elements(buf: bytes, pos: int, end: int):
    """Yield (mi_type, payload) MAT-5 data elements, handling the
    small-data-element packing (type and length share the first word)."""
    while pos + 8 <= end:
        (word,) = struct.unpack_from("<I", buf, pos)
        small_len = word >> 16
        if small_len:  # small data element: 4-byte tag, 4-byte data
            yield word & 0xFFFF, buf[pos + 4 : pos + 4 + small_len]
            pos += 8
        else:
            (nbytes,) = struct.unpack_from("<I", buf, pos + 4)
            yield word, buf[pos + 8 : pos + 8 + nbytes]
            pos += 8 + nbytes + (-nbytes % 8)


def _parse_matrix(payload: bytes):
    """miMATRIX payload → (name, dense ndarray | (n, m, coo rows, cols))."""
    els = list(_iter_elements(payload, 0, len(payload)))
    flags = np.frombuffer(els[0][1][:8], dtype="<u4")
    mx_class = int(flags[0] & 0xFF)
    dims = np.frombuffer(els[1][1], dtype="<i4")
    name = bytes(els[2][1]).decode()
    if mx_class == _MX_SPARSE:
        ir = np.frombuffer(els[3][1], dtype="<i4").astype(np.int64)
        jc = np.frombuffer(els[4][1], dtype="<i4").astype(np.int64)
        # pr values are only needed for the nonzero PATTERN — readMat
        # ignores values (unweighted parity); explicit zeros are rare
        # and scipy's nonzero() would drop them, so keep all stored ir.
        ncols = int(dims[1])
        cols = np.repeat(np.arange(ncols, dtype=np.int64), np.diff(jc[: ncols + 1]))
        return name, (int(dims[0]), ncols, ir[: len(cols)], cols)
    dt = _MI_DTYPES.get(els[3][0])
    if dt is None:
        raise ValueError(f"unsupported MAT numeric type {els[3][0]}")
    a = np.frombuffer(els[3][1], dtype=f"<{dt}")
    return name, a.reshape(int(dims[1]), int(dims[0])).T  # column-major


def read_mat(spark: SparkSession, path: str, key: str = "G") -> Graph:
    """readMat (``graphio.pyx:1423``): load the matrix stored under
    ``key``, require it square, add an undirected unweighted edge per
    nonzero (u, v) — the hasEdge guard collapses symmetric duplicates,
    ≡ canonical (min, max) distinct. All n nodes exist (``Graph(n)``)."""
    with open(path, "rb") as f:
        buf = f.read()
    if len(buf) < 128 or buf[124:126] != b"\x00\x01" or buf[126:128] != b"IM":
        raise ValueError(f"{path}: not a little-endian MAT-5 file")
    found = None
    for mi, payload in _iter_elements(buf, 128, len(buf)):
        if mi == _MI_COMPRESSED:
            payload = zlib.decompress(bytes(payload))
            mi, payload = next(_iter_elements(payload, 0, len(payload)))
        if mi != _MI_MATRIX:
            continue
        name, mat = _parse_matrix(bytes(payload))
        if name == key:
            found = mat
            break
    if found is None:
        raise KeyError(f"Key {key} not found in the matlab object file")
    if isinstance(found, tuple):
        n, m, rows, cols = found
    else:
        n, m = found.shape
        rows, cols = np.nonzero(found)
    if n != m:
        raise ValueError(f"this ({n}x{m}) matrix is not square")
    pdf = pd.DataFrame(
        {
            "src": np.minimum(rows, cols).astype(np.int64),
            "dst": np.maximum(rows, cols).astype(np.int64),
        }
    ).drop_duplicates()
    edges = (
        spark.createDataFrame([], "src BIGINT, dst BIGINT")
        if len(pdf) == 0
        else spark.createDataFrame(pdf)
    )
    vertices = spark.range(n).select(F.col("id"))
    return Graph(edges, vertices=vertices, directed=False, weighted=False)


def _mat_element(mi: int, data: bytes) -> bytes:
    pad = -len(data) % 8
    return struct.pack("<II", mi, len(data)) + data + b"\x00" * pad


def write_mat(g: Graph, path: str, key: str = "G") -> None:
    """MatWriter (``graphio.pyx:1454``): the graph's dense double
    adjacency matrix (symmetric for undirected graphs, weights if any)
    stored under ``key`` as an uncompressed MAT-5 miMATRIX."""
    ecols = ["src", "dst"] + (["weight"] if g.weighted else [])
    edges = [tuple(r) for r in g.edges.select(*ecols).collect()]
    nv = [r["id"] for r in g.vertices.select("id").collect()]
    n = max(nv, default=-1) + 1
    a = np.zeros((n, n), dtype=np.float64)
    for e in edges:
        w = float(e[2]) if g.weighted else 1.0
        a[int(e[0]), int(e[1])] = w
        if not g.directed:
            a[int(e[1]), int(e[0])] = w
    name = key.encode()
    body = (
        _mat_element(_MI_UINT32, struct.pack("<II", 6, 0))  # mxDOUBLE flags
        + _mat_element(_MI_INT32, struct.pack("<ii", n, n))
        + _mat_element(_MI_INT8, name)
        + _mat_element(_MI_DOUBLE, a.T.tobytes())  # column-major
    )
    header = b"MATLAB 5.0 MAT-file, created by icebug_spark".ljust(116) + b"\x00" * 8
    with open(path, "wb") as f:
        f.write(header + b"\x00\x01" + b"IM")
        f.write(_mat_element(_MI_MATRIX, body))


# ---------------------------------------------------------------------------
# Rutherford-Boeing
# ---------------------------------------------------------------------------


def read_rb(spark: SparkSession, path: str) -> Graph:
    """RBGraphReader (``io/RBGraphReader.hpp:23``): header line 2 gives
    the pointer/index/value line counts, line 3 the 3-char format
    ([rip][s…][a]) and matrix shape; data are whitespace-separated
    1-indexed CSC arrays (``RBMatrixReader.cpp:35-133``). Square
    required; symmetric ⇒ undirected graph from the stored triangle,
    else directed arcs (rowindex, col); weighted unless pattern-only."""
    with open(path) as f:
        lines = f.read().splitlines()
    hdr2 = lines[1].split()
    n_ptr, n_idx, n_val = int(hdr2[1]), int(hdr2[2]), int(hdr2[3])
    hdr3 = lines[2].split()
    fmt = hdr3[0].lower()
    nrow, ncol = int(hdr3[1]), int(hdr3[2])
    if fmt[0] not in "rip":
        raise ValueError("only real, integer, and pattern formats are supported")
    pattern = fmt[0] == "p"
    symmetric = fmt[1] == "s"
    if fmt[2] != "a":
        raise ValueError("only compressed column (assembled) format is supported")
    if nrow != ncol:
        raise ValueError("File does not contain a square matrix")
    data_lines = lines[4:]
    ptr_txt = " ".join(data_lines[:n_ptr])
    idx_txt = " ".join(data_lines[n_ptr : n_ptr + n_idx])
    val_txt = " ".join(data_lines[n_ptr + n_idx : n_ptr + n_idx + n_val])
    pointers = np.array(ptr_txt.split(), dtype=np.int64) - 1
    rowindex = np.array(idx_txt.split(), dtype=np.int64) - 1
    values = (
        np.array(val_txt.split(), dtype=np.float64) if not pattern else None
    )
    deg = np.diff(pointers[: ncol + 1])
    cols = np.repeat(np.arange(ncol, dtype=np.int64), deg)
    src, dst = rowindex[: len(cols)], cols
    weighted = not pattern
    directed = not symmetric
    if not directed:
        lo, hi = np.minimum(src, dst), np.maximum(src, dst)
        src, dst = lo, hi
    data = {"src": src.astype(np.int64), "dst": dst.astype(np.int64)}
    if weighted:
        data["weight"] = values[: len(cols)]
    pdf = pd.DataFrame(data).drop_duplicates(subset=["src", "dst"])
    schema = "src BIGINT, dst BIGINT" + (", weight DOUBLE" if weighted else "")
    edges = (
        spark.createDataFrame([], schema)
        if len(pdf) == 0
        else spark.createDataFrame(pdf)
    )
    vertices = spark.range(ncol).select(F.col("id"))
    return Graph(edges, vertices=vertices, directed=directed, weighted=weighted)


def write_rb(g: Graph, path: str, title: str = "icebug_spark graph") -> None:
    """Convenience twin for :func:`read_rb` (the reference ships only a
    reader): emits assembled CSC, ``rsa``/``psa`` for undirected graphs
    (lower-triangle-of-the-symmetric-matrix storage ≡ the canonical
    src<=dst arc with row >= col), ``rua``/``pua`` for directed."""
    ecols = ["src", "dst"] + (["weight"] if g.weighted else [])
    edges = [tuple(r) for r in g.edges.select(*ecols).collect()]
    nv = [r["id"] for r in g.vertices.select("id").collect()]
    n = max(nv, default=-1) + 1
    # CSC: column = dst for directed arcs; for undirected store (hi, lo)
    # so the row index >= column index (triangular storage)
    entries = []
    for e in edges:
        u, v = int(e[0]), int(e[1])
        w = float(e[2]) if g.weighted else None
        if g.directed:
            entries.append((v, u, w))  # col, row
        else:
            lo, hi = min(u, v), max(u, v)
            entries.append((lo, hi, w))  # col=lo, row=hi
    entries.sort()
    cols = np.array([c for c, _, _ in entries], dtype=np.int64)
    rows = np.array([r for _, r, _ in entries], dtype=np.int64)
    ptrs = np.zeros(n + 1, dtype=np.int64)
    np.add.at(ptrs, cols + 1, 1)
    ptrs = np.cumsum(ptrs)
    fmt = ("p" if not g.weighted else "r") + ("u" if g.directed else "s") + "a"

    def chunks(vals, per, f):
        return [" ".join(f(v) for v in vals[i : i + per]) for i in range(0, len(vals), per)]

    ptr_lines = chunks(ptrs + 1, 8, str)
    idx_lines = chunks(rows + 1, 8, str)
    val_lines = (
        chunks([w for _, _, w in entries], 4, lambda x: f"{x:.8E}")
        if g.weighted
        else []
    )
    with open(path, "w") as f:
        f.write(f"{title}\n")
        f.write(
            f"{len(ptr_lines) + len(idx_lines) + len(val_lines)} "
            f"{len(ptr_lines)} {len(idx_lines)} {len(val_lines)}\n"
        )
        f.write(f"{fmt} {n} {n} {len(entries)} 0\n")
        f.write("(8I10) (8I10) (4E20.8)\n")
        for ln in ptr_lines + idx_lines + val_lines:
            f.write(ln + "\n")


__all__ = ["read_mat", "write_mat", "read_rb", "write_rb"]
