"""Binary partition / cover sidecar I/O — the reference's remaining
io/ module formats:

- :func:`write_binary_partition` / :func:`read_binary_partition` —
  ``io/BinaryPartitionWriter.cpp:17`` / ``BinaryPartitionReader.cpp:13``:
  one fixed-width (4 or 8 byte) little-endian subset id per node, node
  ids implicit 0..n−1 in file order.
- :func:`write_binary_edge_list_partition` /
  :func:`read_binary_edge_list_partition` —
  ``io/BinaryEdgeListPartitionWriter.cpp:10`` / ``...Reader.cpp:12``:
  little-endian (node+firstNode, subset) pairs; the reader accepts a
  list of files concatenated in order (the reference's multi-file path).
- :func:`read_edge_list_cover` — ``io/EdgeListCoverReader.cpp:11``:
  text lines ``v c1 c2 ...`` (firstNode offset on v, '#' comments).
- :func:`read_snap_edge_list_partition` —
  ``io/SNAPEdgeListPartitionReader.cpp:14``: each line lists one
  community's members; the community id is the 1-based PHYSICAL line
  number (the reference's ``++i`` runs before its comment/empty checks,
  so comment lines consume ids — reproduced).
- :func:`write_dot_partition` — ``io/DotPartitionWriter.cpp:29``:
  Graphviz dot with per-cluster HSV hues. The reference iterates an
  ``unordered_set`` to assign hue indices (platform-dependent order);
  here clusters get hue indices in ASCENDING cluster-id order — a
  deterministic member of the reference's output family.

Binary en/decoding is numpy-vectorized (frombuffer/tobytes) on the
driver like the reference's single-file streams; the DataFrames on both
sides are the engine's (id, subset) partition/cover convention.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_DTYPES = {4: "<u4", 8: "<u8"}


def _check_width(width: int) -> None:
    if width not in _DTYPES:
        raise ValueError("only widths 4 and 8 are supported")


def write_binary_partition(partition: DataFrame, path: str, width: int = 4) -> None:
    """Subsets in node-id order, fixed-width little-endian. Node ids must
    be dense 0..n−1 (the format has no id column — the reference's
    Partition is a dense vector). Default ``width=4`` matches the
    reference (``graphio.pyx:717`` BinaryPartitionWriter(width=4))."""
    _check_width(width)
    rows = partition.orderBy("id").select("id", "subset").collect()
    n = len(rows)
    ids = np.fromiter((r["id"] for r in rows), dtype="int64", count=n)
    if n and not np.array_equal(ids, np.arange(n)):
        raise ValueError("binary partition requires dense node ids 0..n-1")
    subs = np.fromiter((r["subset"] for r in rows), dtype="uint64", count=n)
    if width == 4 and n and subs.max() >= 1 << 32:
        raise ValueError("subset ids exceed width 4; use width=8")
    with open(path, "wb") as f:
        f.write(subs.astype(_DTYPES[width]).tobytes())


def read_binary_partition(spark: SparkSession, path: str, width: int = 4) -> DataFrame:
    _check_width(width)
    with open(path, "rb") as f:
        raw = f.read()
    if len(raw) % width:
        raise ValueError("partition file length must be a multiple of the width")
    subs = np.frombuffer(raw, dtype=_DTYPES[width]).astype("int64")
    import pandas as pd

    pdf = pd.DataFrame({"id": np.arange(len(subs), dtype="int64"), "subset": subs})
    if not len(pdf):
        return spark.createDataFrame([], "id LONG, subset LONG")
    return spark.createDataFrame(pdf)


def write_binary_edge_list_partition(
    partition: DataFrame, path: str, first_node: int = 0, width: int = 4
) -> None:
    """(node+firstNode, subset) little-endian pairs in node-id order."""
    _check_width(width)
    rows = partition.orderBy("id").select("id", "subset").collect()
    n = len(rows)
    ids = np.fromiter((r["id"] + first_node for r in rows), dtype="uint64", count=n)
    subs = np.fromiter((r["subset"] for r in rows), dtype="uint64", count=n)
    if width == 4 and n and max(ids.max(), subs.max()) >= 1 << 32:
        raise ValueError("values exceed width 4; use width=8")
    inter = np.empty(2 * n, dtype=_DTYPES[width])
    inter[0::2] = ids.astype(_DTYPES[width])
    inter[1::2] = subs.astype(_DTYPES[width])
    with open(path, "wb") as f:
        f.write(inter.tobytes())


def read_binary_edge_list_partition(
    spark: SparkSession,
    paths: str | list[str],
    first_node: int = 0,
    width: int = 4,
) -> DataFrame:
    _check_width(width)
    if isinstance(paths, str):
        paths = [paths]
    chunks = []
    for p in paths:
        with open(p, "rb") as f:
            raw = f.read()
        if len(raw) % (2 * width):
            raise ValueError("edge-list partition file length must hold (u,p) pairs")
        chunks.append(np.frombuffer(raw, dtype=_DTYPES[width]))
    flat = np.concatenate(chunks) if chunks else np.empty(0, dtype=_DTYPES[8])
    ids = flat[0::2].astype("int64") - first_node
    if len(ids) and ids.min() < 0:
        raise ValueError("node smaller than the given first_node found")
    subs = flat[1::2].astype("int64")
    import pandas as pd

    if not len(ids):
        return spark.createDataFrame([], "id LONG, subset LONG")
    return spark.createDataFrame(pd.DataFrame({"id": ids, "subset": subs}))


def read_edge_list_cover(
    spark: SparkSession, path: str, first_node: int = 0
) -> DataFrame:
    """'v c1 c2 ...' lines → (id, subset) cover rows."""
    def parse(si):
        line = si.strip()
        if not line or line.startswith("#"):
            return []
        toks = line.split()
        v = int(toks[0]) - first_node
        return [(v, int(c)) for c in toks[1:]]

    rdd = spark.sparkContext.textFile(path).flatMap(parse)
    return spark.createDataFrame(rdd, "id LONG, subset LONG")


def read_snap_edge_list_partition(spark: SparkSession, path: str) -> DataFrame:
    """Each physical line = one community, members whitespace-separated;
    community id = 1-based line number INCLUDING comment/empty lines
    (the reference's counter increments before its checks)."""
    rdd = (
        spark.sparkContext.textFile(path)
        .zipWithIndex()
        .flatMap(
            lambda si: []
            if not si[0].strip() or si[0].startswith("#")
            else [(int(tok), si[1] + 1) for tok in si[0].split()]
        )
    )
    return spark.createDataFrame(rdd, "id LONG, subset LONG")


def write_dot_partition(
    edges_undirected: DataFrame, partition: DataFrame, path: str
) -> None:
    """Graphviz dot: one '[style=filled, color="h,0.99,0.99", label=c]'
    node line per deg>0 node, one 'u -- v' line per canonical edge;
    hue h = idx/|clusters| with idx assigned in ascending cluster-id
    order (deterministic stand-in for the reference's unordered_set
    iteration)."""
    eu = edges_undirected.select("src", "dst")
    deg_nodes = eu.select(F.col("src").alias("id")).distinct()
    p = (
        deg_nodes.join(partition, "id")
        .orderBy("id")
        .collect()
    )
    clusters = sorted({int(r["subset"]) for r in p})
    factor = 1.0 / len(clusters) if clusters else 0.0
    hue = {c: factor * i for i, c in enumerate(clusters)}
    edges = sorted(
        {
            (min(int(r["src"]), int(r["dst"])), max(int(r["src"]), int(r["dst"])))
            for r in eu.collect()
        }
    )
    with open(path, "w") as f:
        f.write("graph {\n")
        for r in p:
            c = int(r["subset"])
            f.write(
                f'{int(r["id"])} [style=filled, '
                f'color="{hue[c]},0.99,0.99", label={c}];\n'
            )
        for u, v in edges:
            f.write(f"{u} -- {v};\n")
        f.write("}\n")


def read_line_file(spark: SparkSession, path: str) -> DataFrame:
    """LineFileReader (reference ``graphio.pyx`` debug reader: returns the
    file's raw lines). → (line_no BIGINT, line STRING) in file order —
    the line number makes the DataFrame form order-faithful where the
    reference returns a Python list."""
    rdd = spark.sparkContext.textFile(path).zipWithIndex().map(
        lambda si: (si[1], si[0])
    )
    return spark.createDataFrame(rdd, "line_no LONG, line STRING")
