"""Graph file I/O part 2: matrix-market, SNAP, KONECT, DOT, partition and
cover files.

Parity targets (reference io/): MTXGraphReader ``io/MTXGraphReader.hpp:17``
/ MatrixMarketReader ``:22``, SNAPGraphReader ``io/SNAPGraphReader.hpp:21``,
KONECTGraphReader ``io/KONECTGraphReader.hpp:17``, DotGraphWriter
``io/DotGraphWriter.hpp:27``, PartitionReader/Writer
``io/PartitionReader.hpp:21``/``PartitionWriter.hpp:21``,
CoverReader/Writer ``io/CoverReader.hpp:13``/``CoverWriter.hpp:15``,
EdgeListPartitionReader ``io/EdgeListPartitionReader.hpp:16``,
SNAPGraphWriter ``io/SNAPGraphWriter.hpp:45``.

All parsing is line-parallel ``spark.read.text`` + split — the ingest path
scales with file splits; Parquet remains the engine's native format.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from icebug_spark.graph.core import Graph


def _write_single_ordered(path: str, *sections) -> None:
    """Write text sections as ONE part file with the section order
    guaranteed. ``coalesce(1)`` alone does NOT preserve union branch
    order (the partition coalescer groups parents by locality), so each
    section carries an explicit key and the single partition is sorted
    by it before writing — banner/size lines stay first, the body's
    internal order is irrelevant to every format written this way.
    Single-threaded by construction: these are interchange formats (the
    reference writers are sequential files too); Parquet is the scale
    path."""
    out = None
    for df, key in sections:
        part = df.select(F.lit(int(key)).alias("k"), "value")
        out = part if out is None else out.union(part)
    (
        out.coalesce(1)
        .sortWithinPartitions("k")
        .select("value")
        .write.mode("overwrite")
        .text(path)
    )


def read_mtx(spark: SparkSession, path: str) -> Graph:
    """MatrixMarket coordinate format: '%%MatrixMarket matrix coordinate
    <field> <symmetry>'; comment lines start '%'; first data line is
    'rows cols nnz'; entries '1-based-i 1-based-j [value]'. symmetric →
    undirected graph; general → directed.

    Line POSITION matters here (the banner is line 0, the size triple is
    the first non-comment line), so ingestion goes through
    ``textFile().zipWithIndex()`` — Hadoop splits stay in (file, offset)
    order — rather than the DataSource text scan, whose size-descending
    file packing can place a later part-file first and made
    ``monotonically_increasing_id`` mis-identify the size line (dropping
    a real entry and parsing 'rows cols nnz' as an edge). Ingest-time
    only, the same recovered-order pattern as ``read_partition``."""
    rdd = spark.sparkContext.textFile(path).zipWithIndex()
    lines = spark.createDataFrame(
        rdd.map(lambda si: (si[1], si[0])), "rid LONG, value STRING"
    )
    header = (
        lines.orderBy("rid").limit(1).collect()[0]["value"].lower()
    )
    symmetric = "symmetric" in header
    pattern = "pattern" in header

    data = lines.where(
        (F.length(F.trim("value")) > 0) & (~F.col("value").startswith("%"))
    )
    # the FIRST non-comment line is the size header 'rows cols nnz'
    first_rid = data.agg(F.min("rid")).collect()[0][0]
    toks = F.split(F.trim(F.col("value")), r"\s+")
    parsed = data.where(F.col("rid") != first_rid).select(
        toks.getItem(0).cast("long").alias("a"),
        toks.getItem(1).cast("long").alias("b"),
        (toks.getItem(2).cast("double") if not pattern else F.lit(None).cast("double")).alias("w"),
    )
    weighted = not pattern
    edges = parsed.select(
        (F.col("a") - 1).alias("src"),
        (F.col("b") - 1).alias("dst"),
        *( [F.coalesce("w", F.lit(1.0)).alias("weight")] if weighted else [] ),
    )
    return Graph(edges, directed=not symmetric, weighted=weighted)


def write_mtx(g: Graph, path: str) -> None:
    """MatrixMarketWriter twin: coordinate real general/symmetric."""
    sym = "symmetric" if not g.directed else "general"
    e = g.edges
    n = (
        e.select(F.greatest(F.max("src"), F.max("dst")).alias("m")).collect()[0][0]
        or 0
    ) + 1
    m = e.count()
    w = F.col("weight") if g.weighted else F.lit(1.0)
    body = e.select(
        F.concat_ws(
            " ",
            (F.col("src") + 1).cast("string"),
            (F.col("dst") + 1).cast("string"),
            w.cast("string"),
        ).alias("value")
    )
    spark = e.sparkSession
    head = spark.createDataFrame(
        [(f"%%MatrixMarket matrix coordinate real {sym}",), (f"{n} {n} {m}",)],
        ["value"],
    )
    _write_single_ordered(path, (head, 0), (body, 1))


def read_snap(spark: SparkSession, path: str, directed: bool = False) -> Graph:
    """SNAPGraphReader: '# comment' lines then 'FromNodeId\\tToNodeId';
    node ids arbitrary (SNAP files are not contiguous) — remapped densely
    by first appearance order of sorted id (reference remaps via
    unordered_map, ``io/SNAPGraphReader.hpp:21``; dense_rank is the
    deterministic distributed equivalent)."""
    lines = spark.read.text(path)
    toks = F.split(F.trim("value"), r"\s+")
    raw = (
        lines.where((F.length(F.trim("value")) > 0) & (~F.col("value").startswith("#")))
        .select(
            toks.getItem(0).cast("long").alias("a"),
            toks.getItem(1).cast("long").alias("b"),
        )
    )
    ids = (
        raw.select(F.col("a").alias("nid"))
        .union(raw.select(F.col("b").alias("nid")))
        .distinct()
    )
    from icebug_spark.plans.zipindex import dense_index

    remap = dense_index(ids, ["nid"], out="dense", assume_distinct=True)
    edges = (
        raw.join(remap.withColumnRenamed("nid", "a"), "a")
        .withColumnRenamed("dense", "src")
        .join(remap.withColumnRenamed("nid", "b"), "b")
        .withColumnRenamed("dense", "dst")
        .select("src", "dst")
    )
    return Graph(edges, directed=directed, weighted=False)


def write_snap(g: Graph, path: str) -> None:
    """SNAPGraphWriter twin: '# Directed/Undirected graph' header + tab
    edge list."""
    kind = "Directed" if g.directed else "Undirected"
    spark = g.edges.sparkSession
    head = spark.createDataFrame(
        [(f"# {kind} graph",), ("# FromNodeId\tToNodeId",)], ["value"]
    )
    body = g.edges.select(
        F.concat_ws("\t", F.col("src").cast("string"), F.col("dst").cast("string")).alias(
            "value"
        )
    )
    _write_single_ordered(path, (head, 0), (body, 1))


def read_konect(spark: SparkSession, path: str) -> Graph:
    """KONECTGraphReader (``io/KONECTGraphReader.hpp:17``): '%' header
    lines ('% sym|asym|bip ...'), entries '1-based u v [weight [ts]]'."""
    first = spark.read.text(path).limit(1).collect()[0][0]
    directed = "asym" in first
    lines = spark.read.text(path)
    toks = F.split(F.trim("value"), r"\s+")
    raw = (
        lines.where((F.length(F.trim("value")) > 0) & (~F.col("value").startswith("%")))
        .select(
            (toks.getItem(0).cast("long") - 1).alias("src"),
            (toks.getItem(1).cast("long") - 1).alias("dst"),
            toks.getItem(2).cast("double").alias("weight"),
        )
    )
    weighted = raw.where(F.col("weight").isNotNull()).limit(1).count() > 0
    if not weighted:
        raw = raw.select("src", "dst")
    return Graph(raw, directed=directed, weighted=weighted)


def write_dot(g: Graph, path: str) -> None:
    """DotGraphWriter (``io/DotGraphWriter.hpp:27``): graph/digraph block
    with '--'/'->' edge statements."""
    arrow = "->" if g.directed else "--"
    kw = "digraph" if g.directed else "graph"
    body = g.edges.select(
        F.concat(
            F.col("src").cast("string"), F.lit(f" {arrow} "), F.col("dst").cast("string"),
            F.lit(";"),
        ).alias("value")
    )
    spark = g.edges.sparkSession
    head = spark.createDataFrame([(f"{kw} G {{",)], ["value"])
    tail = spark.createDataFrame([("}",)], ["value"])
    _write_single_ordered(path, (head, 0), (body, 1), (tail, 2))


# ------------------------------------------------ partition / cover ------
def read_partition(spark: SparkSession, path: str, first_node: int = 0) -> DataFrame:
    """PartitionReader (``io/PartitionReader.hpp:21``): line i = subset of
    node i. Line order is recovered per-file via zipWithIndex (ingest-time
    only). → (id, subset)."""
    rdd = (
        spark.sparkContext.textFile(path)
        .filter(lambda s: s.strip() != "")
        .zipWithIndex()
        .map(lambda si: (si[1] + first_node, int(si[0].strip())))
    )
    return spark.createDataFrame(rdd, "id long, subset long")


def write_partition(partition: DataFrame, path: str) -> None:
    """PartitionWriter twin: line i = subset of node i (requires dense
    contiguous ids — writer sorts by id into a single file)."""
    rows = partition.orderBy("id").select(F.col("subset").cast("string").alias("value"))
    rows.coalesce(1).write.mode("overwrite").text(path)


def read_edge_list_partition(
    spark: SparkSession, path: str, first_node: int = 0
) -> DataFrame:
    """EdgeListPartitionReader: 'node subset' pairs per line."""
    toks = F.split(F.trim("value"), r"\s+")
    return (
        spark.read.text(path)
        .where((F.length(F.trim("value")) > 0) & (~F.col("value").startswith("#")))
        .select(
            (toks.getItem(0).cast("long") - first_node).alias("id"),
            toks.getItem(1).cast("long").alias("subset"),
        )
    )


def read_cover(spark: SparkSession, path: str, first_node: int = 0) -> DataFrame:
    """CoverReader (``io/CoverReader.hpp:13``): line s lists the members of
    subset s. → (id, subset) with duplicate ids allowed."""
    rdd = (
        spark.sparkContext.textFile(path)
        .zipWithIndex()
        .flatMap(
            lambda si: [
                (int(tok) - first_node, si[1]) for tok in si[0].split() if tok.strip()
            ]
        )
    )
    return spark.createDataFrame(rdd, "id long, subset long")


def write_cover(cover: DataFrame, path: str) -> None:
    """CoverWriter twin: line s = space-separated members of subset s."""
    rows = (
        cover.groupBy("subset")
        .agg(F.sort_array(F.collect_list("id")).alias("members"))
        .orderBy("subset")
        .select(
            F.concat_ws(" ", F.transform("members", lambda x: x.cast("string"))).alias(
                "value"
            )
        )
    )
    rows.coalesce(1).write.mode("overwrite").text(path)
