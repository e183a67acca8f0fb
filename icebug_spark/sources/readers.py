"""Graph file I/O: text-format readers/writers over spark.read.text.

Parity targets (reference io/, 4,081 LoC; Python dispatch
``networkit/graphio.pyx:1310,1548``): EdgeListReader (separator +
first-index variants, ``io/EdgeListReader.hpp:24``), METISGraphReader
``:21``, SNAPGraphReader ``:21``, GMLGraphReader ``:18``, MTX/
MatrixMarketReader ``:22``, DGSReader ``:28`` (dynamic events);
writers EdgeListWriter ``:21``, METISGraphWriter ``:18``.

Parquet is the primary format (columnar end-to-end — the role the
reference's custom NetworkitBinary plays); these parsers make the engine
a drop-in reader for the reference's fixture corpus. Parsing is
line-parallel (spark.read.text → split), except METIS whose
line-number = node-id semantics needs a per-file index (zipWithIndex) —
fine for ingest, the output is immediately repartitioned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from icebug_spark.graph.core import Graph


def read_edge_list(
    spark: SparkSession,
    path: str,
    separator: str = r"\s+",
    first_node: int = 0,
    comment_prefix: str = "#",
    directed: bool = False,
) -> Graph:
    """EdgeListReader: 'u<sep>v[<sep>w]' lines; Format.EdgeListSpaceZero /
    SpaceOne / TabZero / TabOne / CommaOne via separator+first_node."""
    lines = spark.read.text(path)
    toks = F.split(F.trim(F.col("value")), separator)
    parsed = (
        lines.where(
            (F.length(F.trim(F.col("value"))) > 0)
            & (~F.trim(F.col("value")).startswith(comment_prefix))
        )
        .select(toks.alias("t"))
        .select(
            (F.get(F.col("t"), 0).cast("long") - first_node).alias("src"),
            (F.get(F.col("t"), 1).cast("long") - first_node).alias("dst"),
            F.get(F.col("t"), 2).cast("double").alias("weight"),
        )
    )
    weighted = parsed.where(F.col("weight").isNotNull()).limit(1).count() > 0
    if not weighted:
        parsed = parsed.select("src", "dst")
    return Graph(parsed, directed=directed, weighted=weighted)


def write_edge_list(
    g: Graph, path: str, separator: str = " ", first_node: int = 0
) -> None:
    """EdgeListWriter twin."""
    cols = [
        (F.col("src") + first_node).cast("string"),
        (F.col("dst") + first_node).cast("string"),
    ]
    if g.weighted:
        cols.append(F.col("weight").cast("string"))
    out = g.edges.select(F.concat_ws(separator, *cols).alias("value"))
    out.write.mode("overwrite").text(path)


def read_metis(spark: SparkSession, path: str) -> Graph:
    """METISGraphReader: header 'n m [fmt]'; line i (1-based) lists the
    neighbors of node i (1-based), optionally weighted (fmt=1)."""
    
    rdd = spark.sparkContext.textFile(path).zipWithIndex()
    # drop COMMENT lines only — a BLANK line is a node with no neighbors
    # and must keep its position (an isolated node mid-file would
    # otherwise shift every later node id; found by the format
    # property test)
    rows = rdd.filter(lambda li: not li[0].strip().startswith("%"))
    indexed = rows.zipWithIndex().map(lambda x: (x[1], x[0][0]))  # dense line no
    header = indexed.filter(lambda x: x[0] == 0).collect()[0][1].split()
    n_declared = int(header[0])
    has_weights = len(header) > 2 and header[2].strip() in ("1", "011", "11")

    def parse(line_no_text):
        line_no, text = line_no_text
        if line_no == 0 or line_no > n_declared:  # header / trailing blanks
            return []
        u = line_no - 1  # 0-based node id
        toks = text.split()
        out = []
        if has_weights:
            it = iter(toks)
            for v, w in zip(it, it):
                out.append((u, int(v) - 1, float(w)))
        else:
            for v in toks:
                out.append((u, int(v) - 1, 1.0))
        return out

    edges = indexed.flatMap(parse)
    df = spark.createDataFrame(edges, "src long, dst long, weight double")
    # METIS lists each undirected edge twice — keep canonical orientation
    df = df.where(F.col("src") <= F.col("dst"))
    if not has_weights:
        df = df.select("src", "dst")
    # the header declares the vertex set (reference Graph(n)) — keeps
    # isolated nodes that no adjacency line mentions
    vertices = spark.range(n_declared).select(F.col("id"))
    return Graph(df, vertices=vertices, directed=False, weighted=has_weights)


def write_metis(g: Graph, path: str) -> None:
    """METISGraphWriter: adjacency-line format (collects to driver —
    METIS is a small-fixture interchange format, not a 100 TB sink)."""
    eu = g.symmetrized().collect()
    adj: dict[int, list[int]] = {}
    nodes = set()
    for r in eu:
        adj.setdefault(r["src"], []).append(r["dst"])
        nodes.add(r["src"])
        nodes.add(r["dst"])
    n = (max(nodes) + 1) if nodes else 0
    m = sum(len(v) for v in adj.values()) // 2
    with open(path, "w") as f:
        f.write(f"{n} {m}\n")
        for u in range(n):
            f.write(" ".join(str(v + 1) for v in sorted(adj.get(u, []))) + "\n")


def read_gml(spark: SparkSession, path: str) -> Graph:
    """GMLGraphReader (io/GMLGraphReader.hpp:18): minimal GML — node
    [ id N ] / edge [ source U target V ] blocks. Driver-side parse
    (GML fixtures are small); returns an edges DataFrame."""
    import re

    with open(path) as f:
        text = f.read()
    directed = bool(re.search(r"directed\s+1", text))
    edges = [
        (int(a), int(b))
        for a, b in re.findall(
            r"edge\s*\[\s*source\s+(\d+)\s+target\s+(\d+)\s*\]", text
        )
    ]
    df = spark.createDataFrame(edges or [(0, 0)], ["src", "dst"])
    if not edges:
        df = df.limit(0)
    return Graph(
        df.select(F.col("src").cast("long"), F.col("dst").cast("long")),
        directed=directed,
    )


def read_dgs_events(spark: SparkSession, path: str) -> DataFrame:
    """DGSStreamParser (dynamics/DGSStreamParser.hpp:23): parse a DGS
    event stream into the GraphEvent table (seq, type, u, v, w) —
    an/dn = node add/del, ae/de = edge add/del, st = TIME_STEP."""
    # event ORDER is semantics: seq comes from textFile().zipWithIndex()
    # (Hadoop splits stay in file-offset order) rather than
    # monotonically_increasing_id over the DataSource scan, whose
    # size-descending file packing can reorder multi-part inputs
    rdd = spark.sparkContext.textFile(path).zipWithIndex()
    lines = spark.createDataFrame(
        rdd.map(lambda si: (si[1], si[0])), "seq LONG, value STRING"
    )
    t = F.split(F.trim(F.col("value")), r"\s+")
    parsed = lines.select("seq", "value", t.alias("t")).where(
        F.length(F.trim(F.col("value"))) > 0
    )
    op = F.lower(F.get(F.col("t"), 0))
    typ = (
        F.when(op == "an", "NODE_ADDITION")
        .when(op == "dn", "NODE_REMOVAL")
        .when(op == "ae", "EDGE_ADDITION")
        .when(op == "de", "EDGE_REMOVAL")
        .when(op == "st", "TIME_STEP")
    )
    # DGS: 'ae <edgeid> <u> <v> [w]' / 'an <node>' / 'st <t>'
    return (
        parsed.select(
            "seq",
            typ.alias("type"),
            F.when(op.isin("an", "dn"), F.get(F.col("t"), 1).cast("long"))
            .when(op.isin("ae", "de"), F.get(F.col("t"), 2).cast("long"))
            .alias("u"),
            F.when(op.isin("ae", "de"), F.get(F.col("t"), 3).cast("long")).alias("v"),
            F.when(op.isin("ae", "de"), F.get(F.col("t"), 4).cast("double")).alias("w"),
        )
        .where(F.col("type").isNotNull())
    )


def write_dgs_events(events: DataFrame, path: str) -> None:
    """DGSWriter (``dynamics/DGSWriter.hpp:21``): serialize the GraphEvent
    table (seq, type, u, v, w) back to DGS lines — round-trips with
    ``read_dgs_events``. Driver-side write in seq order (DGS is an
    ordered text stream by definition)."""
    rows = events.select("seq", "type", "u", "v", "w").orderBy("seq").collect()
    with open(path, "w") as f:
        f.write("DGS004\nicebug 0 0\n")
        for r in rows:
            t = r["type"]
            if t == "NODE_ADDITION":
                f.write(f"an {r['u']}\n")
            elif t == "NODE_REMOVAL":
                f.write(f"dn {r['u']}\n")
            elif t == "EDGE_ADDITION":
                f.write(f"ae {r['u']}_{r['v']} {r['u']} {r['v']}"
                        + (f" {r['w']}\n" if r["w"] is not None else "\n"))
            elif t == "EDGE_REMOVAL":
                f.write(f"de {r['u']}_{r['v']} {r['u']} {r['v']}\n")
            elif t == "TIME_STEP":
                f.write("st " + str(r["u"] if r["u"] is not None else 0) + "\n")
