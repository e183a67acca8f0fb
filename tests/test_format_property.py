"""Cross-format round-trip property test: random graphs through every
lossless whole-graph container (NetworkitBinary, GraphToolBinary,
Parquet) must come back edge-identical.

Hypothesis drives the GRAPH SHAPE (node count, edge set, directedness,
weights incl. negative/fractional, self-loops); the Spark work per
example is bounded (≤ 12 nodes). Formats with documented lossy id
mapping (GraphML positional compaction, MAT unweighted) are excluded —
their exact semantics are pinned in tests/test_readers45.py."""

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from icebug_spark.graph.core import Graph
from icebug_spark.sources import readers3, readers6


@st.composite
def graphs(draw):
    n = draw(st.integers(min_value=1, max_value=12))
    directed = draw(st.booleans())
    weighted = draw(st.booleans())
    pairs = draw(
        st.sets(
            st.tuples(
                st.integers(min_value=0, max_value=n - 1),
                st.integers(min_value=0, max_value=n - 1),
            ),
            max_size=20,
        )
    )
    if not directed:  # canonical storage for undirected
        pairs = {(min(u, v), max(u, v)) for (u, v) in pairs}
    edges = sorted(pairs)
    if weighted:
        ws = draw(
            st.lists(
                st.one_of(
                    st.integers(min_value=-50, max_value=50).map(float),
                    st.sampled_from([0.5, -2.25, 3.75, 1e6]),
                ),
                min_size=len(edges),
                max_size=len(edges),
            )
        )
        edges = [(u, v, w) for (u, v), w in zip(edges, ws)]
    return n, directed, weighted, edges


def _build(spark, n, directed, weighted, edges):
    schema = "src BIGINT, dst BIGINT" + (", weight DOUBLE" if weighted else "")
    e = (
        spark.createDataFrame(edges, schema.replace(" BIGINT", " long"))
        if edges
        else spark.createDataFrame([], schema)
    )
    return Graph(
        e,
        vertices=spark.range(n).selectExpr("id"),
        directed=directed,
        weighted=weighted,
    )


def _edge_set(g, weighted):
    cols = ["src", "dst"] + (["weight"] if weighted else [])
    return sorted(tuple(r) for r in g.edges.select(*cols).collect())


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(graphs())
def test_nkbg_roundtrip_random(spark, tmp_path_factory, gdef):
    n, directed, weighted, edges = gdef
    g = _build(spark, n, directed, weighted, edges)
    p = str(tmp_path_factory.mktemp("nkbg") / "g.nkb")
    readers6.write_networkit_binary(g, p, chunks=3)
    g2 = readers6.read_networkit_binary(spark, p)
    assert g2.directed == directed and g2.weighted == weighted
    want = sorted(edges) if weighted else sorted((u, v) for (u, v) in edges)
    assert _edge_set(g2, weighted) == [tuple(e) for e in want]
    assert sorted(r["id"] for r in g2.vertices.collect()) == list(range(n))


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(graphs())
def test_parquet_roundtrip_random(spark, tmp_path_factory, gdef):
    n, directed, weighted, edges = gdef
    g = _build(spark, n, directed, weighted, edges)
    p = str(tmp_path_factory.mktemp("pq") / "g.parquet")
    readers3.write_graph_parquet(g, p)
    g2 = readers3.read_graph_parquet(spark, p)
    assert g2.directed == directed and g2.weighted == weighted
    assert _edge_set(g2, weighted) == [tuple(e) for e in sorted(edges)]


@pytest.mark.parametrize("directed", [False, True])
def test_graphtool_roundtrip_examples(spark, tmp_path, directed):
    edges = [(0, 1), (1, 2), (0, 2), (3, 3)]
    g = Graph(
        Graph.from_edge_list(spark, edges, directed=directed).edges,
        vertices=spark.range(5).selectExpr("id"),
        directed=directed,
    )
    p = str(tmp_path / f"g{int(directed)}.gt")
    readers3.write_graphtool_binary(g, p)
    g2 = readers3.read_graphtool_binary(spark, p)
    assert _edge_set(g2, False) == sorted(edges)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(graphs())
def test_metis_roundtrip_random(spark, tmp_path_factory, gdef):
    """METIS round-trip over random graphs: undirected, unweighted,
    loop-free view (the format's scope) — the edge SET must survive."""
    from icebug_spark.sources import readers

    n, directed, weighted, edges = gdef
    pairs = sorted(
        {(min(e[0], e[1]), max(e[0], e[1])) for e in edges if e[0] != e[1]}
    )
    g = _build(spark, n, False, False, pairs)
    p = str(tmp_path_factory.mktemp("metis") / "g.metis")
    readers.write_metis(g, p)
    g2 = readers.read_metis(spark, p)
    assert _edge_set(g2, False) == pairs


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(graphs())
def test_edge_list_roundtrip_random(spark, tmp_path_factory, gdef):
    """Edge-list round-trip (space separator, 1-indexed like
    Format.EdgeListSpaceOne) over random weighted/unweighted graphs."""
    from icebug_spark.sources import readers

    n, directed, weighted, edges = gdef
    if not edges:
        return  # a headerless empty edge list is formatless
    g = _build(spark, n, directed, weighted, edges)
    p = str(tmp_path_factory.mktemp("el") / "g.edgelist")
    readers.write_edge_list(g, p, separator=" ", first_node=1)
    g2 = readers.read_edge_list(
        spark, p, separator=r"\s+", first_node=1, directed=directed
    )
    assert g2.weighted == weighted
    assert _edge_set(g2, weighted) == [tuple(e) for e in sorted(edges)]


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(graphs())
def test_mtx_roundtrip_random(spark, tmp_path_factory, gdef):
    """MatrixMarket round-trip over random graphs: symmetric for
    undirected, general for directed, weights always written (real)."""
    from icebug_spark.sources import readers2

    n, directed, weighted, edges = gdef
    if not edges:
        return
    g = _build(spark, n, directed, weighted, edges)
    p = str(tmp_path_factory.mktemp("mtx") / "g.mtx")
    readers2.write_mtx(g, p)
    g2 = readers2.read_mtx(spark, p)
    assert g2.directed == directed
    want = (
        sorted(edges)
        if weighted
        else sorted((u, v, 1.0) for (u, v) in edges)  # writer emits 1.0
    )
    assert _edge_set(g2, True) == [tuple(e) for e in want]


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(graphs())
def test_gml_roundtrip_random(spark, tmp_path_factory, gdef):
    """GML round-trip over random graphs (unweighted scope)."""
    from icebug_spark.sources import readers, readers3

    n, directed, weighted, edges = gdef
    pairs = sorted({(e[0], e[1]) for e in edges})
    g = _build(spark, n, directed, False, pairs)
    p = str(tmp_path_factory.mktemp("gml") / "g.gml")
    readers3.write_gml(g, p)
    g2 = readers.read_gml(spark, p)
    assert g2.directed == directed
    assert _edge_set(g2, False) == pairs
