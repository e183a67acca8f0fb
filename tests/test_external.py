"""External-adapter gates (external.py): InfomapAdapter / BTERReplicator /
widget_from_graph must import everywhere, raise MissingDependencyError
exactly where the reference's dependency probes would, and run the real
pipeline when a (fake) binary is present."""

from __future__ import annotations

import os
import stat

import pytest

from icebug_spark.external import (
    BTERReplicator,
    Dimension,
    InfomapAdapter,
    widget_from_graph,
)
from icebug_spark.graph.core import Graph
from icebug_spark.support import MissingDependencyError

from tests.conftest import spark  # noqa: F401


def _graph(spark):
    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (2, 3)], "src LONG, dst LONG"
    )
    return Graph(e, directed=False)


def test_infomap_gates_without_binary(spark):
    InfomapAdapter.infomap_path = None
    with pytest.raises(MissingDependencyError):
        InfomapAdapter(_graph(spark)).run()
    InfomapAdapter.set_path("/nonexistent/infomap")
    with pytest.raises(MissingDependencyError):
        InfomapAdapter(_graph(spark)).run()
    InfomapAdapter.infomap_path = None


def test_infomap_fake_binary_roundtrip(spark, tmp_path):
    # fake infomap: verifies the exported edge list exists, then writes a
    # .clu module file — exercises export, subprocess and .clu parsing
    fake = tmp_path / "infomap"
    fake.write_text(
        "#!/usr/bin/env python3\n"
        "import os, sys\n"
        "graph, outdir = sys.argv[-2], sys.argv[-1]\n"
        "lines = [l for l in open(graph) if l.strip()]\n"
        "assert len(lines) == 4, lines  # one plain FILE, one line per edge\n"
        "base = os.path.splitext(os.path.basename(graph))[0]\n"
        "with open(os.path.join(outdir, base + '.clu'), 'w') as f:\n"
        "    f.write('# modules\\n0 0\\n1 0\\n2 1\\n3 1\\n')\n"
    )
    fake.chmod(fake.stat().st_mode | stat.S_IXUSR)
    InfomapAdapter.set_path(str(fake))
    try:
        ad = InfomapAdapter(_graph(spark)).run()
        part = {r["id"]: r["subset"] for r in ad.get_partition().collect()}
        assert part == {0: 0, 1: 0, 2: 1, 3: 1}
    finally:
        InfomapAdapter.infomap_path = None
    with pytest.raises(RuntimeError):
        InfomapAdapter(_graph(spark)).get_partition()


def test_bter_gates_without_octave(spark, tmp_path, monkeypatch):
    monkeypatch.setenv("PATH", str(tmp_path))  # no octave anywhere
    rep = BTERReplicator.fit(_graph(spark), scale=1)
    with pytest.raises(MissingDependencyError):
        rep.generate()


def test_bter_fake_octave_roundtrip(spark, tmp_path):
    from icebug_spark.sources import readers5

    # expected regenerated graph, pre-written under the reference's
    # output key with the engine's own MAT-5 writer
    fixture = tmp_path / "bter_fixture.mat"
    want = _graph(spark)
    readers5.write_mat(want, str(fixture), key="G_bter")
    fake = tmp_path / "octave"
    fake.write_text(
        "#!/usr/bin/env python3\n"
        "import re, shutil, sys\n"
        "src = open(sys.argv[-1]).read()\n"
        "out = re.search(r\"save\\('-v7', '([^']+)'\", src).group(1)\n"
        f"shutil.copy({str(fixture)!r}, out)\n"
    )
    fake.chmod(fake.stat().st_mode | stat.S_IXUSR)
    feast = tmp_path / "feastpack"
    feast.mkdir()
    (feast / "bter.m").write_text("% stub\n")
    old_name, old_path = BTERReplicator.matlabname, BTERReplicator.feastpack_path
    try:
        BTERReplicator.matlabname = str(fake)
        BTERReplicator.set_paths(str(feast))
        got = BTERReplicator.fit(_graph(spark), scale=1).generate()
        # read_mat canonicalizes undirected edges to (min, max)
        g_edges = sorted(tuple(r) for r in got.edges.collect())
        w_edges = sorted(
            (min(r["src"], r["dst"]), max(r["src"], r["dst"]))
            for r in want.edges.collect()
        )
        assert g_edges == w_edges
    finally:
        BTERReplicator.matlabname = old_name
        BTERReplicator.feastpack_path = old_path


def test_widget_from_graph_gates(spark):
    g = _graph(spark)
    with pytest.raises(TypeError):
        widget_from_graph(g, dimension="2d")
    with pytest.raises(ValueError):
        widget_from_graph(
            g, node_scores=[1.0], node_partition=object()
        )
    with pytest.raises(MissingDependencyError) as ei:
        widget_from_graph(g, dimension=Dimension.Two)
    assert "ipycytoscape" in str(ei.value)
    with pytest.raises(MissingDependencyError) as ei:
        widget_from_graph(g, dimension=Dimension.Three)
    assert "plotly" in str(ei.value)
