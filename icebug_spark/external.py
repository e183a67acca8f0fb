"""External-tool adapters, dependency-gated like the reference:

- :class:`InfomapAdapter` — reference ``networkit/community.pyx:1914``
  (shipped commented-out there, same contract): shells out to the
  Infomap binary over an EdgeListSpaceZero export and reads the ``.clu``
  module assignment back as a partition. Gated on ``set_path``; absent
  binary → ``MissingDependencyError("infomap")``.
- :class:`BTERReplicator` — reference ``networkit/generators.pyx:1779``:
  wraps the FEASTPACK BTER generator under GNU Octave. The reference
  needs octave + feastpack + scipy's MAT writer; none are in this
  container, so the surface (setPaths / fit / generate) is gated with
  ``MissingDependencyError`` naming the first missing piece.
- :func:`widget_from_graph` — reference ``networkit/vizbridges.py:223``:
  the plotly / ipycytoscape widget bridge, gated exactly like the
  reference's module-level try-imports.

Gating follows ``nxadapter.py``: import-time feature probes, call-time
``MissingDependencyError`` — the adapters import cleanly everywhere.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import tempfile
from enum import Enum

from pyspark.sql import DataFrame

from icebug_spark.support import MissingDependencyError

try:  # reference vizbridges.py:16
    import ipycytoscape  # noqa: F401

    have_cyto = True
except ImportError:
    have_cyto = False

try:  # reference vizbridges.py:23
    import plotly.graph_objs as _go  # noqa: F401

    have_plotly = True
except ImportError:
    have_plotly = False


class InfomapAdapter:
    """community.pyx:1914: run the external Infomap binary on a graph.

    ``set_path`` the binary first (the reference's ``setPath`` class
    method); ``run()`` exports the graph as a zero-indexed
    space-separated edge list, invokes ``infomap -s <seed> -2 -z --clu``
    and parses the resulting ``.clu`` (node module [flow]) lines into
    the engine's (id, subset) partition convention."""

    infomap_path: str | None = None

    def __init__(self, g, seed: int = 42):
        self.g = g
        self.seed = int(seed)
        self.result: DataFrame | None = None

    @classmethod
    def set_path(cls, infomap_path: str) -> None:
        cls.infomap_path = infomap_path

    def run(self) -> "InfomapAdapter":
        if not self.infomap_path or not (
            os.path.isfile(self.infomap_path)
            or shutil.which(self.infomap_path)
        ):
            raise MissingDependencyError("infomap")
        from icebug_spark.sources import dispatch
        from icebug_spark.sources.readers2 import read_edge_list_partition

        spark = self.g.edges.sparkSession
        with tempfile.TemporaryDirectory() as tmp:
            graph_file = os.path.join(tmp, "network.txt")
            out = os.path.join(tmp, "_export")
            dispatch.write_graph(self.g, out, "EdgeListSpaceZero")
            # Spark text output is a part-file directory; the external
            # binary wants ONE file — merge (driver-side, export-sized)
            with open(graph_file, "w") as dst:
                for part in sorted(os.listdir(out)):
                    if part.startswith("part-"):
                        with open(os.path.join(out, part)) as src:
                            dst.write(src.read())
            subprocess.check_call(
                [
                    str(self.infomap_path),
                    "-s",
                    str(self.seed),
                    "-2",
                    "-z",
                    "--clu",
                    graph_file,
                    tmp,
                ]
            )
            clu = os.path.join(tmp, "network.clu")
            # collect inside the tempdir scope (the file vanishes after)
            self.result = spark.createDataFrame(
                read_edge_list_partition(spark, clu).collect(),
                "id LONG, subset LONG",
            )
        return self

    def get_partition(self) -> DataFrame:
        if self.result is None:
            raise RuntimeError("call run() first")
        return self.result


class BTERReplicator:
    """generators.pyx:1779: FEASTPACK BTER via GNU Octave — degree and
    per-degree-clustering are fit from the input graph's adjacency, the
    Octave script regenerates a graph from them. MAT-5 transport rides
    the engine's own reader/writer (``readers5``) instead of the
    reference's scipy dependency; the octave binary and a feastpack
    checkout are gated with ``MissingDependencyError`` (the reference
    fails the same way on a bare host)."""

    matlabname = "octave"
    # reference generators.pyx:1791, rng-free per its own porting note
    matlab_script = """
    addpath('{0}');
    filename = 'bter_input.mat';
    load(filename);
    addpath('{1}');
    tStart = tic;
    [ccd,gcc] = ccperdeg(G);
    nd = accumarray(nonzeros(sum(G,2)),1);
    nd = nd * {2};
    tFit = toc(tStart);
    tStart = tic;
    [E1,E2] = bter(nd,ccd,'verbose',false,'blowup',10);
    tGenerate = toc(tStart);
    G_bter = bter_edges2graph(E1,E2);
    save('-v7', '{3}', 'G_bter', 'tFit', 'tGenerate');
    exit;
    """
    feastpack_path = "."

    def __init__(self, g, scale: int = 1):
        self.g = g
        self.scale = int(scale)

    @classmethod
    def set_paths(cls, feastpack_path: str) -> None:
        cls.feastpack_path = feastpack_path

    @classmethod
    def fit(cls, g, scale: int = 1) -> "BTERReplicator":
        return cls(g, scale)

    def generate(self):
        if shutil.which(self.matlabname) is None:
            raise MissingDependencyError(self.matlabname)
        if not os.path.isfile(os.path.join(self.feastpack_path, "bter.m")):
            raise MissingDependencyError("feastpack")
        from icebug_spark.sources import readers5

        spark = self.g.edges.sparkSession
        with tempfile.TemporaryDirectory() as tmp:
            script = os.path.join(tmp, "bter_wrapper.m")
            out_mat = os.path.join(tmp, "bter_output.mat")
            with open(script, "w") as f:
                f.write(
                    self.matlab_script.format(
                        tmp, self.feastpack_path, self.scale, out_mat
                    )
                )
            readers5.write_mat(self.g, os.path.join(tmp, "bter_input.mat"))
            subprocess.check_call([self.matlabname, "-qf", script], cwd=tmp)
            return readers5.read_mat(spark, out_mat, key="G_bter")


class Dimension(Enum):
    """vizbridges.py:34 — widget embedding dimension."""

    Two = 0
    TwoForcePlotly = 1
    Three = 2


def widget_from_graph(
    g,
    dimension: Dimension = Dimension.Two,
    node_scores=None,
    node_partition=None,
    node_palette=None,
    show_ids: bool = True,
    custom_size=None,
    edge_scores=None,
    edge_palette=None,
):
    """vizbridges.py:223 ``widgetFromGraph``: 2-D graphs render through
    ipycytoscape, 3-D (and forced-plotly 2-D) through plotly. Neither
    widget stack ships in this container, so the call gates exactly
    where the reference's module imports would have failed; argument
    validation happens first so misuse surfaces even without the
    libraries."""
    if not isinstance(dimension, Dimension):
        raise TypeError("dimension must be a vizbridges Dimension")
    if node_scores is not None and node_partition is not None:
        # reference vizbridges.py:272 rejects the combination
        raise ValueError(
            "node_scores and node_partition are mutually exclusive"
        )
    if dimension is Dimension.Two:
        if not have_cyto:
            raise MissingDependencyError("ipycytoscape")
    else:
        if not have_plotly:
            raise MissingDependencyError("plotly")
    raise NotImplementedError(  # pragma: no cover - widgets absent here
        "widget rendering is not implemented in this engine build; the "
        "data sides (layouts, colorings, partitions) are available via "
        "icebug_spark.plot and the layout operators"
    )
