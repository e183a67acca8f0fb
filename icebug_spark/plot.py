"""Plotting surface (reference ``networkit/plot.py``).

Each reference plot function is split into a DATA side and a RENDER
side. The data sides run DISTRIBUTED (the reference iterates nodes on
the driver — ``plot.py:88-117`` builds the degree histogram with a
Python loop; here it is a groupBy) and return small pandas frames:
a histogram/series is at most O(max_degree) or O(#components) rows,
driver-safe by construction at any graph scale. The render sides are
thin matplotlib calls gated exactly like the reference: matplotlib
absent → ``MissingDependencyError("matplotlib")``
(``plot.py:39,102,134`` — identical behavior in an env without the
package; this container ships none, so rendering is exercised only
where matplotlib exists while every data side is tested).

Parity map:
- degreeDistribution  (``plot.py:88``)  → degree_distribution / plot_…
- connectedComponentsSizes (``:118``)   → connected_components_sizes / plot_…
- coreDecompositionSequence (``:156``)  → core_decomposition_sequence / plot_…
- clusteringPerDegree (``:186``)        → clustering_per_degree / plot_…
- hopPlot (``:207``)                    → hop_plot data in
  ``operators/distances2.py:125`` (ANF approximation, like the
  reference's EffectiveDiameterApproximation hop plot) / plot_hop_plot
- nodeAttributes (``:26``)              → node_attribute_distribution /
  plot_node_attributes (attributes are vertex columns in this engine)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from icebug_spark.graph.core import Graph
from icebug_spark.support import MissingDependencyError

try:  # same optional-dependency gate as the reference (plot.py:6-11)
    import matplotlib.pyplot as plt

    have_plt = True
except ImportError:
    plt = None
    have_plt = False


def _require_plt() -> None:
    if not have_plt:
        raise MissingDependencyError("matplotlib")


# -- data sides (distributed) ----------------------------------------------


def degree_distribution(g: Graph) -> pd.DataFrame:
    """(degree, count) dense over 0..maxDegree — the bar data of
    ``degreeDistribution`` (plot.py:88, reference builds dd[] on the
    driver; here one groupBy + a dense reindex of the tiny result)."""
    counts = (
        g.degrees()
        .groupBy("degree")
        .agg(F.count(F.lit(1)).alias("count"))
        .toPandas()
        .set_index("degree")["count"]
    )
    n_isolated = g.number_of_nodes() - int(counts.sum())
    if n_isolated > 0:  # nodes absent from the edge set have degree 0
        counts.loc[0] = counts.get(0, 0) + n_isolated
    max_deg = int(counts.index.max()) if len(counts) else 0
    dense = counts.reindex(range(max_deg + 1), fill_value=0)
    return pd.DataFrame(
        {"degree": dense.index.astype("int64"), "count": dense.to_numpy("int64")}
    )


def connected_components_sizes(g: Graph, relative_sizes: bool = True) -> pd.DataFrame:
    """Component sizes sorted descending, with the pie fraction —
    ``connectedComponentsSizes`` (plot.py:118) data."""
    from icebug_spark.operators.components import (
        component_sizes, connected_components,
    )

    sizes = (
        component_sizes(connected_components(g.symmetrized()))
        .orderBy(F.desc("size"))
        .toPandas()
    )
    total = float(sizes["size"].sum()) or 1.0
    sizes["fraction"] = sizes["size"] / total
    if not relative_sizes:
        sizes = sizes.drop(columns=["fraction"])
    return sizes


def core_decomposition_sequence(g: Graph) -> pd.DataFrame:
    """(k, shell_size) for every core number k —
    ``coreDecompositionSequence`` (plot.py:156) data."""
    from icebug_spark.operators.kcore import core_numbers

    shells = (
        core_numbers(g.symmetrized())
        .groupBy(F.col("core").alias("k"))
        .agg(F.count(F.lit(1)).alias("shell_size"))
        .orderBy("k")
        .toPandas()
    )
    return shells


def clustering_per_degree(g: Graph) -> pd.DataFrame:
    """(deg, cc) — mean local clustering coefficient per degree,
    ``clusteringPerDegree`` (plot.py:186: groupby('deg').mean())."""
    from icebug_spark.operators.triangles import local_clustering_coefficient

    deg = g.degrees()
    lcc = local_clustering_coefficient(g.symmetrized())
    return (
        deg.join(lcc, "id", "left")
        .na.fill({"lcc": 0.0})
        .groupBy(F.col("degree").alias("deg"))
        .agg(F.avg("lcc").alias("cc"))
        .orderBy("deg")
        .toPandas()
    )


def node_attribute_distribution(g: Graph, attribute: str) -> pd.DataFrame:
    """(value, count) frequency of a vertex-attribute column —
    ``nodeAttributes`` 1-D branch (plot.py:44-63; attributes are plain
    vertex columns in this engine)."""
    if attribute not in g.vertices.columns:
        raise ValueError(f"no vertex attribute column named {attribute!r}")
    return (
        g.vertices.where(F.col(attribute).isNotNull())
        .groupBy(F.col(attribute).alias("value"))
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy("value")
        .toPandas()
    )


# -- render sides (reference-gated matplotlib) ------------------------------


def plot_degree_distribution(g: Graph, *args, **kwargs):
    """degreeDistribution (plot.py:88)."""
    _require_plt()
    data = degree_distribution(g)
    plt.bar(data["degree"], data["count"], *args, **kwargs)
    plt.title("Degree Distribution")
    plt.xlabel("Degree")
    plt.ylabel("Number of Nodes")
    plt.show()


def plot_connected_components_sizes(g: Graph, relative_sizes: bool = True):
    """connectedComponentsSizes (plot.py:118) — pie with the largest
    slice exploded; the reference additionally requires seaborn purely
    for its color palette, reproduced with a fixed list here."""
    _require_plt()
    data = connected_components_sizes(g, relative_sizes=True)
    sizes = data["size"].tolist()
    explode = [0.0] * len(sizes)
    if sizes:
        explode[0] = 0.1  # sorted desc → index 0 is the largest
    total = sum(sizes)
    plt.figure(figsize=(5, 5))
    plt.title("Size of Connected Components")
    if relative_sizes:
        autopct = lambda pct: ("%1.f%%" % pct) if pct > 5 else ""  # noqa: E731
    else:
        autopct = lambda p: "{:.0f}".format(p * total / 100)  # noqa: E731
    plt.pie(sizes, autopct=autopct, explode=explode)


def plot_core_decomposition_sequence(g: Graph, *args, **kwargs):
    """coreDecompositionSequence (plot.py:156)."""
    _require_plt()
    data = core_decomposition_sequence(g)
    plt.bar(data["k"], data["shell_size"], *args, **kwargs)
    plt.title("Size of Core Decomposition K-Shells")
    plt.xticks(data["k"])
    plt.xlabel("K-core decomposition(k)")
    plt.ylabel("Size of k-shell")
    plt.show()


def plot_clustering_per_degree(g: Graph):
    """clusteringPerDegree (plot.py:186) — scatter of mean cc vs degree
    (the reference's seaborn jointplot reduced to its matplotlib core)."""
    _require_plt()
    data = clustering_per_degree(g)
    plt.scatter(data["deg"], data["cc"])
    plt.ylim(0, 1)
    plt.xlabel("deg")
    plt.ylabel("cc")
    plt.show()


def plot_hop_plot(g: Graph, *args, **kwargs):
    """hopPlot (plot.py:207) — fraction of reachable pairs per hop via
    the ANF approximation (operators/distances2.py:125)."""
    _require_plt()
    from icebug_spark.operators.distances2 import hop_plot

    data = hop_plot(g.symmetrized()).orderBy("h").toPandas()
    plt.plot(data["h"], data["fraction"], *args, **kwargs)
    plt.title("Hop Plot")
    plt.xlabel("Distance")
    plt.ylabel("Fraction of connected pairs")
    plt.ylim(0, 1.02)
    plt.show()


def plot_node_attributes(g: Graph, attribute):
    """nodeAttributes (plot.py:26): a column name → 1-D frequency bar;
    a 2-tuple of column names → 2-D scatter."""
    _require_plt()
    if isinstance(attribute, str):
        data = node_attribute_distribution(g, attribute)
        fig, ax = plt.subplots()
        ax.bar(data["value"], data["count"])
        ax.title.set_text("1-Dim Node Attribute Distribution")
        ax.set_xlabel(attribute)
        ax.set_ylabel("Number of Nodes")
        plt.show()
    elif isinstance(attribute, tuple) and len(attribute) == 2:
        ax_, ay_ = attribute
        pdf = g.vertices.select(ax_, ay_).toPandas()
        plt.plot(pdf[ax_], pdf[ay_], "ro")
        plt.title("2-Dim Node Attribute Distribution")
        plt.xlabel(ax_)
        plt.ylabel(ay_)
        plt.show()
    else:
        raise TypeError(
            "attribute must be a column name or a 2-tuple of column names"
        )
