"""Graph profiling report — the engine's analog of the reference's
``networkit/profiling/`` module: one DataFrame of (metric, value)
assembling the headline statistics of §2 in a single pass hierarchy.

Everything here is a reuse of existing operators; the profile itself adds
no new shuffles beyond the operators it calls. Heavy metrics (diameter,
clustering) are gated by flags so the cheap profile stays one-scan cheap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from icebug_spark.operators.components import connected_components
from icebug_spark.operators.distances import diameter_double_sweep
from icebug_spark.operators.linkpred import degree_assortativity
from icebug_spark.operators.triangles import global_clustering_coefficient


def profile(
    edges_undirected: DataFrame,
    include_diameter: bool = True,
    include_clustering: bool = True,
    include_components: bool = True,
    include_assortativity: bool = True,
) -> DataFrame:
    """(metric STRING, value DOUBLE) profile report, deterministic order
    by metric name. Mirrors the headline numbers of the reference's
    profiling report (n, m, density, degree stats, components, diameter,
    clustering, assortativity)."""
    spark = edges_undirected.sparkSession
    eu = edges_undirected.select("src", "dst")
    sym = eu.union(
        eu.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct().localCheckpoint(eager=True)

    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    dstats = deg.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("deg").alias("two_m"),
        F.min("deg").alias("min_deg"),
        F.max("deg").alias("max_deg"),
        F.avg("deg").alias("avg_deg"),
    ).collect()[0]
    n = dstats["n"] or 0
    m = (dstats["two_m"] or 0) / 2

    rows = [
        ("num_nodes", float(n)),
        ("num_edges", float(m)),
        ("density", round(2 * m / (n * (n - 1)), 6) if n > 1 else 0.0),
        ("min_degree", float(dstats["min_deg"] or 0)),
        ("max_degree", float(dstats["max_deg"] or 0)),
        ("avg_degree", round(float(dstats["avg_deg"] or 0), 6)),
    ]

    if include_components:
        comp = connected_components(sym)
        csizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("sz"))
        cstats = csizes.agg(
            F.count(F.lit(1)).alias("ncc"), F.max("sz").alias("largest")
        ).collect()[0]
        rows.append(("num_components", float(cstats["ncc"] or 0)))
        rows.append(("largest_component", float(cstats["largest"] or 0)))

    if include_diameter:
        # the double sweep expects BOTH arc directions — on raw one-way
        # arcs its second sweep starts at a sink and reports 0
        d = diameter_double_sweep(sym).collect()[0][0]
        rows.append(("diameter_lower_bound", float(d or 0)))

    if include_clustering:
        cc = global_clustering_coefficient(sym).collect()[0]
        rows.append(("global_clustering", float(cc["global_cc"] or 0)))
        rows.append(("avg_clustering", float(cc["avg_cc"] or 0)))

    if include_assortativity:
        a = degree_assortativity(sym).collect()[0][0]
        rows.append(("degree_assortativity", float(a) if a is not None else 0.0))

    return spark.createDataFrame(sorted(rows), "metric string, value double")
