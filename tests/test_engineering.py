"""Engineering surface (icebug_spark.engineering vs engineering.pyx)."""

import csv

from pyspark.sql import functions as F

from icebug_spark import engineering as eng
from icebug_spark.graph.core import Graph
from icebug_spark.operators.centrality import pagerank


def test_thread_knobs_roundtrip(spark):
    before = eng.get_current_number_of_threads(spark)
    try:
        eng.set_number_of_threads(spark, 2)
        assert eng.get_current_number_of_threads(spark) == 2
    finally:
        eng.set_number_of_threads(spark, before)
    assert eng.get_max_number_of_threads(spark) >= 1


def test_seed_and_loglevel(spark):
    eng.set_seed(spark, 1234)
    assert eng.get_seed(spark) == 1234
    eng.set_log_level(spark, "warn")
    assert eng.get_log_level(spark) == "WARN"


def test_strong_scaling_restores_and_records(spark, tmp_path):
    g = Graph.from_edge_list(
        spark, [(0, 1), (1, 2), (2, 0), (2, 3)], directed=True
    )

    def algo(s, edges):
        return pagerank(edges, max_iter=2)

    before = eng.get_current_number_of_threads(spark)
    out = str(tmp_path / "scaling.tsv")
    data = eng.strong_scaling(
        spark, algo, [1, 2], {"edges": g.edges},
        input_title="toy", repetitions=2, out_path=out,
    )
    assert eng.get_current_number_of_threads(spark) == before
    assert len(data) == 4
    assert [d["threads"] for d in data] == [1, 1, 2, 2]
    assert all(d["input"] == "toy" and d["time"] > 0 for d in data)
    with open(out) as f:
        rows = list(csv.reader(f, delimiter="\t"))
    # reference header parity: algo column declared, left empty
    assert rows[0] == ["algo", "input", "threads", "time"]
    assert len(rows) == 5 and rows[1][0] == ""


def test_weak_scaling_zips_inputs(spark):
    gs = [
        Graph.from_edge_list(spark, [(0, 1)], directed=False).edges,
        Graph.from_edge_list(spark, [(0, 1), (1, 2)], directed=False).edges,
    ]

    def algo(s, edges):
        return edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))

    data = eng.weak_scaling(
        spark, algo, {}, [1, 2], gs, input_titles=["a", "b"]
    )
    assert [(d["input"], d["threads"]) for d in data] == [("a", 1), ("b", 2)]
