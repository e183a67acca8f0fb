"""Gephi graph-streaming export: protocol shape + round-trip."""

import json

from pyspark.sql import functions as F

from icebug_spark.sources.gephi import (
    gephi_events,
    read_gephi_stream,
    write_gephi_stream,
)


def test_gephi_event_protocol_shape(spark):
    e = spark.createDataFrame(
        [(0, 1, 2.5), (1, 2, 1.0)], "src BIGINT, dst BIGINT, weight DOUBLE"
    )
    events = [r["event"] for r in gephi_events(e).collect()]
    parsed = [json.loads(x) for x in events]
    an = [p for p in parsed if "an" in p]
    ae = [p for p in parsed if "ae" in p]
    assert len(an) == 3 and len(ae) == 2
    # nodes precede edges in the stream (plugin requirement)
    assert all("an" in p for p in parsed[:3])
    edge = ae[0]["ae"]
    (eid, payload), = edge.items()
    assert payload["source"] + "-" + payload["target"] == eid
    assert payload["directed"] is False
    assert isinstance(payload["weight"], float)


def test_gephi_round_trip(spark, tmp_path):
    e = spark.createDataFrame(
        [(0, 1, 2.5), (1, 2, 1.0), (2, 3, 4.0)],
        "src BIGINT, dst BIGINT, weight DOUBLE",
    )
    p = str(tmp_path / "gephi_stream")
    write_gephi_stream(e, p)
    back = read_gephi_stream(spark, p)
    got = sorted((r["src"], r["dst"], r["weight"]) for r in back.collect())
    assert got == [(0, 1, 2.5), (1, 2, 1.0), (2, 3, 4.0)]


def test_gephi_delete_events_win(spark, tmp_path):
    e = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0)], "src BIGINT, dst BIGINT, weight DOUBLE"
    )
    p = str(tmp_path / "gephi_stream2")
    write_gephi_stream(e, p)
    # append a delete event for edge 1-2, as the live plugin would emit
    extra = spark.createDataFrame([('{"de": {"1-2": "1-2"}}',)], "value STRING")
    extra.write.mode("append").text(p)
    back = read_gephi_stream(spark, p)
    got = sorted((r["src"], r["dst"]) for r in back.collect())
    assert got == [(0, 1)]


def test_gephi_node_attrs(spark):
    e = spark.createDataFrame([(0, 1)], "src BIGINT, dst BIGINT")
    attrs = spark.createDataFrame([(0, 0.7), (1, 0.2)], "id BIGINT, score DOUBLE")
    events = [r["event"] for r in gephi_events(e, node_attrs=attrs).collect()]
    an = [json.loads(x)["an"] for x in events if "an" in json.loads(x)]
    payloads = {k: v for d in an for k, v in d.items()}
    assert payloads["0"]["score"] == 0.7 and payloads["1"]["score"] == 0.2


def test_gephi_duplicate_ae_collapses(spark, tmp_path):
    e = spark.createDataFrame([(0, 1, 1.0)], "src BIGINT, dst BIGINT, weight DOUBLE")
    p = str(tmp_path / "gephi_dup")
    write_gephi_stream(e, p)
    write_gephi_stream(e, p + "2")
    # append a duplicate ae event (same id, higher weight)
    extra = spark.createDataFrame(
        [('{"ae": {"0-1": {"source": "0", "target": "1", "directed": false, "weight": 3.0}}}',)],
        "value STRING",
    )
    extra.write.mode("append").text(p)
    back = read_gephi_stream(spark, p).collect()
    assert len(back) == 1 and back[0]["weight"] == 3.0
