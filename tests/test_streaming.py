"""Dynamic-graph + streaming tests."""

import pytest
from pyspark.sql import functions as F


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src BIGINT, dst BIGINT, weight DOUBLE")


def _events(spark, rows):
    return spark.createDataFrame(rows, ["seq", "type", "u", "v", "w"])


def test_apply_events_add_remove_update(spark):
    from icebug_spark.streaming.dynamic import apply_events

    edges = _edges(spark, [(0, 1, 1.0), (1, 2, 1.0)])
    ev = _events(
        spark,
        [
            (1, "EDGE_ADDITION", 2, 3, 2.0),
            (2, "EDGE_REMOVAL", 0, 1, None),
            (3, "EDGE_WEIGHT_UPDATE", 1, 2, 5.0),
            (4, "EDGE_WEIGHT_INCREMENT", 1, 2, 0.5),
        ],
    )
    out = {(r["src"], r["dst"]): r["weight"] for r in apply_events(edges, ev).collect()}
    assert out == {(2, 3): 2.0, (1, 2): 5.5}


def test_apply_events_last_wins(spark):
    from icebug_spark.streaming.dynamic import apply_events

    edges = _edges(spark, [])
    ev = _events(
        spark,
        [
            (1, "EDGE_ADDITION", 0, 1, 1.0),
            (2, "EDGE_REMOVAL", 0, 1, None),
            (3, "EDGE_ADDITION", 0, 1, 7.0),
        ],
    )
    out = {(r["src"], r["dst"]): r["weight"] for r in apply_events(edges, ev).collect()}
    assert out == {(0, 1): 7.0}


def test_increment_on_missing_edge_ignored(spark):
    from icebug_spark.streaming.dynamic import apply_events

    edges = _edges(spark, [(0, 1, 1.0)])
    ev = _events(spark, [(1, "EDGE_WEIGHT_INCREMENT", 5, 6, 1.0)])
    out = {(r["src"], r["dst"]): r["weight"] for r in apply_events(edges, ev).collect()}
    assert out == {(0, 1): 1.0}


def test_graph_difference(spark):
    from icebug_spark.streaming.dynamic import graph_difference

    a = _edges(spark, [(0, 1, 1.0), (1, 2, 2.0), (2, 3, 1.0)])
    b = _edges(spark, [(0, 1, 1.0), (1, 2, 9.0), (4, 5, 1.0)])
    diff = {(r["type"], r["u"], r["v"]): r["w"] for r in graph_difference(a, b).collect()}
    assert diff == {
        ("EDGE_WEIGHT_UPDATE", 1, 2): 9.0,
        ("EDGE_REMOVAL", 2, 3): 0.0,
        ("EDGE_ADDITION", 4, 5): 1.0,
    }


def test_replay_by_timestep(spark):
    from icebug_spark.streaming.dynamic import replay_by_timestep

    edges = _edges(spark, [])
    ev = _events(
        spark,
        [
            (1, "EDGE_ADDITION", 0, 1, 1.0),
            (2, "TIME_STEP", None, None, None),
            (3, "EDGE_ADDITION", 1, 2, 1.0),
            (4, "EDGE_REMOVAL", 0, 1, None),
        ],
    )
    states = replay_by_timestep(edges, ev)
    assert len(states) == 2
    s1 = {(r["src"], r["dst"]) for r in states[0].collect()}
    s2 = {(r["src"], r["dst"]) for r in states[1].collect()}
    assert s1 == {(0, 1)}
    assert s2 == {(1, 2)}


def test_incremental_degrees_matches_recompute(spark):
    from icebug_spark.streaming.dynamic import apply_events, incremental_degrees

    edges = _edges(spark, [(0, 1, 1.0), (1, 2, 1.0)])
    deg0 = (
        edges.select(F.col("src").alias("id")).union(edges.select(F.col("dst").alias("id")))
        .groupBy("id").agg(F.count(F.lit(1)).alias("degree"))
    )
    ev = _events(spark, [(1, "EDGE_ADDITION", 2, 3, 1.0), (2, "EDGE_REMOVAL", 0, 1, None)])
    inc = {r["id"]: r["degree"] for r in incremental_degrees(deg0, ev).collect()}
    new_edges = apply_events(edges, ev)
    full = {
        r["id"]: r["degree"]
        for r in new_edges.select(F.col("src").alias("id"))
        .union(new_edges.select(F.col("dst").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("degree"))
        .collect()
    }
    assert inc == full


def test_streaming_window_matches_batch(spark, sf_dir, tmp_path):
    """Structured Streaming windowed counts == batch equivalent on the
    same data (availableNow trigger, memory sink)."""
    from icebug_spark.catalog import table
    from icebug_spark.streaming.windows import (
        run_batch_equivalent,
        streaming_events,
        tumbling_counts,
    )

    events = table(spark, sf_dir, "events")
    src_dir = str(tmp_path / "stream_src")
    events.write.mode("overwrite").parquet(src_dir)
    stream = streaming_events(spark, src_dir, events.schema)
    q = (
        tumbling_counts(stream, watermark="0 seconds")
        .writeStream.format("memory")
        .queryName("win_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (str(r["window_start"]), r["event_type"]): r["n_events"]
        for r in spark.sql("select * from win_test").collect()
    }
    want = {
        (str(r["window_start"]), r["event_type"]): r["n_events"]
        for r in run_batch_equivalent(spark, sf_dir).collect()
    }
    assert got == want and len(got) > 0


def test_streaming_text_pipeline_matches_batch(spark, sf_dir, tmp_path):
    """The text-analysis pipeline (stats -> quality -> language id) is
    pure stateless column algebra, so the SAME functions run unchanged
    on a readStream source — the streaming-ingest shape of a training
    -data filter. Prove stream == batch on the documents table."""
    import shutil

    from icebug_spark.llm.textstats import language_id, quality_score

    src = str(tmp_path / "docs")
    spark.read.parquet(f"{sf_dir}/documents.parquet").write.parquet(src)
    batch_docs = spark.read.parquet(src)
    want = sorted(
        tuple(r)
        for r in quality_score(batch_docs)
        .join(language_id(batch_docs).select("doc_id", "pred_lang"), "doc_id")
        .select("doc_id", "quality", "pred_lang")
        .collect()
    )

    stream = spark.readStream.schema(batch_docs.schema).parquet(src)
    out = (
        quality_score(stream)
        .join(language_id(stream).select("doc_id", "pred_lang"), "doc_id")
        .select("doc_id", "quality", "pred_lang")
    )
    q = (
        out.writeStream.format("memory")
        .queryName("txtpipe")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(tuple(r) for r in spark.sql("SELECT * FROM txtpipe").collect())
    assert got == want
    shutil.rmtree(str(tmp_path / "ckpt"), ignore_errors=True)
