"""Streaming GraphUpdater: foreachBatch stream must equal batch apply_events
(stream/batch parity), handlers observe every batch."""

from pyspark.sql import functions as F

from icebug_spark.streaming.dynamic import apply_events
from icebug_spark.streaming.updater import EVENT_SCHEMA, run_graph_updater


def test_stream_matches_batch(spark, tmp_path):
    ev_rows = [
        (0, "EDGE_ADDITION", 0, 1, 1.0),
        (1, "EDGE_ADDITION", 1, 2, 2.0),
        (2, "EDGE_WEIGHT_UPDATE", 0, 1, 5.0),
        (3, "EDGE_ADDITION", 2, 3, 1.0),
        (4, "EDGE_REMOVAL", 1, 2, None),
    ]
    events = spark.createDataFrame(ev_rows, EVENT_SCHEMA)
    ev_dir = str(tmp_path / "events")
    events.coalesce(1).write.parquet(ev_dir)

    init = spark.createDataFrame([], "src BIGINT, dst BIGINT, weight DOUBLE")
    seen = []
    upd = run_graph_updater(
        spark,
        ev_dir,
        init,
        checkpoint_dir=str(tmp_path / "ckpt"),
        handlers=[lambda edges, bid: seen.append(bid)],
    )
    got = sorted(map(tuple, upd.edges.collect()))
    exp = sorted(map(tuple, apply_events(init, events).collect()))
    assert got == exp
    assert got == [(0, 1, 5.0), (2, 3, 1.0)]
    assert upd.n_batches >= 1 and len(seen) == upd.n_batches
