"""Streaming stateful sessionization: cross-micro-batch state must
reproduce the batch q17 aggregates exactly."""

import glob
import os

import pytest


@pytest.fixture(scope="module")
def event_files(spark, tmp_path_factory):
    """Split the real sf0.001 events into 3 time-ordered parquet files so
    a maxFilesPerTrigger=1 stream replays them as 3 micro-batches with
    per-user time order preserved across batches."""
    from pyspark.sql import functions as F

    from icebug_spark.catalog import table

    src = table(spark, "/root/testdata/sf0.001", "events")
    base = str(tmp_path_factory.mktemp("evt"))
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    # slice by global time terciles (ties broken by nothing — a tie
    # crossing a slice boundary stays time-ordered anyway)
    t1, t2 = (
        src.select(ts_us.alias("u"))
        .approxQuantile("u", [0.34, 0.67], 0.0)
    )
    parts = [
        src.where(ts_us <= t1),
        src.where((ts_us > t1) & (ts_us <= t2)),
        src.where(ts_us > t2),
    ]
    for i, p in enumerate(parts):
        p.coalesce(1).write.mode("overwrite").parquet(f"{base}/stage{i}")
        (f,) = glob.glob(f"{base}/stage{i}/part-*.parquet")
        os.rename(f, f"{base}/{i:02d}.parquet")
    return base


def test_stateful_sessionize_matches_batch_q17(spark, event_files):
    from icebug_spark.catalog import table
    from icebug_spark.queries.relational import q17
    from icebug_spark.streaming.sessions import sessionize_with_state

    schema = table(spark, "/root/testdata/sf0.001", "events").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{event_files}/*.parquet")
    )
    out = sessionize_with_state(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("sess_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    # several update rows per user (one per batch that touched them):
    # the LAST per user is the running total after all batches
    rows = spark.sql(
        "SELECT user_id, n_events, n_sessions FROM sess_test"
    ).collect()
    # running aggregates are monotone, so the final state per user is the
    # row with the max n_events (robust to memory-sink row ordering)
    last: dict[int, tuple] = {}
    for r in rows:
        cur = (r["n_events"], r["n_sessions"])
        if r["user_id"] not in last or cur[0] > last[r["user_id"]][0]:
            last[r["user_id"]] = cur

    want = {
        r["user_id"]: (r["n_events"], r["n_sessions"])
        for r in q17(spark, "/root/testdata/sf0.001").collect()
    }
    assert last == want
    # state really crossed batches: at least one user got >1 update row
    from collections import Counter

    per_user_updates = Counter(r["user_id"] for r in rows)
    assert max(per_user_updates.values()) > 1
