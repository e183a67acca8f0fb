"""Streaming ANN index vs batch-twin parity.

The embedding corpus is split into several parquet files and streamed
with maxFilesPerTrigger=1 so the index really accretes across multiple
micro-batches; the accumulated index and its top-k answers are then
compared against the one-shot batch SRP path on the same rows.
"""

import math

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from icebug_spark.llm.similarity import _dot, _norm2, srp_buckets
from icebug_spark.streaming.ann import EMB_SCHEMA, run_streaming_ann_index

PLANES = 6


def _vec(i):
    # deterministic unit-ish vectors in 4d with clusters by i % 3
    base = [[1.0, 0.1, 0.0, 0.0], [0.0, 1.0, 0.1, 0.0], [0.0, 0.0, 1.0, 0.1]][i % 3]
    return [float(x + 0.01 * i) for x in base]


ROWS = [(i, _vec(i), i % 3) for i in range(24)]


@pytest.fixture()
def emb_dir(spark, tmp_path):
    p = str(tmp_path / "emb_stream")
    df = spark.createDataFrame(ROWS, EMB_SCHEMA)
    df.repartition(3, "vec_id").write.parquet(p)
    return p


def _batch_topk(spark, k):
    """Batch twin: same SRP buckets, same exact-cosine-in-bucket top-k."""
    emb = spark.createDataFrame(ROWS, EMB_SCHEMA)
    b = srp_buckets(emb, PLANES)
    q = emb.join(b, "vec_id").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qemb"), "bucket"
    )
    c = emb.join(b, "vec_id").select("vec_id", "embedding", "bucket")
    scored = (
        q.join(c, "bucket")
        .where(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(
                _dot(F.col("qemb"), F.col("embedding"))
                / (F.sqrt(_norm2(F.col("qemb"))) * F.sqrt(_norm2(F.col("embedding")))),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return {
        (r["query_id"], r["vec_id"], r["cosine"], r["rnk"])
        for r in scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= k)
        .collect()
    }


def test_streaming_ann_index_matches_batch_buckets(spark, emb_dir):
    sink = run_streaming_ann_index(spark, emb_dir, planes=PLANES)
    assert sink.n_batches >= 2, "stream must have run multiple micro-batches"
    got = {(r["vec_id"], r["bucket"]) for r in sink.index.collect()}
    emb = spark.createDataFrame(ROWS, EMB_SCHEMA)
    expect = {(r["vec_id"], r["bucket"]) for r in srp_buckets(emb, PLANES).collect()}
    assert got == expect


def test_streaming_ann_topk_matches_batch(spark, emb_dir):
    sink = run_streaming_ann_index(spark, emb_dir, planes=PLANES)
    queries = spark.createDataFrame(ROWS, EMB_SCHEMA).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = {
        (r["query_id"], r["vec_id"], r["cosine"], r["rnk"])
        for r in sink.topk(queries, k=3).collect()
    }
    assert got == _batch_topk(spark, 3)
    # clusters: a query's top hit shares its i%3 cluster (same bucket,
    # near-parallel vectors)
    top1 = {r[0]: r[1] for r in got if r[3] == 1}
    same_cluster = sum(1 for q, v in top1.items() if q % 3 == v % 3)
    assert same_cluster >= 0.8 * len(top1)


def test_streaming_ann_persisted_state(spark, emb_dir):
    """Persisted bucketed index: append-only growth, exactly one index
    row per (vector, arrival), bucketed DDL, same top-k as in-memory."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        sink = run_streaming_ann_index(
            spark, emb_dir, planes=PLANES, state_table="ann_stream_t"
        )
        assert sink.n_batches >= 2
        rows = [(r["vec_id"], r["bucket"]) for r in sink.index.collect()]
        assert len(rows) == len(ROWS)  # one row per vector, no dups
        ddl = spark.sql("SHOW CREATE TABLE ann_stream_t__index").collect()[0][0]
        assert "CLUSTERED BY" in ddl and "bucket" in ddl
        queries = spark.createDataFrame(ROWS, EMB_SCHEMA).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        got = {
            (r["query_id"], r["vec_id"], r["cosine"], r["rnk"])
            for r in sink.topk(queries, k=3).collect()
        }
        assert got == _batch_topk(spark, 3)
        # the probe join against the persisted index plans a bucketed scan
        plan = (
            sink.topk(queries, k=3)._jdf.queryExecution().executedPlan().toString()
        )
        assert "Bucketed: true" in plan, plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS ann_stream_t__index")

def test_streaming_ann_persisted_restart_and_replay(spark, tmp_path):
    """Restart safety (same contract as the dedup sibling): a fresh
    sink resuming an existing checkpoint keeps the accrued index; a
    redelivered batch_id appends nothing."""
    emb_dir = str(tmp_path / "emb_restart")
    ckpt = str(tmp_path / "emb_restart_ckpt")
    df = spark.createDataFrame(ROWS, EMB_SCHEMA)
    df.where(F.col("vec_id") < 12).repartition(2, "vec_id").write.parquet(emb_dir)
    try:
        s1 = run_streaming_ann_index(
            spark, emb_dir, planes=PLANES,
            checkpoint_dir=ckpt, state_table="ann_restart_t",
        )
        n1 = s1.index.count()
        df.where(F.col("vec_id") >= 12).repartition(2, "vec_id").write.mode(
            "append"
        ).parquet(emb_dir)
        s2 = run_streaming_ann_index(
            spark, emb_dir, planes=PLANES,
            checkpoint_dir=ckpt, state_table="ann_restart_t",
        )
        assert n1 > 0 and s2.index.count() == len(ROWS)  # accrued, not reset
        got = {(r["vec_id"], r["bucket"]) for r in s2.index.collect()}
        expect = {
            (r["vec_id"], r["bucket"])
            for r in srp_buckets(
                spark.createDataFrame(ROWS, EMB_SCHEMA), PLANES
            ).collect()
        }
        assert got == expect
        # redelivery no-op
        extra = spark.createDataFrame([(999, _vec(0), 0)], EMB_SCHEMA)
        s2.process(extra, 10_000)
        n_once = s2.index.count()
        s2.process(extra, 10_000)
        assert s2.index.count() == n_once
    finally:
        spark.sql("DROP TABLE IF EXISTS ann_restart_t__index")


def test_streaming_ann_topk_exclude_self_flag(spark, emb_dir):
    """exclude_self=False keeps the self-match (rank 1, cosine 1.0) —
    the correct setting when query ids are a separate namespace."""
    sink = run_streaming_ann_index(spark, emb_dir, planes=PLANES)
    queries = spark.createDataFrame(ROWS[:3], EMB_SCHEMA).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    with_self = sink.topk(queries, k=3, exclude_self=False)
    top1 = {
        r["query_id"]: (r["vec_id"], r["cosine"])
        for r in with_self.where(F.col("rnk") == 1).collect()
    }
    assert all(v == q and c == 1.0 for q, (v, c) in top1.items())
