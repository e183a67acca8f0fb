"""Streaming dedup vs batch-twin parity.

The input corpus is split into several parquet files and streamed with
maxFilesPerTrigger=1, so the incremental path really runs across
multiple micro-batches (inter-batch state joins exercised), then the
accumulated result is compared against the one-shot batch operator on
the same rows.
"""

import pytest
from pyspark.sql import functions as F

from icebug_spark.llm import dedup as batch_dedup
from icebug_spark.streaming.dedup import (
    DOC_SCHEMA,
    run_streaming_lsh_dedup,
    streaming_exact_dedup,
)

DOCS = [
    # three exact-dup groups (b == a modulo whitespace/case), plus near
    # dups sharing most 3-shingles, plus unique docs
    (0, "the quick brown fox jumps over the lazy dog", "en", "web", 43),
    (1, "The  quick brown fox jumps over the lazy dog ", "en", "web", 45),
    (2, "an entirely different document about spark engines", "en", "web", 50),
    (3, "the quick brown fox jumps over the lazy cat", "en", "web", 43),
    (4, "an entirely different document about spark engines", "en", "crawl", 50),
    (5, "completely unrelated text with its own words here", "en", "web", 49),
    (6, "the quick brown fox jumps over the lazy dog", "en", "crawl", 43),
    (7, "another unique document mentioning nothing shared", "en", "web", 49),
    (8, "an entirely different document about flink engines", "en", "web", 50),
]


@pytest.fixture()
def doc_dir(spark, tmp_path):
    p = str(tmp_path / "docs_stream")
    df = spark.createDataFrame(DOCS, DOC_SCHEMA)
    # 3 files -> 3 micro-batches at maxFilesPerTrigger=1
    df.repartition(3, "doc_id").write.parquet(p)
    return p


def test_streaming_exact_dedup_matches_batch(spark, doc_dir, tmp_path):
    out = (
        streaming_exact_dedup(spark, doc_dir, max_files_per_trigger=1)
        .writeStream.format("memory")
        .queryName("dedup_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    out.awaitTermination()
    got = spark.sql("SELECT * FROM dedup_sink").collect()
    batch = batch_dedup.exact_duplicates(
        spark.createDataFrame(DOCS, DOC_SCHEMA)
    ).collect()
    # one survivor per fingerprint group, fingerprints identical to batch
    assert len(got) == len(batch)
    assert {r["fp"] for r in got} == {r["fp"] for r in batch}
    # every emitted doc is a member of its fp group in the batch manifest
    batch_groups = {r["fp"]: r["n_copies"] for r in batch}
    for r in got:
        assert r["fp"] in batch_groups


def test_streaming_lsh_pairs_match_batch_candidates(spark, doc_dir):
    sink = run_streaming_lsh_dedup(
        spark, doc_dir, n=3, num_hashes=16, bands=4, max_files_per_trigger=1
    )
    assert sink.n_batches >= 2, "stream must have run multiple micro-batches"
    got = {(r["doc_a"], r["doc_b"]) for r in sink.pairs.collect()}

    docs = spark.createDataFrame(DOCS, DOC_SCHEMA)
    bb = batch_dedup.band_buckets(docs, n=3, num_hashes=16, bands=4)
    a = bb.select(F.col("doc_id").alias("doc_a"), "band", "bucket")
    b = bb.select(F.col("doc_id").alias("doc_b"), "band", "bucket")
    expect = {
        (r["doc_a"], r["doc_b"])
        for r in a.join(b, ["band", "bucket"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
        .collect()
    }
    assert got == expect
    # sanity: the exact-dup groups must be candidate pairs
    assert (0, 1) in got and (0, 6) in got and (2, 4) in got


def test_streaming_lsh_state_accumulates(spark, doc_dir):
    sink = run_streaming_lsh_dedup(spark, doc_dir, max_files_per_trigger=1)
    # state holds every doc x band
    n_docs = sink.state.select("doc_id").distinct().count()
    assert n_docs == len(DOCS)
    assert sink.state.count() == len(DOCS) * 4


def _batch_candidate_pairs(spark):
    docs = spark.createDataFrame(DOCS, DOC_SCHEMA)
    bb = batch_dedup.band_buckets(docs, n=3, num_hashes=16, bands=4)
    a = bb.select(F.col("doc_id").alias("doc_a"), "band", "bucket")
    b = bb.select(F.col("doc_id").alias("doc_b"), "band", "bucket")
    return {
        (r["doc_a"], r["doc_b"])
        for r in a.join(b, ["band", "bucket"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
        .collect()
    }


def test_streaming_lsh_persisted_state_matches_batch(spark, doc_dir):
    """The CLUSTER state shape: bucketed managed state table, per-batch
    appends, no full-history distinct — same multi-batch parity as the
    in-memory path, PLUS (a) the appended pairs table is duplicate-free
    without any read-time dedup, and (b) the per-batch probe join plans
    a bucketed scan of the state side with no Exchange above it."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        sink = run_streaming_lsh_dedup(
            spark,
            doc_dir,
            n=3,
            num_hashes=16,
            bands=4,
            max_files_per_trigger=1,
            state_table="lsh_stream_t",
        )
        assert sink.n_batches >= 2
        rows = [(r["doc_a"], r["doc_b"]) for r in sink.pairs.collect()]
        # (a) exactly-once per pair: append-only, yet no duplicates
        assert len(rows) == len(set(rows))
        assert set(rows) == _batch_candidate_pairs(spark)
        # state table holds every doc x band and IS bucketed
        assert sink.state.count() == len(DOCS) * 4
        ddl = spark.sql("SHOW CREATE TABLE lsh_stream_t__state").collect()[0][0]
        assert "CLUSTERED BY" in ddl and "band" in ddl and "bucket" in ddl
        # (b) probe-join plan: bucketed state scan, no Exchange on it
        plan = sink.last_probe_plan
        assert plan is not None and "Bucketed: true" in plan, plan
        state_scan = plan[plan.index("lsh_stream_t__state"):]
        # the state-side FileScan is a leaf below the join — any Exchange
        # in the plan belongs to the (small) batch side, textually ABOVE
        # the state scan line in Spark's tree printout
        assert "Exchange" not in state_scan, plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS lsh_stream_t__state")
        spark.sql("DROP TABLE IF EXISTS lsh_stream_t__pairs")


def test_streaming_lsh_persisted_restart_and_replay(spark, tmp_path):
    """Restart safety: a sink RECONSTRUCTED against an existing stream
    checkpoint (fresh object, batch_id > 0) must keep the accrued state
    and end up matching the batch twin over the whole corpus; and an
    at-least-once foreachBatch redelivery (same batch_id twice) must be
    a no-op for both tables."""
    doc_dir = str(tmp_path / "docs_restart")
    ckpt = str(tmp_path / "docs_restart_ckpt")
    df = spark.createDataFrame(DOCS, DOC_SCHEMA)
    first = df.where(F.col("doc_id") < 5)
    rest = df.where(F.col("doc_id") >= 5)
    first.repartition(2, "doc_id").write.parquet(doc_dir)
    try:
        s1 = run_streaming_lsh_dedup(
            spark, doc_dir, max_files_per_trigger=1,
            checkpoint_dir=ckpt, state_table="lsh_restart_t",
        )
        assert s1.n_batches >= 2
        n_state_1 = s1.state.count()
        # the stream "crashes"; more files land; a FRESH sink resumes
        # from the same checkpoint — old code dropped the state here
        rest.repartition(2, "doc_id").write.mode("append").parquet(doc_dir)
        s2 = run_streaming_lsh_dedup(
            spark, doc_dir, max_files_per_trigger=1,
            checkpoint_dir=ckpt, state_table="lsh_restart_t",
        )
        assert s2.state.count() > n_state_1  # accrued + new, not reset
        rows = [(r["doc_a"], r["doc_b"]) for r in s2.pairs.collect()]
        assert len(rows) == len(set(rows))
        assert set(rows) == _batch_candidate_pairs(spark)

        # at-least-once redelivery: replay the LAST batch id manually
        last_bid = 10_000  # a fresh id first, then the same id again
        extra = spark.createDataFrame(
            [(99, "the quick brown fox jumps over the lazy dog", "en", "web", 43)],
            DOC_SCHEMA,
        )
        s2.process(extra, last_bid)
        pairs_once = sorted(
            (r["doc_a"], r["doc_b"]) for r in s2.pairs.collect()
        )
        state_once = s2.state.count()
        s2.process(extra, last_bid)  # redelivery -> no-op
        assert s2.state.count() == state_once
        assert sorted((r["doc_a"], r["doc_b"]) for r in s2.pairs.collect()) == pairs_once
    finally:
        spark.sql("DROP TABLE IF EXISTS lsh_restart_t__state")
        spark.sql("DROP TABLE IF EXISTS lsh_restart_t__pairs")


def _batch_substr_expected(spark):
    docs = spark.createDataFrame(DOCS, DOC_SCHEMA)
    return {
        (r["doc_id"], r["n_tokens"], r["dup_tokens"], r["dup_frac"])
        for r in batch_dedup.duplicated_span_stats(docs, k=8, min_count=2).collect()
    }


def test_streaming_substr_dedup_matches_batch(spark, doc_dir, tmp_path):
    from icebug_spark.streaming.dedup import run_streaming_substr_dedup

    sink = run_streaming_substr_dedup(
        spark,
        doc_dir,
        k=8,
        min_count=2,
        max_files_per_trigger=1,
        checkpoint_dir=str(tmp_path / "substr_ckpt"),
    )
    assert sink.n_batches >= 2, "stream must have run multiple micro-batches"
    got = {
        (r["doc_id"], r["n_tokens"], r["dup_tokens"], r["dup_frac"])
        for r in sink.finalize().collect()
    }
    expect = _batch_substr_expected(spark)
    assert got == expect
    # some doc really is span-flagged (docs 0/1/6 share 8-grams)
    assert any(t[2] > 0 for t in got)


def test_streaming_substr_dedup_persisted_state(spark, doc_dir, tmp_path):
    import shutil

    from icebug_spark.streaming.dedup import run_streaming_substr_dedup

    parts = ["occ", "counts", "covered", "tokens"]
    # heal any stale warehouse directory from a crashed earlier session:
    # a fresh session's catalog doesn't know the old table, so DROP at
    # batch 0 is a no-op and saveAsTable dies on LOCATION_ALREADY_EXISTS
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for part in parts:
        spark.sql(f"DROP TABLE IF EXISTS substr_state_t__{part}")
        shutil.rmtree(f"{wh}/substr_state_t__{part}", ignore_errors=True)
    try:
        sink = run_streaming_substr_dedup(
            spark,
            doc_dir,
            k=8,
            min_count=2,
            max_files_per_trigger=1,
            checkpoint_dir=str(tmp_path / "substr_ckpt_p"),
            state_table="substr_state_t",
            state_buckets=4,
        )
        got = {
            (r["doc_id"], r["n_tokens"], r["dup_tokens"], r["dup_frac"])
            for r in sink.finalize().collect()
        }
        assert got == _batch_substr_expected(spark)
        # covered table is append-only and globally duplicate-free
        cov = spark.table("substr_state_t__covered")
        assert cov.count() == cov.select("doc_id", "cpos").distinct().count()
        # replaying the LAST batch must be a no-op (idempotent appends)
        last = int(
            cov.agg(F.max("batch_id").alias("m")).collect()[0]["m"]
        )
        docs = spark.createDataFrame(DOCS, DOC_SCHEMA)
        before = cov.count()
        sink.process(docs.limit(0), last)  # re-delivery of a landed id
        assert spark.table("substr_state_t__covered").count() == before
    finally:
        # drop inside THIS session so catalog + location both go away
        for part in parts:
            spark.sql(f"DROP TABLE IF EXISTS substr_state_t__{part}")
