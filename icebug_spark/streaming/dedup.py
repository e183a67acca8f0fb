"""Streaming deduplication over a document stream.

Training-data pipelines ingest continuously; dedup must run AS the data
arrives, not as a nightly batch over the full corpus. Two operators:

- :func:`streaming_exact_dedup` — exact dedup as a pure Structured
  Streaming plan: fingerprint (same normalization as the batch
  ``llm.dedup.exact_duplicates``) + ``dropDuplicates`` — Spark's
  built-in stateful operator keeps one state row per distinct
  fingerprint and emits only first-seen docs. At production scale add
  ``withWatermark`` + ``dropDuplicatesWithinWatermark`` to bound state.

- :class:`StreamingLshDedup` — incremental MinHash-LSH near-dup
  flagging via ``foreachBatch``: a persistent (band, bucket, doc_id)
  state table accrues one row set per arrived doc; each micro-batch's
  docs join the state (docs that arrived before them) plus themselves,
  so the union of flagged pairs over the stream equals the batch LSH
  candidate set over the same corpus (asserted in tests with
  maxFilesPerTrigger-split input). Bucket keys come from the SAME
  ``llm.dedup.band_buckets`` used by the batch path — stream/batch
  parity by construction, not by re-implementation. State grows one
  row per (doc, band); at cluster scale it is a compacted Delta/bucketed
  table keyed by (band, bucket) — exactly the join key — so each batch's
  probe is a co-located join, never a full-state scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from icebug_spark.llm.dedup import band_buckets

DOC_SCHEMA = "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"


def fingerprint_col():
    """md5 of the whitespace-normalized lowercase text — the identical
    expression the batch ``exact_duplicates`` fingerprint uses."""
    return F.md5(F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "))


def streaming_exact_dedup(
    spark: SparkSession,
    doc_dir: str,
    schema: str = DOC_SCHEMA,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """readStream plan emitting first-seen docs per fingerprint. Pure
    declarative streaming (no foreachBatch): fingerprint projection +
    ``dropDuplicates`` stateful op. Returns the streaming DataFrame —
    callers attach their sink/trigger."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return (
        reader.parquet(doc_dir)
        .withColumn("fp", fingerprint_col())
        .dropDuplicates(["fp"])
    )


class StreamingLshDedup:
    """foreachBatch sink maintaining banded-LSH dedup state.

    After the stream drains: ``pairs`` holds (doc_a, doc_b) candidate
    near-dup pairs (doc_a < doc_b, distinct), ``state`` the accumulated
    (doc_id, band, bucket) table."""

    def __init__(self, n: int = 3, num_hashes: int = 16, bands: int = 4):
        self.n = n
        self.num_hashes = num_hashes
        self.bands = bands
        self.state: DataFrame | None = None
        self.pairs: DataFrame | None = None
        self.n_batches = 0

    def process(self, batch_df: DataFrame, batch_id: int) -> None:
        nb = band_buckets(
            batch_df, self.n, self.num_hashes, self.bands
        ).localCheckpoint(eager=True)
        # intra-batch candidates
        a = nb.select(F.col("doc_id").alias("doc_a"), "band", "bucket")
        b = nb.select(F.col("doc_id").alias("doc_b"), "band", "bucket")
        new_pairs = (
            a.join(b, ["band", "bucket"])
            .where(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b")
        )
        if self.state is not None:
            # inter-batch: new docs vs everything that arrived before
            prior = self.state.select(
                F.col("doc_id").alias("prior_id"), "band", "bucket"
            )
            inter = (
                nb.join(prior, ["band", "bucket"])
                .where(F.col("prior_id") != F.col("doc_id"))
                .select(
                    F.least("prior_id", "doc_id").alias("doc_a"),
                    F.greatest("prior_id", "doc_id").alias("doc_b"),
                )
            )
            new_pairs = new_pairs.unionByName(inter)
        new_pairs = new_pairs.distinct()
        self.pairs = (
            new_pairs
            if self.pairs is None
            else self.pairs.unionByName(new_pairs).distinct()
        ).localCheckpoint(eager=True)
        self.state = (
            nb if self.state is None else self.state.unionByName(nb)
        ).localCheckpoint(eager=True)
        self.n_batches += 1


def run_streaming_lsh_dedup(
    spark: SparkSession,
    doc_dir: str,
    schema: str = DOC_SCHEMA,
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    max_files_per_trigger: int = 1,
    checkpoint_dir: str | None = None,
) -> StreamingLshDedup:
    """Drive :class:`StreamingLshDedup` over ``doc_dir`` with an
    availableNow trigger (one micro-batch per ``max_files_per_trigger``
    files) and block until the backlog drains. The checkpoint lives in a
    SIBLING directory by default — inside ``doc_dir`` it would sit in
    the file source's watched tree."""
    sink = StreamingLshDedup(n, num_hashes, bands)
    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(doc_dir)
        .writeStream.foreachBatch(sink.process)
        .trigger(availableNow=True)
        .option(
            "checkpointLocation",
            checkpoint_dir or f"{doc_dir.rstrip('/')}_lsh_ckpt",
        )
        .start()
    )
    q.awaitTermination()
    return sink
