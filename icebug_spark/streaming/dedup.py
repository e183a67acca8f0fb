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
  row per (doc, band). The cluster shape is IMPLEMENTED (not just
  documented): pass ``state_table`` and state persists as a managed
  table bucketed by (band, bucket) — exactly the probe-join key — with
  append-only growth for both state and pairs and no full-history
  distinct (see the class docstring for the exactly-once argument).
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
    (doc_id, band, bucket) table.

    Two state backends:

    - in-memory (default, ``state_table=None``): state and pairs are
      checkpointed session DataFrames — the simple test-harness shape.
    - persisted (``state_table="name"``): the CLUSTER shape. State lives
      in a managed parquet table BUCKETED BY (band, bucket) — exactly
      the probe-join key, so each micro-batch's inter-batch join plans
      a bucketed scan with NO Exchange on the (large) state side — and
      both state and pairs grow by per-batch APPENDS only. No
      full-history ``distinct`` is ever run: a pair (a, b) with arrival
      times t_a <= t_b can only materialize in batch t_b (intra-batch
      if t_a == t_b, else against the state snapshot that already holds
      a), so deduplicating each batch's OWN output — multi-band hits —
      makes the appended table globally duplicate-free by construction.
      Per-batch work is O(batch ⋈ state-buckets), not O(total-pairs).

      RESTART/REPLAY SAFETY: both tables carry a ``batch_id`` column.
      The tables are reset only on ``batch_id == 0`` (a genuinely fresh
      stream checkpoint) — a sink reconstructed against an existing
      checkpoint resumes with its accrued state intact. foreachBatch is
      at-least-once: a re-delivered batch id is detected per table and
      its append skipped (the two appends are checked independently, so
      a crash BETWEEN them re-appends exactly the missing one). This is
      the standard idempotent-foreachBatch recipe; on a cluster the
      same pattern runs against Delta/Iceberg with replaceWhere.
    """

    def __init__(
        self,
        n: int = 3,
        num_hashes: int = 16,
        bands: int = 4,
        state_table: str | None = None,
        state_buckets: int = 8,
    ):
        self.n = n
        self.num_hashes = num_hashes
        self.bands = bands
        self.state: DataFrame | None = None
        self.pairs: DataFrame | None = None
        self.n_batches = 0
        self.state_table = state_table
        self.state_buckets = state_buckets
        #: physical plan of the last inter-batch probe join (persisted
        #: mode) — lets tests assert the bucketed-scan / no-state-side-
        #: Exchange property of the per-batch work.
        self.last_probe_plan: str | None = None

    @property
    def _state_name(self) -> str:
        return f"{self.state_table}__state"

    @property
    def _pairs_name(self) -> str:
        return f"{self.state_table}__pairs"

    def _new_pairs(self, nb: DataFrame, prior: DataFrame | None) -> DataFrame:
        """Candidate pairs contributed by THIS batch: intra-batch plus
        new-vs-prior-state; deduped within the batch output only."""
        a = nb.select(F.col("doc_id").alias("doc_a"), "band", "bucket")
        b = nb.select(F.col("doc_id").alias("doc_b"), "band", "bucket")
        new_pairs = (
            a.join(b, ["band", "bucket"])
            .where(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b")
        )
        if prior is not None:
            inter = (
                nb.join(
                    prior.select(F.col("doc_id").alias("prior_id"), "band", "bucket"),
                    ["band", "bucket"],
                )
                .where(F.col("prior_id") != F.col("doc_id"))
                .select(
                    F.least("prior_id", "doc_id").alias("doc_a"),
                    F.greatest("prior_id", "doc_id").alias("doc_b"),
                )
            )
            self.last_probe_plan = (
                inter._jdf.queryExecution().executedPlan().toString()
            )
            new_pairs = new_pairs.unionByName(inter)
        return new_pairs.distinct()

    def process(self, batch_df: DataFrame, batch_id: int) -> None:
        nb = band_buckets(
            batch_df, self.n, self.num_hashes, self.bands
        ).localCheckpoint(eager=True)
        if self.state_table is not None:
            self._process_persisted(batch_df.sparkSession, nb, batch_id)
        else:
            new_pairs = self._new_pairs(nb, self.state)
            self.pairs = (
                new_pairs
                if self.pairs is None
                else self.pairs.unionByName(new_pairs)
            ).localCheckpoint(eager=True)
            self.state = (
                nb if self.state is None else self.state.unionByName(nb)
            ).localCheckpoint(eager=True)
        self.n_batches += 1

    def _process_persisted(
        self, spark: SparkSession, nb: DataFrame, batch_id: int
    ) -> None:
        # reset ONLY on a genuinely fresh stream (batch_id 0) — a sink
        # reconstructed against an existing checkpoint (restart) arrives
        # with batch_id > 0 and must keep the accrued state
        if batch_id == 0:
            spark.sql(f"DROP TABLE IF EXISTS {self._state_name}")
            spark.sql(f"DROP TABLE IF EXISTS {self._pairs_name}")
        have_state = spark.catalog.tableExists(self._state_name)
        prior = spark.table(self._state_name) if have_state else None
        # at-least-once replay guard, per table (a crash between the two
        # appends re-delivers the batch; each append skips independently)
        state_done = have_state and self._has_batch(prior, batch_id)
        pairs_done = spark.catalog.tableExists(self._pairs_name) and self._has_batch(
            spark.table(self._pairs_name), batch_id
        )
        if not pairs_done:
            new_pairs = self._new_pairs(
                nb, prior.where(F.col("batch_id") != batch_id) if have_state else None
            )
            # append-only growth: per-batch candidates are globally
            # unique by construction (see class docstring)
            new_pairs.withColumn("batch_id", F.lit(batch_id)).write.mode(
                "append"
            ).saveAsTable(self._pairs_name)
        if not state_done:
            # state bucketed by the probe-join key: the next batch's join
            # scans the buckets in place (no Exchange on the state side)
            nb.withColumn("batch_id", F.lit(batch_id)).write.mode(
                "append"
            ).bucketBy(self.state_buckets, "band", "bucket").saveAsTable(
                self._state_name
            )
        self.pairs = spark.table(self._pairs_name).drop("batch_id")
        self.state = spark.table(self._state_name).drop("batch_id")

    @staticmethod
    def _has_batch(df: DataFrame, batch_id: int) -> bool:
        return df.where(F.col("batch_id") == batch_id).limit(1).count() > 0


def run_streaming_lsh_dedup(
    spark: SparkSession,
    doc_dir: str,
    schema: str = DOC_SCHEMA,
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    max_files_per_trigger: int = 1,
    checkpoint_dir: str | None = None,
    state_table: str | None = None,
    state_buckets: int = 8,
) -> StreamingLshDedup:
    """Drive :class:`StreamingLshDedup` over ``doc_dir`` with an
    availableNow trigger (one micro-batch per ``max_files_per_trigger``
    files) and block until the backlog drains. The checkpoint lives in a
    SIBLING directory by default — inside ``doc_dir`` it would sit in
    the file source's watched tree. ``state_table`` switches to the
    persisted bucketed-state backend (the cluster shape)."""
    sink = StreamingLshDedup(
        n, num_hashes, bands, state_table=state_table, state_buckets=state_buckets
    )
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
