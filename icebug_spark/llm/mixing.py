"""Corpus-assembly operators: data mixing, sequence packing, corpus-level
boilerplate removal, and deterministic train/test splitting over the
``documents`` table.

These are the steps BETWEEN filtering/dedup and the training job in a
large-scale training-data pipeline (cf. The Pile, Gopher/MassiveText,
RefinedWeb): decide how much of each source to take (mixing), carve the
token stream into fixed-length training sequences (packing), strip lines
repeated across many documents (boilerplate), and split held-out data
reproducibly. Every operator here is deterministic — ordering keys are
portable md5 hex strings or doc ids, never engine-internal hashes — so
each has a FULL-VALUE DuckDB oracle twin.

Scale design: the per-source running token sums that drive mixing and
packing are the classic single-partition-window trap
(``Window.partitionBy(source)`` puts an entire source — possibly tens of
TB — into ONE task). Both operators instead ride
``plans.zipindex.running_sums`` (range-partition → per-partition totals
→ parallel intra-partition windows + broadcast offsets), ordered
source-major, then convert the global cumsum to a per-source one by
subtracting each source's broadcast start offset. Boilerplate removal is
two shuffles (line-frequency groupBy, doc reassembly groupBy), both keyed
fine-grained (line text / doc_id), never by source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from icebug_spark.plans.zipindex import running_sums

def _n_tokens():
    """The same token-count rule as textstats.text_stats /
    TOKEN_COUNT_SQL: whitespace-delimited tokens of the trimmed text, 0
    for blank docs. A function, not a module constant — Column
    construction needs an active session."""
    return (
        F.when(F.length(F.trim(F.col("text"))) == 0, F.lit(0))
        .otherwise(F.size(F.split(F.trim(F.col("text")), r"\s+")))
        .cast("long")
    )

_N_TOKENS_SQL = (
    "CASE WHEN length(trim(text)) = 0 THEN 0 "
    "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END"
)


def _hash_hex(salt: str):
    """Portable per-doc uniform key: md5 of ``salt:doc_id`` as lowercase
    hex. Lexicographic order on the fixed-width hex string equals numeric
    order, and Spark and DuckDB produce identical digests."""
    return F.md5(F.concat(F.lit(salt + ":"), F.col("doc_id").cast("string")))


def _per_source_cumsum(t: DataFrame, order_cols: list[str]) -> DataFrame:
    """cum_tokens = running sum of n_tokens within each source in
    (source, *order_cols) order, without a per-source single-partition
    window: one GLOBAL two-pass running sum ordered source-major, then
    subtract each source's start offset (min over the source of
    cum − n_tokens — exact because the global order is source-major).
    Input needs (source, n_tokens, *order_cols); adds ``cum_tokens``."""
    g = running_sums(
        t.withColumn("cum_tokens", F.col("n_tokens")),
        ["source", *order_cols],
        ["cum_tokens"],
    )
    offs = g.groupBy("source").agg(
        F.min(F.col("cum_tokens") - F.col("n_tokens")).alias("__src_off")
    )
    return (
        g.join(F.broadcast(offs), "source")
        .withColumn("cum_tokens", F.col("cum_tokens") - F.col("__src_off"))
        .drop("__src_off")
    )


def temperature_weights(documents: DataFrame, alpha: float = 0.5) -> DataFrame:
    """(source, total_tokens, weight): temperature-based mixture weights
    w_s ∝ T_s^alpha (alpha=1 → proportional sampling, alpha→0 → uniform
    over sources; the multilingual-sampling rule of mBERT/XLM-R and the
    domain-mixing baseline DoReMi starts from). Rounded to 6 dp so the
    value is stable across summation orders. Tiny output (one row per
    source) — the total rides a broadcast scalar, not a window."""
    per = documents.select("source", _n_tokens().alias("n_tokens")).groupBy(
        "source"
    ).agg(F.sum("n_tokens").alias("total_tokens"))
    tot = per.agg(
        F.sum(F.pow(F.col("total_tokens").cast("double"), F.lit(alpha))).alias(
            "__z"
        )
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "total_tokens",
            F.round(
                F.pow(F.col("total_tokens").cast("double"), F.lit(alpha))
                / F.col("__z"),
                6,
            ).alias("weight"),
        )
    )


def temperature_weights_sql(alpha: float = 0.5) -> str:
    return f"""
WITH per AS (
  SELECT source, CAST(SUM({_N_TOKENS_SQL}) AS BIGINT) AS total_tokens
  FROM documents GROUP BY source
)
SELECT source, total_tokens,
       ROUND(POW(CAST(total_tokens AS DOUBLE), {alpha!r})
             / (SELECT SUM(POW(CAST(total_tokens AS DOUBLE), {alpha!r})) FROM per),
             6) AS weight
FROM per
"""


def mixture_sample(
    documents: DataFrame,
    budgets: dict[str, int],
    salt: str = "mix",
) -> DataFrame:
    """Deterministic per-source token-budget sampling: within each
    source, take documents in md5(salt:doc_id) order until the running
    token count would exceed that source's budget. The hash order makes
    the sample uniform-without-replacement yet exactly reproducible (and
    stable under corpus re-partitioning — no rand(), no engine hash).
    Sources absent from ``budgets`` are dropped. → (doc_id, source,
    n_tokens, cum_tokens), full-value oracle via the same window in SQL.
    """
    spark = documents.sparkSession
    if not budgets:
        raise ValueError("empty budgets")
    b = F.broadcast(
        spark.createDataFrame(
            [(s, int(v)) for s, v in sorted(budgets.items())],
            "source STRING, budget BIGINT",
        )
    )
    t = documents.select(
        "doc_id",
        "source",
        _n_tokens().alias("n_tokens"),
        _hash_hex(salt).alias("__h"),
    ).join(b, "source")
    c = _per_source_cumsum(t, ["__h", "doc_id"])
    return (
        c.where(F.col("cum_tokens") <= F.col("budget"))
        .select("doc_id", "source", "n_tokens", "cum_tokens")
    )


def mixture_sample_sql(budgets: dict[str, int], salt: str = "mix") -> str:
    vals = ", ".join(f"('{s}', {int(v)})" for s, v in sorted(budgets.items()))
    return f"""
WITH t AS (
  SELECT doc_id, source,
         CAST({_N_TOKENS_SQL} AS BIGINT) AS n_tokens,
         md5('{salt}:' || CAST(doc_id AS VARCHAR)) AS h
  FROM documents
), b(source, budget) AS (VALUES {vals}),
c AS (
  SELECT t.doc_id, t.source, t.n_tokens, b.budget,
         SUM(t.n_tokens) OVER (PARTITION BY t.source ORDER BY t.h, t.doc_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_tokens
  FROM t JOIN b USING (source)
)
SELECT doc_id, source, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
FROM c WHERE cum_tokens <= budget
"""


def pack_sequences(documents: DataFrame, seq_len: int = 512) -> DataFrame:
    """Concat-then-chunk sequence packing (the GPT-style pretraining
    layout): within each source, documents are laid end-to-end in doc_id
    order and the token stream is cut into fixed ``seq_len`` sequences;
    each document reports its token span and the first/last sequence it
    lands in (documents may straddle sequence boundaries). Sequence ids
    are per-source — at cluster scale each source is an independent
    shard, so packing never needs a cross-source total order. →
    (doc_id, source, n_tokens, start_tok, end_tok, first_seq, last_seq).
    """
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    t = documents.select("doc_id", "source", _n_tokens().alias("n_tokens"))
    c = _per_source_cumsum(t, ["doc_id"])
    start = F.col("cum_tokens") - F.col("n_tokens")
    end = F.col("cum_tokens")
    first_seq = F.expr(f"(cum_tokens - n_tokens) DIV {int(seq_len)}")
    last_seq = F.when(F.col("n_tokens") == 0, first_seq).otherwise(
        F.expr(f"(cum_tokens - 1) DIV {int(seq_len)}")
    )
    return c.select(
        "doc_id",
        "source",
        "n_tokens",
        start.alias("start_tok"),
        end.alias("end_tok"),
        first_seq.cast("long").alias("first_seq"),
        last_seq.cast("long").alias("last_seq"),
    )


def pack_sequences_sql(seq_len: int = 512) -> str:
    return f"""
WITH t AS (
  SELECT doc_id, source, CAST({_N_TOKENS_SQL} AS BIGINT) AS n_tokens
  FROM documents
), c AS (
  SELECT *, SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM t
)
SELECT doc_id, source, n_tokens,
       CAST(cum - n_tokens AS BIGINT) AS start_tok,
       CAST(cum AS BIGINT) AS end_tok,
       CAST((cum - n_tokens) // {int(seq_len)} AS BIGINT) AS first_seq,
       CAST(CASE WHEN n_tokens = 0 THEN (cum - n_tokens) // {int(seq_len)}
                 ELSE (cum - 1) // {int(seq_len)} END AS BIGINT) AS last_seq
FROM c
"""


def boilerplate_lines(documents: DataFrame, min_docs: int = 2) -> DataFrame:
    """(line_norm, n_docs): normalized (lowercased, trimmed) non-blank
    lines that occur in at least ``min_docs`` DISTINCT documents — the
    corpus-level boilerplate inventory (headers, footers, cookie
    banners; cf. CCNet / RefinedWeb line-level dedup)."""
    lines = documents.select(
        "doc_id",
        F.explode(F.split(F.col("text"), r"\n")).alias("line"),
    ).select("doc_id", F.lower(F.trim("line")).alias("line_norm"))
    return (
        lines.where(F.length("line_norm") > 0)
        .groupBy("line_norm")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
        .where(F.col("n_docs") >= int(min_docs))
    )


BOILERPLATE_LINES_SQL_TMPL = """
WITH l AS (
  SELECT doc_id,
         lower(trim(unnest(string_split(text, chr(10))))) AS line_norm
  FROM documents
)
SELECT line_norm, COUNT(DISTINCT doc_id) AS n_docs
FROM l WHERE length(line_norm) > 0
GROUP BY line_norm HAVING COUNT(DISTINCT doc_id) >= {min_docs}
"""


def remove_boilerplate(documents: DataFrame, min_docs: int = 2) -> DataFrame:
    """Strip boilerplate lines from every document: a line is removed
    when its normalized form occurs in ≥ ``min_docs`` distinct documents
    (blank lines are never boilerplate). Documents keep their remaining
    lines in original order; a document whose every line is boilerplate
    survives with empty text. → (doc_id, clean_text, n_lines_kept,
    n_lines_removed).

    Plan shape: posexplode → line-frequency groupBy (shuffle keyed by
    line text — the hot boilerplate lines are exactly the groups being
    counted, so no join blow-up) → left-anti-style filter → reassembly
    groupBy(doc_id) with an order-restoring sort inside the aggregate.
    """
    lines = documents.select(
        "doc_id",
        F.posexplode(F.split(F.col("text"), r"\n")).alias("pos", "line"),
    ).withColumn("line_norm", F.lower(F.trim("line")))
    boiler = boilerplate_lines(documents, min_docs).select(
        "line_norm", F.lit(True).alias("__boiler")
    )
    flagged = lines.join(boiler, "line_norm", "left").withColumn(
        "__drop", F.coalesce("__boiler", F.lit(False))
    )
    per_doc = flagged.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            ~F.col("__drop"), F.struct("pos", "line")
                        )
                    )
                ),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("clean_text"),
        F.sum((~F.col("__drop")).cast("long")).alias("n_lines_kept"),
        F.sum(F.col("__drop").cast("long")).alias("n_lines_removed"),
    )
    return documents.select("doc_id").join(per_doc, "doc_id").select(
        "doc_id", "clean_text", "n_lines_kept", "n_lines_removed"
    )


REMOVE_BOILERPLATE_SQL_TMPL = """
WITH l AS (
  SELECT doc_id,
         unnest(string_split(text, chr(10))) AS line,
         unnest(generate_series(1, len(string_split(text, chr(10))))) AS pos
  FROM documents
), n AS (
  SELECT doc_id, pos, line, lower(trim(line)) AS line_norm FROM l
), b AS (
  SELECT line_norm FROM n WHERE length(line_norm) > 0
  GROUP BY line_norm HAVING COUNT(DISTINCT doc_id) >= {min_docs}
)
SELECT n.doc_id,
       COALESCE(string_agg(CASE WHEN b.line_norm IS NULL THEN n.line END,
                           chr(10) ORDER BY n.pos), '') AS clean_text,
       CAST(COUNT(*) FILTER (WHERE b.line_norm IS NULL) AS BIGINT) AS n_lines_kept,
       CAST(COUNT(*) FILTER (WHERE b.line_norm IS NOT NULL) AS BIGINT)
         AS n_lines_removed
FROM n LEFT JOIN b USING (line_norm)
GROUP BY n.doc_id
"""


def train_test_split(
    documents: DataFrame, test_frac: float = 0.1, salt: str = "split"
) -> DataFrame:
    """(doc_id, split): deterministic hash split — a document is 'test'
    when the first 8 hex digits of md5(salt:doc_id) fall below
    ``test_frac`` of the 32-bit space. Stable across runs, engines, and
    corpus growth (a document's split never changes when others are
    added — the property a contamination-safe holdout needs)."""
    if not 0.0 <= test_frac <= 1.0:
        raise ValueError("test_frac must be in [0, 1]")
    thr = format(min(int(test_frac * 16**8), 16**8 - 1), "08x")
    bucket = F.substring(_hash_hex(salt), 1, 8)
    return documents.select(
        "doc_id",
        F.when(bucket < F.lit(thr), F.lit("test"))
        .otherwise(F.lit("train"))
        .alias("split"),
    )


def train_test_split_sql(test_frac: float = 0.1, salt: str = "split") -> str:
    thr = format(min(int(test_frac * 16**8), 16**8 - 1), "08x")
    return f"""
SELECT doc_id,
       CASE WHEN substr(md5('{salt}:' || CAST(doc_id AS VARCHAR)), 1, 8)
                 < '{thr}' THEN 'test' ELSE 'train' END AS split
FROM documents
"""


def corpus_assembly(
    documents: DataFrame,
    budgets: dict[str, int],
    seq_len: int = 512,
    min_quality: float = 0.5,
    salt: str = "mix",
) -> DataFrame:
    """The end-to-end assembly pipeline a pretraining corpus actually
    runs, as ONE declarative plan: quality gate (composite C4/Gopher
    heuristics) → exact dedup (md5 fingerprint, keep the min doc_id of
    each duplicate group) → per-source token-budget sampling → sequence
    packing of the survivors. Returns the packed layout
    (doc_id, source, n_tokens, start_tok, end_tok, first_seq, last_seq).

    Each stage only narrows the document set, so Catalyst pushes the
    quality/dedup predicates below the sampling window and the whole
    pipeline is a handful of document-keyed shuffles — no stage
    materializes text it later drops."""
    from icebug_spark.llm.textstats import fingerprint, quality_score

    kept = (
        quality_score(documents)
        .where(F.col("quality") >= min_quality)
        .select("doc_id")
    )
    docs_q = documents.join(kept, "doc_id")
    fp = fingerprint(docs_q)
    canon = (
        fp.join(
            fp.groupBy("fp").agg(F.min("doc_id").alias("keep_id")), "fp"
        )
        .where(F.col("doc_id") == F.col("keep_id"))
        .select("doc_id")
    )
    docs_d = docs_q.join(canon, "doc_id")
    sampled = mixture_sample(docs_d, budgets, salt=salt).select("doc_id")
    return pack_sequences(docs_d.join(sampled, "doc_id"), seq_len)


def corpus_assembly_sql(
    budgets: dict[str, int],
    seq_len: int = 512,
    min_quality: float = 0.5,
    salt: str = "mix",
) -> str:
    vals = ", ".join(f"('{s}', {int(v)})" for s, v in sorted(budgets.items()))
    return f"""
WITH s AS (
  SELECT doc_id, source, text,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
         CAST(length(regexp_replace(text, '[^.,;:!?''"]', '', 'g')) AS DOUBLE)
             / GREATEST(length(text), 1) AS punct_ratio,
         CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
             / GREATEST(length(text), 1) AS digit_ratio,
         CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE)
             / GREATEST(CASE WHEN length(trim(text)) = 0 THEN 0
                        ELSE len(regexp_split_to_array(trim(text), '\\s+')) END, 1)
             AS avg_token_len
  FROM documents
), quality AS (
  SELECT doc_id, source, text, n_tokens
  FROM s
  WHERE ROUND(0.4 * LEAST(n_tokens / 50.0, 1.0)
            + 0.2 * (1.0 - LEAST(punct_ratio * 5.0, 1.0))
            + 0.2 * (1.0 - LEAST(digit_ratio * 4.0, 1.0))
            + 0.2 * (CASE WHEN avg_token_len >= 2.0 AND avg_token_len <= 12.0
                          THEN 1.0 ELSE 0.25 END), 6) >= {min_quality!r}
), deduped AS (
  SELECT doc_id, source, n_tokens
  FROM (
    SELECT doc_id, source, n_tokens,
           MIN(doc_id) OVER (
             PARTITION BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
           ) AS keep_id
    FROM quality
  ) WHERE doc_id = keep_id
), b(source, budget) AS (VALUES {vals}),
sampled AS (
  SELECT doc_id, d.source, n_tokens
  FROM (
    SELECT d.doc_id, d.source, d.n_tokens, b.budget,
           SUM(d.n_tokens) OVER (
             PARTITION BY d.source
             ORDER BY md5('{salt}:' || CAST(d.doc_id AS VARCHAR)), d.doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
    FROM deduped d JOIN b USING (source)
  ) d WHERE cum <= budget
), packed AS (
  SELECT doc_id, source, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM sampled
)
SELECT doc_id, source, n_tokens,
       CAST(cum - n_tokens AS BIGINT) AS start_tok,
       CAST(cum AS BIGINT) AS end_tok,
       CAST((cum - n_tokens) // {int(seq_len)} AS BIGINT) AS first_seq,
       CAST(CASE WHEN n_tokens = 0 THEN (cum - n_tokens) // {int(seq_len)}
                 ELSE (cum - 1) // {int(seq_len)} END AS BIGINT) AS last_seq
FROM packed
"""


def stratified_sample(
    documents: DataFrame,
    frac: float = 0.2,
    by: tuple[str, ...] = ("source", "lang"),
    salt: str = "strat",
) -> DataFrame:
    """Deterministic stratified sample: within every cell of the ``by``
    columns, keep the ``ceil(frac × cell_n)`` documents with the
    smallest md5(salt:doc_id) — every stratum is represented at the same
    rate regardless of its size (the balanced-subset step a pipeline
    runs before eval-set construction or per-domain ablations).
    → (doc_id, *by, cell_n, cell_rank) for kept documents only.

    Scale: the per-cell rank is NOT a per-cell window (a hot cell would
    be one task); it rides the global two-pass running count ordered
    cell-major by the hash, converted to a per-cell rank by subtracting
    each cell's broadcast start offset — the `_per_source_cumsum` trick
    with ones instead of token counts."""
    cols = list(by)
    t = (
        documents.select("doc_id", *cols)
        .withColumn("__h", _hash_hex(salt))
        .withColumn("cell_rank", F.lit(1).cast("long"))
    )
    g = running_sums(t, [*cols, "__h"], ["cell_rank"])
    offs = g.groupBy(*cols).agg(
        F.min(F.col("cell_rank") - 1).alias("__off"),
        F.count(F.lit(1)).alias("cell_n"),
    )
    return (
        g.join(F.broadcast(offs), cols)
        .withColumn("cell_rank", F.col("cell_rank") - F.col("__off"))
        .where(F.col("cell_rank") <= F.ceil(F.lit(float(frac)) * F.col("cell_n")))
        .select("doc_id", *cols, "cell_n", "cell_rank")
    )


def stratified_sample_sql(
    frac: float = 0.2,
    by: tuple[str, ...] = ("source", "lang"),
    salt: str = "strat",
) -> str:
    """DuckDB twin of :func:`stratified_sample`."""
    cols = ", ".join(by)
    return f"""
WITH t AS (
  SELECT doc_id, {cols},
         md5('{salt}:' || CAST(doc_id AS VARCHAR)) AS h
  FROM documents
), r AS (
  SELECT doc_id, {cols},
         ROW_NUMBER() OVER (PARTITION BY {cols} ORDER BY h) AS cell_rank,
         COUNT(*) OVER (PARTITION BY {cols}) AS cell_n
  FROM t
)
SELECT doc_id, {cols}, CAST(cell_n AS BIGINT) AS cell_n,
       CAST(cell_rank AS BIGINT) AS cell_rank
FROM r WHERE cell_rank <= CEIL({frac!r} * cell_n)
"""


def curriculum_stages(documents: DataFrame, n_stages: int = 4) -> DataFrame:
    """(doc_id, quality, rank, stage): order the corpus by ascending
    quality score (ties broken by doc_id) and cut it into ``n_stages``
    equal-width curriculum stages — stage 0 = lowest-quality quartile,
    last stage = highest. A curriculum schedule trains on progressively
    higher-quality (or the reverse) data; the stage column is the shard
    key a pipeline materializes by.

    Scale: the global rank is the two-pass zipindex running count (no
    single-partition ORDER BY window); the corpus size reaches the
    expression as a broadcast 1-row join. Stage boundaries use integer
    division — `(rank-1)·n_stages div N` — so both engines agree
    bit-for-bit with no float floor."""
    from icebug_spark.llm.textstats import quality_score

    q = quality_score(documents).select("doc_id", "quality")
    t = q.withColumn("rank", F.lit(1).cast("long"))
    g = running_sums(t, ["quality", "doc_id"], ["rank"])
    n = g.agg(F.count(F.lit(1)).alias("__n"))
    return (
        g.crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "quality",
            "rank",
            F.expr(f"(rank - 1) * {int(n_stages)} div __n")
            .cast("long")
            .alias("stage"),
        )
    )


def curriculum_stages_sql(n_stages: int = 4, quality_sql_core: str = "") -> str:
    """DuckDB twin of :func:`curriculum_stages`; ``quality_sql_core``
    must be a CTE body yielding (doc_id, quality) — the caller passes
    the quality-score oracle so the two stay textually tied."""
    return f"""
WITH {quality_sql_core}, r AS (
  SELECT doc_id, quality,
         ROW_NUMBER() OVER (ORDER BY quality, doc_id) AS rank,
         COUNT(*) OVER () AS n
  FROM qscore
)
SELECT doc_id, quality, CAST(rank AS BIGINT) AS rank,
       CAST((rank - 1) * {int(n_stages)} // n AS BIGINT) AS stage
FROM r
"""


def chunk_documents(
    documents: DataFrame, size: int = 64, stride: int = 48
) -> DataFrame:
    """(doc_id, chunk_id, n_chunk_tokens, chunk_text): sliding-window
    token chunks with overlap (``stride`` < ``size`` overlaps adjacent
    chunks) — the chunking step of retrieval / embedding-indexing
    pipelines, where pack_sequences' concat-then-chunk (no overlap, no
    doc boundaries) is the wrong tool. Chunks never cross documents;
    the last chunk of a document may be short; blank documents yield no
    chunks. Starts are 0, stride, 2·stride, … strictly below the token
    count, so every token lands in at least one chunk.

    Scale: pure per-row array work (tokenize once, slice per start) —
    no shuffle at all; the operator is embarrassingly parallel over
    documents."""
    if size < 1 or stride < 1:
        raise ValueError(f"size and stride must be >= 1, got {size}, {stride}")
    if stride > size:
        # stride > size would SKIP the tokens between windows, silently
        # breaking the every-token-covered contract below
        raise ValueError(f"stride ({stride}) must be <= size ({size})")
    toks = (
        F.when(F.length(F.trim(F.col("text"))) == 0, F.array().cast("array<string>"))
        .otherwise(F.split(F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "), " "))
    )
    t = documents.select("doc_id", toks.alias("t")).withColumn(
        "n", F.size("t")
    )
    starts = F.filter(
        F.sequence(F.lit(0), F.greatest(F.col("n") - 1, F.lit(0)), F.lit(int(stride))),
        lambda s: s < F.col("n"),
    )
    return (
        t.where(F.col("n") > 0)
        .select(
            "doc_id",
            "t",
            "n",
            F.explode(starts).alias("start"),
        )
        .select(
            "doc_id",
            (F.col("start") / int(stride)).cast("long").alias("chunk_id"),
            F.least(F.lit(int(size)), F.col("n") - F.col("start"))
            .cast("long")
            .alias("n_chunk_tokens"),
            F.array_join(
                F.slice(F.col("t"), F.col("start") + 1, F.lit(int(size))), " "
            ).alias("chunk_text"),
        )
    )


def chunk_documents_sql(size: int = 64, stride: int = 48) -> str:
    """DuckDB twin of :func:`chunk_documents`."""
    return f"""
WITH t AS (
  SELECT doc_id,
         CASE WHEN length(trim(text)) = 0 THEN []
              ELSE string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')
         END AS t
  FROM documents
), n AS (
  SELECT doc_id, t, len(t) AS n FROM t WHERE len(t) > 0
)
SELECT doc_id,
       CAST(s.start // {int(stride)} AS BIGINT) AS chunk_id,
       CAST(LEAST({int(size)}, n - s.start) AS BIGINT) AS n_chunk_tokens,
       array_to_string(t[s.start + 1 : s.start + {int(size)}], ' ') AS chunk_text
FROM n, unnest(range(0, n, {int(stride)})) AS s(start)
"""
