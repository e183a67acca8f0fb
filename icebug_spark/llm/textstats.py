"""Text-analysis operators over the ``documents`` table.

Training-data-pipeline primitives (driver north-star): token counting,
quality scoring, language-ID heuristic, document fingerprinting. All are
JVM-side built-in expressions (whole-stage codegen, no Python UDFs) so
they stream over 100 TB of text at scan speed; every one has an exact
DuckDB SQL twin for the correctness oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# standalone-word stopword patterns per language for the n-gram/stopword
# language-ID heuristic (deterministic, regex-count based)
LANG_PATTERNS = {
    "en": r"\b(the|and|of|to|in|is|that|for)\b",
    "de": r"\b(der|die|das|und|ist|nicht|ein|zu)\b",
    "fr": r"\b(le|la|les|et|est|une|pour|que)\b",
    "es": r"\b(el|los|las|es|una|para|que|de)\b",
}


def _tokens(col):
    return F.split(F.trim(col), r"\s+")


def text_stats(documents: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_chars_measured, punct_ratio, digit_ratio,
    avg_token_len) — quality-scoring features."""
    txt = F.col("text")
    toks = _tokens(txt)
    n_tokens = F.when(F.length(F.trim(txt)) == 0, F.lit(0)).otherwise(
        F.size(toks)
    )
    n_chars = F.length(txt)
    punct = F.length(F.regexp_replace(txt, r"[^.,;:!?'\"]", ""))
    digits = F.length(F.regexp_replace(txt, r"[^0-9]", ""))
    return documents.select(
        "doc_id",
        n_tokens.cast("long").alias("n_tokens"),
        n_chars.cast("long").alias("n_chars_measured"),
        F.round(punct.cast("double") / F.greatest(n_chars, F.lit(1)), 6).alias("punct_ratio"),
        F.round(digits.cast("double") / F.greatest(n_chars, F.lit(1)), 6).alias("digit_ratio"),
        F.round(
            (F.length(F.regexp_replace(txt, r"\s+", "")).cast("double"))
            / F.greatest(n_tokens, F.lit(1)),
            6,
        ).alias("avg_token_len"),
    )


def language_id(documents: DataFrame) -> DataFrame:
    """(doc_id, pred_lang, score): argmax over per-language stopword hit
    counts normalized by token count; 'und' when nothing matches.
    Deterministic tie-break by language code order."""
    txt = F.lower(F.col("text"))
    hits = [
        F.regexp_count(txt, F.lit(pat)).alias(f"hits_{lang}")
        for lang, pat in LANG_PATTERNS.items()
    ]
    df = documents.select("doc_id", F.col("text"), *hits)
    langs = sorted(LANG_PATTERNS)  # deterministic tie-break: alphabetical
    best_score = F.greatest(*[F.col(f"hits_{l}") for l in langs])
    pred = F.lit("und")
    for lang in reversed(langs):
        pred = F.when(
            (best_score > 0) & (F.col(f"hits_{lang}") == best_score), F.lit(lang)
        ).otherwise(pred)
    # reversed() + overwrite-when-equal makes the FIRST alphabetical winner stick
    return df.select(
        "doc_id",
        pred.alias("pred_lang"),
        best_score.cast("long").alias("stopword_hits"),
    )


def token_count_by_source(documents: DataFrame) -> DataFrame:
    """(source, n_docs, total_tokens) — corpus accounting rollup."""
    stats = text_stats(documents).select("doc_id", "n_tokens")
    return (
        documents.select("doc_id", "source")
        .join(stats, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
    )


def quality_score(documents: DataFrame) -> DataFrame:
    """(doc_id, quality, keep) — composite 0..1 quality gate combining the
    text_stats features (C4/Gopher-style heuristics): penalize very short
    docs, high punct/digit ratios, degenerate token lengths. Pure column
    arithmetic over text_stats; `keep` is the boolean filter a pipeline
    would apply before training."""
    s = text_stats(documents)
    len_term = F.least(F.col("n_tokens") / F.lit(50.0), F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(F.col("punct_ratio") * 5.0, F.lit(1.0))
    digit_term = F.lit(1.0) - F.least(F.col("digit_ratio") * 4.0, F.lit(1.0))
    tok_term = F.when(
        (F.col("avg_token_len") >= 2.0) & (F.col("avg_token_len") <= 12.0),
        F.lit(1.0),
    ).otherwise(F.lit(0.25))
    q = F.round(0.4 * len_term + 0.2 * punct_term + 0.2 * digit_term + 0.2 * tok_term, 6)
    return s.select(
        "doc_id",
        q.alias("quality"),
        (q >= 0.5).alias("keep"),
    )


def fingerprint(documents: DataFrame) -> DataFrame:
    """(doc_id, fp): md5 of whitespace-normalized lowercased text — the
    exact-dedup key (reference has no text ops; this is the pipeline
    extension). md5 is identical across Spark and DuckDB."""
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    return documents.select("doc_id", F.md5(norm).alias("fp"))


# --- DuckDB twins (textually maintained next to the Spark code) ----------

TEXT_STATS_SQL = """
SELECT doc_id,
       CAST(CASE WHEN length(trim(text)) = 0 THEN 0
            ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS n_tokens,
       CAST(length(text) AS BIGINT) AS n_chars_measured,
       ROUND(CAST(length(regexp_replace(text, '[^.,;:!?''"]', '', 'g')) AS DOUBLE)
             / GREATEST(length(text), 1), 6) AS punct_ratio,
       ROUND(CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
             / GREATEST(length(text), 1), 6) AS digit_ratio,
       ROUND(CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE)
             / GREATEST(CASE WHEN length(trim(text)) = 0 THEN 0
                        ELSE len(regexp_split_to_array(trim(text), '\\s+')) END, 1), 6) AS avg_token_len
FROM documents
"""

FINGERPRINT_SQL = """
SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
FROM documents
"""


def repetition_filter(documents: DataFrame, max_dup_line_frac: float = 0.3,
                      max_top_ngram_frac: float = 0.2, n: int = 2) -> DataFrame:
    """Gopher-style repetition quality rules (Rae et al. 2021 §A1.1):
    per document, (a) the fraction of lines that are duplicates of an
    earlier line and (b) the fraction of the document's word-n-grams
    taken up by its single most frequent n-gram. Emits (doc_id,
    dup_line_frac, top_ngram_frac, keep). Pure explode + window
    aggregations — codegen'd, scan-speed at 100 TB, full SQL twin."""
    from pyspark.sql import Window

    lines = documents.select(
        "doc_id", F.explode(F.split(F.col("text"), r"\n")).alias("line")
    ).where(F.length(F.trim("line")) > 0)
    line_stats = (
        lines.groupBy("doc_id", "line")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            (
                (F.sum("c") - F.count(F.lit(1))).cast("double") / F.sum("c")
            ).alias("dup_line_frac")
        )
    )
    toks = documents.select(
        "doc_id",
        F.posexplode(
            F.split(F.regexp_replace(F.lower(F.trim("text")), r"\s+", " "), " ")
        ).alias("pos", "tok"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    parts = [F.col("tok")] + [F.lead("tok", j).over(w) for j in range(1, n)]
    grams = (
        toks.select("doc_id", F.concat_ws(" ", *parts).alias("g"),
                    parts[-1].isNotNull().alias("full"))
        .where(F.col("full"))
    )
    gram_stats = (
        grams.groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg((F.max("c").cast("double") / F.sum("c")).alias("top_ngram_frac"))
    )
    base = documents.select("doc_id")
    out = (
        base.join(line_stats, "doc_id", "left")
        .join(gram_stats, "doc_id", "left")
        .select(
            "doc_id",
            F.round(F.coalesce("dup_line_frac", F.lit(0.0)), 6).alias("dup_line_frac"),
            F.round(F.coalesce("top_ngram_frac", F.lit(0.0)), 6).alias("top_ngram_frac"),
        )
    )
    return out.withColumn(
        "keep",
        (F.col("dup_line_frac") <= max_dup_line_frac)
        & (F.col("top_ngram_frac") <= max_top_ngram_frac),
    )


def benchmark_contamination(documents: DataFrame, benchmark: DataFrame,
                            n: int = 3, min_overlap: int = 2) -> DataFrame:
    """Benchmark-contamination scan (the decontamination pass of a
    training pipeline, cf. GPT-3 appendix C): a document is contaminated
    when it shares >= min_overlap distinct word-n-grams with ANY
    benchmark item. ``benchmark``: (bench_id, text). Emits contaminated
    docs as (doc_id, bench_id, n_shared). The benchmark side is tiny by
    nature -> its shingle table is broadcast; the corpus side streams."""
    from icebug_spark.llm.dedup import shingles

    doc_sh = shingles(documents, n)
    bench_sh = shingles(
        benchmark.select(F.col("bench_id").alias("doc_id"), "text"), n
    ).select(F.col("doc_id").alias("bench_id"), "shingle")
    return (
        doc_sh.join(F.broadcast(bench_sh), "shingle")
        .groupBy("doc_id", "bench_id")
        .agg(F.countDistinct("shingle").alias("n_shared"))
        .where(F.col("n_shared") >= min_overlap)
    )


def lm_perplexity(documents: DataFrame, k: float = 0.5) -> DataFrame:
    """(doc_id, n_bigrams, avg_nll): corpus-trained bigram language-model
    score per document — the perplexity-filter step of CCNet/ RefinedWeb
    style pipelines, with the LM trained on the corpus itself (no
    external model in this container). Each document's score is the mean
    negative log-likelihood of its adjacent token bigrams under
    add-k smoothing: P(w2|w1) = (c(w1,w2) + k) / (c(w1·) + k·V) with V
    the unigram vocabulary size. Unusually high avg_nll flags gibberish
    and boilerplate-free noise; 0.0 for docs with fewer than 2 tokens.

    Scale: bigram and left-context counts are fine-grained groupBys
    (keys = word pairs / words); each document's bigrams join those maps
    on the same fine-grained keys; V arrives as a broadcast 1-row join.
    Rounded to 6 decimals so JVM and DuckDB ln() agree."""
    from icebug_spark.llm.dedup import _norm_tokens
    from pyspark.sql import Window

    toks = documents.select(
        "doc_id", F.posexplode(_norm_tokens(F.col("text"))).alias("pos", "w1")
    ).where(F.length("w1") > 0)
    w = Window.partitionBy("doc_id").orderBy("pos")
    bi = toks.withColumn("w2", F.lead("w1").over(w)).where(
        F.col("w2").isNotNull()
    )
    c12 = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = bi.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    v = toks.agg(F.countDistinct("w1").alias("v"))
    scored = (
        bi.join(c12, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(v))
        .withColumn(
            "nll",
            -F.log(
                (F.col("c12") + F.lit(float(k)))
                / (F.col("c1") + F.lit(float(k)) * F.col("v"))
            ),
        )
    )
    per = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"), F.avg("nll").alias("avg_nll")
    )
    return (
        documents.select("doc_id")
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.round(F.coalesce("avg_nll", F.lit(0.0)), 6).alias("avg_nll"),
        )
    )


def lm_perplexity_sql(k: float = 0.5) -> str:
    """DuckDB twin of :func:`lm_perplexity`."""
    return f"""
WITH toks AS (
  SELECT doc_id, i AS pos, t[i+1] AS w1
  FROM (
    SELECT doc_id,
           string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS t
    FROM documents
  ), unnest(range(0, len(t))) AS u(i)
  WHERE length(t[i+1]) > 0
), bi AS (
  SELECT doc_id, w1, lead(w1) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
  FROM toks
  QUALIFY w2 IS NOT NULL
), c12 AS (
  SELECT w1, w2, COUNT(*) AS c12 FROM bi GROUP BY 1, 2
), c1 AS (
  SELECT w1, COUNT(*) AS c1 FROM bi GROUP BY 1
), v AS (
  SELECT COUNT(DISTINCT w1) AS v FROM toks
), per AS (
  SELECT bi.doc_id, COUNT(*) AS n_bigrams,
         AVG(-ln((c12.c12 + {k!r}) / (c1.c1 + {k!r} * v.v))) AS avg_nll
  FROM bi JOIN c12 USING (w1, w2) JOIN c1 USING (w1), v
  GROUP BY bi.doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(per.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       ROUND(COALESCE(per.avg_nll, 0.0), 6) AS avg_nll
FROM documents d LEFT JOIN per USING (doc_id)
"""


def dsir_log_weights(documents: DataFrame, k: float = 0.5) -> DataFrame:
    """(doc_id, n_bigrams, log_weight): DSIR importance weights (Xie et
    al. 2023, "Data Selection for Language Models via Importance
    Resampling") with bigram features: log w(x) = Σ_features
    [ln p_target(f) − ln p_raw(f)], where the target distribution is the
    corpus' own quality-gated subset (``quality_score().keep``) and raw
    is the full corpus — documents whose n-gram profile looks like the
    high-quality subset get positive weights and survive a resampling
    pass. Both models are add-k smoothed over the SAME raw vocabulary, so
    the ratio is well-defined for bigrams absent from the target.

    Scale: two fine-grained count tables (raw and target bigrams, the
    target side filtered before counting) joined back to each document's
    bigrams on the same keys; the vocabulary size is a broadcast 1-row
    join. 0.0 for docs with fewer than 2 tokens; rounded to 6 decimals so
    JVM and DuckDB ln() agree."""
    from icebug_spark.llm.dedup import _norm_tokens
    from pyspark.sql import Window

    toks = documents.select(
        "doc_id", F.posexplode(_norm_tokens(F.col("text"))).alias("pos", "w1")
    ).where(F.length("w1") > 0)
    w = Window.partitionBy("doc_id").orderBy("pos")
    bi = toks.withColumn("w2", F.lead("w1").over(w)).where(
        F.col("w2").isNotNull()
    )
    keep = quality_score(documents).where("keep").select("doc_id")
    tbi = bi.join(keep, "doc_id")
    c12r = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12r"))
    c1r = bi.groupBy("w1").agg(F.count(F.lit(1)).alias("c1r"))
    c12t = tbi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12t"))
    c1t = tbi.groupBy("w1").agg(F.count(F.lit(1)).alias("c1t"))
    v = toks.agg(F.countDistinct("w1").alias("v"))
    kk = F.lit(float(k))
    scored = (
        bi.join(c12r, ["w1", "w2"])
        .join(c1r, "w1")
        .join(c12t, ["w1", "w2"], "left")
        .join(c1t, "w1", "left")
        .crossJoin(F.broadcast(v))
        .withColumn(
            "lr",
            F.log(
                (F.coalesce("c12t", F.lit(0)) + kk)
                / (F.coalesce("c1t", F.lit(0)) + kk * F.col("v"))
            )
            - F.log((F.col("c12r") + kk) / (F.col("c1r") + kk * F.col("v"))),
        )
    )
    per = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"), F.sum("lr").alias("lw")
    )
    return (
        documents.select("doc_id")
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.round(F.coalesce("lw", F.lit(0.0)), 6).alias("log_weight"),
        )
    )


def dsir_log_weights_sql(k: float = 0.5, quality_cte: str = "") -> str:
    """DuckDB twin of :func:`dsir_log_weights`; ``quality_cte`` is the
    shared quality-score CTE chain ending in ``qscore`` (passed by the
    registry so the target-subset definition stays textually tied)."""
    return f"""
WITH {quality_cte}, toks AS (
  SELECT doc_id, i AS pos, t[i+1] AS w1
  FROM (
    SELECT doc_id,
           string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS t
    FROM documents
  ), unnest(range(0, len(t))) AS u(i)
  WHERE length(t[i+1]) > 0
), bi AS (
  SELECT doc_id, w1, lead(w1) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
  FROM toks
  QUALIFY w2 IS NOT NULL
), keep AS (
  SELECT doc_id FROM qscore WHERE quality >= 0.5
), tbi AS (
  SELECT bi.* FROM bi JOIN keep USING (doc_id)
), c12r AS (SELECT w1, w2, COUNT(*) AS c12r FROM bi GROUP BY 1, 2),
c1r AS (SELECT w1, COUNT(*) AS c1r FROM bi GROUP BY 1),
c12t AS (SELECT w1, w2, COUNT(*) AS c12t FROM tbi GROUP BY 1, 2),
c1t AS (SELECT w1, COUNT(*) AS c1t FROM tbi GROUP BY 1),
v AS (SELECT COUNT(DISTINCT w1) AS v FROM toks),
per AS (
  SELECT bi.doc_id, COUNT(*) AS n_bigrams,
         SUM(ln((COALESCE(c12t.c12t, 0) + {k!r}) / (COALESCE(c1t.c1t, 0) + {k!r} * v.v))
             - ln((c12r.c12r + {k!r}) / (c1r.c1r + {k!r} * v.v))) AS lw
  FROM bi JOIN c12r USING (w1, w2) JOIN c1r USING (w1)
       LEFT JOIN c12t USING (w1, w2) LEFT JOIN c1t USING (w1), v
  GROUP BY bi.doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(per.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       ROUND(COALESCE(per.lw, 0.0), 6) AS log_weight
FROM documents d LEFT JOIN per USING (doc_id)
"""
