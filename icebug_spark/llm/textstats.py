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
