"""PII scrubbing over the ``documents`` table.

Training-data-pipeline primitive: masks personally-identifiable
information (emails, phone numbers, IPv4 addresses, SSN-style ids,
credit-card-style numbers) with typed placeholder tokens before a corpus
ships to training. Pure JVM-side ``regexp_replace`` / ``regexp_count``
chains — whole-stage codegen, no Python UDFs, scan-speed at 100 TB — and
every pattern is written in the common Java-regex/RE2 subset (no
lookbehind, no backrefs) so the DuckDB oracle twin evaluates the SAME
pattern text.

Pattern order matters and is part of the contract: credit-card before
SSN before phone (a 16-digit grouped number must not be half-eaten by
the phone pattern), email before IP (user@10.0.0.1 is an email).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: (category, pattern, replacement) — applied strictly in this order.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("cc", r"\b[0-9]{4}-[0-9]{4}-[0-9]{4}-[0-9]{4}\b", "<CC>"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    ("phone", r"\+[0-9]{1,3}-[0-9]{3}-[0-9]{3,4}-[0-9]{4}\b", "<PHONE>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
]


def scrub_pii(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """→ input columns + ``text_scrubbed`` + one ``n_<category>`` count
    per PII class. Counts are taken on the text state each pattern
    actually sees (after the earlier patterns ran), matching what was
    replaced."""
    out = documents.withColumn("text_scrubbed", F.col(text_col))
    for cat, pat, repl in PII_PATTERNS:
        out = out.withColumn(
            f"n_{cat}", F.regexp_count(F.col("text_scrubbed"), F.lit(pat))
        ).withColumn(
            "text_scrubbed",
            F.regexp_replace("text_scrubbed", pat, repl),
        )
    return out


def scrub_summary(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus-level scrub report: per-category totals + docs touched."""
    s = scrub_pii(documents, text_col)
    touched = F.greatest(*[F.col(f"n_{c}") for c, _, _ in PII_PATTERNS]) > 0
    return s.agg(
        *[F.sum(f"n_{c}").alias(f"total_{c}") for c, _, _ in PII_PATTERNS],
        F.sum(F.when(touched, 1).otherwise(0)).alias("n_docs_with_pii"),
        F.count(F.lit(1)).alias("n_docs"),
    )
