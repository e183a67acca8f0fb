"""BPE tokenizer-vocabulary induction over the ``documents`` table.

The reference engine has no text surface; this is the
training-data-pipeline extension (the tokenizer-training step that sits
between corpus assembly and the training job). The algorithm is the
original byte-pair-encoding merge loop of Sennrich et al. 2016: count
adjacent symbol pairs over the word-frequency table, merge the most
frequent pair everywhere (greedy left-to-right within each word), repeat.

Determinism: pair selection is (max count, then lexicographically
smallest (lhs, rhs)) — no hash or thread order anywhere — so the merge
sequence is a pure function of the corpus and both engines reproduce it
exactly. The DuckDB oracle (:func:`bpe_learn_sql`) replays the SAME
n-step loop as a generated chain of CTEs: each step computes the best
pair with a window + LIMIT 1 and applies the greedy merge with the
run-parity rule (overlapping occurrences exist only for lhs == rhs runs;
greedy keeps the even offsets within each run of consecutive starts).

Scale: the loop state is the (word, freq, symbols) table — vocabulary-
sized, not corpus-sized — after ONE corpus-wide word-count shuffle. Each
merge round is one pair-count aggregation (groupBy pair, fine-grained
keys) + one argmax pull of a single row + one symbol-array rewrite with
``F.aggregate`` (per-row JVM fold, no shuffle), pinned per round so the
plan stays flat. n_merges is a small constant (a real run does ~30k
merges on a word table that fits one executor each round — the per-round
cost is the pair aggregation, which distributes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from icebug_spark.llm.dedup import _norm_tokens
from icebug_spark.plans.iterate import pin


def word_table(documents: DataFrame) -> DataFrame:
    """(word, freq): corpus word-occurrence counts over normalized
    tokens — the input alphabet of BPE training."""
    toks = documents.select(
        F.explode(_norm_tokens(F.col("text"))).alias("word")
    ).where(F.length("word") > 0)
    return toks.groupBy("word").agg(F.count(F.lit(1)).alias("freq"))


def _apply_merge(syms, lhs: str, rhs: str):
    """Greedy left-to-right merge of adjacent (lhs, rhs) inside a symbol
    array, as a JVM-side fold: a merged element is strictly longer than
    ``lhs`` so it can never re-match as the left of the following pair
    within the same pass — the fold is exactly the reference scan."""
    merged = lhs + rhs
    return F.aggregate(
        syms,
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(lhs))
            & (x == F.lit(rhs)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _char_syms():
    return F.transform(
        F.sequence(F.lit(1), F.length("word")),
        lambda i: F.col("word").substr(i, F.lit(1)),
    )


def _bpe_merge_list(
    documents: DataFrame, n_merges: int, min_count: int
) -> list[tuple[int, str, str, str, int]]:
    """The driver merge loop shared by :func:`bpe_learn` and
    :func:`bpe_segment_counts`: → [(rank, lhs, rhs, merged, count)]."""
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    # the word-TYPE table is pinned ONCE; each round re-applies the
    # merges learned so far as one composed column expression (exactly
    # the bpe_segment_counts shape) instead of materializing a new state
    # table per merge — one Spark job per rank (the best-pair collect)
    # instead of two (collect + pin). The fold chain is linear in the
    # word length and the type table is vocabulary-sized, so recomputing
    # r folds in round r is far cheaper than r materializations.
    base = pin(
        word_table(documents).select("word", "freq", _char_syms().alias("syms"))
    )
    out: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, int(n_merges) + 1):
        syms = F.col("syms")
        for _rk, lhs_m, rhs_m, _m, _c in out:
            syms = _apply_merge(syms, lhs_m, rhs_m)
        pairs = base.select("freq", syms.alias("s")).select(
            "freq",
            F.explode(
                F.arrays_zip(
                    F.slice(F.col("s"), 1, F.size("s") - 1),
                    F.slice(F.col("s"), 2, F.size("s") - 1),
                )
            ).alias("p"),
        ).select(
            F.col("p.0").alias("lhs"), F.col("p.1").alias("rhs"), "freq"
        )
        best = (
            pairs.groupBy("lhs", "rhs")
            .agg(F.sum("freq").alias("cnt"))
            .where(F.col("cnt") >= int(min_count))
            .orderBy(F.col("cnt").desc(), F.col("lhs").asc(), F.col("rhs").asc())
            .limit(1)
            .collect()
        )
        if not best:
            break
        lhs, rhs, cnt = best[0]["lhs"], best[0]["rhs"], int(best[0]["cnt"])
        out.append((rank, lhs, rhs, lhs + rhs, cnt))
    return out


def bpe_learn(
    documents: DataFrame, n_merges: int = 8, min_count: int = 2
) -> DataFrame:
    """Learn the first ``n_merges`` BPE merges from the corpus →
    (merge_rank, lhs, rhs, merged, pair_count), merge_rank starting at 1
    in learned order. Stops early when no adjacent pair reaches
    ``min_count`` corpus occurrences."""
    out = _bpe_merge_list(documents, int(n_merges), int(min_count))
    return documents.sparkSession.createDataFrame(
        out, "merge_rank INT, lhs STRING, rhs STRING, merged STRING, pair_count BIGINT"
    )


def bpe_segment_counts(
    documents: DataFrame, n_merges: int = 8, min_count: int = 2
) -> DataFrame:
    """Tokenize the corpus with its own learned BPE vocabulary →
    (doc_id, n_tokens, n_subwords, compression): per-document subword
    counts after applying the first ``n_merges`` merges, plus the
    chars-per-subword compression the vocabulary achieves — the
    token-budget accounting step a pipeline runs before packing.

    Scale: the learned merges (a tiny driver list) are re-applied to the
    word TYPE table as one composed column expression (no per-merge job),
    then each document's tokens join the word→subword-count map on the
    fine-grained word key; blank documents survive with zero counts."""
    merges = _bpe_merge_list(documents, int(n_merges), int(min_count))
    syms = _char_syms()
    for _, lhs, rhs, _m, _c in merges:
        syms = _apply_merge(syms, lhs, rhs)
    wmap = word_table(documents).select(
        "word",
        F.size(syms).alias("n_sym"),
        F.length("word").alias("n_chars_w"),
    )
    toks = documents.select(
        "doc_id", F.explode(_norm_tokens(F.col("text"))).alias("word")
    ).where(F.length("word") > 0)
    per = (
        toks.join(wmap, "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("n_sym").alias("n_subwords"),
            F.sum("n_chars_w").alias("n_chars_words"),
        )
    )
    return (
        documents.select("doc_id")
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("n_subwords", F.lit(0)).cast("long").alias("n_subwords"),
            F.round(
                F.when(F.coalesce("n_subwords", F.lit(0)) == 0, F.lit(0.0)).otherwise(
                    F.col("n_chars_words") / F.col("n_subwords").cast("double")
                ),
                6,
            ).alias("compression"),
        )
    )


def _bpe_chain_sql(n_merges: int, min_count: int) -> str:
    """The shared n-step merge-loop CTE chain (ending in ``p{n}``, the
    fully merged symbol table) used by both oracles below. Every CTE is
    MATERIALIZED — inlined CTEs would expand the self-referencing chain
    into exponentially many base-table scans."""
    ctes = [
        """w AS MATERIALIZED (
  SELECT tok AS word, COUNT(*) AS freq FROM (
    SELECT unnest(string_split(
             regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS tok
    FROM documents
  ) WHERE length(tok) > 0 GROUP BY 1
), p0 AS MATERIALIZED (
  SELECT word, freq, i AS pos, word[i+1] AS sym
  FROM w, unnest(range(0, length(word))) AS u(i)
)"""
    ]
    for i in range(1, int(n_merges) + 1):
        prev = f"p{i - 1}"
        ctes.append(
            f"""pair{i} AS MATERIALIZED (
  SELECT word, freq, pos, sym,
         lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt
  FROM {prev}
), best{i} AS MATERIALIZED (
  SELECT sym AS lhs, nxt AS rhs, SUM(freq) AS cnt
  FROM pair{i} WHERE nxt IS NOT NULL
  GROUP BY 1, 2 HAVING SUM(freq) >= {int(min_count)}
  ORDER BY cnt DESC, lhs, rhs LIMIT 1
), occ{i} AS MATERIALIZED (
  SELECT p.word, p.pos
  FROM pair{i} p JOIN best{i} b ON p.sym = b.lhs AND p.nxt = b.rhs
), mg{i} AS MATERIALIZED (
  SELECT word, pos FROM (
    SELECT word, pos, ROW_NUMBER() OVER (PARTITION BY word, cid ORDER BY pos) AS rn
    FROM (
      SELECT word, pos,
             pos - ROW_NUMBER() OVER (PARTITION BY word ORDER BY pos) AS cid
      FROM occ{i}
    )
  ) WHERE rn % 2 = 1
), p{i} AS MATERIALIZED (
  SELECT s.word, s.freq,
         ROW_NUMBER() OVER (PARTITION BY s.word ORDER BY s.pos) - 1 AS pos,
         CASE WHEN m.pos IS NOT NULL
              THEN s.sym || (SELECT rhs FROM best{i}) ELSE s.sym END AS sym
  FROM {prev} s
  LEFT JOIN mg{i} m ON s.word = m.word AND s.pos = m.pos
  LEFT JOIN mg{i} m2 ON s.word = m2.word AND s.pos = m2.pos + 1
  WHERE m2.pos IS NULL
)"""
        )
    return "WITH " + ",\n".join(ctes)


def bpe_learn_sql(n_merges: int = 8, min_count: int = 2) -> str:
    """DuckDB twin of :func:`bpe_learn`: the n-step merge loop unrolled
    into a generated CTE chain (best-pair argmax + run-parity greedy
    merge per step). An exhausted step yields an empty ``best{i}`` CTE,
    every later step passes the symbol table through unchanged, and the
    final UNION simply lacks those ranks — the same early stop as the
    Spark loop."""
    if int(n_merges) < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    unions = "\nUNION ALL\n".join(
        f"SELECT CAST({i} AS INT) AS merge_rank, lhs, rhs, lhs || rhs AS merged, "
        f"CAST(cnt AS BIGINT) AS pair_count FROM best{i}"
        for i in range(1, int(n_merges) + 1)
    )
    return _bpe_chain_sql(int(n_merges), int(min_count)) + "\n" + unions


def bpe_segment_counts_sql(n_merges: int = 8, min_count: int = 2) -> str:
    """DuckDB twin of :func:`bpe_segment_counts`: the same merge chain,
    then subword counts per word type joined back to document tokens."""
    n = int(n_merges)
    return (
        _bpe_chain_sql(n, int(min_count))
        + f""", wsub AS MATERIALIZED (
  SELECT word, COUNT(*) AS n_sym, length(word) AS n_chars_w
  FROM p{n} GROUP BY word, length(word)
), dt AS (
  SELECT doc_id,
         unnest(string_split(
           regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS word
  FROM documents
), per AS (
  SELECT dt.doc_id, COUNT(*) AS n_tokens, SUM(wsub.n_sym) AS n_subwords,
         SUM(wsub.n_chars_w) AS n_chars_words
  FROM dt JOIN wsub USING (word)
  WHERE length(dt.word) > 0
  GROUP BY dt.doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(per.n_tokens, 0) AS BIGINT) AS n_tokens,
       CAST(COALESCE(per.n_subwords, 0) AS BIGINT) AS n_subwords,
       ROUND(CASE WHEN COALESCE(per.n_subwords, 0) = 0 THEN 0.0
            ELSE per.n_chars_words / CAST(per.n_subwords AS DOUBLE) END,
            6) AS compression
FROM documents d LEFT JOIN per USING (doc_id)
"""
    )
