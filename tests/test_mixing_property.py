"""Hypothesis property tests for the corpus-assembly operators: packing
tiles every source's token stream, mixture sampling is exactly the
hash-order prefix under the budget, boilerplate removal is idempotent."""

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_WORDS = ["alpha", "beta", "gamma", "delta", "x", "zz", "longword"]


def _mk_docs(spark, spec):
    """spec: list of (doc_id, source_idx, n_words, word_seed)."""
    rows = [
        (
            int(i),
            " ".join(_WORDS[(seed + j) % len(_WORDS)] for j in range(nw)),
            "en",
            f"s{src}",
            1,
        )
        for (i, src, nw, seed) in spec
    ]
    return spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    )


doc_spec = st.lists(
    st.tuples(
        st.integers(0, 10_000),
        st.integers(0, 2),
        st.integers(0, 9),
        st.integers(0, 6),
    ),
    min_size=1,
    max_size=12,
    unique_by=lambda t: t[0],
)


@settings(
    max_examples=6, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(spec=doc_spec, seq_len=st.integers(1, 7))
def test_pack_sequences_tiles_each_source(spark, spec, seq_len):
    from icebug_spark.llm.mixing import pack_sequences

    docs = _mk_docs(spark, spec)
    rows = pack_sequences(docs, seq_len).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    for src, rs in by_src.items():
        rs.sort(key=lambda r: (r["start_tok"], r["doc_id"]))
        pos = 0
        for r in rs:
            assert r["start_tok"] == pos
            assert r["end_tok"] - r["start_tok"] == r["n_tokens"]
            assert r["first_seq"] == r["start_tok"] // seq_len
            want_last = (
                r["start_tok"] // seq_len
                if r["n_tokens"] == 0
                else (r["end_tok"] - 1) // seq_len
            )
            assert r["last_seq"] == want_last
            pos = r["end_tok"]


@settings(
    max_examples=6, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(spec=doc_spec, budget=st.integers(0, 30))
def test_mixture_sample_is_hash_prefix(spark, spec, budget):
    """The kept set must be EXACTLY the md5-order prefix whose running
    token sum stays under the budget — recomputed independently in
    Python."""
    from icebug_spark.llm.mixing import mixture_sample

    docs = _mk_docs(spark, spec)
    budgets = {f"s{i}": budget for i in range(3)}
    got = {
        (r["doc_id"], r["cum_tokens"])
        for r in mixture_sample(docs, budgets, salt="mix").collect()
    }
    by_src = {}
    for i, src, nw, seed in spec:
        h = hashlib.md5(f"mix:{i}".encode()).hexdigest()
        by_src.setdefault(src, []).append((h, int(i), nw))
    # recompute exactly as the operator defines it: keep rows whose
    # running sum (over ALL budgeted rows in hash order) is <= budget
    want = set()
    for src, items in by_src.items():
        run = 0
        for h, i, nw in sorted(items):
            run += nw
            if run <= budget:
                want.add((i, run))
    assert got == want


@settings(
    max_examples=5, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(spec=doc_spec)
def test_boilerplate_removal_idempotent(spark, spec):
    """A second pass over the cleaned corpus removes nothing: all
    boilerplate is gone and surviving lines keep their doc frequency."""
    from pyspark.sql import functions as F

    from icebug_spark.llm.mixing import remove_boilerplate

    docs = _mk_docs(spark, spec)
    once = remove_boilerplate(docs, 2)
    again = remove_boilerplate(
        once.select(
            "doc_id",
            F.col("clean_text").alias("text"),
            F.lit("en").alias("lang"),
            F.lit("s").alias("source"),
            F.lit(1).alias("n_chars"),
        ),
        2,
    )
    assert again.agg(F.sum("n_lines_removed")).collect()[0][0] == 0
