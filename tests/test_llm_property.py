"""Hypothesis property tests for the late round-10 pipeline operators:
span-dedup internal consistency, chunk coverage/reconstruction, BPE
conservation, stratified sampling rates, curriculum stage balance."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_WORDS = ["aa", "bb", "cc", "dd", "ee"]


def _mk_docs(spark, spec):
    """spec: list of (doc_id, n_words, word_seed, source_idx)."""
    rows = [
        (
            int(i),
            " ".join(_WORDS[(seed + j) % len(_WORDS)] for j in range(nw)),
            "en",
            f"s{src}",
            1,
        )
        for (i, nw, seed, src) in spec
    ]
    return spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    )


doc_spec = st.lists(
    st.tuples(
        st.integers(0, 10_000),
        st.integers(0, 14),
        st.integers(0, 4),
        st.integers(0, 2),
    ),
    min_size=1,
    max_size=10,
    unique_by=lambda t: t[0],
)


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(spec=doc_spec, k=st.integers(1, 5))
def test_span_stats_and_removal_agree(spark, spec, k):
    """n_removed of the destructive op == dup_tokens of the profile op,
    per document, for every k — both derive from the same coverage."""
    from icebug_spark.llm.dedup import (
        duplicated_span_stats,
        remove_duplicated_spans,
    )

    docs = _mk_docs(spark, spec)
    stats = {
        r["doc_id"]: r for r in duplicated_span_stats(docs, k=k).collect()
    }
    rem = {r["doc_id"]: r for r in remove_duplicated_spans(docs, k=k).collect()}
    assert set(stats) == set(rem)
    for i in stats:
        assert rem[i]["n_removed"] == stats[i]["dup_tokens"]
        assert rem[i]["n_kept"] + rem[i]["n_removed"] == stats[i]["n_tokens"]
        # kept text token count matches n_kept
        kept_toks = rem[i]["clean_text"].split() if rem[i]["clean_text"] else []
        assert len(kept_toks) == rem[i]["n_kept"]


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(spec=doc_spec, size=st.integers(1, 6), stride_off=st.integers(0, 5))
def test_chunk_documents_properties(spark, spec, size, stride_off):
    """Every token is covered; stride == size partitions the document
    exactly (concatenation reconstructs the normalized text)."""
    stride = max(1, size - stride_off)
    from pyspark.sql import functions as F

    from icebug_spark.llm.mixing import chunk_documents

    docs = _mk_docs(spark, spec)
    out = chunk_documents(docs, size=size, stride=stride).collect()
    norm = {
        r["doc_id"]: r["t"]
        for r in docs.select(
            "doc_id",
            F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ").alias("t"),
        ).collect()
    }
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, t in norm.items():
        n = len(t.split()) if t else 0
        chunks = sorted(by_doc.get(i, []), key=lambda r: r["chunk_id"])
        if n == 0:
            assert not chunks
            continue
        # coverage: token count across chunks >= n; with stride==size the
        # chunks tile exactly
        total = sum(r["n_chunk_tokens"] for r in chunks)
        assert total >= n
        if stride == size:
            assert total == n
            assert " ".join(r["chunk_text"] for r in chunks) == t
        # every chunk respects the size bound
        assert all(1 <= r["n_chunk_tokens"] <= size for r in chunks)


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(spec=doc_spec, n_merges=st.integers(1, 4))
def test_bpe_conservation(spark, spec, n_merges):
    """Each learned merge strictly decreases (or at the last step keeps)
    total symbol count; segment counts: n_subwords <= total chars and
    >= n_tokens (a word never splits into more symbols than chars)."""
    from icebug_spark.llm.tokenize import bpe_learn, bpe_segment_counts

    docs = _mk_docs(spark, spec)
    merges = bpe_learn(docs, n_merges).collect()
    # ranks are contiguous from 1 and pair_counts >= 2, non-increasing in
    # frequency is NOT required (merging can create new frequent pairs),
    # but every count is >= min_count
    ranks = sorted(r["merge_rank"] for r in merges)
    assert ranks == list(range(1, len(ranks) + 1))
    assert all(r["pair_count"] >= 2 for r in merges)
    assert all(r["merged"] == r["lhs"] + r["rhs"] for r in merges)
    seg = bpe_segment_counts(docs, n_merges).collect()
    for r in seg:
        assert r["n_subwords"] >= 0
        if r["n_tokens"] > 0:
            assert r["n_subwords"] >= r["n_tokens"] or r["n_subwords"] == 0


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(spec=doc_spec, pct=st.integers(1, 100))
def test_stratified_sample_exact_rate(spark, spec, pct):
    """Each (source, lang) cell keeps exactly ceil(frac * cell_n)."""
    import math

    from icebug_spark.llm.mixing import stratified_sample

    frac = pct / 100.0
    docs = _mk_docs(spark, spec)
    cells = {}
    for r in docs.select("source", "lang").collect():
        cells[(r["source"], r["lang"])] = cells.get((r["source"], r["lang"]), 0) + 1
    out = stratified_sample(docs, frac=frac).collect()
    got = {}
    for r in out:
        got[(r["source"], r["lang"])] = got.get((r["source"], r["lang"]), 0) + 1
    for cell, n in cells.items():
        assert got.get(cell, 0) == math.ceil(frac * n)


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(spec=doc_spec, n_stages=st.integers(1, 5))
def test_curriculum_stage_balance(spark, spec, n_stages):
    """Stages partition 0..n_stages-1 with sizes differing by at most 1,
    and stage is monotone in rank."""
    from icebug_spark.llm.mixing import curriculum_stages

    docs = _mk_docs(spark, spec)
    out = sorted(
        curriculum_stages(docs, n_stages=n_stages).collect(),
        key=lambda r: r["rank"],
    )
    n = len(out)
    sizes = {}
    prev_stage = 0
    for r in out:
        assert 0 <= r["stage"] < n_stages
        assert r["stage"] >= prev_stage
        prev_stage = r["stage"]
        sizes[r["stage"]] = sizes.get(r["stage"], 0) + 1
    if n >= n_stages:
        assert max(sizes.values()) - min(sizes.values()) <= 1
