"""Corpus-assembly operator tests: mixing, packing, boilerplate, split."""

import pytest


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # src a: 3 docs of 4/2/3 tokens
        (0, "one two three four", "en", "a", 18),
        (1, "five six", "en", "a", 8),
        (2, "seven eight nine", "en", "a", 16),
        # src b: 2 docs, one blank
        (3, "alpha beta gamma delta epsilon", "en", "b", 30),
        (4, "   ", "en", "b", 3),
    ]
    return spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    )


def test_temperature_weights_sum_to_one(docs):
    from icebug_spark.llm.mixing import temperature_weights

    rows = {r["source"]: r for r in temperature_weights(docs, 0.5).collect()}
    assert rows["a"]["total_tokens"] == 9
    assert rows["b"]["total_tokens"] == 5
    assert abs(rows["a"]["weight"] + rows["b"]["weight"] - 1.0) < 1e-5
    # alpha=0.5 flattens: a's share < its token share 9/14
    assert rows["a"]["weight"] < 9 / 14


def test_mixture_sample_respects_budget_and_order(docs):
    from icebug_spark.llm.mixing import mixture_sample

    out = mixture_sample(docs, {"a": 6, "b": 100}).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    # src a: greedy in hash order, stop before exceeding 6 tokens
    assert sum(r["n_tokens"] for r in by_src["a"]) <= 6
    assert len(by_src["a"]) >= 1
    # src b fits entirely
    assert sum(r["n_tokens"] for r in by_src["b"]) == 5
    # unbudgeted sources are dropped
    assert mixture_sample(docs, {"a": 100}).where("source = 'b'").count() == 0
    # deterministic: two runs identical
    again = mixture_sample(docs, {"a": 6, "b": 100}).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_mixture_sample_cum_is_per_source(docs):
    from icebug_spark.llm.mixing import mixture_sample

    out = mixture_sample(docs, {"a": 100, "b": 100}).collect()
    for src in ("a", "b"):
        rows = sorted(
            (r for r in out if r["source"] == src), key=lambda r: r["cum_tokens"]
        )
        run = 0
        for r in rows:
            run += r["n_tokens"]
            assert r["cum_tokens"] == run


def test_pack_sequences_spans(docs):
    from icebug_spark.llm.mixing import pack_sequences

    rows = {r["doc_id"]: r for r in pack_sequences(docs, seq_len=4).collect()}
    # src a in doc_id order: doc0 [0,4) seq 0..0, doc1 [4,6) seq 1,
    # doc2 [6,9) seqs 1..2
    assert (rows[0]["start_tok"], rows[0]["end_tok"]) == (0, 4)
    assert (rows[0]["first_seq"], rows[0]["last_seq"]) == (0, 0)
    assert (rows[1]["first_seq"], rows[1]["last_seq"]) == (1, 1)
    assert (rows[2]["start_tok"], rows[2]["end_tok"]) == (6, 9)
    assert (rows[2]["first_seq"], rows[2]["last_seq"]) == (1, 2)
    # src b: blank doc occupies zero tokens, first_seq == last_seq
    assert rows[4]["n_tokens"] == 0
    assert rows[4]["first_seq"] == rows[4]["last_seq"]
    with pytest.raises(ValueError):
        pack_sequences(docs, seq_len=0)


def test_boilerplate_removal(spark):
    from icebug_spark.llm.mixing import boilerplate_lines, remove_boilerplate

    rows = [
        (0, "COOKIE BANNER\nreal content zero\nfooter", "en", "a", 1),
        (1, "cookie banner\nreal content one\nFooter", "en", "a", 1),
        (2, "unique document two", "en", "b", 1),
        (3, "\n\n", "en", "b", 1),  # blank lines are never boilerplate
    ]
    docs = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    )
    boiler = {r["line_norm"] for r in boilerplate_lines(docs, 2).collect()}
    assert boiler == {"cookie banner", "footer"}

    out = {r["doc_id"]: r for r in remove_boilerplate(docs, 2).collect()}
    assert out[0]["clean_text"] == "real content zero"
    assert out[0]["n_lines_removed"] == 2
    assert out[1]["clean_text"] == "real content one"
    # untouched doc survives byte-identical
    assert out[2]["clean_text"] == "unique document two"
    assert out[2]["n_lines_removed"] == 0
    # all-blank doc: lines kept (blank ≠ boilerplate), text preserved
    assert out[3]["clean_text"] == "\n\n"
    assert out[3]["n_lines_kept"] == 3


def test_boilerplate_preserves_line_order(spark):
    from icebug_spark.llm.mixing import remove_boilerplate

    docs = spark.createDataFrame(
        [
            (0, "z last\nshared\nm middle\nshared\na first", "en", "a", 1),
            (1, "shared", "en", "a", 1),
        ],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    out = {r["doc_id"]: r for r in remove_boilerplate(docs, 2).collect()}
    assert out[0]["clean_text"] == "z last\nm middle\na first"


def test_train_test_split(docs):
    from icebug_spark.llm.mixing import train_test_split

    out = {r["doc_id"]: r["split"] for r in train_test_split(docs, 0.5).collect()}
    assert set(out.values()) <= {"train", "test"}
    # frac 0 / 1 are the degenerate extremes
    all_train = train_test_split(docs, 0.0).collect()
    assert all(r["split"] == "train" for r in all_train)
    # stability: a doc's split is independent of the rest of the corpus
    sub = docs.where("doc_id <= 1")
    sub_out = {
        r["doc_id"]: r["split"] for r in train_test_split(sub, 0.5).collect()
    }
    for k, v in sub_out.items():
        assert out[k] == v
    with pytest.raises(ValueError):
        train_test_split(docs, 1.5)


def test_mixing_duckdb_twins(spark, docs):
    """Full-value parity of every mixing twin on the synthetic docs —
    the same comparison the sweep runs, on data with the edge cases
    (blank doc, multi-source)."""
    import duckdb

    from icebug_spark.llm import mixing

    pdf = docs.toPandas()
    con = duckdb.connect()
    con.register("documents", pdf)

    cases = [
        (mixing.temperature_weights(docs, 0.5), mixing.temperature_weights_sql(0.5)),
        (
            mixing.mixture_sample(docs, {"a": 6, "b": 100}),
            mixing.mixture_sample_sql({"a": 6, "b": 100}),
        ),
        (mixing.pack_sequences(docs, 4), mixing.pack_sequences_sql(4)),
        (
            mixing.remove_boilerplate(docs, 2),
            mixing.REMOVE_BOILERPLATE_SQL_TMPL.format(min_docs=2),
        ),
        (mixing.train_test_split(docs, 0.5), mixing.train_test_split_sql(0.5)),
    ]
    for sdf, sql in cases:
        got = sorted(map(tuple, sdf.collect()))
        want = sorted(map(tuple, con.sql(sql).fetchall()))
        assert len(got) == len(want)
        for g, w in zip(got, want):
            for a, b in zip(g, w):
                if isinstance(a, float):
                    assert abs(a - float(b)) < 1e-9
                else:
                    assert a == b


def test_mixing_plans_avoid_single_partition_exchange(spark, docs):
    """The scale contract of the module docstring: no per-source
    single-partition window anywhere in the mixing/packing plans (the
    two-pass running sum replaces it)."""
    from icebug_spark.llm import mixing

    for df in (
        mixing.mixture_sample(docs, {"a": 6, "b": 100}),
        mixing.pack_sequences(docs, 4),
        mixing.remove_boilerplate(docs, 2),
        mixing.train_test_split(docs, 0.5),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange SinglePartition" not in plan


def test_corpus_assembly_stages_act(spark):
    """Each pipeline stage must demonstrably change the outcome: a
    low-quality doc and a duplicate doc are dropped before sampling, and
    the packed spans tile each source's surviving token stream."""
    import duckdb

    from icebug_spark.llm import mixing

    good = "the quick brown fox jumps over the lazy dog again and again ok"
    rows = [
        (0, good, "en", "a", 1),
        (1, good + " plus unique tail zero", "en", "a", 1),
        (2, good, "en", "a", 1),          # exact dup of doc 0 → dropped
        (3, "!!!! ???? ....", "en", "a", 1),  # punct-heavy → quality-dropped
        (4, good + " other b text", "en", "b", 1),
    ]
    docs = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    )
    budgets = {"a": 10_000, "b": 10_000}
    out = {r["doc_id"]: r for r in
           mixing.corpus_assembly(docs, budgets, seq_len=8).collect()}
    assert set(out) == {0, 1, 4}  # 2 deduped away, 3 quality-dropped
    # spans tile the per-source stream: sorted starts are contiguous
    spans = sorted(
        (out[d]["start_tok"], out[d]["end_tok"]) for d in (0, 1)
    )
    assert spans[0][0] == 0 and spans[0][1] == spans[1][0]
    # full-value twin parity on the same fixture
    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    want = sorted(map(tuple, con.sql(
        mixing.corpus_assembly_sql(budgets, 8)).fetchall()))
    got = sorted(map(tuple, mixing.corpus_assembly(docs, budgets, 8).collect()))
    assert got == [tuple(int(x) if isinstance(x, int) else x for x in w)
                   for w in want] or len(got) == len(want)
    for g, w in zip(got, want):
        assert all(a == b for a, b in zip(g, w))


def test_stratified_sample_per_cell_rate(spark):
    from icebug_spark.llm.mixing import stratified_sample

    rows = [
        # 10 docs in (a, en), 4 in (a, de), 2 in (b, en)
        *[(i, f"w{i} text", "en", "a", 10) for i in range(10)],
        *[(i, f"w{i} text", "de", "a", 10) for i in range(10, 14)],
        *[(i, f"w{i} text", "en", "b", 10) for i in range(14, 16)],
    ]
    docs = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    )
    out = stratified_sample(docs, frac=0.25).collect()
    cells = {}
    for r in out:
        cells.setdefault((r["source"], r["lang"]), []).append(r)
    # ceil(0.25 * n) per cell: 3, 1, 1
    assert len(cells[("a", "en")]) == 3
    assert len(cells[("a", "de")]) == 1
    assert len(cells[("b", "en")]) == 1
    # ranks are 1..k within each cell and cell_n is the stratum size
    assert sorted(r["cell_rank"] for r in cells[("a", "en")]) == [1, 2, 3]
    assert all(r["cell_n"] == 10 for r in cells[("a", "en")])
    # deterministic across runs
    again = stratified_sample(docs, frac=0.25).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_curriculum_stages_equal_width(spark):
    from icebug_spark.llm.mixing import curriculum_stages

    # quality is monotone in n_tokens here (all-alpha text, no digits)
    rows = [
        (i, " ".join(["word"] * (2 + 3 * i)), "en", "a", 20) for i in range(6)
    ]
    docs = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    )
    out = {r["doc_id"]: r for r in curriculum_stages(docs, n_stages=3).collect()}
    # ranks follow quality order = doc_id order; 6 docs / 3 stages = 2 each
    assert [out[i]["rank"] for i in range(6)] == [1, 2, 3, 4, 5, 6]
    assert [out[i]["stage"] for i in range(6)] == [0, 0, 1, 1, 2, 2]


def test_chunk_documents_overlap(spark):
    from icebug_spark.llm.mixing import chunk_documents

    rows = [
        (0, " ".join(f"t{i}" for i in range(10)), "en", "a", 40),
        (1, "one two", "en", "a", 7),
        (2, "   ", "en", "a", 3),
    ]
    docs = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    )
    out = chunk_documents(docs, size=4, stride=3).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], {})[r["chunk_id"]] = r
    # doc 0: starts 0,3,6,9 -> 4 chunks, last is 1 token
    c = by_doc[0]
    assert sorted(c) == [0, 1, 2, 3]
    assert c[0]["chunk_text"] == "t0 t1 t2 t3"
    assert c[1]["chunk_text"] == "t3 t4 t5 t6"  # 1-token overlap
    assert c[3]["chunk_text"] == "t9" and c[3]["n_chunk_tokens"] == 1
    # every token covered
    covered = set()
    for r in c.values():
        covered |= set(r["chunk_text"].split())
    assert covered == {f"t{i}" for i in range(10)}
    # short doc: single short chunk; blank doc: no chunks
    assert by_doc[1][0]["chunk_text"] == "one two"
    assert 2 not in by_doc


def test_chunk_documents_stride_guard(spark):
    import pytest as _pytest

    from icebug_spark.llm.mixing import chunk_documents

    docs = spark.createDataFrame(
        [(0, "a b c", "en", "a", 5)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    with _pytest.raises(ValueError):
        chunk_documents(docs, size=2, stride=3)
