"""BPE vocabulary-induction tests: greedy-merge semantics and the
merge-sequence golden vs a pure-Python reference loop."""

import collections

import pytest


def _python_bpe(word_freqs, n_merges, min_count=2):
    sym = {w: list(w) for w in word_freqs}
    merges = []
    for rank in range(1, n_merges + 1):
        cnt = collections.Counter()
        for w, f in word_freqs.items():
            s = sym[w]
            for i in range(len(s) - 1):
                cnt[(s[i], s[i + 1])] += f
        cand = [(c, l, r) for (l, r), c in cnt.items() if c >= min_count]
        if not cand:
            break
        c, l, r = sorted(cand, key=lambda x: (-x[0], x[1], x[2]))[0]
        merges.append((rank, l, r, l + r, c))
        for w in sym:
            s, out, i = sym[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            sym[w] = out
    return merges


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t, "en", "s0", len(t)) for i, t in enumerate(texts)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )


def test_bpe_matches_python_reference(spark):
    from icebug_spark.llm.tokenize import bpe_learn

    texts = [
        "lower lower lowest newer newer newest wide wider widest",
        "low low low new new wide wide",
    ]
    freqs = collections.Counter(
        w for t in texts for w in t.lower().split()
    )
    gold = _python_bpe(dict(freqs), 6)
    got = [
        (r["merge_rank"], r["lhs"], r["rhs"], r["merged"], r["pair_count"])
        for r in bpe_learn(_docs(spark, texts), 6)
        .orderBy("merge_rank")
        .collect()
    ]
    assert got == gold


def test_bpe_greedy_run_semantics(spark):
    from icebug_spark.llm.tokenize import bpe_learn

    # 'aaa' x5: pair (a,a) counts every adjacent position (2 per word);
    # the greedy merge leaves [aa, a], so merge 2 is (aa, a)
    out = bpe_learn(_docs(spark, ["aaa aaa aaa aaa aaa"]), 2).collect()
    m = {r["merge_rank"]: r for r in out}
    assert (m[1]["lhs"], m[1]["rhs"], m[1]["pair_count"]) == ("a", "a", 10)
    assert (m[2]["lhs"], m[2]["rhs"], m[2]["pair_count"]) == ("aa", "a", 5)


def test_bpe_early_stop(spark):
    from icebug_spark.llm.tokenize import bpe_learn

    # all words distinct single chars -> no pair ever reaches min_count
    out = bpe_learn(_docs(spark, ["a b c d"]), 5).collect()
    assert out == []


def test_bpe_sql_oracle_matches(spark):
    import duckdb

    from icebug_spark.llm.tokenize import bpe_learn, bpe_learn_sql

    texts = [
        "the cat sat on the mat",
        "the cat sat on the hat",
        "a cat and a hat and a mat",
    ]
    docs = _docs(spark, texts)
    a = sorted(map(tuple, bpe_learn(docs, 5).collect()))
    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    b = sorted(map(tuple, con.sql(bpe_learn_sql(5)).fetchall()))
    assert a == b


def test_bpe_segment_counts(spark):
    from icebug_spark.llm.tokenize import bpe_segment_counts

    # merges learned on this corpus: (a,a) then (aa,a) etc.; doc 1 is
    # blank and must survive with zeros
    texts = ["aaaa aaaa aaaa bb bb", "   "]
    out = {
        r["doc_id"]: r
        for r in bpe_segment_counts(_docs(spark, texts), n_merges=2).collect()
    }
    # merge1 (a,a) cnt=9, merge2 (aa,aa) cnt=3 -> 'aaaa'=[aaaa] 1 subword,
    # 'bb'=[b,b] 2 subwords
    assert out[0]["n_tokens"] == 5
    assert out[0]["n_subwords"] == 3 * 1 + 2 * 2
    # compression = chars-in-words / subwords = (12 + 4) / 7
    assert abs(out[0]["compression"] - 16 / 7) < 1e-5
    assert out[1]["n_tokens"] == 0 and out[1]["compression"] == 0.0


def test_bpe_n_merges_guard(spark):
    from icebug_spark.llm.tokenize import bpe_learn, bpe_learn_sql

    with pytest.raises(ValueError):
        bpe_learn(_docs(spark, ["a b"]), 0)
    with pytest.raises(ValueError):
        bpe_learn_sql(0)


def test_bpe_jobs_per_merge_round(spark):
    """Each merge round must cost at most 3 jobs (argmax pull + pinned
    state rewrite + 1 slack) — a reintroduced per-round extra action
    (e.g. a separate count) fails this pin."""
    from icebug_spark.llm.tokenize import bpe_learn

    sc = spark.sparkContext

    def jobs(n_merges):
        docs = _docs(spark, ["aaaaaaaaaaaaaaaa bbbbbbbb cccc dd"] * 3)
        group = f"bpe_jobs_{n_merges}"
        sc.setJobGroup(group, "probe")
        got = bpe_learn(docs, n_merges).count()
        sc.setJobGroup(None, None)
        assert got == n_merges  # runs of a/b/c/d merge for many rounds
        return len(sc.statusTracker().getJobIdsForGroup(group))

    j2, j6 = jobs(2), jobs(6)
    marginal = (j6 - j2) / 4.0
    assert marginal <= 3.0, f"jobs/merge regressed: {marginal} (j2={j2}, j6={j6})"
