"""Best-window snippets: brute-force parity, tie-breaks, short docs,
end-to-end search_snippets, and plan shape (pure JVM, broadcast-only)."""

import re

import pytest

from large_scale_hypertextual_search_engine_spark.operators.snippet import (
    best_window_snippets,
    search_snippets,
)


def _brute_best(text, terms, window):
    toks = [t for t in text.split(" ") if t]
    n = len(toks)
    starts = range(max(n - window, 0) + 1)
    best_s, best_h = 0, -1
    for s in starts:
        win = toks[s : s + window]
        h = sum(1 for t in dict.fromkeys(terms) if t in win)
        if h > best_h:
            best_s, best_h = s, h
    return " ".join(toks[best_s : best_s + window]), best_h, best_s


@pytest.fixture(scope="module")
def corpus(spark):
    return (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .limit(200)
    )


def test_matches_bruteforce_on_corpus(spark, corpus):
    terms, window = ["spark", "join", "merge"], 8
    got = {
        r["doc_id"]: (r["snippet"], r["n_hits"], r["start"])
        for r in best_window_snippets(corpus, terms, window=window).collect()
    }
    rows = corpus.collect()
    assert len(got) == len(rows)
    for r in rows:
        assert got[r["doc_id"]] == _brute_best(r["text"], terms, window), r[
            "doc_id"
        ]


def test_tiebreak_earliest_and_short_doc(spark):
    df = spark.createDataFrame(
        [
            (1, "a x x x a x x x"),   # two windows tie at 1 hit -> earliest
            (2, "x a"),               # doc shorter than window
            (3, "b b b a"),           # best window not at position 0
            (4, ""),                  # empty text
        ],
        "doc_id int, text string",
    )
    out = {
        r["doc_id"]: (r["snippet"], r["n_hits"], r["start"])
        for r in best_window_snippets(df, ["a"], window=3).collect()
    }
    assert out[1] == ("a x x", 1, 0)
    assert out[2] == ("x a", 1, 0)
    assert out[3] == ("b b a", 1, 1)
    assert out[4] == ("", 0, 0)


def test_duplicate_terms_counted_once(spark):
    df = spark.createDataFrame([(1, "a b a b c")], "doc_id int, text string")
    r = best_window_snippets(df, ["a", "a", "b"], window=4).collect()[0]
    assert r["n_hits"] == 2  # distinct terms, not occurrences


def test_search_snippets_end_to_end(spark, corpus):
    from large_scale_hypertextual_search_engine_spark.operators.index_build import (
        build_index,
    )
    from large_scale_hypertextual_search_engine_spark.operators.query import search

    docs = corpus.selectExpr(
        "cast(doc_id as string) as docid", "text as content"
    )
    idx = build_index(docs, mode="simple", stem=False, salt_buckets=2)
    terms = ["spark", "join"]
    res = search_snippets(
        idx, corpus, terms, top_k=5, window=10, mode="and"
    ).collect()
    hits = search(idx, terms, top_k=5, mode="and").collect()
    assert sorted((r["rank"], r["docid"], r["score"]) for r in res) == sorted(
        (r["rank"], r["docid"], r["score"]) for r in hits
    )
    text_by_id = {r["doc_id"]: r["text"] for r in corpus.collect()}
    for r in res:
        snip, h, _s = _brute_best(text_by_id[int(r["docid"])], terms, 10)
        assert (r["snippet"], r["n_hits"]) == (snip, h)
        # AND mode guarantees both terms in the doc, hence at least one
        # in some window (both in ONE window is not guaranteed)
        assert h >= 1


def test_plan_pure_jvm_broadcast_only(spark, corpus):
    from large_scale_hypertextual_search_engine_spark.operators.index_build import (
        build_index,
    )

    docs = corpus.selectExpr(
        "cast(doc_id as string) as docid", "text as content"
    )
    idx = build_index(docs, mode="simple", stem=False, salt_buckets=2)
    plan = (
        search_snippets(idx, corpus, ["spark", "join"], top_k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "SortMergeJoin" not in plan  # hits are broadcast into the scan
    # exactly the one decode kernel from the underlying search()
    assert len(re.findall(r"MapIn(?:Pandas|Arrow) _decode", plan)) == 1
