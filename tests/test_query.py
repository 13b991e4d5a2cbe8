"""BM25 query parity against a pure-Python oracle.

The oracle mirrors Query-engine.hpp:145-155,275-374 line-for-line
(SURVEY.md §5.2.2): compat mode forces tf=1 and floor(avgdl) fallback;
true mode uses real tfs. Rank-identity with (score desc, docid asc)
tiebreak is asserted for single-term, AND and OR queries.
"""

import math

import pytest
from pyspark.sql import functions as F

from large_scale_hypertextual_search_engine_spark.operators.index_build import (
    build_index,
)
from large_scale_hypertextual_search_engine_spark.operators.query import (
    search,
    search_batch,
)

K1, B = 1.5, 0.75


class PyOracle:
    """In-memory index + scorer over the same corpus."""

    def __init__(self, docs: list[tuple[str, str]]):
        self.postings: dict[str, dict[str, int]] = {}
        self.doc_len: dict[str, int] = {}
        for docid, text in docs:
            toks = [t for t in text.split(" ") if t]
            self.doc_len[docid] = len(toks)
            for t in toks:
                self.postings.setdefault(t, {})
                self.postings[t][docid] = self.postings[t].get(docid, 0) + 1
        self.n_docs = len(docs)
        self.avg_dl = sum(self.doc_len.values()) / self.n_docs
        # internal ids: dense by docid sort order (engine convention)
        self.doc_int = {d: i + 1 for i, d in enumerate(sorted(self.doc_len))}

    def bm25(self, tf, df, dl):
        idf = math.log((self.n_docs - df + 0.5) / (df + 0.5) + 1.0)
        tfc = ((K1 + 1.0) * tf) / (K1 * (1.0 - B + B * (dl / self.avg_dl)) + tf)
        return idf * tfc

    def search(self, terms, top_k=10, mode="and", tf_mode="true"):
        found = [t for t in dict.fromkeys(terms) if t in self.postings]
        if not found:
            return []
        if mode == "and":
            cands = set(self.postings[found[0]])
            for t in found[1:]:
                cands &= set(self.postings[t])
        else:
            cands = set()
            for t in found:
                cands |= set(self.postings[t])
        results = []
        for d in cands:
            score = 0.0
            for t in found:
                if d not in self.postings[t]:
                    continue
                tf = 1 if tf_mode == "compat" else self.postings[t][d]
                score += self.bm25(tf, len(self.postings[t]), self.doc_len[d])
            results.append((d, score))
        results.sort(key=lambda r: (-r[1], self.doc_int[r[0]]))
        return results[:top_k]


@pytest.fixture(scope="module")
def corpus(spark):
    rows = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .selectExpr("cast(doc_id as string) as docid", "text as content")
        .collect()
    )
    return [(r["docid"], r["content"]) for r in rows]


@pytest.fixture(scope="module")
def indexes(spark, corpus):
    docs = spark.createDataFrame(corpus, "docid string, content string")
    idx = build_index(docs, mode="simple", stem=False, salt_buckets=2)
    for k in ("doc_stats", "postings", "lexicon", "docid_map", "collection_stats"):
        idx[k] = idx[k].cache()
    return idx, PyOracle(corpus)


QUERIES = [
    (["spark"], "and"),
    (["the"], "and"),                      # skewed high-df term
    (["spark", "join"], "and"),
    (["spark", "join", "window"], "and"),
    (["spark", "join"], "or"),
    (["nonexistentterm"], "and"),          # empty result
    (["spark", "nonexistentterm"], "and"), # reference skips missing terms
    (["merge", "sort", "hash", "scan"], "and"),
]


@pytest.mark.parametrize("terms,mode", QUERIES)
@pytest.mark.parametrize("tf_mode", ["true", "compat"])
def test_search_matches_oracle(indexes, terms, mode, tf_mode):
    idx, oracle = indexes
    expect = oracle.search(terms, top_k=10, mode=mode, tf_mode=tf_mode)
    got = (
        search(idx, terms, top_k=10, mode=mode, tf_mode=tf_mode)
        .orderBy("rank")
        .collect()
    )
    assert [r["docid"] for r in got] == [d for d, _ in expect]
    for r, (_, s) in zip(got, expect):
        assert r["score"] == pytest.approx(s, rel=1e-9)


def test_search_batch_one_job(spark, indexes):
    idx, oracle = indexes
    qdefs = {1: ["spark"], 2: ["spark", "join"], 3: ["the", "a"]}
    qrows = [(qid, t) for qid, ts in qdefs.items() for t in ts]
    queries = spark.createDataFrame(qrows, "query_id long, term string")
    got = search_batch(idx, queries, top_k=5, tf_mode="true").collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, terms in qdefs.items():
        expect = oracle.search(terms, top_k=5)
        rows = sorted(by_q.get(qid, []), key=lambda r: r["rank"])
        assert [r["docid"] for r in rows] == [d for d, _ in expect], qid


def test_search_text_analyzed(indexes):
    idx, oracle = indexes
    got = [
        r["docid"]
        for r in __import__(
            "large_scale_hypertextual_search_engine_spark.operators.query",
            fromlist=["search_text"],
        ).search_text(idx, "spark join", analyzer_mode="simple").orderBy("rank").collect()
    ]
    expect = [d for d, _ in oracle.search(["spark", "join"])]
    assert got == expect


def test_semantic_expander_hook(spark, indexes):
    """Q13: SemanticExpander is declared-but-undefined in the reference
    (Query-engine.hpp:14,377-395); our hook defaults to identity (== no
    expander) and a custom expander's terms reach the search."""
    from large_scale_hypertextual_search_engine_spark.operators.query import (
        SemanticExpander, search_text,
    )

    idx, _oracle = indexes
    base = search_text(
        idx, "spark", analyzer_mode="simple", stem=False
    ).collect()
    ident = search_text(
        idx, "spark", analyzer_mode="simple", stem=False,
        expander=SemanticExpander(),
    ).collect()
    assert sorted(map(tuple, base)) == sorted(map(tuple, ident))

    class AddJoin(SemanticExpander):
        def expand_query(self, tokens, max_expansions=2):
            return tokens + ["join"]

    expanded = search_text(
        idx, "spark", analyzer_mode="simple", stem=False,
        expander=AddJoin(), mode="and",
    ).collect()
    want = search(idx, ["spark", "join"], mode="and").collect()
    assert sorted(map(tuple, expanded)) == sorted(map(tuple, want))


def test_search_batch_duplicate_terms_dedupe(spark, indexes):
    """A caller repeating (query_id, term) must get the same result as
    the deduped query — previously the duplicate inflated n_matched
    (2x per doc) past n_found (distinct) and EVERY doc failed the AND
    filter; scores also double-counted (round-3 punch item #6)."""
    idx, _oracle = indexes
    clean = spark.createDataFrame(
        [(1, "spark"), (1, "join")], "query_id long, term string"
    )
    duped = spark.createDataFrame(
        [(1, "spark"), (1, "join"), (1, "spark"), (1, "join"), (1, "join")],
        "query_id long, term string",
    )
    for mode in ("and", "or"):
        want = sorted(
            (r["rank"], r["doc_int"], round(r["score"], 12))
            for r in search_batch(idx, clean, top_k=5, mode=mode).collect()
        )
        got = sorted(
            (r["rank"], r["doc_int"], round(r["score"], 12))
            for r in search_batch(idx, duped, top_k=5, mode=mode).collect()
        )
        assert got == want, mode
        assert len(want) > 0, mode


def test_search_doc_filter(spark, indexes):
    """Filtered retrieval: result = unfiltered result restricted to the
    filter set with ranks recomputed; scores of surviving docs are
    unchanged (global df/n_docs/avg_dl)."""
    idx, _ = indexes
    terms = ["spark", "join"]
    full = search(idx, terms, top_k=10**6, mode="and").collect()
    keep = {r["docid"] for r in full if int(r["docid"]) % 3 == 0}
    flt = spark.createDataFrame([(d,) for d in keep], "docid string")
    got = search(idx, terms, top_k=10**6, mode="and", doc_filter=flt).collect()
    assert {r["docid"] for r in got} == keep
    full_scores = {r["docid"]: r["score"] for r in full}
    for r in got:
        assert r["score"] == full_scores[r["docid"]], r["docid"]
    # ranks are dense 1..n over the survivors, same (score, doc) order
    want_order = [
        r["docid"] for r in sorted(full, key=lambda r: r["rank"])
        if r["docid"] in keep
    ]
    got_order = [r["docid"] for r in sorted(got, key=lambda r: r["rank"])]
    assert got_order == want_order
    assert [r["rank"] for r in sorted(got, key=lambda r: r["rank"])] == list(
        range(1, len(keep) + 1)
    )


def test_search_doc_filter_by_doc_int_and_empty(spark, indexes):
    idx, _ = indexes
    some = idx["docid_map"].limit(50).select("doc_int")
    got = search(idx, ["the"], top_k=10**6, doc_filter=some).collect()
    kept = {r["doc_int"] for r in some.collect()}
    assert {r["doc_int"] for r in got} <= kept
    assert got  # 'the' is near-universal, the slice must hit
    empty = spark.createDataFrame([], "docid string")
    assert search(idx, ["the"], doc_filter=empty).count() == 0


@pytest.mark.parametrize("mode", ["and", "or"])
def test_match_docs_bit_identical_to_search(spark, indexes, mode):
    """match_docs (the rank-window-free full match set) returns exactly
    the docs and BIT-identical scores of search() with an unbounded
    top_k — same candidate pipeline, same sorted FP fold, no window."""
    from large_scale_hypertextual_search_engine_spark.operators.query import (
        match_docs,
    )

    idx, _ = indexes
    terms = ["spark", "join"]
    full = {
        r["doc_int"]: r["score"]
        for r in search(idx, terms, top_k=2**31 - 1, mode=mode).collect()
    }
    md = {
        r["doc_int"]: r["score"]
        for r in match_docs(idx, terms, mode=mode).collect()
    }
    assert md == full  # exact float equality: same fold, same order


def test_match_docs_missing_term_and_filter(spark, indexes):
    """AND mode intersects only lexicon-present terms (the reference's
    skip semantics) and doc_filter composes the same as search."""
    from large_scale_hypertextual_search_engine_spark.operators.query import (
        match_docs,
    )

    idx, _ = indexes
    base = {r["doc_int"] for r in match_docs(idx, ["spark", "join"]).collect()}
    with_missing = {
        r["doc_int"]
        for r in match_docs(idx, ["spark", "join", "zzzznope"]).collect()
    }
    assert with_missing == base
    keep = spark.createDataFrame(
        [(d,) for d in sorted(base)[:3]], "doc_int long"
    )
    filtered = {
        r["doc_int"]
        for r in match_docs(idx, ["spark", "join"], doc_filter=keep).collect()
    }
    assert filtered == set(sorted(base)[:3])


@pytest.mark.parametrize("msm", [1, 2, 3, 4])
def test_min_should_match_bruteforce(spark, indexes, msm):
    """OR + min_should_match=m keeps exactly the docs matching >= m
    distinct query terms, scored identically to plain OR (Lucene
    minimumNumberShouldMatch semantics)."""
    idx, oracle = indexes
    terms = ["merge", "window", "spark"]
    got = {
        r["docid"]: (r["rank"], r["score"])
        for r in search(
            idx, terms, top_k=2**31 - 1, mode="or", min_should_match=msm
        ).collect()
    }
    # brute force from the python oracle's postings
    found = [t for t in terms if t in oracle.postings]
    cands = {
        d
        for d in set().union(*(set(oracle.postings[t]) for t in found))
        if sum(d in oracle.postings[t] for t in found) >= msm
    }
    full = dict(oracle.search(terms, top_k=2**31 - 1, mode="or"))
    expect_docs = {d for d in full if d in cands}
    assert set(got) == expect_docs
    for d, (rank, score) in got.items():
        assert score == pytest.approx(full[d], abs=1e-9)
    # m = len(terms) degenerates to AND membership
    if msm == 3:
        and_docs = {r["docid"] for r in search(idx, terms, top_k=2**31 - 1, mode="and").collect()}
        assert set(got) == and_docs
    if msm == 4:
        assert got == {}


def test_min_should_match_one_is_plain_or(spark, indexes):
    idx, _ = indexes
    terms = ["merge", "window"]
    a = search(idx, terms, top_k=50, mode="or").collect()
    b = search(idx, terms, top_k=50, mode="or", min_should_match=1).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_min_should_match_oov_terms_never_count(spark, indexes):
    """An out-of-vocabulary term cannot satisfy the minimum: requiring
    2-of-(real, oov) yields nothing; 1-of matches the real term's OR."""
    idx, _ = indexes
    assert (
        search(idx, ["merge", "zzzznope"], top_k=10, mode="or",
               min_should_match=2).count() == 0
    )
    a = {r["docid"] for r in search(idx, ["merge"], top_k=10, mode="or").collect()}
    b = {
        r["docid"]
        for r in search(idx, ["merge", "zzzznope"], top_k=10, mode="or",
                        min_should_match=1).collect()
    }
    assert a == b
