"""Boolean match sets compose with every match-set consumer:
facets / collapse / pagination / numeric aggs / sigterms over a
boolean_match_docs frame, plus boolean_search == match_docs + tail."""

import pytest
from pyspark.sql import functions as F

from large_scale_hypertextual_search_engine_spark.operators.boolsearch import (
    boolean_match_docs,
    boolean_search,
)
from large_scale_hypertextual_search_engine_spark.operators.collapse import (
    search_collapse,
)
from large_scale_hypertextual_search_engine_spark.operators.facets import (
    search_facets,
    stats_facet,
)
from large_scale_hypertextual_search_engine_spark.operators.index_build import (
    build_index,
)
from large_scale_hypertextual_search_engine_spark.operators.pagination import (
    search_after,
)

Q = "(merge OR spark) AND NOT join"


@pytest.fixture(scope="module")
def corpus(spark):
    return (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .selectExpr(
            "cast(doc_id as string) as docid",
            "text as content",
            "lang",
            "n_chars",
        )
        .cache()
    )


@pytest.fixture(scope="module")
def bc_index(spark, corpus):
    return build_index(
        corpus.select("docid", "content"), mode="simple", stem=False,
        salt_buckets=2,
    )


def _bool_docs(corpus):
    out = {}
    for r in corpus.collect():
        toks = set(t for t in r["content"].split(" ") if t)
        if ("merge" in toks or "spark" in toks) and "join" not in toks:
            out[r["docid"]] = r
    return out


def test_boolean_search_equals_matchset_tail(spark, bc_index):
    """The refactor is behavior-preserving: boolean_search's top-k is
    the match set's (score desc, doc_int asc) head, bit-equal."""
    got = boolean_search(bc_index, Q, top_k=10).collect()
    match = boolean_match_docs(bc_index, Q).collect()
    want = sorted(match, key=lambda r: (-r["score"], r["doc_int"]))[:10]
    assert [(r["doc_int"], r["score"]) for r in got] == [
        (r["doc_int"], r["score"]) for r in want
    ]
    assert got


def test_facets_over_boolean(spark, corpus, bc_index):
    want_docs = _bool_docs(corpus)
    counts: dict[str, int] = {}
    for r in want_docs.values():
        v = r["lang"] if r["lang"] is not None else "(none)"
        counts[str(v)] = counts.get(str(v), 0) + 1
    got = {
        r["value"]: r["n_docs"]
        for r in search_facets(
            bc_index, boolean_match_docs(bc_index, Q),
            corpus.select("docid", "lang"), ["lang"], top_n=100,
        ).collect()
    }
    assert got == counts and got


def test_collapse_over_boolean(spark, corpus, bc_index):
    """Rank-1 group head == boolean_search's global top hit."""
    top1 = boolean_search(bc_index, Q, top_k=1).collect()[0]
    head = search_collapse(
        bc_index, boolean_match_docs(bc_index, Q),
        corpus.select("docid", "lang"), "lang", top_k=1,
    ).collect()[0]
    assert head["docid"] == top1["docid"]
    assert head["score"] == top1["score"]


def test_search_after_over_boolean(spark, bc_index):
    """Keyset pages over a boolean match set concatenate to the
    boolean ranking."""
    want = boolean_search(bc_index, Q, top_k=14).collect()
    match = boolean_match_docs(bc_index, Q)
    p1 = search_after(bc_index, match, page_size=7).collect()
    p2 = search_after(
        bc_index, match,
        cursor=(p1[-1]["score"], p1[-1]["doc_int"]), page_size=7,
    ).collect()
    assert [(r["docid"], r["score"]) for r in p1 + p2] == [
        (r["docid"], r["score"]) for r in want
    ]


def test_stats_facet_over_boolean(spark, corpus, bc_index):
    vals = [
        r["n_chars"] for r in _bool_docs(corpus).values()
        if r["n_chars"] is not None
    ]
    r = stats_facet(
        bc_index, boolean_match_docs(bc_index, Q),
        corpus.select("docid", "n_chars"), "n_chars",
    ).collect()[0]
    assert r["n_docs"] == len(vals)
    assert r["sum"] == pytest.approx(sum(vals))


def test_doc_filter_applies_to_match_frame(spark, corpus, bc_index):
    """match_docs applies doc_filter to a pre-computed frame too."""
    from large_scale_hypertextual_search_engine_spark.operators.query import (
        match_docs,
    )

    keep = corpus.select("docid").filter(
        F.col("docid").cast("long") % 2 == 0
    )
    full = match_docs(bc_index, boolean_match_docs(bc_index, Q)).collect()
    filt = match_docs(
        bc_index, boolean_match_docs(bc_index, Q), doc_filter=keep
    ).collect()
    kept = {r["docid"] for r in keep.collect()}
    dmap = {
        r["doc_int"]: r["docid"]
        for r in bc_index["docid_map"].collect()
    }
    assert {r["doc_int"] for r in filt} == {
        r["doc_int"] for r in full if dmap[r["doc_int"]] in kept
    }
    assert filt and len(filt) < len(full)


def test_phrase_and_proximity_match_docs_compose(spark, corpus, bc_index):
    """phrase/proximity match sets feed consumers too; their top-k
    tails stay bit-equal to the search functions."""
    from large_scale_hypertextual_search_engine_spark.operators.phrase import (
        phrase_match_docs,
        phrase_search,
        proximity_match_docs,
        proximity_search,
    )

    ph = phrase_match_docs(bc_index, ["fast", "key"]).collect()
    want = phrase_search(bc_index, ["fast", "key"], top_k=5).collect()
    head = sorted(ph, key=lambda r: (-r["score"], r["doc_int"]))[:5]
    assert [(r["doc_int"], r["score"]) for r in want] == [
        (r["doc_int"], r["score"]) for r in head
    ]
    assert want

    pr = proximity_match_docs(bc_index, "fast", "key", slop=4).collect()
    wantp = proximity_search(bc_index, "fast", "key", slop=4, top_k=5).collect()
    headp = sorted(pr, key=lambda r: (-r["score"], r["doc_int"]))[:5]
    assert [(r["doc_int"], r["score"], r["min_dist"]) for r in wantp] == [
        (r["doc_int"], r["score"], r["min_dist"]) for r in headp
    ]
    assert wantp

    # facets over the phrase match set == brute facet counts over docs
    # containing the exact phrase
    got = {
        r["value"]: r["n_docs"]
        for r in search_facets(
            bc_index, phrase_match_docs(bc_index, ["fast", "key"]),
            corpus.select("docid", "lang"), ["lang"], top_n=100,
        ).collect()
    }
    counts: dict[str, int] = {}
    for r in corpus.collect():
        toks = [t for t in r["content"].split(" ") if t]
        if any(
            toks[i] == "fast" and toks[i + 1] == "key"
            for i in range(len(toks) - 1)
        ):
            v = str(r["lang"]) if r["lang"] is not None else "(none)"
            counts[v] = counts.get(v, 0) + 1
    assert got == counts and got
