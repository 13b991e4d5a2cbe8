"""search_after keyset pagination + search_sorted field sort:
page-concatenation identity vs the global ordering, no skip/dup under
score ties, sorted-retrieval brute parity, NULL-last semantics."""

import pytest
from pyspark.sql import functions as F

from large_scale_hypertextual_search_engine_spark.operators.index_build import (
    build_index,
)
from large_scale_hypertextual_search_engine_spark.operators.pagination import (
    search_after,
    search_sorted,
)
from large_scale_hypertextual_search_engine_spark.operators.query import search


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
def pg_index(spark, corpus):
    return build_index(
        corpus.select("docid", "content"), mode="simple", stem=False,
        salt_buckets=2,
    )


def test_pages_concatenate_to_global_order(spark, pg_index):
    """Walking 3 pages of 7 via search_after reproduces search(top_k=21)
    exactly — same docs, same order, bit-equal scores."""
    want = search(pg_index, ["merge", "window"], top_k=21, mode="or").collect()
    got, cursor = [], None
    for _ in range(3):
        page = search_after(
            pg_index, ["merge", "window"], cursor=cursor, page_size=7,
            mode="or",
        ).collect()
        assert [r["rank"] for r in page] == list(range(1, len(page) + 1))
        got += page
        cursor = (page[-1]["score"], page[-1]["doc_int"])
    assert [(r["docid"], r["score"]) for r in got] == [
        (r["docid"], r["score"]) for r in want
    ]
    assert len(got) == 21


def test_no_skip_or_dup_under_ties(spark, pg_index):
    """A single-term query gives many identical BM25 scores (same tf,
    same dl bucket); keyset paging through the ENTIRE match set must
    visit every doc exactly once."""
    full = search(pg_index, ["spark"], top_k=1 << 30, mode="or").collect()
    seen, cursor = [], None
    while True:
        page = search_after(
            pg_index, ["spark"], cursor=cursor, page_size=13, mode="or"
        ).collect()
        if not page:
            break
        seen += [r["docid"] for r in page]
        cursor = (page[-1]["score"], page[-1]["doc_int"])
    assert seen == [r["docid"] for r in full]
    assert len(seen) == len(set(seen))


def test_page1_equals_search(spark, pg_index):
    a = search_after(pg_index, ["spark", "join"], page_size=10).collect()
    b = search(pg_index, ["spark", "join"], top_k=10).collect()
    assert [(r["rank"], r["docid"], r["score"]) for r in a] == [
        (r["rank"], r["docid"], r["score"]) for r in b
    ]


def test_search_sorted_brute(spark, corpus, pg_index):
    meta = corpus.select("docid", "n_chars")
    got = [
        (r["rank"], r["docid"], r["sort_value"])
        for r in search_sorted(
            pg_index, ["spark", "join"], meta, "n_chars",
            ascending=False, top_k=8, mode="and",
        ).collect()
    ]
    full = search(pg_index, ["spark", "join"], top_k=1 << 30, mode="and")
    qmap = {r["docid"]: r["n_chars"] for r in corpus.collect()}
    want = sorted(
        (
            (qmap[r["docid"]], r["score"], r["doc_int"], r["docid"])
            for r in full.collect()
        ),
        key=lambda x: (-x[0], -x[1], x[2]),
    )[:8]
    assert got == [(i + 1, d, q) for i, (q, _, _, d) in enumerate(want)]
    assert got, "vacuous"


def test_search_sorted_nulls_last(spark, corpus, pg_index):
    """Docs absent from the sort table sort last in both directions."""
    meta = corpus.select("docid", "n_chars").limit(0)
    n = search(pg_index, ["spark"], top_k=1 << 30).count()
    rows = search_sorted(
        pg_index, ["spark"], meta, "n_chars", top_k=n
    ).collect()
    assert all(r["sort_value"] is None for r in rows)
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
