"""Term vectors: brute parity, index agreement, zero-token drop."""

import pytest
from pyspark.sql import functions as F

from large_scale_hypertextual_search_engine_spark.operators.index_build import (
    build_index,
)
from large_scale_hypertextual_search_engine_spark.operators.termvectors import (
    term_vectors,
)


@pytest.fixture(scope="module")
def corpus(spark):
    return (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .selectExpr("cast(doc_id as string) as docid", "text as content")
        .limit(80)
        .cache()
    )


def test_bruteforce_parity(spark, corpus):
    got = {
        (r["docid"], r["term"]): (r["tf"], list(r["positions"]), r["doc_len"])
        for r in term_vectors(corpus).collect()
    }
    want = {}
    for r in corpus.collect():
        toks = [t for t in r["content"].split(" ") if t]
        for term in set(toks):
            pos = [i + 1 for i, t in enumerate(toks) if t == term]
            want[(r["docid"], term)] = (len(pos), pos, len(toks))
    assert got == want and got


def test_agrees_with_index(spark, corpus):
    """tf per (doc, term) from term_vectors equals the inverted index's
    decoded postings — same analyzer, same numbers."""
    from large_scale_hypertextual_search_engine_spark.operators.query import (
        decode_postings_df,
    )

    idx = build_index(corpus, mode="simple", stem=False, salt_buckets=2)
    dmap = {r["doc_int"]: r["docid"] for r in idx["docid_map"].collect()}
    inv = {
        (dmap[r["doc_int"]], r["term"]): r["tf"]
        for r in decode_postings_df(idx["postings"]).collect()
    }
    fwd = {
        (r["docid"], r["term"]): r["tf"]
        for r in term_vectors(corpus).collect()
    }
    assert fwd == inv


def test_zero_token_docs_dropped(spark):
    docs = spark.createDataFrame(
        [("1", "a b"), ("2", ""), ("3", "   ")],
        "docid string, content string",
    )
    rows = term_vectors(docs).collect()
    assert {r["docid"] for r in rows} == {"1"}
