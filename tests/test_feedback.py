"""RM3 pseudo-relevance feedback: expansion parity with a brute-force
mirror, expander-hook integration, and final-search semantics."""

import math

import pytest

from large_scale_hypertextual_search_engine_spark.operators.feedback import (
    RM3Expander,
    search_rm3,
)
from large_scale_hypertextual_search_engine_spark.operators.index_build import (
    build_index,
)
from large_scale_hypertextual_search_engine_spark.operators.query import (
    search,
    search_text,
)


@pytest.fixture(scope="module")
def corpus(spark):
    return (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .selectExpr("cast(doc_id as string) as docid", "text as content")
        .limit(200)
        .cache()
    )


@pytest.fixture(scope="module")
def fb_index(spark, corpus):
    return build_index(corpus, mode="simple", stem=False, salt_buckets=2)


def _brute_expansion(rows, fb_docids, qterms, n_docs, k):
    tf_fb, df = {}, {}
    for r in rows:
        toks = [t for t in r["content"].split(" ") if t]
        for t in set(toks):
            df[t] = df.get(t, 0) + 1
        if r["docid"] in fb_docids:
            for t in toks:
                tf_fb[t] = tf_fb.get(t, 0) + 1
    cand = [
        (-c * math.log((n_docs + 1.0) / (df[t] + 1.0)), t)
        for t, c in tf_fb.items()
        if t not in qterms
    ]
    return [t for _, t in sorted(cand)[:k]]


def test_rm3_expansion_matches_bruteforce(spark, corpus, fb_index):
    rows = corpus.collect()
    fb = {
        r["docid"]
        for r in search(fb_index, ["join", "spark"], top_k=10,
                        mode="and").collect()
    }
    want = ["join", "spark"] + _brute_expansion(
        rows, fb, {"join", "spark"}, len(rows), 2
    )
    exp = RM3Expander(fb_index, corpus, fb_k=10, fb_mode="and")
    got = exp.expand_query(["join", "spark"], max_expansions=2)
    assert got == want
    assert len(got) == 4


def test_rm3_final_search_uses_expansion(spark, corpus, fb_index):
    res, expanded = search_rm3(
        fb_index, corpus, ["join", "spark"], top_k=10, fb_k=10,
        max_expansions=2,
    )
    assert len(expanded) == 4
    want = sorted(
        (r["rank"], r["docid"], r["score"])
        for r in search(fb_index, expanded, top_k=10, mode="or").collect()
    )
    got = sorted((r["rank"], r["docid"], r["score"]) for r in res.collect())
    assert got == want and len(got) == 10


def test_rm3_plugs_into_search_text_hook(spark, corpus, fb_index):
    """The reference's search_semantic contract: search_text(expander=)
    must route tokens through expand_query(tokens, 2)."""
    exp = RM3Expander(fb_index, corpus, fb_k=5, fb_mode="and")
    via_hook = sorted(
        (r["rank"], r["docid"], r["score"])
        for r in search_text(
            fb_index, "join spark", analyzer_mode="simple", stem=False,
            expander=exp, mode="or", top_k=10,
        ).collect()
    )
    expanded = exp.expand_query(["join", "spark"], 2)
    direct = sorted(
        (r["rank"], r["docid"], r["score"])
        for r in search(fb_index, expanded, top_k=10, mode="or").collect()
    )
    assert via_hook == direct and via_hook


def test_rm3_no_new_terms_is_identity(spark, fb_index, corpus):
    exp = RM3Expander(fb_index, corpus, fb_k=10, fb_mode="and")
    got = exp.expand_query(["join", "spark"], max_expansions=0)
    assert got == ["join", "spark"]
