"""Significant terms: brute-force G² parity, query-term exclusion,
df-bound pruning, one-sided filter, empty-match degenerate."""

import math

import pytest

from large_scale_hypertextual_search_engine_spark.operators.index_build import (
    build_index,
)
from large_scale_hypertextual_search_engine_spark.operators.sigterms import (
    significant_terms,
)


@pytest.fixture(scope="module")
def corpus(spark):
    return (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .selectExpr("cast(doc_id as string) as docid", "text as content")
        .cache()
    )


@pytest.fixture(scope="module")
def st_index(spark, corpus):
    return build_index(
        corpus.select("docid", "content"), mode="simple", stem=False,
        salt_buckets=2,
    )


def _g2(k11, k12, k21, k22):
    def xl(k, e):
        return k * math.log(k / e) if k > 0 else 0.0

    n = k11 + k12 + k21 + k22
    r1, r2, c1, c2 = k11 + k12, k21 + k22, k11 + k21, k12 + k22
    return 2.0 * (
        xl(k11, r1 * c1 / n)
        + xl(k12, r1 * c2 / n)
        + xl(k21, r2 * c1 / n)
        + xl(k22, r2 * c2 / n)
    )


def _brute(corpus, terms, top_n, min_df, max_df_frac):
    rows = [
        (r["docid"], set(t for t in r["content"].split(" ") if t))
        for r in corpus.collect()
    ]
    n = len(rows)
    fg = [d for d, toks in rows if all(t in toks for t in terms)]
    fg_set = set(fg)
    vocab = set().union(*(toks for _, toks in rows))
    out = []
    for term in vocab - set(terms):
        bg = sum(1 for _, toks in rows if term in toks)
        if not (min_df <= bg <= int(max_df_frac * n)):
            continue
        k11 = sum(1 for d, toks in rows if d in fg_set and term in toks)
        if k11 == 0 or k11 / len(fg) <= bg / n:
            continue
        out.append(
            (term, k11, bg, _g2(k11, bg - k11, len(fg) - k11, n - bg - len(fg) + k11))
        )
    out.sort(key=lambda x: (-x[3], x[0]))
    return out[:top_n]


def test_sigterms_match_bruteforce(spark, corpus, st_index):
    got = [
        (r["term"], r["fg_count"], r["bg_count"], r["score"])
        for r in significant_terms(
            st_index, ["spark", "join"], top_n=8, min_df=2,
            max_df_frac=0.5,
        ).collect()
    ]
    want = _brute(corpus, ["spark", "join"], 8, 2, 0.5)
    assert [(t, f, b) for t, f, b, _ in want] == [
        (t, f, b) for t, f, b, _ in got
    ]
    for (_, _, _, ws), (_, _, _, gs) in zip(want, got):
        assert gs == pytest.approx(ws, rel=1e-9)
    assert got, "vacuous"


def test_query_terms_excluded(spark, st_index):
    rows = significant_terms(
        st_index, ["spark"], top_n=100, min_df=1, max_df_frac=1.0
    ).collect()
    assert all(r["term"] != "spark" for r in rows)


def test_df_bounds_prune(spark, corpus, st_index):
    n = corpus.count()
    rows = significant_terms(
        st_index, ["spark"], top_n=100, min_df=5, max_df_frac=0.3
    ).collect()
    assert all(5 <= r["bg_count"] <= int(0.3 * n) for r in rows)


def test_one_sided(spark, corpus, st_index):
    """Every returned term is MORE frequent in the foreground than its
    corpus rate."""
    n = corpus.count()
    fg_n = len(
        [
            1
            for r in corpus.collect()
            if all(
                t in r["content"].split(" ") for t in ("spark", "join")
            )
        ]
    )
    rows = significant_terms(
        st_index, ["spark", "join"], top_n=100, min_df=1, max_df_frac=1.0
    ).collect()
    assert all(r["fg_count"] / fg_n > r["bg_count"] / n for r in rows)
    assert all(r["score"] > 0 for r in rows)


def test_empty_match_set(spark, st_index):
    assert (
        significant_terms(
            st_index, ["zzz_not_a_term"], top_n=5, mode="and"
        ).count()
        == 0
    )


def test_explicit_exclude_with_match_frame(spark, corpus, st_index):
    """A boolean match frame plus exclude= removes the query's own
    positive terms from the output."""
    from large_scale_hypertextual_search_engine_spark.operators.boolsearch import (
        boolean_match_docs,
    )

    match = boolean_match_docs(st_index, "spark AND join")
    rows = significant_terms(
        st_index, match, top_n=100, min_df=1, max_df_frac=1.0,
        exclude=["spark", "join"],
    ).collect()
    assert rows
    assert all(r["term"] not in ("spark", "join") for r in rows)
    # and the result equals the term-list form (same match set, same
    # exclusion)
    want = sorted(
        tuple(r)
        for r in significant_terms(
            st_index, ["spark", "join"], top_n=100, min_df=1,
            max_df_frac=1.0,
        ).collect()
    )
    assert sorted(tuple(r) for r in rows) == want
