"""Regexp query leaves (``/pattern/``): parser, anchored-full-match
expansion (JVM RLIKE vs the local ``re`` twin), parity with the
explicit-OR rewrite, zero-match sentinel, mixed glob+regex queries.

Reference parity note: the reference has no query parser at all; this
extends the §2.13 boolean language following Lucene's RegexpQuery
contract — the pattern matches whole post-analysis index terms, is
rewritten to a scoring OR capped at max_expansions, and an empty
expansion matches nothing.
"""

import re

import pytest

from large_scale_hypertextual_search_engine_spark.operators.boolsearch import (
    And,
    Or,
    Term,
    Wildcard,
    boolean_search,
    boolean_search_batch,
    expand_wildcards,
    expand_wildcards_local,
    parse_query,
)
from large_scale_hypertextual_search_engine_spark.operators.index_build import (
    build_index,
)


@pytest.fixture(scope="module")
def rx_index(spark):
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .selectExpr("cast(doc_id as string) as docid", "text as content")
    )
    idx = build_index(docs, mode="simple", stem=False, salt_buckets=2)
    for k in ("doc_stats", "postings", "lexicon", "docid_map",
              "collection_stats"):
        idx[k] = idx[k].cache()
    lex = [(r["term"], r["df"]) for r in idx["lexicon"].collect()]
    return idx, lex


def _expected_terms(lex, pattern, max_expansions=64):
    """Oracle expansion: anchored re.fullmatch + (df desc, term asc)."""
    rx = re.compile(pattern)
    hits = [(t, df) for t, df in lex if rx.fullmatch(t)]
    hits.sort(key=lambda x: (-x[1], x[0]))
    return [t for t, _ in hits[:max_expansions]]


def _ranked(df):
    return sorted(
        (r["docid"], round(r["score"], 9)) for r in df.collect()
    )


# ------------------------------------------------------------- parser

def test_parse_regex_leaf():
    assert parse_query("/sp.+k/") == Wildcard("sp.+k", kind="regex")
    assert parse_query("/a/") == Wildcard("a", kind="regex")


def test_parse_fielded_regex():
    assert parse_query("title:/te.t/") == Wildcard(
        "te.t", field="title", kind="regex"
    )


def test_parse_regex_not_lowercased_and_verbatim():
    assert parse_query("/Sp[Aa]rk/") == Wildcard("Sp[Aa]rk", kind="regex")


def test_parse_regex_composes():
    assert parse_query("a AND /b.c/") == And(
        (Term("a"), Wildcard("b.c", kind="regex"))
    )


def test_parse_invalid_regex_raises():
    with pytest.raises(ValueError, match="invalid regex"):
        parse_query("/a[/")


def test_parse_slash_words_stay_terms():
    # no delimiters on both ends -> ordinary terms, not regex leaves
    assert parse_query("a/b") == Term("a/b")
    assert parse_query("foo/") == Term("foo/")
    # "//" is shorter than the minimum /x/ literal
    assert parse_query("//") == Term("//")


# --------------------------------------------------------- expansion

def test_expansion_matches_re_oracle(rx_index):
    idx, lex = rx_index
    for pat in ("s.*", "[a-f].*e", ".*(ing|ed)", "a.?"):
        node = expand_wildcards(
            parse_query(f"/{pat}/"), idx["lexicon"], 1000
        )
        expected = _expected_terms(lex, pat, 1000)
        if not expected:
            continue
        got = (
            [node.term]
            if isinstance(node, Term)
            else [t.term for t in node.children]
        )
        assert got == expected, pat


def test_expansion_zero_match_sentinel(rx_index):
    idx, lex = rx_index
    assert not _expected_terms(lex, "zzz9+")
    res = boolean_search(idx, "s* AND NOT /zzz9+/", top_k=10)
    base = boolean_search(idx, "s*", top_k=10)
    assert _ranked(res) == _ranked(base)


def test_expansion_local_twin_parity(rx_index):
    idx, lex = rx_index
    terms = [t for t, _ in lex]
    dfs = [d for _, d in lex]
    for pat, cap in (("s.*", 3), ("[a-f].*e", 1000), (".*x.*", 2)):
        node = parse_query(f"/{pat}/")
        spark_side = expand_wildcards(node, idx["lexicon"], cap)
        local_side = expand_wildcards_local(node, terms, dfs, cap)
        assert spark_side == local_side, pat


def test_regex_query_equals_explicit_or(rx_index):
    idx, lex = rx_index
    expected = _expected_terms(lex, "s.*", 1000)
    assert len(expected) >= 2
    explicit = " OR ".join(expected)
    assert _ranked(boolean_search(idx, "/s.*/", top_k=10)) == _ranked(
        boolean_search(idx, explicit, top_k=10)
    )


def test_mixed_glob_and_regex_one_query(rx_index):
    idx, lex = rx_index
    res = boolean_search(idx, "s* OR /.*e/", top_k=10)
    import fnmatch

    globbed = [t for t, _ in lex if fnmatch.fnmatchcase(t, "s*")]
    rexed = _expected_terms(lex, ".*e", 1000)
    union = list(dict.fromkeys(globbed + rexed))
    assert union
    explicit = " OR ".join(union)
    assert _ranked(res) == _ranked(boolean_search(idx, explicit, top_k=10))


def test_batch_equals_single_with_regex(rx_index):
    idx, _ = rx_index
    queries = {0: "/s.*/", 1: "t* AND /.*e/"}
    batch = boolean_search_batch(idx, queries, top_k=10)
    rows = batch.collect()
    for qid, q in queries.items():
        single = _ranked(boolean_search(idx, q, top_k=10))
        got = sorted(
            (r["docid"], round(r["score"], 9))
            for r in rows
            if r["query_id"] == qid
        )
        assert got == single, q
