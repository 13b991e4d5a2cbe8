"""Wildcard query leaves (``te*`` / ``t?st``): parser, lexicon
expansion semantics (cap, ordering, zero-match sentinel), parity with
the explicit-OR rewrite, batch==single, and the fielded path.

Reference parity note: the reference has no wildcard syntax; this is a
§2.13 extension following Lucene's MultiTermQuery contract — patterns
match post-analysis index terms, rewritten to a scoring OR capped at
max_expansions, empty expansion matches nothing.
"""

import fnmatch

import pytest

from large_scale_hypertextual_search_engine_spark.operators.boolsearch import (
    And,
    Not,
    Or,
    Term,
    Wildcard,
    _NOMATCH_TERM,
    _glob_to_like,
    boolean_search,
    boolean_search_batch,
    expand_wildcards,
    parse_query,
)
from large_scale_hypertextual_search_engine_spark.operators.index_build import (
    build_index,
)


@pytest.fixture(scope="module")
def wc_index(spark):
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
    """Oracle expansion: fnmatch + (df desc, term asc) cap."""
    hits = [(t, df) for t, df in lex if fnmatch.fnmatchcase(t, pattern)]
    hits.sort(key=lambda x: (-x[1], x[0]))
    return [t for t, _ in hits[:max_expansions]]


def _ranked(df):
    return sorted(
        (r["docid"], round(r["score"], 9)) for r in df.collect()
    )


# ------------------------------------------------------------- parser


def test_parse_wildcard_leaves():
    assert parse_query("te*") == Wildcard("te*")
    assert parse_query("t?st") == Wildcard("t?st")
    assert parse_query("a AND te*") == And((Term("a"), Wildcard("te*")))
    assert parse_query("TE*") == Wildcard("te*")


def test_parse_fielded_wildcard():
    assert parse_query("title:te*") == Wildcard("te*", field="title")


def test_parse_wildcard_no_literals_rejected():
    for bad in ["*", "?", "**", "*?"]:
        with pytest.raises(ValueError):
            parse_query(bad)


def test_glob_to_like_escapes_metachars():
    assert _glob_to_like("te*") == "te%"
    assert _glob_to_like("t?st") == "t_st"
    assert _glob_to_like("a%b_c") == "a\\%b\\_c"
    assert _glob_to_like("a\\b") == "a\\\\b"


# --------------------------------------------------------- expansion


def test_expand_multi_match_is_or(spark, wc_index):
    idx, lex = wc_index
    # find a prefix with >=2 matching terms
    pref = next(
        t[:2] for t, _ in lex
        if len(_expected_terms(lex, t[:2] + "*", 1000)) >= 2
    )
    node = expand_wildcards(parse_query(pref + "*"), idx["lexicon"], 1000)
    want = _expected_terms(lex, pref + "*", 1000)
    assert node == Or(tuple(Term(t) for t in want))


def test_expand_single_match_is_term(spark, wc_index):
    idx, lex = wc_index
    # a full term with one '?' for its last char may match several;
    # use the whole term + '*' only if unique, else synthesize via the
    # longest term (prefix of itself, unique by construction if no
    # other term extends it)
    term = max((t for t, _ in lex), key=len)
    uniq = [t for t, _ in lex if t.startswith(term)]
    assert uniq == [term]
    node = expand_wildcards(parse_query(term + "*"), idx["lexicon"], 64)
    assert node == Term(term)


def test_expand_zero_match_is_sentinel(spark, wc_index):
    idx, _ = wc_index
    node = expand_wildcards(parse_query("zzzqqqx*"), idx["lexicon"], 64)
    assert node == Term(_NOMATCH_TERM)


def test_expand_cap_by_df_then_term(spark, wc_index):
    idx, lex = wc_index
    pref = next(
        t[:1] for t, _ in lex
        if len(_expected_terms(lex, t[:1] + "*", 1000)) >= 3
    )
    node = expand_wildcards(parse_query(pref + "*"), idx["lexicon"], 2)
    want = _expected_terms(lex, pref + "*", 2)
    assert node == Or(tuple(Term(t) for t in want))


def test_expand_no_wildcards_is_identity():
    node = parse_query("a AND NOT b")
    assert expand_wildcards(node, None) is node


# ------------------------------------------------------------ parity


def test_wildcard_matches_explicit_or(spark, wc_index):
    idx, lex = wc_index
    pref = next(
        t[:2] for t, _ in lex
        if len(_expected_terms(lex, t[:2] + "*", 1000)) >= 2
    )
    want = _expected_terms(lex, pref + "*", 1000)
    got = boolean_search(
        idx, pref + "*", top_k=10**6, max_expansions=1000
    )
    ref = boolean_search(idx, Or(tuple(Term(t) for t in want)), top_k=10**6)
    assert _ranked(got) == _ranked(ref)


def test_wildcard_composes_with_and_not(spark, wc_index):
    idx, lex = wc_index
    pref = next(
        t[:2] for t, _ in lex
        if len(_expected_terms(lex, t[:2] + "*", 1000)) >= 2
    )
    anchor = max(lex, key=lambda x: x[1])[0]  # most common term
    want = _expected_terms(lex, pref + "*", 1000)
    got = boolean_search(
        idx, f"{anchor} AND {pref}*", top_k=10**6, max_expansions=1000
    )
    ref = boolean_search(
        idx, And((Term(anchor), Or(tuple(Term(t) for t in want)))),
        top_k=10**6,
    )
    assert _ranked(got) == _ranked(ref)


def test_zero_match_or_falls_through_and_not_excludes_nothing(
    spark, wc_index
):
    idx, lex = wc_index
    anchor = max(lex, key=lambda x: x[1])[0]
    base = boolean_search(idx, anchor, top_k=10**6)
    fall = boolean_search(idx, f"{anchor} OR zzzqqqx*", top_k=10**6)
    keep = boolean_search(idx, f"{anchor} AND NOT zzzqqqx*", top_k=10**6)
    assert _ranked(fall) == _ranked(base)
    assert _ranked(keep) == _ranked(base)


def test_zero_match_and_is_empty(spark, wc_index):
    idx, _ = wc_index
    out = boolean_search(idx, "zzzqqqx*", top_k=10**6)
    assert out.count() == 0


def test_batch_wildcards_match_single(spark, wc_index):
    idx, lex = wc_index
    pref = next(
        t[:2] for t, _ in lex
        if len(_expected_terms(lex, t[:2] + "*", 1000)) >= 2
    )
    anchor = max(lex, key=lambda x: x[1])[0]
    queries = {
        0: pref + "*",
        1: f"{anchor} AND NOT {pref}*",
        2: f"{anchor} OR zzzqqqx*",
    }
    batch = boolean_search_batch(idx, queries, top_k=5, max_expansions=1000)
    rows = batch.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(
            (r["rank"], r["docid"], round(r["score"], 9))
        )
    for qid, q in queries.items():
        single = boolean_search(idx, q, top_k=5, max_expansions=1000)
        want = [
            (r["rank"], r["docid"], round(r["score"], 9))
            for r in single.collect()
        ]
        assert sorted(by_q.get(qid, [])) == sorted(want), f"query {qid}"


def test_served_wildcard_matches_spark(spark, wc_index):
    from large_scale_hypertextual_search_engine_spark.operators.serving import (
        SearchServer,
    )

    idx, lex = wc_index
    pref = next(
        t[:2] for t, _ in lex
        if len(_expected_terms(lex, t[:2] + "*", 1000)) >= 2
    )
    anchor = max(lex, key=lambda x: x[1])[0]
    srv = SearchServer(idx)
    for q in (pref + "*", f"{anchor} AND NOT {pref}*",
              f"{anchor} OR zzzqqqx*"):
        got = sorted(
            (h["docid"], round(h["score"], 9))
            for h in srv.search_boolean(q, top_k=10**6)
        )
        want = _ranked(boolean_search(idx, q, top_k=10**6))
        assert got == want, q


def test_local_expansion_matches_spark_expansion(spark, wc_index):
    """The driver-local regex twin and the Spark LIKE join must expand
    identically — including the cap ordering and characters fnmatch
    would mistreat (``[`` is literal here, a class there)."""
    from large_scale_hypertextual_search_engine_spark.operators.boolsearch import (
        expand_wildcards_local,
    )

    idx, lex = wc_index
    terms = [t for t, _ in lex]
    dfs = [df for _, df in lex]
    for pat, cap in [(terms[0][:2] + "*", 1000), (terms[0][:1] + "*", 2),
                     ("?" + terms[0][1:] + "*", 64), ("zzzqqqx*", 64)]:
        node = parse_query(pat)
        spark_side = expand_wildcards(node, idx["lexicon"], cap)
        local_side = expand_wildcards_local(node, terms, dfs, cap)
        assert spark_side == local_side, pat


def test_glob_regex_treats_bracket_literally():
    from large_scale_hypertextual_search_engine_spark.operators.boolsearch import (
        _glob_to_regex,
    )

    rx = _glob_to_regex("a[b]*")
    assert rx.match("a[b]c")
    assert not rx.match("ab")
    assert not rx.match("abc")


def test_unexpanded_wildcard_leaf_rejected_downstream(spark, wc_index):
    from large_scale_hypertextual_search_engine_spark.operators.boolsearch import (
        _positive_terms,
    )

    with pytest.raises(ValueError, match="unexpanded wildcard"):
        _positive_terms(Wildcard("te*"))
