"""Boolean query language: parser unit tests, brute-force match parity,
score consistency with the flat AND/OR engine, and plan shape."""

import re

import pytest

from large_scale_hypertextual_search_engine_spark.operators.boolsearch import (
    And,
    Near,
    Not,
    Or,
    Phrase,
    Term,
    boolean_search,
    parse_query,
)
from large_scale_hypertextual_search_engine_spark.operators.index_build import (
    build_index,
)
from large_scale_hypertextual_search_engine_spark.operators.query import search


@pytest.fixture(scope="module")
def simple_index(spark):
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .selectExpr("cast(doc_id as string) as docid", "text as content")
    )
    idx = build_index(docs, mode="simple", stem=False, salt_buckets=2)
    for k in ("doc_stats", "postings", "lexicon", "docid_map", "collection_stats"):
        idx[k] = idx[k].cache()
    return idx, docs


# ------------------------------------------------------------- parser


def test_parse_precedence_or_lowest():
    assert parse_query("a OR b AND c") == Or(
        (Term("a"), And((Term("b"), Term("c"))))
    )


def test_parse_implicit_and():
    assert parse_query("a b c") == And((Term("a"), Term("b"), Term("c")))


def test_parse_not_binds_tightest():
    assert parse_query("NOT a AND b") == And((Not(Term("a")), Term("b")))
    assert parse_query("NOT NOT a OR b") == Or((Not(Not(Term("a"))), Term("b")))


def test_parse_parens_and_phrase():
    assert parse_query('(a OR b) "x y" c') == And(
        (Or((Term("a"), Term("b"))), Phrase(("x", "y")), Term("c"))
    )


def test_parse_keywords_case_insensitive_and_lowercasing():
    assert parse_query("A and B or not C") == Or(
        (And((Term("a"), Term("b"))), Not(Term("c")))
    )


def test_parse_single_word_phrase_is_term():
    assert parse_query('"solo"') == Term("solo")


def test_parse_errors():
    for bad in ["", "(a OR b", 'a "unterminated', "a )", "a OR", "AND a"]:
        with pytest.raises(ValueError):
            parse_query(bad)


def test_parse_near_pre():
    assert parse_query("a NEAR/3 b") == Near("a", "b", 3, ordered=False)
    assert parse_query("a pre/2 b") == Near("a", "b", 2, ordered=True)
    # binds tighter than AND/NOT, looser than atoms
    assert parse_query("x AND a NEAR/3 b") == And(
        (Term("x"), Near("a", "b", 3))
    )
    assert parse_query("NOT a NEAR/3 b OR c") == Or(
        (Not(Near("a", "b", 3)), Term("c"))
    )


def test_parse_near_errors():
    for bad in [
        '"x y" NEAR/2 b',      # phrase operand
        "a NEAR/2 (b OR c)",   # grouped operand
        "a NEAR/2",            # missing right operand
        "NEAR/2 b",            # missing left operand
        "a NEAR/2 b NEAR/2 c", # chaining unsupported
    ]:
        with pytest.raises(ValueError):
            parse_query(bad)


# -------------------------------------------------- evaluator semantics


def _brute_match(docs, pred):
    """docids whose token SET satisfies pred(tokens)."""
    out = set()
    for r in docs.collect():
        toks = set(t for t in r["content"].split(" ") if t)
        if pred(toks):
            out.add(r["docid"])
    return out


def test_rejects_negative_only_queries(spark, simple_index):
    idx, _ = simple_index
    for q in ["NOT spark", "spark OR NOT join", "NOT spark AND NOT join"]:
        with pytest.raises(ValueError, match="positive clause"):
            boolean_search(idx, q)


def test_and_or_parity_with_flat_search(spark, simple_index):
    idx, _ = simple_index
    for q, terms, mode in [
        ("spark AND join", ["spark", "join"], "and"),
        ("merge OR window", ["merge", "window"], "or"),
    ]:
        got = [
            (r["docid"], r["rank"], r["score"])
            for r in boolean_search(idx, q, top_k=10).collect()
        ]
        want = [
            (r["docid"], r["rank"], r["score"])
            for r in search(idx, terms, top_k=10, mode=mode).collect()
        ]
        assert got == want, q
        assert len(got) == 10


def test_not_and_nesting_match_bruteforce(spark, simple_index):
    idx, docs = simple_index
    cases = [
        (
            "(spark OR merge) AND NOT join",
            lambda t: ("spark" in t or "merge" in t) and "join" not in t,
        ),
        (
            "spark AND NOT (join OR merge)",
            lambda t: "spark" in t and not ("join" in t or "merge" in t),
        ),
        (
            "spark AND NOT NOT join",
            lambda t: "spark" in t and "join" in t,
        ),
    ]
    for q, pred in cases:
        want = _brute_match(docs, pred)
        got = {
            r["docid"]
            for r in boolean_search(idx, q, top_k=10**6).collect()
        }
        assert got == want, q
        assert got, q


def test_not_docs_score_as_positive_subquery(spark, simple_index):
    """Matching docs of `(spark OR merge) AND NOT join` carry exactly
    the scores the flat OR engine gives them over {spark, merge} —
    the negated term gates membership, never the score."""
    idx, docs = simple_index
    want_docs = _brute_match(
        docs, lambda t: ("spark" in t or "merge" in t) and "join" not in t
    )
    flat = {
        r["docid"]: r["score"]
        for r in search(
            idx, ["spark", "merge"], top_k=10**6, mode="or"
        ).collect()
    }
    got = boolean_search(
        idx, "(spark OR merge) AND NOT join", top_k=10**6
    ).collect()
    assert {r["docid"] for r in got} == want_docs
    for r in got:
        assert r["score"] == flat[r["docid"]], r["docid"]


def test_phrase_atom_matches_phrase_operator(spark, simple_index):
    from large_scale_hypertextual_search_engine_spark.operators.phrase import (
        phrase_match_docs,
    )

    idx, docs = simple_index
    ph_docs = {
        r["docid"]
        for r in phrase_match_docs(idx, ["fast", "key"])
        .join(idx["docid_map"], "doc_int")
        .select("docid")
        .collect()
    }
    spark_docs = _brute_match(docs, lambda t: "spark" in t)
    want = ph_docs - spark_docs
    got = {
        r["docid"]
        for r in boolean_search(
            idx, '"fast key" AND NOT spark', top_k=10**6
        ).collect()
    }
    assert got == want
    assert got


def _brute_prox(docs, a, b, slop, ordered):
    """docids with an occurrence pair of (a, b) within the window."""
    out = set()
    for r in docs.collect():
        toks = [t for t in r["content"].split(" ") if t]
        pa = [i for i, t in enumerate(toks) if t == a]
        pb = [i for i, t in enumerate(toks) if t == b]
        if ordered:
            ok = any(1 <= q - p <= slop for p in pa for q in pb)
        else:
            ok = any(abs(q - p) <= slop for p in pa for q in pb)
        if ok:
            out.add(r["docid"])
    return out


def test_near_matches_bruteforce(spark, simple_index):
    idx, docs = simple_index
    want = _brute_prox(docs, "spark", "join", 5, ordered=False)
    got = {
        r["docid"]
        for r in boolean_search(idx, "spark NEAR/5 join", top_k=10**6).collect()
    }
    assert got == want
    assert got


def test_pre_ordered_matches_bruteforce_and_is_asymmetric(spark, simple_index):
    idx, docs = simple_index
    got_ab = {
        r["docid"]
        for r in boolean_search(idx, "spark PRE/5 join", top_k=10**6).collect()
    }
    got_ba = {
        r["docid"]
        for r in boolean_search(idx, "join PRE/5 spark", top_k=10**6).collect()
    }
    assert got_ab == _brute_prox(docs, "spark", "join", 5, ordered=True)
    assert got_ba == _brute_prox(docs, "join", "spark", 5, ordered=True)
    assert got_ab and got_ba and got_ab != got_ba  # order matters


def test_near_leaf_matches_proximity_operator(spark, simple_index):
    """The NEAR boolean leaf and the standalone proximity_search
    operator (which has its own DuckDB oracle) agree on membership AND
    top-k scores: both terms are positive, so a NEAR-only query scores
    exactly like proximity_search."""
    from large_scale_hypertextual_search_engine_spark.operators.phrase import (
        proximity_search,
    )

    idx, _ = simple_index
    for ordered in (False, True):
        q = Near("spark", "join", 4, ordered=ordered)
        want = sorted(
            (r["rank"], r["doc_int"], r["docid"], r["score"])
            for r in proximity_search(
                idx, "spark", "join", slop=4, ordered=ordered, top_k=10
            ).collect()
        )
        got = sorted(
            (r["rank"], r["doc_int"], r["docid"], r["score"])
            for r in boolean_search(idx, q, top_k=10).collect()
        )
        assert got == want, ordered
        assert len(got) == 10


def test_near_composes_with_boolean_ops(spark, simple_index):
    idx, docs = simple_index
    prox = _brute_prox(docs, "spark", "join", 4, ordered=False)
    merge = _brute_match(docs, lambda t: "merge" in t)
    want = prox - merge
    got = {
        r["docid"]
        for r in boolean_search(
            idx, "spark NEAR/4 join AND NOT merge", top_k=10**6
        ).collect()
    }
    assert got == want
    assert got


def test_term_absent_from_lexicon_fails_and(spark, simple_index):
    idx, _ = simple_index
    assert boolean_search(idx, "spark AND zzzmissingterm").count() == 0
    # ... but an OR branch still matches
    assert boolean_search(idx, "spark OR zzzmissingterm").count() > 0


# ----------------------------------------------------------- plan shape


def test_boolean_plan_shape(spark, tmp_path_factory):
    from large_scale_hypertextual_search_engine_spark.plans.lineage import (
        build_and_save_index, load_index,
    )

    out = str(tmp_path_factory.mktemp("boolidx"))
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .selectExpr("cast(doc_id as string) as docid", "text as content")
        .limit(120)
    )
    build_and_save_index(docs, out, "bool-plan-test", mode="simple", stem=False)
    idx = load_index(spark, out)
    # quoting escapes keywords: "and" is the term, not the operator
    for q in ['(the OR "and") AND NOT of', '"the and" AND NOT of']:
        plan = (
            boolean_search(idx, q, top_k=5)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # decode kernel runs exactly once; candidates shuffle exactly
        # once (the doc_int repartition reused by both agg levels)
        assert len(re.findall(r"MapInPandas|MapInArrow", plan)) == 1, (q, plan)
        assert len(re.findall(r"REPARTITION_BY_NUM", plan)) == 1, (q, plan)
        assert "SortMergeJoin" not in plan, (q, plan)
        scan_lines = [l for l in plan.splitlines() if "FileScan parquet" in l]
        assert any("term" in l and " IN " in l for l in scan_lines), scan_lines


# ------------------------------------------------------- warm serving


BOOL_QUERIES = [
    "spark AND join",
    "merge OR window",
    "(spark OR merge) AND NOT join",
    "spark AND NOT (join OR merge)",
    '"fast key" AND NOT spark',
    '(spark AND NOT merge) OR (merge AND NOT spark)',
    "spark OR zzzmissingterm",
    "spark AND zzzmissingterm",
    "spark NEAR/5 join",
    "spark PRE/5 join AND NOT merge",
    "spark NEAR/3 zzzmissingterm OR merge",
]


def test_served_boolean_matches_spark(spark, simple_index):
    from large_scale_hypertextual_search_engine_spark.operators.serving import (
        SearchServer,
    )

    idx, _ = simple_index
    srv = SearchServer(idx)
    for q in BOOL_QUERIES:
        expect = sorted(
            (r["rank"], r["doc_int"], r["docid"], r["score"])
            for r in boolean_search(idx, q, top_k=10).collect()
        )
        got = [
            (r["rank"], r["doc_int"], r["docid"], r["score"])
            for r in srv.search_boolean(q, top_k=10)
        ]
        assert [g[:3] for g in got] == [e[:3] for e in expect], q
        for g, e in zip(got, expect):
            assert g[3] == pytest.approx(e[3], abs=1e-12, rel=1e-12), (q, g, e)


def test_served_boolean_rejects_negative_only(spark, simple_index):
    from large_scale_hypertextual_search_engine_spark.operators.serving import (
        SearchServer,
    )

    idx, _ = simple_index
    srv = SearchServer(idx)
    with pytest.raises(ValueError, match="positive clause"):
        srv.search_boolean("spark OR NOT join")


def test_served_boolean_small_cache(spark, simple_index):
    """A tiny LRU must not break a query with more terms than slots
    (the round-3 _fetch eviction race, boolean path)."""
    from large_scale_hypertextual_search_engine_spark.operators.serving import (
        SearchServer,
    )

    idx, _ = simple_index
    srv = SearchServer(idx, max_cached_terms=2)
    expect = {r["docid"] for r in boolean_search(
        idx, "(spark OR merge) AND (join OR window)", top_k=10).collect()}
    got = {r["docid"] for r in srv.search_boolean(
        "(spark OR merge) AND (join OR window)", top_k=10)}
    assert got == expect and got


# --------------------------------------------------------------- batch


def test_batch_matches_single(spark, simple_index):
    from large_scale_hypertextual_search_engine_spark.operators.boolsearch import (
        boolean_search_batch,
    )

    idx, _ = simple_index
    qs = {
        1: "spark AND join",
        2: "(spark OR merge) AND NOT join",
        3: '"fast key" AND NOT spark',
        4: "merge OR window",
        5: "spark AND zzzmissingterm",
        6: "spark NEAR/5 join",
        7: "spark PRE/4 join OR merge",
    }
    got = {}
    for r in boolean_search_batch(idx, qs, top_k=10).collect():
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_int"], r["docid"], r["score"])
        )
    for qid, q in qs.items():
        want = sorted(
            (r["rank"], r["doc_int"], r["docid"], r["score"])
            for r in boolean_search(idx, q, top_k=10).collect()
        )
        assert sorted(got.get(qid, [])) == want, (qid, q)
    assert 5 not in got  # missing term fails the AND -> no rows


def test_batch_rejects_negative_only(spark, simple_index):
    from large_scale_hypertextual_search_engine_spark.operators.boolsearch import (
        boolean_search_batch,
    )

    idx, _ = simple_index
    with pytest.raises(ValueError, match="query 2"):
        boolean_search_batch(idx, {1: "spark", 2: "NOT spark"})


def test_batch_plan_single_exchange(spark, tmp_path_factory):
    import re
    from large_scale_hypertextual_search_engine_spark.operators.boolsearch import (
        boolean_search_batch,
    )
    from large_scale_hypertextual_search_engine_spark.plans.lineage import (
        build_and_save_index, load_index,
    )

    out = str(tmp_path_factory.mktemp("boolbatchidx"))
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .selectExpr("cast(doc_id as string) as docid", "text as content")
        .limit(120)
    )
    build_and_save_index(docs, out, "bool-batch-plan", mode="simple", stem=False)
    idx = load_index(spark, out)
    qs = {1: "the AND NOT of", 2: '"the and" OR of'}
    plan = (
        boolean_search_batch(idx, qs, top_k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert len(re.findall(r"MapInPandas|MapInArrow", plan)) == 1, plan
    assert len(re.findall(r"REPARTITION_BY_NUM", plan)) == 1, plan
    assert "SortMergeJoin" not in plan, plan
