"""Fielded boolean queries: parser field prefixes, brute-force parity
of membership + BM25F scoring, bit-parity with search_bm25f on flat
queries, and plan shape."""

import math

import pytest
from pyspark.sql import functions as F

from large_scale_hypertextual_search_engine_spark.operators.boolsearch import (
    And,
    Near,
    Not,
    Or,
    Phrase,
    Term,
    boolean_search,
    boolean_search_batch,
    fielded_boolean_search,
    parse_query,
)
from large_scale_hypertextual_search_engine_spark.operators.index_build import (
    build_index,
)

K1, B = 1.5, 0.75

# (docid, title, body) — hand-built so every leaf type has hits and
# misses in each field
CORPUS = [
    ("d01", "alpha beta gamma", "delta epsilon zeta alpha"),
    ("d02", "beta gamma delta", "alpha beta gamma delta epsilon"),
    ("d03", "alpha alpha beta", "gamma delta"),
    ("d04", "zeta eta", "alpha gamma beta delta"),
    ("d05", "gamma delta epsilon", "beta alpha zeta"),
    ("d06", "alpha", "beta gamma gamma delta beta"),
    ("d07", "eta theta", "iota kappa"),
    ("d08", "beta alpha", "delta gamma alpha alpha"),
]
WEIGHTS = {"title": 2.0, "body": 1.0}


@pytest.fixture(scope="module")
def fielded(spark):
    docs = spark.createDataFrame(
        CORPUS, "docid string, title string, body string"
    )
    idxs = {
        f: build_index(
            docs.select("docid", F.col(f).alias("content")),
            mode="simple", stem=False, salt_buckets=2,
        )
        for f in ("title", "body")
    }
    return idxs


# ------------------------------------------------------------- parser


def test_parse_field_prefixes():
    assert parse_query('title:foo AND body:"bar baz" NOT qux') == And(
        (
            Term("foo", field="title"),
            Phrase(("bar", "baz"), field="body"),
            Not(Term("qux")),
        )
    )
    # single-word fielded phrase collapses to a fielded term
    assert parse_query('title:"foo"') == Term("foo", field="title")
    # field prefixes fold into NEAR leaves (one field per leaf)
    assert parse_query("title:a NEAR/3 b") == Near(
        "a", "b", 3, False, field="title"
    )
    assert parse_query("a PRE/2 title:b") == Near(
        "b" and "a", "b", 2, True, field="title"
    )


def test_parse_non_field_colons_pass_through():
    # `std::foo` is not a field prefix (rest starts with ':')
    assert parse_query("std::foo") == Term("std::foo")
    # trailing colon / leading colon are not field prefixes
    assert parse_query("foo:") == Term("foo:")
    assert parse_query(":foo") == Term(":foo")
    # digit-leading head is not identifier-shaped
    assert parse_query("1a:foo") == Term("1a:foo")


def test_parse_mixed_field_near_rejected():
    with pytest.raises(ValueError, match="share one field"):
        parse_query("title:a NEAR/3 body:b")


def test_flat_engine_rejects_fielded_atoms(spark, fielded):
    with pytest.raises(ValueError, match="fielded_boolean_search"):
        boolean_search(fielded["title"], "title:alpha AND beta")
    with pytest.raises(ValueError, match="fielded_boolean_search"):
        boolean_search_batch(fielded["title"], {0: "title:alpha"})


def test_fielded_search_validates_inputs(fielded):
    with pytest.raises(ValueError, match="unknown field"):
        fielded_boolean_search(fielded, WEIGHTS, "abstract:alpha AND beta")
    with pytest.raises(ValueError, match="positive clause"):
        fielded_boolean_search(fielded, WEIGHTS, "NOT title:alpha")
    with pytest.raises(ValueError, match="weights"):
        fielded_boolean_search(fielded, {"title": 2.0}, "title:alpha")


# ------------------------------------------- brute-force Python mirror


def _toks(s):
    return [t for t in s.split(" ") if t]


def _leaf_holds(leaf, ftoks):
    """leaf holds within one field's token list."""
    if isinstance(leaf, Term):
        return leaf.term in ftoks
    if isinstance(leaf, Phrase):
        m = len(leaf.terms)
        return any(
            tuple(ftoks[i : i + m]) == leaf.terms
            for i in range(len(ftoks) - m + 1)
        )
    if isinstance(leaf, Near):
        pa = [i for i, t in enumerate(ftoks) if t == leaf.a]
        pb = [i for i, t in enumerate(ftoks) if t == leaf.b]
        for x in pa:
            for y in pb:
                d = y - x
                if leaf.ordered and 1 <= d <= leaf.slop:
                    return True
                if not leaf.ordered and abs(d) <= leaf.slop:
                    return True
        return False
    raise AssertionError(leaf)


def _matches(node, doc):
    docid, title, body = doc
    fields = {"title": _toks(title), "body": _toks(body)}
    if isinstance(node, Not):
        return not _matches(node.child, doc)
    if isinstance(node, And):
        return all(_matches(c, doc) for c in node.children)
    if isinstance(node, Or):
        return any(_matches(c, doc) for c in node.children)
    use = [node.field] if node.field else list(fields)
    return any(_leaf_holds(node, fields[f]) for f in use)


def _positive_terms_py(node, neg=False):
    if isinstance(node, Term):
        return set() if neg else {node.term}
    if isinstance(node, Phrase):
        return set() if neg else set(node.terms)
    if isinstance(node, Near):
        return set() if neg else {node.a, node.b}
    if isinstance(node, Not):
        return _positive_terms_py(node.child, not neg)
    return set().union(*(_positive_terms_py(c, neg) for c in node.children))


def _bm25f_score(positive):
    """{docid: score} over CORPUS for the positive term set."""
    n = len(CORPUS)
    avgdl = {
        f: sum(len(_toks(d[i])) for d in CORPUS) / n
        for i, f in ((1, "title"), (2, "body"))
    }
    tft = {}  # (docid, term) -> sum_f w_f tf / B_f
    for docid, title, body in CORPUS:
        for fi, f in ((1, "title"), (2, "body")):
            ftoks = _toks((title, body)[fi - 1])
            bf = 1.0 - B + B * len(ftoks) / avgdl[f]
            for t in positive:
                tf = ftoks.count(t)
                if tf:
                    tft[(docid, t)] = tft.get((docid, t), 0.0) + (
                        WEIGHTS[f] * tf / bf
                    )
    df = {
        t: len({d for (d, tt) in tft if tt == t}) for t in positive
    }
    scores = {}
    for docid, _, _ in CORPUS:
        s = 0.0
        for t in sorted(positive):
            v = tft.get((docid, t), 0.0)
            if v:
                idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
                s += idf * v / (K1 + v)
        scores[docid] = s
    return scores


FIELDED_QUERIES = [
    "title:alpha AND beta",
    'body:"gamma delta" OR title:alpha',
    "alpha NOT title:beta",
    "title:alpha NEAR/2 gamma",
    "body:alpha PRE/3 NOTHING OR title:beta",  # analyze lowercases
    '(title:beta OR body:"alpha beta") NOT eta',
    "alpha beta",  # no fields at all — any-field semantics
]


@pytest.mark.parametrize("q", FIELDED_QUERIES)
def test_fielded_matches_bruteforce(spark, fielded, q):
    node = parse_query(q)
    want_docs = {d[0] for d in CORPUS if _matches(node, d)}
    scores = _bm25f_score(_positive_terms_py(node))

    got = fielded_boolean_search(fielded, WEIGHTS, q, top_k=None).collect()
    got_docs = {r["docid"] for r in got}
    assert got_docs == want_docs, q
    for r in got:
        assert r["score"] == pytest.approx(scores[r["docid"]], rel=1e-12), (
            q, r["docid"],
        )


def test_fielded_topk_rank_order(spark, fielded):
    q = "title:alpha OR body:gamma"
    node = parse_query(q)
    want_docs = {d[0] for d in CORPUS if _matches(node, d)}
    scores = _bm25f_score(_positive_terms_py(node))
    want = sorted(
        ((scores[d], d) for d in want_docs), key=lambda x: (-x[0], x[1])
    )[:3]
    got = fielded_boolean_search(fielded, WEIGHTS, q, top_k=3).collect()
    assert [r["rank"] for r in got] == [1, 2, 3]
    assert [r["docid"] for r in got] == [d for _, d in want]


def test_flat_query_bit_equal_to_search_bm25f(spark, fielded):
    """An unfielded AND of plain terms is exactly search_bm25f
    mode='and': same membership, bit-identical scores (same JVM log,
    same per-field normalization, same ascending FP folds)."""
    from large_scale_hypertextual_search_engine_spark.operators.bm25f import (
        search_bm25f,
    )

    want = {
        (r["doc_int"], r["docid"]): r["score"]
        for r in search_bm25f(
            fielded, WEIGHTS, ["alpha", "beta"], top_k=2**31 - 1, mode="and"
        ).collect()
    }
    got = {
        (r["doc_int"], r["docid"]): r["score"]
        for r in fielded_boolean_search(
            fielded, WEIGHTS, "alpha AND beta", top_k=None
        ).collect()
    }
    assert got == want  # exact float equality


def test_fielded_plan_shape(spark, fielded):
    """One decode per field in the main plan, one doc_int exchange, no
    sort-merge joins; the any-field df side job is NOT in this plan
    (it ran at call time)."""
    import re as _re

    df = fielded_boolean_search(
        fielded, WEIGHTS, 'title:alpha AND body:"gamma delta"', top_k=5
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert len(_re.findall(r"MapIn(?:Pandas|Arrow) _decode", plan)) == 2, plan
    # exactly one query-side candidate exchange (the doc_int hash
    # repartition); the in-memory index-build subtree has its own
    # exchanges, so count only the doc_int one
    assert (
        len(
            _re.findall(
                r"hashpartitioning\(doc_int#\d+L?, \d+\), REPARTITION_BY_NUM",
                plan,
            )
        )
        == 1
    ), plan
    assert "SortMergeJoin" not in plan, plan
