"""Positional phrase queries: brute-force parity, AND-path score
consistency, and compat-mode position-gap semantics."""

import pytest
from pyspark.sql import functions as F

from large_scale_hypertextual_search_engine_spark.operators.index_build import (
    build_index,
)
from large_scale_hypertextual_search_engine_spark.operators.phrase import (
    phrase_match_docs,
    phrase_search,
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


PHRASE = ["fast", "key"]


def _brute_occurrences(docs, phrase):
    out = {}
    for r in docs.collect():
        ts = [t for t in r["content"].split(" ") if t]
        n = sum(
            1
            for i in range(len(ts) - len(phrase) + 1)
            if ts[i : i + len(phrase)] == phrase
        )
        if n:
            out[r["docid"]] = n
    return out


def test_phrase_match_equals_bruteforce(spark, simple_index):
    idx, docs = simple_index
    want = _brute_occurrences(docs, PHRASE)
    got = {
        r["docid"]: r["n_occurrences"]
        for r in phrase_match_docs(idx, PHRASE)
        .join(idx["docid_map"], "doc_int")
        .select("docid", "n_occurrences")
        .collect()
    }
    assert got == want
    assert len(got) > 0


def test_phrase_scores_match_and_search(spark, simple_index):
    """Phrase top-k scores must be bit-identical to search() AND mode
    for the same docs (a phrase query IS an AND query plus an adjacency
    filter; both use the same sorted deterministic FP fold)."""
    idx, _docs = simple_index
    and_scores = {
        r["doc_int"]: r["score"]
        for r in search(idx, PHRASE, top_k=10_000, mode="and").collect()
    }
    rows = phrase_search(idx, PHRASE, top_k=10).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["doc_int"] in and_scores
        assert r["score"] == and_scores[r["doc_int"]], r
    # ranks: descending score, doc_int tiebreak
    ordered = sorted(rows, key=lambda r: (-r["score"], r["doc_int"]))
    assert [r["rank"] for r in ordered] == list(range(1, len(rows) + 1))


def test_phrase_single_term_and_absent_term(spark, simple_index):
    idx, _docs = simple_index
    one = phrase_search(idx, [PHRASE[0]], top_k=5).collect()
    assert len(one) == 5
    # single-term phrase: n_occurrences == tf
    none = phrase_search(idx, [PHRASE[0], "zz_nosuchterm"], top_k=5).collect()
    assert none == []


def test_phrase_compat_mode_stopword_gap(spark):
    """Compat analyzer numbers PRE-filter token runs, so a removed
    stopword leaves a position gap: "machine the learning" must NOT
    match the phrase ["machine", "learning"], while a truly adjacent
    "machine learning" must."""
    docs = spark.createDataFrame(
        [
            ("d1", "machine learning wins"),
            ("d2", "machine the learning loses"),
            ("d3", "about machine learning and machine learning again"),
        ],
        "docid string, content string",
    )
    idx = build_index(
        docs, mode="compat", stem=False,
        stopwords=frozenset({"the"}), salt_buckets=2,
    )
    got = {
        r["docid"]: r["n_occurrences"]
        for r in phrase_match_docs(idx, ["machine", "learning"])
        .join(idx["docid_map"], "doc_int")
        .select("docid", "n_occurrences")
        .collect()
    }
    assert got == {"d1": 1, "d3": 2}


def test_phrase_repeated_term(spark):
    """A phrase that repeats a term ("buffalo buffalo") must require two
    adjacent occurrences and count overlapping starts like the batch
    definition, with each distinct term scored once."""
    docs = spark.createDataFrame(
        [
            ("d1", "buffalo buffalo buffalo"),
            ("d2", "buffalo herd buffalo"),
            ("d3", "one buffalo buffalo two"),
        ],
        "docid string, content string",
    )
    idx = build_index(docs, mode="simple", stem=False, salt_buckets=2)
    got = {
        r["docid"]: r["n_occurrences"]
        for r in phrase_match_docs(idx, ["buffalo", "buffalo"])
        .join(idx["docid_map"], "doc_int")
        .select("docid", "n_occurrences")
        .collect()
    }
    assert got == {"d1": 2, "d3": 1}
    res = phrase_search(idx, ["buffalo", "buffalo"], top_k=10).collect()
    # distinct-term scoring: score equals the single-term AND score
    single = {
        r["doc_int"]: r["score"]
        for r in search(idx, ["buffalo"], top_k=100, mode="and").collect()
    }
    for r in res:
        assert r["score"] == single[r["doc_int"]], r


def test_server_phrase_matches_spark_phrase(spark, simple_index):
    """Warm-serving phrase path must be rank-, score- and
    occurrence-identical to the Spark phrase_search path."""
    from large_scale_hypertextual_search_engine_spark.operators.serving import (
        SearchServer,
    )

    idx, _docs = simple_index
    srv = SearchServer(idx)
    for ph in (PHRASE, [PHRASE[0]], ["zz_nosuchterm", PHRASE[0]]):
        want = [
            (r["rank"], r["doc_int"], r["docid"], r["n_occurrences"], r["score"])
            for r in phrase_search(idx, ph, top_k=10).orderBy("rank").collect()
        ]
        got = [
            (r["rank"], r["doc_int"], r["docid"], r["n_occurrences"], r["score"])
            for r in srv.search_phrase(ph, top_k=10)
        ]
        assert [g[:4] for g in got] == [w[:4] for w in want], ph
        for g, w in zip(got, want):
            assert g[4] == pytest.approx(w[4], abs=1e-12, rel=1e-12), (ph, g, w)


def test_phrase_search_batch_matches_single(spark, simple_index):
    """phrase_search_batch (one job for N phrases, mixed lengths) must
    equal per-phrase phrase_search exactly, including scores and
    occurrence counts."""
    from large_scale_hypertextual_search_engine_spark.operators.phrase import (
        phrase_search_batch,
    )

    idx, _docs = simple_index
    phrases = {
        1: PHRASE,
        2: [PHRASE[0]],
        3: ["merge", "window"],
        4: ["zz_nosuchterm", PHRASE[0]],
    }
    got = {}
    for r in phrase_search_batch(idx, phrases, top_k=10).collect():
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_int"], r["docid"], r["n_occurrences"], r["score"])
        )
    for qid, ph in phrases.items():
        want = [
            (r["rank"], r["doc_int"], r["docid"], r["n_occurrences"], r["score"])
            for r in phrase_search(idx, ph, top_k=10).orderBy("rank").collect()
        ]
        rows = sorted(got.get(qid, []))
        assert rows == sorted(want), (qid, ph)


def _brute_proximity(docs, a, b, slop, ordered):
    """(docid -> min_dist) for docs with a qualifying (a, b) pair."""
    out = {}
    for r in docs.collect():
        ts = [t for t in r["content"].split(" ") if t]
        pa = [i for i, t in enumerate(ts) if t == a]
        pb = [i for i, t in enumerate(ts) if t == b]
        if not pa or not pb:
            continue
        if ordered:
            ds = [q - p for p in pa for q in pb if q > p]
        else:
            ds = [abs(q - p) for p in pa for q in pb]
        if ds and min(ds) <= slop:
            out[r["docid"]] = min(ds)
    return out


def test_proximity_matches_bruteforce(spark, simple_index):
    from large_scale_hypertextual_search_engine_spark.operators.phrase import (
        proximity_search,
    )

    idx, docs = simple_index
    for ordered in (False, True):
        want = _brute_proximity(docs, "fast", "key", 4, ordered)
        got = {
            r["docid"]: r["min_dist"]
            for r in proximity_search(
                idx, "fast", "key", slop=4, ordered=ordered, top_k=100_000
            ).collect()
        }
        assert got == want, f"ordered={ordered}"
        assert len(got) > 0


def test_proximity_scores_match_and_search(spark, simple_index):
    from large_scale_hypertextual_search_engine_spark.operators.phrase import (
        proximity_search,
    )

    idx, _docs = simple_index
    and_scores = {
        r["doc_int"]: r["score"]
        for r in search(idx, ["fast", "key"], top_k=10_000, mode="and").collect()
    }
    rows = proximity_search(idx, "fast", "key", slop=6, top_k=10).collect()
    assert rows
    for r in rows:
        assert r["score"] == and_scores[r["doc_int"]], r
    ordered = sorted(rows, key=lambda r: (-r["score"], r["doc_int"]))
    assert [r["rank"] for r in ordered] == list(range(1, len(rows) + 1))


def test_proximity_validation(spark, simple_index):
    from large_scale_hypertextual_search_engine_spark.operators.phrase import (
        proximity_search,
    )

    idx, _docs = simple_index
    with pytest.raises(ValueError):
        proximity_search(idx, "fast", "fast", slop=3)
    with pytest.raises(ValueError):
        proximity_search(idx, "fast", "key", slop=0)
