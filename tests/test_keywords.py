"""TF-IDF keywords and PMI collocations: brute-force parity."""

import math

import pytest

from large_scale_hypertextual_search_engine_spark.operators.keywords import (
    collocations,
    extract_keywords,
)


@pytest.fixture(scope="module")
def docs(spark):
    return (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .limit(200)
        .cache()
    )


def _toks(t):
    return [x for x in t.split(" ") if x]


def test_keywords_match_bruteforce(spark, docs):
    rows = docs.collect()
    tf, dfc = {}, {}
    for r in rows:
        seen = {}
        for t in _toks(r["text"]):
            seen[t] = seen.get(t, 0) + 1
        tf[r["doc_id"]] = seen
        for t in seen:
            dfc[t] = dfc.get(t, 0) + 1
    n = len(rows)
    want = set()
    for d, seen in tf.items():
        scored = sorted(
            (
                (-c * math.log((n + 1.0) / (dfc[t] + 1.0)), -c, t)
                for t, c in seen.items()
            )
        )[:3]
        for i, (negs, negc, t) in enumerate(scored):
            want.add((d, t, -negc, round(-negs, 6), i + 1))
    got = {
        (r["doc_id"], r["term"], r["tf"], r["tfidf"], r["rank"])
        for r in extract_keywords(docs, "text", "doc_id", top_n=3).collect()
    }
    assert got == want
    assert got


def test_keywords_min_df_filters(spark, docs):
    got = extract_keywords(docs, "text", "doc_id", top_n=3, min_df=10)
    dfs = {
        r["term"]
        for r in got.select("term").distinct().collect()
    }
    # every surviving keyword appears in >= 10 docs
    rows = docs.collect()
    for t in dfs:
        n = sum(1 for r in rows if t in set(_toks(r["text"])))
        assert n >= 10, t


def test_collocations_match_bruteforce(spark, docs):
    rows = docs.collect()
    ab, la, rb, n_pairs = {}, {}, {}, 0
    for r in rows:
        ts = _toks(r["text"])
        for a, b in zip(ts, ts[1:]):
            ab[(a, b)] = ab.get((a, b), 0) + 1
            la[a] = la.get(a, 0) + 1
            rb[b] = rb.get(b, 0) + 1
            n_pairs += 1
    want = sorted(
        [
            (round(math.log(c * n_pairs / (la[a] * rb[b])), 6), c, a, b)
            for (a, b), c in ab.items()
            if c >= 5
        ],
        key=lambda x: (-x[0], -x[1], x[2], x[3]),
    )[:20]
    got = [
        (r["pmi"], r["n_pair"], r["term_a"], r["term_b"])
        for r in collocations(docs, "text", min_count=5, top_n=20).collect()
    ]
    assert got == want
    assert got


def test_collocations_empty_corpus(spark):
    e = spark.createDataFrame([("",)], "text string")
    assert collocations(e, "text", min_count=1, top_n=5).count() == 0
