"""Context-aware did-you-mean: brute-force parity, in-vocab words
untouched, edge positions, context actually changes the pick."""

import math

import pytest

from large_scale_hypertextual_search_engine_spark.operators.index_build import (
    build_index,
)
from large_scale_hypertextual_search_engine_spark.operators.lm import (
    suggest_context,
    train_bigram_lm,
)


@pytest.fixture(scope="module")
def corpus(spark):
    return (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .selectExpr("cast(doc_id as string) as docid", "text as content")
        .cache()
    )


@pytest.fixture(scope="module")
def sc_index(spark, corpus):
    return build_index(
        corpus.select("docid", "content"), mode="simple", stem=False,
        salt_buckets=2,
    )


@pytest.fixture(scope="module")
def sc_lm(corpus):
    return train_bigram_lm(corpus)


def _lev(a, b):
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(
                dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
            )
    return dp[len(b)]


def _brute(corpus, terms, max_dist=2, k=1.0):
    rows = corpus.collect()
    toks = {r["docid"]: [t for t in r["content"].split(" ") if t] for r in rows}
    uni: dict[str, int] = {}
    big: dict[tuple, int] = {}
    for ts in toks.values():
        for t in ts:
            uni[t] = uni.get(t, 0) + 1
        for a, b in zip(ts, ts[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
    v = len(uni)

    def logp(w1, w2):
        return math.log((big.get((w1, w2), 0) + k) / (uni.get(w1, 0) + k * v))

    out = []
    words = [w.lower() for w in terms]
    for i, w in enumerate(words):
        cands = [
            (t, _lev(t, w))
            for t in uni
            if abs(len(t) - len(w)) <= max_dist and _lev(t, w) <= max_dist
        ]
        if not cands or min(d for _, d in cands) == 0:
            continue
        total = sum(uni.values())
        scored = []
        for t, d in cands:
            s = math.log(uni[t] / total)
            if i > 0:
                s += logp(words[i - 1], t)
            if i + 1 < len(words):
                s += logp(t, words[i + 1])
            scored.append((-s, d, -uni[t], t))
        scored.sort()
        s, d, _, t = scored[0]
        out.append((i, w, t, d, -s))
    return out


def test_matches_bruteforce(spark, corpus, sc_index, sc_lm):
    terms = ["fast", "sprak", "jion"]
    got = [
        (r["pos"], r["word"], r["suggestion"], r["dist"], r["score"])
        for r in suggest_context(
            sc_index, sc_lm, terms, max_dist=2
        ).collect()
    ]
    want = _brute(corpus, terms, max_dist=2)
    assert [(p, w, s, d) for p, w, s, d, _ in want] == [
        (p, w, s, d) for p, w, s, d, _ in got
    ]
    for (_, _, _, _, ws), (_, _, _, _, gs) in zip(want, got):
        assert gs == pytest.approx(ws, rel=1e-9)
    assert got, "vacuous"


def test_in_vocab_words_untouched(spark, sc_index, sc_lm):
    rows = suggest_context(
        sc_index, sc_lm, ["spark", "join"], max_dist=2
    ).collect()
    assert rows == []


def test_single_oov_word_no_context(spark, corpus, sc_index, sc_lm):
    """A 1-term query has no neighbors: only the unigram source prior
    ranks candidates — same pick as brute."""
    got = suggest_context(sc_index, sc_lm, ["sprak"], max_dist=2).collect()
    want = _brute(corpus, ["sprak"], max_dist=2)
    assert [(r["pos"], r["suggestion"]) for r in got] == [
        (p, s) for p, _, s, _, _ in want
    ]
    # no context: only the unigram source prior remains (negative)
    assert got[0]["score"] == pytest.approx(want[0][4], rel=1e-9)
    assert got[0]["score"] < 0.0
