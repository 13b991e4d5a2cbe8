"""Bigram-LM quality scoring: brute-force parity, smoothing floor,
short-doc NULLs, self-trained ordering sanity."""

import math

import pytest
from pyspark.sql import functions as F

from large_scale_hypertextual_search_engine_spark.operators.lm import (
    score_docs_lm,
    train_bigram_lm,
)


@pytest.fixture(scope="module")
def corpus(spark):
    return (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .selectExpr("cast(doc_id as string) as docid", "text as content")
        .limit(120)
        .cache()
    )


def _brute(rows, k=1.0):
    toks = {r["docid"]: [t for t in r["content"].split(" ") if t] for r in rows}
    uni: dict[str, int] = {}
    big: dict[tuple, int] = {}
    for ts in toks.values():
        for t in ts:
            uni[t] = uni.get(t, 0) + 1
        for a, b in zip(ts, ts[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
    v = len(uni)
    out = {}
    for d, ts in toks.items():
        bgs = list(zip(ts, ts[1:]))
        if not bgs:
            out[d] = (0, None)
            continue
        lp = [
            math.log((big.get(bg, 0) + k) / (uni.get(bg[0], 0) + k * v))
            for bg in bgs
        ]
        out[d] = (len(bgs), sum(lp) / len(lp))
    return out


def test_score_matches_bruteforce(spark, corpus):
    lm = train_bigram_lm(corpus)
    got = {
        r["docid"]: (r["n_bigrams"], r["avg_logprob"])
        for r in score_docs_lm(corpus, lm).collect()
    }
    want = _brute(corpus.collect())
    assert set(got) == set(want)
    for d in want:
        assert got[d][0] == want[d][0], d
        if want[d][1] is None:
            assert got[d][1] is None
        else:
            assert got[d][1] == pytest.approx(want[d][1], rel=1e-9), d


def test_unseen_bigrams_finite(spark, corpus):
    """A doc full of OOV tokens still gets a finite (very low) score."""
    lm = train_bigram_lm(corpus)
    alien = spark.createDataFrame(
        [("x", "zzq1 zzq2 zzq3")], "docid string, content string"
    )
    r = score_docs_lm(alien, lm).collect()[0]
    assert r["n_bigrams"] == 2
    assert r["avg_logprob"] is not None and math.isfinite(r["avg_logprob"])


def test_in_domain_beats_alien(spark, corpus):
    """Scoring the training docs vs shuffled-vocabulary gibberish: the
    corpus median must exceed the gibberish score."""
    lm = train_bigram_lm(corpus)
    scores = [
        r["avg_logprob"]
        for r in score_docs_lm(corpus, lm).collect()
        if r["avg_logprob"] is not None
    ]
    scores.sort()
    median = scores[len(scores) // 2]
    alien = spark.createDataFrame(
        [("x", "zq1 zq2 zq3 zq4 zq5 zq6 zq7 zq8")],
        "docid string, content string",
    )
    alien_score = score_docs_lm(alien, lm).collect()[0]["avg_logprob"]
    assert median > alien_score


def test_short_docs_null(spark, corpus):
    lm = train_bigram_lm(corpus)
    short = spark.createDataFrame(
        [("a", "one"), ("b", ""), ("c", "two words")],
        "docid string, content string",
    )
    got = {r["docid"]: r for r in score_docs_lm(short, lm).collect()}
    assert got["a"]["n_bigrams"] == 0 and got["a"]["avg_logprob"] is None
    assert got["b"]["n_bigrams"] == 0 and got["b"]["avg_logprob"] is None
    assert got["c"]["n_bigrams"] == 1


def test_bad_k(corpus):
    lm = {"unigrams": None, "bigrams": None, "vocab": None}
    with pytest.raises(ValueError):
        score_docs_lm(corpus, lm, k=0.0)


def test_complete_next_bruteforce(spark, corpus):
    from large_scale_hypertextual_search_engine_spark.operators.lm import (
        complete_next,
        train_bigram_lm,
    )

    lm = train_bigram_lm(corpus)
    toks = [
        [t for t in r["content"].split(" ") if t]
        for r in corpus.collect()
    ]
    uni: dict[str, int] = {}
    big: dict[tuple, int] = {}
    for ts in toks:
        for t in ts:
            uni[t] = uni.get(t, 0) + 1
        for a, b in zip(ts, ts[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
    w1 = max(uni, key=uni.get)
    want = sorted(
        ((w2, c) for (a, w2), c in big.items() if a == w1),
        key=lambda x: (-x[1], x[0]),
    )[:5]
    got = [
        (r["word"], r["c"], r["prob"])
        for r in complete_next(lm, f"some context {w1}", top_n=5).collect()
    ]
    assert [(w, c) for w, c, _ in got] == want
    for (_, c, p) in got:
        assert p == pytest.approx(c / uni[w1])

    with pytest.raises(ValueError):
        complete_next(lm, "   ")


def test_lm_save_load_roundtrip(spark, corpus, tmp_path):
    from large_scale_hypertextual_search_engine_spark.operators.lm import (
        load_lm,
        save_lm,
        score_docs_lm,
        train_bigram_lm,
    )

    lm = train_bigram_lm(corpus)
    save_lm(lm, str(tmp_path / "lm"))
    lm2 = load_lm(spark, str(tmp_path / "lm"))
    a = sorted(tuple(r) for r in score_docs_lm(corpus, lm).collect())
    b = sorted(tuple(r) for r in score_docs_lm(corpus, lm2).collect())
    assert a == b and a


def test_ngram_counts_bruteforce(spark, corpus):
    from large_scale_hypertextual_search_engine_spark.operators.lm import (
        ngram_counts,
    )

    toks = [
        [t for t in r["content"].split(" ") if t]
        for r in corpus.collect()
    ]
    want: dict[tuple, int] = {}
    for ts in toks:
        for i in range(len(ts) - 2):
            g = tuple(ts[i:i + 3])
            want[g] = want.get(g, 0) + 1
    got = {
        tuple(r["gram"]): r["c"]
        for r in ngram_counts(corpus, 3).collect()
    }
    assert got == want and got
    got_pruned = ngram_counts(corpus, 3, min_count=3).collect()
    assert all(r["c"] >= 3 for r in got_pruned)
    assert {tuple(r["gram"]) for r in got_pruned} == {
        g for g, c in want.items() if c >= 3
    }

    with pytest.raises(ValueError):
        ngram_counts(corpus, 0)


def test_select_by_quality_bruteforce(spark, corpus):
    import numpy as np

    from large_scale_hypertextual_search_engine_spark.operators.lm import (
        select_by_quality,
        train_bigram_lm,
        score_docs_lm,
    )

    lm = train_bigram_lm(corpus)
    scores = {
        r["docid"]: r["avg_logprob"]
        for r in score_docs_lm(corpus, lm).collect()
    }
    vals = sorted(v for v in scores.values() if v is not None)
    thr = float(np.percentile(vals, 70.0, method="linear"))
    got = {r["docid"]: r["keep"] for r in select_by_quality(
        corpus, lm, keep_frac=0.3
    ).collect()}
    assert set(got) == set(scores)
    for d, v in scores.items():
        assert got[d] == (v is not None and v >= thr), d
    kept = sum(got.values())
    assert kept >= int(0.3 * len(vals)) - 1

    import pytest as _pytest
    with _pytest.raises(ValueError):
        select_by_quality(corpus, lm, keep_frac=0.0)
