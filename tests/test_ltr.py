"""LTR feature export: bit-consistency with search_batch, brute-force
feature parity, statics join, duplicate dedup."""

import math

import pytest
from pyspark.sql import functions as F

from large_scale_hypertextual_search_engine_spark.operators.index_build import (
    build_index,
)
from large_scale_hypertextual_search_engine_spark.operators.ltr import (
    ltr_features,
)
from large_scale_hypertextual_search_engine_spark.operators.query import (
    search_batch,
)


@pytest.fixture(scope="module")
def corpus(spark):
    return (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .selectExpr("cast(doc_id as string) as docid", "text as content")
        .cache()
    )


@pytest.fixture(scope="module")
def ltr_index(spark, corpus):
    return build_index(
        corpus.select("docid", "content"), mode="simple", stem=False,
        salt_buckets=2,
    )


@pytest.fixture(scope="module")
def qdf(spark):
    return spark.createDataFrame(
        [(1, "spark"), (1, "join"), (2, "merge"), (2, "window"),
         (2, "zzz_oov")],
        "query_id long, term string",
    )


def test_bm25_bit_equal_to_search_batch(spark, ltr_index, qdf):
    """The bm25 feature is the serving score, bit-for-bit (same sorted
    FP fold) for every doc search_batch ranks."""
    feats = {
        (r["query_id"], r["doc_int"]): r["bm25"]
        for r in ltr_features(ltr_index, qdf).collect()
    }
    ranked = search_batch(ltr_index, qdf, top_k=50, mode="or").collect()
    assert ranked
    for r in ranked:
        assert feats[(r["query_id"], r["doc_int"])] == r["score"]


def test_feature_values_bruteforce(spark, corpus, ltr_index, qdf):
    rows = corpus.collect()
    n = len(rows)
    toks = {r["docid"]: [t for t in r["content"].split(" ") if t] for r in rows}
    df = {}
    for terms in toks.values():
        for t in set(terms):
            df[t] = df.get(t, 0) + 1
    avg_dl = sum(len(t) for t in toks.values()) / n
    got = ltr_features(ltr_index, qdf).collect()
    qterms = {1: ["spark", "join"], 2: ["merge", "window", "zzz_oov"]}
    for r in got:
        terms = [t for t in qterms[r["query_id"]] if t in set(toks[r["docid"]])]
        assert r["n_matched"] == len(terms) > 0
        assert r["n_terms"] == len(qterms[r["query_id"]])
        assert r["match_ratio"] == pytest.approx(
            len(terms) / len(qterms[r["query_id"]])
        )
        assert r["doc_len"] == len(toks[r["docid"]])
        assert r["tf_sum"] == sum(toks[r["docid"]].count(t) for t in terms)
        idf_sum = sum(
            math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0) for t in terms
        )
        assert r["idf_sum"] == pytest.approx(idf_sum, rel=1e-12)
        assert r["bm25_max"] >= r["bm25_min"]
        assert r["bm25"] == pytest.approx(
            sum(
                math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
                * (2.5 * toks[r["docid"]].count(t))
                / (1.5 * (0.25 + 0.75 * len(toks[r["docid"]]) / avg_dl)
                   + toks[r["docid"]].count(t))
                for t in terms
            ),
            rel=1e-9,
        )


def test_statics_join(spark, corpus, ltr_index, qdf):
    statics = corpus.select(
        "docid", F.length("content").alias("content_bytes")
    )
    rows = ltr_features(ltr_index, qdf, statics=statics).collect()
    blen = {r["docid"]: len(r["content"]) for r in corpus.collect()}
    assert rows
    for r in rows:
        assert r["content_bytes"] == blen[r["docid"]]


def test_duplicate_query_terms_deduped(spark, ltr_index):
    a = spark.createDataFrame(
        [(1, "spark"), (1, "spark"), (1, "join")],
        "query_id long, term string",
    )
    c = spark.createDataFrame(
        [(1, "spark"), (1, "join")], "query_id long, term string"
    )
    ra = sorted(tuple(r) for r in ltr_features(ltr_index, a).collect())
    rc = sorted(tuple(r) for r in ltr_features(ltr_index, c).collect())
    assert ra == rc and ra


def test_candidates_top_k_matches_search_batch(spark, ltr_index, qdf):
    """candidates_top_k=5 exports exactly search_batch's top-5 docs per
    query (same order key: bm25 desc, doc_int asc)."""
    feats = ltr_features(ltr_index, qdf, candidates_top_k=5).collect()
    ranked = search_batch(ltr_index, qdf, top_k=5, mode="or").collect()
    got = {
        (r["query_id"], r["doc_int"]): r["bm25"] for r in feats
    }
    want = {
        (r["query_id"], r["doc_int"]): r["score"] for r in ranked
    }
    assert got == want and got
