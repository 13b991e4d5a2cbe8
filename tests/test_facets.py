"""Faceted search: brute-force count parity, null bucketing, top-n
tie-break determinism, docid-keyed facet tables."""

import pytest
from pyspark.sql import functions as F

from large_scale_hypertextual_search_engine_spark.operators.facets import (
    search_facets,
)
from large_scale_hypertextual_search_engine_spark.operators.index_build import (
    build_index,
)


@pytest.fixture(scope="module")
def corpus(spark):
    return (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .selectExpr(
            "cast(doc_id as string) as docid",
            "text as content",
            "lang",
            "source",
        )
        .cache()
    )


@pytest.fixture(scope="module")
def fac_index(spark, corpus):
    return build_index(
        corpus.select("docid", "content"), mode="simple", stem=False,
        salt_buckets=2,
    )


def _brute_facets(corpus, terms, cols, top_n):
    rows = corpus.collect()
    counts: dict[tuple, int] = {}
    for r in rows:
        toks = set(t for t in r["content"].split(" ") if t)
        if not all(t in toks for t in terms):
            continue
        for c in cols:
            v = r[c] if r[c] is not None else "(none)"
            counts[(c, str(v))] = counts.get((c, str(v)), 0) + 1
    out = []
    for c in cols:
        vals = sorted(
            ((v, n) for (cc, v), n in counts.items() if cc == c),
            key=lambda x: (-x[1], x[0]),
        )[:top_n]
        out += [(c, v, n, i + 1) for i, (v, n) in enumerate(vals)]
    return sorted(out)


def test_facets_match_bruteforce(spark, corpus, fac_index):
    got = sorted(
        (r["facet"], r["value"], r["n_docs"], r["rank"])
        for r in search_facets(
            fac_index, ["spark", "join"],
            corpus.select("docid", "lang", "source"),
            ["lang", "source"], mode="and", top_n=5,
        ).collect()
    )
    want = _brute_facets(corpus, ["spark", "join"], ["lang", "source"], 5)
    assert got == want
    assert got, "vacuous"


def test_facets_doc_int_keyed_equivalent(spark, corpus, fac_index):
    by_docid = corpus.select("docid", "lang")
    by_int = by_docid.join(fac_index["docid_map"], "docid").select(
        "doc_int", "lang"
    )
    a = sorted(
        tuple(r) for r in search_facets(
            fac_index, ["spark"], by_docid, ["lang"], top_n=10
        ).collect()
    )
    b = sorted(
        tuple(r) for r in search_facets(
            fac_index, ["spark"], by_int, ["lang"], top_n=10
        ).collect()
    )
    assert a == b and a


def test_facets_null_bucket(spark, corpus, fac_index):
    facets = corpus.select(
        "docid",
        F.when(F.col("docid").cast("long") % 2 == 0, F.col("lang")).alias(
            "lang2"
        ),
    )
    got = {
        r["value"]: r["n_docs"]
        for r in search_facets(
            fac_index, ["spark"], facets, ["lang2"], top_n=100
        ).collect()
    }
    assert "(none)" in got and got["(none)"] > 0


def test_facets_docs_absent_from_table_dropped(spark, corpus, fac_index):
    """A doc missing from the facet table contributes to no bucket
    (inner join) — counts shrink accordingly."""
    half = corpus.filter(F.col("docid").cast("long") < 250).select(
        "docid", "lang"
    )
    full_n = sum(
        r["n_docs"]
        for r in search_facets(
            fac_index, ["spark"], corpus.select("docid", "lang"),
            ["lang"], top_n=100,
        ).collect()
    )
    half_n = sum(
        r["n_docs"]
        for r in search_facets(
            fac_index, ["spark"], half, ["lang"], top_n=100
        ).collect()
    )
    assert 0 < half_n < full_n


def test_facets_requires_columns(spark, corpus, fac_index):
    with pytest.raises(ValueError, match="facet_cols"):
        search_facets(fac_index, ["spark"], corpus, [])
