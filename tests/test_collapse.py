"""Field collapse: brute-force parity, group_top_n semantics, null
bucketing, score bit-equality with search(), doc_int-keyed groups."""

import pytest
from pyspark.sql import functions as F

from large_scale_hypertextual_search_engine_spark.operators.collapse import (
    search_collapse,
)
from large_scale_hypertextual_search_engine_spark.operators.index_build import (
    build_index,
)
from large_scale_hypertextual_search_engine_spark.operators.query import search


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
def col_index(spark, corpus):
    return build_index(
        corpus.select("docid", "content"), mode="simple", stem=False,
        salt_buckets=2,
    )


def _brute_collapse(corpus, index, terms, col, top_k, group_top_n, mode):
    """Brute force over the scored match set produced by search()
    itself (top_k huge), re-grouped in Python."""
    full = search(index, terms, top_k=1 << 30, mode=mode).collect()
    meta = {
        r["docid"]: (r[col] if r[col] is not None else "(none)")
        for r in corpus.collect()
    }
    bygrp: dict[str, list] = {}
    for r in full:
        bygrp.setdefault(str(meta[r["docid"]]), []).append(
            (r["score"], r["doc_int"], r["docid"])
        )
    heads = sorted(
        ((max(v)[0], g) for g, v in bygrp.items()),
        key=lambda x: (-x[0], x[1]),
    )[:top_k]
    out = []
    for grank, (hscore, g) in enumerate(heads, 1):
        hits = sorted(bygrp[g], key=lambda x: (-x[0], x[1]))[:group_top_n]
        out += [
            (g, grank, docid, hrank, score)
            for hrank, (score, _, docid) in enumerate(hits, 1)
        ]
    return sorted(out)


@pytest.mark.parametrize("group_top_n", [1, 3])
def test_collapse_match_bruteforce(spark, corpus, col_index, group_top_n):
    got = sorted(
        tuple(r)
        for r in search_collapse(
            col_index, ["spark", "join"],
            corpus.select("docid", "lang"), "lang",
            top_k=5, group_top_n=group_top_n, mode="and",
        ).collect()
    )
    want = _brute_collapse(
        corpus, col_index, ["spark", "join"], "lang", 5, group_top_n, "and"
    )
    assert got == want
    assert got, "vacuous"


def test_collapse_or_mode(spark, corpus, col_index):
    got = sorted(
        tuple(r)
        for r in search_collapse(
            col_index, ["merge", "window"],
            corpus.select("docid", "source"), "source",
            top_k=4, group_top_n=2, mode="or",
        ).collect()
    )
    want = _brute_collapse(
        corpus, col_index, ["merge", "window"], "source", 4, 2, "or"
    )
    assert got == want
    assert got


def test_collapse_head_is_global_top1(spark, corpus, col_index):
    """The rank-1 group's head hit IS search()'s global #1 hit, with a
    bit-equal score (same sorted FP fold through match_docs)."""
    top1 = search(col_index, ["spark", "join"], top_k=1, mode="and").collect()[0]
    head = (
        search_collapse(
            col_index, ["spark", "join"],
            corpus.select("docid", "lang"), "lang", top_k=1,
        ).collect()[0]
    )
    assert head["docid"] == top1["docid"]
    assert head["score"] == top1["score"]
    assert head["group_rank"] == 1 and head["hit_rank"] == 1


def test_collapse_null_bucket(spark, corpus, col_index):
    """NULL group values collapse into the visible "(none)" bucket."""
    nulled = corpus.select(
        "docid", F.lit(None).cast("string").alias("lang")
    )
    rows = search_collapse(
        col_index, ["spark"], nulled, "lang", top_k=3
    ).collect()
    assert [r["group_value"] for r in rows] == ["(none)"]


def test_collapse_doc_int_keyed_equivalent(spark, corpus, col_index):
    by_docid = corpus.select("docid", "lang")
    by_int = by_docid.join(col_index["docid_map"], "docid").select(
        "doc_int", "lang"
    )
    a = sorted(
        tuple(r)
        for r in search_collapse(
            col_index, ["spark"], by_docid, "lang", top_k=10, group_top_n=2
        ).collect()
    )
    c = sorted(
        tuple(r)
        for r in search_collapse(
            col_index, ["spark"], by_int, "lang", top_k=10, group_top_n=2
        ).collect()
    )
    assert a == c and a


def test_collapse_rejects_bad_n(col_index, corpus):
    with pytest.raises(ValueError):
        search_collapse(
            col_index, ["spark"], corpus.select("docid", "lang"), "lang",
            group_top_n=0,
        )
