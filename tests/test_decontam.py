"""Benchmark decontamination (operators/decontam.py).

Brute-force parity: the Spark n-gram overlap report must equal a pure-
Python recomputation (normalize -> n-grams -> set intersection) on the
driver testdata; decontaminate() must drop exactly the reported ids.
"""

import re

import pytest
from pyspark.sql import functions as F

from large_scale_hypertextual_search_engine_spark.operators.decontam import (
    benchmark_grams,
    contamination_report,
    decontaminate,
    ngrams_col,
)

DOCS = "/root/testdata/sf0.001/documents.parquet"


def _grams(text: str, n: int) -> set[str]:
    toks = [t for t in re.sub(r"[^a-z0-9]+", " ", text.lower()).split(" ") if t]
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.read.parquet(DOCS).select("doc_id", "text")


def test_report_matches_bruteforce(spark, corpus):
    n = 8
    rows = {r["doc_id"]: r["text"] for r in corpus.collect()}
    bench_ids = {i for i in rows if i % 37 == 0}
    bench_set = set().union(*(_grams(rows[i], n) for i in bench_ids))
    expect = {}
    for i, text in rows.items():
        g = _grams(text, n)
        ov = len(g & bench_set)
        if ov:
            expect[i] = (ov, len(g))

    bench = corpus.filter(F.col("doc_id") % 37 == 0)
    got = {
        r["doc_id"]: (r["overlap_grams"], r["total_grams"])
        for r in contamination_report(corpus, bench, n=n).collect()
    }
    assert got == expect
    # sanity: every benchmark doc long enough to have a gram is
    # self-contaminated, and at least one NON-benchmark doc is caught
    # (the testdata ships near-duplicates)
    assert bench_ids & set(got)
    assert set(got) - bench_ids


def test_decontaminate_drops_exactly_the_report(spark, corpus):
    bench = corpus.filter(F.col("doc_id") % 37 == 0)
    rep_ids = {
        r["doc_id"]
        for r in contamination_report(corpus, bench, n=8).collect()
    }
    clean = decontaminate(corpus, bench, n=8)
    clean_ids = {r["doc_id"] for r in clean.select("doc_id").collect()}
    all_ids = {r["doc_id"] for r in corpus.select("doc_id").collect()}
    assert clean_ids == all_ids - rep_ids


def test_min_overlap_threshold(spark, corpus):
    bench = corpus.filter(F.col("doc_id") % 37 == 0)
    rep1 = contamination_report(corpus, bench, n=8, min_overlap=1)
    rep5 = contamination_report(corpus, bench, n=8, min_overlap=5)
    ids5 = {r["doc_id"] for r in rep5.collect()}
    ge5 = {r["doc_id"] for r in rep1.collect() if r["overlap_grams"] >= 5}
    assert ids5 == ge5


def test_short_and_null_docs_have_no_grams(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, None), (3, ""), (4, "one two three four five")],
        "doc_id long, text string",
    )
    sizes = {
        r["doc_id"]: r["s"]
        for r in df.select(
            "doc_id", F.size(ngrams_col(F.col("text"), 5)).alias("s")
        ).collect()
    }
    assert sizes == {1: 0, 2: 0, 3: 0, 4: 1}


def test_normalization_and_distinctness(spark):
    # case/punctuation-insensitive grams; repeated grams count once
    df = spark.createDataFrame(
        [(1, "Foo, BAR baz! foo bar baz")], "doc_id long, text string"
    )
    bench = spark.createDataFrame(
        [(9, "foo bar baz")], "doc_id long, text string"
    )
    rep = contamination_report(df, bench, n=3).collect()
    assert len(rep) == 1
    # doc grams: {foo bar baz, bar baz foo, baz foo bar} (distinct)
    assert rep[0]["overlap_grams"] == 1
    assert rep[0]["total_grams"] == 3


def test_benchmark_grams_reusable(spark, corpus):
    bench = corpus.filter(F.col("doc_id") % 37 == 0)
    bg = benchmark_grams(bench, n=8)
    assert bg.columns == ["gram_hash"]
    assert bg.count() == bg.distinct().count()


def test_plan_broadcasts_benchmark_and_prunes_columns(spark, corpus):
    bench = corpus.filter(F.col("doc_id") % 37 == 0)
    plan = (
        contamination_report(corpus, bench, n=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    # the corpus side must not shuffle gram strings: the only hash
    # exchanges are the benchmark distinct and the per-doc agg
    assert plan.count("Exchange hashpartitioning") == 2, plan


def test_hashed_grams_equal_string_grams(spark, corpus):
    """The pipeline's xxhash64-over-slice gram hashing must produce the
    same per-doc distinct-gram counts as the human-readable string
    form (collision-free on this corpus by construction)."""
    from pyspark.sql import functions as F
    from large_scale_hypertextual_search_engine_spark.operators.decontam import (
        _gram_frame,
    )

    strings = {
        r["doc_id"]: r["s"]
        for r in corpus.select(
            "doc_id", F.size(ngrams_col(F.col("text"), 8)).alias("s")
        ).collect()
    }
    hashed = {
        r["doc_id"]: r["h"]
        for r in _gram_frame(corpus, "text", ["doc_id"], 8)
        .select("doc_id", F.size("grams").alias("h"))
        .collect()
    }
    assert strings == hashed
