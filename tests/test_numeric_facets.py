"""Histogram + range facets: brute-force parity, zero-fill report
shape, open tails, null dropping, validation."""

import pytest
from pyspark.sql import functions as F

from large_scale_hypertextual_search_engine_spark.operators.facets import (
    histogram_facet,
    range_facet,
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
            "n_chars",
        )
        .cache()
    )


@pytest.fixture(scope="module")
def nf_index(spark, corpus):
    return build_index(
        corpus.select("docid", "content"), mode="simple", stem=False,
        salt_buckets=2,
    )


def _match_vals(corpus, terms):
    return [
        r["n_chars"]
        for r in corpus.collect()
        if all(t in set(r["content"].split(" ")) for t in terms)
        and r["n_chars"] is not None
    ]


def test_histogram_bruteforce(spark, corpus, nf_index):
    vals = _match_vals(corpus, ["spark", "join"])
    want: dict[float, int] = {}
    for v in vals:
        bs = (v // 250) * 250.0
        want[bs] = want.get(bs, 0) + 1
    got = {
        r["bucket_start"]: r["n_docs"]
        for r in histogram_facet(
            nf_index, ["spark", "join"],
            corpus.select("docid", "n_chars"), "n_chars", 250,
        ).collect()
    }
    assert got == want and got


def test_histogram_sorted_ascending(spark, corpus, nf_index):
    rows = histogram_facet(
        nf_index, ["spark"], corpus.select("docid", "n_chars"),
        "n_chars", 100,
    ).collect()
    starts = [r["bucket_start"] for r in rows]
    assert starts == sorted(starts)


def test_range_bruteforce_with_zero_fill(spark, corpus, nf_index):
    edges = [0.0, 400.0, 800.0, 1_000_000.0]
    vals = _match_vals(corpus, ["spark", "join"])
    want = []
    bounds = [(None, 0.0), (0.0, 400.0), (400.0, 800.0),
              (800.0, 1_000_000.0), (1_000_000.0, None)]
    for lo, hi in bounds:
        n = sum(
            1
            for v in vals
            if (lo is None or v >= lo) and (hi is None or v < hi)
        )
        want.append((lo, hi, n))
    got = [
        (r["range_lo"], r["range_hi"], r["n_docs"])
        for r in range_facet(
            nf_index, ["spark", "join"],
            corpus.select("docid", "n_chars"), "n_chars", edges,
        ).collect()
    ]
    assert got == want
    # the report shape is fixed: all 5 ranges present, incl. zero rows
    assert len(got) == 5
    assert got[0][2] == 0 and got[4][2] == 0  # tails empty here
    assert sum(n for _, _, n in got) == len(vals)


def test_nulls_dropped(spark, corpus, nf_index):
    nulled = corpus.select(
        "docid", F.lit(None).cast("double").alias("n_chars")
    )
    assert histogram_facet(
        nf_index, ["spark"], nulled, "n_chars", 100
    ).count() == 0


def test_validation(nf_index, corpus):
    meta = corpus.select("docid", "n_chars")
    with pytest.raises(ValueError):
        histogram_facet(nf_index, ["spark"], meta, "n_chars", 0)
    with pytest.raises(ValueError):
        range_facet(nf_index, ["spark"], meta, "n_chars", [3.0, 1.0])
    with pytest.raises(ValueError):
        range_facet(nf_index, ["spark"], meta, "n_chars", [])


def test_stats_facet_bruteforce(spark, corpus, nf_index):
    import statistics

    from large_scale_hypertextual_search_engine_spark.operators.facets import (
        stats_facet,
    )

    vals = _match_vals(corpus, ["spark", "join"])
    r = stats_facet(
        nf_index, ["spark", "join"],
        corpus.select("docid", "n_chars"), "n_chars",
    ).collect()[0]
    assert r["n_docs"] == len(vals)
    assert r["min"] == min(vals) and r["max"] == max(vals)
    assert r["sum"] == pytest.approx(sum(vals))
    assert r["avg"] == pytest.approx(sum(vals) / len(vals))
    assert r["std"] == pytest.approx(statistics.stdev(vals), rel=1e-9)


def test_stats_facet_empty_match(spark, corpus, nf_index):
    from large_scale_hypertextual_search_engine_spark.operators.facets import (
        stats_facet,
    )

    r = stats_facet(
        nf_index, ["zzz_not_a_term"],
        corpus.select("docid", "n_chars"), "n_chars",
    ).collect()[0]
    assert r["n_docs"] == 0 and r["min"] is None and r["std"] is None


def test_cardinality_exact_and_approx(spark, corpus, nf_index):
    from large_scale_hypertextual_search_engine_spark.operators.facets import (
        cardinality_facet,
    )

    vals = _match_vals(corpus, ["spark", "join"])
    exact = cardinality_facet(
        nf_index, ["spark", "join"],
        corpus.select("docid", "n_chars"), "n_chars",
    ).collect()[0]["n_distinct"]
    assert exact == len(set(vals)) > 0
    approx = cardinality_facet(
        nf_index, ["spark", "join"],
        corpus.select("docid", "n_chars"), "n_chars", approx=True,
    ).collect()[0]["n_distinct"]
    assert abs(approx - exact) <= max(3, 0.15 * exact)


def test_percentiles_bruteforce(spark, corpus, nf_index):
    import numpy as np

    from large_scale_hypertextual_search_engine_spark.operators.facets import (
        percentiles_facet,
    )

    vals = sorted(_match_vals(corpus, ["spark", "join"]))
    got = {
        r["p"]: r["value"]
        for r in percentiles_facet(
            nf_index, ["spark", "join"],
            corpus.select("docid", "n_chars"), "n_chars",
            percentiles=[0.0, 0.5, 0.9, 1.0],
        ).collect()
    }
    for p in (0.0, 0.5, 0.9, 1.0):
        want = float(np.percentile(vals, p * 100, method="linear"))
        assert got[p] == pytest.approx(want, rel=1e-9), p
    with pytest.raises(ValueError):
        percentiles_facet(
            nf_index, ["spark"], corpus.select("docid", "n_chars"),
            "n_chars", percentiles=[1.5],
        )
