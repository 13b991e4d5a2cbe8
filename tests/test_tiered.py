"""Tiered retrieval (operators/tiered.py).

Both tiered_search branches must be bit-identical to the exact
federated query over all tiers; the MaxScore certificate must trigger
on a prior-correlated corpus and fall back on an adversarial one.
"""

import pytest
from pyspark.sql import functions as F

from large_scale_hypertextual_search_engine_spark.operators.index_build import (
    build_index,
)
from large_scale_hypertextual_search_engine_spark.operators.federated import (
    search_federated,
)
from large_scale_hypertextual_search_engine_spark.operators.tiered import (
    build_tiered,
    tier_upper_bound,
    tiered_search,
)


def _mkdocs(spark, rows):
    return spark.createDataFrame(rows, "docid string, content string, prior double")


@pytest.fixture(scope="module")
def good_tiers(spark):
    """Prior correlates with relevance: tier-1 docs dominate 'hot'."""
    rows = []
    for i in range(10):  # strong docs: hot x 40, short
        rows.append((f"top{i:02d}", "hot " * 40 + "pad " * 5, 100.0 + i))
    for i in range(40):  # weak docs: one hot in a long doc
        rows.append((f"low{i:02d}", "hot " + "filler " * 120, float(i)))
    docs = _mkdocs(spark, rows)
    tiers = build_tiered(
        docs, "prior", frac=0.2, mode="simple", stem=False, salt_buckets=2
    )
    return docs, tiers


def test_split_is_top_frac_by_prior(spark, good_tiers):
    docs, tiers = good_tiers
    t1_ids = {r["docid"] for r in tiers[0]["docid_map"].collect()}
    assert t1_ids == {f"top{i:02d}" for i in range(10)}
    assert tiers[1]["docid_map"].count() == 40


def test_certificate_short_circuits_and_matches_exact(spark, good_tiers):
    docs, tiers = good_tiers
    res, info = tiered_search(tiers, ["hot"], top_k=5, mode="or")
    assert info["tiers_queried"] == 1
    assert info["certificate"] == "kth >= max lower-tier bound"
    exact = search_federated(tiers, ["hot"], top_k=5, mode="or")
    got = [(r["rank"], r["docid"], r["score"]) for r in res.collect()]
    want = sorted(
        (r["rank"], r["docid"], r["score"]) for r in exact.collect()
    )
    assert sorted(got) == want  # bit-identical scores incl. global idf


def test_fallback_is_exact_when_tier1_cannot_answer(spark):
    """Adversarial prior: the best 'hot' docs live in tier 2."""
    rows = []
    for i in range(5):  # tier-1 by prior, but barely relevant
        rows.append((f"top{i}", "hot " + "filler " * 100, 100.0 + i))
    for i in range(20):  # low prior, highly relevant
        rows.append((f"low{i:02d}", "hot " * 30 + "pad " * 3, float(i)))
    docs = _mkdocs(spark, rows)
    tiers = build_tiered(
        docs, "prior", frac=0.2, mode="simple", stem=False, salt_buckets=2
    )
    res, info = tiered_search(tiers, ["hot"], top_k=5, mode="or")
    assert info["tiers_queried"] == 2
    exact = search_federated(tiers, ["hot"], top_k=5, mode="or")
    assert sorted(map(tuple, res.collect())) == sorted(
        map(tuple, exact.collect())
    )
    # the winners are tier-2 docs — tier 1 alone would have been wrong
    assert all(r["docid"].startswith("low") for r in res.collect())


def test_underfilled_tier1_falls_back(spark, good_tiers):
    docs, tiers = good_tiers
    # 'filler' appears only in tier-2 docs: tier 1 has zero hits
    res, info = tiered_search(tiers, ["filler"], top_k=5, mode="or")
    assert info["tiers_queried"] == 2
    exact = search_federated(tiers, ["filler"], top_k=5, mode="or")
    assert sorted(map(tuple, res.collect())) == sorted(
        map(tuple, exact.collect())
    )


def test_lower_tier_without_terms_short_circuits(spark, good_tiers):
    docs, tiers = good_tiers
    # 'pad' lives only in tier-1 docs
    res, info = tiered_search(tiers, ["pad"], top_k=5, mode="or")
    assert info["tiers_queried"] == 1
    assert "no query term" in info["certificate"]
    exact = search_federated(tiers, ["pad"], top_k=5, mode="or")
    assert sorted(map(tuple, res.collect())) == sorted(
        map(tuple, exact.collect())
    )


def test_upper_bound_is_sound(spark, good_tiers):
    """No tier-2 doc's true score may exceed the metadata bound."""
    docs, tiers = good_tiers
    n_docs = sum(t["docid_map"].count() for t in tiers)
    dl_sum = sum(
        t["doc_stats"].agg(F.sum("doc_len")).collect()[0][0] for t in tiers
    )
    df_global = {"hot": 50}
    ub = tier_upper_bound(
        tiers[1], ["hot"], df_global, n_docs, dl_sum / n_docs
    )
    # exact scores of tier-2 docs under global stats: query all tiers
    # unbounded and keep tier-2 docs
    exact = search_federated(tiers, ["hot"], top_k=1000, mode="or")
    t2_scores = [
        r["score"] for r in exact.collect() if r["docid"].startswith("low")
    ]
    assert t2_scores and max(t2_scores) <= ub + 1e-12


def test_tiered_matches_merged_single_index(spark, good_tiers):
    """Global-stat discipline: tiered results equal one flat index."""
    docs, tiers = good_tiers
    flat = build_index(
        docs.select("docid", "content"), mode="simple", stem=False,
        salt_buckets=2,
    )
    from large_scale_hypertextual_search_engine_spark.operators.query import (
        search,
    )

    flat_res = {
        r["docid"]: r["score"]
        for r in search(flat, ["hot"], top_k=5, mode="or").collect()
    }
    res, _ = tiered_search(tiers, ["hot"], top_k=5, mode="or")
    got = {r["docid"]: r["score"] for r in res.collect()}
    assert got == flat_res  # same docs, bit-identical scores
