"""PageRank: parity with a numpy power-iteration mirror (incl. dangling
mass), convergence/tol behavior, and boosted-retrieval semantics."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from large_scale_hypertextual_search_engine_spark.operators.linkrank import (
    pagerank,
    search_boosted,
)


def _np_pagerank(edges, n_iter=10, d=0.85):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    pos = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    deg = np.zeros(n)
    for u, _ in set(edges):
        deg[pos[u]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        dm = r[deg == 0].sum()
        c = np.zeros(n)
        for u, v in set(edges):
            c[pos[v]] += r[pos[u]] / deg[pos[u]]
        r = (1 - d) / n + d * (c + dm / n)
    return {v: r[pos[v]] for v in nodes}


EDGES = [
    (1, 2), (2, 3), (3, 1),          # cycle
    (4, 1), (4, 2), (4, 3),          # hub out
    (5, 4),                          # chain into hub
    (6, 1),                          # 6 dangling? no: 6 has out-edge
    (7, 6),                          # 6 gets in-link; 1,2,3 cycle
    # 8 is dangling (in-link only)
    (1, 8),
]


@pytest.fixture(scope="module")
def edges_df(spark):
    return spark.createDataFrame(EDGES, "src long, dst long").cache()


def test_pagerank_matches_numpy_mirror(spark, edges_df):
    got = {r["id"]: r["rank"] for r in pagerank(edges_df, n_iter=12).collect()}
    want = _np_pagerank(EDGES, n_iter=12)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-12), k


def test_pagerank_mass_conserved(spark, edges_df):
    ranks = pagerank(edges_df, n_iter=8).collect()
    assert sum(r["rank"] for r in ranks) == pytest.approx(1.0, abs=1e-12)
    assert all(r["rank"] > 0 for r in ranks)


def test_pagerank_cycle_is_uniform(spark):
    e = spark.createDataFrame([(1, 2), (2, 3), (3, 1)], "src long, dst long")
    ranks = pagerank(e, n_iter=5).collect()
    for r in ranks:
        assert r["rank"] == pytest.approx(1 / 3, rel=1e-12)


def test_pagerank_tol_early_exit_matches(spark, edges_df):
    # a generous tol stops early but must still be a valid iterate:
    # compare against the numpy mirror run to the same (smaller) count
    full = {r["id"]: r["rank"] for r in pagerank(edges_df, n_iter=50, tol=1e-12).collect()}
    ref = _np_pagerank(EDGES, n_iter=50)
    for k in ref:
        assert full[k] == pytest.approx(ref[k], rel=1e-9), k


def test_pagerank_duplicate_edges_count_once(spark):
    e1 = spark.createDataFrame([(1, 2), (1, 2), (2, 1)], "src long, dst long")
    e2 = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    r1 = {r["id"]: r["rank"] for r in pagerank(e1, n_iter=4).collect()}
    r2 = {r["id"]: r["rank"] for r in pagerank(e2, n_iter=4).collect()}
    assert r1 == r2


@pytest.fixture(scope="module")
def small_index(spark):
    from large_scale_hypertextual_search_engine_spark.operators.index_build import (
        build_index,
    )

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .selectExpr("cast(doc_id as string) as docid", "text as content")
        .limit(150)
    )
    return build_index(docs, mode="simple", stem=False, salt_buckets=2)


def test_search_boosted_zero_weight_is_plain_bm25(spark, small_index):
    from large_scale_hypertextual_search_engine_spark.operators.query import (
        search,
    )

    boosts = spark.createDataFrame([(1, 99.0)], "doc_int long, boost double")
    got = [
        (r["rank"], r["docid"], r["score"])
        for r in search_boosted(
            small_index, ["join", "spark"], boosts, top_k=10, weight=0.0
        ).collect()
    ]
    want = [
        (r["rank"], r["docid"], r["score"])
        for r in search(small_index, ["join", "spark"], top_k=10).collect()
    ]
    assert sorted(got) == sorted(want)


def test_search_boosted_reranks_full_match_set(spark, small_index):
    """A huge boost on the WORST bm25 match must lift it to rank 1 —
    proving the boost applies to the full match set, not the bm25
    top-k cut."""
    from large_scale_hypertextual_search_engine_spark.operators.query import (
        search,
    )

    allhits = search(small_index, ["join", "spark"], top_k=10**6).collect()
    assert len(allhits) > 10
    worst = max(allhits, key=lambda r: r["rank"])
    boosts = spark.createDataFrame(
        [(worst["doc_int"], 1000.0)], "doc_int long, boost double"
    )
    got = search_boosted(
        small_index, ["join", "spark"], boosts, top_k=5, weight=1.0
    ).collect()
    assert got[0]["docid"] == worst["docid"]
    assert got[0]["score"] == pytest.approx(worst["score"] * 1001.0, rel=1e-12)
    assert got[0]["bm25"] == pytest.approx(worst["score"], rel=1e-12)


def test_search_boosted_accepts_docid_boosts(spark, small_index):
    dm = small_index["docid_map"].limit(1).collect()[0]
    by_docid = spark.createDataFrame(
        [(dm["docid"], 2.0)], "docid string, boost double"
    )
    by_int = spark.createDataFrame(
        [(dm["doc_int"], 2.0)], "doc_int long, boost double"
    )
    a = search_boosted(small_index, ["join"], by_docid, top_k=10).collect()
    b = search_boosted(small_index, ["join"], by_int, top_k=10).collect()
    assert [(r["rank"], r["docid"], r["score"]) for r in a] == [
        (r["rank"], r["docid"], r["score"]) for r in b
    ]


def test_pagerank_boost_integration(spark, small_index, edges_df):
    """PageRank output plugs straight into search_boosted."""
    ranks = pagerank(edges_df, n_iter=5).withColumnRenamed("rank", "boost")
    res = search_boosted(
        small_index, ["join"], ranks.select(F.col("id").alias("doc_int"), "boost"),
        top_k=5, weight=10.0,
    ).collect()
    assert len(res) == 5
    assert all(r["score"] >= r["bm25"] for r in res)


# ------------------------------------------------------------------ HITS


def _np_hits(edges, n_iter=6):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    pos = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    h = np.ones(n)
    a = np.zeros(n)
    es = sorted(set(edges))
    for _ in range(n_iter):
        a = np.zeros(n)
        for u, v in es:
            a[pos[v]] += h[pos[u]]
        an = np.sqrt((a * a).sum())
        if an > 0:
            a = a / an
        h = np.zeros(n)
        for u, v in es:
            h[pos[u]] += a[pos[v]]
        hn = np.sqrt((h * h).sum())
        if hn > 0:
            h = h / hn
    return {v: (a[pos[v]], h[pos[v]]) for v in nodes}


def test_hits_matches_numpy_mirror(spark, edges_df):
    from large_scale_hypertextual_search_engine_spark.operators.linkrank import hits

    got = {
        r["id"]: (r["authority"], r["hub"])
        for r in hits(edges_df, n_iter=6).collect()
    }
    want = _np_hits(EDGES, n_iter=6)
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == pytest.approx(want[k][0], rel=1e-12, abs=1e-15), k
        assert got[k][1] == pytest.approx(want[k][1], rel=1e-12, abs=1e-15), k


def test_hits_l2_normalized(spark, edges_df):
    from large_scale_hypertextual_search_engine_spark.operators.linkrank import hits

    rows = hits(edges_df, n_iter=4).collect()
    assert sum(r["authority"] ** 2 for r in rows) == pytest.approx(1.0, rel=1e-12)
    assert sum(r["hub"] ** 2 for r in rows) == pytest.approx(1.0, rel=1e-12)


def test_hits_star_graph(spark):
    """Star u->{v1..v4}: u is the pure hub (authority 0), leaves are
    equal pure authorities (hub 0)."""
    from large_scale_hypertextual_search_engine_spark.operators.linkrank import hits

    df = spark.createDataFrame(
        [(0, i) for i in range(1, 5)], "src long, dst long"
    )
    got = {r["id"]: (r["authority"], r["hub"]) for r in hits(df, n_iter=3).collect()}
    assert got[0] == (0.0, pytest.approx(1.0))
    for i in range(1, 5):
        assert got[i][0] == pytest.approx(0.5)
        assert got[i][1] == 0.0


def test_hits_duplicate_edges_count_once(spark):
    from large_scale_hypertextual_search_engine_spark.operators.linkrank import hits

    a = spark.createDataFrame(EDGES, "src long, dst long")
    b = spark.createDataFrame(EDGES + EDGES, "src long, dst long")
    ra = sorted(map(tuple, hits(a, n_iter=3).collect()))
    rb = sorted(map(tuple, hits(b, n_iter=3).collect()))
    assert ra == rb


def test_hits_empty_graph(spark):
    from large_scale_hypertextual_search_engine_spark.operators.linkrank import hits

    df = spark.createDataFrame([], "src long, dst long")
    assert hits(df, n_iter=2).collect() == []
