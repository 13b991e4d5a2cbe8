"""Block-Max WAND rank-identity with the exact DataFrame scorer."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from large_scale_hypertextual_search_engine_spark.operators.index_build import (
    build_index,
)
from large_scale_hypertextual_search_engine_spark.operators.query import search
from large_scale_hypertextual_search_engine_spark.operators.wand import (
    wand_search,
    wand_topk_kernel,
)


@pytest.fixture(scope="module")
def idx(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").selectExpr(
        "cast(doc_id as string) as docid", "text as content"
    )
    # small blocks -> long lists span many blocks -> skipping is exercised
    idx = build_index(docs, mode="simple", stem=False, salt_buckets=2, block_size=16)
    for k in ("doc_stats", "postings", "lexicon", "docid_map", "collection_stats"):
        idx[k] = idx[k].cache()
        idx[k].count()
    return idx


QUERIES = [
    ["spark"],
    ["the"],
    ["spark", "join"],
    ["spark", "join", "window"],
    ["merge", "sort", "hash", "scan"],
    ["spark", "nonexistentterm"],
]


@pytest.mark.parametrize("terms", QUERIES)
@pytest.mark.parametrize("tf_mode", ["true", "compat"])
@pytest.mark.parametrize("n_shards", [1, 4])
def test_wand_matches_exact(spark, idx, terms, tf_mode, n_shards):
    """Rank-identity exact vs WAND, single-shard and multi-shard (500
    docs / 4 shards = 125-doc ranges vs 16-doc blocks -> straddling
    blocks and cross-shard merge are exercised)."""
    exact = (
        search(idx, terms, top_k=10, mode="or", tf_mode=tf_mode)
        .orderBy("rank")
        .collect()
    )
    got = (
        wand_search(idx, terms, top_k=10, tf_mode=tf_mode, n_shards=n_shards)
        .orderBy("rank")
        .collect()
    )
    assert [r["docid"] for r in got] == [r["docid"] for r in exact]
    for g, e in zip(got, exact):
        assert g["score"] == pytest.approx(e["score"], rel=1e-9)


def test_wand_kernel_skips_blocks():
    """The kernel must not decode blocks it can prove irrelevant: a rare
    high-idf term confines the top-k; the common term's blocks outside
    the intersection get skipped (observable via decode counting)."""
    from large_scale_hypertextual_search_engine_spark.functions.varbyte import (
        encode_postings,
    )
    import large_scale_hypertextual_search_engine_spark.operators.wand as wand_mod

    n = 20000
    common_docs = np.arange(1, n + 1)
    common_tfs = np.ones(n, dtype=np.int64)
    blob_c, blocks_c = encode_postings(
        common_docs, common_tfs, common_docs, block_size=64,
        doc_lens=np.full(n, 100),
    )
    rare_docs = np.array([5, 19_999])
    blob_r, blocks_r = encode_postings(
        rare_docs, np.array([5, 5]), np.arange(1, 11), block_size=64,
        doc_lens=np.full(2, 100),
    )
    doc_len = np.full(n + 1, 100.0)

    decodes = {"n": 0}
    orig = wand_mod._TermCursor._decode_block

    def counting(self, bi):
        decodes["n"] += 1
        return orig(self, bi)

    wand_mod._TermCursor._decode_block = counting
    try:
        idf_c = float(np.log((n - n + 0.5) / (n + 0.5) + 1.0))
        idf_r = float(np.log((n - 2 + 0.5) / (2 + 0.5) + 1.0))
        res = wand_topk_kernel(
            [(idf_c, blob_c, blocks_c), (idf_r, blob_r, blocks_r)],
            doc_len, n, 100.0, 2, tf_mode="true",
        )
    finally:
        wand_mod._TermCursor._decode_block = orig
    assert [d for d, _ in res] == [5, 19_999]
    # 20000/64 = 313 common blocks exist; skipping must avoid most
    assert decodes["n"] < 100, decodes["n"]


@pytest.mark.parametrize("n_shards", [1, 4])
def test_wand_batch_matches_exact(spark, idx, n_shards):
    """wand_search_batch: every query's ranking equals the exact OR path."""
    from large_scale_hypertextual_search_engine_spark.operators.wand import (
        wand_search_batch,
    )

    qts = {i: terms for i, terms in enumerate(QUERIES)}
    got = wand_search_batch(idx, qts, top_k=10, n_shards=n_shards).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["docid"], r["score"]))
    for qid, terms in qts.items():
        exact = (
            search(idx, terms, top_k=10, mode="or", tf_mode="true")
            .orderBy("rank")
            .collect()
        )
        mine = sorted(by_q.get(qid, []))
        assert [d for _, d, _ in mine] == [r["docid"] for r in exact], terms
        for (_, _, s), e in zip(mine, exact):
            assert s == pytest.approx(e["score"], rel=1e-9)


@pytest.mark.parametrize("n_shards", [1, 3])
def test_wand_doc_filter_matches_exact(spark, idx, n_shards):
    """Filtered retrieval on the WAND path: rank-identical to the exact
    path with the same doc_filter (membership restricted, stats
    global), for doc_int- and docid-keyed filters."""
    flt_int = idx["docid_map"].filter(F.col("doc_int") % 3 == 0).select(
        "doc_int"
    )
    flt_docid = idx["docid_map"].filter(F.col("doc_int") % 3 == 0).select(
        "docid"
    )
    exact = (
        search(idx, ["spark", "join"], top_k=10, mode="or",
               doc_filter=flt_int)
        .orderBy("rank")
        .collect()
    )
    assert exact, "vacuous"
    for flt in (flt_int, flt_docid):
        got = (
            wand_search(idx, ["spark", "join"], top_k=10,
                        n_shards=n_shards, doc_filter=flt)
            .orderBy("rank")
            .collect()
        )
        assert [r["docid"] for r in got] == [r["docid"] for r in exact]
        for g, e in zip(got, exact):
            assert g["score"] == pytest.approx(e["score"], rel=1e-12)


def test_wand_batch_doc_filter_matches_single(spark, idx):
    from large_scale_hypertextual_search_engine_spark.operators.wand import (
        wand_search_batch,
    )

    flt = idx["docid_map"].filter(F.col("doc_int") % 2 == 1).select("doc_int")
    single = (
        wand_search(idx, ["merge", "sort"], top_k=10, n_shards=2,
                    doc_filter=flt)
        .orderBy("rank")
        .collect()
    )
    assert single, "vacuous"
    got = (
        wand_search_batch(idx, {3: ["merge", "sort"]}, top_k=10,
                          n_shards=2, doc_filter=flt)
        .orderBy("rank")
        .collect()
    )
    assert [(r["rank"], r["docid"], r["score"]) for r in got] == [
        (r["rank"], r["docid"], r["score"]) for r in single
    ]
