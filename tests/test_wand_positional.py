"""Two-phase positional retrieval: rank/score/count identity with the
exact phrase/proximity DataFrame paths, multi-shard, deletes, and the
decoded-bytes reduction that is the whole point of the plan."""

import numpy as np
import pytest

from large_scale_hypertextual_search_engine_spark.operators.index_build import (
    build_index,
)
from large_scale_hypertextual_search_engine_spark.operators.phrase import (
    phrase_search,
    proximity_search,
)
from large_scale_hypertextual_search_engine_spark.operators.wand import (
    wand_phrase_search,
    wand_positional_kernel,
    wand_proximity_search,
)


@pytest.fixture(scope="module")
def idx(spark):
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).selectExpr("cast(doc_id as string) as docid", "text as content")
    # small blocks: long posting lists span many blocks -> skipping real
    idx = build_index(
        docs, mode="simple", stem=False, salt_buckets=2, block_size=16
    )
    for k in (
        "doc_stats", "postings", "lexicon", "docid_map", "collection_stats",
    ):
        idx[k] = idx[k].cache()
        idx[k].count()
    return idx


PHRASES = [
    ["the", "spark"],
    ["spark", "join"],
    ["the", "the"],           # repeated term
    ["merge", "sort", "the"],
    ["spark", "nonexistentterm"],  # empty AND
]


@pytest.mark.parametrize("phrase", PHRASES)
@pytest.mark.parametrize("tf_mode", ["true", "compat"])
@pytest.mark.parametrize("n_shards", [1, 4])
def test_wand_phrase_matches_exact(spark, idx, phrase, tf_mode, n_shards):
    exact = (
        phrase_search(idx, phrase, top_k=10, tf_mode=tf_mode)
        .orderBy("rank")
        .collect()
    )
    got = (
        wand_phrase_search(
            idx, phrase, top_k=10, tf_mode=tf_mode, n_shards=n_shards
        )
        .orderBy("rank")
        .collect()
    )
    assert [(r["docid"], r["n_occurrences"]) for r in got] == [
        (r["docid"], r["n_occurrences"]) for r in exact
    ]
    for g, e in zip(got, exact):
        # same ascending fold, but JVM Column vs Python-float operand
        # rounding differs in the last ulp (as in test_wand.py)
        assert g["score"] == pytest.approx(e["score"], rel=1e-12)


PROX = [
    ("spark", "join", 3, False),
    ("spark", "join", 3, True),
    ("the", "spark", 1, False),
    ("merge", "sort", 8, True),
]


@pytest.mark.parametrize("a,b,slop,ordered", PROX)
@pytest.mark.parametrize("n_shards", [1, 4])
def test_wand_proximity_matches_exact(spark, idx, a, b, slop, ordered, n_shards):
    exact = (
        proximity_search(idx, a, b, slop, ordered=ordered, top_k=10)
        .orderBy("rank")
        .collect()
    )
    got = (
        wand_proximity_search(
            idx, a, b, slop, ordered=ordered, top_k=10, n_shards=n_shards
        )
        .orderBy("rank")
        .collect()
    )
    assert [(r["docid"], r["min_dist"]) for r in got] == [
        (r["docid"], r["min_dist"]) for r in exact
    ]
    for g, e in zip(got, exact):
        assert g["score"] == pytest.approx(e["score"], rel=1e-12)


def test_wand_phrase_respects_deletes(spark, idx, tmp_path):
    """Deleting the rank-1 doc hides it; remaining ranks re-pack."""
    before = wand_phrase_search(idx, ["the", "spark"], top_k=5).collect()
    assert before
    victim = before[0]
    idx2 = dict(idx)
    idx2["tombstones"] = spark.createDataFrame(
        [(victim["doc_int"], victim["docid"])], "doc_int long, docid string"
    )
    after = wand_phrase_search(idx2, ["the", "spark"], top_k=5).collect()
    assert victim["docid"] not in {r["docid"] for r in after}
    assert [r["docid"] for r in after][: len(before) - 1] == [
        r["docid"] for r in before[1:]
    ]


def _local_rows(idx, terms):
    rows = (
        idx["postings"].filter(idx["postings"]["term"].isin(terms)).collect()
    )
    n_docs = int(idx["collection_stats"].collect()[0]["n_docs"])
    avg_dl = float(idx["collection_stats"].collect()[0]["avg_dl"])
    term_rows = {}
    total_bytes = 0
    for r in rows:
        idf = float(
            np.log((n_docs - r["df"] + 0.5) / (r["df"] + 0.5) + 1.0)
        )
        bl = [
            (d["last_docid"], d["max_tf"], d["min_dl"], d["offset"], d["bytes"])
            for d in r["blocks"]
        ]
        term_rows[r["term"]] = (idf, bytes(r["postings"]), bl, 0)
        total_bytes += len(r["postings"])
    dl = np.zeros(n_docs + 1)
    for r in idx["doc_stats"].collect():
        dl[r["doc_int"]] = r["doc_len"]
    return term_rows, dl, n_docs, avg_dl, total_bytes


def test_kernel_skips_hot_term_blocks(spark, idx):
    """The point of two-phase retrieval: a phrase of (hot, rarer) terms
    must NOT decode the hot term's full posting list — block-max
    skipping plus AND alignment leaves whole blocks undecoded, and
    positions are only materialized for aligned (verified) docs."""
    term_rows, dl, n_docs, avg_dl, total_bytes = _local_rows(
        idx, ["the", "spark"]
    )
    stats = {}
    res = wand_positional_kernel(
        term_rows, ["spark", "the"], None, dl, n_docs, avg_dl, 5,
        doc_lo=0, doc_hi=None, stats=stats,
    )
    # correctness of the local run vs the distributed one
    dist = wand_phrase_search(idx, ["spark", "the"], top_k=5).collect()
    assert [(d, x) for d, _, x in res] == [
        (r["doc_int"], r["n_occurrences"]) for r in dist
    ]
    assert stats["bytes_decoded"] < total_bytes, stats
    # verification touched only aligned docs, far fewer than df("the")
    df_the = int(
        idx["lexicon"].filter(idx["lexicon"]["term"] == "the").collect()[0]["df"]
    )
    assert stats["verified_docs"] < df_the, (stats, df_the)


def test_kernel_validates_inputs(spark, idx):
    with pytest.raises(ValueError, match="empty phrase"):
        wand_phrase_search(idx, [])
    with pytest.raises(ValueError, match="must differ"):
        wand_proximity_search(idx, "a", "a", 2)
    with pytest.raises(ValueError, match="slop"):
        wand_proximity_search(idx, "a", "b", 0)
