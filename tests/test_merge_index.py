"""Index merge: merged(A, B) answers queries identically to a fresh
build over A ∪ B (scores, memberships, df/tf); tombstones carry over;
docid collisions refuse."""

import pytest
from pyspark.sql import functions as F

from large_scale_hypertextual_search_engine_spark.operators.merge_index import (
    merge_indexes,
)
from large_scale_hypertextual_search_engine_spark.operators.query import search
from large_scale_hypertextual_search_engine_spark.plans.lineage import (
    build_and_save_index,
    load_index,
)


@pytest.fixture(scope="module")
def corpora(spark):
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .selectExpr("cast(doc_id as string) as docid", "text as content")
        .filter(F.col("docid").cast("long") < 200)
        .cache()
    )
    half_a = docs.filter(F.col("docid").cast("long") < 100)
    half_b = docs.filter(F.col("docid").cast("long") >= 100)
    return docs, half_a, half_b


@pytest.fixture(scope="module")
def merged_and_fresh(spark, corpora, tmp_path_factory):
    docs, half_a, half_b = corpora
    da = str(tmp_path_factory.mktemp("ma"))
    db = str(tmp_path_factory.mktemp("mb"))
    do = str(tmp_path_factory.mktemp("mo")) + "/merged"
    df_ = str(tmp_path_factory.mktemp("mf"))
    build_and_save_index(half_a, da, "merge-a", mode="simple", stem=False)
    build_and_save_index(half_b, db, "merge-b", mode="simple", stem=False)
    build_and_save_index(docs, df_, "merge-full", mode="simple", stem=False)
    merged = merge_indexes(spark, da, db, do)
    return merged, load_index(spark, df_), da, db


def _full_results(idx, terms, mode):
    return sorted(
        (r["docid"], round(r["score"], 9))
        for r in search(idx, terms, top_k=10**6, mode=mode).collect()
    )


def test_merged_stats_match_fresh(spark, merged_and_fresh):
    merged, fresh, _, _ = merged_and_fresh
    m = merged["collection_stats"].collect()[0]
    f = fresh["collection_stats"].collect()[0]
    assert m["n_docs"] == f["n_docs"]
    assert m["avg_dl"] == pytest.approx(f["avg_dl"], rel=1e-12)
    ml = {(r["term"], r["df"], r["tf"]) for r in merged["lexicon"].collect()}
    fl = {(r["term"], r["df"], r["tf"]) for r in fresh["lexicon"].collect()}
    assert ml == fl


def test_merged_doc_ints_dense(spark, merged_and_fresh):
    merged, _, _, _ = merged_and_fresh
    row = merged["docid_map"].agg(
        F.count("*").alias("n"), F.max("doc_int").alias("mx"),
        F.countDistinct("doc_int").alias("nd"),
    ).collect()[0]
    assert row["n"] == row["mx"] == row["nd"]


@pytest.mark.parametrize(
    "terms,mode",
    [(["join", "spark"], "and"), (["join", "spark"], "or"), (["merge"], "and")],
)
def test_merged_queries_match_fresh(spark, merged_and_fresh, terms, mode):
    merged, fresh, _, _ = merged_and_fresh
    got = _full_results(merged, terms, mode)
    want = _full_results(fresh, terms, mode)
    assert got == want
    assert got, (terms, mode)


def test_merged_wand_and_phrase_match_fresh(spark, merged_and_fresh):
    from large_scale_hypertextual_search_engine_spark.operators.phrase import (
        phrase_search,
    )
    from large_scale_hypertextual_search_engine_spark.operators.wand import (
        wand_search,
    )

    merged, fresh, _, _ = merged_and_fresh
    gm = sorted(
        round(r["score"], 9)
        for r in wand_search(merged, ["join", "spark"], top_k=10,
                             n_shards=2).collect()
    )
    gf = sorted(
        round(r["score"], 9)
        for r in wand_search(fresh, ["join", "spark"], top_k=10,
                             n_shards=2).collect()
    )
    assert gm == gf and len(gm) == 10
    pm = {
        (r["docid"], r["n_occurrences"])
        for r in phrase_search(merged, ["join", "column"], top_k=10**6).collect()
    }
    pf = {
        (r["docid"], r["n_occurrences"])
        for r in phrase_search(fresh, ["join", "column"], top_k=10**6).collect()
    }
    assert pm == pf and pm  # positions survive the offset re-encode


def test_merge_rejects_docid_collision(spark, merged_and_fresh, tmp_path_factory):
    _, _, da, _ = merged_and_fresh
    out = str(tmp_path_factory.mktemp("mc")) + "/x"
    with pytest.raises(ValueError, match="both indexes"):
        merge_indexes(spark, da, da, out)


def test_merge_carries_tombstones(spark, corpora, tmp_path_factory):
    from large_scale_hypertextual_search_engine_spark.operators.deletes import (
        delete_docs,
    )

    _, half_a, half_b = corpora
    da = str(tmp_path_factory.mktemp("ta"))
    db = str(tmp_path_factory.mktemp("tb"))
    do = str(tmp_path_factory.mktemp("to")) + "/merged"
    build_and_save_index(half_a, da, "ts-a", mode="simple", stem=False)
    build_and_save_index(half_b, db, "ts-b", mode="simple", stem=False)
    dead_b = [r["docid"] for r in half_b.limit(5).collect()]
    assert delete_docs(spark, db, dead_b) == 5
    merged = merge_indexes(spark, da, db, do)
    assert "tombstones" in merged
    hidden = {r["docid"] for r in merged["tombstones"].collect()}
    assert hidden == set(dead_b)
    got = {
        r["docid"]
        for r in search(merged, ["join"], top_k=10**6, mode="and").collect()
    }
    assert got and not got & set(dead_b)


# ---------------------------------------------------------- federated


def test_federated_matches_merged(spark, merged_and_fresh):
    """Querying [A, B] unmerged must equal querying merge(A, B) —
    same offsets, same global stats, bit-equal scores."""
    from large_scale_hypertextual_search_engine_spark.operators.federated import (
        search_federated,
    )

    merged, _, da, db = merged_and_fresh
    ia, ib = load_index(spark, da), load_index(spark, db)
    for terms, mode in [(["join", "spark"], "and"), (["join", "spark"], "or")]:
        want = sorted(
            (r["rank"], r["doc_int"], r["docid"], r["score"])
            for r in search(merged, terms, top_k=10, mode=mode).collect()
        )
        got = sorted(
            (r["rank"], r["doc_int"], r["docid"], r["score"])
            for r in search_federated(
                [ia, ib], terms, top_k=10, mode=mode
            ).collect()
        )
        assert got == want, (terms, mode)
        assert len(got) == 10


def test_federated_single_index_is_plain_search(spark, merged_and_fresh):
    from large_scale_hypertextual_search_engine_spark.operators.federated import (
        search_federated,
    )

    _, fresh, _, _ = merged_and_fresh
    want = sorted(
        (r["rank"], r["docid"], r["score"])
        for r in search(fresh, ["merge"], top_k=10, mode="and").collect()
    )
    got = sorted(
        (r["rank"], r["docid"], r["score"])
        for r in search_federated([fresh], ["merge"], top_k=10,
                                  mode="and").collect()
    )
    assert got == want and got


def test_federated_respects_segment_tombstones(spark, corpora, tmp_path_factory):
    from large_scale_hypertextual_search_engine_spark.operators.deletes import (
        delete_docs,
    )
    from large_scale_hypertextual_search_engine_spark.operators.federated import (
        search_federated,
    )

    _, half_a, half_b = corpora
    da = str(tmp_path_factory.mktemp("fa"))
    db = str(tmp_path_factory.mktemp("fb"))
    build_and_save_index(half_a, da, "fed-a", mode="simple", stem=False)
    build_and_save_index(half_b, db, "fed-b", mode="simple", stem=False)
    dead = [r["docid"] for r in half_b.limit(4).collect()]
    assert delete_docs(spark, db, dead) == 4
    got = {
        r["docid"]
        for r in search_federated(
            [load_index(spark, da), load_index(spark, db)],
            ["join"], top_k=10**6, mode="and",
        ).collect()
    }
    assert got and not got & set(dead)
