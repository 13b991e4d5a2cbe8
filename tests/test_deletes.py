"""Document deletion: tombstones hide docs from EVERY query path with
global (pre-compaction) stats; compaction produces an index whose
query results match a fresh build over the surviving corpus."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from large_scale_hypertextual_search_engine_spark.operators.deletes import (
    compact_index,
    delete_docs,
)
from large_scale_hypertextual_search_engine_spark.operators.query import (
    search,
)
from large_scale_hypertextual_search_engine_spark.plans.lineage import (
    build_and_save_index,
    load_index,
)

N_DOCS = 200


@pytest.fixture(scope="module")
def docs(spark):
    return (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .selectExpr("cast(doc_id as string) as docid", "text as content")
        .limit(N_DOCS)
        .cache()
    )


@pytest.fixture(scope="module")
def deleted_index(spark, docs, tmp_path_factory):
    """An on-disk index with docid % 7 == 0 tombstoned. Returns
    (index_dict, index_dir, deleted_docids set)."""
    out = str(tmp_path_factory.mktemp("delidx"))
    build_and_save_index(docs, out, "deletes-test", mode="simple", stem=False)
    dead = [
        r["docid"] for r in docs.collect() if int(r["docid"]) % 7 == 0
    ]
    n = delete_docs(spark, out, dead)
    assert n == len(dead) > 0
    return load_index(spark, out), out, set(dead)


def _rows(df):
    return sorted(
        (r["rank"], r["docid"], round(r["score"], 9)) for r in df.collect()
    )


def _rerank(rows, dead, k=10):
    """Expected post-delete top-k from the PRE-delete full result set:
    per-doc scores are independent of membership (global stats), so
    deleting = drop dead docs, re-rank by (score desc, doc_int asc)."""
    live = [r for r in rows if r["docid"] not in dead]
    live.sort(key=lambda r: (-r["score"], r["doc_int"]))
    return sorted(
        (i + 1, r["docid"], round(r["score"], 9))
        for i, r in enumerate(live[:k])
    )


def test_tombstones_loaded(deleted_index):
    idx, _, dead = deleted_index
    assert "tombstones" in idx
    got = {r["docid"] for r in idx["tombstones"].collect()}
    assert got == dead


def test_delete_docs_idempotent_and_unknown(spark, deleted_index):
    _, out, dead = deleted_index
    assert delete_docs(spark, out, sorted(dead)[:3]) == 0  # already dead
    assert delete_docs(spark, out, ["zzz-not-a-doc"]) == 0  # unknown id


def test_exact_search_hides_deleted(spark, docs, deleted_index, tmp_path_factory):
    idx, _, dead = deleted_index
    # pre-delete full result set from a tombstone-free index
    clean = str(tmp_path_factory.mktemp("cleanidx"))
    build_and_save_index(docs, clean, "deletes-clean", mode="simple", stem=False)
    cidx = load_index(spark, clean)
    for terms, mode in [(["join"], "and"), (["join", "spark"], "and"), (["join", "spark"], "or")]:
        full = search(cidx, terms, top_k=10**6, mode=mode).collect()
        want = _rerank(full, dead)
        got = _rows(search(idx, terms, top_k=10, mode=mode))
        assert got == want, (terms, mode)
        assert not {d for _, d, _ in got} & dead


def test_wand_hides_deleted(spark, deleted_index):
    from large_scale_hypertextual_search_engine_spark.operators.wand import (
        wand_search, wand_search_batch,
    )

    idx, _, dead = deleted_index
    full = search(idx, ["join", "spark"], top_k=10**6, mode="or").collect()
    # idx already filters tombstones -> want == its own top-10
    want = sorted(
        (r["rank"], r["docid"], round(r["score"], 9)) for r in full[:]
        if r["rank"] <= 10
    )
    got = _rows(wand_search(idx, ["join", "spark"], top_k=10, n_shards=3))
    assert got == want
    assert not {d for _, d, _ in got} & dead
    batch = wand_search_batch(idx, {7: ["join", "spark"]}, top_k=10, n_shards=3)
    got_b = sorted(
        (r["rank"], r["docid"], round(r["score"], 9)) for r in batch.collect()
    )
    assert got_b == want


def test_positional_and_boolean_hide_deleted(spark, deleted_index):
    from large_scale_hypertextual_search_engine_spark.operators.boolsearch import (
        boolean_search,
    )
    from large_scale_hypertextual_search_engine_spark.operators.phrase import (
        phrase_search, proximity_search,
    )

    idx, _, dead = deleted_index
    for df in (
        phrase_search(idx, ["join", "column"], top_k=10**6),
        proximity_search(idx, "join", "spark", slop=3, top_k=10**6),
        boolean_search(idx, '"join column" OR (join NEAR/3 spark)', top_k=10**6),
    ):
        got = {r["docid"] for r in df.collect()}
        assert got, "vacuous"
        assert not got & dead


def test_serving_matches_spark_with_deletes(spark, deleted_index):
    from large_scale_hypertextual_search_engine_spark.operators.serving import (
        SearchServer,
    )

    idx, _, dead = deleted_index
    srv = SearchServer(idx)
    expect = _rows(search(idx, ["join", "spark"], top_k=10, mode="or"))
    got = sorted(
        (r["rank"], r["docid"], round(r["score"], 9))
        for r in srv.search(["join", "spark"], top_k=10, mode="or")
    )
    assert got == expect
    exp_b = sorted(
        (r["rank"], r["docid"], round(r["score"], 9))
        for r in boolean_collect(idx)
    )
    got_b = sorted(
        (r["rank"], r["docid"], round(r["score"], 9))
        for r in srv.search_boolean("join AND NOT zzzz OR spark", top_k=10)
    )
    assert got_b == exp_b
    assert not {d for _, d, _ in got} & dead


def boolean_collect(idx):
    from large_scale_hypertextual_search_engine_spark.operators.boolsearch import (
        boolean_search,
    )

    return boolean_search(idx, "join AND NOT zzzz OR spark", top_k=10).collect()


def test_compact_matches_fresh_build(spark, docs, deleted_index, tmp_path_factory):
    idx, out, dead = deleted_index
    comp_dir = str(tmp_path_factory.mktemp("compidx"))
    cidx = compact_index(spark, out, comp_dir)
    assert "tombstones" not in cidx

    fresh_dir = str(tmp_path_factory.mktemp("freshidx"))
    live_docs = docs.filter(~F.col("docid").isin(list(dead)))
    build_and_save_index(
        live_docs, fresh_dir, "deletes-fresh", mode="simple", stem=False
    )
    fidx = load_index(spark, fresh_dir)

    # identical collection stats
    c = cidx["collection_stats"].collect()[0]
    f = fidx["collection_stats"].collect()[0]
    assert c["n_docs"] == f["n_docs"]
    assert c["avg_dl"] == pytest.approx(f["avg_dl"], rel=1e-12)

    # identical lexicon df/tf per term (term_ids may differ: compaction
    # keeps stable ids, the fresh build re-mints)
    cl = {(r["term"], r["df"], r["tf"]) for r in cidx["lexicon"].collect()}
    fl = {(r["term"], r["df"], r["tf"]) for r in fidx["lexicon"].collect()}
    assert cl == fl

    # identical query results: (rank, docid, score) — doc_int may
    # differ (stable sparse vs re-minted dense) but relative order is
    # preserved, so tiebreaks agree
    from large_scale_hypertextual_search_engine_spark.operators.wand import (
        wand_search,
    )

    for terms, mode in [(["join", "spark"], "or"), (["join", "spark"], "and")]:
        assert _rows(search(cidx, terms, top_k=10, mode=mode)) == _rows(
            search(fidx, terms, top_k=10, mode=mode)
        ), (terms, mode)
    assert _rows(wand_search(cidx, ["join", "spark"], top_k=10, n_shards=2)) == _rows(
        wand_search(fidx, ["join", "spark"], top_k=10, n_shards=2)
    )


def test_compact_blob_roundtrip(spark, deleted_index, tmp_path_factory):
    """Every compacted blob decodes to the original postings minus the
    deleted docs — docids, tfs AND positions."""
    from large_scale_hypertextual_search_engine_spark.functions.varbyte import (
        decode_postings,
    )

    idx, out, dead = deleted_index
    comp_dir = str(tmp_path_factory.mktemp("compblob"))
    cidx = compact_index(spark, out, comp_dir)
    dead_ints = np.sort(
        np.array(
            [
                r["doc_int"]
                for r in idx["docid_map"]
                .filter(F.col("docid").isin(list(dead)))
                .collect()
            ],
            dtype=np.int64,
        )
    )
    orig = {
        r["term"]: bytes(r["postings"])
        for r in idx["postings"].select("term", "postings").collect()
    }
    comp = {
        r["term"]: bytes(r["postings"]) for r in cidx["postings"].collect()
    }
    assert set(comp) <= set(orig)
    checked = 0
    for term, blob in list(orig.items())[:300]:
        d0, t0, p0 = decode_postings(blob)
        keep = ~np.isin(d0, dead_ints)
        if not keep.any():
            assert term not in comp
            continue
        d1, t1, p1 = decode_postings(comp[term])
        np.testing.assert_array_equal(d1, d0[keep])
        np.testing.assert_array_equal(t1, t0[keep])
        np.testing.assert_array_equal(p1, p0[np.repeat(keep, t0)])
        checked += 1
    # the sf0.001 synthetic vocabulary is ~31 terms; require that a
    # solid majority had live docs and round-tripped
    assert checked >= 20


def test_compact_fully_deleted_index(spark, docs, tmp_path_factory):
    """Deleting every document and compacting yields a valid, EMPTY
    index: zero stats (not NULL), no postings, queries return empty."""
    out = str(tmp_path_factory.mktemp("alldel"))
    comp = str(tmp_path_factory.mktemp("alldelc"))
    build_and_save_index(docs, out, "all-deleted", mode="simple", stem=False)
    all_ids = [r["docid"] for r in docs.collect()]
    assert delete_docs(spark, out, all_ids) == len(all_ids)
    cidx = compact_index(spark, out, comp)
    row = cidx["collection_stats"].collect()[0]
    assert row["n_docs"] == 0 and row["avg_dl"] == 0.0
    assert cidx["postings"].count() == 0
    assert search(cidx, ["join"], top_k=5).count() == 0


def test_compact_strategies_byte_identical(spark, tmp_path):
    """r4 VERDICT #10: the cogroup (tombstones >> memory) compaction and
    the closure (small-delete) compaction must produce byte-identical
    postings bodies on fuzzed delete sets — plus identical df/tf,
    decoded content, sibling tables, and query results."""
    import random

    from large_scale_hypertextual_search_engine_spark.functions.varbyte import (
        decode_postings,
    )
    from large_scale_hypertextual_search_engine_spark.operators.deletes import (
        compact_index,
        delete_docs,
    )
    from large_scale_hypertextual_search_engine_spark.operators.query import (
        search,
    )
    from large_scale_hypertextual_search_engine_spark.plans.lineage import (
        build_and_save_index,
    )

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .selectExpr("cast(doc_id as string) as docid", "text as content")
        .limit(200)
    )
    rng = random.Random(99)
    all_ids = [r["docid"] for r in docs.select("docid").collect()]
    for trial, frac in enumerate((0.03, 0.35, 0.9)):
        base = str(tmp_path / f"base{trial}")
        build_and_save_index(
            docs, base, f"cmp{trial}", mode="simple", stem=False
        )
        victims = rng.sample(all_ids, int(len(all_ids) * frac))
        assert delete_docs(spark, base, victims) == len(victims)
        a = compact_index(
            spark, base, str(tmp_path / f"a{trial}"), strategy="closure"
        )
        b = compact_index(
            spark, base, str(tmp_path / f"b{trial}"), strategy="cogroup",
            docs_per_shard=64,  # force multi-shard slicing + run merge
        )
        rows_a = {
            r["term"]: r for r in a["postings"].collect()
        }
        rows_b = {
            r["term"]: r for r in b["postings"].collect()
        }
        assert set(rows_a) == set(rows_b), frac
        for t in rows_a:
            ra, rb = rows_a[t], rows_b[t]
            assert (ra["df"], ra["tf"]) == (rb["df"], rb["tf"]), t
            assert bytes(ra["postings"]) == bytes(rb["postings"]), t
            # blocks may partition differently (slice-local boundaries);
            # both must decode to the same content through their own
            # metadata
            import numpy as np

            for r in (ra, rb):
                offs = np.array(
                    [x["offset"] for x in r["blocks"]], dtype=np.int64
                )
                d_, t_, p_ = decode_postings(bytes(r["postings"]), offs)
                assert d_.size == r["df"], t
            assert (ra["bucket_id"] == rb["bucket_id"])
        for tbl in ("docid_map", "doc_stats", "collection_stats"):
            assert sorted(map(tuple, a[tbl].collect())) == sorted(
                map(tuple, b[tbl].collect())
            ), tbl
        qa = search(a, ["the"], top_k=20).collect()
        qb = search(b, ["the"], top_k=20).collect()
        assert [(r["rank"], r["docid"], r["score"]) for r in qa] == [
            (r["rank"], r["docid"], r["score"]) for r in qb
        ]
