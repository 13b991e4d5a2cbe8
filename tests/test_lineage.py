"""Checkpoint/resume + lineage: killed-and-rerun builds are stable."""

import json
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from large_scale_hypertextual_search_engine_spark.plans.lineage import (
    build_and_save_index,
    load_index,
    run_stage,
    stage_is_current,
)


def test_run_stage_resume(spark, tmp_path):
    calls = []

    def compute():
        calls.append(1)
        return spark.range(10).select(F.col("id"))

    p = str(tmp_path / "s1")
    a = run_stage(spark, "s1", p, "fp-1", compute)
    assert a.count() == 10 and len(calls) == 1
    b = run_stage(spark, "s1", p, "fp-1", compute)
    assert b.count() == 10 and len(calls) == 1  # resumed, not recomputed
    c = run_stage(spark, "s1", p, "fp-2", compute)
    assert c.count() == 10 and len(calls) == 2  # fingerprint change recomputes
    meta = json.loads((Path(p) / "_stage_meta.json").read_text())
    assert meta["rows"] == 10 and meta["committed"]


def test_build_and_save_index_resume_stable(spark, tmp_path):
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .selectExpr("cast(doc_id as string) as docid", "text as content")
        .limit(100)
    )
    d = str(tmp_path / "idx")
    idx1 = build_and_save_index(docs, d, "fp-a", mode="simple", stem=False, salt_buckets=2)
    post1 = {r["term"]: bytes(r["postings"]) for r in idx1["postings"].collect()}
    n_lex1 = idx1["lexicon"].count()
    # simulate a crash after completion of some stages: delete lexicon only
    import shutil

    shutil.rmtree(d + "/lexicon")
    idx2 = build_and_save_index(docs, d, "fp-a", mode="simple", stem=False, salt_buckets=2)
    post2 = {r["term"]: bytes(r["postings"]) for r in idx2["postings"].collect()}
    assert post1 == post2
    assert stage_is_current(d + "/postings", "fp-a")
    loaded = load_index(spark, d)
    assert loaded["lexicon"].count() == n_lex1
    # query over the persisted index works
    from large_scale_hypertextual_search_engine_spark.operators.query import search

    res = search(loaded, ["spark"], top_k=5).collect()
    assert len(res) == 5


def test_bucketed_postings_prune_and_match(spark, tmp_path):
    """Barrel parity: postings are written partitioned by
    crc32(term)%n_buckets; a term lookup scans ONLY the matching bucket
    directories, and results equal the unpruned scan."""
    from large_scale_hypertextual_search_engine_spark.operators.index_build import (
        term_bucket,
    )
    from large_scale_hypertextual_search_engine_spark.operators.query import (
        prune_buckets, search,
    )

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .selectExpr("cast(doc_id as string) as docid", "text as content")
        .limit(200)
    )
    d = str(tmp_path / "idx")
    build_and_save_index(docs, d, "fp-b", mode="simple", stem=False,
                         salt_buckets=2, n_buckets=8)
    idx = load_index(spark, d)
    assert idx["_n_buckets"] == 8
    assert any("bucket_id=" in f for f in idx["postings"].inputFiles())

    terms = ["spark", "join"]
    pruned = prune_buckets(idx, terms).filter(F.col("term").isin(terms))
    want_buckets = {term_bucket(t, 8) for t in terms}
    # the physical scan carries a partition filter on bucket_id (the
    # reader prunes whole directories before file listing)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert pf and "bucket_id" in pf[0], plan
    # and the pruned scan reads fewer files than the full relation
    full_files = len(idx["postings"].inputFiles())
    scan_files = pruned.withColumn(
        "f", F.input_file_name()
    ).select("f").distinct().count()
    assert 0 < scan_files < full_files
    # every file actually read lives in a wanted bucket directory
    read_dirs = {
        r["f"].split("bucket_id=")[1].split("/")[0]
        for r in pruned.withColumn("f", F.input_file_name())
        .select("f").distinct().collect()
    }
    assert read_dirs <= {str(b) for b in want_buckets}
    # and correctness is unchanged vs a term-only filter
    expect = {
        r["term"]: bytes(r["postings"])
        for r in idx["postings"].filter(F.col("term").isin(terms)).collect()
    }
    got = {r["term"]: bytes(r["postings"]) for r in pruned.collect()}
    assert got == expect and len(got) >= 1
    res = search(idx, terms, top_k=5).collect()
    assert len(res) == 5


def test_lexicon_bucket_matches_postings_both_builders(spark, tmp_path):
    """r2 finding: the persisted lexicon's bucket_id used xxhash64 while
    the postings dirs (and the driver-side pruning) use crc32 — the
    recorded barrel was wrong for most terms. Both builders must stamp
    the SAME crc32 family on lexicon and postings."""
    from large_scale_hypertextual_search_engine_spark.operators.index_build import (
        term_bucket,
    )
    from large_scale_hypertextual_search_engine_spark.plans.lineage import (
        build_and_save_index_from_tokens,
    )

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .selectExpr("cast(doc_id as string) as docid", "text as content")
        .limit(60)
    )
    idx = build_and_save_index(
        docs, str(tmp_path / "a"), "fp-b", mode="simple", stem=False, n_buckets=8
    )
    for built in (idx,):
        post = {r["term"]: r["bucket_id"] for r in built["postings"].collect()}
        lex = {r["term"]: r["bucket_id"] for r in built["lexicon"].collect()}
        assert set(post) == set(lex)
        assert post == lex
        for t, b in lex.items():
            assert b == term_bucket(t, 8), t

    # the pre-tokenized builder stamps the same family
    from large_scale_hypertextual_search_engine_spark.sources.cleaner import (
        cleaned_to_tokens,
    )
    from large_scale_hypertextual_search_engine_spark.sources.ingest import (
        read_cleaned_jsonl,
    )

    cleaned, _ = read_cleaned_jsonl(spark, "/root/reference/cleaner3.jsonl")
    idx2 = build_and_save_index_from_tokens(
        cleaned_to_tokens(cleaned), str(tmp_path / "b"), "fp-c", n_buckets=8
    )
    post2 = {r["term"]: r["bucket_id"] for r in idx2["postings"].collect()}
    lex2 = {r["term"]: r["bucket_id"] for r in idx2["lexicon"].collect()}
    assert post2 == lex2
    assert all(b == term_bucket(t, 8) for t, b in lex2.items())


def test_forward_index_stage_resume_and_metric(spark, tmp_path):
    """r2 missing #2: forward_index_ids joins the resumable stage graph
    (the reference ALWAYS writes forward_index.jsonl, indexer4.cpp:
    381-442), with the '[MISSING_TERM]' diagnostic recorded into
    metrics.jsonl (indexer4.cpp:413-419) instead of stderr."""
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .selectExpr("cast(doc_id as string) as docid", "text as content")
        .limit(40)
    )
    d = str(tmp_path / "fwd_idx")
    idx = build_and_save_index(
        docs, d, "fp-f", mode="simple", stem=False, with_forward_index=True
    )
    fwd = idx["forward_index_ids"]
    assert fwd.count() > 0
    # per-doc postings remap through the lexicon; freq == len(positions)
    row = fwd.filter(F.size("postings") > 0).first()
    assert all(p["freq"] == len(p["positions"]) for p in row["postings"])
    tids = [p["term_id"] for p in row["postings"]]
    assert tids == sorted(tids) and all(t is not None for t in tids)
    # metric recorded exactly once (lexicon is built from the same
    # tokens, so the count is 0 — the reference's happy path)
    lines = [
        json.loads(l)
        for l in (Path(d) / "metrics.jsonl").read_text().splitlines()
    ]
    missing = [l for l in lines if l["key"] == "missing_terms"]
    assert missing == [
        {"run_id": "fp-f", "stage": "forward_index_ids",
         "key": "missing_terms", "value": 0}
    ]
    meta1 = json.loads(
        (Path(d) / "forward_index_ids" / "_stage_meta.json").read_text()
    )
    # resume: stage skipped, metric NOT duplicated
    idx2 = build_and_save_index(
        docs, d, "fp-f", mode="simple", stem=False, with_forward_index=True
    )
    meta2 = json.loads(
        (Path(d) / "forward_index_ids" / "_stage_meta.json").read_text()
    )
    assert meta2["wall_ms"] == meta1["wall_ms"]
    lines2 = (Path(d) / "metrics.jsonl").read_text().splitlines()
    assert sum(1 for l in lines2 if "missing_terms" in l) == 1
    # load_index surfaces the persisted artifact
    loaded = load_index(spark, d)
    assert "forward_index_ids" in loaded
    assert loaded["forward_index_ids"].count() == fwd.count()
