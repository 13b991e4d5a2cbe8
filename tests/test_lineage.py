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
