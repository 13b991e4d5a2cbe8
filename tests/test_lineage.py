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
