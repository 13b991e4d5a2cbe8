"""Streaming LM quality filter: stream == batch keep set, fixed
offline threshold, unscorable docs drop, saved-model path."""

from pyspark.sql import functions as F

from large_scale_hypertextual_search_engine_spark.operators.lm import (
    load_lm,
    save_lm,
    score_docs_lm,
    train_bigram_lm,
)
from large_scale_hypertextual_search_engine_spark.streaming.quality import (
    filter_stream_by_quality,
)


def test_stream_filter_matches_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .selectExpr("cast(doc_id as string) as docid", "text as content")
        .limit(90)
    )
    # one zero-token doc rides along: must be dropped, not kept or crash
    docs = docs.union(
        spark.createDataFrame([("zt", "")], "docid string, content string")
    )
    docs.repartition(3).write.parquet(src)

    # offline: train + persist the model, derive a fixed threshold
    lm = train_bigram_lm(docs)
    save_lm(lm, str(tmp_path / "lm"))
    lm2 = load_lm(spark, str(tmp_path / "lm"))
    scores = [
        r["avg_logprob"]
        for r in score_docs_lm(docs, lm2).collect()
        if r["avg_logprob"] is not None
    ]
    thr = sorted(scores)[len(scores) // 2]  # an actual score: ties exist

    stream = (
        spark.readStream.schema("docid string, content string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    filter_stream_by_quality(stream, lm2, thr, out, ck)

    got = {
        r["docid"]: r["avg_logprob"]
        for r in spark.read.parquet(out).collect()
    }
    want = {
        r["docid"]: r["avg_logprob"]
        for r in score_docs_lm(docs, lm2).collect()
        if r["avg_logprob"] is not None and r["avg_logprob"] >= thr
    }
    assert got == want and got
    assert "zt" not in got
    # output carries the original content
    row = spark.read.parquet(out).limit(1).collect()[0]
    assert row["content"] and row["n_bigrams"] >= 1
