"""Structured Streaming incremental indexer: stream == batch semantics."""

import pytest
from pyspark.sql import functions as F

from large_scale_hypertextual_search_engine_spark.operators.index_build import (
    build_index,
)
from large_scale_hypertextual_search_engine_spark.streaming.incremental import (
    delta_index,
    index_stream,
)


def test_incremental_stream_matches_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .selectExpr("cast(doc_id as string) as docid", "text as content")
        .limit(60)
    )
    # write the corpus as 3 files -> micro-batches pick them up
    docs.repartition(3).write.parquet(src)

    stream = (
        spark.readStream.schema("docid string, content string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = index_stream(stream, out, ck, mode="simple", stem=False)
    q.awaitTermination(120)

    streamed = delta_index(spark, out)
    batch = build_index(docs, mode="simple", stem=False, salt_buckets=1)

    s_stats = {
        r["term"]: (r["df"], r["tf"]) for r in streamed["postings"].collect()
    }
    b_stats = {r["term"]: (r["df"], r["tf"]) for r in batch["postings"].collect()}
    assert s_stats == b_stats
    assert streamed["docid_map"].count() == 60
    # per-doc postings sets match after mapping internal->orig ids
    from large_scale_hypertextual_search_engine_spark.functions.varbyte import (
        decode_postings,
    )

    def perdoc(idx):
        m = {r["doc_int"]: r["docid"] for r in idx["docid_map"].collect()}
        out = {}
        for r in idx["postings"].collect():
            d, t, p = decode_postings(bytes(r["postings"]))
            k = 0
            ps = {}
            for di, tf in zip(d, t):
                ps[m[int(di)]] = [int(x) for x in p[k : k + tf]]
                k += tf
            out[r["term"]] = ps
        return out

    assert perdoc(streamed) == perdoc(batch)
