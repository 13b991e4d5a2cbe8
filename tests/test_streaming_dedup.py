"""Streaming exact dedup: cross-batch suppression, restart-durable
seen set, stream == batch distinct set, deterministic canonical."""

from pyspark.sql import functions as F

from large_scale_hypertextual_search_engine_spark.streaming.dedup import (
    dedup_stream,
)


def _mk_stream(spark, src):
    return (
        spark.readStream.schema("docid string, content string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )


def test_stream_dedup_matches_batch_distinct(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    seen = str(tmp_path / "seen")
    ck = str(tmp_path / "ck")
    base = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .selectExpr("cast(doc_id as string) as docid", "text as content")
        .limit(40)
    )
    # duplicate every doc under a larger docid so batches overlap
    dups = base.select(
        F.concat(F.lit("z_dup_"), "docid").alias("docid"), "content"
    )
    base.union(dups).repartition(4).write.parquet(src)

    dedup_stream(_mk_stream(spark, src), out, seen, ck)

    got = spark.read.parquet(out).collect()
    contents = [r["content"] for r in got]
    assert len(contents) == len(set(contents)) == base.select("content").distinct().count()
    # first-seen-wins with deterministic within-batch canonical: the
    # original docid (sorts before z_dup_*) must be the survivor
    # whenever both copies arrived in the same batch; across batches
    # first-seen wins — either way NO content appears twice and every
    # content appears once
    shas = spark.read.parquet(seen).collect()
    assert len(shas) == len(contents)


def test_seen_set_survives_restart(spark, tmp_path):
    out = str(tmp_path / "out")
    seen = str(tmp_path / "seen")
    docs1 = spark.createDataFrame(
        [("a", "same text"), ("b", "other text")],
        "docid string, content string",
    )
    src1 = str(tmp_path / "s1")
    docs1.write.parquet(src1)
    dedup_stream(_mk_stream(spark, src1), out, seen, str(tmp_path / "ck1"))

    # a NEW run (new checkpoint) re-sends one duplicate + one new doc
    docs2 = spark.createDataFrame(
        [("c", "same text"), ("d", "brand new")],
        "docid string, content string",
    )
    src2 = str(tmp_path / "s2")
    docs2.write.parquet(src2)
    dedup_stream(_mk_stream(spark, src2), out, seen, str(tmp_path / "ck2"))

    rows = {r["docid"]: r["content"] for r in spark.read.parquet(out).collect()}
    assert set(rows) == {"a", "b", "d"}  # "c" suppressed across runs
