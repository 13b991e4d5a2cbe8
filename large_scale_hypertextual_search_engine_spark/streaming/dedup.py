"""Streaming exact deduplication: first-seen wins across micro-batches.

The online complement of ``operators.dedup.dedup_exact``: a crawl
stream where re-fetches and mirrors repeat content must emit each
distinct document ONCE, across batch boundaries — a doc seen in
batch 0 must suppress its copy in batch 7. Spark's stateful
``dropDuplicates`` handles within-run state, but the state dies with
the query; a nightly re-run would re-emit everything. This filter
instead keeps its seen-set as a TABLE (the same artifact discipline
as the index): each micro-batch left-anti-joins the persisted seen
hashes, dedupes within itself (first by docid — deterministic), and
appends both the survivors and their hashes.

At 100 TB the seen-set is a hash table partitioned like any fact
table; the anti-join is stream-static per batch and AQE sizes it.
The content hash is sha256 — the same integrity hash the pipeline
already carries, so a pre-hashed column can be passed to skip the
recompute.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["dedup_stream"]


def dedup_stream(
    docs_stream: DataFrame,
    out_dir: str,
    seen_dir: str,
    checkpoint_dir: str,
    hash_col: str | None = None,
    trigger_available_now: bool = True,
):
    """Emit each distinct content exactly once across ALL batches and
    runs: survivors append to ``out_dir`` (docid, content,
    content_sha), their hashes to ``seen_dir``. ``hash_col`` names a
    precomputed hash column; default recomputes sha256(content).
    First-seen wins; within a batch, the lexicographically smallest
    docid of a duplicate group is the canonical copy."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        spark = batch_df.sparkSession
        hashed = batch_df.withColumn(
            "content_sha",
            F.col(hash_col) if hash_col else F.sha2(F.col("content"), 256),
        )
        # within-batch: keep the smallest docid per hash (deterministic)
        w = Window.partitionBy("content_sha").orderBy("docid")
        hashed = (
            hashed.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        try:
            seen = spark.read.parquet(seen_dir).select("content_sha")
        except Exception:
            seen = None
        if seen is not None:
            hashed = hashed.join(seen, "content_sha", "left_anti")
        kept = hashed.select("docid", "content", "content_sha").cache()
        if kept.take(1):
            kept.write.mode("append").parquet(out_dir)
            kept.select("content_sha").write.mode("append").parquet(seen_dir)
        kept.unpersist()

    writer = docs_stream.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()
