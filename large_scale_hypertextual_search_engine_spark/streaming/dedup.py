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


def _run_key(checkpoint_dir: str) -> str:
    """Stable identity of one logical stream run: batch ids are only
    unique within a checkpoint lineage, so the idempotent per-batch
    partition is keyed (run=<hash of checkpoint>, batch_id=N) — a
    driver restart resuming the same checkpoint overwrites its own
    partition (retry-idempotent), while a NEW run with a new
    checkpoint appends alongside prior runs' output."""
    import hashlib

    return hashlib.md5(checkpoint_dir.encode("utf-8")).hexdigest()[:12]


def dedup_stream(
    docs_stream: DataFrame,
    out_dir: str,
    seen_dir: str,
    checkpoint_dir: str,
    hash_col: str | None = None,
    trigger_available_now: bool = True,
):
    """Emit each distinct content exactly once across ALL batches and
    runs: survivors land under ``out_dir`` (docid, content,
    content_sha) and their hashes under ``seen_dir``, one
    ``run=<checkpoint-hash>/batch_id=N`` partition per micro-batch
    written with OVERWRITE so
    a retried batch rewrites its own output instead of re-appending it
    (idempotent sink; with a replayable source + checkpoint this makes
    the exactly-once claim hold under failure, not just on the happy
    path). ``hash_col`` names a precomputed hash column; default
    recomputes sha256(content).
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
        # only the MISSING-path case means "no seen set yet"; a corrupt
        # footer or a transient FS error must fail the batch loudly
        # instead of silently disabling dedup for it (ADVICE r5)
        jpath = spark._jvm.org.apache.hadoop.fs.Path(seen_dir)
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
        seen = (
            spark.read.parquet(seen_dir).select("content_sha")
            if fs.exists(jpath)
            else None
        )
        if seen is not None:
            hashed = hashed.join(seen, "content_sha", "left_anti")
        kept = hashed.select("docid", "content", "content_sha").cache()
        if kept.take(1):
            # per-batch overwrite makes the sink idempotent under
            # micro-batch RETRY (ADVICE r5): a replayed batch rewrites
            # its own batch_id=N directory instead of re-appending the
            # same survivors. Structured Streaming replays a batch id
            # with the same data (replayable source + checkpoint), so
            # exactly-once of the OUTPUT holds; readers of out_dir see
            # batch_id as an extra partition column.
            sub = f"run={_run_key(checkpoint_dir)}/batch_id={int(batch_id)}"
            kept.write.mode("overwrite").parquet(f"{out_dir}/{sub}")
            kept.select("content_sha").write.mode("overwrite").parquet(
                f"{seen_dir}/{sub}"
            )
        kept.unpersist()

    writer = docs_stream.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()
