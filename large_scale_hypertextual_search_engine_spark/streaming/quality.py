"""Streaming corpus quality filter: the CCNet cut, online.

The deployment shape of LM quality filtering (Wenzek et al. 2020):
the model and its keep-threshold are trained OFFLINE on a reference
corpus (``train_bigram_lm`` + the quantile from ``select_by_quality``,
both persisted via ``save_lm``); the crawl stream is then filtered
ONLINE against that fixed threshold — never re-thresholded per batch,
or the filter's meaning would drift with batch composition.

Plan shape: ``foreachBatch`` (the same pattern as the incremental
indexer) — each micro-batch runs the exact batch scorer
(``score_docs_lm``: one bigram-keyed stream-static join + the groupBy
it clustered, all codegen) and appends survivors to the output table.
Stream == batch by construction, pytest-asserted: filtering N files
as a stream equals filtering their union in one batch with the same
threshold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["filter_stream_by_quality"]


def filter_stream_by_quality(
    docs_stream: DataFrame,
    lm: dict[str, DataFrame],
    threshold: float,
    out_dir: str,
    checkpoint_dir: str,
    k: float = 1.0,
    trigger_available_now: bool = True,
):
    """Filter a (docid, content) stream: docs with bigram-LM
    avg_logprob >= ``threshold`` append to ``out_dir`` as parquet
    (docid, content, n_bigrams, avg_logprob); unscorable (< 2-token)
    docs drop. Returns the streaming query (run-to-completion with
    AvailableNow by default)."""
    from ..operators.lm import score_docs_lm

    thr = float(threshold)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        scored = score_docs_lm(batch_df, lm, k=k)
        kept = (
            batch_df.join(scored, "docid")
            .filter(
                F.col("avg_logprob").isNotNull()
                & (F.col("avg_logprob") >= F.lit(thr))
            )
            .select("docid", "content", "n_bigrams", "avg_logprob")
        )
        # per-batch overwrite: a retried micro-batch rewrites its own
        # batch_id=N partition instead of re-appending survivors
        # (idempotent sink, ADVICE r5; same pattern as dedup_stream)
        from .dedup import _run_key

        kept.write.mode("overwrite").parquet(
            f"{out_dir}/run={_run_key(checkpoint_dir)}"
            f"/batch_id={int(batch_id)}"
        )

    writer = docs_stream.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()
