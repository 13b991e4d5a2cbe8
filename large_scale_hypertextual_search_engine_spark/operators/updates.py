"""Document upsert: the re-crawl / re-ingest workflow.

Lucene's update model, Spark-shaped: an upsert batch tombstones every
existing copy of its docids across ALL current segments, then becomes
a brand-new immutable delta segment. Serving queries the segment list
through ``search_federated`` (tombstones hide stale copies per
segment), so the new content is visible the moment the delta build
lands — no rewrite of the base index. Physical consolidation stays a
separate, deliberately offline step (``merge_indexes`` /
``compact_index``), exactly like Lucene's merge policy.

Collection-statistics semantics are the Lucene ones the delete path
already documents: tombstoned docs stop MATCHING immediately, but
global stats (n_docs, df, avg_dl) keep counting them until a
compaction — scores drift within the documented envelope rather than
paying a stats rebuild per batch.

Invariant kept: each docid is LIVE in at most one segment (every
older copy is tombstoned in its segment), so the federated
disjoint-corpora assumption holds for the live sets.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession, functions as F

__all__ = ["upsert_docs"]


def upsert_docs(
    spark: SparkSession,
    segment_dirs: list[str],
    delta_dir: str,
    docs: DataFrame,
    id_col: str = "docid",
    text_col: str = "content",
    fingerprint: str | None = None,
    **build_kw,
) -> dict:
    """Tombstone ``docs``' ids in every segment of ``segment_dirs``,
    build+save the batch as a new segment at ``delta_dir``, and return
    accounting: {"segments": new dir list, "tombstoned": per-dir
    counts, "upserted": batch size}.

    ``docs``: (id_col, text_col) — the CURRENT content of each doc;
    ids may be brand new (insert), existing (update), or repeated
    across calls (the newest segment wins because every older copy is
    tombstoned). Query the returned ``segments`` list with
    ``search_federated`` (or merge them physically when convenient).
    """
    from ..plans.lineage import build_and_save_index
    from .deletes import delete_docs

    ids = docs.select(F.col(id_col).cast("string").alias("docid")).distinct()
    tombstoned = {
        d: delete_docs(spark, d, ids) for d in segment_dirs
    }
    fp = fingerprint or f"upsert:{delta_dir}:{int(time.time())}"
    build_and_save_index(
        docs.select(
            F.col(id_col).cast("string").alias("docid"),
            F.col(text_col).alias("content"),
        ),
        delta_dir,
        fp,
        **build_kw,
    )
    return {
        "segments": list(segment_dirs) + [delta_dir],
        "tombstoned": tombstoned,
        "upserted": docs.count(),
    }
