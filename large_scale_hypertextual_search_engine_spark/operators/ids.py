"""Scalable dense ID assignment.

The reference mints sequential 1-based IDs with an in-memory hash map
(docids: indexer4.cpp:70-82; wordIDs: indexer4.cpp:242-249,329-331) —
nondeterministic at >1 block (quirk Q7). We define the deterministic
order (sort by key) and mint IDs with the scalable two-pass pattern:

  range-partition by key -> per-partition counts (tiny collect) ->
  per-partition row_number + broadcast offset.

This avoids the single-partition global window that
``row_number() over (order by key)`` would compile to, so it holds at
10^12 rows: the only wide exchange is one range shuffle, and the window
runs per-partition in parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# caches still pinned from prior assign_dense_ids calls, oldest first.
# Bounded: re-entry releases the oldest when the window is full, so a
# long-running stream (one call per micro-batch) or a session doing
# repeated builds can't accumulate pinned datasets. A small window (not
# unpersist-on-reentry) keeps the previous build's cache alive while
# its lazy consumers may still be executing.
_LIVE_CACHES: list[DataFrame] = []
_MAX_LIVE = 4


def release_id_caches() -> None:
    """Explicitly unpersist every cache minted by assign_dense_ids —
    call once the downstream consumers have materialized (e.g. after a
    stage write)."""
    while _LIVE_CACHES:
        _LIVE_CACHES.pop().unpersist()


def assign_dense_ids(
    df: DataFrame,
    key_col: str,
    id_col: str = "id",
    start: int = 1,
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``id_col``: dense sequential ids (start..start+n-1) ordered by
    ``key_col``. Keys must be unique for full determinism.

    Note: range-partition boundaries come from deterministic sampling of
    the same input in both the count pass and the main pass, so the two
    jobs agree; callers doing heavy downstream work should checkpoint
    the result once (plans.lineage.checkpoint_stage).
    """
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    parted = (
        df.repartitionByRange(num_partitions, F.col(key_col))
        .sortWithinPartitions(key_col)
        .withColumn("__pid", F.spark_partition_id())
    )
    # the count pass below materializes `parted`; without persistence every
    # downstream consumer would redo the range shuffle (and its sampling
    # job) — on a cluster this would be a checkpoint instead
    parted = parted.persist()
    while len(_LIVE_CACHES) >= _MAX_LIVE:
        _LIVE_CACHES.pop(0).unpersist()
    _LIVE_CACHES.append(parted)
    counts = {r["__pid"]: r["count"] for r in parted.groupBy("__pid").count().collect()}
    offsets: list = []
    acc = start
    for pid in sorted(counts):
        offsets.extend([F.lit(pid), F.lit(acc)])
        acc += counts[pid]
    offset_map = F.create_map(*offsets) if offsets else F.create_map()
    w = Window.partitionBy("__pid").orderBy(key_col)
    return (
        parted.withColumn(
            id_col,
            (F.row_number().over(w) - 1 + offset_map[F.col("__pid")]).cast("long"),
        )
        .drop("__pid")
    )
