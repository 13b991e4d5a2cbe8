"""Incremental index maintenance via Structured Streaming.

The reference is batch-only (README.md:241-249); this is our extension
(SURVEY.md §2.9): new documents arrive on a stream, each micro-batch is
tokenized and encoded into *delta posting runs* (same run format as the
salted two-phase merge), appended to a ``postings_delta`` table. A
periodic ``compact`` merges base + delta runs per term with the same
``merge_runs`` byte-surgery used by the skew path — so the streaming
path reuses the batch machinery instead of duplicating it.

Doc IDs for streamed docs are minted per batch above the current max
(contiguous within a batch; global density is restored at compaction).
Query-time: ``postings_with_deltas`` unions base and delta runs — the
decode path already handles multi-run terms.
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.index_build import RUNS_DDL, _encode_arrow_batches

# on-disk delta_runs layout version. v2 = packed int64[n,5] blocks_bin
# binary column (v1 carried an array<struct> 'blocks' column). compact()
# refuses directories written by a different version with a clear error
# instead of an unresolved-column AnalysisException mid-plan.
DELTA_FORMAT_VERSION = 2


def _marker_path(d: str) -> Path:
    return Path(d) / "_delta_format.json"


def _write_format_marker(d: str) -> None:
    p = _marker_path(d)
    if not p.exists():
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(json.dumps({"delta_runs_version": DELTA_FORMAT_VERSION}))


def _check_format(d: str, runs: DataFrame) -> None:
    p = _marker_path(d)
    version = None
    if p.exists():
        try:
            version = json.loads(p.read_text()).get("delta_runs_version")
        except (OSError, json.JSONDecodeError):
            version = None
    if version is None:  # pre-marker directory: sniff the schema
        version = 2 if "blocks_bin" in runs.columns else 1
    if version != DELTA_FORMAT_VERSION:
        raise ValueError(
            f"delta_runs at {d} uses on-disk format v{version}, this engine "
            f"writes/reads v{DELTA_FORMAT_VERSION}; re-ingest the stream or "
            "repack the old delta (decode 'blocks' structs -> blocks_bin)"
        )


def _encode_batch_runs(tokens: DataFrame, batch_id: int) -> DataFrame:
    """Encode one micro-batch into posting runs (salt = batch_id) with
    the same Arrow kernel as the batch build — a run per (term, batch)."""
    has_dl = "doc_len" in tokens.columns
    salted = tokens.select(
        "term",
        F.lit(int(batch_id)).cast("int").alias("salt"),
        F.struct(
            F.col("doc_int"),
            F.col("positions"),
            (F.col("doc_len") if has_dl else F.lit(0)).cast("int").alias("doc_len"),
        ).alias("p"),
    )
    grouped = salted.groupBy("term", "salt").agg(
        F.sort_array(F.collect_list("p")).alias("pl")
    )
    return grouped.mapInArrow(_encode_arrow_batches(128), RUNS_DDL)


def index_stream(
    docs_stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    *,
    mode: str = "simple",
    stem: bool = False,
    trigger_available_now: bool = True,
):
    """Start (or run-to-completion with AvailableNow) the incremental
    indexer. ``docs_stream`` must have (docid, content)."""
    from ..operators.index_build import _tokenize_keep_int

    d = out_dir.rstrip("/")

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if not batch_df.take(1):
            return
        try:
            base_max = (
                spark.read.parquet(f"{d}/delta_docid_map")
                .agg(F.max("doc_int"))
                .collect()[0][0]
                or 0
            )
        except Exception:
            base_max = 0
        from ..operators.ids import assign_dense_ids

        ids = assign_dense_ids(
            batch_df.select("docid", "content"), "docid", "doc_int",
            start=base_max + 1,
        )
        ids.select("docid", "doc_int").withColumn(
            "batch_id", F.lit(batch_id)
        ).write.mode("append").parquet(f"{d}/delta_docid_map")
        tokens = _tokenize_keep_int(
            ids, "content", "docid", mode, stem, None, False
        ).filter(F.col("term").isNotNull())
        tokens.select(
            "docid", "doc_int", "doc_len"
        ).distinct().withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(f"{d}/delta_doc_stats")
        _encode_batch_runs(
            tokens.select("term", "doc_int", "positions", "doc_len"), batch_id
        ).write.mode("append").parquet(f"{d}/delta_runs")
        _write_format_marker(d)
        # every write above has materialized; drop the id-minting cache
        # so a long-running stream doesn't pin one dataset per batch
        from ..operators.ids import release_id_caches

        release_id_caches()

    writer = (
        docs_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def compact(spark: SparkSession, out_dir: str) -> DataFrame:
    """Merge all delta runs into final per-term posting lists."""
    from ..operators.index_build import POSTINGS_SCHEMA, _merge_batches

    d = out_dir.rstrip("/")
    runs = spark.read.parquet(f"{d}/delta_runs")
    _check_format(d, runs)
    return (
        runs.groupBy("term")
        .agg(
            F.collect_list(
                F.struct(
                    "first_docid", "last_docid", "df", "tf", "body", "blocks_bin"
                )
            ).alias("runs")
        )
        .mapInPandas(_merge_batches, POSTINGS_SCHEMA)
    )


def delta_index(spark: SparkSession, out_dir: str) -> dict[str, DataFrame]:
    """Assemble a queryable index view over the streamed deltas.

    Tombstones written by ``deletes.delete_docs`` against the delta dir
    are carried into the view, so delete -> stream-append -> compact
    keeps the doc hidden on every query path — the same per-segment
    semantics ``search_federated`` applies and ``merge_indexes`` carries
    forward (merge_index.py offset carry). As with batch indexes,
    collection stats stay GLOBAL until a physical compaction
    (``deletes.compact_index``) rewrites the postings.
    """
    from ..operators.deletes import load_tombstones

    d = out_dir.rstrip("/")
    postings = compact(spark, out_dir)
    doc_stats = spark.read.parquet(f"{d}/delta_doc_stats").select(
        "docid", "doc_int", "doc_len"
    )
    docid_map = spark.read.parquet(f"{d}/delta_docid_map").select("docid", "doc_int")
    n_docs = docid_map.count()
    collection_stats = doc_stats.agg(
        F.lit(n_docs).cast("long").alias("n_docs"),
        (F.sum("doc_len") / F.lit(n_docs)).alias("avg_dl"),
    )
    out = {
        "postings": postings,
        "doc_stats": doc_stats,
        "docid_map": docid_map,
        "collection_stats": collection_stats,
    }
    ts = load_tombstones(spark, d)
    if ts is not None:
        out["tombstones"] = ts
    return out
