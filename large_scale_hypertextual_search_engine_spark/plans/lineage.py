"""Checkpoint-resumable stages with lineage + metrics.

The reference's resume story is "files on disk per stage" (README.md:
25-41); ours is the same idea made safe: every stage writes a parquet
table plus a ``_stage_meta.json`` sidecar carrying the stage name, an
input fingerprint, row count and wall time. ``run_stage`` skips
recomputation when the recorded fingerprint matches — kill the job
after any stage and rerun: completed stages are not redone and outputs
are byte-stable (deterministic plans end-to-end).

On Iceberg deployments the sidecar maps to snapshot properties; the
parquet fallback keeps the identical interface in this sandbox.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


def _meta_path(path: str) -> Path:
    return Path(path) / "_stage_meta.json"


def stage_is_current(path: str, fingerprint: str) -> bool:
    mp = _meta_path(path)
    if not mp.exists():
        return False
    try:
        meta = json.loads(mp.read_text())
    except (OSError, json.JSONDecodeError):
        return False
    return meta.get("fingerprint") == fingerprint and meta.get("committed") is True


def run_stage(
    spark: SparkSession,
    name: str,
    path: str,
    fingerprint: str,
    compute: Callable[[], DataFrame],
    partition_by: list[str] | None = None,
    sort_by: list[str] | None = None,
    extra_meta: dict | None = None,
) -> DataFrame:
    """Compute-or-resume one stage. Returns the stage output DataFrame
    (always read back from storage so downstream plans cut lineage)."""
    if stage_is_current(path, fingerprint):
        spark.catalog.refreshByPath(path)
        return spark.read.parquet(path)
    t0 = time.time()
    df = compute()
    if sort_by:
        df = df.sortWithinPartitions(*sort_by)
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
    spark.catalog.refreshByPath(path)
    out = spark.read.parquet(path)
    rows = out.count()
    _meta_path(path).write_text(
        json.dumps(
            {
                "stage": name,
                "fingerprint": fingerprint,
                "rows": rows,
                "wall_ms": int((time.time() - t0) * 1000),
                "committed": True,
                **(extra_meta or {}),
            }
        )
    )
    return out


def stage_meta(path: str) -> dict:
    mp = _meta_path(path)
    if not mp.exists():
        return {}
    try:
        return json.loads(mp.read_text())
    except (OSError, json.JSONDecodeError):
        return {}


def record_metrics(base_dir: str, run_id: str, rows: list[dict]) -> None:
    """Append metrics rows (run_id, stage, key, value) as JSONL — the
    engine analog of Perfomance-monitor.hpp's save_stats (K8)."""
    p = Path(base_dir) / "metrics.jsonl"
    p.parent.mkdir(parents=True, exist_ok=True)
    with p.open("a") as f:
        for r in rows:
            f.write(json.dumps({"run_id": run_id, **r}) + "\n")


def build_and_save_index(
    docs: DataFrame,
    out_dir: str,
    fingerprint: str,
    *,
    mode: str = "compat",
    stem: bool = True,
    stopwords: frozenset[str] | None = None,
    salt_buckets: int | None = None,
    block_size: int = 128,
    n_buckets: int = 10,
    with_forward_index: bool = False,
    strategy: str = "salted",
) -> dict[str, DataFrame]:
    """Materialized, checkpoint-resumable index build.

    Stage graph (each independently resumable):
      1. docs_ids      (docid minting — the range shuffle)
      2. tokens        (narrow analyze; the expensive CPU stage)
      3. doc_stats / docid_map / collection_stats (cheap projections)
      4. postings      (the term shuffle + encode)
      5. lexicon       (term id minting; written sorted by term for
                        min/max file pruning — trie/barrel parity)
      6. forward_index_ids (flag-gated — the reference's fourth artifact,
                        forward_index.jsonl, indexer4.cpp:381-442; its
                        '[MISSING_TERM]' diagnostic is recorded into
                        metrics.jsonl instead of stderr)
    """
    from ..operators.ids import assign_dense_ids
    from ..operators.index_build import _tokenize_keep_int, build_postings
    from pyspark.sql import functions as F

    spark = docs.sparkSession
    d = out_dir.rstrip("/")

    if strategy == "fused":
        return _build_and_save_index_fused(
            spark, d, fingerprint, docs,
            mode=mode, stem=stem, stopwords=stopwords,
            block_size=block_size, n_buckets=n_buckets,
            with_forward_index=with_forward_index,
        )
    docs_ids = run_stage(
        spark,
        "docs_ids",
        f"{d}/docs_ids",
        fingerprint,
        lambda: assign_dense_ids(docs.select("docid", "content"), "docid", "doc_int"),
    )
    tokens_all = run_stage(
        spark,
        "tokens",
        f"{d}/tokens",
        fingerprint,
        lambda: _tokenize_keep_int(
            docs_ids, "content", "docid", mode, stem, stopwords, False
        ),
    )
    tokens = tokens_all.filter(F.col("term").isNotNull())
    docid_map = run_stage(
        spark, "docid_map", f"{d}/docid_map", fingerprint,
        lambda: docs_ids.select("docid", "doc_int"),
    )
    n_docs = docid_map.count()
    doc_stats = run_stage(
        spark, "doc_stats", f"{d}/doc_stats", fingerprint,
        lambda: tokens_all.select("docid", "doc_int", "doc_len").distinct(),
    )
    collection_stats = run_stage(
        spark, "collection_stats", f"{d}/collection_stats", fingerprint,
        lambda: doc_stats.agg(
            F.lit(n_docs).cast("long").alias("n_docs"),
            (F.sum("doc_len") / F.lit(n_docs)).alias("avg_dl"),
        ),
    )
    # barrel parity (Barrel-manager.hpp:16-43, SURVEY §4.3): postings
    # are directory-partitioned by crc32(term) mod n_buckets and term-
    # sorted within files, so a query's term filter prunes both
    # partition dirs (bucket predicate, computed driver-side) and files
    # (parquet term min/max stats) before any blob is read
    from ..operators.index_build import term_bucket_col

    postings = run_stage(
        spark, "postings", f"{d}/postings", fingerprint,
        lambda: build_postings(
            tokens.select("term", "doc_int", "positions", "doc_len"),
            n_docs,
            block_size=block_size,
            salt_buckets=salt_buckets,
            strategy=strategy,
        ).withColumn("bucket_id", term_bucket_col(n_buckets)),
        partition_by=["bucket_id"],
        sort_by=["term"],
        extra_meta={"n_buckets": n_buckets},
    )
    lexicon = run_stage(
        spark, "lexicon", f"{d}/lexicon", fingerprint,
        lambda: assign_dense_ids(
            postings.select("term", "df", "tf", F.length("postings").alias("bytes")),
            "term",
            "term_id",
        ).select(
            "term_id", "term", "df", "tf", "bytes",
            # same crc32 barrel family as the postings partitioning —
            # a lexicon-side bucket prune must agree with the dirs
            term_bucket_col(n_buckets),
        ),
        sort_by=["term"],
    )
    out = {
        "docid_map": docid_map,
        "doc_stats": doc_stats,
        "collection_stats": collection_stats,
        "postings": postings,
        "lexicon": lexicon,
        "terms_list": lexicon.select("term", "term_id"),
    }
    if with_forward_index:
        out["forward_index_ids"] = _forward_index_stage(
            spark, d, fingerprint, tokens, lexicon, id_cols=("docid", "doc_int")
        )
    # every stage is on disk now: release the id-minting caches so
    # repeated builds in one session don't pin storage (ADVICE r1)
    from ..operators.ids import release_id_caches

    release_id_caches()
    return out


def _build_and_save_index_fused(
    spark: SparkSession,
    d: str,
    fingerprint: str,
    docs: DataFrame,
    *,
    mode: str,
    stem: bool,
    stopwords: frozenset[str] | None,
    block_size: int,
    n_buckets: int,
    with_forward_index: bool,
) -> dict[str, DataFrame]:
    """Fused-strategy staged build: the cluster-scale stage graph.

    Replaces the ``tokens`` stage (an exploded positional token table
    LARGER than the input text, written once and re-read twice) with a
    single ``runs`` stage: one narrow analyze+SPIMI-encode Arrow pass
    over the corpus emitting a union table of compressed posting runs
    (kind=0, ~2-4 B/posting) and per-doc stats (kind=1), partitioned by
    ``kind`` so each consumer's scan prunes to its own files. The
    ``docs_ids`` content checkpoint is also skipped — a second full
    copy of the corpus written just to persist id minting; the fused
    graph feeds the analyze pass straight from the (persisted)
    range-shuffled id frame, whose partitions are perfectly contiguous
    ascending docid segments. At 100 TB this is the difference between
    writing the corpus TWICE more (docs_ids + tokens) and writing one
    intermediate smaller than the final postings. Resumability:
    ``runs`` + ``docid_map`` are the checkpoints; when both are
    current, id minting never re-runs (lazy holder below). Final
    artifacts are byte-identical to the spimi/salted strategies
    (tests/test_fused_build.py)."""
    from pyspark.sql import functions as F

    from ..operators.index_build import (
        RUNS_DDL,
        _fused_analyze_encode_partition,
        fused_runs_schema,
        merge_runs_to_postings,
        term_bucket_col,
    )
    from ..operators.ids import assign_dense_ids

    if with_forward_index:
        raise ValueError(
            "with_forward_index requires the token table; use "
            "strategy='spimi' or 'salted' (the fused build never "
            "materializes tokens)"
        )
    run_cols = [c.split()[0] for c in RUNS_DDL.split(", ")]

    _ids_cache: dict = {}

    def _ids() -> DataFrame:
        # lazy: when runs + docid_map are both resume-current, id
        # minting (a count pass + range shuffle) never executes
        if "df" not in _ids_cache:
            _ids_cache["df"] = assign_dense_ids(
                docs.select("docid", "content"), "docid", "doc_int"
            )
        return _ids_cache["df"]

    def _runs():
        # The id frame is range-partitioned by docid with doc_int
        # minted in partition order: every partition is one contiguous,
        # pairwise-disjoint, ascending docid segment — the layout the
        # segment-aware SPIMI compaction turns into globally
        # interval-disjoint runs (pure byte-concat phase 2). No
        # parquet round-trip, so no bin-packing interleave either.
        ids = _ids().select("docid", "doc_int", "content")
        return ids.mapInArrow(
            _fused_analyze_encode_partition(
                "content", "docid", mode, stem, stopwords, False, block_size
            ),
            fused_runs_schema(ids.schema["docid"].dataType),
        )

    runs_all = run_stage(
        spark, "runs", f"{d}/runs", fingerprint, _runs,
        partition_by=["kind"],
    )
    docid_map = run_stage(
        spark, "docid_map", f"{d}/docid_map", fingerprint,
        lambda: _ids().select("docid", "doc_int"),
    )
    n_docs = docid_map.count()
    doc_stats = run_stage(
        spark, "doc_stats", f"{d}/doc_stats", fingerprint,
        lambda: runs_all.filter(F.col("kind") == 1).select(
            "docid", "doc_int", "doc_len"
        ),
    )
    collection_stats = run_stage(
        spark, "collection_stats", f"{d}/collection_stats", fingerprint,
        lambda: doc_stats.agg(
            F.lit(n_docs).cast("long").alias("n_docs"),
            (F.sum("doc_len") / F.lit(n_docs)).alias("avg_dl"),
        ),
    )
    postings = run_stage(
        spark, "postings", f"{d}/postings", fingerprint,
        lambda: merge_runs_to_postings(
            runs_all.filter(F.col("kind") == 0).select(*run_cols)
        ).withColumn("bucket_id", term_bucket_col(n_buckets)),
        partition_by=["bucket_id"],
        sort_by=["term"],
        extra_meta={"n_buckets": n_buckets},
    )
    lexicon = run_stage(
        spark, "lexicon", f"{d}/lexicon", fingerprint,
        lambda: assign_dense_ids(
            postings.select("term", "df", "tf", F.length("postings").alias("bytes")),
            "term",
            "term_id",
        ).select(
            "term_id", "term", "df", "tf", "bytes",
            term_bucket_col(n_buckets),
        ),
        sort_by=["term"],
    )
    out = {
        "docid_map": docid_map,
        "doc_stats": doc_stats,
        "collection_stats": collection_stats,
        "postings": postings,
        "lexicon": lexicon,
        "terms_list": lexicon.select("term", "term_id"),
    }
    from ..operators.ids import release_id_caches

    release_id_caches()
    return out


def _forward_index_stage(
    spark, d: str, fingerprint: str, tokens, lexicon, id_cols
):
    """Flag-gated resumable forward-index stage shared by both builders.
    Mirrors indexer4.cpp:381-442: remap to term_ids, record the
    missing-term count as a metric (stderr '[MISSING_TERM]' analog,
    indexer4.cpp:413-419) — computed as one anti-join count, no driver
    row shipping."""
    from ..operators.index_build import forward_index_frame
    from ..operators.metrics import missing_term_count

    was_current = stage_is_current(f"{d}/forward_index_ids", fingerprint)
    fwd = run_stage(
        spark,
        "forward_index_ids",
        f"{d}/forward_index_ids",
        fingerprint,
        lambda: forward_index_frame(tokens, lexicon, id_cols=id_cols),
    )
    if not was_current:  # record once per computation, not per resume
        record_metrics(
            d,
            fingerprint,
            [
                {
                    "stage": "forward_index_ids",
                    "key": "missing_terms",
                    "value": missing_term_count(tokens, lexicon),
                }
            ],
        )
    return fwd


def build_and_save_index_from_tokens(
    tokens: DataFrame,
    out_dir: str,
    fingerprint: str,
    *,
    salt_buckets: int | None = None,
    block_size: int = 128,
    n_buckets: int = 10,
    with_forward_index: bool = False,
) -> dict[str, DataFrame]:
    """Resumable build over a PRE-TOKENIZED frame
    ``(docid, term, positions, tf, doc_len)`` — the mid-stream entry
    (S5): a reference-produced ``cleaned.jsonl`` read back via
    ``sources.ingest.read_cleaned_jsonl`` + ``cleaned_to_tokens`` is
    indexed without re-extraction or re-analysis. Stage graph and table
    schemas are identical to :func:`build_and_save_index` minus the
    docs_ids/tokens stages, so ``load_index`` + every query path work
    unchanged on the result."""
    from ..operators.ids import assign_dense_ids, release_id_caches
    from ..operators.index_build import build_postings, term_bucket_col
    from pyspark.sql import functions as F

    spark = tokens.sparkSession
    d = out_dir.rstrip("/")
    docid_map = run_stage(
        spark, "docid_map", f"{d}/docid_map", fingerprint,
        lambda: assign_dense_ids(
            tokens.select("docid").distinct(), "docid", "doc_int"
        ),
    )
    n_docs = docid_map.count()
    toks = tokens.join(docid_map, "docid")
    doc_stats = run_stage(
        spark, "doc_stats", f"{d}/doc_stats", fingerprint,
        lambda: toks.select("docid", "doc_int", "doc_len").distinct(),
    )
    collection_stats = run_stage(
        spark, "collection_stats", f"{d}/collection_stats", fingerprint,
        lambda: doc_stats.agg(
            F.lit(n_docs).cast("long").alias("n_docs"),
            (F.sum("doc_len") / F.lit(n_docs)).alias("avg_dl"),
        ),
    )
    postings = run_stage(
        spark, "postings", f"{d}/postings", fingerprint,
        lambda: build_postings(
            toks.select("term", "doc_int", "positions", "doc_len"),
            n_docs,
            block_size=block_size,
            salt_buckets=salt_buckets,
        ).withColumn("bucket_id", term_bucket_col(n_buckets)),
        partition_by=["bucket_id"],
        sort_by=["term"],
        extra_meta={"n_buckets": n_buckets},
    )
    lexicon = run_stage(
        spark, "lexicon", f"{d}/lexicon", fingerprint,
        lambda: assign_dense_ids(
            postings.select("term", "df", "tf", F.length("postings").alias("bytes")),
            "term",
            "term_id",
        ).select(
            "term_id", "term", "df", "tf", "bytes",
            term_bucket_col(n_buckets),
        ),
        sort_by=["term"],
    )
    out = {
        "docid_map": docid_map,
        "doc_stats": doc_stats,
        "collection_stats": collection_stats,
        "postings": postings,
        "lexicon": lexicon,
        "terms_list": lexicon.select("term", "term_id"),
    }
    if with_forward_index:
        fwd_toks = (
            toks if "tf" in toks.columns
            else toks.withColumn("tf", F.size("positions"))
        )
        out["forward_index_ids"] = _forward_index_stage(
            spark, d, fingerprint, fwd_toks, lexicon,
            id_cols=("docid", "doc_int"),
        )
    release_id_caches()
    return out


def load_index(spark: SparkSession, out_dir: str) -> dict[str, DataFrame]:
    d = out_dir.rstrip("/")
    out = {
        name: spark.read.parquet(f"{d}/{name}")
        for name in ("docid_map", "doc_stats", "collection_stats", "postings", "lexicon")
    }
    out["terms_list"] = out["lexicon"].select("term", "term_id")
    if (Path(d) / "forward_index_ids" / "_stage_meta.json").exists():
        out["forward_index_ids"] = spark.read.parquet(f"{d}/forward_index_ids")
    nb = stage_meta(f"{d}/postings").get("n_buckets")
    if nb:
        out["_n_buckets"] = int(nb)  # enables driver-side bucket pruning
    from ..operators.deletes import load_tombstones

    ts = load_tombstones(spark, d)
    if ts is not None:
        out["tombstones"] = ts  # query paths anti-join these doc_ints
    return out
