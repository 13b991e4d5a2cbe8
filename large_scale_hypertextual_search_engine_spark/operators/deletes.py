"""Document deletion: tombstones + index compaction.

The reference engine has no delete path — removing a document means
rebuilding the whole index (its README.md:251-263 roadmap stops at
"incremental updates"). This module adds the Lucene-style two-phase
delete a 100 TB deployment needs:

* :func:`delete_docs` appends (doc_int, docid) tombstone rows under
  ``<index>/tombstones``. O(deleted) work, no index rewrite; picked up
  by the next ``plans.lineage.load_index``.
* Query time: every query path drops tombstoned docs from its
  candidates (``query.exclude_tombstones`` anti-join; the WAND kernel
  skips them before scoring so a deleted doc can never occupy a top-k
  slot). Collection stats (n_docs, avg_dl) and per-term df stay GLOBAL
  until compaction — deliberately the Lucene semantics: deletes hide
  documents immediately, statistics and space reclaim at merge. An
  index with no tombstones pays nothing (plan unchanged).
* :func:`compact_index` rewrites the index without the deleted docs as
  a NARROW per-term map over the postings rows (decode -> mask ->
  re-encode; zero shuffle — term is already the row key), with the
  stats tables recomputed by cheap aggregates. doc_int stays stable
  (no re-minting pass), so compaction is embarrassingly parallel at
  any scale. After compaction, query results are identical to a fresh
  build over the surviving corpus (pytest-asserted); re-encoded blocks
  carry min_dl=0 (valid, looser WAND bounds — a full rebuild restores
  tight bounds).

Scale envelope: the deleted-doc set is collected to the driver once
per compaction and shipped in the kernel closure — fine for the
realistic regime (deletes ≪ corpus); when deletes approach the corpus
size, a fresh build over the survivors is cheaper than compaction
anyway.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

__all__ = ["delete_docs", "compact_index", "tombstone_path"]


def tombstone_path(index_dir: str) -> str:
    return f"{index_dir.rstrip('/')}/tombstones"


def delete_docs(
    spark: SparkSession, index_dir: str, docids: DataFrame | list
) -> int:
    """Tombstone documents in an on-disk index. Returns the number of
    (previously live) documents newly tombstoned.

    ``docids`` is a list of external docid strings or a DataFrame with
    a ``docid`` (string) or ``doc_int`` (long) column. Unknown ids are
    ignored (deleting a non-existent doc is a no-op, not an error).
    Works against batch index dirs (``docid_map``) and streaming delta
    dirs (``delta_docid_map`` — streaming/incremental.py layout): the
    tombstones land under ``<dir>/tombstones`` either way and both
    ``plans.lineage.load_index`` and ``streaming.incremental
    .delta_index`` pick them up.
    """
    d = index_dir.rstrip("/")
    dm_path = (
        f"{d}/docid_map"
        if _has_parquet(f"{d}/docid_map")
        else f"{d}/delta_docid_map"
    )
    dm = spark.read.parquet(dm_path).select("docid", "doc_int")
    if isinstance(docids, (list, tuple)):
        docids = spark.createDataFrame(
            [(str(x),) for x in docids], "docid string"
        )
    key = "doc_int" if "doc_int" in docids.columns else "docid"
    ts = dm.join(docids.select(key).distinct(), key, "semi")
    tp = tombstone_path(d)
    prev = (
        spark.read.parquet(tp).select("doc_int")
        if _has_parquet(tp)
        else None
    )
    if prev is not None:
        ts = ts.join(prev, "doc_int", "left_anti")
    n = ts.count()
    if n:
        ts.select("doc_int", "docid").write.mode("append").parquet(tp)
    return n


def _has_parquet(path: str) -> bool:
    p = Path(path)
    return p.exists() and any(p.glob("*.parquet"))


def load_tombstones(spark: SparkSession, index_dir: str) -> DataFrame | None:
    """The distinct tombstone set for an index dir, or None."""
    tp = tombstone_path(index_dir)
    if not _has_parquet(tp):
        return None
    return spark.read.parquet(tp).select("doc_int", "docid").distinct()


def _cogroup_rewrite(
    spark: SparkSession,
    idx: dict,
    ts: DataFrame | None,
    block_size: int,
    docs_per_shard: int,
) -> DataFrame:
    """Tombstone-scalable postings rewrite (see compact_index): slice
    blobs into docid-range shards (metadata surgery, no decode),
    cogroup each shard with ONLY its range's tombstones, mask + re-run
    per slice, and byte-concat-merge runs per term. Bodies come out
    byte-identical to the closure strategy (fuzz-asserted)."""
    from pyspark.sql import functions as F

    from .index_build import RUNS_DDL, POSTINGS_SCHEMA, _merge_batches, _per_doc_min_dl
    from .wand import _SHARD_ROWS_DDL, _explode_to_shards

    n_docs = int(idx["collection_stats"].collect()[0]["n_docs"])
    n_shards = max(1, -(-n_docs // docs_per_shard))
    span = -(-n_docs // n_shards)
    rows = idx["postings"].select("term", "df", "postings", "blocks")
    shard_rows = rows.mapInPandas(_explode_to_shards(span), _SHARD_ROWS_DDL)
    ts_eff = (
        ts.select("doc_int")
        if ts is not None
        else spark.createDataFrame([], "doc_int long")
    )
    tsh = ts_eff.select(
        ((F.col("doc_int") - 1) / F.lit(span)).cast("int").alias("shard"),
        "doc_int",
    )

    def _kernel(key, p_pdf: pd.DataFrame, t_pdf: pd.DataFrame) -> pd.DataFrame:
        from ..functions.varbyte import decode_run_slice, encode_run

        shard = int(key[0])
        lo, hi = shard * span + 1, (shard + 1) * span + 1
        deleted = (
            np.sort(t_pdf["doc_int"].to_numpy().astype(np.int64))
            if len(t_pdf)
            else np.empty(0, np.int64)
        )
        out = {
            "term": [], "salt": [], "df": [], "tf": [],
            "first_docid": [], "last_docid": [], "body": [], "blocks_bin": [],
        }
        for term, base, blob, blocks in zip(
            p_pdf["term"], p_pdf["base"], p_pdf["postings"], p_pdf["blocks"]
        ):
            body = bytes(blob)
            packed_in = np.array(
                [
                    [b["last_docid"], b["max_tf"], b["min_dl"], b["offset"], b["bytes"]]
                    for b in blocks
                ],
                dtype=np.int64,
            )
            docids, tfs, flat_pos = decode_run_slice(
                body, packed_in[:, 3], int(base)
            )
            # straddling blocks ship to both neighbors: range-filter so
            # every doc lands in exactly one shard's run
            keep = (docids >= lo) & (docids < hi)
            if deleted.size:
                p = np.searchsorted(deleted, docids)
                p[p == deleted.size] = 0
                keep &= deleted[p] != docids
            if keep.all():
                # untouched slice: pass bytes through (the term merge
                # rewrites only the first varbyte group -> byte-identity)
                out["term"].append(term)
                out["salt"].append(shard)
                out["df"].append(int(docids.size))
                out["tf"].append(int(tfs.sum()))
                out["first_docid"].append(int(docids[0]))
                out["last_docid"].append(int(docids[-1]))
                out["body"].append(body)
                out["blocks_bin"].append(packed_in.tobytes())
                continue
            if not keep.any():
                continue
            nd, nt = docids[keep], tfs[keep]
            dls = _per_doc_min_dl(nd, packed_in.tobytes())
            rbody, rblocks = encode_run(
                nd, nt, flat_pos[np.repeat(keep, tfs)], block_size,
                doc_lens=dls,
            )
            out["term"].append(term)
            out["salt"].append(shard)
            out["df"].append(int(nd.size))
            out["tf"].append(int(nt.sum()))
            out["first_docid"].append(int(nd[0]))
            out["last_docid"].append(int(nd[-1]))
            out["body"].append(rbody)
            out["blocks_bin"].append(
                np.asarray(rblocks, dtype=np.int64).tobytes()
            )
        return pd.DataFrame(
            {
                "term": pd.array(out["term"], dtype=object),
                "salt": pd.array(out["salt"], dtype="int32"),
                "df": pd.array(out["df"], dtype="int64"),
                "tf": pd.array(out["tf"], dtype="int64"),
                "first_docid": pd.array(out["first_docid"], dtype="int64"),
                "last_docid": pd.array(out["last_docid"], dtype="int64"),
                "body": pd.array(out["body"], dtype=object),
                "blocks_bin": pd.array(out["blocks_bin"], dtype=object),
            }
        )

    runs = (
        shard_rows.groupby("shard")
        .cogroup(tsh.groupby("shard"))
        .applyInPandas(_kernel, RUNS_DDL)
    )
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


def compact_index(
    spark: SparkSession,
    index_dir: str,
    out_dir: str,
    block_size: int = 128,
    strategy: str = "auto",
    closure_max_deletes: int = 2_000_000,
    docs_per_shard: int = 4_000_000,
) -> dict[str, DataFrame]:
    """Rewrite ``index_dir`` without its tombstoned documents into
    ``out_dir`` (which may equal ``index_dir`` only if you enjoy data
    loss — it must be a fresh directory). Returns the loaded compacted
    index dict.

    Two rewrite strategies (``strategy``: "auto" | "closure" |
    "cogroup"), byte-identical postings bodies (property-fuzzed):

    * ``closure`` — the fast small-delete case: the sorted deleted-id
      array ships to every task (~8 B/tombstone) and the rewrite is ONE
      narrow ``mapInPandas`` over the bucket-partitioned postings scan:
      no shuffle at all. The right plan while the delete set fits
      comfortably in task memory.
    * ``cogroup`` — the tombstones-≫-memory regime (r4 "What's wrong"
      #5: at 10^9 tombstones the shipped set is ~8 GB): posting blobs
      are sliced into docid-range shards by pure metadata surgery (the
      ``wand._explode_to_shards`` machinery), COGROUPED with only that
      range's tombstones, masked/re-encoded per slice as posting RUNS,
      and re-merged per term with the ordered byte-concat run merge —
      so no task ever sees more than one shard's deletes. Costs the
      slice + term exchanges; per-task memory is bounded by
      ``docs_per_shard`` regardless of delete count.

    ``auto`` picks cogroup when the tombstone count exceeds
    ``closure_max_deletes`` (counted with one cheap aggregate).
    Everything else (lexicon/doc_stats/docid_map/collection_stats) is
    shared: column-pruned scans + one tiny aggregate.
    """
    from ..plans.lineage import load_index, stage_meta

    d = index_dir.rstrip("/")
    o = out_dir.rstrip("/")
    if Path(o).resolve() == Path(d).resolve():
        raise ValueError("compact_index requires a fresh out_dir")
    t0 = time.time()
    idx = load_index(spark, d)
    ts = idx.get("tombstones")
    nb = idx.get("_n_buckets")

    postings = idx["postings"]
    has_blocks = "blocks" in postings.columns
    if strategy == "auto":
        n_del = ts.count() if ts is not None else 0
        strategy = (
            "cogroup"
            if (n_del > closure_max_deletes and has_blocks)
            else "closure"
        )
    if strategy == "cogroup":
        if not has_blocks:
            raise ValueError("cogroup compaction needs block metadata")
        new_postings = _cogroup_rewrite(
            spark, idx, ts, block_size, docs_per_shard
        )
        if nb:
            from .index_build import term_bucket_col

            new_postings = new_postings.withColumn(
                "bucket_id", term_bucket_col(nb)
            )
        return _write_compacted(
            spark, idx, ts, d, o, new_postings,
            "bucket_id" in new_postings.columns, nb, t0,
            n_deleted=None, strategy="cogroup",
        )

    deleted = (
        np.sort(
            np.asarray(
                [r["doc_int"] for r in ts.select("doc_int").collect()],
                dtype=np.int64,
            )
        )
        if ts is not None
        else np.empty(0, np.int64)
    )
    cols = ["term", "df", "tf", "postings"] + (
        ["blocks"] if has_blocks else []
    ) + (["bucket_id"] if "bucket_id" in postings.columns else [])
    out_schema = (
        "term string, df long, tf long, postings binary, "
        "blocks array<struct<last_docid:long,max_tf:int,min_dl:int,"
        "offset:int,bytes:int>>"
        + (", bucket_id int" if "bucket_id" in postings.columns else "")
    )

    def _rewrite(pdfs):
        from ..functions.varbyte import decode_postings, encode_postings

        for pdf in pdfs:
            rows = []
            for row in pdf.itertuples(index=False):
                offs = (
                    np.array(
                        [b["offset"] for b in row.blocks], dtype=np.int64
                    )
                    if has_blocks and row.blocks is not None
                    else None
                )
                docids, tfs, flat_pos = decode_postings(
                    bytes(row.postings), offs
                )
                if deleted.size == 0:
                    keep = np.ones(docids.size, dtype=bool)
                else:
                    pos = np.searchsorted(deleted, docids)
                    pos[pos == deleted.size] = 0
                    keep = deleted[pos] != docids
                if keep.all():
                    rows.append(tuple(getattr(row, c) for c in cols))
                    continue
                if not keep.any():
                    continue  # term fully deleted -> drop the row
                pkeep = np.repeat(keep, tfs)
                nd, nt = docids[keep], tfs[keep]
                blob, blocks = encode_postings(
                    nd, nt, flat_pos[pkeep], block_size
                )
                rec = {
                    "term": row.term,
                    "df": int(nd.size),
                    "tf": int(nt.sum()),
                    "postings": blob,
                    "blocks": [
                        {
                            "last_docid": int(ld),
                            "max_tf": int(mt),
                            "min_dl": int(md),
                            "offset": int(off),
                            "bytes": int(nb_),
                        }
                        for (ld, mt, md, off, nb_) in blocks
                    ],
                }
                if "bucket_id" in cols:
                    rec["bucket_id"] = row.bucket_id
                rows.append(tuple(rec[c] for c in cols))
            yield pd.DataFrame(rows, columns=cols)

    new_postings = postings.select(*cols).mapInPandas(_rewrite, out_schema)
    return _write_compacted(
        spark, idx, ts, d, o, new_postings, "bucket_id" in cols, nb, t0,
        n_deleted=int(deleted.size), strategy="closure",
    )


def _write_compacted(
    spark: SparkSession,
    idx: dict,
    ts: DataFrame | None,
    d: str,
    o: str,
    new_postings: DataFrame,
    has_bucket: bool,
    nb,
    t0: float,
    n_deleted: int | None,
    strategy: str,
) -> dict[str, DataFrame]:
    """Shared compaction tail: write postings + refresh the sibling
    tables (stable term_ids, anti-joined docid_map/doc_stats, global
    stats recompute) and stamp lineage markers."""
    from ..plans.lineage import load_index, stage_meta

    if n_deleted is None:
        n_deleted = ts.count() if ts is not None else 0
    writer = new_postings.sortWithinPartitions("term").write.mode("overwrite")
    if has_bucket:
        writer = writer.partitionBy("bucket_id")
    writer.parquet(f"{o}/postings")
    if not any(Path(f"{o}/postings").rglob("*.parquet")):
        # everything was deleted: a partitionBy write of zero rows
        # leaves no schema on disk — write an explicit empty table so
        # the compacted index stays loadable
        spark.createDataFrame([], new_postings.schema).write.mode(
            "overwrite"
        ).parquet(f"{o}/postings")
    meta = {
        "stage": "postings",
        "fingerprint": f"compact:{stage_meta(f'{d}/postings').get('fingerprint')}",
        "committed": True,
        "compacted_from": d,
        "n_deleted": int(n_deleted),
        "strategy": strategy,
        "wall_ms": int((time.time() - t0) * 1000),
    }
    if nb:
        meta["n_buckets"] = int(nb)
    (Path(o) / "postings" / "_stage_meta.json").write_text(json.dumps(meta))
    spark.catalog.refreshByPath(f"{o}/postings")
    posted = spark.read.parquet(f"{o}/postings")

    # lexicon: keep the original (stable) term_id, refresh df/tf/bytes
    # from the rewritten postings; terms whose lists emptied drop out
    idx["lexicon"].select("term_id", "term", "bucket_id").join(
        posted.select(
            "term", "df", "tf", F.length("postings").alias("bytes")
        ),
        "term",
    ).select("term_id", "term", "df", "tf", "bytes", "bucket_id").write.mode(
        "overwrite"
    ).parquet(f"{o}/lexicon")

    ts_ids = (
        ts.select("doc_int") if ts is not None
        else spark.createDataFrame([], "doc_int long")
    )
    idx["docid_map"].join(ts_ids, "doc_int", "left_anti").write.mode(
        "overwrite"
    ).parquet(f"{o}/docid_map")
    doc_stats = idx["doc_stats"].join(ts_ids, "doc_int", "left_anti")
    doc_stats.write.mode("overwrite").parquet(f"{o}/doc_stats")
    spark.catalog.refreshByPath(f"{o}/doc_stats")
    spark.read.parquet(f"{o}/doc_stats").agg(
        F.count("*").alias("n_docs"),
        # fully-deleted index: avg_dl 0.0, not sum/0 = NULL (queries on
        # an empty index return empty instead of crashing on stats)
        F.coalesce(
            F.sum("doc_len") / F.nullif(F.count("*"), F.lit(0)), F.lit(0.0)
        ).alias("avg_dl"),
    ).write.mode("overwrite").parquet(f"{o}/collection_stats")

    for name in ("lexicon", "docid_map", "doc_stats", "collection_stats"):
        (Path(o) / name / "_stage_meta.json").write_text(
            json.dumps(
                {
                    "stage": name,
                    "fingerprint": meta["fingerprint"],
                    "committed": True,
                }
            )
        )
    return load_index(spark, o)
