"""Index merge: combine two independently built indexes into one.

The reference merges SPIMI blocks WITHIN one build (indexer4.cpp's
k-way merge); it has no way to combine two finished indexes — growing
the corpus means rebuilding everything. This is the operational
segment-merge every production engine has (Lucene's segment merging):
build per-shard/per-day indexes independently, merge cheap.

Semantics:
* Inputs are two lineage index dirs over DISJOINT external docids
  (duplicate docids raise — merge is for corpus shards; dedup first).
* A keeps its doc_ints; B's are offset by max(A.doc_int) — both stay
  dense if the inputs were dense, and no global re-minting pass runs.
* Tombstones carry forward (B's offset), so a merge never resurrects
  a deleted doc; compaction stays an independent, composable step.

Plan shape (the 100 TB argument): ONE full-outer join of the two
postings tables keyed by term (both sides are term-keyed rows, so this
is the minimal shuffle for term alignment), then a NARROW Arrow pass
that concatenates posting lists — A's docids all precede B's offset
docids, so the merged list is a decode → offset → concat → re-encode
with no sort. Doc-side tables are unions with a column transform; the
only driver round-trips are two scalars (offset, collision count).

The merged index answers queries identically to a fresh build over the
union corpus up to doc_int tie-break order on EQUAL scores (doc_int
assignment differs; scores, memberships and df/tf are identical —
pytest-asserted).
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

__all__ = ["merge_indexes"]

_POSTINGS_DDL = (
    "term string, df long, tf long, postings binary, "
    "blocks array<struct<last_docid:long,max_tf:int,min_dl:int,"
    "offset:int,bytes:int>>, bucket_id int"
)


def _blocks_to_rows(blocks) -> list[dict]:
    return [
        {
            "last_docid": int(ld),
            "max_tf": int(mt),
            "min_dl": int(md),
            "offset": int(off),
            "bytes": int(nb),
        }
        for (ld, mt, md, off, nb) in blocks
    ]


def merge_indexes(
    spark: SparkSession,
    dir_a: str,
    dir_b: str,
    out_dir: str,
    block_size: int = 128,
) -> dict[str, DataFrame]:
    """Merge index ``dir_a`` + ``dir_b`` -> ``out_dir``; returns the
    loaded merged index dict."""
    from ..operators.ids import assign_dense_ids
    from ..plans.lineage import load_index, stage_meta

    a, b, o = dir_a.rstrip("/"), dir_b.rstrip("/"), out_dir.rstrip("/")
    if Path(o).resolve() in (Path(a).resolve(), Path(b).resolve()):
        raise ValueError("merge_indexes requires a fresh out_dir")
    t0 = time.time()
    ia, ib = load_index(spark, a), load_index(spark, b)
    nba, nbb = ia.get("_n_buckets"), ib.get("_n_buckets")
    if nba != nbb:
        raise ValueError(
            f"bucket layouts differ ({nba} vs {nbb}); rebuild one side"
        )

    dup = ia["docid_map"].join(ib["docid_map"], "docid", "semi").count()
    if dup:
        raise ValueError(
            f"{dup} docids exist in both indexes; merge_indexes requires "
            "disjoint corpora (dedup or delete first)"
        )
    offset = ia["docid_map"].agg(F.max("doc_int")).collect()[0][0] or 0

    pa = ia["postings"].select(
        "term", "df", "tf", "postings", "blocks", "bucket_id"
    )
    pb = ib["postings"].select(
        F.col("term").alias("term_b"),
        F.col("df").alias("df_b"),
        F.col("tf").alias("tf_b"),
        F.col("postings").alias("postings_b"),
        F.col("blocks").alias("blocks_b"),
        F.col("bucket_id").alias("bucket_id_b"),
    )
    joined = pa.join(
        pb, pa["term"] == pb["term_b"], "full_outer"
    )

    def _merge(pdfs):
        from ..functions.varbyte import decode_postings, encode_postings

        for pdf in pdfs:
            rows = []
            for r in pdf.itertuples(index=False):
                only_a = r.term_b is None or (
                    isinstance(r.term_b, float) and pd.isna(r.term_b)
                )
                only_b = r.term is None or (
                    isinstance(r.term, float) and pd.isna(r.term)
                )
                if only_a:
                    rows.append(
                        (r.term, r.df, r.tf, r.postings, r.blocks, r.bucket_id)
                    )
                    continue
                # B's list re-bases onto the merged doc_int space
                offs_b = (
                    np.array([x["offset"] for x in r.blocks_b], np.int64)
                    if r.blocks_b is not None
                    else None
                )
                db, tb, fb = decode_postings(bytes(r.postings_b), offs_b)
                db = db + offset
                if only_b:
                    blob, blocks = encode_postings(db, tb, fb, block_size)
                    rows.append(
                        (
                            r.term_b,
                            int(db.size),
                            int(tb.sum()),
                            blob,
                            _blocks_to_rows(blocks),
                            r.bucket_id_b,
                        )
                    )
                    continue
                offs_a = (
                    np.array([x["offset"] for x in r.blocks], np.int64)
                    if r.blocks is not None
                    else None
                )
                da, ta, fa = decode_postings(bytes(r.postings), offs_a)
                # every A docid < every (offset) B docid: pure concat
                blob, blocks = encode_postings(
                    np.concatenate([da, db]),
                    np.concatenate([ta, tb]),
                    np.concatenate([fa, fb]),
                    block_size,
                )
                rows.append(
                    (
                        r.term,
                        int(da.size + db.size),
                        int(ta.sum() + tb.sum()),
                        blob,
                        _blocks_to_rows(blocks),
                        r.bucket_id,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["term", "df", "tf", "postings", "blocks", "bucket_id"],
            )

    merged = joined.mapInPandas(_merge, _POSTINGS_DDL)
    (
        merged.sortWithinPartitions("term")
        .write.mode("overwrite")
        .partitionBy("bucket_id")
        .parquet(f"{o}/postings")
    )
    fp = (
        f"merge:{stage_meta(f'{a}/postings').get('fingerprint')}"
        f"+{stage_meta(f'{b}/postings').get('fingerprint')}"
    )
    meta = {
        "stage": "postings",
        "fingerprint": fp,
        "committed": True,
        "merged_from": [a, b],
        "doc_int_offset": int(offset),
        "wall_ms": int((time.time() - t0) * 1000),
    }
    if nba:
        meta["n_buckets"] = int(nba)
    (Path(o) / "postings" / "_stage_meta.json").write_text(json.dumps(meta))
    spark.catalog.refreshByPath(f"{o}/postings")
    posted = spark.read.parquet(f"{o}/postings")

    assign_dense_ids(
        posted.select("term", "df", "tf", F.length("postings").alias("bytes"),
                      "bucket_id"),
        "term",
        "term_id",
    ).select("term_id", "term", "df", "tf", "bytes", "bucket_id").write.mode(
        "overwrite"
    ).parquet(f"{o}/lexicon")

    shift = lambda df: df.withColumn(  # noqa: E731
        "doc_int", F.col("doc_int") + F.lit(int(offset))
    )
    ia["docid_map"].unionByName(shift(ib["docid_map"])).write.mode(
        "overwrite"
    ).parquet(f"{o}/docid_map")
    ia["doc_stats"].unionByName(shift(ib["doc_stats"])).write.mode(
        "overwrite"
    ).parquet(f"{o}/doc_stats")
    spark.catalog.refreshByPath(f"{o}/doc_stats")
    spark.read.parquet(f"{o}/doc_stats").agg(
        F.count("*").alias("n_docs"),
        (F.sum("doc_len") / F.count("*")).alias("avg_dl"),
    ).write.mode("overwrite").parquet(f"{o}/collection_stats")

    ts_parts = []
    if ia.get("tombstones") is not None:
        ts_parts.append(ia["tombstones"])
    if ib.get("tombstones") is not None:
        ts_parts.append(shift(ib["tombstones"]))
    if ts_parts:
        ts = ts_parts[0]
        for p in ts_parts[1:]:
            ts = ts.unionByName(p)
        ts.write.mode("overwrite").parquet(f"{o}/tombstones")

    for name in ("lexicon", "docid_map", "doc_stats", "collection_stats"):
        (Path(o) / name / "_stage_meta.json").write_text(
            json.dumps({"stage": name, "fingerprint": fp, "committed": True})
        )
    from ..operators.ids import release_id_caches

    release_id_caches()
    return load_index(spark, o)
