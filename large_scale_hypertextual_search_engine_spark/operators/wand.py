"""Block-Max WAND top-k scorer over the block-structured postings.

The reference writes skip metadata but never reads it (quirk C4,
indexer4.cpp:327, README.md:233-239). We store real per-block
``(last_docid, max_tf, min_dl, offset, bytes)`` metadata
(functions.varbyte) and use it here for Block-Max WAND (Ding & Suel
2011, public algorithm): posting blocks whose score upper bound cannot
enter the current top-k are skipped WITHOUT decoding.

Upper bounds: BM25's tf component is increasing in tf and decreasing
in dl, so f(block max_tf, block min_dl) bounds every posting in a
block exactly (tight when the block is homogeneous); blocks carry both
(functions.varbyte.encode_run). In compat mode tf is forced to 1 and
only min_dl drives the bound. A skipped block can only contain scores
<= theta, and ties at theta lose the (score desc, doc_int asc)
tiebreak to already-kept earlier docids, so skipping preserves exact
rank-identity.

Sharding (the scale path): posting blobs are sliced into docid-range
shards AT QUERY TIME using the block metadata alone — a shard's
sub-blob is a contiguous byte slice of whole blocks (blocks tile the
body), standalone-decodable given the previous block's last docid as
the delta base. Doc lengths reach each shard's kernel through a
COGROUP on the same docid-range key (``doc_stats`` slice co-partitioned
with the posting slices), so no node ever holds more than one shard's
doc lengths: there is no driver-side collect, no dense
``n_docs``-sized broadcast, and no single-task bottleneck — the three
round-1 scale-killers. Every doc is scored in exactly its home shard
(straddling blocks are decoded in at most two shards but their docs
are range-filtered), so per-shard top-k + global top-k merge is
rank-identical to the exact path.

Rank-identity with the exact DataFrame path is asserted in
tests/test_wand.py for every fixture query in both tf modes, single-
and multi-shard.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from ..functions.bm25 import K1, B
from ..functions.varbyte import vb_decode


class _TermCursor:
    """Lazy block-decoding cursor over one term's posting blob."""

    __slots__ = (
        "idf", "blob", "blocks", "block_idx", "docids", "tfs", "pos",
        "cur_doc", "ub", "block_bases", "block_ubs", "vals", "starts",
        "stats",
    )

    def __init__(self, idf: float, blob: bytes, blocks, tf_mode: str,
                 k1: float, b: float, avg_dl: float, base: int = 0,
                 stats: dict | None = None):
        self.idf = idf
        self.blob = blob
        self.blocks = blocks  # [(last_docid, max_tf, min_dl, offset, bytes)]
        self.block_idx = -1
        self.docids = None
        self.tfs = None
        self.vals = None
        self.starts = None
        self.stats = stats  # decode instrumentation (bench/telemetry)
        self.pos = 0
        self.cur_doc = -1

        def bound(max_tf: int, min_dl: int) -> float:
            tfm = 1.0 if tf_mode == "compat" else float(max_tf)
            norm = k1 * (1.0 - b + b * (float(min_dl) / avg_dl))
            return idf * ((k1 + 1.0) * tfm) / (norm + tfm)

        self.block_ubs = [bound(b_[1], b_[2]) for b_ in blocks]
        self.ub = max(self.block_ubs) if self.block_ubs else 0.0
        # `base` is the docid the first block's delta is relative to —
        # 0 for a whole blob, the preceding block's last_docid for a
        # shard slice (operators.wand module doc: query-time sharding)
        self.block_bases = [base] + [b_[0] for b_ in blocks[:-1]]
        self._advance_block()

    def _decode_block(self, bi: int) -> None:
        ld, mt, md, off, nb = self.blocks[bi]
        if self.stats is not None:
            self.stats["blocks_decoded"] = self.stats.get("blocks_decoded", 0) + 1
            self.stats["bytes_decoded"] = self.stats.get("bytes_decoded", 0) + nb
        vals = vb_decode(self.blob[off : off + nb]).astype(np.int64)
        n = 0
        docids = []
        tfs = []
        starts = []
        i = 0
        base = self.block_bases[bi]
        while i < vals.size:
            base += int(vals[i])
            docids.append(base)
            tf = int(vals[i + 1])
            tfs.append(tf)
            starts.append(i)
            i += 2 + tf
            n += 1
        self.docids = np.array(docids, dtype=np.int64)
        self.tfs = np.array(tfs, dtype=np.int64)
        self.vals = vals
        self.starts = starts
        self.pos = 0

    def _advance_block(self) -> bool:
        self.block_idx += 1
        if self.block_idx >= len(self.blocks):
            self.cur_doc = -1
            return False
        self._decode_block(self.block_idx)
        self.cur_doc = int(self.docids[0])
        return True

    def block_ub(self) -> float:
        return self.block_ubs[self.block_idx]

    def block_last(self) -> int:
        return self.blocks[self.block_idx][0]

    def next_geq(self, target: int) -> None:
        """Advance to the first docid >= target (block-skipping)."""
        if self.cur_doc < 0:
            return
        # skip whole blocks without decoding
        while self.blocks[self.block_idx][0] < target:
            self.block_idx += 1
            if self.block_idx >= len(self.blocks):
                self.cur_doc = -1
                return
            self.docids = None
        if self.docids is None:
            self._decode_block(self.block_idx)
        i = int(np.searchsorted(self.docids, target, side="left"))
        if i >= self.docids.size:
            # target fell past this block's members but <= last_docid
            if not self._advance_block():
                return
            self.next_geq(target)
            return
        self.pos = i
        self.cur_doc = int(self.docids[i])

    def advance(self) -> None:
        if self.cur_doc < 0:
            return
        self.pos += 1
        if self.pos >= self.docids.size:
            self._advance_block()
        else:
            self.cur_doc = int(self.docids[self.pos])

    def tf(self) -> int:
        return int(self.tfs[self.pos])

    def positions(self) -> np.ndarray:
        """Absolute token positions of the CURRENT doc, decoded on
        demand from the already-decoded block values (position deltas
        start from 0 — Appendix C layout — so absolute = cumsum)."""
        s = self.starts[self.pos]
        tf = int(self.vals[s + 1])
        return np.cumsum(self.vals[s + 2 : s + 2 + tf])


def _single_term_topk(
    row: tuple,
    doc_len: np.ndarray,
    avg_dl: float,
    top_k: int,
    tf_mode: str,
    k1: float,
    b: float,
    doc_lo: int,
    doc_hi: int | None,
    deleted: np.ndarray | None,
) -> list[tuple[int, float]]:
    """Vectorized exact top-k for a ONE-term query (guide §4.2: hand the
    whole batch to numpy instead of walking records in Python).

    A single-term query has no pivot/alignment structure for WAND to
    exploit; the per-record Python walk of the loop kernel costs more
    than decoding everything with the lockstep block walk (<=
    block_size vectorized iterations regardless of df) and scoring as
    three array expressions. Bit-identical to the loop kernel: the
    per-doc "ascending sorted FP fold" over ONE part is that part, the
    formula is evaluated in the same float64 op order, and top-k
    selection by lexsort((doc, -score)) is the same (score desc,
    doc_int asc) order the heap produces.
    """
    idf, blob, blocks = row[0], row[1], row[2]
    base = row[3] if len(row) > 3 else 0
    offs = np.fromiter((bl[3] for bl in blocks), dtype=np.int64, count=len(blocks))
    from ..functions.varbyte import decode_run_slice_fast

    docids, tfs = decode_run_slice_fast(blob, offs, base)
    hi = doc_hi if doc_hi is not None else 1 << 62
    m = (docids >= doc_lo) & (docids < hi)
    if deleted is not None:
        m &= ~deleted[np.where(m, docids - doc_lo, 0)]
    docids = docids[m]
    if docids.size == 0:
        return []
    tf_eff = (
        np.ones(docids.size, dtype=np.float64)
        if tf_mode == "compat"
        else tfs[m].astype(np.float64)
    )
    dl = doc_len[docids - doc_lo]
    norm = k1 * ((1.0 - b) + b * (dl / avg_dl))
    scores = idf * ((k1 + 1.0) * tf_eff) / (norm + tf_eff)
    order = np.lexsort((docids, -scores))[: min(top_k, docids.size)]
    return [(int(docids[i]), float(scores[i])) for i in order]


def wand_topk_kernel(
    term_rows: list[tuple],
    doc_len: np.ndarray,
    n_docs: int,
    avg_dl: float,
    top_k: int,
    tf_mode: str = "true",
    k1: float = K1,
    b: float = B,
    doc_lo: int = 0,
    doc_hi: int | None = None,
    deleted: np.ndarray | None = None,
) -> list[tuple[int, float]]:
    """Exact top-k (OR semantics) via Block-Max WAND.

    term_rows: (idf, blob, blocks[, base]) per query term; doc_len is
    indexed by ``doc_int - doc_lo`` (whole-collection callers pass
    doc_lo=0 with doc_len[0] unused). Only docs in [doc_lo or 1,
    doc_hi) are scored — shard slices may carry straddling blocks whose
    out-of-range docs belong to a neighboring shard. ``deleted``
    (bool mask, same indexing as doc_len): tombstoned docs are skipped
    BEFORE scoring, so a deleted doc can never occupy a top-k slot nor
    raise theta; they still count in block upper bounds, which stay
    valid (just looser) until compaction rewrites the blocks. Returns
    [(doc_int, score)] sorted by (score desc, doc_int asc) —
    rank-identical to the exact path.
    """
    live = [row for row in term_rows if row[2]]
    if len(live) == 1:
        # one cursor = no pivot structure; vectorized exact fast path
        return _single_term_topk(
            live[0], doc_len, avg_dl, top_k, tf_mode, k1, b,
            doc_lo, doc_hi, deleted,
        )
    cursors = [
        _TermCursor(row[0], row[1], row[2], tf_mode, k1, b, avg_dl,
                    base=row[3] if len(row) > 3 else 0)
        for row in live
    ]
    if doc_lo > 0:
        for c in cursors:
            c.next_geq(doc_lo)
    cursors = [c for c in cursors if c.cur_doc >= 0]
    heap: list[tuple[float, int]] = []  # (score, -doc_int) min-heap
    theta = 0.0
    fb = 1.0 - b
    hi = doc_hi if doc_hi is not None else 1 << 62

    while True:
        cursors = [c for c in cursors if 0 <= c.cur_doc < hi]
        if not cursors:
            break
        cursors.sort(key=lambda c: c.cur_doc)
        # pivot: first term where cumulative UB exceeds theta
        acc = 0.0
        pivot_i = -1
        for i, c in enumerate(cursors):
            acc += c.ub
            if acc > theta or len(heap) < top_k:
                pivot_i = i
                break
        if pivot_i < 0:
            break
        pivot_doc = cursors[pivot_i].cur_doc
        # extend the leader set across cursors tied at pivot_doc — their
        # contributions belong in the block bound, and it guarantees the
        # skip target strictly advances (no livelock on ties)
        while (
            pivot_i + 1 < len(cursors)
            and cursors[pivot_i + 1].cur_doc == pivot_doc
        ):
            pivot_i += 1
        # block-max refinement: sum of current-block UBs of cursors at/behind pivot
        block_acc = 0.0
        for c in cursors[: pivot_i + 1]:
            c.next_geq(c.cur_doc)  # ensure block loaded
            if c.cur_doc < 0:
                continue
            block_acc += c.block_ub()
        if len(heap) >= top_k and block_acc <= theta:
            # skip: jump past the smallest block boundary among leaders —
            # but never past the next non-leader cursor's current doc
            # (docs beyond it score with terms outside block_acc)
            boundary = min(
                c.block_last() for c in cursors[: pivot_i + 1] if c.cur_doc >= 0
            )
            target = boundary + 1
            if pivot_i + 1 < len(cursors):
                target = min(target, cursors[pivot_i + 1].cur_doc)
            for c in cursors[: pivot_i + 1]:
                if 0 <= c.cur_doc < target:
                    c.next_geq(target)
            continue
        if cursors[0].cur_doc == pivot_doc:
            if deleted is not None and deleted[pivot_doc - doc_lo]:
                for c in cursors:
                    if c.cur_doc == pivot_doc:
                        c.advance()
                continue
            # all leaders aligned on pivot -> score it
            dl = float(doc_len[pivot_doc - doc_lo])
            norm = k1 * (fb + b * (dl / avg_dl))
            parts = []
            for c in cursors:
                if c.cur_doc != pivot_doc:
                    break
                tf = 1.0 if tf_mode == "compat" else float(c.tf())
                parts.append(c.idf * ((k1 + 1.0) * tf) / (norm + tf))
            # ascending-order sum matches the exact path's sorted
            # aggregate bit-for-bit (FP addition is order-sensitive)
            score = 0.0
            for x in sorted(parts):
                score += x
            for c in cursors:
                if c.cur_doc == pivot_doc:
                    c.advance()
            entry = (score, -pivot_doc)
            if len(heap) < top_k:
                heapq.heappush(heap, entry)
                if len(heap) == top_k:
                    theta = heap[0][0]
            elif entry > heap[0]:
                heapq.heapreplace(heap, entry)
                theta = heap[0][0]
        else:
            # advance laggards to the pivot
            for c in cursors[:pivot_i]:
                if c.cur_doc < pivot_doc:
                    c.next_geq(pivot_doc)
    out = sorted(heap, key=lambda e: (-e[0], -e[1]))
    return [(-d, s) for s, d in out]


WAND_SCHEMA = StructType(
    [
        StructField("doc_int", LongType()),
        StructField("score", DoubleType()),
    ]
)


_SHARD_ROWS_DDL = (
    "shard int, term string, df long, base long, postings binary, "
    "blocks array<struct<last_docid:long,max_tf:int,min_dl:int,"
    "offset:int,bytes:int>>"
)


def _explode_to_shards(span: int):
    """Slice each term's blob into per-docid-range shard sub-blobs.

    Pure metadata surgery — no decode: block ``i`` covers docids in
    ``(last[i-1], last[i]]``, blocks tile the body, so a shard's slice
    is ``blob[offset[i0] : offset[i1-1]+bytes[i1-1]]`` with offsets
    rebased and ``base = last[i0-1]`` as the first delta's origin.
    Straddling blocks are shipped to every shard they overlap; the
    kernel range-filters scored docs so each doc scores exactly once.
    """

    def _explode(pdfs):
        for pdf in pdfs:
            o_shard, o_term, o_df, o_base, o_blob, o_blocks = [], [], [], [], [], []
            for term, df_, blob, blocks in zip(
                pdf["term"], pdf["df"], pdf["postings"], pdf["blocks"]
            ):
                blob = bytes(blob)
                lasts = np.array([d["last_docid"] for d in blocks], dtype=np.int64)
                offs = np.array([d["offset"] for d in blocks], dtype=np.int64)
                nbs = np.array([d["bytes"] for d in blocks], dtype=np.int64)
                mts = [int(d["max_tf"]) for d in blocks]
                mds = [int(d["min_dl"]) for d in blocks]
                bases = np.concatenate(([0], lasts[:-1]))
                s_first = int(bases[0]) // span  # first doc > bases[0]
                s_last = int(lasts[-1] - 1) // span
                for s in range(s_first, s_last + 1):
                    lo, hi = s * span + 1, (s + 1) * span + 1
                    i0 = int(np.searchsorted(lasts, lo, side="left"))
                    i1 = int(np.searchsorted(bases, hi - 1, side="left"))
                    if i0 >= i1:
                        continue
                    o_shard.append(s)
                    o_term.append(term)
                    o_df.append(int(df_))
                    o_base.append(int(bases[i0]))
                    o_blob.append(blob[offs[i0] : offs[i1 - 1] + nbs[i1 - 1]])
                    o_blocks.append(
                        [
                            {
                                "last_docid": int(lasts[i]),
                                "max_tf": mts[i],
                                "min_dl": mds[i],
                                "offset": int(offs[i] - offs[i0]),
                                "bytes": int(nbs[i]),
                            }
                            for i in range(i0, i1)
                        ]
                    )
            yield pd.DataFrame(
                {
                    "shard": pd.array(o_shard, dtype="int32"),
                    "term": o_term,
                    "df": pd.array(o_df, dtype="int64"),
                    "base": pd.array(o_base, dtype="int64"),
                    "postings": o_blob,
                    "blocks": o_blocks,
                }
            )

    return _explode


def _auto_n_shards(spark, n_docs: int, docs_per_shard: int) -> int:
    """Scale-adaptive shard count (guide §2: derive partitioning from
    input size AND available parallelism, never a constant tuned for
    one scale).

    Lower bound: ``ceil(n_docs / docs_per_shard)`` — the 100 TB memory
    bound (no task ever holds more than ``docs_per_shard`` doc
    lengths). Upper bound: the session's default parallelism, so a
    corpus that fits one memory-bounded shard still fans out across
    the cores instead of running the whole kernel in ONE Python task
    (measured: 36-query batch at 50k docs = 11.7 s single-shard,
    ~1 s sharded) — but never shards smaller than
    ``lshse.wand.minDocsPerShard`` docs (default 1000), which keeps
    per-task kernel setup amortized. Shard count never changes
    results: per-shard top-k + global merge is rank-identical by
    construction (tests/test_wand.py multi-shard identity).
    """
    mem_min = max(1, -(-n_docs // docs_per_shard))
    try:
        par = spark.sparkContext.defaultParallelism
    except Exception:  # pragma: no cover - session without a context
        par = 1
    min_docs = int(spark.conf.get("lshse.wand.minDocsPerShard", "1000"))
    cap = max(1, n_docs // max(min_docs, 1))
    return max(mem_min, min(par, cap))


def _resolve_doc_filter(index, doc_filter):
    """Normalize a doc_filter frame to a distinct doc_int column (the
    same docid->doc_int mapping query.search_batch applies)."""
    if doc_filter is None:
        return None
    if "doc_int" not in doc_filter.columns:
        doc_filter = doc_filter.select(
            F.col("docid").cast("string").alias("docid")
        ).join(index["docid_map"], "docid")
    return doc_filter.select("doc_int").distinct()


def _doc_slice(index, span, doc_filter=None):
    """Per-shard doc_stats slice for the WAND cogroup; carries a
    ``skip`` flag column when the index has tombstones and/or the query
    has a doc_filter, so the kernel rejects those docs before scoring.
    Filter semantics match the exact path: membership restricted,
    collection stats stay global. (Docs absent from doc_stats cannot be
    flagged — the lineage builders emit a doc_stats row for every doc,
    so the set is total by construction.)"""
    ds = index["doc_stats"].select(
        ((F.col("doc_int") - 1) / F.lit(span)).cast("int").alias("shard"),
        "doc_int",
        "doc_len",
    )
    skip = None
    ts = index.get("tombstones")
    if ts is not None:
        ds = ds.join(
            ts.select("doc_int").withColumn("_dead", F.lit(True)),
            "doc_int",
            "left",
        )
        skip = F.coalesce("_dead", F.lit(False))
    flt = _resolve_doc_filter(index, doc_filter)
    if flt is not None:
        ds = ds.join(
            flt.withColumn("_in", F.lit(True)), "doc_int", "left"
        )
        notin = F.coalesce("_in", F.lit(False)) == F.lit(False)
        skip = notin if skip is None else (skip | notin)
    if skip is not None:
        ds = ds.withColumn("skip", skip).drop("_dead", "_in")
    return ds


def _deleted_mask(d_pdf, span, lo):
    """Bool mask (indexed like doc_len) of the docs a shard's kernel
    must not score (tombstoned and/or outside the doc_filter), or None
    when nothing is flagged."""
    if "skip" not in d_pdf.columns or not len(d_pdf):
        return None
    flags = d_pdf["skip"].to_numpy().astype(bool)
    if not flags.any():
        return None
    mask = np.zeros(span + 1, dtype=bool)
    mask[d_pdf["doc_int"].to_numpy()[flags] - lo] = True
    return mask


def wand_search(
    index: dict[str, DataFrame],
    terms: list[str],
    top_k: int = 10,
    tf_mode: str = "true",
    k1: float = K1,
    b: float = B,
    n_shards: int | None = None,
    docs_per_shard: int = 4_000_000,
    doc_filter: DataFrame | None = None,
) -> DataFrame:
    """Distributed Block-Max WAND: one kernel task per docid-range shard.

    ``doc_filter`` (doc_int or docid column): filtered retrieval on the
    WAND path — membership restricted, stats global, rank-identical to
    ``search(..., doc_filter=...)`` with mode="or" (pytest).

    The query terms' posting rows (a term-pruned scan) are block-sliced
    into per-shard sub-blobs (:func:`_explode_to_shards`), cogrouped
    with the co-partitioned ``doc_stats`` slice for the same docid
    range, scored shard-locally, and merged with a global top-k. No
    driver-side doc-length collect, no dense broadcast, no single-task
    stage: per-task memory is bounded by ``docs_per_shard`` regardless
    of collection size.
    """
    from .query import _stats

    n_docs, avg_dl = _stats(index)
    spark = index["postings"].sparkSession
    if n_docs == 0:
        return spark.createDataFrame(
            [], "rank int, doc_int long, docid string, score double"
        )
    if n_shards is None:
        n_shards = _auto_n_shards(spark, n_docs, docs_per_shard)
    span = -(-n_docs // n_shards)
    dl_default = float(int(avg_dl))  # floor fallback, reference quirk Q8

    from .query import prune_buckets

    uniq = list(dict.fromkeys(terms))
    rows = prune_buckets(index, uniq).filter(F.col("term").isin(uniq)).select(
        "term", "df", "postings", "blocks"
    )
    shard_rows = rows.mapInPandas(_explode_to_shards(span), _SHARD_ROWS_DDL)
    ds = _doc_slice(index, span, doc_filter)

    def _kernel(key, p_pdf: pd.DataFrame, d_pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(key[0])
        lo, hi = shard * span + 1, (shard + 1) * span + 1
        if len(p_pdf) == 0:
            return pd.DataFrame({"doc_int": [], "score": []}).astype(
                {"doc_int": "int64", "score": "float64"}
            )
        doc_len = np.full(span + 1, dl_default, dtype=np.float64)
        if len(d_pdf):
            doc_len[d_pdf["doc_int"].to_numpy() - lo] = d_pdf["doc_len"].to_numpy()
        term_rows = []
        for df_, base, blob, blocks in zip(
            p_pdf["df"], p_pdf["base"], p_pdf["postings"], p_pdf["blocks"]
        ):
            idf = float(np.log((n_docs - int(df_) + 0.5) / (int(df_) + 0.5) + 1.0))
            bl = [
                (d["last_docid"], d["max_tf"], d["min_dl"], d["offset"], d["bytes"])
                for d in blocks
            ]
            term_rows.append((idf, bytes(blob), bl, int(base)))
        res = wand_topk_kernel(
            term_rows, doc_len, n_docs, avg_dl, top_k, tf_mode, k1, b,
            doc_lo=lo, doc_hi=hi, deleted=_deleted_mask(d_pdf, span, lo),
        )
        return pd.DataFrame(
            {"doc_int": [d for d, _ in res], "score": [s for _, s in res]}
        )

    # pin the cogroup's shuffle partition count (REPARTITION_BY_NUM is
    # exempt from AQE coalescing): the kernel is Python-CPU-heavy, and
    # AQE's byte-based coalescing packed 32 shards onto 4 workers
    # (measured 8x serialization) because the shard rows are "small"
    npart = max(n_shards, shard_rows.sparkSession.sparkContext.defaultParallelism)
    topk = (
        shard_rows.repartition(npart, "shard").groupby("shard")
        .cogroup(ds.repartition(npart, "shard").groupby("shard"))
        .applyInPandas(_kernel, WAND_SCHEMA)
    )
    from pyspark.sql import Window

    # global merge over n_shards * top_k rows — tiny by construction
    w = Window.orderBy(F.desc("score"), F.asc("doc_int"))
    return (
        F.broadcast(
            topk.withColumn("rank", F.row_number().over(w)).filter(
                F.col("rank") <= top_k
            )
        )
        .join(index["docid_map"], "doc_int")
        .select("rank", "doc_int", "docid", "score")
        .orderBy("rank")
    )


WAND_BATCH_SCHEMA = StructType(
    [
        StructField("query_id", LongType()),
        StructField("doc_int", LongType()),
        StructField("score", DoubleType()),
    ]
)


def wand_search_batch(
    index: dict[str, DataFrame],
    query_terms: dict[int, list[str]],
    top_k: int = 10,
    tf_mode: str = "true",
    k1: float = K1,
    b: float = B,
    n_shards: int | None = None,
    docs_per_shard: int = 4_000_000,
    doc_filter: DataFrame | None = None,
) -> DataFrame:
    """Score MANY queries in ONE job on the sharded WAND serving path.

    ``doc_filter`` applies to every query in the batch (per-query
    filters belong in separate batches — they change the shard masks).

    This is the batch analog of :func:`wand_search` and the engine's
    scale-right query architecture: the union of all queries' posting
    rows is block-sliced per docid-range shard once, doc lengths arrive
    per shard once via the cogroup, and each shard task runs the
    Block-Max WAND kernel for EVERY query against its slice — so the
    per-batch JVM work is two small exchanges (posting slices, shard
    top-k rows) regardless of how many candidates the queries touch.
    The exact DataFrame path shuffles every decoded candidate row
    (df ~ N per stopword-ish term); on memory-bandwidth-bound hosts
    that shuffle is the scaling ceiling (BENCH/BASELINE.md), which this
    path sidesteps: its heavy lifting is numpy kernel work that scales
    with cores like the index build.

    Returns (query_id, rank, doc_int, docid, score) — rank-identical to
    ``search_batch(mode="or")`` per query (asserted in tests).
    """
    from .query import _stats, prune_buckets

    n_docs, avg_dl = _stats(index)
    spark = index["postings"].sparkSession
    if n_docs == 0:
        return spark.createDataFrame(
            [], "query_id long, rank int, doc_int long, docid string, score double"
        )
    if n_shards is None:
        n_shards = _auto_n_shards(spark, n_docs, docs_per_shard)
    span = -(-n_docs // n_shards)
    dl_default = float(int(avg_dl))

    uniq = sorted({t for ts in query_terms.values() for t in ts})
    qlists = {int(q): list(dict.fromkeys(ts)) for q, ts in query_terms.items()}
    rows = prune_buckets(index, uniq).filter(F.col("term").isin(uniq)).select(
        "term", "df", "postings", "blocks"
    )
    shard_rows = rows.mapInPandas(_explode_to_shards(span), _SHARD_ROWS_DDL)
    ds = _doc_slice(index, span, doc_filter)

    def _kernel(key, p_pdf: pd.DataFrame, d_pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(key[0])
        lo, hi = shard * span + 1, (shard + 1) * span + 1
        if len(p_pdf) == 0:
            return pd.DataFrame(
                {"query_id": [], "doc_int": [], "score": []}
            ).astype({"query_id": "int64", "doc_int": "int64", "score": "float64"})
        doc_len = np.full(span + 1, dl_default, dtype=np.float64)
        if len(d_pdf):
            doc_len[d_pdf["doc_int"].to_numpy() - lo] = d_pdf["doc_len"].to_numpy()
        by_term: dict[str, tuple] = {}
        for term, df_, base, blob, blocks in zip(
            p_pdf["term"], p_pdf["df"], p_pdf["base"], p_pdf["postings"],
            p_pdf["blocks"],
        ):
            idf = float(np.log((n_docs - int(df_) + 0.5) / (int(df_) + 0.5) + 1.0))
            bl = [
                (d["last_docid"], d["max_tf"], d["min_dl"], d["offset"], d["bytes"])
                for d in blocks
            ]
            by_term[term] = (idf, bytes(blob), bl, int(base))
        deleted = _deleted_mask(d_pdf, span, lo)
        out_q, out_d, out_s = [], [], []
        for qid, terms in qlists.items():
            term_rows = [by_term[t] for t in terms if t in by_term]
            if not term_rows:
                continue
            res = wand_topk_kernel(
                term_rows, doc_len, n_docs, avg_dl, top_k, tf_mode, k1, b,
                doc_lo=lo, doc_hi=hi, deleted=deleted,
            )
            out_q.extend([qid] * len(res))
            out_d.extend(d for d, _ in res)
            out_s.extend(s for _, s in res)
        return pd.DataFrame(
            {
                "query_id": pd.array(out_q, dtype="int64"),
                "doc_int": pd.array(out_d, dtype="int64"),
                "score": pd.array(out_s, dtype="float64"),
            }
        )

    # pin the cogroup's shuffle partition count (REPARTITION_BY_NUM is
    # exempt from AQE coalescing): the kernel is Python-CPU-heavy, and
    # AQE's byte-based coalescing packed 32 shards onto 4 workers
    # (measured 8x serialization) because the shard rows are "small"
    npart = max(n_shards, shard_rows.sparkSession.sparkContext.defaultParallelism)
    topk = (
        shard_rows.repartition(npart, "shard").groupby("shard")
        .cogroup(ds.repartition(npart, "shard").groupby("shard"))
        .applyInPandas(_kernel, WAND_BATCH_SCHEMA)
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_int"))
    return (
        F.broadcast(
            topk.withColumn("rank", F.row_number().over(w)).filter(
                F.col("rank") <= top_k
            )
        )
        .join(index["docid_map"], "doc_int")
        .select("query_id", "rank", "doc_int", "docid", "score")
        .orderBy("query_id", "rank")
    )


# ---------------------------------------- two-phase positional retrieval


def wand_positional_kernel(
    term_rows: dict[str, tuple],
    slots: list[str] | None,
    prox: tuple | None,
    doc_len: np.ndarray,
    n_docs: int,
    avg_dl: float,
    top_k: int,
    tf_mode: str = "true",
    k1: float = K1,
    b: float = B,
    doc_lo: int = 0,
    doc_hi: int | None = None,
    deleted: np.ndarray | None = None,
    stats: dict | None = None,
) -> list[tuple[int, float, int]]:
    """AND-mode Block-Max WAND with in-kernel positional verification —
    the two-phase plan for phrase/proximity queries (r4 "What's missing
    #2"): candidates come from WAND over the terms' AND upper bound
    (blocks whose summed bound cannot beat theta are SKIPPED without
    decoding — a phrase containing one hot term no longer decodes the
    hot term's full posting list), and positions are decoded ONLY for
    docs where every term aligns (from block values already in memory —
    no second fetch).

    This is exact, not approximate: a phrase match's score is the AND
    BM25 sum of its distinct terms — independent of adjacency — so the
    summed block bound is a valid upper bound for every potential
    phrase match in the block, and skipped docs can only score <= theta
    (ties lose the (score desc, doc_int asc) tiebreak to already-kept
    earlier docids, as in :func:`wand_topk_kernel`). Docs that align
    but FAIL verification never enter the heap and never raise theta.

    ``term_rows``: {term: (idf, blob, blocks[, base])}. Exactly one of
    ``slots`` (phrase: slot terms in order; extra = n_occurrences) or
    ``prox`` ((term_a, term_b, slop, ordered); extra = min_dist) is
    given. Returns [(doc_int, score, extra)] sorted (score desc,
    doc_int asc) — rank- and score-identical to phrase_search /
    proximity_search on the shared candidates (pytest).
    """
    distinct = (
        list(dict.fromkeys(slots)) if prox is None else
        list(dict.fromkeys(prox[:2]))
    )
    curs: dict[str, _TermCursor] = {}
    for t in distinct:
        row = term_rows.get(t)
        if row is None or not row[2]:
            return []  # a missing term empties the AND
        curs[t] = _TermCursor(
            row[0], row[1], row[2], tf_mode, k1, b, avg_dl,
            base=row[3] if len(row) > 3 else 0, stats=stats,
        )
    cs = list(curs.values())
    if doc_lo > 0:
        for c in cs:
            c.next_geq(doc_lo)
    if any(c.cur_doc < 0 for c in cs):
        return []
    hi = doc_hi if doc_hi is not None else 1 << 62
    heap: list[tuple[float, int, int]] = []  # (score, -doc_int, extra)
    theta = 0.0
    fb = 1.0 - b

    while True:
        target = max(c.cur_doc for c in cs)
        if target >= hi:
            break
        aligned, dead = True, False
        for c in cs:
            if c.cur_doc < target:
                c.next_geq(target)
                if c.cur_doc < 0:
                    dead = True
                    break
                if c.cur_doc > target:
                    aligned = False
        if dead:
            break
        if not aligned:
            continue
        if deleted is not None and deleted[target - doc_lo]:
            for c in cs:
                c.advance()
            if any(c.cur_doc < 0 for c in cs):
                break
            continue
        if len(heap) >= top_k:
            # block-max phase: summed current-block bounds vs theta
            ub = sum(c.block_ub() for c in cs)
            if ub <= theta:
                boundary = min(c.block_last() for c in cs)
                tgt = max(boundary + 1, target + 1)
                for c in cs:
                    c.next_geq(tgt)
                if any(c.cur_doc < 0 for c in cs):
                    break
                continue
        # verify phase: positions decoded only here, only for this doc
        if stats is not None:
            stats["verified_docs"] = stats.get("verified_docs", 0) + 1
        extra = None
        if prox is None:
            plists = {t: curs[t].positions() for t in distinct}
            starts = plists[slots[0]]
            for i, t in enumerate(slots[1:], 1):
                starts = np.intersect1d(
                    starts, plists[t] - i, assume_unique=True
                )
                if starts.size == 0:
                    break
            if starts.size > 0:
                extra = int(starts.size)
        else:
            a_t, b_t, slop, ordered = prox
            pa = curs[a_t].positions()
            pb = curs[b_t].positions()
            diffs = (pb[None, :] - pa[:, None]).ravel()
            ds = diffs[diffs > 0] if ordered else np.abs(diffs)
            if ds.size and int(ds.min()) <= slop:
                extra = int(ds.min())
        if extra is not None:
            dl = float(doc_len[target - doc_lo])
            norm = k1 * (fb + b * (dl / avg_dl))
            parts = []
            for t in distinct:
                tf = 1.0 if tf_mode == "compat" else float(curs[t].tf())
                parts.append(curs[t].idf * ((k1 + 1.0) * tf) / (norm + tf))
            score = 0.0
            for x in sorted(parts):  # exact path's ascending FP fold
                score += x
            entry = (score, -target, extra)
            if len(heap) < top_k:
                heapq.heappush(heap, entry)
                if len(heap) == top_k:
                    theta = heap[0][0]
            elif entry[:2] > heap[0][:2]:
                heapq.heapreplace(heap, entry)
                theta = heap[0][0]
        for c in cs:
            c.advance()
        if any(c.cur_doc < 0 for c in cs):
            break
    out = sorted(heap, key=lambda e: (-e[0], -e[1]))
    return [(-d, s, x) for s, d, x in out]


WAND_POS_SCHEMA = StructType(
    [
        StructField("doc_int", LongType()),
        StructField("score", DoubleType()),
        StructField("extra", LongType()),
    ]
)


def _wand_positional_search(
    index: dict[str, DataFrame],
    slots: list[str] | None,
    prox: tuple | None,
    extra_name: str,
    top_k: int,
    tf_mode: str,
    k1: float,
    b: float,
    n_shards: int | None,
    docs_per_shard: int,
    doc_filter: DataFrame | None,
) -> DataFrame:
    """Shared shard driver: same slicing/cogroup shape as
    :func:`wand_search`, kernel swapped for the positional one."""
    from .query import _stats, prune_buckets

    n_docs, avg_dl = _stats(index)
    spark = index["postings"].sparkSession
    if n_docs == 0:
        return spark.createDataFrame(
            [], f"rank int, doc_int long, docid string, score double, "
                f"{extra_name} long"
        )
    if n_shards is None:
        n_shards = _auto_n_shards(spark, n_docs, docs_per_shard)
    span = -(-n_docs // n_shards)
    dl_default = float(int(avg_dl))

    uniq = (
        list(dict.fromkeys(slots)) if prox is None else
        list(dict.fromkeys(prox[:2]))
    )
    rows = prune_buckets(index, uniq).filter(F.col("term").isin(uniq)).select(
        "term", "df", "postings", "blocks"
    )
    shard_rows = rows.mapInPandas(_explode_to_shards(span), _SHARD_ROWS_DDL)
    ds = _doc_slice(index, span, doc_filter)

    def _kernel(key, p_pdf: pd.DataFrame, d_pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(key[0])
        lo, hi = shard * span + 1, (shard + 1) * span + 1
        if len(p_pdf) == 0:
            return pd.DataFrame({"doc_int": [], "score": [], "extra": []}).astype(
                {"doc_int": "int64", "score": "float64", "extra": "int64"}
            )
        doc_len = np.full(span + 1, dl_default, dtype=np.float64)
        if len(d_pdf):
            doc_len[d_pdf["doc_int"].to_numpy() - lo] = d_pdf["doc_len"].to_numpy()
        term_rows = {}
        for term, df_, base, blob, blocks in zip(
            p_pdf["term"], p_pdf["df"], p_pdf["base"], p_pdf["postings"],
            p_pdf["blocks"],
        ):
            idf = float(np.log((n_docs - int(df_) + 0.5) / (int(df_) + 0.5) + 1.0))
            bl = [
                (d["last_docid"], d["max_tf"], d["min_dl"], d["offset"], d["bytes"])
                for d in blocks
            ]
            term_rows[term] = (idf, bytes(blob), bl, int(base))
        res = wand_positional_kernel(
            term_rows, slots, prox, doc_len, n_docs, avg_dl, top_k,
            tf_mode, k1, b, doc_lo=lo, doc_hi=hi,
            deleted=_deleted_mask(d_pdf, span, lo),
        )
        return pd.DataFrame(
            {
                "doc_int": pd.array([d for d, _, _ in res], dtype="int64"),
                "score": pd.array([s for _, s, _ in res], dtype="float64"),
                "extra": pd.array([x for _, _, x in res], dtype="int64"),
            }
        )

    # pin the cogroup's shuffle partition count (REPARTITION_BY_NUM is
    # exempt from AQE coalescing): the kernel is Python-CPU-heavy, and
    # AQE's byte-based coalescing packed 32 shards onto 4 workers
    # (measured 8x serialization) because the shard rows are "small"
    npart = max(n_shards, shard_rows.sparkSession.sparkContext.defaultParallelism)
    topk = (
        shard_rows.repartition(npart, "shard").groupby("shard")
        .cogroup(ds.repartition(npart, "shard").groupby("shard"))
        .applyInPandas(_kernel, WAND_POS_SCHEMA)
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("score"), F.asc("doc_int"))
    return (
        F.broadcast(
            topk.withColumn("rank", F.row_number().over(w)).filter(
                F.col("rank") <= top_k
            )
        )
        .join(index["docid_map"], "doc_int")
        .select(
            "rank", "doc_int", "docid", "score",
            F.col("extra").alias(extra_name),
        )
        .orderBy("rank")
    )


def wand_phrase_search(
    index: dict[str, DataFrame],
    phrase: list[str],
    top_k: int = 10,
    tf_mode: str = "true",
    k1: float = K1,
    b: float = B,
    n_shards: int | None = None,
    docs_per_shard: int = 4_000_000,
    doc_filter: DataFrame | None = None,
) -> DataFrame:
    """Two-phase phrase top-k -> (rank, doc_int, docid, score,
    n_occurrences), rank/score/count-identical to
    ``phrase.phrase_search`` (pytest) but with Block-Max candidate
    pruning: a phrase with one hot term decodes only the blocks its
    rare terms align into, instead of the hot term's full postings."""
    if not phrase:
        raise ValueError("empty phrase")
    return _wand_positional_search(
        index, list(phrase), None, "n_occurrences", top_k, tf_mode, k1, b,
        n_shards, docs_per_shard, doc_filter,
    )


def wand_proximity_search(
    index: dict[str, DataFrame],
    term_a: str,
    term_b: str,
    slop: int,
    ordered: bool = False,
    top_k: int = 10,
    tf_mode: str = "true",
    k1: float = K1,
    b: float = B,
    n_shards: int | None = None,
    docs_per_shard: int = 4_000_000,
    doc_filter: DataFrame | None = None,
) -> DataFrame:
    """Two-phase NEAR/slop top-k -> (rank, doc_int, docid, score,
    min_dist), identical to ``phrase.proximity_search`` (pytest), with
    the same Block-Max candidate pruning as :func:`wand_phrase_search`."""
    if term_a == term_b:
        raise ValueError("proximity terms must differ")
    if slop < 1:
        raise ValueError("slop must be >= 1")
    return _wand_positional_search(
        index, None, (term_a, term_b, slop, ordered), "min_dist", top_k,
        tf_mode, k1, b, n_shards, docs_per_shard, doc_filter,
    )
