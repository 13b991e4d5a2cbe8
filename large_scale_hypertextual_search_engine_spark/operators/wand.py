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

Sharding: a query's term rows are grouped into ONE kernel task here
(single-shard layout). With run-sharded postings (the extreme-scale
layout in operators.index_build), the same kernel runs per docid-range
shard with the co-partitioned doc_stats slice, and per-shard top-k
merge under a shared threshold — noted for the cluster deployment; the
kernel is shard-agnostic.

Rank-identity with the exact DataFrame path is asserted in
tests/test_wand.py for every fixture query in both tf modes.
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
        "cur_doc", "ub", "block_bases", "block_ubs",
    )

    def __init__(self, idf: float, blob: bytes, blocks, tf_mode: str,
                 k1: float, b: float, avg_dl: float):
        self.idf = idf
        self.blob = blob
        self.blocks = blocks  # [(last_docid, max_tf, min_dl, offset, bytes)]
        self.block_idx = -1
        self.docids = None
        self.tfs = None
        self.pos = 0
        self.cur_doc = -1

        def bound(max_tf: int, min_dl: int) -> float:
            tfm = 1.0 if tf_mode == "compat" else float(max_tf)
            norm = k1 * (1.0 - b + b * (float(min_dl) / avg_dl))
            return idf * ((k1 + 1.0) * tfm) / (norm + tfm)

        self.block_ubs = [bound(b_[1], b_[2]) for b_ in blocks]
        self.ub = max(self.block_ubs) if self.block_ubs else 0.0
        self.block_bases = [0] + [b_[0] for b_ in blocks[:-1]]
        self._advance_block()

    def _decode_block(self, bi: int) -> None:
        ld, mt, md, off, nb = self.blocks[bi]
        vals = vb_decode(self.blob[off : off + nb]).astype(np.int64)
        n = 0
        docids = []
        tfs = []
        i = 0
        base = self.block_bases[bi]
        while i < vals.size:
            base += int(vals[i])
            docids.append(base)
            tf = int(vals[i + 1])
            tfs.append(tf)
            i += 2 + tf
            n += 1
        self.docids = np.array(docids, dtype=np.int64)
        self.tfs = np.array(tfs, dtype=np.int64)
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


def wand_topk_kernel(
    term_rows: list[tuple[float, bytes, list]],
    doc_len: np.ndarray,
    n_docs: int,
    avg_dl: float,
    top_k: int,
    tf_mode: str = "true",
    k1: float = K1,
    b: float = B,
) -> list[tuple[int, float]]:
    """Exact top-k (OR semantics) via Block-Max WAND.

    term_rows: (idf, blob, blocks) per query term; doc_len is indexed by
    doc_int (doc_len[0] unused). Returns [(doc_int, score)] sorted by
    (score desc, doc_int asc) — rank-identical to the exact path.
    """
    cursors = [
        _TermCursor(idf, blob, blocks, tf_mode, k1, b, avg_dl)
        for idf, blob, blocks in term_rows
        if blocks
    ]
    cursors = [c for c in cursors if c.cur_doc >= 0]
    heap: list[tuple[float, int]] = []  # (score, -doc_int) min-heap
    theta = 0.0
    fb = 1.0 - b

    while True:
        cursors = [c for c in cursors if c.cur_doc >= 0]
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
            # all leaders aligned on pivot -> score it
            dl = float(doc_len[pivot_doc])
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


def wand_search(
    index: dict[str, DataFrame],
    terms: list[str],
    top_k: int = 10,
    tf_mode: str = "true",
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """Distributed entry: ship the query terms' posting rows to one
    kernel task (per shard at scale), score with BMW, join docid_map.

    doc lengths ride as a broadcast numpy array (dense doc_int index);
    on the run-sharded layout each shard gets only its range slice.
    """
    from .query import _stats

    spark = index["postings"].sparkSession
    n_docs, avg_dl = _stats(index)
    dl_rows = index["doc_stats"].select("doc_int", "doc_len").collect()
    doc_len = np.full(n_docs + 1, float(int(avg_dl)), dtype=np.float64)
    for r in dl_rows:
        doc_len[r["doc_int"]] = r["doc_len"]
    bc = spark.sparkContext.broadcast(doc_len)

    uniq = list(dict.fromkeys(terms))
    rows = index["postings"].filter(F.col("term").isin(uniq)).select(
        "df", "postings", "blocks"
    )

    def _run(pdfs):
        batches = list(pdfs)
        term_rows = []
        for pdf in batches:
            for df_, blob, blocks in zip(pdf["df"], pdf["postings"], pdf["blocks"]):
                idf = float(np.log((n_docs - int(df_) + 0.5) / (int(df_) + 0.5) + 1.0))
                bl = [
                    (d["last_docid"], d["max_tf"], d["min_dl"], d["offset"], d["bytes"])
                    for d in blocks
                ]
                term_rows.append((idf, bytes(blob), bl))
        if not term_rows:
            yield pd.DataFrame({"doc_int": [], "score": []}).astype(
                {"doc_int": "int64", "score": "float64"}
            )
            return
        res = wand_topk_kernel(
            term_rows, bc.value, n_docs, avg_dl, top_k, tf_mode, k1, b
        )
        yield pd.DataFrame(
            {"doc_int": [d for d, _ in res], "score": [s for _, s in res]}
        )

    topk = rows.coalesce(1).mapInPandas(_run, WAND_SCHEMA)
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("score"), F.asc("doc_int"))
    return (
        F.broadcast(topk.withColumn("rank", F.row_number().over(w)))
        .join(index["docid_map"], "doc_int")
        .select("rank", "doc_int", "docid", "score")
    )
