"""Index build: docs -> docid_map, doc_stats, postings, lexicon.

Spark-first rebuild of the reference's three-process pipeline
(extractor -> cleaner -> SPIMI indexer, README.md:25-41) as ONE declarative
job with exactly two wide exchanges:

  shuffle 1: range-partition by docid (dense docID minting, W2)
  shuffle 2: repartition by (term [, salt]) (the SPIMI block + k-way
             merge of indexer4.cpp:242-363 collapses into Spark's
             partial/final aggregation)

Everything the reference hand-rolls — external-memory blocking, k-way
merge, offset bookkeeping — is Catalyst/Tungsten machinery here; the
only Python kernels are the analyzer and the varbyte codec, both
Arrow-vectorized.

Skew (north rule): stopword-like terms with df ~ N are merged in two
phases — ``groupBy(term, salt)`` partial-encode where ``salt`` is a
*docid-range* bucket, then ``groupBy(term)`` ordered byte-concat of the
runs (``merge_runs`` rewrites one varbyte group per run boundary).
Salting by docid range (not random) keeps runs disjoint and pre-sorted,
so the final merge never re-sorts or re-encodes. Per-task memory for
the final concat is bounded by df * bytes/posting; at extreme scale set
``max_salts_per_group`` to emit capped multi-row posting lists instead.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..functions.varbyte import encode_run, encode_runs_batched, merge_runs
import numpy as np

BLOCK_SCHEMA = ArrayType(
    StructType(
        [
            StructField("last_docid", LongType()),
            StructField("max_tf", IntegerType()),
            StructField("min_dl", IntegerType()),
            StructField("offset", IntegerType()),
            StructField("bytes", IntegerType()),
        ]
    )
)

RUN_SCHEMA = StructType(
    [
        StructField("term", StringType()),
        StructField("salt", IntegerType()),
        StructField("df", LongType()),
        StructField("tf", LongType()),
        StructField("first_docid", LongType()),
        StructField("last_docid", LongType()),
        StructField("body", BinaryType()),
        StructField("blocks", BLOCK_SCHEMA),
    ]
)

POSTINGS_SCHEMA = StructType(
    [
        StructField("term", StringType()),
        StructField("df", LongType()),
        StructField("tf", LongType()),
        StructField("postings", BinaryType()),
        StructField("blocks", BLOCK_SCHEMA),
    ]
)


RUNS_DDL = (
    "term string, salt int, df long, tf long, first_docid long, "
    "last_docid long, body binary, blocks_bin binary"
)


def term_bucket_col(n_buckets: int, term_col: str = "term"):
    """Barrel assignment (Barrel-manager.hpp:16-43): crc32(term) mod n.

    crc32 — not xxhash64 — so the DRIVER can compute a query term's
    bucket with stdlib zlib.crc32 and prune partition directories
    before the scan (operators.query.prune_buckets); parquet partition
    values aren't predictable from xxhash64 python-side."""
    return (
        F.pmod(F.crc32(F.col(term_col).cast("binary")), F.lit(n_buckets))
        .cast("int")
        .alias("bucket_id")
    )


def term_bucket(term: str, n_buckets: int) -> int:
    """Python mirror of :func:`term_bucket_col` (same crc32 mod n)."""
    import zlib

    return zlib.crc32(term.encode("utf-8")) % n_buckets


def _encode_arrow_batches(block_size: int):
    """Arrow-native phase-1 encode: each input row is one (term, salt)
    group with its postings pre-aggregated JVM-side into a sorted
    array<struct<doc_int,positions,doc_len>>. The kernel unpacks the
    nested Arrow arrays into flat numpy views ONCE per batch (zero-copy
    where possible), then per row only slices + encodes — no per-group
    pandas DataFrame construction, which is ~1000x less Python overhead
    than applyInPandas on Zipf vocabularies where most groups are tiny.
    Block metadata is packed as int64[n,5] bytes between phases (cheap
    to merge); the final phase unpacks it to the struct schema.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    def _encode(batches):
        for batch in batches:
            pl = batch.column("pl")
            lens = pc.list_value_length(pl).to_numpy().astype(np.int64)
            st = pl.flatten()
            doc = st.field("doc_int").to_numpy(zero_copy_only=False).astype(np.int64)
            posl = st.field("positions")
            tfs_all = pc.list_value_length(posl).to_numpy().astype(np.int64)
            flat = posl.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
            dls_all = st.field("doc_len").to_numpy(zero_copy_only=False).astype(np.int64)
            bounds = np.concatenate(([0], np.cumsum(lens)))
            bodies, blocks_bins, firsts, lasts, dfs, tf_sums = (
                encode_runs_batched(
                    doc, tfs_all, flat, dls_all, bounds, block_size
                )
            )
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("term"),
                    batch.column("salt"),
                    pa.array(dfs, pa.int64()),
                    pa.array(tf_sums, pa.int64()),
                    pa.array(firsts, pa.int64()),
                    pa.array(lasts, pa.int64()),
                    pa.array(bodies, pa.binary()),
                    pa.array(blocks_bins, pa.binary()),
                ],
                names=[
                    "term", "salt", "df", "tf",
                    "first_docid", "last_docid", "body", "blocks_bin",
                ],
            )

    return _encode


def _spimi_encode_partition(block_size: int, chunk_rows: int = 500_000):
    """True SPIMI phase 1: encode posting runs per INPUT PARTITION with
    no shuffle at all (north star: "SPIMI-style per-partition
    posting-list construction ... followed by a shuffle-by-term merge").

    The kernel accumulates a partition's (term, doc_int, positions,
    doc_len) rows (bounded by ``chunk_rows`` — a chunk is this
    partition's SPIMI block), groups by term with an Arrow dictionary
    encode + ``np.lexsort`` (no Python string handling), and emits one
    delta+varbyte run per (term, chunk). Only these compressed runs —
    ~2-4 bytes per posting instead of ~40 for a raw token row — cross
    the wire in the phase-2 shuffle-by-term, which is what makes the
    build scale: the raw-token shuffle was the non-scaling IO term.

    Rows for one (doc, term) are atomic (the analyzer pre-aggregates per
    doc), so chunk boundaries can never split a posting and runs from
    consecutive chunks are automatically docid-disjoint. Across
    partitions, disjointness holds when the input is range-partitioned
    by doc_int (build_index guarantees it); _merge_batches verifies and
    falls back to a decode-merge for overlapping runs otherwise.
    """
    import pyarrow.compute as pc

    def _extract(batches):
        for batch in batches:
            posl = batch.column("positions")
            # stay in 32-bit: positions/list-lengths are int32 straight
            # from Arrow (zero-copy), doc ids/lengths downcast when they
            # fit (always, below 2^31 docs — else the int64 fallback
            # keeps correctness and encode_runs_batched dispatches i64)
            d64 = batch.column("doc_int").to_numpy(zero_copy_only=False)
            if d64.dtype != np.int32 and (
                d64.size == 0 or int(d64.max()) < 2**31
            ):
                d64 = d64.astype(np.int32)
            l64 = batch.column("doc_len").to_numpy(zero_copy_only=False)
            if l64.dtype != np.int32 and (
                l64.size == 0 or int(l64.max()) < 2**31
            ):
                l64 = l64.astype(np.int32)
            yield (
                batch.column("term"),
                d64,
                l64,
                pc.list_value_length(posl).to_numpy().astype(np.int32, copy=False),
                posl.flatten().to_numpy(zero_copy_only=False).astype(np.int32, copy=False),
            )

    def _encode(batches):
        yield from _spimi_chunk_stream(_extract(batches), block_size, chunk_rows)

    return _encode


# forward doc_int jump beyond which a SPIMI chunk splits (see the
# boundary comment in _spimi_chunk_stream): file-boundary jumps are
# file-sized (>> this), in-file gaps from zero-token docs are ~1-2
_GAP_SPLIT = 256


def _spimi_chunk_stream(tuples, block_size: int, chunk_rows: int):
    """SPIMI phase-1 core, input-agnostic: consumes ``(term: pa.Array,
    doc_int: np, doc_len: np, tfs: np, flat_positions: np)`` tuples
    (one per upstream batch, rows already exploded per (doc, term)),
    accumulates up to ``chunk_rows`` rows per SPIMI chunk, groups by
    term with a dictionary encode + lexsort, varbyte-encodes one run
    per (term, chunk), and yields RUNS_DDL RecordBatches after
    partition-end compaction. Shared by the token-table path
    (:func:`_spimi_encode_partition`) and the fused analyze+encode path
    (:func:`_fused_analyze_encode_partition`)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    acc: list = []
    acc_rows = 0
    chunks: list = []  # per-chunk encoded runs, compacted at the end

    def flush():
            nonlocal acc, acc_rows
            if not acc_rows:
                return
            term_arr = pa.concat_arrays([a[0] for a in acc])
            doc = np.concatenate([a[1] for a in acc])
            dl = np.concatenate([a[2] for a in acc])
            tfs = np.concatenate([a[3] for a in acc])
            flat = np.concatenate([a[4] for a in acc])
            acc.clear()
            acc_rows = 0
            idt = doc.dtype  # int32 unless a doc_int overflowed 2^31
            d = pc.dictionary_encode(term_arr)
            codes = d.indices.to_numpy(zero_copy_only=False)
            order = np.lexsort((doc, codes))
            codes_s = codes[order]
            doc_s = doc[order]
            dl_s = dl[order]
            tfs_s = tfs[order]
            # gather each row's positions slice under the permutation:
            # sorted position j maps to original index j + (row's original
            # start - row's sorted start) — one repeat, 32-bit throughout
            # (the kernel is bandwidth-bound; see encode_runs_batched)
            pos_start = np.concatenate(
                (np.zeros(1, idt), np.cumsum(tfs, dtype=idt)[:-1])
            )
            spc = np.cumsum(tfs_s, dtype=idt)
            sorted_start = np.concatenate((np.zeros(1, idt), spc[:-1]))
            total = int(spc[-1]) if spc.size else 0
            flat_s = flat[
                np.arange(total, dtype=idt)
                + np.repeat(pos_start[order] - sorted_start, tfs_s)
            ]
            seg = np.concatenate(
                ([0], np.flatnonzero(np.diff(codes_s)) + 1, [codes_s.size])
            )
            bodies, blocks_bins, firsts, lasts, dfs, tf_sums = (
                encode_runs_batched(doc_s, tfs_s, flat_s, dl_s, seg, block_size)
            )
            # run-level term column stays Arrow (no Python strings):
            # dictionary.take on the group-start codes
            run_terms = d.dictionary.take(
                pa.array(codes_s[seg[:-1]].astype(np.int64))
            )
            chunks.append(
                (seg_id, run_terms, firsts, lasts, dfs, tf_sums, bodies, blocks_bins)
            )

    # Chunks must stay within ONE contiguous docid range so every
    # emitted run's [first_docid, last_docid] interval is disjoint from
    # every other run's GLOBALLY — that is what keeps phase 2 on the
    # vectorized byte-concat path. Spark bin-packs several file splits
    # into one input partition, so a partition's doc stream is a
    # sequence of dense ascending segments separated by jumps (the
    # skipped files); without splitting, one straddling chunk spans
    # nearly the whole docid space and knocks every hot term onto the
    # decode-merge fallback (measured: the fallback was the NORM —
    # 6x slower phase 2). doc_int is dense inside a file (modulo
    # zero-token docs), so a boundary is any descent or any forward
    # jump > _GAP_SPLIT: file-boundary jumps are file-sized, while
    # in-file gaps (zero-token docs, tombstoned rebuilds) are small.
    # Over-splitting on a genuinely sparse input only makes MORE
    # (still interval-disjoint, concat-mergeable) runs — never a
    # wrong answer; under-splitting degrades to the decode fallback.
    last_doc = None
    seg_id = 0  # contiguous-docid segment: bumped at each boundary flush
    sorted_mode = True
    for tup in tuples:
        doc = tup[1]
        if doc.size == 0:
            continue
        if sorted_mode:
            dd = np.diff(doc)
            brks = np.flatnonzero((dd < 0) | (dd > _GAP_SPLIT)) + 1
            if brks.size > max(1, doc.size >> 6):
                # boundaries at > 1/64 of rows: the input is not
                # docid-ordered (delta rebuilds, arbitrary callers) —
                # segment-splitting would fragment runs to nothing.
                # Revert to plain chunking, one segment per chunk, and
                # let the phase-2 decode-merge fallback handle the
                # interval overlaps (the pre-segment behavior).
                sorted_mode = False
                flush()
                seg_id += 1
        if not sorted_mode:
            acc.append(tup)
            acc_rows += doc.size
            if acc_rows >= chunk_rows:
                flush()
                seg_id += 1
            continue
        if brks.size:
            # an Arrow batch can itself straddle split boundaries:
            # split rows (and the tf-aligned flat positions) at breaks
            term_a, _, dl, tfs, flat = tup
            bounds = np.concatenate(([0], brks, [doc.size]))
            pos_b = np.concatenate(([0], np.cumsum(tfs, dtype=np.int64)))
            pieces = [
                (
                    term_a.slice(a, b - a),
                    doc[a:b],
                    dl[a:b],
                    tfs[a:b],
                    flat[pos_b[a] : pos_b[b]],
                )
                for a, b in zip(bounds[:-1].tolist(), bounds[1:].tolist())
            ]
        else:
            pieces = [tup]
        for piece in pieces:
            pdoc = piece[1]
            if last_doc is not None and (
                pdoc[0] < last_doc or pdoc[0] - last_doc > _GAP_SPLIT
            ):
                flush()
                seg_id += 1  # new contiguous segment
            last_doc = int(pdoc[-1])
            acc.append(piece)
            acc_rows += len(pdoc)
            if acc_rows >= chunk_rows:
                flush()  # same segment continues: compaction may merge
    flush()
    yield from _compact_partition_runs(chunks)


def _fused_analyze_encode_partition(
    text_col: str,
    id_col: str,
    mode: str,
    stem: bool,
    stopwords,
    remove_numbers: bool,
    block_size: int,
    chunk_rows: int = 500_000,
):
    """Fused SPIMI phase 1: tokenize AND encode in ONE narrow Arrow pass
    over the corpus — the positional token table is never materialized.

    Input batches: (id_col, doc_int, text_col). Output: the union
    FUSED schema — ``kind=0`` rows are compressed posting runs
    (RUNS_DDL columns; ~2-4 B/posting) and ``kind=1`` rows are per-doc
    stats (id, doc_int, doc_len; one per input doc, including
    zero-token docs). This is the 100 TB layout: the only materialized
    intermediate between the corpus scan and the shuffle-by-term merge
    is the compressed-run table, which is smaller than the postings
    themselves — vs the exploded token table, which is larger than the
    input text and was both written and re-read by the staged path
    (tokens: 218 MB / 50M rows at the 300k-doc scaling corpus, vs
    ~60 MB of runs). Skipping it also skips the nested-Arrow
    array<struct<term, positions>> round-trip of ``analyze_agg_udf`` —
    per-doc aggregation feeds flat numpy arrays straight into the
    shared SPIMI chunk stream (:func:`_spimi_chunk_stream`), so the
    final postings stay byte-identical to the spimi/salted strategies
    (asserted in tests/test_fused_build.py)."""
    from ..analysis.analyzer import _tokens_of

    import pyarrow as pa

    def _encode(batches):
        doc_parts: list = []  # (ids: pa.Array, doc_int: np, doc_len: np)

        def gen():
            for batch in batches:
                texts = batch.column(text_col).to_pylist()
                ids = batch.column(id_col)
                di64 = (
                    batch.column("doc_int")
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64, copy=False)
                )
                nb = len(texts)
                doc_lens = np.zeros(nb, np.int64)
                counts = np.zeros(nb, np.int64)
                terms_out: list = []
                tfs_out: list = []
                flat_pos: list = []
                for i, text in enumerate(texts):
                    accd: dict = {}
                    n = 0
                    for term, pos, _orig in _tokens_of(
                        text, mode, stem, stopwords, remove_numbers
                    ):
                        lst = accd.get(term)
                        if lst is None:
                            accd[term] = [pos]
                        else:
                            lst.append(pos)
                        n += 1
                    doc_lens[i] = n
                    counts[i] = len(accd)
                    for t, ps in accd.items():
                        ps.sort()  # tokenize emits ascending; defensive
                        terms_out.append(t)
                        tfs_out.append(len(ps))
                        flat_pos.extend(ps)
                doc_parts.append((ids, di64, doc_lens))
                if not terms_out:
                    continue
                idt = (
                    np.int32
                    if di64.size == 0 or int(di64.max()) < 2**31
                    else np.int64
                )
                yield (
                    pa.array(terms_out, pa.string()),
                    np.repeat(di64.astype(idt, copy=False), counts),
                    np.repeat(doc_lens.astype(np.int32, copy=False), counts),
                    np.asarray(tfs_out, np.int32),
                    np.asarray(flat_pos, np.int32),
                )

        # run batches only materialize after gen() is exhausted
        # (partition-end compaction), so doc_parts is complete by the
        # time the first one is yielded
        for rb in _spimi_chunk_stream(gen(), block_size, chunk_rows):
            n = rb.num_rows
            id_type = doc_parts[0][0].type
            yield pa.RecordBatch.from_arrays(
                [pa.array(np.zeros(n, np.int32))]
                + [rb.column(i) for i in range(rb.num_columns)]
                + [
                    pa.nulls(n, id_type),
                    pa.nulls(n, pa.int64()),
                    pa.nulls(n, pa.int64()),
                ],
                names=FUSED_NAMES,
            )
        for ids, di, dl in doc_parts:
            n = len(di)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(np.ones(n, np.int32)),
                    pa.nulls(n, pa.string()),
                    pa.nulls(n, pa.int32()),
                    pa.nulls(n, pa.int64()),
                    pa.nulls(n, pa.int64()),
                    pa.nulls(n, pa.int64()),
                    pa.nulls(n, pa.int64()),
                    pa.nulls(n, pa.binary()),
                    pa.nulls(n, pa.binary()),
                    ids,
                    pa.array(di),
                    pa.array(dl),
                ],
                names=FUSED_NAMES,
            )

    return _encode


FUSED_NAMES = [
    "kind", "term", "salt", "df", "tf", "first_docid", "last_docid",
    "body", "blocks_bin", "docid", "doc_int", "doc_len",
]


def fused_runs_schema(id_type) -> StructType:
    """Spark schema of the fused runs+doc-stats union table. ``id_type``
    is the Spark DataType of the document id column."""
    return StructType(
        [
            StructField("kind", IntegerType()),
            StructField("term", StringType()),
            StructField("salt", IntegerType()),
            StructField("df", LongType()),
            StructField("tf", LongType()),
            StructField("first_docid", LongType()),
            StructField("last_docid", LongType()),
            StructField("body", BinaryType()),
            StructField("blocks_bin", BinaryType()),
            StructField("docid", id_type),
            StructField("doc_int", LongType()),
            StructField("doc_len", LongType()),
        ]
    )


def merge_runs_to_postings(
    runs: DataFrame, partitions: int | None = None
) -> DataFrame:
    """SPIMI phase 2: hash-exchange compressed runs by term, one
    streaming-Arrow segmented merge per partition (no collect_list, no
    per-term Python). The only wide exchange of the fused build."""
    if partitions is None:
        partitions = int(
            runs.sparkSession.conf.get("spark.sql.shuffle.partitions")
        )
    return runs.repartition(partitions, "term").mapInArrow(
        _merge_stream, POSTINGS_SCHEMA
    )


def _compact_partition_runs(chunks: list, max_batch_bytes: int = 1 << 27):
    """Partition-end compaction: merge each term's per-chunk runs into
    ONE run per (term, partition) before the phase-2 shuffle.

    Chunks are encoded in partition order and the input is docid-range
    partitioned, so a term's runs across chunks are already ascending
    and docid-disjoint — the merge is the ordered byte-concat of
    :func:`merge_runs_segmented` (run mode), one vectorized pass for
    every term at once. This caps phase-2 input at (terms x partitions)
    runs instead of (terms x chunks), which is what the per-term merge
    cost scales with. If the ascending-disjoint invariant does NOT hold
    (caller didn't range-partition), runs are emitted unmerged with
    their chunk index as ``salt`` and the phase-2 decode-merge fallback
    keeps correctness.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..functions.varbyte import merge_runs_segmented

    if not chunks:
        return
    if len(chunks) == 1:
        yield from _emit_run_batches(chunks[0][1:], max_batch_bytes)
        return
    term_all = pa.concat_arrays([c[1] for c in chunks])
    firsts = np.concatenate([c[2] for c in chunks])
    lasts = np.concatenate([c[3] for c in chunks])
    dfs = np.concatenate([c[4] for c in chunks])
    tfs = np.concatenate([c[5] for c in chunks])
    bodies = [b for c in chunks for b in c[6]]
    blocks = [b for c in chunks for b in c[7]]
    n_runs = [len(c[6]) for c in chunks]
    segs = np.repeat(
        np.asarray([c[0] for c in chunks], dtype=np.int64), n_runs
    )
    salts = np.repeat(
        np.arange(len(chunks), dtype=np.int32), n_runs
    )
    chunks.clear()

    d = pc.dictionary_encode(term_all)
    codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    # merge ONLY within (term, contiguous-docid segment): merging a
    # term's runs across segments would produce one run whose interval
    # spans the gap between them — overlapping other partitions' runs
    # and forcing phase 2 onto the decode path for every hot term.
    # Within a segment, chunk order is ascending docid, but sort by
    # interval explicitly anyway (cheap, and order-independent).
    nseg = int(segs.max()) + 1
    gkey = codes * nseg + segs
    order = np.lexsort((lasts, firsts, gkey))
    gkey_s = gkey[order]
    codes_s = codes[order]
    firsts_s = firsts[order]
    lasts_s = lasts[order]
    n = codes_s.size
    seg = np.concatenate(([0], np.flatnonzero(np.diff(gkey_s)) + 1, [n]))
    not_start = np.ones(n, dtype=bool)
    not_start[seg[:-1]] = False
    prev_last = np.empty(n, dtype=np.int64)
    prev_last[1:] = lasts_s[:-1]
    prev_last[0] = -1
    if bool((not_start & (firsts_s <= prev_last)).any()):
        # invariant broken: emit unmerged, phase 2 decode-merges
        yield from _emit_run_batches(
            (term_all, firsts, lasts, dfs, tfs, bodies, blocks),
            max_batch_bytes,
            salts=salts,
        )
        return

    dfs_s = dfs[order]
    tfs_s = tfs[order]
    bodies_s = [bodies[i] for i in order]
    blocks_s = [blocks[i] for i in order]
    merged_bodies, bm, blk_bounds = merge_runs_segmented(
        seg, firsts_s, lasts_s, bodies_s, blocks_s, total_dfs=None
    )
    g_first = firsts_s[seg[:-1]]
    g_last = lasts_s[seg[1:] - 1]
    g_df = np.add.reduceat(dfs_s, seg[:-1])
    g_tf = np.add.reduceat(tfs_s, seg[:-1])
    g_terms = d.dictionary.take(pa.array(codes_s[seg[:-1]]))
    g_blocks = [
        bm[a:b].tobytes()
        for a, b in zip(blk_bounds[:-1].tolist(), blk_bounds[1:].tolist())
    ]
    yield from _emit_run_batches(
        (g_terms, g_first, g_last, g_df, g_tf, merged_bodies, g_blocks),
        max_batch_bytes,
    )


def _emit_run_batches(chunk, max_batch_bytes: int, salts=None):
    """Yield RUNS_DDL RecordBatches from one run-array tuple, split so
    no batch's bodies exceed ``max_batch_bytes`` (int32 Arrow binary
    offsets; also bounds the shuffle writer's working set)."""
    import pyarrow as pa

    terms, firsts, lasts, dfs, tfs, bodies, blocks = chunk
    n = len(bodies)
    if n == 0:
        return
    body_lens = np.fromiter((len(b) for b in bodies), dtype=np.int64, count=n)
    cuts = [0]
    running = 0
    for i, bl in enumerate(body_lens.tolist()):
        if running >= max_batch_bytes:
            cuts.append(i)
            running = 0
        running += bl
    cuts.append(n)
    for a, b in zip(cuts[:-1], cuts[1:]):
        if a == b:
            continue
        salt_col = (
            pa.array(np.zeros(b - a, dtype=np.int32))
            if salts is None
            else pa.array(salts[a:b])
        )
        yield pa.RecordBatch.from_arrays(
            [
                terms.slice(a, b - a)
                if isinstance(terms, pa.Array)
                else pa.array(terms[a:b], pa.string()),
                salt_col,
                pa.array(np.asarray(dfs[a:b], dtype=np.int64)),
                pa.array(np.asarray(tfs[a:b], dtype=np.int64)),
                pa.array(np.asarray(firsts[a:b], dtype=np.int64)),
                pa.array(np.asarray(lasts[a:b], dtype=np.int64)),
                pa.array(bodies[a:b], pa.binary()),
                pa.array(blocks[a:b], pa.binary()),
            ],
            names=[
                "term", "salt", "df", "tf",
                "first_docid", "last_docid", "body", "blocks_bin",
            ],
        )


def _unpack_blocks(blocks_bin: bytes, head: int = 0):
    bb = np.frombuffer(bytes(blocks_bin), dtype=np.int64).reshape(-1, 5)
    return [
        (int(a), int(b), int(c), int(d) + head, int(e))
        for a, b, c, d, e in bb
    ]


def _merge_overlapping(runs: list, block_size: int = 128):
    """Rare path: runs whose docid ranges overlap (input wasn't
    range-partitioned by doc_int) — full decode, re-sort, re-encode.

    Doc lengths are not recoverable from run bodies, so re-encoded
    Block-Max metadata carries each doc's covering INPUT block's min_dl
    as a conservative per-doc stand-in: a lower-than-actual dl only
    loosens (never breaks) the WAND upper bound, vs the round-1
    behavior of zeroing min_dl, which made bounds maximally loose."""
    from ..functions.varbyte import encode_postings

    parts = [decode_postings_body(bytes(r["body"]), int(r["df"])) for r in runs]
    doc = np.concatenate([p[0] for p in parts])
    tfs = np.concatenate([p[1] for p in parts])
    flat = np.concatenate([p[2] for p in parts])
    dls = np.concatenate(
        [_per_doc_min_dl(p[0], r["blocks_bin"]) for p, r in zip(parts, runs)]
    )
    order = np.argsort(doc, kind="stable")
    pos_start = np.concatenate(([0], np.cumsum(tfs)))[:-1]
    within = np.arange(int(tfs.sum()), dtype=np.int64) - np.repeat(
        np.concatenate(([0], np.cumsum(tfs[order])))[:-1], tfs[order]
    )
    flat_s = flat[np.repeat(pos_start[order], tfs[order]) + within]
    return encode_postings(
        doc[order], tfs[order], flat_s, block_size, doc_lens=dls[order]
    )


def _per_doc_min_dl(docids: np.ndarray, blocks_bin) -> np.ndarray:
    """Expand a run's per-block min_dl to per-doc lower bounds: each doc
    inherits its covering block's min_dl (block i covers docids in
    (last[i-1], last[i]])."""
    if blocks_bin is None or len(blocks_bin) == 0 or docids.size == 0:
        return np.zeros(docids.size, dtype=np.int64)
    bb = np.frombuffer(bytes(blocks_bin), dtype=np.int64).reshape(-1, 5)
    lasts, min_dls = bb[:, 0], bb[:, 2]
    idx = np.searchsorted(lasts, docids, side="left")
    idx = np.minimum(idx, lasts.size - 1)
    return min_dls[idx]


def decode_postings_body(body: bytes, n_docs: int):
    """Decode a count-prefix-less run body to (docids, tfs, flat_pos)."""
    from ..functions.varbyte import vb_encode, decode_postings

    return decode_postings(bytes(vb_encode(np.array([n_docs]))) + body)


def _merge_batches(batches) -> "pd.DataFrame":
    """Phase-2 merge: one input row per term carrying its runs
    (array<struct>). Most terms have a single run -> count-prefix
    prepend only; multi-run terms (SPIMI chunks / salted skew runs) get
    the ordered byte-concat merge; overlapping ranges fall back to a
    decode-merge (callers that didn't range-partition by doc_int)."""
    from ..functions.varbyte import vb_encode

    for pdf in batches:
        terms, dfs, tfs, blobs, blockss = [], [], [], [], []
        for term, runs in zip(pdf["term"], pdf["runs"]):
            runs = sorted(runs, key=lambda r: (r["first_docid"], r["last_docid"]))
            total_df = int(sum(r["df"] for r in runs))
            if len(runs) == 1:
                r = runs[0]
                head = vb_encode(np.array([total_df]))
                blob = bytes(head) + bytes(r["body"])
                blocks = _unpack_blocks(r["blocks_bin"], len(head))
            elif any(
                runs[i]["last_docid"] >= runs[i + 1]["first_docid"]
                for i in range(len(runs) - 1)
            ):
                blob, blocks = _merge_overlapping(runs)
            else:
                blob, blocks = merge_runs(
                    [int(r["first_docid"]) for r in runs],
                    [bytes(r["body"]) for r in runs],
                    [_unpack_blocks(r["blocks_bin"]) for r in runs],
                    [int(r["last_docid"]) for r in runs],
                    total_df,
                )
            terms.append(term)
            dfs.append(total_df)
            tfs.append(int(sum(r["tf"] for r in runs)))
            blobs.append(blob)
            blockss.append(blocks)
        yield pd.DataFrame(
            {
                "term": terms,
                "df": dfs,
                "tf": tfs,
                "postings": blobs,
                "blocks": blockss,
            }
        )


def _merge_stream(batches):
    """Phase-2 merge, streaming-Arrow form: input is the raw run rows of
    one hash(term) shuffle partition (NO ``collect_list`` — the JVM
    aggregation and the per-term Python dict walk of
    :func:`_merge_batches` are both gone). One dictionary-encode +
    stable sort groups the partition's runs by term, one
    :func:`merge_runs_segmented` call merges every disjoint-run term at
    once, and only overlapping-run terms (callers that didn't
    range-partition by docid) fall back to the per-term decode-merge.

    Memory: the partition's compressed runs (~2-4 bytes/posting) — the
    same bound the old ``collect_list`` path had, minus the JVM array
    materialization. Output batches are split at ~128 MB of blob bytes
    to stay inside int32 Arrow binary offsets.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..functions.varbyte import merge_runs_segmented

    term_chunks: list = []
    f_l: list = []
    l_l: list = []
    df_l: list = []
    tf_l: list = []
    bodies: list = []
    blocks: list = []
    for b in batches:
        term_chunks.append(b.column("term"))
        f_l.append(b.column("first_docid").to_numpy(zero_copy_only=False))
        l_l.append(b.column("last_docid").to_numpy(zero_copy_only=False))
        df_l.append(b.column("df").to_numpy(zero_copy_only=False))
        tf_l.append(b.column("tf").to_numpy(zero_copy_only=False))
        bodies.extend(b.column("body").to_pylist())
        blocks.extend(b.column("blocks_bin").to_pylist())
    n = len(bodies)
    if n == 0:
        return
    term_all = pa.concat_arrays(
        [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
         for c in term_chunks]
    )
    firsts = np.concatenate(f_l).astype(np.int64, copy=False)
    lasts = np.concatenate(l_l).astype(np.int64, copy=False)
    dfs = np.concatenate(df_l).astype(np.int64, copy=False)
    tfs = np.concatenate(tf_l).astype(np.int64, copy=False)

    d = pc.dictionary_encode(term_all)
    codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((lasts, firsts, codes))
    codes_s = codes[order]
    firsts_s = firsts[order]
    lasts_s = lasts[order]
    dfs_s = dfs[order]
    tfs_s = tfs[order]
    bodies_s = [bodies[i] for i in order]
    blocks_s = [blocks[i] for i in order]
    seg = np.concatenate(([0], np.flatnonzero(np.diff(codes_s)) + 1, [n]))
    run_group = np.repeat(
        np.arange(seg.size - 1, dtype=np.int64), np.diff(seg)
    )

    # overlap detection (per run position, vectorized)
    prev_last = np.empty(n, dtype=np.int64)
    prev_last[1:] = lasts_s[:-1]
    prev_last[0] = -1
    bad_pos = firsts_s <= prev_last
    bad_pos[seg[:-1]] = False
    bad_groups = np.unique(run_group[bad_pos]) if bad_pos.any() else None

    if bad_groups is not None and bad_groups.size:
        good_mask_g = np.ones(seg.size - 1, dtype=bool)
        good_mask_g[bad_groups] = False
        keep = good_mask_g[run_group]
        # re-index the good subset
        g_sizes = np.diff(seg)[good_mask_g]
        seg_good = np.concatenate(([0], np.cumsum(g_sizes)))
        idx = np.flatnonzero(keep)
        firsts_g, lasts_g = firsts_s[idx], lasts_s[idx]
        dfs_g, tfs_g = dfs_s[idx], tfs_s[idx]
        bodies_g = [bodies_s[i] for i in idx.tolist()]
        blocks_g = [blocks_s[i] for i in idx.tolist()]
        good_codes = codes_s[seg[:-1]][good_mask_g]
    else:
        seg_good = seg
        firsts_g, lasts_g, dfs_g, tfs_g = firsts_s, lasts_s, dfs_s, tfs_s
        bodies_g, blocks_g = bodies_s, blocks_s
        good_codes = codes_s[seg[:-1]]

    if seg_good[-1] > 0:
        g_df = np.add.reduceat(dfs_g, seg_good[:-1])
        merged, bm, bounds = merge_runs_segmented(
            seg_good, firsts_g, lasts_g, bodies_g, blocks_g, total_dfs=g_df
        )
        g_tf = np.add.reduceat(tfs_g, seg_good[:-1])
        g_terms = d.dictionary.take(pa.array(good_codes))
        yield from _emit_postings_batches(
            g_terms, g_df, g_tf, merged, bm, bounds
        )

    if bad_groups is not None and bad_groups.size:
        # rare path: decode-merge each overlapping-run term
        terms_b, dfs_b, tfs_b, blobs_b, blocks_out = [], [], [], [], []
        vocab = d.dictionary
        for g in bad_groups.tolist():
            a, b = int(seg[g]), int(seg[g + 1])
            runs = [
                {
                    "df": int(dfs_s[i]),
                    "tf": int(tfs_s[i]),
                    "body": bodies_s[i],
                    "blocks_bin": blocks_s[i],
                }
                for i in range(a, b)
            ]
            blob, blks = _merge_overlapping(runs)
            terms_b.append(vocab[int(codes_s[a])].as_py())
            dfs_b.append(int(sum(r["df"] for r in runs)))
            tfs_b.append(int(sum(r["tf"] for r in runs)))
            blobs_b.append(blob)
            blocks_out.append(blks)
        yield _postings_batch_from_lists(
            terms_b, dfs_b, tfs_b, blobs_b, blocks_out
        )


_BLOCK_ARROW = None


def _block_list_type():
    global _BLOCK_ARROW
    if _BLOCK_ARROW is None:
        import pyarrow as pa

        _BLOCK_ARROW = pa.list_(
            pa.struct(
                [
                    ("last_docid", pa.int64()),
                    ("max_tf", pa.int32()),
                    ("min_dl", pa.int32()),
                    ("offset", pa.int32()),
                    ("bytes", pa.int32()),
                ]
            )
        )
    return _BLOCK_ARROW


def _emit_postings_batches(
    g_terms, g_df, g_tf, merged: list, bm, bounds,
    max_batch_bytes: int = 1 << 27,
):
    """POSTINGS_SCHEMA RecordBatches from merged-group arrays, split at
    ~``max_batch_bytes`` of blob bytes (int32 binary offsets)."""
    import pyarrow as pa

    n_g = len(merged)
    cuts = [0]
    running = 0
    for i, blob in enumerate(merged):
        if running >= max_batch_bytes:
            cuts.append(i)
            running = 0
        running += len(blob)
    cuts.append(n_g)
    lt = _block_list_type()
    for a, b in zip(cuts[:-1], cuts[1:]):
        if a == b:
            continue
        rows = bm[bounds[a]:bounds[b]]
        struct = pa.StructArray.from_arrays(
            [
                pa.array(rows[:, 0]),
                pa.array(rows[:, 1].astype(np.int32)),
                pa.array(rows[:, 2].astype(np.int32)),
                pa.array(rows[:, 3].astype(np.int32)),
                pa.array(rows[:, 4].astype(np.int32)),
            ],
            fields=list(lt.value_type),
        )
        offsets = pa.array(
            (bounds[a:b + 1] - bounds[a]).astype(np.int32)
        )
        yield pa.RecordBatch.from_arrays(
            [
                g_terms.slice(a, b - a),
                pa.array(np.asarray(g_df[a:b], dtype=np.int64)),
                pa.array(np.asarray(g_tf[a:b], dtype=np.int64)),
                pa.array(merged[a:b], pa.binary()),
                pa.ListArray.from_arrays(offsets, struct),
            ],
            names=["term", "df", "tf", "postings", "blocks"],
        )


def _postings_batch_from_lists(terms, dfs, tfs, blobs, blocks_tuples):
    """POSTINGS_SCHEMA RecordBatch from per-term Python lists (the
    overlapping-run fallback, where blocks are lists of 5-tuples)."""
    import pyarrow as pa

    lt = _block_list_type()
    return pa.RecordBatch.from_arrays(
        [
            pa.array(terms, pa.string()),
            pa.array(dfs, pa.int64()),
            pa.array(tfs, pa.int64()),
            pa.array(blobs, pa.binary()),
            pa.array(
                [
                    [
                        {
                            "last_docid": int(t[0]),
                            "max_tf": int(t[1]),
                            "min_dl": int(t[2]),
                            "offset": int(t[3]),
                            "bytes": int(t[4]),
                        }
                        for t in blks
                    ]
                    for blks in blocks_tuples
                ],
                lt,
            ),
        ],
        names=["term", "df", "tf", "postings", "blocks"],
    )


def build_postings(
    tokens: DataFrame,
    n_docs: int,
    *,
    block_size: int = 128,
    salt_buckets: int | None = None,
    docs_per_salt: int = 250_000,
    partitions: int | None = None,
    strategy: str = "salted",
    chunk_rows: int = 500_000,
) -> DataFrame:
    """(doc_int, term, positions) -> postings(term, df, tf, postings, blocks).

    Two strategies, byte-identical output (asserted in tests):

    * ``"salted"`` (default — measured faster on single-node/local
      where shuffle runs at RAM speed): shuffle tokens by (term,
      docid-range salt), JVM hash-aggregate the groups, encode per
      group with the batched Arrow kernel, merge runs per term.
      ``salt_buckets`` sizes the salt (``None`` -> ~``docs_per_salt``
      docs per range) so a df~N stopword is encoded in bounded slices.
    * ``"spimi"`` (the cluster-scale path): textbook SPIMI — phase 1 is
      a NARROW per-partition encode (_spimi_encode_partition) with no
      shuffle of raw tokens at all; the only wide exchange in the build
      is the phase-2 groupBy(term) over compressed runs (~2-4
      bytes/posting instead of ~40/raw token row, i.e. ~15-20x less
      shuffle volume). On a real cluster, where the token shuffle is
      network/disk-bound, this is the strategy to run; on this
      single-node sandbox the JVM shuffle outruns the extra Python
      regroup pass (A/B in BENCH/BASELINE.md), hence not the default.
      Skew is a non-issue by construction — a df~N term contributes one
      bounded run per partition chunk, merged by ordered byte concat.
      Requires docid-range-disjoint partitions for the cheap merge;
      other layouts still produce correct output via the decode-merge
      fallback in _merge_batches.

    Partition counts for the salted exchanges are pinned explicitly
    (AQE would coalesce a small shuffle to 1 task and serialize the
    Python encode, which it can't cost-model).
    """
    if partitions is None:
        partitions = int(
            tokens.sparkSession.conf.get("spark.sql.shuffle.partitions")
        )
    has_dl = "doc_len" in tokens.columns
    dl_col = (F.col("doc_len") if has_dl else F.lit(0)).cast("long").alias("doc_len")

    if strategy == "spimi":
        # coalesce to ~half the shuffle partitions (= cores locally) to
        # bound python-worker count; run count is governed by the
        # CONTIGUOUS-SEGMENT structure of the input (one run per term
        # per segment — see _spimi_chunk_stream), not the partition
        # count, so coalescing neither reduces runs nor (since the
        # segment fix) breaks interval disjointness. chunk_rows still
        # bounds kernel memory.
        src = tokens.select(
            "term", F.col("doc_int").cast("long"), "positions", dl_col
        )
        target = max(1, partitions // 2)
        if src.rdd.getNumPartitions() > target:
            src = src.coalesce(target)
        runs = src.mapInArrow(
            _spimi_encode_partition(block_size, chunk_rows), RUNS_DDL
        )
    else:
        if salt_buckets is None:
            salt_buckets = max(1, math.ceil(n_docs / docs_per_salt))
        span = max(1, math.ceil(n_docs / salt_buckets))
        salted = tokens.select(
            "term",
            ((F.col("doc_int") - 1) / F.lit(span)).cast("int").alias("salt"),
            F.struct(
                F.col("doc_int"),
                F.col("positions"),
                (F.col("doc_len") if has_dl else F.lit(0)).cast("int").alias("doc_len"),
            ).alias("p"),
        )
        grouped = (
            salted.repartition(partitions, "term", "salt")
            .groupBy("term", "salt")
            .agg(F.sort_array(F.collect_list("p")).alias("pl"))
        )
        runs = grouped.mapInArrow(_encode_arrow_batches(block_size), RUNS_DDL)
    return merge_runs_to_postings(runs, partitions)


class _LazyIndex(dict):
    """Index-table mapping whose entries may be built on first access.

    ``ids.assign_dense_ids`` runs an EAGER two-pass count of its input,
    so constructing the lexicon at build time executes the entire
    postings pipeline once for the term count — and the caller's first
    postings action executes it AGAIN (measured: the whole build ran 2x
    when only postings were written, the common case — guide §1.2,
    "don't compute things you throw away"). The lexicon and its
    derivatives are therefore registered as thunks resolved on first
    access; getitem/get/membership/setitem all see them as present.
    """

    def __init__(self) -> None:
        super().__init__()
        self._thunks: dict = {}

    def _lazy(self, key, thunk) -> None:
        self._thunks[key] = thunk

    def _resolve(self, key) -> None:
        if not super().__contains__(key) and key in self._thunks:
            super().__setitem__(key, self._thunks.pop(key)())

    def __getitem__(self, key):
        self._resolve(key)
        return super().__getitem__(key)

    def get(self, key, default=None):
        self._resolve(key)
        return super().get(key, default)

    def __contains__(self, key) -> bool:
        return super().__contains__(key) or key in self._thunks

    def __setitem__(self, key, value) -> None:
        self._thunks.pop(key, None)
        super().__setitem__(key, value)


def build_index(
    docs: DataFrame,
    *,
    text_col: str = "content",
    id_col: str = "docid",
    mode: str = "compat",
    stem: bool = True,
    stopwords: frozenset[str] | None = None,
    remove_numbers: bool = False,
    block_size: int = 128,
    salt_buckets: int | None = None,
    docs_per_salt: int = 250_000,
    n_buckets: int = 10,
    with_forward_index: bool = False,
    strategy: str = "salted",
) -> dict[str, DataFrame]:
    """Full index build. Returns the engine tables as DataFrames.

    Tables (FIXTURES.md §4): docid_map, doc_stats, collection_stats,
    postings, lexicon, terms_list [, forward_index_ids].
    Callers persist them via plans.lineage.write_stage for
    checkpoint/resume; here we stay lazy so Catalyst sees the whole plan.
    """
    from .ids import assign_dense_ids

    spark = docs.sparkSession
    docs_ids = assign_dense_ids(
        docs.select(id_col, text_col), id_col, "doc_int"
    )
    # tokenize is narrow and carries (docid, doc_int) through the explode —
    # no join between ids and tokens, per SURVEY.md §4.3
    tokens_src = docs_ids
    if strategy == "salted":
        # The id-assignment window's exchange is ENSURE_REQUIREMENTS, so
        # AQE coalesces it by byte size — at 50k docs the ~15 MB of text
        # packed into 7 partitions and the Python analyzer ran 7-wide on
        # 32 cores (guide §2.5: input partitioning must be sized for the
        # CPU-heavy kernel, not the bytes). Rebalance with a PINNED
        # range repartition on the dense doc_int (REPARTITION_BY_NUM is
        # exempt from coalescing; dense ints make sampling exact, so
        # partitions are balanced and doc-contiguous). Salted-only: the
        # salted run structure is defined by the salt column, not input
        # partitioning, so artifacts are byte-identical — while the
        # spimi phase-1 run structure IS its input partitioning, which
        # stays untouched.
        npart = int(spark.conf.get("spark.sql.shuffle.partitions"))
        tokens_src = docs_ids.repartitionByRange(npart, "doc_int")
    tokens_all = _tokenize_keep_int(
        tokens_src, text_col, id_col, mode, stem, stopwords, remove_numbers
    )
    tokens = tokens_all.filter(F.col("term").isNotNull())

    # explode_outer keeps zero-token docs (doc_len = 0) in doc_stats
    doc_stats = tokens_all.select(id_col, "doc_int", "doc_len").distinct()
    docid_map = docs_ids.select(id_col, "doc_int")
    # docids are unique, so the source count IS the doc count — counting
    # docid_map here would recompute the id-minting chain a second time
    n_docs = docs.count()

    # avg_dl divides by TOTAL docs even if some lengths are missing
    # (reference quirk Q9, Query-engine.hpp:256-263)
    collection_stats = doc_stats.agg(
        F.lit(n_docs).cast("long").alias("n_docs"),
        (F.sum("doc_len") / F.lit(n_docs)).alias("avg_dl"),
    )

    postings = build_postings(
        tokens.select("term", "doc_int", "positions", "doc_len"),
        n_docs,
        block_size=block_size,
        salt_buckets=salt_buckets,
        docs_per_salt=docs_per_salt,
        strategy=strategy,
    )

    def _lexicon():
        return assign_dense_ids(
            postings.select(
                "term", "df", "tf", F.length("postings").alias("bytes")
            ),
            "term",
            "term_id",
        ).select(
            "term_id",
            "term",
            "df",
            "tf",
            "bytes",
            term_bucket_col(n_buckets),
        )

    out = _LazyIndex()
    out["docid_map"] = docid_map
    out["doc_stats"] = doc_stats
    out["collection_stats"] = collection_stats
    out["postings"] = postings
    # lexicon id assignment is eager (two-pass count over the postings
    # pipeline) -> built on first access, not at build time
    out._lazy("lexicon", _lexicon)
    out._lazy("terms_list", lambda: out["lexicon"].select("term", "term_id"))
    if with_forward_index:
        out._lazy(
            "forward_index_ids",
            lambda: forward_index_frame(tokens, out["lexicon"]),
        )
    return out


def forward_index_frame(
    tokens: DataFrame,
    terms_list: DataFrame,
    id_cols: tuple[str, ...] = ("doc_int",),
) -> DataFrame:
    """J2/F5 (indexer4.cpp:381-442): remap tokens to term_ids and fold
    per-doc sorted (term_id, freq, positions) postings — the reference's
    forward_index.jsonl content. Left join so a missing term surfaces as
    a null term_id (counted by metrics.missing_term_count, the
    '[MISSING_TERM]' analog) rather than silently dropping the doc's
    row. At scale this is one shuffle join on term + one groupBy doc."""
    return (
        tokens.join(terms_list.select("term", "term_id"), "term", "left")
        .groupBy(*id_cols)
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("term_id"),
                        F.col("tf").alias("freq"),
                        F.col("positions"),
                    )
                )
            ).alias("postings")
        )
    )


def _tokenize_keep_int(
    docs_ids: DataFrame,
    text_col: str,
    id_col: str,
    mode: str,
    stem: bool,
    stopwords,
    remove_numbers: bool,
) -> DataFrame:
    """Narrow tokenize that carries (docid, doc_int) through the explode.

    One ``mapInArrow`` kernel emits the already-exploded (doc, term)
    rows with natively-built Arrow arrays (list offsets + flat position
    values), replacing the previous analyze-UDF + JVM ``explode_outer``
    chain whose per-doc ``array<struct<term, positions>>`` rows were
    converted element-by-element through pandas objects (guide §4.2:
    build Arrow batches directly, don't round-trip nested Python). Rows
    and values are identical; zero-token docs still surface as one
    null-term row (tf=0, empty positions) so ``build_index`` keeps them
    in doc_stats.
    """
    from ..analysis.analyzer import _tokens_of

    def _tok(batches):
        import pyarrow as pa

        for batch in batches:
            texts = batch.column(text_col).to_pylist()
            ids = batch.column(id_col)
            di = batch.column("doc_int")
            n = len(texts)
            counts = np.zeros(n, np.int64)
            doc_lens = np.zeros(n, np.int64)
            terms_out: list = []
            tf_out: list = []
            flat_pos: list = []
            for i, text in enumerate(texts):
                accd: dict = {}
                ntok = 0
                for term, pos, _orig in _tokens_of(
                    text, mode, stem, stopwords, remove_numbers
                ):
                    lst = accd.get(term)
                    if lst is None:
                        accd[term] = [pos]
                    else:
                        lst.append(pos)
                    ntok += 1
                doc_lens[i] = ntok
                if accd:
                    counts[i] = len(accd)
                    for t, ps in accd.items():
                        terms_out.append(t)
                        tf_out.append(len(ps))
                        flat_pos.extend(ps)
                else:
                    # zero-token doc: one null-term marker row
                    counts[i] = 1
                    terms_out.append(None)
                    tf_out.append(0)
            idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), counts))
            tfs = np.asarray(tf_out, dtype=np.int64)
            offsets = np.zeros(tfs.size + 1, dtype=np.int32)
            offsets[1:] = np.cumsum(tfs)
            yield pa.RecordBatch.from_arrays(
                [
                    ids.take(idx),
                    di.take(idx),
                    pa.array(terms_out, pa.string()),
                    pa.ListArray.from_arrays(
                        pa.array(offsets),
                        pa.array(np.asarray(flat_pos, dtype=np.int32)),
                    ),
                    pa.array(tfs),
                    pa.array(np.repeat(doc_lens, counts)),
                ],
                names=[id_col, "doc_int", "term", "positions", "tf", "doc_len"],
            )

    id_field = docs_ids.schema[id_col]
    out_schema = StructType(
        [
            StructField(id_col, id_field.dataType),
            StructField("doc_int", LongType()),
            StructField("term", StringType()),
            StructField("positions", ArrayType(IntegerType())),
            StructField("tf", LongType()),
            StructField("doc_len", LongType()),
        ]
    )
    return docs_ids.select(id_col, "doc_int", text_col).mapInArrow(
        _tok, out_schema
    )
