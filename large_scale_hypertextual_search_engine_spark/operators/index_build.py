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


def _spimi_encode_partition(block_size: int, chunk_rows: int = 4_000_000):
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
    import pyarrow as pa
    import pyarrow.compute as pc

    def _encode(batches):
        acc: list = []
        acc_rows = 0
        chunk_idx = 0

        def flush():
            nonlocal acc, acc_rows, chunk_idx
            if not acc_rows:
                return None
            term_arr = pa.concat_arrays([a[0] for a in acc])
            doc = np.concatenate([a[1] for a in acc])
            dl = np.concatenate([a[2] for a in acc])
            tfs = np.concatenate([a[3] for a in acc])
            flat = np.concatenate([a[4] for a in acc])
            acc.clear()
            acc_rows = 0
            d = pc.dictionary_encode(term_arr)
            codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            vocab = d.dictionary.to_pylist()
            order = np.lexsort((doc, codes))
            codes_s = codes[order]
            doc_s = doc[order]
            dl_s = dl[order]
            tfs_s = tfs[order]
            # gather each row's positions slice under the permutation
            pos_start = np.concatenate(([0], np.cumsum(tfs)))[:-1]
            within = np.arange(int(tfs_s.sum()), dtype=np.int64) - np.repeat(
                np.concatenate(([0], np.cumsum(tfs_s)))[:-1], tfs_s
            )
            flat_s = flat[np.repeat(pos_start[order], tfs_s) + within]
            seg = np.concatenate(
                ([0], np.flatnonzero(np.diff(codes_s)) + 1, [codes_s.size])
            )
            bodies, blocks_bins, firsts, lasts, dfs, tf_sums = (
                encode_runs_batched(doc_s, tfs_s, flat_s, dl_s, seg, block_size)
            )
            terms = [vocab[int(c)] for c in codes_s[seg[:-1]]]
            ci = chunk_idx
            chunk_idx += 1
            return pa.RecordBatch.from_arrays(
                [
                    pa.array(terms, pa.string()),
                    pa.array([ci] * len(terms), pa.int32()),
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

        for batch in batches:
            posl = batch.column("positions")
            acc.append(
                (
                    batch.column("term"),
                    batch.column("doc_int").to_numpy(zero_copy_only=False).astype(np.int64),
                    batch.column("doc_len").to_numpy(zero_copy_only=False).astype(np.int64),
                    pc.list_value_length(posl).to_numpy().astype(np.int64),
                    posl.flatten().to_numpy(zero_copy_only=False).astype(np.int64),
                )
            )
            acc_rows += batch.num_rows
            if acc_rows >= chunk_rows:
                rb = flush()
                if rb is not None:
                    yield rb
        rb = flush()
        if rb is not None:
            yield rb

    return _encode


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


def build_postings(
    tokens: DataFrame,
    n_docs: int,
    *,
    block_size: int = 128,
    salt_buckets: int | None = None,
    docs_per_salt: int = 250_000,
    partitions: int | None = None,
    strategy: str = "salted",
    chunk_rows: int = 4_000_000,
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
        # coalesce to ~half the shuffle partitions (= cores locally): runs
        # per term scale with partition count, and the phase-2 merge cost
        # scales with total runs. coalesce merges ADJACENT partitions, so
        # docid-range disjointness is preserved; chunk_rows still bounds
        # kernel memory.
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
    return (
        runs.repartition(partitions, "term")
        .groupBy("term")
        .agg(
            F.collect_list(
                F.struct(
                    "first_docid", "last_docid", "df", "tf", "body", "blocks_bin"
                )
            ).alias("runs")
        )
        .mapInPandas(_merge_batches, POSTINGS_SCHEMA)
    )


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
    tokens_all = _tokenize_keep_int(
        docs_ids, text_col, id_col, mode, stem, stopwords, remove_numbers
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

    lexicon = assign_dense_ids(
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

    out = {
        "docid_map": docid_map,
        "doc_stats": doc_stats,
        "collection_stats": collection_stats,
        "postings": postings,
        "lexicon": lexicon,
        "terms_list": lexicon.select("term", "term_id"),
    }
    if with_forward_index:
        out["forward_index_ids"] = forward_index_frame(tokens, lexicon)
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
    """Narrow tokenize that carries (docid, doc_int) through the explode."""
    from ..analysis.analyzer import analyze_agg_udf

    udf = analyze_agg_udf(mode, stem, stopwords, remove_numbers)
    analyzed = docs_ids.select(
        F.col(id_col), F.col("doc_int"), udf(F.col(text_col)).alias("a")
    ).select(
        id_col,
        "doc_int",
        F.col("a.doc_len").alias("doc_len"),
        F.explode_outer("a.terms").alias("t"),
    )
    # NB: rows with null term (zero-token docs from explode_outer) are
    # kept here; build_index filters them after deriving doc_stats
    return analyzed.select(
        id_col,
        "doc_int",
        F.col("t.term").alias("term"),
        F.col("t.positions").alias("positions"),
        F.size("t.positions").alias("tf"),
        "doc_len",
    )
