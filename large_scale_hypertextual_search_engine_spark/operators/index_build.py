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

from ..functions.varbyte import encode_run, merge_runs
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
            pos_cum = np.concatenate(([0], np.cumsum(tfs_all)))
            dfs, tfs, firsts, lasts, bodies, blocks_bins = [], [], [], [], [], []
            for r in range(batch.num_rows):
                s, e = bounds[r], bounds[r + 1]
                d = doc[s:e]
                t = tfs_all[s:e]
                body, blocks = encode_run(
                    d, t, flat[pos_cum[s] : pos_cum[e]], block_size, dls_all[s:e]
                )
                dfs.append(e - s)
                tfs.append(int(t.sum()))
                firsts.append(int(d[0]))
                lasts.append(int(d[-1]))
                bodies.append(body)
                blocks_bins.append(
                    np.asarray(blocks, dtype=np.int64).tobytes()
                )
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("term"),
                    batch.column("salt"),
                    pa.array(dfs, pa.int64()),
                    pa.array(tfs, pa.int64()),
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


def _unpack_blocks(blocks_bin: bytes, head: int = 0):
    bb = np.frombuffer(bytes(blocks_bin), dtype=np.int64).reshape(-1, 5)
    return [
        (int(a), int(b), int(c), int(d) + head, int(e))
        for a, b, c, d, e in bb
    ]


def _merge_batches(batches) -> "pd.DataFrame":
    """Phase-2 merge: one input row per term carrying its runs
    (array<struct>). Most terms have a single run -> count-prefix
    prepend only; salted skew terms get the ordered byte-concat merge."""
    from ..functions.varbyte import vb_encode

    for pdf in batches:
        terms, dfs, tfs, blobs, blockss = [], [], [], [], []
        for term, runs in zip(pdf["term"], pdf["runs"]):
            runs = sorted(runs, key=lambda r: r["first_docid"])
            total_df = int(sum(r["df"] for r in runs))
            if len(runs) == 1:
                r = runs[0]
                head = vb_encode(np.array([total_df]))
                blob = bytes(head) + bytes(r["body"])
                blocks = _unpack_blocks(r["blocks_bin"], len(head))
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
) -> DataFrame:
    """(doc_int, term, positions) -> postings(term, df, tf, postings, blocks).

    ``salt_buckets`` > 1 forces the two-phase skew merge; ``None`` sizes
    it from corpus cardinality (~``docs_per_salt`` docs per salt range,
    so a df~N stopword's partial encode handles a bounded slice).

    Physical shape: the SPIMI partial agg + k-way merge is ONE JVM hash
    aggregate per phase (``groupBy().agg(sort_array(collect_list))`` —
    map-side partial aggregation included), followed by an Arrow-batch
    encode kernel. Partition counts are pinned explicitly (AQE would
    coalesce a small shuffle to 1 task and serialize the Python encode,
    which it can't cost-model; at 100 TB the explicit ``repartition``
    by the grouping key is what we'd want anyway — the encode stage
    reuses the agg's partitioning, no extra exchange).
    """
    if salt_buckets is None:
        salt_buckets = max(1, math.ceil(n_docs / docs_per_salt))
    if partitions is None:
        partitions = int(
            tokens.sparkSession.conf.get("spark.sql.shuffle.partitions")
        )

    span = max(1, math.ceil(n_docs / salt_buckets))
    has_dl = "doc_len" in tokens.columns
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
    n_docs = docid_map.count()

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
        F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int").alias("bucket_id"),
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
        # J2/F5: remap terms to term_ids; broadcast only works when the
        # lexicon is small — at scale this is a shuffle join on term
        out["forward_index_ids"] = (
            tokens.join(lexicon.select("term", "term_id"), "term", "left")
            .groupBy("doc_int")
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
    return out


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
