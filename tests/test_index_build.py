"""Index-build semantics: golden blob parity + invariants + skew path."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from large_scale_hypertextual_search_engine_spark.functions.varbyte import (
    decode_postings,
)
from large_scale_hypertextual_search_engine_spark.operators.ids import (
    assign_dense_ids,
)
from large_scale_hypertextual_search_engine_spark.operators.index_build import (
    build_index,
    build_postings,
)
from golden_utils import (
    REF,
    doc_term_positions,
    load_golden_index,
    read_cleaned_jsonl,
)

CASES = [
    ("index_dir4pdf", "cleaner3.jsonl"),
    ("index_dir4pmc", "cleaner3pmc.jsonl"),
]


@pytest.mark.parametrize("index_dir,cleaned", CASES, ids=["pdf", "pmc"])
@pytest.mark.parametrize("salts", [1, 3])
def test_golden_postings_blob_parity(spark, index_dir, cleaned, salts):
    """Build postings via Spark from the golden tokenized docs using the
    golden internal docIDs: every term's blob must be byte-identical to
    the golden postings.bin chunk (single-phase AND salted two-phase)."""
    lex, docmap, golden_postings = load_golden_index(REF / index_dir)
    orig_to_int = {v: k for k, v in docmap.items()}
    rows = []
    for doc in read_cleaned_jsonl(REF / cleaned):
        tp, _n = doc_term_positions(doc)
        # golden docid_map keys may have been truncated by the reference's
        # whitespace parsing (quirk Q9/Q11) — match on prefix
        did = doc["docid"]
        internal = orig_to_int.get(did)
        if internal is None:
            hits = [i for o, i in orig_to_int.items() if did.startswith(o) or o.startswith(did)]
            assert len(hits) == 1, did
            internal = hits[0]
        for term, positions in tp.items():
            rows.append((term, internal, positions))
    df = spark.createDataFrame(
        rows, "term string, doc_int long, positions array<int>"
    )
    built = build_postings(df, n_docs=len(docmap), salt_buckets=salts).collect()
    assert len(built) == len(lex)
    blob_all = (REF / index_dir / "postings.bin").read_bytes()
    for r in built:
        e = lex[r["term"]]
        golden_chunk = blob_all[e["offset"] : e["offset"] + e["bytes"]]
        assert r["df"] == e["df"], r["term"]
        assert r["tf"] == e["tf"], r["term"]
        assert bytes(r["postings"]) == golden_chunk, r["term"]


def test_assign_dense_ids(spark):
    df = spark.range(1000).select(
        F.concat(F.lit("k"), F.format_string("%04d", F.col("id"))).alias("k")
    )
    out = assign_dense_ids(df, "k", "kid", num_partitions=7).collect()
    by_key = sorted(out, key=lambda r: r["k"])
    assert [r["kid"] for r in by_key] == list(range(1, 1001))


@pytest.fixture(scope="module")
def sf0001_index(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").selectExpr(
        "cast(doc_id as string) as docid", "text as content"
    )
    idx = build_index(docs, mode="simple", stem=False, salt_buckets=2)
    for k in ("doc_stats", "postings", "lexicon", "docid_map"):
        idx[k] = idx[k].cache()
    return idx


def test_invariants_sf0001(spark, sf0001_index):
    idx = sf0001_index
    n_docs = idx["docid_map"].count()
    assert n_docs == 500
    # dense 1..N docids ordered by docid
    ids = [r["doc_int"] for r in idx["docid_map"].orderBy("docid").collect()]
    assert ids == list(range(1, n_docs + 1))
    # sum(doc_len) == sum(lexicon.tf) == total token count
    sum_dl = idx["doc_stats"].agg(F.sum("doc_len")).collect()[0][0]
    sum_tf = idx["lexicon"].agg(F.sum("tf")).collect()[0][0]
    assert sum_dl == sum_tf
    # df == decoded posting length; tf == sum decoded tfs; docids ascending
    for r in idx["postings"].collect():
        docids, tfs, flat = decode_postings(bytes(r["postings"]))
        assert len(docids) == r["df"]
        assert int(tfs.sum()) == r["tf"]
        assert (np.diff(docids) > 0).all() if len(docids) > 1 else True
        assert docids.min() >= 1 and docids.max() <= n_docs
        # block metadata consistent
        assert r["blocks"][-1]["last_docid"] == int(docids[-1])
        assert max(b["max_tf"] for b in r["blocks"]) == int(tfs.max())


def test_two_phase_merge_matches_single_phase(spark, sf0001_index):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").selectExpr(
        "cast(doc_id as string) as docid", "text as content"
    )
    idx8 = build_index(docs, mode="simple", stem=False, salt_buckets=8)
    a = {r["term"]: bytes(r["postings"]) for r in sf0001_index["postings"].collect()}
    b = {r["term"]: bytes(r["postings"]) for r in idx8["postings"].collect()}
    assert a == b


def test_lexicon_ids_dense_and_sorted(sf0001_index):
    lex = sf0001_index["lexicon"].orderBy("term_id").collect()
    terms = [r["term"] for r in lex]
    assert terms == sorted(terms)
    assert [r["term_id"] for r in lex] == list(range(1, len(lex) + 1))
    assert all(0 <= r["bucket_id"] < 10 for r in lex)


def test_strategy_parity_spimi_vs_salted(spark):
    """Both build strategies must emit byte-identical posting blobs —
    including on input that is NOT range-partitioned by doc_int (the
    SPIMI merge then takes the decode-merge fallback)."""
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .selectExpr("cast(doc_id as string) as docid", "text as content")
        .limit(200)
    )
    from large_scale_hypertextual_search_engine_spark.operators.index_build import (
        _tokenize_keep_int,
    )

    ids = assign_dense_ids(docs, "docid", "doc_int")
    toks = (
        _tokenize_keep_int(ids, "content", "docid", "simple", False, None, False)
        .filter(F.col("term").isNotNull())
        .select("term", "doc_int", "positions", "doc_len")
        .cache()
    )
    n = ids.count()

    def blobs(df, **kw):
        return {
            r["term"]: (r["df"], r["tf"], bytes(r["postings"]))
            for r in build_postings(df, n, **kw).collect()
        }

    a = blobs(toks, strategy="salted", salt_buckets=3)
    b = blobs(toks, strategy="spimi", chunk_rows=2000)
    assert a == b
    # round-robin repartition destroys docid-range disjointness
    c = blobs(toks.repartition(7), strategy="spimi", chunk_rows=2000)
    assert a == c


def test_merge_overlapping_propagates_min_dl():
    """The decode-merge fallback must carry conservative per-doc dl
    lower bounds into the re-encoded Block-Max metadata (round-1 ADVICE:
    min_dl=0 everywhere defeats WAND skip pruning)."""
    import numpy as np
    from large_scale_hypertextual_search_engine_spark.functions.varbyte import (
        encode_run,
    )
    from large_scale_hypertextual_search_engine_spark.operators.index_build import (
        _merge_overlapping,
    )

    def run_row(docids, dls):
        docids = np.asarray(docids)
        tfs = np.ones(docids.size, dtype=np.int64)
        body, blocks = encode_run(
            docids, tfs, docids, block_size=4, doc_lens=np.asarray(dls)
        )
        bb = np.array(
            [[ld, mt, md, off, nb] for (ld, mt, md, off, nb) in blocks],
            dtype=np.int64,
        ).tobytes()
        return {
            "body": body, "blocks_bin": bb, "df": docids.size,
            "first_docid": int(docids[0]), "last_docid": int(docids[-1]),
        }

    # overlapping docid ranges with distinct dls per run
    r1 = run_row([1, 3, 5, 7, 9, 11, 13, 15], [50] * 8)
    r2 = run_row([2, 4, 6, 8, 10, 12, 14, 16], [90] * 8)
    blob, blocks = _merge_overlapping([r1, r2], block_size=4)
    assert len(blocks) == 4
    # every block's min_dl is a sound lower bound and nonzero
    for (_ld, _mt, md, _o, _nb) in blocks:
        assert md == 50  # min over interleaved docs' conservative dls
    # and decoding round-trips the interleaved postings
    from large_scale_hypertextual_search_engine_spark.functions.varbyte import (
        decode_postings,
    )
    d, t, p = decode_postings(blob)
    assert list(d) == list(range(1, 17))


def test_missing_term_count_metric(spark):
    """F5 (indexer4.cpp:413-419): the remap's dropped terms become a
    metric instead of silent nulls."""
    from large_scale_hypertextual_search_engine_spark.operators.metrics import (
        missing_term_count,
    )

    tokens = spark.createDataFrame(
        [("a",), ("b",), ("zzz",), ("zzz",)], "term string"
    )
    lexicon = spark.createDataFrame([("a",), ("b",)], "term string")
    assert missing_term_count(tokens, lexicon) == 2
    assert missing_term_count(tokens.filter("term != 'zzz'"), lexicon) == 0


def test_forward_index_remap(spark):
    """J2: forward index carries term_ids remapped through the lexicon,
    positions intact, sorted per doc."""
    from large_scale_hypertextual_search_engine_spark.operators.index_build import (
        build_index,
    )

    docs = spark.createDataFrame(
        [("d1", "alpha beta alpha"), ("d2", "beta gamma")],
        "docid string, content string",
    )
    idx = build_index(docs, mode="simple", stem=False, with_forward_index=True)
    lex = {r["term"]: r["term_id"] for r in idx["lexicon"].collect()}
    fwd = {r["doc_int"]: r["postings"] for r in idx["forward_index_ids"].collect()}
    dmap = {r["docid"]: r["doc_int"] for r in idx["docid_map"].collect()}
    d1 = fwd[dmap["d1"]]
    by_tid = {p["term_id"]: p for p in d1}
    assert by_tid[lex["alpha"]]["freq"] == 2
    assert list(by_tid[lex["alpha"]]["positions"]) == [1, 3]
    assert by_tid[lex["beta"]]["freq"] == 1
    # emission sorted by term_id (deterministic)
    assert [p["term_id"] for p in d1] == sorted(p["term_id"] for p in d1)
