"""Fused build strategy (analyze + SPIMI encode in one pass).

The contract is byte-identity: `strategy="fused"` must produce the
exact artifact set of the salted strategy (the long-golden-tested
reference path) — postings blobs, block metadata, doc_stats,
collection_stats, lexicon — while never materializing the token
table. Also covers the segment machinery the fused path relies on:
gap-splitting at bin-packed file boundaries, the unsorted-input
fallback, zero-token docs, and checkpoint resume of the runs stage.
"""

import shutil

import numpy as np
import pytest
from pyspark.sql import Row, functions as F

from large_scale_hypertextual_search_engine_spark.operators.index_build import (
    _GAP_SPLIT,
    _spimi_chunk_stream,
    build_index,
)
from large_scale_hypertextual_search_engine_spark.plans.lineage import (
    build_and_save_index,
    load_index,
    stage_meta,
)
from large_scale_hypertextual_search_engine_spark.sources.corpus import (
    synthetic_code_corpus,
)


def _build(spark, docs, strat, tmp_path, fp="fp1"):
    out = str(tmp_path / strat)
    shutil.rmtree(out, ignore_errors=True)
    build_and_save_index(
        docs, out, fingerprint=fp, mode="compat", stem=True, strategy=strat
    )
    return out


def _artifacts(spark, out):
    p = spark.read.parquet(f"{out}/postings").orderBy("term")
    return {
        "postings": p.select("term", "df", "tf", "postings").collect(),
        "blocks": {r["term"]: r["blocks"] for r in p.select("term", "blocks").collect()},
        "doc_stats": sorted(
            map(tuple, spark.read.parquet(f"{out}/doc_stats").collect())
        ),
        "coll": spark.read.parquet(f"{out}/collection_stats").collect(),
        "lexicon": spark.read.parquet(f"{out}/lexicon").orderBy("term").collect(),
    }


@pytest.fixture(scope="module")
def corpus(spark):
    docs = synthetic_code_corpus(spark, 2000, seed=42, max_tokens=200).select(
        "docid", "content"
    )
    # zero-token doc must appear in doc_stats with doc_len 0
    return docs.union(
        spark.createDataFrame([Row(docid="zz/empty:doc@0", content="")])
    )


def test_fused_byte_identical_to_salted_and_spimi(spark, corpus, tmp_path):
    arts = {
        s: _artifacts(spark, _build(spark, corpus, s, tmp_path))
        for s in ("salted", "spimi", "fused")
    }
    for s in ("spimi", "fused"):
        for k in ("postings", "blocks", "doc_stats", "coll", "lexicon"):
            assert arts[s][k] == arts["salted"][k], (s, k)


def test_fused_never_materializes_tokens(spark, corpus, tmp_path):
    out = _build(spark, corpus, "fused", tmp_path)
    import os

    assert not os.path.exists(f"{out}/tokens")
    # the docs_ids content checkpoint (a second corpus copy) is also
    # skipped: docid_map + runs are the fused graph's checkpoints
    assert not os.path.exists(f"{out}/docs_ids")
    assert os.path.exists(f"{out}/runs")
    # runs checkpoint is partitioned by kind for consumer-side pruning
    assert os.path.exists(f"{out}/runs/kind=0")
    assert os.path.exists(f"{out}/runs/kind=1")


def test_fused_doc_stats_includes_zero_token_doc(spark, corpus, tmp_path):
    out = _build(spark, corpus, "fused", tmp_path)
    ds = spark.read.parquet(f"{out}/doc_stats")
    row = ds.filter(F.col("docid") == "zz/empty:doc@0").collect()
    assert len(row) == 1 and row[0]["doc_len"] == 0


def test_fused_queryable_via_load_index(spark, corpus, tmp_path):
    from large_scale_hypertextual_search_engine_spark.operators.query import search

    out = _build(spark, corpus, "fused", tmp_path)
    idx = load_index(spark, out)
    hits = search(idx, ["return"], top_k=5).collect()
    assert len(hits) == 5 and hits[0]["score"] > 0


def test_fused_runs_stage_resumes(spark, corpus, tmp_path):
    out = str(tmp_path / "resume")
    build_and_save_index(
        corpus, out, fingerprint="R1", mode="compat", stem=True, strategy="fused"
    )
    wall1 = stage_meta(f"{out}/runs")["wall_ms"]
    import time

    t0 = time.time()
    build_and_save_index(
        corpus, out, fingerprint="R1", mode="compat", stem=True, strategy="fused"
    )
    # resumed build must skip the analyze pass entirely
    assert (time.time() - t0) * 1000 < max(2000, wall1)
    assert stage_meta(f"{out}/runs")["wall_ms"] == wall1


def test_fused_rejects_forward_index(spark, corpus, tmp_path):
    with pytest.raises(ValueError, match="forward_index"):
        build_and_save_index(
            corpus,
            str(tmp_path / "fwd"),
            fingerprint="F1",
            strategy="fused",
            with_forward_index=True,
        )


def test_spimi_identity_on_scrambled_layout(spark, tmp_path):
    """Arbitrary (non-range) doc layouts take the unsorted-mode path
    and must still match the salted output bit-for-bit."""
    docs = synthetic_code_corpus(spark, 800, seed=7, max_tokens=120).select(
        "docid", "content"
    )
    scrambled = docs.repartition(8, F.xxhash64("docid"))
    a = (
        build_index(scrambled, strategy="salted")["postings"]
        .orderBy("term")
        .select("term", "df", "tf", "postings")
        .collect()
    )
    b = (
        build_index(scrambled, strategy="spimi")["postings"]
        .orderBy("term")
        .select("term", "df", "tf", "postings")
        .collect()
    )
    assert a == b


def _stream_runs(tuples, chunk_rows=10_000):
    import pyarrow as pa

    out = []
    for rb in _spimi_chunk_stream(iter(tuples), 128, chunk_rows):
        t = pa.Table.from_batches([rb])
        out.extend(
            zip(
                t.column("term").to_pylist(),
                t.column("first_docid").to_pylist(),
                t.column("last_docid").to_pylist(),
                t.column("df").to_pylist(),
            )
        )
    return sorted(out)


def _tuple_of(docs_terms):
    """docs_terms: list of (doc_int, [terms]) -> one chunk-stream tuple."""
    import pyarrow as pa

    terms, doc, dl, tfs, flat = [], [], [], [], []
    for d, ts in docs_terms:
        for i, t in enumerate(ts):
            terms.append(t)
            doc.append(d)
            dl.append(len(ts))
            tfs.append(1)
            flat.append(i + 1)
    return (
        pa.array(terms, pa.string()),
        np.asarray(doc, np.int32),
        np.asarray(dl, np.int32),
        np.asarray(tfs, np.int32),
        np.asarray(flat, np.int32),
    )


def test_chunk_stream_splits_runs_at_docid_gaps():
    """A stream covering two far-apart docid ranges (Spark bin-packing
    several file splits into one partition) must emit one run per
    contiguous segment, NOT one run spanning the gap."""
    seg_a = [(i, ["x", "y"]) for i in range(1, 51)]
    seg_b = [(i, ["x"]) for i in range(100_000, 100_050)]
    runs = _stream_runs([_tuple_of(seg_a + seg_b)])
    x_runs = [r for r in runs if r[0] == "x"]
    assert x_runs == [("x", 1, 50, 50), ("x", 100_000, 100_049, 50)]
    y_runs = [r for r in runs if r[0] == "y"]
    assert y_runs == [("y", 1, 50, 50)]


def test_chunk_stream_merges_within_segment_across_size_flushes():
    """chunk_rows flushes inside ONE contiguous segment are compacted
    back to a single run per term at partition end."""
    seg = [(i, ["x"]) for i in range(1, 2001)]
    runs = _stream_runs([_tuple_of(seg)], chunk_rows=100)
    assert runs == [("x", 1, 2000, 2000)]


def test_chunk_stream_small_gaps_do_not_split():
    """Gaps below _GAP_SPLIT (zero-token docs) stay in one segment."""
    seg = [(i, ["x"]) for i in range(1, 100)] + [
        (i, ["x"]) for i in range(100 + _GAP_SPLIT - 1, 100 + _GAP_SPLIT + 50)
    ]
    runs = _stream_runs([_tuple_of(seg)])
    assert len([r for r in runs if r[0] == "x"]) == 1


def test_chunk_stream_unsorted_mode_yields_correct_runs():
    """Random doc order flips the stream to unsorted mode: runs may
    interval-overlap (decoded downstream) but df totals must hold."""
    rng = np.random.default_rng(0)
    order = rng.permutation(np.arange(1, 1001)).tolist()
    docs = [(d, ["x"]) for d in order]
    runs = _stream_runs([_tuple_of(docs[i : i + 10]) for i in range(0, 1000, 10)])
    assert sum(r[3] for r in runs if r[0] == "x") == 1000
