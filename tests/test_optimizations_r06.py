"""Focused tests for round-6 optimization internals.

Each optimization that changed an operator's internals gets a direct
parity test here (on top of the existing end-to-end identity suites):
the WAND single-term vectorized fast path, the prefix-less slice fast
decode, the lazy index mapping, the slab-batched minhash kernel, and
the conditional fan-out.
"""

import heapq

import numpy as np
import pytest
from pyspark.sql import functions as F

from large_scale_hypertextual_search_engine_spark.functions.bm25 import K1, B
from large_scale_hypertextual_search_engine_spark.functions.varbyte import (
    decode_run_slice,
    decode_run_slice_fast,
    encode_postings,
)
from large_scale_hypertextual_search_engine_spark.operators.wand import (
    _single_term_topk,
    wand_topk_kernel,
)


def _random_postings(rng, n_docs, max_tf=4, block_size=8):
    docids = np.sort(
        rng.choice(np.arange(1, n_docs * 3), size=n_docs, replace=False)
    ).astype(np.int64)
    tfs = rng.integers(1, max_tf + 1, size=n_docs).astype(np.int64)
    flat = np.concatenate(
        [np.sort(rng.integers(1, 500, size=t)) for t in tfs]
    ).astype(np.int64)
    dls = rng.integers(5, 200, size=n_docs).astype(np.int64)
    blob, blocks = encode_postings(docids, tfs, flat, block_size, doc_lens=dls)
    return docids, tfs, blob, blocks, dls


def test_decode_run_slice_fast_matches_full_decode():
    rng = np.random.default_rng(11)
    docids, tfs, blob, blocks = _random_postings(rng, 300)[:4]
    # strip the df count prefix: slice decoders operate on run bodies
    from large_scale_hypertextual_search_engine_spark.functions.varbyte import (
        _first_vb_len,
    )

    head = _first_vb_len(blob)
    body = blob[head:]
    offs = np.array([b[3] - head for b in blocks], dtype=np.int64)
    d_full, t_full, _pos = decode_run_slice(body, offs, base=0)
    d_fast, t_fast = decode_run_slice_fast(body, offs, base=0)
    assert np.array_equal(d_full, d_fast)
    assert np.array_equal(t_full, t_fast)
    assert np.array_equal(d_full, docids)
    assert np.array_equal(t_full, tfs)


def _reference_single_term(idf, docids, tfs, doc_len, avg_dl, top_k,
                           tf_mode, doc_lo, doc_hi, deleted):
    """Independent heap reference with the loop kernel's exact
    arithmetic and (score desc, doc_int asc) tie handling."""
    fb = 1.0 - B
    heap = []
    hi = doc_hi if doc_hi is not None else 1 << 62
    for d, tf in zip(docids.tolist(), tfs.tolist()):
        if d < doc_lo or d >= hi:
            continue
        if deleted is not None and deleted[d - doc_lo]:
            continue
        dl = float(doc_len[d - doc_lo])
        norm = K1 * (fb + B * (dl / avg_dl))
        tfe = 1.0 if tf_mode == "compat" else float(tf)
        score = idf * ((K1 + 1.0) * tfe) / (norm + tfe)
        entry = (score, -d)
        if len(heap) < top_k:
            heapq.heappush(heap, entry)
        elif entry > heap[0]:
            heapq.heapreplace(heap, entry)
    out = sorted(heap, key=lambda e: (-e[0], -e[1]))
    return [(-d, s) for s, d in out]


@pytest.mark.parametrize("tf_mode", ["true", "compat"])
@pytest.mark.parametrize("shard", [None, (100, 400)])
def test_single_term_fast_path_matches_reference(tf_mode, shard):
    rng = np.random.default_rng(7)
    docids, tfs, blob, blocks, dls = _random_postings(rng, 250)
    from large_scale_hypertextual_search_engine_spark.functions.varbyte import (
        _first_vb_len,
    )

    head = _first_vb_len(blob)
    body = blob[head:]
    bl = [(b[0], b[1], b[2], b[3] - head, b[4]) for b in blocks]
    idf = 1.37
    n_max = int(docids.max()) + 1
    avg_dl = 55.0
    if shard is None:
        doc_lo, doc_hi = 0, None
        doc_len = np.full(n_max, float(int(avg_dl)))
        doc_len[docids] = dls
        deleted = None
    else:
        doc_lo, doc_hi = shard
        span = doc_hi - doc_lo
        doc_len = np.full(span + 1, float(int(avg_dl)))
        m = (docids >= doc_lo) & (docids < doc_hi)
        doc_len[docids[m] - doc_lo] = dls[m]
        deleted = np.zeros(span + 1, dtype=bool)
        deleted[docids[m][::3] - doc_lo] = True  # tombstone every 3rd
    row = (idf, body, bl, 0)
    got = _single_term_topk(
        row, doc_len, avg_dl, 10, tf_mode, K1, B, doc_lo, doc_hi, deleted
    )
    # via the kernel dispatcher too
    got2 = wand_topk_kernel(
        [row], doc_len, n_max, avg_dl, 10, tf_mode, K1, B,
        doc_lo=doc_lo, doc_hi=doc_hi, deleted=deleted,
    )
    ref_dl = doc_len
    want = _reference_single_term(
        idf, docids, tfs, ref_dl, avg_dl, 10, tf_mode, doc_lo, doc_hi,
        deleted,
    )
    assert got == want
    assert got2 == want


def test_lazy_index_resolves_on_access(spark):
    from large_scale_hypertextual_search_engine_spark.operators.index_build import (
        _LazyIndex,
    )

    calls = []
    li = _LazyIndex()
    li["a"] = 1
    li._lazy("lex", lambda: calls.append(1) or "built")
    assert "lex" in li and not calls  # membership does not build
    assert li.get("missing", "d") == "d"
    assert li["lex"] == "built" and calls == [1]
    assert li["lex"] == "built" and calls == [1]  # memoized
    li2 = _LazyIndex()
    li2._lazy("lex", lambda: calls.append(2) or "built")
    li2["lex"] = "overridden"  # setitem cancels the thunk
    assert li2["lex"] == "overridden" and calls == [1]


def test_minhash_slab_kernel_matches_per_doc_reference(spark):
    """The slab-batched segmented-min kernel must be value-identical to
    the straightforward per-doc (H, S) matrix formulation."""
    from large_scale_hypertextual_search_engine_spark.operators.dedup import (
        _MERSENNE,
        _modmul61,
        _shingles,
        minhash_signatures,
    )

    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(40)]
    texts = [
        " ".join(rng.choice(vocab, size=int(rng.integers(0, 30))))
        for _ in range(50)
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["sig"]
        for r in minhash_signatures(df, "text", "doc_id", 16, 3, 42).collect()
    }
    # NB: the operator draws A then B from ONE generator stream
    g = np.random.default_rng(42)
    A = g.integers(1, int(_MERSENNE), size=16, dtype=np.uint64)
    Bv = g.integers(0, int(_MERSENNE), size=16, dtype=np.uint64)
    for i, t in enumerate(texts):
        toks = [x for x in t.split(" ") if x]
        sh = _shingles(toks, 3)
        if sh.size == 0:
            assert got[i] == [0] * 16
            continue
        h = np.broadcast_to(sh, (16, sh.size))
        a = np.broadcast_to(A[:, None], h.shape)
        vals = _modmul61(a, h) + Bv[:, None]
        vals = np.where(vals >= _MERSENNE, vals - _MERSENNE, vals)
        want = [int(v) for v in vals.min(axis=1)]
        assert got[i] == want, i


def test_fan_out_identity_when_wide_enough(spark):
    from large_scale_hypertextual_search_engine_spark.operators.fanout import (
        fan_out,
    )

    par = spark.sparkContext.defaultParallelism
    narrow = spark.range(100).coalesce(1)
    assert fan_out(narrow).rdd.getNumPartitions() == par
    wide = spark.range(1000).repartition(par + 4)
    assert fan_out(wide) is wide
