"""Codec tests: roundtrip fuzz, golden postings.bin parity, run merge."""

import numpy as np
import pytest

from large_scale_hypertextual_search_engine_spark.functions.varbyte import (
    decode_docids,
    decode_postings,
    decode_postings_fast,
    encode_postings,
    encode_run,
    merge_runs,
    vb_decode,
    vb_encode,
)
from golden_utils import REF


def test_vb_roundtrip_fuzz():
    rng = np.random.default_rng(42)
    for _ in range(100):
        vals = rng.integers(0, 2**31, size=int(rng.integers(1, 500)))
        assert (vb_decode(vb_encode(vals)) == vals.astype(np.uint64)).all()


def test_vb_convention():
    # 7-bit little-endian groups, 0x80 set on the FINAL byte
    assert vb_encode(np.array([0])) == bytes([0x80])
    assert vb_encode(np.array([1])) == bytes([0x81])
    assert vb_encode(np.array([127])) == bytes([0xFF])
    assert vb_encode(np.array([128])) == bytes([0x00, 0x81])
    assert vb_encode(np.array([300])) == bytes([0x2C, 0x82])


@pytest.mark.parametrize("d", ["index_dir4pdf", "index_dir4pmc"])
def test_golden_postings_bin_parity(d):
    """Decode every golden term blob; re-encode must be bit-identical."""
    lex = []
    for line in (REF / d / "lexicon.txt").read_text(encoding="utf-8").splitlines():
        p = line.split("\t")
        lex.append((p[1], int(p[2]), int(p[3]), int(p[4]), int(p[5])))
    blob_all = (REF / d / "postings.bin").read_bytes()
    for term, dfreq, tfreq, off, nb in lex:
        chunk = blob_all[off : off + nb]
        docids, tfs, flat = decode_postings(chunk)
        assert len(docids) == dfreq
        assert int(tfs.sum()) == tfreq
        assert (np.diff(docids) > 0).all()
        d2, t2 = decode_postings_fast(chunk)
        assert (d2 == docids).all() and (t2 == tfs).all()
        assert (decode_docids(chunk) == docids).all()
        reblob, _ = encode_postings(docids, tfs, flat)
        assert reblob == chunk, term


def test_merge_runs_equals_direct_encode():
    rng = np.random.default_rng(7)
    for trial in range(60):
        n = int(rng.integers(1, 300))
        docids = np.sort(rng.choice(np.arange(1, 50000), size=n, replace=False))
        tfs = rng.integers(1, 6, size=n)
        flat = np.concatenate(
            [np.sort(rng.choice(np.arange(1, 2000), size=t, replace=False)) for t in tfs]
        )
        full, _ = encode_postings(docids, tfs, flat, block_size=32)
        k = int(rng.integers(1, 5))
        cuts = (
            np.sort(rng.choice(np.arange(1, n), size=min(k, n - 1), replace=False))
            if n > 1
            else np.array([], dtype=int)
        )
        bounds = [0] + list(cuts) + [n]
        firsts, lasts, bodies, blockss = [], [], [], []
        for s, e in zip(bounds[:-1], bounds[1:]):
            fs = int(tfs[:s].sum())
            fe = fs + int(tfs[s:e].sum())
            body, blocks = encode_run(docids[s:e], tfs[s:e], flat[fs:fe], block_size=32)
            firsts.append(int(docids[s]))
            lasts.append(int(docids[e - 1]))
            bodies.append(body)
            blockss.append(blocks)
        merged, mblocks = merge_runs(firsts, bodies, blockss, lasts, n)
        assert merged == full, f"trial {trial}"
        d2, t2, p2 = decode_postings(merged)
        assert (d2 == docids).all() and (t2 == tfs).all() and (p2 == flat).all()
        # block metadata stays consistent: spans in-bounds, last covers end
        assert mblocks[-1][0] == int(docids[-1])
        for (ld, mt, md, o, nb) in mblocks:
            assert 0 < o and o + nb <= len(merged)


def test_block_metadata_spans_decode():
    docids = np.arange(1, 1001) * 3
    tfs = np.full(1000, 2)
    flat = np.arange(1, 2001)
    blob, blocks = encode_postings(
        docids, tfs, flat, block_size=128, doc_lens=np.full(1000, 7)
    )
    assert len(blocks) == 8  # ceil(1000/128)
    assert blocks[-1][0] == 3000
    assert all(b[1] == 2 for b in blocks)
    assert all(b[2] == 7 for b in blocks)  # min_dl carried
    # byte spans tile the body exactly
    total = sum(b[4] for b in blocks)
    assert blocks[0][3] + total == len(blob)


def test_block_assisted_decode_matches_loop():
    """Vectorized (block-offset-assisted) decode == sequential walk for
    random Zipf-ish blobs, both the fast (docids, tfs) and full decode."""
    from large_scale_hypertextual_search_engine_spark.functions.varbyte import (
        decode_postings_fast,
    )

    rng = np.random.default_rng(7)
    for trial in range(20):
        n = int(rng.integers(1, 700))
        docids = np.cumsum(rng.integers(1, 50, size=n))
        tfs = rng.integers(1, 6, size=n).astype(np.int64)
        if trial % 3 == 0:
            tfs[rng.integers(0, n, size=max(1, n // 5))] = 1
        flat = np.concatenate(
            [np.cumsum(rng.integers(1, 9, size=int(t))) for t in tfs]
        )
        bs = int(rng.choice([4, 16, 128, 1024]))
        blob, blocks = encode_postings(docids, tfs, flat, block_size=bs)
        offs = np.array([b[3] for b in blocks], dtype=np.int64)
        d1, t1 = decode_postings_fast(blob)            # loop fallback
        d2, t2 = decode_postings_fast(blob, offs)      # lockstep walk
        assert (d1 == docids).all() and (d2 == docids).all()
        assert (t1 == tfs).all() and (t2 == tfs).all()
        fd, ft, fp = decode_postings(blob, offs)
        assert (fd == docids).all() and (ft == tfs).all() and (fp == flat).all()


def test_block_assisted_decode_bad_offsets_falls_back():
    from large_scale_hypertextual_search_engine_spark.functions.varbyte import (
        decode_postings_fast,
    )

    docids = np.arange(1, 301)
    tfs = np.full(300, 1)
    blob, _ = encode_postings(docids, tfs, docids, block_size=64)
    # offsets that are not group boundaries -> safe fallback, same answer
    d, t = decode_postings_fast(blob, np.array([3, 999999]))
    assert (d == docids).all() and (t == tfs).all()


def test_vb_encode_rejects_oversized_values():
    import pytest as _pytest
    from large_scale_hypertextual_search_engine_spark.functions.varbyte import (
        vb_encode,
    )

    with _pytest.raises(ValueError):
        vb_encode(np.array([1 << 35]))
    assert vb_encode(np.array([(1 << 35) - 1]))  # boundary ok


def test_encode_runs_batched_i32_path_byte_identical():
    """The int32 fast path (bandwidth-halving, used by the spimi encode)
    must produce byte-identical bodies/blocks to the int64 path for any
    fuzzed chunk, and to per-segment encode_run."""
    from large_scale_hypertextual_search_engine_spark.functions.varbyte import (
        encode_runs_batched,
        vb_encode32,
    )

    rng = np.random.default_rng(7)
    for trial in range(20):
        n_runs = int(rng.integers(1, 40))
        doc_parts, tf_parts, pos_parts, dl_parts, seg = [], [], [], [], [0]
        for _ in range(n_runs):
            k = int(rng.integers(1, 300))
            docs = np.sort(
                rng.choice(2**31 - 1 if trial % 4 == 0 else 10_000, k, replace=False)
            ).astype(np.int64)
            tfs = rng.integers(1, 6, size=k).astype(np.int64)
            pos = np.concatenate(
                [np.sort(rng.integers(0, 2**20, size=t)) for t in tfs]
            ).astype(np.int64)
            doc_parts.append(docs)
            tf_parts.append(tfs)
            pos_parts.append(pos)
            dl_parts.append(rng.integers(1, 10_000, size=k).astype(np.int64))
            seg.append(seg[-1] + k)
        doc = np.concatenate(doc_parts)
        tfs = np.concatenate(tf_parts)
        pos = np.concatenate(pos_parts)
        dls = np.concatenate(dl_parts)
        seg = np.array(seg, dtype=np.int64)
        r64 = encode_runs_batched(doc, tfs, pos, dls, seg, 32)
        r32 = encode_runs_batched(
            doc.astype(np.int32), tfs.astype(np.int32),
            pos.astype(np.int32), dls.astype(np.int32), seg, 32,
        )
        assert r64[0] == r32[0]  # bodies
        assert r64[1] == r32[1]  # packed block metadata
        for a, b in zip(r64[2:], r32[2:]):
            assert (np.asarray(a) == np.asarray(b)).all()
            assert np.asarray(b).dtype == np.int64

    vals = rng.integers(0, 2**31, size=5000)
    assert vb_encode32(vals.astype(np.int32)) == vb_encode(vals)
    assert vb_encode32(np.zeros(0, np.int32)) == b""


def test_merge_runs_segmented_matches_merge_runs():
    """Vectorized many-group merge == per-group merge_runs (final mode)
    and == identity for single-run groups (run mode)."""
    from large_scale_hypertextual_search_engine_spark.functions.varbyte import (
        encode_run,
        merge_runs_segmented,
    )

    rng = np.random.default_rng(11)
    for _ in range(15):
        n_groups = int(rng.integers(1, 30))
        firsts, lasts, dfs, bodies, blockss, seg = [], [], [], [], [], [0]
        group_runs = []
        for _g in range(n_groups):
            n_runs = int(rng.integers(1, 6))
            lo = 1
            runs = []
            for _r in range(n_runs):
                k = int(rng.integers(1, 200))
                docs = lo + np.cumsum(rng.integers(1, 50, size=k))
                tfs = rng.integers(1, 5, size=k)
                pos = np.concatenate(
                    [np.sort(rng.integers(0, 5000, size=t)) for t in tfs]
                )
                dls = rng.integers(1, 500, size=k)
                body, blocks = encode_run(docs, tfs, pos, 16, doc_lens=dls)
                runs.append((int(docs[0]), int(docs[-1]), k, body, blocks))
                lo = int(docs[-1]) + 1
            group_runs.append(runs)
            for f, l, k, body, blocks in runs:
                firsts.append(f)
                lasts.append(l)
                dfs.append(k)
                bodies.append(body)
                blockss.append(
                    np.array(
                        [list(b) for b in blocks], dtype=np.int64
                    ).reshape(-1, 5).tobytes()
                )
            seg.append(seg[-1] + n_runs)
        seg = np.array(seg, dtype=np.int64)
        total_dfs = np.add.reduceat(np.array(dfs, np.int64), seg[:-1])
        got_bodies, bm, bounds = merge_runs_segmented(
            seg, np.array(firsts, np.int64), np.array(lasts, np.int64),
            bodies, blockss, total_dfs=total_dfs,
        )
        for gi, runs in enumerate(group_runs):
            want_blob, want_blocks = merge_runs(
                [r[0] for r in runs], [r[3] for r in runs],
                [r[4] for r in runs], [r[1] for r in runs],
                int(total_dfs[gi]),
            )
            assert got_bodies[gi] == want_blob
            got_blocks = [tuple(r) for r in bm[bounds[gi]:bounds[gi + 1]]]
            assert got_blocks == [tuple(b) for b in want_blocks]

        # run mode: single-run groups must pass through untouched
        one_seg = np.arange(len(bodies) + 1, dtype=np.int64)
        rb, rbm, rbounds = merge_runs_segmented(
            one_seg, np.array(firsts, np.int64), np.array(lasts, np.int64),
            bodies, blockss,
        )
        assert rb == bodies
        assert rbm.tobytes() == b"".join(blockss)
