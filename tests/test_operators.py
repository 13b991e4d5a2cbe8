"""Operator tests: dedup kernels, similarity, multimodal, corpus gen."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from large_scale_hypertextual_search_engine_spark.operators.dedup import (
    dedup_exact,
    exact_duplicates,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_near_pairs,
    simhash_udf,
    _shingles,
)
from large_scale_hypertextual_search_engine_spark.operators.similarity import (
    cosine_topk,
    cosine_topk_batch,
    lsh_bucket_topk,
)
from large_scale_hypertextual_search_engine_spark.operators.multimodal import (
    byte_features,
    decode_media,
)
from large_scale_hypertextual_search_engine_spark.sources.corpus import (
    synthetic_code_corpus,
    verify_content_sha,
)


@pytest.fixture(scope="module")
def dup_docs(spark):
    rows = [
        (1, "a b c d e f g h"),
        (2, "a b c d e f g h"),          # exact dup of 1
        (3, "a b c d e f g x"),          # near dup
        (4, "z y x w v u t s"),
        (5, "completely different words here now ok fine"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(spark, dup_docs):
    groups = exact_duplicates(dup_docs, "text", "doc_id").collect()
    assert len(groups) == 1
    assert groups[0]["n_docs"] == 2 and groups[0]["keep_id"] == 1
    kept = dedup_exact(dup_docs, "text", "doc_id")
    assert sorted(r["doc_id"] for r in kept.collect()) == [1, 3, 4, 5]


def test_minhash_estimates_jaccard(spark, dup_docs):
    # exact dups -> identical signatures -> est 1.0
    sigs = {r["doc_id"]: r["sig"] for r in minhash_signatures(dup_docs, num_hashes=64).collect()}
    assert sigs[1] == sigs[2]
    pairs = minhash_lsh_pairs(dup_docs, threshold=0.9).collect()
    assert any(p["id_a"] == 1 and p["id_b"] == 2 and p["est_jaccard"] == 1.0 for p in pairs)
    # python oracle for the signature kernel itself
    from large_scale_hypertextual_search_engine_spark.operators.textstats import hash_token
    rng = np.random.default_rng(42)
    M = (1 << 61) - 1
    A = rng.integers(1, M, size=64, dtype=np.uint64)
    Bv = rng.integers(0, M, size=64, dtype=np.uint64)
    toks = "a b c d e f g h".split()
    sh = _shingles(toks, 3)
    # exact python-int oracle of the universal family (a*h + b) mod p
    expect = [
        min((int(A[i]) * (int(h) % M) + int(Bv[i])) % M for h in sh)
        for i in range(64)
    ]
    assert sigs[1] == expect


def test_modmul61_exact():
    """128-bit split modmul == python-int arithmetic across the range."""
    from large_scale_hypertextual_search_engine_spark.operators.dedup import (
        _modmul61,
    )

    M = (1 << 61) - 1
    rng = np.random.default_rng(3)
    a = rng.integers(0, M, size=5000, dtype=np.uint64)
    h = rng.integers(0, M, size=5000, dtype=np.uint64)
    # include adversarial corners
    corners = np.array([0, 1, 2, M - 1, M - 2, 1 << 60, (1 << 32) - 1],
                       dtype=np.uint64)
    a = np.concatenate([a, corners, corners[::-1]])
    h = np.concatenate([h, corners[::-1], corners])
    got = _modmul61(a, h)
    expect = np.array([(int(x) * int(y)) % M for x, y in zip(a, h)],
                      dtype=np.uint64)
    assert (got == expect).all()


def test_ngram_hot_shingle_cap(spark):
    """A boilerplate shingle shared by every doc must not create the
    quadratic candidate set: with max_gram_df it is dropped before the
    self-join and pairs only form over the distinctive grams."""
    header = "copyright acme corp all rights reserved"
    rows = [(i, f"{header} unique{i} tail{i} x{i} y{i}") for i in range(50)]
    rows += [(100, f"{header} shared shared2 shared3 a b"),
             (101, f"{header} shared shared2 shared3 a b")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = ngram_jaccard_pairs(
        df, n=3, threshold=0.2, max_gram_df=10
    ).collect()
    got = {(p["id_a"], p["id_b"]) for p in pairs}
    assert (100, 101) in got
    # boilerplate-only overlaps are gone entirely
    assert all(p == (100, 101) for p in got)
    # and the candidate explosion never happened: uncapped, the header
    # grams alone would pair all 52 docs (1326 pairs) before filtering
    uncapped = ngram_jaccard_pairs(df, n=3, threshold=0.0, max_gram_df=None)
    assert uncapped.count() > len(got)


def test_simhash_near_dup(spark, dup_docs):
    pairs = simhash_near_pairs(dup_docs, max_hamming=10).collect()
    assert any(p["id_a"] == 1 and p["id_b"] == 2 and p["hamming"] == 0 for p in pairs)


def test_ngram_jaccard_exact_values(spark, dup_docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(dup_docs, n=3, threshold=0.01).collect()
    }
    assert pairs[(1, 2)] == pytest.approx(1.0)
    # docs 1 and 3 share 5 of their 6 trigrams each -> |inter|=5, |union|=7
    assert pairs[(1, 3)] == pytest.approx(5 / 7)


@pytest.fixture(scope="module")
def emb_df(spark):
    rng = np.random.default_rng(0)
    rows = [(i, [float(x) for x in rng.standard_normal(16)]) for i in range(200)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>").cache(), rows


def test_cosine_topk_matches_numpy(spark, emb_df):
    df, rows = emb_df
    q = rows[0][1]
    got = [(r["vec_id"], r["score"]) for r in cosine_topk(df, q, k=5).collect()]
    M = np.array([v for _, v in rows])
    qv = np.array(q)
    sims = (M @ qv) / (np.linalg.norm(M, axis=1) * np.linalg.norm(qv))
    order = sorted(range(len(rows)), key=lambda i: (-sims[i], i))[:5]
    assert [g[0] for g in got] == order
    for (vid, s), i in zip(got, order):
        assert s == pytest.approx(sims[i], rel=1e-9)


def test_cosine_topk_batch_matches_single(spark, emb_df):
    df, rows = emb_df
    Q = np.array([rows[0][1], rows[5][1], rows[9][1]])
    batch = cosine_topk_batch(df, Q, k=5).collect()
    by_q = {}
    for r in batch:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["vec_id"]))
    for qi, qvec in enumerate(Q):
        single = [r["vec_id"] for r in cosine_topk(df, list(qvec), k=5).collect()]
        assert [v for _, v in sorted(by_q[qi])] == single


def test_lsh_bucket_topk_recall(spark, emb_df):
    df, rows = emb_df
    q = rows[0][1]
    got = [r["vec_id"] for r in lsh_bucket_topk(df, q, k=5, n_planes=6).collect()]
    # the query vector itself lives in the probed bucket -> rank 1
    assert got[0] == 0
    exact = [r["vec_id"] for r in cosine_topk(df, q, k=5).collect()]
    assert len(set(got) & set(exact)) >= 2  # multiprobe recall sanity


def test_embedding_cosine_pairs_exact_matches_numpy(spark, emb_df):
    from large_scale_hypertextual_search_engine_spark.operators.dedup import (
        embedding_cosine_pairs,
    )

    df, rows = emb_df
    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_cosine_pairs(
            df, "embedding", "vec_id", threshold=0.5, method="exact"
        ).collect()
    }
    M = np.array([v for _, v in rows])
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    S = Mn @ Mn.T
    want = {
        (i, j): S[i, j]
        for i in range(len(rows))
        for j in range(i + 1, len(rows))
        if S[i, j] >= 0.5
    }
    assert set(got) == set(want)
    for k, v in want.items():
        assert got[k] == pytest.approx(v, rel=1e-9)


def test_embedding_cosine_pairs_lsh_recall(spark):
    """Near-identical vectors (cosine ~0.999) must survive the banded
    sign-bit candidate stage; reported cosines are exact (verify join)."""
    from large_scale_hypertextual_search_engine_spark.operators.dedup import (
        embedding_cosine_pairs,
    )

    rng = np.random.default_rng(7)
    base = rng.standard_normal((20, 32))
    rows = [(i, [float(x) for x in base[i]]) for i in range(20)]
    # ids 100+i are near-dups of i: tiny perturbation
    rows += [
        (100 + i, [float(x) for x in base[i] + 0.01 * rng.standard_normal(32)])
        for i in range(10)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = embedding_cosine_pairs(
        df, "embedding", "vec_id", threshold=0.99, method="lsh",
        n_planes=16, bands=4,
    ).collect()
    found = {(r["id_a"], r["id_b"]) for r in got}
    assert found == {(i, 100 + i) for i in range(10)}
    exact = embedding_cosine_pairs(
        df, "embedding", "vec_id", threshold=0.99, method="exact"
    ).collect()
    want = {(r["id_a"], r["id_b"]): r["cosine"] for r in exact}
    for r in got:
        assert r["cosine"] == pytest.approx(want[(r["id_a"], r["id_b"])], rel=1e-12)


def test_fingerprint_matches_exact_polynomial(spark):
    """The rolling-hash kernel must equal the documented polynomial
    Σ B^i·h(tok) mod 2^61-1 under EXACT integer arithmetic — numpy
    uint64 would wrap acc·B mod 2^64 first (the round-1 minhash bug
    class), silently changing the hash family."""
    from large_scale_hypertextual_search_engine_spark.operators.textstats import (
        fingerprint_udf, hash_token,
    )

    texts = [
        "alpha beta gamma delta " * 50,   # long doc -> acc spans full 61 bits
        "x",
        "",
        "one two",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["fp"]
        for r in df.select(
            "doc_id", fingerprint_udf()(F.col("text")).alias("fp")
        ).collect()
    }
    M, B = (1 << 61) - 1, 1_000_003
    for i, t in enumerate(texts):
        acc = 0
        for tok in t.split(" "):
            if tok:
                acc = (acc * B + hash_token(tok)) % M
        assert got[i] == acc, i


def test_ivf_partitioned_prunes_and_recalls(spark, tmp_path):
    from large_scale_hypertextual_search_engine_spark.operators.similarity import (
        ivf_topk, write_ivf_partitioned,
    )

    rng = np.random.default_rng(3)
    centers = rng.standard_normal((8, 16)) * 4
    rows = []
    for i in range(240):
        c = i % 8
        rows.append((i, [float(x) for x in centers[c] + rng.standard_normal(16)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    path = str(tmp_path / "ivf")
    C = write_ivf_partitioned(df, path, n_centroids=8, seed=11, train_sample=240)
    assert C.shape == (8, 16)

    q = rows[0][1]
    got = ivf_topk(spark, path, q, k=5, nprobe=2)
    # partition pruning: the centroid predicate lands in PartitionFilters
    # (directory-level pruning, before file stats are consulted)
    plan = got._jdf.queryExecution().executedPlan().toString()
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert pf and "centroid_id" in pf[0], plan
    exact = [r["vec_id"] for r in cosine_topk(df, q, k=5).collect()]
    found = [r["vec_id"] for r in got.collect()]
    # clustered data: the query's own cell holds its neighbors
    assert len(set(found) & set(exact)) >= 4


def test_byte_features_and_decode_stub(spark):
    rows = [(1, b"hello world" * 10), (2, bytes(range(256)))]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    feats = {r["media_id"]: r for r in byte_features(df).collect()}
    assert feats[1]["n_bytes"] == 110
    assert feats[2]["byte_entropy"] == pytest.approx(8.0)
    assert len(feats[1]["feature"]) == 16
    dec = decode_media(df, target_size=(8, 8), fake=True).collect()
    assert all(len(r["pixels"]) == 8 * 8 * 3 for r in dec)
    # deterministic: same payload -> same fake pixels
    dec2 = decode_media(df, target_size=(8, 8), fake=True).collect()
    assert {r["media_id"]: bytes(r["pixels"]) for r in dec} == {
        r["media_id"]: bytes(r["pixels"]) for r in dec2
    }
    with pytest.raises(Exception, match="NotImplementedError|codecs"):
        decode_media(df, fake=False).collect()


def test_synthetic_corpus_deterministic(spark):
    a = synthetic_code_corpus(spark, 50, seed=42, max_tokens=80).collect()
    b = synthetic_code_corpus(spark, 50, seed=42, max_tokens=80).collect()
    assert sorted(map(str, a)) == sorted(map(str, b))
    df = synthetic_code_corpus(spark, 50, seed=42, max_tokens=80)
    assert verify_content_sha(df) == 0
    assert df.select("docid").distinct().count() == 50
    # skew terms really are high-df
    toks = df.select(F.explode(F.split("content", " ")).alias("t"))
    the_df = toks.filter(F.col("t") == "the").count()
    assert the_df > 0


def test_decode_media_fake_contract(spark):
    """The fake path's output contract equals the documented real one:
    schema, channel count, buffer length (w*h*3 uint8), determinism."""
    from large_scale_hypertextual_search_engine_spark.operators.multimodal import (
        DECODED_SCHEMA,
    )

    df = spark.createDataFrame(
        [(1, b"\x89PNG-ish"), (2, b"JFIF-ish"), (3, None)],
        "media_id long, payload binary",
    )
    out = decode_media(df, target_size=(8, 6), fake=True)
    assert out.schema == DECODED_SCHEMA
    rows = {r["media_id"]: r for r in out.collect()}
    assert len(rows) == 3
    for r in rows.values():
        assert (r["width"], r["height"], r["channels"]) == (8, 6, 3)
        assert len(r["pixels"]) == 8 * 6 * 3
    # deterministic: same payload -> same pixels on a rerun
    rows2 = {r["media_id"]: r for r in decode_media(
        df, target_size=(8, 6), fake=True
    ).collect()}
    assert all(bytes(rows[k]["pixels"]) == bytes(rows2[k]["pixels"]) for k in rows)
    # real path degrades loudly without the optional codec dep
    try:
        import PIL  # noqa: F401
        has_pil = True
    except ImportError:
        has_pil = False
    if not has_pil:
        with pytest.raises(Exception) as ei:
            decode_media(df, fake=False).collect()
        assert "NotImplementedError" in str(ei.value) or isinstance(
            ei.value, NotImplementedError
        )


def test_lsh_partitioned_table_prunes_and_matches(spark, emb_df, tmp_path):
    """The materialized ANN table is directory-partitioned by bucket;
    a probe scans only the probed dirs and returns the same rows as the
    query-time-bucketed path."""
    from large_scale_hypertextual_search_engine_spark.operators.similarity import (
        lsh_partitioned_topk, write_lsh_partitioned,
    )

    df, rows = emb_df
    path = str(tmp_path / "ann")
    write_lsh_partitioned(df, path, n_planes=6)
    q = rows[0][1]
    got = lsh_partitioned_topk(spark, path, q, k=5, n_planes=6)
    plan = got._jdf.queryExecution().executedPlan().toString()
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert pf and "bucket" in pf[0], plan
    expect = [
        (r["vec_id"], r["score"])
        for r in lsh_bucket_topk(df, q, k=5, n_planes=6).collect()
    ]
    assert [(r["vec_id"], r["score"]) for r in got.collect()] == expect


def test_ivf_training_sample_unbiased_across_partitions(spark):
    """r2 finding: centroid training drew limit(n) — the FIRST partition
    in scan order. With clustered vectors laid out one-cluster-per-
    input-partition, a biased draw would train on a single cluster;
    the bottom-k uniform sample must cover all of them."""
    from large_scale_hypertextual_search_engine_spark.operators.similarity import (
        uniform_vector_sample,
    )

    rng = np.random.default_rng(7)
    centers = rng.standard_normal((4, 8)) * 20
    rows = [
        (c * 1000 + i, [float(x) for x in centers[c] + rng.standard_normal(8)])
        for c in range(4)
        for i in range(300)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).repartitionByRange(4, "vec_id")  # partition boundaries == clusters
    sample = uniform_vector_sample(df, "embedding", 200, seed=5)
    assert 150 <= len(sample) <= 200
    nearest = np.argmax(
        (sample / np.linalg.norm(sample, axis=1, keepdims=True))
        @ (centers / np.linalg.norm(centers, axis=1, keepdims=True)).T,
        axis=1,
    )
    counts = np.bincount(nearest, minlength=4)
    # every cluster represented, none hogging the draw
    assert (counts > 10).all(), counts.tolist()
    # determinism: same seed -> same sample
    sample2 = uniform_vector_sample(df, "embedding", 200, seed=5)
    assert np.array_equal(sample, sample2)


def test_frame_sample_fake_contract(spark):
    """frame_sample's fake path matches the documented real-path
    contract: FRAME_SCHEMA, one frame per every_ms tick of duration_ms,
    w*h*3 rgb24 buffers, deterministic across reruns; the real path
    degrades loudly when PyAV is absent."""
    from large_scale_hypertextual_search_engine_spark.operators.multimodal import (
        FRAME_SCHEMA, frame_sample,
    )

    df = spark.createDataFrame(
        [
            (1, b"VID-A", ("video/mp4", (None, None, 3500, None))),
            (2, b"VID-B", ("video/mp4", (None, None, 900, None))),
        ],
        "media_id long, payload binary, "
        "x struct<mime string, meta struct<width int, height int, "
        "duration_ms int, sample_rate int>>",
    ).select("media_id", "payload", "x.meta")
    out = frame_sample(df, every_ms=1000, fake=True)
    assert out.schema == FRAME_SCHEMA
    rows = sorted(out.collect(), key=lambda r: (r["media_id"], r["frame_idx"]))
    # 3500ms -> frames at 0,1000,2000,3000; 900ms -> one frame at 0
    assert [(r["media_id"], r["frame_idx"], r["ts_ms"]) for r in rows] == [
        (1, 0, 0), (1, 1, 1000), (1, 2, 2000), (1, 3, 3000), (2, 0, 0),
    ]
    for r in rows:
        assert len(r["pixels"]) == r["width"] * r["height"] * 3
    rows2 = sorted(
        frame_sample(df, every_ms=1000, fake=True).collect(),
        key=lambda r: (r["media_id"], r["frame_idx"]),
    )
    assert all(
        bytes(a["pixels"]) == bytes(b["pixels"]) for a, b in zip(rows, rows2)
    )
    try:
        import av  # noqa: F401
        has_av = True
    except ImportError:
        has_av = False
    if not has_av:
        with pytest.raises(Exception) as ei:
            frame_sample(df, fake=False).collect()
        assert "NotImplementedError" in str(ei.value) or isinstance(
            ei.value, NotImplementedError
        )


def test_minhash_stored_equals_in_memory(spark, dup_docs, tmp_path):
    """The persisted-signature path (write sigs -> read back ->
    minhash_pairs_from_signatures) must return exactly the in-memory
    minhash_lsh_pairs result — the fold of the primary queries() entry
    onto the stored twin rests on this equivalence."""
    from large_scale_hypertextual_search_engine_spark.operators.dedup import (
        minhash_pairs_from_signatures,
    )

    want = sorted(
        (r["id_a"], r["id_b"], round(r["est_jaccard"], 12))
        for r in minhash_lsh_pairs(dup_docs, threshold=0.5).collect()
    )
    p = str(tmp_path / "sigs")
    minhash_signatures(dup_docs, "text", "doc_id").write.parquet(p)
    got = sorted(
        (r["id_a"], r["id_b"], round(r["est_jaccard"], 12))
        for r in minhash_pairs_from_signatures(
            spark.read.parquet(p), "doc_id", threshold=0.5
        ).collect()
    )
    assert got == want and len(got) > 0


def test_decode_media_real_stdlib_formats(spark):
    """REAL decode executes in this codec-library-free sandbox: the
    checked-in PNG (all five scanline filters) / BMP (bottom-up,
    padded) / PPM fixtures — encoded by an independent spec-following
    generator (tests/data/make_fixtures.py) — must decode pixel-exact
    through the Spark decode_media path with fake=False."""
    from pathlib import Path

    from tests.data.make_fixtures import (
        encode_bmp, encode_png, encode_ppm, pattern,
    )

    d = Path(__file__).parent / "data"
    px = pattern()
    payloads = {
        1: (d / "sample.png").read_bytes(),
        2: (d / "sample.bmp").read_bytes(),
        3: (d / "sample.ppm").read_bytes(),
    }
    # checked-in fixtures match the generator (guards silent drift)
    assert payloads[1] == encode_png(px)
    assert payloads[2] == encode_bmp(px)
    assert payloads[3] == encode_ppm(px)

    df = spark.createDataFrame(
        list(payloads.items()), "media_id long, payload binary"
    )
    out = {
        r["media_id"]: r
        for r in decode_media(df, target_size=(7, 5), fake=False).collect()
    }
    for mid in payloads:
        r = out[mid]
        assert (r["width"], r["height"], r["channels"]) == (7, 5, 3)
        assert bytes(r["pixels"]) == px.tobytes(), mid

    # nearest-neighbor resize path: downsample shape + determinism
    small = {
        r["media_id"]: bytes(r["pixels"])
        for r in decode_media(df, target_size=(3, 2), fake=False).collect()
    }
    assert all(len(v) == 3 * 2 * 3 for v in small.values())
    # all three fixtures hold the same image -> identical resized pixels
    assert len(set(small.values())) == 1


def test_decode_stdlib_gray_and_rgba_png(spark):
    """Color-type coverage: 8-bit greyscale expands to RGB; RGBA drops
    alpha."""
    import struct
    import zlib

    import numpy as np

    from large_scale_hypertextual_search_engine_spark.operators.multimodal import (
        _decode_image_stdlib,
    )

    def png(px, color_type):
        h, w = px.shape[:2]
        ch = 1 if color_type == 0 else 4

        def chunk(ctype, data):
            return (
                struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
            )

        raw = b"".join(
            b"\x00" + px[y].reshape(-1).astype(np.uint8).tobytes()
            for y in range(h)
        )
        ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
        return (
            b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
        )

    gray = np.arange(12, dtype=np.uint8).reshape(3, 4)
    got = _decode_image_stdlib(png(gray, 0))
    assert got.shape == (3, 4, 3)
    assert np.array_equal(got, np.repeat(gray[:, :, None], 3, axis=2))

    rgba = np.arange(3 * 4 * 4, dtype=np.uint8).reshape(3, 4, 4)
    got = _decode_image_stdlib(png(rgba, 6))
    assert np.array_equal(got, rgba[:, :, :3])


def test_decode_jpeg_stdlib_pixel_exact(spark):
    """Baseline JPEG decodes for REAL in this codec-free sandbox (r4
    'What's missing' #3): the checked-in fixtures — encoded by the
    independent generator in tests/data/make_fixtures.py — must decode
    pixel-EXACT against the expected images that generator computed
    through its own literal quadruple-loop IDCT (the engine decoder
    uses a vectorized matrix IDCT; agreeing to the pixel proves both
    implement the decode spec). Covers 4:4:4, 4:2:0 with restart
    markers, and grayscale, all at a non-multiple-of-16 size."""
    from pathlib import Path

    import numpy as np

    from large_scale_hypertextual_search_engine_spark.operators.multimodal import (
        _decode_image_stdlib,
    )
    from tests.data.make_fixtures import encode_jpeg, pattern

    d = Path(__file__).parent / "data"
    jpx = pattern(17, 13)
    for name, kw in (
        ("444", dict(subsample="444")),
        ("420", dict(subsample="420", restart=2)),
        ("gray", dict(gray=True)),
    ):
        data = (d / f"sample_{name}.jpg").read_bytes()
        expected = np.load(d / f"sample_{name}_expected.npy")
        # checked-in fixtures match the generator (guards silent drift)
        gen_data, gen_exp = encode_jpeg(jpx, **kw)
        assert data == gen_data, name
        assert np.array_equal(expected, gen_exp), name
        got = _decode_image_stdlib(data)
        assert got is not None, name
        assert got.shape == (13, 17, 3), name
        assert np.array_equal(got, expected), (
            name,
            int(np.abs(got.astype(int) - expected.astype(int)).max()),
        )


def test_decode_jpeg_through_decode_media(spark):
    """The JPEG path runs through the Spark decode_media kernel
    (fake=False) end to end, and unsupported variants still degrade to
    None -> NotImplementedError rather than a wrong answer."""
    from pathlib import Path

    import numpy as np

    from large_scale_hypertextual_search_engine_spark.operators.multimodal import (
        _decode_jpeg,
    )

    d = Path(__file__).parent / "data"
    payloads = {
        1: (d / "sample_444.jpg").read_bytes(),
        2: (d / "sample_420.jpg").read_bytes(),
    }
    df = spark.createDataFrame(
        list(payloads.items()), "media_id long, payload binary"
    )
    out = {
        r["media_id"]: r
        for r in decode_media(df, target_size=(17, 13), fake=False).collect()
    }
    for mid in payloads:
        exp = np.load(
            d / f"sample_{'444' if mid == 1 else '420'}_expected.npy"
        )
        got = np.frombuffer(
            bytes(out[mid]["pixels"]), dtype=np.uint8
        ).reshape(13, 17, 3)
        assert np.array_equal(got, exp), mid
    # a progressive SOF2 frame is out of scope -> None (fall-through)
    prog = bytearray(payloads[1])
    i = prog.index(b"\xff\xc0")
    prog[i + 1] = 0xC2
    assert _decode_jpeg(bytes(prog)) is None
