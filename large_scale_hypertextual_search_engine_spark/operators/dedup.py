"""Deduplication operators for training-data pipelines.

Four families, all shuffle-frugal:

* exact        — hash-groupBy on a content digest (one shuffle).
* minhash_lsh  — shingle -> minhash signature (Arrow kernel) -> banded
                 bucket join (candidate pairs only, never the cross
                 product) -> exact-Jaccard verify.
* simhash      — 64-bit weighted-projection fingerprint; near-dups =
                 small Hamming distance within rotation buckets.
* ngram_jaccard— exact shingle-set Jaccard for candidate pairs
                 (explode + self-join on shingle, count / union).
* embedding    — cosine near-dup over an embedding column: exact
                 all-pairs baseline, or sign-bit-banded hyperplane LSH
                 candidates with exact cosine verify (the scale path).

The token hash is the process-stable FNV from textstats (no reliance on
Python's randomized hash()), so results are reproducible cluster-wide.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import ArrayType, LongType

from .textstats import hash_token

_MERSENNE = np.uint64((1 << 61) - 1)

# minhash signature caches, bounded like operators.ids._LIVE_CACHES:
# re-entry releases the oldest so repeated dedup runs in one session
# (or per-micro-batch streaming use) can't accumulate pinned datasets.
_LIVE_SIG_CACHES: list[DataFrame] = []
_MAX_LIVE_SIGS = 2


def _modmul61(a: np.ndarray, h: np.ndarray) -> np.ndarray:
    """(a * h) mod (2^61 - 1) with full 128-bit precision, in uint64.

    numpy uint64 multiply wraps mod 2^64, which silently breaks the
    universal-hash guarantee (round-1 finding). Split a = a_hi*2^32 +
    a_lo, reduce each partial product with the Mersenne identity
    2^61 ≡ 1 (mod p): for x < 2^64, x mod p = (x >> 61) + (x & p),
    folded once more to land in [0, p).
    Inputs must already be < p (31 bits of headroom per partial).
    """
    p = _MERSENNE

    def fold(x: np.ndarray) -> np.ndarray:
        x = (x >> np.uint64(61)) + (x & p)
        return np.where(x >= p, x - p, x)

    a_hi = a >> np.uint64(32)
    a_lo = a & np.uint64(0xFFFFFFFF)
    # a_hi * h < 2^29 * 2^61: overflows, so reduce h*a_hi in two steps:
    # (a_hi * h) * 2^32 mod p = fold(a_hi * fold-able pieces). Use
    # (a_hi * h_hi) * 2^64 + mixed terms — simpler: reduce via two
    # 32-bit splits of h as well.
    h_hi = h >> np.uint64(32)
    h_lo = h & np.uint64(0xFFFFFFFF)
    # partials, each < 2^64: hi*hi needs 2^64 ≡ 2^3 (mod p)
    t_hh = fold(a_hi * h_hi)                      # * 2^64 ≡ * 8
    t_mid = fold(a_hi * h_lo + a_lo * h_hi)       # * 2^32
    t_ll = fold(a_lo * h_lo)
    acc = fold(t_hh * np.uint64(8))
    # t_mid * 2^32 mod p: t_mid < p < 2^61, split again
    m_hi = t_mid >> np.uint64(29)                 # * 2^61 ≡ * 1
    m_lo = (t_mid & np.uint64((1 << 29) - 1)) << np.uint64(32)
    acc = fold(acc + m_hi + m_lo)
    return fold(acc + t_ll)


# fan-out before the CPU-heavy signature kernels: a 6 MB parquet scans
# as 2 splits, so the kernel ran 2-wide on 32 cores (23 s vs 2 s)
from .fanout import fan_out as _fan_out


def exact_duplicates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    min_group_size: int = 2,
) -> DataFrame:
    """Groups of byte-identical docs: (digest, n_docs, keep_id).

    keep_id = min id (the canonical representative to retain).
    """
    return (
        df.select(F.col(id_col), F.md5(F.col(text_col)).alias("digest"))
        .groupBy("digest")
        .agg(
            F.count("*").alias("n_docs"),
            F.min(id_col).alias("keep_id"),
        )
        .filter(F.col("n_docs") >= min_group_size)
    )


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Return df with only the canonical row per exact-duplicate group.

    window-free formulation: min(id) per digest, semi-join back — two
    shuffles on the digest, no global sort.
    """
    keep = (
        df.select(F.col(id_col), F.md5(F.col(text_col)).alias("digest"))
        .groupBy("digest")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    return df.join(keep, id_col, "left_semi")


_SHINGLE_BASE = np.uint64(1_000_003)


def _shingles(tokens: list[str], k: int) -> np.ndarray:
    """uint64 hashes (< 2^61-1) of the k-token shingles of ``tokens``.

    Vectorized: per-token FNV hashes (memoized — Zipf reuse) combined
    into shingle hashes by a k-step rolling polynomial
    S[i] = Σ_j B^(k-1-j)·h(tok[i+j]) mod p, all in exact
    :func:`_modmul61` array ops — no per-shingle string building, no
    per-shingle byte loop. Docs shorter than k collapse to one shingle
    over all their tokens (same shape as before)."""
    if not tokens:
        return np.empty(0, dtype=np.uint64)
    th = np.array([hash_token(t) for t in tokens], dtype=np.uint64)
    return _shingles_from_hashes(th, k)


def _shingles_batch(th_list: list, k: int) -> list:
    """Per-doc shingle-hash arrays for MANY docs in one vectorized
    rolling pass (guide §4.2: ~75 tiny numpy dispatches per doc in
    :func:`_shingles` dominated the signature kernel). Docs with >= k
    tokens share one concatenated recurrence — windows that straddle a
    doc boundary are computed and discarded by mask, so every kept
    value sees exactly the ops :func:`_shingles` applies (elementwise
    _modmul61 → bit-identical); docs shorter than k keep the per-doc
    collapsed-shingle path (rare)."""
    n = len(th_list)
    out: list = [None] * n
    long_idx = []
    for i, th in enumerate(th_list):
        if th.size == 0:
            out[i] = np.empty(0, dtype=np.uint64)
        elif th.size < k:
            out[i] = _shingles_from_hashes(th, k)
        else:
            long_idx.append(i)
    if not long_idx:
        return out
    lens = np.fromiter(
        (th_list[i].size for i in long_idx), np.int64, len(long_idx)
    )
    total = int(lens.sum())
    th_all = np.concatenate(
        [th_list[i] for i in long_idx]
        + [np.zeros(k - 1, dtype=np.uint64)]
    )
    acc = np.zeros(total, dtype=np.uint64)
    base = np.broadcast_to(_SHINGLE_BASE, (total,))
    for j in range(k):
        acc = _modmul61(base, acc) + th_all[j : j + total]
        acc = np.where(acc >= _MERSENNE, acc - _MERSENNE, acc)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    pos_in_doc = np.arange(total, dtype=np.int64) - np.repeat(starts, lens)
    w = lens - k + 1  # valid windows per doc
    acc_valid = acc[pos_in_doc < np.repeat(w, lens)]
    vb = np.concatenate(([0], np.cumsum(w)))
    for j, i in enumerate(long_idx):
        out[i] = acc_valid[vb[j] : vb[j + 1]]
    return out


def _shingles_from_hashes(th: np.ndarray, k: int) -> np.ndarray:
    """:func:`_shingles`' rolling polynomial over precomputed token
    hashes (shared by the batched and per-doc paths)."""
    kk = min(k, th.size)
    n_out = th.size - kk + 1
    acc = np.zeros(n_out, dtype=np.uint64)
    base = np.broadcast_to(_SHINGLE_BASE, (n_out,))
    for j in range(kk):
        acc = _modmul61(base, acc) + th[j : j + n_out]
        acc = np.where(acc >= _MERSENNE, acc - _MERSENNE, acc)
    return acc


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    shingle_k: int = 3,
    seed: int = 42,
) -> DataFrame:
    """(id, sig: array<long>) — minhash over k-token shingles.

    The kernel is one Arrow-batched pandas UDF doing the whole
    shingle -> hash -> min reduction in numpy: sig[i] = min over
    shingles of (a_i * h + b_i mod p). No shuffle; scales linearly.
    """
    rng = np.random.default_rng(seed)
    A = rng.integers(1, int(_MERSENNE), size=num_hashes, dtype=np.uint64)
    Bv = rng.integers(0, int(_MERSENNE), size=num_hashes, dtype=np.uint64)

    df = _fan_out(df)

    @F.pandas_udf(ArrayType(LongType()))
    def _sig(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        # permuted hashes under the true universal family (a*h + b) mod
        # (2^61-1), 128-bit-exact split multiply — computed over SLABS
        # of many docs' concatenated shingles with a segmented
        # minimum.reduceat per doc, instead of one small (H, S) matrix
        # per doc (guide §4.2: per-doc numpy dispatch overhead dwarfed
        # the arithmetic; values are bit-identical — same modmul inputs,
        # same min sets).
        # slab sized to keep one (H, slab) uint64 matrix and its
        # _modmul61 temporaries inside per-core cache: 64 x 4096 x 8 B
        # = 2 MB per temporary. A 256k slab was memory-bandwidth bound
        # with 32 concurrent workers (measured 5x slower than per-doc).
        SLAB = 1 << 12
        for batch in it:
            n = len(batch)
            out: list = [None] * n
            sh_parts: list = []
            doc_idx: list = []
            th_list = [
                np.array(
                    [
                        hash_token(t)
                        for t in (text or "").split(" ")
                        if t
                    ],
                    dtype=np.uint64,
                )
                for text in batch
            ]
            for i, sh in enumerate(_shingles_batch(th_list, shingle_k)):
                if sh.size == 0:
                    out[i] = [0] * num_hashes
                else:
                    sh_parts.append(sh)
                    doc_idx.append(i)
            if sh_parts:
                lens = np.fromiter(
                    (s.size for s in sh_parts), np.int64, len(sh_parts)
                )
                allsh = np.concatenate(sh_parts)
                bounds = np.concatenate(([0], np.cumsum(lens)))
                res = np.empty((len(sh_parts), num_hashes), np.uint64)
                d0 = 0
                while d0 < len(sh_parts):
                    d1 = d0 + 1
                    while (
                        d1 < len(sh_parts)
                        and bounds[d1 + 1] - bounds[d0] <= SLAB
                    ):
                        d1 += 1
                    seg = allsh[bounds[d0] : bounds[d1]]
                    h = np.broadcast_to(seg, (num_hashes, seg.size))
                    a = np.broadcast_to(A[:, None], h.shape)
                    vals = _modmul61(a, h) + Bv[:, None]
                    vals = np.where(
                        vals >= _MERSENNE, vals - _MERSENNE, vals
                    )
                    cuts = bounds[d0:d1] - bounds[d0]
                    res[d0:d1] = np.minimum.reduceat(vals, cuts, axis=1).T
                    d0 = d1
                for j, i in enumerate(doc_idx):
                    out[i] = res[j].astype(np.int64).tolist()
            yield pd.Series(out)

    return df.select(F.col(id_col), _sig(F.col(text_col)).alias("sig"))


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.8,
    seed: int = 42,
) -> DataFrame:
    """Near-duplicate pairs via banded LSH: (id_a, id_b, est_jaccard).

    Shuffles: one on (band, band_hash) for the bucket join, one for pair
    dedup. Candidate generation is |buckets| bound, never O(n^2); the
    estimated Jaccard (signature agreement rate) filters at `threshold`.
    """
    sigs = minhash_signatures(
        df, text_col, id_col, num_hashes, shingle_k, seed
    ).cache()
    _LIVE_SIG_CACHES.append(sigs)
    while len(_LIVE_SIG_CACHES) > _MAX_LIVE_SIGS:
        _LIVE_SIG_CACHES.pop(0).unpersist()
    return minhash_pairs_from_signatures(
        sigs, id_col, num_hashes=num_hashes, bands=bands, threshold=threshold
    )


def minhash_pairs_from_signatures(
    sigs: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
) -> DataFrame:
    """Banded-LSH candidate pairs + est_jaccard from a PRECOMPUTED
    ``(id, sig)`` frame (e.g. a persisted signature table — the shape a
    100 TB pipeline stores anyway so re-dedup never re-shingles). The
    banding/est_jaccard half is relational, so a stored signature table
    makes this path oracle-checkable in SQL even though the signature
    kernel itself is not SQL-expressible."""
    rows_per_band = num_hashes // bands
    # band key = xxhash64 over the slice's long elements DIRECTLY (plus
    # the band index): hashing columns natively replaces the previous
    # array<string>/string double cast, which built and hashed 16 small
    # strings per row. Any hash works here — candidates are defined by
    # slice equality (equal slices hash equal under every function; a
    # 64-bit collision can only ADD a candidate, at ~2^-64, and the
    # est_jaccard filter still applies) — the DuckDB oracle checks the
    # slice-equality semantics, not the hash value.
    banded = sigs.select(
        F.col(id_col),
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        F.lit(b),
                        *[
                            F.col("sig")[b * rows_per_band + i]
                            for i in range(rows_per_band)
                        ],
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band", "band_hash"),
    )
    # candidate pair IDs only — the 128-long signatures must NOT ride
    # through the bucket join + distinct (a hot band bucket with B docs
    # emits B^2/2 rows; shipping 1 KB of sig per row made THAT shuffle
    # the whole job's cost). The deduped pair set re-joins the (small)
    # signatures frame — broadcast-sized up to ~10M docs per executor
    # memory, hash join beyond.
    left = banded.select(F.col(id_col).alias("id_a"), "band", "band_hash")
    right = banded.select(F.col(id_col).alias("id_b"), "band", "band_hash")
    # the bucket self-join must NOT broadcast: both sides are the same
    # size (rows x bands), and the planner's estimate sat under the
    # session broadcast threshold — building an 800k-row hash relation
    # on the driver cost more than the join itself (measured 7.5 s ->
    # 3.4 s). shuffle_hash keeps a per-partition build, the right
    # strategy at every scale for an equal-sided equi-join.
    pair_ids = (
        left.hint("shuffle_hash").join(right, ["band", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    pairs = pair_ids.join(
        sigs.select(F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a")), "id_a"
    ).join(
        sigs.select(F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b")), "id_b"
    )
    agree = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda a, b: (a == b).cast("int")),
            lambda x: x == 1,
        )
    )
    return (
        pairs.withColumn("est_jaccard", agree / F.lit(num_hashes))
        .filter(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )


def simhash_udf(num_bits: int = 64):
    """64-bit SimHash over tokens (Arrow kernel): sign of the sum of
    per-token bit projections, weighted by token frequency."""

    bit_shifts = np.arange(num_bits, dtype=np.uint64)

    @F.pandas_udf(LongType())
    def _simhash(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for batch in it:
            out = np.zeros(len(batch), dtype=np.int64)
            for i, text in enumerate(batch):
                toks = [t for t in (text or "").split(" ") if t]
                if not toks:
                    continue
                uniq, counts = np.unique(np.array(toks), return_counts=True)
                # one (U, num_bits) outer unpack of the token hashes
                # instead of a per-token Python loop (r2 advice):
                # acc[b] = Σ_tok ±count by bit b of hash(tok)
                hs = np.array([hash_token(t) for t in uniq], dtype=np.uint64)
                bits = (hs[:, None] >> bit_shifts[None, :]) & np.uint64(1)
                c = counts.astype(np.int64)[:, None]
                acc = np.where(bits == 1, c, -c).sum(axis=0)
                sig = ((acc > 0).astype(np.uint64) << bit_shifts).sum(
                    dtype=np.uint64
                )
                out[i] = int(sig.astype(np.int64))
            yield pd.Series(out)

    return _simhash


def simhash_near_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    n_tables: int = 4,
) -> DataFrame:
    """SimHash near-dup pairs: bucket by n_tables 16-bit slices (a pair
    within Hamming<=3 of a 64-bit hash agrees on >=1 of 4 slices by
    pigeonhole), join within buckets, verify exact Hamming distance."""
    sh = _fan_out(df).select(
        F.col(id_col), simhash_udf()(F.col(text_col)).alias("simhash")
    )
    return simhash_pairs_from_hashes(sh, id_col, max_hamming, n_tables)


def simhash_pairs_from_hashes(
    sh: DataFrame,
    id_col: str = "doc_id",
    max_hamming: int = 3,
    n_tables: int = 4,
) -> DataFrame:
    """Bucketed candidate join + exact-Hamming verify over a
    PRECOMPUTED ``(id, simhash)`` frame (e.g. a persisted fingerprint
    table). Like minhash_pairs_from_signatures, storing the kernel
    output makes this relational half oracle-checkable in SQL."""
    slices = sh.select(
        id_col,
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned("simhash", 16 * t).bitwiseAND(F.lit(0xFFFF))
                    for t in range(n_tables)
                ]
            )
        ).alias("tbl", "key"),
    )
    left = slices.select(
        F.col(id_col).alias("id_a"), F.col("simhash").alias("h_a"), "tbl", "key"
    )
    right = slices.select(
        F.col(id_col).alias("id_b"), F.col("simhash").alias("h_b"), "tbl", "key"
    )
    cand = (
        # equal-sided bucket self-join: per-partition hash build, never
        # a driver broadcast of the full slice table (see minhash)
        left.hint("shuffle_hash").join(right, ["tbl", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "h_a", "h_b")
        .distinct()
    )
    hamming = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return cand.withColumn("hamming", hamming).filter(
        F.col("hamming") <= max_hamming
    ).select("id_a", "id_b", "hamming")


def embedding_cosine_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.9,
    method: str = "lsh",
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a, id_b, cosine).

    ``method="exact"`` — all-pairs theta self-join with a pure-Column
    cosine (double-precision zip_with/aggregate, no UDF). O(n^2): the
    correctness baseline and the DuckDB-oracle path; never run this
    standalone at 100 TB.

    ``method="lsh"`` — the scale path: each vector gets an
    ``n_planes``-bit random-hyperplane sign signature (computed as
    Column expressions), split into ``bands`` slices; a pair whose
    vectors have cosine near 1 disagrees on each plane with probability
    theta/pi, so it agrees on at least one whole slice w.h.p.
    Candidates = equi-join on (slice, key) — bounded by bucket
    co-occurrence, never the cross product. Candidate pair IDs are
    distinct-ed WITHOUT the vectors riding through the shuffle; the
    (small) surviving pair set re-joins the vectors for an exact-cosine
    verify, so reported cosines are exact and false positives are
    impossible — only recall is approximate (tunable via
    n_planes/bands).
    """
    from .similarity import hyperplane_bucket_col

    v = F.col(vec_col).cast("array<double>")
    nrm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
    vecs = df.select(F.col(id_col).alias("id"), v.alias("v"), nrm.alias("nrm"))

    if method == "exact":
        a = vecs.select(
            F.col("id").alias("id_a"), F.col("v").alias("va"), F.col("nrm").alias("na")
        )
        b = vecs.select(
            F.col("id").alias("id_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb")
        )
        cand = a.join(b, F.col("id_a") < F.col("id_b"))
    elif method == "lsh":
        dim = len(df.select(vec_col).first()[0])
        planes = np.random.default_rng(seed).standard_normal((n_planes, dim))
        width = n_planes // bands
        sig = hyperplane_bucket_col(v, planes)
        sliced = df.select(
            F.col(id_col).alias("id"),
            F.posexplode(
                F.array(
                    *[
                        F.shiftrightunsigned(sig, width * t).bitwiseAND(
                            F.lit((1 << width) - 1)
                        )
                        for t in range(bands)
                    ]
                )
            ).alias("tbl", "key"),
        )
        pair_ids = (
            sliced.select(F.col("id").alias("id_a"), "tbl", "key")
            .hint("shuffle_hash")
            .join(
                sliced.select(F.col("id").alias("id_b"), "tbl", "key"),
                ["tbl", "key"],
            )
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )
        cand = pair_ids.join(
            vecs.select(
                F.col("id").alias("id_a"),
                F.col("v").alias("va"),
                F.col("nrm").alias("na"),
            ),
            "id_a",
        ).join(
            vecs.select(
                F.col("id").alias("id_b"),
                F.col("v").alias("vb"),
                F.col("nrm").alias("nb"),
            ),
            "id_b",
        )
    else:
        raise ValueError(f"unknown method {method!r}")

    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )
    return (
        cand.withColumn("cosine", dot / (F.col("na") * F.col("nb")))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    max_gram_df: int | None = 5000,
) -> DataFrame:
    """Exact n-gram-set Jaccard for all pairs sharing >=1 shingle.

    explode(shingles) self-join on shingle computes |A ∩ B| per pair in
    one shuffle; |A ∪ B| = |A| + |B| − |A ∩ B| from per-doc distinct
    counts. Candidate pairs are bounded by co-occurrence, not n^2.

    ``max_gram_df`` drops shingles shared by more than that many docs
    BEFORE the self-join (standard production near-dup hygiene): one
    boilerplate shingle with df ~ N would otherwise emit ~N^2/2
    candidate rows — the round-1 hot-shingle quadratic blowup. The
    intersection count is computed over the SURVIVING grams only, so
    the Jaccard is exact w.r.t. the capped gram sets (per-doc sizes are
    capped symmetrically). Pass ``None`` for the uncapped exact
    semantics (small/verified inputs, and the DuckDB oracle's default).
    """
    toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    grams = df.select(
        F.col(id_col),
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
                lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
            )
        ).alias("grams"),
    ).filter(F.size("grams") > 0)
    exploded = grams.select(id_col, F.explode("grams").alias("gram"))
    if max_gram_df is not None:
        keep = (
            exploded.groupBy("gram")
            .agg(F.count("*").alias("gram_df"))
            .filter(F.col("gram_df") <= max_gram_df)
            .select("gram")
        )
        exploded = exploded.join(keep, "gram")
    # per-doc sizes over the SAME (possibly capped) gram sets
    sizes = exploded.groupBy(id_col).agg(F.count("*").alias("n_grams"))
    inter = (
        exploded.alias("a")
        .join(exploded.alias("b"), "gram")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_grams").alias("na"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_grams").alias("nb"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("n_inter") / (F.col("na") + F.col("nb") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
