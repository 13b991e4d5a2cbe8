"""Product Quantization (PQ) for embedding search at corpus scale.

Jégou, Douze & Schmid 2011, "Product Quantization for Nearest
Neighbor Search": split each d-dim vector into ``m`` subvectors,
k-means each subspace to ``k`` centroids, and store a vector as ``m``
one-byte codes — a 32x-256x compression that turns a 100 TB embedding
column into something a serving fleet can hold in RAM. Queries score
against codes via Asymmetric Distance Computation (ADC): one
(m x k) lookup table of query-subvector inner products, then a
table-gather per stored code — no decompression.

Scale design:

* training is driver-side k-means over a bounded DETERMINISTIC sample
  (hash-ordered take) — the standard recipe; codebooks are tiny
  (m*k*d/m floats) and broadcast by closure;
* encoding is one narrow Arrow pass (argmax of a GEMM per subspace —
  vectorized, no per-row Python);
* ADC search is another narrow pass (LUT gather + row sum) feeding a
  distributed ``orderBy().limit(k)`` (TakeOrderedAndProject). The
  shuffle carries only (id, score) for per-partition survivors;
* optional exact re-rank: fetch the float vectors for the ADC top-R
  only (a semi-join — R rows, not the corpus) and re-score exactly.

Vectors are L2-normalized before train/encode, so maximum inner
product == cosine ranking (the convention of the rest of the ANN
stack). Approximate by construction — contract-tested for recall
against the exact scan, deterministic under a fixed seed; composable
with the IVF partitioner (`similarity.py`) for bucket-pruned PQ-IVF.

No reference-repo counterpart: the reference stops at lexical
retrieval; this extends the repo's training-data/embedding surface.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

__all__ = [
    "pq_train",
    "pq_encode",
    "pq_search",
    "write_ivfpq_partitioned",
    "ivfpq_topk",
]


def _normalize(mat: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(mat, axis=1, keepdims=True)
    n[n == 0.0] = 1.0
    return mat / n


def _kmeans(x: np.ndarray, k: int, seed: int, iters: int = 20) -> np.ndarray:
    """Plain seeded Lloyd's with sampled init — deterministic."""
    rng = np.random.default_rng(seed)
    k = min(k, len(x))
    cents = x[rng.choice(len(x), size=k, replace=False)].copy()
    for _ in range(iters):
        # assign: argmin squared distance == argmax (dot - ||c||^2/2)
        d2 = (
            np.sum(cents * cents, axis=1)[None, :]
            - 2.0 * (x @ cents.T)
        )
        assign = np.argmin(d2, axis=1)
        for j in range(k):
            mask = assign == j
            if mask.any():
                cents[j] = x[mask].mean(axis=0)
    return cents


def pq_train(
    df: DataFrame,
    m: int = 8,
    k: int = 256,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample: int = 100_000,
    seed: int = 42,
) -> np.ndarray:
    """Train PQ codebooks -> float64 array (m, k', d/m), k' <= k.

    The training sample is deterministic (ordered by xxhash64(id),
    first ``sample`` rows), so retraining on the same corpus yields
    identical codebooks. d must be divisible by m.
    """
    rows = (
        df.select(id_col, vec_col)
        .orderBy(F.xxhash64(F.col(id_col).cast("string")), F.col(id_col))
        .limit(sample)
        .collect()
    )
    x = _normalize(np.array([r[vec_col] for r in rows], dtype=np.float64))
    d = x.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m
    return np.stack(
        [
            _kmeans(x[:, j * sub : (j + 1) * sub], k, seed + j)
            for j in range(m)
        ]
    )


def pq_encode(
    df: DataFrame,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """-> (id, codes: array<int>) — one narrow Arrow pass; per batch a
    GEMM per subspace and an argmin, no per-row Python."""
    m, k, sub = codebooks.shape
    cb = codebooks  # closure broadcast (m*k*sub floats — tiny)
    c2 = np.sum(cb * cb, axis=2)  # (m, k)
    id_field = df.schema[id_col]
    schema = StructType(
        [id_field, StructField("codes", ArrayType(IntegerType()))]
    )

    def _enc(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            x = _normalize(
                np.array(list(pdf[vec_col]), dtype=np.float64)
            )
            codes = np.empty((len(pdf), m), dtype=np.int32)
            for j in range(m):
                xs = x[:, j * sub : (j + 1) * sub]
                d2 = c2[j][None, :] - 2.0 * (xs @ cb[j].T)
                codes[:, j] = np.argmin(d2, axis=1)
            yield pd.DataFrame(
                {id_col: pdf[id_col], "codes": list(codes)}
            )

    from .fanout import fan_out

    return fan_out(df.select(id_col, vec_col)).mapInPandas(_enc, schema)


def pq_search(
    codes_df: DataFrame,
    codebooks: np.ndarray,
    query_vec: list[float],
    top_k: int = 10,
    id_col: str = "vec_id",
    refine_with: DataFrame | None = None,
    refine: int = 100,
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC top-k over encoded vectors -> (id, score) by approximate
    cosine (inner product of the normalized query with the
    reconstruction), score desc / id asc.

    ``refine_with``: the float-vector table — the ADC top-``refine``
    candidates are exactly re-scored against it (a semi-join fetches
    only those rows) and the exact top-k returned. The 100 TB layout:
    codes in RAM, vectors cold."""
    m, k, sub = codebooks.shape
    q = np.asarray(query_vec, dtype=np.float64)
    qn = np.linalg.norm(q)
    if qn:
        q = q / qn
    lut = np.stack(
        [cb @ q[j * sub : (j + 1) * sub] for j, cb in enumerate(codebooks)]
    )  # (m, k) inner products

    id_field = codes_df.schema[id_col]
    schema = StructType([id_field, StructField("score", DoubleType())])

    def _adc(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            codes = np.array(list(pdf["codes"]), dtype=np.int64)  # (n, m)
            score = lut[np.arange(m)[None, :], codes].sum(axis=1)
            yield pd.DataFrame({id_col: pdf[id_col], "score": score})

    n_cand = refine if refine_with is not None else top_k
    adc = (
        codes_df.select(id_col, "codes")
        .mapInPandas(_adc, schema)
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(max(n_cand, top_k))
    )
    if refine_with is None:
        return adc
    from .similarity import cosine_similarity_col

    qlit = F.array(*[F.lit(float(v)) for v in query_vec])
    cand_vecs = refine_with.select(id_col, vec_col).join(
        F.broadcast(adc.select(id_col)), id_col, "semi"
    )
    return (
        cand_vecs.select(
            id_col,
            cosine_similarity_col(F.col(vec_col), qlit).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(top_k)
    )


def write_ivfpq_partitioned(
    df: DataFrame,
    path: str,
    n_centroids: int = 32,
    m: int = 8,
    k: int = 256,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    train_sample: int = 50_000,
    seed: int = 42,
) -> tuple[np.ndarray, np.ndarray]:
    """IVFADC layout (Jégou et al. 2011 §IV): a coarse k-means
    quantizer partitions the corpus into cells; each vector stores only
    its cell id + the PQ codes of its RESIDUAL (v_norm - centroid).
    Residual encoding is what makes IVF-PQ beat flat PQ — residual
    magnitudes are much smaller than vector magnitudes, so the same
    codebook budget quantizes them far more finely.

    Writes (id, codes) partitioned by ``centroid_id`` (query probes
    prune to nprobe directories) and saves centroids + codebooks
    alongside. Returns (centroids, codebooks).

    100 TB shape: training is a bounded deterministic sample; the
    corpus pass is one narrow Arrow map (assign + residual-encode,
    GEMM per batch); the table stores m bytes-worth of codes per
    vector — the whole index fits where 0.8% of the float vectors
    would.
    """
    import json as _json
    from pathlib import Path

    from .similarity import _kmeans_fit, uniform_vector_sample

    sample = _normalize(uniform_vector_sample(df, vec_col, train_sample, seed=seed))
    C = _kmeans_fit(sample, n_centroids, seed=seed)
    d = sample.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    # train PQ on the sample's residuals w.r.t. their assigned cells
    assign = np.argmax(sample @ C.T, axis=1)
    resid = sample - C[assign]
    sub = d // m
    cb = np.stack(
        [
            _kmeans(resid[:, j * sub : (j + 1) * sub], k, seed + 1 + j)
            for j in range(m)
        ]
    )

    id_field = df.schema[id_col]
    schema = StructType(
        [
            id_field,
            StructField("codes", ArrayType(IntegerType())),
            StructField("centroid_id", IntegerType()),
        ]
    )
    c2 = np.sum(cb * cb, axis=2)  # (m, k)

    def _enc(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            x = _normalize(np.array(list(pdf[vec_col]), dtype=np.float64))
            cell = np.argmax(x @ C.T, axis=1)
            r = x - C[cell]
            codes = np.empty((len(pdf), m), dtype=np.int32)
            for j in range(m):
                rs = r[:, j * sub : (j + 1) * sub]
                d2 = c2[j][None, :] - 2.0 * (rs @ cb[j].T)
                codes[:, j] = np.argmin(d2, axis=1)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "codes": list(codes),
                    "centroid_id": cell.astype(np.int32),
                }
            )

    (
        df.select(id_col, vec_col)
        .mapInPandas(_enc, schema)
        .write.mode("overwrite")
        .partitionBy("centroid_id")
        .parquet(path)
    )
    meta = Path(path) / "_ivfpq_meta.json"
    meta.write_text(
        _json.dumps({"centroids": C.tolist(), "codebooks": cb.tolist()})
    )
    return C, cb


def ivfpq_topk(
    spark,
    path: str,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    refine_with: DataFrame | None = None,
    refine: int = 100,
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN over a :func:`write_ivfpq_partitioned` table.

    Driver ranks cells by q·centroid and pushes the ``nprobe`` nearest
    as a PARTITION predicate (only those directories are read). Scores
    are asymmetric: score(v) = q·c_cell + Σ_j lut[j, code_j] — the
    cell constant plus the residual ADC gather — which equals
    q·(c_cell + reconstructed_residual) exactly. Optional exact
    re-rank of the ADC top-``refine`` via a semi-join against the
    float-vector table (R rows fetched, not the corpus).
    """
    import json as _json
    from pathlib import Path

    meta = _json.loads((Path(path) / "_ivfpq_meta.json").read_text())
    C = np.asarray(meta["centroids"], dtype=np.float64)
    cb = np.asarray(meta["codebooks"], dtype=np.float64)
    m, kk, sub = cb.shape
    q = np.asarray(query_vec, dtype=np.float64)
    qn = np.linalg.norm(q)
    if qn:
        q = q / qn
    cell_dot = C @ q  # (n_centroids,)
    probes = np.argsort(-cell_dot)[: min(nprobe, len(C))]
    lut = np.stack([c @ q[j * sub : (j + 1) * sub] for j, c in enumerate(cb)])
    consts = {int(c): float(cell_dot[c]) for c in probes}

    codes_df = spark.read.parquet(path).filter(
        F.col("centroid_id").isin([int(x) for x in probes])
    )
    id_field = codes_df.schema[id_col]
    schema = StructType([id_field, StructField("score", DoubleType())])

    def _adc(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            codes = np.array(list(pdf["codes"]), dtype=np.int64)
            cells = pdf["centroid_id"].to_numpy(dtype=np.int64)
            const = np.vectorize(consts.__getitem__, otypes=[np.float64])(cells)
            score = const + lut[np.arange(m)[None, :], codes].sum(axis=1)
            yield pd.DataFrame({id_col: pdf[id_col], "score": score})

    n_cand = refine if refine_with is not None else k
    adc = (
        codes_df.select(id_col, "codes", "centroid_id")
        .mapInPandas(_adc, schema)
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(max(n_cand, k))
    )
    if refine_with is None:
        return adc
    from .similarity import cosine_similarity_col

    qlit = F.array(*[F.lit(float(v)) for v in query_vec])
    cand = refine_with.select(id_col, vec_col).join(
        F.broadcast(adc.select(id_col)), id_col, "semi"
    )
    return (
        cand.select(
            id_col, cosine_similarity_col(F.col(vec_col), qlit).alias("score")
        )
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )
