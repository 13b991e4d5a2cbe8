"""Similarity search over embedding columns (array<float>).

* ``cosine_topk``      — brute-force exact top-k for a query vector:
  JVM-side dot product via ``F.aggregate``/``zip_with`` (no UDF), then
  TakeOrderedAndProject. The correctness baseline.
* ``cosine_topk_batch``— many query vectors at once with a single
  Arrow-batched numpy GEMM kernel (mapInPandas): the scale path for
  query batches; each partition computes scores against the broadcast
  query matrix, then a per-query windowed top-k merges partials.
* ``lsh_bucket_topk``  — random-hyperplane LSH pre-filter: probe only
  the query's bucket (+ multi-probe neighbors), exact re-rank inside.
  Trades recall for a ~2^bits candidate reduction — the 100 TB path.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)


def _norm_expr(vec):
    return F.sqrt(F.aggregate(vec, F.lit(0.0), lambda a, x: a + x * x))


def cosine_similarity_col(vec, qvec) -> "F.Column":
    """cosine(vec, query_literal_array) as a pure Column expression."""
    dot = F.aggregate(F.zip_with(vec, qvec, lambda a, b: a * b), F.lit(0.0), lambda a, x: a + x)
    return dot / (_norm_expr(vec) * _norm_expr(qvec))


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact brute-force cosine top-k — (id, score), score desc, id asc."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        df.select(
            F.col(id_col),
            cosine_similarity_col(F.col(vec_col), q).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


BATCH_TOPK_SCHEMA = StructType(
    [
        StructField("query_id", LongType()),
        StructField("vec_id", LongType()),
        StructField("score", DoubleType()),
    ]
)


def cosine_topk_batch(
    df: DataFrame,
    queries: np.ndarray,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k for a batch of query vectors in ONE job.

    numpy GEMM per Arrow batch (rows x queries), per-partition top-k
    prune, then global windowed top-k per query — the partial top-k
    bounds shuffle volume to n_partitions * n_queries * k rows.
    """
    Q = np.asarray(queries, dtype=np.float64)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)

    def _score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        best: dict[int, list] = {}
        for pdf in batches:
            if not len(pdf):
                continue
            M = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
            S = Mn @ Qn.T  # (rows, queries)
            ids = pdf[id_col].to_numpy()
            for qi in range(Qn.shape[0]):
                col = S[:, qi]
                take = min(k, col.size)
                top = np.argpartition(-col, take - 1)[:take]
                best.setdefault(qi, []).append(
                    (ids[top], col[top])
                )
        rows = {"query_id": [], "vec_id": [], "score": []}
        for qi, parts in best.items():
            ids = np.concatenate([p[0] for p in parts])
            sc = np.concatenate([p[1] for p in parts])
            take = min(k, sc.size)
            top = np.argpartition(-sc, take - 1)[:take]
            rows["query_id"].extend([qi] * take)
            rows["vec_id"].extend(int(x) for x in ids[top])
            rows["score"].extend(float(x) for x in sc[top])
        yield pd.DataFrame(rows)

    partials = df.select(id_col, vec_col).mapInPandas(_score, BATCH_TOPK_SCHEMA)
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        partials.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "score")
    )


def hyperplane_bucket_col(vec, planes: np.ndarray):
    """LSH bucket id = sign bits of <vec, plane_i> packed into a long —
    computed as Column expressions so bucketing happens at write time
    and partition pruning applies at query time."""
    bits = []
    for i, p in enumerate(planes):
        dot = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(float(x)) for x in p]),
                lambda a, b: a * b,
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        bits.append(F.when(dot >= 0, F.lit(1 << i)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("int")


def lsh_bucket_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    multiprobe: int = 1,
) -> DataFrame:
    """ANN: probe the query's hyperplane bucket (+ single-bit-flip
    neighbors up to `multiprobe` flips), exact cosine re-rank inside.

    At scale the bucket column is precomputed and the table is
    partitioned by it, so this becomes a partition-pruned scan of
    ~(1+n_planes)/2^n_planes of the data.
    """
    dim = len(query_vec)
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    q = np.asarray(query_vec, dtype=np.float64)
    qbits = sum((1 << i) for i, p in enumerate(planes) if float(q @ p) >= 0)
    probes = {qbits}
    if multiprobe >= 1:
        probes |= {qbits ^ (1 << i) for i in range(n_planes)}
    bucketed = df.withColumn(
        "__bucket", hyperplane_bucket_col(F.col(vec_col), planes)
    ).filter(F.col("__bucket").isin(list(probes)))
    return cosine_topk(bucketed, query_vec, k, vec_col, id_col)


def write_lsh_partitioned(
    df: DataFrame,
    path: str,
    n_planes: int = 8,
    vec_col: str = "embedding",
    seed: int = 42,
) -> None:
    """Materialize the ANN table partitioned by its hyperplane bucket —
    the wiring round 1 left declared-but-unwired: once on disk, a probe
    reads (1 + multiprobe-flips)/2^n_planes of the partition dirs
    instead of scanning everything and bucketing at query time."""
    df.withColumn(
        "bucket",
        hyperplane_bucket_col(
            F.col(vec_col),
            np.random.default_rng(seed).standard_normal(
                (n_planes, _vec_dim(df, vec_col))
            ),
        ),
    ).write.mode("overwrite").partitionBy("bucket").parquet(path)


def _vec_dim(df: DataFrame, vec_col: str) -> int:
    return len(df.select(vec_col).first()[0])


# ---------------------------------------------------------------- IVF


def _kmeans_fit(sample: np.ndarray, k: int, iters: int = 20, seed: int = 42):
    """Deterministic spherical k-means on a driver-side sample.

    Centroid training needs only a bounded sample (standard IVF
    practice: train on ~max(10k, 40·k) vectors); ASSIGNMENT is the
    distributed part. numpy keeps it dependency-free and bit-stable
    across runs — no MLlib model serialization in the index layout."""
    rng = np.random.default_rng(seed)
    Xn = sample / np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
    C = Xn[rng.choice(len(Xn), size=min(k, len(Xn)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(Xn @ C.T, axis=1)
        for c in range(C.shape[0]):
            members = Xn[assign == c]
            if len(members):
                m = members.mean(axis=0)
                C[c] = m / max(float(np.linalg.norm(m)), 1e-12)
    return C


def ivf_assign_udf(centroids: np.ndarray):
    """mapInPandas-free assignment: a pandas UDF computing
    argmax_c <v/|v|, centroid_c> per row with one GEMM per Arrow batch."""
    C = np.asarray(centroids, dtype=np.float64)

    @F.pandas_udf(IntegerType())
    def _assign(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for batch in it:
            if not len(batch):
                yield pd.Series([], dtype="int32")
                continue
            M = np.stack(batch.to_numpy()).astype(np.float64)
            Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
            yield pd.Series(np.argmax(Mn @ C.T, axis=1).astype("int32"))

    return _assign


def uniform_vector_sample(
    df: DataFrame, vec_col: str, n: int, seed: int = 42
) -> np.ndarray:
    """Uniform random draw of ~``n`` vectors WITHOUT a count pass.

    ``limit(n)`` takes the first partitions in scan order — at 100 TB
    the first file is not the distribution (r2 finding). Instead each
    partition keeps the ``per_part`` smallest uniform random keys
    (bottom-k sampling == uniform sampling without replacement) with a
    2x oversample, and the driver takes the ``n`` globally smallest.
    One pass, vectorized per Arrow batch, collect bounded by
    n_partitions * per_part rows; deterministic via per-partition
    seeded generators."""
    n_parts = max(df.rdd.getNumPartitions(), 1)
    per_part = max(64, -(-n // n_parts) * 2)

    def _bottomk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        rng = np.random.default_rng([seed, ctx.partitionId() if ctx else 0])
        keys = np.empty(0, dtype=np.float64)
        vecs: list = []
        for pdf in batches:
            if not len(pdf):
                continue
            u = rng.random(len(pdf))
            keys = np.concatenate([keys, u])
            vecs.extend(pdf[vec_col].tolist())
            if len(keys) > 4 * per_part:
                keep = np.argpartition(keys, per_part - 1)[:per_part]
                keys = keys[keep]
                vecs = [vecs[i] for i in keep]
        if len(keys) > per_part:
            keep = np.argpartition(keys, per_part - 1)[:per_part]
            keys = keys[keep]
            vecs = [vecs[i] for i in keep]
        yield pd.DataFrame({"__key": keys, "v": vecs})

    rows = (
        df.select(F.col(vec_col).cast("array<double>").alias(vec_col))
        .mapInPandas(_bottomk, schema="__key double, v array<double>")
        .collect()
    )
    rows.sort(key=lambda r: r["__key"])
    return np.stack(
        [np.asarray(r["v"], dtype=np.float64) for r in rows[: min(n, len(rows))]]
    )


def write_ivf_partitioned(
    df: DataFrame,
    path: str,
    n_centroids: int = 64,
    vec_col: str = "embedding",
    seed: int = 42,
    train_sample: int = 10_000,
) -> np.ndarray:
    """Materialize an IVF-flat index: vectors stored partitioned by
    nearest-centroid id, centroids saved alongside. A query then reads
    only its ``nprobe`` closest partitions — the coarse-quantizer
    analog of the LSH-bucketed table, with data-adaptive cells."""
    import json as _json
    from pathlib import Path

    sample = uniform_vector_sample(df, vec_col, train_sample, seed=seed)
    C = _kmeans_fit(sample, n_centroids, seed=seed)
    (
        df.withColumn("centroid_id", ivf_assign_udf(C)(F.col(vec_col)))
        .write.mode("overwrite")
        .partitionBy("centroid_id")
        .parquet(path)
    )
    p = Path(path) / "_ivf_centroids.json"
    p.write_text(_json.dumps({"centroids": C.tolist()}))
    return C


def ivf_topk(
    spark,
    path: str,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """ANN over a :func:`write_ivf_partitioned` table: rank centroids
    driver-side, push the nprobe nearest as a PARTITION predicate
    (only those directories are listed/read), exact cosine re-rank
    inside."""
    import json as _json
    from pathlib import Path

    C = np.asarray(
        _json.loads((Path(path) / "_ivf_centroids.json").read_text())["centroids"]
    )
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / max(float(np.linalg.norm(q)), 1e-12)
    probes = np.argsort(-(C @ qn))[: min(nprobe, len(C))]
    df = spark.read.parquet(path).filter(
        F.col("centroid_id").isin([int(x) for x in probes])
    )
    return cosine_topk(df, query_vec, k, vec_col, id_col)


def lsh_partitioned_topk(
    spark,
    path: str,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    multiprobe: int = 1,
) -> DataFrame:
    """ANN over a :func:`write_lsh_partitioned` table: the probe set is
    computed driver-side and pushed as a PARTITION predicate, so only
    the probed bucket directories are listed/read."""
    rng = np.random.default_rng(seed)
    q = np.asarray(query_vec, dtype=np.float64)
    planes = rng.standard_normal((n_planes, q.size))
    qbits = sum((1 << i) for i, p in enumerate(planes) if float(q @ p) >= 0)
    probes = {qbits}
    if multiprobe >= 1:
        probes |= {qbits ^ (1 << i) for i in range(n_planes)}
    df = spark.read.parquet(path).filter(F.col("bucket").isin(list(probes)))
    return cosine_topk(df, query_vec, k, vec_col, id_col)
