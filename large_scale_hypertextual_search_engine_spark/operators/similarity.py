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
