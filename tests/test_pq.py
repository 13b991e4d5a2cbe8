"""Product quantization (operators/pq.py).

Determinism under a fixed seed, the ADC == reconstruction identity,
recall against the exact cosine scan on the driver embeddings, and the
exact-re-rank contract.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from large_scale_hypertextual_search_engine_spark.operators.pq import (
    _normalize,
    pq_encode,
    pq_search,
    pq_train,
)
from large_scale_hypertextual_search_engine_spark.operators.similarity import (
    cosine_topk,
)

EMB = "/root/testdata/sf0.001/embeddings.parquet"
# k=256 is the canonical one-byte-code setting (Jégou et al. §5.1);
# on this near-isotropic synthetic corpus (mean pairwise cos ~0.017)
# smaller k leaves too much quantization error for a recall contract.
M, K = 8, 256


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(EMB).select("vec_id", "embedding").cache()


@pytest.fixture(scope="module")
def trained(spark, emb):
    cb = pq_train(emb, m=M, k=K, sample=500, seed=7)
    codes = pq_encode(emb, cb).cache()
    return cb, codes


def test_train_deterministic(spark, emb):
    a = pq_train(emb, m=M, k=K, sample=500, seed=7)
    b = pq_train(emb, m=M, k=K, sample=500, seed=7)
    assert np.array_equal(a, b)
    c = pq_train(emb, m=M, k=K, sample=500, seed=8)
    assert not np.array_equal(a, c)


def test_encode_shapes_and_determinism(spark, emb, trained):
    cb, codes = trained
    assert cb.shape == (M, K, 64 // M)
    rows = codes.collect()
    assert len(rows) == emb.count()
    assert all(len(r["codes"]) == M for r in rows)
    again = {
        r["vec_id"]: list(r["codes"])
        for r in pq_encode(emb, cb).collect()
    }
    assert {r["vec_id"]: list(r["codes"]) for r in rows} == again


def test_adc_equals_reconstruction_dot(spark, emb, trained):
    """ADC score must equal dot(q_normalized, reconstructed(x))."""
    cb, codes = trained
    qrow = emb.filter(F.col("vec_id") == 3).collect()[0]
    q = np.array(qrow["embedding"], dtype=np.float64)
    q = q / np.linalg.norm(q)
    got = {
        r["vec_id"]: r["score"]
        for r in pq_search(codes, cb, list(qrow["embedding"]), top_k=500).collect()
    }
    code_map = {r["vec_id"]: r["codes"] for r in codes.collect()}
    sub = 64 // M
    for vid, score in list(got.items())[:50]:
        recon = np.concatenate([cb[j][code_map[vid][j]] for j in range(M)])
        assert score == pytest.approx(float(q @ recon), abs=1e-9)


def test_recall_vs_exact(spark, emb, trained):
    """ADC top-10 recall vs the exact scan, averaged over 10 queries;
    the exact-re-rank path must be strictly better."""
    cb, codes = trained
    qs = emb.orderBy("vec_id").limit(10).collect()
    r_adc, r_ref = [], []
    for qrow in qs:
        v = list(qrow["embedding"])
        exact = {r["vec_id"] for r in cosine_topk(emb, v, k=10).collect()}
        adc = {
            r["vec_id"]
            for r in pq_search(codes, cb, v, top_k=10).collect()
        }
        ref = {
            r["vec_id"]
            for r in pq_search(
                codes, cb, v, top_k=10, refine_with=emb, refine=100
            ).collect()
        }
        r_adc.append(len(adc & exact) / 10)
        r_ref.append(len(ref & exact) / 10)
    assert sum(r_adc) / len(r_adc) >= 0.5, r_adc
    assert sum(r_ref) / len(r_ref) >= sum(r_adc) / len(r_adc)
    assert sum(r_ref) / len(r_ref) >= 0.8, r_ref


def test_refined_scores_are_exact_cosine(spark, emb, trained):
    cb, codes = trained
    qrow = emb.filter(F.col("vec_id") == 11).collect()[0]
    v = list(qrow["embedding"])
    ref = pq_search(
        codes, cb, v, top_k=5, refine_with=emb, refine=500
    ).collect()
    exact = cosine_topk(emb, v, k=5).collect()
    # refine=corpus-size means candidates == corpus: identical to exact
    assert [(r["vec_id"], r["score"]) for r in ref] == [
        (r["vec_id"], r["score"]) for r in exact
    ]


def test_compression_accounting(spark, trained):
    cb, codes = trained
    # m one-byte-capable codes per vector vs 64 float32s
    assert all(
        0 <= c < K for r in codes.collect() for c in r["codes"]
    )
    assert M / (64 * 4) < 0.05  # > 20x smaller


def test_zero_norm_vectors_do_not_crash(spark, trained):
    cb, _ = trained
    df = spark.createDataFrame(
        [(1, [0.0] * 64), (2, [1.0] + [0.0] * 63)],
        "vec_id long, embedding array<double>",
    )
    codes = pq_encode(df, cb)
    assert codes.count() == 2
    res = pq_search(codes, cb, [0.0] * 64, top_k=2).collect()
    assert len(res) == 2


# ---------------------------------------------------------------- IVF-PQ


@pytest.fixture(scope="module")
def ivfpq(spark, emb, tmp_path_factory):
    from large_scale_hypertextual_search_engine_spark.operators.pq import (
        write_ivfpq_partitioned,
    )

    path = str(tmp_path_factory.mktemp("ivfpq") / "idx")
    C, cb = write_ivfpq_partitioned(
        emb, path, n_centroids=8, m=M, k=K, seed=42
    )
    return path, C, cb


def test_ivfpq_adc_equals_reconstruction(spark, emb, ivfpq):
    """ADC score must equal dot(q, centroid + reconstructed residual)."""
    from large_scale_hypertextual_search_engine_spark.operators.pq import ivfpq_topk

    path, C, cb = ivfpq
    qrow = emb.filter(F.col("vec_id") == 5).collect()[0]
    q = np.array(qrow["embedding"], dtype=np.float64)
    q = q / np.linalg.norm(q)
    got = {
        r["vec_id"]: r["score"]
        for r in ivfpq_topk(
            spark, path, list(qrow["embedding"]), k=400, nprobe=8
        ).collect()
    }
    stored = {
        r["vec_id"]: (list(r["codes"]), r["centroid_id"])
        for r in spark.read.parquet(path).collect()
    }
    sub = 64 // M
    checked = 0
    for vid, score in list(got.items())[:50]:
        codes, cell = stored[vid]
        recon = C[cell] + np.concatenate([cb[j][codes[j]] for j in range(M)])
        assert score == pytest.approx(float(q @ recon), abs=1e-9)
        checked += 1
    assert checked == 50


def test_ivfpq_full_probe_refine_equals_exact(spark, emb, ivfpq):
    from large_scale_hypertextual_search_engine_spark.operators.pq import ivfpq_topk

    path, C, cb = ivfpq
    qrow = emb.filter(F.col("vec_id") == 9).collect()[0]
    v = list(qrow["embedding"])
    got = ivfpq_topk(
        spark, path, v, k=5, nprobe=8, refine_with=emb, refine=1 << 30
    ).collect()
    exact = cosine_topk(emb, v, k=5).collect()
    assert [(r["vec_id"], r["score"]) for r in got] == [
        (r["vec_id"], r["score"]) for r in exact
    ]


def test_ivfpq_recall_beats_flat_pq_or_close(spark, emb, trained, ivfpq):
    """Residual PQ: refined recall@10 >= 0.8 over 10 queries (all 8
    cells probed, so this isolates quantization quality from probe
    misses), and pure-ADC recall >= 0.4 (residual quantization on
    near-isotropic data)."""
    from large_scale_hypertextual_search_engine_spark.operators.pq import ivfpq_topk

    path, C, cb = ivfpq
    qs = emb.orderBy("vec_id").limit(10).collect()
    r_adc, r_ref = [], []
    for qrow in qs:
        v = list(qrow["embedding"])
        exact = {r["vec_id"] for r in cosine_topk(emb, v, k=10).collect()}
        adc = {
            r["vec_id"]
            for r in ivfpq_topk(spark, path, v, k=10, nprobe=8).collect()
        }
        ref = {
            r["vec_id"]
            for r in ivfpq_topk(
                spark, path, v, k=10, nprobe=8, refine_with=emb, refine=100
            ).collect()
        }
        r_adc.append(len(adc & exact) / 10)
        r_ref.append(len(ref & exact) / 10)
    assert sum(r_adc) / 10 >= 0.4, r_adc
    assert sum(r_ref) / 10 >= 0.8, r_ref


def test_ivfpq_probe_prunes_partitions(spark, emb, ivfpq):
    """nprobe=1 must read only one centroid directory."""
    from large_scale_hypertextual_search_engine_spark.operators.pq import ivfpq_topk

    path, C, cb = ivfpq
    qrow = emb.filter(F.col("vec_id") == 2).collect()[0]
    res = ivfpq_topk(spark, path, list(qrow["embedding"]), k=3, nprobe=1)
    cells = {
        r["centroid_id"]
        for r in spark.read.parquet(path)
        .join(res.select("vec_id"), "vec_id", "semi")
        .select("centroid_id")
        .distinct()
        .collect()
    }
    assert len(cells) == 1


def test_ivfpq_deterministic(spark, emb, tmp_path):
    from large_scale_hypertextual_search_engine_spark.operators.pq import (
        write_ivfpq_partitioned,
    )

    a = write_ivfpq_partitioned(emb, str(tmp_path / "a"), 8, M, K, seed=3)
    b = write_ivfpq_partitioned(emb, str(tmp_path / "b"), 8, M, K, seed=3)
    assert np.array_equal(a[0], b[0]) and np.array_equal(a[1], b[1])
    ca = {r["vec_id"]: list(r["codes"]) for r in spark.read.parquet(str(tmp_path / "a")).collect()}
    cb_ = {r["vec_id"]: list(r["codes"]) for r in spark.read.parquet(str(tmp_path / "b")).collect()}
    assert ca == cb_
